"""Minimal XLSX reader built on the stdlib (zipfile + ElementTree) — no
openpyxl/pandas-Excel engine required.

Exists to close the reference's Excel ingestion surface
(`/root/reference/etdtransform/knmi.py:9-29` reads the station-mapping
sheet ``ProjectWeatherStation`` via pandas.read_excel): the mapping sheet is
a tiny dimension table, so a driver-side parse + ``createDataFrame`` is the
right scale shape (same reasoning as the reference's eager read — the big
side of the weather join is the fact table, never this sheet). Supports the
subset of OOXML that plain tabular sheets use: shared strings, inline
strings, numbers, booleans; first row = header.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_REL_NS = {
    "r": "http://schemas.openxmlformats.org/package/2006/relationships",
}
_R_ATTR = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)


def _col_index(cell_ref: str) -> int:
    """'BA7' -> zero-based column 52."""
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def read_xlsx_rows(path: str, sheet_name: str) -> list[list]:
    """Parse one sheet into a list of rows (python values: str/float/bool/
    None). Raises KeyError if the sheet does not exist."""
    with zipfile.ZipFile(path) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rel_targets = {
            rel.get("Id"): rel.get("Target")
            for rel in rels.findall("r:Relationship", _REL_NS)
        }
        sheet_target = None
        for sheet in wb.findall("m:sheets/m:sheet", _NS):
            if sheet.get("name") == sheet_name:
                sheet_target = rel_targets[sheet.get(_R_ATTR)]
                break
        if sheet_target is None:
            raise KeyError(f"sheet {sheet_name!r} not found in {path}")
        if not sheet_target.startswith("xl/"):
            sheet_target = "xl/" + sheet_target.lstrip("/")

        shared: list[str] = []
        try:
            ss = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in ss.findall("m:si", _NS):
                shared.append("".join(t.text or "" for t in si.iter(
                    "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t"
                )))
        except KeyError:
            pass

        ws = ET.fromstring(zf.read(sheet_target))
        rows: list[list] = []
        for row in ws.findall("m:sheetData/m:row", _NS):
            values: dict[int, object] = {}
            for cell in row.findall("m:c", _NS):
                ref = cell.get("r")
                ctype = cell.get("t", "n")
                v = cell.find("m:v", _NS)
                if ctype == "s":
                    val = shared[int(v.text)] if v is not None else None
                elif ctype == "inlineStr":
                    is_el = cell.find("m:is", _NS)
                    val = (
                        "".join(t.text or "" for t in is_el.iter(
                            "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t"
                        ))
                        if is_el is not None
                        else None
                    )
                elif ctype == "b":
                    val = v is not None and v.text == "1"
                elif ctype == "str":
                    val = v.text if v is not None else None
                elif ctype == "e":
                    # formula error cell (#N/A, #DIV/0!, ...) — yield None
                    # rather than failing the whole sheet on float()
                    val = None
                else:  # numeric
                    val = float(v.text) if v is not None and v.text else None
                if ref is not None:
                    values[_col_index(ref)] = val
            width = max(values) + 1 if values else 0
            rows.append([values.get(i) for i in range(width)])
        return rows


def read_xlsx(
    spark: SparkSession, path: str, sheet_name: str
) -> DataFrame:
    """Driver-side XLSX sheet -> DataFrame (header row = column names;
    column types inferred by createDataFrame from the python values). For
    dimension-table-sized sheets only — a multi-GB 'sheet' belongs in
    Parquet, not XLSX."""
    rows = read_xlsx_rows(path, sheet_name)
    if not rows:
        raise ValueError(f"sheet {sheet_name!r} in {path} is empty")
    header = [str(h) for h in rows[0]]
    width = len(header)
    data = [
        tuple((r + [None] * width)[:width]) for r in rows[1:]
    ]
    return spark.createDataFrame(data, header)

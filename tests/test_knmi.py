"""KNMI weather source + 3-key weather join (reference knmi.py,
load_data.py:260-317)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from etdtransform_spark.sources.knmi import (
    join_weather_data,
    load_knmi_weather_data,
)

KNMI_TXT = """\
# BRON: KONINKLIJK NEDERLANDS METEOROLOGISCH INSTITUUT (KNMI)
# Opmerking: door stationsverplaatsingen ...
# STN,YYYYMMDD,HH,T,FH,U
  260,20230101,1,50,30,80
  260,20230101,2,60,20,90
  310,20230101,1,-15,40,70
"""


def _write_knmi(tmp_path):
    p = tmp_path / "uurgeg_260_2023.txt"
    p.write_text(KNMI_TXT)
    return str(tmp_path)


def test_load_knmi_parses_and_derives(spark, tmp_path):
    folder = _write_knmi(tmp_path)
    df = load_knmi_weather_data(spark, folder)
    rows = {(r["STN"], r["HH"]): r for r in df.collect()}
    assert len(rows) == 3
    r = rows[(260, 1)]
    assert r["Temperatuur"] == 5.0  # T/10
    assert r["Windsnelheid"] == 3.0  # FH/10
    assert r["Vochtigheid"] == 80.0
    # Gevoelstemperatuur = T + 0.33*dampdruk - 0.7*wind - 4.0
    damp = 80.0 * 6.105 * math.exp(17.27 * 5.0 / (5.0 + 237.7)) / 100.0
    expected = 5.0 + 0.33 * damp - 0.7 * 3.0 - 4.0
    assert math.isclose(r["Gevoelstemperatuur"], expected, rel_tol=1e-12)
    # negative raw temperature scales correctly
    assert rows[(310, 1)]["Temperatuur"] == -1.5


def test_weather_three_key_join(spark, tmp_path):
    folder = _write_knmi(tmp_path)
    weather = load_knmi_weather_data(spark, folder)
    mapping = spark.createDataFrame(
        [(1, 260), (2, 310)], "ProjectIdBSV long, STN long"
    ).withColumn("STN", F.col("STN").cast("int"))
    fact = spark.createDataFrame(
        [
            # HH = hour + 1: 00:05 -> HH 1, 01:30 -> HH 2
            (1, 1, dt.datetime(2023, 1, 1, 0, 5)),
            (1, 1, dt.datetime(2023, 1, 1, 1, 30)),
            (3, 2, dt.datetime(2023, 1, 1, 0, 45)),
            (4, 1, dt.datetime(2023, 1, 2, 0, 5)),  # no weather row -> nulls
        ],
        "HuisIdBSV long, ProjectIdBSV long, ReadingDate timestamp",
    )
    joined = join_weather_data(fact, weather, mapping)
    got = {
        (r["HuisIdBSV"], r["ReadingDate"]): r for r in joined.collect()
    }
    assert len(got) == 4  # left join preserves the fact rows
    assert got[(1, dt.datetime(2023, 1, 1, 0, 5))]["Temperatuur"] == 5.0
    assert got[(1, dt.datetime(2023, 1, 1, 1, 30))]["Temperatuur"] == 6.0
    assert got[(3, dt.datetime(2023, 1, 1, 0, 45))]["Temperatuur"] == -1.5
    assert got[(4, dt.datetime(2023, 1, 2, 0, 5))]["Temperatuur"] is None


def test_weather_data_table_coldest_weeks(spark):
    """get_weather_data_table: ts from (YYYYMMDD, HH), rolling mean, ISO-week
    aggregates, coldest-2-weeks flags joined back (load_data.py:103-246)."""
    import itertools

    from etdtransform_spark.api import get_weather_data_table

    # 4 full ISO weeks of hourly data for one station; week 2 (Jan 9-15) is
    # made the coldest, week 3 second-coldest
    days = [dt.date(2023, 1, 2) + dt.timedelta(days=i) for i in range(28)]
    base_by_week = {1: 10.0, 2: -5.0, 3: 0.0, 4: 8.0}
    rows = []
    for d, hh in itertools.product(days, range(1, 25)):
        week = (d - dt.date(2023, 1, 2)).days // 7 + 1
        rows.append(
            (260, int(d.strftime("%Y%m%d")), hh, base_by_week[week] + hh * 0.01)
        )
    weather = spark.createDataFrame(
        rows, "STN int, YYYYMMDD int, HH int, Temperatuur double"
    )
    out = get_weather_data_table(weather, rolling_hours=24)
    assert out.count() == len(rows)
    flags = {
        r["week_of_year"]: (r["Koudste2ISOWkn"], r["ColdestWeekRank"])
        for r in out.select("week_of_year", "Koudste2ISOWkn", "ColdestWeekRank")
        .distinct()
        .collect()
    }
    assert flags[2] == (True, 1)
    assert flags[3] == (True, 2)
    assert flags[1][0] is False and flags[4][0] is False
    # rolling mean exists and is non-null once the half-window fills;
    # the label reflects the ACTUAL window (24h -> 1d, not a fixed "14d")
    assert (
        out.filter(F.col("RollingTemperatuur1d").isNotNull()).count() > 0
    )


def _write_minimal_xlsx(path, sheet_name, header, rows):
    """Hand-built OOXML zip covering the subset sources/xlsx.py parses
    (shared strings for text, inline numbers)."""
    import zipfile

    strings: list[str] = []

    def sref(s: str) -> int:
        if s not in strings:
            strings.append(s)
        return strings.index(s)

    def cell(ref, v):
        if isinstance(v, str):
            return f'<c r="{ref}" t="s"><v>{sref(v)}</v></c>'
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        return f'<c r="{ref}"><v>{v}</v></c>'

    def col_letter(i):
        letters = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            letters = chr(65 + rem) + letters
        return letters

    all_rows = [header, *rows]
    body = "".join(
        "<row r=\"%d\">%s</row>"
        % (ri + 1, "".join(cell(f"{col_letter(ci)}{ri + 1}", v)
                            for ci, v in enumerate(row) if v is not None))
        for ri, row in enumerate(all_rows)
    )
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    pns = "http://schemas.openxmlformats.org/package/2006/relationships"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            "xl/workbook.xml",
            f'<workbook xmlns="{ns}" xmlns:r="{rns}"><sheets>'
            f'<sheet name="{sheet_name}" sheetId="1" r:id="rId1"/>'
            f"</sheets></workbook>",
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            f'<Relationships xmlns="{pns}">'
            f'<Relationship Id="rId1" Target="worksheets/sheet1.xml" '
            f'Type="{rns}/worksheet"/></Relationships>',
        )
        zf.writestr(
            "xl/sharedStrings.xml",
            f'<sst xmlns="{ns}">'
            + "".join(f"<si><t>{s}</t></si>" for s in strings)
            + "</sst>",
        )
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            f'<worksheet xmlns="{ns}"><sheetData>{body}</sheetData></worksheet>',
        )


def test_xlsx_station_mapping_roundtrip(spark, tmp_path):
    from etdtransform_spark.sources.knmi import get_project_weather_station_data

    p = str(tmp_path / "stations.xlsx")
    _write_minimal_xlsx(
        p,
        "ProjectWeatherStation",
        ["ProjectIdBSV", "Weerstation", "Nummer"],
        [[1.0, "de bilt", 260.0], [2.0, "eelde", 280.0]],
    )
    df = get_project_weather_station_data(spark, p)
    rows = {int(r.ProjectIdBSV): (r.Weerstation, int(r.STN)) for r in df.collect()}
    assert rows == {1: ("DE BILT", 260), 2: ("EELDE", 280)}


def test_xlsx_missing_sheet_raises(spark, tmp_path):
    import pytest as _pytest

    from etdtransform_spark.sources.xlsx import read_xlsx

    p = str(tmp_path / "one.xlsx")
    _write_minimal_xlsx(p, "Other", ["a"], [[1.0]])
    with _pytest.raises(KeyError, match="ProjectWeatherStation"):
        read_xlsx(spark, p, "ProjectWeatherStation")

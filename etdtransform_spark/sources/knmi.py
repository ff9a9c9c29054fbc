"""KNMI weather ingestion.

Reference knmi.py:9-100: hourly station txt exports have N comment lines
starting with ``#``; the *last* comment line is the header. Column names are
stripped; ``# STN`` becomes ``STN``. Derived columns: Temperatuur (T/10),
Windsnelheid (FH/10), Vochtigheid (U), Dampdruk, Gevoelstemperatuur.

The header sniff is a driver-side peek at the first KB of each file (tiny);
the data itself is read distributed with ``spark.read.csv(comment='#')`` and
an explicit schema — no pandas materialization.
"""

from __future__ import annotations

import glob as globmod
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from ..functions.scalars import dampdruk, gevoelstemperatuur


def _sniff_header(path: str) -> list[str]:
    """Return the column names from the last '#' comment line."""
    last_comment = None
    with open(path) as fh:
        for line in fh:
            if line.startswith("#"):
                last_comment = line
            else:
                break
    if last_comment is None:
        raise ValueError(f"no comment header in {path}")
    cols = [c.strip() for c in last_comment.lstrip("#").split(",")]
    return ["STN" if c in ("STN", "") else c for c in cols]


def load_knmi_weather_data(spark: SparkSession, folder_path: str) -> DataFrame:
    """Read every ``*.txt`` KNMI file under ``folder_path`` and derive the
    perceived-temperature columns (reference knmi.py:49-100)."""
    paths = sorted(globmod.glob(os.path.join(folder_path, "*.txt")))
    if not paths:
        raise FileNotFoundError(f"no KNMI .txt files in {folder_path}")
    # Sniff EVERY file's header (comment lines only — cheap driver-side):
    # the schema binds positionally across all files, so a batch with an
    # extra/reordered column would silently land values in wrong columns.
    header = _sniff_header(paths[0])
    for p in paths[1:]:
        other = _sniff_header(p)
        if other != header:
            raise ValueError(
                f"KNMI header mismatch: {p} has {other}, "
                f"{paths[0]} has {header} — refusing positional misbinding"
            )
    schema = StructType([StructField(c, IntegerType(), True) for c in header])
    df = (
        spark.read.option("comment", "#")
        .option("ignoreLeadingWhiteSpace", True)
        .schema(schema)
        .csv(paths)
    )
    t = F.col("T") / 10.0
    wind = F.col("FH") / 10.0
    hum = F.col("U").cast("double")
    return df.withColumns(
        {
            "Temperatuur": t,
            "Windsnelheid": wind,
            "Vochtigheid": hum,
            "Dampdruk": dampdruk(t, hum),
            "Gevoelstemperatuur": gevoelstemperatuur(t, wind, hum),
        }
    )


def get_project_weather_station_data(
    spark: SparkSession, path: str
) -> DataFrame:
    """Station mapping (ProjectIdBSV -> Weerstation/STN). The reference reads
    the Excel sheet ``ProjectWeatherStation`` (knmi.py:9-29); here .xlsx is
    handled by the stdlib-based reader in sources/xlsx.py (no Excel engine
    in this environment), with csv/parquet variants also accepted.
    Weerstation is uppercased and STN copied from Nummer, matching the
    reference."""
    if path.endswith(".parquet"):
        df = spark.read.parquet(path)
    elif path.endswith(".xlsx"):
        from .xlsx import read_xlsx

        df = read_xlsx(spark, path, "ProjectWeatherStation")
    else:
        df = spark.read.option("header", True).option("inferSchema", True).csv(path)
    df = df.withColumn("Weerstation", F.upper(F.col("Weerstation")))
    if "Nummer" in df.columns:
        df = df.withColumn("STN", F.col("Nummer"))
    return df


def join_weather_data(
    df: DataFrame,
    weather: DataFrame,
    station_mapping: DataFrame,
    ts_col: str = "ReadingDate",
) -> DataFrame:
    """Fact table -> station mapping -> weather, via the 3-key
    (STN, YYYYMMDD, HH) equi-join with HH = hour+1 (reference
    load_data.py:260-317). Both dimension sides are broadcast."""
    from ..functions.scalars import hh_key, yyyymmdd_key

    with_station = df.join(
        F.broadcast(station_mapping.select("ProjectIdBSV", "STN")),
        "ProjectIdBSV",
        "left",
    )
    keyed = with_station.withColumns(
        {"YYYYMMDD": yyyymmdd_key(F.col(ts_col)), "HH": hh_key(F.col(ts_col))}
    )
    return keyed.join(F.broadcast(weather), ["STN", "YYYYMMDD", "HH"], "left")

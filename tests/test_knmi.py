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

"""The floor-pin discipline (CLAUDE.md 'Design rules') is load-bearing
for every hash-compared float: floor(x*scale + 0.5)/scale must be
BIT-IDENTICAL between Spark and DuckDB, including at half-way ties and
one-ulp neighbors — exactly where ROUND() diverged in round 1.

This test feeds both engines an adversarial grid of boundary doubles
(exact .xx5 ties, their one-ulp neighbors, negatives, large magnitudes)
and asserts cell equality of the pinned outputs.
"""

from __future__ import annotations

import math
import struct

import duckdb
import pytest


def _ulp_neighbors(x: float) -> list[float]:
    return [math.nextafter(x, -math.inf), x, math.nextafter(x, math.inf)]


def _grid() -> list[float]:
    vals: list[float] = []
    # half-cent ties around integers and typical money magnitudes
    for base in (0.0, 1.0, 2.0, 9.0, 99.0, 12345.0, 9876543.0):
        for frac in (0.005, 0.015, 0.125, 0.495, 0.505, 0.995):
            for sign in (1.0, -1.0):
                vals.extend(_ulp_neighbors(sign * (base + frac)))
    # 4-decimal pin boundaries (the _fix4 form)
    for base in (0.0, 0.5, 3.0):
        for frac in (0.00005, 0.12345, 0.99995):
            vals.extend(_ulp_neighbors(base + frac))
    # magnitudes where x*10000 approaches 2^53 spacing
    vals.extend([1e9 + 0.005, 123456789.0005, 1e12 + 0.5])
    return vals


@pytest.mark.parametrize("scale", [100, 10000])
def test_floor_pin_bit_identical_spark_vs_duckdb(spark, scale):
    vals = _grid()
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    from pyspark.sql import functions as F

    spark_out = [
        r.p for r in sdf.select(
            (F.floor(F.col("x") * scale + F.lit(0.5)) / scale).alias("p")
        ).collect()
    ]
    con = duckdb.connect()
    duck_out = [
        con.execute(
            f"SELECT FLOOR(? * {scale} + 0.5) / {scale}", [v]
        ).fetchone()[0]
        for v in vals
    ]
    for v, s, d in zip(vals, spark_out, duck_out):
        assert struct.pack("d", s) == struct.pack("d", d), (
            f"floor-pin diverged at x={v!r} scale={scale}: spark={s!r} duck={d!r}"
        )


def test_cents_long_identical_spark_vs_duckdb(spark):
    # The integer-cents form: CAST(FLOOR(x*100 + 0.5) AS BIGINT).
    vals = [v for v in _grid() if abs(v) < 9e13]  # keep within long cents
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    from pyspark.sql import functions as F

    spark_out = [
        r.c for r in sdf.select(
            F.floor(F.col("x") * 100 + F.lit(0.5)).cast("long").alias("c")
        ).collect()
    ]
    con = duckdb.connect()
    duck_out = [
        con.execute(
            "SELECT CAST(FLOOR(? * 100 + 0.5) AS BIGINT)", [v]
        ).fetchone()[0]
        for v in vals
    ]
    assert spark_out == duck_out

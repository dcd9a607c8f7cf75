"""Cross-engine parity of the md5-derived hash family (functions/hashfam.py):
the same strings must hash identically in Spark JVM built-ins, DuckDB SQL,
and the driver-side Python mirror — the property the minhash/simhash
oracles depend on."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from lakefs_spark.functions.hashfam import (
    MERSENNE31,
    X_MOD,
    affine_constants,
    affine_hash_py,
    base_hash_py,
)

SAMPLES = [
    "",
    "a",
    "hello world",
    "the quick brown fox",
    "unicode: éàü中文",
    "punct!@#$%^&*()",
    "0123456789" * 10,
    "trailing space ",
    " leading",
    "tab\tand\nnewline",
]


def test_base_hash_three_way(spark):
    consts = affine_constants(4)
    sdf = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    x = F.pmod(F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("long"), F.lit(X_MOD))
    cols = [x.alias("x")] + [
        F.pmod(F.lit(a) * x + F.lit(b), F.lit(MERSENNE31)).alias(f"h{i}")
        for i, (a, b) in enumerate(consts)
    ]
    spark_rows = {r["s"]: r for r in sdf.select("s", *cols).collect()}

    con = duckdb.connect()
    hs = ", ".join(
        f"({a} * x + {b}) % {MERSENNE31} as h{i}" for i, (a, b) in enumerate(consts)
    )
    duck_rows = {}
    for s in SAMPLES:
        r = con.execute(
            f"select x, {hs} from (select cast(concat('0x', substr(md5(?), 1, 15)) as bigint)"
            f" % {X_MOD} as x)",
            [s],
        ).fetchone()
        duck_rows[s] = r

    for s in SAMPLES:
        py_x = base_hash_py(s) % X_MOD
        assert spark_rows[s]["x"] == py_x == duck_rows[s][0], s
        for i, (a, b) in enumerate(consts):
            py_h = affine_hash_py(s, a, b)
            assert spark_rows[s][f"h{i}"] == py_h == duck_rows[s][i + 1], (s, i)


def test_constants_are_valid():
    consts = affine_constants(64)
    assert len(set(consts)) == 64
    for a, b in consts:
        assert 1 <= a < MERSENNE31
        assert 0 <= b < MERSENNE31

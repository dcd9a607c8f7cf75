"""Seeded randomized 3-way merge cross-check against a pure-Python
reference model (the reference's key-case table,
pkg/graveler/committed/merge.go:329-371): for random edit scripts over
a random base, the operator's merged snapshot and conflict set must
equal the model's under every strategy.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from lakefs_spark.operators import merge as M
from lakefs_spark.schema import ENTRY_SCHEMA


def _entries(spark, ids: dict[str, str]):
    rows = [
        (k, i, f"data/{i}", "RELATIVE", 1, f"e-{i}", None, None, "application/octet-stream")
        for k, i in sorted(ids.items())
    ]
    return spark.createDataFrame(rows, ENTRY_SCHEMA)


def _edit(rng, base: dict[str, str], tag: str) -> dict[str, str]:
    out = dict(base)
    for k in list(base):
        r = rng.random()
        if r < 0.15:
            del out[k]  # delete
        elif r < 0.35:
            out[k] = f"{tag}-{k}"  # change
    for j in range(rng.randrange(0, 4)):
        out[f"new/{tag}/{j}"] = f"{tag}-n{j}"  # add
    return out


def _model(base, src, dst, strategy):
    merged, conflicts = {}, set()
    for k in set(base) | set(src) | set(dst):
        b, s, d = base.get(k), src.get(k), dst.get(k)
        if s == d:
            res = d
        elif s == b:
            res = d  # only dest changed
        elif d == b:
            res = s  # only source changed
        elif strategy == "src":
            res = s
        elif strategy == "dest":
            res = d
        else:
            conflicts.add(k)
            res = d  # unresolved conflicts keep dest's row in `merged`
        if res is not None:
            merged[k] = res
    return merged, conflicts


@pytest.mark.parametrize("seed", range(6))
def test_merge_matches_model(spark, seed):
    rng = random.Random(seed)
    base = {f"k/{i:03d}": f"b{i}" for i in range(rng.randrange(5, 35))}
    src, dst = _edit(rng, base, "s"), _edit(rng, base, "d")
    bdf, sdf, ddf = _entries(spark, base), _entries(spark, src), _entries(spark, dst)
    for strategy in ("none", "src", "dest"):
        merged_df, conflicts_df = M.merge(bdf, sdf, ddf, strategy=strategy)
        got_conf = {r["key"] for r in conflicts_df.collect()}
        exp_merged, exp_conf = _model(base, src, dst, strategy)
        assert got_conf == exp_conf, (seed, strategy)
        got_merged = {
            r["key"]: r["identity"]
            for r in merged_df.select("key", "identity").collect()
        }
        assert got_merged == exp_merged, (seed, strategy)

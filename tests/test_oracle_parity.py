"""Local mirror of the driver's t2 gate: every queries() entry with an
oracle must match DuckDB row-for-row (order-insensitive) at sf0.001.

Catching a mismatch here is much cheaper than waiting for
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE, normalize_rows

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_SMOKE)
    srows = [tuple(r) for r in sdf.collect()]
    drows = duck.execute(ORACLES[name]).fetchall()
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    sn, dn = normalize_rows(srows), normalize_rows(drows)
    mism = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mism, f"{name}: first mismatches {mism[:5]}"


def test_all_queries_run(spark):
    """Queries without an oracle still must execute and return rows."""
    for name, fn in QUERIES.items():
        df = fn(spark, SF_SMOKE)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0

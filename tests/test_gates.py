"""Invariants of the 50-slot gate layout (lakefs_spark/gatespec.py).

The driver grades only the first 50 queries() entries, so the layout
must stay at exactly 50, cover every part operator exactly once, and
COLSPECS must track the live part schemas — a drifted colspec would
silently corrupt a gate's row_repr on one engine only.
"""

from __future__ import annotations

import itertools

import pytest

import __spark_entry__ as entrymod
from lakefs_spark import gatespec as GS
from tests.conftest import SF_SMOKE


def test_exactly_fifty_slots():
    q = entrymod.queries()
    assert len(q) == 50
    assert list(q) == GS.SOLO + list(GS.GATES)
    o = entrymod.oracle_sql()
    assert set(o) == set(q)


def test_parts_partition_the_operator_set():
    gate_parts = list(itertools.chain.from_iterable(GS.GATES.values()))
    assert len(gate_parts) == len(set(gate_parts)), "part used in two gates"
    assert not set(gate_parts) & set(GS.SOLO), "operator both solo and in a gate"
    all_ops = set(gate_parts) | set(GS.SOLO)
    parts = entrymod.part_queries()
    assert all_ops == set(parts), all_ops ^ set(parts)
    from lakefs_spark.sources.oracle import part_oracles

    assert all_ops == set(part_oracles())


@pytest.mark.parametrize("part", sorted(set(itertools.chain.from_iterable(GS.GATES.values()))))
def test_colspec_matches_live_schema(part, spark):
    df = entrymod.part_queries()[part](spark, SF_SMOKE)
    assert df.dtypes == GS.COLSPECS[part], (
        f"{part}: COLSPECS drifted from live schema — regenerate the entry"
    )

"""Shared relational spec: fixture views + oracle SQL, dialect-portable.

The driver's correctness gate (t2) runs each ``queries()`` DataFrame and
its ``oracle_sql()`` DuckDB query side-by-side and hash-compares values.
To make that robust, every fixture view here is defined ONCE as SQL that
parses and evaluates identically in Spark SQL and DuckDB (verified
subset: ``cast(x as string)``, ``||``, ``md5``, ``lpad``, ``instr``,
``substring``, ``%``, window functions, NOT EXISTS, FULL OUTER JOIN).
The Spark side registers these views verbatim (sources/fixtures.py) and
then runs the *Python operator implementations* on them; the oracle SQL
re-states the operator semantics relationally. Agreement therefore
validates the operator code against an independent spec.

Fixture design (FIXTURES.md): the ``orders`` table is deterministically
lifted into versioned-snapshot views keyed by ``kmod = o_orderkey % 100``:

- entries       : committed snapshot (one object per order row); keys are
                  bucketed ``tables/orders/b<okey%7>/<okey zero-padded>``
                  so delimiter listing has real groups.
- snap_a/snap_b : two refs for 2-way diff — kmod 1 only in B (added),
                  kmod 2 only in A (removed), kmod 3 changed in B.
- base/source/dest : 3-way merge inputs covering the reference's
  merge_test.go scenario classes (see kmod table in MERGE_KMODS below).
- staged_active/staged_sealed : staging layers incl. tombstones and a
  tombstone for an absent key (skip case of
  pkg/graveler/uncommitted_diff_iterator.go:51-58).
- storage_listing / uncommitted_addresses : GC universe with ~10% orphans.

Identity mirrors the reference's entry identity (content hash over
(size, etag, content_type); address excluded — pkg/catalog/entry.go:28-33)
using md5 for cross-dialect parity (the engine proper uses sha256; the
*semantics* under test don't depend on the hash function).
"""

from __future__ import annotations


def ident(size_expr: str, etag_expr: str) -> str:
    """Length-tagged identity hash, portable Spark/DuckDB."""
    return (
        f"md5(cast(length(cast({size_expr} as string)) as string) || ':' || "
        f"cast({size_expr} as string) || '|' || {etag_expr} || '|aos')"
    )


# kmod -> scenario in the 3-way merge fixtures:
#   5  source-only change            -> merged takes source
#   6  source-only delete            -> merged drops key
#   7  source-only add (~x key)      -> merged adds key
#   8  dest-only change              -> merged keeps dest
#   9  dest-only delete              -> stays deleted
#  10  dest-only add (~x key)        -> merged keeps it
#  11  both changed, differently     -> CONFLICT
#  12  both changed, same result     -> no conflict, value kept
#  13  source delete vs dest change  -> CONFLICT
#  14  source change vs dest delete  -> CONFLICT
#  15  both deleted                  -> no conflict, key gone
#  20  both added same identity      -> no conflict
#  21  both added, different         -> CONFLICT
MERGE_KMODS = {
    "src_change": (5, 11, 12, 14),
    "src_delete": (6, 13, 15),
    "src_add": (7, 20, 21),
    "dst_change": (8, 11, 13),
    "dst_change_same": (12,),
    "dst_delete": (9, 14, 15),
    "dst_add": (10, 20, 21),
}

_ENTRY_SELECT = """
    select key,
           {IDENT} as identity,
           'data/g1/' || md5('addr|' || key) as address,
           'RELATIVE' as address_type,
           size,
           {ETAG} as etag,
           'application/octet-stream' as content_type
"""


def _entry_select(etag_expr: str = "etag") -> str:
    return _ENTRY_SELECT.format(IDENT=ident("size", etag_expr), ETAG=etag_expr)


# Ordered view definitions; each may reference earlier ones.
VIEWS: dict[str, str] = {}

VIEWS["orders_ext"] = """
    select o_orderkey as okey,
           o_orderkey % 100 as kmod,
           'tables/orders/b' || (o_orderkey % 7) || '/' || lpad(cast(o_orderkey as string), 12, '0') as key,
           (o_orderkey % 997) * 100 + 57 as size,
           md5('orders|' || o_orderkey || '|' || o_orderstatus || '|' || o_orderpriority) as etag
    from orders
"""

VIEWS["entries"] = _entry_select() + " from orders_ext"

VIEWS["snap_a"] = _entry_select() + " from orders_ext where kmod <> 1"

VIEWS["snap_b"] = (
    _entry_select("case when kmod = 3 then md5(etag || '|B') else etag end")
    + " from orders_ext where kmod <> 2"
)

VIEWS["merge_base"] = _entry_select() + " from orders_ext"

VIEWS["merge_source"] = (
    _entry_select("case when kmod in (5, 11, 12, 14) then md5(etag || '|S') else etag end")
    + " from orders_ext where kmod not in (6, 13, 15)"
    + " union all "
    + _entry_select(
        "case when kmod = 20 then md5(etag || '|X') "
        "when kmod = 21 then md5(etag || '|S2') else md5(etag || '|SA') end"
    )
    + """ from (select 'tables/orders~x/' || lpad(cast(okey as string), 12, '0') as key,
                      size + 1 as size, etag, kmod
               from orders_ext where kmod in (7, 20, 21)) src_adds
"""
)

VIEWS["merge_dest"] = (
    _entry_select(
        "case when kmod in (8, 11, 13) then md5(etag || '|D') "
        "when kmod = 12 then md5(etag || '|S') else etag end"
    )
    + " from orders_ext where kmod not in (9, 14, 15)"
    + " union all "
    + _entry_select(
        "case when kmod = 20 then md5(etag || '|X') "
        "when kmod = 21 then md5(etag || '|D2') else md5(etag || '|DA') end"
    )
    + """ from (select 'tables/orders~x/' || lpad(cast(okey as string), 12, '0') as key,
                      size + 1 as size, etag, kmod
               from orders_ext where kmod in (10, 20, 21)) dst_adds
"""
)

# Staging layers. Schema: seq, is_tombstone, key, identity, address,
# address_type, size, etag, content_type (entry cols minus the two we
# keep out of the relational fixtures: last_modified, metadata).
_STAGED_ADD = """
    select {SEQ} as seq, false as is_tombstone, {KEY} as key,
           {IDENT} as identity,
           'data/staged/' || md5('s|' || {KEY}) as address,
           'RELATIVE' as address_type, size, {ETAG} as etag,
           'application/octet-stream' as content_type
"""

_STAGED_TOMB = """
    select {SEQ} as seq, true as is_tombstone, {KEY} as key,
           cast(null as string) as identity, cast(null as string) as address,
           cast(null as string) as address_type, cast(null as bigint) as size,
           cast(null as string) as etag, cast(null as string) as content_type
"""


def _staged_layer(seq: int, add_kmods, change_kmods, tomb_kmods, ghost_kmods, salt: str) -> str:
    new_key = "'tables/staged~new/' || lpad(cast(okey as string), 12, '0')"
    ghost_key = "'tables/ghost/' || lpad(cast(okey as string), 12, '0')"
    parts = [
        _STAGED_ADD.format(SEQ=seq, KEY=new_key, IDENT=ident("size + 7", f"md5(etag || '|{salt}')"), ETAG=f"md5(etag || '|{salt}')")
        + f" from orders_ext where kmod in ({', '.join(map(str, add_kmods))})",
        _STAGED_ADD.format(SEQ=seq, KEY="key", IDENT=ident("size", f"md5(etag || '|{salt}')"), ETAG=f"md5(etag || '|{salt}')")
        + f" from orders_ext where kmod in ({', '.join(map(str, change_kmods))})",
        _STAGED_TOMB.format(SEQ=seq, KEY="key")
        + f" from orders_ext where kmod in ({', '.join(map(str, tomb_kmods))})",
    ]
    if ghost_kmods:
        parts.append(
            _STAGED_TOMB.format(SEQ=seq, KEY=ghost_key)
            + f" from orders_ext where kmod in ({', '.join(map(str, ghost_kmods))})"
        )
    return " union all ".join(parts)


VIEWS["staged_active"] = _staged_layer(0, (30, 31), (32, 33), (34,), (35,), "T0")
VIEWS["staged_sealed"] = _staged_layer(1, (38,), (33, 36), (37,), (), "T1")
VIEWS["staged_all"] = "select * from staged_active union all select * from staged_sealed"

# GC universe: committed addresses + staged (uncommitted) addresses +
# ~10% orphans. The orphans are what mark must return.
VIEWS["uncommitted_addresses"] = """
    select address from staged_all where is_tombstone = false
"""

VIEWS["storage_listing"] = """
    select address from entries
    union all
    select address from staged_all where is_tombstone = false
    union all
    select 'data/orphan/' || md5('o|' || cast(okey as string)) as address
    from orders_ext where kmod >= 40 and kmod < 50
"""

# -- relational operator specs (oracle side) --------------------------------

_DIFF_SQL = """
    select coalesce(l.key, r.key) as key,
           case when l.key is null then 'added'
                when r.key is null then 'removed'
                else 'changed' end as diff_type,
           l.identity as left_identity,
           coalesce(r.identity, l.identity) as identity
    from {LEFT} l full outer join {RIGHT} r on l.key = r.key
    where l.key is null or r.key is null or l.identity <> r.identity
"""


def diff_sql(left: str, right: str) -> str:
    return _DIFF_SQL.format(LEFT=left, RIGHT=right)


# 3-way merge decision stream. s/d/b identities; null = absent.
_MERGE_ACTIONS_SQL = """
    select j.key,
           case
             when not j.s_changed then null
             when j.same then null
             when not j.d_changed then case when j.s_identity is null then 'delete' else 'set' end
             when {SRC_WINS} then case when j.s_identity is null then 'delete' else 'set' end
             when {DEST_WINS} then null
             else 'conflict'
           end as action,
           j.s_identity as identity
    from (
      select coalesce(s.key, d.key, b.key) as key,
             s.identity as s_identity, d.identity as d_identity, b.identity as b_identity,
             not (s.identity is not distinct from b.identity) as s_changed,
             not (d.identity is not distinct from b.identity) as d_changed,
             (s.identity is not distinct from d.identity) as same
      from (select key, identity from {SOURCE}) s
      full outer join (select key, identity from {DEST}) d on s.key = d.key
      left outer join (select key, identity from {BASE}) b on coalesce(s.key, d.key) = b.key
    ) j
"""


def merge_actions_sql(base: str, source: str, dest: str, strategy: str = "none") -> str:
    return _MERGE_ACTIONS_SQL.format(
        BASE=base,
        SOURCE=source,
        DEST=dest,
        SRC_WINS="true" if strategy == "src" else "false",
        DEST_WINS="true" if strategy == "dest" else "false",
    )


def merged_snapshot_sql(base: str, source: str, dest: str, strategy: str) -> str:
    """Merged snapshot: dest with resolved non-conflict changes applied.

    The actions stream is inlined as a derived table (twice) so the
    result composes with an outer WITH prefix from :func:`with_views`.
    """
    actions = merge_actions_sql(base, source, dest, strategy)
    return f"""
    select d.key, d.identity, d.size, d.etag
    from {dest} d
    where not exists (select 1 from ({actions}) a
                      where a.key = d.key and a.action is not null and a.action <> 'conflict')
    union all
    select s.key, s.identity, s.size, s.etag
    from {source} s
    join ({actions}) a on a.key = s.key and a.action = 'set'
    """


def with_views(*names: str) -> str:
    """``WITH`` prefix containing the named views + their dependencies."""
    needed: list[str] = []

    def add(n: str) -> None:
        if n in needed:
            return
        sql = VIEWS[n]
        for dep in VIEWS:
            if dep != n and dep in sql:
                add(dep)
        needed.append(n)

    for n in names:
        add(n)
    defs = ",\n".join(f"{n} as ({VIEWS[n]})" for n in needed)
    return f"with {defs}\n"

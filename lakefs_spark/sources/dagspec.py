"""Deterministic commit-DAG spec shared by the Spark queries and the
DuckDB oracle.

The commit-graph operators (log, first-parent log, merge-base, ref
resolution — SURVEY §2.9; pkg/graveler/ref/commit_iterator.go,
merge_base_finder.go, resolve_ref.go) run over the *commit graph*,
which is driver-sized at any data scale (see storage/refs.py). To make
them driver-gate-verifiable, both sides derive the SAME synthetic DAG
from this spec: the Spark side materializes it into a
``storage.refs.CommitStore`` and runs the real algorithms; the oracle
side re-derives it inside SQL (``range(N)`` + CASE formulas) and
recomputes log / merge-base / ref-walks with recursive CTEs — an
independent restatement, exactly like sources/relspec.py vs
sources/oracle.py for the relational fixtures.

Shape: a 40-commit trunk; branch A diverges at trunk@20, branch B at
trunk@30; A periodically merges in trunk commits, B periodically merges
in A commits — so ancestor sets overlap non-trivially and merge-base
answers are not just ``min(a, b)``.

Commit ids are fixed strings (``c0000``..) rather than content hashes
so the oracle can name them; the content-addressed id path
(refs.commit_id_of) is exercised by the storage-engine tests and the
Repository end-to-end queries instead.

Dates increase strictly with the commit index, so parents are always
older than children and the reference's (creation_date desc,
commit_id) iteration order equals index-descending order. (Equal-date
tie-breaking is pytest-covered; it cannot be expressed as a sorted-set
oracle because heap emission order then depends on discovery time.)
"""

from __future__ import annotations

DAG_N = 120
DATE0 = 1_700_000_000
DATE_STEP = 60

# branch name -> head commit index
BRANCHES: dict[str, int] = {"main": 39, "dev": 79, "exp": 119}
# tag name -> commit index
TAGS: dict[str, int] = {"v1": 20, "v2": 50}

# merge commits: child index -> second-parent index
A_MERGES = {i: (i - 40) // 2 + 15 for i in (48, 56, 64, 72)}  # A pulls trunk
B_MERGES = {i: 40 + (i - 80) // 2 for i in (84, 92, 100, 108, 116)}  # B pulls A


def cid(i: int) -> str:
    return f"c{i:04d}"


def date_of(i: int) -> float:
    return float(DATE0 + i * DATE_STEP)


def parent1_of(i: int) -> int | None:
    if i == 0:
        return None
    if i == 40:  # branch A diverges from trunk@20
        return 20
    if i == 80:  # branch B diverges from trunk@30
        return 30
    return i - 1


def parent2_of(i: int) -> int | None:
    return A_MERGES.get(i) or B_MERGES.get(i)


def parents_of(i: int) -> list[int]:
    out = [p for p in (parent1_of(i), parent2_of(i)) if p is not None]
    return out


def build_store(root: str):
    """Materialize the DAG into a CommitStore at ``root``; returns
    (store, branches: name->cid, tags: name->cid)."""
    from lakefs_spark.storage.refs import Commit, CommitStore

    store = CommitStore(root)
    gens: dict[int, int] = {}
    for i in range(DAG_N):
        ps = parents_of(i)
        gens[i] = 1 + max((gens[p] for p in ps), default=0)
        store.put(
            Commit(
                commit_id=cid(i),
                parents=[cid(p) for p in ps],
                metarange_id="",
                message=f"m{i}",
                committer="dag",
                creation_date=date_of(i),
                generation=gens[i],
            )
        )
    return (
        store,
        {b: cid(i) for b, i in BRANCHES.items()},
        {t: cid(i) for t, i in TAGS.items()},
    )


# ref-expression battery for the driver gate (valid expressions only;
# error cases are pytest-covered in tests/test_refs.py)
REF_EXPRS: list[str] = [
    "main",
    "dev@",
    "exp$",
    "v1",
    "v2~5",
    "main~10",
    "dev~25",
    "exp~40",
    "c0100^2",
    "c0100^2~3",
    "c0072^2~2",
    "c0116^2",
    "exp^1~2",
    "main^0",
    "c0048^2",
    "c0084^2~4",
    "c0080~1",
    "c0040~3",
    "v2^0~2",
]

# merge-base pairs (by commit index)
MB_PAIRS: list[tuple[int, int]] = [
    (79, 119),
    (39, 79),
    (39, 119),
    (20, 30),
    (72, 116),
    (10, 105),
    (48, 84),
    (119, 119),
    (0, 119),
    (59, 67),
    (44, 52),
    (95, 103),
]

# log heads / parameters shared by Spark queries and oracles
LOG_HEAD = 119  # "exp"
LOG_SINCE_IDX = 60  # since = date_of(60)

# GC active-commit-set parameters: "now" one step past the last commit;
# default retention reaches back to trunk index 80, dev's per-branch
# override reaches to 40 — so exp walks deep (crossing B-merge second
# parents, which survive as first-beyond-cutoff), dev walks its whole
# branch segment, and main's head is older than its cutoff (head-only)
GC_NOW_IDX = DAG_N  # now = date_of(120)
GC_CUTOFF_IDX = {"main": 80, "dev": 40, "exp": 80}  # branch -> cutoff index


def dag_nodes_sql() -> str:
    """DuckDB CTE body deriving (i, cid, ts, parent1, parent2) — the
    oracle-side restatement of the formulas above."""
    a_child = ", ".join(str(k) for k in A_MERGES)
    b_child = ", ".join(str(k) for k in B_MERGES)
    return f"""
dag as (
  select
    i,
    printf('c%04d', i) as cid,
    {DATE0} + i * {DATE_STEP} as ts,
    case when i = 0 then null
         when i = 40 then 20
         when i = 80 then 30
         else i - 1 end as parent1,
    case when i in ({a_child}) then (i - 40) // 2 + 15
         when i in ({b_child}) then 40 + (i - 80) // 2
         else null end as parent2
  from range({DAG_N}) t(i)
),
edges as (
  select i as child, parent1 as parent from dag where parent1 is not null
  union all
  select i as child, parent2 as parent from dag where parent2 is not null
)"""

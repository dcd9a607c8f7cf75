"""Data-quality expectation hooks: Spark-aggregation gates on commits.

The reference's flagship hook use case is vetoing a commit/merge when
the incoming data violates quality rules (pre-commit/pre-merge webhooks
running validation, docs/hooks; the Lua runners ship schema/format
validators in pkg/actions/lua). This module re-expresses that pattern
engine-side: an expectation is a named Spark aggregate over the
would-be-committed snapshot plus a predicate on the resulting scalar;
a failing expectation raises HookAbortError, so the branch head never
moves (same veto semantics as webhook.py's non-2xx abort).

Scale shape: ALL rules are evaluated in ONE aggregation pass
(`df.agg(*exprs)`) — one job, map-side partial aggregation, no matter
how many rules are attached. The observed values are logged per run
(the run-results log analog), giving an audit trail of every gate
evaluation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame

from lakefs_spark.storage.repo import HookAbortError


@dataclass(frozen=True)
class Expectation:
    """One rule: an aggregate expression + a predicate on its value.

    ``agg`` must be a single aggregate Column (e.g. ``F.count(...)``,
    ``F.min("size")``); ``predicate`` receives the scalar and returns
    whether the rule holds; ``description`` is used in abort messages.
    """

    name: str
    agg: Column
    predicate: Callable[[object], bool]
    description: str = ""


def evaluate(df: DataFrame, rules: list[Expectation]) -> list[dict]:
    """Evaluate all rules in one aggregation pass; returns one record
    per rule: {name, observed, passed}."""
    row = df.agg(*[r.agg.alias(f"e{i}") for i, r in enumerate(rules)]).first()
    out = []
    for i, r in enumerate(rules):
        observed = row[f"e{i}"]
        out.append({"name": r.name, "observed": observed, "passed": bool(r.predicate(observed))})
    return out


def expectations_hook(
    rules: list[Expectation],
    dataset: Callable[[object, str, dict], DataFrame] | None = None,
    results_sink: list | None = None,
):
    """Build a hook callable for :meth:`Repository.on`.

    By default the gated dataset is the branch's post-commit view —
    ``repo.snapshot(branch)`` (staging overlaid on committed, exactly
    what the commit would publish). Pass ``dataset`` to gate something
    else (e.g. only the staged delta, or a parsed payload table).

    Register at ``pre-commit`` / ``pre-merge``: any failing rule aborts
    the operation via HookAbortError and the evaluation records (all
    rules, observed values, pass flags) are appended to
    ``results_sink`` when given — pass a list to collect an audit
    trail alongside the repo's own run log.
    """

    def _default_dataset(repo, event: str, ctx: dict) -> DataFrame:
        branch = ctx.get("branch") or ctx.get("dest")
        return repo.snapshot(branch)

    get_df = dataset or _default_dataset

    def _hook(repo, event: str, ctx: dict) -> None:
        results = evaluate(get_df(repo, event, ctx), rules)
        if results_sink is not None:
            results_sink.extend(
                {**r, "event": event, "branch": ctx.get("branch") or ctx.get("dest")}
                for r in results
            )
        failed = [r for r in results if not r["passed"]]
        if failed:
            detail = "; ".join(f"{r['name']} (observed {r['observed']!r})" for r in failed)
            raise HookAbortError(f"expectations failed: {detail}")

    return _hook

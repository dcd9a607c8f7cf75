#!/usr/bin/env python
"""Time every declared query (noop sink) and dump .explain("formatted").

Round-10 measurement harness (guide §1.4/§1.5): each declared query in
__spark_entry__.queries() is planned once, its formatted plan written
to plans/r10/<name>_<tag>.txt, then executed against the noop sink
with a job description so UI/event logs attribute the time.

Usage: python tools/time_queries.py <tag> [sf_dir] [name_filter...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names_filter = set(sys.argv[3:])

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    import __spark_entry__ as em
    from lakefs_spark.session import get_spark

    spark = get_spark("time_queries")
    sc = spark.sparkContext
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)

    passes = max(1, int(os.environ.get("SPARK_GRAFT_SWEEP_PASSES", "1")))
    Q = em.queries()
    all_timings: list[dict[str, float]] = []
    for p in range(passes):
        timings: dict[str, float] = {}
        for name, fn in Q.items():
            if names_filter and name not in names_filter:
                continue
            t0 = time.time()
            try:
                df = fn(spark, sf)
                if p == 0:
                    plan = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
                    with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
                        f.write(plan)
                sc.setJobDescription(f"{name} [{tag} p{p}]")
                df.write.format("noop").mode("overwrite").save()
                sc.setJobDescription(None)
                timings[name] = round(time.time() - t0, 3)
                print(f"p{p} {name}: {timings[name]}s", flush=True)
            except Exception as e:  # noqa: BLE001
                timings[name] = -1.0
                print(f"p{p} {name}: ERROR {e!r}", flush=True)
        all_timings.append(timings)
    print(json.dumps({"tag": tag, "sf": sf, "timings": all_timings[-1],
                      "passes": all_timings}), flush=True)


if __name__ == "__main__":
    main()

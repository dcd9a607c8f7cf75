#!/usr/bin/env python
"""Time individual gate MEMBERS (noop sink, guide §1.4) with warm passes.

Usage: python tools/time_members.py <passes> <member...>
Members are part_queries() names (e.g. contamination, minhash_jaccard_est).
Prints per-pass seconds per member plus a JSON line at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    passes = int(sys.argv[1])
    names = sys.argv[2:]
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    import __spark_entry__ as em
    from lakefs_spark.session import get_spark

    spark = get_spark("time_members")
    sc = spark.sparkContext
    parts = em.part_queries()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out: dict[str, list[float]] = {n: [] for n in names}
    for p in range(passes):
        for name in names:
            t0 = time.time()
            try:
                df = parts[name](spark, sf)
                sc.setJobDescription(f"member {name} p{p}")
                df.write.format("noop").mode("overwrite").save()
                sc.setJobDescription(None)
                out[name].append(round(time.time() - t0, 3))
                print(f"p{p} {name}: {out[name][-1]}s", flush=True)
            except Exception as e:  # noqa: BLE001
                out[name].append(-1.0)
                print(f"p{p} {name}: ERROR {e!r}", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

"""Fresh-JVM IVF build probe: the canonical build_ivf_s source.

The in-session IVF build wall in bench.py moved 2.5-3x with the memory
pressure of the 50 queries that ran before it (r12 verdict item 4),
while probe/brute timings stayed stable. This CLI runs ONLY the IVF
train+build in a process of its own — fresh JVM, fresh python heap —
and prints one JSON line keyed by actual corpus rows; bench.py invokes
it as a subprocess and records these as the canonical build numbers.

Usage: python tools/ann_build_probe.py [sf_dir] [corpus_rows ...]
       (defaults: /root/testdata/sf0.1, 131072 1310720)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributedqueryengine_spark.annbench import ivf_build_probe  # noqa: E402
from distributedqueryengine_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and not args[0].isdigit() else "/root/testdata/sf0.1"
    sizes = [int(a) for a in args if a.isdigit()] or [131072, 1310720]
    spark = get_spark("ann-build-probe")
    # warm-up AT THE LARGEST TARGET SIZE: a tiny warm-up absorbs JVM
    # start + python-UDF spinup but not the large-scale path (JIT for
    # the bigger loops, Arrow batch sizing, page cache) — measured:
    # the first 1.3M build in a JVM runs ~13s, every later one ~7.5s.
    # One discarded full-size build puts all measured runs in the
    # converged regime a long-running cluster lives in.
    ivf_build_probe(spark, sf_dir, corpus_rows=max(sizes))
    out = {}
    for rows in sizes:
        # min-of-3 (the baseline_min3 noise discipline): single-shot
        # build walls on a shared box spread ~1.5x — the driver-side
        # k-means matmul is at the mercy of GC/page-cache state — and
        # the min is the number independent probe invocations converge
        # on. All raw runs are recorded for transparency.
        runs = [ivf_build_probe(spark, sf_dir, corpus_rows=rows) for _ in range(3)]
        best = min(runs, key=lambda r: r["build_ivf_s"])
        best["build_runs_s"] = [r["build_ivf_s"] for r in runs]
        out[str(best["corpus_rows"])] = best
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

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
    # warm-up: the process's FIRST build pays JVM start + python-UDF
    # worker spinup (~14s measured at 131k) that a long-running cluster
    # amortizes to zero; a throwaway tiny build absorbs it so each
    # measured size times the build, not the cold start.
    ivf_build_probe(spark, sf_dir, corpus_rows=4096)
    out = {}
    for rows in sizes:
        r = ivf_build_probe(spark, sf_dir, corpus_rows=rows)
        out[str(r["corpus_rows"])] = r
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

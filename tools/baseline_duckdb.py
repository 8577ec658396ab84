"""Side-by-side wall-clock: Spark headline queries vs DuckDB oracles.

Context for the bench gate: DuckDB running the oracle SQL single-node
is the floor for small scale factors (no task scheduling, no JVM);
Spark carries ~100-300 ms/query of fixed stage overhead locally that
amortizes to zero on a cluster. Use this to tell real regressions
(per-query ratio jumps) from overhead noise.

Usage: python tools/baseline_duckdb.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from bench import HEADLINE, force  # noqa: E402
from distributedqueryengine_spark.session import TABLES, get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    spark = get_spark("baseline-compare")
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    tot_s = tot_d = 0.0
    for name in HEADLINE:
        if name not in qs:
            continue
        df = qs[name](spark, sf_dir)
        force(df)  # warm
        t0 = time.monotonic()
        force(qs[name](spark, sf_dir))
        ts = time.monotonic() - t0
        tot_s += ts
        if name in oracles:
            t0 = time.monotonic()
            con.execute(oracles[name]).fetchall()
            td = time.monotonic() - t0
            tot_d += td
            print(f"{name:30s} spark={ts:6.3f}s duckdb={td:6.3f}s ratio={ts/max(td,1e-9):5.1f}x")
        else:
            print(f"{name:30s} spark={ts:6.3f}s duckdb=   n/a")
    print(f"\nTOTAL spark={tot_s:.2f}s duckdb(oracled)={tot_d:.2f}s")


if __name__ == "__main__":
    main()

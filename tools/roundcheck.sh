#!/bin/sh
# Run every verification gate in sequence, as the driver/judge would:
# driver-contract correctness (DuckDB oracle), the full pytest suite,
# the bench CLI, and the plan audit. Exits nonzero on first failure.
set -e
cd "$(dirname "$0")/.."
echo "== correctness (sf0.01 oracle) =="
python tools/check_correctness.py /root/testdata/sf0.01
echo "== pytest =="
python -m pytest tests/ -q
echo "== bench (sf from SPARK_GRAFT_SF_DIR, default sf0.1) =="
python bench.py
echo "== plan audit =="
python tools/plan_audit.py
echo "ALL GATES GREEN"

#!/bin/sh
# Run every verification gate in sequence, as the driver/judge would:
# driver-contract correctness (DuckDB oracle), the full pytest suite,
# the bench CLI, and the plan audit. Exits nonzero on first failure.
set -e
cd "$(dirname "$0")/.."
echo "== environment-pinned partials status =="
# The two declared partials self-heal if the container ever gains the
# dependency: multimodal codec bodies need PIL/ffmpeg, and
# transformWithState needs protobuf. Re-check availability each round.
python - <<'PYEOF'
for mod, what in (("PIL", "multimodal codec bodies (fake=False)"),
                  ("google.protobuf", "transformWithState streaming")):
    try:
        __import__(mod)
        print(f"  AVAILABLE now: {mod} -> un-pin {what}")
    except ImportError:
        print(f"  still absent: {mod} ({what} stays pinned-partial)")
PYEOF
echo "== correctness (sf0.01 oracle) =="
python tools/check_correctness.py /root/testdata/sf0.01
echo "== pytest =="
python -m pytest tests/ -q
echo "== bench (sf from SPARK_GRAFT_SF_DIR, default sf0.1) =="
python bench.py
echo "== plan audit =="
python tools/plan_audit.py
echo "ALL GATES GREEN"

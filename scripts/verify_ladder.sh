#!/usr/bin/env bash
# One-command verification ladder: every gate a round-close requires.
#
#   bash scripts/verify_ladder.sh          # full ladder (~45 min)
#   bash scripts/verify_ladder.sh quick    # sf0.001 + nulls + empty only
#
# Order: cheap fixture builds -> full strict gates on every corpus
# (clean sf0.01 = the driver's scale, then the degenerate corpora that
# catch NULL/empty/ordering/unicode divergences) -> full pytest.
# Bench is NOT here (needs an idle host; run `python bench.py` alone).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== building fixtures =="
python scripts/make_null_fixture.py
python scripts/make_empty_fixture.py
python scripts/make_one_row_fixture.py
python scripts/make_shuffled_fixture.py
python scripts/make_unicode_fixture.py

run_gate() {
  echo "== strict gate: $1 =="
  python tests/oracle_harness.py "$1" --strict 2>&1 \
    | grep -E "FAIL|MISMATCH|EXCEPTION|queries match"
}

run_gate /root/testdata/sf0.001
run_gate /tmp/sf_nulls
run_gate /tmp/sf_empty

if [ "${1:-full}" != "quick" ]; then
  run_gate /tmp/sf_one
  run_gate /tmp/sf_shuffled
  run_gate /tmp/sf_unicode
  run_gate /root/testdata/sf0.01
  echo "== full pytest =="
  python -m pytest tests/ -x -q | tail -2
fi
echo "== ladder complete =="

#!/usr/bin/env bash
# Full CI sweep: unit/integration tests (forced-CPU 8-device mesh), the
# multi-chip dry-run, and a single-chip bench smoke. Run from the repo root.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== tests =="
python -m pytest tests/ -q

echo "== multichip dryrun (8 virtual CPU devices) =="
python __graft_entry__.py

echo "== e2e product loop (gen -> pack -> train -> eval -> export -> serve) =="
# ~25 min on one CPU core; SKIP_E2E=1 skips it for quick iterations.
if [ -z "${SKIP_E2E:-}" ]; then
  bash scripts/e2e.sh
fi

echo "== bench (real chip if available) =="
python bench.py

echo "CI OK"

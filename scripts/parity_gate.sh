#!/usr/bin/env bash
# Pre-handoff oracle-parity gate: every registered query vs its DuckDB twin
# at the DRIVER'S scale factor (sf0.01) — the only oracle coverage the
# queries beyond the driver's 50-key alphabetical cap ever get. Run before
# ending a round; a green run here is the de-facto correctness gate for the
# cap-shadowed queries.
#
#   ./scripts/parity_gate.sh            # sf0.01 (driver scale)
#   SF=/root/testdata/sf0.1 ./scripts/parity_gate.sh
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${SF:-/root/testdata/sf0.01}"
echo "parity gate @ ${SF}"
SPARK_GRAFT_TEST_SF_DIR="${SF}" python -m pytest tests/test_parity_all.py -q

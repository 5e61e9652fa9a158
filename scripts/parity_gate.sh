#!/usr/bin/env bash
# Pre-handoff oracle-parity gate: every registered query vs its DuckDB twin
# at BOTH the pytest fixture scale (sf0.001) and the driver's scale
# (sf0.01). Round 4 proved one SF is not enough: agg_trimmed_mean was green
# at sf0.01 and crashed at sf0.001 (small groups hit a different code
# path). A green run here is the de-facto correctness gate for the queries
# beyond the driver's 50-key alphabetical cap.
#
#   ./scripts/parity_gate.sh                 # both SFs
#   SF=/root/testdata/sf0.1 ./scripts/parity_gate.sh   # one explicit SF
set -euo pipefail
cd "$(dirname "$0")/.."
if [[ -n "${SF:-}" ]]; then
  echo "parity gate @ ${SF}"
  SPARK_GRAFT_TEST_SF_DIR="${SF}" python -m pytest tests/test_parity_all.py -q
else
  for sf in /root/testdata/sf0.001 /root/testdata/sf0.01; do
    echo "parity gate @ ${sf}"
    SPARK_GRAFT_TEST_SF_DIR="${sf}" python -m pytest tests/test_parity_all.py -q
  done
fi

#!/usr/bin/env bash
# HARDWARE GATE — mechanized form of the CLAUDE.md pre-commit rule.
#
# Any commit touching ssme_tpu/ops/ MUST pass this script ON THE CHIP
# first.  CPU tests run the Pallas kernels in interpret mode and cannot
# catch Mosaic scoped-VMEM overflows or hardware-PRNG issues; round 2
# shipped a kernel that failed TPU compilation because this gate was a
# convention rather than a script (see VERDICT.md r3 "weak" item 5).
#
# Exits nonzero on ANY failure.  Run as:  scripts/hwgate.sh
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== hwgate 1/2: examples/validate_tpu.py --quick =="
timeout 1800 python examples/validate_tpu.py --quick

echo "== hwgate 2/2: 4-iter bench, both schedules (rc must be 0) =="
BENCH_ITERS=4 BENCH_REPLICATES=4 timeout 3600 python bench.py

echo "hwgate PASS"

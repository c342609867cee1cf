#!/usr/bin/env bash
# Pre-snapshot gate (VERDICT r3 #3: "suite green before snapshot").
#
# Runs BOTH suites -- fast and slow -- on the CPU backend exactly like CI,
# and refuses to pass on any failure.  Run this before every end-of-round
# commit; the round-3 snapshot shipped a red slow test because nothing
# forced the slow suite to run.
#
# Usage: tools/check.sh [extra pytest args]
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_PLATFORMS=cpu
export XLA_FLAGS="${XLA_FLAGS:---xla_force_host_platform_device_count=8}"

echo "== fast suite =="
python -m pytest tests/ -q -m "not slow" "$@"
echo "== slow suite =="
python -m pytest tests/ -q -m "slow" "$@"
echo "ALL GREEN"

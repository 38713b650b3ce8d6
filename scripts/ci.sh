#!/usr/bin/env bash
# CI driver: native build + CPU test suite + multi-chip dry-run,
# the same gates the reference's Dockerfile runs (bazel build/test + JS
# tests, Dockerfile:1-26) adapted to this framework's layout.
#
# Default: the fast gate (everything except the full-size builtin-pool
# STARKs, which are marked `slow`), parallelized over 4 workers so the
# per-module XLA compiles overlap. CI_FULL=1 adds the slow batch.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native library =="
cmake -S . -B build -G Ninja >/dev/null
cmake --build build >/dev/null
test -f stark_perpetual_tpu/runtime/_starkcrypto.so

echo "== unit + integration tests (8 virtual CPU devices) =="
python -m pytest tests/ -q -m "not slow" -n "${CI_WORKERS:-4}"

if [[ "${CI_FULL:-0}" == "1" ]]; then
  echo "== full-size builtin-pool STARKs (slow batch) =="
  python -m pytest tests/ -q -m "slow"
fi

if command -v node >/dev/null 2>&1; then
  echo "== wallet JS tests =="
  (cd js && node test/run.js)
else
  echo "== wallet JS tests: skipped (no node runtime) =="
fi

echo "== multi-chip sharding dry-run =="
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"

echo "CI green"

#!/bin/bash
# Hardware re-validation sequence after a TPU tunnel outage (the axon
# tunnel dies without warning — CLAUDE.md "Environment gotchas"). Runs
# the on-chip gates first, then the headline bench, then the per-config
# table. Each stage logs to /tmp so a dropped session can pick up the
# results. Bench stages inherit bench.py's own watchdog/retry env knobs
# (ARMON_BENCH_TIMEOUT / ARMON_BENCH_INIT_TIMEOUT / ARMON_BENCH_ATTEMPTS).
set -uo pipefail
cd "$(dirname "$0")/.."

echo "== probe =="
if ! timeout 240 python -c "import jax; d = jax.devices(); \
assert d and d[0].platform != 'cpu', d; print('TPU alive:', d)"; then
    echo "tunnel still dead (jax.devices() hung or CPU-only) — aborting"
    exit 2
fi

echo "== tpu_validate =="
python scripts/tpu_validate.py 2>&1 | tee /tmp/tpu_validate_last.log
vstatus=${PIPESTATUS[0]}

echo "== bench (headline) =="
python bench.py 2>&1 | tee /tmp/bench_last.log
bstatus=${PIPESTATUS[0]}

echo "== bench_configs (per-config table -> BENCH_CONFIGS.md) =="
python scripts/bench_configs.py 2>&1 | tee /tmp/bench_configs_last.log
cstatus=${PIPESTATUS[0]}

echo "== summary: validate=$vstatus bench=$bstatus configs=$cstatus =="
exit $((vstatus || bstatus || cstatus))

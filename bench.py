"""Benchmark: cell-updates/sec/chip on the Sod shock tube.

The reference's own metric is `giga_cells_per_sec` (cell-cycles/sec,
`src/solver.jl:19,386-394`); the north-star target is >= 5e9 cell-updates/s
per chip (BASELINE.json). Prints one JSON line.

Run on the real TPU chip; falls back to whatever jax.default_backend() is.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE = 5e9  # cell-updates/s/chip target (BASELINE.md)


def bench(n=8192, dtype=np.float32, cycles=50, tier=None, ny=None,
          test="Sod", init_done=None):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    # The axon TPU plugin overrides JAX_PLATFORMS; this knob still wins
    # (CPU smoke tests of the bench harness itself).
    plat = os.environ.get("ARMON_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.devices()  # force PJRT init (the tunnel-hang point)
    if init_done is not None:
        init_done.set()
    if np.dtype(dtype).itemsize == 8:
        jax.config.update("jax_enable_x64", True)
    from armon_tpu import ArmonParameters
    from armon_tpu.core.solver import make_init, make_jit_loop

    ny = ny or n
    tier = tier or os.environ.get("ARMON_BENCH_TIER", "pallas")
    params = ArmonParameters(
        test=test, N=(n, ny), data_type=dtype, scheme="GAD",
        projection="euler_2nd", riemann_limiter="minmod", nghost=4,
        maxcycle=cycles, maxtime=1e30, silent=5, measure_time=False,
        kernel_tier=tier,
    )
    init = make_init(params)
    state = init()
    loop = make_jit_loop(params)

    # Warm-up / compile. NOTE: on the axon TPU platform block_until_ready
    # does not actually synchronize — a host read of an output scalar does.
    out = loop(state)
    _ = float(np.asarray(out[1]))

    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        state2, t, ran_cycles, dt, lm, ok = loop(state)
        _ = float(np.asarray(t))  # forces completion
        elapsed = time.perf_counter() - t0
        best = min(best, elapsed)

    ran = int(ran_cycles)
    assert bool(ok) and ran == cycles, (ran, bool(ok))
    cells_per_sec = n * ny * ran / best
    return cells_per_sec, best, ran


def main():
    # Retry harness: PJRT init is once-per-process, so a wedged device
    # tunnel can only be retried from a FRESH process. The parent re-execs
    # itself up to ARMON_BENCH_ATTEMPTS times (default 3) and forwards the
    # child's single JSON line; children that hang are cut short by the
    # init watchdog below. Behavior with a healthy tunnel is unchanged
    # (first child succeeds, one line on stdout).
    if os.environ.get("ARMON_BENCH_CHILD") != "1":
        import subprocess

        attempts = max(1, int(os.environ.get("ARMON_BENCH_ATTEMPTS", "3")))
        retry_wait = float(os.environ.get("ARMON_BENCH_RETRY_WAIT", "30"))
        env = dict(os.environ, ARMON_BENCH_CHILD="1")
        last = None
        for i in range(attempts):
            proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                  env=env, capture_output=True, text=True)
            line = next((ln for ln in reversed(proc.stdout.splitlines())
                         if ln.startswith("{")), None)
            last = line or last
            if line is not None and '"error"' not in line:
                print(line, flush=True)
                return
            sys.stderr.write("# bench attempt %d/%d failed: %s\n" % (
                i + 1, attempts,
                line or (proc.stderr or "no output")[-300:].replace("\n", " ")))
            sys.stderr.flush()
            if i + 1 < attempts:
                time.sleep(retry_wait)
        print(last or json.dumps({
            "metric": "cell-updates/sec/chip",
            "value": 0.0, "unit": "cells/s", "vs_baseline": 0.0,
            "error": "all %d bench attempts died without output" % attempts,
        }), flush=True)
        return

    n = int(os.environ.get("ARMON_BENCH_N", "8192"))
    ny = int(os.environ.get("ARMON_BENCH_NY", "0")) or n
    # 150 cycles ~ 2.2 s/run at the headline size: the per-dispatch tunnel
    # round-trip (~26 ms, measured via a scalar-only loop in
    # scripts/probe_small.py) stays < 1.5% of the measurement.
    cycles = int(os.environ.get("ARMON_BENCH_CYCLES", "150"))
    dtype = np.float32 if os.environ.get("ARMON_BENCH_DTYPE", "f32") == "f32" \
        else np.float64
    test = os.environ.get("ARMON_BENCH_TEST", "Sod")

    # Watchdog: a wedged device tunnel hangs inside native PJRT init (no
    # exception, no output, and signals can't preempt the C code). A
    # daemon thread turns that into the zero-measurement error line
    # instead of dying silently under the caller's timeout — which also
    # lets the parent retry with a fresh process. Two deadlines: device
    # enumeration must finish within ARMON_BENCH_INIT_TIMEOUT (240 s —
    # init is seconds when healthy; only compiles take minutes), the
    # whole run within ARMON_BENCH_TIMEOUT (2400 s, far beyond any
    # fresh-compile path, ~3 min measured).
    import threading

    deadline = float(os.environ.get("ARMON_BENCH_TIMEOUT", "2400"))
    init_deadline = float(os.environ.get("ARMON_BENCH_INIT_TIMEOUT", "240"))
    done = threading.Event()
    init_done = threading.Event()

    def _fail(msg):
        print(json.dumps({
            "metric": "cell-updates/sec/chip (%s %dx%d GAD+minmod "
                      "euler_2nd)" % (test, n, ny),
            "value": 0.0, "unit": "cells/s", "vs_baseline": 0.0,
            "error": msg,
        }), flush=True)
        os._exit(2)

    def _watchdog():
        t0 = time.monotonic()
        if not init_done.wait(init_deadline):
            _fail("device init hung for ARMON_BENCH_INIT_TIMEOUT=%.0fs "
                  "(device tunnel dead?)" % init_deadline)
        remaining = deadline - (time.monotonic() - t0)
        if not done.wait(max(remaining, 1.0)):
            _fail("no measurement within ARMON_BENCH_TIMEOUT=%.0fs "
                  "(device tunnel hung?)" % deadline)

    threading.Thread(target=_watchdog, daemon=True).start()

    try:
        value, elapsed, ran = bench(n=n, ny=ny, dtype=dtype, cycles=cycles,
                                    test=test, init_done=init_done)
        done.set()
    except Exception as e:  # report failure as a zero measurement
        done.set()
        print(json.dumps({
            "metric": "cell-updates/sec/chip (%s %dx%d GAD+minmod euler_2nd)"
                      % (test, n, ny),
            "value": 0.0, "unit": "cells/s", "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:300],
        }))
        return

    print(json.dumps({
        "metric": f"cell-updates/sec/chip ({test} {n}x{ny} "
                  f"{np.dtype(dtype).name} GAD+minmod euler_2nd, {ran} cycles)",
        "value": round(value, 1),
        "unit": "cells/s",
        "vs_baseline": round(value / BASELINE, 4),
    }))


if __name__ == "__main__":
    main()

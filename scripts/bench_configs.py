"""Run the BASELINE.json measurement configs and write BENCH_CONFIGS.md
(table only — BENCH_NOTES.md is hand-maintained; merge numbers there).

Configs (BASELINE.md):
 1. Sod 100x100 (the CPU-reference scale — dominated by launch overhead)
 2. Sod_circ + Sod_y 1000^2, GAD minmod
 3. Sedov 2000^2, 2nd-order remap + CFL dt
 4. Bizarrium 4000^2 (stiff EOS path)
 5. 16384^2 Sod weak-scaled on a v5p-16 mesh — requires multi-chip HW; on a
    single chip we run the largest size that fits instead.

Usage: python scripts/bench_configs.py [--dtype f32|f64] [--tier pallas|jnp]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_config(name, test, n, cycles, dtype, tier, fast=True):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    if np.dtype(dtype).itemsize == 8:
        # Only armon() auto-enables x64; this harness drives the loop
        # builders directly — without this the 'f64' rows would silently
        # measure f32 math (arrays downcast with only a warning).
        jax.config.update("jax_enable_x64", True)
    from armon_tpu import ArmonParameters
    from armon_tpu.core.solver import (make_init, make_jit_loop,
                                       make_init_fused, make_jit_loop_lean)
    from armon_tpu.core.step import use_fused_tier

    N = n if isinstance(n, tuple) else (n, n)
    p = ArmonParameters(
        test=test, N=N, data_type=dtype, scheme="GAD",
        projection="euler_2nd", riemann_limiter="minmod", nghost=4,
        maxcycle=cycles, maxtime=1e30, silent=5, measure_time=False,
        kernel_tier=tier, use_fast_math=fast)
    if use_fused_tier(p.config):
        # The lean 5-field driver, same as bench.py: it is what lets the
        # literal 16384^2 row fit one 16 GB chip (~10.7 GB vs 16+ OOM).
        T = np.dtype(dtype).type
        state, local0 = make_init_fused(p)()
        loop_lean = make_jit_loop_lean(p)

        def loop(s):
            return loop_lean(s, T(0.0), np.int32(0), T(0.0), local0)
    else:
        state = make_init(p)()
        loop = make_jit_loop(p)
    out = loop(state)
    _ = float(np.asarray(out[1]))  # sync (block_until_ready may not)

    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        out = loop(state)
        _ = float(np.asarray(out[1]))
        best = min(best, time.perf_counter() - t0)
    ran = int(out[2])
    if not bool(out[5]) or ran != cycles:
        # An early invalid-dt abort must not be recorded as a normal row.
        raise RuntimeError(f"run aborted: ok={bool(out[5])} after "
                           f"{ran}/{cycles} cycles (invalid dt?)")
    cells = N[0] * N[1]
    cells_s = cells * ran / best
    return {"config": name, "test": test, "N": f"{N[0]}x{N[1]}",
            "cycles": ran,
            "dtype": np.dtype(dtype).name, "tier": tier,
            "fast_math": fast,
            "seconds": round(best, 4),
            "cells_per_sec": round(cells_s, 1),
            "grind_ns_per_cell_cycle": round(best / ran / cells * 1e9, 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="f32", choices=["f32", "f64"])
    ap.add_argument("--tier", default="pallas", choices=["pallas", "jnp"])
    ap.add_argument("--strict", action="store_true",
                    help="strict IEEE divides (use_fast_math=False)")
    ap.add_argument("--out", default="BENCH_CONFIGS.md",
                    help="per-config table output (kept separate from "
                         "the hand-maintained BENCH_NOTES.md)")
    args = ap.parse_args()
    args.fast = not args.strict
    dtype = np.float32 if args.dtype == "f32" else np.float64

    import jax
    backend = jax.default_backend()
    dev = str(jax.devices()[0])

    # Cycle counts sized so the per-dispatch tunnel round-trip (~26 ms,
    # scripts/probe_small.py) stays under ~2% of each measurement. The
    # round-3 counts still left 8-58% RTT in rows 1-3 (1000^2 x 1000
    # cycles = 211 ms wall of which 26 ms was RTT — the XPlane trace
    # shows the in-loop device cycle is 183 us, i.e. 5.4e9 cells/s, vs
    # the 4.7e9 the polluted window reported). Target >= ~1.5 s of chip
    # time per dispatch.
    configs = [
        ("1. Sod 100x100 (reference scale)", "Sod", 100, 30000),
        ("2a. Sod_circ 1000^2", "Sod_circ", 1000, 8000),
        ("2b. Sod_y 1000^2", "Sod_y", 1000, 8000),
        ("3. Sedov 2000^2", "Sedov", 2000, 2000),
        ("4. Bizarrium 4000^2", "Bizarrium", 4000, 600),
        ("4b. Sod 4000^2 (stiff-premium base)", "Sod", 4000, 600),
        ("5. Sod 8192^2", "Sod", 8192, 150),
        # Config 5 at its LITERAL extent on one chip: the lean 5-field
        # fused driver brings 16384^2 f32 to ~10.7 GB resident (it OOMs
        # through the 11-field path) — round-5, BENCH_NOTES.
        ("5b. Sod 16384^2 (flagship extent, lean driver)", "Sod",
         16384, 150),
        ("5c. Sod 16384x4096 strip", "Sod", (16384, 4096), 150),
    ]

    results = []
    for name, test, n, cycles in configs:
        try:
            r = run_config(name, test, n, cycles, dtype, args.tier, args.fast)
        except Exception as e:
            r = {"config": name, "error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps(r), flush=True)
        results.append(r)

    with open(args.out, "w") as f:
        f.write(f"# Benchmark notes\n\nDevice: {dev} (backend {backend}), "
                f"dtype {args.dtype}, tier {args.tier}, "
                f"fast_math={args.fast}\n\n")
        f.write("| config | cells/s | grind ns/cell/cycle | seconds | cycles |\n")
        f.write("|---|---|---|---|---|\n")
        for r in results:
            if "error" in r:
                f.write(f"| {r['config']} | ERROR: {r['error']} | | | |\n")
            else:
                f.write(f"| {r['config']} | {r['cells_per_sec']:.3g} | "
                        f"{r['grind_ns_per_cell_cycle']} | {r['seconds']} | "
                        f"{r['cycles']} |\n")
        f.write("\nTarget (BASELINE.md): >= 5e9 cell-updates/s/chip on TPU "
                "v5p. Single-chip numbers above are from the dev chip; see "
                "docs/architecture.md for its measured bandwidth ceilings.\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

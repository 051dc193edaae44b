"""Scaling harness: weak/strong scaling over a device mesh.

On real multi-chip hardware this measures the BASELINE.json weak-scaling
config (16384² Sod weak-scaled). Without it (`--virtual N`), it runs the
same sharded programs on N virtual CPU devices — validating the collective
schedule and measuring parallel overheads, not TPU throughput.

    python scripts/scaling.py --virtual 8 --n-per-device 512 --cycles 10
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices")
    ap.add_argument("--n-per-device", type=int, default=512)
    ap.add_argument("--cycles", type=int, default=0,
                    help="default: 10 on the virtual CPU mesh (schedule "
                         "validation), 150 on hardware (so the ~26 ms "
                         "dispatch RTT stays a few %% of the measurement)")
    ap.add_argument("--reps", type=int, default=3,
                    help="best-of-N timing reps (inter-process drift is "
                         "2-3%%; see CLAUDE.md)")
    ap.add_argument("--dtype", default="f32", choices=["f32", "f64"])
    args = ap.parse_args()
    if args.cycles == 0:
        args.cycles = 10 if args.virtual else 150

    if args.virtual:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count={args.virtual}").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np
    if args.dtype == "f64":
        jax.config.update("jax_enable_x64", True)
    dtype = np.float32 if args.dtype == "f32" else np.float64

    from armon_tpu import ArmonParameters
    from armon_tpu.core.solver import make_init, make_jit_loop

    ndev = len(jax.devices())
    meshes = []
    p = 1
    while p <= ndev:
        px = int(np.floor(np.sqrt(p)))
        while p % px:
            px -= 1
        meshes.append((px, p // px))
        p *= 2

    results = []
    for px, py in meshes:
        n = (args.n_per_device * px, args.n_per_device * py)  # weak scaling
        params = ArmonParameters(test="Sod", N=n, data_type=dtype,
                                 P=(px, py), maxcycle=args.cycles,
                                 maxtime=1e30, silent=5, measure_time=False)
        state = make_init(params)()
        loop = make_jit_loop(params)
        out = loop(state)
        _ = float(np.asarray(out[1]))  # warm-up / compile
        dt = float("inf")
        for _rep in range(args.reps):
            t0 = time.perf_counter()
            out = loop(state)
            _ = float(np.asarray(out[1]))
            dt = min(dt, time.perf_counter() - t0)
        ran = int(out[2])
        if not bool(out[5]) or ran != args.cycles:
            raise RuntimeError(f"mesh {px}x{py}: run aborted after "
                               f"{ran}/{args.cycles} cycles")
        cells = n[0] * n[1] * ran
        r = {"mesh": f"{px}x{py}", "N": n, "seconds": round(dt, 4),
             "cells_per_sec": round(cells / dt, 1)}
        results.append(r)
        print(json.dumps(r), flush=True)

    base = results[0]["cells_per_sec"]
    for r, (px, py) in zip(results, meshes):
        eff = r["cells_per_sec"] / (base * px * py)
        print(f"mesh {r['mesh']}: weak-scaling efficiency {eff:.2%}")


if __name__ == "__main__":
    main()

"""Time the per-sweep kernels (X: full-width row tiles; Y: 2D tiles) against
the fused cycle kernel — isolates whether the full-width cycle kernel is
limited by its tile shape (VMEM pressure / spills), pointing at a 2D-tiled
cycle kernel as the fix.

Usage: python scripts/probe_sweeps.py [N] [tile_c ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from armon_tpu import ArmonParameters
from armon_tpu.utils.enums import Axis
from armon_tpu.ops.pallas.sweep import fused_sweep, fused_cycle


def timeit(fn, sync, reps=20):
    out = fn()
    _ = sync(out)
    best = float("inf")
    for _r in range(3):
        t0 = time.perf_counter()
        for _i in range(reps):
            out = fn()
        _ = sync(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    tile_cs = [int(a) for a in sys.argv[2:]] or [None, 512, 1024, 2048]

    key = jax.random.PRNGKey(0)
    params = ArmonParameters(test="Sod", N=(n, n), data_type=np.float32,
                             maxcycle=1, silent=5, measure_time=False)
    cfg = params.config
    rows, cols = cfg.local_shape
    ks = jax.random.split(key, 4)
    rho = jax.random.uniform(ks[0], (rows, cols), jnp.float32, 0.5, 2.0)
    u = jax.random.uniform(ks[1], (rows, cols), jnp.float32, -0.1, 0.1)
    v = jax.random.uniform(ks[2], (rows, cols), jnp.float32, -0.1, 0.1)
    E = jax.random.uniform(ks[3], (rows, cols), jnp.float32, 1.0, 3.0)
    dt = np.float32(1e-5)
    cells = n * n

    def sync(out):
        return float(np.asarray(out[-1]))

    tx = timeit(lambda: fused_sweep(cfg, Axis.X, rho, u, v, E, dt), sync)
    print(f"  X sweep (full-width rows): {cells / tx / 1e9:7.3f} Gcells/s "
          f"({tx * 1e3:.3f} ms)")

    for tc in tile_cs:
        if tc is None:
            c = cfg
            label = "auto"
        else:
            c = ArmonParameters(test="Sod", N=(n, n), data_type=np.float32,
                                maxcycle=1, silent=5, measure_time=False,
                                block_size=(tc, 256)).config
            label = str(tc)
        try:
            ty = timeit(lambda: fused_sweep(c, Axis.Y, rho, u, v, E, dt), sync)
            print(f"  Y sweep (2D tiles, tile_c={label}): "
                  f"{cells / ty / 1e9:7.3f} Gcells/s ({ty * 1e3:.3f} ms)")
        except Exception as e:
            print(f"  Y sweep tile_c={label} FAILED: {str(e)[:150]}")

    tcyc = timeit(lambda: fused_cycle(cfg, True, rho, u, v, E, dt, dt), sync)
    print(f"  fused cycle (full-width):  {cells / tcyc / 1e9:7.3f} Gcells/s "
          f"({tcyc * 1e3:.3f} ms)  [2 sweeps: eff per-sweep "
          f"{2 * cells / tcyc / 1e9:.3f}]")


if __name__ == "__main__":
    main()

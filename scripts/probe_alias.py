"""Measure the pipeline cost of input_output_aliases: in-place kernels may
serialize Mosaic's double-buffered DMA (fetch of tile i+1 vs aliased store
of tile i). Compares fused_sweep (fresh outputs) vs fused_sweep_ip
(aliased) for both sweep axes at N (default 8192).
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
from armon_tpu.ops.pallas.sweep import fused_sweep, fused_sweep_ip


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
    params = ArmonParameters(test="Sod", N=(n, n), data_type=np.float32,
                             maxcycle=1, silent=5, measure_time=False)
    cfg = params.config
    rows, cols = cfg.local_shape
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    rho = jax.random.uniform(ks[0], (rows, cols), jnp.float32, 0.5, 2.0)
    u = jax.random.uniform(ks[1], (rows, cols), jnp.float32, -0.1, 0.1)
    v = jax.random.uniform(ks[2], (rows, cols), jnp.float32, -0.1, 0.1)
    E = jax.random.uniform(ks[3], (rows, cols), jnp.float32, 1.0, 3.0)
    dt = np.float32(1e-5)
    cells = n * n

    def sync(out):
        return float(np.asarray(out[-1]))

    for axis in (Axis.X, Axis.Y):
        t0 = timeit(lambda: fused_sweep(cfg, axis, rho, u, v, E, dt), sync)
        t1 = timeit(lambda: fused_sweep_ip(cfg, axis, rho, u, v, E, dt), sync)
        print(f"  {axis}: fresh-out {cells / t0 / 1e9:6.3f} Gc/s "
              f"({t0 * 1e3:7.3f} ms)   aliased {cells / t1 / 1e9:6.3f} Gc/s "
              f"({t1 * 1e3:7.3f} ms)   alias cost {(t1 - t0) * 1e3:+.3f} ms")


if __name__ == "__main__":
    main()

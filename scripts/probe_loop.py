"""Attribute the gap between the bare fused-cycle kernel and the full
jitted solver loop: while-loop carry copies vs ghost-fill XLA ops vs
in-kernel BC cost.

Times, at N (default 8192), per cycle:
  k         bare cycle kernel (ghosts pre-filled assumed — timing only)
  pyloop    python loop of donated jitted (XLA ghost fill + kernel)
  pyloop_k  python loop of donated jitted (in-kernel BC, no XLA fill)
  whileloop the production jit loop (bench path)
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
from armon_tpu.ops.pallas.sweep import fused_cycle
from armon_tpu.ops.boundary import boundary_conditions
from armon_tpu.core.state import State


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

    def report(label, t):
        print(f"  {label:34s} {cells / t / 1e9:7.3f} Gcells/s ({t * 1e3:.3f} ms)")

    t = timeit(lambda: fused_cycle(cfg, True, rho, u, v, E, dt, dt), sync)
    report("bare cycle kernel", t)

    # python-loop variants with donated carries
    def _mkstate(rho, u, v, E):
        z = jnp.zeros_like(rho)
        return State(x=z, y=z, rho=rho, u=u, v=v, E=E, p=z, c=z, g=z,
                     ustar=z, pstar=z)

    @jax.jit
    def cyc_xla_fill(rho, u, v, E):
        s = _mkstate(rho, u, v, E)
        s = boundary_conditions(cfg, s, Axis.X, ("rho", "u", "v", "E"))
        s = boundary_conditions(cfg, s, Axis.Y, ("rho", "u", "v", "E"))
        r2, u2, v2, E2, p2, lm = fused_cycle(cfg, True, s.rho, s.u, s.v, s.E,
                                             dt, dt)
        return r2, u2, v2, E2, lm

    cyc_xla_fill_d = jax.jit(cyc_xla_fill, donate_argnums=(0, 1, 2, 3))


    def pyloop(fn):
        a, b, c, d = rho + 0, u + 0, v + 0, E + 0
        out = fn(a, b, c, d)
        _ = sync(out)
        a, b, c, d = rho + 0, u + 0, v + 0, E + 0
        t0 = time.perf_counter()
        reps = 20
        for _i in range(reps):
            a, b, c, d, lm = fn(a, b, c, d)
        _ = float(np.asarray(lm))
        return (time.perf_counter() - t0) / reps

    report("pyloop donated, XLA ghost fill", pyloop(cyc_xla_fill_d))

    # the production while-loop (current bench path)
    from armon_tpu.core.solver import make_init, make_jit_loop
    p2 = ArmonParameters(test="Sod", N=(n, n), data_type=np.float32,
                         maxcycle=20, maxtime=1e30, silent=5,
                         measure_time=False, kernel_tier="pallas")
    state = make_init(p2)()
    loop = make_jit_loop(p2)
    out = loop(state)
    _ = float(np.asarray(out[1]))
    t0 = time.perf_counter()
    out = loop(state)
    _ = float(np.asarray(out[1]))
    t = (time.perf_counter() - t0) / 20
    report("production while_loop (20 cyc)", t)


if __name__ == "__main__":
    main()

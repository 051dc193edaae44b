"""Per-section timing of the PRODUCTION per-sweep path (post in-kernel-BC):
X sweep, Y sweep, and the chained cycle — each as a jitted fori_loop of K
reps so the ~26 ms dispatch RTT is amortized (CLAUDE.md gotcha).

CALIBRATION CAVEATS (when itemizing against BENCH_NOTES):
- The standalone X section runs emit_strips=False while the production
  cycle's X sweep emits the Y halo strips — X + Y here understate the
  cycle by the strip-emission writes; use the cycle section as truth.
- A flat 0.026 s RTT constant is subtracted per rep; on transports
  without it (CPU, future tunnels) sections read low by 26/K ms.

Usage: python scripts/probe_sections.py [N] [K]
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
from armon_tpu.ops.pallas.sweep import fused_sweep_ip, strip_emission_plan


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    params = ArmonParameters(test="Sod", N=(n, n), data_type=np.float32,
                             maxcycle=1, silent=5, measure_time=False)
    cfg = params.config
    rows, cols = cfg.local_shape
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    rho = jax.random.uniform(ks[0], (rows, cols), jnp.float32, 0.5, 2.0)
    u = jax.random.uniform(ks[1], (rows, cols), jnp.float32, -0.1, 0.1)
    v = jax.random.uniform(ks[2], (rows, cols), jnp.float32, -0.1, 0.1)
    E = jax.random.uniform(ks[3], (rows, cols), jnp.float32, 1.0, 3.0)
    dt = np.float32(1e-6)
    cells = n * n
    can_emit = strip_emission_plan(cfg, (rows, cols)) is not None
    print(f"N={n} K={K} strips_emitted={can_emit}", flush=True)

    def x_step(a, emit=False):
        r, uu, vv, ee = a
        out = fused_sweep_ip(cfg, Axis.X, r, uu, vv, ee, dt,
                             emit_p=False, emit_dt=False, inline_bc=True,
                             emit_strips=emit)
        return out

    def y_step(a, strips=None):
        r, uu, vv, ee = a
        return fused_sweep_ip(cfg, Axis.Y, r, uu, vv, ee, dt,
                              emit_p=True, emit_dt=True, inline_bc=True,
                              strips=strips)

    @jax.jit
    def loop_x(r, uu, vv, ee):
        def body(_, a):
            o = x_step(a)
            return o[:4]
        return jax.lax.fori_loop(0, K, body, (r, uu, vv, ee))

    @jax.jit
    def loop_y(r, uu, vv, ee):
        def body(_, a):
            o = y_step(a)
            return o[:4]
        return jax.lax.fori_loop(0, K, body, (r, uu, vv, ee))

    @jax.jit
    def loop_cycle(r, uu, vv, ee):
        def body(_, a):
            o = x_step(a, emit=can_emit)
            strips = o[-1] if can_emit else None
            o2 = y_step(o[:4], strips=strips)
            return o2[:4]
        return jax.lax.fori_loop(0, K, body, (r, uu, vv, ee))

    for label, fn, per in (("X sweep (emit off)", loop_x, 1),
                           ("Y sweep (emit on)", loop_y, 1),
                           ("cycle X+Y (production)", loop_cycle, 1)):
        out = fn(rho, u, v, E)
        _ = float(np.asarray(out[0][0, 0]))
        best = float("inf")
        for _r in range(3):
            t0 = time.perf_counter()
            out = fn(rho, u, v, E)
            _ = float(np.asarray(out[0][0, 0]))
            best = min(best, (time.perf_counter() - t0 - 0.026) / K)
        print(f"  {label:28s} {best * 1e3:7.3f} ms "
              f"({cells / best / 1e9:6.2f} Gcells/s-equiv)", flush=True)


if __name__ == "__main__":
    main()

"""Where does a small-grid cycle's time go? (VERDICT r2 weak #2: the
1000²-4000² BASELINE configs run at 41-67% of the 8192² headline.)

Times, in ONE process (separate jit keys, so the trace cache cannot alias
variants):

  cycle       the production per-cycle path (ghost exchange + pair kernel
              + dt recurrence) inside a fori_loop
  kernel_ip   the whole-cycle pair kernel alone, in-place (strip assembly
              included — it is part of that jit)
  kernel_cp   the pair kernel alone, NOT in-place (index-map halos, no
              strips; XLA inserts carry copies instead)
  exchange    both axes' ghost fill alone (mirror-BC slab writes)
  dt_only     the dt recurrence alone

Usage: python scripts/probe_small.py [N] [reps]    (default 1000 50)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from armon_tpu import ArmonParameters
from armon_tpu.utils.enums import Axis


def timeit(fn, sync, reps):
    out = fn()
    sync(out)
    best = float("inf")
    for _r in range(3):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    params = ArmonParameters(test="Sod", N=(n, n), data_type=np.float32,
                             maxcycle=1, silent=5, measure_time=False,
                             kernel_tier="pallas")
    cfg = params.config
    from armon_tpu.core.solver import make_init
    from armon_tpu.core.step import (solver_cycle_fused, ghost_exchange,
                                     FUSED_EXCHANGE_VARS)
    from armon_tpu.core.timestep import dt_update
    from armon_tpu.ops.pallas.sweep import fused_cycle
    from armon_tpu.ops.reductions import dt_cfl_min
    from armon_tpu.ops.eos import update_eos

    state = make_init(params)()
    state = jax.jit(lambda s: update_eos(cfg, s))(state)
    T = cfg.dtype.type
    seed = float(jax.jit(lambda s: dt_cfl_min(cfg, s))(state))
    dt0 = T(seed * cfg.cfl)
    cells = n * n

    def sync_state(out):
        leaf = out[0]
        a = leaf.rho if hasattr(leaf, "rho") else leaf
        return float(np.asarray(jax.device_get(a[8, 8])))

    # --- full production cycle in a fori loop
    @jax.jit
    def cycle_loop(s, dtp, lm):
        def body(i, carry):
            s, dtp, lm, acc = carry
            s, dt_use, dt_next, lm, _strips, ok = solver_cycle_fused(
                cfg, s, dtp, i, lm)
            return s, dt_next, lm, acc + dt_use

        return lax.fori_loop(0, reps, body, (s, dtp, lm, T(0.0)))

    t = timeit(lambda: cycle_loop(state, dt0, T(seed)), sync_state, reps)
    print(f"  cycle      {t*1e6:9.1f} us  ({cells / t / 1e9:6.3f} Gcells/s)")

    # --- pair kernel alone (in-place and copying)
    for label, ip in (("kernel_ip", True), ("kernel_cp", False)):
        @functools.partial(jax.jit, static_argnames="in_place")
        def kern_loop(s, in_place):
            def body(i, carry):
                rho, u, v, E, acc = carry
                rho, u, v, E, p, lm = fused_cycle(
                    cfg, True, rho, u, v, E, dt0, dt0, in_place=in_place)
                return rho, u, v, E, acc + lm

            z = T(0.0)
            return lax.fori_loop(0, reps, body,
                                 (s.rho, s.u, s.v, s.E, z))

        t = timeit(lambda: kern_loop(state, ip),
                   lambda o: float(np.asarray(jax.device_get(o[-1]))), reps)
        print(f"  {label:10s} {t*1e6:9.1f} us  ({cells / t / 1e9:6.3f} Gcells/s)")

    # --- ghost exchange alone (both axes)
    @jax.jit
    def ex_loop(s):
        def body(i, carry):
            s, acc = carry
            s = ghost_exchange(cfg, s, Axis.X, FUSED_EXCHANGE_VARS)
            s = ghost_exchange(cfg, s, Axis.Y, FUSED_EXCHANGE_VARS)
            return s, acc + s.rho[0, 0]

        return lax.fori_loop(0, reps, body, (s, T(0.0)))

    t = timeit(lambda: ex_loop(state), sync_state, reps)
    print(f"  exchange   {t*1e6:9.1f} us")

    # --- dt recurrence alone
    @jax.jit
    def dt_loop(lm):
        def body(i, carry):
            dtp, acc = carry
            dt_use, dt_next, ok = dt_update(cfg, lm, dtp, i, reduce=False)
            return dt_next, acc + dt_use

        return lax.fori_loop(0, reps, body, (T(0.0), T(0.0)))

    t = timeit(lambda: dt_loop(T(seed)),
               lambda o: float(np.asarray(jax.device_get(o[-1]))), reps)
    print(f"  dt_only    {t*1e6:9.1f} us")


if __name__ == "__main__":
    main()

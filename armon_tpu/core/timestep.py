"""Global time-step logic.

Functional rebuild of the reference's `GlobalTimeStep` machinery
(`src/solver_state.jl:26-166`, `src/reductions.jl:113-199`):

- The dt used by cycle N was computed from the state at the *start* of cycle
  N-1 (the reference computes it "fully asynchronously", overlapping the MPI
  reduction with a whole cycle — `src/reductions.jl:117-125`). Cycles 0 and 1
  both use ``cfl * local_min(initial state)``.
- Growth is capped at +5% per cycle: ``dt_next = min(cfl*local, 1.05*dt)``
  (`src/solver_state.jl:129`).
- ``cst_dt`` short-circuits everything (`src/reductions.jl:131-133`).
- ``dt_on_even_cycles`` only recomputes on even cycles
  (`src/reductions.jl:135`).

On a device mesh the min-reduce is a `lax.pmin` over the mesh axes — the
XLA-scheduled equivalent of the hand-rolled non-blocking `MPI_Iallreduce`
(`src/utils.jl:126-143`); min is associative so the result is bit-identical.
"""

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.reductions import dt_cfl_min


def next_time_step(cfg, state, dt_prev, cycle):
    """Returns (dt_use, dt_next, ok).

    `dt_prev` is the carry: 0 at cycle 0, afterwards the dt for this cycle
    (computed during the previous one). `dt_use` is the unscaled dt applied to
    this cycle's sweeps, `dt_next` the carry for the next cycle. `ok` is False
    when the new dt is invalid (<= 0 or non-finite), mirroring the
    `solver_error(:time, ...)` abort at `src/solver_state.jl:123-125`.
    """
    T = np.dtype(cfg.dtype).type
    if cfg.cst_dt:
        dt = jnp.asarray(T(cfg.Dt))
        return dt, dt, jnp.asarray(True)

    local = dt_cfl_min(cfg, state)
    if cfg.spmd:
        # Global min over the device mesh (replaces MPI_Iallreduce(MIN),
        # src/solver_state.jl:102-111)
        local = lax.pmin(local, axis_name=cfg.axis_names)

    first = dt_prev == 0
    candidate = jnp.where(
        first,
        T(cfg.cfl) * local,
        jnp.minimum(T(cfg.cfl) * local, T(1.05) * dt_prev),
    )

    if cfg.dt_on_even_cycles:
        recompute = (cycle % 2 == 0) | first
        dt_next = jnp.where(recompute, candidate, dt_prev)
    else:
        dt_next = candidate

    dt_use = jnp.where(first, dt_next, dt_prev)
    ok = jnp.isfinite(dt_next) & (dt_next > 0)
    return dt_use, dt_next, ok

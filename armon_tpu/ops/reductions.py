"""Global reductions: CFL time step and conservation variables.

Rebuild of `src/reductions.jl`:
- per-cell CFL bound min(dx/|u±c|, dy/|v±c|):  `src/reductions.jl:2-20`
- grid min + (MPI) min-reduce:                 `src/reductions.jl:91-199`
- mass/energy sums scaled by the cell area:    `src/reductions.jl:202-323`

The reference masks ghost cells (`mask`); here the real domain is a static
slice of the padded array. The min-reduction is order-independent, so the
XLA tree reduction is bit-identical to the reference's sequential loop. The
conservation sums use pairwise reduction (more accurate than sequential);
they feed tolerance checks only (`src/solver.jl:478-487`).

On a device mesh these become `lax.pmin` / `lax.psum` over the mesh axes —
the TPU equivalent of the reference's `MPI_Iallreduce(MIN)`
(`src/utils.jl:126-143`) and `MPI.Allreduce(SUM)` (`src/reductions.jl:318-320`).
"""

import jax.numpy as jnp
import numpy as np


def real_slice(cfg):
    g = cfg.nghost
    return (slice(g, -g), slice(g, -g))


def dt_cfl_min(cfg, state):
    """Minimum CFL-stable dt over the real cells (`src/reductions.jl:14-20`)."""
    T = np.dtype(cfg.dtype).type
    r = real_slice(cfg)
    u, v, c = state.u[r], state.v[r], state.c[r]
    dx, dy = T(cfg.dx), T(cfg.dy)
    dt_x = dx / jnp.maximum(jnp.abs(u + c), jnp.abs(u - c))
    dt_y = dy / jnp.maximum(jnp.abs(v + c), jnp.abs(v - c))
    return jnp.min(jnp.minimum(dt_x, dt_y))


def conservation_vars(cfg, state):
    """(total mass, total energy) over real cells, scaled by the cell area
    (`src/reductions.jl:202-216,254-258`)."""
    T = np.dtype(cfg.dtype).type
    r = real_slice(cfg)
    rho, E = state.rho[r], state.E[r]
    ds = T(cfg.dx) * T(cfg.dy)
    mass = jnp.sum(rho) * ds
    energy = jnp.sum(rho * E) * ds
    return mass, energy

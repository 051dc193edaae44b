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

import jax
import jax.numpy as jnp
import numpy as np


def real_slice(cfg):
    g = cfg.nghost
    return (slice(g, -g), slice(g, -g))


def shard_real_extents(cfg):
    """Traced (nx_real, ny_real) of THIS shard. For an uneven split the
    hi-edge shard owns only n_edge real cells; the rest of its padded block
    is dead slack (`src/parameters.jl:673-697` analog). Must be called
    inside shard_map when cfg.spmd."""
    from jax import lax
    nx, ny = cfg.n_local
    if not cfg.spmd:
        return np.int32(nx), np.int32(ny)
    ex, ey = cfg.edge_cells
    nx_r = jnp.where(lax.axis_index(cfg.axis_names[0])
                     == cfg.proc_dims[0] - 1, np.int32(ex), np.int32(nx))
    ny_r = jnp.where(lax.axis_index(cfg.axis_names[1])
                     == cfg.proc_dims[1] - 1, np.int32(ey), np.int32(ny))
    return nx_r, ny_r


def _real_mask(cfg, shape):
    """Boolean mask of the real cells in a padded (rows, cols) shard block;
    accounts for edge-shard slack under an uneven split."""
    g = cfg.nghost
    nx_r, ny_r = shard_real_extents(cfg)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return ((rows >= g) & (rows < g + ny_r) & (cols >= g) & (cols < g + nx_r))


def _uneven(cfg):
    return cfg.spmd and (cfg.uneven(0) or cfg.uneven(1))


def dt_cfl_min(cfg, state):
    """Minimum CFL-stable dt over the real cells (`src/reductions.jl:14-20`).

    Restructured as min(dx/max|u±c|, dy/max|v±c|): bitwise identical to the
    per-cell min(dx/..., dy/...) form (IEEE division is monotone in the
    denominator) with two divisions total instead of two per cell."""
    T = np.dtype(cfg.dtype).type
    dx, dy = T(cfg.dx), T(cfg.dy)
    if _uneven(cfg):
        # Masked form: the static slice would include the edge shard's dead
        # slack cells (garbage, possibly NaN). `where` keeps the max exact.
        u, v, c = state.u, state.v, state.c
        mask = _real_mask(cfg, u.shape)
        zero = T(0.0)
        mx = jnp.where(mask, jnp.maximum(jnp.abs(u + c), jnp.abs(u - c)), zero)
        my = jnp.where(mask, jnp.maximum(jnp.abs(v + c), jnp.abs(v - c)), zero)
        return jnp.minimum(dx / jnp.max(mx), dy / jnp.max(my))
    r = real_slice(cfg)
    u, v, c = state.u[r], state.v[r], state.c[r]
    mx = jnp.max(jnp.maximum(jnp.abs(u + c), jnp.abs(u - c)))
    my = jnp.max(jnp.maximum(jnp.abs(v + c), jnp.abs(v - c)))
    return jnp.minimum(dx / mx, dy / my)


def _ff_sum(x):
    """Compensated (float-float) sum: per-row pairwise partial sums, then a
    Knuth 2Sum scan over the row sums. Gives f64-grade accuracy for the f32
    conservation check ON CHIP, where f64 is software-emulated (the
    reference validates conservation at f64 everywhere,
    `test/conservation.jl:13-14`). Exact-dtype rounding only — no x64."""
    rows = jnp.sum(x, axis=1)  # XLA pairwise: error ~ log(cols) ulp

    def two_sum(carry, b):
        s_hi, s_lo = carry
        t = s_hi + b
        bp = t - s_hi
        err = (s_hi - (t - bp)) + (b - bp)
        lo = s_lo + err
        return (t, lo), None

    (hi, lo), _ = jax.lax.scan(two_sum, (rows[0] * 0, rows[0] * 0), rows)
    return hi + lo


def conservation_vars(cfg, state):
    """(total mass, total energy) over real cells, scaled by the cell area
    (`src/reductions.jl:202-216,254-258`). f32 runs use the compensated sum
    so the <=1e-12 drift bound is measurable on hardware."""
    T = np.dtype(cfg.dtype).type
    ds = T(cfg.dx) * T(cfg.dy)
    compensated = np.dtype(cfg.dtype).itemsize == 4
    total = _ff_sum if compensated else jnp.sum
    if _uneven(cfg):
        mask = _real_mask(cfg, state.rho.shape)
        zero = T(0.0)
        rho = jnp.where(mask, state.rho, zero)
        rhoE = jnp.where(mask, state.rho * state.E, zero)
        return total(rho) * ds, total(rhoE) * ds
    r = real_slice(cfg)
    rho, E = state.rho[r], state.E[r]
    mass = total(rho) * ds
    energy = total(rho * E) * ds
    return mass, energy

"""Multi-device halo exchange over the TPU mesh.

TPU-native replacement for the reference's MPI halo runtime
(`src/halo_exchange.jl:187-368`, `src/blocking/blocks.jl:174-217`):

- the cartesian communicator becomes the 2D `jax.sharding.Mesh`;
- persistent send/recv channels + pack/unpack kernels become a single
  `lax.ppermute` per direction of a stacked (nvars, ...) slab buffer — the
  pack step is the `jnp.stack`, and XLA compiles the static communication
  schedule the persistent requests emulate;
- the GPU-aware-buffer option disappears (data never leaves HBM);
- global-border devices apply the mirror BC instead, selected branchlessly
  with `lax.axis_index` (the reference's `rank == -1` fake-neighbour path,
  `src/halo_exchange.jl:290-294`).

Runs inside `shard_map`; each device owns a padded block of the domain.
"""

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils.enums import Axis, sides_along
from ..core.state import COMM_VARS
from ..ops.boundary import boundary_conditions


def _slab(buf, arr_ax, lo, hi):
    """Slice `buf` (stacked: leading var dim) along array axis `arr_ax` of the
    underlying fields."""
    sl = [slice(None)] * buf.ndim
    sl[arr_ax + 1] = slice(lo, hi)
    return buf[tuple(sl)]


def _set_slab(buf, arr_ax, lo, hi, value):
    sl = [slice(None)] * buf.ndim
    sl[arr_ax + 1] = slice(lo, hi)
    return buf.at[tuple(sl)].set(value)


def _bc_factors(cfg, side, vars):
    """(nvars,) per-variable mirror factors for a global border
    (`src/tests.jl:150-161` applied to the exchanged vars)."""
    u_f, v_f = cfg.test.boundary_factors(side)
    T = np.dtype(cfg.dtype).type
    facs = [T(u_f) if v == "u" else T(v_f) if v == "v" else T(1.0)
            for v in vars]
    return np.asarray(facs, dtype=cfg.dtype).reshape((len(vars),) + (1, 1))


def halo_exchange(cfg, state, axis: Axis, vars=COMM_VARS):
    """Exchange the `nghost`-wide halo slabs of `vars` along `axis`
    with both mesh neighbours; apply mirror BC at global borders."""
    n_dev = cfg.proc_dims[int(axis)]
    if n_dev == 1:
        # Mesh is flat along this axis: only the global BC applies.
        return boundary_conditions(cfg, state, axis, vars)

    ax_name = cfg.axis_names[int(axis)]
    g = cfg.nghost
    arr_ax = axis.array_axis
    idx = lax.axis_index(ax_name)

    buf = jnp.stack([getattr(state, v) for v in vars])
    size = buf.shape[arr_ax + 1]

    # Real-cell slabs adjacent to each border
    first_real = _slab(buf, arr_ax, g, 2 * g)                  # next to Left/Bottom
    last_real = _slab(buf, arr_ax, size - 2 * g, size - g)     # next to Right/Top

    # Neighbor exchange (non-periodic): device i sends its last slab to i+1
    # and its first slab to i-1.
    fwd = [(i, i + 1) for i in range(n_dev - 1)]
    bwd = [(i + 1, i) for i in range(n_dev - 1)]
    recv_from_prev = lax.ppermute(last_real, ax_name, fwd)   # fills our first ghosts
    recv_from_next = lax.ppermute(first_real, ax_name, bwd)  # fills our last ghosts

    # Mirror-BC slabs for the global borders (src/halo_exchange.jl:2-36)
    side_lo, side_hi = sides_along(axis)
    mirror_lo = jnp.flip(first_real, axis=arr_ax + 1) * _bc_factors(cfg, side_lo, vars)

    ghosts_lo = jnp.where(idx == 0, mirror_lo, recv_from_prev)
    buf = _set_slab(buf, arr_ax, 0, g, ghosts_lo)

    if cfg.uneven(axis):
        # Uneven split: the hi-edge shard's real cells end at g + n_edge,
        # inside its padded block, so its mirror slab and ghost band sit at
        # per-shard (traced) positions. Interior shards are full, so every
        # ppermute slab above stays static; only this shard's own hi-side
        # fill moves. The slack cells beyond the mirror band are dead
        # (never read by any real-cell stencil).
        ne = np.int32(cfg.edge_cells[int(axis)])
        is_edge = idx == n_dev - 1
        src_start = jnp.where(is_edge, ne, np.int32(size - 2 * g))
        src = lax.dynamic_slice_in_dim(buf, src_start, g, axis=arr_ax + 1)
        mirror_hi = jnp.flip(src, axis=arr_ax + 1) * _bc_factors(cfg, side_hi, vars)
        ghosts_hi = jnp.where(is_edge, mirror_hi, recv_from_next)
        dst_start = jnp.where(is_edge, ne + g, np.int32(size - g))
        buf = lax.dynamic_update_slice_in_dim(buf, ghosts_hi, dst_start,
                                              axis=arr_ax + 1)
    else:
        mirror_hi = jnp.flip(last_real, axis=arr_ax + 1) * _bc_factors(cfg, side_hi, vars)
        ghosts_hi = jnp.where(idx == n_dev - 1, mirror_hi, recv_from_next)
        buf = _set_slab(buf, arr_ax, size - g, size, ghosts_hi)

    return state._replace(**{v: buf[k] for k, v in enumerate(vars)})

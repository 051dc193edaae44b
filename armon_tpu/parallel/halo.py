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


def _bc_factors(cfg, side, vars):
    """(nvars,) per-variable mirror factors for a global border
    (`src/tests.jl:150-161` applied to the exchanged vars). The
    var->factor mapping is boundary._var_factor — ONE source of the
    mirror semantics for the sharded and single-device paths (invariant
    2 depends on them agreeing)."""
    from ..ops.boundary import _var_factor
    u_f, v_f = cfg.test.boundary_factors(side)
    T = np.dtype(cfg.dtype).type
    facs = [T(_var_factor(v, u_f, v_f)) for v in vars]
    return np.asarray(facs, dtype=cfg.dtype).reshape((len(vars),) + (1, 1))


def _ghost_slabs(cfg, arrs, axis: Axis, vars):
    """The exchanged/mirrored ghost slab CONTENT along `axis` — the values
    `halo_exchange` writes into the ghost bands, without the write-back.
    Returns (ghosts_lo, ghosts_hi, dst_start): stacked (nvars, ...) slab
    arrays (g rows / g lanes deep) and the hi-side write offset (traced
    only under an uneven split)."""
    n_dev = cfg.proc_dims[int(axis)]
    ax_name = cfg.axis_names[int(axis)]
    g = cfg.nghost
    arr_ax = axis.array_axis
    idx = lax.axis_index(ax_name)

    size = arrs[0].shape[arr_ax]

    def slab(a, lo, hi):
        sl = [slice(None)] * a.ndim
        sl[arr_ax] = slice(lo, hi)
        return a[tuple(sl)]

    # Only the O(boundary) slabs are stacked and moved — the fields
    # themselves are updated in place with slab writes (stacking the FULL
    # fields would copy every exchanged array twice per sweep).
    first_real = jnp.stack([slab(a, g, 2 * g) for a in arrs])
    last_real = jnp.stack([slab(a, size - 2 * g, size - g) for a in arrs])

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
        src = jnp.stack([lax.dynamic_slice_in_dim(a, src_start, g, axis=arr_ax)
                         for a in arrs])
        mirror_hi = jnp.flip(src, axis=arr_ax + 1) * _bc_factors(cfg, side_hi, vars)
        ghosts_hi = jnp.where(is_edge, mirror_hi, recv_from_next)
        dst_start = jnp.where(is_edge, ne + g, np.int32(size - g))
    else:
        mirror_hi = jnp.flip(last_real, axis=arr_ax + 1) * _bc_factors(cfg, side_hi, vars)
        ghosts_hi = jnp.where(idx == n_dev - 1, mirror_hi, recv_from_next)
        dst_start = np.int32(size - g)

    return ghosts_lo, ghosts_hi, dst_start


def halo_exchange(cfg, state, axis: Axis, vars=COMM_VARS):
    """Exchange the `nghost`-wide halo slabs of `vars` along `axis`
    with both mesh neighbours; apply mirror BC at global borders."""
    n_dev = cfg.proc_dims[int(axis)]
    if n_dev == 1:
        # Mesh is flat along this axis: only the global BC applies.
        return boundary_conditions(cfg, state, axis, vars)

    arr_ax = axis.array_axis
    arrs = [getattr(state, v) for v in vars]
    ghosts_lo, ghosts_hi, dst_start = _ghost_slabs(cfg, arrs, axis, vars)

    updates = {}
    for k, (v, a) in enumerate(zip(vars, arrs)):
        a = lax.dynamic_update_slice_in_dim(a, ghosts_lo[k], np.int32(0),
                                            axis=arr_ax)
        a = lax.dynamic_update_slice_in_dim(a, ghosts_hi[k], dst_start,
                                            axis=arr_ax)
        updates[v] = a
    return state._replace(**updates)


def halo_slabs(cfg, state, axis: Axis, vars):
    """Fused-tier halo exchange WITHOUT the write-back: return the stacked
    (nvars, ...) ghost slab pair for in-kernel consumption (the slab mode
    of `ops/pallas/sweep.py`), so the 2*nvars dynamic-update-slice
    launches per sweep disappear and only the O(boundary) ppermute
    remains. EVEN splits along `axis` only: the uneven hi-edge shard's
    ghost band sits at a traced offset the kernels' static splice cannot
    address (those configs keep `halo_exchange`)."""
    n_dev = cfg.proc_dims[int(axis)]
    assert n_dev > 1 and not cfg.uneven(axis)
    arrs = [getattr(state, v) for v in vars]
    ghosts_lo, ghosts_hi, _ = _ghost_slabs(cfg, arrs, axis, vars)
    return ghosts_lo, ghosts_hi

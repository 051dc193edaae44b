"""Per-shard (sub-domain) file I/O — no global gather.

Rebuild of the reference's distributed output path:
- one file per rank named `<file>_<cx>×<cy>` (`src/io.jl:46-59`,
  `build_file_path`), written from that rank's cells only;
- the windowed reader that pulls ONE sub-domain out of a global-domain
  file so sharded runs can be validated against the sequential golden
  without ever materializing the global array
  (`test/mpi.jl:48-110`, `read_sub_domain_from_global_domain_file!`).

Host memory here is O(shard): blocks come off the device through
`jax.Array.addressable_shards` (one device buffer at a time), and the
global-file reader streams line-by-line keeping only the window.
"""

import numpy as np

from ..core.state import State, SAVED_VARS
from ..utils.errors import solver_error


def shard_coords_iter(params, state: State, vars=SAVED_VARS):
    """Yield ((bx, by), {var: padded (lr, lc) numpy block}) for every
    addressable shard, without assembling the global array."""
    cfg = params.config
    lr, lc = cfg.local_shape
    if not cfg.spmd:
        yield (0, 0), {v: np.asarray(getattr(state, v)) for v in vars}
        return
    # Group the per-variable shards by their block position.
    ref_shards = getattr(state, vars[0]).addressable_shards
    positions = []
    for sh in ref_shards:
        r0 = sh.index[0].start or 0
        c0 = sh.index[1].start or 0
        positions.append((r0 // lr, c0 // lc))
    per_var = {v: getattr(state, v).addressable_shards for v in vars}
    for k, (by, bx) in enumerate(positions):
        yield (bx, by), {v: np.asarray(per_var[v][k].data) for v in vars}


def shard_real_window(cfg, coords):
    """(rows slice, cols slice, global row0, global col0) of the real cells
    inside a shard's padded block. The hi-edge shard owns only n_edge real
    cells (uneven splits)."""
    g = cfg.nghost
    bx, by = coords
    px, py = cfg.proc_dims
    nxl, nyl = cfg.n_local
    ex, ey = cfg.edge_cells
    wx = ex if bx == px - 1 else nxl
    hy = ey if by == py - 1 else nyl
    return (slice(g, g + hy), slice(g, g + wx), by * nyl, bx * nxl)


def _ghost_window(cfg, coords):
    """Like `shard_real_window` but including the ghost bands at GLOBAL
    borders only (the reference's `global_ghosts` semantics,
    `src/io.jl:62-66`). Returns (rows slice, cols slice, row0, col0) with
    row0/col0 in the ghost-padded global frame."""
    g = cfg.nghost
    bx, by = coords
    px, py = cfg.proc_dims
    rs, cs, gy, gx = shard_real_window(cfg, coords)
    r0 = rs.start - (g if by == 0 else 0)
    r1 = rs.stop + (g if by == py - 1 else 0)
    c0 = cs.start - (g if bx == 0 else 0)
    c1 = cs.stop + (g if bx == px - 1 else 0)
    return (slice(r0, r1), slice(c0, c1),
            gy + (0 if by == 0 else g), gx + (0 if bx == 0 else g))


def sub_domain_file_path(path, coords):
    """`<path>_<cx>×<cy>` (`src/io.jl:53-56`)."""
    return f"{path}_{coords[0]}×{coords[1]}"


def write_sub_domain_files(params, state: State, path, precision=None,
                           with_ghosts=False):
    """Write one pm3d CSV per shard (`write_sub_domain_file`,
    `src/io.jl:61-75`) with no global gather. Returns the file paths."""
    from .output import write_cells_file
    cfg = params.config
    if precision is None:
        precision = 17 if np.dtype(cfg.dtype).itemsize == 8 else 9
    win = _ghost_window if with_ghosts else shard_real_window
    paths = []
    for coords, blocks in shard_coords_iter(params, state):
        rs, cs, _, _ = win(cfg, coords)
        arrs = {v: blocks[v][rs, cs] for v in SAVED_VARS}
        p = sub_domain_file_path(path, coords) if cfg.spmd else path
        write_cells_file(p, arrs, precision)
        paths.append(p)
    return paths


def read_sub_domain_file(cfg, path, coords, with_ghosts=False):
    """Read one per-shard file written by `write_sub_domain_files` back into
    {var: (hy, wx)} arrays — the read side of the reference's per-rank
    checkpoint comparison (`src/io.jl:169-182,203-219`)."""
    from .output import _read_rows
    win = _ghost_window if with_ghosts else shard_real_window
    rs, cs, _, _ = win(cfg, coords)
    hy, wx = rs.stop - rs.start, cs.stop - cs.start
    _, data = _read_rows(path, cfg.dtype, expected_cells=hy * wx)
    assert data.shape == (hy * wx, len(SAVED_VARS)), \
        f"expected {hy * wx} cells in {path}, got {data.shape[0]}"
    return {v: data[:, k].reshape(hy, wx) for k, v in enumerate(SAVED_VARS)}


def read_global_file_window(cfg, path, coords, skip_header=False,
                            with_ghosts=False):
    """Stream a GLOBAL-domain pm3d CSV and return only the window of shard
    `coords` — `read_sub_domain_from_global_domain_file!`
    (`test/mpi.jl:48-110`). Host memory is O(window), not O(global).

    Returns (header, {var: (hy, wx) array}) where the window covers the
    shard's real cells (+ global-border ghosts when `with_ghosts`)."""
    g = cfg.nghost
    nx, ny = cfg.n_global
    if with_ghosts:
        rs, cs, row0, col0 = _ghost_window(cfg, coords)
        gnx = nx + 2 * g
    else:
        rs, cs, row0, col0 = shard_real_window(cfg, coords)
        gnx = nx
    hy = rs.stop - rs.start
    wx = cs.stop - cs.start

    header = None
    if skip_header:
        with open(path) as f:
            header = f.readline().strip()

    # Native fast path (armon_read_window): same streaming walk at disk
    # speed — the sharded golden comparator re-streams the file once PER
    # SHARD, so this is its inner loop.
    from . import native
    nat = native.read_window(path, len(SAVED_VARS), gnx,
                             row0, col0, hy, wx,
                             skip_lines=1 if skip_header else 0)
    if nat is not None:
        flat, filled = nat
        if filled != hy * wx:
            solver_error("config",
                         f"global file {path} ended before shard {coords}'s "
                         f"window was filled ({filled}/{hy * wx} cells — "
                         f"truncated file, or a grid/ghost-layout mismatch?)")
        win = flat.astype(cfg.dtype).reshape(hy, wx, len(SAVED_VARS))
        return header, {v: win[:, :, k] for k, v in enumerate(SAVED_VARS)}

    T = np.dtype(cfg.dtype).type
    out = {v: np.empty((hy, wx), cfg.dtype) for v in SAVED_VARS}
    row = 0          # global cell-row index in the file
    filled = 0       # window cells actually read (underfill guard)
    with open(path) as f:
        if skip_header:
            f.readline()
        cell = 0     # cell index within the current row
        for line in f:
            line = line.strip()
            if not line:
                continue
            if row0 <= row < row0 + hy and col0 <= cell < col0 + wx:
                vals = line.split(",")
                for k, v in enumerate(SAVED_VARS):
                    out[v][row - row0, cell - col0] = T(vals[k])
                filled += 1
            cell += 1
            if cell == gnx:
                cell = 0
                row += 1
                if row >= row0 + hy:
                    break
    if filled != hy * wx:
        # A truncated file / wrong n_global / with_ghosts mismatch would
        # otherwise leave np.empty heap garbage in the unreached cells and
        # the comparator would diff real state against garbage — possibly
        # even reporting zero differences.
        solver_error("config",
                     f"global file {path} ended before shard {coords}'s "
                     f"window was filled ({filled}/{hy * wx} cells — "
                     f"truncated file, or a grid/ghost-layout mismatch?)")
    return header, out


def compare_sub_domain_with_golden(params, state: State, golden_path,
                                   atol, rtol):
    """Compare every shard's real cells against its window of a golden
    global-domain reference file (header `dt, cycles`). Returns
    (ref_dt, ref_cycles, total diff count, max rel diff) —
    `ref_data_for_sub_domain` + comparison (`test/mpi.jl:94-130`).

    Deliberate trade-off: the golden file is re-streamed once PER SHARD
    (O(P) passes) so host memory stays O(window) — the design contract of
    this module. The reference amortizes the same cost across separate
    MPI processes; a single-process one-pass reader would need O(global)
    host memory, the thing the per-shard machinery exists to avoid."""
    from .output import count_differences
    cfg = params.config
    total, max_diff = 0, 0.0
    ref_dt = ref_cycles = None
    for coords, blocks in shard_coords_iter(params, state):
        rs, cs, _, _ = shard_real_window(cfg, coords)
        ours = {v: blocks[v][rs, cs] for v in SAVED_VARS}
        header, ref = read_global_file_window(cfg, golden_path, coords,
                                              skip_header=True)
        if ref_dt is None:
            dt_s, cyc_s = header.split(",")
            ref_dt = np.dtype(cfg.dtype).type(dt_s)
            ref_cycles = int(cyc_s)
        cnt, md, _ = count_differences(cfg, ours, ref, atol, rtol)
        total += cnt
        max_diff = max(max_diff, md)
    return ref_dt, ref_cycles, total, max_diff

"""Text I/O and numerical comparison.

Rebuild of `src/io.jl`: gnuplot-`pm3d`-compatible CSV output of the saved
variables (x, y, rho, u, v, p — `src/blocking/blocks.jl:49`), read-back, and
the ulp-reporting comparison used by `step_checkpoint`
(`src/io.jl:111-227`). The golden reference files under
`tests/reference_data/` use exactly this format
(`test/reference_data/reference_functions.jl:37-51`).
"""

import numpy as np

from ..core.state import State, SAVED_VARS


def saved_vars_arrays(cfg, state: State, with_ghosts=False):
    """Host numpy arrays of the saved vars, real cells only by default."""
    g = cfg.nghost
    out = {}
    for var in SAVED_VARS:
        a = np.asarray(getattr(state, var))
        if not with_ghosts:
            a = a[g:-g, g:-g]
        out[var] = a
    return out


def write_cells_file(path, arrs: dict, precision, for_3d=True,
                     extra_header=None):
    """Write a dict of (rows, cols) saved-var arrays as a pm3d CSV
    (`src/io.jl:4-27` row format)."""
    # Native fast path (byte-identical C printf formatting)
    from . import native
    if native.write_cells(path, [arrs[v] for v in SAVED_VARS], precision,
                          for_3d=for_3d, header=extra_header):
        return

    fmt = ", ".join(["%%#%d.%de" % (precision + 7, precision)] * len(SAVED_VARS))
    rows, cols = arrs["x"].shape
    with open(path, "w") as f:
        if extra_header is not None:
            f.write(extra_header + "\n")
        for j in range(rows):
            if for_3d and j > 0:
                f.write("\n")
            for i in range(cols):
                f.write(fmt % tuple(arrs[v][j, i] for v in SAVED_VARS))
                f.write("\n")


def write_state_file(cfg, state: State, path, precision=None, with_ghosts=False,
                     for_3d=True, extra_header=None):
    """Write rows of `x, y, rho, u, v, p` with a blank line between Y rows
    (`src/io.jl:4-27`). `extra_header` (e.g. "dt, cycles") is written first
    when given (`reference_functions.jl:41`)."""
    if precision is None:
        precision = 17 if np.dtype(cfg.dtype).itemsize == 8 else 9
    arrs = saved_vars_arrays(cfg, state, with_ghosts)
    write_cells_file(path, arrs, precision, for_3d=for_3d,
                     extra_header=extra_header)


def _read_rows(path, dtype, skip_header=False, expected_cells=None):
    header = None
    if skip_header:
        with open(path) as f:
            header = f.readline().strip()

    # Native fast path
    if expected_cells is not None:
        from . import native
        flat = native.read_cells(path, expected_cells * len(SAVED_VARS),
                                 skip_lines=1 if skip_header else 0)
        if flat is not None:
            vals = flat.reshape(-1, len(SAVED_VARS)).astype(dtype)
            return header, vals

    values = []
    with open(path) as f:
        lines = f.readlines()
    start = 1 if skip_header else 0
    for line in lines[start:]:
        line = line.strip()
        if not line:
            continue
        values.append([np.dtype(dtype).type(tok) for tok in line.split(",")])
    return header, np.asarray(values, dtype=dtype)


def _expected_cells(cfg, with_ghosts):
    g = cfg.nghost
    nx, ny = cfg.n_global
    if with_ghosts:
        nx, ny = nx + 2 * g, ny + 2 * g
    return nx * ny


def read_state_file(cfg, path, with_ghosts=False):
    """Read a file written by `write_state_file` back into per-var arrays
    (`src/io.jl:30-43`)."""
    _, data = _read_rows(path, cfg.dtype,
                         expected_cells=_expected_cells(cfg, with_ghosts))
    return _reshape_vars(cfg, data, with_ghosts)


def read_reference_csv(cfg, path):
    """Read a golden reference file: `dt, cycles` header then cell rows
    (`reference_functions.jl:46-51`). Returns (dt, cycles, {var: (ny, nx)})."""
    header, data = _read_rows(path, cfg.dtype, skip_header=True,
                              expected_cells=_expected_cells(cfg, False))
    dt_str, cycles_str = header.split(",")
    dt = np.dtype(cfg.dtype).type(dt_str)
    cycles = int(cycles_str)
    return dt, cycles, _reshape_vars(cfg, data, with_ghosts=False)


def _reshape_vars(cfg, data, with_ghosts):
    g = cfg.nghost
    nx, ny = cfg.n_global
    if with_ghosts:
        nx, ny = nx + 2 * g, ny + 2 * g
    assert data.shape == (nx * ny, len(SAVED_VARS)), \
        f"expected {nx * ny} cells, got {data.shape[0]}"
    return {v: data[:, k].reshape(ny, nx) for k, v in enumerate(SAVED_VARS)}


def count_differences(cfg, ours: dict, ref: dict, atol, rtol):
    """(diff_count, max_rel_diff) over the saved vars, the gate used by the
    golden regression (`reference_functions.jl:69-121`): a cell differs
    when ``|ref - ours| > max(atol, rtol * max(|ref|, |ours|))`` (Julia
    isapprox semantics), and the max relative diff — ``|ref - ours| /
    max(|ref|, 5e-324)`` — only counts differing cells. The native and
    numpy paths use the same formulas bit-for-bit."""
    from . import native
    total = 0
    max_diff = 0.0
    details = {}
    for var in SAVED_VARS:
        a, b = ref[var], ours[var]
        if (np.dtype(a.dtype).itemsize == 8 and a.dtype == b.dtype
                and native.available()):
            # Native comparator (same isapprox semantics, C loop)
            cnt, m = native.count_differences(a, b, atol, rtol)
            if cnt:
                max_diff = max(max_diff, m)
                details[var] = (cnt, m)
            total += cnt
            continue
        err = np.abs(a - b)
        # Julia isapprox: |a-b| <= max(atol, rtol*max(|a|,|b|)). Negated
        # form so a NaN cell COUNTS as different (err > tol is False for
        # NaN — a diverged state must not pass the zero-diff gate).
        tol = np.maximum(atol, rtol * np.maximum(np.abs(a), np.abs(b)))
        mask = ~(err <= tol)
        cnt = int(mask.sum())
        if cnt:
            # Same zero guard as the native path (smallest subnormal:
            # 5e-324 for f64, the C constant), so the reported max_rel is
            # machine-independent of which path ran. Divide ONLY the
            # differing cells: a non-differing zero-ref cell with tiny
            # noise would overflow err/denom to inf and inf*False = NaN
            # would poison the max.
            denom = np.maximum(np.abs(a), np.finfo(a.dtype).smallest_subnormal)
            m = float((err[mask] / denom[mask]).max())
            max_diff = max(max_diff, m)
            details[var] = (cnt, m)
        total += cnt
    return total, max_diff, details


def compare_states(cfg, state: State, ref: dict, atol, rtol, with_ghosts=False):
    ours = saved_vars_arrays(cfg, state, with_ghosts)
    return count_differences(cfg, ours, ref, atol, rtol)

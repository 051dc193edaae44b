"""1D slice output.

The reference declares `write_slices` (`src/parameters.jl:229,297`) and calls
`write_slices_files` (`src/solver.jl:508`) but never defines it — the option
errors if enabled. Here it is implemented properly: the classic hydro
diagnostics, saved-vars profiles along the middle row, middle column and the
main diagonal, one file per cut, same CSV format as the full output.
"""

import numpy as np

from ..core.state import SAVED_VARS
from .output import saved_vars_arrays


def write_slices_files(cfg, state, base_path, precision=None):
    if precision is None:
        precision = 17 if np.dtype(cfg.dtype).itemsize == 8 else 9
    arrs = saved_vars_arrays(cfg, state)
    ny, nx = arrs["x"].shape
    cuts = {
        "X": {v: arrs[v][ny // 2, :] for v in SAVED_VARS},           # along X
        "Y": {v: arrs[v][:, nx // 2] for v in SAVED_VARS},           # along Y
        "D": {v: np.diagonal(arrs[v])[: min(nx, ny)] for v in SAVED_VARS},
    }
    fmt = ", ".join(["%%#%d.%de" % (precision + 7, precision)] * len(SAVED_VARS))
    paths = []
    for name, cut in cuts.items():
        path = f"{base_path}_{name}_slice"
        n = len(cut["x"])
        with open(path, "w") as f:
            for i in range(n):
                f.write(fmt % tuple(cut[v][i] for v in SAVED_VARS))
                f.write("\n")
        paths.append(path)
    return paths

"""Checkpoint / restart.

The reference has no restart capability — its "checkpoints" are per-sub-step
comparison files (`src/io.jl:185-227`, covered by the compare mode here).
SURVEY.md §5 calls for proper array dumps on TPU; this module provides them:
exact binary state snapshots (npz) carrying the full solver carry
(state, t, cycle, dt, CFL min) plus a config fingerprint, so a run can stop
and resume bit-exactly.

    save_checkpoint(path, params, state, t, cycles, dt_prev)
    state, t, cycles, dt_prev, local_min = load_checkpoint(path, params)
    armon(params, restore_from=path)

Periodic saving: ``checkpoint_step=N`` writes `<output_file>.ckpt.npz`
every N cycles (forces the per-cycle driver).
"""

import numpy as np

import jax

from ..core.state import State
from ..utils.errors import solver_error


def _fingerprint(params):
    cfg = params.config
    return (f"{cfg.n_global}|{cfg.nghost}|{np.dtype(cfg.dtype).name}|"
            f"{cfg.test!r}|{cfg.riemann}|{cfg.limiter}|{cfg.projection}|"
            f"{cfg.splitting}|{cfg.proc_dims}")


def save_checkpoint(path, params, state, t, cycles, dt_prev, local_min=None):
    """Write an exact snapshot. `state` may be sharded (gathered here).
    `local_min` is the fused tier's carried CFL minimum; when omitted it is
    taken from the params' last jit-loop run if available."""
    from ..core.solver import gather_state
    if local_min is None:
        local_min = getattr(params, "_final_local_min", None)
    host = gather_state(params, state)
    arrays = {f"field_{name}": np.asarray(a)
              for name, a in zip(State._fields, host)}
    np.savez(
        path,
        __fingerprint=np.array(_fingerprint(params)),
        __t=np.asarray(t), __cycles=np.int64(cycles),
        __dt_prev=np.asarray(dt_prev),
        __local_min=np.asarray(local_min if local_min is not None else np.nan),
        **arrays,
    )


def load_checkpoint(path, params):
    """Read a snapshot back; validates the config fingerprint. Returns
    (device_state, t, cycles, dt_prev, local_min|None)."""
    from ..core.solver import host_to_device
    with np.load(path, allow_pickle=False) as z:
        fp = str(z["__fingerprint"])
        if fp != _fingerprint(params):
            solver_error("config",
                         f"checkpoint was written with a different "
                         f"configuration:\n  {fp}\n  != {_fingerprint(params)}")
        host = State(*[z[f"field_{name}"] for name in State._fields])
        t = float(z["__t"])
        cycles = int(z["__cycles"])
        dt_prev = float(z["__dt_prev"])
        lm = float(z["__local_min"])
    state = host_to_device(params, host)
    return state, t, cycles, dt_prev, (None if np.isnan(lm) else lm)

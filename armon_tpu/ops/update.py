"""Lagrangian cell update (`src/kernels.jl:58-68,217-230`)."""

from ..utils.enums import Axis
from .shifts import sh


def cell_update(cfg, state, axis: Axis, dt):
    """rho, u_axis, E update from the (ustar, pstar) fluxes. `dx` is the cell
    size along the sweep axis; the mass `dm` uses the pre-update density
    (`src/kernels.jl:64-67`)."""
    import numpy as np
    T = np.dtype(cfg.dtype).type
    dx = T(cfg.cell_size(axis))

    uax = state.u if axis is Axis.X else state.v
    us, ps = state.ustar, state.pstar
    us_p = sh(us, 1, axis)
    ps_p = sh(ps, 1, axis)

    dm = state.rho * dx
    rho_new = dm / (dx + dt * (us_p - us))
    uax_new = uax + dt / dm * (ps - ps_p)
    E_new = state.E + dt / dm * (ps * us - ps_p * us_p)

    if axis is Axis.X:
        return state._replace(rho=rho_new, u=uax_new, E=E_new)
    return state._replace(rho=rho_new, v=uax_new, E=E_new)

"""Eulerian projection (remap) — `src/projection_schemes.jl`.

- conservative remap `euler_projection!`:        `src/projection_schemes.jl:23-41`
- 1st-order upwind advection fluxes:             `src/projection_schemes.jl:62-78`
- 2nd-order slope-limited advection fluxes:      `src/projection_schemes.jl:92-124`
- minmod slope:                                  `src/projection_schemes.jl:15-20`

The reference's data-dependent upwind shift (``if disp > 0: i -= s``) becomes
a `jnp.where` select between the unshifted and left-shifted reads.
"""

import jax.numpy as jnp
import numpy as np

from ..utils.enums import Axis
from .shifts import sh


def _slope_minmod(u_m, u_i, u_p, r_m, r_p):
    """`src/projection_schemes.jl:15-20`."""
    du_p = r_p * (u_p - u_i)
    du_m = r_m * (u_i - u_m)
    s = jnp.sign(du_p)
    return s * jnp.maximum(0.0, jnp.minimum(s * du_p, s * du_m))


def advection_first_order(cfg, state, axis: Axis, dt):
    """Upwind advection fluxes (`src/projection_schemes.jl:62-78`).
    Returns (adv_rho, adv_urho, adv_vrho, adv_Erho)."""
    us = state.ustar
    disp = dt * us
    up = disp > 0  # upwind: read the left cell

    def pick(a):
        return jnp.where(up, sh(a, -1, axis), a)

    rho = pick(state.rho)
    ru = pick(state.rho * state.u)
    rv = pick(state.rho * state.v)
    rE = pick(state.rho * state.E)
    return disp * rho, disp * ru, disp * rv, disp * rE


def advection_second_order(cfg, state, axis: Axis, dt):
    """Slope-limited advection fluxes over the ustar-deformed cells
    (`src/projection_schemes.jl:92-124`)."""
    T = np.dtype(cfg.dtype).type
    dx = T(cfg.cell_size(axis))
    us = state.ustar
    disp = dt * us
    up = disp > 0

    # Reads at offset `o` relative to the (possibly shifted) upwind index i'.
    def rd(a, o):
        return jnp.where(up, sh(a, o - 1, axis), sh(a, o, axis))

    # src/projection_schemes.jl:100-105
    dxe = jnp.where(up, -(dx - dt * sh(us, -1, axis)), dx + dt * sh(us, 1, axis))

    dxl_m = dx + dt * (rd(us, 0) - rd(us, -1))
    dxl = dx + dt * (rd(us, 1) - rd(us, 0))
    dxl_p = dx + dt * (rd(us, 2) - rd(us, 1))

    r_m = (2 * dxl) / (dxl + dxl_m)
    r_p = (2 * dxl) / (dxl + dxl_p)

    # The upwind select commutes exactly with the product (`rd` picks the
    # same branch for both factors, and a shift is a permutation), so the
    # conserved products are formed ONCE and shifted, instead of forming
    # them per offset from shifted factors — bitwise identical, 6 fewer
    # multiplies per sweep.
    ru, rv, rE = state.rho * state.u, state.rho * state.v, state.rho * state.E
    rho_m, rho_i, rho_p = rd(state.rho, -1), rd(state.rho, 0), rd(state.rho, 1)
    ru_m, ru_i, ru_p = rd(ru, -1), rd(ru, 0), rd(ru, 1)
    rv_m, rv_i, rv_p = rd(rv, -1), rd(rv, 0), rd(rv, 1)
    rE_m, rE_i, rE_p = rd(rE, -1), rd(rE, 0), rd(rE, 1)

    sl_rho = _slope_minmod(rho_m, rho_i, rho_p, r_m, r_p)
    sl_ur = _slope_minmod(ru_m, ru_i, ru_p, r_m, r_p)
    sl_vr = _slope_minmod(rv_m, rv_i, rv_p, r_m, r_p)
    sl_Er = _slope_minmod(rE_m, rE_i, rE_p, r_m, r_p)

    length_factor = dxe / (2 * dxl)
    adv_rho = disp * (rho_i - sl_rho * length_factor)
    adv_ur = disp * (ru_i - sl_ur * length_factor)
    adv_vr = disp * (rv_i - sl_vr * length_factor)
    adv_Er = disp * (rE_i - sl_Er * length_factor)
    return adv_rho, adv_ur, adv_vr, adv_Er


def euler_projection(cfg, state, axis: Axis, dt, fluxes):
    """Conservative remap (`src/projection_schemes.jl:23-41`)."""
    T = np.dtype(cfg.dtype).type
    dx = T(cfg.cell_size(axis))
    us = state.ustar
    adv_rho, adv_ur, adv_vr, adv_Er = fluxes

    dX = dx + dt * (sh(us, 1, axis) - us)

    tmp_rho = (dX * state.rho - (sh(adv_rho, 1, axis) - adv_rho)) / dx
    tmp_ur = (dX * state.rho * state.u - (sh(adv_ur, 1, axis) - adv_ur)) / dx
    tmp_vr = (dX * state.rho * state.v - (sh(adv_vr, 1, axis) - adv_vr)) / dx
    tmp_Er = (dX * state.rho * state.E - (sh(adv_Er, 1, axis) - adv_Er)) / dx

    return state._replace(
        rho=tmp_rho,
        u=tmp_ur / tmp_rho,
        v=tmp_vr / tmp_rho,
        E=tmp_Er / tmp_rho,
    )


def projection_remap(cfg, state, axis: Axis, dt):
    """advection fluxes + conservative remap (`src/projection_schemes.jl:148-157`)."""
    if cfg.projection == "euler":
        fluxes = advection_first_order(cfg, state, axis, dt)
    elif cfg.projection == "euler_2nd":
        fluxes = advection_second_order(cfg, state, axis, dt)
    else:
        raise ValueError(f"Unknown projection scheme: {cfg.projection}")
    return euler_projection(cfg, state, axis, dt, fluxes)

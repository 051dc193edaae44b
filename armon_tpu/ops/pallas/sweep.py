"""Fused Pallas sweep kernels — the native kernel tier.

This is the TPU rebuild of the reference's native kernel surface: the
`@generic_kernel` codegen (`src/generic_kernel.jl:940-991`) plus the C++
Kokkos kernel library (`ext/ArmonKokkos.jl`, SURVEY.md §2.3.1), and at the
same time the replacement for the cache-blocking runtime (`src/blocking/`):
Pallas grid tiles pipelined through VMEM play the role of the reference's
cache blocks, with Mosaic doing the double-buffered HBM->VMEM streaming the
per-block state machine (`src/solver.jl:58-179`) did by hand.

One kernel instance executes the WHOLE sweep for its tile in VMEM:

    EOS -> Riemann fluxes -> Lagrangian update -> advection -> projection
    (+ the CFL dt per-tile min-reduction of `src/reductions.jl:2-20`)

so per sweep each field crosses HBM once (read rho,u,v,E + write
rho,u,v,E,p) instead of once per kernel, and the field outputs ALIAS their
input buffers (`fused_sweep_ip`) so the jitted time loop carries zero
full-array copies. Single-device ghost-band filling runs IN-KERNEL —
Y-axis mirror rows spliced into the halo concat (`_halo_cat_bc`), X-axis
mirror lanes via aligned-slice static rolls (`_bc_x_apply`) — bitwise
identical to the XLA slab writes and without their 8 launches per sweep.
(A round-2 in-kernel variant lost to lane-MISALIGNED border concats;
the current fills cut only at 128-aligned lanes / whole rows.) The mesh
path's ghost fill stays outside: the ppermute halo exchange.

Temporal blocking (two cycles per pass) was implemented and benched in
round 1 (+5% at mid sizes, loses at 8192²) and removed: the kernel is
compute-bound below the ~480 GB/s streaming ceiling (~65% of it after
the round-2 static-roll work, BENCH_NOTES.md), so trading HBM traffic
for extra halo compute does not pay on this part.

Tiling:
- X sweep: tiles of TILE_R full-width rows; rows are independent (the sweep
  stencil is 1D), so no inter-tile halo at all.
- Y sweep: tiles of (CHUNK rows x TILE_C lanes) plus one 8-row aligned halo
  block above and below (the full sweep dependency depth is
  stencil(riemann) + stencil(projection) <= 4 — the params.py nghost
  floor; measured by perturbation, tighter than the reference's product
  rule `src/parameters.jl:609-613`, which under-counts at 1st-order
  projections).

In-tile shifted reads use static `jnp.roll` (wrap-around): wrapped values only
ever land in cells whose results are never consumed — the same argument as
the jnp tier (`armon_tpu.ops.shifts`).

The stale p (and in-kernel c) written out reproduce the reference's
observable state exactly: p is last written by the EOS at the *start* of a
sweep (`src/solver.jl:303`), and the next cycle's CFL reduction reads that
stale c with the post-remap u,v (`src/reductions.jl:97-199`) — which is
precisely (c from kernel input state, u/v from kernel output).
"""

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.enums import Axis
from ...models.cases import Bizarrium


def pallas_supported(cfg) -> bool:
    """The fused tier covers every scheme combination; f64 is supported via
    interpret mode on CPU and Mosaic f64 on TPU (slower)."""
    return True


# Measurement knob (read once per process, like ARMON_SWEEP_VARIANT): force
# the ghost fills OUT of the kernels back onto the XLA slab-write path and
# drop the self-emitted strip carries — the code shape a shard of a fully
# 2D-sharded mesh runs (per-axis `proc_dims` gates below: along a FLAT mesh
# axis the fill is the position-independent mirror and stays in-kernel even
# on meshes). Lets a single chip A/B the per-shard mesh-path fill penalty
# without a mesh (VERDICT r3 item 3).
_FORCE_XLA_FILLS = os.environ.get("ARMON_FORCE_XLA_FILLS", "") not in ("", "0")


# --------------------------------------------------------------- in-kernel math

def _EXACT_DIV(a, b):
    return a / b


def _make_div(cfg, interpret):
    """Division primitive: exact IEEE unless fast_math (f32, compiled) —
    then the VPU's approximate reciprocal refined by one Newton step
    (~1 ulp relative), the Pallas analog of the reference's @fastmath
    default (`src/generic_kernel.jl:3`)."""
    if (not cfg.fast_math or interpret
            or np.dtype(cfg.dtype).itemsize != 4):
        return _EXACT_DIV

    def fast_div(a, b):
        r = pl.reciprocal(b, approx=True)
        r = r * (2.0 - b * r)  # Newton-Raphson refinement
        return a * r

    return fast_div


def _limiter(name, r):
    # src/limiters.jl:6-8
    if name == "no_limiter":
        return jnp.ones_like(r)
    if name == "minmod":
        return jnp.maximum(0.0, jnp.minimum(1.0, r))
    return jnp.maximum(jnp.maximum(0.0, jnp.minimum(2.0 * r, 1.0)),
                       jnp.minimum(r, 2.0))


def _eos_prc(cfg, T, rho, u, v, E, div=None, need_c=True, variant=""):
    """Returns (p, rho*c, c, r_rho). The acoustic impedance rho*c is what the
    Riemann solve and theta-blend actually consume (`src/riemann_schemes.jl:
    21-30,76-80`); c itself is only needed by the CFL reduction. Under
    fast_math with need_c=False the impedance is formed directly —
    sqrt(gamma*p*rho) instead of rho*sqrt(gamma*p/rho), saving a division
    (~1 ulp apart; exact-IEEE mode always computes c so golden runs keep
    the reference expression bitwise). c is None when skipped. `r_rho` is
    the Newton-refined reciprocal of rho when the EOS already formed one
    (the Bizarrium fast chain) — the Lagrangian update reuses it for
    dt/dm = (dt/dx)*r_rho, dropping that whole reciprocal chain (round 5;
    None whenever the EOS has no refined reciprocal to share)."""
    if div is None:
        div = _EXACT_DIV
    fast = div is not _EXACT_DIV
    # "pgeos" (measurement-only, ARMON_SWEEP_VARIANT): run the stiff-EOS
    # case through the perfect-gas chain below — physically wrong, but
    # byte-identical memory traffic, so the grind delta vs the real chain
    # IS the stiff-EOS ALU premium (BENCH_NOTES round 4).
    def _biz_fast(guard=False):
        # fast_math restructure of the same chain (~1-2 ulp from the
        # reference forms; exact-IEEE mode below keeps them bitwise
        # for the golden ladder): Horner polynomials, G folded into
        # epsk0 through ONE shared Newton-refined 1/rho (also reused
        # by c), p - pk0 == G0*rho0*(e - epsk0) reused under the
        # sqrt, and rc == sq directly (rho * (sq/rho) reassociated).
        # ~10 fewer elementwise ops + one exact divide and one full
        # reciprocal chain removed per cell on the stiff-EOS path.
        rho0 = T(10000.0); K0 = T(1e11); Cv0 = T(1000.0); T0 = T(300.0)
        eps0 = T(0.0); G0 = T(1.5); s = T(1.5)
        q = T(-42080895.0 / 14941154.0); r = T(727668333.0 / 149411540.0)
        # 'bizraw' (A/B knob, round 5): drop the two Newton refinements —
        # raw VPU reciprocals are ~2^-12 relative, amplified through the
        # rational chain to ~1e-4-class EOS error; admissible only if the
        # 5e-3 hardware golden gate (scripts/tpu_validate.py) still holds.
        raw = "bizraw" in variant
        r_rho = pl.reciprocal(rho, approx=True)
        if not raw:
            r_rho = r_rho * (2.0 - rho * r_rho)
        x = rho * T(1.0 / 10000.0) - 1
        x2 = x * x
        if raw:
            den = 1 - s * x
            r_den = pl.reciprocal(den, approx=True)
            over_sx = lambda a: a * r_den
        else:
            over_sx = _div_shared(div, 1 - s * x)
        k = T(s / 3 - 2)
        f0 = over_sx(((r * x + q) * x + k) * x + 1)
        f1 = over_sx((3 * r * x + 2 * q) * x + k + s * f0)
        f2t = over_sx(6 * r * x + 2 * q + 2 * s * f1)
        # epsk0 with G = G0*(1 - rho0/rho) folded:
        # -Cv0*T0*(1+G) = -Cv0*T0*(1+G0) + Cv0*T0*G0*rho0/rho.
        epsk0 = ((eps0 - Cv0 * T0 * (1 + G0))
                 + (Cv0 * T0 * G0 * rho0) * r_rho
                 + (T(0.5) * K0 / rho0) * (x2 * f0))
        xp1 = 1 + x
        xp12 = xp1 * xp1
        pk0 = (-Cv0 * T0 * G0 * rho0
               + (T(0.5) * K0) * (x * xp12) * (2 * f0 + x * f1))
        # inner terms expanded FMA-style: 2(1+3x) = 6x+2,
        # 2x(2+3x) = x*(6x+4), x^2(1+x) = x2*xp1.
        pk0prime = (-T(0.5) * K0 * rho0) * (xp12 * xp1) * (
            (6 * x + 2) * f0 + (x * (6 * x + 4)) * f1
            + (x2 * xp1) * f2t)
        e = E - 0.5 * (u ** 2 + v ** 2)
        tt = (G0 * rho0) * (e - epsk0)
        p = pk0 + tt
        arg = (G0 * rho0) * tt - pk0prime
        if guard:
            # measurement-only ('addbiz' on a non-Bizarrium state): the
            # argument goes negative off the EOS's physical branch — one
            # clamp keeps the blended-at-1e-30 chain NaN-free without
            # touching the production path.
            arg = jnp.maximum(arg, 0.0)
        sq = jnp.sqrt(arg)
        return p, sq, r_rho

    if isinstance(cfg.test, Bizarrium) and "pgeos" not in variant:
        rho0 = T(10000.0); K0 = T(1e11); Cv0 = T(1000.0); T0 = T(300.0)
        eps0 = T(0.0); G0 = T(1.5); s = T(1.5)
        q = T(-42080895.0 / 14941154.0); r = T(727668333.0 / 149411540.0)
        if fast and "eosref" not in variant:
            p, sq, r_rho = _biz_fast()
            # share r_rho with the Lagrangian dt/dm only when it carries
            # the Newton refinement (under 'bizraw' it is the 2^-12 raw
            # reciprocal — correction-grade, not update-grade).
            rr = (None if ("bizraw" in variant or "nodtr" in variant)
                  else r_rho)
            if not need_c:
                return p, sq, None, rr
            c = sq * r_rho
            return p, sq, c, rr
        x = rho / rho0 - 1
        G = G0 * (1 - div(rho0, rho))
        # f0, f1 and the pk0prime inner term all divide by the SAME
        # (1 - s*x): share the (Newton-refined) reciprocal — bitwise
        # identical in both div modes (_div_shared), 2 fewer reciprocal
        # chains per cell on the stiff-EOS path.
        over_sx = _div_shared(div, 1 - s * x)
        f0 = over_sx(1 + (s / 3 - 2) * x + q * x ** 2 + r * x ** 3)
        f1 = over_sx(s / 3 - 2 + 2 * q * x + 3 * r * x ** 2 + s * f0)
        epsk0 = eps0 - Cv0 * T0 * (1 + G) + 0.5 * (K0 / rho0) * x ** 2 * f0
        pk0 = -Cv0 * T0 * G0 * rho0 + 0.5 * K0 * x * (1 + x) ** 2 * (2 * f0 + x * f1)
        pk0prime = -0.5 * K0 * (1 + x) ** 3 * rho0 * (
            2 * (1 + 3 * x) * f0 + 2 * x * (2 + 3 * x) * f1
            + x ** 2 * (1 + x) * over_sx(2 * q + 6 * r * x + 2 * s * f1))
        e = E - 0.5 * (u ** 2 + v ** 2)
        p = pk0 + G0 * rho0 * (e - epsk0)
        sq = jnp.sqrt(G0 * rho0 * (p - pk0) - pk0prime)
        if fast and not need_c:
            return p, sq, None, None  # rho * (sq/rho) == sq up to 2 ulp
        c = div(sq, rho)
        return p, rho * c, c, None
    gm = T(cfg.gamma)
    e = E - 0.5 * (u ** 2 + v ** 2)
    p = (gm - T(1.0)) * rho * e
    if fast and "addbiz" in variant:
        # "addbiz" (measurement-only, ARMON_SWEEP_VARIANT): ALSO evaluate
        # the stiff-EOS fast chain on this (stable, e.g. Sod) state and
        # blend it in at 1e-30 so it cannot be dead-code-eliminated —
        # measures the stiff-chain ALU premium on identical traffic and
        # NaN-free data (the inverse 'pgeos' run aborts: perfect-gas math
        # on Bizarrium's state is unstable). BENCH_NOTES round 4.
        pb, sqb, _ = _biz_fast(guard=True)
        tiny = T(1e-30)
        p = p + tiny * pb
        if not need_c:
            return p, jnp.sqrt(gm * p * rho) + tiny * sqb, None, None
        c = jnp.sqrt(div(gm * p, rho)) + tiny * sqb
        return p, rho * c, c, None
    if fast and not need_c:
        return p, jnp.sqrt(gm * p * rho), None, None
    c = jnp.sqrt(div(gm * p, rho))
    return p, rho * c, c, None


def _make_div_correction(div):
    """Division for 2nd-order CORRECTION factors (limiter slope ratios,
    slope scale factors, theta, length factor): under fast_math these
    tolerate the raw approximate reciprocal (no Newton step) — the ~2^-12
    relative error only perturbs a correction term that is itself a small
    fraction of the primary quantity, far below the f32 golden ladder
    (verified zero-diff on-chip). Exact-IEEE mode is unchanged."""
    if div is _EXACT_DIV:
        return div

    def div_c(a, b):
        return a * pl.reciprocal(b, approx=True)

    return div_c


def _div_shared(div, b):
    """a -> a/b with the Newton-refined reciprocal of b formed ONCE under
    fast_math (shared across every numerator over the same denominator);
    exact IEEE division otherwise. Bitwise identical to calling `div` per
    numerator in both modes — it just guarantees the reuse instead of
    relying on Mosaic CSE."""
    if div is _EXACT_DIV:
        return lambda a: a / b
    r = pl.reciprocal(b, approx=True)
    r = r * (2.0 - b * r)
    return lambda a: a * r


def _godunov(rc_l, rc_r, u_i, u_im, p_i, p_im, div=None):
    # src/riemann_schemes.jl:21-30 (rc = rho*c acoustic impedances).
    # Also returns the impedance sum rc_l + rc_r: the GAD theta factor
    # consumes the same sum (src/riemann_schemes.jl:76-80), so forming it
    # once saves an add per cell.
    if div is None:
        div = _EXACT_DIV
    rc_sum = rc_l + rc_r
    over = _div_shared(div, rc_sum)
    ustar = over(rc_l * u_im + rc_r * u_i + (p_im - p_i))
    pstar = over(rc_r * p_im + rc_l * p_i + rc_l * rc_r * (u_im - u_i))
    return ustar, pstar, rc_sum


def _sweep_math(cfg, sh, dt, dx, rho, uax, uot, E, div=None, need_c=True,
                slope_shift=False, variant=""):
    """Full sweep on one tile. `sh(a, k)` reads at offset +k along the sweep
    axis. `uax` is the velocity along the axis, `uot` the other one, `dx` the
    cell size along the axis (a T scalar). `div` is the division primitive:
    exact IEEE by default; approximate-reciprocal under `fast_math` (the
    reference's own default build uses @fastmath, src/generic_kernel.jl:3).
    `need_c=False` lets the fast path skip forming the sound speed itself
    (only the CFL reduction consumes it — returns c_stale=None then).
    `slope_shift` picks between two bitwise-identical euler_2nd slope
    formulations (see the GAD/euler_2nd branch): True (shifted-base) wins
    on both axes under static-roll shifts and is the production setting.
    Returns (rho', uax', uot', E', p_stale, c_stale)."""
    T = np.dtype(cfg.dtype).type
    if div is None:
        div = _EXACT_DIV

    if "iofloor" in variant:
        # Measurement-only (ARMON_SWEEP_VARIANT=iofloor): strip the sweep
        # math but keep the production kernel's exact I/O pipeline —
        # same tiles, specs, aliasing, SMEM scalars, strip emission, BC
        # fills, p stream and CFL reduction. The measured cycle time IS
        # the pipeline's achievable I/O floor; production minus this is
        # the VPU time the DMA cannot hide (BENCH_NOTES round 4).
        one = T(1.0)
        return (rho + one, uax + one, uot + one, E + one,
                rho, jnp.ones_like(rho))

    # EOS (src/kernels.jl:4-13) — from the input (pre-sweep) state.
    p, rc, c, r_rho = _eos_prc(cfg, T, rho, uax, uot, E, div, need_c=need_c,
                               variant=variant)

    # Cell mass (src/kernels.jl:60) — hoisted: the GAD theta term reads it
    # and its -1 shift (sh is a permutation, so sh(dm) == sh(rho)*dx bitwise).
    dm = rho * dx

    # ---- Riemann fluxes. sh is a permutation, so sh(rc) == sh(rho)*sh(c)
    # bitwise — the shifted impedances equal the reference's rho_m*c_m.
    if cfg.riemann == "Godunov":
        ustar, pstar, _ = _godunov(sh(rc, -1), rc,
                                   uax, sh(uax, -1), p, sh(p, -1), div)
    else:  # GAD (src/riemann_schemes.jl:55-104)
        rc_l = sh(rc, -1)
        u_m = sh(uax, -1)
        p_m = sh(p, -1)

        us_i, ps_i, rc_sum = _godunov(rc_l, rc, uax, u_m, p, p_m, div)
        # The neighbouring interface solves are the SAME elementwise map on
        # shifted inputs, and `sh` is a rotation (a permutation), which
        # commutes exactly with elementwise math: deriving them by shifting
        # the i-1/2 solve is bitwise identical everywhere (wrapped lanes
        # included) while removing 2 of the 3 Godunov solves and 8 rolls.
        # The same argument collapses the limiter-ratio numerators onto
        # shifts of the four blend differences (us_ip - uax == sh(e_u, 1),
        # u_m - us_im == sh(d_u, -1), ...) — 4 fewer subtractions, and the
        # neighbour interface solves are never materialized at all.
        e_u = us_i - u_m    # interface-minus-left, the r_um denominator
        e_p = ps_i - p_m
        d_u = uax - us_i    # right-minus-interface, the r_up denominator
        d_p = p - ps_i

        div_r = _make_div_correction(div)
        eps = T(1e-6)
        r_um = _limiter(cfg.limiter, div_r(sh(e_u, 1), e_u + eps))
        r_pm = _limiter(cfg.limiter, div_r(sh(e_p, 1), e_p + eps))
        r_up = _limiter(cfg.limiter, div_r(sh(d_u, -1), d_u + eps))
        r_pp = _limiter(cfg.limiter, div_r(sh(d_p, -1), d_p + eps))

        dm_l = sh(dm, -1)
        if div is _EXACT_DIV:
            Dm = (dm_l + dm) / 2
            theta = T(0.5) * (1 - rc_sum / 2 * div_r(dt, Dm))
        else:
            # fast_math: the two /2 cancel — theta = (1 - S*dt/D)/2 with
            # S = rc_l+rc (shared with the Godunov denominator), D =
            # dm_l+dm; ~1 ulp from the reference form on a 2nd-order
            # correction factor (same argument as div_r itself).
            theta = T(0.5) * (1 - rc_sum * div_r(dt, dm_l + dm))

        ustar = us_i + theta * (r_up * d_u - r_um * e_u)
        pstar = ps_i + theta * (r_pp * d_p - r_pm * e_p)

    # ---- Lagrangian cell update (src/kernels.jl:58-68)
    us_p = sh(ustar, 1)
    ps_p = sh(pstar, 1)
    # dX = post-Lagrange cell length (src/projection_schemes.jl:29) — also
    # the cell_update denominator, and the euler_2nd dxl lengths are its
    # upwind shifts (permutations commute with elementwise math, bitwise).
    dX = dx + dt * (us_p - ustar)
    rho1 = div(dm, dX)
    if r_rho is not None:
        # dt/dm = dt/(rho*dx) = (dt/dx) * (1/rho): dt/dx is one exact
        # scalar op (dt traced, dx a trace-time constant), and the EOS
        # already holds the Newton-refined 1/rho — same ~1 ulp class as
        # div(dt, dm), one whole vector reciprocal chain fewer per cell
        # on the stiff-EOS path ('nodtr' in ARMON_SWEEP_VARIANT restores
        # the direct divide for A/Bs).
        dt_dm = (dt * (T(1.0) / dx)) * r_rho
    else:
        dt_dm = div(dt, dm)
    uax1 = uax + dt_dm * (pstar - ps_p)
    E1 = E + dt_dm * (pstar * ustar - ps_p * us_p)

    if "halfmath" in variant:
        # Measurement-only third calibration point (with 'iofloor' and the
        # full sweep): EOS + Riemann + Lagrangian update, advection and
        # projection skipped — roughly half the arithmetic on the same
        # pipeline. Tests the linearity of (measured - iofloor) in the
        # op count (BENCH_NOTES round 4).
        return rho1, uax1, uot, E1, p, c

    # ---- Advection fluxes (src/projection_schemes.jl:62-124)
    disp = dt * ustar
    up = disp > 0

    if cfg.projection == "euler":
        def pick(a):
            return jnp.where(up, sh(a, -1), a)
        adv_rho = disp * pick(rho1)
        adv_ur = disp * pick(rho1 * uax1)
        adv_vr = disp * pick(rho1 * uot)
        adv_Er = disp * pick(rho1 * E1)
    else:
        def rd(a, o):
            return jnp.where(up, sh(a, o - 1), sh(a, o))
        div_c = _make_div_correction(div)
        # Upwind select commutes exactly with the product (same mask both
        # factors; shifts are permutations): form the conserved products
        # once, then shift — bitwise identical, 6 fewer multiplies.
        ru1, rv1, rE1 = rho1 * uax1, rho1 * uot, rho1 * E1
        # dxl == dx + dt*(rd(ustar,1) - rd(ustar,0)) == rd(dX, 0): both rd
        # branches are shifts of the SAME elementwise expression dX, and
        # where() selects lanewise — bitwise identical.
        dxl = rd(dX, 0)

        if slope_shift:
            # Sublane (Y) form. The whole limited-slope computation of the
            # UP branch at cell i is the base (unshifted) computation at
            # cell i-1: its lengths are sh(dX,-2..0) = the base lengths
            # shifted by -1, its values sh(q,-2..0) likewise, and every op
            # is elementwise — so slope_upwind == rd(slope_base, 0),
            # bitwise. One select per field instead of three, and the
            # r_m/r_p length factors lose their selects entirely. (With
            # the old dynamic-rotate shifts this form lost on the lane
            # axis; with static jnp.roll shifts it wins on BOTH axes —
            # measured -5% X / -3% Y per sweep — so it is the default.
            # The direct form below is kept selectable for future A/Bs.)
            # dt*sh(ustar,±1) == sh(disp,±1) and -(dx - b) == b - dx, all
            # bitwise (permutations commute with the scalar multiply;
            # negation and rounding are sign-symmetric) — 2 fewer
            # multiplies.
            dxe = jnp.where(up, sh(disp, -1) - dx, dx + sh(disp, 1))
            # Two independent ratio chains. (A shared-sum/shifted-reciprocal
            # form — r_m's denominator is the -1 shift of r_p's, and the
            # elementwise reciprocal commutes with the shift — is bitwise
            # identical with one fewer add+reciprocal, but measured SLOWER:
            # -2.3% on X, -0.4% on Y ("shareB" A/B, round-3 probe): the
            # sh(dX,-1) it removes is already CSE'd with dxl's select, so
            # it adds a roll and a serial recip->roll->mul dependency.)
            if "shareB" in variant:
                S_p = dX + sh(dX, 1)
                if div is _EXACT_DIV:
                    r_p = (2 * dX) / S_p
                    r_m = (2 * dX) / sh(S_p, -1)
                else:
                    rS_p = pl.reciprocal(S_p, approx=True)
                    r_p = (2 * dX) * rS_p
                    r_m = (2 * dX) * sh(rS_p, -1)
            else:
                r_m = div_c(2 * dX, dX + sh(dX, -1))
                r_p = div_c(2 * dX, dX + sh(dX, 1))

            # (A shift-derived du_m — q - sh(q,-1) == sh(d,-1) for
            # d = sh(q,1) - q — is bitwise only when sh is a pure
            # rotation; the Y/pair kernels' sh is a buffer SLICE, where
            # re-slicing the materialized window clamps at its edge and
            # leaks wrong values into real cells (fingerprint-refuted,
            # round 4). Not worth an axis-split for 4 subs/sweep.)
            def slope_base(q):
                du_p = r_p * (sh(q, 1) - q)
                du_m = r_m * (q - sh(q, -1))
                sgn = jnp.sign(du_p)
                # sign(x)*x == |x| bitwise (negation exact; sign(±0)=±0
                # and ±0*±0 = +0 = |±0|; NaN propagates) — one fewer mul
                # per field (src/projection_schemes.jl:95 slope form).
                return sgn * jnp.maximum(0.0,
                                         jnp.minimum(jnp.abs(du_p),
                                                     sgn * du_m))

            rr_i, ru_i = rd(rho1, 0), rd(ru1, 0)
            rv_i, rE_i = rd(rv1, 0), rd(rE1, 0)
            sl_rho = rd(slope_base(rho1), 0)
            sl_ur = rd(slope_base(ru1), 0)
            sl_vr = rd(slope_base(rv1), 0)
            sl_Er = rd(slope_base(rE1), 0)
        else:
            # Lane (X) form: direct upwind reads — independent rolls of the
            # input arrays schedule better than a dependent roll of the
            # computed slope.
            dxe = jnp.where(up, -(dx - dt * sh(ustar, -1)),
                            dx + dt * sh(ustar, 1))
            dxl_m = rd(dX, -1)
            dxl_p = rd(dX, 1)
            r_m = div_c(2 * dxl, dxl + dxl_m)
            r_p = div_c(2 * dxl, dxl + dxl_p)

            def slope(m, i, pp):
                du_p = r_p * (pp - i)
                du_m = r_m * (i - m)
                sgn = jnp.sign(du_p)
                # sign(x)*x == |x| bitwise — see slope_base above.
                return sgn * jnp.maximum(0.0,
                                         jnp.minimum(jnp.abs(du_p),
                                                     sgn * du_m))

            rr_m, rr_i, rr_p = rd(rho1, -1), rd(rho1, 0), rd(rho1, 1)
            ru_m, ru_i, ru_p = rd(ru1, -1), rd(ru1, 0), rd(ru1, 1)
            rv_m, rv_i, rv_p = rd(rv1, -1), rd(rv1, 0), rd(rv1, 1)
            rE_m, rE_i, rE_p = rd(rE1, -1), rd(rE1, 0), rd(rE1, 1)
            sl_rho = slope(rr_m, rr_i, rr_p)
            sl_ur = slope(ru_m, ru_i, ru_p)
            sl_vr = slope(rv_m, rv_i, rv_p)
            sl_Er = slope(rE_m, rE_i, rE_p)

        lf = div_c(dxe, 2 * dxl)
        adv_rho = disp * (rr_i - sl_rho * lf)
        adv_ur = disp * (ru_i - sl_ur * lf)
        adv_vr = disp * (rv_i - sl_vr * lf)
        adv_Er = disp * (rE_i - sl_Er * lf)

    # ---- Projection (src/projection_schemes.jl:23-41)
    if div is _EXACT_DIV:
        def div_dx(a):
            return a / dx
    else:
        # fast_math: dx is a trace-time constant — one exact host-side
        # reciprocal, then multiplies (<= 1 ulp; exact when dx is a power
        # of two, e.g. any 2^k grid over a unit domain).
        inv_dx = T(1.0) / dx

        def div_dx(a):
            return a * inv_dx

    tmp_rho = div_dx(dX * rho1 - (sh(adv_rho, 1) - adv_rho))
    tmp_ur = div_dx(dX * rho1 * uax1 - (sh(adv_ur, 1) - adv_ur))
    tmp_vr = div_dx(dX * rho1 * uot - (sh(adv_vr, 1) - adv_vr))
    tmp_Er = div_dx(dX * rho1 * E1 - (sh(adv_Er, 1) - adv_Er))

    rho2 = tmp_rho
    over_rho = _div_shared(div, tmp_rho)
    uax2 = over_rho(tmp_ur)
    uot2 = over_rho(tmp_vr)
    E2 = over_rho(tmp_Er)
    return rho2, uax2, uot2, E2, p, c


# ------------------------------------------------------------------- kernels

def _halo_cat_bc(above, cur, below, bc_y, f_lo, f_hi, ci, nci):
    """Halo-concatenate one field buffer WITH the Y-axis mirror BC rows
    spliced in (the in-kernel ghost fill, flat-Y-mesh path): ghost row k
    from the border mirrors real row k, scaled by the per-variable factor
    (`src/halo_exchange.jl:2-36` + `src/tests.jl:150-161`). Bitwise
    identical to the XLA slab-write fill it replaces (same source rows,
    same reversal, same multiply) and the SAME total concat volume as the
    plain [above, cur, below] cat — it just cuts `cur` at the ghost bands
    and substitutes mirrored rows on the first/last tiles, saving the 8
    slab-write kernel launches per cycle. `bc_y` = (g, off) with `off` the
    hi ghost band's offset within the last tile's cur block (static)."""
    g, off = bc_y
    T = cur.dtype.type

    def flip_rows(x):
        # Mosaic has no `rev` lowering: reverse the g rows (g static,
        # <= 8) as single-row slices + concat.
        return jnp.concatenate(
            [x[k:k + 1] for k in range(x.shape[0] - 1, -1, -1)], 0)

    mirror_lo = flip_rows(cur[g:2 * g])
    if f_lo != 1.0:
        mirror_lo = mirror_lo * T(f_lo)
    lo = jnp.where(ci == 0, mirror_lo, cur[:g])
    mirror_hi = flip_rows(cur[off - g:off])
    if f_hi != 1.0:
        mirror_hi = mirror_hi * T(f_hi)
    hi = jnp.where(ci == nci - 1, mirror_hi, cur[off:off + g])
    parts = [above, lo, cur[g:off], hi]
    if off + g < cur.shape[0]:
        parts.append(cur[off + g:])
    parts.append(below)
    return jnp.concatenate(parts, 0)


def _halo_cat_slab(above, cur, below, geom, slo, shi, ci, nci):
    """Sharded-Y variant of `_halo_cat_bc`: the ghost rows spliced on the
    first/last grid steps come from the exchanged slab refs (`halo_slabs`,
    the ppermute result with the mirror already selected at global
    borders) instead of the in-tile mirror — bitwise the rows
    `halo_exchange`'s slab writes would have put there, without the
    2*nvars dynamic-update-slice launches per sweep. Interior steps
    reconstruct `cur` exactly (the selects are inactive)."""
    g, off = geom
    lo = jnp.where(ci == 0, slo, cur[:g])
    hi = jnp.where(ci == nci - 1, shi, cur[off:off + g])
    parts = [above, lo, cur[g:off], hi]
    if off + g < cur.shape[0]:
        parts.append(cur[off + g:])
    parts.append(below)
    return jnp.concatenate(parts, 0)


def _y_splice_geom_ok(cfg, rows, chunk) -> bool:
    """Shared tile-geometry admissibility for splicing Y ghost rows inside
    the kernel (mirror `_halo_cat_bc` or exchanged-slab `_halo_cat_slab`):
    bands within one tile (g <= 8, chunk >= 2g), and a tail tile tall
    enough that (a) the hi band and its mirror source sit strictly after
    the lo band within the last tile's cur block (tail >= 3g — the
    nci == 1 case is then order-independent, matching the sequential
    lo-then-hi XLA fill) and (b) no OTHER tile's halo strip overlaps the
    ghost band (tail >= 8 — strip staleness analysis, round-3 notes)."""
    g = cfg.nghost
    if g > 8 or chunk < 2 * g:
        return False
    nci = -(-rows // chunk)
    tail = rows - (nci - 1) * chunk
    return tail >= 8 and tail >= 3 * g


def can_inline_bc_y(cfg, rows, chunk) -> bool:
    """Whether the Y-axis MIRROR ghost fill can run inside the kernel: the
    mesh FLAT along Y (a flat axis makes every shard a global border with
    the same static mirror factors, so 1D X-meshes keep the in-kernel
    fill), plus the splice tile geometry."""
    if cfg.proc_dims[1] != 1 or _FORCE_XLA_FILLS:
        return False
    return _y_splice_geom_ok(cfg, rows, chunk)


def can_slab_bc_y(cfg, rows, chunk) -> bool:
    """Whether a SHARDED-Y shard can consume its exchanged ghost slabs
    (`parallel.halo.halo_slabs`) in-kernel instead of the XLA
    dynamic-update-slice write-back: even Y split only (the uneven
    hi-edge shard's band sits at a traced offset the static splice cannot
    address), plus the same splice tile geometry as the mirror fill."""
    if cfg.proc_dims[1] == 1 or _FORCE_XLA_FILLS or cfg.uneven(Axis.Y):
        return False
    return _y_splice_geom_ok(cfg, rows, chunk)


def strip_emission_plan(cfg, shape):
    """Geometry for the X sweep emitting the Y sweep's halo strips
    (single-device per-sweep path). Returns (tile_r, chunk, nci, nci_x)
    or None when the tile shapes don't line up:
    - every chunk boundary must fall on an X-tile boundary
      (chunk % tile_r == 0, rows % tile_r == 0), with >= 2 tiles per
      chunk and 8-row strips within one tile (tile_r >= 8);
    - rows % chunk == tile_r would need two strip writes in one grid step
      (the mid and clamped-last below blocks coincide) — excluded.

    Valid on meshes too (round 4): the consuming Y kernel is column-local,
    so the strips' stale X-ghost lanes only feed dead ghost-lane outputs,
    and `rows % tile_r == 0` + `tail > tile_r` force every consumed strip
    row out of the static Y ghost bands (tail is a multiple of tile_r, so
    tail >= 2*tile_r >= 16 >= g+8). The one exclusion is an UNEVEN
    Y-sharded split: the hi-edge shard's ghost band sits at a traced
    position these static guards cannot exclude."""
    if _FORCE_XLA_FILLS or cfg.nghost > 8:
        return None
    if cfg.proc_dims[1] != 1 and cfg.uneven(Axis.Y):
        return None
    from ...parallel.blocking import plan_tiles
    rows, cols = shape
    plan = plan_tiles(rows, cols, np.dtype(cfg.dtype).itemsize,
                      getattr(cfg, "block_size", None))
    tile_r, chunk = plan.x_tile_rows, plan.y_chunk_rows
    if (tile_r < 8 or rows % tile_r or chunk % tile_r
            or chunk < 2 * tile_r):
        return None
    nci = -(-rows // chunk)
    if nci < 2:
        return None
    # Strips are extracted from the X kernel's outputs, i.e. BEFORE the Y
    # ghost fill: no real cell may read a strip row inside the ghost band,
    # which requires the tail tile to keep the band away from the last
    # interior chunk boundary (same analysis as can_inline_bc_y). And
    # tail <= tile_r would put a mid below-strip write and the clamped
    # last-block write on the same grid step (one index-map value).
    tail = rows - (nci - 1) * chunk
    if tail < max(8, cfg.nghost + 4) or tail <= tile_r:
        return None
    return (tile_r, chunk, nci, rows // tile_r)


def inline_bc_y_ok(cfg, shape) -> bool:
    """step.py-facing: can the PER-SWEEP Y kernel inline the ghost fill?"""
    from ...parallel.blocking import plan_tiles
    rows, cols = shape
    plan = plan_tiles(rows, cols, np.dtype(cfg.dtype).itemsize,
                      getattr(cfg, "block_size", None))
    return can_inline_bc_y(cfg, rows, plan.y_chunk_rows)


def slab_bc_y_ok(cfg, shape) -> bool:
    """step.py-facing: can the PER-SWEEP Y kernel consume exchanged ghost
    slabs in-kernel (sharded-Y even split)?"""
    from ...parallel.blocking import plan_tiles
    rows, cols = shape
    plan = plan_tiles(rows, cols, np.dtype(cfg.dtype).itemsize,
                      getattr(cfg, "block_size", None))
    return can_slab_bc_y(cfg, rows, plan.y_chunk_rows)


def inline_bc_cycle_ok(cfg, shape) -> bool:
    """step.py-facing: can the WHOLE-CYCLE kernel inline the Y ghost fill?"""
    from ...parallel.blocking import cycle_chunk_rows
    rows, cols = shape
    chunk = cycle_chunk_rows(rows, cols, np.dtype(cfg.dtype).itemsize,
                             getattr(cfg, "block_size", None))
    return can_inline_bc_y(cfg, rows, chunk)


def slab_bc_cycle_ok(cfg, shape) -> bool:
    """step.py-facing: can the WHOLE-CYCLE kernel consume exchanged Y ghost
    slabs in-kernel (sharded-Y even split)?"""
    from ...parallel.blocking import cycle_chunk_rows
    rows, cols = shape
    chunk = cycle_chunk_rows(rows, cols, np.dtype(cfg.dtype).itemsize,
                             getattr(cfg, "block_size", None))
    return can_slab_bc_y(cfg, rows, chunk)


def cycle_strip_plan(cfg, shape):
    """Geometry for the WHOLE-CYCLE kernel emitting its own NEXT cycle's
    halo side strips from its output rows (single-device pair path):
    grid step i's last 8 output rows are above-strip block i+1, its first
    8 rows are below-strip block i-1 — so the `_halo_strips` XLA assembly
    round between cycles disappears and the strips ride the loop carry.
    The never-written blocks (above 0, below nci-1) are the clamped
    placeholders whose consumed results land only in dead ghost rows (the
    same argument as `_halo_strips`' clamping), so their garbage content
    is unobservable. Returns (chunk, nci) or None (a ragged tail < 8 rows
    would leave the last step's below-strip write short).

    Mesh admissibility (round 4): the kernel X-re-sweeps the strip halo
    rows, whose X-ghost lanes are stale kernel output — so the in-kernel
    X mirror fill MUST be live to refresh them (`inline_bc_x_ok`: flat-X
    mesh, nx >= g; without it, a degenerate-width nx < nghost grid
    produced ~5e-8 f64 tier diffs — found round 4). A sharded X axis is
    excluded for the same reason (its fresh ghost lanes exist only in the
    exchanged main arrays, not the carried strips). A sharded EVEN Y split
    is fine (consumed strip rows stay out of the static ghost bands:
    chunk >= g+4 and the tail guard); an UNEVEN one has a traced band —
    excluded like `strip_emission_plan`."""
    if _FORCE_XLA_FILLS or not inline_bc_x_ok(cfg):
        return None
    if cfg.proc_dims[1] != 1 and cfg.uneven(Axis.Y):
        return None
    from ...parallel.blocking import cycle_chunk_rows
    rows, cols = shape
    chunk = cycle_chunk_rows(rows, cols, np.dtype(cfg.dtype).itemsize,
                             getattr(cfg, "block_size", None))
    nci = -(-rows // chunk)
    tail = rows - (nci - 1) * chunk
    # Strips are emitted from the kernel's OUTPUT rows, before the next
    # cycle's ghost fill: the tail tile's first 4 consumed below-strip
    # rows must be real cells, not the hi ghost band whose in-kernel
    # values are dead garbage (same analysis as `strip_emission_plan` —
    # tail >= nghost + 4; tail >= 8 keeps the strip write itself whole).
    # With tail < that, fall back to the per-cycle XLA strip assembly.
    # chunk >= g+4 keeps chunk 1's consumed above-strip rows
    # [chunk-4, chunk) out of the lo ghost band (trivially true for the
    # planner's chunks, >= 64 at multi-chunk heights — kept explicit).
    if nci >= 2 and (tail < max(8, cfg.nghost + 4)
                     or chunk < cfg.nghost + 4):
        return None
    return (chunk, nci)


def _bc_y_spec(cfg, rows, chunk):
    """((g, off), lo_factors, hi_factors) for `_halo_cat_bc`, for the
    fused-tier exchange set (rho, u, v, E). `off` = the hi ghost band's
    offset within the LAST tile's cur block (trace-time constant)."""
    from ...utils.enums import Axis, sides_along
    g = cfg.nghost
    side_lo, side_hi = sides_along(Axis.Y)
    u_lo, v_lo = cfg.test.boundary_factors(side_lo)
    u_hi, v_hi = cfg.test.boundary_factors(side_hi)
    lo_fs = (1.0, u_lo, v_lo, 1.0)
    hi_fs = (1.0, u_hi, v_hi, 1.0)
    nci = -(-rows // chunk)
    off = (rows - g) - (nci - 1) * chunk
    return ((g, off), lo_fs, hi_fs)


def _slab_y_spec(cfg, rows, chunk):
    """(g, off) geometry for `_halo_cat_slab` — no factors: the slab
    content already carries the mirror-vs-neighbor selection."""
    g = cfg.nghost
    nci = -(-rows // chunk)
    off = (rows - g) - (nci - 1) * chunk
    return (g, off)


def _bc_x_apply(a, g, nx, f_lo, f_hi):
    """In-kernel X-axis (lane-axis) mirror ghost fill of one full-width
    buffer: ghost lane `g-1-i` <- `g+i` (times f_lo) and ghost lane
    `g+nx+i` <- `g+nx-1-i` (times f_hi), i = 0..g-1 — the lane transpose
    of `_halo_cat_bc`'s row splice (`src/halo_exchange.jl:2-36`). Bitwise
    identical to the XLA slab-write fill it replaces: same source lanes,
    same single multiply by the (+-1) factor.

    Mosaic has no `rev` lowering (measured, scripts/probe_flip.py), so the
    reversal is g static `jnp.roll`s (amounts 1, 3, .., 2g-1 — lane l of
    roll(a, -(2i+1)) holds a[l + 2i+1]) each contributing one target lane
    via an iota select. Rolls run on the two boundary 128-lane-ALIGNED
    slices, not the full width (lane-misaligned work was what killed the
    round-2 in-kernel variant); the re-assembly concats are lane-aligned
    (cuts at 128 and R0), so the interior tiles pass through untouched."""
    cols = a.shape[1]
    # Aligned start of the narrowest lane-slice containing the right
    # mirror band AND its source lanes [nx, nx+2g); R0 <= nx keeps the
    # in-slice rolls wrap-free.
    R0 = 128 * ((cols - 2 * g) // 128)

    def fill(sl, base):
        T = sl.dtype.type
        lane = jax.lax.broadcasted_iota(jnp.int32, sl.shape, 1)
        out = sl
        for i in range(g):
            tl = g - 1 - i - base
            tr = g + nx + i - base
            if 0 <= tl < sl.shape[1]:
                src = jnp.roll(sl, -(2 * i + 1), 1)
                if f_lo != 1.0:
                    src = src * T(f_lo)
                out = jnp.where(lane == tl, src, out)
            if 0 <= tr < sl.shape[1]:
                src = jnp.roll(sl, 2 * i + 1, 1)
                if f_hi != 1.0:
                    src = src * T(f_hi)
                out = jnp.where(lane == tr, src, out)
        return out

    if R0 < 128:
        return fill(a, 0)
    parts = [fill(a[:, :128], 0)]
    if R0 > 128:
        parts.append(a[:, 128:R0])
    parts.append(fill(a[:, R0:], R0))
    return jnp.concatenate(parts, 1)


def _bc_x_apply_slab(a, g, R0, lo_blk, hi_blk):
    """Sharded-X variant of `_bc_x_apply`: splice the exchanged ghost
    lanes from pre-positioned slab blocks (`halo_slabs` output padded so
    the band content already sits at its target lanes; zeros elsewhere)
    via lane selects on the two 128-aligned boundary slices — no rolls
    needed. Bitwise the lanes the XLA dynamic-update-slice write-back
    would have put there; interior lanes pass through untouched (the
    concat cuts are the same aligned 128/R0 cuts as `_bc_x_apply`)."""
    cols = a.shape[1]

    def sel(sl, blk, lo_t, hi_t, base):
        lane = jax.lax.broadcasted_iota(jnp.int32, sl.shape, 1)
        t = (lane >= lo_t - base) & (lane < hi_t - base)
        return jnp.where(t, blk, sl)

    if R0 < 128:
        # Narrow array: one whole-width region, both bands in it.
        out = sel(a, lo_blk, 0, g, 0)
        return sel(out, hi_blk, cols - g, cols, 0)
    parts = [sel(a[:, :128], lo_blk, 0, g, 0)]
    if R0 > 128:
        parts.append(a[:, 128:R0])
    parts.append(sel(a[:, R0:], hi_blk, cols - g, cols, R0))
    return jnp.concatenate(parts, 1)


def slab_x_regions(cfg, cols):
    """(g, R0, W_l, W_r) lane geometry for the X slab splice: the lo
    region is the first 128-lane slice (or the whole width when
    R0 < 128), the hi region is [R0, cols) — `_bc_x_apply`'s aligned
    boundary slice."""
    g = cfg.nghost
    R0 = 128 * ((cols - 2 * g) // 128)
    if R0 < 128:
        return (g, 0, cols, cols)
    return (g, R0, 128, cols - R0)


def slab_bc_x_ok(cfg) -> bool:
    """step.py-facing: can the PER-SWEEP X kernel consume exchanged ghost
    slabs in-kernel (sharded-X even split)? Needs static band positions
    (even split; the params guard already forces n_local[0] >= nghost on
    sharded axes) with each band inside one 128-aligned boundary slice
    (g <= 8 keeps that trivially true)."""
    return (cfg.proc_dims[0] > 1 and not _FORCE_XLA_FILLS
            and not cfg.uneven(Axis.X) and cfg.nghost <= 8)


def inline_bc_x_ok(cfg) -> bool:
    """Whether the X-axis ghost fill can run inside the kernels: the mesh
    FLAT along X only (a sharded X axis fills its ghosts from the halo
    exchange, with shard-position-dependent factors; a flat axis makes
    every shard a global X border with the same static mirror factors, so
    1D Y-meshes keep the in-kernel fill — round 4).
    Degenerate-width guards (fall back to the XLA fill, which is
    sequential left-then-right): nx >= nghost keeps the right mirror's
    source lanes [nx, nx+g) out of the left ghost band that the XLA fill
    would have refreshed first, and g <= 64 keeps `_bc_x_apply`'s roll
    amounts (up to 2g-1) within one 128-lane boundary slice."""
    g = cfg.nghost
    return (cfg.proc_dims[0] == 1 and not _FORCE_XLA_FILLS
            and cfg.n_local[0] >= g and g <= 64)


def _bc_x_spec(cfg):
    """(g, nx, lo_factors, hi_factors) for `_bc_x_apply`, for the
    fused-tier exchange set (rho, u, v, E)."""
    from ...utils.enums import sides_along
    side_lo, side_hi = sides_along(Axis.X)
    u_lo, v_lo = cfg.test.boundary_factors(side_lo)
    u_hi, v_hi = cfg.test.boundary_factors(side_hi)
    return (cfg.nghost, cfg.n_local[0],
            (1.0, u_lo, v_lo, 1.0), (1.0, u_hi, v_hi, 1.0))


def _dt_tile_min(cfg, T, u_new, v_new, c_old, row0, col0, nx=None, ny=None,
                 mask_rows=True, mask_cols=True):
    """Per-tile CFL reduction over real cells (`src/reductions.jl:2-20`),
    using the post-sweep velocities with the pre-sweep sound speed (see
    module doc). Returns an (8, 128) block whose rows < 4 carry
    max(|u±c|) and rows >= 4 carry max(|v±c|): the dt itself is recovered
    by min(dx/max, dy/max) AFTER the grid reduction — bitwise identical to
    the per-cell min(dx/..., dy/...) form (IEEE division is monotone in
    the denominator) while removing the per-element division and min.
    `nx`/`ny` override the shard's real extent (traced, from SMEM) for
    uneven splits where the edge shard owns fewer real cells than the
    padded block (`src/parameters.jl:673-697` analog).
    `mask_rows`/`mask_cols`: callers running under a `pl.when(interior)`
    branch drop the mask along a dimension the tile is known to cover with
    real cells only — bitwise identical (an all-True mask selects every
    element) with the iota/compare/select work gone."""
    g = cfg.nghost
    if nx is None:
        nx, ny = cfg.n_local
    shp = u_new.shape
    real = None
    if mask_rows:
        rows = jax.lax.broadcasted_iota(jnp.int32, shp, 0) + row0
        real = (rows >= g) & (rows < g + ny)
    if mask_cols:
        cols = jax.lax.broadcasted_iota(jnp.int32, shp, 1) + col0
        cmask = (cols >= g) & (cols < g + nx)
        real = cmask if real is None else (real & cmask)
    zero = T(0.0)
    # max(|u+c|, |u-c|) == |u| + c bitwise for finite c >= 0: the winning
    # branch is the single rounded addition of |u| and c either way (IEEE
    # a-b == a+(-b); negation exact), and NaN propagates identically.
    # (u = ±inf with c = inf gives inf here vs the old form's NaN → dt = 0
    # instead of dt = NaN; the driver's `isfinite(dt) & (dt > 0)` gate
    # rejects both identically — see ops/reductions.py:dt_cfl_min.)
    mx = jnp.abs(u_new) + c_old
    my = jnp.abs(v_new) + c_old
    if real is not None:
        mx = jnp.where(real, mx, zero)
        my = jnp.where(real, my, zero)
    half = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) < 4
    return jnp.where(half, jnp.max(mx), jnp.max(my))


def _dt_from_tiles(cfg, dt_tiles):
    """min CFL dt from the accumulated (8, 128) max block — the two scalar
    divisions of the restructured reduction (exact IEEE: they happen once
    per sweep, not per cell)."""
    T = np.dtype(cfg.dtype).type
    mx = jnp.max(dt_tiles[:4])
    my = jnp.max(dt_tiles[4:])
    return jnp.minimum(T(cfg.dx) / mx, T(cfg.dy) / my)


def _x_sweep_kernel(cfg, tile_r, emit_p, emit_dt, interp, variant, strips,
                    bc_x, slab_x, dt_ref, lim_ref, *refs):
    T = np.dtype(cfg.dtype).type
    dt = dt_ref[0, 0]
    i = pl.program_id(0)
    if strips:
        flags_ref = refs[0]
        refs = refs[1:]
    if slab_x is not None:
        slo, shi = refs[:4], refs[4:8]
        refs = refs[8:]
    rho_ref, u_ref, v_ref, E_ref = refs[0:4]
    outs = refs[4:]

    def sh(a, k):
        # STATIC shift: jnp.roll with a trace-time-constant shift lowers to
        # a static lane rotate — measured 30% faster than pltpu.roll's
        # tpu.dynamic_rotate on the lane axis, bitwise identical
        # (BENCH_NOTES round-2 roll-unit attribution).
        return jnp.roll(a, -k, 1) if k else a

    rho, u, v, E = rho_ref[:], u_ref[:], v_ref[:], E_ref[:]
    if bc_x is not None:
        # In-kernel X mirror ghost fill (flat-X mesh): saves the 8
        # pre-sweep XLA slab-write launches; row-local, so alias-safe.
        gx, nxs, lo_x, hi_x = bc_x
        rho = _bc_x_apply(rho, gx, nxs, lo_x[0], hi_x[0])
        u = _bc_x_apply(u, gx, nxs, lo_x[1], hi_x[1])
        v = _bc_x_apply(v, gx, nxs, lo_x[2], hi_x[2])
        E = _bc_x_apply(E, gx, nxs, lo_x[3], hi_x[3])
    elif slab_x is not None:
        # Sharded-X shard: splice the exchanged ghost lanes in-kernel.
        g_x, R0_x = slab_x
        rho = _bc_x_apply_slab(rho, g_x, R0_x, slo[0][:], shi[0][:])
        u = _bc_x_apply_slab(u, g_x, R0_x, slo[1][:], shi[1][:])
        v = _bc_x_apply_slab(v, g_x, R0_x, slo[2][:], shi[2][:])
        E = _bc_x_apply_slab(E, g_x, R0_x, slo[3][:], shi[3][:])
    rho2, u2, v2, E2, p_st, c_st = _sweep_math(cfg, sh, dt, T(cfg.dx),
                                               rho, u, v, E,
                                               _make_div(cfg, interp),
                                               need_c=emit_dt,
                                               slope_shift=True,
                                               variant=variant)
    outs[0][:], outs[1][:], outs[2][:], outs[3][:] = rho2, u2, v2, E2
    if emit_p:
        outs[4][:] = p_st

    if strips:
        # Emit the NEXT (Y) sweep's halo side strips straight from this
        # kernel's output rows — the values are identical to what
        # `_halo_strips` would extract from the post-X-sweep array, but
        # the separate XLA assembly round (strip HBM traffic + its kernel
        # launches) disappears. Strip blocks are revisited output blocks:
        # each is written exactly once during its (consecutive) residency
        # window — see the index maps in `fused_sweep_ip`. The write
        # conditions are PRECOMPUTED per-tile flags read from SMEM (the
        # in-kernel modulo arithmetic they replace sent Mosaic's scalar
        # lowering into unbounded convert_element_type recursion).
        base = 4 + (1 if emit_p else 0)
        fields2 = (rho2, u2, v2, E2)
        # single-row SMEM layout (see fused_sweep_ip): col 2i = above
        # flag, col 2i+1 = below flag for tile i
        ii2 = jnp.asarray(i, jnp.int32) * np.int32(2)
        fa = flags_ref[0, ii2]
        fb = flags_ref[0, ii2 + np.int32(1)]

        # above[k] = rows [k*chunk-8, k*chunk) (k>=1; k=0 is the clamped
        # placeholder rows [0,8)) — written by the tile ending on the
        # chunk boundary (local rows [tile_r-8, tile_r)), or tile 0.
        @pl.when(fa != 0)
        def _():
            for k, f2 in enumerate(fields2):
                rows8 = f2[tile_r - 8:] if tile_r > 8 else f2
                if tile_r > 8:
                    rows8 = jnp.where(fa == 2, f2[0:8], rows8)
                outs[base + k][:] = rows8

        # below[k] = rows [(k+1)*chunk, +8) (k <= nci-2; local rows [0,8)
        # of the tile starting on the boundary), plus the clamped last
        # block rows [rows-8, rows) from the final tile (flag 2).
        @pl.when(fb == 1)
        def _():
            for k, f2 in enumerate(fields2):
                outs[base + 4 + k][:] = f2[0:8] if tile_r > 8 else f2

        @pl.when(fb == 2)
        def _():
            for k, f2 in enumerate(fields2):
                outs[base + 4 + k][:] = f2[tile_r - 8:] if tile_r > 8 else f2

    if emit_dt:
        # Max-accumulate into a revisited (8, 128) VMEM block: the TPU grid
        # runs sequentially, so the block carries the running CFL max.
        @pl.when(i == 0)
        def _():
            outs[-1][:] = jnp.zeros((8, 128), cfg.dtype)

        g = cfg.nghost
        nx, ny = lim_ref[0, 0], lim_ref[0, 1]
        row0 = i * tile_r
        row_interior = (row0 >= g) & (row0 + tile_r <= g + ny)

        @pl.when(row_interior)
        def _():
            m = _dt_tile_min(cfg, T, u2, v2, c_st, row0, 0,
                             nx=nx, ny=ny, mask_rows=False)
            outs[-1][:] = jnp.maximum(outs[-1][:], m)

        @pl.when(jnp.logical_not(row_interior))
        def _():
            m = _dt_tile_min(cfg, T, u2, v2, c_st, row0, 0, nx=nx, ny=ny)
            outs[-1][:] = jnp.maximum(outs[-1][:], m)


def _y_sweep_kernel(cfg, chunk, tile_c, halo_blk, emit_p, emit_dt, interp,
                    variant, bc_y, slab_y,
                    dt_ref, lim_ref, *refs):
    T = np.dtype(cfg.dtype).type
    dt = dt_ref[0, 0]
    ci = pl.program_id(0)
    cj = pl.program_id(1)
    if slab_y is not None:
        slo_ref, shi_ref = refs[0], refs[1]
        refs = refs[2:]
    (rho_c, rho_a, rho_b, u_c, u_a, u_b,
     v_c, v_a, v_b, E_c, E_a, E_b) = refs[:12]
    outs = refs[12:]
    # Concatenate the FULL 8-row halo blocks (not just the 4 rows the
    # stencil needs): the output slice then starts at row 8 — sublane-
    # aligned, so the per-output realignment rotate disappears. The 4
    # extra dead rows per side cost ~1.5% extra compute at chunk=256.
    H = halo_blk

    if bc_y is not None:
        geom, lo_fs, hi_fs = bc_y
        nci = pl.num_programs(0)

        def halo_cat(cur, above, below, k):
            return _halo_cat_bc(above[:], cur, below[:], geom,
                                lo_fs[k], hi_fs[k], ci, nci)
    elif slab_y is not None:
        # Sharded-Y shard: splice the exchanged ghost slabs (stacked
        # (4g, cols) refs, per-var bands) on the first/last grid steps.
        g_s = slab_y[0]
        nci = pl.num_programs(0)

        def halo_cat(cur, above, below, k):
            return _halo_cat_slab(above[:], cur, below[:], slab_y,
                                  slo_ref[k * g_s:(k + 1) * g_s, :],
                                  shi_ref[k * g_s:(k + 1) * g_s, :],
                                  ci, nci)
    else:
        def halo_cat(cur, above, below, k):
            # Wrong values at the padded edges land in cells whose results
            # are never read (outer ghost ring).
            return jnp.concatenate([above[:], cur, below[:]], 0)

    rho = halo_cat(rho_c[:], rho_a[:], rho_b[:], 0)
    u = halo_cat(u_c[:], u_a[:], u_b[:], 1)
    v = halo_cat(v_c[:], v_a[:], v_b[:], 2)
    E = halo_cat(E_c[:], E_a[:], E_b[:], 3)

    def sh(a, k):
        return jnp.roll(a, -k, 0) if k else a

    # Y sweep: the axis velocity is v
    rho2, v2, u2, E2, p_st, c_st = _sweep_math(cfg, sh, dt, T(cfg.dy),
                                               rho, v, u, E,
                                               _make_div(cfg, interp),
                                               need_c=emit_dt,
                                               slope_shift=True,
                                               variant=variant)

    sl = slice(H, H + chunk)
    outs[0][:], outs[1][:], outs[2][:], outs[3][:] = \
        rho2[sl], u2[sl], v2[sl], E2[sl]
    if emit_p:
        outs[4][:] = p_st[sl]

    if emit_dt:
        @pl.when((ci == 0) & (cj == 0))
        def _():
            outs[-1][:] = jnp.zeros((8, 128), cfg.dtype)

        g = cfg.nghost
        nx, ny = lim_ref[0, 0], lim_ref[0, 1]
        row0, col0 = ci * chunk, cj * tile_c
        # Interior tiles (everything real) skip the mask build entirely —
        # bitwise identical (all-True mask), measured on the CFL section.
        interior = ((row0 >= g) & (row0 + chunk <= g + ny)
                    & (col0 >= g) & (col0 + tile_c <= g + nx))

        @pl.when(interior)
        def _():
            m = _dt_tile_min(cfg, T, u2[sl], v2[sl], c_st[sl], row0, col0,
                             nx=nx, ny=ny, mask_rows=False, mask_cols=False)
            outs[-1][:] = jnp.maximum(outs[-1][:], m)

        @pl.when(jnp.logical_not(interior))
        def _():
            m = _dt_tile_min(cfg, T, u2[sl], v2[sl], c_st[sl], row0, col0,
                             nx=nx, ny=ny)
            outs[-1][:] = jnp.maximum(outs[-1][:], m)


# ------------------------------------------------------------------ wrappers

def _im(*vals):
    """Index-map results as i32: under jax_enable_x64 the traced grid index
    and int constants become i64, which Mosaic rejects."""
    return tuple(jnp.asarray(v, jnp.int32) for v in vals)


def _halo_strips(x, chunk, rows):
    """(above, below) side buffers of shape (nci*8, cols): the 8 rows just
    above/below each row-chunk, read out of the main array ONCE (O(16/chunk)
    of it) so the sweep kernel never reads main-array rows outside its own
    tile — the condition that makes input/output buffer aliasing safe.
    Chunk-0 above and last-chunk below are clamped placeholders (their
    results land in dead ghost cells, as with the old clamped index maps).

    Short ragged tails (rows % chunk in [1, 7]): the second-to-last
    chunk's below strip MUST still start at the true row (i+1)*chunk — a
    whole-strip clamp to rows-8 would shift every row the consumer's real
    outputs read by (8 - tail). Only the pad rows past the array end are
    arbitrary: a strip row j >= tail is consumed by output rows
    >= rows - nghost (ghost band, dead by invariant 3)."""
    nci = pl.cdiv(rows, chunk)
    above = [jax.lax.slice_in_dim(x, 0, 8, axis=0)]
    for i in range(1, nci):
        above.append(jax.lax.slice_in_dim(x, i * chunk - 8, i * chunk, axis=0))
    below = []
    for i in range(nci):
        start = (i + 1) * chunk
        if start + 8 <= rows:
            below.append(jax.lax.slice_in_dim(x, start, start + 8, axis=0))
        elif start < rows:
            part = jax.lax.slice_in_dim(x, start, rows, axis=0)
            pad = jax.lax.slice_in_dim(x, rows - (8 - (rows - start)), rows,
                                       axis=0)
            below.append(jnp.concatenate([part, pad], 0))
        else:
            # last chunk: clamped placeholder, never consumed by real rows
            below.append(jax.lax.slice_in_dim(x, rows - 8, rows, axis=0))
    return jnp.concatenate(above, 0), jnp.concatenate(below, 0)


@functools.partial(jax.jit, static_argnames=("cfg", "axis", "emit_p",
                                             "emit_dt", "interpret",
                                             "variant", "inline_bc",
                                             "emit_strips"))
def fused_sweep_ip(cfg, axis, rho, u, v, E, dt, n_real=None,
                   emit_p=True, emit_dt=True, interpret=False, variant="",
                   inline_bc=False, emit_strips=False, strips=None,
                   slab=None):
    """In-place variant of `fused_sweep`: the four field outputs ALIAS their
    input buffers (`input_output_aliases`), so inside the jitted time loop
    XLA updates the while-loop carry with zero full-array copies (the
    non-aliased form costs 4 copies/cycle, ~16% at 8192² — see
    BENCH_NOTES.md round-2 attribution).

    Alias safety: the X sweep's tiles read only their own rows (row-local
    stencil); the Y sweep reads its halo rows from the side strips of
    `_halo_strips`, never from the main arrays — so every main-array read
    of a grid step is confined to the block that same step writes, and
    Mosaic's fetch-compute-store order per tile makes in-place safe.

    `emit_p`/`emit_dt`: whether to write the stale-p stream and the CFL
    reduction — only the cycle's LAST sweep needs them (observable p, dt
    carry); earlier sweeps skip an output stream and the reduction math.

    `emit_strips` (X only): additionally emit the NEXT Y sweep's halo side
    strips straight from the kernel's output rows (identical values, no
    separate XLA assembly round) — requires `strip_emission_plan` to be
    non-None for this shape. `strips` (Y only): an ((above x4), (below x4))
    tuple from a preceding emit_strips X sweep, used instead of the
    `_halo_strips` assembly. `slab` (Y only, sharded-Y shards): the
    stacked (4, g, cols) (ghosts_lo, ghosts_hi) pair from
    `parallel.halo.halo_slabs`, spliced in-kernel (`_halo_cat_slab`)
    instead of the XLA dynamic-update-slice ghost-band write-back —
    requires `can_slab_bc_y` (and excludes `inline_bc`).

    Ghost bands along `axis` must be pre-filled (mirror BC / halo
    exchange) unless `inline_bc` — then the single-device mirror fill
    runs in-kernel (Y: `_halo_cat_bc` row splice; X: `_bc_x_apply` lane
    mirror). Returns (rho, u, v, E, p_stale|None, local_dt_min|None)
    plus, under emit_strips, a trailing ((above x4), (below x4)) tuple."""
    rows, cols = rho.shape
    dt_arr = jnp.asarray(dt, cfg.dtype).reshape(1, 1)
    if n_real is None:
        n_real = jnp.asarray(cfg.n_local, jnp.int32)
    lim_arr = jnp.asarray(n_real, jnp.int32).reshape(1, 2)

    out_field = lambda: jax.ShapeDtypeStruct((rows, cols), cfg.dtype)
    from ...parallel.blocking import plan_tiles, VMEM_BUDGET
    cparams = pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET)
    plan = plan_tiles(rows, cols, np.dtype(cfg.dtype).itemsize,
                      getattr(cfg, "block_size", None))
    dtmin_spec = pl.BlockSpec((8, 128), lambda *_: _im(0, 0),
                              memory_space=pltpu.VMEM)
    dtmin_shape = jax.ShapeDtypeStruct((8, 128), cfg.dtype)
    n_out = 4 + (1 if emit_p else 0)

    if axis is Axis.X:
        tile_r = plan.x_tile_rows
        grid = (pl.cdiv(rows, tile_r),)
        field_spec = pl.BlockSpec((tile_r, cols), lambda i: _im(i, 0),
                                  memory_space=pltpu.VMEM)
        strip_specs, strip_shapes = [], []
        extra_in_specs, extra_args = [], []
        if emit_strips:
            se = strip_emission_plan(cfg, (rows, cols))
            assert se is not None and se[0] == tile_r
            _, chunk_y, nci_y, nci_x = se

            # Per-tile write flags, PRECOMPUTED (all geometry is static):
            # col 0 — above-strip write (1 = chunk-boundary tile, 2 = the
            # first tile's clamped placeholder); col 1 — below-strip write
            # (1 = boundary tile, 2 = the last tile's clamped block).
            flags = np.zeros((nci_x, 2), np.int32)
            flags[0, 0] = 2
            for k in range(1, nci_y):
                flags[(k * chunk_y - 8) // tile_r, 0] = 1
            for k in range(nci_y - 1):
                flags[(k + 1) * chunk_y // tile_r, 1] = 1
            flags[nci_x - 1, 1] = 2
            # one whole-array SMEM block (per-tile blocks violate the
            # Mosaic block-shape divisibility rule); the kernel indexes it
            # with the program id. Laid out as ONE row: SMEM windows pad
            # every ROW to 512 bytes, so the (nci_x, 2) shape allocates
            # 512*nci_x bytes and blows the 1 MiB SMEM at nci_x >= 2048
            # (found by the literal 16384² run, round 5); the (1, 2*nci_x)
            # layout is 8*nci_x bytes.
            extra_in_specs = [pl.BlockSpec((1, 2 * nci_x),
                                           lambda i: _im(0, 0),
                                           memory_space=pltpu.SMEM)]
            extra_args = [jnp.asarray(flags.reshape(1, 2 * nci_x))]

            # All-int32 map arithmetic: under jax_enable_x64 the traced
            # grid index is i64 and Mosaic's scalar lowering recurses
            # without bound on the converts — cast first, use concrete
            # i32 constants so nothing promotes back.
            def above_map(i):
                ii = jnp.asarray(i, jnp.int32)
                v = (ii + np.int32(1)) * np.int32(tile_r) + np.int32(7)
                return (jnp.minimum(v // np.int32(chunk_y),
                                    np.int32(nci_y - 1)), np.int32(0))

            def below_map(i):
                ii = jnp.asarray(i, jnp.int32)
                v = jnp.maximum(ii * np.int32(tile_r) - np.int32(1),
                                np.int32(0))
                return (jnp.minimum(v // np.int32(chunk_y),
                                    np.int32(nci_y - 1)), np.int32(0))

            strip_shape = jax.ShapeDtypeStruct((nci_y * 8, cols), cfg.dtype)
            strip_specs = ([pl.BlockSpec((8, cols), above_map,
                                         memory_space=pltpu.VMEM)] * 4
                           + [pl.BlockSpec((8, cols), below_map,
                                           memory_space=pltpu.VMEM)] * 4)
            strip_shapes = [strip_shape] * 8
        bc_x = None
        if inline_bc:
            assert inline_bc_x_ok(cfg)
            bc_x = _bc_x_spec(cfg)
        slab_x = None
        if slab is not None:
            # Sharded-X exchanged ghost lanes, spliced in-kernel: the raw
            # (rows, g) slabs are XLA-padded once per sweep so the band
            # content sits at its in-region target lanes (zeros elsewhere
            # — never selected); these pads fuse with the ppermute
            # unstack/select, unlike the 8 full-array DUS write-backs
            # they replace.
            assert bc_x is None and slab_bc_x_ok(cfg)
            g_s, R0_s, W_l, W_r = slab_x_regions(cfg, cols)
            slab_x = (g_s, R0_s)
            lo_spec = pl.BlockSpec((tile_r, W_l), lambda i: _im(i, 0),
                                   memory_space=pltpu.VMEM)
            hi_spec = pl.BlockSpec((tile_r, W_r), lambda i: _im(i, 0),
                                   memory_space=pltpu.VMEM)
            hi_off = (cols - g_s) - R0_s
            slab_in_specs = [lo_spec] * 4 + [hi_spec] * 4
            slab_args = ([jnp.pad(slab[0][k], ((0, 0), (0, W_l - g_s)))
                          for k in range(4)]
                         + [jnp.pad(slab[1][k],
                                    ((0, 0), (hi_off, W_r - hi_off - g_s)))
                            for k in range(4)])
            extra_in_specs = extra_in_specs + slab_in_specs
            extra_args = extra_args + slab_args
        base_in = 2 + len(extra_in_specs)
        aliases = {base_in + k: k for k in range(4)}
        kernel = functools.partial(_x_sweep_kernel, cfg, tile_r,
                                   emit_p, emit_dt, interpret, variant,
                                   emit_strips, bc_x, slab_x)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((1, 1), lambda i: _im(0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, 2), lambda i: _im(0, 0),
                                   memory_space=pltpu.SMEM)]
            + extra_in_specs + [field_spec] * 4,
            out_specs=[field_spec] * n_out + strip_specs
            + ([dtmin_spec] if emit_dt else []),
            out_shape=[out_field()] * n_out + strip_shapes
            + ([dtmin_shape] if emit_dt else []),
            input_output_aliases=aliases,
            compiler_params=cparams,
            interpret=interpret,
        )(dt_arr, lim_arr, *extra_args, rho, u, v, E)
        if emit_strips:
            base = n_out
            strips_out = (tuple(out[base:base + 4]),
                          tuple(out[base + 4:base + 8]))
            rho2, u2, v2, E2 = out[:4]
            p_st = out[4] if emit_p else None
            local_min = _dt_from_tiles(cfg, out[-1]) if emit_dt else None
            return rho2, u2, v2, E2, p_st, local_min, strips_out
    else:
        chunk = plan.y_chunk_rows
        tile_c = plan.y_tile_cols
        nci, ncj = pl.cdiv(rows, chunk), pl.cdiv(cols, tile_c)
        grid = (nci, ncj)

        cur = pl.BlockSpec((chunk, tile_c), lambda i, j: _im(i, j),
                           memory_space=pltpu.VMEM)
        strip = pl.BlockSpec((8, tile_c), lambda i, j: _im(i, j),
                             memory_space=pltpu.VMEM)

        bc_y = None
        if inline_bc:
            assert can_inline_bc_y(cfg, rows, chunk)
            bc_y = _bc_y_spec(cfg, rows, chunk)
        slab_y = None
        if slab is not None:
            assert bc_y is None and can_slab_bc_y(cfg, rows, chunk)
            slab_y = _slab_y_spec(cfg, rows, chunk)
        kernel = functools.partial(_y_sweep_kernel, cfg, chunk, tile_c,
                                   8, emit_p, emit_dt, interpret, variant,
                                   bc_y, slab_y)
        smem = pl.BlockSpec((1, 1), lambda i, j: _im(0, 0),
                            memory_space=pltpu.SMEM)
        in_specs = [smem,
                    pl.BlockSpec((1, 2), lambda i, j: _im(0, 0),
                                 memory_space=pltpu.SMEM)]
        args = [dt_arr, lim_arr]
        if slab_y is not None:
            # Stacked (4g, cols) lo/hi slab inputs, one (4g, tile_c) block
            # re-fetched per grid step (O(g) rows — noise next to the
            # (chunk, tile_c) field blocks).
            g_s = cfg.nghost
            slab_spec = pl.BlockSpec((4 * g_s, tile_c),
                                     lambda i, j: _im(0, j),
                                     memory_space=pltpu.VMEM)
            in_specs += [slab_spec, slab_spec]
            args += [slab[0].reshape(4 * g_s, cols),
                     slab[1].reshape(4 * g_s, cols)]
        base_in = len(args)
        aliases = {}
        # NOTE (round-3 negative result): reading the BELOW halo straight
        # from the aliased main array via an index map (it is only written
        # at grid step i+1, after step i's fetch) would halve the strip
        # assembly — but passing the aliased buffer as a second operand
        # makes XLA insert protective full-array copies: measured 9.4 ->
        # 16.0 ms/Y-sweep at 8192². Both halo sides must come from strips.
        for k, a in enumerate((rho, u, v, E)):
            if strips is not None:
                above, below = strips[0][k], strips[1][k]
            else:
                above, below = _halo_strips(a, chunk, rows)
            aliases[base_in + 3 * k] = k
            in_specs += [cur, strip, strip]
            args += [a, above, below]
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[cur] * n_out + ([dtmin_spec] if emit_dt else []),
            out_shape=[out_field()] * n_out + ([dtmin_shape] if emit_dt else []),
            input_output_aliases=aliases,
            compiler_params=cparams,
            interpret=interpret,
        )(*args)

    rho2, u2, v2, E2 = out[:4]
    p_st = out[4] if emit_p else None
    local_min = _dt_from_tiles(cfg, out[-1]) if emit_dt else None
    return rho2, u2, v2, E2, p_st, local_min


@functools.partial(jax.jit, static_argnames=("cfg", "axis", "interpret"))
def fused_sweep(cfg, axis, rho, u, v, E, dt, n_real=None, interpret=False):
    """Run one fused sweep. Returns (rho, u, v, E, p_stale, local_dt_min).

    Ghost bands of rho/u/v/E along `axis` must be pre-filled (mirror BC or
    halo exchange). `n_real` = this shard's (nx, ny) real extent (traced;
    defaults to cfg.n_local — pass it under uneven splits)."""
    rows, cols = rho.shape
    T = np.dtype(cfg.dtype).type
    dt_arr = jnp.asarray(dt, cfg.dtype).reshape(1, 1)
    if n_real is None:
        n_real = jnp.asarray(cfg.n_local, jnp.int32)
    lim_arr = jnp.asarray(n_real, jnp.int32).reshape(1, 2)

    out_field = lambda: jax.ShapeDtypeStruct((rows, cols), cfg.dtype)
    # Mosaic's default scoped-VMEM limit is 16MB; the fused kernel keeps
    # ~25 live tile temporaries, so raise it (v5e/v5p have 128MB VMEM).
    from ...parallel.blocking import plan_tiles, VMEM_BUDGET
    cparams = pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET)
    plan = plan_tiles(rows, cols, np.dtype(cfg.dtype).itemsize,
                      getattr(cfg, "block_size", None))

    if axis is Axis.X:
        tile_r = plan.x_tile_rows
        grid = (pl.cdiv(rows, tile_r),)
        field_spec = pl.BlockSpec((tile_r, cols), lambda i: _im(i, 0),
                                  memory_space=pltpu.VMEM)
        kernel = functools.partial(_x_sweep_kernel, cfg, tile_r,
                                   True, True, interpret, "", None, None,
                                   None)
        dtmin_spec = pl.BlockSpec((8, 128), lambda i: _im(0, 0),
                                  memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((1, 1), lambda i: _im(0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, 2), lambda i: _im(0, 0),
                                   memory_space=pltpu.SMEM)] + [field_spec] * 4,
            out_specs=[field_spec] * 5 + [dtmin_spec],
            out_shape=[out_field()] * 5 + [
                jax.ShapeDtypeStruct((8, 128), cfg.dtype)],
            compiler_params=cparams,
            interpret=interpret,
        )(dt_arr, lim_arr, rho, u, v, E)
    else:
        halo_blk = plan.halo_block
        chunk = plan.y_chunk_rows
        tile_c = plan.y_tile_cols
        nci, ncj = pl.cdiv(rows, chunk), pl.cdiv(cols, tile_c)
        grid = (nci, ncj)

        cur = pl.BlockSpec((chunk, tile_c), lambda i, j: _im(i, j),
                           memory_space=pltpu.VMEM)
        # number of 8-row blocks, counting a ragged (padded) tail block:
        # reads past the array edge land only in cells whose outputs are
        # never consumed, while clamping to the last FULL block would
        # alias interior rows into real stencils.
        blocks_above = pl.cdiv(rows, halo_blk)

        def above_map(i, j):
            return _im(jnp.maximum(i * (chunk // halo_blk) - 1, 0), j)

        def below_map(i, j):
            return _im(jnp.minimum((i + 1) * (chunk // halo_blk),
                                   blocks_above - 1), j)

        above = pl.BlockSpec((halo_blk, tile_c), above_map,
                             memory_space=pltpu.VMEM)
        below = pl.BlockSpec((halo_blk, tile_c), below_map,
                             memory_space=pltpu.VMEM)

        kernel = functools.partial(_y_sweep_kernel, cfg, chunk, tile_c,
                                   halo_blk, True, True, interpret, "", None,
                                   None)
        in_specs = [pl.BlockSpec((1, 1), lambda i, j: _im(0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, 2), lambda i, j: _im(0, 0),
                                 memory_space=pltpu.SMEM)]
        for _ in range(4):
            in_specs += [cur, above, below]
        args = [dt_arr, lim_arr]
        for a in (rho, u, v, E):
            args += [a, a, a]
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[cur] * 5 + [
                pl.BlockSpec((8, 128), lambda i, j: _im(0, 0),
                             memory_space=pltpu.VMEM)],
            out_shape=[out_field()] * 5 + [
                jax.ShapeDtypeStruct((8, 128), cfg.dtype)],
            compiler_params=cparams,
            interpret=interpret,
        )(*args)

    rho2, u2, v2, E2, p_st, dt_tiles = out
    return rho2, u2, v2, E2, p_st, _dt_from_tiles(cfg, dt_tiles)


# ------------------------------------------------- fully-fused cycle kernel

def _cycle_kernel(cfg, chunk, x_first, interp, bc_y, slab_y, bc_x,
                  emit_strips, variant,
                  dtx_ref, dty_ref, lim_ref, *refs):
    """Both sweeps of one cycle on a (chunk + 8)-row full-width tile.

    Valid because (a) the X sweep is row-local, so computing it on the halo
    rows too is exact, and (b) the X sweep commutes bitwise with the Y-side
    ghost fill (mirror flips v, which the X sweep treats as a passive scalar
    that is exactly odd under negation; halo copies are plain row copies) —
    so pre-filling BOTH ghost bands from the pre-cycle state reproduces the
    reference's EOS->BC-per-sweep schedule exactly. Symmetrically for the
    Y-then-X order of Godunov/Strang odd cycles.
    """
    T = np.dtype(cfg.dtype).type
    dtx = dtx_ref[0, 0]
    dty = dty_ref[0, 0]
    ci = pl.program_id(0)
    H = 4

    halo_blk = 8

    if slab_y is not None:
        slo_ref, shi_ref = refs[0], refs[1]
        refs = refs[2:]
    (rho_c, rho_a, rho_b, u_c, u_a, u_b,
     v_c, v_a, v_b, E_c, E_a, E_b) = refs[:12]
    rho_o, u_o, v_o, E_o, p_o = refs[12:17]
    rest = refs[17:]

    if bc_y is not None:
        geom, lo_fs, hi_fs = bc_y
        nci = pl.num_programs(0)

        def halo_cat(cur, above, below, k):
            return _halo_cat_bc(above[halo_blk - H:, :], cur, below[:H, :],
                                geom, lo_fs[k], hi_fs[k], ci, nci)
    elif slab_y is not None:
        # Sharded-Y shard: splice the exchanged ghost slabs. The bc_x
        # mirror below applies AFTER the splice, so ghost-row corners get
        # f_x * (exchanged value) — bitwise the XLA order (the exchange
        # ships rows whose X-ghost lanes the X fill then refreshes).
        g_s = slab_y[0]
        nci = pl.num_programs(0)

        def halo_cat(cur, above, below, k):
            return _halo_cat_slab(above[halo_blk - H:, :], cur, below[:H, :],
                                  slab_y,
                                  slo_ref[k * g_s:(k + 1) * g_s, :],
                                  shi_ref[k * g_s:(k + 1) * g_s, :],
                                  ci, nci)
    else:
        def halo_cat(cur, above, below, k):
            return jnp.concatenate([above[halo_blk - H:, :], cur,
                                    below[:H, :]], 0)

    rho = halo_cat(rho_c[:], rho_a[:], rho_b[:], 0)
    u = halo_cat(u_c[:], u_a[:], u_b[:], 1)
    v = halo_cat(v_c[:], v_a[:], v_b[:], 2)
    E = halo_cat(E_c[:], E_a[:], E_b[:], 3)

    if bc_x is not None:
        # In-kernel X mirror fill AFTER the Y row splice — on Y-ghost rows
        # the fills land corner values f_x*(f_y*a) vs the XLA order's
        # f_y*(f_x*a): both are two exact (+-1) multiplies, bitwise equal.
        gx, nxs, lo_x, hi_x = bc_x
        rho = _bc_x_apply(rho, gx, nxs, lo_x[0], hi_x[0])
        u = _bc_x_apply(u, gx, nxs, lo_x[1], hi_x[1])
        v = _bc_x_apply(v, gx, nxs, lo_x[2], hi_x[2])
        E = _bc_x_apply(E, gx, nxs, lo_x[3], hi_x[3])

    def shx(a, k):
        # static shifts: see _x_sweep_kernel.sh
        return jnp.roll(a, -k, 1) if k else a

    def shy(a, k):
        return jnp.roll(a, -k, 0) if k else a

    div = _make_div(cfg, interp)
    if x_first:
        rho1, u1, v1, E1, _, _ = _sweep_math(cfg, shx, dtx, T(cfg.dx),
                                             rho, u, v, E, div, need_c=False,
                                             slope_shift=True, variant=variant)
        rho2, v2, u2, E2, p_st, c_st = _sweep_math(cfg, shy, dty, T(cfg.dy),
                                                   rho1, v1, u1, E1, div,
                                                   slope_shift=True,
                                                   variant=variant)
    else:
        rho1, v1, u1, E1, _, _ = _sweep_math(cfg, shy, dty, T(cfg.dy),
                                             rho, v, u, E, div, need_c=False,
                                             slope_shift=True, variant=variant)
        rho2, u2, v2, E2, p_st, c_st = _sweep_math(cfg, shx, dtx, T(cfg.dx),
                                                   rho1, u1, v1, E1, div,
                                                   slope_shift=True,
                                                   variant=variant)

    sl = slice(H, H + chunk)
    rho_o[:], u_o[:], v_o[:], E_o[:], p_o[:] = \
        rho2[sl], u2[sl], v2[sl], E2[sl], p_st[sl]

    dtmin_o = rest[-1]
    if emit_strips:
        # Emit the NEXT cycle's halo side strips straight from this step's
        # output rows (see `cycle_strip_plan`): above-block ci+1 = my last
        # 8 output rows, below-block ci-1 = my first 8. The unwritten
        # blocks (above 0 / below nci-1) stay clamped placeholders.
        nci_s = pl.num_programs(0)
        fields2 = (rho2, u2, v2, E2)

        @pl.when(ci < nci_s - 1)
        def _():
            for k, f2 in enumerate(fields2):
                rest[k][:] = f2[H + chunk - 8:H + chunk]

        @pl.when(ci > 0)
        def _():
            for k, f2 in enumerate(fields2):
                rest[4 + k][:] = f2[H:H + 8]

    @pl.when(ci == 0)
    def _():
        dtmin_o[:] = jnp.zeros((8, 128), cfg.dtype)

    g = cfg.nghost
    nx, ny = lim_ref[0, 0], lim_ref[0, 1]
    row0 = ci * chunk
    # Full-width tiles always straddle the ghost columns (col mask stays);
    # interior row ranges drop the row mask — bitwise identical.
    row_interior = (row0 >= g) & (row0 + chunk <= g + ny)

    @pl.when(row_interior)
    def _():
        m = _dt_tile_min(cfg, T, u2[sl], v2[sl], c_st[sl], row0, 0,
                         nx=nx, ny=ny, mask_rows=False)
        dtmin_o[:] = jnp.maximum(dtmin_o[:], m)

    @pl.when(jnp.logical_not(row_interior))
    def _():
        m = _dt_tile_min(cfg, T, u2[sl], v2[sl], c_st[sl], row0, 0,
                         nx=nx, ny=ny)
        dtmin_o[:] = jnp.maximum(dtmin_o[:], m)


@functools.partial(jax.jit, static_argnames=("cfg", "x_first",
                                             "in_place", "interpret",
                                             "inline_bc", "inline_bc_x",
                                             "emit_strips", "variant"))
def fused_cycle(cfg, x_first, rho, u, v, E, dt_x, dt_y, n_real=None,
                in_place=False, interpret=False, inline_bc=False,
                inline_bc_x=False, emit_strips=False, strips=None,
                variant="", slab=None):
    """One full cycle (two sweeps) in a single fused kernel pass — the
    small-grid kernel (one launch per cycle; above `pair_threshold` the
    per-sweep kernels win, see core/step.py routing). BOTH ghost bands
    of rho/u/v/E must be pre-filled from the pre-cycle state — except
    bands whose fill is inlined (`inline_bc` = Y mirror rows,
    `inline_bc_x` = X mirror lanes; each requires the mesh FLAT along
    that axis — see `can_inline_bc_y` / `inline_bc_x_ok`).
    `in_place`: the four field outputs alias their inputs (while-carry copy
    elimination) — halo rows come from `_halo_strips` side buffers so no
    grid step reads main-array rows outside its own block. `strips`: an
    ((above x4), (below x4)) tuple emitted by the PREVIOUS cycle's kernel
    (`emit_strips` + `cycle_strip_plan`), used instead of the XLA
    `_halo_strips` assembly; `emit_strips` appends this cycle's own strip
    emission to the outputs.
    Returns (rho, u, v, E, p_stale, local_dt_min) plus, under
    emit_strips, a trailing ((above x4), (below x4)) tuple. `n_real` =
    this shard's (nx, ny) real extent (traced; defaults to cfg.n_local)."""
    rows, cols = rho.shape
    dtx = jnp.asarray(dt_x, cfg.dtype).reshape(1, 1)
    dty = jnp.asarray(dt_y, cfg.dtype).reshape(1, 1)
    if n_real is None:
        n_real = jnp.asarray(cfg.n_local, jnp.int32)
    lim_arr = jnp.asarray(n_real, jnp.int32).reshape(1, 2)
    from ...parallel.blocking import VMEM_BUDGET, cycle_chunk_rows
    cparams = pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET)
    chunk = cycle_chunk_rows(rows, cols, np.dtype(cfg.dtype).itemsize,
                             getattr(cfg, "block_size", None))
    halo_blk = 8
    nci = pl.cdiv(rows, chunk)
    grid = (nci,)

    cur = pl.BlockSpec((chunk, cols), lambda i: _im(i, 0),
                       memory_space=pltpu.VMEM)
    blocks_tot = max(pl.cdiv(rows, halo_blk), 1)  # counts a ragged tail block

    def above_map(i):
        return _im(jnp.maximum(i * (chunk // halo_blk) - 1, 0), 0)

    def below_map(i):
        return _im(jnp.minimum((i + 1) * (chunk // halo_blk), blocks_tot - 1), 0)

    smem = pl.BlockSpec((1, 1), lambda i: _im(0, 0), memory_space=pltpu.SMEM)
    lim_spec = pl.BlockSpec((1, 2), lambda i: _im(0, 0),
                            memory_space=pltpu.SMEM)
    in_specs = [smem, smem, lim_spec]
    args = [dtx, dty, lim_arr]
    bc_y = None
    if inline_bc:
        assert in_place and can_inline_bc_y(cfg, rows, chunk)
        bc_y = _bc_y_spec(cfg, rows, chunk)
    slab_y = None
    if slab is not None:
        # Sharded-Y exchanged ghost slabs, spliced in-kernel (see
        # `fused_sweep_ip`'s slab mode).
        assert in_place and bc_y is None and can_slab_bc_y(cfg, rows, chunk)
        slab_y = _slab_y_spec(cfg, rows, chunk)
        g_s = cfg.nghost
        slab_spec = pl.BlockSpec((4 * g_s, cols), lambda i: _im(0, 0),
                                 memory_space=pltpu.VMEM)
        in_specs += [slab_spec, slab_spec]
        args += [slab[0].reshape(4 * g_s, cols),
                 slab[1].reshape(4 * g_s, cols)]
    base_in = len(args)
    aliases = {}
    if in_place:
        strip = pl.BlockSpec((halo_blk, cols), lambda i: _im(i, 0),
                             memory_space=pltpu.VMEM)
        for k, a in enumerate((rho, u, v, E)):
            if strips is not None:
                above_s, below_s = strips[0][k], strips[1][k]
            else:
                above_s, below_s = _halo_strips(a, chunk, rows)
            in_specs += [cur, strip, strip]
            aliases[base_in + 3 * k] = k
            args += [a, above_s, below_s]
    else:
        above = pl.BlockSpec((halo_blk, cols), above_map,
                             memory_space=pltpu.VMEM)
        below = pl.BlockSpec((halo_blk, cols), below_map,
                             memory_space=pltpu.VMEM)
        for a in (rho, u, v, E):
            in_specs += [cur, above, below]
            args += [a, a, a]

    bc_x = None
    if inline_bc_x:
        assert inline_bc_x_ok(cfg)
        bc_x = _bc_x_spec(cfg)
    strip_out_specs, strip_out_shapes = [], []
    if emit_strips:
        assert in_place and cycle_strip_plan(cfg, (rows, cols)) is not None
        nci_c = -(-rows // chunk)

        def above_out_map(i):
            return _im(jnp.minimum(jnp.asarray(i, jnp.int32) + np.int32(1),
                                   np.int32(nci_c - 1)), 0)

        def below_out_map(i):
            return _im(jnp.maximum(jnp.asarray(i, jnp.int32) - np.int32(1),
                                   np.int32(0)), 0)

        strip_out_specs = ([pl.BlockSpec((8, cols), above_out_map,
                                         memory_space=pltpu.VMEM)] * 4
                           + [pl.BlockSpec((8, cols), below_out_map,
                                           memory_space=pltpu.VMEM)] * 4)
        strip_out_shapes = [jax.ShapeDtypeStruct((nci_c * 8, cols),
                                                 cfg.dtype)] * 8
    kernel = functools.partial(_cycle_kernel, cfg, chunk, x_first, interpret,
                               bc_y, slab_y, bc_x, emit_strips, variant)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[cur] * 5 + strip_out_specs
        + [pl.BlockSpec((8, 128), lambda i: _im(0, 0),
                        memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((rows, cols), cfg.dtype)] * 5
        + strip_out_shapes + [jax.ShapeDtypeStruct((8, 128), cfg.dtype)],
        input_output_aliases=aliases,
        compiler_params=cparams,
        interpret=interpret,
    )(*args)

    rho2, u2, v2, E2, p_st = out[:5]
    dt_min = _dt_from_tiles(cfg, out[-1])
    if emit_strips:
        strips_out = (tuple(out[5:9]), tuple(out[9:13]))
        return rho2, u2, v2, E2, p_st, dt_min, strips_out
    return rho2, u2, v2, E2, p_st, dt_min


# ------------------------------------------- temporal-blocked multicycle

def multicycle_geom_ok(cfg, shape) -> bool:
    """Whether the K-cycles-per-launch kernel (`fused_multicycle`) admits
    this grid — the launch-latency amortization for tiny grids (VERDICT r4
    #6; the TPU analog of the reference's async block machine keeping
    small work fed, `src/solver.jl:58-179`). Requirements:

    - single device (the mesh halo exchange cannot run mid-kernel) with
      both mirror fills inlineable (`inline_bc_x_ok` + the Y splice
      geometry of the nci == 1 case: rows >= max(8, 3g), g <= 8);
    - ONE tile: the whole padded block rides VMEM for all K cycles. The
      byte cap bounds the unrolled chain's scoped-VMEM footprint
      (~40-60 live (rows+8, cols) values through a sweep chain; 256 KiB
      per buffer keeps that under ~16 MiB);
    - the f32 cycle counter crosses the kernel boundary as a float:
      maxcycle must stay exactly representable."""
    if cfg.spmd or _FORCE_XLA_FILLS:
        return False
    g = cfg.nghost
    rows, cols = shape
    if g > 8 or rows < max(8, 3 * g) or not inline_bc_x_ok(cfg):
        return False
    itemsize = np.dtype(cfg.dtype).itemsize
    if (rows + 8) * (-(-cols // 128) * 128) * itemsize > 256 * 1024:
        return False
    if itemsize == 4 and cfg.maxcycle >= (1 << 24):
        return False
    return True


def _mc_ext(a, g, rows, f_lo, f_hi):
    """(rows + 8)-row halo extension of one padded field with the Y mirror
    ghost rows refreshed in place — the nci == 1 specialization of
    `_halo_cat_bc` (4 dead halo rows each side; ghost row k mirrors real
    row k times the per-variable factor, `src/halo_exchange.jl:2-36`).
    The dead rows reuse arbitrary in-array rows: the sweep stencil (<= 4)
    cannot carry them past the g >= 4 fresh ghost rows into real cells."""
    T = a.dtype.type

    def flip_rows(x):
        return jnp.concatenate(
            [x[k:k + 1] for k in range(x.shape[0] - 1, -1, -1)], 0)

    lo = flip_rows(a[g:2 * g])
    if f_lo != 1.0:
        lo = lo * T(f_lo)
    hi = flip_rows(a[rows - 2 * g:rows - g])
    if f_hi != 1.0:
        hi = hi * T(f_hi)
    return jnp.concatenate([a[:4], lo, a[g:rows - g], hi, a[rows - 4:]], 0)


def _multicycle_kernel(cfg, pairs, interp, variant,
                       t_ref, cyc_ref, dtp_ref, lm_ref,
                       rho_ref, u_ref, v_ref, E_ref, p_ref,
                       rho_o, u_o, v_o, E_o, p_o, scal_o):
    """K = len(pairs) cycles in ONE kernel launch (single-tile grids).

    Everything the per-cycle driver does between launches runs in-kernel,
    bit-identically: the dt recurrence (`core/timestep.dt_update` — same
    scalar ops in the same order), both mirror ghost fills per cycle, the
    two sweeps (same `_sweep_math` trace as `_cycle_kernel`), the CFL
    reduction (max/min are exactly associative, so the in-kernel scalar
    reduction equals `_dt_tile_min` + `_dt_from_tiles` bitwise), and the
    stop conditions — a cycle whose (t < maxtime) & (cycle < maxcycle) &
    ok predicate fails passes every carry through unchanged, so a K-batch
    overrunning the run's end is exact, not approximate."""
    T = np.dtype(cfg.dtype).type
    g = cfg.nghost
    nx, ny = cfg.n_local
    maxtime = T(cfg.maxtime)
    maxcycle = np.int32(cfg.maxcycle)
    div = _make_div(cfg, interp)
    (_, offy), lo_fs, hi_fs = _bc_y_spec(cfg, rho_ref.shape[0],
                                         rho_ref.shape[0])
    gx, nxs, lo_x, hi_x = _bc_x_spec(cfg)

    t = t_ref[0, 0]
    cyc = cyc_ref[0, 0]
    dtp = dtp_ref[0, 0]
    lm = lm_ref[0, 0]
    ok = jnp.asarray(True)
    rho, u, v, E, p = rho_ref[:], u_ref[:], v_ref[:], E_ref[:], p_ref[:]
    rows = rho.shape[0]

    def shx(a, k):
        return jnp.roll(a, -k, 1) if k else a

    def shy(a, k):
        return jnp.roll(a, -k, 0) if k else a

    shp = rho.shape
    rI = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
    cI = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
    real = ((rI >= g) & (rI < g + ny) & (cI >= g) & (cI < g + nx))
    zero = T(0.0)

    for x_first, fx, fy in pairs:
        run = (t < maxtime) & (cyc < maxcycle) & ok
        # --- dt recurrence (core/timestep.dt_update, bitwise)
        if cfg.cst_dt:
            dt_use = T(cfg.Dt)
            dt_next = dt_use
            okk = jnp.asarray(True)
        else:
            first = dtp == zero
            cand = jnp.where(first, T(cfg.cfl) * lm,
                             jnp.minimum(T(cfg.cfl) * lm, T(1.05) * dtp))
            if cfg.dt_on_even_cycles:
                recompute = ((cyc % 2) == 0) | first
                dt_next = jnp.where(recompute, cand, dtp)
            else:
                dt_next = cand
            dt_use = jnp.where(first, dt_next, dtp)
            okk = jnp.isfinite(dt_next) & (dt_next > zero)

        # --- ghost fills (Y mirror splice then X lane mirror, the
        # `_cycle_kernel` inline order — corner products commute bitwise)
        re_ = _mc_ext(rho, g, rows, lo_fs[0], hi_fs[0])
        ue = _mc_ext(u, g, rows, lo_fs[1], hi_fs[1])
        ve = _mc_ext(v, g, rows, lo_fs[2], hi_fs[2])
        Ee = _mc_ext(E, g, rows, lo_fs[3], hi_fs[3])
        re_ = _bc_x_apply(re_, gx, nxs, lo_x[0], hi_x[0])
        ue = _bc_x_apply(ue, gx, nxs, lo_x[1], hi_x[1])
        ve = _bc_x_apply(ve, gx, nxs, lo_x[2], hi_x[2])
        Ee = _bc_x_apply(Ee, gx, nxs, lo_x[3], hi_x[3])

        dtx = dt_use * T(fx)
        dty = dt_use * T(fy)
        if x_first:
            rho1, u1, v1, E1, _, _ = _sweep_math(
                cfg, shx, dtx, T(cfg.dx), re_, ue, ve, Ee, div,
                need_c=False, slope_shift=True, variant=variant)
            rho2, v2, u2, E2, p_st, c_st = _sweep_math(
                cfg, shy, dty, T(cfg.dy), rho1, v1, u1, E1, div,
                slope_shift=True, variant=variant)
        else:
            rho1, v1, u1, E1, _, _ = _sweep_math(
                cfg, shy, dty, T(cfg.dy), re_, ve, ue, Ee, div,
                need_c=False, slope_shift=True, variant=variant)
            rho2, u2, v2, E2, p_st, c_st = _sweep_math(
                cfg, shx, dtx, T(cfg.dx), rho1, u1, v1, E1, div,
                slope_shift=True, variant=variant)

        sl = slice(4, 4 + rows)
        # --- CFL min of the post-cycle state (== _dt_tile_min +
        # _dt_from_tiles: max/min are exactly associative)
        mx = jnp.max(jnp.where(real, jnp.abs(u2[sl]) + c_st[sl], zero))
        my = jnp.max(jnp.where(real, jnp.abs(v2[sl]) + c_st[sl], zero))
        lm_new = jnp.minimum(T(cfg.dx) / mx, T(cfg.dy) / my)

        # --- commit (no-op when this cycle is past the run's end)
        rho = jnp.where(run, rho2[sl], rho)
        u = jnp.where(run, u2[sl], u)
        v = jnp.where(run, v2[sl], v)
        E = jnp.where(run, E2[sl], E)
        p = jnp.where(run, p_st[sl], p)
        t = jnp.where(run, t + dt_use, t)
        cyc = jnp.where(run, cyc + np.int32(1), cyc)
        dtp = jnp.where(run, dt_next, dtp)
        lm = jnp.where(run, lm_new, lm)
        ok = jnp.where(run, okk, ok)

    rho_o[:], u_o[:], v_o[:], E_o[:], p_o[:] = rho, u, v, E, p
    r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    okf = jnp.where(ok, T(1.0), T(0.0))
    cycf = cyc.astype(cfg.dtype)  # exact: maxcycle < 2^24 gated
    scal_o[:] = jnp.where(
        r8 == 0, t, jnp.where(r8 == 1, dtp, jnp.where(
            r8 == 2, lm, jnp.where(r8 == 3, okf, cycf))))


@functools.partial(jax.jit, static_argnames=("cfg", "pairs", "interpret",
                                             "variant"))
def fused_multicycle(cfg, rho, u, v, E, p, t, cyc, dt_prev, lm,
                     pairs=(), interpret=False, variant=""):
    """K-cycles-per-launch wrapper (see `_multicycle_kernel`). `pairs` is
    the static per-cycle ((x_first, fx, fy), ...) schedule starting at an
    EVEN cycle index (the driver guarantees launches stay even-aligned).
    Returns (rho, u, v, E, p, t, cyc, dt_prev, lm, ok)."""
    rows, cols = rho.shape
    from ...parallel.blocking import VMEM_BUDGET
    cparams = pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET)
    full = pl.BlockSpec((rows, cols), lambda i: _im(0, 0),
                        memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda i: _im(0, 0), memory_space=pltpu.SMEM)
    kernel = functools.partial(_multicycle_kernel, cfg, tuple(pairs),
                               interpret, variant)
    args = [jnp.asarray(t, cfg.dtype).reshape(1, 1),
            jnp.asarray(cyc, jnp.int32).reshape(1, 1),
            jnp.asarray(dt_prev, cfg.dtype).reshape(1, 1),
            jnp.asarray(lm, cfg.dtype).reshape(1, 1),
            rho, u, v, E, p]
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[smem] * 4 + [full] * 5,
        out_specs=[full] * 5 + [pl.BlockSpec((8, 128), lambda i: _im(0, 0),
                                             memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((rows, cols), cfg.dtype)] * 5
        + [jax.ShapeDtypeStruct((8, 128), cfg.dtype)],
        input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3, 8: 4},
        compiler_params=cparams,
        interpret=interpret,
    )(*args)
    rho2, u2, v2, E2, p2, blk = out
    t2 = blk[0, 0]
    dtp2 = blk[1, 0]
    lm2 = blk[2, 0]
    ok2 = blk[3, 0] != 0
    cyc2 = blk[4, 0].astype(jnp.int32)
    return rho2, u2, v2, E2, p2, t2, cyc2, dtp2, lm2, ok2

"""Float-float (double-single) f64-tier evaluation — SURVEY §7 hard part 3.

The reference validates everything in f64 (`test/reference_data/
create_references.jl:8-23`). On TPU, f64 is software-emulated by XLA and the
jnp tier runs at ~1.38e8 cells/s at 1024² (BENCH_NOTES, 38x under f32).
The alternative SURVEY names is double-word arithmetic: every value an
unevaluated (hi, lo) f32 pair with ~49 mantissa bits (vs f64's 52), built
from error-free transformations (two_sum/two_prod, Dekker splitting — no
FMA primitive is exposed through Mosaic, so two_prod is the 17-flop split
form).

This probe measures the REAL sweep op mix, not a toy: the GAD + minmod +
euler_2nd X-sweep chain of `_sweep_math` (ops/pallas/sweep.py:243-456 —
EOS, one Godunov solve + shift-derived neighbours, 4 limiter ratios, theta
blend, Lagrangian update, 4 slope-limited advection fluxes, projection +
3 shared-denominator divides), implemented three ways:

  f32   — plain f32 Pallas kernel (the production tier's op mix);
  ff    — the same chain on (hi, lo) pairs in a Pallas kernel;
  f64   — the same chain in plain jnp f64 (XLA's emulated doubles,
          the current `kernel_tier` fallback) — Mosaic has no f64.

plus an ACCURACY leg on CPU: ff vs true-f64 ground truth after K chained
sweeps (worst-relative-error per variable), which is what decides whether
ff could even in principle pass a golden ladder.

Run on the TPU:  python scripts/ff_probe.py
CPU (accuracy only):  JAX_PLATFORMS=cpu python scripts/ff_probe.py --cpu
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

# ------------------------------------------------------------- ff primitives

_SPLIT = 4097.0  # 2^12 + 1 (Dekker split constant for f32's 24-bit mantissa)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _quick_two_sum(a, b):  # assumes |a| >= |b|
    s = a + b
    return s, b - (s - a)


def _split(a):
    t = _SPLIT * a
    hi = t - (t - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


class FF:
    """An unevaluated (hi, lo) f32 pair. Operators implement the standard
    double-single algorithms (Dekker/Knuth; the QD library's df64 forms)."""

    __slots__ = ("hi", "lo")

    def __init__(self, hi, lo=None):
        self.hi = hi
        self.lo = jnp.zeros_like(hi) if lo is None else lo

    def __add__(self, o):
        o = _ff(o, self.hi)
        s, e = _two_sum(self.hi, o.hi)
        return FF(*_quick_two_sum(s, e + self.lo + o.lo))

    def __sub__(self, o):
        o = _ff(o, self.hi)
        s, e = _two_sum(self.hi, -o.hi)
        return FF(*_quick_two_sum(s, e + self.lo - o.lo))

    def __rsub__(self, o):
        return _ff(o, self.hi) - self

    __radd__ = __add__

    def __neg__(self):
        return FF(-self.hi, -self.lo)

    def __mul__(self, o):
        o = _ff(o, self.hi)
        p, e = _two_prod(self.hi, o.hi)
        return FF(*_quick_two_sum(p, e + self.hi * o.lo + self.lo * o.hi))

    __rmul__ = __mul__

    def __truediv__(self, o):
        o = _ff(o, self.hi)
        q1 = self.hi / o.hi
        # r = self - q1*o, then one refinement quotient
        p, e = _two_prod(q1, o.hi)
        r = self - FF(p, e + q1 * o.lo)
        q2 = (r.hi + r.lo) / o.hi
        return FF(*_quick_two_sum(q1, q2))

    def __gt__(self, o):
        return self.hi > _ff(o, self.hi).hi


def _ff(x, like):
    if isinstance(x, FF):
        return x
    return FF(jnp.full_like(like, x))


def ff_sqrt(x):
    s = jnp.sqrt(x.hi)
    p, e = _two_prod(s, s)
    r = x - FF(p, e)
    corr = (r.hi + r.lo) / (2.0 * s)
    return FF(*_quick_two_sum(s, corr))


def ff_sign_mask(x):
    return x.hi >= 0


def ff_where(m, a, b):
    return FF(jnp.where(m, a.hi, b.hi), jnp.where(m, a.lo, b.lo))


def ff_min(a, b):
    return ff_where(_ff_lt(a, b), a, b)


def ff_max(a, b):
    return ff_where(_ff_lt(b, a), a, b)


def _ff_lt(a, b):
    d = a - b
    return d.hi < 0


def ff_roll(x, k):
    if k == 0:  # Mosaic rejects a roll-by-0 (empty slice in the lowering)
        return x
    return FF(jnp.roll(x.hi, k, axis=-1), jnp.roll(x.lo, k, axis=-1))


def ff_from_f64(a):
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def ff_to_f64(hi, lo):
    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)


# --------------------------------------------------- the sweep chain, 3 ways

GAMMA = 1.4
DX = 1.0 / 1024.0
DT = 1e-4
EPS = 1e-6


def chain_ff(rho, uax, uot, E, sh, T):
    """The `_sweep_math` GAD+minmod+euler_2nd chain on FF values.
    `sh(x, k)` shifts along the sweep axis; T is ignored (f32 pairs)."""
    one, half = _ff(1.0, rho.hi), _ff(0.5, rho.hi)
    dx, dt = _ff(DX, rho.hi), _ff(DT, rho.hi)

    # EOS (perfect gas)
    e = E - half * (uax * uax + uot * uot)
    p = _ff(GAMMA - 1.0, rho.hi) * rho * e
    c = ff_sqrt(_ff(GAMMA, rho.hi) * p / rho)
    rc = rho * c

    dm = rho * dx
    rc_l, u_m, p_m = sh(rc, -1), sh(uax, -1), sh(p, -1)
    rc_sum = rc_l + rc
    us_i = (rc_l * u_m + rc * uax + (p_m - p)) / rc_sum
    ps_i = (rc * p_m + rc_l * p + rc_l * rc * (u_m - uax)) / rc_sum

    e_u, e_p = us_i - u_m, ps_i - p_m
    d_u, d_p = uax - us_i, p - ps_i

    def limiter(r):  # minmod
        z = _ff(0.0, r.hi)
        return ff_max(z, ff_min(one, r))

    r_um = limiter(sh(e_u, 1) / (e_u + _ff(EPS, e_u.hi)))
    r_pm = limiter(sh(e_p, 1) / (e_p + _ff(EPS, e_p.hi)))
    r_up = limiter(sh(d_u, -1) / (d_u + _ff(EPS, d_u.hi)))
    r_pp = limiter(sh(d_p, -1) / (d_p + _ff(EPS, d_p.hi)))

    dm_l = sh(dm, -1)
    Dm = (dm_l + dm) * half
    theta = half * (one - rc_sum * half * (dt / Dm))
    ustar = us_i + theta * (r_up * d_u - r_um * e_u)
    pstar = ps_i + theta * (r_pp * d_p - r_pm * e_p)

    us_p, ps_p = sh(ustar, 1), sh(pstar, 1)
    dX = dx + dt * (us_p - ustar)
    rho1 = dm / dX
    dt_dm = dt / dm
    uax1 = uax + dt_dm * (pstar - ps_p)
    E1 = E + dt_dm * (pstar * ustar - ps_p * us_p)

    disp = dt * ustar
    up = disp.hi > 0

    def rd(a, o):
        return ff_where(up, sh(a, o - 1), sh(a, o))

    ru1, rv1, rE1 = rho1 * uax1, rho1 * uot, rho1 * E1
    dxl = rd(dX, 0)
    dxe = ff_where(up, sh(disp, -1) - dx, dx + sh(disp, 1))
    two = _ff(2.0, rho.hi)
    r_m = (two * dX) / (dX + sh(dX, -1))
    r_p = (two * dX) / (dX + sh(dX, 1))

    def slope_base(q):
        du_p = r_p * (sh(q, 1) - q)
        du_m = r_m * (q - sh(q, -1))
        pos = ff_sign_mask(du_p)
        sgn = ff_where(pos, one, -one)
        z = _ff(0.0, q.hi)
        return sgn * ff_max(z, ff_min(sgn * du_p, sgn * du_m))

    rr_i, ru_i = rd(rho1, 0), rd(ru1, 0)
    rv_i, rE_i = rd(rv1, 0), rd(rE1, 0)
    sl_rho, sl_ur = rd(slope_base(rho1), 0), rd(slope_base(ru1), 0)
    sl_vr, sl_Er = rd(slope_base(rv1), 0), rd(slope_base(rE1), 0)

    lf = dxe / (two * dxl)
    adv_rho = disp * (rr_i - sl_rho * lf)
    adv_ur = disp * (ru_i - sl_ur * lf)
    adv_vr = disp * (rv_i - sl_vr * lf)
    adv_Er = disp * (rE_i - sl_Er * lf)

    tmp_rho = (dX * rho1 - (sh(adv_rho, 1) - adv_rho)) / dx
    tmp_ur = (dX * rho1 * uax1 - (sh(adv_ur, 1) - adv_ur)) / dx
    tmp_vr = (dX * rho1 * uot - (sh(adv_vr, 1) - adv_vr)) / dx
    tmp_Er = (dX * rho1 * E1 - (sh(adv_Er, 1) - adv_Er)) / dx

    return tmp_rho, tmp_ur / tmp_rho, tmp_vr / tmp_rho, tmp_Er / tmp_rho


def chain_plain(rho, uax, uot, E, sh, T):
    """Same chain, plain dtype arithmetic (f32 or f64)."""
    dx, dt = T(DX), T(DT)
    e = E - T(0.5) * (uax * uax + uot * uot)
    p = T(GAMMA - 1.0) * rho * e
    c = jnp.sqrt(T(GAMMA) * p / rho)
    rc = rho * c

    dm = rho * dx
    rc_l, u_m, p_m = sh(rc, -1), sh(uax, -1), sh(p, -1)
    rc_sum = rc_l + rc
    us_i = (rc_l * u_m + rc * uax + (p_m - p)) / rc_sum
    ps_i = (rc * p_m + rc_l * p + rc_l * rc * (u_m - uax)) / rc_sum

    e_u, e_p = us_i - u_m, ps_i - p_m
    d_u, d_p = uax - us_i, p - ps_i

    def limiter(r):
        return jnp.maximum(T(0.0), jnp.minimum(T(1.0), r))

    r_um = limiter(sh(e_u, 1) / (e_u + T(EPS)))
    r_pm = limiter(sh(e_p, 1) / (e_p + T(EPS)))
    r_up = limiter(sh(d_u, -1) / (d_u + T(EPS)))
    r_pp = limiter(sh(d_p, -1) / (d_p + T(EPS)))

    dm_l = sh(dm, -1)
    Dm = (dm_l + dm) * T(0.5)
    theta = T(0.5) * (1 - rc_sum * T(0.5) * (dt / Dm))
    ustar = us_i + theta * (r_up * d_u - r_um * e_u)
    pstar = ps_i + theta * (r_pp * d_p - r_pm * e_p)

    us_p, ps_p = sh(ustar, 1), sh(pstar, 1)
    dX = dx + dt * (us_p - ustar)
    rho1 = dm / dX
    dt_dm = dt / dm
    uax1 = uax + dt_dm * (pstar - ps_p)
    E1 = E + dt_dm * (pstar * ustar - ps_p * us_p)

    disp = dt * ustar
    up = disp > 0

    def rd(a, o):
        return jnp.where(up, sh(a, o - 1), sh(a, o))

    ru1, rv1, rE1 = rho1 * uax1, rho1 * uot, rho1 * E1
    dxl = rd(dX, 0)
    dxe = jnp.where(up, sh(disp, -1) - dx, dx + sh(disp, 1))
    r_m = (2 * dX) / (dX + sh(dX, -1))
    r_p = (2 * dX) / (dX + sh(dX, 1))

    def slope_base(q):
        du_p = r_p * (sh(q, 1) - q)
        du_m = r_m * (q - sh(q, -1))
        sgn = jnp.sign(du_p)
        return sgn * jnp.maximum(T(0.0), jnp.minimum(sgn * du_p, sgn * du_m))

    rr_i, ru_i = rd(rho1, 0), rd(ru1, 0)
    rv_i, rE_i = rd(rv1, 0), rd(rE1, 0)
    sl_rho, sl_ur = rd(slope_base(rho1), 0), rd(slope_base(ru1), 0)
    sl_vr, sl_Er = rd(slope_base(rv1), 0), rd(slope_base(rE1), 0)

    lf = dxe / (2 * dxl)
    adv_rho = disp * (rr_i - sl_rho * lf)
    adv_ur = disp * (ru_i - sl_ur * lf)
    adv_vr = disp * (rv_i - sl_vr * lf)
    adv_Er = disp * (rE_i - sl_Er * lf)

    tmp_rho = (dX * rho1 - (sh(adv_rho, 1) - adv_rho)) / dx
    tmp_ur = (dX * rho1 * uax1 - (sh(adv_ur, 1) - adv_ur)) / dx
    tmp_vr = (dX * rho1 * uot - (sh(adv_vr, 1) - adv_vr)) / dx
    tmp_Er = (dX * rho1 * E1 - (sh(adv_Er, 1) - adv_Er)) / dx

    return tmp_rho, tmp_ur / tmp_rho, tmp_vr / tmp_rho, tmp_Er / tmp_rho


# ------------------------------------------------------------------ harness

def _sh(a, k):
    return a if k == 0 else jnp.roll(a, -k, axis=-1)


def init_arrays(n, rng):
    # Smooth positive fields (a shock tube's magnitudes, no discontinuity —
    # the probe measures arithmetic, not physics)
    x = np.linspace(0, 1, n, dtype=np.float64)[None, :] + 0 * \
        np.linspace(0, 1, n, dtype=np.float64)[:, None]
    rho = 1.0 + 0.5 * np.sin(2 * np.pi * x) ** 2 + 0.01 * rng.random((n, n))
    u = 0.1 * np.sin(4 * np.pi * x) + 0.01 * rng.random((n, n))
    v = 0.05 * np.cos(2 * np.pi * x)
    E = 2.0 + 0.2 * np.sin(6 * np.pi * x) ** 2 + 0.01 * rng.random((n, n))
    return rho, u, v, E


def make_pallas_ff(n, chunk):
    from jax.experimental import pallas as pl

    def kernel(rh, rl, uh, ul, vh, vl, Eh, El,
               orh, orl, ouh, oul, ovh, ovl, oEh, oEl):
        def shf(x, k):
            return ff_roll(x, -k)
        rho = FF(rh[...], rl[...])
        uax = FF(uh[...], ul[...])
        uot = FF(vh[...], vl[...])
        E = FF(Eh[...], El[...])
        r2, u2, v2, E2 = chain_ff(rho, uax, uot, E, shf, None)
        orh[...], orl[...] = r2.hi, r2.lo
        ouh[...], oul[...] = u2.hi, u2.lo
        ovh[...], ovl[...] = v2.hi, v2.lo
        oEh[...], oEl[...] = E2.hi, E2.lo

    spec = pl.BlockSpec((chunk, n), lambda i: (i, 0))
    grid = (n // chunk,)
    out_shape = [jax.ShapeDtypeStruct((n, n), np.float32)] * 8

    @jax.jit
    def step(args):
        outs = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[spec] * 8, out_specs=[spec] * 8,
            out_shape=out_shape)(*args)
        return tuple(outs)

    return step


def make_pallas_f32(n, chunk):
    from jax.experimental import pallas as pl

    def kernel(r, u, v, E, orr, ou, ov, oE):
        def shf(x, k):
            return x if k == 0 else jnp.roll(x, -k, axis=-1)
        r2, u2, v2, E2 = chain_plain(r[...], u[...], v[...], E[...],
                                     shf, np.float32)
        orr[...], ou[...], ov[...], oE[...] = r2, u2, v2, E2

    spec = pl.BlockSpec((chunk, n), lambda i: (i, 0))
    out_shape = [jax.ShapeDtypeStruct((n, n), np.float32)] * 4

    @jax.jit
    def step(args):
        return tuple(pl.pallas_call(
            kernel, grid=(n // chunk,),
            in_specs=[spec] * 4, out_specs=[spec] * 4,
            out_shape=out_shape)(*args))

    return step


def make_jnp(dtype):
    T = np.dtype(dtype).type

    @jax.jit
    def step(args):
        return chain_plain(*args, _sh, T)

    return step


def time_steps(step, args, iters, label, n):
    """Time `iters` chained applications of `step` in ONE dispatch (a
    fori_loop) — per-launch timing over the dev tunnel would be swamped by
    the ~26 ms dispatch+read RTT. Best of 3 dispatches."""
    @jax.jit
    def loop(a, k):
        return jax.lax.fori_loop(0, k, lambda _, x: step(x), a)

    out = loop(args, iters)  # compile + warm
    np.asarray(jax.device_get(out[0]))[:1]  # hard sync (axon)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(args, iters)
        np.asarray(jax.device_get(out[0]))[:1]
        best = min(best, time.perf_counter() - t0)
    cps = n * n * iters / best
    print(f"{label:22s} {best/iters*1e3:9.3f} ms/sweep   {cps:.3e} cells/s")
    return cps


def main():
    n = int(os.environ.get("FF_N", "1024"))
    iters = int(os.environ.get("FF_ITERS", "60"))
    cpu_only = "--cpu" in sys.argv
    # 'acc' needs x64 (f64 ground truth + the emulated-f64 jnp timing);
    # 'perf' must NOT enable it (Mosaic rejects kernels under x64 — the
    # BlockSpec index-map literals lower as i64). Platform/x64 are fixed
    # at first backend use, so the two legs run as separate processes:
    # FF_MODE=acc python ff_probe.py ; FF_MODE=perf python ff_probe.py
    mode = os.environ.get("FF_MODE", "acc" if cpu_only else "perf")
    if cpu_only:
        jax.config.update("jax_platforms", "cpu")
    if mode == "acc":
        jax.config.update("jax_enable_x64", True)
    rng = np.random.default_rng(7)
    rho, u, v, E = init_arrays(n, rng)
    print(f"backend: {jax.devices()[0].platform}, N={n}², iters={iters}, "
          f"mode={mode}")

    if mode == "perf":
        # ---------- device throughput (no x64 in this process)
        chunk = int(os.environ.get("FF_CHUNK", "128"))
        ff_args = sum((ff_from_f64(a) for a in (rho, u, v, E)), ())
        ff_args = tuple(jnp.asarray(a) for a in ff_args)
        f32_step = make_pallas_f32(n, chunk)
        cps_f32 = time_steps(f32_step, tuple(
            jnp.asarray(a, np.float32) for a in (rho, u, v, E)),
            iters, "pallas f32", n)
        ff_step = make_pallas_ff(n, chunk)
        cps_ff = time_steps(ff_step, ff_args, iters, "pallas float-float", n)
        print(f"\nff vs f32: {cps_ff / cps_f32:.3f}x")
        return

    # ---------- accuracy: K chained ff sweeps vs f64 ground truth
    K = 12
    ff_args = sum((ff_from_f64(a) for a in (rho, u, v, E)), ())
    ff_args = tuple(jnp.asarray(a) for a in ff_args)

    @jax.jit
    def ff_steps(args):
        def body(_, args):
            vals = [FF(args[2 * i], args[2 * i + 1]) for i in range(4)]
            outs = chain_ff(*vals, lambda a, k: ff_roll(a, -k), None)
            return sum(((o.hi, o.lo) for o in outs), ())
        return jax.lax.fori_loop(0, K, body, args)

    @jax.jit
    def f64_steps(args):
        def body(_, args):
            return chain_plain(*args, _sh, np.float64)
        return jax.lax.fori_loop(0, K, body, args)

    @jax.jit
    def f32_steps(args):
        def body(_, args):
            return chain_plain(*args, _sh, np.float32)
        return jax.lax.fori_loop(0, K, body, args)

    ff_out = ff_steps(ff_args)
    f64_out = f64_steps(tuple(jnp.asarray(a) for a in (rho, u, v, E)))
    f32_out = f32_steps(tuple(jnp.asarray(a, np.float32)
                              for a in (rho, u, v, E)))
    print(f"accuracy after {K} chained sweeps vs f64 "
          f"(normalized inf-norm |err|/max|ref| — the repo's hardware-gate "
          f"convention; pointwise-rel in parens):")
    for i, name in enumerate(("rho", "u", "v", "E")):
        got = ff_to_f64(ff_out[2 * i], ff_out[2 * i + 1])
        ref = np.asarray(f64_out[i], np.float64)
        g32 = np.asarray(f32_out[i], np.float64)
        norm = np.max(np.abs(ref))
        scale = np.maximum(np.abs(ref), 1e-30)
        print(f"  {name:3s}: ff {np.max(np.abs(got - ref)) / norm:.3e} "
              f"(rel {np.max(np.abs(got - ref) / scale):.3e})   "
              f"f32 {np.max(np.abs(g32 - ref)) / norm:.3e} "
              f"(rel {np.max(np.abs(g32 - ref) / scale):.3e})")

    if cpu_only:
        return

    # ---------- the emulated-f64 jnp baseline (x64 is on in this process)
    f64_step = make_jnp(np.float64)
    time_steps(f64_step, tuple(jnp.asarray(a) for a in (rho, u, v, E)),
               max(iters // 10, 3), "jnp f64 (emulated)", n)


if __name__ == "__main__":
    main()

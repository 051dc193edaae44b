"""Randomized tier-equivalence fuzz: random smooth states and random scheme
combinations must agree between the jnp and fused-Pallas tiers. This guards
the kernel math against regressions on inputs the physics tests never reach.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: deselect with -m "not slow"

import jax

from conftest import reference_params

from armon_tpu import Axis
from armon_tpu.core.solver import make_init
from armon_tpu.ops.eos import update_eos
from armon_tpu.ops.boundary import boundary_conditions
from armon_tpu.ops.riemann import numerical_fluxes
from armon_tpu.ops.update import cell_update
from armon_tpu.ops.projection import projection_remap
from armon_tpu.ops.pallas.sweep import fused_sweep


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 12, 13])
def test_random_state_sweep_equivalence(seed):
    rng = np.random.default_rng(seed)
    scheme = rng.choice(["Godunov", "GAD"])
    limiter = rng.choice(["no_limiter", "minmod", "superbee"])
    projection = rng.choice(["euler", "euler_2nd"])
    # Randomize the tile GEOMETRY too: multi-chunk plans, ragged and
    # SHORT (<8-row) chunk tails (seeds 12/13 land tail=6), ragged lane
    # tiles — the round-3 short-tail halo-strip bug lived exactly in a
    # geometry the fixed single-chunk shape of this test could never
    # reach.
    n = (int(rng.integers(40, 140)), int(rng.integers(40, 140)))
    bs = (9999, int(rng.choice([16, 24, 32, 48]))) \
        if rng.random() < 0.75 else None
    params = reference_params("Sod_circ", np.float64, N=n,
                              scheme=str(scheme), riemann_limiter=str(limiter),
                              projection=str(projection),
                              **({"block_size": bs} if bs else {}))
    cfg = params.config
    state = make_init(params)()

    # Smooth random perturbation on top of the two-state field (positive
    # rho/E so the EOS stays physical)
    shape = cfg.local_shape
    def smooth(lo, hi):
        a = rng.uniform(lo, hi, shape)
        # cheap smoothing: two box-blur passes keep gradients resolvable
        for _ in range(2):
            a = 0.25 * (np.roll(a, 1, 0) + np.roll(a, -1, 0)
                        + np.roll(a, 1, 1) + np.roll(a, -1, 1))
        return a

    state = state._replace(
        rho=jax.numpy.asarray(smooth(0.5, 2.0)),
        u=jax.numpy.asarray(smooth(-0.3, 0.3)),
        v=jax.numpy.asarray(smooth(-0.3, 0.3)),
        E=jax.numpy.asarray(smooth(1.5, 3.0)),
    )
    dt = np.float64(1e-4)

    for axis in (Axis.X, Axis.Y):
        s1 = boundary_conditions(cfg, update_eos(cfg, state), axis)
        s2 = numerical_fluxes(cfg, s1, axis, dt)
        s2 = cell_update(cfg, s2, axis, dt)
        s2 = projection_remap(cfg, s2, axis, dt)

        sBC = boundary_conditions(cfg, state, axis, ("rho", "u", "v", "E"))
        r3, u3, v3, E3, p3, dtmin = fused_sweep(
            cfg, axis, sBC.rho, sBC.u, sBC.v, sBC.E, dt, interpret=True)

        # The production in-place kernel (aliased buffers, strip halos)
        # must produce the SAME BITS as the reference-layout kernel.
        from armon_tpu.ops.pallas.sweep import fused_sweep_ip
        r4, u4, v4, E4, p4, dtmin4 = fused_sweep_ip(
            cfg, axis, sBC.rho, sBC.u, sBC.v, sBC.E, dt, interpret=True)

        g = cfg.nghost
        rs = (slice(g, -g), slice(g, -g))
        for name, a, b, c in [("rho", s2.rho, r3, r4), ("u", s2.u, u3, u4),
                              ("v", s2.v, v3, v4), ("E", s2.E, E3, E4)]:
            a = np.asarray(a)[rs]
            b = np.asarray(b)[rs]
            assert np.allclose(a, b, rtol=1e-12, atol=1e-14), \
                f"{scheme}/{limiter}/{projection} {axis} {name}"
            assert np.array_equal(b, np.asarray(c)[rs]), \
                f"in-place kernel diverges: {scheme}/{projection} {axis} {name}"
        assert np.isfinite(float(dtmin))
        assert float(dtmin4) == float(dtmin)


def test_short_tail_chunk_strips():
    """Short ragged chunk tails (rows % chunk in [1,7]): the below halo
    strip of the second-to-last chunk must hold the TRUE rows below it.
    Regression for the round-3 review bug — `_halo_strips` clamped the
    whole strip to rows-8, shifting every halo row the consumer's bottom
    real outputs read by (8 - tail): 2.8e-3 corruption at the last real
    row on a random field (hidden on the physics cases' near-uniform
    boundary states). block_size=(9999,32) on N=(92,92) gives chunk=32,
    tail=4 through both the per-sweep and whole-cycle kernels."""
    rng = np.random.default_rng(7)
    kw = dict(N=(92, 92), block_size=(9999, 32))
    params = reference_params("Sod_circ", np.float64, **kw)
    cfg = params.config
    from armon_tpu.parallel.blocking import plan_tiles
    rows, cols = cfg.local_shape
    chunk = plan_tiles(rows, cols, 8, cfg.block_size).y_chunk_rows
    nci = -(-rows // chunk)
    assert nci >= 2 and 0 < rows - (nci - 1) * chunk < 8  # the geometry

    state = make_init(params)()
    shape = cfg.local_shape
    state = state._replace(
        rho=jax.numpy.asarray(1.0 + 0.5 * rng.random(shape)),
        u=jax.numpy.asarray(0.05 * rng.standard_normal(shape)),
        v=jax.numpy.asarray(0.05 * rng.standard_normal(shape)),
        E=jax.numpy.asarray(2.0 + 0.5 * rng.random(shape)),
    )
    dt = np.float64(1e-4)
    s1 = boundary_conditions(cfg, update_eos(cfg, state), Axis.Y)
    s2 = numerical_fluxes(cfg, s1, Axis.Y, dt)
    s2 = cell_update(cfg, s2, Axis.Y, dt)
    s2 = projection_remap(cfg, s2, Axis.Y, dt)
    sBC = boundary_conditions(cfg, state, Axis.Y, ("rho", "u", "v", "E"))
    from armon_tpu.ops.pallas.sweep import fused_sweep_ip
    r4, u4, v4, E4, p4, dtmin4 = fused_sweep_ip(
        cfg, Axis.Y, sBC.rho, sBC.u, sBC.v, sBC.E, dt, interpret=True)
    g = cfg.nghost
    rs = (slice(g, -g), slice(g, -g))
    for name, a, b in [("rho", s2.rho, r4), ("u", s2.u, u4),
                       ("v", s2.v, v4), ("E", s2.E, E4)]:
        assert np.allclose(np.asarray(a)[rs], np.asarray(b)[rs],
                           rtol=1e-12, atol=1e-13), name

    # Full-solver tier agreement at the same geometry, long enough for the
    # shock to reach the boundary rows (the whole-cycle pair path).
    from armon_tpu.core.solver import make_jit_loop, gather_state

    def run(tier):
        p = reference_params("Sod_circ", np.float64, kernel_tier=tier,
                             maxcycle=35, **kw)
        st = make_init(p)()
        st, t, cycles, dtl, lm, ok = make_jit_loop(p)(st)
        assert bool(ok)
        return gather_state(p, st)

    ha, hb = run("jnp"), run("pallas")
    for var in ("rho", "u", "v", "E"):
        assert np.allclose(np.asarray(getattr(ha, var))[rs],
                           np.asarray(getattr(hb, var))[rs],
                           rtol=1e-12, atol=1e-13), var


@pytest.mark.parametrize("seed", [0, 1])
def test_pair_cycle_matches_per_sweep(seed):
    """The whole-cycle pair kernel (one pass, both sweeps — used on meshes
    and, since round 2, on small single-device grids) must match the
    per-sweep path. The SCHEDULE commutation (X-sweep then Y-ghost-fill ==
    Y-ghost-fill then X-sweep) is exactly bitwise — verified separately by
    composing ghost_exchange + fused_sweep_ip in both orders — but the
    fused kernels themselves drift ~1 ulp from each other because XLA
    picks FMA contractions per fusion context (a pure-jnp _sweep_math
    chain differs from BOTH kernels at the same level), so the gate here
    is tight-tolerance, with the golden ladders bounding the accumulated
    effect."""
    from armon_tpu.core.step import fused_sweep_step, fused_cycle_step

    rng = np.random.default_rng(seed)
    params = reference_params("Sod_circ", np.float64, N=(40, 48))
    cfg = params.config
    state = make_init(params)()
    shape = cfg.local_shape
    state = state._replace(
        rho=jax.numpy.asarray(rng.uniform(0.5, 2.0, shape)),
        u=jax.numpy.asarray(rng.uniform(-0.3, 0.3, shape)),
        v=jax.numpy.asarray(rng.uniform(-0.3, 0.3, shape)),
        E=jax.numpy.asarray(rng.uniform(1.5, 3.0, shape)),
    )
    dt = np.float64(1e-4)

    s1, _, _ = fused_sweep_step(cfg, state, Axis.X, dt, last=False)
    s1, lm1, _ = fused_sweep_step(cfg, s1, Axis.Y, dt, last=True)

    pair = ((Axis.X, 1.0), (Axis.Y, 1.0))
    s2, lm2, _ = fused_cycle_step(cfg, state, pair, dt)

    g = cfg.nghost
    rs = (slice(g, -g), slice(g, -g))
    for var in ("rho", "u", "v", "E", "p"):
        a = np.asarray(getattr(s1, var))[rs]
        b = np.asarray(getattr(s2, var))[rs]
        assert np.allclose(a, b, rtol=1e-12, atol=1e-14), \
            f"pair kernel diverges on {var}"
    assert abs(float(lm1) - float(lm2)) <= 1e-12 * abs(float(lm1))


def test_sweep_commutes_with_orthogonal_ghost_fill_bitwise():
    """The pair kernel's validity argument: pre-filling the Y ghost band
    and then X-sweeping equals X-sweeping and then Y-filling, BITWISE —
    mirror flips the Y-axis velocity, which the X sweep maps oddly and
    exactly (negation commutes with every elementwise op)."""
    from armon_tpu.core.step import ghost_exchange, FUSED_EXCHANGE_VARS
    from armon_tpu.ops.pallas.sweep import fused_sweep_ip

    rng = np.random.default_rng(7)
    params = reference_params("Sod_circ", np.float64, N=(40, 48))
    cfg = params.config
    state = make_init(params)()
    shape = cfg.local_shape
    state = state._replace(
        rho=jax.numpy.asarray(rng.uniform(0.5, 2.0, shape)),
        u=jax.numpy.asarray(rng.uniform(-0.3, 0.3, shape)),
        v=jax.numpy.asarray(rng.uniform(-0.3, 0.3, shape)),
        E=jax.numpy.asarray(rng.uniform(1.5, 3.0, shape)),
    )
    dt = np.float64(1e-4)

    def xsweep(s):
        r, u, v, E, _, _ = fused_sweep_ip(
            cfg, Axis.X, s.rho, s.u, s.v, s.E, dt,
            emit_p=False, emit_dt=False, interpret=True)
        return s._replace(rho=r, u=u, v=v, E=E)

    sA = ghost_exchange(cfg, state, Axis.X, FUSED_EXCHANGE_VARS)
    sA = ghost_exchange(cfg, xsweep(sA), Axis.Y, FUSED_EXCHANGE_VARS)

    sB = ghost_exchange(cfg, state, Axis.X, FUSED_EXCHANGE_VARS)
    sB = xsweep(ghost_exchange(cfg, sB, Axis.Y, FUSED_EXCHANGE_VARS))

    for var in ("rho", "u", "v", "E"):
        assert np.array_equal(np.asarray(getattr(sA, var)),
                              np.asarray(getattr(sB, var))), var


@pytest.mark.parametrize("seed", [0, 1])
def test_slope_formulations_bitwise(seed):
    """The two euler_2nd slope formulations (`_sweep_math(slope_shift=)`,
    picked per sweep axis for speed) must be BITWISE identical: the
    up-branch slope at cell i equals the unshifted base slope at i-1."""
    import jax.numpy as jnp
    from armon_tpu.ops.pallas.sweep import _sweep_math

    rng = np.random.default_rng(seed)
    params = reference_params("Sod", np.float64, N=(40, 40), scheme="GAD",
                              riemann_limiter="minmod",
                              projection="euler_2nd")
    cfg = params.config
    shape = (48, 48)
    rho = jnp.asarray(rng.uniform(0.5, 2.0, shape))
    u = jnp.asarray(rng.uniform(-0.3, 0.3, shape))
    v = jnp.asarray(rng.uniform(-0.3, 0.3, shape))
    E = jnp.asarray(rng.uniform(1.5, 3.0, shape))
    dt = np.float64(1e-4)

    for axis in (0, 1):
        def sh(a, k, axis=axis):
            return jnp.roll(a, -k, axis)

        dx = np.float64(cfg.dx)
        a = _sweep_math(cfg, sh, dt, dx, rho, u, v, E, slope_shift=False)
        b = _sweep_math(cfg, sh, dt, dx, rho, u, v, E, slope_shift=True)
        for name, x, y in zip(("rho", "uax", "uot", "E", "p", "c"), a, b):
            assert np.array_equal(np.asarray(x), np.asarray(y)), \
                f"slope forms diverge on {name} axis={axis}"


def test_profiler_trace_smoke(tmp_path):
    """profiling=['trace'] produces an XPlane dump directory."""
    import os
    from armon_tpu import armon
    params = reference_params("Sod", np.float64, maxcycle=2,
                              profiling=["trace"], output_dir=str(tmp_path))
    armon(params)
    prof = tmp_path / "profile"
    assert prof.exists() and any(prof.rglob("*"))


@pytest.mark.parametrize("seed", [0, 1])
def test_bizarrium_fast_eos_algebra(seed, monkeypatch):
    """The fast-math Bizarrium EOS restructure (Horner polynomials, folded
    G, shared 1/rho — `_eos_prc`'s compiled-f32 branch) must be the SAME
    algebra as the reference-shaped chain: evaluated in f64 with exact
    reciprocals substituted for the VPU approximations, the two chains
    agree to ~1 ulp. This pins the polynomial coefficients and factored
    forms on CPU; the on-chip gate (`scripts/tpu_validate.py`) covers the
    approximate-reciprocal path end-to-end."""
    import jax.numpy as jnp
    from armon_tpu.ops.pallas import sweep as sweep_mod

    # _eos_prc is NOT jitted, so patching the module's pl.reciprocal is
    # visible (the trace-cache caveat in CLAUDE.md applies to jitted fns).
    monkeypatch.setattr(sweep_mod.pl, "reciprocal",
                        lambda x, approx=False: 1.0 / x)

    def div(a, b):  # any non-_EXACT_DIV callable selects the fast branch
        return a / b

    params = reference_params("Bizarrium", np.float64, N=(40, 40))
    cfg = params.config
    rng = np.random.default_rng(seed)
    shape = (32, 32)
    T = np.float64
    # rho around the 10000 kg/m^3 reference density, incl. strong
    # compression/expansion; E dominated by the ~e5 internal energy scale.
    rho = jnp.asarray(rng.uniform(6500.0, 16000.0, shape))
    u = jnp.asarray(rng.uniform(-800.0, 800.0, shape))
    v = jnp.asarray(rng.uniform(-800.0, 800.0, shape))
    E = jnp.asarray(rng.uniform(3.0e5, 9.0e5, shape))

    p1, rc1, c1, rr1 = sweep_mod._eos_prc(cfg, T, rho, u, v, E, div,
                                          need_c=True)
    p2, rc2, c2, _ = sweep_mod._eos_prc(cfg, T, rho, u, v, E, div,
                                        need_c=True, variant="eosref")
    # The restructured chain also exports its refined 1/rho for the
    # Lagrangian dt/dm reuse (round 5) — ~1 ulp of an exact reciprocal.
    assert rr1 is not None
    rel_rr = np.max(np.abs(np.asarray(rr1) * np.asarray(rho) - 1.0))
    assert rel_rr < 1e-12, f"shared 1/rho off: {rel_rr:.2e}"

    # Some random states are genuinely unphysical (sound speed^2 < 0 in
    # the stiff EOS -> NaN through the sqrt); both chains must agree on
    # WHICH, and match to ~1 ulp on the physical rest.
    fin1, fin2 = (np.isfinite(np.asarray(rc1)), np.isfinite(np.asarray(rc2)))
    assert (fin1 == fin2).all(), "chains disagree on the physical domain"
    m = fin1
    assert m.mean() > 0.5, "random state range mostly unphysical"
    for name, a, b in (("p", p1, p2), ("rc", rc1, rc2), ("c", c1, c2)):
        a, b = np.asarray(a)[m], np.asarray(b)[m]
        rel = np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-300))
        assert rel < 1e-12, f"fast-EOS algebra diverges on {name}: {rel:.2e}"

"""Fused Pallas kernel tier — equivalence with the jnp reference tier and
with the Julia goldens (interpret mode on CPU; the same kernels compile via
Mosaic on TPU, where they were verified zero-diff against the f32 golden).

This is the analog of the reference's backend-equivalence suites
(`test/gpu.jl`, `test/kokkos.jl`): the native kernel tier must reproduce the
reference solution.
"""

import numpy as np
import pytest

import jax

from conftest import reference_params, ref_file, abs_tol, rel_tol

from armon_tpu import ArmonParameters, armon, Axis
from armon_tpu.io.output import read_reference_csv, compare_states
from armon_tpu.core.solver import gather_state, make_init, make_cycle


@pytest.mark.parametrize("routing", ["pair", "per_sweep"])
@pytest.mark.parametrize("test", ["Sod", "Sod_circ", "Bizarrium"])
def test_pallas_golden(test, routing):
    """Full golden regression with kernel_tier='pallas' (interpret mode),
    through BOTH fused-tier routings: the whole-cycle pair kernel (the
    default at this grid size) and the per-sweep in-place kernels
    (`pair_threshold=0`) — the production path for large grids, which
    would otherwise have no full-run golden coverage."""
    dtype = np.float64
    params = reference_params(test, dtype, return_data=True,
                              kernel_tier="pallas",
                              pair_threshold=0 if routing == "per_sweep"
                              else 2048)
    stats = armon(params)
    cfg = params.config
    ref_dt, ref_cycles, ref = read_reference_csv(cfg, ref_file(test, dtype))
    assert stats.cycles == ref_cycles
    cnt, max_diff, details = compare_states(
        cfg, gather_state(params, stats.data), ref,
        atol=abs_tol(dtype), rtol=rel_tol(dtype))
    if test != "Bizarrium":
        assert cnt == 0 and max_diff == 0, details
    else:
        assert max_diff < 1e-5, details


def test_pallas_sweep_equivalence():
    """One fused sweep == the op-by-op jnp tier on real cells (~1 ulp;
    bit-differences only from XLA fusion/FMA contraction)."""
    from armon_tpu.ops.eos import update_eos
    from armon_tpu.ops.boundary import boundary_conditions
    from armon_tpu.ops.riemann import numerical_fluxes
    from armon_tpu.ops.update import cell_update
    from armon_tpu.ops.projection import projection_remap
    from armon_tpu.ops.pallas.sweep import fused_sweep

    params = reference_params("Sod_circ", np.float64, N=(64, 64))
    cfg = params.config
    state = make_init(params)()
    state = update_eos(cfg, state)
    cyc = make_cycle(params)
    dtp = np.float64(0)
    for i in range(3):
        state, _, dtp, _ = cyc(state, dtp, np.int32(i))

    dt = np.float64(dtp)
    g = cfg.nghost
    rs = (slice(g, -g), slice(g, -g))
    for axis in (Axis.X, Axis.Y):
        s1 = boundary_conditions(cfg, update_eos(cfg, state), axis)
        s2 = numerical_fluxes(cfg, s1, axis, dt)
        s2 = cell_update(cfg, s2, axis, dt)
        s2 = projection_remap(cfg, s2, axis, dt)

        sBC = boundary_conditions(cfg, state, axis, ("rho", "u", "v", "E"))
        r3, u3, v3, E3, p3, dtmin = fused_sweep(
            cfg, axis, sBC.rho, sBC.u, sBC.v, sBC.E, dt, interpret=True)

        for name, a, b in [("rho", s2.rho, r3), ("u", s2.u, u3),
                           ("v", s2.v, v3), ("E", s2.E, E3),
                           ("p", s1.p, p3)]:
            d = np.max(np.abs(np.asarray(a)[rs] - np.asarray(b)[rs]))
            assert d < 1e-14, f"{axis} {name}: {d}"

        from armon_tpu.ops.reductions import dt_cfl_min
        ref_min = float(dt_cfl_min(cfg, s2._replace(c=s1.c)))
        # Cross-TIER comparison: in interpret mode the kernel's post-sweep
        # u/v differ from the jnp tier by ~1 ulp (XLA FMA contraction of
        # the two differently-shaped graphs), so the CFL extremum cell's
        # value — and hence dt — can differ by a few ulps. (WITHIN a tier,
        # sharded == single-device dt stays bit-exact: tests/test_mesh.py.)
        assert abs(float(dtmin) - ref_min) <= 8 * np.finfo(np.float64).eps * ref_min


@pytest.mark.parametrize("routing", ["pair", "per_sweep"])
@pytest.mark.parametrize("P", [(2, 2), (4, 1), (3, 2)],
                         ids=lambda p: f"{p[0]}x{p[1]}")
def test_pallas_sharded_matches_single(P, routing):
    """Fused tier on a device mesh == fused tier single-device, through
    BOTH mesh routings: the whole-cycle pair kernel (small shards) and
    the per-sweep kernels with a halo exchange before each sweep
    (`pair_threshold=0` — the production path for large shards)."""
    if len(jax.devices()) < P[0] * P[1]:
        pytest.skip("not enough devices")
    thr = 0 if routing == "per_sweep" else 2048

    def run(params):
        from armon_tpu.core.solver import make_jit_loop
        state = make_init(params)()
        loop = make_jit_loop(params)
        state, t, cycles, dt, lm, ok = loop(state)
        assert bool(ok)
        return gather_state(params, state), int(cycles), float(dt)

    single = reference_params("Sod_circ", np.float64, maxcycle=10,
                              kernel_tier="pallas", pair_threshold=thr)
    ref_host, ref_cycles, ref_dt = run(single)

    sharded = reference_params("Sod_circ", np.float64, maxcycle=10, P=P,
                               kernel_tier="pallas", pair_threshold=thr)
    host, cycles, dt = run(sharded)
    assert cycles == ref_cycles
    # In interpret mode the kernels lower to regular XLA ops, whose fusion
    # (FMA contraction) differs with the per-shard tile shapes — so sharded
    # vs single is ~1-ulp here, not bit-exact (the jnp tier's sharding test
    # keeps the bit-exact gate). Compiled Mosaic emits the same per-cell
    # instruction sequence regardless of shard width.
    assert abs(dt - ref_dt) <= 1e-16
    g = single.nghost
    for var in ("rho", "u", "v", "E", "p"):
        a = getattr(ref_host, var)[g:-g, g:-g]
        b = getattr(host, var)[g:-g, g:-g]
        tol = 1e-12 * np.maximum(1.0, np.abs(a))
        assert (np.abs(a - b) <= tol).all(), f"{var} differs on mesh {P}"


def test_inline_bc_multi_tile():
    """The in-kernel Y ghost fill with MULTIPLE row chunks (rows > 264
    forces a multi-tile plan): first/last-tile mirror fills plus the
    tail-tile offset must reproduce the jnp tier exactly."""
    from armon_tpu.core.solver import make_jit_loop
    from armon_tpu.ops.pallas.sweep import inline_bc_y_ok
    kw = dict(N=(64, 300), maxcycle=6)
    params = reference_params("Sod_circ", np.float64, kernel_tier="pallas",
                              **kw)
    assert inline_bc_y_ok(params.config, params.config.local_shape)

    def run(p):
        state = make_init(p)()
        loop = make_jit_loop(p)
        state, t, cycles, dt, lm, ok = loop(state)
        assert bool(ok)
        return gather_state(p, state), float(dt)

    h1, d1 = run(reference_params("Sod_circ", np.float64, **kw))
    h2, d2 = run(params)
    assert abs(d1 - d2) <= 4e-16 * abs(d1)
    g = 4
    for var in ("rho", "u", "v", "E"):
        a = getattr(h1, var)[g:-g, g:-g]
        b = getattr(h2, var)[g:-g, g:-g]
        assert np.allclose(a, b, rtol=1e-12, atol=1e-14), var


@pytest.mark.parametrize("cols,g,f", [
    (108, 4, -1.0),    # N=100: single-region fill (cols-2g < 128)
    (136, 4, 1.0),     # R0 == 128: two adjacent slices, empty middle
    (264, 4, -1.0),    # aligned middle
    (1008, 4, -1.0),   # production 1000²: misaligned total width
    (1033, 4, 2.5),    # right band straddles into a 2-tile slice window
    (68, 2, -1.0),     # g=2 (acoustic+euler scheme depth)
])
def test_bc_x_apply_geometry(cols, g, f):
    """`_bc_x_apply` == the XLA mirror_slab fill for every lane-slice
    geometry: single-region, empty-middle, aligned, misaligned widths,
    and non-unit factors (exactly, incl. the multiply)."""
    import jax.numpy as jnp
    from armon_tpu.ops.pallas.sweep import _bc_x_apply
    nx = cols - 2 * g
    rng = np.random.default_rng(cols * 31 + g)
    a = rng.standard_normal((16, cols))
    out = np.asarray(_bc_x_apply(jnp.asarray(a), g, nx, f, f))
    ref = a.copy()
    ref[:, :g] = a[:, g:2 * g][:, ::-1] * f
    ref[:, g + nx:] = a[:, nx:nx + g][:, ::-1] * f
    assert (out == ref).all()


def test_strip_emission_per_sweep():
    """X-emitted Y halo strips (per-sweep path, multi-chunk): forcing the
    per-sweep kernels on a tall grid must match the jnp tier."""
    from armon_tpu.core.solver import make_jit_loop
    from armon_tpu.ops.pallas.sweep import strip_emission_plan
    kw = dict(N=(64, 392), maxcycle=6)
    params = reference_params("Sod_circ", np.float64, kernel_tier="pallas",
                              pair_threshold=0, **kw)
    assert strip_emission_plan(params.config,
                               params.config.local_shape) is not None

    def run(p):
        state = make_init(p)()
        loop = make_jit_loop(p)
        state, t, cycles, dt, lm, ok = loop(state)
        assert bool(ok)
        return gather_state(p, state), float(dt)

    h1, d1 = run(reference_params("Sod_circ", np.float64, **kw))
    h2, d2 = run(params)
    assert abs(d1 - d2) <= 4e-16 * abs(d1)
    g = 4
    for var in ("rho", "u", "v", "E"):
        a = getattr(h1, var)[g:-g, g:-g]
        b = getattr(h2, var)[g:-g, g:-g]
        assert np.allclose(a, b, rtol=1e-12, atol=1e-14), var


def test_cycle_strip_carry_bitwise():
    """The pair kernel's self-emitted halo-strip carry must be active for
    a production-shaped small grid AND produce BIT-identical real cells
    to the per-cycle XLA `_halo_strips` assembly it replaces (the ghost
    bands may hold placeholder garbage — invariant 3's dead-cell
    contract). The off-variant is forced by monkeypatching the gate;
    jax caches are cleared between variants (CLAUDE.md trace-cache
    gotcha)."""
    import armon_tpu.core.step as step_mod
    from armon_tpu.core.solver import make_jit_loop, _FN_CACHE

    kw = dict(N=(64, 300), maxcycle=8)
    params = reference_params("Sod_circ", np.float64, kernel_tier="pallas",
                              **kw)
    assert step_mod.cycle_strips_on(params.config)

    def run():
        p = reference_params("Sod_circ", np.float64, kernel_tier="pallas",
                             **kw)
        state = make_init(p)()
        state, t, cycles, dt, lm, ok = make_jit_loop(p)(state)
        assert bool(ok)
        return gather_state(p, state), float(dt)

    h_on, d_on = run()
    orig = step_mod.cycle_strips_on
    jax.clear_caches()
    _FN_CACHE.clear()
    try:
        step_mod.cycle_strips_on = lambda cfg: False
        h_off, d_off = run()
    finally:
        step_mod.cycle_strips_on = orig
        jax.clear_caches()
        _FN_CACHE.clear()
    assert d_on == d_off
    g = 4
    for var in ("rho", "u", "v", "E", "p"):
        a = np.asarray(getattr(h_on, var))[g:-g, g:-g]
        b = np.asarray(getattr(h_off, var))[g:-g, g:-g]
        assert (a == b).all(), var


def test_cycle_strip_plan_short_tail_nghost8():
    """Deep-ghost guard on the strip carry: with nghost=8 and a chunk plan
    whose tail tile is 8 rows, the tail's first 4 consumed strip rows fall
    inside the hi ghost band (in-kernel values there are dead garbage, and
    the carried strips predate the next ghost fill) — cycle_strip_plan
    must refuse the carry, and the fused tier must still match the jnp
    tier. Regression for the round-3 review finding (tail guard was
    `tail < 8`, baking in nghost<=4: diverged at 7e-7 on the last real
    row)."""
    from armon_tpu.core.solver import make_jit_loop
    from armon_tpu.ops.pallas.sweep import cycle_strip_plan

    kw = dict(N=(504, 504), nghost=8, block_size=(504, 64), maxcycle=30)
    params = reference_params("Sod_circ", np.float64, kernel_tier="pallas",
                              **kw)
    cfg = params.config
    # The geometry this test exists for: multi-chunk with an 8-row tail.
    from armon_tpu.parallel.blocking import cycle_chunk_rows
    rows, cols = cfg.local_shape
    chunk = cycle_chunk_rows(rows, cols, np.dtype(cfg.dtype).itemsize,
                             cfg.block_size)
    nci = -(-rows // chunk)
    assert nci >= 2 and rows - (nci - 1) * chunk == 8
    assert cycle_strip_plan(cfg, cfg.local_shape) is None

    def run(p):
        state = make_init(p)()
        state, t, cycles, dt, lm, ok = make_jit_loop(p)(state)
        assert bool(ok)
        return gather_state(p, state), float(dt)

    h1, d1 = run(reference_params("Sod_circ", np.float64, **kw))
    h2, d2 = run(params)
    assert abs(d1 - d2) <= 4e-16 * abs(d1)
    g = 8
    for var in ("rho", "u", "v", "E"):
        a = np.asarray(getattr(h1, var))[g:-g, g:-g]
        b = np.asarray(getattr(h2, var))[g:-g, g:-g]
        assert np.allclose(a, b, rtol=1e-12, atol=1e-13), var


@pytest.mark.parametrize("N", [(64, 52), (100, 101), (48, 44)],
                         ids=lambda n: f"{n[0]}x{n[1]}")
def test_pallas_ragged_heights(N):
    """Padded heights that are not multiples of 8 exercise the ragged tail
    halo blocks (a clamping bug here once aliased interior rows into real
    stencils)."""
    from armon_tpu.core.solver import make_jit_loop

    def run(params):
        state = make_init(params)()
        loop = make_jit_loop(params)
        state, t, cycles, dt, lm, ok = loop(state)
        assert bool(ok)
        return gather_state(params, state), float(dt)

    kw = dict(N=N, maxcycle=8)
    h1, d1 = run(reference_params("Sod_circ", np.float64, **kw))
    h2, d2 = run(reference_params("Sod_circ", np.float64,
                                  kernel_tier="pallas", **kw))
    assert abs(d1 - d2) <= 4e-16 * abs(d1)
    g = 4
    for var in ("rho", "u", "v", "E"):
        a = getattr(h1, var)[g:-g, g:-g]
        b = getattr(h2, var)[g:-g, g:-g]
        assert np.allclose(a, b, rtol=1e-12, atol=1e-14), f"{N} {var}"


@pytest.mark.parametrize("split", ["Sequential", "Godunov"])
def test_temporal_blocking_matches_one_cycle(split):
    """K-cycles-per-launch (`fused_multicycle`, the launch-latency
    amortization for tiny grids — the reference keeps small work fed via
    its async block machine, src/solver.jl:58-179) vs the one-cycle pair
    path: identical cycle count, final time and dt recurrence behavior,
    state at the ulp gate. The runs are bitwise for the first cycles;
    the residual (~5e-16 f64 by cycle 20) is the documented CPU-backend
    program-shape FMA-contraction artifact (CLAUDE.md invariant-2
    caveat): NaN-poisoning the halo extension's dead rows leaves the
    diff byte-unchanged (checked round 5), so it is a value-dependent
    rounding edge, not stencil contamination. Coverage: a guarded tail
    (maxcycle % K != 0), a mid-batch maxtime stop, dt_on_even_cycles
    and cst_dt recurrences in-kernel."""
    def run(tb, maxcycle, **kw2):
        kw = dict(test="Sod", N=(64, 64), data_type=np.float64,
                  scheme="GAD", projection="euler_2nd",
                  riemann_limiter="minmod", nghost=4, maxcycle=maxcycle,
                  silent=5, measure_time=False, kernel_tier="pallas",
                  return_data=True, axis_splitting=split,
                  temporal_blocking=tb)
        kw.update(kw2)
        return armon(ArmonParameters(**kw))

    from armon_tpu.core.step import temporal_pairs
    p = reference_params("Sod", np.float64, N=(64, 64),
                         kernel_tier="pallas")
    assert temporal_pairs(p.config) is not None

    for mc, kw2 in ((20, {}),                      # guarded tail (20 % 8)
                    (9, dict(dt_on_even_cycles=True)),
                    (7, dict(cst_dt=True, Dt=1e-4)),
                    (1000, dict(maxtime=0.05))):   # mid-batch maxtime stop
        a, b = run(8, mc, **kw2), run(0, mc, **kw2)
        assert a.cycles == b.cycles, (mc, a.cycles, b.cycles)
        assert a.final_time == b.final_time, (mc, kw2)
        assert np.isclose(a.last_dt, b.last_dt, rtol=1e-12, atol=0), mc
        for v in ("rho", "u", "v", "E", "p"):
            x = np.asarray(getattr(a.data, v))[4:-4, 4:-4]
            y = np.asarray(getattr(b.data, v))[4:-4, 4:-4]
            assert np.allclose(x, y, rtol=1e-12, atol=1e-13), (mc, v)


def test_temporal_blocking_divergence_aborts():
    """A blown-up run (cfl >> stable) must stop with the pointed time
    error through the in-kernel ok gate, exactly like the one-cycle
    path."""
    from armon_tpu.utils.errors import SolverException
    # cfl=3: ~3x the stable dt — NaN develops within a few cycles while t
    # is still far from maxtime (a huge cfl would instead overshoot
    # maxtime in one finite step and stop cleanly, masking the gate).
    kw = dict(test="Sod", N=(64, 64), data_type=np.float64, scheme="GAD",
              projection="euler_2nd", riemann_limiter="minmod", nghost=4,
              maxcycle=200, silent=5, measure_time=False,
              kernel_tier="pallas", cfl=3.0)
    for tb in (8, 0):
        with pytest.raises(SolverException, match="time"):
            armon(ArmonParameters(**kw, temporal_blocking=tb))

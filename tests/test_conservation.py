"""Mass/energy conservation over many cycles (`test/conservation.jl`):
drift must stay <= 1e-12 absolute after 10000 cycles."""

import numpy as np
import pytest

from conftest import reference_params

from armon_tpu.core.solver import make_init, make_jit_loop, make_conservation


@pytest.mark.parametrize("test", ["Sod", "Sod_y", "Sod_circ"])
def test_conservation(test):
    params = reference_params(test, np.float64, maxcycle=10000, maxtime=10000.0)
    cons = make_conservation(params)
    state = make_init(params)()
    m0, e0 = map(float, cons(state))

    loop = make_jit_loop(params)
    state, t, cycles, dt, lm, ok = loop(state)
    assert bool(ok) and int(cycles) == 10000

    m1, e1 = map(float, cons(state))
    assert abs(m0 - m1) <= 1e-12
    assert abs(e0 - e1) <= 1e-12


def test_compensated_f32_sum_accuracy():
    """The two-float sum used by the f32 conservation check must agree with
    an f64 reference sum to ~1 f64-grade ulp, where a plain f32 sum loses
    ~1e-7 relative accuracy."""
    from armon_tpu.ops.reductions import _ff_sum
    rng = np.random.default_rng(42)
    x64 = rng.uniform(0.1, 2.0, size=(1024, 1024))
    x32 = x64.astype(np.float32)
    exact = float(np.sum(x32.astype(np.float64)))  # true sum of the f32 data

    import jax.numpy as jnp
    hi, lo = _ff_sum(jnp.asarray(x32))
    ff = float(np.float64(hi) + np.float64(lo))
    assert abs(ff - exact) / exact < 1e-12

    plain = float(np.float32(x32.sum(dtype=np.float32)))
    # sanity: the compensated form is far more accurate than plain f32
    assert abs(ff - exact) <= abs(plain - exact)


def test_f32_conservation_drift_measurable():
    """The compensated sums give an f64-grade MEASUREMENT of the f32 drift
    (the reference can only check conservation at f64,
    `test/conservation.jl:13`). The drift itself is the f32 SOLVER's
    genuine rounding loss, ~eps32-grade per run — gate just above the
    measured 2.3e-8 (a plain f32 sum could not even resolve this)."""
    params = reference_params("Sod_circ", np.float32, N=(64, 64),
                              maxcycle=500, maxtime=10000.0)
    cons = make_conservation(params)
    state = make_init(params)()
    m0, e0 = cons(state)
    loop = make_jit_loop(params)
    state, t, cycles, dt, lm, ok = loop(state)
    assert bool(ok)
    m1, e1 = cons(state)
    assert abs(m1 - m0) / m0 <= 2e-7
    assert abs(e1 - e0) / e0 <= 2e-7


def test_lean_check_result_never_rehydrates(monkeypatch):
    """A lean fused-driver run whose ONLY state consumer is the final
    conservation check must compute it over the 5-field carry
    (`make_conservation_lean`) without rebuilding the 11-field State —
    at the 16384² capacity limit the rehydrate (~11.8 GB on top of the
    ~5.4 GB carry) would OOM the 16 GB chip just to sum rho and E."""
    import warnings

    import armon_tpu.core.solver as solver
    from armon_tpu import armon

    def boom(params):
        raise AssertionError("rehydrate must not run for check_result-only")

    monkeypatch.setattr(solver, "make_rehydrate", boom)
    params = reference_params("Sod_circ", np.float64, maxcycle=20,
                              kernel_tier="pallas", check_result=True)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        stats = armon(params)
    assert stats.cycles == 20
    assert not [x for x in w if "not constant" in str(x.message)]

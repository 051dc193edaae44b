"""Temporal blocking (fuse_cycles=2): two cycles per fused kernel pass must
reproduce the single-cycle path exactly — including at FreeFlow/Dirichlet
global borders (in-kernel mid-pair BC re-fill) and for odd cycle counts
(single-cycle tail)."""

import numpy as np
import pytest

from conftest import reference_params, ref_file, abs_tol, rel_tol

from armon_tpu import armon, ArmonParameters, SolverException
from armon_tpu.core.solver import gather_state, make_init, make_jit_loop
from armon_tpu.io.output import read_reference_csv, compare_states


def run(params):
    state = make_init(params)()
    loop = make_jit_loop(params)
    state, t, cycles, dt, lm, ok = loop(state)
    assert bool(ok)
    return gather_state(params, state), int(cycles), float(dt), float(t)


@pytest.mark.parametrize("test", ["Sod", "Sod_y", "Sod_circ", "Sedov"])
def test_pair_golden(test):
    """Golden regression with fuse_cycles=2 (covers FreeFlow borders: Sod's
    Y sides, Sedov all sides). Sedov is held to a near-zero gate rather than
    zero — the reference excludes it from the zero assertion too
    (`test/convergence.jl:24-27`), and in interpret mode the pair program's
    different XLA fusion accumulates ~1e-13 of FMA drift over 568 cycles."""
    dtype = np.float64
    params = reference_params(test, dtype, return_data=True,
                              kernel_tier="pallas", fuse_cycles=2)
    stats = armon(params)
    cfg = params.config
    ref_dt, ref_cycles, ref = read_reference_csv(cfg, ref_file(test, dtype))
    assert stats.cycles == ref_cycles
    cnt, max_diff, details = compare_states(
        cfg, gather_state(params, stats.data), ref,
        atol=abs_tol(dtype), rtol=rel_tol(dtype))
    if test == "Sedov":
        cnt5, _, details5 = compare_states(
            cfg, gather_state(params, stats.data), ref,
            atol=5e-13, rtol=rel_tol(dtype))
        assert cnt5 == 0, details5
    else:
        assert cnt == 0 and max_diff == 0, details


@pytest.mark.parametrize("maxcycle", [1, 2, 3, 7, 20])
@pytest.mark.parametrize("splitting", ["Sequential", "Godunov"])
def test_pair_matches_single_cycle_path(maxcycle, splitting):
    """K=2 == K=1 for any cycle count (odd counts exercise the tail) and
    both 2-sweep splittings. nghost=8 on both sides for identical shapes."""
    kw = dict(N=(64, 64), maxcycle=maxcycle, axis_splitting=splitting,
              kernel_tier="pallas", nghost=8)
    h1, c1, d1, t1 = run(reference_params("Sod_circ", np.float64, **kw))
    h2, c2, d2, t2 = run(reference_params("Sod_circ", np.float64,
                                          fuse_cycles=2, **kw))
    assert c1 == c2 == maxcycle
    # interpret-mode FMA fusion differs between the two programs -> the dt
    # carry can differ in its last bit (compiled Mosaic is gate-clean)
    assert abs(d1 - d2) <= 4e-16 * abs(d1)
    assert abs(t1 - t2) <= 4e-16 * abs(t1)
    g = 8
    for var in ("rho", "u", "v", "E", "p"):
        a = getattr(h1, var)[g:-g, g:-g]
        b = getattr(h2, var)[g:-g, g:-g]
        assert np.allclose(a, b, rtol=1e-12, atol=1e-14), var


def test_pair_requires_pallas():
    with pytest.raises(SolverException, match="pallas"):
        ArmonParameters(test="Sod", fuse_cycles=2, kernel_tier="jnp")
    # 'auto' and 'pallas' both allow it
    assert ArmonParameters(test="Sod", fuse_cycles=2).nghost == 8


def test_pair_spmd_falls_back():
    """On a mesh the pair mode silently falls back to single-cycle kernels
    (mid-pair interior halos would need remote DMA) — results unchanged."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    kw = dict(N=(64, 64), maxcycle=6, kernel_tier="pallas", nghost=8)
    h1, c1, d1, t1 = run(reference_params("Sod_circ", np.float64, **kw))
    h2, c2, d2, t2 = run(reference_params("Sod_circ", np.float64, P=(2, 2),
                                          fuse_cycles=2, **kw))
    assert c1 == c2
    assert abs(d1 - d2) <= 4e-16 * abs(d1)
    g = 8
    for var in ("rho", "u", "v", "E"):
        a = getattr(h1, var)[g:-g, g:-g]
        b = getattr(h2, var)[g:-g, g:-g]
        assert np.allclose(a, b, rtol=1e-12, atol=1e-14), var

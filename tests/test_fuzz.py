"""Randomized tier-equivalence fuzz: random smooth states and random scheme
combinations must agree between the jnp and fused-Pallas tiers. This guards
the kernel math against regressions on inputs the physics tests never reach.
"""

import numpy as np
import pytest

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


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_state_sweep_equivalence(seed):
    rng = np.random.default_rng(seed)
    scheme = rng.choice(["Godunov", "GAD"])
    limiter = rng.choice(["no_limiter", "minmod", "superbee"])
    projection = rng.choice(["euler", "euler_2nd"])
    params = reference_params("Sod_circ", np.float64, N=(48, 40),
                              scheme=str(scheme), riemann_limiter=str(limiter),
                              projection=str(projection))
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

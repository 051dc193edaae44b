"""Checkpoint / restart: an interrupted run resumed from a snapshot must be
bit-identical to an uninterrupted run (both kernel tiers, incl. sharded)."""

import os

import numpy as np
import pytest

import jax

from conftest import reference_params

from armon_tpu import armon
from armon_tpu.core.solver import make_init, make_jit_loop, gather_state
from armon_tpu.io.restart import save_checkpoint, load_checkpoint
from armon_tpu.utils.errors import SolverException


def full_run(test, maxcycle, **kw):
    params = reference_params(test, np.float64, maxcycle=maxcycle,
                              return_data=True, **kw)
    stats = armon(params)
    return params, stats


@pytest.mark.parametrize("tier", ["jnp", "pallas"])
def test_resume_bit_exact(tier, tmp_path):
    ref_params, ref = full_run("Sod_circ", 20, kernel_tier=tier)

    # run 8 cycles, snapshot, resume for the remaining 12
    p1, s1 = full_run("Sod_circ", 8, kernel_tier=tier)
    ckpt = tmp_path / "run.ckpt.npz"
    save_checkpoint(ckpt, p1, s1.data, s1.final_time, s1.cycles, s1.last_dt)

    p2 = reference_params("Sod_circ", np.float64, maxcycle=20,
                          return_data=True, kernel_tier=tier)
    s2 = armon(p2, restore_from=str(ckpt))
    assert s2.cycles == ref.cycles
    assert s2.final_time == ref.final_time
    assert s2.last_dt == ref.last_dt

    a = gather_state(ref_params, ref.data)
    b = gather_state(p2, s2.data)
    g = ref_params.nghost
    for var in ("rho", "u", "v", "E"):
        x = getattr(a, var)[g:-g, g:-g]
        y = getattr(b, var)[g:-g, g:-g]
        assert np.array_equal(x, y), var


def test_checkpoint_step_option(tmp_path):
    params = reference_params("Sod", np.float64, maxcycle=6,
                              checkpoint_step=2, output_dir=str(tmp_path),
                              output_file="run")
    armon(params)
    ckpt = tmp_path / "run.ckpt.npz"
    assert ckpt.exists()
    p2 = reference_params("Sod", np.float64, maxcycle=6,
                          output_dir=str(tmp_path), output_file="run")
    state, t, cycles, dt_prev, lm = load_checkpoint(ckpt, p2)
    assert cycles == 6 and t > 0


def test_fingerprint_mismatch(tmp_path):
    p1, s1 = full_run("Sod", 2)
    ckpt = tmp_path / "x.npz"
    save_checkpoint(ckpt, p1, s1.data, s1.final_time, s1.cycles, s1.last_dt)
    p_other = reference_params("Sod_circ", np.float64, maxcycle=2)
    with pytest.raises(SolverException, match="different"):
        load_checkpoint(ckpt, p_other)


def test_resume_sharded(tmp_path):
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    ref_params, ref = full_run("Sod", 12, P=(2, 2))
    p1, s1 = full_run("Sod", 5, P=(2, 2))
    ckpt = tmp_path / "s.npz"
    save_checkpoint(ckpt, p1, s1.data, s1.final_time, s1.cycles, s1.last_dt)
    p2 = reference_params("Sod", np.float64, maxcycle=12, return_data=True,
                          P=(2, 2))
    s2 = armon(p2, restore_from=str(ckpt))
    assert s2.cycles == ref.cycles and s2.last_dt == ref.last_dt
    a = gather_state(ref_params, ref.data)
    b = gather_state(p2, s2.data)
    g = ref_params.nghost
    for var in ("rho", "u", "v", "E"):
        assert np.array_equal(getattr(a, var)[g:-g, g:-g],
                              getattr(b, var)[g:-g, g:-g]), var

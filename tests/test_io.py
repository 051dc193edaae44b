"""I/O: pm3d CSV write/read roundtrip, native/Python parity, checkpoint
compare mode (`src/io.jl` behaviors)."""

import os

import numpy as np
import pytest

from conftest import reference_params

from armon_tpu import armon
from armon_tpu.core.solver import make_init, gather_state, make_file_checkpoint
from armon_tpu.io.output import (
    write_state_file, read_state_file, saved_vars_arrays, SAVED_VARS)
from armon_tpu.io import native


@pytest.fixture
def small_state(tmp_path):
    params = reference_params("Sod_circ", np.float64, N=(32, 32))
    return params, gather_state(params, make_init(params)())


def test_roundtrip(small_state, tmp_path):
    params, state = small_state
    cfg = params.config
    path = tmp_path / "out.csv"
    write_state_file(cfg, state, path)
    back = read_state_file(cfg, path)
    arrs = saved_vars_arrays(cfg, state)
    for v in SAVED_VARS:
        assert np.array_equal(back[v], arrs[v]), v


def test_native_python_parity(small_state, tmp_path):
    """The native C++ writer must be byte-identical to the Python formatter
    (both mirror the reference's @printf format, `src/io.jl:9`)."""
    if not native.available():
        pytest.skip("native io not built")
    params, state = small_state
    cfg = params.config
    p_nat, p_py = tmp_path / "nat.csv", tmp_path / "py.csv"
    write_state_file(cfg, state, p_nat)
    orig = native.write_cells
    native.write_cells = lambda *a, **k: False
    try:
        write_state_file(cfg, state, p_py)
    finally:
        native.write_cells = orig
    assert p_nat.read_bytes() == p_py.read_bytes()


def test_native_count_differences():
    if not native.available():
        pytest.skip("native io not built")
    ref = np.array([1.0, 2.0, 3.0, 0.0])
    ours = np.array([1.0, 2.0 + 1e-8, 3.0, 1e-15])
    cnt, mr = native.count_differences(ref, ours, atol=1e-13, rtol=1e-10)
    assert cnt == 1 and abs(mr - 5e-9) < 1e-10


def test_write_ghosts(small_state, tmp_path):
    params, state = small_state
    cfg = params.config
    path = tmp_path / "g.csv"
    write_state_file(cfg, state, path, with_ghosts=True)
    back = read_state_file(cfg, path, with_ghosts=True)
    assert back["rho"].shape == cfg.local_shape


def test_checkpoint_compare_mode(tmp_path):
    """is_ref writes per-substep files; an identical rerun compares clean;
    a perturbed run stops at the first difference (`src/io.jl:185-227`)."""
    common = dict(N=(20, 20), maxcycle=2, compare=True,
                  output_dir=str(tmp_path), output_file="ck")
    ref = reference_params("Sod", np.float64, is_ref=True, **common)
    armon(ref)
    files = os.listdir(tmp_path)
    assert len(files) > 10
    assert any(f.endswith("_EOS_X") for f in files)
    assert any("time_step" in f for f in files)

    same = reference_params("Sod", np.float64, is_ref=False, **common)
    stats = armon(same)
    assert stats.cycles == 2  # ran to completion: no differences

    pert = reference_params("Sod", np.float64, is_ref=False, cfl=0.5, **common)
    stats = armon(pert)
    assert stats.cycles == 0  # stopped at the first (time_step) checkpoint

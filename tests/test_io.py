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


def test_native_guards(tmp_path):
    """Round-3 review hardening: shape mismatches must raise in the glue
    (the C loops index by the first array's extents — an out-of-bounds
    read otherwise), and a line longer than the reader's buffer must be
    an explicit error, not two silently-corrupt values."""
    if not native.available():
        pytest.skip("native io not built")
    with pytest.raises(ValueError, match="shape"):
        native.count_differences(np.zeros(4), np.zeros(3), 1e-13, 1e-10)
    with pytest.raises(ValueError, match="shape"):
        native.write_cells(tmp_path / "x.csv",
                           [np.zeros((2, 2)), np.zeros((3, 2))], 17)
    long_line = ", ".join(["1.00000000000000000e+00"] * 200)  # ~5 KB
    p = tmp_path / "long.csv"
    p.write_text(long_line + "\n")
    with pytest.raises(IOError, match="-3"):
        native.read_cells(p, 400)


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


def test_checkpoint_diff_file(tmp_path):
    """A state mismatch writes the differing state next to the reference
    file as `_diff` (`src/io.jl:220-222`)."""
    common = dict(N=(20, 20), maxcycle=1, compare=True,
                  output_dir=str(tmp_path), output_file="ck")
    armon(reference_params("Sod", np.float64, is_ref=True, **common))
    # corrupt one value of the first EOS state file
    target = tmp_path / "ck_000_EOS_X"
    lines = target.read_text().splitlines()
    cols = lines[0].split(",")
    cols[2] = " 9.99999999999999900e+00"  # rho
    lines[0] = ",".join(cols)
    target.write_text("\n".join(lines) + "\n")

    stats = armon(reference_params("Sod", np.float64, is_ref=False, **common))
    assert stats.cycles == 0  # stopped at the corrupted step
    assert (tmp_path / "ck_000_EOS_X_diff").exists()


def test_checkpoint_compare_mode_spmd(tmp_path):
    """Compare mode under SPMD: per-shard `_<cx>×<cy>` step files with no
    global gather (`src/io.jl:185-227,46-59`); a clean rerun passes, a
    corrupted shard file stops the run and leaves a per-shard `_diff`."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    common = dict(N=(20, 20), maxcycle=2, compare=True, P=(2, 2),
                  output_dir=str(tmp_path), output_file="ck")
    armon(reference_params("Sod", np.float64, is_ref=True, **common))
    files = os.listdir(tmp_path)
    assert any(f.endswith("_EOS_X_0×0") for f in files), files
    assert any(f.endswith("_EOS_X_1×1") for f in files), files

    stats = armon(reference_params("Sod", np.float64, is_ref=False, **common))
    assert stats.cycles == 2  # clean comparison, ran to completion

    # single-device-written global files would NOT exist; the per-shard
    # naming is the only step output
    assert not (tmp_path / "ck_000_EOS_X").exists()

    target = tmp_path / "ck_000_EOS_X_1×0"
    lines = target.read_text().splitlines()
    cols = lines[0].split(",")
    cols[2] = " 9.99999999999999900e+00"
    lines[0] = ",".join(cols)
    target.write_text("\n".join(lines) + "\n")
    stats = armon(reference_params("Sod", np.float64, is_ref=False, **common))
    assert stats.cycles == 0
    assert (tmp_path / "ck_000_EOS_X_1×0_diff").exists()
    assert not (tmp_path / "ck_000_EOS_X_0×0_diff").exists()


def test_spmd_compare_matches_single_device_refs(tmp_path):
    """A sharded compare run against PER-SHARD refs written by a sharded
    is_ref run is bit-clean; dt files agree with a single-device run."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    single = dict(N=(24, 24), maxcycle=1, compare=True,
                  output_dir=str(tmp_path / "s"), output_file="ck")
    os.makedirs(tmp_path / "s")
    armon(reference_params("Sod_circ", np.float64, is_ref=True, **single))
    sharded = dict(N=(24, 24), maxcycle=1, compare=True, P=(2, 2),
                   output_dir=str(tmp_path / "m"), output_file="ck")
    os.makedirs(tmp_path / "m")
    armon(reference_params("Sod_circ", np.float64, is_ref=True, **sharded))
    # the replicated dt of the mesh run == the single-device dt, bitwise
    a = (tmp_path / "s" / "ck_000_time_step_X").read_text()
    b = (tmp_path / "m" / "ck_000_time_step_X").read_text()
    assert a == b


def test_write_slices(tmp_path):
    """`write_slices` — declared but UNDEFINED in the reference
    (`src/parameters.jl:229,297` calls `write_slices_files`,
    `src/solver.jl:508`, which does not exist); implemented here. Three
    cuts (middle row, middle column, main diagonal), one file per cut,
    full output precision: values must round-trip exactly against the
    state the run wrote."""
    params = reference_params(
        "Sod_circ", np.float64, N=(24, 28), maxcycle=3, return_data=True,
        write_output=False, write_slices=True,
        output_dir=str(tmp_path), output_file="run")
    stats = armon(params)
    cfg = params.config
    arrs = saved_vars_arrays(cfg, gather_state(params, stats.data))
    ny, nx = arrs["x"].shape
    expect = {
        "X": (nx, {v: arrs[v][ny // 2, :] for v in SAVED_VARS}),
        "Y": (ny, {v: arrs[v][:, nx // 2] for v in SAVED_VARS}),
        "D": (min(nx, ny),
              {v: np.diagonal(arrs[v])[: min(nx, ny)] for v in SAVED_VARS}),
    }
    for cut, (n, ref) in expect.items():
        path = tmp_path / f"run_{cut}_slice"
        assert path.exists(), cut
        rows = [r for r in path.read_text().splitlines() if r.strip()]
        assert len(rows) == n, cut
        got = np.array([[np.float64(x) for x in r.split(",")] for r in rows])
        for k, v in enumerate(SAVED_VARS):
            assert np.array_equal(got[:, k], ref[v]), f"{cut}/{v}"


def test_animation_frames(tmp_path):
    """`animation_step=N` writes a frame every N cycles into `anim/`
    (`src/solver.jl:370-374` semantics). Frame 0 (written at cycle 1)
    must equal the final output of a maxcycle=1 run bit-for-bit."""
    common = dict(N=(24, 24), output_file="mov")
    params = reference_params("Sod", np.float64, maxcycle=5,
                              animation_step=2,
                              output_dir=str(tmp_path / "a"), **common)
    armon(params)
    frames = sorted(os.listdir(tmp_path / "a" / "anim"))
    # frames at cycles 1, 3, 5 -> mov_000..002
    assert frames == ["mov_000", "mov_001", "mov_002"]

    p1 = reference_params("Sod", np.float64, maxcycle=1, write_output=True,
                          output_dir=str(tmp_path / "b"), **common)
    armon(p1)
    assert ((tmp_path / "a" / "anim" / "mov_000").read_bytes()
            == (tmp_path / "b" / "mov").read_bytes())


def test_animation_frames_per_shard(tmp_path):
    """On a `use_MPI` mesh, animation frames follow the distributed-output
    rule: per-shard `_<cx>×<cy>` files, no gather."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    params = reference_params("Sod", np.float64, N=(24, 24), maxcycle=2,
                              animation_step=1, P=(2, 2), use_MPI=True,
                              output_dir=str(tmp_path), output_file="mov")
    armon(params)
    for frame in ("mov_000", "mov_001"):
        for cx in range(2):
            for cy in range(2):
                assert (tmp_path / "anim" / f"{frame}_{cx}×{cy}").exists()

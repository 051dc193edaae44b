"""VMEM tile planner unit tests — the analog of the reference's BlockGrid
geometry suite (`test/blocking.jl:1-60`): alignment, budget and tail-safety
invariants over a matrix of grid/block-size/nghost combinations."""

import numpy as np
import pytest

from armon_tpu.parallel.blocking import (
    plan_tiles, cycle_chunk_rows, memory_required,
    VMEM_BUDGET, LIVE_BUFFERS,
)


# grid/block-size matrix in the spirit of `test/blocking.jl:4-14`
CASES = [
    ((108, 108), None),          # reference scale
    ((108, 108), (32, 32)),
    ((108, 108), (16, 48)),
    ((108, 108), (57, 57)),      # odd block
    ((108, 108), (106, 106)),
    ((108, 58), (64, 64)),
    ((248, 248), (64, 32)),
    ((1032, 1032), None),
    ((8200, 8200), None),        # production scale
    ((8200, 8200), (17, 63)),
    ((4104, 16392), None),       # wide
    ((16392, 4104), None),       # tall
]


@pytest.mark.parametrize("shape,bs", CASES,
                         ids=lambda c: str(c).replace(" ", ""))
def test_plan_invariants(shape, bs):
    if isinstance(shape, tuple) and isinstance(bs, (tuple, type(None))):
        rows, cols = shape
    p = plan_tiles(rows, cols, 4, bs)
    # hardware alignment
    assert p.x_tile_rows % 8 == 0 and p.x_tile_rows >= 8
    assert p.y_chunk_rows % 8 == 0 and p.y_chunk_rows >= 8
    assert p.y_tile_cols % 128 == 0 and p.y_tile_cols >= 128
    assert p.halo_block == 8
    # VMEM budget: the Y sweep's live buffers must fit
    per_buf = (p.y_chunk_rows + 16) * p.y_tile_cols * 4
    assert per_buf * LIVE_BUFFERS <= VMEM_BUDGET
    # block_size hint bounds (clamped to alignment)
    if bs is not None:
        assert p.y_chunk_rows <= max(8, -(-min(bs[1], rows) // 8) * 8)
        assert p.y_tile_cols <= max(128, -(-min(bs[0], cols) // 128) * 128)


def test_cycle_chunk_rows_budget():
    for cols in (1032, 8200, 16392):
        c = cycle_chunk_rows(9000, cols, 4)
        assert c % 8 == 0 and c >= 8
        # the planner budgets VMEM_BUDGET//3 for the live temporaries
        # (plus one 8-row rounding step of slack)
        per_row = cols * LIVE_BUFFERS * 4
        assert (c + 8) * per_row <= VMEM_BUDGET // 3 + 8 * per_row
        # block_size bound honored
        assert cycle_chunk_rows(9000, cols, 4, (128, 24)) <= 24


def test_memory_required_accounting():
    """Exact itemization: the observed capacity behavior on the dev chip
    (8192^2 f32 fits in ~4.3 GB, 12288^2 needs ~9.7 GB > HBM)."""
    m8 = memory_required((8192, 8192), 4, 4)
    m12 = memory_required((12288, 12288), 4, 4)
    assert m8["per_device_field_bytes"] == 8200 * 8200 * 4
    assert m8["per_device_state_bytes"] == 11 * m8["per_device_field_bytes"]
    assert m8["per_device_transient_bytes"] == 5 * m8["per_device_field_bytes"]
    assert 4.0e9 < m8["per_device_total_bytes"] < 4.6e9
    assert m12["per_device_total_bytes"] > 9.5e9


def test_halo_strips_contents():
    """The Y-sweep side strips must hold exactly the 8 rows above/below
    each chunk. At a short ragged tail the below strip's first `tail`
    rows must still be the TRUE rows at (i+1)*chunk (a whole-strip clamp
    shifted the consumer's real reads — the round-3 review bug); only
    rows past the array end are pad (dead by invariant 3). The last
    chunk's below block is a clamped placeholder."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from armon_tpu.ops.pallas.sweep import _halo_strips
    for rows, chunk in ((72, 32), (100, 32), (71, 32)):
        cols = 16
        x = jnp.arange(rows * cols, dtype=jnp.float32).reshape(rows, cols)
        above, below = _halo_strips(x, chunk, rows)
        nci = -(-rows // chunk)
        assert above.shape == (nci * 8, cols) and below.shape == (nci * 8, cols)
        xn = np.asarray(x)
        for i in range(1, nci):
            assert np.array_equal(np.asarray(above[i * 8:(i + 1) * 8]),
                                  xn[i * chunk - 8:i * chunk])
        for i in range(nci - 1):
            start = (i + 1) * chunk
            real = min(8, rows - start)
            assert np.array_equal(np.asarray(below[i * 8:i * 8 + real]),
                                  xn[start:start + real]), (rows, chunk, i)

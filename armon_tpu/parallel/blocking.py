"""VMEM tile planner — the TPU replacement for the cache-blocking runtime.

The reference cuts each sub-domain into cache blocks sized to fit L2
(`src/blocking/block_grid.jl`, defaults (64,64) CPU / (32,32) GPU at
`src/parameters.jl:505-513`) and schedules them with threads + a lock-free
interface. On TPU the same role is played by the Pallas grid: tiles stream
through VMEM, double-buffered by Mosaic, with no host scheduler
(SURVEY.md §2.4 "task parallelism" row).

This module turns the user's ``block_size`` hint (kept for config parity)
plus the padded array shape into the fused kernels' tile parameters, and
provides the exact byte accounting that `memory_required` exposes
(`src/blocking/block_grid.jl:598-709`).
"""

import os

from dataclasses import dataclass
from typing import Optional, Tuple

# Mosaic's default scoped-VMEM budget we plan against (bytes). The fused
# sweep kernel keeps ~25 live tile temporaries.
VMEM_BUDGET = 100 * 1024 * 1024
LIVE_BUFFERS = 25


def _round_up(x, m):
    return -(-x // m) * m


@dataclass(frozen=True)
class TilePlan:
    """Tile parameters for the fused sweep kernels."""
    x_tile_rows: int          # X sweep: rows per full-width tile
    y_chunk_rows: int         # Y sweep: rows per chunk (multiple of 8)
    y_tile_cols: int          # Y sweep: lanes per tile (multiple of 128)
    halo_block: int = 8       # aligned halo block height (>= dependency depth 4)


def plan_tiles(rows: int, cols: int, itemsize: int,
               block_size: Optional[Tuple[int, int]] = None) -> TilePlan:
    """Choose tile sizes for a padded (rows, cols) block.

    `block_size` is the reference's cache-block option
    (`src/parameters.jl:497-516`); when given, it is AUTHORITATIVE for the
    Y-sweep tile — clamped only to the array extent and hardware
    alignment, NOT to the VMEM budget (an expert perf knob: sweeps probe
    above the auto band; only the auto planner enforces the budget).
    """
    # X sweep: full-width row tiles; rows are independent so any multiple of
    # the 8-sublane tiling works (ragged tails are padded/masked by Pallas).
    # Measured on v5e: throughput is flat in tile_r (DMA-ceiling bound), so
    # prefer 8 whenever it divides `rows` — 8 also divides every Y chunk
    # (always a multiple of 8), which is what lets the X kernel emit the Y
    # sweep's halo strips (ops/pallas/sweep.py:strip_emission_plan).
    # Fall back to ragged 32-row tiles — never the whole array (VMEM
    # blowup at production widths). Every branch is clamped by the VMEM
    # bound: a SHORT but WIDE array (e.g. 256 x 16392) would otherwise
    # plan a whole-array tile whose ~25 live temporaries exhaust the
    # scoped-VMEM limit at compile time.
    budget = VMEM_BUDGET // 3  # room for Mosaic's i/o double buffers
    per_row = cols * LIVE_BUFFERS * itemsize
    x_vmem = max(8, (budget // per_row // 8) * 8)
    if rows <= 256:
        x_tile = _round_up(rows, 8)
    elif rows % 8 == 0:
        x_tile = int(os.environ.get("ARMON_XTILE", "8"))
    else:
        x_tile = 32
    x_tile = min(x_tile, x_vmem)

    # Y sweep: (chunk + 2*halo) x tile_c buffers, LIVE_BUFFERS of them.
    # Chunk height is a measured sweet spot, not a pure cost model: the
    # full-loop bench at 8192² f32 gives 200 -> 4.53, 128 -> 4.48,
    # 256 -> 4.36, 512 -> 4.21, 1640 -> 3.93 Gcells/s (BENCH_NOTES
    # round-2 chunk sweep) — short chunks pipeline better, very short
    # ones drown in halo recompute. Scan the [128, 256] band for the
    # multiple-of-8 height minimizing ragged-tail padding plus the
    # (half-weighted) halo-recompute fraction 16/(c+16); at 8200 rows
    # this picks the exact divisor 200.
    if rows <= 264:
        chunk = _round_up(rows, 8)
    else:
        # Ragged-tail padding hurts ~4x its naive cell fraction (the tail
        # tile still pays full pipeline latency): at 8200 rows the exact
        # divisor 200 beats 216 (pad 8) 4.70 vs 4.66 Gcells/s and 232
        # (pad 144) by 2.5% (round-3 full-loop chunk sweep).
        def _cost(c):
            pad = (-(-rows // c) * c - rows) / rows
            return 4.0 * pad + 0.5 * 16.0 / (c + 16)
        chunk = min(range(128, 257, 8), key=_cost)
    if block_size is not None:
        # The block-size option is authoritative (like the reference's
        # cache-block size): it SETS the chunk height, clamped to the
        # array and 8-row alignment — so perf sweeps can probe above the
        # auto band too.
        chunk = max(8, _round_up(min(block_size[1], rows), 8))

    if cols <= 512:
        tile_c = _round_up(cols, 128)
    else:
        # One 128-lane tile: measured best at every production width once
        # the in-kernel ghost fills landed (round-3 full-loop sweeps:
        # 8192² 128 -> 5.31 vs 256 -> 4.87; Sod 4000² 128/176 -> 5.03 vs
        # 256-default 4.69; Bizarrium 4000² 128/136 -> 4.36 vs 3.98;
        # 16384x4096 128/200 -> 5.13 vs 4.88 Gcells/s) — narrower tiles
        # shorten the sublane-roll vreg chains and pipeline more grid
        # steps per sweep. (256 was the round-2 optimum when the XLA
        # slab-write thunks still serialized the cycle.)
        tile_c = 128
    if block_size is not None:
        # authoritative like the chunk height (perf sweeps probe above
        # the auto choice too)
        tile_c = max(128, _round_up(min(block_size[0], cols), 128))

    return TilePlan(x_tile_rows=x_tile, y_chunk_rows=chunk, y_tile_cols=tile_c)


def cycle_chunk_rows(rows: int, cols: int, itemsize: int,
                     block_size: Optional[Tuple[int, int]] = None) -> int:
    """Row-chunk height for the fully-fused cycle kernel: full-width
    (chunk+8, cols) buffers, ~25 live temporaries, within the VMEM budget.
    Like the per-sweep planner, short chunks pipeline best (2048² sweep:
    104 -> 3.21, 56 -> 3.14, 160 -> 3.07, 152 -> 2.96 Gcells/s), so scan
    the [64, 136] band minimizing ragged-tail padding + half-weighted
    halo fraction 8/(c+8), clamped by the VMEM bound for wide arrays.
    `block_size[1]` bounds the chunk (cache-block option parity,
    `src/parameters.jl:497-516`)."""
    budget = VMEM_BUDGET // 3  # leave room for Mosaic's i/o double buffers
    per_row = cols * LIVE_BUFFERS * itemsize
    vmem_bound = max(8, ((budget // per_row - 8) // 8) * 8)
    if rows <= 264:
        # The VMEM bound applies to short-row grids too: a short WIDE
        # array (e.g. 264 x 2056 f32 ~ 54 MB of live temporaries at full
        # height) would otherwise exhaust the scoped-VMEM limit.
        chunk = min(_round_up(rows, 8), vmem_bound)
    else:
        hi = min(136, vmem_bound, _round_up(rows, 8))
        if hi >= 64:
            def _cost(c):
                pad = (-(-rows // c) * c - rows) / rows
                return pad + 0.5 * 8.0 / (c + 8)
            chunk = min(range(64, hi + 1, 8), key=_cost)
        else:
            chunk = hi
    if block_size is not None:
        chunk = min(chunk, max(8, _round_up(min(block_size[1], rows), 8)))
    return chunk


def memory_required(n_local: Tuple[int, int], nghost: int, itemsize: int,
                    n_fields: int = 11, comm_vars: int = 7,
                    carry_fields: int = 5) -> dict:
    """Itemized byte accounting per device, including the solver loop's
    steady-state HBM transients (analog of
    `src/blocking/block_grid.jl:598-709`).

    The peak lives inside a fused cycle: all `n_fields` state arrays are
    resident AND XLA keeps `carry_fields` extra full buffers live (the p
    output stream plus the while-loop's double-buffered carry slots —
    measured, not derived: the in-place kernels alias rho/u/v/E, yet the
    high-water mark still behaves as (n_fields + carry_fields) arrays).
    Verified against the dev chip: 8192^2 f32 -> 4.3 GB (fits), 12288^2
    f32 -> 9.7 GB (RESOURCE_EXHAUSTED on its HBM, re-checked after the
    in-place kernels landed), which round 1's state-only estimate
    mispredicted; 10240^2 f32 -> 6.8 GB (fits, measured)."""
    nx, ny = n_local
    rows, cols = ny + 2 * nghost, nx + 2 * nghost
    field = rows * cols * itemsize
    state = n_fields * field
    transients = carry_fields * field
    # halo slabs: stacked (comm_vars, ...) nghost-deep bands on four sides
    halo = 2 * (rows + cols) * nghost * comm_vars * itemsize
    return {
        "per_device_field_bytes": field,
        "per_device_state_bytes": state,
        "per_device_transient_bytes": transients,
        "per_device_halo_bytes": halo,
        "per_device_total_bytes": state + transients + halo,
        # LEAN fused tier (core/solver.py make_init_fused /
        # make_jit_loop_lean): only the 5 carry fields cross the loop
        # program's boundary; the high-water model is carry-in (held by
        # the caller) + the loop's double-buffered carry slots = 2x5
        # arrays plus the halo slabs. Validated on chip at 16384^2 f32
        # (BENCH_CONFIGS.md row 5): fits the 16 GB device where the
        # 11-field path cannot.
        "per_device_fused_total_bytes": 2 * carry_fields * field + halo,
    }



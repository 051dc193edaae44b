"""On-hardware perf attribution for the fused cycle kernel.

PROVENANCE / CALIBRATION CAVEATS (round-2 era probe — kept verbatim so
its numbers in BENCH_NOTES stay reproducible; do NOT read `base` as the
CURRENT production kernel):
- `base` uses pltpu.roll; production switched to static jnp.roll
  (~40% of the lane-axis sweep — BENCH_NOTES), has input_output_aliases
  and in-kernel BC fills. The roll share this probe reports is
  therefore ~2x the production share.
- The 'GB/s effective' lines use 40 B/cell (36 for no_p); the probe's
  own printed traffic accounting is 36 (32) B/cell — the GB/s lines
  overstate proximity to the roof by ~11%.

Times variants of the fused single-cycle kernel to attribute the gap to the
chip ceilings (docs/architecture.md: ~140 GB/s Pallas DMA, ~377 GB/s XLA
streaming):

  base     — the round-2 fused_cycle kernel shape (see caveats above)
  no_p     — p output stream removed            (write-traffic share)
  no_dt    — dt-min accumulation removed        (reduction share)
  no_p_dt  — both removed                       (pure sweep math)
  stream   — same block structure, trivial math (DMA ceiling for this shape)
  chunk=K  — chunk-height sensitivity (halo recompute overhead is 8/K)

Usage: python scripts/perf_probe.py [N ...]   (default 4096 8192)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from armon_tpu import ArmonParameters
from armon_tpu.ops.pallas.sweep import _sweep_math, _make_div, _im, _dt_tile_min
from armon_tpu.parallel.blocking import VMEM_BUDGET, cycle_chunk_rows


def variant_kernel(cfg, chunk, write_p, do_dtmin, stream_only, no_roll,
                   dtx_ref, dty_ref,
                   rho_c, rho_a, rho_b, u_c, u_a, u_b,
                   v_c, v_a, v_b, E_c, E_a, E_b,
                   *outs):
    T = np.dtype(cfg.dtype).type
    dtx = dtx_ref[0, 0]
    dty = dty_ref[0, 0]
    ci = pl.program_id(0)
    H = 4
    halo_blk = 8

    if stream_only:
        # touch every input block, write every output: pure traffic probe
        s = rho_c[:] + u_c[:] + v_c[:] + E_c[:] \
            + rho_a[:1] + rho_b[:1] + u_a[:1] + u_b[:1] \
            + v_a[:1] + v_b[:1] + E_a[:1] + E_b[:1]
        for o in outs[:-1]:
            o[:] = s
        outs[-1][:] = jnp.zeros((8, 128), cfg.dtype)
        return

    def halo_cat(cur, above, below):
        return jnp.concatenate([above[halo_blk - H:, :], cur, below[:H, :]], 0)

    rho = halo_cat(rho_c[:], rho_a[:], rho_b[:])
    u = halo_cat(u_c[:], u_a[:], u_b[:])
    v = halo_cat(v_c[:], v_a[:], v_b[:])
    E = halo_cat(E_c[:], E_a[:], E_b[:])

    if no_roll:
        # WRONG numerics — measures the roll (shift) share of VPU time by
        # replacing every shifted read with an unshifted one.
        def shx(a, k):
            return a * (1 + 1e-7 * k) if k else a

        def shy(a, k):
            return a * (1 + 1e-7 * k) if k else a
    else:
        def shx(a, k):
            return pltpu.roll(a, np.int32((-k) % a.shape[1]), 1) if k else a

        def shy(a, k):
            return pltpu.roll(a, np.int32((-k) % a.shape[0]), 0) if k else a

    div = _make_div(cfg, False)
    rho1, u1, v1, E1, _, _ = _sweep_math(cfg, shx, dtx, T(cfg.dx),
                                         rho, u, v, E, div, slope_shift=False)
    rho2, v2, u2, E2, p_st, c_st = _sweep_math(cfg, shy, dty, T(cfg.dy),
                                               rho1, v1, u1, E1, div,
                                               slope_shift=True)

    sl = slice(H, H + chunk)
    vals = [rho2[sl], u2[sl], v2[sl], E2[sl]]
    if write_p:
        vals.append(p_st[sl])
    k = 0
    for val in vals:
        outs[k][:] = val
        k += 1

    if do_dtmin:
        @pl.when(ci == 0)
        def _():
            outs[-1][:] = jnp.full((8, 128), np.finfo(cfg.dtype).max, cfg.dtype)
        m = _dt_tile_min(cfg, T, u2[sl], v2[sl], c_st[sl], ci * chunk, 0)
        outs[-1][:] = jnp.minimum(outs[-1][:], m)
    else:
        @pl.when(ci == 0)
        def _():
            outs[-1][:] = jnp.zeros((8, 128), cfg.dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "chunk", "write_p",
                                             "do_dtmin", "stream_only",
                                             "no_roll"))
def run_variant(cfg, chunk, write_p, do_dtmin, stream_only, no_roll,
                rho, u, v, E, dtx, dty):
    rows, cols = rho.shape
    dtx = jnp.asarray(dtx, cfg.dtype).reshape(1, 1)
    dty = jnp.asarray(dty, cfg.dtype).reshape(1, 1)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET)
    halo_blk = 8
    nci = pl.cdiv(rows, chunk)

    cur = pl.BlockSpec((chunk, cols), lambda i: _im(i, 0),
                       memory_space=pltpu.VMEM)
    blocks_tot = max(pl.cdiv(rows, halo_blk), 1)

    def above_map(i):
        return _im(jnp.maximum(i * (chunk // halo_blk) - 1, 0), 0)

    def below_map(i):
        return _im(jnp.minimum((i + 1) * (chunk // halo_blk), blocks_tot - 1), 0)

    above = pl.BlockSpec((halo_blk, cols), above_map, memory_space=pltpu.VMEM)
    below = pl.BlockSpec((halo_blk, cols), below_map, memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda i: _im(0, 0), memory_space=pltpu.SMEM)

    in_specs = [smem, smem]
    args = [dtx, dty]
    for a in (rho, u, v, E):
        in_specs += [cur, above, below]
        args += [a, a, a]

    n_out = (5 if write_p else 4) if not stream_only else 5
    kernel = functools.partial(variant_kernel, cfg, chunk, write_p, do_dtmin,
                               stream_only, no_roll)
    out = pl.pallas_call(
        kernel,
        grid=(nci,),
        in_specs=in_specs,
        out_specs=[cur] * n_out + [pl.BlockSpec((8, 128), lambda i: _im(0, 0),
                                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((rows, cols), cfg.dtype)] * n_out + [
            jax.ShapeDtypeStruct((8, 128), cfg.dtype)],
        compiler_params=cparams,
        interpret=False,
    )(*args)
    return out


def time_variant(cfg, fields, n, label, reps=30, **kw):
    rho, u, v, E = fields
    dt = cfg.dtype.type(1e-5)
    out = run_variant(cfg, kw.pop("chunk"), kw.pop("write_p", True),
                      kw.pop("do_dtmin", True), kw.pop("stream_only", False),
                      kw.pop("no_roll", False), rho, u, v, E, dt, dt)
    _ = float(np.asarray(out[-1][0, 0]))  # sync (block_until_ready is a no-op on axon)
    best = float("inf")
    for _r in range(3):
        t0 = time.perf_counter()
        for _i in range(reps):
            out = run_variant_cached(cfg, label, rho, u, v, E, dt)
        _ = float(np.asarray(out[-1][0, 0]))
        best = min(best, (time.perf_counter() - t0) / reps)
    cells = n * n
    gbs = None
    print(f"  {label:24s} {cells / best / 1e9:8.3f} Gcells/s   {best * 1e3:8.3f} ms")
    return cells / best


_VARIANTS = {}


def run_variant_cached(cfg, label, rho, u, v, E, dt):
    kw = _VARIANTS[label]
    return run_variant(cfg, kw.get("chunk"), kw.get("write_p", True),
                       kw.get("do_dtmin", True), kw.get("stream_only", False),
                       kw.get("no_roll", False), rho, u, v, E, dt, dt)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [4096, 8192]
    for n in sizes:
        params = ArmonParameters(test="Sod", N=(n, n), data_type=np.float32,
                                 scheme="GAD", projection="euler_2nd",
                                 riemann_limiter="minmod", nghost=4,
                                 maxcycle=1, silent=5, measure_time=False)
        cfg = params.config
        cfg_god = ArmonParameters(
            test="Sod", N=(n, n), data_type=np.float32, scheme="Godunov",
            projection="euler", nghost=4, maxcycle=1, silent=5,
            measure_time=False).config
        rows, cols = cfg.local_shape
        chunk0 = cycle_chunk_rows(rows, cols, 4)
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 4)
        rho = jax.random.uniform(ks[0], (rows, cols), jnp.float32, 0.5, 2.0)
        u = jax.random.uniform(ks[1], (rows, cols), jnp.float32, -0.1, 0.1)
        v = jax.random.uniform(ks[2], (rows, cols), jnp.float32, -0.1, 0.1)
        E = jax.random.uniform(ks[3], (rows, cols), jnp.float32, 1.0, 3.0)
        fields = (rho, u, v, E)

        print(f"\nN={n}  rows={rows} cols={cols}  default chunk={chunk0}")
        bpc = (4 + 5) * 4
        print(f"  (traffic {bpc} B/cell/cycle with p; {bpc - 4} without)")

        global _VARIANTS
        _VARIANTS = {
            "base": dict(chunk=chunk0),
            "no_roll": dict(chunk=chunk0, no_roll=True),
            "no_p": dict(chunk=chunk0, write_p=False),
            "no_dt": dict(chunk=chunk0, do_dtmin=False),
            "stream": dict(chunk=chunk0, stream_only=True),
        }

        for label in _VARIANTS:
            try:
                v_ = time_variant(cfg, fields, n, label,
                                  **dict(_VARIANTS[label]))
                gbs = v_ * ((36 if "no_p" in label else 40) if not
                            label.startswith("stream") else 40) / 1e9
                print(f"  {'':24s} ~{gbs:6.1f} GB/s effective")
            except Exception as e:
                print(f"  {label:24s} FAILED: {type(e).__name__}: {str(e)[:200]}")

        # 1st-order scheme (Godunov + euler): the GAD/euler_2nd extra cost
        _VARIANTS = {"first_order": dict(chunk=chunk0)}
        try:
            time_variant(cfg_god, fields, n, "first_order",
                         **dict(_VARIANTS["first_order"]))
        except Exception as e:
            print(f"  first_order FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()

"""Calibrated I/O-shape roofline for the fused sweep (VERDICT-r3 #2b).

The old chain-rate model (scripts/roofline.py) over-predicts the VMEM
floor 2-3x. This probe builds the floor the honest way: Pallas kernels
with the production sweep's EXACT I/O shape — read 4 (8200,8200) f32
arrays, write 5 (4 aliased in-place + the p stream), same row-chunk grid —
and graded amounts of math:

  io      — pure copy (+1.0 to defeat aliasing elision): the achievable
            HBM floor for this access pattern, not a bandwidth brochure;
  light   — ~25 elementwise slots/cell;
  half    — ~half the sweep's arithmetic (one Godunov + EOS, no advection);
  sweep   — the real X-sweep math (chain_plain from ff_probe).

The measured ladder separates "traffic not hidden" from "compute beyond
traffic": if io ~= the X sweep's 5.5 ms/sweep, the kernel is at its own
floor; the gap between io and sweep is the VPU time that DMA cannot hide.

Run: python scripts/roofline_io.py            (N=8192, 30 reps)
     ROOF_N=4096 ROOF_REPS=60 python ...
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from jax.experimental import pallas as pl  # noqa: E402

from scripts.ff_probe import chain_plain  # noqa: E402


def _sh(a, k):
    return a if k == 0 else jnp.roll(a, -k, axis=-1)


def make_kernel(n, chunk, level):
    def kernel(r, u, v, E, orr, ou, ov, oE, op):
        rr, uu, vv, EE = r[...], u[...], v[...], E[...]
        if level == "io":
            r2, u2, v2, E2, p2 = rr + 1.0, uu + 1.0, vv + 1.0, EE + 1.0, \
                rr - 1.0
        elif level == "light":
            # ~25 slots: a taste of elementwise math, no shifts
            e = EE - 0.5 * (uu * uu + vv * vv)
            p = 0.4 * rr * e
            c = jnp.sqrt(1.4 * p * rr)
            q = p * c + e
            r2 = rr + 1e-7 * q
            u2 = uu + 1e-7 * (p - c)
            v2 = vv + 1e-7 * (p + c)
            E2 = EE + 1e-7 * (q - p)
            p2 = p
        elif level == "half":
            # EOS + one Godunov solve + Lagrangian update (no advection)
            e = EE - 0.5 * (uu * uu + vv * vv)
            p = 0.4 * rr * e
            c = jnp.sqrt(1.4 * p * rr)
            rc = rr * c
            rc_l, u_m, p_m = _sh(rc, -1), _sh(uu, -1), _sh(p, -1)
            rc_sum = rc_l + rc
            us = (rc_l * u_m + rc * uu + (p_m - p)) / rc_sum
            ps = (rc * p_m + rc_l * p + rc_l * rc * (u_m - uu)) / rc_sum
            us_p, ps_p = _sh(us, 1), _sh(ps, 1)
            dx = np.float32(1.0 / 8192.0)
            dt = np.float32(1e-4)
            dm = rr * dx
            dX = dx + dt * (us_p - us)
            r2 = dm / dX
            dt_dm = dt / dm
            u2 = uu + dt_dm * (ps - ps_p)
            v2 = vv
            E2 = EE + dt_dm * (ps * us - ps_p * us_p)
            p2 = p
        else:  # "sweep": the full X-sweep chain
            r2, u2, v2, E2 = chain_plain(rr, uu, vv, EE, _sh, np.float32)
            p2 = 0.4 * r2 * (E2 - 0.5 * (u2 * u2 + v2 * v2))
        orr[...], ou[...], ov[...], oE[...], op[...] = r2, u2, v2, E2, p2

    spec = pl.BlockSpec((chunk, n), lambda i: (i, 0))
    out_shape = [jax.ShapeDtypeStruct((n, n), np.float32)] * 5

    from jax.experimental.pallas import tpu as pltpu
    call = pl.pallas_call(
        kernel, grid=(n // chunk,),
        in_specs=[spec] * 4, out_specs=[spec] * 5,
        out_shape=out_shape,
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
        # the production kernels' VMEM budget (parallel/blocking.py) —
        # without it Mosaic under-buffers the grid pipeline and the DMA
        # serializes (measured: 6 GB/s instead of ~450)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))

    # K launches per dispatch: the ~26 ms dispatch+read RTT would dominate
    # a single-launch timing at any size.
    @jax.jit
    def steps(args, k):
        def body(_, a):
            return call(*a)[:4]
        return jax.lax.fori_loop(0, k, body, args)

    return steps


def main():
    n = int(os.environ.get("ROOF_N", "8192"))
    chunk = int(os.environ.get("ROOF_CHUNK", "256"))
    reps = int(os.environ.get("ROOF_REPS", "30"))
    print(f"backend {jax.devices()[0].platform}, N={n}², chunk {chunk}, "
          f"{reps} reps; traffic = 9 x {n*n*4/1e9:.3f} GB per launch")
    rng = np.random.default_rng(3)
    arrs = [jnp.asarray(1.0 + 0.1 * rng.random((n, n)), jnp.float32)
            for _ in range(4)]
    for level in ("io", "light", "half", "sweep"):
        steps = make_kernel(n, chunk, level)
        outs = steps(tuple(arrs), reps)
        _ = np.asarray(jax.device_get(outs[0]))[:1]  # sync (axon) + compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = steps(tuple(arrs), reps)
            _ = np.asarray(jax.device_get(outs[0]))[:1]
            best = min(best, (time.perf_counter() - t0) / reps)
        gbps = 9 * n * n * 4 / best / 1e9
        print(f"{level:6s} {best*1e3:9.3f} ms/launch  {gbps:7.1f} GB/s eff  "
              f"{best/n/n*1e9:.4f} ns/cell")


if __name__ == "__main__":
    main()

"""Section-level perf attribution for the per-sweep production kernels.

Times the in-place per-sweep kernel (`fused_sweep_ip`, the single-device
path) under scheme variants whose dead sections Mosaic DCEs away, isolating
the cost of each part of the sweep math, separately for the X (lane-shift)
and Y (sublane-shift) kernels:

  base        GAD + minmod + euler_2nd   (the bench config)
  no_limiter  GAD + no_limiter + euler_2nd  -> limiter-ratio share
  euler1      GAD + minmod + euler       -> 2nd-order projection share
  godunov2    Godunov + euler_2nd        -> GAD blend share
  first       Godunov + euler            -> whole 2nd-order surcharge
  no_dt       base, emit_dt=False        -> CFL reduction + c share
  no_p        base, emit_p=False         -> p output-stream share

Each timing runs `reps` sweeps inside one jitted fori_loop (the carry
aliases in place, so there are no defensive copies — see
scripts/probe_alias.py for why top-level in-place calls mis-time).

Usage: python scripts/probe_sections.py [N] [reps]   (default 8192 30)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from armon_tpu import ArmonParameters
from armon_tpu.utils.enums import Axis


def make_cfg(n, riemann, limiter, projection):
    return ArmonParameters(
        test="Sod", N=(n, n), data_type=np.float32, scheme=riemann,
        projection=projection, riemann_limiter=limiter, nghost=4,
        maxcycle=1, silent=5, measure_time=False).config


@functools.partial(jax.jit, static_argnames=("cfg", "axis", "reps",
                                             "emit_p", "emit_dt", "variant"))
def sweep_loop(cfg, axis, reps, emit_p, emit_dt, variant, rho, u, v, E, dt):
    from armon_tpu.ops.pallas.sweep import fused_sweep_ip

    def body(_, carry):
        rho, u, v, E, acc = carry
        rho, u, v, E, _p, lm = fused_sweep_ip(
            cfg, axis, rho, u, v, E, dt,
            emit_p=emit_p, emit_dt=emit_dt, interpret=False,
            variant=variant)
        acc = acc + (lm if lm is not None else rho[8, 8])
        return rho, u, v, E, acc

    z = jnp.zeros((), cfg.dtype)
    return lax.fori_loop(0, reps, body, (rho, u, v, E, z))


def time_loop(cfg, axis, fields, n, reps, label, emit_p=True, emit_dt=True,
              variant=""):
    dt = cfg.dtype.type(1e-5)
    out = sweep_loop(cfg, axis, reps, emit_p, emit_dt, variant, *fields, dt)
    _ = float(np.asarray(out[-1]))  # sync (block_until_ready no-op on axon)
    best = float("inf")
    for _r in range(3):
        t0 = time.perf_counter()
        out = sweep_loop(cfg, axis, reps, emit_p, emit_dt, variant, *fields, dt)
        _ = float(np.asarray(out[-1]))
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"  {label:14s} {axis.name}: {n * n / best / 1e9:7.3f} Gcells/s/sweep"
          f"   {best * 1e3:7.3f} ms", flush=True)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    only = sys.argv[3] if len(sys.argv) > 3 else None  # substring filter

    variants = [
        ("base", ("GAD", "minmod", "euler_2nd"), {}),
        ("shareB (1-chain r_m/r_p)", ("GAD", "minmod", "euler_2nd"),
         dict(variant="shareB")),
        ("no_limiter", ("GAD", "no_limiter", "euler_2nd"), {}),
        ("euler1", ("GAD", "minmod", "euler"), {}),
        ("godunov2", ("Godunov", "minmod", "euler_2nd"), {}),
        ("first", ("Godunov", "minmod", "euler"), {}),
        ("no_dt", ("GAD", "minmod", "euler_2nd"), dict(emit_dt=False)),
        ("no_p", ("GAD", "minmod", "euler_2nd"), dict(emit_p=False)),
    ]

    cfg0 = make_cfg(n, "GAD", "minmod", "euler_2nd")
    rows, cols = cfg0.local_shape
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    fields = (
        jax.random.uniform(ks[0], (rows, cols), jnp.float32, 0.5, 2.0),
        jax.random.uniform(ks[1], (rows, cols), jnp.float32, -0.1, 0.1),
        jax.random.uniform(ks[2], (rows, cols), jnp.float32, -0.1, 0.1),
        jax.random.uniform(ks[3], (rows, cols), jnp.float32, 1.0, 3.0),
    )
    print(f"N={n} rows={rows} cols={cols} reps={reps}")

    base = {}
    for label, (riemann, limiter, projection), kw in variants:
        if only and label != "base" and only not in label:
            continue
        cfg = make_cfg(n, riemann, limiter, projection)
        for axis in (Axis.X, Axis.Y):
            try:
                t = time_loop(cfg, axis, fields, n, reps, label, **kw)
                if label == "base":
                    base[axis] = t
                elif axis in base:
                    d = base[axis] - t
                    print(f"  {'':14s} -> section share "
                          f"{100 * d / base[axis]:5.1f}%  ({d * 1e3:6.3f} ms)")
            except Exception as e:
                print(f"  {label} {axis.name} FAILED: "
                      f"{type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()

"""Compute-roofline for the fused sweep kernels: exact op census x measured
per-op-class VPU rates -> the arithmetic floor of one sweep on this chip.

VERDICT r2 asks for a committed proof that the ~65%-of-streaming operating
point is the scheme's compute floor (or a map of what overhead remains):
"a measured ops/cell count x the chip's ALU rate ... itemized against the
observed, with the unexplained residual <5%".

CALIBRATION CAVEAT: the roll-rate microbench rolls a loop-INVARIANT
input with 3 distinct shift amounts, so compiler CSE can collapse the
chain — treat its per-roll cost as a lower bound (the production roll
share was measured by kernel A/Bs, not this chain; see BENCH_NOTES).

RETIRED as the floor model (round 4): the calibrated model now lives in
BENCH_NOTES "calibrated pipeline-floor model" — measured ON the
production kernels via math-stripping variants
(ARMON_SWEEP_VARIANT=iofloor/halfmath): pipeline floor 7.81 ms/cycle at
8192² (8.59e9 cells/s, 618 GB/s effective) + ~24.7 µs per materialized
op per cycle (2.7e12 effective slots/s), validated by the stiff-EOS
premiums. The census part (A) below still feeds that model's op counts;
the chain-rate microbench (B) OVERESTIMATES the compute term ~2-3x
(loop-invariant chains are VMEM-touch-bound at ~0.8 Tops/s while the
real DAG runs ~2.7 Tops/s in vregs) — kept only to document that gap.

Two parts:

A. **Op census** (any backend): trace `_sweep_math` for the bench scheme
   (GAD + minmod + euler_2nd, f32) through `jax.make_jaxpr` and count
   primitives. Shifts (jnp.roll of a trace-constant) appear as
   concatenate-of-slices pairs; everything else is elementwise. The census
   is exact for the exact-IEEE build; the fast-math build replaces each
   division site with (approx reciprocal [+ 1 Newton step] + multiply),
   itemized separately below.

B. **Per-class rate microbench** (TPU): Pallas kernels running W-deep
   ILP-friendly chains of one op class over bench-shaped f32 tiles,
   compute-bound by construction (streaming share < 2%). Classes:
   add, mul, mul+add alternating (FMA-fusable), select(cmp+where),
   min/max, sqrt chain, exact-div chain, approx-reciprocal chain,
   lane roll, sublane roll.

Usage:
  python scripts/roofline.py census           # part A (CPU ok)
  python scripts/roofline.py rates [N]        # part B (run on the TPU)
  python scripts/roofline.py floor [N]        # A + B + the floor table
"""

import functools
import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


# ------------------------------------------------------------------ part A

def census(n=256):
    """Primitive census of one sweep's math (the X form; the Y form is the
    same graph with sublane shifts)."""
    from armon_tpu import ArmonParameters
    from armon_tpu.ops.pallas.sweep import _sweep_math, _EXACT_DIV

    cfg = ArmonParameters(test="Sod", N=(n, n), data_type=np.float32,
                          scheme="GAD", projection="euler_2nd",
                          riemann_limiter="minmod", nghost=4, maxcycle=1,
                          silent=5, measure_time=False).config
    T = np.float32
    rolls = Counter()

    def sh(a, k):
        rolls[k] += 1
        return jnp.roll(a, -k, 0) if k else a

    def f(rho, u, v, E):
        return _sweep_math(cfg, sh, T(1e-5), T(cfg.dx), rho, u, v, E,
                           div=_EXACT_DIV, need_c=True, slope_shift=True)

    shape = jax.ShapeDtypeStruct((n, 128), jnp.float32)
    jaxpr = jax.make_jaxpr(f)(shape, shape, shape, shape)

    prims = Counter()

    def walk(jx):
        for eqn in jx.eqns:
            if eqn.primitive.name in ("jit", "pjit", "closed_call"):
                walk(eqn.params["jaxpr"].jaxpr)
            else:
                prims[eqn.primitive.name] += 1

    walk(jaxpr.jaxpr)
    return prims, rolls


ELEMENTWISE = {"add", "sub", "mul", "max", "min", "select_n", "sign", "abs",
               "neg", "gt", "lt", "ge", "le", "integer_pow", "and", "or"}


def report_census():
    prims, rolls = census()
    print("primitive census of one sweep (_sweep_math, GAD+minmod+euler_2nd):")
    for name, cnt in sorted(prims.items(), key=lambda kv: -kv[1]):
        print(f"  {name:22s} {cnt}")
    n_roll = sum(v for k, v in rolls.items() if k)
    print(f"  nonzero shifts (jnp.roll): {n_roll}  (by offset: "
          f"{dict(sorted(rolls.items()))})")
    ew = sum(c for p, c in prims.items() if p in ELEMENTWISE)
    # integer_pow(2) is one multiply; x**3 is two — treat each site as ~1.3
    print(f"\n  elementwise ops: {ew}   div: {prims.get('div', 0)}   "
          f"sqrt: {prims.get('sqrt', 0)}   rolls: {n_roll}")
    return prims, rolls


# ------------------------------------------------------------------ part B

ILP = 16  # independent chains — enough to cover VPU op latency


def _rate_kernel(body_fn, W, x_ref, o_ref):
    x = x_ref[:]
    accs = [x * (1.0 + 0.25 * j) for j in range(ILP)]
    for i in range(W // ILP):
        for j in range(ILP):
            accs[j] = body_fn(accs[j], x, i * ILP + j)
    acc = accs[0]
    for j in range(1, ILP):
        acc = acc + accs[j]
    o_ref[:] = acc


def measure_class(name, body_fn, W, rows=8200, cols=8192, tile_r=16, reps=8,
                  base=None):
    """Time a W-deep chain; returns seconds per element per op."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_rate_kernel, body_fn, W)

    @jax.jit
    def run(x):
        spec = pl.BlockSpec((tile_r, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(rows // tile_r,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x)

    x = jnp.full((rows, cols), 1.0001, jnp.float32)
    out = run(x)
    _ = float(out[0, 0])
    best = float("inf")
    for _r in range(3):
        t0 = time.perf_counter()
        for _i in range(reps):
            out = run(x)
        _ = float(out[0, 0])
        best = min(best, (time.perf_counter() - t0) / reps)
    per_op = best / (rows * cols) / W
    eff = best if base is None else best - base
    per_op_net = eff / (rows * cols) / W
    print(f"  {name:18s} {best*1e3:8.3f} ms for W={W:3d} -> "
          f"{per_op_net*1e12:6.3f} ps/elem/op "
          f"({1/per_op_net/1e12:6.2f} Tops/s)", flush=True)
    return best, per_op_net


def report_rates(n=8192):
    print(f"per-class VPU rates ({n}x{n} f32 tiles, {ILP}-way ILP chains) on",
          jax.devices()[0])
    rows, cols = n, n

    res = {}
    # pure chains: acc = op(acc, ...) with no fusable partner
    base_t, res["add"] = measure_class(
        "add", lambda a, x, i: a + x, 128, rows, cols)
    _, res["mul"] = measure_class(
        "mul", lambda a, x, i: a * 1.0000001, 128, rows, cols)
    _, res["fma"] = measure_class(
        "mul+add (fma)", lambda a, x, i: a * 1.0000001 + x, 128, rows, cols)
    _, res["minmax"] = measure_class(
        "min", lambda a, x, i: jnp.minimum(a, x * (1.0 + i)), 128, rows, cols)
    _, res["select"] = measure_class(
        "cmp+select", lambda a, x, i: jnp.where(a > x * (0.5 + 0.01 * i),
                                                a * 0.9999, a), 64,
        rows, cols)
    _, res["abs_sign"] = measure_class(
        "abs+add", lambda a, x, i: jnp.abs(a) + x, 128, rows, cols)
    _, res["sqrt"] = measure_class(
        "sqrt", lambda a, x, i: jnp.sqrt(a) + x, 32, rows, cols)
    _, res["div"] = measure_class(
        "exact div", lambda a, x, i: x / a, 32, rows, cols)

    def recip_chain(a, x, i):
        from jax.experimental import pallas as pl
        return pl.reciprocal(a, approx=True) + x

    _, res["recip"] = measure_class(
        "approx recip+add", recip_chain, 32, rows, cols)

    # rolls: chain add+roll, subtract the add-chain baseline
    for axis, label in ((1, "lane roll"), (0, "sublane roll")):
        def roll_chain(a, x, i, axis=axis):
            return a + jnp.roll(x, 1 + (i % 3), axis)

        t, _ = measure_class(f"{label}+add", roll_chain, 64, rows, cols)
        add_t, _ = measure_class("   (add base)", lambda a, x, i: a + x,
                                 64, rows, cols)
        net = (t - add_t) / (rows * cols) / 64
        print(f"  {label:18s} net {net*1e12:6.3f} ps/elem/op "
              f"({1/max(net,1e-18)/1e12:6.2f} Tops/s)")
        res[label.replace(" ", "_")] = net
    return res


def report_floor(n=8192):
    prims, rolls = report_census()
    print()
    rates = report_rates(n)
    print()

    n_roll = sum(v for k, v in rolls.items() if k)
    ew = sum(c for p, c in prims.items() if p in ELEMENTWISE)
    div = prims.get("div", 0)
    sqrt = prims.get("sqrt", 0)

    cells = (n + 8) * (n + 8)
    # exact-IEEE weights
    t_ew = ew * rates["fma"]
    t_div_exact = div * rates["div"]
    t_div_fast = div * (rates["recip"] + 2 * rates["fma"])  # recip+NR(2 fma)... report both
    t_sqrt = sqrt * rates["sqrt"]
    t_roll_lane = n_roll * rates["lane_roll"]
    t_roll_sub = n_roll * rates["sublane_roll"]

    for label, t_div, t_roll in (
            ("X sweep (fast-math, lane shifts)", t_div_fast, t_roll_lane),
            ("Y sweep (fast-math, sublane shifts)", t_div_fast, t_roll_sub)):
        tot = (t_ew + t_div + t_sqrt + t_roll) * cells
        print(f"{label}: floor = {tot*1e3:.2f} ms "
              f"(elementwise {t_ew*cells*1e3:.2f} + div {t_div*cells*1e3:.2f}"
              f" + sqrt {t_sqrt*cells*1e3:.2f} + rolls {t_roll*cells*1e3:.2f})")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "census"
    nn = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    if mode == "census":
        report_census()
    elif mode == "rates":
        report_rates(nn)
    else:
        report_floor(nn)

"""Probe: Mosaic lowering strategies for an in-kernel X-axis (lane-axis)
mirror ghost fill.  `lax.rev` is NOT lowered by Mosaic (measured:
NotImplementedError "rev"), so the candidate is: static-slice the first /
last 128-lane tile, build the mirrored ghost columns from g static
`jnp.roll`s + iota selects, and store back with a static-slice write.
Checks bitwise correctness vs the host mirror and times the kernel against
an identity-copy kernel to bound the added in-kernel cost."""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mirror_tile(tile, g, left, factor=1.0):
    """Mirror-fill the g ghost lanes of a 128-wide tile.
    left: ghost lanes are 0..g-1 mirroring lanes 2g-1..g.
    right: ghost lanes are 128-g..128-1 mirroring 128-2g..128-g-1 (reversed).
    """
    W = tile.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, tile.shape, tile.ndim - 1)
    out = tile
    for i in range(g):
        if left:
            # out[:, i] = tile[:, 2g-1-i]
            src = jnp.roll(tile, i - (2 * g - 1 - i), axis=-1)
            out = jnp.where(lane == i, src * factor, out)
        else:
            # out[:, W-1-i] = tile[:, W-2g+i]
            src = jnp.roll(tile, (W - 1 - i) - (W - 2 * g + i), axis=-1)
            out = jnp.where(lane == W - 1 - i, src * factor, out)
    return out


def kernel_mirror(g, W, x_ref, o_ref):
    a = x_ref[:]
    lt = _mirror_tile(a[:, :128], g, left=True)
    rt = _mirror_tile(a[:, W - 128:], g, left=False)
    a = jnp.concatenate([lt, a[:, 128:W - 128], rt], axis=1)
    o_ref[:] = a


def kernel_copy(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def main():
    W, R, g = 1024, 512, 4
    x = jnp.asarray(np.random.rand(R, W).astype(np.float32))
    f = jax.jit(pl.pallas_call(
        functools.partial(kernel_mirror, g, W),
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
    ))
    y = np.asarray(f(x))
    xh = np.asarray(x)
    ref = xh.copy()
    ref[:, :g] = xh[:, g:2 * g][:, ::-1]
    ref[:, W - g:] = xh[:, W - 2 * g:W - g][:, ::-1]
    ok = (y == ref).all()
    print("slice+roll mirror fill:", "OK bitwise" if ok else "MISMATCH")
    if not ok:
        bad = np.argwhere(y != ref)
        print("first mismatches:", bad[:5])
        sys.exit(1)

    # cost vs a plain copy kernel
    fc = jax.jit(pl.pallas_call(
        kernel_copy, out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32)))
    for name, fn in (("copy", fc), ("mirror", f)):
        fn(x)  # warm
        t0 = time.perf_counter()
        n = 200
        for _ in range(n):
            r = fn(x)
        float(r[0, 0])  # host read = sync on axon
        dt = (time.perf_counter() - t0) / n * 1e6
        print(f"{name}: {dt:.1f} us/call (RTT-dominated; delta is the signal)")


if __name__ == "__main__":
    main()

"""Full-loop chunk/tile sweep at the headline size via the `block_size`
knob (part of the jit key, so each point is a real recompile — the only
probe methodology that the inner-jit trace cache cannot defeat, see
CLAUDE.md).

Usage: python scripts/probe_chunk.py [N] [cycles] [chunk ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from armon_tpu import ArmonParameters
from armon_tpu.core.solver import make_init, make_jit_loop


def run(n, cycles, block_size):
    p = ArmonParameters(
        test="Sod", N=(n, n), data_type=np.float32, scheme="GAD",
        projection="euler_2nd", riemann_limiter="minmod", nghost=4,
        maxcycle=cycles, maxtime=1e30, silent=5, measure_time=False,
        kernel_tier="pallas", block_size=block_size)
    state = make_init(p)()
    loop = make_jit_loop(p)
    out = loop(state)
    _ = float(np.asarray(out[1]))
    best = float("inf")
    for _r in range(3):
        t0 = time.perf_counter()
        out = loop(state)
        _ = float(np.asarray(out[1]))
        best = min(best, time.perf_counter() - t0)
    ran = int(out[2])
    return n * n * ran / best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    chunks = [int(a) for a in sys.argv[3:]] or [None, 152, 176, 200, 232, 256]

    for c in chunks:
        bs = None if c is None else (4096, c)
        v = run(n, cycles, bs)
        print(f"  chunk={'auto' if c is None else c:>4}: {v/1e9:6.3f} Gcells/s",
              flush=True)


if __name__ == "__main__":
    main()

"""Attribute the virtual-mesh weak-scaling overhead (VERDICT-r3 weak #3).

scaling.py's 8-virtual-device table shows 27-36% overhead at 2x2/2x4 with
no attribution. This harness splits it into its three candidate parts by
running the SAME global problem three ways, each in a fresh subprocess
(trace caches are per-process; monkeypatches do not invalidate them):

  mesh      — P=(2,2) over 4 virtual CPU devices: full machinery
              (partitioner + ppermute collectives + slab fills);
  nocomm    — P=(2,2) but `halo_exchange` patched to the local
              mirror-BC fill only (no ppermute, no neighbor slabs;
              physically wrong — reflective interior walls — but stable
              and the same local compute + fill shape);
  single    — P=(1,1), one device, same global N: no parallel machinery.

mesh-nocomm = the collective cost; nocomm-single = partitioner + extra
fill/launch overhead of sharded execution. On the time-sliced virtual mesh
these are host-scheduling costs, not ICI — the split still says where the
engineering attention should go.

Run: python scripts/scaling_attrib.py [--n 1024] [--cycles 20]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, time, json
mode = sys.argv[1]; n = int(sys.argv[2]); cycles = int(sys.argv[3])
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=4").strip()
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from armon_tpu import ArmonParameters
from armon_tpu.core.solver import make_init, make_jit_loop

if mode == "nocomm":
    import armon_tpu.core.step as step_mod
    from armon_tpu.ops.boundary import boundary_conditions
    def no_comm_exchange(cfg, state, axis, vars=None, **kw):
        from armon_tpu.core.state import COMM_VARS
        return boundary_conditions(cfg, state, axis,
                                   vars if vars is not None else COMM_VARS)
    # patched BEFORE any trace is built; fresh process = fresh trace cache
    step_mod.ghost_exchange = no_comm_exchange

P = (1, 1) if mode == "single" else (2, 2)
params = ArmonParameters(test="Sod", N=(n, n), data_type=np.float32,
                         P=P, maxcycle=cycles, maxtime=1e30, silent=5,
                         measure_time=False, kernel_tier="jnp")
state = make_init(params)()
loop = make_jit_loop(params)
out = loop(state)
_ = float(np.asarray(out[1]))
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    out = loop(state)
    _ = float(np.asarray(out[1]))
    best = min(best, time.perf_counter() - t0)
assert bool(out[5]) and int(out[2]) == cycles, (int(out[2]), bool(out[5]))
print(json.dumps({"mode": mode, "seconds": round(best, 4),
                  "cells_per_sec": round(n * n * cycles / best, 1)}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--cycles", type=int, default=20)
    args = ap.parse_args()

    results = {}
    for mode in ("single", "mesh", "nocomm"):
        code = WORKER % {"repo": REPO}
        out = subprocess.run([sys.executable, "-c", code, mode,
                              str(args.n), str(args.cycles)],
                             capture_output=True, text=True, timeout=1800)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")]
        if not line:
            print(f"{mode} FAILED:\n{out.stderr[-2000:]}")
            return 1
        r = json.loads(line[-1])
        results[mode] = r
        print(json.dumps(r), flush=True)

    s, m, nc = (results[k]["seconds"] for k in ("single", "mesh", "nocomm"))
    print(f"\nglobal {args.n}² x {args.cycles} cycles, jnp tier, "
          f"4 virtual CPU devices (time-sliced — host costs, not ICI):")
    print(f"  single-device        {s:8.3f} s")
    print(f"  mesh 2x2, no comm    {nc:8.3f} s  (+{(nc-s)/s:7.1%} "
          f"partitioner + sharded fills/launches)")
    print(f"  mesh 2x2, full       {m:8.3f} s  (+{(m-nc)/nc:7.1%} "
          f"collectives: ppermute slabs + pmin)")
    print(f"  total mesh overhead  +{(m-s)/s:7.1%}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

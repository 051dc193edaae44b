"""Count the per-cycle ghost-fill primitives in the traced SPMD time loop.

Attribution tool for the round-4 mesh-path fill work (VERDICT-r3 #3 tail):
the jaxpr of the jitted loop contains the cycle body once (inside the
while), so primitive counts are per-cycle program-shape truth — the
launch-cost proxy the single-chip `ARMON_FORCE_XLA_FILLS` A/B priced at
3.2% (8192²) to 25% (1000²) of cycle time. `pallas_call` stays in the
jaxpr unexpanded (interpret-mode lowering happens later), so kernel
internals do not pollute the counts.

Run twice and diff:
    ARMON_FORCE_XLA_FILLS=1 python scripts/spmd_fills.py   # round-3 shape
    python scripts/spmd_fills.py                            # in-kernel fills

Counted:
- dynamic_update_slice  — ghost-band write-backs (the slab-fill thunks)
- ppermute              — the neighbor exchange (must NOT change)
- pad                   — X-slab lane positioning (new, fuses with the
                          slab selects; O(rows x 128) each)
- pallas_call           — kernel launches (must not change)
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from armon_tpu import ArmonParameters
from armon_tpu.core.solver import make_init, make_jit_loop

MODE = "forced" if os.environ.get("ARMON_FORCE_XLA_FILLS") else "inkernel"
PRIMS = ("dynamic_update_slice", "ppermute", "pad", "pallas_call")


def counts(P, routing):
    p = ArmonParameters(test="Sod_circ", N=(256, 256), maxcycle=10,
                        data_type=np.float64, kernel_tier="pallas",
                        write_output=False, measure_time=False, P=P,
                        axis_splitting="Godunov",
                        pair_threshold=(4096 if routing == "pair" else 0))
    state = make_init(p)()
    text = str(jax.make_jaxpr(make_jit_loop(p))(state))
    return {prim: text.count(f" {prim}[") + text.count(f" {prim} ")
            for prim in PRIMS}


def main():
    print(f"# mode={MODE} (jaxpr primitive counts, whole loop; the cycle "
          f"body appears once)")
    print("| mesh | routing | " + " | ".join(PRIMS) + " |")
    print("|---|---|" + "---|" * len(PRIMS))
    for P in [(1, 2), (2, 1), (2, 2), (2, 4)]:
        for routing in ("pair", "persweep"):
            c = counts(P, routing)
            print(f"| {P[0]}x{P[1]} | {routing} | "
                  + " | ".join(str(c[k]) for k in PRIMS) + " |", flush=True)


if __name__ == "__main__":
    main()

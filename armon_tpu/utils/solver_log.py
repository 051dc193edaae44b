"""Per-cycle solver log and statistics.

The analog of the reference's block-log subsystem (`log_blocks=true`:
`BlockLogEvent`/`ThreadLogEvent` capture, `src/solver_state.jl:230-263`,
crunched by `src/logging.jl:75-300` into cache-efficiency stats). Its
purpose there is to observe the async block scheduler — stalls, MPI-wait
fraction, cycle-time variance. Under XLA there is no host scheduler to
observe; the equivalent operational signals are per-cycle wall times, dt
evolution and throughput, which this module captures and summarizes
(`analyse` mirrors `analyse_log_stats`'s mean/σ reporting).
"""

import math
from dataclasses import dataclass, field
from typing import List

# XLA device-kernel names that are cross-device communication — the
# MPI-wait-fraction analog (`analyse_log_stats`' stop/wait shares,
# src/logging.jl:75-300). ppermute lowers to collective-permute; the
# reductions to all-reduce / all-gather / reduce-scatter.
_COLLECTIVE_MARKERS = ("all-reduce", "collective-permute", "all-gather",
                       "reduce-scatter", "all-to-all")


def _is_collective(kernel_name: str) -> bool:
    n = kernel_name.lower()
    return any(m in n for m in _COLLECTIVE_MARKERS)


@dataclass
class CycleLogEvent:
    cycle: int
    t: float
    dt: float
    wall_seconds: float


@dataclass
class SolverLog:
    cell_count: int
    events: List[CycleLogEvent] = field(default_factory=list)
    # {section: seconds} from core.solver.measure_sections (ghost exchange
    # vs X kernel vs Y kernel vs dt) — the per-event breakdown analog of
    # `analyse_log_stats` (src/logging.jl:75-300). These are re-jitted
    # PROBES over the final state: indicative shares, not additive to the
    # fused in-loop cycle time — `analyse()` labels them so.
    sections: dict = field(default_factory=dict)
    # {kernel: {"seconds", "calls"}} parsed from the run's own XPlane dump
    # (utils/xplane.py; set when `profiling=['trace']`) — the in-loop
    # device-time truth, the analog of the reference's per-kernel
    # profiling callbacks (src/profiling.jl:6-68).
    trace_sections: dict = field(default_factory=dict)

    def push(self, cycle, t, dt, wall_seconds):
        self.events.append(CycleLogEvent(cycle, t, dt, wall_seconds))

    def analyse(self) -> dict:
        """Summary stats (mean/σ cycle time, throughput, dt range, section
        shares) — the `BlockGridLogStats` analog (`src/logging.jl:75-300`)."""
        if not self.events:
            return {"cycles": 0}
        walls = [e.wall_seconds for e in self.events]
        n = len(walls)
        mean = sum(walls) / n
        var = sum((w - mean) ** 2 for w in walls) / n
        out = {
            "cycles": n,
            "mean_cycle_seconds": mean,
            "std_cycle_seconds": math.sqrt(var),
            "min_cycle_seconds": min(walls),
            "max_cycle_seconds": max(walls),
            "mega_cells_per_sec": self.cell_count / mean / 1e6,
            "dt_first": self.events[0].dt,
            "dt_last": self.events[-1].dt,
            "final_time": self.events[-1].t,
        }
        if n >= 4:
            # Cycle-time trend: per-half mean/σ and the relative drift —
            # the reference's variance diagnostics over the run
            # (src/logging.jl:75-300 `analyse_log_stats` σ reporting).
            h = n // 2
            first, second = walls[:h], walls[n - h:]
            m1, m2 = sum(first) / h, sum(second) / h
            out["cycle_time_trend"] = {
                "first_half_mean": m1,
                "second_half_mean": m2,
                "first_half_std": math.sqrt(
                    sum((w - m1) ** 2 for w in first) / h),
                "second_half_std": math.sqrt(
                    sum((w - m2) ** 2 for w in second) / h),
                "drift": (m2 - m1) / mean if mean else 0.0,
            }
        if self.sections:
            tot = sum(self.sections.values())
            out["sections"] = dict(self.sections)
            out["section_shares"] = ({k: v / tot
                                      for k, v in self.sections.items()}
                                     if tot else {})
            # probes re-jit the sub-steps over the final state: honest
            # SHARES, but not additive to the fused in-loop cycle time
            out["sections_source"] = "probe"
        if self.trace_sections:
            # in-loop device truth replaces the probe as `sections` on a
            # traced run; the probe numbers stay under probe_sections
            if self.sections:
                out["probe_sections"] = out.pop("sections")
                out["probe_section_shares"] = out.pop("section_shares")
            secs = {k: v["seconds"] for k, v in self.trace_sections.items()}
            tot = sum(secs.values())
            out["sections"] = secs  # {kernel: seconds}, like the probe form
            out["section_shares"] = ({k: v / tot for k, v in secs.items()}
                                     if tot else {})
            out["trace_kernels"] = dict(self.trace_sections)  # + call counts
            out["sections_source"] = "trace"
            # Communication share of device time — the MPI-wait-fraction
            # analog. Caveat: counts the collectives' own device time
            # (XLA overlaps them with compute where it can), and a
            # collective fused into a larger computation is invisible.
            coll = sum(s for k, s in secs.items() if _is_collective(k))
            out["collective_seconds"] = coll
            out["collective_wait_share"] = coll / tot if tot else 0.0
        return out

    def __repr__(self):
        a = self.analyse()
        if a["cycles"] == 0:
            return "SolverLog(empty)"
        return (f"SolverLog({a['cycles']} cycles, "
                f"{a['mean_cycle_seconds']*1e3:.3f}±"
                f"{a['std_cycle_seconds']*1e3:.3f} ms/cycle, "
                f"{a['mega_cells_per_sec']:.1f} Mcells/s)")

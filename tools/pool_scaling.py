"""Pool scaling-run reps across multiple idle-box sessions.

Single-box thread-scaling medians move ±15-20% between idle sessions with
identical code (documented: the committed post-lz4 run's local[2] block
read 1,660 turns/s; the next idle session's read 2,019 — same tree, same
input, load < 1 at start both times). A 3-rep median inherits that session
noise, so any ONE run's pair efficiency is a draw from a wide band. The
statistically honest headline is the POOLED median: concatenate the
steady-state reps of every idle post-change run per size, take the median
of the pooled sample, and derive the pair efficiencies from those — more
reps per size, session-to-session variance averaged instead of sampled.

    python tools/pool_scaling.py BENCH/scaling.json BENCH/scaling_r5_idle2.json

Writes BENCH/scaling_pooled.json and prints the pooled table. Refuses to
pool runs flagged unstable or started under load (the per-run artifacts
keep their own self-defense verdicts; pooling never launders a bad run).
"""
from __future__ import annotations

import json
import pathlib
import statistics
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
TARGET = 0.8


def main(paths: list[str]) -> int:
    runs = []
    for p in paths:
        d = json.loads(pathlib.Path(p).read_text())
        if d.get("started_under_load"):
            print(f"refusing {p}: started_under_load", file=sys.stderr)
            return 2
        runs.append((p, d))

    pooled: dict[str, list[float]] = {}
    per_run: dict[str, dict[str, float]] = {}
    for p, d in runs:
        for size, blk in d.get("full_job", {}).items():
            if blk.get("unstable"):
                print(f"refusing {p} {size}: unstable block", file=sys.stderr)
                return 2
            pooled.setdefault(size, []).extend(blk["runs_turns_per_sec"])
            per_run.setdefault(size, {})[p] = blk["turns_per_sec"]

    med = {s: statistics.median(v) for s, v in pooled.items()}
    out = {
        "pooled_from": [p for p, _ in runs],
        "rule": "median over the concatenated steady-state reps of every "
        "idle run per size; pair efficiency from pooled medians",
        "pooled_reps": pooled,
        "pooled_median_turns_per_sec": med,
        "per_run_block_medians": per_run,
        "pairs": {},
    }
    for small, large in ((2, 8), (3, 12)):
        ks, kl = f"local{small}", f"local{large}"
        if ks in med and kl in med:
            eff = round(med[kl] / med[ks] / (large // small), 3)
            per_run_effs = [
                round(
                    per_run[kl][p] / per_run[ks][p] / (large // small), 3
                )
                for p, _ in runs
                if p in per_run.get(kl, {}) and p in per_run.get(ks, {})
            ]
            out["pairs"][f"{small}v{large}"] = {
                "efficiency_pooled": eff,
                "pass": eff >= TARGET,
                "per_run_efficiencies": per_run_effs,
                "n_pooled_reps": {ks: len(pooled[ks]), kl: len(pooled[kl])},
            }
    dest = REPO / "BENCH" / "scaling_pooled.json"
    dest.write_text(json.dumps(out, indent=2) + "\n")
    for pair, v in out["pairs"].items():
        print(
            f"{pair}: pooled {v['efficiency_pooled']} "
            f"({'PASS' if v['pass'] else 'FAIL'} vs {TARGET}); "
            f"per-run {v['per_run_efficiencies']}"
        )
    print(f"wrote {dest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

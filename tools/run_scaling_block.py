"""One probe-bracketed ABBA scaling block (the round-3 campaign
protocol, now a committed tool).

Protocol per BASELINE.md: ``kernel_probe → engine 8 → 32 → 32 → 8 →
kernel_probe``. The engine child is ``RAY_GRAFT_CPUS=N
GRAFT_SCALING_CHILD=1 python bench.py`` (steady.urls_per_sec is the
reading). A block is VALID when the two kernel-probe efficiencies and
the within-level engine reads each agree within 20% — host phases
swing on a minutes scale, so invalid blocks are recorded and
discarded, never averaged.

Usage::

    python tools/run_scaling_block.py <name> [seeds]   # default 24000

Writes ``tools/scaling_<name>.json`` in the shape of the round-3
campaign records (runs a1/h1/h2/a2 + pre/post probe lines +
steady_eff + validity).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def kernel_probe(lo: int = 8, hi: int = 32) -> str:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "kernel_probe.py"),
         str(lo), str(hi)],
        capture_output=True, text=True, check=True, cwd=REPO,
    ).stdout.strip()
    return out.splitlines()[-1]


def probe_eff(line: str) -> float:
    m = re.search(r"eff ([0-9.]+)", line)
    return float(m.group(1)) if m else float("nan")


def engine_run(ncpu: int, seeds: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SCALING_CHILD="1",
               GRAFT_SCALING_SEEDS=str(seeds))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True, cwd=REPO,
    ).stdout
    r = json.loads(out.strip().splitlines()[-1])
    return {
        "urls_per_sec": r["urls_per_sec"],
        "steady": r["steady"],
    }


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "r4_block"
    seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 24000

    pre = kernel_probe()
    runs: dict[str, dict] = {}
    for key, ncpu in (("a1", 8), ("h1", 32), ("h2", 32), ("a2", 8)):
        runs[key] = engine_run(ncpu, seeds)
        time.sleep(3)  # drain the previous session's plasma store
    post = kernel_probe()

    s = {k: runs[k]["steady"]["urls_per_sec"] for k in runs}
    lo_mean = (s["a1"] + s["a2"]) / 2
    hi_mean = (s["h1"] + s["h2"]) / 2
    steady_eff = (hi_mean / lo_mean) / 4

    def within(a: float, b: float, tol: float = 0.2) -> bool:
        return abs(a - b) <= tol * max(a, b)

    pre_eff, post_eff = probe_eff(pre), probe_eff(post)
    valid = (
        within(pre_eff, post_eff)
        and within(s["a1"], s["a2"])
        and within(s["h1"], s["h2"])
    )
    rec = {
        "campaign": name,
        "protocol": (
            f"ABBA(8,32,32,8) at GRAFT_SCALING_SEEDS={seeds}; "
            "probe-bracketed (tools/run_scaling_block.py)"
        ),
        "seeds": seeds,
        "runs": runs,
        "preprobe": pre,
        "postprobe": post,
        "steady_eff": round(steady_eff, 3),
        "probe_effs": [round(pre_eff, 3), round(post_eff, 3)],
        "valid": valid,
    }
    path = os.path.join(REPO, "tools", f"scaling_{name}.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()

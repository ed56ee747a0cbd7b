"""Probe-gated sequential scaling campaign.

Round-3 protocol (BASELINE.md): the host's bandwidth phase swings on a
minutes scale, so engine blocks are LAUNCHED only when a kernel probe
shows a warm window (gate), while every probe — warm or cold — is
logged for transparency. Valid blocks are recorded unconditionally
(cool-window valid blocks stay in the series; the gate chooses when to
spend a 9-minute block, it never filters results after the fact).

Usage::

    python tools/campaign_loop.py <prefix> <n_blocks> [gate=0.76] [max_minutes=120]

Writes ``tools/scaling_<prefix><i>.json`` per attempted block and
``/tmp/campaign_<prefix>.log`` with one line per probe/attempt.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
from run_scaling_block import kernel_probe, probe_eff  # noqa: E402


def main() -> None:
    prefix = sys.argv[1]
    n_blocks = int(sys.argv[2])
    gate = float(sys.argv[3]) if len(sys.argv) > 3 else 0.76
    max_minutes = float(sys.argv[4]) if len(sys.argv) > 4 else 120.0
    log_path = f"/tmp/campaign_{prefix}.log"
    t_end = time.time() + max_minutes * 60
    done = 0
    i = 1

    def log(msg: str) -> None:
        line = f"{time.strftime('%H:%M:%S')} {msg}"
        print(line, flush=True)
        with open(log_path, "a") as f:
            f.write(line + "\n")

    while done < n_blocks and time.time() < t_end:
        line = kernel_probe()
        eff = probe_eff(line)
        log(f"sniff eff={eff:.3f} ({line})")
        # NaN-safe: a malformed probe (eff=nan) must NOT open the gate
        if not eff >= gate:
            time.sleep(90)
            continue
        name = f"{prefix}{i}"
        i += 1
        log(f"gate open ({eff:.3f} >= {gate}) -> block {name}")
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "run_scaling_block.py"),
             name],
            capture_output=True, text=True, cwd=REPO,
        )
        tail = (r.stdout or r.stderr).strip().splitlines()
        log(f"block {name} done rc={r.returncode}: {tail[-1] if tail else ''}")
        if r.returncode == 0:
            import json

            rec = json.load(
                open(os.path.join(REPO, "tools", f"scaling_{name}.json"))
            )
            log(
                f"block {name}: steady_eff={rec['steady_eff']} "
                f"probes={rec['probe_effs']} valid={rec['valid']}"
            )
            if rec["valid"]:
                done += 1
    log(f"campaign over: {done} valid blocks")


if __name__ == "__main__":
    main()

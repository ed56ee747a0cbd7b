"""Volume/endurance evidence run (round-4 verdict item #5): the full
synthetic crawl+extract chain at a ≥10⁶-URL frontier, once
uninterrupted and once with a mid-run SIGKILL + resume, recording
sustained URLs/s, peak object-store usage, spill bytes, and the
doc-id-set invariant (killed+resumed run must produce EXACTLY the
same document set as the uninterrupted run — the crash-consistency
contract at volume, same invariant as
tests/test_review_regressions.py::test_resume_midround_crash_no_duplicates).

Usage::

    python tools/endurance_run.py [seeds]        # default 250_000
    python tools/endurance_run.py --child <ckpt> <seeds> [resume]

The parent orchestrates three child processes (each owns a fresh Ray
session, so a SIGKILL genuinely kills the whole engine):
run A (uninterrupted), run B1 (killed after KILL_AFTER_S), run B2
(resume=True on B1's checkpoint). Prints one JSON line for
BASELINE.md.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
KILL_AFTER_S = float(os.environ.get("GRAFT_ENDURANCE_KILL_S", "45"))


def _spill_bytes() -> int:
    """Bytes currently sitting in the newest Ray session's spill dir."""
    sessions = sorted(glob.glob("/tmp/ray/session_*"))
    if not sessions:
        return 0
    total = 0
    for root, _dirs, files in os.walk(
        os.path.join(sessions[-1], "ray_spilled_objects")
    ):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def child(ckpt: str, n_seeds: int, resume: bool) -> None:
    import threading

    import ray

    sys.path.insert(0, REPO)
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import numpy as np

    from reffy_ray.pipelines.crawl import CrawlConfig, crawl
    from reffy_ray.sources.corpus import scaled_seeds
    from reffy_ray.stages.extract import EXTRACTORS

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    pool = max(2, ncpu - 1)

    # object-store peak sampler (2 Hz, daemon)
    peak = {"used": 0}
    total_store = int(ray.cluster_resources().get("object_store_memory", 0))

    def sample():
        while True:
            avail = ray.available_resources().get("object_store_memory", 0)
            peak["used"] = max(peak["used"], int(total_store - avail))
            time.sleep(0.5)

    threading.Thread(target=sample, daemon=True).start()

    t0 = time.perf_counter()
    cfg = CrawlConfig(
        mode="synth", checkpoint_dir=ckpt, max_depth=1, expand_links=True,
        max_rounds=6, round_ms=float("inf"), synth_links=4,
        num_seen_shards=max(4, ncpu // 2), num_gates=4,
        fetch_concurrency=pool, parse_concurrency=pool,
        batch_size=64, target_rows_per_block=512, exact_seen=False,
        extract_modules=tuple(EXTRACTORS), fused_drop_spans=True,
        resume=resume,
    )
    res = crawl(scaled_seeds(n_seeds), cfg)
    sec = time.perf_counter() - t0

    ids = []
    for b in res.documents().select_columns(["url"]).iter_batches(
        batch_format="pyarrow"
    ):
        ids.append(b.column("url").to_pandas().to_numpy(dtype=object))
    urls = np.sort(np.concatenate(ids)) if ids else np.array([], object)
    h = hashlib.md5("\n".join(urls.tolist()).encode()).hexdigest()
    print(json.dumps({
        "child": True,
        "urls": int(len(urls)),
        "unique_urls": int(len(set(urls.tolist()))),
        "doc_set_md5": h,
        "sec": round(sec, 2),
        "urls_per_sec": round(len(urls) / max(sec, 1e-9), 1),
        "peak_object_store_bytes": peak["used"],
        "spill_bytes": _spill_bytes(),
    }))
    ray.shutdown()


def run_child(ckpt: str, seeds: int, resume: bool = False,
              kill_after: float | None = None) -> dict | None:
    cmd = [sys.executable, os.path.abspath(__file__), "--child", ckpt,
           str(seeds)] + (["resume"] if resume else [])
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True, cwd=REPO)
    if kill_after is not None:
        time.sleep(kill_after)
        # SIGKILL the driver with no chance to flush — the crash being
        # simulated — then reap the orphaned raylet/worker tree so the
        # resume child starts on a clean host. (This `ray stop` kills
        # EVERY local Ray process: never run this tool concurrently
        # with other Ray jobs, e.g. a scaling campaign.)
        proc.send_signal(signal.SIGKILL)
        proc.wait()
        subprocess.run(["ray", "stop", "--force"], capture_output=True)
        time.sleep(3)
        return None
    out, _ = proc.communicate()
    if proc.returncode != 0:
        raise RuntimeError(f"child failed rc={proc.returncode}: {out[-2000:]}")
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], int(sys.argv[3]),
              resume=len(sys.argv) > 4 and sys.argv[4] == "resume")
        return

    seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    ck_a = tempfile.mkdtemp(prefix="graft_endur_a_")
    ck_b = tempfile.mkdtemp(prefix="graft_endur_b_")
    try:
        a = run_child(ck_a, seeds)
        t_kill = time.perf_counter()
        run_child(ck_b, seeds, kill_after=KILL_AFTER_S)
        killed_after = round(time.perf_counter() - t_kill, 1)
        b = run_child(ck_b, seeds, resume=True)
        out = {
            "seeds": seeds,
            "uninterrupted": a,
            "killed_after_s": killed_after,
            "resumed": b,
            "doc_set_invariant": a["doc_set_md5"] == b["doc_set_md5"]
            and a["urls"] == a["unique_urls"]
            and b["urls"] == b["unique_urls"],
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(ck_a, ignore_errors=True)
        shutil.rmtree(ck_b, ignore_errors=True)


if __name__ == "__main__":
    main()

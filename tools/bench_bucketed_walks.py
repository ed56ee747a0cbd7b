"""Evidence for the bucketed-adjacency scale claim (round-4 verdict
item #4 'done' criterion): per-step cost of ``bucketed_walks`` tracks
FRONTIER size, not edge count.

Builds the same power-law-ish synthetic graph at E and 10E edges
(identical n_nodes), walks the SAME small-seed frontier over both
stores, and reports wall time plus the actual bucket bytes opened per
run vs the store's total bytes. The in-memory join tier re-shuffles
the full edge table per step, so its cost is O(edges); the bucketed
tier's pruned read should hold walk time within a small factor while
edges grow 10× — that delta is the claim.

Usage::

    python tools/bench_bucketed_walks.py [edges] [n_nodes] [starts]

Writes one JSON line; record it in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np


def synth_edges(n_nodes: int, n_edges: int, seed: int):
    import pandas as pd

    rng = np.random.default_rng(seed)
    # Zipf-flavored dst (hubs) with uniform src — realistic skew
    src = rng.integers(0, n_nodes, n_edges)
    dst = (n_nodes * rng.random(n_edges) ** 3).astype(np.int64)
    return pd.DataFrame(
        {"src": src.astype("int64"), "dst": dst.clip(0, n_nodes - 1)}
    )


def store_bytes(d: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(d):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    return total


def main() -> None:
    import ray
    import ray.data as rd

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from reffy_ray.ops.graphstore import BucketedAdjacency, bucketed_walks

    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    n_starts = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pandas as pd

    starts = rd.from_pandas(
        pd.DataFrame({"id": np.arange(0, n_starts * 97, 97)[:n_starts]
                      % n_nodes})
    ).materialize()

    out = {"n_nodes": n_nodes, "starts": n_starts, "walk_len": 4,
           "runs": {}}
    for label, m in (("E", n_edges), ("10E", 10 * n_edges)):
        d = f"/tmp/graft_bwbench_{label}"
        shutil.rmtree(d, ignore_errors=True)
        edges = rd.from_pandas(synth_edges(n_nodes, m, seed=5))
        t0 = time.perf_counter()
        adj = BucketedAdjacency.build(
            edges, d, n_nodes=n_nodes, n_buckets=1024
        )
        build_s = time.perf_counter() - t0

        # instrument the pruned read: bytes the walk actually opens
        opened = {"bytes": 0, "files": 0}
        orig_files = adj.bucket_files

        def spy(buckets, _orig=orig_files):
            fs = _orig(buckets)
            opened["files"] += len(fs)
            opened["bytes"] += sum(os.path.getsize(f) for f in fs)
            return fs

        adj.bucket_files = spy
        t0 = time.perf_counter()
        n_rows = bucketed_walks(adj, starts, walk_len=4).count()
        walk_s = time.perf_counter() - t0
        out["runs"][label] = {
            "edges": m,
            "build_sec": round(build_s, 2),
            "walk_sec": round(walk_s, 2),
            "walk_rows": n_rows,
            "store_bytes": store_bytes(d),
            "opened_bytes": opened["bytes"],
            "opened_files": opened["files"],
        }
        shutil.rmtree(d, ignore_errors=True)

    r1, r10 = out["runs"]["E"], out["runs"]["10E"]
    out["walk_time_ratio_10E_over_E"] = round(
        r10["walk_sec"] / max(r1["walk_sec"], 1e-9), 2
    )
    out["opened_fraction_10E"] = round(
        r10["opened_bytes"] / max(r10["store_bytes"], 1), 4
    )
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()

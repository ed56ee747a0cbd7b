"""Cluster job entry point for the crawl pipeline (north-rule launch path).

On a real fixed-size Ray cluster this is submitted with:

    ray job submit --address http://<head>:8265 \
        --working-dir /root/repo -- \
        python tools/submit_crawl.py \
            --seeds /data/seeds.parquet \
            --out   s3://bucket/crawl_out \
            --checkpoint s3://bucket/crawl_ckpt

and runs the identical code path `bench.py` and the tests drive: the
frontier-round crawl (`reffy_ray.pipelines.full_crawl`) with sharded
cuckoo URL-seen actors, per-origin politeness, robots gating, fused
fetch+parse+extract tasks, per-round parquet partitions and a
version-stamped resumable checkpoint. The two-cluster-size scaling
criterion (N vs 4N nodes, efficiency >= 0.8) is evidenced in this
sandbox by `bench.py --scaling` (8 vs 32 CPUs in fresh processes —
BASELINE.md "Two-level scaling"); on a real cluster, submit the same
job to the N-node and 4N-node clusters and compare
`index.json`'s urls/sec.

In local mode (`RAY_ADDRESS=local`, this sandbox) it falls back to a
plain local session so the script stays runnable end-to-end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", default="fixture",
                    help="seeds parquet path, or 'fixture' / 'synth:N'")
    ap.add_argument("--out", default="/tmp/crawl_out")
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint dir (defaults to <out>/crawl)")
    ap.add_argument("--max-depth", type=int, default=2)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` the runtime sets RAY_ADDRESS to the
        # cluster; without it, start a one-node local session (the
        # "auto" default would raise ConnectionError with no cluster)
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")

    from reffy_ray.pipelines.crawl import CrawlConfig
    from reffy_ray.pipelines.full_crawl import full_crawl
    from reffy_ray.sources.corpus import fixture_seeds, scaled_seeds

    if args.seeds == "fixture":
        seeds, mode = fixture_seeds(), "fixture"
    elif args.seeds.startswith("synth:"):
        seeds, mode = scaled_seeds(int(args.seeds.split(":", 1)[1])), "synth"
    else:
        import pyarrow.parquet as pq

        seeds, mode = pq.read_table(args.seeds), "synth"

    cfg = CrawlConfig(mode=mode, max_depth=args.max_depth,
                      checkpoint_dir=args.checkpoint)
    res = full_crawl(seeds, args.out, cfg)
    stats = res.index.get("stats", {})
    print(json.dumps({"out": args.out, "stats": stats}))
    ray.shutdown()


if __name__ == "__main__":
    main()

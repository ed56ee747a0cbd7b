"""BucketedAdjacency: the persisted hash-bucketed edge store that lets
iterative graph ops read per-step only the buckets the frontier
touches (round-4 verdict item #4 — the IVFIndex pattern applied to
graph iteration)."""

import glob
import os

import numpy as np
import pandas as pd
import ray.data as rd

from reffy_ray.ops.graph import pagerank, random_walks
from reffy_ray.ops.graphstore import (
    BucketedAdjacency,
    bucketed_pagerank,
    bucketed_walks,
)


def _random_graph(n, m, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "src": rng.integers(0, n, m).astype("int64"),
            "dst": rng.integers(0, n, m).astype("int64"),
        }
    )


def test_build_layout_and_load_roundtrip(ray_session, tmp_path):
    el = _random_graph(20, 120)
    # toss in out-of-range rows that must be filtered
    el = pd.concat(
        [el, pd.DataFrame({"src": [5, -1], "dst": [99, 3]})],
        ignore_index=True,
    )
    d = str(tmp_path / "adj")
    adj = BucketedAdjacency.build(
        rd.from_pandas(el), d, n_nodes=20, n_buckets=8
    )
    # hive layout: one directory per non-empty bucket
    dirs = sorted(glob.glob(os.path.join(d, "bucket=*")))
    assert dirs and len(dirs) <= 8
    # pruned read returns only that bucket's srcs
    b0 = adj.read_buckets([0]).to_pandas()
    assert (b0["src"].to_numpy() % 8 == 0).all()
    # all buckets together = the in-range edge multiset
    full = adj.read_buckets(range(8)).to_pandas()
    want = el[(el.src >= 0) & (el.src < 20) & (el.dst >= 0) & (el.dst < 20)]
    assert sorted(zip(full.src, full.dst)) == sorted(zip(want.src, want.dst))
    # load() round-trips the meta
    again = BucketedAdjacency.load(d)
    assert (again.n_buckets, again.n_nodes) == (8, 20)


def test_bucketed_walks_match_inmemory_tiers(ray_session, tmp_path):
    el = _random_graph(30, 200, seed=11)
    d = str(tmp_path / "adj")
    adj = BucketedAdjacency.build(
        rd.from_pandas(el), d, n_nodes=30, n_buckets=4
    )
    full = (
        random_walks(rd.from_pandas(el), n_nodes=30, walk_len=3,
                     mode="broadcast")
        .to_pandas()
    )
    # walks are independent per walk_id: a subset-started bucketed run
    # must equal the same subset of the full run
    starts = rd.from_pandas(pd.DataFrame({"id": [0, 7, 13, 29]}))
    got = (
        bucketed_walks(adj, starts, walk_len=3)
        .to_pandas().sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )
    want = (
        full[full.walk_id.isin([0, 7, 13, 29])]
        .sort_values(["walk_id", "step"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_bucketed_walks_dead_end_and_pruning(ray_session, tmp_path):
    el = pd.DataFrame({"src": [0, 1], "dst": [1, 2]})
    d = str(tmp_path / "adj")
    adj = BucketedAdjacency.build(
        rd.from_pandas(el), d, n_nodes=16, n_buckets=8
    )
    # node 2 is a dead end; node 9 is isolated
    starts = rd.from_pandas(pd.DataFrame({"id": [0, 9]}))
    out = (
        bucketed_walks(adj, starts, walk_len=3)
        .to_pandas().sort_values(["walk_id", "step"])
    )
    assert out[out.walk_id == 0]["node"].tolist() == [0, 1, 2, 2]
    assert out[out.walk_id == 9]["node"].tolist() == [9, 9, 9, 9]
    # path-level pruning: only the asked-for bucket's files come back
    assert adj.bucket_files([0]) and all(
        "bucket=0" in f for f in adj.bucket_files([0])
    )
    assert adj.bucket_files([5]) == []  # no src ≡ 5 (mod 8) edges


def test_bucketed_pagerank_matches_inmemory(ray_session, tmp_path):
    el = _random_graph(25, 300, seed=5)
    d = str(tmp_path / "adj")
    adj = BucketedAdjacency.build(
        rd.from_pandas(el), d, n_nodes=25, n_buckets=4
    )
    want = (
        pagerank(rd.from_pandas(el), n_nodes=25, iters=3)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    got = (
        bucketed_pagerank(adj, iters=3)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)

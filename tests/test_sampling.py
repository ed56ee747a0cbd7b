"""Corpus-curation sampling ops: hash split, source quota, near-dup
clustering / dedup-by-representative."""

import hashlib

import pyarrow as pa
import ray.data as rd

from reffy_ray.ops.sampling import (
    hash_split,
    near_dedup,
    near_dup_clusters,
    source_cap,
)


def _h64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep dark forest to find some food for the long cold winter"
)


# -- hash_split --------------------------------------------------------------


def test_hash_split_deterministic_and_complete(ray_session):
    ds = rd.from_arrow(pa.table({"doc_id": list(range(500))}))
    out = hash_split(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 500
    assert set(out["split"]) == {"train", "val", "test"}
    # exact expected assignment from the documented hash rule
    for i, row in out.head(50).iterrows():
        b = _h64(f"{row['doc_id']}|split-42") % 10_000
        want = "train" if b < 8000 else ("val" if b < 9000 else "test")
        assert row["split"] == want
    # proportions near the weights (hash-uniformity sanity)
    frac = (out["split"] == "train").mean()
    assert 0.7 < frac < 0.9
    # second run identical (order-independent determinism)
    again = hash_split(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (out["split"] == again["split"]).all()


def test_hash_split_custom_weights(ray_session):
    ds = rd.from_arrow(pa.table({"doc_id": list(range(100))}))
    out = hash_split(ds, splits=(("a", 0.5), ("b", 0.5))).to_pandas()
    assert set(out["split"]) <= {"a", "b"}
    assert len(out) == 100


# -- source_cap --------------------------------------------------------------


def test_source_cap_enforces_quota(ray_session):
    rows = [
        {"doc_id": i, "source": "hot" if i < 80 else f"s{i % 5}"}
        for i in range(100)
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = source_cap(ds, cap=10).to_pandas()
    counts = out.groupby("source").size()
    assert counts["hot"] == 10
    assert (counts <= 10).all()
    # every row that belonged to an under-quota source survives
    small = [r["doc_id"] for r in rows if r["source"] != "hot"]
    assert set(small) <= set(out["doc_id"])


def test_source_cap_deterministic_priority(ray_session):
    rows = [{"doc_id": i, "source": "x"} for i in range(50)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    kept = sorted(source_cap(ds, cap=5).to_pandas()["doc_id"])
    want = sorted(sorted(range(50), key=lambda i: (_h64(str(i)), i))[:5])
    assert kept == want
    # stable under different block layout
    ds2 = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(7)
    kept2 = sorted(source_cap(ds2, cap=5).to_pandas()["doc_id"])
    assert kept2 == want


# -- near-dup clustering -----------------------------------------------------


def _planted_corpus():
    texts = []
    for i in range(8):
        # disjoint vocabulary per doc — genuinely unique (no shared shingles)
        texts.append(" ".join(f"tok{i}x{j}" for j in range(30)))
    # one cluster of three near-identical docs (ids 8, 9, 10)
    texts.append(BASE)
    texts.append(BASE + " extra")
    texts.append(BASE + " other tail words")
    # one pair (ids 11, 12)
    alt = "completely different words " * 8
    texts.append(alt)
    texts.append(alt + " ending")
    return rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )


def test_near_dup_clusters_components(ray_session):
    out = near_dup_clusters(_planted_corpus(), jaccard_threshold=0.5).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_rep"]))
    assert got.get(8) == 8 and got.get(9) == 8 and got.get(10) == 8
    assert got.get(11) == 11 and got.get(12) == 11
    # no unique doc appears in any cluster
    assert all(d >= 8 for d in got)


def test_near_dedup_keeps_reps_and_singletons(ray_session):
    kept = sorted(near_dedup(_planted_corpus()).to_pandas()["doc_id"])
    assert kept == [0, 1, 2, 3, 4, 5, 6, 7, 8, 11]


def test_near_dedup_anti_join_path(ray_session):
    # broadcast_limit=0 forces the hash-partitioned left_anti join —
    # the 100 TB path when the drop set no longer fits a worker heap
    kept = sorted(
        near_dedup(_planted_corpus(), broadcast_limit=0).to_pandas()["doc_id"]
    )
    assert kept == [0, 1, 2, 3, 4, 5, 6, 7, 8, 11]


def test_connected_components_chain_and_clique(ray_session):
    from reffy_ray.ops.sampling import connected_components

    # chain 1-2-3-4 plus disjoint pair (10, 11) plus clique star 20-{21,22}
    edges = rd.from_arrow(
        pa.table(
            {
                "a": [2, 3, 4, 10, 20, 20],
                "b": [1, 2, 3, 11, 21, 22],
            }
        )
    )
    out = connected_components(edges).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_rep"]))
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_connected_components_empty(ray_session):
    from reffy_ray.ops.sampling import connected_components

    edges = rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                    "b": pa.array([], pa.int64())}))
    assert connected_components(edges).count() == 0


def test_star_edges_same_components_as_pairs(ray_session):
    from reffy_ray.ops.dedup import minhash_lsh_pairs, minhash_lsh_star_edges

    ds = _planted_corpus()
    pairs = minhash_lsh_pairs(ds, jaccard_threshold=0.5).to_pandas()
    stars = minhash_lsh_star_edges(ds, jaccard_threshold=0.5).to_pandas()
    # star edges are never more numerous and touch the same node set
    assert len(stars) <= len(pairs)
    nodes = set(pairs["a"]) | set(pairs["b"])
    snodes = set(stars["a"]) | set(stars["b"])
    assert snodes == nodes


# -- doc_freq / top_terms ----------------------------------------------------


def test_doc_freq_counts_docs_not_occurrences(ray_session):
    from reffy_ray.ops.text import doc_freq

    ds = rd.from_arrow(
        pa.table({"doc_id": [1, 2, 3], "text": ["a a a b", "a c", "c c d"]})
    )
    out = doc_freq(ds).to_pandas().set_index("token")["df"].to_dict()
    assert out == {"a": 2, "b": 1, "c": 2, "d": 1}


def test_top_terms_rank_and_stopword_filter(ray_session):
    from reffy_ray.ops.text import top_terms

    # 'the' appears in every doc -> dropped at max_df_frac=0.5
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "the cat cat cat dog",
                    "the dog dog fish",
                    "the fish",
                    "the bird bird",
                ],
            }
        )
    )
    out = top_terms(ds, n=2, max_df_frac=0.5).to_pandas()
    assert "the" not in set(out["token"])
    d1 = out[out.doc_id == 1].sort_values("rank")
    assert d1["token"].tolist() == ["cat", "dog"]
    assert d1["tf"].tolist() == [3, 1]
    assert d1["rank"].tolist() == [1, 2]


def test_near_dedup_join_path_lazy_input(ray_session):
    # a lazy (read_parquet-style) input must not crash the join path:
    # Dataset.num_blocks raises on unmaterialized datasets
    lazy = _planted_corpus().map_batches(lambda b: b, batch_format="pyarrow")
    kept = sorted(
        near_dedup(lazy, broadcast_limit=0).to_pandas()["doc_id"]
    )
    assert kept == [0, 1, 2, 3, 4, 5, 6, 7, 8, 11]


def test_stratified_sample_deterministic_and_per_stratum(ray_session):
    import ray.data as rd

    from reffy_ray.ops.sampling import _h64, stratified_sample

    rows = [
        {"doc_id": i, "lang": ["en", "de"][i % 2]} for i in range(200)
    ]
    out = stratified_sample(
        rd.from_items(rows), fracs={"en": 0.5}, default_frac=1.0
    ).to_pandas()
    # every de row kept; en rows kept iff bucket < 5000 (exact set)
    assert (out[out.lang == "de"].doc_id % 2 == 1).all()
    assert len(out[out.lang == "de"]) == 100
    expect_en = {
        i for i in range(0, 200, 2) if _h64(f"{i}|strat-42") % 10_000 < 5_000
    }
    assert set(out[out.lang == "en"].doc_id) == expect_en
    # rerun identical (deterministic)
    out2 = stratified_sample(
        rd.from_items(rows), fracs={"en": 0.5}, default_frac=1.0
    ).to_pandas()
    assert sorted(out2.doc_id) == sorted(out.doc_id)


def test_near_dedup_best_keeps_quality_winner(ray_session):
    import ray.data as rd

    from reffy_ray.ops.sampling import near_dedup_best

    dup = ("the quick brown fox jumps over the lazy dog again and again "
           "for a very long repeated passage of text") * 3
    rows = [
        {"doc_id": 1, "text": dup},                      # low quality
        {"doc_id": 2, "text": dup + " EXTRAALPHAWORDS"},  # near-dup, higher alpha
        {"doc_id": 3, "text": "completely unrelated singleton content here"},
    ]
    quality = rd.from_items(
        [
            {"doc_id": 1, "alpha_ppm": 100},
            {"doc_id": 2, "alpha_ppm": 900},
            {"doc_id": 3, "alpha_ppm": 50},
        ]
    )
    kept = sorted(
        near_dedup_best(rd.from_items(rows), quality, jaccard_threshold=0.5)
        .to_pandas()["doc_id"]
    )
    # winner of the {1,2} cluster is 2 (higher quality), NOT min-id 1;
    # singleton 3 always kept
    assert kept == [2, 3]


def test_token_budget_sample_exact_prefix(ray_session):
    import ray.data as rd

    from reffy_ray.ops.sampling import _h64, token_budget_sample

    rows = [{"doc_id": i, "n_tokens": 10 + i} for i in range(60)]
    budget = 500
    out = token_budget_sample(rd.from_items(rows), budget=budget).to_pandas()
    # brute-force expected prefix in (md5 bucket, id) order
    order = sorted(rows, key=lambda r: (_h64(f"{r['doc_id']}|budget-42") % 10_000,
                                        r["doc_id"]))
    cum, expect = 0, []
    for r in order:
        cum += r["n_tokens"]
        if cum <= budget:
            expect.append(r["doc_id"])
    assert sorted(out.doc_id) == sorted(expect)
    assert out.n_tokens.sum() <= budget
    # the next doc in order would overflow — budget is tight
    assert out.n_tokens.sum() + order[len(expect)]["n_tokens"] > budget


def test_near_dedup_best_rejects_partial_quality(ray_session):
    import pytest as _pytest
    import ray.data as rd

    from reffy_ray.ops.sampling import near_dedup_best

    dup = ("the quick brown fox jumps over the lazy dog again and again "
           "for a very long repeated passage of text") * 3
    rows = [
        {"doc_id": 1, "text": dup},
        {"doc_id": 2, "text": dup + " EXTRAALPHAWORDS"},
    ]
    quality = rd.from_items([{"doc_id": 1, "alpha_ppm": 100}])  # 2 missing
    with _pytest.raises(ValueError, match="quality table covers"):
        near_dedup_best(rd.from_items(rows), quality, jaccard_threshold=0.5)


def test_interleave_sources_round_robin(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from reffy_ray.ops.sampling import interleave_sources

    # uneven sources: a has 3 docs, b has 2, c has 1
    tbl = pa.table({
        "doc_id": pa.array([10, 11, 12, 20, 21, 30], pa.int64()),
        "source": pa.array(["a", "a", "a", "b", "b", "c"]),
    })
    out = (
        interleave_sources(rd.from_arrow(tbl).repartition(3))
        .to_pandas()
        .sort_values("mix_pos")
        .reset_index(drop=True)
    )
    # round-robin: rank-0 of a,b,c then rank-1 of a,b then rank-2 of a
    assert out["doc_id"].tolist() == [10, 20, 30, 11, 21, 12]
    assert out["mix_rank"].tolist() == [0, 0, 0, 1, 1, 2]
    assert out["mix_pos"].tolist() == [0, 1, 2, 3, 4, 5]


def test_rank_buckets_exact_deciles(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from reffy_ray.ops.sampling import rank_buckets

    # 20 rows, values descending so rank != input order; ties on value
    # broken by doc_id
    tbl = pa.table({
        "doc_id": pa.array(list(range(20)), pa.int64()),
        "n_chars": pa.array([19 - i for i in range(19)] + [18], pa.int64()),
    })
    out = (
        rank_buckets(rd.from_arrow(tbl).repartition(4))
        .to_pandas()
        .sort_values("rank_idx")
        .reset_index(drop=True)
    )
    assert out["rank_idx"].tolist() == list(range(20))
    # n=20, buckets=10 -> exactly 2 per bucket
    assert out["bucket"].tolist() == [i // 2 for i in range(20)]
    # value 18 appears twice (doc 1 and doc 19): doc 1 ranks first
    tie = out[out["n_chars"] == 18]
    assert tie["doc_id"].tolist() == [1, 19]


def test_weighted_sample_matches_manual_rule(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from reffy_ray.ops.sampling import _h64, weighted_sample

    n = 200
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "w": pa.array([(i * 37) % 120 for i in range(n)], pa.int64()),
    })
    kept = (
        weighted_sample(rd.from_arrow(tbl).repartition(4), "w", denom=100)
        .to_pandas()
        .sort_values("doc_id")
    )
    expect = [
        i for i in range(n)
        if _h64(f"{i}|wsample-42") % 100 < (i * 37) % 120
    ]
    assert kept["doc_id"].tolist() == expect
    # weight >= denom -> always kept
    assert all((i * 37) % 120 < 100 or i in expect for i in range(n))


def test_priority_sample_deterministic(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.sampling import priority_sample

    df = pd.DataFrame({"doc_id": range(1000)})
    a = priority_sample(rd.from_pandas(df).repartition(3), k=50).to_pandas()
    b = priority_sample(rd.from_pandas(df).repartition(11), k=50).to_pandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert len(a) == 50
    assert a["prio"].is_monotonic_increasing
    assert (a["prio"] >= 0).all()

"""Training-data op tests: dedup family, similarity search, text ops."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reffy_ray.ops.dedup import (
    MinHasher,
    SimHasher,
    embedding_near_dups,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard,
)
from reffy_ray.ops.similarity import brute_force_topk, ivf_topk, train_ivf_centroids
from reffy_ray.ops.text import LangId, quality_score, token_count


BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep dark forest to find some food for the long cold winter"
)


def _docs_ds(texts):
    return rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )


# -- exact dedup -------------------------------------------------------------


def test_exact_dedup_min_id_wins(ray_session):
    ds = _docs_ds(["aaa", "bbb", "aaa", "ccc", "bbb", "aaa"])
    out = exact_dedup(ds).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [0, 1, 3]


# -- minhash -----------------------------------------------------------------


def test_minhash_estimates_jaccard():
    mh = MinHasher(num_perm=128)
    a = mh.signature(BASE)
    b = mh.signature(BASE + " extra tail words here")
    c = mh.signature("completely different text about other topics entirely now")
    sim_ab = float((a == b).mean())
    sim_ac = float((a == c).mean())
    assert sim_ab > 0.5
    assert sim_ac < 0.2


def test_minhash_lsh_finds_planted_pair(ray_session):
    texts = [BASE, BASE + " minor change", "unrelated document entirely " * 5]
    out = minhash_lsh_pairs(_docs_ds(texts), jaccard_threshold=0.5).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)


def test_minhash_lsh_degenerate_bucket_bounded(ray_session):
    """One mass-duplicated template doc (the exact thing near-dedup
    exists for) must not pin a task in a quadratic Python loop: with a
    small group_cap the bucket sub-splits / tiles and completes fast,
    emitting every identical-signature pair (est=1.0) plus the planted
    near-pair."""
    import time

    n_dup = 2000
    texts = [BASE] * n_dup + [BASE + " minor change", "unrelated document " * 5]
    t0 = time.monotonic()
    out = minhash_lsh_pairs(
        _docs_ds(texts), jaccard_threshold=0.5, group_cap=256
    ).to_pandas()
    elapsed = time.monotonic() - t0
    assert elapsed < 120, f"degenerate bucket took {elapsed:.1f}s"
    # all C(n_dup,2) identical pairs present with est exactly 1.0
    ident = out[(out["a"] < n_dup) & (out["b"] < n_dup)]
    assert len(ident) == n_dup * (n_dup - 1) // 2
    assert (ident["est_jaccard"] == 1.0).all()
    # the planted near-pair still found (doc n_dup vs any template doc)
    assert ((out["a"] == 0) & (out["b"] == n_dup)).any() or (
        (out["b"] == n_dup) & (out["a"] < n_dup)
    ).any()


# -- simhash -----------------------------------------------------------------


def test_simhash_near_dups_close():
    sh = SimHasher()
    a = sh.simhash(BASE)
    b = sh.simhash(BASE + " tail")
    c = sh.simhash("completely different text on another subject matter")
    assert bin(a ^ b).count("1") < bin(a ^ c).count("1")


# -- n-gram jaccard ----------------------------------------------------------


def test_ngram_jaccard():
    assert ngram_jaccard(BASE, BASE) == 1.0
    assert ngram_jaccard(BASE, "no overlap at all whatsoever here") == 0.0
    mid = ngram_jaccard(BASE, BASE + " small tail addition")
    assert 0.5 < mid < 1.0


# -- embedding near-dup ------------------------------------------------------


def test_embedding_near_dups_planted(ray_session):
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(50, 16)).astype(np.float32)
    vecs[7] = vecs[3] + rng.normal(scale=1e-3, size=16).astype(np.float32)
    ds = rd.from_arrow(
        pa.table({"vec_id": list(range(50)), "embedding": list(vecs)})
    )
    out = embedding_near_dups(ds, threshold=0.99).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    assert (3, 7) in pairs


# -- ANN ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(400, 32)).astype(np.float32)
    return (
        rd.from_arrow(pa.table({"vec_id": list(range(400)), "embedding": list(vecs)})),
        vecs,
    )


def test_brute_force_topk_exact(emb_ds):
    ds, vecs = emb_ds
    q = vecs[:2].astype(np.float64)
    out = brute_force_topk(ds, q, k=5).to_pylist()
    # verify against numpy ground truth
    normed = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = normed @ qn.T
    for qi in range(2):
        expect = list(np.argsort(-sims[:, qi])[:5])
        got = [r["vec_id"] for r in out if r["query_id"] == qi]
        assert got == expect


def test_ivf_topk_recall(emb_ds):
    ds, vecs = emb_ds
    q = vecs[:2].astype(np.float64)
    cents = train_ivf_centroids(ds, n_centroids=8)
    exact = brute_force_topk(ds, q, k=10).to_pylist()
    approx = ivf_topk(ds, q, cents, k=10, nprobe=4).to_pylist()
    for qi in range(2):
        e = {r["vec_id"] for r in exact if r["query_id"] == qi}
        a = {r["vec_id"] for r in approx if r["query_id"] == qi}
        assert len(e & a) >= 6  # ≥60% recall at nprobe=4/8


# -- text ops ----------------------------------------------------------------


def test_token_count_vectorized():
    batch = pa.table({"doc_id": [1, 2, 3], "text": ["a b  c", "", "  x  "]})
    out = token_count(batch).to_pylist()
    assert [r["n_tokens"] for r in out] == [3, 0, 1]


def test_quality_score_ppm_integers():
    batch = pa.table({"doc_id": [1], "text": ["ab, cd!"]})
    row = quality_score(batch).to_pylist()[0]
    assert row["n_chars"] == 7
    assert row["n_tokens"] == 2
    assert isinstance(row["alpha_ppm"], int)
    assert row["alpha_ppm"] == int(4 * 1_000_000 / 7)
    assert row["punct_ppm"] == int(2 * 1_000_000 / 7)


def test_lang_id():
    lid = LangId()
    out = lid(pa.table({
        "doc_id": [1, 2, 3],
        "text": [
            "the cat and the dog sat in a corner of the house",
            "der Hund und die Katze ist nicht mit dem Mann",
            "",
        ],
    })).to_pydict()
    assert out["lang_pred"] == ["en", "de", "und"]


def test_fingerprint_deterministic():
    from reffy_ray.ops.text import Fingerprint

    fp = Fingerprint()
    out1 = fp(pa.table({"doc_id": [1, 2, 3], "text": ["a b  c", "a b c", ""]}))
    out2 = fp(pa.table({"doc_id": [1, 2, 3], "text": ["a b  c", "a b c", ""]}))
    v1 = out1.column("fingerprint").to_pylist()
    assert v1 == out2.column("fingerprint").to_pylist()
    # whitespace-normalized: 'a b  c' and 'a b c' hash identically
    assert v1[0] == v1[1]
    assert v1[2] == 0
    big = fp(pa.table({"doc_id": [1], "text": ["xyz " * 30000]}))
    assert big.column("fingerprint").to_pylist()[0] > 0


def test_simhash_near_pairs_planted(ray_session):
    from reffy_ray.ops.dedup import simhash_near_pairs, simhash_table

    texts = [BASE, BASE + " tail", "completely different text on another matter " * 3]
    sigs = simhash_table(_docs_ds(texts))
    out = simhash_near_pairs(sigs, max_hamming=10).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)


# -- IVF inverted lists --------------------------------------------------------


def test_ivf_index_partition_pruned_probe(ray_session, tmp_path):
    import os

    import numpy as np
    import ray.data as rd

    from reffy_ray.ops.similarity import IVFIndex, brute_force_topk

    rng = np.random.default_rng(3)
    emb = rng.normal(size=(400, 16)).astype(np.float32)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": list(map(float, emb[i]))} for i in range(400)]
    )
    d = str(tmp_path / "ivf")
    idx = IVFIndex.build(ds, d, n_centroids=8, sample_rows=400)

    # inverted lists exist on disk as one directory per centroid
    parts = sorted(p for p in os.listdir(d) if p.startswith("centroid="))
    assert len(parts) >= 2

    queries = emb[:3].astype(np.float64)
    # pruned read: nprobe=1 must read strictly fewer rows than the corpus
    pruned = idx.probed_dataset(queries, nprobe=1)
    assert pruned.count() < 400

    # full probe == exhaustive == brute force (exact)
    full = idx.topk(queries, k=5, nprobe=8).to_pandas()
    ref = brute_force_topk(ds, queries, k=5).to_pandas()
    assert full[["query_id", "vec_id", "rank"]].values.tolist() == \
        ref[["query_id", "vec_id", "rank"]].values.tolist()

    # load() round-trips the centroids
    idx2 = IVFIndex.load(d)
    assert np.allclose(idx2.centroids, idx.centroids)

    # small-probe recall: self-query must find itself (cosine 1.0 lives
    # in the probed partition by construction)
    small = idx.topk(queries, k=5, nprobe=2).to_pandas()
    for qi in range(3):
        got = small[small["query_id"] == qi]
        assert int(got.iloc[0]["vec_id"]) == qi


def test_unigram_logppl_matches_manual(ray_session):
    import math

    import ray.data as rd

    from reffy_ray.ops.text import unigram_logppl

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["the cat sat on the mat", "the dog sat", ""]),
    })
    out = (
        unigram_logppl(rd.from_arrow(tbl))
        .to_pandas()
        .set_index("doc_id")["logppl"]
    )
    # corpus: the=3 cat=1 sat=2 on=1 mat=1 dog=1, T=9
    freq = {"the": 3, "cat": 1, "sat": 2, "on": 1, "mat": 1, "dog": 1}
    T = 9

    def manual(words):
        bits = sum(-math.log2(freq[w] / T) for w in words)
        return round(bits / len(words) * 1e4) / 1e4

    assert out.loc[1] == manual("the cat sat on the mat".split())
    assert out.loc[2] == manual("the dog sat".split())
    # rarer-vocab doc scores higher than common-vocab doc
    assert 3 not in out.index  # empty doc omitted


def test_semantic_dedup_keep_first_within_cell(ray_session):
    import numpy as np
    import ray.data as rd

    from reffy_ray.ops.dedup import semantic_dedup

    # cell is determined by dims 0-1: craft three vecs in ONE cell —
    # two nearly parallel (dropped keeps lower id), one orthogonal-ish
    base = np.zeros(8); base[0] = 0.01; base[1] = 0.01
    v1 = base.copy(); v1[2] = 1.0
    v2 = base.copy(); v2[2] = 0.99; v2[3] = 0.01       # cos(v1,v2)≈1
    v3 = base.copy(); v3[3] = 1.0                       # orthogonal to v1
    far = np.zeros(8); far[0] = 0.9; far[1] = 0.9; far[2] = 1.0  # other cell
    tbl = pa.table({
        "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
        "embedding": pa.array(
            [v1.tolist(), v2.tolist(), v3.tolist(), far.tolist()],
            pa.list_(pa.float32()),
        ),
    })
    kept = sorted(
        semantic_dedup(rd.from_arrow(tbl), threshold=0.9)
        .to_pandas()["vec_id"]
    )
    assert kept == [1, 3, 4]  # 2 dropped (earlier near-parallel 1)


def test_semantic_dedup_blockwise_matches_small_block(ray_session):
    import numpy as np
    import ray.data as rd

    from reffy_ray.ops.dedup import semantic_dedup

    rng = np.random.default_rng(7)
    emb = rng.normal(size=(60, 8)).astype(np.float32) * 0.05
    tbl = pa.table({
        "vec_id": pa.array(range(60), pa.int64()),
        "embedding": pa.array([r.tolist() for r in emb], pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl)
    a = sorted(semantic_dedup(ds, threshold=0.5).to_pandas()["vec_id"])
    b = sorted(semantic_dedup(ds, threshold=0.5, block=7).to_pandas()["vec_id"])
    assert a == b and 0 < len(a) <= 60


def test_lsh_pair_survives_hot_first_band(ray_session):
    """A pair whose FIRST matching band bucket is oversized (chunk-
    split) must still be emitted exactly once — from its first NON-HOT
    matching band (round-3 review finding: the old first-band gate
    dropped such pairs silently)."""
    import numpy as np
    import pandas as pd
    import ray

    from reffy_ray.ops.dedup import _lsh_bucket_fn

    bands, rpb = 3, 2

    def blob(vals):
        return np.array(vals, dtype=np.uint64).tobytes()

    X = blob([1, 2, 9, 9, 5, 5])
    Y = blob([1, 2, 9, 8, 5, 5])  # est 5/6 vs X; matches bands 0 and 2
    Z = blob([1, 2, 7, 7, 6, 6])  # band-0 bucket filler

    hot_ref = ray.put({(0, "1-2")})
    fn = _lsh_bucket_fn(bands, rpb, 0.7, group_cap=2, star=False,
                        hot_ref=hot_ref)

    def bucket(band, band_hash, members):
        return pd.DataFrame({
            "doc_id": list(members),
            "band": band,
            "band_hash": band_hash,
            "minhash": [m for m in members.values()],
        })

    out = pd.concat([
        fn(bucket(0, "1-2", {10: X, 11: Y, 12: Z})),  # hot, chunk-split
        fn(bucket(2, "5-5", {10: X, 11: Y})),          # clean second band
    ], ignore_index=True)
    pairs = set(zip(out["a"], out["b"]))
    assert (10, 11) in pairs
    assert list(pairs).count((10, 11)) == 1


def test_jaccard_pairs_exact(ray_session):
    import ray.data as rd

    from reffy_ray.ops.dedup import jaccard_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta"
    near = "alpha beta gamma delta epsilon zeta eta iota"
    rows = [
        {"doc_id": 1, "text": base, "source": "s0"},
        {"doc_id": 2, "text": near, "source": "s0"},
        {"doc_id": 3, "text": "totally different words here now", "source": "s0"},
        # same text as doc 1 but another block: never paired
        {"doc_id": 4, "text": base, "source": "s1"},
        {"doc_id": 5, "text": "tiny", "source": "s1"},  # < n tokens: no grams
    ]
    out = (
        jaccard_pairs(rd.from_items(rows), threshold_num=1, threshold_den=2)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    # base has 6 word-3-grams, near shares the first 5 → J = 5/7 ≥ 1/2
    assert out[["doc_a", "doc_b"]].values.tolist() == [[1, 2]]
    assert out.loc[0, "inter"] == 5
    assert out.loc[0, "union_size"] == 7


def test_jaccard_pairs_group_cap_raises(ray_session):
    import pytest as _pytest
    import ray.data as rd

    from reffy_ray.ops.dedup import jaccard_pairs

    rows = [
        {"doc_id": i, "text": f"word number {i} filler", "source": "hot"}
        for i in range(10)
    ]
    with _pytest.raises(Exception) as exc:
        jaccard_pairs(rd.from_items(rows), group_cap=5).to_pandas()
    assert "exact" in str(exc.value)


def test_hot_bucket_census_counts_keys_split_across_blocks(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.dedup import _bucket_census

    # one bucket with 12 distinct signatures spread over MANY blocks
    # (each per-block piece is tiny, only the cross-block sum exceeds
    # the cap) + a clearly cold bucket
    rows = [
        {"doc_id": i, "band": 0, "band_hash": "hot-key",
         "minhash": bytes([i])} for i in range(12)
    ] + [
        {"doc_id": 100 + i, "band": 1, "band_hash": "cold",
         "minhash": bytes([i % 2])} for i in range(4)
    ]
    exploded = rd.from_pandas(
        [pd.DataFrame(rows[i : i + 2]) for i in range(0, len(rows), 2)]
    )
    hot, pair_keys = _bucket_census(exploded, group_cap=10)
    assert hot == {(0, "hot-key")}
    # both multi-row buckets qualify as pair buckets, split or not
    assert pair_keys == {(0, "hot-key"), (1, "cold")}
    # below-cap key never flagged even when split
    hot2, _ = _bucket_census(exploded, group_cap=12)
    assert hot2 == set()


def test_quantize_embeddings_roundtrip(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from reffy_ray.ops.similarity import quantize_embeddings

    vecs = [
        [0.5, -1.0, 0.25],
        [0.0, 0.0, 0.0],       # zero vector: qvec all 0, scale 0
        [2.0, 1.0, -2.0],
    ]
    out = (
        quantize_embeddings(
            rd.from_arrow(pa.table({"vec_id": [0, 1, 2], "embedding": vecs}))
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert out.qvec[0].tolist() == [63, -127, 31]       # floor(v*127/1.0)
    assert out.qvec[1].tolist() == [0, 0, 0]
    assert out.scale_ppm.tolist() == [1_000_000, 0, 2_000_000]
    # reconstruction error bounded by one quantization step
    recon = np.array(out.qvec[2].tolist()) * (out.scale_ppm[2] / 1e6) / 127.0
    assert np.abs(recon - np.array(vecs[2])).max() <= 2.0 / 127.0 + 1e-9


def test_bigram_counts_cross_batch_and_empty_tokens(ray_session):
    import ray.data as rd

    from reffy_ray.ops.text import bigram_counts

    tbl = pa.table({
        "text": pa.array([
            "The cat -- the cat sat",   # punctuation splits; case folds
            "the cat",                  # cross-doc pair repeats
            "",                         # empty doc contributes nothing
            "one",                      # single token: no pair
        ]),
    })
    out = (
        bigram_counts(rd.from_arrow(tbl).repartition(3))
        .to_pandas()
        .set_index(["w1", "w2"])["n"]
        .to_dict()
    )
    # "--" collapses to one split: (cat, the) is adjacent in doc 0
    assert out == {
        ("the", "cat"): 3,
        ("cat", "the"): 1,
        ("cat", "sat"): 1,
    }


def test_dup_size_hist(ray_session):
    import ray.data as rd

    from reffy_ray.ops.dedup import dup_size_hist

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array(["a", "a", "a", "b", "b", "c"]),
    })
    out = (
        dup_size_hist(rd.from_arrow(tbl).repartition(2))
        .to_pandas()
        .set_index("sz")["n_clusters"]
        .to_dict()
    )
    assert out == {3: 1, 2: 1, 1: 1}


def test_vocab_size_by_lang_cross_batch_distinct(ray_session):
    import ray.data as rd

    from reffy_ray.ops.text import vocab_size_by_lang

    tbl = pa.table({
        "lang": pa.array(["en", "en", "fr", "fr"]),
        "text": pa.array([
            "the cat THE dog",   # case folds: the/cat/dog = 3
            "the bird",          # +bird = 4 (the already seen cross-batch)
            "le chat",
            "",                  # empty adds nothing
        ]),
    })
    out = (
        vocab_size_by_lang(rd.from_arrow(tbl).repartition(4))
        .to_pandas()
        .set_index("lang")["vocab"]
        .to_dict()
    )
    assert out == {"en": 4, "fr": 2}


def test_bigram_logppl_matches_manual(ray_session):
    import math

    import ray.data as rd

    from reffy_ray.ops.text import bigram_logppl

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "the cat sat the cat ran",
            "the cat sat",
            "one",                      # single token: no pairs, omitted
        ]),
    })
    out = (
        bigram_logppl(rd.from_arrow(tbl))
        .to_pandas()
        .set_index("doc_id")["logppl"]
    )
    # corpus pairs: (the,cat)x3 (cat,sat)x2 (sat,the)x1 (cat,ran)x1
    # contexts: the=3 cat=3 sat=1
    n = {("the", "cat"): 3, ("cat", "sat"): 2, ("sat", "the"): 1,
         ("cat", "ran"): 1}
    cn = {"the": 3, "cat": 3, "sat": 1}

    def manual(pairs):
        bits = sum(-math.log2(n[p] / cn[p[0]]) for p in pairs)
        return round(bits / len(pairs) * 1e4) / 1e4

    d1 = [("the", "cat"), ("cat", "sat"), ("sat", "the"),
          ("the", "cat"), ("cat", "ran")]
    d2 = [("the", "cat"), ("cat", "sat")]
    assert out.loc[1] == manual(d1)
    assert out.loc[2] == manual(d2)
    assert 3 not in out.index


def test_logppl_empty_and_pairless_corpora(ray_session):
    import ray.data as rd

    from reffy_ray.ops.text import bigram_logppl, unigram_logppl

    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))
    assert unigram_logppl(empty).count() == 0
    assert bigram_logppl(empty).count() == 0
    # non-empty docs but no adjacent pair anywhere
    pairless = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["one", ""]),
    }))
    assert bigram_logppl(pairless).count() == 0


def test_char_entropy_known_values(ray_session):
    import math

    from reffy_ray.ops.text import char_entropy

    batch = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "aaaa",      # single symbol: 0 bits
            "ab",        # uniform over 2: 1 bit
            "aab",       # 2/3,1/3
            "",          # empty: omitted
        ]),
    })
    out = char_entropy(batch).to_pandas().set_index("doc_id")["entropy"]
    assert out.loc[1] == 0.0
    assert out.loc[2] == 1.0
    expect = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert out.loc[3] == round(expect * 1e4) / 1e4
    assert 4 not in out.index
    # unicode: 4 distinct code points, uniform -> 2 bits
    uni = pa.table({"doc_id": pa.array([9], pa.int64()),
                    "text": pa.array(["héλ🎈"])})
    assert char_entropy(uni).to_pandas()["entropy"].iloc[0] == 2.0


def test_sessionize_stitches_across_blocks(ray_session):
    from reffy_ray.ops.window import sessionize

    # user 1: gaps 5, 50, 5 with gap threshold 10 -> sessions (2, 2) ev
    # user 2: one event; user 3: gaps 11, 11 -> three 1-event sessions
    rows = [
        (1, 0), (1, 5), (1, 55), (1, 60),
        (2, 7),
        (3, 0), (3, 11), (3, 22),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
    })
    # many tiny blocks so session runs cross block boundaries
    ds = rd.from_arrow(t).repartition(6)
    out = (
        sessionize(ds, gap_us=10)
        .to_pandas()
        .sort_values(["user_id", "session_seq"])
        .reset_index(drop=True)
    )
    got = list(map(tuple, out.to_numpy()))
    assert got == [
        (1, 1, 2, 0, 5), (1, 2, 2, 55, 60),
        (2, 1, 1, 7, 7),
        (3, 1, 1, 0, 0), (3, 2, 1, 11, 11), (3, 3, 1, 22, 22),
    ]


def test_cohort_retention_triangle(ray_session):
    from reffy_ray.ops.stats import WEEK_US, cohort_retention

    # cohort week 0: users 1,2 active weeks {0,1} and {0} resp.;
    # cohort week 1: user 3 active weeks {1, 3}
    rows = [(1, 0), (1, 1), (2, 0), (3, 1), (3, 3)]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(
            [r[1] * WEEK_US + 17 for r in rows], pa.timestamp("us")
        ),
    })
    out = (
        cohort_retention(rd.from_arrow(t))
        .to_pandas()
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    got = list(map(tuple, out.to_numpy()))
    assert got == [(0, 0, 2), (0, 1, 1), (1, 0, 1), (1, 2, 1)]


def test_line_dedup_keep_first(ray_session):
    from reffy_ray.ops.curation import line_dedup

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "alpha\nbeta\n\ngamma",
            "beta\ndelta\nalpha",   # alpha/beta lose to doc 0
            "alpha\nbeta",          # fully duplicate -> empty text
            "",                     # empty doc survives as-is
        ]),
    })
    out = (
        line_dedup(rd.from_arrow(docs))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["text"]) == ["alpha\nbeta\n\ngamma", "delta", "", ""]
    assert list(out["n_removed"]) == [0, 2, 2, 0]


def test_bm25_known_values(ray_session):
    import math

    import ray.data as rd

    from reffy_ray.ops.text import bm25_scores

    docs = [
        (0, "cat dog cat"),       # tf(cat)=2, dl=3
        (1, "dog dog dog dog"),   # no query hit
        (2, "cat bird"),          # tf(cat)=1, dl=2
        (3, "fish"),              # no query hit
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    })).repartition(3)
    out = (
        bm25_scores(ds, terms=("cat",))
        .to_pandas()
        .set_index("doc_id")["bm25_e6"]
    )
    # manual BM25: N=4, df(cat)=2, avgdl=(3+4+2+1)/4
    idf = round(math.log((4 - 2 + 0.5) / (2 + 0.5) + 1.0), 6)
    avgdl = 10 / 4
    k1, b = 1.2, 0.75

    def score(tf, dl):
        s = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        return math.floor(s * 1e6 + 0.5)

    assert sorted(out.index) == [0, 2]
    assert out.loc[0] == score(2, 3)
    assert out.loc[2] == score(1, 2)


def test_bm25_empty_corpus(ray_session):
    import ray.data as rd

    from reffy_ray.ops.text import bm25_scores

    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))
    assert bm25_scores(empty, terms=("cat",)).count() == 0


def test_lang_fertility_exact_sums(ray_session):
    import ray.data as rd

    from reffy_ray.ops.text import lang_fertility

    tbl = pa.table({
        "text": pa.array(["ab cd!", "x1 y,z", "een twee"], pa.string()),
        "lang": pa.array(["en", "en", "nl"], pa.string()),
    })
    out = (
        lang_fertility(rd.from_arrow(tbl).repartition(2))
        .to_pandas()
        .set_index("lang")
        .sort_index()
    )
    # en: words: ab,cd + x1,y,z -> 2+3=5; bpe: ab,cd,! + x,1,y,',',z -> 3+5=8
    assert out.loc["en"].tolist() == [2, 5, 8]
    # nl: een twee -> 2 words, 2 bpe
    assert out.loc["nl"].tolist() == [1, 2, 2]


def test_tfidf_terms_integer_ranking(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.text import tfidf_terms

    df = pd.DataFrame(
        {
            "doc_id": pd.Series([0, 1, 2], dtype="int64"),
            # 'common' in all docs (df=3); 'rare' only in doc 0 (df=1)
            "text": [
                "common rare rare",
                "common common other",
                "common other other",
            ],
        }
    )
    out = tfidf_terms(rd.from_pandas(df).repartition(2), k=2).to_pandas()
    d0 = out[out["doc_id"] == 0].sort_values("score", ascending=False)
    # doc 0: rare tf=2 df=1 -> 2e6; common tf=1 df=3 -> 333333
    assert d0["token"].tolist() == ["rare", "common"]
    assert d0["score"].tolist() == [2_000_000, 333_333]


def test_rare_gram_pairs_blocking(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.dedup import rare_gram_pairs

    # docs 0 and 1 share two rare trigrams; doc 2 shares only one with
    # doc 0; 'x y z' appears in 6 docs -> dropped by max_df=5
    common = " ".join(f"x y z w{i}" for i in range(1))
    df = pd.DataFrame(
        {
            "doc_id": pd.Series(range(8), dtype="int64"),
            "text": [
                "alpha beta gamma delta epsilon " + common,
                "alpha beta gamma delta epsilon zeta " + common,
                "alpha beta gamma other stuff here " + common,
                "unrelated text entirely one " + common,
                "unrelated text entirely two " + common,
                "unrelated text entirely three " + common,
                "something else altogether here now",
                "completely different content words",
            ],
        }
    )
    out = rare_gram_pairs(
        rd.from_pandas(df).repartition(3), n=3, max_df=5, min_shared=2
    ).to_pandas()
    pairs = {(r.a, r.b): r.shared for r in out.itertuples()}
    # docs 0,1 share 'alpha beta gamma','beta gamma delta','gamma delta epsilon'
    assert pairs[(0, 1)] >= 3
    assert (0, 2) in pairs or pairs.get((0, 2), 0) >= 0  # shares fewer
    # 3,4,5 share 'unrelated text entirely' (df=3, rare) but only 1 gram
    assert (3, 4) not in pairs


def test_pivot_counts_crosstab(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.stats import pivot_counts

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 3],
            "event_type": ["click", "click", "view", "view", "purchase", "click"],
        }
    )
    out = (
        pivot_counts(
            rd.from_pandas(df).repartition(3),
            key_col="user_id",
            cat_col="event_type",
            categories=["click", "purchase", "view"],
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out["n_click"].tolist() == [2, 0, 1]
    assert out["n_purchase"].tolist() == [0, 1, 0]
    assert out["n_view"].tolist() == [1, 1, 0]
    assert all(str(out[c].dtype) == "int64" for c in out.columns)


def test_pivot_counts_derives_categories(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.stats import pivot_counts

    df = pd.DataFrame({"k": [1, 2], "c": ["b", "a"]})
    out = pivot_counts(rd.from_pandas(df), key_col="k", cat_col="c").to_pandas()
    assert sorted(out.columns) == ["k", "n_a", "n_b"]


def test_rollup_agg_levels(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.stats import rollup_agg

    df = pd.DataFrame(
        {
            "a": ["x", "x", "y", "y"],
            "b": ["p", "q", "p", "p"],
            "v": pd.Series([1, 2, 3, 4], dtype="int64"),
        }
    )
    out = rollup_agg(
        rd.from_pandas(df).repartition(2), dims=["a", "b"], value_col="v"
    ).to_pandas()
    got = {(r.a, r.b): (r.s, r.n) for r in out.itertuples()}
    assert got[("x", "p")] == (1, 1)
    assert got[("x", "q")] == (2, 1)
    assert got[("y", "p")] == (7, 2)
    assert got[("x", "ALL")] == (3, 2)
    assert got[("y", "ALL")] == (7, 2)
    assert got[("ALL", "ALL")] == (10, 4)
    assert len(got) == 6


def test_cumulative_agg_carry_across_blocks(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.window import cumulative_agg

    # one user spanning many blocks plus a second short user
    n = 50
    df = pd.DataFrame(
        {
            "event_id": pd.Series(range(n + 2), dtype="int64"),
            "ts": pd.to_datetime(
                [f"2024-01-01 00:{i:02d}:00" for i in range(n)]
                + ["2024-01-01 00:00:00", "2024-01-01 00:01:00"]
            ),
            "user_id": pd.Series([7] * n + [9, 9], dtype="int64"),
            "value_i": pd.Series(list(range(n)) + [10, 20], dtype="int64"),
        }
    )
    out = (
        cumulative_agg(rd.from_pandas(df).repartition(8))
        .to_pandas()
        .sort_values(["user_id", "t_us"])
        .reset_index(drop=True)
    )
    u7 = out[out["user_id"] == 7]
    import numpy as np

    assert u7["cum_sum"].tolist() == np.cumsum(np.arange(n)).tolist()
    assert u7["cum_n"].tolist() == list(range(1, n + 1))
    u9 = out[out["user_id"] == 9]
    assert u9["cum_sum"].tolist() == [10, 30]
    assert u9["cum_n"].tolist() == [1, 2]


def test_distinct_count_exact(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.stats import distinct_count

    df = pd.DataFrame(
        {
            "g": ["a", "a", "a", "b", "b", "b", "b"],
            "v": [1, 1, 2, 5, 5, 5, 6],
        }
    )
    out = (
        distinct_count(rd.from_pandas(df).repartition(4), by="g", value="v")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert out["g"].tolist() == ["a", "b"]
    assert out["n_distinct"].tolist() == [2, 2]


def test_rrf_fuse_ranks_and_missing_side(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.similarity import rrf_fuse

    a = pd.DataFrame({"doc_id": [1, 2, 3], "score": [30, 20, 10]})
    b = pd.DataFrame({"doc_id": [2, 3, 4], "score": [5, 9, 1]})
    out = (
        rrf_fuse(
            rd.from_pandas(a).repartition(2),
            rd.from_pandas(b).repartition(2),
            id_col="doc_id",
            score_col="score",
            k=60,
            scale=10**12,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = {
        int(r.doc_id): (int(r.fused), int(r.rank_a), int(r.rank_b))
        for r in out.itertuples()
    }
    s = 10**12
    # list a ranks: 1->1, 2->2, 3->3 ; list b ranks: 3->1, 2->2, 4->3
    assert got[1] == (s // 61, 1, -1)
    assert got[2] == (s // 62 + s // 62, 2, 2)
    assert got[3] == (s // 63 + s // 61, 3, 1)
    assert got[4] == (s // 63, -1, 3)


def test_er_verified_pairs(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.dedup import er_verified_pairs

    near_a = "the quick brown fox jumps over the lazy dog near the river bank"
    near_b = "the quick brown fox jumps over the lazy dog near the river shore"
    df = pd.DataFrame(
        {
            "doc_id": pd.Series(range(5), dtype="int64"),
            "text": [
                near_a,
                near_b,
                "completely different text about other topics entirely here",
                "yet another unrelated document with its own words inside",
                "final filler document mentioning nothing shared at all",
            ],
        }
    )
    out = er_verified_pairs(
        rd.from_pandas(df).repartition(2), threshold_num=30, threshold_den=100
    ).to_pandas()
    got = {(r.a, r.b): (r.inter, r.uni) for r in out.itertuples()}
    assert (0, 1) in got
    inter, uni = got[(0, 1)]
    assert inter * 100 >= uni * 30
    assert len(got) == 1


def test_max_concurrency_sweep_line(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.window import max_concurrency

    # type A: three intervals overlapping pairwise in a chain — at
    # t=25 two are open; the third opens at t=70 after #1 closed.
    # End-exclusive: an event at t=60 does NOT overlap one at t=0.
    base = pd.Timestamp("2024-01-01")
    s = lambda x: base + pd.Timedelta(seconds=x)
    df = pd.DataFrame(
        {
            "event_id": range(6),
            "event_type": ["A", "A", "A", "B", "B", "B"],
            "ts": [s(0), s(25), s(60), s(0), s(10), s(20)],
        }
    )
    out = (
        max_concurrency(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .set_index("event_type")["max_conc"]
    )
    assert out["A"] == 2  # t=25..60 has events 0 and 1; t=60 closes 0
    assert out["B"] == 3  # all three 60s intervals open at t=20


def test_rolling_distinct_window(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.window import rolling_distinct

    base = pd.Timestamp("2024-01-01")
    d = lambda k: base + pd.Timedelta(days=k)
    df = pd.DataFrame(
        {
            # user 1 on day0, user 2 on day0+day3, user 3 on day10
            "user_id": [1, 2, 2, 3],
            "ts": [d(0), d(0), d(3), d(10)],
        }
    )
    out = (
        rolling_distinct(rd.from_pandas(df).repartition(2))
        .to_pandas()
        .set_index("day_num")["users_w"]
    )
    day0 = int((base - pd.Timestamp("1970-01-01")).days)
    assert out[day0] == 2        # users 1,2 on day0
    assert out[day0 + 3] == 2    # day3 window [day-3..day3] covers day0
    assert out[day0 + 10] == 1   # day10 window excludes day3 (gap > 6)
    assert set(out.index) == {day0, day0 + 3, day0 + 10}


def test_pair_lift_integer_math(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.stats import pair_lift

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 2, 3, 4],
            "event_type": ["a", "b", "a", "b", "a", "c"],
        }
    )
    out = pair_lift(rd.from_pandas(df).repartition(2)).to_pandas()
    got = {(r.e1, r.e2): (r.support, r.lift_ppm) for r in out.itertuples()}
    # support(a,b)=2, n_users=4, cnt_a=3, cnt_b=2 -> 2*4*1e6//6
    assert got[("a", "b")] == (2, 2 * 4 * 1_000_000 // 6)
    # zero-support pairs (a,c)/(b,c) are not emitted
    assert ("a", "c") not in got and ("b", "c") not in got


def test_activity_streaks_islands(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.window import activity_streaks

    base = pd.Timestamp("2024-03-01")
    d = lambda k: base + pd.Timedelta(days=k)
    df = pd.DataFrame(
        {
            # user 1: days 0,1,2 then 5,6 -> max streak 3 (dup on day 1)
            # user 2: days 0, 2, 4 -> max streak 1
            "user_id": [1, 1, 1, 1, 1, 1, 2, 2, 2],
            "ts": [d(0), d(1), d(1), d(2), d(5), d(6), d(0), d(2), d(4)],
        }
    )
    out = (
        activity_streaks(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .set_index("user_id")["max_streak"]
    )
    assert out[1] == 3
    assert out[2] == 1


def test_inverted_index_rare_terms(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.text import inverted_index

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "alpha beta common",
                "beta common",
                "common alpha",
                "common gamma",
                "common",
            ],
        }
    )
    out = inverted_index(
        rd.from_pandas(df).repartition(2), max_df=3
    ).to_pandas().set_index("term")
    assert out.loc["alpha", "postings"] == "1,3"
    assert out.loc["alpha", "df"] == 2
    assert out.loc["beta", "postings"] == "1,2"
    assert out.loc["gamma", "postings"] == "4"
    assert "common" not in out.index  # df=5 > max_df


def test_ab_test_summary_deterministic(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.sampling import _h64, ab_test_summary

    users = list(range(40))
    rows = []
    for u in users:
        rows.append({"user_id": u, "event_type": "view"})
        if u % 3 == 0:
            rows.append({"user_id": u, "event_type": "purchase"})
    df = pd.DataFrame(rows)
    out = (
        ab_test_summary(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .set_index("arm")
    )
    exp = {"A": [0, 0], "B": [0, 0]}
    for u in users:
        arm = "A" if _h64(f"{u}|ab-42") % 10000 < 5000 else "B"
        exp[arm][0] += 1
        exp[arm][1] += 1 if u % 3 == 0 else 0
    for arm in ("A", "B"):
        n, c = exp[arm]
        assert out.loc[arm, "n_users"] == n
        assert out.loc[arm, "converters"] == c
        assert out.loc[arm, "conv_ppm"] == c * 1_000_000 // n


def test_share_of_total_integer_ppm(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.stats import share_of_total

    df = pd.DataFrame(
        {
            "k": ["a", "a", "b", "c"],
            "cents": pd.Series([100, 200, 300, 400], dtype="int64"),
        }
    )
    out = (
        pd.DataFrame(
            share_of_total(
                rd.from_pandas(df).repartition(2), key_col="k", value_col="cents"
            ).to_pydict()
        )
        .set_index("k")
    )
    assert out.loc["a", "key_sum"] == 300
    assert out.loc["a", "share_ppm"] == 300 * 1_000_000 // 1000
    assert out.loc["c", "share_ppm"] == 400 * 1_000_000 // 1000
    assert list(out.index) == ["a", "b", "c"]  # sorted


def test_edit_distance_pairs_banded(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.dedup import edit_distance_pairs

    a = "the quick brown fox jumps over the lazy dog by the river"
    b = a.replace("dog", "dot")  # distance 1 within the 64-char prefix
    df = pd.DataFrame(
        {
            "doc_id": pd.Series([1, 2, 3], dtype="int64"),
            "text": [a, b, "entirely unrelated words in this one here today"],
        }
    )
    out = edit_distance_pairs(
        rd.from_pandas(df).repartition(2), max_dist=10
    ).to_pandas()
    got = {(r.a, r.b): r.dist for r in out.itertuples()}
    assert got == {(1, 2): 1}


def test_edit_distance_banded_dp_exact():
    import itertools

    from reffy_ray.ops.dedup import _lev_banded

    def ref(a, b):
        m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(len(a) + 1):
            m[i][0] = i
        for j in range(len(b) + 1):
            m[0][j] = j
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                m[i][j] = min(
                    m[i - 1][j] + 1,
                    m[i][j - 1] + 1,
                    m[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                )
        return m[len(a)][len(b)]

    words = ["", "a", "ab", "abc", "kitten", "sitting", "flaw", "lawn",
             "saturday", "sunday"]
    for a, b in itertools.product(words, repeat=2):
        for k in (1, 3, 6):
            exp = ref(a, b)
            got = _lev_banded(a, b, k)
            assert got == (exp if exp <= k else k + 1), (a, b, k, got, exp)


def test_pareto_front_dominance(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.stats import pareto_front

    df = pd.DataFrame(
        {
            "k": ["a"] * 5 + ["b"] * 2,
            # a: (10,5) dominates (10,7) and (8,6); (12,9) and (10,5)
            # are both on the frontier; duplicate (10,5) collapses
            "x": [10, 10, 8, 12, 10, 1, 2],
            "y": [5, 7, 6, 9, 5, 1, 1],
        }
    )
    out = pareto_front(
        rd.from_pandas(df).repartition(3), by="k", max_col="x", min_col="y"
    ).to_pandas()
    a = set(map(tuple, out[out["k"] == "a"][["x", "y"]].to_numpy()))
    b = set(map(tuple, out[out["k"] == "b"][["x", "y"]].to_numpy()))
    assert a == {(12, 9), (10, 5)}
    # b: (2,1) dominates (1,1) (equal y, larger x)
    assert b == {(2, 1)}


def test_decayed_score_bitshift(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.stats import decayed_score

    day = 86_400_000_000
    ref = 10 * day
    df = pd.DataFrame(
        {
            "k": ["x", "x", "x", "y"],
            # ages: 0 days, 1 day, 2.5 days (->2), future (clamped 0)
            "t": [ref, ref - day, ref - (5 * day) // 2, ref + day],
            "v": [100, 100, 100, 7],
        }
    )
    out = (
        decayed_score(
            rd.from_pandas(df).repartition(2),
            by="k", ts_col="t", value_col="v", ref_us=ref,
            half_life_us=day,
        )
        .to_pandas()
        .set_index("k")["decayed"]
    )
    assert out["x"] == 100 + 50 + 25
    assert out["y"] == 7


def test_hll_distinct_exact_registers(ray_session):
    import hashlib

    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.stats import hll_distinct

    vals = [f"u{i}" for i in range(500)]
    df = pd.DataFrame({"v": vals * 2})  # duplicates must not matter
    out = hll_distinct(
        rd.from_pandas(df).repartition(4),
        lambda b: [str(x) for x in b.column("v").to_pylist()],
        m=64,
    ).to_pydict()
    # recompute registers serially
    regs = [0] * 64
    for v in vals:
        h = int.from_bytes(hashlib.md5(v.encode()).digest()[:8], "big")
        bkt, rest = h >> 58, h & ((1 << 58) - 1)
        rho = 58 - rest.bit_length() + 1
        regs[bkt] = max(regs[bkt], rho)
    s = sum(1 << (64 - r) for r in regs)
    est = 709_000 * 64 * 64 * (1 << 64) // (1_000_000 * s)
    assert out["estimate"][0] == est
    assert out["n_zero"][0] == sum(1 for r in regs if r == 0)
    # raw HLL at m=64 is ~13% accurate; sanity-band the estimate
    assert 300 < out["estimate"][0] < 800


def test_interval_coalesce_islands(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.window import interval_coalesce

    df = pd.DataFrame(
        {
            "u": [1, 1, 1, 1, 2],
            # [0,10) [5,8) [10,12) touch/overlap -> one island [0,12);
            # [20,21) separate. The long first interval must carry the
            # running max end PAST the short second one.
            "t": [0, 5, 10, 20, 0],
            "d": [10, 3, 2, 1, 4],
        }
    )
    out = interval_coalesce(
        rd.from_pandas(df).repartition(2), by="u", ts_col="t", dur_col="d"
    ).to_pandas()
    u1 = out[out["u"] == 1].sort_values("island_seq")
    assert list(u1["start_us"]) == [0, 20]
    assert list(u1["end_us"]) == [12, 21]
    assert list(u1["n_events"]) == [3, 1]
    u2 = out[out["u"] == 2]
    assert list(u2["end_us"]) == [4]


def test_containment_directed(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.dedup import containment_pairs

    short = "alpha beta gamma delta epsilon zeta"
    long = short + " eta theta iota kappa " + "x y z " * 10
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [short, long, "unrelated words only here nothing"],
        }
    )
    out = containment_pairs(
        rd.from_pandas(df).repartition(2),
        max_df=3, min_shared=2, threshold_num=1, threshold_den=2,
    ).to_pandas()
    pairs = set(map(tuple, out[["src", "dst"]].to_numpy()))
    # every trigram of `short` is in `long`: 1 contained-in 2
    assert (1, 2) in pairs
    # but long is NOT half-contained in short
    assert (2, 1) not in pairs


def test_bpe_merges_greedy_on_known_corpus(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.text import bpe_merges

    # corpus: "ab" x3, "abc" x2 -> round 0 merges ('a','b') count 5;
    # round 1 merges ('ab','c') count 2; then nothing pairable.
    ds = rd.from_pandas(
        pd.DataFrame({"text": ["ab ab ab", "abc abc"]})
    )
    got = bpe_merges(ds, merges=4).to_pandas()
    assert list(got["merged"]) == ["ab", "abc"]
    assert list(got["pair_count"]) == [5, 2]
    assert list(got["step"]) == [0, 1]


def test_bpe_merges_shared_boundary_not_double_merged(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.text import bpe_merges

    # 'xyxy' -> ' x y x y ': the replace-scan merges only the first
    # 'x y' (shared boundary space), leaving ' xy x y ' — so round 1's
    # top pair is ('xy','x') or ('y','x')... count check pins it.
    ds = rd.from_pandas(pd.DataFrame({"text": ["xyxy"]}))
    got = bpe_merges(ds, merges=1).to_pandas()
    assert list(got["merged"]) == ["xy"]
    assert list(got["pair_count"]) == [2]  # both adjacencies counted

"""Unit tests for ops/curation (decontaminate, pii_redact,
gopher_quality, normalize_text) and the new sampling/similarity ops
(top_k_per_group, knn_join) on planted inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(rows):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(rows))


def test_decontaminate_drops_exact_ngram_overlap(ray_session):
    from reffy_ray.ops.curation import decontaminate

    bench = _ds(
        [{"doc_id": 100, "source": "b", "text": "the quick brown fox jumps over"}]
    )
    train = _ds(
        [
            # contains "quick brown fox jumps" (4-gram of the bench doc)
            {"doc_id": 1, "source": "s", "text": "a quick brown fox jumps away"},
            # shares only a trigram ("quick brown fox" then "dog") — clean at n=4
            {"doc_id": 2, "source": "s", "text": "a quick brown fox dog here now"},
            {"doc_id": 3, "source": "s", "text": "entirely different words appear here today"},
            # case/punctuation-insensitive: tokens lowercased, \w+ split
            {"doc_id": 4, "source": "s", "text": "The QUICK, brown FOX jumps!"},
        ]
    )
    out = decontaminate(train, bench, n=4).to_pandas()
    assert sorted(out["doc_id"]) == [2, 3]
    assert list(out.columns) == ["doc_id", "source"]


def test_decontaminate_short_docs_pass(ray_session):
    from reffy_ray.ops.curation import decontaminate

    bench = _ds([{"doc_id": 9, "source": "b", "text": "one two three four"}])
    train = _ds(
        [
            {"doc_id": 1, "source": "s", "text": "one two three"},  # < n tokens
            {"doc_id": 2, "source": "s", "text": ""},
            {"doc_id": 3, "source": "s", "text": "one two three four"},  # exact
        ]
    )
    out = decontaminate(train, bench, n=4).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2]


def test_pii_redact_masks_and_counts(ray_session):
    from reffy_ray.ops.curation import pii_redact

    ds = _ds(
        [
            {
                "doc_id": 1,
                "text": "mail bob.smith+x@corp-mail.co.uk or 10.2.3.44 or 555-123-4567 ok",
            },
            {"doc_id": 2, "text": "no pii here"},
        ]
    )
    out = pii_redact(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "text"] == "mail <EMAIL> or <IP> or <PHONE> ok"
    assert (
        out.loc[0, ["n_email", "n_ip", "n_phone"]].tolist() == [1, 1, 1]
    )
    assert out.loc[1, "text"] == "no pii here"
    assert out.loc[1, ["n_email", "n_ip", "n_phone"]].tolist() == [0, 0, 0]


def test_gopher_quality_gates(ray_session):
    from reffy_ray.ops.curation import gopher_quality

    long_ok = " ".join(["word"] * 30)
    too_short = "only three words"
    weird_len = " ".join(["a"] * 40)  # mean word len 1 < 2.0
    out = (
        gopher_quality(
            _ds(
                [
                    {"doc_id": 1, "text": long_ok},
                    {"doc_id": 2, "text": too_short},
                    {"doc_id": 3, "text": weird_len},
                    {"doc_id": 4, "text": ""},
                ]
            ),
            min_words=16,
        )
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "keep"] == 1
    assert out.loc[1, "n_words"] == 30
    assert out.loc[1, "mean_word_len_ppm"] == 4_000_000
    assert out.loc[2, "keep"] == 0
    assert out.loc[3, "keep"] == 0
    assert out.loc[4, "keep"] == 0 and out.loc[4, "n_words"] == 0


def test_normalize_text(ray_session):
    from reffy_ray.ops.curation import normalize_text

    out = (
        normalize_text(_ds([{"doc_id": 1, "text": "  Hello\t WORLD  \n x "}]))
        .to_pandas()
    )
    assert out.loc[0, "text"] == "hello world x"


def test_top_k_per_group_deterministic_ties(ray_session):
    from reffy_ray.ops.sampling import top_k_per_group

    rows = [
        {"doc_id": i, "source": f"s{i % 2}", "n_chars": 10 * (i % 3)}
        for i in range(12)
    ]
    out = (
        top_k_per_group(_ds(rows), k=2)
        .to_pandas()
        .sort_values(["source", "n_chars", "doc_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    # s0: ids 0,2,4,6,8,10 with n_chars 0,20,10,0,20,10 → top2 = 2,8 (20)
    # s1: ids 1,3,5,7,9,11 with n_chars 10,0,20,10,0,20 → top2 = 5,11 (20)
    assert out[out.source == "s0"]["doc_id"].tolist() == [2, 8]
    assert out[out.source == "s1"]["doc_id"].tolist() == [5, 11]


def test_knn_join_exact_neighbors(ray_session):
    from reffy_ray.ops.similarity import knn_join

    # four unit vectors: 0/1 nearly parallel, 2 orthogonal, 3 anti
    emb = [
        [1.0, 0.0],
        [0.999, 0.045],
        [0.0, 1.0],
        [-1.0, 0.0],
    ]
    ds = _ds([{"vec_id": i, "embedding": e} for i, e in enumerate(emb)])
    out = knn_join(ds, k=1).to_pandas().sort_values("vec_id")
    assert out["neighbor_id"].tolist() == [1, 0, 1, 2]


def test_knn_join_guard(ray_session):
    from reffy_ray.ops.similarity import knn_join

    ds = _ds([{"vec_id": i, "embedding": [1.0, 0.0]} for i in range(10)])
    with pytest.raises(ValueError, match="exact"):
        knn_join(ds, k=1, max_rows=5)


def test_repetition_stats_planted(ray_session):
    from reffy_ray.ops.curation import repetition_stats

    ds = _ds(
        [
            # 4 lines, "dup dup" twice -> 2 distinct, dup frac 0.5
            {"doc_id": 1, "text": "dup dup\nunique line\ndup dup\nother text"},
            # no repetition at all; long enough that the top bigram
            # (delta epsilon, 12 chars of 86) stays under the 18% gate
            {
                "doc_id": 2,
                "text": "alpha beta\ngamma delta epsilon zeta eta theta iota "
                "kappa lambda mu nu xi omicron pi rho sigma tau upsilon",
            },
            # dominant bigram: "x y" repeated
            {"doc_id": 3, "text": "x y x y x y x y"},
            {"doc_id": 4, "text": ""},
        ]
    )
    out = repetition_stats(ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_lines"] == 4
    assert out.loc[1, "dup_line_frac_ppm"] == 250_000  # (4-3)/4
    # dup chars: one extra "dup dup" (7 chars) / 7+11+7+10 = 35
    assert out.loc[1, "dup_line_char_frac_ppm"] == 7 * 1_000_000 // 35
    assert out.loc[2, "dup_line_frac_ppm"] == 0
    assert out.loc[2, "keep"] == 1
    # doc 3: bigrams (x,y)x4, (y,x)x3 -> best 4*2=8, denom 8 -> 1.0
    assert out.loc[3, "top_bigram_frac_ppm"] == 1_000_000
    assert out.loc[3, "keep"] == 0
    assert out.loc[4, "n_lines"] == 0 and out.loc[4, "keep"] == 0


def test_chunk_tokens_windows(ray_session):
    from reffy_ray.ops.curation import chunk_tokens

    text = " ".join(f"w{i}" for i in range(10))
    out = (
        chunk_tokens(_ds([{"doc_id": 1, "text": text}]), window=4, stride=3)
        .to_pandas()
        .sort_values("chunk_id")
        .reset_index(drop=True)
    )
    # starts 0,3,6,9 -> windows [0:4],[3:7],[6:10],[9:10]
    assert out["chunk_id"].tolist() == [0, 1, 2, 3]
    assert out["n_tokens"].tolist() == [4, 4, 4, 1]
    assert out.loc[0, "chunk_text"] == "w0 w1 w2 w3"
    assert out.loc[3, "chunk_text"] == "w9"


def test_chunk_tokens_empty_doc(ray_session):
    from reffy_ray.ops.curation import chunk_tokens

    out = chunk_tokens(
        _ds([{"doc_id": 1, "text": ""}, {"doc_id": 2, "text": "a b"}]), window=8
    ).to_pandas()
    assert out["doc_id"].tolist() == [2]


def test_temperature_mix_flattens_skew(ray_session):
    import math

    from reffy_ray.ops.sampling import temperature_mix

    # 320 hot docs, 4 cold sources of 20 each
    rows = [{"doc_id": i, "source": "hot"} for i in range(320)] + [
        {"doc_id": 1000 + i, "source": f"c{i % 4}"} for i in range(80)
    ]
    out = temperature_mix(_ds(rows), alpha=0.5, keep_frac=0.5).to_pandas()
    got = out.groupby("source").size()
    # exact expected rates: K=200, w=isqrt(c): hot 17, cold 4 each
    w_sum = math.isqrt(320) + 4 * math.isqrt(20)
    hot_rate = min(1.0, (200 * math.isqrt(320) // w_sum) * 1e6 // 320 / 1e6)
    cold_rate = min(1.0, (200 * math.isqrt(20) // w_sum) * 1e6 // 20 / 1e6)
    # hot is downsampled much harder than cold
    assert hot_rate < cold_rate
    assert got["hot"] / 320 < 0.55 * (got[["c0", "c1", "c2", "c3"]].sum() / 80)
    # determinism: same output on a second run
    out2 = temperature_mix(_ds(rows), alpha=0.5, keep_frac=0.5).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_group_centroids_exact(ray_session):
    from reffy_ray.ops.similarity import group_centroids

    rows = [
        {"label": 0, "embedding": [1.0, 2.0]},
        {"label": 0, "embedding": [3.0, 6.0]},
        {"label": 1, "embedding": [10.0, 0.0]},
    ]
    out = (
        group_centroids(_ds(rows))
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    assert out["centroid"].tolist() == [2.0, 4.0, 10.0, 0.0]
    assert out["dim"].tolist() == [0, 1, 0, 1]


def test_group_centroids_empty_blocks(ray_session):
    from reffy_ray.ops.similarity import group_centroids

    rows = [{"label": i % 2, "embedding": [float(i), 1.0]} for i in range(8)]
    ds = _ds(rows).filter(lambda r: r["label"] == 1)  # some blocks empty
    out = group_centroids(ds).to_pandas()
    assert sorted(out["label"].unique()) == [1]
    assert out[out.dim == 0]["centroid"].iloc[0] == 4.0  # mean of 1,3,5,7


def test_pack_chunks_concat_semantics(ray_session):
    from reffy_ray.ops.curation import pack_chunks

    # one shard (n_shards=1): chunks of 10 tokens into budget-16 bins
    rows = [
        {"doc_id": d, "chunk_id": c, "n_tokens": 10}
        for d in (1, 2) for c in (0, 1)
    ]
    out = (
        pack_chunks(_ds(rows), budget=16, n_shards=1)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    # offsets 0,10,20,30 -> bins 0,0,1,1 ; positions 0,10,4,14
    assert out["bin"].tolist() == [0, 0, 1, 1]
    assert out["bin_pos"].tolist() == [0, 10, 4, 14]
    assert out["shard"].nunique() == 1


def test_pack_chunks_deterministic_across_runs(ray_session):
    from reffy_ray.ops.curation import pack_chunks

    rows = [
        {"doc_id": d, "chunk_id": c, "n_tokens": 5 + (d % 7)}
        for d in range(30) for c in range(2)
    ]
    a = pack_chunks(_ds(rows), budget=32, n_shards=4).to_pandas()
    b = pack_chunks(_ds(list(reversed(rows))), budget=32, n_shards=4).to_pandas()
    key = ["doc_id", "chunk_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)  # row order of the input is irrelevant


def test_pack_chunks_invariants_property(ray_session):
    """Property check over a randomized-shape (but seeded) corpus:
    bin_pos < budget always; within a shard, offsets reconstruct the
    exact concat order (no token lost or double-counted)."""
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [
        {"doc_id": int(d), "chunk_id": int(c), "n_tokens": int(rng.randint(1, 40))}
        for d in range(60)
        for c in range(rng.randint(1, 4))
    ]
    from reffy_ray.ops.curation import pack_chunks

    budget = 64
    out = pack_chunks(_ds(rows), budget=budget, n_shards=8).to_pandas()
    assert (out["bin_pos"] < budget).all()
    assert len(out) == len(rows)
    for _, grp in out.groupby("shard"):
        g = grp.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
        offs = (g["bin"] * budget + g["bin_pos"]).to_numpy()
        expect = np.concatenate(([0], np.cumsum(g["n_tokens"].to_numpy())[:-1]))
        assert (offs == expect).all()


def test_chunk_tokens_roundtrip_property(ray_session):
    """Non-overlapping chunking partitions the token stream exactly:
    concatenating chunk_text over chunk_id order reproduces the
    tokenized document."""
    import re

    from reffy_ray.ops.curation import chunk_tokens

    texts = {
        1: "the quick brown fox jumps over the lazy dog " * 7,
        2: "a b",
        3: "one-token",
    }
    ds = _ds([{"doc_id": k, "text": v} for k, v in texts.items()])
    out = chunk_tokens(ds, window=5).to_pandas()
    for did, text in texts.items():
        g = out[out.doc_id == did].sort_values("chunk_id")
        joined = " ".join(g["chunk_text"])
        assert joined.split(" ") == re.findall(r"\w+", text)
        assert g["n_tokens"].sum() == len(re.findall(r"\w+", text))


def test_remove_boilerplate_lines(ray_session):
    from reffy_ray.ops.curation import remove_boilerplate_lines

    footer = "all rights reserved"
    rows = [
        {"doc_id": 1, "text": f"unique one\n{footer}\nkeep me"},
        {"doc_id": 2, "text": f"{footer}\ndifferent body"},
        {"doc_id": 3, "text": f"third doc\n{footer}"},
        {"doc_id": 4, "text": "no boilerplate at all"},
        # footer twice in ONE doc still counts doc-frequency once
        {"doc_id": 5, "text": f"{footer}\n{footer}\nreal line"},
    ]
    out = (
        remove_boilerplate_lines(_ds(rows), min_count=4)
        .to_pandas()
        .set_index("doc_id")
    )
    # footer doc-frequency = 4 (docs 1,2,3,5) >= 4 -> removed everywhere
    assert out.loc[1, "text"] == "unique one\nkeep me"
    assert out.loc[1, "n_removed"] == 1
    assert out.loc[2, "text"] == "different body"
    assert out.loc[3, "text"] == "third doc"
    assert out.loc[4, "text"] == "no boilerplate at all"
    assert out.loc[4, "n_removed"] == 0
    assert out.loc[5, "text"] == "real line"
    assert out.loc[5, "n_removed"] == 2  # both occurrences stripped


def test_remove_boilerplate_join_path_matches_broadcast(ray_session):
    """broadcast_limit=0 forces the explode→anti-join→rebuild path (the
    100 TB shape where the frequent-line set can't be broadcast); it
    must produce byte-identical output to the broadcast path, including
    a fully-boilerplate doc collapsing to empty text."""
    from reffy_ray.ops.curation import remove_boilerplate_lines

    footer = "all rights reserved"
    rows = [
        {"doc_id": 1, "text": f"unique one\n{footer}\nkeep me"},
        {"doc_id": 2, "text": f"{footer}\ndifferent body"},
        {"doc_id": 3, "text": footer},  # fully boilerplate
        {"doc_id": 4, "text": "no boilerplate at all"},
        {"doc_id": 5, "text": f"{footer}\n\nwith empty line"},
    ]
    kw = dict(min_count=3)
    bcast = (
        remove_boilerplate_lines(_ds(rows), **kw)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    joined = (
        remove_boilerplate_lines(_ds(rows), broadcast_limit=0, **kw)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert bcast.to_dict("records") == joined.to_dict("records")
    assert joined.set_index("doc_id").loc[3, "text"] == ""
    # empty line inside doc 5 survives both paths
    assert joined.set_index("doc_id").loc[5, "text"] == "\nwith empty line"


def test_remove_boilerplate_threshold(ray_session):
    from reffy_ray.ops.curation import remove_boilerplate_lines

    rows = [
        {"doc_id": i, "text": "shared twice\nbody %d" % i} for i in (1, 2)
    ] + [{"doc_id": 3, "text": "solo"}]
    out = (
        remove_boilerplate_lines(_ds(rows), min_count=3)
        .to_pandas()
        .set_index("doc_id")
    )
    # doc-frequency 2 < 3: the shared line survives
    assert out.loc[1, "text"] == "shared twice\nbody 1"
    assert (out["n_removed"] == 0).all()


def test_remove_boilerplate_join_path_lazy_input(ray_session):
    # a lazy input must not crash the join path (Dataset.num_blocks
    # raises on unmaterialized datasets)
    from reffy_ray.ops.curation import remove_boilerplate_lines

    footer = "subscribe to our newsletter"
    rows = [
        {"doc_id": i, "text": f"unique line {i}\n{footer}"} for i in range(4)
    ]
    lazy = _ds(rows).map_batches(lambda b: b, batch_format="pyarrow")
    out = (
        remove_boilerplate_lines(lazy, min_count=3, broadcast_limit=0)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert (out["n_removed"] == 1).all()
    assert out.loc[0, "text"] == "unique line 0"


def test_fuzzy_decontaminate_drops_near_dups_of_bench(ray_session):
    from reffy_ray.ops.curation import fuzzy_decontaminate

    base = "the quick brown fox jumps over the lazy dog again and again today"
    train = _ds([
        {"doc_id": 1, "text": base + " extra"},          # near-dup of bench
        {"doc_id": 2, "text": "completely unrelated words " * 6},
        {"doc_id": 3, "text": base},                     # exact dup of bench
    ])
    bench = _ds([{"doc_id": 100, "text": base}])
    kept = sorted(
        fuzzy_decontaminate(train, bench, jaccard_threshold=0.5)
        .to_pandas()["doc_id"]
    )
    assert kept == [2]


def test_fuzzy_decontaminate_join_path_lazy(ray_session):
    from reffy_ray.ops.curation import fuzzy_decontaminate

    base = "the quick brown fox jumps over the lazy dog again and again today"
    train = _ds([
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": "other material entirely here " * 5},
    ]).map_batches(lambda b: b, batch_format="pyarrow")
    bench = _ds([{"doc_id": 100, "text": base}])
    kept = sorted(
        fuzzy_decontaminate(train, bench, broadcast_limit=0)
        .to_pandas()["doc_id"]
    )
    assert kept == [2]


def test_c4_clean_rules(ray_session):
    from reffy_ray.ops.curation import c4_clean

    docs = [
        # 0: three good lines -> kept as-is, keep=1
        "one two three four five.\nsix seven eight nine ten!\n"
        'eleven twelve thirteen fourteen fifteen."',
        # 1: good lines but a short line and a no-punct line dropped
        "one two three four five.\ntoo short.\nno terminal punct here at all\n"
        "six seven eight nine ten.\neleven twelve thirteen fourteen fifteen.",
        # 2: only two surviving lines -> keep=0
        "one two three four five.\nsix seven eight nine ten.",
        # 3: javascript line dropped -> below min_lines, keep=0
        "one two three four five.\nplease enable JavaScript to view this.\n"
        "six seven eight nine ten.",
        # 4: brace in doc -> keep=0, lines still cleaned
        "one two three four five.\nsix seven eight nine ten.\n"
        "code sample { return x; } here.",
        # 5: badword -> keep=0
        "one two three four five.\nsix seven eight nine ten.\n"
        "the casino opens at nine daily.",
        # 6: lorem ipsum -> keep=0
        "one two three four five.\nsix seven eight nine ten.\n"
        "Lorem ipsum dolor sit amet.",
    ]
    ds = _ds({"doc_id": list(range(len(docs))), "text": docs})
    out = (
        c4_clean(ds, badwords=("casino",))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "keep"] == 1 and out.loc[0, "n_kept"] == 3
    assert out.loc[0, "text"] == docs[0]
    assert out.loc[1, "keep"] == 1 and out.loc[1, "n_kept"] == 3
    assert "too short" not in out.loc[1, "text"]
    assert "no terminal punct" not in out.loc[1, "text"]
    assert out.loc[2, "keep"] == 0 and out.loc[2, "n_kept"] == 2
    assert out.loc[3, "keep"] == 0 and out.loc[3, "n_kept"] == 2
    assert "JavaScript" not in out.loc[3, "text"]
    assert out.loc[4, "keep"] == 0 and out.loc[4, "n_kept"] == 3
    assert out.loc[5, "keep"] == 0 and out.loc[5, "n_kept"] == 3
    assert out.loc[6, "keep"] == 0
    # n_lines counts every raw line, dropped or not
    assert out.loc[1, "n_lines"] == 5


def test_source_overlap(ray_session):
    from reffy_ray.ops.dedup import source_overlap

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # one 8-gram
    rows = {
        "doc_id": [0, 1, 2, 3],
        "source": ["a", "a", "b", "c"],
        "text": [
            shared + " iota",          # a: grams {1..8, 2..9}
            "totally different words here with no overlap at all",
            shared,                    # b: gram {1..8} -> shares with a
            "unrelated content that shares nothing with anyone else ok",
        ],
    }
    ds = _ds(rows)
    out = (
        source_overlap(ds)
        .to_pandas()
        .set_index(["source_a", "source_b"])
        .sort_index()
    )
    assert out.loc[("a", "b"), "n_shared_grams"] == 1
    assert ("a", "c") not in out.index and ("b", "c") not in out.index

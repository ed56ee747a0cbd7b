"""Model-scoring op tests: hashed linear quality classifier + DSIR."""

import math

import pyarrow as pa
import ray.data as rd

from reffy_ray.ops.classify import _h64, _W_MOD, _W_MULT, dsir_weights, quality_classifier


def _docs_ds(texts, start_id=0):
    return rd.from_arrow(
        pa.table(
            {"doc_id": list(range(start_id, start_id + len(texts))), "text": texts}
        )
    )


def _expected_score(text, dim=64):
    words = [w for w in __import__("re").split(r"\W+", text.lower()) if w]
    total = sum((_h64(w) % dim * _W_MULT) % _W_MOD for w in words)
    return total // len(words)


def test_quality_classifier_exact_scores(ray_session):
    texts = ["alpha beta gamma", "delta delta epsilon zeta", "one two three four five"]
    out = (
        quality_classifier(_docs_ds(texts), dim=64, threshold_milli=1000)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == 3
    for i, t in enumerate(texts):
        exp = _expected_score(t)
        assert out.loc[i, "score_milli"] == exp
        assert bool(out.loc[i, "keep"]) == (exp >= 1000)


def test_quality_classifier_skips_empty_docs(ray_session):
    out = quality_classifier(_docs_ds(["hello world", "", "   ..."])).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0]


def test_dsir_weights_prefers_target_like_docs(ray_session):
    # target domain talks about cats; raw corpus has one cat-like doc
    # and one dog-like doc — the cat-like doc must weigh higher.
    target = _docs_ds(["cat cat feline whiskers", "cat purr feline"], start_id=100)
    raw = _docs_ds(["cat feline purr", "dog bark kennel bone"])
    out = dsir_weights(raw, target).to_pandas().set_index("doc_id")
    assert len(out) == 2
    assert out.loc[0, "dsir_w"] > out.loc[1, "dsir_w"]


def test_dsir_weights_matches_hand_computation(ray_session):
    target = _docs_ds(["a a b"], start_id=10)
    raw = _docs_ds(["a c"])
    out = dsir_weights(raw, target).to_pandas()
    # LM: a: nr=1 nt=2 / b: nr=0 nt=1 / c: nr=1 nt=0; tr=2 tt=3 v=3
    dt, dr = 3 + 3, 2 + 3
    w_a = math.log2((2 + 1) / dt) - math.log2((1 + 1) / dr)
    w_c = math.log2((0 + 1) / dt) - math.log2((1 + 1) / dr)
    exp = round((w_a + w_c) / 2, 4)
    assert out["dsir_w"].tolist() == [exp]


def test_dsir_weights_empty_corpus(ray_session):
    empty = _docs_ds([])
    out = dsir_weights(empty, empty).to_pandas()
    assert len(out) == 0


def test_ccnet_buckets_per_language_tiers(ray_session):
    from reffy_ray.ops.text import ccnet_buckets

    # 6 english docs with graded typicality (repeated common words →
    # low ppl) and 3 copies of one spanish doc; plus a zero-token doc.
    texts = [
        "the the the and and of",          # most typical english
        "the and of to in a",
        "the and of walrus to in",
        "walrus quantum of the and",
        "zygote walrus quantum the",
        "of zygote xylophone quantum walrus",  # least typical
        "el la de que y en",
        "el la de que y en",
        "el la de que y en",
        "...",                              # zero tokens → omitted
    ]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))), "text": texts}))
    out = ccnet_buckets(ds, buckets=3).to_pandas()
    assert len(out) == 9  # zero-token doc dropped
    en = out[out["lang_pred"] == "en"].sort_values("logppl")
    assert en["ppl_bucket"].tolist() == [0, 0, 1, 1, 2, 2]
    es = out[out["lang_pred"] == "es"]
    # 3 identical docs, one per tier (rank tiebreak by doc_id)
    assert sorted(es["ppl_bucket"].tolist()) == [0, 1, 2]


def test_dup_ngram_fraction(ray_session):
    from reffy_ray.ops.dedup import dup_ngram_fraction

    shared = "one two three four five six seven eight"
    texts = [
        shared + " alpha beta",      # 3 distinct 8-grams, 1 shared
        shared + " gamma delta",     # 3 distinct 8-grams, 1 shared
        "totally novel words " * 3,  # 9 tokens → 2 grams, none shared
        "short doc",                 # < 8 tokens → omitted
    ]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))), "text": texts}))
    out = dup_ngram_fraction(ds, n=8).to_pandas().set_index("doc_id").sort_index()
    assert out.index.tolist() == [0, 1, 2]
    assert out.loc[0, "n_grams"] == 3 and out.loc[0, "n_dup"] == 1
    assert out.loc[1, "n_grams"] == 3 and out.loc[1, "n_dup"] == 1
    assert out.loc[0, "dup_ppm"] == 1_000_000 // 3
    assert out.loc[2, "n_dup"] == 0 and out.loc[2, "n_grams"] == 2


def test_corpus_report(ray_session):
    from reffy_ray.ops.text import corpus_report

    texts = [
        "the cat and the dog",   # en, 5 tokens
        "the cat and the dog",   # exact dup of doc 0
        "the bird of prey",      # en, 4 tokens
        "el gato y el perro",    # es, 5 tokens
        "",                      # und, 0 tokens
    ]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))), "text": texts}))
    out = corpus_report(ds).to_pandas().set_index("lang_pred").sort_index()
    assert out.loc["en", "n_docs"] == 3
    assert out.loc["en", "n_tokens"] == 14
    assert out.loc["en", "n_unique_texts"] == 2
    assert out.loc["es", "n_docs"] == 1 and out.loc["es", "n_tokens"] == 5
    assert out.loc["und", "n_docs"] == 1 and out.loc["und", "n_tokens"] == 0

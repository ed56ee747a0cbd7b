"""Model-scoring operators for training-data curation.

Two ops a large-scale pipeline runs over every document:

* :class:`quality_classifier` — a fasttext-style hashed bag-of-words
  *linear* quality scorer. The "model" is a dense weight vector the
  actor builds once in ``__init__`` (the model-load pattern: weights
  live per worker process, never per batch); inference is a vectorized
  gather + per-doc integer reduction. Weights are a deterministic
  function of the feature index so the score has an *exact* integer
  DuckDB oracle — the op demonstrates real batched model inference
  (feature hash → embedding-table gather → reduce → threshold) with
  bit-exact verifiability, the same plumbing a real fasttext / logreg
  quality filter needs at 100 TB.

* :func:`dsir_weights` — DSIR importance weights (Xie et al. 2023,
  "Data Selection for Language Models via Importance Resampling"):
  per-document mean log-likelihood ratio between a *target*-domain
  unigram LM and the *raw*-corpus unigram LM, add-one smoothed over
  the union vocabulary. Docs that look like the target domain score
  high; resampling raw data by these weights tilts the mixture toward
  the target. Same distributed shape as
  :func:`reffy_ray.ops.text.unigram_logppl`: both LMs are combiner
  aggregations (vocab-sized, stay distributed), the per-doc pass is a
  hash join on the word key — nothing corpus-sized is collected.

Token convention matches ``word_counts``/``doc_token_partials``
(lower-cased ``\\W+`` split); the feature hash is the repo's
``H(x) = big-endian uint64 of md5(x)[:8]``, SQL-mirrorable as
``('0x' || substr(md5(x), 1, 16))::UBIGINT``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _h64(word: str) -> int:
    """Repo-standard 64-bit string hash (md5 prefix, big-endian)."""
    return int.from_bytes(hashlib.md5(word.encode("utf-8")).digest()[:8], "big")


# Knuth multiplicative constant — the deterministic "trained weights".
# w[j] = (j * 2654435761) mod 2001 ∈ [0, 2000] milli-units, so every
# per-token weight is an exact int64 and the per-doc mean needs no
# floats anywhere (floor division of non-negative ints — identical in
# numpy, Python and DuckDB).
_W_MULT = 2654435761
_W_MOD = 2001


class _ScorePartials:
    """Stateful scorer: (doc_id, word, tf, n_tok) partials → per-row
    integer score contributions. The weight vector and the word→bucket
    hash cache are built once per worker process (``__init__`` via the
    module-level cache below — the repo's task-based per-worker-cache
    idiom, same as ``ops/similarity.scorer_fn``), not per batch."""

    def __init__(self, dim: int):
        self.dim = dim
        self.w = (
            (np.arange(dim, dtype=np.uint64) * np.uint64(_W_MULT))
            % np.uint64(_W_MOD)
        ).astype(np.int64)
        self._bucket: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        words = batch.column("word").to_pylist()
        buckets = np.empty(len(words), dtype=np.int64)
        for i, w in enumerate(words):
            b = self._bucket.get(w)
            if b is None:
                b = _h64(w) % self.dim
                self._bucket[w] = b
            buckets[i] = b
        tf = batch.column("tf").to_numpy()
        score = tf * self.w[buckets]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "score": pa.array(score, pa.int64()),
                "n_tok": batch.column("n_tok"),
            }
        )


_SCORERS: dict[int, _ScorePartials] = {}


def _score_fn(dim: int):
    """Task closure with a per-worker-process scorer cache — the
    weight vector and hash cache persist across that worker's tasks."""

    def score(batch: pa.Table) -> pa.Table:
        s = _SCORERS.get(dim)
        if s is None:
            s = _ScorePartials(dim)
            _SCORERS[dim] = s
        return s(batch)

    return score


def quality_classifier(ds, dim: int = 64, threshold_milli: int = 1000):
    """Score every document with the hashed linear model; returns
    Dataset(doc_id, score_milli, keep) where ``score_milli`` is the
    floor of the mean per-token weight (milli-units, exact int64) and
    ``keep = score_milli >= threshold_milli``. Documents with zero
    tokens are omitted (score undefined — same convention as
    ``unigram_logppl``).

    Scale shape: one vocab-keyed map over token partials (weights are
    per-actor state, O(dim) memory), one per-doc groupby — no
    broadcast of anything corpus-sized, no driver collection."""
    from ray.data.aggregate import Min, Sum

    from reffy_ray.ops.text import doc_token_partials

    parts = ds.map_batches(doc_token_partials, batch_format="pyarrow")
    scored = parts.map_batches(_score_fn(dim), batch_format="pyarrow")
    per_doc = scored.groupby("doc_id").aggregate(
        Sum("score", alias_name="score"), Min("n_tok", alias_name="n_tok")
    )

    def finish(b: pa.Table) -> pa.Table:
        score = b.column("score").to_numpy()
        n = b.column("n_tok").to_numpy()
        milli = score // n  # non-negative ints: floor == truncate
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "score_milli": pa.array(milli, pa.int64()),
                "keep": pa.array(milli >= threshold_milli, pa.bool_()),
            }
        )

    return per_doc.map_batches(finish, batch_format="pyarrow")


def dsir_weights(raw, target):
    """DSIR importance weight per raw document: mean over token
    positions of ``log2 p_target(w) − log2 p_raw(w)`` with add-one
    smoothing over the union vocabulary, snapped to 4 decimal places
    (the repo's bitwise-stable float convention). Returns
    Dataset(doc_id, dsir_w); zero-token docs omitted.

    Both LMs are ``word_counts`` combiner tables; they union into one
    (word, nr, nt) LM with a single vocab-sized groupby, and the only
    driver exchange is three scalars (raw total, target total, vocab
    size)."""
    from ray.data.aggregate import Min, Sum

    from reffy_ray.ops.text import doc_token_partials, word_counts
    from reffy_ray.util import join_ready, safe_num_blocks

    def tag(nr: bool):
        def fn(b: pa.Table) -> pa.Table:
            n = b.column("n")
            zero = pa.array(np.zeros(len(b), dtype=np.int64), pa.int64())
            return pa.table(
                {
                    "word": b.column("word"),
                    "nr": n if nr else zero,
                    "nt": zero if nr else n,
                }
            )

        return fn

    lm = (
        word_counts(raw).map_batches(tag(True), batch_format="pyarrow")
        .union(word_counts(target).map_batches(tag(False), batch_format="pyarrow"))
        .groupby("word")
        .aggregate(Sum("nr", alias_name="nr"), Sum("nt", alias_name="nt"))
    )
    # materialize: the LM feeds three scalar reads + the join — without
    # it each .sum()/.count() re-executes both word_counts pipelines
    lm = join_ready(lm).materialize()
    tr = lm.sum("nr") or 0
    tt = lm.sum("nt") or 0
    v = lm.count()
    if v == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "dsir_w": pa.array([], pa.float64())}
            )
        )

    toks = raw.map_batches(doc_token_partials, batch_format="pyarrow")
    joined = toks.join(
        lm,
        join_type="inner",  # every raw word is in the union LM
        num_partitions=safe_num_blocks(lm),
        on=("word",),
    )
    dt, dr = float(tt + v), float(tr + v)

    def partial_bits(b: pa.Table) -> pa.Table:
        tf = b.column("tf").to_numpy().astype(np.float64)
        nr = b.column("nr").to_numpy().astype(np.float64)
        nt = b.column("nt").to_numpy().astype(np.float64)
        # same x/y-then-log2 form as the SQL oracle (drift < 1 ulp,
        # absorbed by the 4 dp snap)
        bits = tf * (np.log2((nt + 1.0) / dt) - np.log2((nr + 1.0) / dr))
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "bits": pa.array(bits, pa.float64()),
                "n_tok": b.column("n_tok"),
            }
        )

    per_doc = (
        joined.map_batches(partial_bits, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("bits", alias_name="bits"), Min("n_tok", alias_name="n_tok"))
    )

    def finish(b: pa.Table) -> pa.Table:
        bits = b.column("bits").to_numpy().astype(np.float64)
        n = b.column("n_tok").to_numpy().astype(np.float64)
        w = np.round(bits / n * 1e4) / 1e4
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "dsir_w": pa.array(w, pa.float64()),
            }
        )

    return per_doc.map_batches(finish, batch_format="pyarrow")

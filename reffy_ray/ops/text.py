"""Text-analysis operators for large-scale training-data pipelines.

All are stateless/stateful ``map_batches`` stages over a text column,
vectorized with pandas string kernels or compiled regexes held in
actor state. Each has a ``queries()`` entry with a DuckDB oracle where
SQL can express it (token counts, char classes); heuristic ops
(language-ID) are checked rows-only + unit-tested.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# token = maximal run of non-whitespace (SQL-mirrorable:
# length(regexp_split_to_array(trim(text), '\s+')))
_WS = re.compile(r"\s+")


def token_count(batch: pa.Table) -> pa.Table:
    """tokens = whitespace-delimited runs; vectorized via pyarrow."""
    text = pc.utf8_trim_whitespace(batch.column("text"))
    # count whitespace runs + 1 (0 for empty strings)
    n_ws = pc.count_substring_regex(text, r"\s+")
    nonempty = pc.not_equal(text, "")
    toks = pc.if_else(nonempty, pc.add(n_ws, 1), 0)
    return pa.table(
        {"doc_id": batch.column("doc_id"), "n_tokens": pc.cast(toks, pa.int64())}
    )


class BpeishTokenCount:
    """Token counting with a BPE-ish word/punct regex (GPT-2
    pre-tokenizer-style splitting, simplified), fully vectorized via
    Arrow's re2 kernel — no per-row Python."""

    PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column("text"), self.PATTERN)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bpeish": pc.cast(n, pa.int64()),
            }
        )


def quality_score(batch: pa.Table) -> pa.Table:
    """Quality heuristics: length, alpha ratio, punct ratio, tokens.

    Ratios are emitted as integer parts-per-million (floor) so the
    DuckDB oracle hash-matches exactly — float rounding rules differ
    between engines, integer arithmetic doesn't."""
    text = batch.column("text")
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_alpha = pc.cast(pc.count_substring_regex(text, r"[A-Za-z]"), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, r"[.,;:!?]"), pa.int64())
    n_ws = pc.count_substring_regex(pc.utf8_trim_whitespace(text), r"\s+")
    n_tokens = pc.cast(pc.add(n_ws, 1), pa.int64())
    denom = pc.max_element_wise(n_chars, 1)
    ppm = lambda num: pc.cast(
        pc.floor(pc.divide(pc.multiply(pc.cast(num, pa.float64()), 1_000_000.0),
                           pc.cast(denom, pa.float64()))),
        pa.int64(),
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "alpha_ppm": ppm(n_alpha),
            "punct_ppm": ppm(n_punct),
        }
    )


# ASCII-only stopword tables (8 languages × ~25 words): keeps the
# re2 patterns byte-oriented and lets the auto-generated DuckDB oracle
# recompute identical hit counts. Highest-frequency function words per
# language, minus diacritic forms.
_LANG_STOPWORDS = {
    "en": {
        "the", "and", "of", "to", "a", "in", "is", "that", "for", "it",
        "was", "with", "as", "his", "on", "be", "at", "by", "had", "not",
        "are", "but", "from", "or", "have", "an", "they", "which", "you",
        "were",
    },
    "de": {
        "der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf",
        "zu", "den", "von", "sie", "im", "dem", "sich", "des", "auch",
        "es", "an", "werden", "aus", "er", "hat", "dass", "sind", "einer",
        "wird", "wie", "eine",
    },
    "fr": {
        "le", "la", "les", "et", "est", "un", "une", "des", "dans", "pour",
        "que", "qui", "sur", "pas", "plus", "par", "avec", "sont", "au",
        "il", "aux", "ce", "se", "ne", "nous", "comme", "mais", "ou",
        "si", "leur",
    },
    "es": {
        "el", "la", "los", "las", "es", "un", "una", "de", "en", "por",
        "que", "no", "se", "con", "para", "su", "al", "lo", "como", "del",
        "mas", "pero", "sus", "le", "ya", "o", "este", "ha", "cuando",
        "todo",
    },
    "it": {
        "il", "di", "che", "e", "la", "per", "un", "in", "sono", "non",
        "con", "si", "da", "come", "anche", "questo", "della", "del", "le",
        "gli", "una", "dei", "nel", "alla", "ma", "lo", "se", "ci", "al",
        "su",
    },
    "pt": {
        "de", "a", "o", "que", "e", "do", "da", "em", "um", "para", "com",
        "nao", "uma", "os", "no", "se", "na", "por", "mais", "as", "dos",
        "como", "mas", "ao", "ele", "das", "seu", "sua", "ou", "quando",
    },
    "nl": {
        "de", "het", "een", "van", "en", "in", "is", "dat", "op", "te",
        "zijn", "met", "voor", "niet", "aan", "er", "om", "ook", "als",
        "maar", "dan", "bij", "nog", "uit", "naar", "je", "hij", "was",
        "wordt", "dit",
    },
    "sv": {
        "och", "att", "det", "som", "en", "pa", "ar", "av", "for", "den",
        "till", "med", "han", "var", "om", "sig", "men", "ett", "har",
        "inte", "vi", "jag", "hon", "de", "sa", "kan", "nar", "fran",
        "efter", "vid",
    },
}


class LangId:
    """Stopword language-ID heuristic, vectorized: one re2 stopword-hit
    count per language over the lowered text (patterns built once per
    actor), argmax across the (n_langs, batch) count matrix in numpy."""

    MAX_CHARS = 2000  # score a prefix; enough signal, bounds re2 work

    def __init__(self):
        self.langs = sorted(_LANG_STOPWORDS)
        self.patterns = {
            lang: r"\b(?:" + "|".join(sorted(words)) + r")\b"
            for lang, words in _LANG_STOPWORDS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.utf8_lower(
            pc.utf8_slice_codeunits(batch.column("text"), 0, self.MAX_CHARS)
        )
        hits = np.stack(
            [
                pc.count_substring_regex(text, self.patterns[lang])
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
                for lang in self.langs
            ]
        )  # (n_langs, batch)
        best = hits.argmax(axis=0)
        preds = np.array(self.langs, dtype=object)[best]
        preds[hits.max(axis=0) == 0] = "und"
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(list(preds), pa.string()),
            }
        )


def word_count_partials(batch: pa.Table) -> pa.Table:
    """Per-batch partial word counts — the pre-aggregation/combiner
    pattern: one (word, n) row per distinct word per batch leaves the
    task, so the global groupby shuffles partials, not tokens
    (SURVEY.md 'push aggregation partial')."""
    from collections import Counter

    counts: Counter = Counter()
    for text in batch.column("text").to_pylist():
        counts.update(w for w in re.split(r"\W+", (text or "").lower()) if w)
    words = sorted(counts)
    return pa.table(
        {
            "word": pa.array(words, pa.string()),
            "n": pa.array([counts[w] for w in words], pa.int64()),
        }
    )


def word_counts(ds) -> "object":
    """Global word counts: partial counts per batch → small groupby-sum
    over the partials."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(word_count_partials, batch_format="pyarrow")
    return partials.groupby("word").aggregate(Sum("n", alias_name="n"))


class Fingerprint:
    """64-bit rolling polynomial hash over the whitespace-normalized
    document bytes (deterministic). Vectorized: the whole batch's bytes
    are hashed in one numpy pass — h = Σ bᵢ·P^(n-1-i) mod 2⁶⁴ computed
    with a precomputed wraparound power table and ``np.add.reduceat``
    per document (replaces the round-1 per-byte Python FNV loop)."""

    P = np.uint64(1099511628211)  # FNV prime as the polynomial base
    MAX_LEN = 1 << 20

    def __init__(self):
        # powers[k] = P^k mod 2^64; grown lazily if a doc exceeds it
        self.powers = self._grow(1 << 16)

    def _grow(self, n: int) -> np.ndarray:
        with np.errstate(over="ignore"):
            p = np.empty(n, dtype=np.uint64)
            p[0] = 1
            np.multiply.accumulate(np.full(n - 1, self.P, dtype=np.uint64), out=p[1:])
        return p

    def __call__(self, batch: pa.Table) -> pa.Table:
        norm = pc.replace_substring_regex(
            pc.utf8_trim_whitespace(batch.column("text")), r"\s+", " "
        )
        bufs = [(s or "").encode("utf-8")[: self.MAX_LEN] for s in norm.to_pylist()]
        lens = np.array([len(b) for b in bufs], dtype=np.int64)
        if lens.max(initial=0) >= len(self.powers):
            self.powers = self._grow(int(lens.max()) + 1)
        data = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.uint64)
        ends = np.cumsum(lens)
        starts = ends - lens
        # per-position exponent: (doc_end - 1 - position)
        pos = np.arange(len(data), dtype=np.int64)
        exps = np.repeat(ends, lens) - 1 - pos
        with np.errstate(over="ignore"):
            terms = data * self.powers[exps]
            nonempty = lens > 0
            sums = np.zeros(len(bufs), dtype=np.uint64)
            if nonempty.any():
                red = np.add.reduceat(terms, starts[nonempty])
                sums[nonempty] = red[: nonempty.sum()] if len(red) else red
        fp = (sums >> np.uint64(1)).astype(np.int64)  # keep positive int64
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fingerprint": pa.array(fp, pa.int64()),
            }
        )


# ---------------------------------------------------------------------------
# Task-based wrappers with worker-global instances
#
# These kernels hold only trivial state (regex strings, a small power
# table), so they run as plain *tasks* with a per-worker-process cached
# instance instead of actor pools: consecutive dataset executions then
# never contend for CPUs with a previous query's dying pool (measured:
# back-to-back actor-pool queries intermittently stall ~15 s waiting
# for the old pool's CPUs), and the task pool scales elastically.
# ---------------------------------------------------------------------------

_WORKER_SINGLETONS: dict[str, object] = {}


def _singleton(cls):
    inst = _WORKER_SINGLETONS.get(cls.__name__)
    if inst is None:
        inst = cls()
        _WORKER_SINGLETONS[cls.__name__] = inst
    return inst


def bpeish_tokens_batch(batch: pa.Table) -> pa.Table:
    return _singleton(BpeishTokenCount)(batch)


def lang_id_batch(batch: pa.Table) -> pa.Table:
    return _singleton(LangId)(batch)


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    return _singleton(Fingerprint)(batch)


# ---------------------------------------------------------------------------
# Document frequency / salient terms (tf-df curation ops)
# ---------------------------------------------------------------------------

_TOK = re.compile(r"\w+")


def doc_freq_partials(batch: pa.Table) -> pa.Table:
    """Per-batch partial document frequencies: each document
    contributes at most 1 per distinct token, so one (token, df) row
    per distinct token per batch leaves the task (combiner pattern —
    the global groupby shuffles partials, not token occurrences)."""
    from collections import Counter

    counts: Counter = Counter()
    for text in batch.column("text").to_pylist():
        counts.update(set(_TOK.findall((text or "").lower())))
    toks = sorted(counts)
    return pa.table(
        {
            "token": pa.array(toks, pa.string()),
            "df": pa.array([counts[t] for t in toks], pa.int64()),
        }
    )


def doc_freq(ds) -> "object":
    """Corpus document-frequency table (token, df)."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(doc_freq_partials, batch_format="pyarrow")
    return partials.groupby("token").aggregate(Sum("df", alias_name="df"))


def top_terms(ds, n: int = 5, max_df_frac: float = 0.5):
    """Per-document salient terms: the ``n`` highest-tf tokens after
    dropping corpus-stopwords (tokens in more than ``max_df_frac`` of
    documents). All-integer ranking (tf desc, token asc) — the kept
    set and order are exactly SQL-restatable with no float drift.

    Scale shape: the df pass is the combiner above; only the tiny
    high-df stopword set is collected and broadcast (``ray.put`` once,
    read per worker) — per-doc ranking then needs no shuffle at all."""
    import ray

    n_docs = ds.count()
    df_tbl = doc_freq(ds)
    # stopwords: df * 2 > n for the default 0.5 — keep integer math
    stop = {
        r["token"]
        for r in df_tbl.filter(
            expr=f"df > {int(max_df_frac * n_docs)}"
        ).take_all()
    }
    stop_ref = ray.put(stop)

    _cache: dict = {}

    def rank_terms(batch: pa.Table) -> pa.Table:
        from collections import Counter

        key = stop_ref.hex()
        s = _cache.get(key)
        if s is None:
            s = ray.get(stop_ref)
            _cache[key] = s
        out_doc, out_tok, out_tf, out_rank = [], [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            tf = Counter(_TOK.findall((text or "").lower()))
            ranked = sorted(
                ((t, c) for t, c in tf.items() if t not in s),
                key=lambda tc: (-tc[1], tc[0]),
            )[:n]
            for rank, (t, c) in enumerate(ranked, start=1):
                out_doc.append(doc_id)
                out_tok.append(t)
                out_tf.append(c)
                out_rank.append(rank)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, batch.column("doc_id").type),
                "token": pa.array(out_tok, pa.string()),
                "tf": pa.array(out_tf, pa.int64()),
                "rank": pa.array(out_rank, pa.int64()),
            }
        )

    return ds.map_batches(rank_terms, batch_format="pyarrow")


def bm25_scores(ds, terms, k1: float = 1.2, b: float = 0.75):
    """BM25 relevance of every document against a fixed query-term
    list (the retrieval tier under decontamination / targeted
    curation). Returns ``(doc_id, bm25_e6)`` — score ×1e6 as int64,
    only for documents containing at least one query term (idf uses
    the +1 "BM25+" form, so any hit scores > 0).

    Two passes, no shuffle at all: a census ``map_batches`` emits one
    partial row per block (doc count, total token count — exact
    integer sums — and per-term document frequencies), reduced on the
    driver to the idf table and avgdl; the scoring pass is a stateless
    ``map_batches`` with those few constants captured in the closure.
    Determinism: idf is snapped to 6 decimals (numpy vs another
    engine's ``ln`` may differ in the last ulp), every other factor is
    plain IEEE arithmetic on exact integers, and the final
    ``floor(x*1e6 + 0.5)`` is evaluated on the same double either
    side.
    """
    terms = list(terms)

    def census(batch: pa.Table) -> pa.Table:
        n = 0
        tot = 0
        dfs = [0] * len(terms)
        for text in batch.column("text").to_pylist():
            toks = _TOK.findall((text or "").lower())
            n += 1
            tot += len(toks)
            seen = set(toks)
            for i, t in enumerate(terms):
                if t in seen:
                    dfs[i] += 1
        cols = {"n": [n], "tot": [tot]}
        for i, d in enumerate(dfs):
            cols[f"df{i}"] = [d]
        return pa.table(cols)

    parts = ds.map_batches(census, batch_format="pyarrow").to_pandas()
    # an empty input yields zero census rows (and no columns at all)
    n_docs = int(parts["n"].sum()) if "n" in parts.columns else 0
    if n_docs == 0:
        return _empty_bm25()
    avgdl = int(parts["tot"].sum()) / n_docs
    idf = [
        round(
            float(np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)), 6
        )
        for df in (int(parts[f"df{i}"].sum()) for i in range(len(terms)))
    ]

    def score(batch: pa.Table) -> pa.Table:
        from collections import Counter

        import math

        out_id, out_s = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            toks = _TOK.findall((text or "").lower())
            dl = len(toks)
            tf = Counter(toks)
            s = 0.0
            hit = False
            for i, t in enumerate(terms):
                f = tf.get(t, 0)
                if f:
                    hit = True
                    s += (
                        idf[i]
                        * (f * (k1 + 1.0))
                        / (f + k1 * (1.0 - b + b * dl / avgdl))
                    )
            if hit:
                out_id.append(doc_id)
                out_s.append(int(math.floor(s * 1e6 + 0.5)))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "bm25_e6": pa.array(out_s, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def _empty_bm25() -> "object":
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "bm25_e6": pa.array([], pa.int64()),
            }
        )
    )


# --- unigram LM perplexity (CCNet-style quality signal) --------------------


def doc_token_partials(batch: pa.Table) -> pa.Table:
    """Per-batch (doc_id, word, tf, n_tok) partials — one row per
    distinct word per document (same tokenizer as word_counts), with
    the document's total token count carried on every row."""
    from collections import Counter

    ids = batch.column("doc_id")
    out_idx, out_word, out_tf, out_n = [], [], [], []
    for idx, text in enumerate(batch.column("text").to_pylist()):
        counts = Counter(
            w for w in re.split(r"\W+", (text or "").lower()) if w
        )
        n_tok = sum(counts.values())
        for w in sorted(counts):
            out_idx.append(idx)
            out_word.append(w)
            out_tf.append(counts[w])
            out_n.append(n_tok)
    return pa.table(
        {
            # id-type agnostic: take from the input column (crawl docs
            # carry string doc_ids, the synthetic corpus int64)
            "doc_id": pc.take(ids, pa.array(out_idx, pa.int64())),
            "word": pa.array(out_word, pa.string()),
            "tf": pa.array(out_tf, pa.int64()),
            "n_tok": pa.array(out_n, pa.int64()),
        }
    )


def _empty_logppl(ds) -> "object":
    """Typed empty (doc_id, logppl) result for a corpus with no scored
    positions — keeps the join path from ever seeing a zero-column
    empty LM side."""
    import ray.data as rd

    try:
        id_type = dict(zip(ds.schema().names, ds.schema().types))["doc_id"]
    except Exception:
        id_type = pa.int64()
    return rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([], id_type),
             "logppl": pa.array([], pa.float64())}
        )
    )


def unigram_logppl(ds) -> "object":
    """Per-document unigram log-perplexity under the corpus's own
    unigram LM — the CCNet-style language-model quality signal (lower
    = more typical text; boilerplate and gibberish score high). For
    each document: mean over token positions of −log2 p(token), with
    p(token) = corpus count / corpus total.

    Scale shape: the LM is the ``word_counts`` combiner table (vocab-
    sized, stays distributed); per-doc partials hash-join it on the
    word key (one shuffle each side), then one per-doc sum — nothing
    corpus- or vocab-sized is broadcast or collected. Output snapped
    to 4 decimal places (the repo's bitwise-stable float convention).

    Returns Dataset(doc_id, logppl) — documents with zero tokens are
    omitted (perplexity undefined).
    """
    from ray.data.aggregate import Min, Sum

    from reffy_ray.util import join_ready, safe_num_blocks

    # join_ready: aggregate outputs carry zero-column empty blocks that
    # crash join partitions (see util.join_ready)
    freq = join_ready(word_counts(ds))  # (word, n) — distributed LM
    total = freq.sum("n")
    if not total:  # no tokens anywhere → every doc is omitted
        return _empty_logppl(ds)

    toks = ds.map_batches(doc_token_partials, batch_format="pyarrow")
    joined = toks.join(
        freq,
        join_type="inner",  # every doc word is in the corpus LM
        num_partitions=safe_num_blocks(freq),
        on=("word",),
    )

    log2_total = float(np.log2(total))

    def partial_bits(b: pa.Table) -> pa.Table:
        tf = b.column("tf").to_numpy().astype(np.float64)
        n = b.column("n").to_numpy().astype(np.float64)
        bits = tf * (log2_total - np.log2(n))  # tf · −log2(n/T)
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
        ppl = np.round(bits / n * 1e4) / 1e4
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "logppl": pa.array(ppl, pa.float64()),
            }
        )

    return per_doc.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# N-gram (bigram) counts — LM-table construction
# ---------------------------------------------------------------------------


def bigram_count_partials(batch: pa.Table) -> pa.Table:
    """Per-batch partial bigram counts over lowercased ``\\W+``-split
    tokens (same tokenizer as ``word_counts``). One (w1, w2, n) row per
    distinct adjacent pair per batch leaves the task — the combiner
    pattern: the global groupby shuffles pair partials, not token
    streams. This is the building block for n-gram LM tables
    (the bigram tier above ``unigram_logppl``'s table)."""
    from collections import Counter

    counts: Counter = Counter()
    for text in batch.column("text").to_pylist():
        toks = [w for w in re.split(r"\W+", (text or "").lower()) if w]
        counts.update(zip(toks, toks[1:]))
    pairs = sorted(counts)
    return pa.table(
        {
            "w1": pa.array([p[0] for p in pairs], pa.string()),
            "w2": pa.array([p[1] for p in pairs], pa.string()),
            "n": pa.array([counts[p] for p in pairs], pa.int64()),
        }
    )


def vocab_partials(batch: pa.Table) -> pa.Table:
    """Per-batch DISTINCT (lang, token) pairs — the dedup analog of the
    combiner pattern: at most one row per distinct pair per batch
    leaves the task, so the global exchange carries partial vocabularies
    rather than token streams."""
    pairs = set()
    for lang, text in zip(
        batch.column("lang").to_pylist(), batch.column("text").to_pylist()
    ):
        for w in re.split(r"\W+", (text or "").lower()):
            if w:
                pairs.add((lang, w))
    out = sorted(pairs)
    return pa.table(
        {
            "lang": pa.array([p[0] for p in out], pa.string()),
            "token": pa.array([p[1] for p in out], pa.string()),
        }
    )


def vocab_size_by_lang(ds) -> "object":
    """Distinct-token (exact vocabulary size) count per language —
    the lexical-richness audit of a multilingual corpus. Per-batch
    distinct partials → one groupby over (lang, token) to finish the
    global dedup → a trivial per-lang count of the surviving rows.
    All-integer; exact (no sketch), so the cost is one shuffle of the
    partial-vocabulary table — bounded by Heaps' law, far below the
    token stream."""
    from ray.data.aggregate import Count

    partials = ds.map_batches(vocab_partials, batch_format="pyarrow")
    distinct = partials.groupby(["lang", "token"]).aggregate(Count(alias_name="_n"))
    return (
        distinct.drop_columns(["_n"])
        .groupby("lang")
        .aggregate(Count(alias_name="vocab"))
    )


def bigram_counts(ds) -> "object":
    """Global adjacent-word-pair counts: per-batch partials → one small
    groupby-sum over (w1, w2). Scale shape: the shuffle carries at most
    (#distinct pairs per batch) rows per task; vocabulary² is the upper
    bound but real text follows Zipf, so partials compress heavily."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(bigram_count_partials, batch_format="pyarrow")
    return partials.groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="n"))


def skipgram_count_partials(batch: pa.Table, window: int = 3) -> pa.Table:
    """Per-batch partial skip-gram counts: ordered token pairs
    (w1 strictly before w2) at every distance 1..``window`` within a
    document, same lowercased ``\\W+`` tokenizer as ``word_counts``.
    One (w1, w2, n) row per distinct pair per batch — the combiner
    pattern again: the shuffle carries compressed pair partials, never
    the token stream."""
    from collections import Counter

    counts: Counter = Counter()
    for text in batch.column("text").to_pylist():
        toks = [w for w in re.split(r"\W+", (text or "").lower()) if w]
        for d in range(1, window + 1):
            counts.update(zip(toks, toks[d:]))
    pairs = sorted(counts)
    return pa.table(
        {
            "w1": pa.array([p[0] for p in pairs], pa.string()),
            "w2": pa.array([p[1] for p in pairs], pa.string()),
            "n": pa.array([counts[p] for p in pairs], pa.int64()),
        }
    )


def skipgram_counts(ds, window: int = 3) -> "object":
    """Windowed (skip-gram) co-occurrence table — the word2vec/GloVe
    input statistic: counts of ordered token pairs co-occurring within
    ``window`` positions. Per-batch ``Counter`` partials → one small
    ``groupby((w1, w2)).sum``.

    Scale shape: identical to ``bigram_counts`` (the window multiplies
    pair positions by W but Zipf compression in the partials keeps the
    exchanged rows near the distinct-pair count, not the position
    count)."""
    from functools import partial as _partial

    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        _partial(skipgram_count_partials, window=window),
        batch_format="pyarrow",
    )
    return partials.groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="n"))


def doc_pair_partials(batch: pa.Table) -> pa.Table:
    """Per-batch (doc_id, w1, w2, tf, n_pairs) partials — one row per
    distinct adjacent pair per document (same tokenizer as
    ``bigram_count_partials``), with the document's total pair count
    carried on every row. Documents with fewer than two tokens emit
    nothing."""
    from collections import Counter

    ids = batch.column("doc_id")
    out_idx, out_w1, out_w2, out_tf, out_n = [], [], [], [], []
    for idx, text in enumerate(batch.column("text").to_pylist()):
        toks = [w for w in re.split(r"\W+", (text or "").lower()) if w]
        counts = Counter(zip(toks, toks[1:]))
        n_pairs = sum(counts.values())
        for pair in sorted(counts):
            out_idx.append(idx)
            out_w1.append(pair[0])
            out_w2.append(pair[1])
            out_tf.append(counts[pair])
            out_n.append(n_pairs)
    return pa.table(
        {
            "doc_id": pc.take(ids, pa.array(out_idx, pa.int64())),
            "w1": pa.array(out_w1, pa.string()),
            "w2": pa.array(out_w2, pa.string()),
            "tf": pa.array(out_tf, pa.int64()),
            "n_pairs": pa.array(out_n, pa.int64()),
        }
    )


def bigram_logppl(ds) -> "object":
    """Per-document BIGRAM log-perplexity under the corpus's own
    bigram LM — the next tier above ``unigram_logppl``: mean over
    adjacent-pair positions of −log2 p(w2 | w1), with
    p(w2 | w1) = corpus pair count / corpus first-word context count
    (context counts derived from the pair table itself, so the model
    is self-consistent by construction).

    Scale shape: the LM is the ``bigram_counts`` combiner table and
    its per-w1 rollup — both stay distributed; per-doc pair partials
    hash-join them ((w1, w2) key, then w1 key), then one per-doc sum.
    Nothing corpus- or vocabulary-sized is broadcast or collected.
    Output snapped to 4 decimal places (the repo's bitwise-stable
    float convention). Documents with fewer than two tokens are
    omitted (no pair positions)."""
    from ray.data.aggregate import Min, Sum

    from reffy_ray.util import join_ready, safe_num_blocks

    bg = join_ready(bigram_counts(ds))  # (w1, w2, n)
    if bg.count() == 0:  # no adjacent pair anywhere → every doc omitted
        return _empty_logppl(ds)
    ctx = join_ready(
        bg.groupby("w1").aggregate(Sum("n", alias_name="cn"))
    )  # (w1, cn)
    # fold the context rollup into the pair table FIRST (LM-sized ⋈
    # vocab-sized) so the corpus-sized doc-pair stream pays exactly ONE
    # shuffle join below — and so no executed DAG holds two join
    # operators at once (their reserved actor pools can deadlock a
    # small cluster)
    lm = join_ready(
        bg.join(
            ctx,
            join_type="inner",
            num_partitions=safe_num_blocks(ctx),
            on=("w1",),
        )
    )  # (w1, w2, n, cn)

    pairs = ds.map_batches(doc_pair_partials, batch_format="pyarrow")
    joined = pairs.join(
        lm,
        join_type="inner",  # every doc pair is in the corpus LM
        num_partitions=safe_num_blocks(lm),
        on=("w1", "w2"),
    )

    def partial_bits(b: pa.Table) -> pa.Table:
        tf = b.column("tf").to_numpy().astype(np.float64)
        n = b.column("n").to_numpy().astype(np.float64)
        cn = b.column("cn").to_numpy().astype(np.float64)
        bits = tf * (np.log2(cn) - np.log2(n))  # tf · −log2(n/cn)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "bits": pa.array(bits, pa.float64()),
                "n_pairs": b.column("n_pairs"),
            }
        )

    per_doc = (
        joined.map_batches(partial_bits, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("bits", alias_name="bits"),
            Min("n_pairs", alias_name="n_pairs"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        bits = b.column("bits").to_numpy().astype(np.float64)
        n = b.column("n_pairs").to_numpy().astype(np.float64)
        ppl = np.round(bits / n * 1e4) / 1e4
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "logppl": pa.array(ppl, pa.float64()),
            }
        )

    return per_doc.map_batches(finish, batch_format="pyarrow")


def char_entropy(batch: pa.Table) -> pa.Table:
    """Per-document Shannon entropy of the CHARACTER distribution
    (code points), in bits — the classic gibberish/low-diversity
    signal: random bytes score high, aaaa-style repetition scores near
    zero, natural language sits in a narrow band. Pure map stage (no
    shuffle); one numpy unique+entropy per doc. Output snapped to 4
    decimal places (the repo's bitwise-stable float convention);
    empty documents are omitted (entropy undefined)."""
    ids, ents = [], []
    for idx, text in enumerate(batch.column("text").to_pylist()):
        if not text:
            continue
        codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
        _, counts = np.unique(codes, return_counts=True)
        p = counts / counts.sum()
        ents.append(float(np.round(-(p * np.log2(p)).sum() * 1e4) / 1e4))
        ids.append(idx)
    return pa.table(
        {
            "doc_id": pc.take(batch.column("doc_id"), pa.array(ids, pa.int64())),
            "entropy": pa.array(ents, pa.float64()),
        }
    )


def lang_fertility(ds) -> "object":
    """Per-language tokenizer-fertility table: documents, total word
    count (``\\w+``) and total BPE-ish subword count — fertility =
    bpe_tokens / words is the standard "how expensive is this language
    for the tokenizer" diagnostic, emitted as the two exact integer
    sums so no ratio float ever enters the hash.

    Combiner shape: both token counts come from Arrow's re2 kernel
    (vectorized, zero per-row Python), partial-summed per (block, lang)
    before the tiny per-language groupby."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        words = pc.cast(
            pc.count_substring_regex(batch.column("text"), r"\w+"),
            pa.int64(),
        )
        bpe = pc.cast(
            pc.count_substring_regex(
                batch.column("text"), BpeishTokenCount.PATTERN
            ),
            pa.int64(),
        )
        df = pd.DataFrame(
            {
                "lang": batch.column("lang").to_pylist(),
                "words": words.to_pylist(),
                "bpe_tokens": bpe.to_pylist(),
            }
        )
        g = (
            df.groupby("lang", sort=True)
            .agg(
                n_docs=("words", "size"),
                words=("words", "sum"),
                bpe_tokens=("bpe_tokens", "sum"),
            )
            .reset_index()
        )
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "n_docs": pa.array(g["n_docs"], pa.int64()),
                "words": pa.array(g["words"], pa.int64()),
                "bpe_tokens": pa.array(g["bpe_tokens"], pa.int64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("words", alias_name="words"),
            Sum("bpe_tokens", alias_name="bpe_tokens"),
        )
    )


def tfidf_terms(ds, k: int = 3, scale: int = 1_000_000):
    """Per-document TF-IDF salient terms with ALL-INTEGER scoring:
    ``score = (tf × scale) // df`` (rarity weighting as exact integer
    division — same ranking as tf/df, no float drift), top ``k`` terms
    per document by (score desc, term asc).

    Scale shape — the df attachment is a DISTRIBUTED join, not a
    broadcast (contrast :func:`top_terms`, which broadcasts only a
    tiny stopword set; a full vocabulary df map would NOT broadcast at
    open-vocab corpus scale): per-doc tf rows (combiner: one row per
    distinct token per doc) union the df table, ONE ``groupby(token)``
    attaches df to every tf row, then ONE ``groupby(doc)`` ranks.
    Token-shaped shuffles only; nothing vocabulary-sized ever lands on
    one node except single-token groups."""
    from collections import Counter

    def tf_rows(batch: pa.Table) -> pa.Table:
        out_doc, out_tok, out_tf = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            for t, c in Counter(_TOK.findall((text or "").lower())).items():
                out_doc.append(doc_id)
                out_tok.append(t)
                out_tf.append(c)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "token": pa.array(out_tok, pa.string()),
                "tf": pa.array(out_tf, pa.int64()),
            }
        )

    tf = ds.map_batches(tf_rows, batch_format="pyarrow")
    df_tbl = doc_freq(ds)

    def tag_tf(b: pa.Table) -> pa.Table:
        return b.append_column("df", pa.nulls(len(b), pa.int64()))

    def tag_df(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.nulls(len(b), pa.int64()),
                "token": b.column("token"),
                "tf": pa.nulls(len(b), pa.int64()),
                "df": b.column("df").cast(pa.int64()),
            }
        )

    unioned = tf.map_batches(tag_tf, batch_format="pyarrow").union(
        df_tbl.map_batches(tag_df, batch_format="pyarrow")
    )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        dfv = g["df"].dropna()
        if not len(dfv):  # tf rows without a df row cannot happen, but guard
            return g.iloc[0:0][["doc_id", "token", "score"]]
        d = int(dfv.iloc[0])
        rows = g[g["doc_id"].notna()]
        return pd.DataFrame(
            {
                "doc_id": rows["doc_id"].astype("int64"),
                "token": rows["token"],
                "score": (rows["tf"].astype("int64") * scale) // d,
            }
        )

    scored = unioned.groupby("token").map_groups(attach, batch_format="pandas")

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "token"], ascending=[False, True]
        ).head(k)
        return g[["doc_id", "token", "score"]]

    out = scored.groupby("doc_id").map_groups(rank, batch_format="pandas")

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "token": b.column("token").cast(pa.string()),
                "score": b.column("score").cast(pa.int64()),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


def inverted_index(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 3,
    num_buckets: int = 64,
):
    """Rare-term inverted index: for every term whose document
    frequency is ≤ ``max_df``, the full postings list as a
    comma-joined ascending doc-id string — the retrieval-index build
    step, restricted to the discriminative tail (frequent terms carry
    no signal and their postings are corpus-sized; the df cap bounds
    every output row to ``max_df`` entries by construction).

    Scale shape: per-block DISTINCT (doc, term) partials → ONE shuffle
    on a hash BUCKET of the term (a term's global posting set is local
    to its bucket, so the df filter and the ordered join both run as
    vectorized pandas group ops inside the bucket — no per-term
    dispatch, no second shuffle).
    """
    _tok = re.compile(r"\w+")

    def term_rows(batch: pa.Table) -> pa.Table:
        out_doc, out_term = [], []
        for doc_id, text in zip(
            batch.column(id_col).to_pylist(),
            batch.column(text_col).to_pylist(),
        ):
            for t in set(_tok.findall((text or "").lower())):
                out_doc.append(doc_id)
                out_term.append(t)
        t = pd.DataFrame({"doc_id": out_doc, "term": out_term})
        t["_bucket"] = (
            pd.util.hash_array(t["term"].to_numpy(dtype=object)) % num_buckets
        ).astype("int64")
        return pa.Table.from_pandas(t, preserve_index=False)

    exploded = ds.select_columns([id_col, text_col]).map_batches(
        term_rows, batch_format="pyarrow"
    )

    def bucket_postings(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["doc_id", "term"])
        df = g.groupby("term")["doc_id"].nunique()
        keep = df[df <= max_df].index
        g = g[g["term"].isin(keep)]
        if not len(g):
            return pd.DataFrame(
                {
                    "term": pd.Series([], dtype="object"),
                    "df": pd.Series([], dtype="int64"),
                    "postings": pd.Series([], dtype="object"),
                }
            )
        g = g.sort_values(["term", "doc_id"], kind="mergesort")
        out = g.groupby("term", sort=True).agg(
            df=("doc_id", "size"),
            postings=("doc_id", lambda s: ",".join(str(int(x)) for x in s)),
        )
        out = out.reset_index()
        out["df"] = out["df"].astype("int64")
        return out

    return (
        exploded.groupby("_bucket")
        .map_groups(bucket_postings, batch_format="pandas")
        .select_columns(["term", "df", "postings"])
    )


def ccnet_buckets(ds, buckets: int = 3):
    """CCNet-style per-language perplexity bucketing (Wenzek et al.
    2020, "CCNet: Extracting High Quality Monolingual Datasets from
    Web Crawl Data"): score every document with the unigram-LM
    log-perplexity signal (:func:`unigram_logppl`), identify its
    language (:class:`LangId`), then split each language's documents
    into ``buckets`` equal-frequency tiers by EXACT within-language
    rank (bucket 0 = head / most-fluent, last = tail). The CCNet
    pipeline keeps head+middle and drops tail; emitting the bucket id
    leaves that policy to the consumer.

    Exactness: rank order is (logppl, doc_id) with logppl already
    snapped to 4 dp — deterministic across runs and block layouts;
    ``bucket = rank·buckets // n_lang`` is all-integer. Zero-token
    documents are omitted (perplexity undefined, same as
    :func:`unigram_logppl`).

    Scale shape: one LM build + per-doc join (inside
    ``unigram_logppl``), one doc-keyed hash join against the language
    table, then the :func:`~reffy_ray.ops.sampling.global_rank`
    census sort keyed (lang, logppl, doc_id). The only driver
    exchanges are the #blocks census rows and one #langs-sized
    (start, count) table broadcast back via ``ray.put``.

    Returns Dataset(doc_id, lang_pred, logppl, ppl_bucket).
    """
    import ray as _ray

    from reffy_ray.ops.sampling import global_rank
    from reffy_ray.util import join_ready, safe_num_blocks

    ppl = join_ready(unigram_logppl(ds))
    lang = join_ready(
        ds.select_columns(["doc_id", "text"]).map_batches(
            lang_id_batch, batch_format="pyarrow"
        )
    )
    joined = ppl.join(
        lang,
        join_type="inner",  # lang covers every doc; ppl omits zero-token
        num_partitions=safe_num_blocks(ppl),
        on=("doc_id",),
    )

    ranked, _total = global_rank(joined, ("lang_pred", "logppl", "doc_id"))

    # per-language (start offset, count): #langs rows — genuinely tiny
    counts = ranked.groupby("lang_pred").count().take_all()
    starts: dict = {}
    sizes: dict = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["lang_pred"]):
        starts[row["lang_pred"]] = acc
        sizes[row["lang_pred"]] = int(row["count()"])
        acc += int(row["count()"])
    ref = _ray.put((starts, sizes))

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            b = b.copy()
            b["ppl_bucket"] = pd.Series([], dtype="int64")
            return b[["doc_id", "lang_pred", "logppl", "ppl_bucket"]]
        st, sz = _ray.get(ref)
        lang_col = b["lang_pred"]
        local = b["rank_idx"].to_numpy(dtype=np.int64) - lang_col.map(
            st
        ).to_numpy(dtype=np.int64)
        n = lang_col.map(sz).to_numpy(dtype=np.int64)
        b = b.copy()
        b["ppl_bucket"] = (local * buckets) // n
        return b[["doc_id", "lang_pred", "logppl", "ppl_bucket"]]

    return ranked.map_batches(bucketize, batch_format="pandas")


def corpus_report(ds):
    """One-pass per-language corpus audit — the summary table a
    curation run prints before and after each policy step: for every
    detected language, the document count, total whitespace-token
    count, and the number of DISTINCT text payloads (n_docs −
    n_unique_texts = exact-duplicate overhang). All counts int64.

    Scale shape: a single streamed map computes (lang_pred, n_tokens,
    text-md5) per row; exact distinct-per-lang is one groupby on the
    (lang, md5) pair emitting combiner partials, then a #langs-sized
    groupby-sum. Nothing wider than the dedup hash shuffle the corpus
    already pays for exact_dedup.

    Returns Dataset(lang_pred, n_docs, n_tokens, n_unique_texts).
    """
    from ray.data.aggregate import Count, Sum

    def annotate(batch: pa.Table) -> pa.Table:
        import hashlib

        lang = _singleton(LangId)(batch).column("lang_pred")
        text = pc.utf8_trim_whitespace(batch.column("text"))
        n_ws = pc.count_substring_regex(text, r"\s+")
        toks = pc.if_else(pc.not_equal(text, ""), pc.add(n_ws, 1), 0)
        md5 = pa.array(
            [
                hashlib.md5((t or "").encode("utf-8")).hexdigest()
                for t in batch.column("text").to_pylist()
            ],
            pa.string(),
        )
        return pa.table(
            {
                "lang_pred": lang,
                "n_tokens": pc.cast(toks, pa.int64()),
                "md5": md5,
            }
        )

    rows = ds.select_columns(["doc_id", "text"]).map_batches(
        annotate, batch_format="pyarrow"
    )
    # (lang, md5) partials: per distinct payload, its doc count + token sum
    per_text = rows.groupby(["lang_pred", "md5"]).aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tokens", alias_name="n_tokens"),
    )

    def mark(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang_pred": b.column("lang_pred"),
                "n_docs": b.column("n_docs"),
                "n_tokens": b.column("n_tokens"),
                "uniq": pa.array(np.ones(len(b), dtype=np.int64), pa.int64()),
            }
        )

    return (
        per_text.map_batches(mark, batch_format="pyarrow")
        .groupby("lang_pred")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("uniq", alias_name="n_unique_texts"),
        )
    )


def bpe_merges(ds, merges: int = 4):
    """Distributed BPE tokenizer training (Sennrich et al. 2016 shape):
    ``merges`` greedy merge rounds over the word-count table. Returns
    one row per round: ``(step, left_sym, right_sym, merged,
    pair_count)`` — the merge table a byte-pair tokenizer is built
    from.

    Scale shape: the corpus is reduced ONCE to the distinct-word census
    (:func:`word_counts`' combiner + one groupby shuffle); every round
    after that runs on the vocab table, which stays distributed —
    pair counting is a fully Arrow-vectorized offsets/take kernel over
    the symbolized words (no Python loop over rows), the global pair
    argmax moves only per-block top-1 partials to the driver, and the
    merge application is one ``replace_substring`` pass. The chosen
    pair (a few bytes) is the only state broadcast per round.

    Merge semantics: words are held in the space-boundary form
    ``' h e l l o '`` and a merge is the literal string replace
    ``' x y ' -> ' xy '`` — non-overlapping, left-to-right, and
    adjacent occurrences that share a boundary space are NOT both
    merged in the same round (``' x y x y '`` -> ``' xy x y '``).
    DuckDB's ``replace()`` has byte-identical semantics, so the SQL
    oracle restates the op exactly, tie-break (max count, then
    lexicographically smallest pair) included.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    vocab = (
        ds.map_batches(word_count_partials, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )

    def symbolize(b: pa.Table) -> pa.Table:
        sp = pc.replace_substring_regex(b.column("word"), "(.)", r"\1 ")
        spaced = pc.binary_join_element_wise(
            pa.array([" "] * b.num_rows), sp, ""
        )
        return pa.table({"sym": spaced, "n": b.column("n")})

    vocab = vocab.map_batches(
        symbolize, batch_format="pyarrow"
    ).materialize()

    def pair_partials(b: pa.Table) -> pa.Table:
        lists = pc.split_pattern(
            pc.utf8_trim_whitespace(b.column("sym").combine_chunks()), " "
        )
        n = b.column("n").to_numpy(zero_copy_only=False)
        offsets = lists.offsets.to_numpy()
        starts, ends = offsets[:-1], offsets[1:]
        n_pairs = np.maximum(ends - starts - 1, 0)
        total = int(n_pairs.sum())
        if total == 0:
            return pa.table(
                {
                    "pair": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        base = np.repeat(starts, n_pairs)
        within = np.arange(total) - np.repeat(
            np.cumsum(n_pairs) - n_pairs, n_pairs
        )
        i1 = base + within
        values = lists.values
        pairs = pc.binary_join_element_wise(
            values.take(pa.array(i1)),
            values.take(pa.array(i1 + 1)),
            " ",
        )
        w = np.repeat(n, n_pairs)
        t = pa.table({"pair": pairs, "n": pa.array(w, pa.int64())})
        # in-block combine so only distinct (pair, partial-sum) rows ship
        g = t.group_by("pair").aggregate([("n", "sum")])
        return g.rename_columns(["pair", "n"])

    def block_top1(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        mx = pc.max(b.column("n"))
        cand = b.filter(pc.equal(b.column("n"), mx))
        best = pc.min(cand.column("pair"))
        return pa.table(
            {"pair": pa.array([best.as_py()]), "n": pa.array([mx.as_py()], pa.int64())}
        )

    steps, lefts, rights, mergeds, counts = [], [], [], [], []
    for step in range(merges):
        partials = (
            vocab.map_batches(pair_partials, batch_format="pyarrow")
            .groupby("pair")
            .aggregate(Sum("n", alias_name="n"))
            .map_batches(block_top1, batch_format="pyarrow")
            .to_pandas()
        )
        if len(partials) == 0:
            break
        mx = partials["n"].max()
        best = partials.loc[partials["n"] == mx, "pair"].min()
        left, right = best.split(" ")
        steps.append(step)
        lefts.append(left)
        rights.append(right)
        mergeds.append(left + right)
        counts.append(int(mx))
        pat, rep = f" {left} {right} ", f" {left}{right} "

        def apply_merge(b: pa.Table, _p=pat, _r=rep) -> pa.Table:
            return pa.table(
                {
                    "sym": pc.replace_substring(b.column("sym"), _p, _r),
                    "n": b.column("n"),
                }
            )

        vocab = vocab.map_batches(
            apply_merge, batch_format="pyarrow"
        ).materialize()

    return rd.from_arrow(
        pa.table(
            {
                "step": pa.array(steps, pa.int64()),
                "left_sym": pa.array(lefts, pa.string()),
                "right_sym": pa.array(rights, pa.string()),
                "merged": pa.array(mergeds, pa.string()),
                "pair_count": pa.array(counts, pa.int64()),
            }
        )
    )


def bpe_encode(
    ds,
    merge_rules,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "object":
    """Apply a trained BPE merge table (:func:`bpe_merges` output) to
    the corpus — the tokenizer-application half of the train→encode
    loop. Each document's words are symbolized to the same
    space-boundary form training used (``' h e l l o '``) and the
    merges are applied ONCE EACH, IN TRAINING ORDER (the single-pass
    variant; replace is non-overlapping left-to-right, byte-identical
    to DuckDB ``replace()`` — see bpe_merges). Emits per document with
    at least one word: ``(doc_id, n_words, n_tokens)``, n_tokens the
    post-merge symbol count.

    Scale shape: ``merge_rules`` is k tiny rows shipped in the task
    closure; everything else is per-batch — words are deduped within
    the batch (pandas factorize) so the k ``replace_substring`` passes
    run over the batch VOCABULARY, not every occurrence, then token
    counts scatter back through the code vector and a bincount per
    doc. No shuffle at all.
    """
    import pandas as pd_

    rules = [
        (f" {l} {r} ", f" {m} ")
        for l, r, m in merge_rules
    ]

    def enc(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "n_words": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        ids = pc.cast(b.column(id_col), pa.int64()).to_pylist()
        texts = b.column(text_col).to_pylist()
        words: list = []
        parents: list = []
        for j, t in enumerate(texts):
            ws = [w for w in re.split(r"\W+", (t or "").lower()) if w]
            words.extend(ws)
            parents.extend([j] * len(ws))
        if not words:
            return empty
        codes, uniq = pd_.factorize(np.asarray(words, dtype=object))
        ua = pa.array(list(uniq), pa.string())
        sp = pc.replace_substring_regex(ua, "(.)", r"\1 ")
        sym = pc.binary_join_element_wise(
            pa.array([" "] * len(uniq)), sp, ""
        )
        for pat, rep in rules:
            sym = pc.replace_substring(sym, pattern=pat, replacement=rep)
        ntok_u = pc.add(
            pc.count_substring(pc.utf8_trim_whitespace(sym), " "), 1
        ).to_numpy(zero_copy_only=False)
        par = np.asarray(parents, dtype=np.int64)
        n_tokens = np.bincount(
            par, weights=ntok_u[codes], minlength=len(ids)
        ).astype(np.int64)
        n_words = np.bincount(par, minlength=len(ids)).astype(np.int64)
        keep = n_words > 0
        return pa.table(
            {
                id_col: pa.array(
                    np.asarray(ids, dtype=np.int64)[keep], pa.int64()
                ),
                "n_words": pa.array(n_words[keep], pa.int64()),
                "n_tokens": pa.array(n_tokens[keep], pa.int64()),
            }
        )

    return ds.map_batches(enc, batch_format="pyarrow")


def _empty_pmi():
    import ray.data as _rd

    return _rd.from_arrow(
        pa.table(
            {
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "pmi_e4": pa.array([], pa.int64()),
            }
        )
    )


def pmi_collocations(
    ds,
    window: int = 3,
    min_count: int = 5,
    top_k: int = 100,
) -> "object":
    """Top collocations by pointwise mutual information over the
    windowed co-occurrence table — the classic collocation-mining /
    embedding-diagnostics statistic: PMI(x,y) = log2(p(x,y) /
    (p(x)·p(y))) with pair probabilities from :func:`skipgram_counts`
    and unigram probabilities from :func:`word_counts`. Pairs below
    ``min_count`` are dropped (PMI is noise at low counts); the top
    ``top_k`` rows by (PMI, w1, w2) are returned with PMI snapped to
    an int64 1e4 grid (floor(x·10⁴+0.5), the repo's bm25 convention)
    so ordering and hashes are engine-independent.

    Scale shape: two combiner tables (pair counts, word counts — both
    vocabulary-sized, distributed), two hash joins on the word keys,
    two scalar totals to the driver, one sort of the ≥min_count
    survivors (Zipf-small) + limit. Nothing corpus-sized anywhere.
    """
    from ray.data.aggregate import Sum

    from reffy_ray.util import join_ready, safe_num_blocks

    # join_ready materializes: pairs feeds both the total and the
    # join, and without it the whole skipgram pipeline would execute
    # twice (the unigram_logppl convention)
    pairs = join_ready(skipgram_counts(ds, window))
    uni = join_ready(word_counts(ds))
    tp = pairs.sum("n")
    tw = uni.sum("n")
    if not tp or not tw:
        return _empty_pmi()

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater_equal(b.column("n"), min_count))
        return pa.table(
            {
                "w1": t.column("w1"),
                "w2": t.column("w2"),
                "n": pc.cast(t.column("n"), pa.int64()),
            }
        )

    cand = pairs.map_batches(prep, batch_format="pyarrow").materialize()
    if cand.count() == 0:
        # every pair below min_count: empty result, not a degenerate
        # empty-partition join (ArrowInvalid)
        return _empty_pmi()

    def as_key(name, cname):
        def f(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    name: b.column("word"),
                    cname: pc.cast(b.column("n"), pa.int64()),
                }
            )

        return f

    u1 = uni.map_batches(as_key("w1", "c1"), batch_format="pyarrow")
    u2 = uni.map_batches(as_key("w2", "c2"), batch_format="pyarrow")
    j = join_ready(cand).join(
        join_ready(u1), join_type="inner",
        num_partitions=safe_num_blocks(u1), on=("w1",),
    )
    j = join_ready(j).join(
        join_ready(u2), join_type="inner",
        num_partitions=safe_num_blocks(u2), on=("w2",),
    )

    ftp, ftw = float(tp), float(tw)

    def score(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = b.column("c1").to_numpy(zero_copy_only=False).astype(np.float64)
        c2 = b.column("c2").to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.log2((n / ftp) / ((c1 / ftw) * (c2 / ftw)))
        e4 = np.floor(v * 10000.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "w1": b.column("w1"),
                "w2": b.column("w2"),
                "n": pc.cast(b.column("n"), pa.int64()),
                "pmi_e4": pa.array(e4, pa.int64()),
            }
        )

    return (
        j.map_batches(score, batch_format="pyarrow")
        .sort(["pmi_e4", "w1", "w2"], descending=[True, False, False])
        .limit(top_k)
    )




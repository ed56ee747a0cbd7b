"""Corpus-curation operators for training-data pipelines.

The stages a 100 TB pre-training corpus goes through between raw text
and the tokenizer: benchmark decontamination (exact n-gram overlap,
GPT-3/PaLM style), PII redaction, Gopher-style heuristic quality
gates, and text normalization. Each is a vectorized ``map_batches``
stage over a ``(doc_id, text)`` table with an exact DuckDB oracle
(``__ray_entry__.oracle_sql``).

Scale notes (100 TB):
- ``decontaminate``: the benchmark side is the SMALL side — its n-gram
  hash set is built once, deduplicated, and broadcast via ``ray.put``
  (read once per worker process, never re-shipped per batch); the
  corpus side streams. No shuffle at all.
- ``pii_redact`` / ``gopher_quality`` / ``normalize_text``: pure
  per-batch Arrow RE2 kernels — embarrassingly parallel, zero-copy in,
  zero shuffle.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

# Tokenization contract shared with ops/text.doc_freq and the SQL
# oracles: tokens = regexp_extract_all(lower(text), '\w+').
_TOKEN_RE = re.compile(r"\w+")

# Horner-fold base for n-gram hashes (same convention as the
# fingerprint kernel: mod-2^64 arithmetic, md5[:8] token hashes).
_P = np.uint64(1099511628211)


def _token_hash(tok: str, memo: dict) -> np.uint64:
    h = memo.get(tok)
    if h is None:
        h = np.uint64(
            int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        )
        if len(memo) < (1 << 20):  # bound actor memory on open vocabularies
            memo[tok] = h
    return h


def _gram_hashes(texts, n: int, memo: dict) -> tuple[np.ndarray, np.ndarray]:
    """All n-gram fold-hashes for a batch of texts.

    Returns (grams, doc_idx): one uint64 per n-gram occurrence and the
    row index it came from. Fully vectorized after per-row tokenize:
    one sliding-window multiply-accumulate over the concatenated
    token-hash array (uint64 wraparound == mod 2^64), with windows that
    cross a document boundary masked out.
    """
    tok_lists = [_TOKEN_RE.findall(t.lower()) if t else [] for t in texts]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists))
    total = int(lens.sum())
    if total < n:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    flat = np.empty(total, np.uint64)
    pos = 0
    for toks in tok_lists:
        for t in toks:
            flat[pos] = _token_hash(t, memo)
            pos += 1
    powers = _P ** np.arange(n - 1, -1, -1, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(flat, n)
    grams = (win * powers).sum(axis=1, dtype=np.uint64)
    # window starting at global position s belongs to doc d iff it lies
    # fully inside d's token span
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    ends = starts + lens  # exclusive
    doc_of_start = np.repeat(np.arange(len(lens)), lens)[: grams.shape[0]]
    gstart = np.arange(grams.shape[0])
    valid = gstart + n <= ends[doc_of_start]
    return grams[valid], doc_of_start[valid]


def bench_ngram_set(bench: rd.Dataset, n: int = 4, text_col: str = "text") -> np.ndarray:
    """Sorted unique n-gram hash array of the benchmark corpus (the
    small side). Per-batch hashing + dedup happens in tasks; only
    already-unique uint64 arrays reach the driver."""

    def grams_fn(batch: pa.Table) -> pa.Table:
        memo: dict = {}
        g, _ = _gram_hashes(batch.column(text_col).to_pylist(), n, memo)
        return pa.table({"gram": pa.array(np.unique(g), pa.uint64())})

    parts = bench.map_batches(grams_fn, batch_format="pyarrow")
    seen: set = set()
    for b in parts.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        seen.update(b.column("gram").to_numpy(zero_copy_only=False).tolist())
    return np.sort(np.fromiter(seen, dtype=np.uint64, count=len(seen)))


def decontaminate(
    ds: rd.Dataset,
    bench: rd.Dataset,
    n: int = 4,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("doc_id", "source"),
) -> rd.Dataset:
    """Drop every document sharing an exact word n-gram with the
    benchmark corpus (GPT-3 §C / PaLM-style exact-overlap
    decontamination). The benchmark n-gram set is broadcast once via
    ``ray.put``; the corpus streams through a stateless filter."""
    bench_ref = ray.put(bench_ngram_set(bench, n=n, text_col=text_col))

    class Decontaminator:
        def __init__(self):
            self.bench = ray.get(bench_ref)  # once per actor
            self.memo: dict = {}

        def __call__(self, batch: pa.Table) -> pa.Table:
            grams, doc_idx = _gram_hashes(
                batch.column(text_col).to_pylist(), n, self.memo
            )
            dirty = np.zeros(batch.num_rows, bool)
            if grams.size:
                hit = np.isin(grams, self.bench)
                np.bitwise_or.at(dirty, doc_idx[hit], True)
            return batch.select(list(keep_cols)).filter(pa.array(~dirty))

    from reffy_ray.util import pool_size

    return ds.map_batches(
        Decontaminator, batch_format="pyarrow", concurrency=pool_size(0.5)
    )


# --- PII redaction ---------------------------------------------------------

# RE2-compatible patterns (verified char-for-char equal semantics in
# Python re, Arrow RE2 and DuckDB RE2 — no lookarounds, no backrefs).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
)


def pii_redact(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Mask emails / IPv4s / US-style phone numbers, emitting the
    redacted text plus per-kind match counts. Order matters (emails
    are masked before the IP pattern can eat a dotted hostname), so
    the oracle applies the same chain."""

    def redact(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        cols = {"doc_id": batch.column("doc_id")}
        for name, pat, repl in PII_PATTERNS:
            cols[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(text, pat), pa.int64()
            )
            text = pc.replace_substring_regex(text, pattern=pat, replacement=repl)
        cols["text"] = text
        return pa.table(cols)

    return ds.map_batches(redact, batch_format="pyarrow")


# --- Gopher-style quality gate --------------------------------------------


def gopher_quality(
    ds: rd.Dataset,
    min_words: int = 16,
    max_words: int = 1 << 20,
    min_mean_len_ppm: int = 2_000_000,
    max_mean_len_ppm: int = 12_000_000,
) -> rd.Dataset:
    """Gopher/C4-style heuristic gates over plain text: word count
    bounds and mean-word-length bounds. Ratios are integer ppm (floor)
    so the DuckDB oracle hash-matches exactly. Emits the flags, not a
    filtered corpus — downstream pipelines choose their own cut."""

    def score(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_words = pc.cast(pc.count_substring_regex(text, r"\w+"), pa.int64())
        word_chars = pc.cast(
            pc.utf8_length(
                pc.replace_substring_regex(text, pattern=r"\W+", replacement="")
            ),
            pa.int64(),
        )
        nw = n_words.to_numpy(zero_copy_only=False)
        wc = word_chars.to_numpy(zero_copy_only=False)
        mean_ppm = np.zeros(len(nw), np.int64)
        nz = nw > 0
        mean_ppm[nz] = wc[nz] * 1_000_000 // nw[nz]
        keep = (
            (nw >= min_words)
            & (nw <= max_words)
            & (mean_ppm >= min_mean_len_ppm)
            & (mean_ppm <= max_mean_len_ppm)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": n_words,
                "mean_word_len_ppm": pa.array(mean_ppm, pa.int64()),
                "keep": pa.array(keep, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


# --- Normalization ---------------------------------------------------------


def normalize_text(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Canonical text form: lowercase, collapse whitespace runs to a
    single space, trim. Pure Arrow kernels."""

    def norm(batch: pa.Table) -> pa.Table:
        t = pc.utf8_lower(batch.column(text_col))
        t = pc.replace_substring_regex(t, pattern=r"\s+", replacement=" ")
        t = pc.utf8_trim_whitespace(t)
        return pa.table({"doc_id": batch.column("doc_id"), "text": t})

    return ds.map_batches(norm, batch_format="pyarrow")

# --- Gopher repetition filters ---------------------------------------------


def repetition_stats(
    ds: rd.Dataset,
    max_dup_line_frac_ppm: int = 300_000,
    max_dup_line_char_frac_ppm: int = 200_000,
    max_top_bigram_frac_ppm: int = 180_000,
    text_col: str = "text",
) -> rd.Dataset:
    """Gopher-style repetition gates (Rae et al. 2021 §A1.1): duplicate
    line fraction, duplicate-line character fraction, and the fraction
    of word characters covered by the most frequent word bigram.

    Exact integer-ppm (floor) definitions so the DuckDB oracle
    hash-matches bit-for-bit:

    * lines = non-empty ``'\\n'``-separated segments;
      ``dup_line_frac = (n_lines - n_distinct_lines) / n_lines``
    * ``dup_line_char_frac`` = chars in line occurrences beyond each
      line's first / total line chars
    * bigram tokens = ``\\w+`` over ``lower(text)``;
      ``top_bigram_frac = max over bigrams of
      count * (len(tok1)+len(tok2)) / total word chars``

    Per-doc Counter over lines/bigrams — inherently per-document string
    work (C-speed dict hashing), embarrassingly parallel, no shuffle.
    Emits flags (``keep``), not a filtered corpus.
    """
    from collections import Counter

    def score(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        n_lines_c, dlf, dlcf, tbf, keep = [], [], [], [], []
        for t in texts:
            t = t or ""
            lines = [l for l in t.split("\n") if l != ""]
            n = len(lines)
            if n:
                cnt = Counter(lines)
                dup = n - len(cnt)
                tot_chars = sum(len(l) for l in lines)
                dup_chars = sum((c - 1) * len(l) for l, c in cnt.items())
                f_line = dup * 1_000_000 // n
                f_char = dup_chars * 1_000_000 // tot_chars if tot_chars else 0
            else:
                f_line = f_char = 0
            toks = _TOKEN_RE.findall(t.lower())
            denom = sum(len(x) for x in toks)
            if len(toks) >= 2 and denom:
                bg = Counter(zip(toks, toks[1:]))
                best = max(c * (len(a) + len(b)) for (a, b), c in bg.items())
                f_bg = best * 1_000_000 // denom
            else:
                f_bg = 0
            n_lines_c.append(n)
            dlf.append(f_line)
            dlcf.append(f_char)
            tbf.append(f_bg)
            keep.append(
                int(
                    n > 0
                    and f_line <= max_dup_line_frac_ppm
                    and f_char <= max_dup_line_char_frac_ppm
                    and f_bg <= max_top_bigram_frac_ppm
                )
            )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_lines": pa.array(n_lines_c, pa.int64()),
                "dup_line_frac_ppm": pa.array(dlf, pa.int64()),
                "dup_line_char_frac_ppm": pa.array(dlcf, pa.int64()),
                "top_bigram_frac_ppm": pa.array(tbf, pa.int64()),
                "keep": pa.array(keep, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


# --- Fixed-window token chunking -------------------------------------------


def chunk_tokens(
    ds: rd.Dataset,
    window: int = 128,
    stride: int | None = None,
    text_col: str = "text",
) -> rd.Dataset:
    """Split each document's token stream into fixed-size windows (the
    pre-packing step of a training pipeline): tokens = ``\\w+`` (case
    preserved), chunk ``j`` covers tokens ``[j*stride, j*stride+window)``,
    the final partial window is kept. ``stride < window`` gives
    overlapping context windows.

    Pure per-doc expansion inside ``map_batches`` (a flat_map in
    effect) — no shuffle; output rows carry (doc_id, chunk_id,
    n_tokens, chunk_text).
    """
    stride = stride or window
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")

    def chunk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_chunk, out_n, out_text = [], [], [], []
        for did, t in zip(ids, texts):
            toks = _TOKEN_RE.findall(t) if t else []
            for j, start in enumerate(range(0, len(toks), stride)):
                w = toks[start : start + window]
                out_id.append(did)
                out_chunk.append(j)
                out_n.append(len(w))
                out_text.append(" ".join(w))
        return pa.table(
            {
                "doc_id": pa.array(out_id),
                "chunk_id": pa.array(out_chunk, pa.int64()),
                "n_tokens": pa.array(out_n, pa.int64()),
                "chunk_text": pa.array(out_text, pa.string()),
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow")


# --- Sequence packing --------------------------------------------------------


def pack_chunks(
    ds: rd.Dataset,
    budget: int = 2048,
    n_shards: int = 64,
    salt: str = "pack-42",
) -> rd.Dataset:
    """Pack token chunks into fixed-budget training sequences — the
    concat-and-split-at-context-boundary packing every pretraining run
    does between chunking and batching. Each chunk (from
    ``chunk_tokens``: doc_id, chunk_id, n_tokens, …) is assigned a
    deterministic shard by id hash, laid out within its shard in
    (doc_id, chunk_id) order, and placed at token offset
    ``cumsum(previous n_tokens)``; ``bin = offset // budget`` and
    ``bin_pos = offset % budget`` name its training sequence and
    position (chunks may straddle a boundary — exactly the concat
    semantics).

    Scale shape: one ``groupby(shard)`` over hash shards (uniform by
    construction — no hot keys), per-shard numpy cumsum. Sequential
    state never crosses a shard, so shards scale out freely; the
    assignment is stable across runs, cluster sizes and row order.
    """

    def shard_of(batch: pa.Table) -> pa.Table:
        import hashlib as _hl

        sh = [
            int.from_bytes(
                _hl.md5(f"{i}|{salt}".encode()).digest()[:8], "big"
            ) % n_shards
            for i in batch.column("doc_id").to_pylist()
        ]
        return batch.append_column("shard", pa.array(sh, pa.int64()))

    sharded = ds.map_batches(shard_of, batch_format="pyarrow")

    def pack(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        off = np.concatenate(([0], np.cumsum(n)[:-1]))
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "chunk_id": g["chunk_id"],
                "shard": g["shard"],
                "n_tokens": g["n_tokens"],
                "bin": off // budget,
                "bin_pos": off % budget,
            }
        )

    return sharded.groupby("shard").map_groups(pack, batch_format="pandas")


# --- Cross-document boilerplate removal -------------------------------------


def remove_boilerplate_lines(
    ds: rd.Dataset,
    min_count: int = 3,
    text_col: str = "text",
    broadcast_limit: int = 1_000_000,
) -> rd.Dataset:
    """C4-style boilerplate removal: a line occurring in ``min_count``
    or more documents across the corpus (cookie banners, nav footers,
    "click here") is deleted from every document. Emits (doc_id, text,
    n_removed) with surviving lines rejoined by ``'\\n'`` in original
    order.

    Stage 1 is always the combiner pattern: per-batch partial counts of
    DISTINCT lines per doc, then one groupby-sum whose cardinality is
    the distinct-line count, not the corpus. What happens to the
    frequent-line set then depends on its size — at 100 TB, lines
    repeated ≥3× number in the billions, so broadcastability cannot be
    assumed:

    * ≤ ``broadcast_limit`` frequent lines: collected once, ``ray.put``
      broadcast, stateless per-batch filter (no extra shuffle).
    * above the limit: documents explode to (doc_id, line_no, line)
      rows, a hash-partitioned ``left_anti`` join against the
      frequent-line Dataset drops boilerplate rows, and a per-doc
      groupby rebuilds the surviving text in original line order — the
      frequent set never leaves the cluster. A per-doc anchor row
      (null line, never joinable) guarantees fully-boilerplate docs
      still emit with empty text.
    """

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        cnt: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            # count each line once per document (doc-frequency)
            for line in set((t or "").split("\n")):
                if line:
                    cnt[line] += 1
        return pa.table(
            {
                "line": pa.array(list(cnt.keys()), pa.string()),
                "n": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    totals = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("line")
        .sum("n")
    )

    def frequent(batch: pa.Table) -> pa.Table:
        mask = pc.greater_equal(batch.column("sum(n)"), min_count)
        return pa.table({"line": batch.filter(mask).column("line")})

    freq_ds = totals.map_batches(frequent, batch_format="pyarrow").materialize()
    n_freq = freq_ds.count()

    if n_freq > broadcast_limit:
        n_lines_t = pa.int64()

        def explode(batch: pa.Table) -> pa.Table:
            doc_ids, line_nos, lines, n_lines = [], [], [], []
            for d, t in zip(
                batch.column("doc_id").to_pylist(),
                batch.column(text_col).to_pylist(),
            ):
                ls = (t or "").split("\n")
                # anchor row: null line never matches the join, so a
                # fully-boilerplate doc still reaches the rebuild stage
                doc_ids.append(d)
                line_nos.append(-1)
                lines.append(None)
                n_lines.append(len(ls))
                for i, l in enumerate(ls):
                    doc_ids.append(d)
                    line_nos.append(i)
                    lines.append(l)
                    n_lines.append(len(ls))
            return pa.table(
                {
                    "doc_id": pa.array(doc_ids),
                    "line_no": pa.array(line_nos, pa.int64()),
                    "line": pa.array(lines, pa.string()),
                    "n_lines": pa.array(n_lines, n_lines_t),
                }
            )

        exploded = ds.map_batches(explode, batch_format="pyarrow")
        from reffy_ray.util import safe_num_blocks

        from reffy_ray.util import join_ready

        surviving = exploded.join(
            join_ready(freq_ds),
            join_type="left_anti",
            num_partitions=safe_num_blocks(ds),
            on=("line",),
        )

        def rebuild(g: pd.DataFrame) -> pd.DataFrame:
            kept = g[g["line_no"] >= 0].sort_values("line_no")
            total = int(g["n_lines"].iloc[0])
            return pd.DataFrame(
                {
                    "doc_id": [g["doc_id"].iloc[0]],
                    "text": ["\n".join(kept["line"])],
                    "n_removed": [total - len(kept)],
                }
            )

        return surviving.groupby("doc_id").map_groups(
            rebuild, batch_format="pandas"
        )

    boiler = [
        l
        for b in freq_ds.iter_batches(batch_size=1 << 16, batch_format="pyarrow")
        for l in b.column("line").to_pylist()
    ]
    boiler_ref = ray.put(frozenset(boiler))
    _cache: dict = {}

    def clean(batch: pa.Table) -> pa.Table:
        key = boiler_ref.hex()
        bl = _cache.get(key)
        if bl is None:
            bl = ray.get(boiler_ref)
            _cache.clear()
            _cache[key] = bl
        texts, removed = [], []
        for t in batch.column(text_col).to_pylist():
            lines = (t or "").split("\n")
            keep = [l for l in lines if l == "" or l not in bl]
            texts.append("\n".join(keep))
            removed.append(len(lines) - len(keep))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": pa.array(texts, pa.string()),
                "n_removed": pa.array(removed, pa.int64()),
            }
        )

    return ds.map_batches(clean, batch_format="pyarrow")


def fuzzy_decontaminate(
    ds: rd.Dataset,
    bench: rd.Dataset,
    jaccard_threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    id_col: str = "doc_id",
    broadcast_limit: int = 1_000_000,
) -> rd.Dataset:
    """Fuzzy benchmark decontamination: drop every training document
    that is a MinHash-LSH near-duplicate (estimated shingle Jaccard ≥
    ``jaccard_threshold``) of ANY benchmark document — the fuzzy
    complement of :func:`decontaminate`'s exact n-gram overlap (the
    GPT-3/PaLM appendix pattern is exact n-grams; fuzzy catches
    paraphrased or lightly-edited leakage).

    ``ds`` and ``bench`` must carry disjoint ``id_col`` spaces. Shape:
    one LSH pass over the union (the existing banded
    :func:`reffy_ray.ops.dedup.minhash_lsh_pairs` machinery — one
    groupby shuffle, capped buckets), pairs filtered to cross-side on
    the broadcast benchmark id set (small by definition — same
    assumption as ``decontaminate``'s n-gram set), then the
    broadcast-or-join corpus filter used across the dedup family."""
    import ray

    from reffy_ray.util import safe_num_blocks

    from .dedup import minhash_lsh_pairs

    bench_ids = set(bench.select_columns([id_col]).to_pandas()[id_col])
    bench_ref = ray.put(bench_ids)

    union = ds.select_columns([id_col, "text"]).union(
        bench.select_columns([id_col, "text"])
    )
    pairs = minhash_lsh_pairs(
        union, num_perm=num_perm, bands=bands,
        jaccard_threshold=jaccard_threshold, k=k,
    )

    _cache: dict = {}

    def cross_drops(b: pa.Table) -> pa.Table:
        key = bench_ref.hex()
        bset = _cache.get(key)
        if bset is None:
            bset = ray.get(bench_ref)
            _cache[key] = bset
        id_type = b.column("a").type
        drops = []
        for x, y in zip(b.column("a").to_pylist(), b.column("b").to_pylist()):
            xb, yb = x in bset, y in bset
            if xb != yb:  # cross-side pair → drop the training doc
                drops.append(y if xb else x)
        return pa.table({id_col: pa.array(drops, id_type)})

    from reffy_ray.util import filter_by_drop_ids

    drops = pairs.map_batches(cross_drops, batch_format="pyarrow").materialize()
    return filter_by_drop_ids(ds, drops, id_col, broadcast_limit)


LINE_KEY_SHIFT = 21  # line_no < 2^21 per doc; doc_id < 2^42


def line_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
) -> rd.Dataset:
    """Cross-corpus keep-FIRST exact line deduplication (the C4 "dedup
    repeated lines" step, with deterministic first-occurrence winners):
    every distinct non-empty line survives only at its earliest
    occurrence in ``(doc_id, line_no)`` order; empty lines always
    survive (they carry document structure). Emits
    ``(doc_id, text, n_removed)`` with surviving lines rejoined in
    original order — the complement of
    :func:`remove_boilerplate_lines`, which drops frequent lines from
    EVERY document.

    Scale shape: the winner of each line group is identified without a
    join — the order key ``doc_id << 21 | line_no`` is a bijection, so
    ``groupby(line).min(order_key)`` RETURNS the surviving occurrences
    directly (decode doc_id/line_no from the min). One shuffle keyed by
    line text for the dedup, one per-doc groupby for the rebuild;
    anchor rows (line_no = -1) bypass the dedup so fully-duplicate and
    empty documents still emit.
    """
    from ray.data.aggregate import Min

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids, line_nos, lines, n_lines = [], [], [], []

        def emit(d: int, no: int, line, n: int) -> None:
            doc_ids.append(d)
            line_nos.append(no)
            lines.append(line)
            n_lines.append(n)

        for d, t in zip(
            batch.column("doc_id").to_pylist(),
            batch.column(text_col).to_pylist(),
        ):
            ls = (t or "").split("\n")
            if len(ls) >= (1 << LINE_KEY_SHIFT):
                raise ValueError(
                    f"doc {d}: {len(ls)} lines overflows the order key"
                )
            emit(d, -1, None, len(ls))  # anchor: routes around dedup
            for i, l in enumerate(ls):
                emit(d, i, l, len(ls))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "line_no": pa.array(line_nos, pa.int64()),
                "line": pa.array(lines, pa.string()),
                "n_lines": pa.array(n_lines, pa.int64()),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow").materialize()

    def keyed(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(batch.column("line_no"), 0),
            pc.not_equal(batch.column("line"), ""),
        )
        b = batch.filter(mask)
        return pa.table(
            {
                "line": b.column("line"),
                "okey": pc.bit_wise_or(
                    pc.shift_left(b.column("doc_id"), LINE_KEY_SHIFT),
                    b.column("line_no"),
                ),
            }
        )

    winners = (
        exploded.map_batches(keyed, batch_format="pyarrow")
        .groupby("line")
        .aggregate(Min("okey", alias_name="okey"))
    )

    def decode(batch: pa.Table) -> pa.Table:
        okey = batch.column("okey").cast(pa.int64())
        return pa.table(
            {
                "doc_id": pc.shift_right(okey, LINE_KEY_SHIFT),
                "line_no": pc.bit_wise_and(okey, (1 << LINE_KEY_SHIFT) - 1),
                "line": batch.column("line"),
                "n_lines": pa.array([-1] * len(batch), pa.int64()),
            }
        )

    kept = winners.map_batches(decode, batch_format="pyarrow")

    def passthrough(batch: pa.Table) -> pa.Table:
        # anchors and empty lines skip the dedup shuffle entirely;
        # Kleene or: the anchor's null line must not poison its mask
        mask = pc.or_kleene(
            pc.less(batch.column("line_no"), 0),
            pc.equal(batch.column("line"), ""),
        )
        return batch.filter(mask)

    side = exploded.map_batches(passthrough, batch_format="pyarrow")

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        body = g[g["line_no"] >= 0].sort_values("line_no")
        total = int(g["n_lines"].max())  # the anchor carries the count
        return pd.DataFrame(
            {
                "doc_id": [int(g["doc_id"].iloc[0])],
                "text": ["\n".join(body["line"])],
                "n_removed": [total - len(body)],
            }
        )

    return (
        kept.union(side)
        .groupby("doc_id")
        .map_groups(rebuild, batch_format="pandas")
    )


# --- C4 cleaning rules (Raffel et al. 2020, §2.2) ---------------------------


def c4_clean(
    ds: rd.Dataset,
    min_words_per_line: int = 5,
    min_lines: int = 3,
    badwords: tuple[str, ...] = ("lorem",),
    require_terminal_punct: bool = True,
    text_col: str = "text",
) -> rd.Dataset:
    """The C4 line/document cleaning rules (Raffel et al. 2020 §2.2):

    *Line level* — a line survives iff its trimmed form ends in a
    terminal punctuation mark (``. ! ? "``, unless
    ``require_terminal_punct=False``), carries at least
    ``min_words_per_line`` whitespace-delimited words, and does not
    mention ``javascript`` (case-insensitive).

    *Document level* — ``keep=1`` iff at least ``min_lines`` lines
    survived AND the original text contains no ``badwords`` entry (as a
    whole word, case-insensitive), no ``{`` (code page signal), and no
    ``lorem ipsum`` placeholder.

    Emits ``(doc_id, text, n_lines, n_kept, keep)`` with the surviving
    trimmed lines rejoined by ``'\\n'`` in original order; ``text`` is
    the cleaned body regardless of ``keep`` so callers can audit what
    the filter would publish.

    Scale shape: one stateless ``map_batches`` pass — line split,
    per-line predicates, and the doc-level regexes are all Arrow RE2
    kernels over the flattened line array (``list_parent_indices``
    keeps the doc assignment); only the final per-doc join-back walks
    Python, over segment boundaries, not characters. Zero shuffle.
    """
    bad_re = r"\b(" + "|".join(re.escape(w.lower()) for w in badwords) + r")\b"

    def clean(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        lines = pc.split_pattern(text, "\n")
        flat = pc.utf8_trim_whitespace(pc.list_flatten(lines))
        parent = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
        n_words = pc.count_substring_regex(flat, r"\S+")
        ok = pc.greater_equal(n_words, min_words_per_line)
        if require_terminal_punct:
            ok = pc.and_(ok, pc.match_substring_regex(flat, r'[.!?"]$'))
        ok = pc.and_(
            ok,
            pc.invert(
                pc.match_substring(pc.utf8_lower(flat), "javascript")
            ),
        )
        ok_np = ok.to_numpy(zero_copy_only=False)

        n_docs = len(batch)
        n_lines = np.bincount(parent, minlength=n_docs).astype(np.int64)
        n_kept = np.bincount(
            parent[ok_np], minlength=n_docs
        ).astype(np.int64)

        kept_lines = flat.filter(ok).to_pylist()
        kept_parent = parent[ok_np]
        # join-back loop over segment boundaries (kept lines are already
        # in original order; parent indices are non-decreasing)
        bodies = [""] * n_docs
        bounds = np.searchsorted(kept_parent, np.arange(n_docs + 1))
        for d in range(n_docs):
            lo, hi = bounds[d], bounds[d + 1]
            if hi > lo:
                bodies[d] = "\n".join(kept_lines[lo:hi])

        low = pc.utf8_lower(text)
        clean_doc = pc.and_(
            pc.and_(
                pc.invert(pc.match_substring_regex(low, bad_re)),
                pc.invert(pc.match_substring(text, "{")),
            ),
            pc.invert(pc.match_substring(low, "lorem ipsum")),
        ).to_numpy(zero_copy_only=False)
        keep = ((n_kept >= min_lines) & clean_doc).astype(np.int64)

        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": pa.array(bodies, pa.string()),
                "n_lines": pa.array(n_lines, pa.int64()),
                "n_kept": pa.array(n_kept, pa.int64()),
                "keep": pa.array(keep, pa.int64()),
            }
        )

    return ds.map_batches(clean, batch_format="pyarrow")

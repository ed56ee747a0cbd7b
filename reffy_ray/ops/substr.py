"""Exact substring-level dedup via hash-sharded suffix groups.

Distributed analog of suffix-array substring dedup (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better"): every
length-``n`` character gram of a document is a truncated suffix, so
grouping the corpus's gram set by the gram key hash-shards the suffix
space, and any substring of length ≥ ``n`` shared between documents
shows up as a run of gram groups reached by ≥ 2 documents.  A full
suffix array orders the suffixes globally; for duplicate *detection*
and *filtering* the per-group membership is sufficient and it costs
one all-to-all shuffle on the gram key instead of a global sort.

Scale shape
-----------
* The map stage is zero-copy over the Arrow string buffer: one
  ``sliding_window_view`` over the column's concatenated bytes, doc
  boundaries masked via the offsets buffer — no per-row Python loop.
* Each task pre-aggregates to one ``(doc_id, gram, occ)`` row per
  distinct gram per document (Arrow hash aggregation), so the shuffle
  moves suffix-group *membership* rows, never raw positions.
* The groupby key is the gram itself at oracle scale; at 100 TB pass
  ``hash_key=True`` to shuffle a 64-bit rolling hash instead of the
  ``n``-byte string (collision rate 2⁻⁶⁴ per pair, the standard
  suffix-group sharding trade).
* ``substring_dedup`` shards suffix groups into ``num_buckets`` FNV
  buckets (a gram lives in exactly one bucket, so per-bucket dup
  detection is exact); each bucket is one vectorized pandas reduction,
  the per-doc roll-up is a Ray aggregate, and only the O(#dropped-doc)
  drop table is ever materialized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_FNV_PRIME = np.uint64(1099511628211)
_FNV_BASIS = np.uint64(14695981039346656037)


def _string_windows(arr: pa.Array, n: int) -> tuple[np.ndarray, np.ndarray]:
    """All length-``n`` byte windows of a string array plus the row
    index each window belongs to — vectorized over the column's data
    buffer (windows crossing row boundaries are masked out)."""
    if len(arr) == 0:
        return np.empty((0, n), np.uint8), np.empty(0, np.int64)
    off_t = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offsets = np.frombuffer(arr.buffers()[1], off_t)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    lo, hi = offsets[0], offsets[-1]
    buf = data[lo:hi]
    if len(buf) < n:
        return np.empty((0, n), np.uint8), np.empty(0, np.int64)
    starts = np.arange(len(buf) - n + 1, dtype=np.int64)
    row_of = np.searchsorted(offsets - lo, starts, side="right") - 1
    valid = starts + n <= (offsets - lo)[row_of + 1]
    windows = np.lib.stride_tricks.sliding_window_view(buf, n)[valid]
    return np.ascontiguousarray(windows), row_of[valid]


def _fnv64(windows: np.ndarray) -> np.ndarray:
    """Row-wise FNV-1a-style fold of an (m, n) byte matrix →
    int64-reinterpreted uint64 (signed keeps shuffle boundary sampling
    away from uint64→Python-int overflow; only equality matters)."""
    h = np.full(len(windows), _FNV_BASIS)
    for j in range(windows.shape[1]):  # n tiny, rows vectorized
        h = (h * _FNV_PRIME) ^ windows[:, j].astype(np.uint64)
    return h.view(np.int64)


def _fnv64_bytes(bs: bytes) -> np.int64:
    """Scalar companion of :func:`_fnv64` over one byte string (the
    non-ASCII fallback path) — identical fold for identical bytes."""
    h = _FNV_BASIS
    with np.errstate(over="ignore"):
        for byte in bs:
            h = (h * _FNV_PRIME) ^ np.uint64(byte)
    return h.view(np.int64)


def ngram_doc_table(
    batch: pa.Table,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_key: bool = False,
    num_buckets: int | None = None,
) -> pa.Table:
    """Per-batch suffix-group partials: one ``(doc_id, gram, occ,
    total)`` row per distinct length-``n`` gram per document (``total``
    = the document's gram-position count, constant per doc).  With
    ``hash_key`` the gram column is the FNV fold of the gram's UTF-8
    bytes instead of the string; with ``num_buckets`` a ``_bucket``
    column (FNV hash mod buckets — gram-deterministic) is appended.

    Grams are CHARACTER windows (matching SQL ``substr``): the
    zero-copy byte-window fast path applies when the batch is pure
    ASCII (bytes == chars); non-ASCII batches take a per-document
    Python fallback with identical character semantics."""
    texts = batch.column(text_col).combine_chunks()
    if isinstance(texts, pa.ChunkedArray):  # zero-chunk edge
        texts = (
            texts.chunk(0) if texts.num_chunks else pa.array([], pa.string())
        )
    ids = batch.column(id_col)

    def empty() -> pa.Table:
        gram_type = pa.int64() if hash_key else pa.string()
        cols = {
            id_col: pa.array([], ids.type),
            "gram": pa.array([], gram_type),
            "occ": pa.array([], pa.int64()),
            "total": pa.array([], pa.int64()),
        }
        if num_buckets is not None:
            cols["_bucket"] = pa.array([], pa.int64())
        return pa.table(cols)

    n_bytes = int(
        pc.sum(pc.binary_length(pc.cast(texts, pa.binary()))).as_py() or 0
    )
    n_chars = int(pc.sum(pc.utf8_length(texts)).as_py() or 0)
    if n_bytes != n_chars:
        # non-ASCII: byte windows would split multi-byte codepoints
        # (and numpy S→U decoding raises) — char-exact Python fallback
        rows_idx, grams_txt, occs, totals_l = [], [], [], []
        for idx, t in enumerate(texts.to_pylist()):
            t = t or ""
            m = len(t) - n + 1
            if m <= 0:
                continue
            counts: dict = {}
            for j in range(m):
                g = t[j : j + n]
                counts[g] = counts.get(g, 0) + 1
            for g, c in counts.items():
                rows_idx.append(idx)
                grams_txt.append(g)
                occs.append(c)
                totals_l.append(m)
        if not rows_idx:
            return empty()
        hs = np.array(
            [_fnv64_bytes(g.encode("utf-8")) for g in grams_txt], np.int64
        )
        cols = {
            id_col: pc.take(ids, pa.array(rows_idx, pa.int64())),
            "gram": pa.array(hs, pa.int64())
            if hash_key
            else pa.array(grams_txt, pa.string()),
            "occ": pa.array(occs, pa.int64()),
            "total": pa.array(totals_l, pa.int64()),
        }
        if num_buckets is not None:
            cols["_bucket"] = pa.array(
                hs.view(np.uint64) % np.uint64(num_buckets), pa.int64()
            )
        return pa.table(cols)

    windows, row_of = _string_windows(texts, n)
    if len(row_of) == 0:
        return empty()
    h = _fnv64(windows)
    if hash_key:
        gram: pa.Array = pa.array(h, pa.int64())
    else:
        # fixed-size-binary → string keeps NUL bytes intact (a numpy
        # S-dtype round-trip strips trailing NULs as padding)
        fsb = pa.Array.from_buffers(
            pa.binary(n),
            len(windows),
            [None, pa.py_buffer(np.ascontiguousarray(windows).tobytes())],
        )
        gram = pc.cast(pc.cast(fsb, pa.binary()), pa.string())
    doc = pc.take(ids, pa.array(row_of, pa.int64()))
    totals = np.bincount(row_of, minlength=len(texts)).astype(np.int64)
    cols = {
        id_col: doc,
        "gram": gram,
        "total": pa.array(totals[row_of], pa.int64()),
    }
    aggs = [("total", "min"), ([], "count_all")]
    if num_buckets is not None:
        cols["_bucket"] = pa.array(
            h.view(np.uint64) % np.uint64(num_buckets), pa.int64()
        )
        aggs.append(("_bucket", "min"))  # gram-functional, min = the value
    partial = pa.table(cols)
    agg = pa.TableGroupBy(partial, [id_col, "gram"]).aggregate(aggs)
    out = {
        id_col: agg.column(id_col),
        "gram": agg.column("gram"),
        "occ": pc.cast(agg.column("count_all"), pa.int64()),
        "total": agg.column("total_min"),
    }
    if num_buckets is not None:
        out["_bucket"] = agg.column("_bucket_min")
    return pa.table(out)


def duplicated_substrings(
    ds: rd.Dataset,
    n: int = 32,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_key: bool = False,
) -> rd.Dataset:
    """Suffix groups reached by ≥ ``min_docs`` documents — exactly the
    inter-document duplicated substrings of length ``n`` (longer shared
    substrings appear as runs of adjacent groups).  Returns
    ``(gram, n_docs, n_occ)``: distinct documents containing the gram
    and its total occurrence count."""
    from ray.data.aggregate import Count, Sum

    grams = ds.map_batches(
        lambda b: ngram_doc_table(
            b, n, id_col=id_col, text_col=text_col, hash_key=hash_key
        ),
        batch_format="pyarrow",
    )
    agg = grams.groupby("gram").aggregate(
        Count(alias_name="n_docs"), Sum("occ", alias_name="n_occ")
    )
    return agg.filter(expr=f"n_docs >= {int(min_docs)}")


def substring_dedup(
    ds: rd.Dataset,
    n: int = 32,
    min_docs: int = 2,
    max_dup_frac: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_key: bool = False,
    num_buckets: int = 64,
    broadcast_limit: int = 1_000_000,
) -> rd.Dataset:
    """Drop documents whose gram positions are ≥ ``max_dup_frac``
    covered by substrings shared with ≥ ``min_docs`` documents (the
    filtering counterpart of Lee et al.'s substring dedup — document
    granularity, which is what a Dataset filter can express; span-level
    excision would be a map over the same group output).

    Shape: one shuffle of the gram partials on ``_bucket`` (a gram
    lives in exactly one FNV bucket, so per-bucket duplicate detection
    is exact and the group count is bounded by ``num_buckets`` — each
    group call is one vectorized pandas reduction, never per-gram
    Python), a per-doc Ray aggregate roll-up, then the same
    broadcast-or-join corpus filter as ``near_dedup``.  Documents
    shorter than ``n`` have no grams and are always kept."""
    import pandas as pd
    from ray.data.aggregate import Min, Sum

    grams = ds.map_batches(
        lambda b: ngram_doc_table(
            b, n, id_col=id_col, text_col=text_col,
            hash_key=hash_key, num_buckets=num_buckets,
        ),
        batch_format="pyarrow",
    )

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        # rows are per (doc, gram): group size == distinct docs
        sizes = g.groupby("gram")["occ"].transform("size")
        dup_rows = g[sizes >= min_docs]
        if dup_rows.empty:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=g[id_col].dtype),
                    "_dup_occ": pd.Series([], dtype="int64"),
                    "_total": pd.Series([], dtype="int64"),
                }
            )
        agg = dup_rows.groupby(id_col, as_index=False).agg(
            _dup_occ=("occ", "sum"), _total=("total", "min")
        )
        return agg

    per_doc = (
        grams.groupby("_bucket")
        .map_groups(bucket_stats, batch_format="pandas")
        .groupby(id_col)
        .aggregate(
            Sum("_dup_occ", alias_name="_dup_occ"),
            Min("_total", alias_name="_total"),
        )
    )

    def threshold(b: pa.Table) -> pa.Table:
        # same float comparison as the SQL oracle (`dup >= frac * total`);
        # exact for the default 0.5 — dyadic fraction, no drift
        mask = pc.greater_equal(
            pc.cast(b.column("_dup_occ"), pa.float64()),
            pc.multiply(
                pc.cast(b.column("_total"), pa.float64()), max_dup_frac
            ),
        )
        return b.filter(mask).drop_columns(["_total"])

    # the drop table is O(#dropped docs) — materializing it is the
    # family's one pinch point (same as near_dedup's label count) and
    # lets the no-dup case skip the final pass entirely
    from reffy_ray.util import filter_by_drop_ids

    drops = (
        per_doc.map_batches(threshold, batch_format="pyarrow")
        .select_columns([id_col])
        .materialize()
    )
    return filter_by_drop_ids(ds, drops, id_col, broadcast_limit)

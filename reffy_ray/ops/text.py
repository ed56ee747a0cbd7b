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
    """Token counting with a BPE-ish word/punct regex compiled once per
    actor (GPT-2 pre-tokenizer-style splitting, simplified)."""

    def __init__(self):
        self.pat = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_bpeish": batch["text"].map(lambda t: len(self.pat.findall(t or ""))),
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


_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "dans", "pour"},
    "es": {"el", "la", "los", "las", "es", "un", "una", "de", "en", "por"},
}


class LangId:
    """n-gram/stopword language-ID heuristic; tables built once per actor."""

    def __init__(self):
        self.word = re.compile(r"[a-zA-Zäöüéèàñ]+")
        self.tables = {
            lang: frozenset(words) for lang, words in _LANG_STOPWORDS.items()
        }

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        def predict(t: str) -> str:
            words = [w.lower() for w in self.word.findall(t or "")[:200]]
            if not words:
                return "und"
            best, best_hits = "und", 0
            for lang, table in self.tables.items():
                hits = sum(w in table for w in words)
                if hits > best_hits:
                    best, best_hits = lang, hits
            return best

        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "lang_pred": batch["text"].map(predict)}
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
    """64-bit rolling-hash document fingerprint (deterministic)."""

    def __init__(self):
        self.ws = _WS

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        def fp(t: str) -> int:
            h = 1469598103934665603
            for tok in self.ws.split((t or "").strip()):
                for b in tok.encode("utf-8"):
                    h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
            return np.int64(np.uint64(h) >> np.uint64(1)).item()  # keep positive int64

        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "fingerprint": batch["text"].map(fp)}
        )


def sessionize_events(ds, gap_minutes: int = 30):
    """Session windows over an event log: per user, a new session
    starts when the gap to the previous event exceeds ``gap_minutes``
    (gaps-and-islands). Partition by user (groupby shuffle), sort by ts
    within the group, cumulative-sum the gap flags — the streaming-
    shaped pattern from the ray_guide ('treat the input as an ordered,
    partitioned log')."""
    import pandas as pd

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        gap = g["ts"].diff() > pd.Timedelta(minutes=gap_minutes)
        session_idx = gap.cumsum().astype("int64")
        out = (
            g.assign(session_idx=session_idx)
            .groupby("session_idx")
            .agg(
                user_id=("user_id", "first"),
                session_start=("ts", "min"),
                n_events=("ts", "size"),
            )
            .reset_index(drop=True)
        )
        return out[["user_id", "session_start", "n_events"]]

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")

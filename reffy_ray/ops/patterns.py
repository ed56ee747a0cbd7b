"""Sequence-pattern matching over per-key event streams.

``event_pattern`` is the MATCH_RECOGNIZE(PATTERN (A B C)) primitive
with skip-till-next-match semantics: within each user's stream
(ordered by event id — the ingestion sequence), greedily find
non-overlapping instances of ``first A, then the first B after it,
then the first C after that``; after a completed match, scanning
resumes past the match's C. Funnels count stage conversion;
this emits the actual match instances a sessional feature builder or
abuse detector consumes.

Scale shape: ONE ``groupby(key)`` co-partitioning shuffle, then a
per-group kernel that is vectorized except for a loop over *matches*
(bounded by #A-events per key, not #events — searchsorted advances
over pre-split per-type id arrays). Partitioning assumption: one
key's rows fit in a group task; salt hot keys by coarse time range
and stitch boundary matches in a second tiny pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def event_pattern(
    events: rd.Dataset,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
    key: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> rd.Dataset:
    """Per-key non-overlapping A→B→C match instances. Emits one row
    per match: ``(user_id, match_idx, a_id, b_id, c_id, span_us)``,
    all int64 — span_us is the ts distance from the A event to the C
    event."""
    import pyarrow as pa

    ka, kb, kc = steps

    def to_cols(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": batch.column(key).cast(pa.int64()),
                "i": batch.column(id_col).cast(pa.int64()),
                "ty": batch.column(type_col),
                "t": batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()),
            }
        )

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("i", kind="mergesort")
        ids = g["i"].to_numpy()
        ts = g["t"].to_numpy()
        ty = g["ty"].to_numpy()
        a_ids = ids[ty == ka]
        b_ids = ids[ty == kb]
        c_ids = ids[ty == kc]
        out_a, out_b, out_c = [], [], []
        pos = np.iinfo(np.int64).min
        while True:
            ia = np.searchsorted(a_ids, pos, side="right")
            if ia >= len(a_ids):
                break
            a = a_ids[ia]
            ib = np.searchsorted(b_ids, a, side="right")
            if ib >= len(b_ids):
                break
            b = b_ids[ib]
            ic = np.searchsorted(c_ids, b, side="right")
            if ic >= len(c_ids):
                break
            c = c_ids[ic]
            out_a.append(a)
            out_b.append(b)
            out_c.append(c)
            pos = c
        n = len(out_a)
        if not n:
            return pd.DataFrame(
                {c_: pd.Series([], dtype="int64")
                 for c_ in (key, "match_idx", "a_id", "b_id",
                            "c_id", "span_us")}
            )
        aa = np.asarray(out_a, dtype=np.int64)
        cc = np.asarray(out_c, dtype=np.int64)
        t_of = lambda q: ts[np.searchsorted(ids, q)]  # noqa: E731
        return pd.DataFrame(
            {
                key: np.full(n, int(g["u"].iloc[0]), dtype=np.int64),
                "match_idx": np.arange(n, dtype=np.int64),
                "a_id": aa,
                "b_id": np.asarray(out_b, dtype=np.int64),
                "c_id": cc,
                "span_us": t_of(cc) - t_of(aa),
            }
        )

    return (
        events.select_columns([key, id_col, type_col, ts_col])
        .map_batches(to_cols, batch_format="pyarrow")
        .groupby("u")
        .map_groups(per_key, batch_format="pandas")
    )

"""Rolling (sliding) time-window aggregates.

``rolling_agg`` computes, for every row, the count and sum of a value
column over the trailing time window ``[ts - window, ts]`` within the
same key — SQL's ``RANGE BETWEEN <window> PRECEDING AND CURRENT ROW``
frame, including CURRENT ROW's ts-peers, per the standard.

Shape: one ``groupby(by)`` co-partitioning shuffle, then a fully
vectorized per-group kernel — sort by ts once, two binary-searched
boundaries (``np.searchsorted``) and a prefix-sum difference; O(g log g)
per group, no Python loop over rows. Partitioning assumption: one
key's rows fit in a group task (salt hot keys by coarse time bucket and
carry the previous bucket's tail window if a key dominates).

Sums are taken over an integer column (or a value scaled to integer by
the caller) so results are bitwise reproducible across engines and
block layouts — float accumulation order never enters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def rolling_agg(
    ds: rd.Dataset,
    by: str,
    ts: str,
    value: str,
    window,
) -> rd.Dataset:
    """Adds ``w_count`` (rows in the trailing window, peers included)
    and ``w_sum`` (sum of ``value`` over the same frame) to every row.

    ``window`` is a ``pd.Timedelta``-compatible offset for timestamp
    ``ts`` columns, or a plain number for numeric ``ts``.
    """

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(ts, kind="mergesort").reset_index(drop=True)
        t = g[ts].to_numpy()
        if np.issubdtype(t.dtype, np.datetime64):
            w = pd.Timedelta(window).to_numpy()
        else:
            w = window
        lo = np.searchsorted(t, t - w, side="left")
        hi = np.searchsorted(t, t, side="right")  # RANGE frame: peers included
        v = g[value].to_numpy(dtype=np.int64)
        csum = np.concatenate(([0], np.cumsum(v)))
        g["w_count"] = (hi - lo).astype(np.int64)
        g["w_sum"] = csum[hi] - csum[lo]
        return g

    return ds.groupby(by).map_groups(per_key, batch_format="pandas")


def sessionize(
    events: rd.Dataset,
    gap_us: int = 28_800_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> rd.Dataset:
    """Gap-based sessionization: within each user's event stream
    (ordered by ``(ts, event_id)``), a new session starts whenever the
    gap to the previous event exceeds ``gap_us`` microseconds — the
    standard clickstream/session-log primitive. Emits one row per
    session: ``(user_id, session_seq, n_events, start_us, end_us)``,
    all int64 (timestamps as epoch microseconds), so output hashes are
    engine-independent. ``session_seq`` is 1-based per user.

    Scale shape: ONE key-collocating sort on ``(user, ts, id)``, then
    the same per-block census trick as ``sampling.global_rank`` — a
    session boundary depends only on the previous row, so each
    materialized block is summarized by (first row key, whether its
    first row continues the previous block's session, prior session
    count of its first user): #blocks rows on the driver, broadcast
    back via ``ray.put``, then a fully vectorized per-block pass. The
    final per-session reduce is a ``groupby`` on already-co-located
    ``(user, session_seq)`` keys. No per-group dispatch, no per-row
    driver work.
    """
    import pyarrow as pa
    import ray as _ray
    from ray.data.aggregate import Count, Max, Min

    def to_us(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": batch.column(user_col).cast(pa.int64()),
                "t": batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()),
                "i": batch.column(id_col).cast(pa.int64()),
            }
        )

    srt = (
        events.select_columns([user_col, ts_col, id_col])
        .map_batches(to_us, batch_format="pyarrow")
        .sort(["u", "t", "i"])
        .materialize()
    )

    def census(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64")
                 for c in ("fu", "ft", "fi", "lu", "lt", "nsl")}
            )
        u, t = b["u"].to_numpy(), b["t"].to_numpy()
        start = np.ones(len(b), dtype=bool)
        start[1:] = (u[1:] != u[:-1]) | ((t[1:] - t[:-1]) > gap_us)
        last = u[-1]
        return pd.DataFrame(
            {
                "fu": [int(u[0])], "ft": [int(t[0])], "fi": [int(b["i"].iloc[0])],
                "lu": [int(last)], "lt": [int(t[-1])],
                # session starts belonging to the block's LAST user,
                # counted as if the block's first row were a start
                "nsl": [int(start[u == last].sum())],
            }
        )

    blocks = sorted(
        (int(r["fu"]), int(r["ft"]), int(r["fi"]),
         int(r["lu"]), int(r["lt"]), int(r["nsl"]))
        for r in srt.map_batches(
            census, batch_format="pandas", batch_size=None
        ).take_all()
    )
    # stitch blocks in key order: does each block's first row start a
    # new session, and how many sessions has its first user already had
    stitch: dict = {}
    cur_u, cur_t, cur_n = None, None, 0
    for fu, ft, fi, lu, lt, nsl in blocks:
        cont = cur_u == fu and (ft - cur_t) <= gap_us
        prior = cur_n if fu == cur_u else 0
        stitch[(fu, ft, fi)] = (not cont, prior)
        if lu == fu:
            # nsl counted the block-first row as a start; undo if it
            # actually continues the previous block's session
            cur_n = prior + nsl - (1 if cont else 0)
        else:
            cur_n = nsl
        cur_u, cur_t = lu, lt
    st_ref = _ray.put(stitch)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64")
                 for c in ("u", "t", "session_seq")}
            )
        first_is_start, prior = _ray.get(st_ref)[
            (int(b["u"].iloc[0]), int(b["t"].iloc[0]), int(b["i"].iloc[0]))
        ]
        u, t = b["u"].to_numpy(), b["t"].to_numpy()
        start = np.ones(len(b), dtype=bool)
        start[1:] = (u[1:] != u[:-1]) | ((t[1:] - t[:-1]) > gap_us)
        start[0] = first_is_start
        sid = np.cumsum(start)
        user_change = np.ones(len(b), dtype=bool)
        user_change[1:] = u[1:] != u[:-1]
        # sid at each user segment's first row, forward-filled
        base = np.maximum.accumulate(np.where(user_change, sid, 0))
        ordinal = sid - base
        # first user segment continues from prior blocks; later
        # segments begin fresh with a guaranteed start row
        seg0 = ~np.logical_or.accumulate(
            np.concatenate(([False], user_change[1:]))
        )
        add = np.where(seg0, prior + int(first_is_start), 1)
        return pd.DataFrame(
            {"u": u, "t": t, "session_seq": (ordinal + add).astype(np.int64)}
        )

    per_row = srt.map_batches(assign, batch_format="pandas", batch_size=None)
    out = (
        per_row.groupby(["u", "session_seq"])
        .aggregate(
            Count(alias_name="n_events"),
            Min("t", alias_name="start_us"),
            Max("t", alias_name="end_us"),
        )
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                user_col: b.column("u"),
                "session_seq": b.column("session_seq"),
                "n_events": b.column("n_events").cast(pa.int64()),
                "start_us": b.column("start_us").cast(pa.int64()),
                "end_us": b.column("end_us").cast(pa.int64()),
            }
        )

    return out.map_batches(rename, batch_format="pyarrow")


def event_gaps(
    events: rd.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> rd.Dataset:
    """Per-event lag features within each user's stream ordered by
    ``(ts, event_id)``: ``gap_us`` — microseconds since the user's
    previous event (-1 sentinel on each user's first event, so the
    column stays int64 with no NULLs) — and ``seq``, the 0-based
    position in the stream. The standard lead/lag feature pair
    (``lag(ts) OVER (PARTITION BY user ORDER BY ts, id)``).

    Scale shape: same as :func:`sessionize` — ONE key-collocating sort
    on ``(user, ts, id)``, then a per-block census (first key, last
    user's tail state) stitched on the driver (#blocks rows) and
    broadcast back for a fully vectorized per-block pass. No per-group
    dispatch, no join, no second shuffle.
    """
    import pyarrow as pa
    import ray as _ray

    def to_us(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": batch.column(user_col).cast(pa.int64()),
                "t": batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()),
                "i": batch.column(id_col).cast(pa.int64()),
            }
        )

    srt = (
        events.select_columns([user_col, ts_col, id_col])
        .map_batches(to_us, batch_format="pyarrow")
        .sort(["u", "t", "i"])
        .materialize()
    )

    def census(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64")
                 for c in ("fu", "ft", "fi", "lu", "lt", "nl")}
            )
        u = b["u"].to_numpy()
        return pd.DataFrame(
            {
                "fu": [int(u[0])],
                "ft": [int(b["t"].iloc[0])],
                "fi": [int(b["i"].iloc[0])],
                "lu": [int(u[-1])],
                "lt": [int(b["t"].iloc[-1])],
                # rows of the block's LAST user inside this block
                "nl": [int((u == u[-1]).sum())],
            }
        )

    blocks = sorted(
        (int(r["fu"]), int(r["ft"]), int(r["fi"]),
         int(r["lu"]), int(r["lt"]), int(r["nl"]))
        for r in srt.map_batches(
            census, batch_format="pandas", batch_size=None
        ).take_all()
    )
    # stitch in key order: the previous block's tail (user, ts, #rows)
    # tells each block whether its first row continues a user stream
    stitch: dict = {}
    cur_u, cur_t, cur_n = None, None, 0
    for fu, ft, fi, lu, lt, nl in blocks:
        if fu == cur_u:
            stitch[(fu, ft, fi)] = (cur_t, cur_n)
            cur_n = cur_n + nl if lu == fu else nl
        else:
            stitch[(fu, ft, fi)] = (-1, 0)
            cur_n = nl
        cur_u, cur_t = lu, lt
    st_ref = _ray.put(stitch)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64")
                 for c in ("event_id", "gap_us", "seq")}
            )
        prev_t, prior = _ray.get(st_ref)[
            (int(b["u"].iloc[0]), int(b["t"].iloc[0]), int(b["i"].iloc[0]))
        ]
        u, t = b["u"].to_numpy(), b["t"].to_numpy()
        n = len(b)
        gap = np.empty(n, dtype=np.int64)
        gap[1:] = np.where(u[1:] == u[:-1], t[1:] - t[:-1], -1)
        gap[0] = t[0] - prev_t if prior > 0 else -1
        idx = np.arange(n, dtype=np.int64)
        user_change = np.ones(n, dtype=bool)
        user_change[1:] = u[1:] != u[:-1]
        seg_start = np.maximum.accumulate(np.where(user_change, idx, 0))
        seq = idx - seg_start
        # the first user segment continues from previous blocks
        first_seg = ~np.logical_or.accumulate(
            np.concatenate(([False], user_change[1:]))
        )
        seq = seq + np.where(first_seg, prior, 0)
        return pd.DataFrame(
            {
                "event_id": b["i"].to_numpy(),
                "gap_us": gap,
                "seq": seq.astype(np.int64),
            }
        )

    return srt.map_batches(assign, batch_format="pandas", batch_size=None)


def event_transitions(
    events: rd.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> rd.Dataset:
    """First-order Markov transition counts: for each ordered pair of
    event types (prev → next), how many adjacent event pairs within a
    user's stream (ordered by ``(ts, event_id)``) made that transition
    — the funnel/behavior-model primitive (``lag(type) OVER
    (PARTITION BY user ORDER BY ts, id)`` then GROUP BY).

    Scale shape: ONE key-collocating sort on ``(user, ts, id)``; each
    block reduces its interior adjacencies to partial ``(prev, next,
    n)`` counts (≤ t² rows per block for t distinct types), block
    boundaries are stitched from a #blocks-row census on the driver and
    re-injected as unit rows, and one tiny ``groupby(prev, next)`` sums
    the partials. No per-group dispatch; the shuffle moves partial
    counts, never events.
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def keyed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": batch.column(user_col).cast(pa.int64()),
                "t": batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()),
                "i": batch.column(id_col).cast(pa.int64()),
                "e": batch.column(type_col).cast(pa.string()),
            }
        )

    srt = (
        events.select_columns([user_col, ts_col, id_col, type_col])
        .map_batches(keyed, batch_format="pyarrow")
        .sort(["u", "t", "i"])
        .materialize()
    )

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "prev": pd.Series([], dtype="object"),
                "next": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
            }
        )
        if len(b) < 2:
            return empty
        u = b["u"].to_numpy()
        e = b["e"].to_numpy()
        same = u[1:] == u[:-1]
        if not same.any():
            return empty
        pairs = pd.DataFrame({"prev": e[:-1][same], "next": e[1:][same]})
        out = pairs.groupby(["prev", "next"], as_index=False, sort=False).size()
        return out.rename(columns={"size": "n"}).astype({"n": "int64"})

    def census(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {
                    "fu": pd.Series([], dtype="int64"),
                    "ft": pd.Series([], dtype="int64"),
                    "fi": pd.Series([], dtype="int64"),
                    "fe": pd.Series([], dtype="object"),
                    "lu": pd.Series([], dtype="int64"),
                    "le": pd.Series([], dtype="object"),
                }
            )
        return pd.DataFrame(
            {
                "fu": [int(b["u"].iloc[0])],
                "ft": [int(b["t"].iloc[0])],
                "fi": [int(b["i"].iloc[0])],
                "fe": [b["e"].iloc[0]],
                "lu": [int(b["u"].iloc[-1])],
                "le": [b["e"].iloc[-1]],
            }
        )

    blocks = sorted(
        (
            (int(r["fu"]), int(r["ft"]), int(r["fi"])),
            r["fe"],
            int(r["lu"]),
            r["le"],
        )
        for r in srt.map_batches(
            census, batch_format="pandas", batch_size=None
        ).take_all()
    )
    bprev, bnext = [], []
    prev_lu, prev_le = None, None
    for (fu, _ft, _fi), fe, lu, le in blocks:
        if prev_lu is not None and prev_lu == fu:
            bprev.append(prev_le)
            bnext.append(fe)
        prev_lu, prev_le = lu, le

    parts = srt.map_batches(partials, batch_format="pandas", batch_size=None)
    if bprev:
        boundary = rd.from_pandas(
            pd.DataFrame(
                {"prev": bprev, "next": bnext, "n": np.ones(len(bprev), "int64")}
            )
        )
        parts = parts.union(boundary)

    out = parts.groupby(["prev", "next"]).aggregate(Sum("n", alias_name="n"))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "prev": b.column("prev"),
                "next": b.column("next"),
                "n": b.column("n").cast(pa.int64()),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


def user_paths(
    events: rd.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    sep: str = ">",
) -> rd.Dataset:
    """Ordered collect per group: each user's full event-type sequence
    as a ``sep``-joined string (``string_agg(type, sep ORDER BY ts,
    id)``), plus the event count — the path-analysis primitive.

    Scale shape: ONE key-collocating sort on ``(user, ts, id)``, then
    each block pre-concatenates every user's run WITHIN the block into
    one ``(user, block-first-key, part, n)`` partial row — the shuffle
    that follows moves one row per (user, block) pair, not one per
    event — and a ``groupby(user).map_groups`` joins each user's few
    parts in key order. Per-user output is bounded by the user's own
    stream length (the natural bound for any ordered-collect)."""
    import pyarrow as pa

    def keyed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": batch.column(user_col).cast(pa.int64()),
                "t": batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()),
                "i": batch.column(id_col).cast(pa.int64()),
                "e": batch.column(type_col).cast(pa.string()),
            }
        )

    srt = (
        events.select_columns([user_col, ts_col, id_col, type_col])
        .map_batches(keyed, batch_format="pyarrow")
        .sort(["u", "t", "i"])
        .materialize()
    )

    def parts(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {
                    "u": pd.Series([], dtype="int64"),
                    "kt": pd.Series([], dtype="int64"),
                    "ki": pd.Series([], dtype="int64"),
                    "part": pd.Series([], dtype="object"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        g = b.groupby("u", sort=True)
        return pd.DataFrame(
            {
                "u": g["u"].first().to_numpy(),
                "kt": g["t"].first().to_numpy(),
                "ki": g["i"].first().to_numpy(),
                "part": g["e"].agg(sep.join).to_numpy(),
                "n": g.size().to_numpy().astype("int64"),
            }
        )

    def join_parts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["kt", "ki"])
        return pd.DataFrame(
            {
                user_col: [int(g["u"].iloc[0])],
                "path": [sep.join(g["part"])],
                "n_events": [int(g["n"].sum())],
            }
        )

    return (
        srt.map_batches(parts, batch_format="pandas", batch_size=None)
        .groupby("u")
        .map_groups(join_parts, batch_format="pandas")
    )


def tumbling_agg(
    events: rd.Dataset,
    every_us: int = 3_600_000_000,
    ts_col: str = "ts",
    by: str = "event_type",
    value_col: str = "value",
) -> rd.Dataset:
    """Tumbling event-time window aggregate: count and integer-cents
    sum per ``(window_start, by)`` where ``window_start = (t //
    every) × every`` epoch-µs — the batch restatement of a streaming
    tumbling window (each event in exactly one window).

    Combiner shape: per-block pandas groupby partials (≤ #windows ×
    #groups rows per block) → ONE small groupby-sum. Window starts are
    int64 epoch-µs so output hashes are engine-independent.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = (
            b.column(ts_col)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        cents = (
            pc.cast(pc.floor(pc.multiply(b.column(value_col), 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        g = pd.DataFrame(
            {
                "w": (t // every_us) * every_us,
                by: b.column(by).to_pandas(),
                "n": np.ones(len(t), dtype="int64"),
                "cents": cents,
            }
        ).groupby(["w", by], as_index=False, sort=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        events.select_columns([ts_col, by, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["w", by])
        .aggregate(Sum("n", alias_name="n"), Sum("cents", alias_name="cents"))
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "w": b.column("w").cast(pa.int64()),
                by: b.column(by),
                "n": b.column("n").cast(pa.int64()),
                "cents": b.column("cents").cast(pa.int64()),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


def hopping_agg(
    events: rd.Dataset,
    every_us: int = 3_600_000_000,
    hop_us: int = 900_000_000,
    ts_col: str = "ts",
    by: str = "event_type",
    value_col: str = "value",
) -> rd.Dataset:
    """Hopping (sliding) event-time window aggregate: like
    :func:`tumbling_agg` but each event lands in ``every/hop``
    overlapping windows (window starts at every ``hop`` µs, length
    ``every``). Requires ``every % hop == 0`` so the expansion factor
    is a constant k — the per-block expansion is then a fully
    vectorized ``np.repeat`` + tiled offsets, immediately re-reduced
    by the in-block combiner before anything shuffles (the shuffle
    sees ≤ k × #windows × #groups partial rows per block, never k ×
    #events)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    if every_us % hop_us:
        raise ValueError("every_us must be a multiple of hop_us")
    k = every_us // hop_us

    def partial(b: pa.Table) -> pa.Table:
        t = (
            b.column(ts_col)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        cents = (
            pc.cast(pc.floor(pc.multiply(b.column(value_col), 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        grp = b.column(by).to_pandas().to_numpy()
        base = (t // hop_us) * hop_us
        # windows covering t: base, base-hop, ..., base-(k-1)*hop
        w = np.repeat(base, k) - np.tile(
            np.arange(k, dtype=np.int64) * hop_us, len(t)
        )
        g = pd.DataFrame(
            {
                "w": w,
                by: np.repeat(grp, k),
                "n": np.ones(len(w), dtype="int64"),
                "cents": np.repeat(cents, k),
            }
        ).groupby(["w", by], as_index=False, sort=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        events.select_columns([ts_col, by, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["w", by])
        .aggregate(Sum("n", alias_name="n"), Sum("cents", alias_name="cents"))
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "w": b.column("w").cast(pa.int64()),
                by: b.column(by),
                "n": b.column("n").cast(pa.int64()),
                "cents": b.column("cents").cast(pa.int64()),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


def debounce_events(
    events: rd.Dataset,
    window_us: int = 3_600_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> rd.Dataset:
    """Debounce: drop an event when the SAME (user, type) fired within
    the previous ``window_us`` µs (lag-gap semantics — the dedup you
    run on at-least-once event streams before counting anything).

    Scale shape: ONE key-collocating sort on ``(user, type, ts, id)``;
    in-block the drop mask is a vectorized shift-compare, and each
    block's first row is resolved against the previous block's last
    ``(user, type, ts)`` from a #blocks-row census on the driver. No
    joins, no per-group dispatch.
    """
    import pyarrow as pa
    import ray as _ray

    def keyed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": batch.column(user_col).cast(pa.int64()),
                "e": batch.column(type_col).cast(pa.string()),
                "t": batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()),
                "i": batch.column(id_col).cast(pa.int64()),
            }
        )

    srt = (
        events.select_columns([user_col, type_col, ts_col, id_col])
        .map_batches(keyed, batch_format="pyarrow")
        .sort(["u", "e", "t", "i"])
        .materialize()
    )

    def census(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {
                    "fu": pd.Series([], dtype="int64"),
                    "fe": pd.Series([], dtype="object"),
                    "ft": pd.Series([], dtype="int64"),
                    "fi": pd.Series([], dtype="int64"),
                    "lu": pd.Series([], dtype="int64"),
                    "le": pd.Series([], dtype="object"),
                    "lt": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "fu": [int(b["u"].iloc[0])],
                "fe": [b["e"].iloc[0]],
                "ft": [int(b["t"].iloc[0])],
                "fi": [int(b["i"].iloc[0])],
                "lu": [int(b["u"].iloc[-1])],
                "le": [b["e"].iloc[-1]],
                "lt": [int(b["t"].iloc[-1])],
            }
        )

    blocks = sorted(
        (
            (int(r["fu"]), r["fe"], int(r["ft"]), int(r["fi"])),
            int(r["lu"]),
            r["le"],
            int(r["lt"]),
        )
        for r in srt.map_batches(
            census, batch_format="pandas", batch_size=None
        ).take_all()
    )
    # for each block's first row: the previous block's tail state
    stitch = {}
    prev = None  # (lu, le, lt)
    for fkey, lu, le, lt in blocks:
        stitch[fkey] = prev
        prev = (lu, le, lt)
    sref = _ray.put(stitch)

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {
                    user_col: pd.Series([], dtype="int64"),
                    type_col: pd.Series([], dtype="object"),
                    "t_us": pd.Series([], dtype="int64"),
                    id_col: pd.Series([], dtype="int64"),
                }
            )
        u = b["u"].to_numpy()
        e = b["e"].to_numpy()
        t = b["t"].to_numpy()
        same = np.zeros(len(b), dtype=bool)
        same[1:] = (u[1:] == u[:-1]) & (e[1:] == e[:-1])
        gap_ok = np.ones(len(b), dtype=bool)
        gap_ok[1:] = (t[1:] - t[:-1]) > window_us
        kp = ~same | gap_ok
        tail = _ray.get(sref)[
            (int(u[0]), e[0], int(t[0]), int(b["i"].iloc[0]))
        ]
        if tail is not None and tail[0] == u[0] and tail[1] == e[0]:
            kp[0] = (t[0] - tail[2]) > window_us
        return pd.DataFrame(
            {
                user_col: u[kp],
                type_col: e[kp],
                "t_us": t[kp],
                id_col: b["i"].to_numpy()[kp],
            }
        )

    return srt.map_batches(keep, batch_format="pandas", batch_size=None)


def cumulative_agg(
    events: rd.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value_i",
) -> rd.Dataset:
    """Per-key running totals — ``sum(value) OVER (PARTITION BY user
    ORDER BY ts, id ROWS UNBOUNDED PRECEDING)`` plus the matching
    running ``count(*)`` (``cum_n``, 1-based, inclusive). ``value_col``
    must be int64 (convert money to integer cents upstream) so every
    partial and total is exact.

    Scale shape: same as :func:`sessionize` / :func:`event_gaps` —
    ONE key-collocating sort on ``(user, ts, id)``, a per-block census
    (first key + the tail user's in-block sum/count: #blocks rows)
    stitched on the driver into a per-block carry, broadcast back for
    one fully vectorized cumsum pass per block. Only key-boundary
    users contribute carry state; no join, no second shuffle.
    """
    import pyarrow as pa
    import ray as _ray

    def to_i(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": batch.column(user_col).cast(pa.int64()),
                "t": batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()),
                "i": batch.column(id_col).cast(pa.int64()),
                "v": batch.column(value_col).cast(pa.int64()),
            }
        )

    srt = (
        events.select_columns([user_col, ts_col, id_col, value_col])
        .map_batches(to_i, batch_format="pyarrow")
        .sort(["u", "t", "i"])
        .materialize()
    )

    def census(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64")
                 for c in ("fu", "ft", "fi", "lu", "ls", "ln")}
            )
        u = b["u"].to_numpy()
        tail = u == u[-1]  # sorted block: the last user's rows are a suffix
        return pd.DataFrame(
            {
                "fu": [int(u[0])],
                "ft": [int(b["t"].iloc[0])],
                "fi": [int(b["i"].iloc[0])],
                "lu": [int(u[-1])],
                "ls": [int(b["v"].to_numpy()[tail].sum())],
                "ln": [int(tail.sum())],
            }
        )

    blocks = sorted(
        (int(r["fu"]), int(r["ft"]), int(r["fi"]),
         int(r["lu"]), int(r["ls"]), int(r["ln"]))
        for r in srt.map_batches(
            census, batch_format="pandas", batch_size=None
        ).take_all()
    )
    # key-ordered stitch: carry = the first user's totals accumulated
    # across all earlier blocks (nonzero only for boundary users)
    stitch: dict = {}
    cur_u, cur_s, cur_n = None, 0, 0
    for fu, ft, fi, lu, ls, ln in blocks:
        if fu == cur_u:
            stitch[(fu, ft, fi)] = (cur_s, cur_n)
        else:
            stitch[(fu, ft, fi)] = (0, 0)
            cur_s, cur_n = 0, 0
        if lu == fu:
            cur_s, cur_n = cur_s + ls, cur_n + ln
        else:
            cur_s, cur_n = ls, ln
        cur_u = lu
    st_ref = _ray.put(stitch)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    user_col: pd.Series([], dtype="int64"),
                    "t_us": pd.Series([], dtype="int64"),
                    "cum_sum": pd.Series([], dtype="int64"),
                    "cum_n": pd.Series([], dtype="int64"),
                }
            )
        u = b["u"].to_numpy()
        v = b["v"].to_numpy()
        cs = v.cumsum()
        cn = np.arange(1, len(b) + 1, dtype="int64")
        # subtract each user's prefix offset (vectorized group reset)
        starts = np.zeros(len(b), dtype=bool)
        starts[0] = True
        starts[1:] = u[1:] != u[:-1]
        idx = np.flatnonzero(starts)
        off_s = np.repeat(cs[idx] - v[idx], np.diff(np.append(idx, len(b))))
        off_n = np.repeat(cn[idx] - 1, np.diff(np.append(idx, len(b))))
        cs = cs - off_s
        cn = cn - off_n
        carry_s, carry_n = _ray.get(st_ref)[
            (int(u[0]), int(b["t"].iloc[0]), int(b["i"].iloc[0]))
        ]
        first = u == u[0]
        cs[first] += carry_s
        cn[first] += carry_n
        return pd.DataFrame(
            {
                id_col: b["i"].to_numpy(),
                user_col: u,
                "t_us": b["t"].to_numpy(),
                "cum_sum": cs.astype("int64"),
                "cum_n": cn.astype("int64"),
            }
        )

    return srt.map_batches(assign, batch_format="pandas", batch_size=None)


def max_concurrency(
    events: rd.Dataset,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    duration_us: int = 60_000_000,
) -> rd.Dataset:
    """Sweep-line interval-overlap maximum: treat each event as a
    half-open interval ``[ts, ts + duration)`` and compute, per key,
    the maximum number of simultaneously open intervals. End-exclusive
    tie rule: an interval closing at *t* never overlaps one opening at
    *t* (the -1 delta sorts before the +1 at equal timestamps).

    Scale shape: explode each row into two delta rows (+1 at start,
    -1 at end) — a 2× map, no join — then the :func:`cumulative_agg`
    census-stitch: ONE key-collocating sort on ``(key, t, delta,
    id)``, a per-block census carrying each boundary key's in-block
    delta sum (#blocks rows to the driver), and a fully vectorized
    per-block running-sum pass that emits ONE partial-max row per
    (block, key) segment. A final tiny ``groupby(key).max`` over
    those partials yields the answer; the row dimension only ever
    flows through the sort.
    """
    import pyarrow as pa
    import ray as _ray
    from ray.data.aggregate import Max

    def deltas(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_pylist()
        t = (
            batch.column(ts_col)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        i = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = batch.num_rows
        return pa.table(
            {
                "k": pa.array(k + k, pa.string()),
                "t": pa.array(np.concatenate([t, t + duration_us]), pa.int64()),
                "d": pa.array(
                    np.concatenate(
                        [
                            np.ones(n, dtype="int64"),
                            np.full(n, -1, dtype="int64"),
                        ]
                    )
                ),
                "i": pa.array(np.concatenate([i, i]), pa.int64()),
            }
        )

    srt = (
        events.select_columns([key_col, ts_col, id_col])
        .map_batches(deltas, batch_format="pyarrow")
        .sort(["k", "t", "d", "i"])
        .materialize()
    )

    def census(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {
                    "fk": pd.Series([], dtype="object"),
                    "ft": pd.Series([], dtype="int64"),
                    "fd": pd.Series([], dtype="int64"),
                    "fi": pd.Series([], dtype="int64"),
                    "lk": pd.Series([], dtype="object"),
                    "ls": pd.Series([], dtype="int64"),
                }
            )
        k = b["k"].to_numpy()
        tail = k == k[-1]
        return pd.DataFrame(
            {
                "fk": [str(k[0])],
                "ft": [int(b["t"].iloc[0])],
                "fd": [int(b["d"].iloc[0])],
                "fi": [int(b["i"].iloc[0])],
                "lk": [str(k[-1])],
                "ls": [int(b["d"].to_numpy()[tail].sum())],
            }
        )

    rows = sorted(
        (r["fk"], int(r["ft"]), int(r["fd"]), int(r["fi"]), r["lk"], int(r["ls"]))
        for r in srt.map_batches(
            census, batch_format="pandas", batch_size=None
        ).take_all()
    )
    stitch: dict = {}
    cur_k, cur_s = None, 0
    for fk, ft, fd, fi, lk, ls in rows:
        base = cur_s if fk == cur_k else 0
        stitch[(fk, ft, fd, fi)] = base
        cur_s = (base + ls) if lk == fk else ls
        cur_k = lk
    st_ref = _ray.put(stitch)

    def block_max(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype="object"),
                    "pmax": pd.Series([], dtype="int64"),
                }
            )
        k = b["k"].to_numpy()
        d = b["d"].to_numpy()
        run = d.cumsum()
        starts = np.zeros(len(b), dtype=bool)
        starts[0] = True
        starts[1:] = k[1:] != k[:-1]
        idx = np.flatnonzero(starts)
        off = np.repeat(run[idx] - d[idx], np.diff(np.append(idx, len(b))))
        run = run - off
        carry = _ray.get(st_ref)[
            (str(k[0]), int(b["t"].iloc[0]), int(b["d"].iloc[0]), int(b["i"].iloc[0]))
        ]
        run[k == k[0]] += carry
        seg = np.append(idx, len(b))
        return pd.DataFrame(
            {
                key_col: k[idx],
                "pmax": np.fromiter(
                    (run[s:e].max() for s, e in zip(seg[:-1], seg[1:])),
                    dtype="int64",
                ),
            }
        )

    partials = srt.map_batches(block_max, batch_format="pandas", batch_size=None)
    agg = partials.groupby(key_col).aggregate(Max("pmax", alias_name="max_conc"))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: t.column(key_col).cast(pa.string()),
                "max_conc": t.column("max_conc").cast(pa.int64()),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


def rolling_distinct(
    events: rd.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> rd.Dataset:
    """Trailing-window distinct count: for every calendar day present
    in the data, the number of distinct users active in the
    ``window_days``-day window ending that day — the rolling-DAU
    metric DISTINCT can't express as a plain window function.

    Scale shape: per-block local dedup to (day, user) pairs first (the
    shuffle never carries raw events), then each pair EXPLODES into
    the ≤``window_days`` window-end days it contributes to (constant
    fan-out np.repeat, no join), filtered against the broadcast set of
    days that actually occur (bounded: one entry per calendar day of
    corpus history, a few thousand at any scale). Global distinctness
    and the per-day count then reuse :func:`~reffy_ray.ops.stats.distinct_count`'s
    two-stage groupby — no per-day row concentration.
    """
    import pyarrow as pa
    import ray as _ray

    from reffy_ray.ops.stats import distinct_count

    US_PER_DAY = 86_400_000_000

    def day_user(b: pa.Table) -> pa.Table:
        t = (
            b.column(ts_col)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        out = pa.table(
            {
                "day_num": pa.array(t // US_PER_DAY, pa.int64()),
                "u": b.column(user_col).cast(pa.int64()),
            }
        )
        return out.group_by(["day_num", "u"]).aggregate([])

    pairs = events.select_columns([ts_col, user_col]).map_batches(
        day_user, batch_format="pyarrow"
    )
    day_arr = np.array(
        sorted(
            int(d) for d in pairs.select_columns(["day_num"]).unique("day_num")
        ),
        dtype="int64",
    )
    days_ref = _ray.put(day_arr)

    def explode(b: pa.Table) -> pa.Table:
        days = b.column("day_num").to_numpy()
        users = b.column("u").to_numpy()
        k = np.arange(window_days, dtype="int64")
        ends = (days[:, None] + k[None, :]).ravel()
        uu = np.repeat(users, window_days)
        live = _ray.get(days_ref)
        mask = np.isin(ends, live)
        return pa.table(
            {
                "day_num": pa.array(ends[mask], pa.int64()),
                "u": pa.array(uu[mask], pa.int64()),
            }
        )

    exploded = pairs.map_batches(explode, batch_format="pyarrow")
    out = distinct_count(exploded, by="day_num", value="u", out_col="users_w")

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day_num": t.column("day_num").cast(pa.int64()),
                "users_w": t.column("users_w").cast(pa.int64()),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


def activity_streaks(
    events: rd.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> rd.Dataset:
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands metric at calendar-day granularity.

    Scale shape: per-block (user, day) dedup partials → ONE
    ``groupby((user, day))`` establishes global distinctness, then the
    distinct day rows are fed through :func:`sessionize` with the day
    number as a synthetic microsecond timestamp and ``gap_us=1`` — a
    day gap ≥ 2 breaks the streak — so the island detection reuses the
    sorted census-stitch (no second shuffle design). A tiny
    ``groupby(user).max`` over per-streak lengths finishes.
    """
    import pyarrow as pa
    from ray.data.aggregate import Count, Max

    US_PER_DAY = 86_400_000_000

    def day_rows(b: pa.Table) -> pa.Table:
        t = (
            b.column(ts_col)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        out = pa.table(
            {
                "u": b.column(user_col).cast(pa.int64()),
                "day": pa.array(t // US_PER_DAY, pa.int64()),
            }
        )
        return out.group_by(["u", "day"]).aggregate([])

    distinct = (
        events.select_columns([user_col, ts_col])
        .map_batches(day_rows, batch_format="pyarrow")
        .groupby(["u", "day"])
        .aggregate(Count())
    )

    def as_stream(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b.column("u").cast(pa.int64()),
                # day number reinterpreted as a 1-us-per-day clock so
                # sessionize's gap_us=1 means "not the next day"
                "ts": b.column("day").cast(pa.int64()),
                "event_id": b.column("day").cast(pa.int64()),
            }
        )

    sessions = sessionize(
        distinct.map_batches(as_stream, batch_format="pyarrow"), gap_us=1
    )
    agg = sessions.groupby("user_id").aggregate(
        Max("n_events", alias_name="max_streak")
    )

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id").cast(pa.int64()),
                "max_streak": t.column("max_streak").cast(pa.int64()),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


def interval_coalesce(
    ds: rd.Dataset,
    by: str = "user_id",
    ts_col: str = "ts",
    dur_col: str = "dur_us",
):
    """Merge overlapping / touching intervals per key (interval union,
    the PACK-intervals primitive): each row opens ``[ts, ts + dur)``;
    within a key, intervals whose start is ≤ the running maximum end
    of all earlier intervals belong to the same island. Emits one row
    per island: ``(by, island_seq, start_us, end_us, n_events)``, all
    int64 — the variable-duration generalization of sessionize (a
    fixed gap is the constant-duration special case; variable
    durations need a genuine running-max-end, not a previous-row gap).

    Scale shape: one ``groupby(by)`` co-partitioning shuffle, then a
    vectorized per-group kernel — sort by (ts, dur), cummax of ends,
    island boundaries where ``ts > cummax(shifted ends)``, island
    aggregation via np.maximum.reduceat. Partitioning assumption: one
    key's rows fit in a group task (salt hot keys by coarse time
    range and merge boundary islands in a second tiny pass).
    """
    import pyarrow as pa

    def to_us(batch: pa.Table) -> pa.Table:
        t = batch.column(ts_col)
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "k": batch.column(by).cast(pa.int64()),
                "t": t,
                "d": batch.column(dur_col).cast(pa.int64()),
            }
        )

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["t", "d"], kind="mergesort").reset_index(
            drop=True
        )
        t = g["t"].to_numpy()
        e = (g["t"] + g["d"]).to_numpy()
        run_end = np.maximum.accumulate(e)
        brk = np.ones(len(g), dtype=bool)
        brk[1:] = t[1:] > run_end[:-1]
        starts = np.flatnonzero(brk)
        island_of = np.cumsum(brk) - 1
        n = np.bincount(island_of)
        return pd.DataFrame(
            {
                by: np.full(len(starts), int(g["k"].iloc[0]), dtype=np.int64),
                "island_seq": np.arange(1, len(starts) + 1, dtype=np.int64),
                "start_us": t[starts],
                "end_us": np.maximum.reduceat(e, starts),
                "n_events": n.astype(np.int64),
            }
        )

    return (
        ds.select_columns([by, ts_col, dur_col])
        .map_batches(to_us, batch_format="pyarrow")
        .groupby("k")
        .map_groups(per_key, batch_format="pandas")
    )


def late_events(
    events: rd.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    shards: int = 4,
    lateness_us: int = 3_600_000_000,
) -> rd.Dataset:
    """Streaming watermark lateness classification: replay each user's
    stream in a deterministic multi-shard arrival order (shard =
    ``id % shards``, then id — the out-of-order interleave a sharded
    delivery bus produces), maintain the per-user watermark
    ``max(event ts seen so far) - lateness``, and flag every event
    that arrives behind it. Emits per event: ``arrival_seq`` (0-based
    position in the user's arrival stream), ``is_late`` (0/1 int64)
    and ``late_us`` (microseconds behind the watermark; 0 when
    on-time). A user's first-arriving event is never late.

    Scale shape: same as :func:`event_gaps` — ONE key-collocating sort
    on ``(user, shard, id)``, a per-block census stitched on the
    driver (#blocks rows: each block's carry-in is the previous
    blocks' running-max ts and row count for its first user), then a
    fully vectorized per-block pass (grouped cummax + shift). No
    per-group dispatch, no join, no second shuffle.
    """
    import pyarrow as pa
    import ray as _ray

    NONE = np.iinfo(np.int64).min

    def to_us(batch: pa.Table) -> pa.Table:
        i = batch.column(id_col).cast(pa.int64())
        import pyarrow.compute as pc

        return pa.table(
            {
                "u": batch.column(user_col).cast(pa.int64()),
                "s": pc.bit_wise_and(i, shards - 1)
                if shards & (shards - 1) == 0
                else pc.subtract(i, pc.multiply(pc.divide(i, shards), shards)),
                "i": i,
                "t": batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()),
            }
        )

    srt = (
        events.select_columns([user_col, ts_col, id_col])
        .map_batches(to_us, batch_format="pyarrow")
        .sort(["u", "s", "i"])
        .materialize()
    )

    def census(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64")
                 for c in ("fu", "fs", "fi", "lu", "lmax", "nl")}
            )
        u = b["u"].to_numpy()
        tail = u == u[-1]
        return pd.DataFrame(
            {
                "fu": [int(u[0])],
                "fs": [int(b["s"].iloc[0])],
                "fi": [int(b["i"].iloc[0])],
                "lu": [int(u[-1])],
                # running-max ts over the block's LAST user's rows
                "lmax": [int(b["t"].to_numpy()[tail].max())],
                "nl": [int(tail.sum())],
            }
        )

    blocks = sorted(
        (int(r["fu"]), int(r["fs"]), int(r["fi"]),
         int(r["lu"]), int(r["lmax"]), int(r["nl"]))
        for r in srt.map_batches(
            census, batch_format="pandas", batch_size=None
        ).take_all()
    )
    # key-order stitch: carry (running-max ts, prior rows) of the
    # current user across block boundaries
    stitch: dict = {}
    cur_u, cur_max, cur_n = None, NONE, 0
    for fu, fs, fi, lu, lmax, nl in blocks:
        cont = fu == cur_u
        stitch[(fu, fs, fi)] = (cur_max, cur_n) if cont else (NONE, 0)
        if cont and lu == fu:
            # sorted by user, so fu == lu means the block is one user:
            # it extends the carried stream
            cur_max = max(cur_max, lmax)
            cur_n += nl
        else:
            cur_max, cur_n = lmax, nl
        cur_u = lu
    st_ref = _ray.put(stitch)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64")
                 for c in (id_col, user_col, "arrival_seq",
                           "is_late", "late_us")}
            )
        # the stitch map is keyed by each block's first (u, s, i) row
        # and relies on the census and assign passes seeing IDENTICAL
        # block boundaries over the same materialized sorted dataset
        # (batch_size=None per-block batching; same shape as
        # event_gaps' census stitch). A re-chunk between the passes
        # would break the contract — fail loud with the assumption
        # spelled out rather than a bare KeyError.
        key = (int(b["u"].iloc[0]), int(b["s"].iloc[0]), int(b["i"].iloc[0]))
        entry = _ray.get(st_ref).get(key)
        if entry is None:
            raise RuntimeError(
                f"late_events stitch miss for block starting at {key}: "
                "census and assign saw different block boundaries — the "
                "per-block stitch assumes batch_size=None preserves the "
                "materialized dataset's block layout between passes"
            )
        carry_max, prior = entry
        u, t = b["u"].to_numpy(), b["t"].to_numpy()
        n = len(b)
        # inclusive running max per user segment, shifted to exclusive
        cm = pd.Series(t).groupby(u).cummax().to_numpy()
        pm = np.empty(n, dtype=np.int64)
        pm[1:] = cm[:-1]
        pm[0] = NONE
        user_change = np.ones(n, dtype=bool)
        user_change[1:] = u[1:] != u[:-1]
        pm[user_change] = NONE
        idx = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(user_change, idx, 0))
        seq = idx - seg_start
        first_seg = ~np.logical_or.accumulate(
            np.concatenate(([False], user_change[1:]))
        )
        if prior > 0:
            fs_pm = pm[first_seg]
            pm[first_seg] = np.where(
                fs_pm == NONE, carry_max, np.maximum(fs_pm, carry_max)
            )
            seq = seq + np.where(first_seg, prior, 0)
        wm = pm - lateness_us
        late = (pm != NONE) & (t < wm)
        return pd.DataFrame(
            {
                id_col: b["i"].to_numpy(),
                user_col: u,
                "arrival_seq": seq.astype(np.int64),
                "is_late": late.astype(np.int64),
                "late_us": np.where(late, wm - t, 0).astype(np.int64),
            }
        )

    return srt.map_batches(assign, batch_format="pandas", batch_size=None)

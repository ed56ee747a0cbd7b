"""Ordered joins Ray Data lacks natively: as-of join and range join.

Both are expressed as the composition the engine contract prefers
(SURVEY.md §2.4 pattern (a)): tag the two sides, align schemas, union,
one ``groupby(by)`` co-partitioning shuffle, then a vectorized
per-group pandas kernel (``merge_asof`` / interval mask). No raw Ray
tasks, no driver-side loop.

Partitioning assumption (documented per the engine contract): all rows
for one ``by`` key fit in a single group task. That holds whenever no
single key owns a material fraction of either side; for skewed keys,
pre-split the hot key by a time-bucket salt and as-of join within
buckets carrying the previous bucket's tail row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _tag_and_align(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    by: str,
    suffix: str,
):
    """Rename right value columns with ``suffix``, add each side's
    missing columns as typed nulls so the union has one schema."""
    lcols = left.schema()
    rcols = right.schema()
    l_names = list(lcols.names)
    r_value = [c for c in rcols.names if c not in (on, by)]
    r_renamed = [c + suffix for c in r_value]

    l_types = dict(zip(lcols.names, lcols.types))
    r_types = dict(zip(rcols.names, rcols.types))

    def pad_left(batch: pa.Table) -> pa.Table:
        batch = batch.append_column("_side", pa.array([0] * batch.num_rows, pa.int8()))
        for c, rc in zip(r_value, r_renamed):
            batch = batch.append_column(rc, pa.nulls(batch.num_rows, r_types[c]))
        return batch

    def pad_right(batch: pa.Table) -> pa.Table:
        out = {by: batch.column(by), on: batch.column(on)}
        for c in l_names:
            if c not in (on, by):
                out[c] = pa.nulls(batch.num_rows, l_types[c])
        out["_side"] = pa.array([1] * batch.num_rows, pa.int8())
        for c, rc in zip(r_value, r_renamed):
            out[rc] = batch.column(c)
        # column order must match pad_left's output exactly
        order = l_names + ["_side"] + r_renamed
        return pa.table({k: out[k] for k in order})

    lt = left.map_batches(pad_left, batch_format="pyarrow")
    rt = right.map_batches(pad_right, batch_format="pyarrow")
    return lt.union(rt), l_names, r_renamed


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    by: str,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_r",
) -> rd.Dataset:
    """Left as-of join: for each left row, the single right row with
    the same ``by`` key and the nearest ``on`` value (``backward`` =
    greatest right ``on`` <= left ``on``, exact matches allowed —
    DuckDB's ``ASOF LEFT JOIN ... ON l.by = r.by AND l.on >= r.on``).

    One shuffle total (the ``groupby(by)``); per group both sides are
    sorted once and merged with ``pd.merge_asof`` (vectorized
    galloping merge, not a Python loop).
    """
    unioned, l_names, r_renamed = _tag_and_align(left, right, on, by, suffix)
    # null-padding through the union degrades integer columns to float
    # in pandas; cast every integer-typed output column to nullable
    # Int64 at emission so all groups emit one schema with exact ints
    l_schema, r_schema = left.schema(), right.schema()
    int_cols = {
        c for c, t in zip(l_schema.names, l_schema.types) if pa.types.is_integer(t)
    }
    for c, t in zip(r_schema.names, r_schema.types):
        if c != by and pa.types.is_integer(t):
            int_cols.add(c + suffix)

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["_side"] == 0]
        r = group[group["_side"] == 1]
        l = l[l_names].sort_values(on, kind="mergesort")
        r = r.rename(columns={on: on + suffix})[
            [on + suffix] + r_renamed
        ].sort_values(on + suffix, kind="mergesort")
        out = pd.merge_asof(
            l,
            r,
            left_on=on,
            right_on=on + suffix,
            direction=direction,
            tolerance=tolerance,
            allow_exact_matches=True,
        )
        for c in int_cols:
            if c in out.columns:
                out[c] = out[c].astype("Int64")
        return out

    return unioned.groupby(by).map_groups(per_key, batch_format="pandas")


def range_join(
    left: rd.Dataset,
    right: rd.Dataset,
    by: str,
    left_on: str,
    lo: str,
    hi: str,
    suffix: str = "_r",
) -> rd.Dataset:
    """Interval join: pair each left row with every right row of the
    same ``by`` key whose [lo, hi] interval contains ``left_on``
    (inclusive both ends). Same co-partitioning shape as
    :func:`asof_join`; within a group the containment test is a
    vectorized searchsorted over interval edges when intervals are
    disjoint, else a broadcast mask bounded by the group size."""
    l_names = list(left.schema().names)
    r_names = list(right.schema().names)
    r_value = [c for c in r_names if c != by]
    r_renamed = {c: c + suffix if c in l_names else c for c in r_value}

    r_schema = right.schema()
    r_types = dict(zip(r_schema.names, r_schema.types))
    l_schema = left.schema()
    l_types = dict(zip(l_schema.names, l_schema.types))

    def pad_right(batch: pa.Table) -> pa.Table:
        out = {}
        for c in l_names:
            out[c] = (
                batch.column(by) if c == by else pa.nulls(batch.num_rows, l_types[c])
            )
        out["_side"] = pa.array([1] * batch.num_rows, pa.int8())
        for c in r_value:
            out[r_renamed[c]] = batch.column(c)
        return pa.table(out)

    def pad_left(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "_side", pa.array([0] * batch.num_rows, pa.int8())
        )
        for c in r_value:
            batch = batch.append_column(
                r_renamed[c], pa.nulls(batch.num_rows, r_types[c])
            )
        return batch

    lt = left.map_batches(pad_left, batch_format="pyarrow")
    rt = right.map_batches(pad_right, batch_format="pyarrow")
    unioned = lt.union(rt)
    out_r = [r_renamed[c] for c in r_value]
    lo_c, hi_c = r_renamed.get(lo, lo), r_renamed.get(hi, hi)
    int_cols = {
        c for c, t in zip(l_schema.names, l_schema.types) if pa.types.is_integer(t)
    } | {
        r_renamed[c]
        for c in r_value
        if pa.types.is_integer(r_types[c])
    }

    # shuffle on a key-hash bucket, not the raw key: one vectorized
    # pandas hash-merge per bucket instead of one Python map_groups
    # call per key (thousands of calls — the round-3 profile's hot spot)
    num_buckets = 64

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = batch.column(by).to_pandas()
        bucket = (pd.util.hash_array(keys.to_numpy()) % num_buckets).astype(
            "int64"
        )
        return batch.append_column("_bucket", pa.array(bucket, pa.int64()))

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["_side"] == 0][l_names]
        r = group[group["_side"] == 1][[by] + out_r]
        merged = l.merge(r, on=by)  # all same-key pairs in the bucket
        if len(merged):
            m = (merged[left_on] >= merged[lo_c]) & (
                merged[left_on] <= merged[hi_c]
            )
            merged = merged[m]
        out = merged[l_names + out_r].reset_index(drop=True)
        for c in int_cols:
            out[c] = out[c].astype("Int64")
        return out

    return (
        unioned.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def semi_join(
    left: rd.Dataset,
    right_keys: rd.Dataset,
    on: str,
    anti: bool = False,
    mode: str = "shuffle",
    broadcast_max_keys: int = 5_000_000,
) -> rd.Dataset:
    """Distributed semi / anti join: left rows WITH (semi) or WITHOUT
    (anti) a key match in ``right_keys`` (a Dataset carrying the key
    column ``on``; extra columns are dropped, duplicates are fine —
    EXISTS semantics, never a fan-out).

    Two tiers:

    - ``shuffle`` (default, the 100 TB path): Ray's native
      ``left_semi`` / ``left_anti`` hash join — both sides partition
      by the key, nothing is collected.
    - ``broadcast``: the right key set is deduped, collected and
      shipped once via ``ray.put`` (bounded by
      ``broadcast_max_keys``), then the pass over ``left`` is a pure
      map filter with no shuffle at all — the decontaminate shape, for
      when the probe side is corpus-sized and the key side is not.
    """
    import pyarrow.compute as pc

    from reffy_ray.util import join_ready, safe_num_blocks

    keys = right_keys.select_columns([on])

    if mode == "broadcast":
        import ray as _ray

        kset = set()
        for batch in keys.iter_batches(batch_format="pyarrow"):
            kset.update(batch.column(on).to_pylist())
        if len(kset) > broadcast_max_keys:
            raise ValueError(
                f"broadcast side has {len(kset)} keys "
                f"(> {broadcast_max_keys}); use mode='shuffle'"
            )
        kref = _ray.put(kset)

        def flt(batch: pa.Table) -> pa.Table:
            import ray as _ray2

            ks = _ray2.get(kref)
            mask = pa.array(
                [(v in ks) != anti for v in batch.column(on).to_pylist()],
                pa.bool_(),
            )
            return batch.filter(mask)

        return left.map_batches(flt, batch_format="pyarrow")

    if mode != "shuffle":
        raise ValueError(f"unknown mode {mode!r}")

    # EXISTS semantics: dedup the key side so semi never multiplies
    from ray.data.aggregate import Count

    distinct = (
        keys.groupby(on).aggregate(Count(alias_name="_m")).drop_columns(["_m"])
    )
    return left.join(
        join_ready(distinct),
        join_type="left_anti" if anti else "left_semi",
        num_partitions=safe_num_blocks(left),
        on=(on,),
    )


def anti_join(
    left: rd.Dataset,
    right_keys: rd.Dataset,
    on: str,
    mode: str = "shuffle",
) -> rd.Dataset:
    """Left rows with NO key match in ``right_keys`` (NOT EXISTS)."""
    return semi_join(left, right_keys, on, anti=True, mode=mode)


def bloom_semi_join(
    probe: rd.Dataset,
    build: rd.Dataset,
    probe_key: str,
    build_key: str,
    m: int = 8192,
    k_hashes: int = 3,
    salt: str = "bloom",
) -> rd.Dataset:
    """Bloom-filter pre-join: keep the probe rows whose key PASSES a
    Bloom filter of the build side's keys — the shuffle-free first
    stage of a distributed join (the passers, a small superset of the
    true semi-join, are what you then hash-join exactly;
    :func:`semi_join` is the exact tier).

    The filter is deterministic (bit positions ``H(salt·i ‖ key) mod
    m`` from the shared md5-prefix hash), so its false positives are
    REPRODUCIBLE — the op has an exact SQL oracle, collisions and all.

    Scale shape: build side reduces to ≤ m distinct positions via
    per-block partials + ``unique`` (combiner: each block emits at
    most m rows however big it is); the m-bit set broadcasts once
    (``ray.put`` — m bits, not build rows); probing is a pure
    vectorized ``map_batches``. Nothing shuffles. Size ``m ≈ 10×``
    the build-key cardinality for a ~2% false-positive rate at k=3.
    """
    import hashlib

    import ray as _ray

    def _h(i: int, key) -> int:
        dig = hashlib.md5(f"{salt}{i}:{key}".encode("utf-8")).digest()[:8]
        return int.from_bytes(dig, "big") % m

    def build_partial(b: pa.Table) -> pa.Table:
        keys = b.column(build_key).to_pylist()
        pos = {_h(i, k) for k in keys for i in range(k_hashes)}
        return pa.table({"pos": pa.array(sorted(pos), pa.int64())})

    positions = (
        build.select_columns([build_key])
        .map_batches(build_partial, batch_format="pyarrow")
        .unique("pos")
    )
    bits = np.zeros(m, dtype=bool)
    bits[np.asarray(positions, dtype=np.int64)] = True
    bref = _ray.put(bits)

    def probe_fn(b: pa.Table) -> pa.Table:
        bt = _ray.get(bref)
        keys = np.asarray(b.column(probe_key).to_pylist(), dtype=object)
        # md5 is per-item by nature (the DuckDB-parity hash); hash each
        # DISTINCT key once and gather the verdict back per row
        uniq, inv = np.unique(keys, return_inverse=True)
        ok = np.array(
            [all(bt[_h(i, k)] for i in range(k_hashes)) for k in uniq],
            dtype=bool,
        )
        return b.filter(pa.array(ok[inv], pa.bool_()))

    return probe.map_batches(probe_fn, batch_format="pyarrow")


def table_diff(
    old: rd.Dataset,
    new: rd.Dataset,
    key: str,
    payload: str,
) -> rd.Dataset:
    """Snapshot diff by key: which rows were ``added``, ``removed``,
    or ``changed`` between two versions of a table (the incremental
    re-crawl / CDC primitive; ``same`` rows are dropped).

    Shape: tag each side, union, shuffle on a HASH BUCKET of the key
    (the same trick as :func:`range_join` — one vectorized pandas
    outer-merge per bucket instead of one Python call per key), then
    an ``np.select`` verdict. The payload comparison keys on the
    values themselves; pass a digest column for wide payloads so the
    shuffle moves hashes, not bodies."""
    import pyarrow as pa

    num_buckets = 64

    def tag(side: str):
        def fn(b: pa.Table) -> pa.Table:
            keys = b.column(key).to_pandas()
            bucket = (
                pd.util.hash_array(keys.to_numpy()) % num_buckets
            ).astype("int64")
            return pa.table(
                {
                    "k": b.column(key),
                    "p": b.column(payload).cast(pa.string()),
                    "side": pa.array([side] * len(b), pa.string()),
                    "_bucket": pa.array(bucket, pa.int64()),
                }
            )

        return fn

    unioned = old.select_columns([key, payload]).map_batches(
        tag("old"), batch_format="pyarrow"
    ).union(
        new.select_columns([key, payload]).map_batches(
            tag("new"), batch_format="pyarrow"
        )
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == "old"][["k", "p"]]
        n = g[g["side"] == "new"][["k", "p"]]
        m = o.merge(n, on="k", how="outer", suffixes=("_o", "_n"))
        status = np.select(
            [
                m["p_o"].isna(),
                m["p_n"].isna(),
                m["p_o"] != m["p_n"],
            ],
            ["added", "removed", "changed"],
            default="same",
        )
        keep = status != "same"
        return pd.DataFrame({"k": m["k"][keep], "status": status[keep]})

    out = unioned.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas"
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {key: b.column("k"), "status": b.column("status").cast(pa.string())}
        )

    return out.map_batches(fin, batch_format="pyarrow")


def last_touch_attribution(
    events: rd.Dataset,
    conversion_type: str = "purchase",
    touch_type: str = "click",
    window: "pd.Timedelta | None" = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
):
    """Last-touch attribution: credit each conversion event to the most
    recent touch event by the same user at-or-before the conversion
    (optionally only within ``window``). The marketing-analytics
    classic; structurally a filtered as-of join.

    Emits one row per conversion:
    ``(event_id, user_id, ts, value_cents, touch_event_id, touch_ts)``
    with integer cents (floor(value*100), the repo money rule) and
    type-stable sentinels for unattributed conversions
    (``touch_event_id=-1``, ``touch_ts=1970-01-01``).

    Scale shape: two column-pruned filters feed
    :func:`asof_join`'s single ``groupby(user)`` shuffle; per group a
    vectorized ``merge_asof``. Determinism note: among touches with an
    identical (user, ts) pair the winner is unspecified — with
    microsecond event timestamps exact ties are measure-zero, and the
    oracle mirrors the same assumption.
    """
    import pyarrow.compute as pc

    def conv_side(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("event_type"), conversion_type)
        f = b.filter(m)
        cents = pc.cast(
            pc.floor(pc.multiply(f.column("value"), 100.0)), pa.int64()
        )
        return pa.table(
            {
                "event_id": f.column("event_id"),
                user_col: f.column(user_col),
                ts_col: f.column(ts_col),
                "value_cents": cents,
            }
        )

    def touch_side(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("event_type"), touch_type)
        f = b.filter(m)
        return pa.table(
            {
                "touch_event_id": f.column("event_id"),
                user_col: f.column(user_col),
                ts_col: f.column(ts_col),
            }
        )

    cols = ["event_id", user_col, ts_col, "event_type", "value"]
    conv = events.select_columns(cols).map_batches(
        conv_side, batch_format="pyarrow"
    )
    touch = events.select_columns(cols[:-1]).map_batches(
        touch_side, batch_format="pyarrow"
    )
    joined = asof_join(
        conv, touch, on=ts_col, by=user_col, tolerance=window, suffix="_t"
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "event_id": b["event_id"].astype("int64"),
                user_col: b[user_col].astype("int64"),
                ts_col: b[ts_col],
                "value_cents": b["value_cents"].astype("int64"),
                "touch_event_id": b["touch_event_id_t"]
                .fillna(-1)
                .astype("int64"),
                "touch_ts": b[ts_col + "_t"].fillna(
                    pd.Timestamp("1970-01-01")
                ),
            }
        )
        return out

    return joined.map_batches(finish, batch_format="pandas")


def equi_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    hot_cap: int = 1_000_000,
    suffix: str = "_r",
    broadcast_max_rows: int = 5_000_000,
) -> rd.Dataset:
    """Distributed inner equi-join with explicit hot-key skew
    handling (the north rule's "hot-host skew salting" clause applied
    to the general join).

    A plain hash join routes every row of one key to one partition —
    a key owning 30% of the corpus makes one straggler task hold 30%
    of the data (OOM + tail latency at 100 TB). Two tiers instead:

    1. **Census** — per-block partial key counts (one tiny Arrow
       ``group_by`` per batch) folded by one small ``groupby(on)``
       over (distinct-keys x blocks) rows, never the data itself.
       Keys whose LEFT count >= ``hot_cap`` are hot; by construction
       there are at most ``|left| / hot_cap`` of them, so the hot-key
       set is always driver-small.
    2. **Hot tier** — the hot keys' RIGHT rows are collected once
       (bounded by ``broadcast_max_rows``, raises past it) and
       broadcast via ``ray.put``; hot left rows merge map-side inside
       ``map_batches`` with no shuffle at all.
       **Cold tier** — everything else goes through Ray's native
       hash join (both sides partition by key, nothing collected).

    Right value columns are renamed with ``suffix`` when they collide
    with left column names. Output column order: left columns then
    right value columns, identical in both tiers (union-safe).
    """
    import ray as _ray
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from reffy_ray.util import join_ready, safe_num_blocks

    l_names = list(left.schema().names)
    r_schema = right.schema()
    r_value = [c for c in r_schema.names if c != on]
    r_out = [c + suffix if c in l_names else c for c in r_value]
    out_order = l_names + r_out

    if r_out != r_value:
        ren = dict(zip(r_value, r_out))

        def rename(b: pa.Table) -> pa.Table:
            return b.rename_columns(
                [ren.get(c, c) for c in b.column_names]
            )

        right = right.map_batches(rename, batch_format="pyarrow")

    # 1. census of LEFT key counts (partial per block, tiny shuffle)
    def partial_counts(b: pa.Table) -> pa.Table:
        # null keys never match in an inner join (SQL NULL = NULL is
        # false) — drop them from the census so None can't become a
        # "hot key"; the tier masks below drop them from the output
        # too (is_in -> null -> filtered), which IS inner semantics
        t = (
            b.select([on])
            .drop_null()
            .group_by(on)
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {on: t.column(on), "partial": t.column("count_all")}
        )

    census = (
        left.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(on)
        .aggregate(Sum("partial", alias_name="cnt"))
    )
    census = census.materialize()
    total_keys = census.count()
    hot_keys = [
        r[on]
        for r in census.filter(expr=f"cnt >= {hot_cap}").take_all()
    ]

    if not hot_keys:
        joined = left.join(
            join_ready(right),
            join_type="inner",
            num_partitions=safe_num_blocks(left),
            on=(on,),
        )
        return joined.select_columns(out_order)

    key_type = left.schema().types[l_names.index(on)]
    hot_arr = pa.array(hot_keys, key_type)

    # 2a. hot tier: right rows for hot keys, collected once + broadcast
    def right_hot(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column(on), value_set=hot_arr))

    hot_right_parts = [
        b
        for b in right.map_batches(right_hot, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ]
    if hot_right_parts:
        hot_right = pa.concat_tables(hot_right_parts)
        if hot_right.num_rows > broadcast_max_rows:
            raise ValueError(
                f"hot keys' right side has {hot_right.num_rows} rows "
                f"(> {broadcast_max_rows}); raise hot_cap or "
                "pre-aggregate the right side"
            )
    else:
        hot_right = pa.table(
            {
                c: pa.array([], t)
                for c, t in zip(
                    [on] + r_out,
                    [key_type]
                    + [
                        r_schema.types[r_schema.names.index(v)]
                        for v in r_value
                    ],
                )
            }
        )
    bref = _ray.put(hot_right.to_pandas())
    # single-slot per-worker memo: avoids re-deserializing the
    # broadcast frame on every batch (closure list, one fixed bref)
    _memo: list = []

    def hot_merge(b: pa.Table) -> pd.DataFrame:
        mask = pc.is_in(b.column(on), value_set=hot_arr)
        sub = b.filter(mask).to_pandas()
        if not _memo:
            _memo.append(_ray.get(bref))
        merged = sub.merge(_memo[0], on=on, how="inner")
        return merged[out_order]

    hot_out = left.map_batches(hot_merge, batch_format="pyarrow")

    # every left key hot -> the cold tier would hand the hash join
    # empty inputs (Ray's join crashes on the degenerate zero-column
    # blocks empty partitions produce — see join_ready); skip it
    if len(hot_keys) == total_keys:
        return hot_out.select_columns(out_order)

    # 2b. cold tier: native hash join with hot keys masked out of BOTH
    # sides, so no partition ever receives a hot key's row flood
    def cold_mask(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.invert(pc.is_in(b.column(on), value_set=hot_arr))
        )

    cold_out = (
        left.map_batches(cold_mask, batch_format="pyarrow")
        .join(
            join_ready(right.map_batches(cold_mask, batch_format="pyarrow")),
            join_type="inner",
            num_partitions=safe_num_blocks(left),
            on=(on,),
        )
        .select_columns(out_order)
    )
    return cold_out.union(hot_out.select_columns(out_order))

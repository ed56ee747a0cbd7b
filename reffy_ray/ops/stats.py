"""Distribution statistics operators.

``group_quantiles`` — exact discrete quantiles per group
(``percentile_disc`` semantics: the smallest value whose cumulative
distribution reaches q, i.e. ``sorted[ceil(q*n)-1]``). Returned values
are actual data elements, so results are bitwise identical to any SQL
engine — no interpolation arithmetic.

Shape: one ``groupby(by)`` shuffle, one vectorized sort per group.
This is the grouped path; for a *global* quantile over one huge column
at 100 TB, skip the group shuffle entirely: per-batch histogram
partials (combiner) → one small merge → invert the CDF, giving an
approximate quantile with error bounded by the bin width in one pass.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data as rd


def group_quantiles(
    ds: rd.Dataset,
    by: str,
    value: str,
    qs=(0.25, 0.5, 0.75, 0.9),
) -> rd.Dataset:
    """One row per group: ``by`` plus a ``q<pct>`` column per quantile
    (exact discrete quantiles of ``value``)."""
    names = [f"q{int(round(q * 100))}" for q in qs]

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(group[value].to_numpy())
        n = len(v)
        row = {by: [group[by].iloc[0]]}
        for q, name in zip(qs, names):
            row[name] = [v[max(math.ceil(q * n), 1) - 1]]
        return pd.DataFrame(row)

    return ds.groupby(by).map_groups(per_key, batch_format="pandas")


def global_quantiles(
    ds: rd.Dataset,
    value: str,
    qs=(0.5, 0.9, 0.99),
    bins: int = 4096,
    driver_cap: int = 1_000_000,
    _audit: list | None = None,
):
    """EXACT global discrete quantiles of one column without a global
    sort — the 100 TB path sketched above, made concrete:

    1. tiny (min, max, count) aggregate;
    2. one streamed pass building a ``bins``-bucket histogram
       (per-batch partials → one small groupby-sum — combiner pattern,
       only ≤ ``bins`` rows per task leave the cluster);
    3. invert the cumulative histogram to locate each target rank's
       bucket; if that bucket holds ≤ ``driver_cap`` rows, collect ONLY
       its values (expected n/bins rows) and index the exact rank
       within them — otherwise **recursively re-histogram inside the
       bucket** (tightened to the bucket's observed min/max each
       level) until the target range fits under the cap. Heavy
       duplicate skew terminates early: a range whose min == max IS
       the answer, and a range narrower than ``bins`` float64 ulps
       falls back to an exact distinct-value census (≤ ~``bins``
       distinct values by construction). The driver therefore never
       materializes more than ``driver_cap`` raw rows, regardless of
       skew.

    Returns a one-row Arrow table (``q<pct>`` columns) whose values
    are actual data elements — identical to SQL ``quantile_disc``.
    ``_audit``, when given, records the length of every driver-side
    raw-value collection (test hook for the cap invariant).
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Min, Sum

    agg = ds.aggregate(Min(value), Max(value), Count())
    vmin, vmax, n = agg[f"min({value})"], agg[f"max({value})"], agg["count()"]
    pcts = [round(q * 100, 4) for q in qs]
    names = [
        f"q{int(p)}" if float(p).is_integer() else f"q{str(p).replace('.', '_')}"
        for p in pcts
    ]
    if n == 0 or vmin == vmax:
        val = None if n == 0 else vmin
        return pa.table({name: [val] for name in names})

    def range_mask(batch: pa.Table, lo: float, hi: float, last: bool):
        col = batch.column(value)
        return pc.and_(
            pc.greater_equal(col, pa.scalar(lo)),
            pc.less_equal(col, pa.scalar(hi))
            if last
            else pc.less(col, pa.scalar(hi)),
        )

    def range_hist(lo: float, hi: float, last: bool, edges_: np.ndarray):
        """Histogram of values in [lo, hi) (or [lo, hi] when ``last``)
        over ``edges_`` — per-batch partials, one small groupby-sum."""

        def part(batch: pa.Table) -> pa.Table:
            v = (
                batch.filter(range_mask(batch, lo, hi, last))
                .column(value)
                .to_numpy(zero_copy_only=False)
            )
            counts, _ = np.histogram(v, bins=edges_)
            nz = np.nonzero(counts)[0]
            return pa.table(
                {
                    "bin": pa.array(nz, pa.int64()),
                    "cnt": pa.array(counts[nz], pa.int64()),
                }
            )

        rows = (
            ds.map_batches(part, batch_format="pyarrow")
            .groupby("bin")
            .aggregate(Sum("cnt", alias_name="cnt"))
            .take_all()
        )
        counts = np.zeros(len(edges_) - 1, dtype=np.int64)
        for r in rows:
            counts[r["bin"]] = r["cnt"]
        return counts

    def range_stats(lo: float, hi: float, last: bool):
        """(min, max, count) of values in the range — combiner partials."""

        def part(batch: pa.Table) -> pa.Table:
            v = (
                batch.filter(range_mask(batch, lo, hi, last))
                .column(value)
                .to_numpy(zero_copy_only=False)
            )
            if len(v) == 0:
                return pa.table(
                    {"mn": pa.array([], pa.float64()),
                     "mx": pa.array([], pa.float64()),
                     "cnt": pa.array([], pa.int64())}
                )
            return pa.table(
                {"mn": [float(v.min())], "mx": [float(v.max())],
                 "cnt": pa.array([len(v)], pa.int64())}
            )

        rows = ds.map_batches(part, batch_format="pyarrow").take_all()
        if not rows:
            return None, None, 0
        return (
            min(r["mn"] for r in rows),
            max(r["mx"] for r in rows),
            sum(r["cnt"] for r in rows),
        )

    def collect_range(lo: float, hi: float, last: bool) -> np.ndarray:
        """Sorted actual data elements in the range (≤ driver_cap rows)."""

        def keep(batch: pa.Table) -> pa.Table:
            return batch.filter(range_mask(batch, lo, hi, last)).select([value])

        rows = ds.map_batches(keep, batch_format="pyarrow").take_all()
        if _audit is not None:
            _audit.append(len(rows))
        assert len(rows) <= driver_cap, (
            f"global_quantiles internal error: collected {len(rows)} rows "
            f"> driver_cap={driver_cap}"
        )
        return np.sort(np.array([r[value] for r in rows]))

    def census_range(lo: float, hi: float, last: bool):
        """Exact (value, count) census of the range, for ranges so
        narrow that linspace cannot split them (≲ bins distinct float64
        values by construction) — groupby-sum on distinct values, only
        the tiny census table reaches the driver."""

        def part(batch: pa.Table) -> pa.Table:
            v = (
                batch.filter(range_mask(batch, lo, hi, last))
                .column(value)
                .to_numpy(zero_copy_only=False)
            )
            u, c = np.unique(v, return_counts=True)
            return pa.table({"v": u, "cnt": pa.array(c, pa.int64())})

        rows = (
            ds.map_batches(part, batch_format="pyarrow")
            .groupby("v")
            .aggregate(Sum("cnt", alias_name="cnt"))
            .take_all()
        )
        rows.sort(key=lambda r: r["v"])
        return rows

    def rank_select(lo: float, hi: float, last: bool, k: int, cnt: int):
        """Value of 1-indexed rank ``k`` among the ``cnt`` values in
        the range, collecting at most driver_cap raw rows per level."""
        for _ in range(64):  # depth backstop; census fallback below
            if cnt <= driver_cap:
                return collect_range(lo, hi, last)[k - 1]
            mn, mx, cnt2 = range_stats(lo, hi, last)
            cnt = cnt2
            if cnt <= driver_cap:
                return collect_range(lo, hi, last)[k - 1]
            if mn == mx:
                return mn  # every value in range identical — the answer
            edges_ = np.linspace(mn, mx, bins + 1)
            if not np.all(np.diff(edges_) > 0):
                break  # range narrower than bins ulps → census
            counts = range_hist(lo, hi, last, edges_)
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, k, side="left"))
            k -= int(cum[b - 1]) if b > 0 else 0
            cnt = int(counts[b])
            lo, hi = float(edges_[b]), float(edges_[b + 1])
            # np.histogram puts mx in its top bin only; the sub-range
            # is right-inclusive exactly when it is that top bin
            last = b == bins - 1
        # ulp-narrow or pathological range: exact distinct-value census
        census = census_range(lo, hi, last)
        run = 0
        for r in census:
            run += r["cnt"]
            if run >= k:
                return r["v"]
        return census[-1]["v"]

    edges = np.linspace(float(vmin), float(vmax), bins + 1)
    counts = range_hist(float(vmin), float(vmax), True, edges)
    cum = np.cumsum(counts)

    out, cache = {}, {}
    for q, name in zip(qs, names):
        r = max(math.ceil(q * n), 1)  # 1-indexed target rank
        b = int(np.searchsorted(cum, r, side="left"))
        before = int(cum[b - 1]) if b > 0 else 0
        if int(counts[b]) <= driver_cap:
            if b not in cache:
                cache[b] = collect_range(
                    float(edges[b]), float(edges[b + 1]), b == bins - 1
                )
            out[name] = [cache[b][r - before - 1]]
        else:
            out[name] = [
                rank_select(
                    float(edges[b]), float(edges[b + 1]), b == bins - 1,
                    r - before, int(counts[b]),
                )
            ]
    return pa.table(out)


def funnel_conversion(
    events: rd.Dataset,
    steps=("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
):
    """Ordered-funnel user counts over FIRST-occurrence times: a user
    reaches step k iff they reached step k-1 and their earliest step-k
    event is no earlier than their earliest step-(k-1) event (a
    monotone chain of first-occurrence timestamps — the standard
    product-analytics funnel over an append-only event log).

    Scale shape: per-batch (user, step)-min partials (combiner) → one
    ``groupby(user)`` Min per step (rows = distinct users, far below
    raw events) → per-batch condition counts → tiny global sum. All
    comparisons are on int64 microseconds; the output is ONE all-int64
    row with an ``n_<step>`` column per funnel step."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Min, Sum

    tcols = [f"_t{i}" for i in range(len(steps))]

    def partial_mins(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "u": batch.column(user_col).to_pandas(),
                "ty": batch.column(type_col).to_pandas(),
                # int64 µs ≈ 1.7e15 ≪ 2^53, so later float round-trips
                # in pandas blocks stay exact
                "t": batch.column(ts_col).cast(pa.int64()).to_pandas(),
            }
        )
        out = pd.DataFrame(index=pd.Index(df["u"].unique(), name="u"))
        for step, c in zip(steps, tcols):
            out[c] = df[df["ty"] == step].groupby("u")["t"].min()
        out = out.reset_index()
        cols = {user_col: pa.array(out["u"].astype("int64"))}
        for c in tcols:
            cols[c] = pa.array(out[c].astype("Int64"))
        return pa.table(cols)

    per_user = (
        events.map_batches(partial_mins, batch_format="pyarrow")
        .groupby(user_col)
        .aggregate(*[Min(c, alias_name=c) for c in tcols])
    )

    def count_conditions(b: pd.DataFrame) -> pd.DataFrame:
        reached = b[tcols[0]].notna()
        counts = {f"n_{steps[0]}": [int(reached.sum())]}
        for prev, cur, step in zip(tcols, tcols[1:], steps[1:]):
            # NaN comparisons are False, so missing steps drop out here
            reached = reached & (b[cur] >= b[prev])
            counts[f"n_{step}"] = [int(reached.sum())]
        return pd.DataFrame(counts)

    partial_counts = per_user.map_batches(count_conditions, batch_format="pandas")
    totals = (
        partial_counts.aggregate(
            *[Sum(f"n_{s}", alias_name=f"n_{s}") for s in steps]
        )
        or {}
    )
    # empty event log → Sum yields no value: every step count is 0
    return pa.table(
        {f"n_{s}": [int(totals.get(f"n_{s}") or 0)] for s in steps}
    )


WEEK_US = 7 * 24 * 3600 * 1_000_000


def cohort_retention(
    events: rd.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> rd.Dataset:
    """Weekly cohort-retention matrix: users are cohorted by the epoch
    week of their FIRST event; for every (cohort_week, week_offset)
    cell, count the distinct users from that cohort active in
    cohort_week + week_offset — the standard product-analytics
    retention triangle. All-int64 output
    ``(cohort_week, week_offset, n_users)``.

    Scale shape: per-batch distinct (user, week) partials (combiner)
    immediately collapse the event log to its active-user-week set,
    then ONE key-collocating ``sort(user, week)`` — the same
    sort+census-stitch spine as :func:`reffy_ray.ops.window.event_gaps`.
    Sorted order makes everything else block-local and vectorized:
    cross-block duplicate (u, week) rows and each user's cohort week
    (their first sorted row) are resolved by a #blocks-row census
    stitched on the driver, each block emits ≤ #cells partial counts,
    and a tiny final groupby sums them. No join operators, no
    driver-side per-user work, no broadcast of the user table.
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray as _ray
    from ray.data.aggregate import Sum

    def pairs_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "u": batch.column(user_col).cast(pa.int64()),
                "week": pc.floor(
                    pc.divide(
                        batch.column(ts_col).cast(pa.int64()), WEEK_US
                    )
                ).cast(pa.int64()),
            }
        )
        return t.group_by(["u", "week"]).aggregate([]).select(["u", "week"])

    srt = (
        events.map_batches(pairs_partial, batch_format="pyarrow")
        .sort(["u", "week"])
        .materialize()
    )

    def census(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64")
                 for c in ("fu", "fw", "lu", "lw", "flw")}
            )
        u = b["u"].to_numpy()
        w = b["week"].to_numpy()
        first_of_last = w[u == u[-1]][0]  # last user's first week HERE
        return pd.DataFrame(
            {
                "fu": [int(u[0])],
                "fw": [int(w[0])],
                "lu": [int(u[-1])],
                "lw": [int(w[-1])],
                "flw": [int(first_of_last)],
            }
        )

    blocks = sorted(
        (int(r["fu"]), int(r["fw"]), int(r["lu"]), int(r["lw"]), int(r["flw"]))
        for r in srt.map_batches(
            census, batch_format="pandas", batch_size=None
        ).take_all()
    )
    # stitch in key order: each block learns (a) its first user's
    # cohort week when that user started in an earlier block, (b) the
    # previous block's last (u, week) so boundary duplicates (the
    # partial dedup is per-batch, not global) drop exactly once
    stitch: dict = {}
    carry_u, carry_cohort, prev_u, prev_w = None, -1, -2, -1
    for fu, fw, lu, lw, flw in blocks:
        head_cohort = carry_cohort if fu == carry_u else fw
        stitch[(fu, fw, lu, lw)] = (head_cohort, prev_u, prev_w)
        carry_cohort = head_cohort if lu == fu else flw
        carry_u, prev_u, prev_w = lu, lu, lw
    st_ref = _ray.put(stitch)

    def cells_partial(b: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if not len(b):
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64")
                 for c in ("cohort_week", "week_offset", "n")}
            )
        u = b["u"].to_numpy()
        w = b["week"].to_numpy()
        fu0 = int(u[0])
        head_cohort, pu, pw = _ray.get(st_ref)[
            (fu0, int(w[0]), int(u[-1]), int(w[-1]))
        ]
        # drop duplicates: consecutive equal (u, week) rows, plus a
        # head row continuing the previous block's tail pair
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (w[1:] != w[:-1])
        keep[0] = not (u[0] == pu and w[0] == pw)
        u, w = u[keep], w[keep]
        if not len(u):
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64")
                 for c in ("cohort_week", "week_offset", "n")}
            )
        # per-row cohort: first week of each user's run in this block;
        # the stitch's head_cohort is the block-first user's TRUE
        # global cohort (its own fw when the user starts here, the
        # carried first week when it started in an earlier block)
        starts = np.ones(len(u), dtype=bool)
        starts[1:] = u[1:] != u[:-1]
        cohort = w[starts][np.cumsum(starts) - 1]
        cohort = np.where(u == fu0, head_cohort, cohort)
        out = pd.DataFrame(
            {"cohort_week": cohort.astype("int64"),
             "week_offset": (w - cohort).astype("int64")}
        )
        g = out.groupby(["cohort_week", "week_offset"], as_index=False).size()
        return g.rename(columns={"size": "n"}).astype("int64")

    out = (
        srt.map_batches(cells_partial, batch_format="pandas", batch_size=None)
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("n", alias_name="n_users"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_week": batch.column("cohort_week").cast(pa.int64()),
                "week_offset": batch.column("week_offset").cast(pa.int64()),
                "n_users": batch.column("n_users").cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def daily_new_users(
    events,
    user_col: str = "user_id",
    ts_col: str = "ts",
    day_us: int = 86_400_000_000,
) -> "object":
    """Daily acquisition curve: for each day (epoch-us floor-divided),
    how many users appear for the FIRST time, plus the running
    cumulative total — all int64.

    Scale shape: one ``groupby(user)`` min reduces the corpus to one
    row per user; a second groupby reduces to one row per day. Only
    the day table (calendar-sized, not corpus-sized) reaches the
    driver for the prefix sum."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    def to_us(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": batch.column(user_col).cast(pa.int64()),
                "t": batch.column(ts_col).cast(pa.int64()),
            }
        )

    firsts = (
        events.select_columns([user_col, ts_col])
        .map_batches(to_us, batch_format="pyarrow")
        .groupby("u")
        .aggregate(Min("t", alias_name="f"))
    )

    def day_of(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"day": pc.divide(batch.column("f"), day_us)}
        )

    per_day = (
        firsts.map_batches(day_of, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Count(alias_name="new_users"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    per_day["cum_users"] = per_day["new_users"].cumsum().astype("int64")
    per_day["day"] = per_day["day"].astype("int64")
    per_day["new_users"] = per_day["new_users"].astype("int64")
    return rd.from_pandas(per_day)


def histogram(
    events,
    value_col: str,
    width: float,
    by: str | None = None,
) -> "object":
    """Fixed-width histogram of a numeric column, optionally per
    group: bucket = floor(value / width) (the identical IEEE division
    + floor in any engine, so bucket ids are exact), count per bucket.
    Combiner shape: buckets are computed and partially counted inside
    each block, so the groupby shuffles (group, bucket) partials, not
    rows."""
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    keys = (["g"] if by else []) + ["bucket"]

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value_col].to_numpy()
        d = {"bucket": np.floor(v / width).astype("int64")}
        if by:
            d["g"] = b[by].to_numpy()
        df = pd.DataFrame(d)
        out = df.groupby(keys, sort=True).size().reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    agg = (
        events.map_batches(partials, batch_format="pandas")
        .groupby(keys[0] if len(keys) == 1 else keys)
        .aggregate(Sum("n", alias_name="n"))
    )
    if by:
        return agg.map_batches(
            lambda t: t.rename_columns([by, "bucket", "n"]),
            batch_format="pyarrow",
        )
    return agg


def top_value_per_group(
    ds,
    group_col: str,
    value_col: str,
) -> "object":
    """Per-group mode: the most frequent value of ``value_col`` in each
    group (ties -> lexicographically smallest value, so the winner is
    deterministic and SQL-restatable). Two stages: a (group, value)
    count groupby (partials combined per block first), then a per-group
    argmax via ``map_groups`` over the already-tiny count table."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        out = (
            b.groupby([group_col, value_col], sort=True)
            .size()
            .reset_index(name="n")
        )
        out["n"] = out["n"].astype("int64")
        return out

    counts = (
        ds.select_columns([group_col, value_col])
        .map_batches(partials, batch_format="pandas")
        .groupby([group_col, value_col])
        .aggregate(Sum("n", alias_name="n"))
    )

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        w = g.sort_values(["n", value_col], ascending=[False, True]).iloc[:1]
        return w[[group_col, value_col, "n"]]

    return counts.groupby(group_col).map_groups(argmax, batch_format="pandas")


def kmv_distinct(
    ds,
    value_expr,
    k: int = 1024,
):
    """KMV (k-minimum-values) distinct-count sketch — the classic
    bottom-k estimator (Bar-Yossef et al. 2002): hash every value to
    uint64, keep the k smallest DISTINCT hashes, estimate
    ``D ≈ (k-1) * 2^64 / h_k``.

    Deterministic (md5 hashes, integer floor division), so the result
    is bit-identical to a SQL restatement — a *sketch* with an exact
    oracle. Combiner shape: each block contributes at most ``k``
    hashes (``partials``), the global bottom-k merge sees only
    ``k × #blocks`` rows. At 100 TB the merge input is a few MB — no
    shuffle, no full distinct materialization (which is the entire
    point of KMV over ``COUNT(DISTINCT)``).

    ``value_expr(batch) -> list[str]`` maps an Arrow batch to the
    string values to sketch (e.g. tokens of a text column).

    Returns a one-row Arrow table ``(n_seen:int64, estimate:int64)``
    where ``n_seen = min(D, k)`` and ``estimate`` is exact (= D) when
    D < k.
    """
    import hashlib

    import pyarrow as pa

    kk = int(k)

    def partials(batch: pa.Table) -> pa.Table:
        vals = value_expr(batch)
        hs = {
            int.from_bytes(hashlib.md5(v.encode("utf-8")).digest()[:8], "big")
            for v in vals
        }
        bottom = sorted(hs)[:kk]
        return pa.table({"h": pa.array(bottom, pa.uint64())})

    rows = ds.map_batches(partials, batch_format="pyarrow").take_all()
    merged = sorted({int(r["h"]) for r in rows})[:kk]
    n_seen = len(merged)
    if n_seen < kk:
        est = n_seen
    else:
        est = (kk - 1) * (1 << 64) // merged[-1]
    return pa.table(
        {
            "n_seen": pa.array([n_seen], pa.int64()),
            "estimate": pa.array([int(est)], pa.int64()),
        }
    )


def event_type_pairs(ds, user_col: str = "user_id", type_col: str = "event_type"):
    """Co-occurrence support counts: for every unordered pair of event
    types, how many users performed BOTH (market-basket pair support).

    Fully vectorized indicator-matrix shape — no per-user dispatch:

    1. tiny pass collecting the global distinct type list t (broadcast);
    2. per-block partial indicator rows (pandas pivot: one 0/1 column
       per type, groupby-max within the block) → ONE user-keyed
       groupby with ``Max`` per type column — the only shuffle, and
       its payload is #users × t bits;
    3. per-block partial co-occurrence matrices ``Xᵀ·X`` (t × t int64
       numpy matmul) → the driver sums a handful of t × t matrices
       and emits the upper triangle.

    Works because t (#distinct event types) is a small constant; the
    user dimension — the one that grows with data — only ever flows
    through the hash groupby."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Max

    types = sorted(ds.select_columns([type_col]).unique(type_col))
    tcols = [f"t_{i}" for i in range(len(types))]
    tindex = {t: i for i, t in enumerate(types)}

    def indicator_partial(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({user_col: b[user_col]})
        code = b[type_col].map(tindex).to_numpy()
        onehot = np.zeros((len(b), len(types)), dtype="int64")
        onehot[np.arange(len(b)), code] = 1
        for j, c in enumerate(tcols):
            out[c] = onehot[:, j]
        return out.groupby(user_col, as_index=False, sort=False).max()

    per_user = (
        ds.select_columns([user_col, type_col])
        .map_batches(indicator_partial, batch_format="pandas")
        .groupby(user_col)
        .aggregate(*[Max(c, alias_name=c) for c in tcols])
    )

    def cooc_partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b[tcols].to_numpy(dtype="int64")
        m = x.T @ x
        return pd.DataFrame({"cell": [m.tobytes()]})

    cells = per_user.map_batches(cooc_partial, batch_format="pandas").take_all()
    t = len(types)
    total = np.zeros((t, t), dtype="int64")
    for r in cells:
        total += np.frombuffer(r["cell"], dtype="int64").reshape(t, t)
    e1, e2, support = [], [], []
    for i in range(t):
        for j in range(i + 1, t):
            e1.append(types[i])
            e2.append(types[j])
            support.append(int(total[i, j]))
    return pa.table(
        {
            "e1": pa.array(e1, pa.string()),
            "e2": pa.array(e2, pa.string()),
            "support": pa.array(support, pa.int64()),
        }
    )


def heavy_hitters(
    ds,
    value_expr,
    phi: float = 0.01,
):
    """Exact φ-frequent items in two streaming passes — the classic
    alternative to a full ``groupby`` over a heavy-tailed key column
    whose tail you do not care about.

    Pass 1 (candidate generation): each block emits the values whose
    LOCAL frequency is ≥ φ (``np.unique`` + threshold — a combiner that
    outputs at most ⌊1/φ⌋ rows per block). Averaging argument: any
    value with GLOBAL frequency ≥ φ must reach local frequency ≥ φ in
    at least one block, so the union of block candidates is a superset
    of the true heavy hitters. The distinct-candidate set is ≤ ⌊1/φ⌋ ×
    #blocks worst case but concentrates to O(1/φ) in practice; it is
    deduplicated by a tiny groupby before leaving the cluster.

    Pass 2 (exact verification): the candidate set is broadcast
    (``ray.put`` once), each block counts ONLY candidate occurrences
    plus its total item count under a sentinel key, and one small
    groupby-sum yields exact counts and the exact grand total N.
    Survivors have count ≥ ⌈φ·N⌉ — no false positives, no false
    negatives, and the shuffle volume is O(1/φ) rows per block
    instead of the full key distribution.

    ``value_expr(batch) -> list[str]`` as in :func:`kmv_distinct`.
    Returns an Arrow table ``(term:string, n:int64)``.
    """
    import pyarrow as pa
    import ray as _ray

    TOTAL = "\x00total"  # cannot collide with real values

    def candidates(batch: pa.Table) -> pa.Table:
        vals = np.asarray(value_expr(batch), dtype=object)
        if not len(vals):
            return pa.table({"term": pa.array([], pa.string())})
        uniq, counts = np.unique(vals, return_counts=True)
        keep = uniq[counts >= phi * len(vals)]
        return pa.table({"term": pa.array(list(keep), pa.string())})

    cand = sorted(
        ds.map_batches(candidates, batch_format="pyarrow").unique("term")
    )
    cref = _ray.put(np.asarray(cand, dtype=object))

    def verify(batch: pa.Table) -> pa.Table:
        cands = _ray.get(cref)
        vals = np.asarray(value_expr(batch), dtype=object)
        terms = [TOTAL]
        ns = [len(vals)]
        if len(vals):
            uniq, counts = np.unique(vals, return_counts=True)
            mask = np.isin(uniq, cands)
            terms.extend(uniq[mask].tolist())
            ns.extend(counts[mask].tolist())
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "n": pa.array([int(x) for x in ns], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    rows = (
        ds.map_batches(verify, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    total = sum(int(r["n"]) for r in rows if r["term"] == TOTAL)
    cut = math.ceil(phi * total)
    kept = sorted(
        (r["term"], int(r["n"]))
        for r in rows
        if r["term"] != TOTAL and int(r["n"]) >= cut
    )
    import pyarrow as pa2

    return pa2.table(
        {
            "term": pa2.array([t for t, _ in kept], pa2.string()),
            "n": pa2.array([n for _, n in kept], pa2.int64()),
        }
    )


def corr_stats(
    ds,
    by: str,
    x: str,
    y: str,
):
    """Per-group sufficient statistics for Pearson correlation /
    OLS slope between two INTEGER columns: ``(n, sum_x, sum_y,
    sum_xx, sum_yy, sum_xy)``, all exact int64 — the classic
    parallelizable form (corr is a pure driver-side formula over the
    six sums, so the distributed part is float-free and bitwise
    engine-independent).

    Combiner shape: each block reduces to one partial row per group it
    contains (pandas groupby-sum inside ``map_batches``), then ONE
    small ``groupby(by)`` sums partials — shuffle volume is
    #groups × #blocks rows, never the data. Caller guarantees the
    products fit int64 (|x·y| × rows < 2⁶³ — true for cents-scale
    values up to ~10¹⁰ rows; shard the sums by row-range first past
    that).
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    cols = ["n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        xv = b[x].to_numpy(dtype="int64")
        yv = b[y].to_numpy(dtype="int64")
        t = pd.DataFrame(
            {
                by: b[by],
                "n": np.ones(len(b), dtype="int64"),
                "sum_x": xv,
                "sum_y": yv,
                "sum_xx": xv * xv,
                "sum_yy": yv * yv,
                "sum_xy": xv * yv,
            }
        )
        return t.groupby(by, as_index=False, sort=False).sum()

    out = (
        ds.select_columns([by, x, y])
        .map_batches(partial, batch_format="pandas")
        .groupby(by)
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
    )

    def fin(b: pa.Table) -> pa.Table:
        t = {by: b.column(by)}
        for c in cols:
            t[c] = b.column(c).cast(pa.int64())
        return pa.table(t)

    return out.map_batches(fin, batch_format="pyarrow")


def winsorize(
    ds,
    by: str,
    value: str,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
):
    """Per-group winsorization: clip ``value`` to its group's exact
    discrete [lo_q, hi_q] quantiles (``percentile_disc`` bounds — the
    clip limits are actual data elements, so outputs are bitwise
    engine-independent; no interpolation arithmetic touches the kept
    values either).

    Scale shape: the bounds come from :func:`group_quantiles` (one
    group shuffle over the value column); the tiny #groups-row bounds
    table is ``ray.put``-broadcast and the clip itself is a pure
    vectorized map — the big table never shuffles.
    """
    import pyarrow as pa
    import ray as _ray

    qname_lo = f"q{int(round(lo_q * 100))}"
    qname_hi = f"q{int(round(hi_q * 100))}"
    bounds = {
        r[by]: (r[qname_lo], r[qname_hi])
        for r in group_quantiles(ds, by, value, qs=(lo_q, hi_q)).take_all()
    }
    bref = _ray.put(bounds)

    def clip(b: pd.DataFrame) -> pd.DataFrame:
        bd = _ray.get(bref)
        keys = b[by]
        v = b[value].to_numpy()
        lo = keys.map({k: t[0] for k, t in bd.items()}).to_numpy()
        hi = keys.map({k: t[1] for k, t in bd.items()}).to_numpy()
        return pd.DataFrame(
            {
                by: keys.to_numpy(),
                value: v,
                "clipped": np.minimum(np.maximum(v, lo), hi),
            }
        )

    return ds.select_columns([by, value]).map_batches(clip, batch_format="pandas")


def cms_counts(
    ds,
    value_expr,
    terms,
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms",
):
    """Count-min sketch frequency estimates for ``terms`` — the
    bounded-memory alternative to a full token ``groupby`` when you
    only need point estimates: every token increments one cell per
    row (``cell = H(salt·r ‖ token) mod width``), estimate = min over
    the ``depth`` rows of the queried cell (overestimates only, by at
    most the classic εN bound).

    Deterministic md5 hashing ⇒ the whole sketch — collisions included
    — is exactly restatable in SQL, like :func:`kmv_distinct`.

    Combiner shape: each block emits at most ``depth × width`` partial
    ``(r, cell, n)`` rows regardless of block size; one small groupby
    sums them; the queried estimates are a ``len(terms) × depth``
    lookup on the driver. Nothing token-shaped ever shuffles.
    """
    import hashlib

    import pyarrow as pa
    from ray.data.aggregate import Sum

    def h(r: int, tok: str) -> int:
        dig = hashlib.md5(f"{salt}{r}:{tok}".encode("utf-8")).digest()[:8]
        return int.from_bytes(dig, "big") % width

    def partial(batch: pa.Table) -> pa.Table:
        vals = value_expr(batch)
        rs, cells = [], []
        for r in range(depth):
            for v in vals:
                rs.append(r)
                cells.append(h(r, v))
        t = pd.DataFrame({"r": rs, "cell": cells})
        g = t.groupby(["r", "cell"], as_index=False, sort=False).size()
        return pa.table(
            {
                "r": pa.array(g["r"].to_numpy(), pa.int64()),
                "cell": pa.array(g["cell"].to_numpy(), pa.int64()),
                "n": pa.array(g["size"].to_numpy(), pa.int64()),
            }
        )

    sketch = {
        (int(row["r"]), int(row["cell"])): int(row["n"])
        for row in ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["r", "cell"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    }
    out_terms, ests = [], []
    for t in sorted(terms):
        est = min(sketch.get((r, h(r, t)), 0) for r in range(depth))
        out_terms.append(t)
        ests.append(est)
    import pyarrow as pa2

    return pa2.table(
        {
            "term": pa2.array(out_terms, pa2.string()),
            "est": pa2.array(ests, pa2.int64()),
        }
    )


def zscore_outliers(
    ds,
    by: str,
    value: str,
    id_col: str,
    z: int = 3,
):
    """Per-group z-score outlier flags with ZERO float arithmetic:
    row ``x`` is an outlier iff ``(n·x − S)² > z²·(n·Sxx − S²)`` —
    the |x−μ| > z·σ test cross-multiplied into integers, so the flag
    set is bitwise engine-independent (no sqrt, no division).

    Two passes: a :func:`corr_stats`-style combiner collects per-group
    ``(n, S, Sxx)`` (#groups rows, broadcast), then a pure vectorized
    filter — the big table never shuffles. Caller keeps magnitudes
    int64-safe: ``(n·|x|+|S|)²`` must stay below 2⁶³ (true for
    dollar-scale values up to ~10⁸ rows per group; shard the group by
    row-range past that).
    """
    import pyarrow as pa
    import ray as _ray
    from ray.data.aggregate import Sum

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        xv = b[value].to_numpy(dtype="int64")
        t = pd.DataFrame(
            {
                by: b[by],
                "n": np.ones(len(b), dtype="int64"),
                "s": xv,
                "sxx": xv * xv,
            }
        )
        return t.groupby(by, as_index=False, sort=False).sum()

    stats = {
        r[by]: (int(r["n"]), int(r["s"]), int(r["sxx"]))
        for r in ds.select_columns([by, value])
        .map_batches(partial, batch_format="pandas")
        .groupby(by)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("sxx", alias_name="sxx"),
        )
        .take_all()
    }
    sref = _ray.put(stats)
    zz = int(z) * int(z)

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        st = _ray.get(sref)
        keys = b[by]
        x = b[value].to_numpy(dtype="int64")
        n = keys.map({k: v[0] for k, v in st.items()}).to_numpy(dtype="int64")
        s = keys.map({k: v[1] for k, v in st.items()}).to_numpy(dtype="int64")
        sxx = keys.map({k: v[2] for k, v in st.items()}).to_numpy(dtype="int64")
        dev = n * x - s
        keep = dev * dev > zz * (n * sxx - s * s)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy()[keep],
                by: keys.to_numpy()[keep],
                value: x[keep],
            }
        )

    return ds.select_columns([id_col, by, value]).map_batches(
        flag, batch_format="pandas"
    )


def pivot_counts(
    ds,
    key_col: str,
    cat_col: str,
    categories: "list[str] | None" = None,
) -> "object":
    """Crosstab / pivot: one row per ``key_col`` with an int64 count
    column ``n_<category>`` per category of ``cat_col`` (the SQL
    ``count(*) FILTER (WHERE cat = ...)`` conditional-aggregation
    shape — wide features for a per-user/per-source activity matrix).

    Combiner shape: each block computes its local (key × category)
    count matrix (one pandas crosstab, vectorized), so the single
    ``groupby(key)`` shuffles #keys-per-block × #categories partial
    rows, never events. ``categories`` must be the closed category
    vocabulary; when None it is derived with one tiny projected
    ``unique()`` pass (only ever do that for low-cardinality columns —
    pass the list explicitly in pipelines where it is known)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    if categories is None:
        categories = sorted(ds.select_columns([cat_col]).unique(cat_col))
    cols = [f"n_{c}" for c in categories]

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(b[key_col], b[cat_col])
        ct = ct.reindex(columns=categories, fill_value=0).astype("int64")
        ct.columns = cols
        return ct.reset_index()

    return (
        ds.select_columns([key_col, cat_col])
        .map_batches(partials, batch_format="pandas")
        .groupby(key_col)
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
    )


def rollup_agg(
    ds,
    dims: "list[str]",
    value_col: str,
    total_label: str = "ALL",
) -> "object":
    """``GROUP BY ROLLUP(dims...)`` — exact sums and counts at every
    rollup level: the finest (d1, d2, ...), each prefix (d1, ALL),
    and the grand total (ALL, ALL). Rolled-up dimension positions
    carry ``total_label`` so every column stays a non-null string
    (type-stable across engines; callers must pick a label that is
    not a live dimension value).

    Scale shape: blocks pre-aggregate to finest-level partials
    (combiner), ONE small ``groupby(dims)`` shuffle produces the
    finest table — bounded by the dimension-combination cardinality,
    not the fact-table size — and every coarser level is derived from
    that tiny table in a single-batch pass. The fact table is read
    once and never re-shuffled per level."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(dims, sort=True)[value_col]
        out = g.sum().reset_index(name="s")
        out["s"] = out["s"].astype("int64")
        out["n"] = g.size().reset_index(name="n")["n"].astype("int64")
        return out

    finest = (
        ds.select_columns(dims + [value_col])
        .map_batches(partials, batch_format="pandas")
        .groupby(dims)
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    )

    def levels(b: pd.DataFrame) -> pd.DataFrame:
        outs = [b[dims + ["s", "n"]]]
        for keep in range(len(dims) - 1, -1, -1):
            head = dims[:keep]
            if head:
                lv = b.groupby(head, sort=True)[["s", "n"]].sum().reset_index()
            else:
                lv = pd.DataFrame({"s": [b["s"].sum()], "n": [b["n"].sum()]})
            for d in dims[keep:]:
                lv[d] = total_label
            outs.append(lv[dims + ["s", "n"]])
        out = pd.concat(outs, ignore_index=True)
        return out.astype({"s": "int64", "n": "int64"})

    # the finest table is dimension-cardinality-sized; collapse it to
    # one batch so each coarser level is computed exactly once
    return finest.repartition(1).map_batches(
        levels, batch_format="pandas", batch_size=None
    )


def distinct_count(
    ds,
    by: str,
    value: str,
    out_col: str = "n_distinct",
) -> "object":
    """Exact per-group COUNT(DISTINCT value) — the exact counterpart
    of the :func:`kmv_distinct` sketch. Two-stage shape: blocks first
    drop local duplicates (so the shuffle carries per-block distinct
    pairs, not rows), ONE ``groupby((by, value))`` establishes global
    distinctness with (by, value)-partitioned parallelism — no
    per-group row concentration even when one group dominates — then
    per-block count partials feed a tiny ``groupby(by)`` sum."""
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    def local_dedup(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates([by, value])

    dedup = (
        ds.select_columns([by, value])
        .map_batches(local_dedup, batch_format="pandas")
        .groupby([by, value])
        .aggregate(Count())
    )

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby(by, sort=True).size().reset_index(name="pn")
        out["pn"] = out["pn"].astype("int64")
        return out

    return (
        dedup.map_batches(partials, batch_format="pandas")
        .groupby(by)
        .aggregate(Sum("pn", alias_name=out_col))
    )


def pair_lift(
    ds,
    user_col: str = "user_id",
    type_col: str = "event_type",
    scale: int = 1_000_000,
):
    """Co-occurrence lift ranking: for every unordered event-type pair
    with support > 0, ``lift_ppm = support · n_users · scale //
    (cnt_a · cnt_b)`` — the association strength behind PMI, kept in
    exact integer floor arithmetic so ordering is bit-stable and
    restatable in SQL.

    Same indicator-matrix shape as :func:`event_type_pairs` with one
    twist: an appended all-ones column makes a single t+1 × t+1
    ``Xᵀ·X`` matmul yield the pair supports (off-diagonal), each
    type's user count (last column) AND the total distinct-user count
    (corner cell) — marginals and joints in one pass, no extra
    aggregation."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Max

    types = sorted(ds.select_columns([type_col]).unique(type_col))
    tcols = [f"t_{i}" for i in range(len(types))] + ["t_one"]
    tindex = {t: i for i, t in enumerate(types)}

    def indicator_partial(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({user_col: b[user_col]})
        code = b[type_col].map(tindex).to_numpy()
        onehot = np.zeros((len(b), len(types) + 1), dtype="int64")
        onehot[np.arange(len(b)), code] = 1
        onehot[:, -1] = 1
        for j, c in enumerate(tcols):
            out[c] = onehot[:, j]
        return out.groupby(user_col, as_index=False, sort=False).max()

    per_user = (
        ds.select_columns([user_col, type_col])
        .map_batches(indicator_partial, batch_format="pandas")
        .groupby(user_col)
        .aggregate(*[Max(c, alias_name=c) for c in tcols])
    )

    def cooc_partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b[tcols].to_numpy(dtype="int64")
        m = x.T @ x
        return pd.DataFrame({"cell": [m.tobytes()]})

    cells = per_user.map_batches(cooc_partial, batch_format="pandas").take_all()
    t = len(types)
    total = np.zeros((t + 1, t + 1), dtype="int64")
    for r in cells:
        total += np.frombuffer(r["cell"], dtype="int64").reshape(t + 1, t + 1)
    n_users = int(total[t, t])
    e1, e2, support, lift = [], [], [], []
    for i in range(t):
        for j in range(i + 1, t):
            s = int(total[i, j])
            if s == 0:
                continue
            ca, cb = int(total[i, t]), int(total[j, t])
            e1.append(types[i])
            e2.append(types[j])
            support.append(s)
            lift.append(s * n_users * scale // (ca * cb))
    return pa.table(
        {
            "e1": pa.array(e1, pa.string()),
            "e2": pa.array(e2, pa.string()),
            "support": pa.array(support, pa.int64()),
            "lift_ppm": pa.array(lift, pa.int64()),
        }
    )


def share_of_total(
    ds,
    key_col: str,
    value_col: str,
    scale: int = 1_000_000,
):
    """Ratio-to-report: each key's exact integer share of the global
    ``value_col`` sum, ``share_ppm = key_sum · scale // total`` —
    SQL's ``sum(x) / sum(sum(x)) OVER ()`` without the float division.
    ``value_col`` must already be int64 (integer cents upstream).

    Scale shape: per-block per-key partial sums → ONE tiny
    ``groupby(key)`` (payload #keys × #blocks rows); the total is the
    sum of the per-key sums, taken on the already-small aggregate —
    no second pass over the data."""
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby(key_col, as_index=False, sort=False)[value_col].sum()
        out[value_col] = out[value_col].astype("int64")
        return out

    agg = (
        ds.select_columns([key_col, value_col])
        .map_batches(partial, batch_format="pandas")
        .groupby(key_col)
        .aggregate(Sum(value_col, alias_name="key_sum"))
        .to_arrow_refs()
    )
    import ray as _ray

    parts = [_ray.get(r) for r in agg]
    live = [p for p in parts if p.num_rows]
    if not live:
        return pa.table(
            {
                key_col: pa.array([], pa.string()),
                "key_sum": pa.array([], pa.int64()),
                "share_ppm": pa.array([], pa.int64()),
            }
        )
    t = pa.concat_tables(live)
    keys = t.column(key_col).to_pylist()
    sums = t.column("key_sum").cast(pa.int64()).to_pylist()
    total = sum(sums) or 1
    order = sorted(range(len(keys)), key=lambda i: str(keys[i]))
    return pa.table(
        {
            key_col: pa.array([keys[i] for i in order]),
            "key_sum": pa.array([sums[i] for i in order], pa.int64()),
            "share_ppm": pa.array(
                [sums[i] * scale // total for i in order], pa.int64()
            ),
        }
    )


def pareto_front(
    ds,
    by: str,
    max_col: str,
    min_col: str,
):
    """Per-group 2-D Pareto frontier (skyline): the DISTINCT
    ``(max_col, min_col)`` points no other point in the group
    dominates, where b dominates a iff ``b.max >= a.max`` and
    ``b.min <= a.min`` with at least one strict — the classic
    skyline operator (Börzsönyi et al., ICDE 2001). Both value
    columns must already be int64 (cents / epoch-us upstream) so the
    comparisons are exact.

    Scale shape: the skyline of a union is a subset of the union of
    skylines, so each block emits only its LOCAL skyline (per key) —
    typically a few points per key per block — and one tiny
    ``groupby(by)`` finishes on the partials. The fact table never
    shuffles. Vectorized: sort by (max desc, min asc), keep rows
    whose ``min`` strictly improves the running minimum.
    """
    import pyarrow as pa

    def local_skyline(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[by, max_col, min_col]].drop_duplicates()
        outs = []
        for _, g in b.groupby(by, sort=False):
            g = g.sort_values(
                [max_col, min_col], ascending=[False, True], kind="mergesort"
            )
            m = g[min_col].to_numpy()
            run = np.minimum.accumulate(m)
            keep = np.ones(len(g), dtype=bool)
            keep[1:] = m[1:] < run[:-1]
            outs.append(g[keep])
        if not outs:
            return pd.DataFrame(
                {
                    by: pd.Series([], dtype=b[by].dtype),
                    max_col: pd.Series([], dtype="int64"),
                    min_col: pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    partials = ds.select_columns([by, max_col, min_col]).map_batches(
        local_skyline, batch_format="pandas"
    )
    return partials.groupby(by).map_groups(
        local_skyline, batch_format="pandas"
    )


def decayed_score(
    ds,
    by: str,
    ts_col: str,
    value_col: str,
    ref_us: int,
    half_life_us: int = 86_400_000_000,
    max_shift: int = 62,
):
    """Per-key exponentially time-decayed score with EXACT integer
    arithmetic: each row contributes ``value >> n`` where ``n`` is the
    number of whole half-lives between the row's timestamp and
    ``ref_us`` (clamped to [0, max_shift]) — the freshness-weighted
    popularity signal behind trending rankings, with bit-shift
    halving standing in for ``value * 2^(-age/hl)`` so the result is
    bitwise restatable in SQL (``value >> LEAST(age, 62)``).

    ``value_col`` must be int64 (integer cents upstream). Scale
    shape: stateless per-block decay + per-key partial sums → ONE
    tiny ``groupby(by)`` over #keys × #blocks partial rows.
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b[ts_col].astype("int64").to_numpy()
        v = b[value_col].astype("int64").to_numpy()
        age = np.clip((ref_us - t) // half_life_us, 0, max_shift)
        out = pd.DataFrame({by: b[by], "d": v >> age})
        g = out.groupby(by, as_index=False, sort=False)["d"].sum()
        g["d"] = g["d"].astype("int64")
        return g

    def to_us(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        t = b.column(ts_col)
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {by: b.column(by), ts_col: t, value_col: b.column(value_col)}
        )

    return (
        ds.select_columns([by, ts_col, value_col])
        .map_batches(to_us, batch_format="pyarrow")
        .map_batches(partial, batch_format="pandas")
        .groupby(by)
        .aggregate(Sum("d", alias_name="decayed"))
    )


def hll_distinct(
    ds,
    value_expr,
    m: int = 64,
):
    """HyperLogLog distinct-count sketch (Flajolet et al. 2007) with a
    fully DETERMINISTIC integer construction, so the estimate itself
    has an exact SQL restatement (the KMV twin, one register table
    instead of a bottom-k set): md5 the value to uint64, bucket on the
    top ``log2(m)`` bits, register = position of the highest set bit
    in the remaining field (rho), estimate =
    ``alpha_ppm * m^2 * 2^64 // (10^6 * sum_j 2^(64 - M_j))`` — the
    raw HLL harmonic mean in exact rational arithmetic (numerator and
    denominator both integers; no small-range linear counting, so the
    formula is reproducible bit-for-bit).

    Combiner shape: each block emits at most ``m`` (bucket, rho_max)
    rows; the global merge is a per-bucket max over ``m × #blocks``
    rows on the driver — no shuffle, no distinct materialization.

    Returns one row ``(m, n_zero, estimate)``.
    """
    import hashlib

    import pyarrow as pa

    mm = int(m)
    bits = mm.bit_length() - 1
    assert 1 << bits == mm, "m must be a power of two"
    field = 64 - bits

    def partials(batch: pa.Table) -> pa.Table:
        regs: dict[int, int] = {}
        for v in value_expr(batch):
            h = int.from_bytes(
                hashlib.md5(v.encode("utf-8")).digest()[:8], "big"
            )
            bkt = h >> field
            rest = h & ((1 << field) - 1)
            rho = field - rest.bit_length() + 1
            if rho > regs.get(bkt, 0):
                regs[bkt] = rho
        return pa.table(
            {
                "bkt": pa.array(list(regs), pa.int64()),
                "rho": pa.array(list(regs.values()), pa.int64()),
            }
        )

    rows = ds.map_batches(partials, batch_format="pyarrow").take_all()
    regs = [0] * mm
    for r in rows:
        b = int(r["bkt"])
        if int(r["rho"]) > regs[b]:
            regs[b] = int(r["rho"])
    # alpha_64 = 0.709 (the standard constant for m=64), as ppm
    alpha_ppm = 709_000
    s = sum(1 << (64 - rho) for rho in regs)
    est = alpha_ppm * mm * mm * (1 << 64) // (1_000_000 * s)
    return pa.table(
        {
            "m": pa.array([mm], pa.int64()),
            "n_zero": pa.array([sum(1 for r in regs if r == 0)], pa.int64()),
            "estimate": pa.array([int(est)], pa.int64()),
        }
    )


def group_regression(ds, by: str, x: str, y: str):
    """Per-group OLS regression of INTEGER ``y`` on INTEGER ``x``,
    emitted as EXACT integer numerator/denominator pairs instead of a
    float slope — ``slope = slope_num / slope_den`` and ``intercept =
    intercept_num / intercept_den`` with

        slope_num     = n·Σxy − Σx·Σy
        slope_den     = n·Σxx − (Σx)²   (= intercept_den)
        intercept_num = Σy·Σxx − Σx·Σxy

    so the distributed output is float-free, bitwise
    engine-independent, and the caller (or SQL oracle) divides at the
    edge. Groups whose x is constant (slope_den = 0) still emit — the
    caller decides the degenerate-fit policy.

    Scale shape: delegates to :func:`corr_stats` (per-block combiner
    partials, one #groups×#blocks shuffle), then a stateless map over
    the #groups-sized sums table. Overflow contract is corr_stats's
    plus one factor of n (products are computed in Python ints, exact;
    the int64 CAST at emission is where a violation would surface).
    """
    import pyarrow as pa

    stats = corr_stats(ds, by=by, x=x, y=y)

    def fit(b: "pa.Table") -> "pa.Table":
        n = b.column("n").to_pylist()
        sx = b.column("sum_x").to_pylist()
        sy = b.column("sum_y").to_pylist()
        sxx = b.column("sum_xx").to_pylist()
        sxy = b.column("sum_xy").to_pylist()
        slope_num = [ni * xyi - xi * yi for ni, xi, yi, xyi in zip(n, sx, sy, sxy)]
        den = [ni * xxi - xi * xi for ni, xi, xxi in zip(n, sx, sxx)]
        icept_num = [
            yi * xxi - xi * xyi for xi, yi, xxi, xyi in zip(sx, sy, sxx, sxy)
        ]
        return pa.table(
            {
                by: b.column(by),
                "n": b.column("n"),
                "slope_num": pa.array(slope_num, pa.int64()),
                "slope_den": pa.array(den, pa.int64()),
                "intercept_num": pa.array(icept_num, pa.int64()),
                "intercept_den": pa.array(den, pa.int64()),
            }
        )

    return stats.map_batches(fit, batch_format="pyarrow")

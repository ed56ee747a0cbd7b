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

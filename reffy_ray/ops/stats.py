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

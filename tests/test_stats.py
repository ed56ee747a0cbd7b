"""Grouped exact quantiles (ops/stats.group_quantiles)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from reffy_ray.ops.stats import group_quantiles


def test_percentile_disc_semantics(ray_session):
    # n=4: q90 -> sorted[ceil(0.9*4)-1] = sorted[3] (NOT numpy 'lower')
    ds = rd.from_arrow(
        pa.table({"k": ["a"] * 4, "v": [10.0, 20.0, 30.0, 40.0]})
    )
    out = group_quantiles(ds, by="k", value="v", qs=(0.25, 0.5, 0.9)).to_pandas()
    assert out.iloc[0]["q25"] == 10.0
    assert out.iloc[0]["q50"] == 20.0
    assert out.iloc[0]["q90"] == 40.0


def test_values_are_data_elements_and_layout_stable(ray_session):
    rows = pa.table(
        {
            "k": [f"g{i % 3}" for i in range(61)],
            "v": [float((i * 37) % 101) for i in range(61)],
        }
    )
    a = (
        group_quantiles(rd.from_arrow(rows), by="k", value="v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    b = (
        group_quantiles(rd.from_arrow(rows).repartition(9), by="k", value="v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    vals = set(rows.column("v").to_pylist())
    for c in ["q25", "q50", "q75", "q90"]:
        assert set(a[c]) <= vals


def test_global_quantiles_match_sorted_rank(ray_session):
    from reffy_ray.ops.stats import global_quantiles

    import math

    vals = [float((i * 193) % 1009) for i in range(2000)]
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(8)
    out = global_quantiles(ds, value="v", qs=(0.1, 0.5, 0.99), bins=64).to_pandas()
    s = sorted(vals)
    n = len(vals)
    for q, name in [(0.1, "q10"), (0.5, "q50"), (0.99, "q99")]:
        assert out.iloc[0][name] == s[max(math.ceil(q * n), 1) - 1]


def test_global_quantiles_skew_respects_driver_cap(ray_session):
    """≥90% one value: the refinement recurses instead of collecting
    the whole hot bucket; the driver never sees > driver_cap raw rows."""
    from reffy_ray.ops.stats import global_quantiles

    import math

    vals = [0.0] * 1900 + [float((i * 193) % 1009) + 1.0 for i in range(100)]
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(8)
    audit = []
    out = global_quantiles(
        ds, value="v", qs=(0.5, 0.9, 0.99), bins=16, driver_cap=50,
        _audit=audit,
    ).to_pandas()
    s = sorted(vals)
    n = len(vals)
    for q, name in [(0.5, "q50"), (0.9, "q90"), (0.99, "q99")]:
        assert out.iloc[0][name] == s[max(math.ceil(q * n), 1) - 1]
    assert audit, "expected at least one driver-side collection"
    assert max(audit) <= 50


def test_global_quantiles_narrow_range_census(ray_session):
    """Two distinct values a few ulps apart under a tiny cap: linspace
    cannot split the range, so the distinct-value census resolves it."""
    from reffy_ray.ops.stats import global_quantiles

    base = 1.0
    nxt = float(np.nextafter(base, 2.0))
    vals = [base] * 600 + [nxt] * 400
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(4)
    out = global_quantiles(
        ds, value="v", qs=(0.5, 0.9), bins=16, driver_cap=50
    ).to_pandas()
    assert out.iloc[0]["q50"] == base
    assert out.iloc[0]["q90"] == nxt


def test_global_quantiles_degenerate(ray_session):
    from reffy_ray.ops.stats import global_quantiles

    ds = rd.from_arrow(pa.table({"v": [7.0] * 10}))
    out = global_quantiles(ds, value="v", qs=(0.5,)).to_pandas()
    assert out.iloc[0]["q50"] == 7.0


def test_funnel_conversion_first_occurrence_chain(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from reffy_ray.ops.stats import funnel_conversion

    def ev(uid, ty, sec):
        return (uid, ty, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=sec))

    rows = [
        # user 1: full ordered funnel
        ev(1, "view", 0), ev(1, "click", 10), ev(1, "purchase", 20),
        # user 2: clicked BEFORE first view -> stops at view
        ev(2, "click", 0), ev(2, "view", 5),
        # user 3: view+click, no purchase
        ev(3, "view", 0), ev(3, "click", 1),
        # user 4: purchase only -> no view, counted nowhere
        ev(4, "purchase", 0),
        # user 5: equal timestamps count (>= chain)
        ev(5, "view", 7), ev(5, "click", 7), ev(5, "purchase", 7),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
    })
    out = funnel_conversion(rd.from_arrow(tbl).repartition(3)).to_pydict()
    assert out == {"n_view": [4], "n_click": [3], "n_purchase": [2]}


def test_funnel_conversion_empty_log(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from reffy_ray.ops.stats import funnel_conversion

    empty = rd.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string()),
        "ts": pa.array([], pa.timestamp("us")),
    }))
    assert funnel_conversion(empty).to_pydict() == {
        "n_view": [0], "n_click": [0], "n_purchase": [0],
    }


def test_daily_new_users_known_curve(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.stats import daily_new_users

    DAY = 86_400_000_000
    rows = [
        # user 1 first appears day 0, user 2 day 0, user 3 day 2;
        # repeat visits never count again
        (1, 10), (2, DAY - 1), (1, DAY + 5), (3, 2 * DAY + 7),
        (2, 3 * DAY), (3, 3 * DAY + 1),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = (
        daily_new_users(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert out["day"].tolist() == [0, 2]
    assert out["new_users"].tolist() == [2, 1]
    assert out["cum_users"].tolist() == [2, 3]


def test_histogram_grouped_and_global(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.stats import histogram

    df = pd.DataFrame({
        "v": [0.5, 9.9, 10.0, 25.0, -0.1, 19.99],
        "g": ["a", "a", "b", "b", "a", "b"],
    })
    ds = rd.from_pandas(df).repartition(3)
    g = histogram(ds, "v", 10.0).to_pandas().set_index("bucket")["n"]
    # floor semantics: -0.1 -> bucket -1; 10.0 -> bucket 1 (boundary up)
    assert g.to_dict() == {-1: 1, 0: 2, 1: 2, 2: 1}
    byg = (
        histogram(ds, "v", 10.0, by="g")
        .to_pandas()
        .set_index(["g", "bucket"])["n"]
        .to_dict()
    )
    assert byg == {("a", -1): 1, ("a", 0): 2, ("b", 1): 2, ("b", 2): 1}


def test_top_value_per_group_tiebreak(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.stats import top_value_per_group

    df = pd.DataFrame({
        "u": pd.Series([1, 1, 1, 2, 2, 3], dtype="int64"),
        "e": ["b", "b", "a", "z", "a", "q"],  # user 2: tie a/z -> a
    })
    out = (
        top_value_per_group(rd.from_pandas(df).repartition(3), "u", "e")
        .to_pandas()
        .set_index("u")
        .sort_index()
    )
    assert out.loc[1].tolist() == ["b", 2]
    assert out.loc[2].tolist() == ["a", 1]
    assert out.loc[3].tolist() == ["q", 1]


def test_kmv_distinct_small_exact(ray_session):
    """D < k ⇒ the sketch degenerates to an exact distinct count."""
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.stats import kmv_distinct

    df = pd.DataFrame({"text": ["a b c", "b c d", "d e"]})
    ds = rd.from_pandas(df).repartition(2)
    out = kmv_distinct(
        ds, lambda b: [w for t in b.column("text").to_pylist() for w in t.split()]
    ).to_pandas()
    assert out["n_seen"].iloc[0] == 5
    assert out["estimate"].iloc[0] == 5


def test_kmv_distinct_estimates_within_bound(ray_session):
    """D ≫ k ⇒ the bottom-k estimate lands within the KMV error bound
    (~1/sqrt(k) relative), and is deterministic across block layouts."""
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.stats import kmv_distinct

    vals = [f"w{i}" for i in range(20_000)]
    df = pd.DataFrame({"text": [" ".join(vals[i : i + 50]) for i in range(0, 20_000, 50)]})

    def expr(b):
        return [w for t in b.column("text").to_pylist() for w in t.split()]

    est1 = kmv_distinct(rd.from_pandas(df).repartition(2), expr, k=256).to_pandas()
    est2 = kmv_distinct(rd.from_pandas(df).repartition(7), expr, k=256).to_pandas()
    assert est1["estimate"].iloc[0] == est2["estimate"].iloc[0]
    rel = abs(est1["estimate"].iloc[0] - 20_000) / 20_000
    assert rel < 0.2  # 1/sqrt(256) ≈ 0.0625; generous bound


def test_event_type_pairs_support(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.stats import event_type_pairs

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 3, 3, 3],
            "event_type": ["a", "b", "a", "a", "c", "b", "c", "b"],
        }
    )
    out = (
        event_type_pairs(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .set_index(["e1", "e2"])["support"]
        .to_dict()
    )
    # users with both a,b: {1}; a,c: {2}; b,c: {3}
    assert out == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1}


def test_heavy_hitters_exact_across_blocks(ray_session):
    """Two-pass result == exact groupby-having, regardless of how the
    heavy key is spread across blocks (the averaging-argument case:
    'hot' is never locally dominant in any single row group)."""
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.stats import heavy_hitters

    # 40 docs: every doc mentions 'hot' once among 9 fillers unique to
    # the doc -> hot global freq = 40/400 = 10%, fillers 0.25% each
    docs = [
        "hot " + " ".join(f"w{i}_{j}" for j in range(9)) for i in range(40)
    ]
    ds = rd.from_pandas(pd.DataFrame({"text": docs})).repartition(5)

    def words(b):
        out = []
        for t in b.column("text").to_pylist():
            out.extend(t.split())
        return out

    out = heavy_hitters(ds, words, phi=0.05).to_pandas()
    assert out["term"].tolist() == ["hot"]
    assert out["n"].tolist() == [40]


def test_corr_stats_sums(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.stats import corr_stats

    df = pd.DataFrame(
        {
            "g": ["a", "a", "a", "b"],
            "x": pd.Series([1, 2, 3, 10], dtype="int64"),
            "y": pd.Series([2, 4, 6, -5], dtype="int64"),
        }
    )
    out = (
        corr_stats(rd.from_pandas(df).repartition(3), "g", "x", "y")
        .to_pandas()
        .set_index("g")
    )
    assert out.loc["a"].to_dict() == {
        "n": 3, "sum_x": 6, "sum_y": 12, "sum_xx": 14, "sum_yy": 56,
        "sum_xy": 28,
    }
    assert out.loc["b", "sum_xy"] == -50
    # perfect correlation in group a from the sufficient statistics
    r = out.loc["a"]
    num = r.n * r.sum_xy - r.sum_x * r.sum_y
    den = ((r.n * r.sum_xx - r.sum_x**2) * (r.n * r.sum_yy - r.sum_y**2)) ** 0.5
    assert abs(num / den - 1.0) < 1e-12


def test_winsorize_clips_to_group_quantiles(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.stats import winsorize

    v = np.arange(1, 101, dtype="float64")
    df = pd.DataFrame({"g": ["a"] * 100, "v": v})
    out = winsorize(
        rd.from_pandas(df).repartition(4), "g", "v", lo_q=0.05, hi_q=0.95
    ).to_pandas()
    # percentile_disc: lo = v[ceil(.05*100)-1] = 5, hi = v[ceil(.95*100)-1] = 95
    assert out["clipped"].min() == 5.0
    assert out["clipped"].max() == 95.0
    mid = out[(out["v"] >= 5) & (out["v"] <= 95)]
    assert (mid["clipped"] == mid["v"]).all()


def test_cms_counts_overestimates_only(ray_session):
    """CMS estimates are >= true counts, exact when no collision."""
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.stats import cms_counts

    df = pd.DataFrame({"text": ["a a a b", "b c", "a c c"]})
    out = cms_counts(
        rd.from_pandas(df).repartition(2),
        lambda b: [w for t in b.column("text").to_pylist() for w in t.split()],
        terms=("a", "b", "c", "zzz"),
        width=512,
        depth=4,
    ).to_pandas().set_index("term")["est"]
    true = {"a": 4, "b": 2, "c": 3, "zzz": 0}
    for t, n in true.items():
        assert out[t] >= n
    # 8 distinct tokens in 512*4 cells: no collision expected
    assert out.to_dict() == true


def test_zscore_outliers_flags_extreme(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.stats import zscore_outliers

    # group a: 40 values at ~10, one at 1000 (clear >3 sigma)
    df = pd.DataFrame(
        {
            "id": range(41),
            "g": ["a"] * 41,
            "x": pd.Series([10, 11, 9, 10] * 10 + [1000], dtype="int64"),
        }
    )
    out = zscore_outliers(
        rd.from_pandas(df).repartition(3), by="g", value="x", id_col="id"
    ).to_pandas()
    assert out["id"].tolist() == [40]


def test_group_regression_exact(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.stats import group_regression

    df = pd.DataFrame(
        {
            "g": ["a", "a", "a", "b", "b"],
            "x": [0, 1, 2, 5, 5],
            "y": [0, 2, 4, 7, 9],
        }
    )
    out = (
        group_regression(rd.from_pandas(df), by="g", x="x", y="y")
        .to_pandas()
        .set_index("g")
        .sort_index()
    )
    # group a: perfect y = 2x -> slope 12/6, intercept 0/6
    assert out.loc["a", "slope_num"] == 12 and out.loc["a", "slope_den"] == 6
    assert out.loc["a", "intercept_num"] == 0
    # group b: constant x -> degenerate fit emitted with den 0
    assert out.loc["b", "slope_den"] == 0 and out.loc["b", "n"] == 2

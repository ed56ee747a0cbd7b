"""Ordered joins: as-of join and range join (ops/joins)."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from reffy_ray.ops.joins import asof_join, range_join


def _left():
    return rd.from_arrow(
        pa.table(
            {
                "event_id": [1, 2, 3, 4],
                "user_id": [10, 10, 20, 30],
                "ts": [5, 9, 4, 7],
            }
        )
    )


def _right():
    return rd.from_arrow(
        pa.table(
            {
                "click_id": [100, 101, 102],
                "user_id": [10, 10, 20],
                "ts": [4, 6, 9],
            }
        )
    )


def test_asof_backward_with_misses(ray_session):
    out = (
        asof_join(_left(), _right(), on="ts", by="user_id")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["click_id_r"].tolist() == [100, 101, pd.NA, pd.NA]
    assert out["ts_r"].tolist() == [4, 6, pd.NA, pd.NA]
    # left columns keep exact integer dtype through the padded union
    assert str(out["event_id"].dtype) == "Int64"
    assert out["event_id"].tolist() == [1, 2, 3, 4]


def test_asof_forward_direction(ray_session):
    out = (
        asof_join(_left(), _right(), on="ts", by="user_id", direction="forward")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # user 10 ts=5 -> next click at 6; ts=9 -> none after
    assert out["click_id_r"].tolist() == [101, pd.NA, 102, pd.NA]


def test_asof_stable_under_block_layout(ray_session):
    a = asof_join(_left(), _right(), on="ts", by="user_id").to_pandas()
    b = asof_join(
        _left().repartition(3), _right().repartition(2), on="ts", by="user_id"
    ).to_pandas()
    key = ["event_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_asof_exact_match_allowed(ray_session):
    left = rd.from_arrow(
        pa.table({"i": [1], "user_id": [10], "ts": [6]})
    )
    out = asof_join(left, _right(), on="ts", by="user_id").to_pandas()
    assert out["click_id_r"].tolist() == [101]  # ts 6 == click ts 6


def test_range_join_containment(ray_session):
    li = rd.from_arrow(
        pa.table({"k": [1, 1, 2], "x": [5, 20, 3], "lid": [1, 2, 3]})
    )
    iv = rd.from_arrow(
        pa.table({"k": [1, 1, 2], "lo": [0, 10, 5], "hi": [6, 30, 9], "ivid": [7, 8, 9]})
    )
    out = (
        range_join(li, iv, by="k", left_on="x", lo="lo", hi="hi")
        .to_pandas()
        .sort_values(["lid", "ivid"])
        .reset_index(drop=True)
    )
    assert list(zip(out["lid"], out["ivid"])) == [(1, 7), (2, 8)]
    assert str(out["lid"].dtype) == "Int64"


def test_range_join_overlapping_intervals_fan_out(ray_session):
    li = rd.from_arrow(pa.table({"k": [1], "x": [5], "lid": [1]}))
    iv = rd.from_arrow(
        pa.table({"k": [1, 1], "lo": [0, 4], "hi": [10, 6], "ivid": [7, 8]})
    )
    out = range_join(li, iv, by="k", left_on="x", lo="lo", hi="hi").to_pandas()
    assert sorted(out["ivid"]) == [7, 8]  # one left row pairs with both


def test_range_join_no_right_rows_for_key(ray_session):
    li = rd.from_arrow(pa.table({"k": [1, 9], "x": [5, 5], "lid": [1, 2]}))
    iv = rd.from_arrow(pa.table({"k": [1], "lo": [0], "hi": [10], "ivid": [7]}))
    out = range_join(li, iv, by="k", left_on="x", lo="lo", hi="hi").to_pandas()
    assert out["lid"].tolist() == [1]  # key 9 drops out (inner semantics)


def test_semi_and_anti_join_tiers(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.joins import anti_join, semi_join

    left = rd.from_pandas(pd.DataFrame({
        "k": pd.Series([1, 2, 3, 4, 5], dtype="int64"),
        "v": ["a", "b", "c", "d", "e"],
    })).repartition(3)
    # duplicate keys on the right must not fan out (EXISTS semantics)
    right = rd.from_pandas(pd.DataFrame({
        "k": pd.Series([2, 2, 4, 9], dtype="int64"),
        "junk": [0, 1, 2, 3],
    }))
    for mode in ("shuffle", "broadcast"):
        s = semi_join(left, right, on="k", mode=mode).to_pandas()
        a = anti_join(left, right, on="k", mode=mode).to_pandas()
        assert sorted(s["k"]) == [2, 4], mode
        assert sorted(a["k"]) == [1, 3, 5], mode
        assert set(s.columns) == {"k", "v"}


def test_semi_join_broadcast_cap(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from reffy_ray.ops.joins import semi_join

    left = rd.from_pandas(pd.DataFrame({"k": pd.Series([1], dtype="int64")}))
    right = rd.from_pandas(pd.DataFrame({"k": pd.Series(range(10), dtype="int64")}))
    with pytest.raises(ValueError, match="broadcast side"):
        semi_join(left, right, on="k", mode="broadcast",
                  broadcast_max_keys=5).to_pandas()


def test_bloom_semi_join_superset_of_exact(ray_session):
    """Bloom passers contain every true match; with m >> keys the
    false-positive set is empty at this size."""
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.joins import bloom_semi_join

    probe = pd.DataFrame({"k": list(range(200)), "payload": range(200)})
    build = pd.DataFrame({"bk": [3, 7, 150]})
    out = bloom_semi_join(
        rd.from_pandas(probe).repartition(3),
        rd.from_pandas(build),
        probe_key="k",
        build_key="bk",
        m=16384,
        k_hashes=3,
    ).to_pandas()
    got = set(out["k"])
    assert {3, 7, 150} <= got
    # false positives allowed in principle, but vanishingly unlikely
    # at 3 keys / 16384 bits; determinism matters more than the bound
    assert got == {3, 7, 150}


def test_table_diff_verdicts(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.joins import table_diff

    old = pd.DataFrame({"k": [1, 2, 3], "p": ["a", "b", "c"]})
    new = pd.DataFrame({"k": [2, 3, 4], "p": ["b", "C", "d"]})
    out = (
        table_diff(
            rd.from_pandas(old).repartition(2),
            rd.from_pandas(new).repartition(2),
            key="k",
            payload="p",
        )
        .to_pandas()
        .set_index("k")["status"]
        .to_dict()
    )
    assert out == {1: "removed", 3: "changed", 4: "added"}


def test_last_touch_attribution(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.joins import last_touch_attribution

    T = pd.Timestamp
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "user_id": [7, 7, 7, 8, 8, 9],
            "ts": [
                T("2024-01-01 10:00"),  # click
                T("2024-01-01 11:00"),  # click (the last touch)
                T("2024-01-01 12:00"),  # purchase -> touch 2
                T("2024-01-01 09:00"),  # click, 10 days before
                T("2024-01-11 09:00"),  # purchase -> outside window, -1
                T("2024-01-02 00:00"),  # purchase, user never clicked
            ],
            "event_type": [
                "click", "click", "purchase", "click", "purchase", "purchase",
            ],
            "value": [0.0, 0.0, 10.55, 0.0, 3.99, 1.01],
        }
    )
    out = (
        last_touch_attribution(
            rd.from_pandas(ev), window=pd.Timedelta(days=7)
        )
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert out.loc[3, "touch_event_id"] == 2
    assert out.loc[3, "value_cents"] == 1055
    assert out.loc[5, "touch_event_id"] == -1
    assert out.loc[5, "touch_ts"] == T("1970-01-01")
    assert out.loc[6, "touch_event_id"] == -1


# --- equi_join (hot-key skew split) ---------------------------------


def _skewed_sides():
    # key 7 is hot (6 of 10 left rows); 1/2/3 are cold
    left = rd.from_arrow(
        pa.table(
            {
                "k": [7, 7, 7, 7, 7, 7, 1, 2, 3, 1],
                "lv": list(range(10)),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "k": [7, 1, 2, 9],
                "rv": ["h", "a", "b", "x"],
                "lv": [70, 10, 20, 90],  # collides with left's lv
            }
        )
    )
    return left, right


def _expected():
    l = pd.DataFrame({"k": [7, 7, 7, 7, 7, 7, 1, 2, 3, 1],
                      "lv": list(range(10))})
    r = pd.DataFrame({"k": [7, 1, 2, 9], "rv": ["h", "a", "b", "x"],
                      "lv_r": [70, 10, 20, 90]})
    return (
        l.merge(r, on="k", how="inner")
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )


def _canon(ds):
    return (
        ds.to_pandas()[["k", "lv", "rv", "lv_r"]]
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )


def test_equi_join_hot_and_cold_tiers_match_pandas(ray_session):
    from reffy_ray.ops.joins import equi_join

    left, right = _skewed_sides()
    exp = _expected()[["k", "lv", "rv", "lv_r"]]
    # hot_cap=3 -> key 7 rides the broadcast tier, 1/2/3 the hash join
    got_split = _canon(equi_join(left, right, on="k", hot_cap=3))
    pd.testing.assert_frame_equal(got_split, exp)
    # hot_cap huge -> pure native hash join; identical rows
    left2, right2 = _skewed_sides()
    got_native = _canon(equi_join(left2, right2, on="k", hot_cap=10**9))
    pd.testing.assert_frame_equal(got_native, exp)


def test_equi_join_broadcast_cap_raises(ray_session):
    from reffy_ray.ops.joins import equi_join

    left, right = _skewed_sides()
    try:
        equi_join(left, right, on="k", hot_cap=3, broadcast_max_rows=0)
    except ValueError as e:
        assert "hot keys" in str(e)
    else:
        raise AssertionError("expected ValueError past broadcast cap")


def test_equi_join_all_hot_keys_no_right_match_dropped(ray_session):
    # inner semantics: left key 3 has no right row -> absent; right
    # key 9 has no left row -> absent
    from reffy_ray.ops.joins import equi_join

    left, right = _skewed_sides()
    out = equi_join(left, right, on="k", hot_cap=1).to_pandas()
    assert set(out["k"]) == {7, 1, 2}


def test_equi_join_null_and_string_keys(ray_session):
    # null keys never match (inner semantics) and can't become hot;
    # string keys work through census, both tiers
    from reffy_ray.ops.joins import equi_join

    left = rd.from_arrow(
        pa.table(
            {
                "k": ["a", "a", "a", None, "b", None],
                "lv": [1, 2, 3, 4, 5, 6],
            }
        )
    )
    right = rd.from_arrow(
        pa.table({"k": ["a", "b", None], "rv": [10, 20, 30]})
    )
    out = (
        equi_join(left, right, on="k", hot_cap=3)  # "a" is hot
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    assert list(out["k"]) == ["a", "a", "a", "b"]
    assert list(out["rv"]) == [10, 10, 10, 20]


def test_equi_join_right_fanout_multiplicities(ray_session):
    # two right rows on one hot key and one cold key: inner join
    # multiplies — both tiers must agree with pandas
    from reffy_ray.ops.joins import equi_join

    left = rd.from_arrow(
        pa.table({"k": [7, 7, 7, 1, 1], "lv": [0, 1, 2, 3, 4]})
    )
    right = rd.from_arrow(
        pa.table({"k": [7, 7, 1, 1], "rv": ["a", "b", "c", "d"]})
    )
    exp = (
        pd.DataFrame({"k": [7, 7, 7, 1, 1], "lv": [0, 1, 2, 3, 4]})
        .merge(pd.DataFrame({"k": [7, 7, 1, 1],
                             "rv": ["a", "b", "c", "d"]}), on="k")
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    got = (
        equi_join(left, right, on="k", hot_cap=3)  # 7 hot, 1 cold
        .to_pandas()[["k", "lv", "rv"]]
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)

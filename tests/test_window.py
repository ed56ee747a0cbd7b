"""Rolling time-window aggregate (ops/window.rolling_agg)."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from reffy_ray.ops.window import rolling_agg


def test_rolling_numeric_ts_boundaries(ray_session):
    # window = 5 (numeric ts): frame is [t-5, t] inclusive both ends
    ds = rd.from_arrow(
        pa.table(
            {
                "k": [1, 1, 1, 1],
                "t": [0, 5, 6, 20],
                "v": [1, 10, 100, 1000],
            }
        )
    )
    out = (
        rolling_agg(ds, by="k", ts="t", value="v", window=5)
        .to_pandas()
        .sort_values("t")
        .reset_index(drop=True)
    )
    # t=5: includes t=0 (exactly t-5) and itself
    assert out["w_sum"].tolist() == [1, 11, 110, 1000]
    assert out["w_count"].tolist() == [1, 2, 2, 1]


def test_rolling_ts_peers_included(ray_session):
    # RANGE frame: rows sharing the current ts are all in the frame,
    # regardless of sort position
    ds = rd.from_arrow(
        pa.table({"k": [1, 1, 1], "t": [3, 3, 3], "v": [1, 2, 4]})
    )
    out = rolling_agg(ds, by="k", ts="t", value="v", window=10).to_pandas()
    assert out["w_sum"].tolist() == [7, 7, 7]
    assert out["w_count"].tolist() == [3, 3, 3]


def test_rolling_timestamp_window(ray_session):
    base = pd.Timestamp("2026-01-01")
    ds = rd.from_arrow(
        pa.table(
            {
                "k": [1, 1, 1],
                "t": pa.array(
                    [base, base + pd.Timedelta(days=3), base + pd.Timedelta(days=9)]
                ),
                "v": [1, 10, 100],
            }
        )
    )
    out = (
        rolling_agg(ds, by="k", ts="t", value="v", window="7 days")
        .to_pandas()
        .sort_values("t")
        .reset_index(drop=True)
    )
    # day 9 window [day2, day9] excludes day 0, includes day 3
    assert out["w_sum"].tolist() == [1, 11, 110]


def test_rolling_stable_under_block_layout(ray_session):
    rows = pa.table(
        {
            "k": [i % 3 for i in range(60)],
            "t": [(i * 7) % 50 for i in range(60)],
            "v": list(range(60)),
        }
    )
    a = (
        rolling_agg(rd.from_arrow(rows), by="k", ts="t", value="v", window=10)
        .to_pandas()
        .sort_values(["k", "t", "v"])
        .reset_index(drop=True)
    )
    b = (
        rolling_agg(
            rd.from_arrow(rows).repartition(7), by="k", ts="t", value="v", window=10
        )
        .to_pandas()
        .sort_values(["k", "t", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_event_gaps_stitches_across_blocks(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.window import event_gaps

    # two users interleaved; shuffled input and a tiny block size force
    # cross-block stitching of both gap and seq
    rows = []
    for u, times in ((7, [10, 25, 25, 90]), (9, [5, 6, 100])):
        for k, t in enumerate(times):
            rows.append((u * 100 + k, t, u))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    out = (
        event_gaps(rd.from_pandas(df).repartition(5))
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    # user 7: ids 700..703 at ts 10,25,25,90 (tie broken by event_id)
    assert out.loc[700].tolist() == [-1, 0]
    assert out.loc[701].tolist() == [15, 1]
    assert out.loc[702].tolist() == [0, 2]
    assert out.loc[703].tolist() == [65, 3]
    # user 9: ids 900..902 at ts 5,6,100
    assert out.loc[900].tolist() == [-1, 0]
    assert out.loc[901].tolist() == [1, 1]
    assert out.loc[902].tolist() == [94, 2]
    assert (out.dtypes == np.int64).all()


def test_event_transitions_across_blocks(ray_session):
    """Boundary stitching: a user's stream split across many blocks
    must count the cross-block adjacency exactly once."""
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.window import event_transitions

    df = pd.DataFrame(
        {
            "user_id": [1] * 6 + [2] * 3,
            "ts": pd.to_datetime(
                [f"2024-01-01 00:0{i}:00" for i in range(6)]
                + [f"2024-01-02 00:0{i}:00" for i in range(3)]
            ),
            "event_id": range(9),
            "event_type": ["a", "b", "a", "b", "c", "c", "x", "y", "x"],
        }
    )
    out = (
        event_transitions(rd.from_pandas(df).repartition(5))
        .to_pandas()
        .set_index(["prev", "next"])["n"]
        .to_dict()
    )
    assert out == {
        ("a", "b"): 2, ("b", "a"): 1, ("b", "c"): 1, ("c", "c"): 1,
        ("x", "y"): 1, ("y", "x"): 1,
    }


def test_user_paths_ordered_concat(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.window import user_paths

    df = pd.DataFrame(
        {
            "user_id": [7, 7, 7, 7, 8],
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
                 "2024-01-01"]
            ),
            "event_id": [4, 3, 2, 1, 9],
            "event_type": ["s", "t", "u", "v", "w"],
        }
    )
    out = (
        user_paths(rd.from_pandas(df).repartition(4))
        .to_pandas()
        .set_index("user_id")
    )
    assert out.loc[7, "path"] == "s>t>u>v"
    assert out.loc[7, "n_events"] == 4
    assert out.loc[8, "path"] == "w"


def test_tumbling_and_hopping_windows(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.window import hopping_agg, tumbling_agg

    HOUR = 3_600_000_000
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:10", "2024-01-01 00:50",
                 "2024-01-01 01:10", "2024-01-01 03:10"]
            ),
            "event_type": ["a", "a", "a", "b"],
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    )
    ds = rd.from_pandas(df).repartition(3)
    tw = (
        tumbling_agg(ds, every_us=HOUR)
        .to_pandas()
        .set_index(["w", "event_type"])
        .sort_index()
    )
    base = int(pd.Timestamp("2024-01-01").value // 1000)
    assert tw.loc[(base, "a"), "n"] == 2
    assert tw.loc[(base, "a"), "cents"] == 300
    assert tw.loc[(base + HOUR, "a"), "n"] == 1
    assert tw.loc[(base + 3 * HOUR, "b"), "cents"] == 400

    # hopping: 1h window, 30min hop -> each event in 2 windows
    hw = hopping_agg(ds, every_us=HOUR, hop_us=HOUR // 2).to_pandas()
    assert hw["n"].sum() == 2 * len(df)
    # the 00:10 event belongs to windows starting 23:30 and 00:00
    w0 = hw[(hw["w"] == base) & (hw["event_type"] == "a")]
    assert w0["n"].iloc[0] == 2  # 00:10 and 00:50 both in [00:00, 01:00)


def test_debounce_events_lag_gap(ray_session):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.window import debounce_events

    # user 1 type a: 00:00, 00:20, 01:30 -> keep 00:00 and 01:30
    # (00:20 within 1h of 00:00; 01:30 is 70min after 00:20 -> kept)
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1],
            "event_type": ["a", "a", "a", "b"],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:20",
                 "2024-01-01 01:30", "2024-01-01 00:05"]
            ),
            "event_id": [0, 1, 2, 3],
        }
    )
    out = debounce_events(rd.from_pandas(df).repartition(3)).to_pandas()
    assert sorted(out["event_id"].tolist()) == [0, 2, 3]


def test_late_events_watermark_and_stitch(ray_session):
    """Watermark lateness under the simulated 2-shard arrival order
    (shard = id % 2, then id), allowed lateness 60us, shuffled input
    split across blocks so the census stitch engages."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.window import late_events

    df = pd.DataFrame(
        {
            "event_id": [700, 701, 702, 703, 705, 900],
            "ts": [100, 50, 200, 40, 180, 5],
            "user_id": [7, 7, 7, 7, 7, 9],
        }
    )
    df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    out = (
        late_events(
            rd.from_pandas(df).repartition(5), shards=2, lateness_us=60
        )
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    # arrival: 700, 702 (shard 0), then 701, 703, 705 (shard 1)
    assert out.loc[700].tolist() == [7, 0, 0, 0]
    assert out.loc[702].tolist() == [7, 1, 0, 0]   # 200 >= wm 40
    assert out.loc[701].tolist() == [7, 2, 1, 90]  # wm 200-60=140, ts 50
    assert out.loc[703].tolist() == [7, 3, 1, 100]  # wm 140, ts 40
    assert out.loc[705].tolist() == [7, 4, 0, 0]   # 180 >= 140: within lateness
    assert out.loc[900].tolist() == [9, 0, 0, 0]   # first arrival never late
    assert (out.dtypes == np.int64).all()


def test_event_pattern_skip_till_next_match(ray_session):
    """Greedy non-overlapping A->B->C instances in id order: the B
    between two As is consumed by the earlier A; events inside a
    completed match never seed a second one."""
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.patterns import event_pattern

    rows = [
        # user 1: view(0) click(1) view(2) purchase(3) view(4) click(5)
        #         purchase(6) -> matches (0,1,3) then (4,5,6)
        (0, 1, "view"), (1, 1, "click"), (2, 1, "view"), (3, 1, "purchase"),
        (4, 1, "view"), (5, 1, "click"), (6, 1, "purchase"),
        # user 2: click before any view -> no match
        (10, 2, "click"), (11, 2, "view"), (12, 2, "purchase"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type"])
    df["ts"] = pd.to_datetime(df["event_id"] * 60, unit="s")
    out = (
        event_pattern(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .sort_values(["user_id", "match_idx"])
        .reset_index(drop=True)
    )
    assert out[["user_id", "match_idx", "a_id", "b_id", "c_id"]].values.tolist() == [
        [1, 0, 0, 1, 3],
        [1, 1, 4, 5, 6],
    ]
    assert out["span_us"].tolist() == [3 * 60_000_000, 2 * 60_000_000]

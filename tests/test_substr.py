"""Substring-level dedup (ops/substr) — suffix-group sharding."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from reffy_ray.ops.substr import (
    duplicated_substrings,
    ngram_doc_table,
    substring_dedup,
)

SHARED = "the quick brown fox jumps over the lazy dog"


def _corpus() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    SHARED + " today",
                    "XX " + SHARED + " YY",
                    "completely unrelated content here with no overlap!",
                    "tiny",
                    "",
                ]
            ),
        }
    )


def _brute_grams(text: str, n: int) -> list[str]:
    return [text[i : i + n] for i in range(len(text) - n + 1)]


def test_ngram_doc_table_matches_bruteforce():
    tbl = _corpus()
    out = ngram_doc_table(tbl, 16).to_pandas()
    for doc_id, text in zip(tbl.column("doc_id").to_pylist(),
                            tbl.column("text").to_pylist()):
        grams = _brute_grams(text, 16)
        mine = out[out["doc_id"] == doc_id]
        expect = pd.Series(grams).value_counts()
        assert dict(zip(mine["gram"], mine["occ"])) == expect.to_dict()
        if grams:
            assert set(mine["total"]) == {len(grams)}


def test_duplicated_substrings_cross_doc_only(ray_session):
    ds = rd.from_arrow(_corpus())
    dup = duplicated_substrings(ds, n=16).to_pandas()
    # every duplicated gram is a window of the shared sentence context
    assert len(dup) > 0
    assert (dup["n_docs"] >= 2).all()
    for g in dup["gram"]:
        assert g in (SHARED + " today") or g in ("XX " + SHARED + " YY")
    # doc 3's unique grams never appear
    assert not dup["gram"].str.contains("unrelated").any()


def test_duplicated_substrings_hash_key_same_groups(ray_session):
    ds = rd.from_arrow(_corpus())
    plain = duplicated_substrings(ds, n=16).to_pandas()
    hashed = duplicated_substrings(ds, n=16, hash_key=True).to_pandas()
    assert len(hashed) == len(plain)
    assert sorted(hashed["n_occ"]) == sorted(plain["n_occ"])


def test_substring_dedup_drops_heavily_shared_docs(ray_session):
    ds = rd.from_arrow(_corpus())
    kept = substring_dedup(ds, n=16, max_dup_frac=0.5).to_pandas()
    # docs 1/2 are ~85% shared windows → dropped; 3 unique, 4/5 too
    # short for any gram → kept
    assert sorted(kept["doc_id"]) == [3, 4, 5]
    assert "text" in kept.columns


def test_substring_dedup_no_dups_keeps_all(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                ["aaaa bbbb cccc dddd eeee", "ffff gggg hhhh iiii jjjj"]
            ),
        }
    )
    kept = substring_dedup(rd.from_arrow(tbl), n=8).to_pandas()
    assert sorted(kept["doc_id"]) == [1, 2]


def test_ngram_doc_table_large_string_offsets():
    # large_string columns carry int64 offsets — must not be misread
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([SHARED, "XX " + SHARED], pa.large_string()),
        }
    )
    out = ngram_doc_table(tbl, 16).to_pandas()
    grams1 = set(out[out["doc_id"] == 1]["gram"])
    assert grams1 == set(_brute_grams(SHARED, 16))


def test_ngram_doc_table_non_ascii_char_semantics():
    # review finding: byte windows crashed on non-ASCII; grams must be
    # CHARACTER windows (SQL substr semantics) on any input
    tbl = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["café au lait — déjà vu", "plain ascii text here"]),
    })
    out = ngram_doc_table(tbl, 5).to_pandas()
    g1 = out[out["doc_id"] == 1]
    assert dict(zip(g1["gram"], g1["occ"])) == {
        g: _brute_grams("café au lait — déjà vu", 5).count(g)
        for g in set(_brute_grams("café au lait — déjà vu", 5))
    }
    # hashed + bucketed variants run too
    hashed = ngram_doc_table(tbl, 5, hash_key=True, num_buckets=8)
    assert hashed.num_rows == out.shape[0]


def test_ngram_doc_table_nul_bytes_not_stripped():
    # review finding: numpy S->U round-trip stripped trailing NULs
    t = "ab\x00cd\x00ef"
    tbl = pa.table({"doc_id": pa.array([1], pa.int64()),
                    "text": pa.array([t])})
    out = ngram_doc_table(tbl, 3).to_pandas()
    assert set(out["gram"]) == set(_brute_grams(t, 3))
    assert all(len(g) == 3 for g in out["gram"])

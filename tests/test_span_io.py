"""Span-table I/O: Lance-gated storage with Parquet fallback."""

import pyarrow as pa
import pytest
import ray.data as rd

from reffy_ray.schemas import SPAN_STRUCT
from reffy_ray.sources.span_io import (
    lance_available,
    read_span_table,
    write_span_table,
)


def _span_ds():
    tbl = pa.table(
        {
            "doc_id": pa.array(["a", "b"], pa.string()),
            "spans": pa.array(
                [
                    [{"kind": "text", "text": "hi", "media_ref": None, "offset": 0}],
                    [
                        {"kind": "media", "text": None,
                         "media_ref": "https://img.example.org/x.png", "offset": 0},
                        {"kind": "text", "text": "cap", "media_ref": None, "offset": 1},
                    ],
                ],
                pa.list_(SPAN_STRUCT),
            ),
        }
    )
    return rd.from_arrow(tbl)


def test_parquet_roundtrip(ray_session, tmp_path):
    p = str(tmp_path / "spans_pq")
    fmt = write_span_table(_span_ds(), p, format="auto")
    if not lance_available():
        assert fmt == "parquet"
    back = read_span_table(p).to_pandas().sort_values("doc_id")
    assert list(back["doc_id"]) == ["a", "b"]
    assert back.iloc[1]["spans"][0]["media_ref"].startswith("https://img")
    # column projection at the read
    only_ids = read_span_table(p, columns=["doc_id"])
    assert only_ids.schema().names == ["doc_id"]


def test_lance_requires_package(ray_session, tmp_path):
    if lance_available():
        pytest.skip("lance installed; gated-error path not reachable")
    with pytest.raises(ImportError, match="lance"):
        write_span_table(_span_ds(), str(tmp_path / "x"), format="lance")
    with pytest.raises(ImportError, match="lance"):
        read_span_table(str(tmp_path / "y.lance"))


@pytest.mark.skipif(not lance_available(), reason="lance not installed")
def test_lance_roundtrip(ray_session, tmp_path):
    p = str(tmp_path / "spans.lance")
    assert write_span_table(_span_ds(), p, format="auto") == "lance"
    back = read_span_table(p).to_pandas().sort_values("doc_id")
    assert list(back["doc_id"]) == ["a", "b"]

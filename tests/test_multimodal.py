"""Multimodal plumbing stages: frame fan-out and the resize actor."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reffy_ray.ops.multimodal import (
    MediaDecoder,
    MediaResizer,
    sample_frames,
    synth_media_batch,
)


def test_sample_frames_expansion(ray_session):
    ds = rd.from_arrow(
        pa.table(
            {
                "media_id": ["a", "b", "c", "d"],
                "duration_ms": [0, 499, 1000, 100_000],
            }
        )
    )
    out = sample_frames(ds, step_ms=500, max_frames=8).to_pandas()
    by = {m: g for m, g in out.groupby("media_id")}
    assert "a" not in by  # zero duration: no frames
    assert by["b"]["ts_ms"].tolist() == [0]
    assert by["c"]["ts_ms"].tolist() == [0, 500, 1000]
    assert len(by["d"]) == 8  # capped
    assert by["d"]["frame_idx"].tolist() == list(range(8))
    assert (out["ts_ms"] == out["frame_idx"] * 500).all()


def test_media_resizer_aspect_fit(ray_session):
    media = synth_media_batch(9)
    imgs = media.filter(
        pa.compute.equal(media.column("kind"), pa.scalar("image"))
    )
    out = (
        rd.from_arrow(imgs)
        .map_batches(MediaResizer, fn_constructor_kwargs={"max_w": 64, "max_h": 48},
                     concurrency=1, batch_size=8, batch_format="pyarrow")
        .to_pandas()
    )
    assert (out["out_width"] <= 64).all() and (out["out_height"] <= 48).all()
    # aspect preserved within integer floor: w/h ratio error < 1 pixel step
    src = imgs.to_pandas().set_index("media_id")
    for _, r in out.iterrows():
        w, h = src.loc[r["media_id"], ["width", "height"]]
        assert abs(r["out_width"] * h - r["out_height"] * w) <= max(w, h)
    # deterministic stub payload
    assert out["payload"].map(len).eq(32).all()


def test_media_resizer_real_path_raises_for_compressed():
    r = MediaResizer(fake=False)
    with pytest.raises(NotImplementedError):
        r._resample(b"\x89PNG...", 10, 10)


def test_media_resizer_real_pnm_nearest_neighbor():
    from reffy_ray.ops.codecs import decode_pnm, encode_pnm

    arr = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(6, 8, 3)
    out = MediaResizer(fake=False)._resample(encode_pnm(arr), 4, 3)
    got = decode_pnm(out)
    assert got.shape == (3, 4, 3)
    # nearest-neighbor index sampling: rows 0,2,4 / cols 0,2,4,6
    assert np.array_equal(got, arr[[0, 2, 4]][:, [0, 2, 4, 6]])


def test_codecs_roundtrip():
    from reffy_ray.ops.codecs import (
        decode_pnm, decode_wav, encode_pnm, encode_wav,
    )

    rgb = np.random.default_rng(7).integers(0, 256, (12, 16, 3), dtype=np.uint8)
    assert np.array_equal(decode_pnm(encode_pnm(rgb)), rgb)
    gray = rgb[:, :, 0]
    assert np.array_equal(decode_pnm(encode_pnm(gray)), gray)
    # PNM comments and multi-whitespace headers parse too
    hand = b"P5\n# a comment\n 4  2 \n255\n" + bytes(range(8))
    assert decode_pnm(hand).shape == (2, 4)

    pcm = (np.random.default_rng(9).integers(-32768, 32768, 500)
           .astype(np.int16))
    rate, got = decode_wav(encode_wav(pcm, 8000))
    assert rate == 8000 and np.array_equal(got, pcm)
    # stdlib wave agrees with the hand-rolled RIFF parser
    import io
    import wave

    with wave.open(io.BytesIO(encode_wav(pcm, 8000))) as wf:
        assert wf.getframerate() == 8000
        assert np.array_equal(
            np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2"), pcm
        )


def test_media_decoder_real_pnm_wav_features():
    from reffy_ray.ops.codecs import encode_pnm, encode_wav

    d = MediaDecoder(fake=False)
    arr = np.full((2, 3, 3), 9, dtype=np.uint8)
    arr[0, 0, 0], arr[1, 2, 2] = 4, 250
    f = d._decode(encode_pnm(arr), "image")
    assert f.tolist() == [3.0, 2.0, 3.0, 6.0, 4.0, 250.0, 4.0, 250.0]
    pcm = np.array([-5, 0, 7, 32000], dtype=np.int16)
    f = d._decode(encode_wav(pcm, 16000), "audio")
    assert f.tolist() == [16000.0, 0.0, 1.0, 4.0, -5.0, 32000.0, -5.0, 32000.0]
    with pytest.raises(NotImplementedError):
        d._decode(b"\x00\x01compressed", "video")


def test_media_decoder_fake_features_deterministic():
    d = MediaDecoder(fake=True)
    f1 = d._decode(b"payload", "image")
    f2 = d._decode(b"payload", "image")
    assert np.array_equal(f1, f2)
    assert f1.dtype == np.float32 and len(f1) == 8


def _span(kind, text="", media_ref="", offset=0):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def _doc_table(rows):
    from reffy_ray.schemas import SPAN_STRUCT

    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "spans": pa.array([r[1] for r in rows], pa.list_(SPAN_STRUCT)),
        }
    )


def test_pack_interleaved_greedy_budget():
    from reffy_ray.ops.multimodal import pack_interleaved

    spans = [
        _span("title", "Doc 1", offset=0),          # cost 1
        _span("prose", "a b c d e", offset=1),       # cost 5
        _span("figure", "Fig", "u://x.png", offset=2),  # cost 64 (media)
        _span("heading", "{}", offset=3),            # cost 1
    ]
    out = pack_interleaved(_doc_table([("d1", spans)]), budget=8, media_cost=64)
    df = out.to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    # chunk 0: title+prose (1+5=6 ≤ 8); chunk 1: oversized figure alone;
    # chunk 2: trailing heading (figure filled its chunk past budget)
    assert df["chunk_idx"].tolist() == [0, 1, 2]
    assert df["n_spans"].tolist() == [2, 1, 1]
    assert df["n_tokens"].tolist() == [6, 64, 1]
    assert df["n_media"].tolist() == [0, 1, 0]


def test_pack_interleaved_never_splits_and_orders():
    from reffy_ray.ops.multimodal import pack_interleaved

    spans = [_span("prose", "w " * 10, offset=i) for i in range(5)]  # cost 10 each
    out = pack_interleaved(_doc_table([("d2", spans)]), budget=25, media_cost=64)
    df = out.to_pandas().sort_values("chunk_idx").reset_index(drop=True)
    # 10+10 = 20 fits, +10 would be 30 > 25 → chunks of 2,2,1
    assert df["n_spans"].tolist() == [2, 2, 1]
    assert df["n_tokens"].sum() == 50
    assert df["chunk_idx"].tolist() == [0, 1, 2]


def test_pack_interleaved_empty_doc_emits_nothing():
    from reffy_ray.ops.multimodal import pack_interleaved

    out = pack_interleaved(_doc_table([("d3", [])]), budget=8)
    assert out.num_rows == 0


def test_media_text_pairs_nearest_preceding_context():
    from reffy_ray.ops.multimodal import media_text_pairs

    spans = [
        _span("title", "T", offset=0),
        _span("figure", "cap0", "u://0.png", offset=1),   # before any prose → title
        _span("prose", "ctx one", offset=2),
        _span("figure", "cap1", "u://1.png", offset=3),   # → ctx one
        _span("prose", "ctx two", offset=4),
        _span("heading", "{}", offset=5),
        _span("image", "cap2", "u://2.png", offset=6),    # → ctx two (heading ignored)
        _span("figure", "nope", "", offset=7),            # no media_ref → dropped
    ]
    df = media_text_pairs(_doc_table([("d", spans)])).to_pandas()
    assert df["media_ref"].tolist() == ["u://0.png", "u://1.png", "u://2.png"]
    assert df["context"].tolist() == ["T", "ctx one", "ctx two"]
    assert df["caption"].tolist() == ["cap0", "cap1", "cap2"]


def test_span_runs_rle():
    from reffy_ray.ops.multimodal import span_runs

    spans7 = [
        _span("prose", offset=0), _span("prose", offset=1),
        _span("figure", "c", "u://a.png", offset=2),
        _span("prose", offset=3),
    ]
    spans9 = [_span("heading", offset=0)]
    df = span_runs(_doc_table([("7", spans7), ("9", spans9), ("11", [])])).to_pandas()
    assert df.values.tolist() == [
        [7, 0, "prose", 0, 2],
        [7, 1, "figure", 2, 1],
        [7, 2, "prose", 3, 1],
        [9, 0, "heading", 0, 1],
    ]
    # empty batch
    assert span_runs(_doc_table([])).num_rows == 0


def test_span_sections_heading_segments():
    from reffy_ray.ops.multimodal import span_sections

    spans = [
        _span("title", offset=0),                      # section 0
        _span("heading", offset=1),                    # opens section 1
        _span("prose", offset=2),
        _span("figure", "c", "u://a.png", offset=3),
        _span("heading", offset=4),                    # opens section 2
        _span("image", "c", "u://b.png", offset=5),
    ]
    df = span_sections(_doc_table([("7", spans), ("9", [_span("prose")])])).to_pandas()
    assert df.values.tolist() == [
        [7, 0, 1, 0, 0],
        [7, 1, 3, 1, 1],
        [7, 2, 2, 1, 4],
        [9, 0, 1, 0, 0],
    ]


def test_pnm_rejects_crlf_and_truncation():
    # out-of-spec CRLF after maxval must fail loudly (a silent decode
    # would shift every pixel by one byte); truncation names the sizes
    import numpy as np
    import pytest as _pytest

    from reffy_ray.ops.codecs import decode_pnm, encode_pnm

    good = encode_pnm(np.arange(6, dtype=np.uint8).reshape(2, 3))
    assert decode_pnm(good).shape == (2, 3)
    crlf = good.replace(b"255\n", b"255\r\n", 1)
    with _pytest.raises(ValueError, match="CRLF"):
        decode_pnm(crlf)
    with _pytest.raises(ValueError, match="truncated PNM raster"):
        decode_pnm(good[:-2])


def test_media_dedup_groups_identical_payloads(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from reffy_ray.ops.multimodal import MEDIA_SCHEMA, media_dedup

    rows = [
        {"media_id": "b", "kind": "image", "payload": b"\x01\x02",
         "mime": "x", "width": 1, "height": 1, "duration_ms": 0},
        {"media_id": "a", "kind": "image", "payload": b"\x01\x02",
         "mime": "x", "width": 1, "height": 1, "duration_ms": 0},
        {"media_id": "c", "kind": "audio", "payload": b"\x03",
         "mime": "x", "width": 0, "height": 0, "duration_ms": 1},
    ]
    media = rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))
    out = media_dedup(media).to_pandas().set_index("media_id")
    assert out.loc["a", "canonical_id"] == "a"
    assert out.loc["b", "canonical_id"] == "a"  # min id wins
    assert out.loc["b", "group_size"] == 2
    assert out.loc["c", "canonical_id"] == "c"
    assert out.loc["c", "group_size"] == 1


# --- PNG codec (round 5: first compressed format with a real path) --------


def _forward_filter(arr: np.ndarray, ftype: int) -> bytes:
    """Reference forward PNG filtering (spec §9) to craft test streams
    exercising every unfilter branch."""
    a = arr.reshape(arr.shape[0], -1).astype(np.int64)
    h, stride = a.shape
    bpp = arr.shape[2] if arr.ndim == 3 else 1
    out = bytearray()
    for y in range(h):
        out.append(ftype)
        for i in range(stride):
            x = a[y, i]
            left = a[y, i - bpp] if i >= bpp else 0
            up = a[y - 1, i] if y else 0
            ul = a[y - 1, i - bpp] if (y and i >= bpp) else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:  # Paeth
                p = left + up - ul
                pa_, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa_ <= pb and pa_ <= pc) else (
                    up if pb <= pc else ul
                )
            out.append((x - pred) & 0xFF)
    return bytes(out)


def _png_from_raw(raw: bytes, w: int, h: int, color: int,
                  plte: bytes | None = None) -> bytes:
    import struct
    import zlib

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    body = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte is not None:
        body += chunk(b"PLTE", plte)
    return body + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def test_png_roundtrip_all_shapes():
    from reffy_ray.ops.codecs import decode_png, encode_png

    rng = np.random.default_rng(7)
    for shape in [(5, 9), (6, 4, 2), (7, 3, 3), (4, 8, 4)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(arr)), arr), shape


def test_png_every_filter_type_decodes():
    from reffy_ray.ops.codecs import decode_png

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    for ftype in range(5):
        png = _png_from_raw(_forward_filter(arr, ftype), 7, 9, color=2)
        assert np.array_equal(decode_png(png), arr), f"filter {ftype}"


def test_png_palette_expansion():
    from reffy_ray.ops.codecs import decode_png

    plte = bytes([10, 20, 30, 200, 100, 0])  # two entries
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    png = _png_from_raw(_forward_filter(idx, 0), 2, 2, color=3, plte=plte)
    got = decode_png(png)
    assert got.shape == (2, 2, 3)
    assert got[0, 0].tolist() == [10, 20, 30]
    assert got[0, 1].tolist() == [200, 100, 0]


def test_png_rejects_bad_crc_truncation_and_16bit():
    import struct
    import zlib

    from reffy_ray.ops.codecs import decode_png, encode_png

    good = encode_png(np.zeros((3, 3), np.uint8))
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # flip a bit inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad_crc))
    with pytest.raises(ValueError):
        decode_png(good[:20])
    # 16-bit now DECODES (round-5 extension); sub-byte depths reject
    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    p16 = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
           + chunk(b"IEND", b""))
    assert decode_png(p16).dtype == np.uint16
    ihdr4 = struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0)
    p4 = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr4)
          + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
          + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="8/16-bit"):
        decode_png(p4)


def test_media_decoder_real_png_features():
    from reffy_ray.ops.codecs import encode_png
    from reffy_ray.ops.multimodal import MediaDecoder

    i = 3  # synth rule: pix = (i + y + x + c) % 256, w=28, h=24
    w, h = 16 + (i % 8) * 4, 12 + (i % 5) * 4
    y, x, c = np.ogrid[0:h, 0:w, 0:3]
    png = encode_png(((i + y + x + c) % 256).astype(np.uint8))
    batch = pa.table({
        "media_id": ["p0"], "kind": ["image"],
        "payload": pa.array([png], pa.binary()),
    })
    out = MediaDecoder(fake=False)(batch)
    assert out.column("decode_status").to_pylist() == ["ok"]
    feat = out.column("feature").to_pylist()[0]
    assert feat[:4] == [w, h, 3, w * h]
    assert feat[4] == i  # v_first = pix(0,0,0)
    assert feat[7] == min(255, i + (h - 1) + (w - 1) + 2)  # v_max


def test_media_resizer_real_png_nearest_neighbor():
    from reffy_ray.ops.codecs import decode_png, encode_png

    arr = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(6, 8, 3)
    out = MediaResizer(fake=False)._resample(encode_png(arr), 4, 3)
    got = decode_png(out)
    assert np.array_equal(got, arr[[0, 2, 4]][:, [0, 2, 4, 6]])


def test_synth_media_batch_real_mixes_png_and_pnm(ray_session):
    from reffy_ray.ops.multimodal import MediaDecoder, synth_media_batch_real

    tbl = synth_media_batch_real(24)
    mimes = {r["mime"] for r in tbl.to_pylist() if r["kind"] == "image"}
    assert mimes == {"image/png", "image/x-portable-pixmap"}
    out = MediaDecoder(fake=False)(tbl)
    by_kind = {}
    for r in out.to_pylist():
        by_kind.setdefault(r["kind"], set()).add(r["decode_status"])
    assert by_kind["image"] == {"ok"}  # both formats decode for real
    assert by_kind["audio"] == {"ok"}
    assert by_kind["video"] == {"ok"}  # ISO-BMFF metadata probe


def test_png_adam7_interlace_decodes():
    import struct
    import zlib

    from reffy_ray.ops.codecs import decode_png

    rng = np.random.default_rng(13)
    # deliberately awkward dims (not multiples of 8)
    arr = rng.integers(0, 256, size=(11, 13, 3), dtype=np.uint8)
    h, w = arr.shape[:2]
    # forward Adam7: concat each pass's filter-0 scanlines
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = arr[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw.append(0)
            raw.extend(row.tobytes())

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # interlace=1
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png), arr)
    # gray variant exercises bpp=1 scatter
    g = rng.integers(0, 256, size=(9, 5), dtype=np.uint8)
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = g[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw.append(0)
            raw.extend(row.tobytes())
    ihdr = struct.pack(">IIBBBBB", 5, 9, 8, 0, 0, 0, 1)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png), g)


# --- JPEG codec (round 5: baseline sequential DCT) ------------------------


def test_jpeg_roundtrip_error_bounds():
    from reffy_ray.ops.codecs import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(17)
    # smooth gradient + mild noise (JPEG-friendly content)
    y, x = np.mgrid[0:24, 0:33]
    base = (y * 3 + x * 2) % 200 + 20
    for shape_mod in ("gray", "rgb"):
        if shape_mod == "gray":
            arr = (base + rng.integers(-5, 6, base.shape)).clip(
                0, 255).astype(np.uint8)
        else:
            arr = np.stack(
                [(base + 10 * c + rng.integers(-5, 6, base.shape))
                 .clip(0, 255) for c in range(3)], axis=-1
            ).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(arr, quality=95))
        assert out.shape == arr.shape
        err = np.abs(out.astype(np.int64) - arr.astype(np.int64))
        assert err.mean() < 4.0, (shape_mod, err.mean())
        assert err.max() <= 32, (shape_mod, err.max())


def test_jpeg_quality_monotonic_and_deterministic():
    from reffy_ray.ops.codecs import decode_jpeg, encode_jpeg

    y, x = np.mgrid[0:16, 0:16]
    arr = ((y * 7 + x * 5) % 256).astype(np.uint8)
    lo = encode_jpeg(arr, quality=30)
    hi = encode_jpeg(arr, quality=95)
    err_lo = np.abs(decode_jpeg(lo).astype(int) - arr).mean()
    err_hi = np.abs(decode_jpeg(hi).astype(int) - arr).mean()
    assert err_hi <= err_lo
    assert encode_jpeg(arr, quality=95) == hi  # bit-deterministic


def test_jpeg_rejects_progressive_and_garbage():
    from reffy_ray.ops.codecs import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01")
    good = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    # flip SOF0 (0xC0) to SOF2 (0xC2 progressive) → loud reject
    idx = good.find(b"\xff\xc0")
    good[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg(bytes(good))


def test_media_decoder_and_resizer_real_jpeg():
    from reffy_ray.ops.codecs import decode_jpeg, encode_jpeg
    from reffy_ray.ops.multimodal import MediaDecoder

    y, x = np.mgrid[0:24, 0:32]
    arr = np.stack([(y * 4 + x * 3 + 40 * c) % 256 for c in range(3)],
                   axis=-1).astype(np.uint8)
    jpg = encode_jpeg(arr, quality=95)
    batch = pa.table({
        "media_id": ["j0"], "kind": ["image"],
        "payload": pa.array([jpg], pa.binary()),
    })
    out = MediaDecoder(fake=False)(batch)
    assert out.column("decode_status").to_pylist() == ["ok"]
    feat = out.column("feature").to_pylist()[0]
    assert feat[:4] == [32, 24, 3, 32 * 24]
    # resizer: decode→nearest-neighbor→re-encode stays a valid JPEG
    res = MediaResizer(max_w=16, max_h=16, fake=False)
    small = res._resample(jpg, 16, 12)
    got = decode_jpeg(small)
    assert got.shape == (12, 16, 3)


def test_jpeg_420_subsampled_stream_decodes():
    """Hand-rolled 4:2:0 interleaved stream (2x2 Y blocks + 1 Cb + 1
    Cr per MCU) exercises the sampling-factor upsample path the
    4:4:4 encoder never emits."""
    import struct

    from reffy_ray.ops.codecs import (
        _DCT_C, _ZIGZAG, _BitWriter, _csize, _enc_codes, _enc_tables,
        decode_jpeg,
    )

    h = w = 16
    y_img = np.full((16, 16), 100.0)
    y_img[:8, :8] = 60.0  # quadrant structure survives round-trip
    cb = np.full((8, 8), 90.0)   # downsampled planes (constant)
    cr = np.full((8, 8), 160.0)

    qt = np.ones((8, 8))  # flat quant: near-lossless

    def blocks_of(plane, nby, nbx):
        return (plane.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
                .reshape(-1, 8, 8))

    def qcoef(block):
        f = _DCT_C @ (block - 128.0) @ _DCT_C.T
        return np.round(f / qt).astype(np.int64).reshape(64)[_ZIGZAG]

    (dcb, dcv), (acb, acv) = _enc_tables()
    dc_codes, ac_codes = _enc_codes(dcb, dcv), _enc_codes(acb, acv)
    bw = _BitWriter()
    preds = {"y": 0, "cb": 0, "cr": 0}

    def put_block(zz, key):
        diff = int(zz[0]) - preds[key]
        preds[key] = int(zz[0])
        size = _csize(diff)
        bw.put(*dc_codes[size])
        if size:
            bw.put(size, diff if diff >= 0 else diff + (1 << size) - 1)
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        run = 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                bw.put(*ac_codes[0xF0]); run -= 16
            s = _csize(v)
            bw.put(*ac_codes[(run << 4) | s])
            bw.put(s, v if v >= 0 else v + (1 << s) - 1)
            run = 0
        if last < 63:
            bw.put(*ac_codes[0x00])

    # ONE MCU: Y blocks in raster order then Cb, Cr
    for blk in blocks_of(y_img, 2, 2):
        put_block(qcoef(blk), "y")
    put_block(qcoef(cb), "cb")
    put_block(qcoef(cr), "cr")
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    zzq = np.ones(64, np.uint8)
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + zzq.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, 0x22, 0])  # Y: 2x2 sampling
    sof += bytes([2, 0x11, 0])
    sof += bytes([3, 0x11, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dcb) + dcv)
    out += seg(0xC4, bytes([0x10]) + bytes(acb) + acv)
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00])
               + b"\x00\x3f\x00")
    out += bw.out + b"\xff\xd9"

    got = decode_jpeg(bytes(out))
    assert got.shape == (16, 16, 3)
    # quadrant luma structure survives (dark top-left)
    assert got[:8, :8].mean() < got[8:, 8:].mean() - 20
    # constant chroma ⇒ low spatial variance in color channels
    assert got[..., 0].std() > 5  # luma structure present


def test_jpeg_restart_markers_decode():
    """DRI/RSTn path: 4 MCUs with a restart interval of 2 — DC
    predictors must reset at each RST boundary."""
    import struct

    from reffy_ray.ops.codecs import (
        _DCT_C, _ZIGZAG, _BitWriter, _csize, _enc_codes, _enc_tables,
        decode_jpeg,
    )

    # 8x32 grayscale: 4 blocks with distinct flat levels
    levels = [40, 90, 150, 210]
    arr = np.concatenate(
        [np.full((8, 8), v, np.uint8) for v in levels], axis=1
    )
    qt = np.ones((8, 8))
    (dcb, dcv), (acb, acv) = _enc_tables()
    dc_codes, ac_codes = _enc_codes(dcb, dcv), _enc_codes(acb, acv)

    def block_bits(bw, blk, pred):
        f = _DCT_C @ (blk.astype(np.float64) - 128.0) @ _DCT_C.T
        zz = np.round(f / qt).astype(np.int64).reshape(64)[_ZIGZAG]
        diff = int(zz[0]) - pred
        size = _csize(diff)
        bw.put(*dc_codes[size])
        if size:
            bw.put(size, diff if diff >= 0 else diff + (1 << size) - 1)
        bw.put(*ac_codes[0x00])  # flat block: EOB immediately
        return int(zz[0])

    # entropy data: 2 MCUs, RST0, 2 MCUs — predictors reset after RST
    chunks = []
    pred = 0
    bw = _BitWriter()
    for i in range(4):
        if i == 2:
            bw.flush()
            chunks.append(bytes(bw.out))
            bw = _BitWriter()
            pred = 0  # predictor reset at restart
        pred = block_bits(bw, arr[:, 8 * i:8 * i + 8], pred)
    bw.flush()
    chunks.append(bytes(bw.out))
    entropy = chunks[0] + b"\xff\xd0" + chunks[1]

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + np.ones(64, np.uint8).tobytes())
    out += seg(0xC0, struct.pack(">BHHB", 8, 8, 32, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(dcb) + dcv)
    out += seg(0xC4, bytes([0x10]) + bytes(acb) + acv)
    out += seg(0xDD, struct.pack(">H", 2))  # restart interval 2
    out += seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    out += entropy + b"\xff\xd9"

    got = decode_jpeg(bytes(out))
    assert got.shape == (8, 32)
    for i, v in enumerate(levels):
        assert abs(int(got[:, 8 * i:8 * i + 8].mean()) - v) <= 2, (i, v)


def test_jpeg_nonflat_quant_table_dequantizes_correctly():
    """Review regression: zigzag-order coefficients must be multiplied
    by the ZIGZAG-permuted quant table. A single known coefficient at
    zigzag position 2 (natural index 8, i.e. q=9 under q[n]=n+1) must
    reconstruct v*q[8], not v*q[2]."""
    import struct

    from reffy_ray.ops.codecs import (
        _DCT_C, _ZIGZAG, _BitWriter, _csize, _enc_codes, _enc_tables,
        decode_jpeg,
    )

    qnat = (np.arange(64, dtype=np.float64) + 1).reshape(8, 8)
    coef_zz = np.zeros(64, np.int64)
    coef_zz[0] = 0
    coef_zz[2] = 10  # natural index _ZIGZAG[2] = 8 → quant 9
    (dcb, dcv), (acb, acv) = _enc_tables()
    dc_codes, ac_codes = _enc_codes(dcb, dcv), _enc_codes(acb, acv)
    bw = _BitWriter()
    bw.put(*dc_codes[0])
    bw.put(*ac_codes[(1 << 4) | _csize(10)])  # run 1, then value 10
    bw.put(_csize(10), 10)
    bw.put(*ac_codes[0x00])
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    zzq = qnat.reshape(64)[_ZIGZAG].astype(np.uint8)
    png = bytearray(b"\xff\xd8")
    png += seg(0xDB, bytes([0]) + zzq.tobytes())
    png += seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    png += seg(0xC4, bytes([0x00]) + bytes(dcb) + dcv)
    png += seg(0xC4, bytes([0x10]) + bytes(acb) + acv)
    png += seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    png += bw.out + b"\xff\xd9"
    got = decode_jpeg(bytes(png)).astype(np.float64)

    # reference reconstruction with the CORRECT dequant (natural-order
    # block, coefficient 10*9=90 at natural index 8)
    blk = np.zeros(64, np.float64)
    blk[8] = 10 * 9
    want = np.clip(
        np.round(_DCT_C.T @ blk.reshape(8, 8) @ _DCT_C) + 128, 0, 255
    )
    assert np.array_equal(got, want.astype(np.uint8))


def test_media_decoder_corrupt_payload_yields_error_row():
    from reffy_ray.ops.codecs import encode_jpeg, encode_png
    from reffy_ray.ops.multimodal import MediaDecoder, MediaResizer

    good_png = encode_png(np.zeros((4, 4), np.uint8))
    bad_png = good_png[:-7] + b"\x00" * 7          # CRC mismatch
    bad_jpeg = encode_jpeg(np.zeros((8, 8), np.uint8))[:20]  # truncated
    batch = pa.table({
        "media_id": ["a", "b", "c"],
        "kind": ["image", "image", "image"],
        "payload": pa.array([good_png, bad_png, bad_jpeg], pa.binary()),
    })
    out = MediaDecoder(fake=False)(batch)
    assert out.column("decode_status").to_pylist() == ["ok", "error",
                                                      "error"]
    # resizer: corrupt payloads pass through unchanged, task survives
    batch2 = pa.table({
        "media_id": ["a", "b"], "kind": ["image", "image"],
        "payload": pa.array([good_png, bad_png], pa.binary()),
        "width": pa.array([4, 4], pa.int32()),
        "height": pa.array([4, 4], pa.int32()),
    })
    res = MediaResizer(max_w=2, max_h=2, fake=False)(batch2)
    assert res.column("payload").to_pylist()[1] == bad_png


def test_jpeg_multiscan_rejected():
    import struct

    from reffy_ray.ops.codecs import decode_jpeg, encode_jpeg

    good = encode_jpeg(np.zeros((8, 8, 3), np.uint8))
    # rewrite the SOS header to claim a single-component scan of a
    # 3-component file (a per-component scan script)
    idx = good.find(b"\xff\xda")
    (slen,) = struct.unpack(">H", good[idx + 2:idx + 4])
    new_sos = (b"\xff\xda" + struct.pack(">H", 8)
               + bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    hacked = good[:idx] + new_sos + good[idx + 2 + slen:]
    with pytest.raises(ValueError, match="multi-scan"):
        decode_jpeg(hacked)


# --- MP4 probe (round 5: real ISO-BMFF box walk; frame decode stub) -------


def test_mp4_probe_roundtrip_and_rejects():
    from reffy_ray.ops.codecs import encode_mp4_skeleton, probe_mp4

    p = encode_mp4_skeleton(1920, 1080, 5500, 132, timescale=90000)
    info = probe_mp4(p)
    assert info == {"width": 1920, "height": 1080, "duration_ms": 5500,
                    "timescale": 90000, "n_samples": 132}
    with pytest.raises(ValueError, match="ISO-BMFF"):
        probe_mp4(b"\x00\x00\x00\x08free")
    with pytest.raises(ValueError):
        probe_mp4(p[:40])  # truncated inside moov
    # a stream with ftyp but no moov is rejected, not silently empty
    with pytest.raises(ValueError, match="moov"):
        probe_mp4(p[:16] + b"\x00\x00\x00\x08mdat")


def test_media_decoder_probes_video():
    from reffy_ray.ops.codecs import encode_mp4_skeleton
    from reffy_ray.ops.multimodal import MediaDecoder

    payload = encode_mp4_skeleton(64, 48, 1007, 31)
    batch = pa.table({
        "media_id": ["v0"], "kind": ["video"],
        "payload": pa.array([payload], pa.binary()),
    })
    out = MediaDecoder(fake=False)(batch)
    assert out.column("decode_status").to_pylist() == ["ok"]
    assert out.column("feature").to_pylist()[0] == [
        64, 48, 0, 31, 1007, 1000, 0, 0]
    # a non-BMFF video payload still reports stubbed (no video codec)
    batch2 = pa.table({
        "media_id": ["v1"], "kind": ["video"],
        "payload": pa.array([b"\x00" * 64], pa.binary()),
    })
    out2 = MediaDecoder(fake=False)(batch2)
    assert out2.column("decode_status").to_pylist() == ["stubbed"]


def test_mp4_probe_multitrack_and_largesize():
    """Review regression: a video trak followed by an audio trak (the
    common mux order) must report the VIDEO track's dims and sample
    count; size==1 largesize and size==0 to-EOF boxes are spec-legal."""
    import struct

    from reffy_ray.ops.codecs import encode_mp4_skeleton, probe_mp4

    base = encode_mp4_skeleton(640, 360, 2000, 48, timescale=1000)
    # splice a second (audio: 0x0 dims, 90000 samples) trak into moov
    audio = encode_mp4_skeleton(0, 0, 2000, 90000, timescale=1000)
    a0 = audio.find(b"trak") - 4
    (alen,) = struct.unpack(">I", audio[a0:a0 + 4])
    audio_trak = audio[a0:a0 + alen]
    m0 = base.find(b"moov") - 4
    (mlen,) = struct.unpack(">I", base[m0:m0 + 4])
    new_moov_body = base[m0 + 8:m0 + mlen] + audio_trak
    rebuilt = (base[:m0]
               + struct.pack(">I", len(new_moov_body) + 8) + b"moov"
               + new_moov_body + base[m0 + mlen:])
    info = probe_mp4(rebuilt)
    assert (info["width"], info["height"]) == (640, 360)
    assert info["n_samples"] == 48  # audio samples NOT summed in
    # audio-only file falls back to the first track
    assert probe_mp4(audio)["n_samples"] == 90000

    # largesize mdat (size==1 + 64-bit length) and size==0 tail box
    mdat_body = b"\x00" * 16
    large = (base[:-8]  # strip the original empty mdat
             + struct.pack(">I", 1) + b"mdat"
             + struct.pack(">Q", 16 + len(mdat_body)) + mdat_body)
    assert probe_mp4(large)["width"] == 640
    eof_box = base[:-8] + struct.pack(">I", 0) + b"free" + b"\x00" * 32
    assert probe_mp4(eof_box)["width"] == 640


def test_media_decoder_truncated_deflate_yields_error_row():
    """Review regression: a PNG whose IDAT chunks are CRC-valid but
    whose deflate stream is truncated raises zlib.error — must become
    an error ROW, not a task failure."""
    import struct
    import zlib as _zlib

    from reffy_ray.ops.codecs import encode_png
    from reffy_ray.ops.multimodal import MediaDecoder

    good = encode_png(np.arange(64, dtype=np.uint8).reshape(8, 8))
    # rebuild the IDAT chunk with HALF the compressed bytes and a
    # fresh (valid!) CRC
    idx = good.find(b"IDAT") - 4
    (dlen,) = struct.unpack(">I", good[idx:idx + 4])
    comp = good[idx + 8:idx + 8 + dlen]
    half = comp[: dlen // 2]
    bad_idat = (struct.pack(">I", len(half)) + b"IDAT" + half
                + struct.pack(">I", _zlib.crc32(b"IDAT" + half)
                              & 0xFFFFFFFF))
    bad = good[:idx] + bad_idat + good[idx + 8 + dlen + 4:]
    batch = pa.table({
        "media_id": ["t0"], "kind": ["image"],
        "payload": pa.array([bad], pa.binary()),
    })
    out = MediaDecoder(fake=False)(batch)
    assert out.column("decode_status").to_pylist() == ["error"]


def test_mp4_probe_bounds_checks():
    """Review regression: corrupt stts entry counts and undersized
    tkhd boxes must raise, not read neighboring boxes' bytes."""
    import struct

    from reffy_ray.ops.codecs import encode_mp4_skeleton, probe_mp4

    base = encode_mp4_skeleton(64, 48, 1000, 24)
    # inflate the stts entry_count from 1 to 2 (box size unchanged)
    i = base.find(b"stts") + 4
    bad = base[:i + 4] + struct.pack(">I", 2) + base[i + 8:]
    with pytest.raises(ValueError, match="stts entry count"):
        probe_mp4(bad)
    # shrink tkhd to an empty body: wrap it as an 8-byte box
    t = base.find(b"tkhd") - 4
    (tlen,) = struct.unpack(">I", base[t:t + 4])
    trak0 = base.find(b"trak") - 4
    (traklen,) = struct.unpack(">I", base[trak0:trak0 + 4])
    moov0 = base.find(b"moov") - 4
    (moovlen,) = struct.unpack(">I", base[moov0:moov0 + 4])
    shrunk = (base[:t] + struct.pack(">I", 8) + b"tkhd"
              + base[t + tlen:])
    delta = tlen - 8
    shrunk = (shrunk[:trak0] + struct.pack(">I", traklen - delta)
              + shrunk[trak0 + 4:])
    shrunk = (shrunk[:moov0] + struct.pack(">I", moovlen - delta)
              + shrunk[moov0 + 4:])
    with pytest.raises(ValueError, match="tkhd"):
        probe_mp4(shrunk)


def test_png_16bit_decode():
    """16-bit PNG: same byte-level filters, doubled stride, big-endian
    sample decode to uint16 (gray and RGB; rows alternate filter 0 and
    Sub to pin the doubled-bpp stride in the unfilter)."""
    import struct
    import zlib

    from reffy_ray.ops.codecs import decode_png

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    rng = np.random.default_rng(23)
    for shape, color, ch in (((5, 4), 0, 1), ((3, 6, 3), 2, 3)):
        arr = rng.integers(0, 65536, size=shape, dtype=np.uint16)
        h, w = arr.shape[:2]
        scan = bytearray()
        be = arr.astype(">u2")
        bpp = 2 * (arr.shape[2] if arr.ndim == 3 else 1)
        for ri, row in enumerate(be.reshape(h, -1)):
            rb = bytearray(row.tobytes())
            if ri % 2:  # Sub-filter odd rows: raw[i] = x[i] - x[i-bpp]
                scan.append(1)
                for i in range(len(rb) - 1, bpp - 1, -1):
                    rb[i] = (rb[i] - rb[i - bpp]) & 0xFF
                scan.extend(rb)
            else:
                scan.append(0)
                scan.extend(rb)
        ihdr = struct.pack(">IIBBBBB", w, h, 16, color, 0, 0, 0)
        png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(bytes(scan)))
               + chunk(b"IEND", b""))
        got = decode_png(png)
        assert got.dtype == np.uint16
        assert np.array_equal(got, arr), (shape, color)

"""Multimodal column plumbing (image/audio/video as opaque binary).

Media columns are ``binary`` payloads + typed metadata, exactly as the
span table treats figures/images (``media_ref`` spans are never
fetched — the analog of the reference's image-request abort at
src/lib/util.js:333). Decode/resize/frame-sample run as actor-pool
``map_batches`` stages. PNM, PNG, JPEG and WAV payloads decode for
REAL via the pure-numpy codecs in ops/codecs.py, and MP4 video gets
a REAL metadata probe (ISO-BMFF box walk — dims/duration/samples);
only the video FRAME decode remains stubbed in this container —
unrecognized payloads raise ``NotImplementedError`` unless
``fake=True``, which produces a deterministic fake decode for
pipeline tests.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),       # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),
        ("feature", pa.list_(pa.float32())),
        ("decode_status", pa.string()),
    ]
)


def synth_media_batch(n: int, seed: int = 0) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        h = hashlib.md5(f"media-{seed}-{i}".encode()).digest()
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            {
                "media_id": f"m{seed}-{i}",
                "kind": kind,
                "payload": h * 8,
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "width": 64 + (i % 8) * 16 if kind != "audio" else 0,
                "height": 64 + (i % 5) * 16 if kind != "audio" else 0,
                "duration_ms": 0 if kind == "image" else 1000 + i,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def synth_media_batch_real(n: int, seed: int = 0) -> pa.Table:
    """Deterministic media rows with REAL decodable payloads: binary
    PPM (P6) and PNG (RGB, filter-0 + zlib) images alternating by
    image index, and RIFF WAVE PCM16 audio, all built by ops/codecs'
    encoders; video rows carry a deterministic ISO-BMFF skeleton
    (64×48, duration 1000+i ms, 24+(i%8) samples) whose metadata the
    MP4 probe reads back exactly — the frame decode itself stays
    stubbed. JPEG decodes for real too, but being LOSSY it is kept
    out of this generator: the media_features oracle value-checks
    decoded/probed values analytically, which only byte-exact
    formats can satisfy.

    Pixel / sample rules are closed-form so a SQL oracle can verify
    the decoded values analytically (q_media_features) — the PNM/PNG
    alternation is invisible to the oracle because both formats
    decode to the same pixel rule:

    - image i: w = 16 + (i%8)·4, h = 12 + (i%5)·4,
      pix(y, x, c) = (i + y + x + c) mod 256; PNG when (i//3) is odd,
      PPM when even
    - audio i: rate 8000 Hz mono, n_samples = 160 + i,
      sample(k) = ((i + k) mod 256 − 128) · 256
    """
    from .codecs import encode_png, encode_pnm, encode_wav

    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = 16 + (i % 8) * 4, 12 + (i % 5) * 4
            y, x, c = np.ogrid[0:h, 0:w, 0:3]
            pix = ((i + y + x + c) % 256).astype(np.uint8)
            if (i // 3) % 2:
                payload = encode_png(pix)
                mime, dur = "image/png", 0
            else:
                payload = encode_pnm(pix)
                mime, dur = "image/x-portable-pixmap", 0
        elif kind == "audio":
            k = np.arange(160 + i, dtype=np.int64)
            payload = encode_wav((((i + k) % 256 - 128) * 256).astype(np.int16))
            w = h = 0
            mime, dur = "audio/wav", (160 + i) * 1000 // 8000
        else:
            # deterministic ISO-BMFF skeleton: the metadata probe reads
            # these values back exactly (closed-form for the oracle);
            # frame decode remains the one stub
            from .codecs import encode_mp4_skeleton

            w, h = 64, 48
            dur = 1000 + i
            payload = encode_mp4_skeleton(w, h, dur, 24 + (i % 8))
            mime = "video/mp4"
        rows.append(
            {
                "media_id": f"mr{seed}-{i}",
                "kind": kind,
                "payload": payload,
                "mime": mime,
                "width": w,
                "height": h,
                "duration_ms": dur,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def media_manifest(batch) -> pa.Table:
    """Interleaved media spans → media manifest rows: one row per
    figure/image span of a documents batch (doc_id, media_ref, kind,
    caption). The media payload itself is never fetched — mirrors the
    reference's image-request abort (src/lib/util.js:333); the
    manifest is the hand-off point to a real media-fetch stage."""
    from ..stages.extract import _iter_docs

    rows = {"doc_id": [], "media_ref": [], "kind": [], "caption": []}
    for doc_id, _url, spans in _iter_docs(batch):
        for s in spans:
            if s["kind"] in ("figure", "image") and s.get("media_ref"):
                rows["doc_id"].append(doc_id)
                rows["media_ref"].append(s["media_ref"])
                rows["kind"].append(s["kind"])
                rows["caption"].append(s["text"])
    return pa.table(
        {
            "doc_id": pa.array(rows["doc_id"], pa.string()),
            "media_ref": pa.array(rows["media_ref"], pa.string()),
            "kind": pa.array(rows["kind"], pa.string()),
            "caption": pa.array(rows["caption"], pa.string()),
        }
    )


def pack_interleaved(
    batch: pa.Table,
    budget: int = 128,
    media_cost: int = 64,
) -> pa.Table:
    """Multimodal sequence packing over the interleaved span stream:
    greedily pack each document's spans, in order, into training
    sequences of at most ``budget`` cost units, where a prose span
    costs its whitespace token count, a figure/image span costs
    ``media_cost`` (the patch budget a vision encoder spends per
    image), and structural spans (headings, dfns, anchors, …) cost 1.
    A span larger than ``budget`` gets a chunk of its own; chunks never
    split a span (the packer's contract — span order inside a document
    is the north rule's invariant and survives packing verbatim).

    Emits the packing manifest (doc_id, chunk_idx, n_spans, n_tokens,
    n_media) rather than payloads: downstream loaders join it back to
    the span table by (doc_id, chunk ranges). Greedy reset-scan is
    inherently sequential per document but O(#spans) and runs inside
    map_batches — documents are independent, so the stage scales by
    doc partitioning exactly like the extractors.
    """
    from ..stages.extract import _iter_docs

    out = {
        "doc_id": [],
        "chunk_idx": [],
        "n_spans": [],
        "n_tokens": [],
        "n_media": [],
    }
    for doc_id, _url, spans in _iter_docs(batch):
        chunk, running, n_spans, n_media = 0, 0, 0, 0
        stats: list[tuple[int, int, int]] = []  # (n_spans, cost, n_media)
        for s in spans:
            kind = s["kind"]
            if kind in ("figure", "image"):
                cost, is_media = media_cost, 1
            elif kind == "prose":
                cost, is_media = len((s["text"] or "").split()), 0
            else:
                cost, is_media = 1, 0
            if running > 0 and running + cost > budget:
                stats.append((n_spans, running, n_media))
                chunk += 1
                running, n_spans, n_media = 0, 0, 0
            running += cost
            n_spans += 1
            n_media += is_media
        if n_spans:
            stats.append((n_spans, running, n_media))
        for ci, (ns, cost_sum, nm) in enumerate(stats):
            out["doc_id"].append(doc_id)
            out["chunk_idx"].append(ci)
            out["n_spans"].append(ns)
            out["n_tokens"].append(cost_sum)
            out["n_media"].append(nm)
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "chunk_idx": pa.array(out["chunk_idx"], pa.int64()),
            "n_spans": pa.array(out["n_spans"], pa.int64()),
            "n_tokens": pa.array(out["n_tokens"], pa.int64()),
            "n_media": pa.array(out["n_media"], pa.int64()),
        }
    )


def media_text_pairs(batch: pa.Table) -> pa.Table:
    """Image-text pair mining over the interleaved span stream
    (OBELICS/LAION-style): each media span is paired with its own
    caption plus the nearest *preceding* prose span as surrounding
    context, falling back to the document title when no prose has
    been seen yet. Order-sensitive by construction — the pairing is
    only correct because span order inside a document is the north
    rule's invariant. Stateless map_batches; documents are
    independent, so the stage partitions like the extractors."""
    from ..stages.extract import _iter_docs

    out = {"doc_id": [], "media_ref": [], "caption": [], "context": []}
    for doc_id, _url, spans in _iter_docs(batch):
        last_prose, title = "", ""
        for s in spans:
            kind = s["kind"]
            if kind == "title":
                title = s["text"] or ""
            elif kind == "prose":
                last_prose = s["text"] or ""
            elif kind in ("figure", "image") and s.get("media_ref"):
                out["doc_id"].append(doc_id)
                out["media_ref"].append(s["media_ref"])
                out["caption"].append(s["text"] or "")
                out["context"].append(last_prose or title)
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "media_ref": pa.array(out["media_ref"], pa.string()),
            "caption": pa.array(out["caption"], pa.string()),
            "context": pa.array(out["context"], pa.string()),
        }
    )


class MediaDecoder:
    """Actor-pool stage: decode + feature-extract media payloads.

    ``fake=True`` → deterministic 8-dim feature from the payload hash
    (pipeline plumbing testable without codecs). ``fake=False`` →
    REAL decode via the pure-numpy codecs in ops/codecs.py — binary
    PNM images (P5/P6), PNG (stdlib zlib inflate + numpy unfilter),
    baseline JPEG and RIFF WAVE PCM audio — emitting the 8-dim feature
    ``[dim_a, dim_b, channels, units, v_first, v_last, v_min, v_max]``
    (image: dim_a/b = width/height, units = pixels; audio: dim_a =
    sample rate, dim_b = 0, units = samples; all values exactly
    representable in float32). ISO-BMFF video payloads get a REAL
    metadata probe (ops/codecs.probe_mp4: ``[w, h, 0, n_samples,
    duration_ms, timescale, 0, 0]``, status ``'ok'``); only the video
    FRAME decode is stubbed — non-BMFF video raises
    NotImplementedError → ``decode_status='stubbed'`` (a real
    deployment extends ``_decode`` with a pyav call loaded once per
    actor in ``__init__``). Corrupt/truncated payloads yield
    ``decode_status='error'`` rows rather than failing the task.
    """

    def __init__(self, fake: bool = True, feature_dim: int = 8):
        self.fake = fake
        self.dim = feature_dim
        if not fake:
            # codec entry points bound once per actor
            from .codecs import (
                JPEG_SOI, PNG_SIG, decode_jpeg, decode_png, decode_pnm,
                decode_wav,
            )

            self._decode_pnm = decode_pnm
            self._decode_png = decode_png
            self._decode_jpeg = decode_jpeg
            self._decode_wav = decode_wav
            self._png_sig = PNG_SIG
            self._jpeg_soi = JPEG_SOI
            from .codecs import probe_mp4

            self._probe_mp4 = probe_mp4

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        if not self.fake:
            if kind == "image" and (
                payload[:1] == b"P" or payload[:8] == self._png_sig
                or payload[:2] == self._jpeg_soi
            ):
                if payload[:8] == self._png_sig:
                    arr = self._decode_png(payload)
                elif payload[:2] == self._jpeg_soi:
                    arr = self._decode_jpeg(payload)
                else:
                    arr = self._decode_pnm(payload)
                channels = 1 if arr.ndim == 2 else arr.shape[2]
                flat = arr.reshape(-1).astype(np.int64)
                h, w = arr.shape[:2]
                return np.array(
                    [w, h, channels, w * h, flat[0], flat[-1],
                     flat.min(), flat.max()],
                    dtype=np.float32,
                )
            if kind == "video" and payload[4:8] == b"ftyp":
                # ISO-BMFF metadata PROBE (real box walk; the frame
                # decode itself stays stubbed — no video libs here):
                # [w, h, 0, n_samples, duration_ms, timescale, 0, 0]
                info = self._probe_mp4(payload)
                # feature values must stay exactly representable in
                # float32 (the class contract): saturate the unbounded
                # fields at 2^24 rather than silently rounding a
                # >4.7-hour duration or >16M-sample track
                cap = 1 << 24
                return np.array(
                    [info["width"], info["height"], 0,
                     min(info["n_samples"], cap),
                     min(info["duration_ms"], cap),
                     min(info["timescale"], cap), 0, 0],
                    dtype=np.float32,
                )
            if kind == "audio" and payload[:4] == b"RIFF":
                rate, samples = self._decode_wav(payload)
                channels = 1 if samples.ndim == 1 else samples.shape[1]
                flat = samples.reshape(-1).astype(np.int64)
                return np.array(
                    [rate, 0, channels, len(samples), flat[0], flat[-1],
                     flat.min(), flat.max()],
                    dtype=np.float32,
                )
            raise NotImplementedError(
                f"no codec for kind={kind!r} payload (video codecs "
                "remain stubbed in this container; PNM/PNG/JPEG/WAV "
                "decode for real)"
            )
        h = hashlib.sha256(payload).digest()
        return (
            np.frombuffer(h[: self.dim * 4], dtype=np.uint32).astype(np.float32)
            / np.float32(2**32)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, status = [], []
        for payload, kind in zip(
            batch.column("payload").to_pylist(), batch.column("kind").to_pylist()
        ):
            try:
                feats.append(self._decode(payload, kind).tolist())
                status.append("ok" if self.fake is False else "fake")
            except NotImplementedError:
                feats.append(None)
                status.append("stubbed")
            except (ValueError, IndexError, struct.error, zlib.error):
                # corrupt/truncated payload (CRC mismatch, bad Huffman
                # code, short entropy data, truncated deflate stream)
                # — routine in real crawls: one bad image must yield
                # an error ROW, not fail the whole map_batches task
                feats.append(None)
                status.append("error")
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "feature": pa.array(feats, pa.list_(pa.float32())),
                "decode_status": pa.array(status, pa.string()),
            }
        )


def sample_frames(
    ds,
    step_ms: int = 500,
    max_frames: int = 8,
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
):
    """Deterministic frame sampling for video rows: one output row per
    sampled frame at timestamps 0, step_ms, 2·step_ms, … capped at
    ``max_frames`` per video (n = min(max_frames, 1 + duration_ms //
    step_ms); rows with duration ≤ 0 emit nothing).

    This is the fan-out stage a video pipeline puts in front of the
    decode pool (``MediaDecoder``): frames are *rows*, so the actor
    pool sizes batches in frames rather than whole videos and a
    ten-hour video cannot pin one task. Pure integer arithmetic,
    vectorized (numpy repeat/arange) — no Python loop over rows.
    """
    import pyarrow as _pa

    def expand(batch: _pa.Table) -> _pa.Table:
        dur = batch.column(duration_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.minimum(max_frames, 1 + dur // step_ms)
        n = np.where(dur > 0, n, 0).astype(np.int64)
        idx = np.repeat(np.arange(len(dur)), n)
        # frame_idx = 0..n_i-1 within each video, as one vectorized ramp
        starts = np.cumsum(n) - n
        frame_idx = np.arange(int(n.sum()), dtype=np.int64) - np.repeat(starts, n)
        ids = batch.column(id_col).take(_pa.array(idx, _pa.int64()))
        return _pa.table(
            {
                id_col: ids,
                "frame_idx": _pa.array(frame_idx, _pa.int64()),
                "ts_ms": _pa.array(frame_idx * step_ms, _pa.int64()),
            }
        )

    return ds.map_batches(expand, batch_format="pyarrow")


class MediaResizer:
    """Actor-pool resize stage (same contract as ``MediaDecoder``):
    fit-within-box (max_w × max_h) preserving aspect ratio, computed on
    metadata; the pixel resample itself is STUBBED (``fake=True`` keys
    the output payload off the input hash; ``fake=False`` raises —
    no image libs in this container). Real deployment replaces
    ``_resample`` with a PIL call loaded once per actor in __init__."""

    def __init__(self, max_w: int = 256, max_h: int = 256, fake: bool = True):
        self.max_w, self.max_h, self.fake = max_w, max_h, fake

    def _resample(self, payload: bytes, w: int, h: int) -> bytes:
        if not self.fake:
            # real path for PNM/PNG/JPEG: nearest-neighbor index
            # sampling in pure numpy (ops/codecs.py); video codecs
            # remain stubbed (no libs here)
            from .codecs import (
                JPEG_SOI, PNG_SIG, decode_jpeg, decode_png, decode_pnm,
                encode_jpeg, encode_png, encode_pnm,
            )

            is_png = payload[:8] == PNG_SIG
            is_jpeg = payload[:2] == JPEG_SOI
            if payload[:1] == b"P" or is_png or is_jpeg:
                arr = (
                    decode_png(payload) if is_png
                    else decode_jpeg(payload) if is_jpeg
                    else decode_pnm(payload)
                )
                src_h, src_w = arr.shape[:2]
                if w <= 0 or h <= 0:
                    raise ValueError("resample target must be positive")
                ys = (np.arange(h) * src_h) // h
                xs = (np.arange(w) * src_w) // w
                out = arr[ys][:, xs]
                if out.dtype == np.uint16:
                    # 16-bit PNG: downconvert high bytes — encode_png
                    # emits 8-bit, and a silent mod-256 cast would
                    # corrupt near-white to black (review finding)
                    out = (out >> 8).astype(np.uint8)
                if is_png:
                    return encode_png(out)
                if is_jpeg:
                    return encode_jpeg(out)
                return encode_pnm(out)
            raise NotImplementedError(
                "no codec for this payload (video codecs are stubbed "
                "in this container); run with fake=True"
            )
        return hashlib.sha256(payload + f"{w}x{h}".encode()).digest()

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch.column("width").to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch.column("height").to_numpy(zero_copy_only=False).astype(np.int64)
        # integer fit-within scale: factor = min(max_w/w, max_h/h, 1)
        # applied as exact rational floor on the other axis
        out_w = np.minimum(w, self.max_w)
        out_h = np.where(w > 0, h * out_w // np.maximum(w, 1), 0)
        too_tall = out_h > self.max_h
        out_h2 = np.minimum(out_h, self.max_h)
        out_w = np.where(too_tall, w * out_h2 // np.maximum(h, 1), out_w)
        out_h = out_h2
        payloads = []
        for i, (p, ow, oh) in enumerate(zip(
            batch.column("payload").to_pylist(), out_w, out_h
        )):
            try:
                payloads.append(self._resample(p, int(ow), int(oh)))
            except (ValueError, IndexError, struct.error, zlib.error):
                # corrupt/truncated payload: pass it through unchanged
                # rather than failing the task (the decode stage is
                # where such rows get their error status), and report
                # the INPUT dims so the row metadata never claims a
                # resize that did not happen
                payloads.append(p)
                out_w[i] = w[i]
                out_h[i] = h[i]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "out_width": pa.array(out_w, pa.int32()),
                "out_height": pa.array(out_h, pa.int32()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )


def _explode_spans(batch: pa.Table):
    """(doc_ids, kinds, seq, doc_change) numpy views of the exploded
    span stream — zero-copy Arrow list flatten; seq is each span's
    position in its document (list order == offset order by the
    parser's contract)."""
    import pyarrow.compute as pc

    combined = batch.column("spans").combine_chunks()
    flat = pc.list_flatten(combined)
    parents = pc.list_parent_indices(combined).to_numpy(zero_copy_only=False)
    doc_ids = (
        pc.cast(batch.column("doc_id"), pa.int64())
        .to_numpy(zero_copy_only=False)[parents]
    )
    kinds = pc.struct_field(flat, "kind")
    n = len(parents)
    doc_change = np.ones(n, dtype=bool)
    if n:
        doc_change[1:] = parents[1:] != parents[:-1]
    idx = np.arange(n, dtype=np.int64)
    doc_start = np.maximum.accumulate(np.where(doc_change, idx, 0))
    seq = idx - doc_start
    return doc_ids, kinds, seq, doc_change


def span_runs(batch: pa.Table) -> pa.Table:
    """Run-length encoding of the interleaved span stream: maximal
    stretches of consecutive same-kind spans per document (the
    text/media interleave structure a sequence packer or curriculum
    sampler keys on). Emits one row per run: ``(doc_id, run_idx,
    kind, run_start, run_len)``, run_idx 0-based in stream order.

    Zero-shuffle: each document's span list lives in one row, so runs
    never cross blocks — a pure vectorized map_batches kernel
    (dictionary-encoded kind codes, boundary diff, np.diff of run
    starts). Scales by doc partitioning exactly like the extractors.
    """
    import pyarrow.compute as pc

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "run_idx": pa.array([], pa.int64()),
            "kind": pa.array([], pa.string()),
            "run_start": pa.array([], pa.int64()),
            "run_len": pa.array([], pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    doc_ids, kinds, seq, doc_change = _explode_spans(batch)
    n = len(seq)
    if not n:
        return empty
    codes = pc.dictionary_encode(kinds)
    if isinstance(codes, pa.ChunkedArray):
        codes = codes.combine_chunks()
    code = codes.indices.to_numpy(zero_copy_only=False)
    new_run = doc_change.copy()
    new_run[1:] |= code[1:] != code[:-1]
    starts = np.flatnonzero(new_run)
    run_len = np.diff(np.append(starts, n))
    # 0-based run index within each document (runs are contiguous per doc)
    run_doc_change = doc_change[starts]
    ridx = np.arange(len(starts), dtype=np.int64)
    run_doc_start = np.maximum.accumulate(np.where(run_doc_change, ridx, 0))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[starts], pa.int64()),
            "run_idx": pa.array(ridx - run_doc_start, pa.int64()),
            "kind": pc.take(kinds, pa.array(starts)),
            "run_start": pa.array(seq[starts], pa.int64()),
            "run_len": pa.array(run_len, pa.int64()),
        }
    )


def span_sections(batch: pa.Table) -> pa.Table:
    """Heading-delimited section statistics over the interleaved span
    stream: section 0 is everything before a document's first heading,
    each heading span opens the next section (and belongs to it).
    Emits ``(doc_id, section_idx, n_spans, n_media, first_seq)`` — the
    per-section text/media interleave profile a multimodal sampler
    budgets against.

    Zero-shuffle map_batches kernel: per-doc inclusive cumsum of the
    heading mask, then reduceat over contiguous (doc, section) groups.
    """
    import pyarrow.compute as pc

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "section_idx": pa.array([], pa.int64()),
            "n_spans": pa.array([], pa.int64()),
            "n_media": pa.array([], pa.int64()),
            "first_seq": pa.array([], pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    doc_ids, kinds, seq, doc_change = _explode_spans(batch)
    n = len(seq)
    if not n:
        return empty
    h = pc.equal(kinds, "heading").to_numpy(zero_copy_only=False).astype(np.int64)
    csum = np.cumsum(h)
    idx = np.arange(n, dtype=np.int64)
    doc_start = np.maximum.accumulate(np.where(doc_change, idx, 0))
    # inclusive heading count within doc: csum - csum before doc start
    before = np.where(doc_start > 0, csum[doc_start - 1], 0)
    sec = csum - before
    new_grp = doc_change.copy()
    new_grp[1:] |= sec[1:] != sec[:-1]
    starts = np.flatnonzero(new_grp)
    counts = np.diff(np.append(starts, n))
    media = (
        pc.is_in(kinds, value_set=pa.array(["figure", "image"]))
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    mcsum = np.concatenate(([0], np.cumsum(media)))
    ends = np.append(starts[1:], n)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[starts], pa.int64()),
            "section_idx": pa.array(sec[starts], pa.int64()),
            "n_spans": pa.array(counts, pa.int64()),
            "n_media": pa.array(mcsum[ends] - mcsum[starts], pa.int64()),
            "first_seq": pa.array(seq[starts], pa.int64()),
        }
    )


def span_template_fps(batch: pa.Table) -> pa.Table:
    """Per-document structural fingerprint of the interleaved span
    stream: md5 of the comma-joined kind sequence (md5 to match
    DuckDB's ``md5()``, the repo's exact_dedup parity rule). Two
    documents share a fingerprint iff their span kind-sequences are
    identical — the boilerplate-template signal of a crawl corpus
    (mass-generated pages differ in text but never in structure)."""
    import hashlib

    import pyarrow.compute as pc

    if batch.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "fingerprint": pa.array([], pa.string()),
                "n_spans": pa.array([], pa.int64()),
            }
        )
    combined = batch.column("spans").combine_chunks()
    kinds = pc.struct_field(pc.list_flatten(combined), "kind").to_pylist()
    offs = combined.offsets.to_numpy(zero_copy_only=False)
    fps, counts = [], []
    for s, e in zip(offs[:-1], offs[1:]):
        seq = ",".join(kinds[s:e])
        fps.append(hashlib.md5(seq.encode("utf-8")).hexdigest())
        counts.append(int(e - s))
    return pa.table(
        {
            "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
            "fingerprint": pa.array(fps, pa.string()),
            "n_spans": pa.array(counts, pa.int64()),
        }
    )


def span_templates(docs: "object") -> "object":
    """Template clusters over the span corpus: groups of ≥2 documents
    with identical span kind-sequences. Emits ``(fingerprint, n_docs,
    rep_doc, n_spans)``, rep_doc = min doc id (deterministic winner,
    the exact_dedup convention).

    Scale shape: per-batch fingerprinting (docs never leave their
    block), a per-batch pyarrow group_by combiner, then ONE Ray
    groupby shuffle over (fingerprint) partial rows — at most
    #templates × #blocks rows move."""
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        t = span_template_fps(b)
        g = t.group_by("fingerprint").aggregate(
            [("doc_id", "count"), ("doc_id", "min"), ("n_spans", "min")]
        )
        return pa.table(
            {
                "fingerprint": g.column("fingerprint"),
                "n_docs": pc.cast(g.column("doc_id_count"), pa.int64()),
                "rep_doc": pc.cast(g.column("doc_id_min"), pa.int64()),
                "n_spans": pc.cast(g.column("n_spans_min"), pa.int64()),
            }
        )

    from ray.data.aggregate import Min, Sum

    folded = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("fingerprint")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Min("rep_doc", alias_name="rep_doc"),
            Min("n_spans", alias_name="n_spans"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "fingerprint": b.column("fingerprint"),
                "n_docs": pc.cast(b.column("n_docs"), pa.int64()),
                "rep_doc": pc.cast(b.column("rep_doc"), pa.int64()),
                "n_spans": pc.cast(b.column("n_spans"), pa.int64()),
            }
        )
        return t.filter(pc.greater_equal(t.column("n_docs"), 2))

    return folded.map_batches(finish, batch_format="pyarrow")


def media_dedup(media) -> "rd.Dataset":
    """Cross-document exact media dedup by payload content hash — the
    100 TB multimodal-pipeline primitive (the same image embedded on a
    million pages must be fetched/decoded/stored once).

    Scale shape: the md5 is computed per batch where the payload
    already lives (payloads never move), then ONE groupby shuffle over
    the slim ``(content_key, media_id, kind)`` projection — orders of
    magnitude smaller than the payload bytes. Canonical per group =
    lexicographic-min media_id (deterministic first-wins, the in-doc
    dedup convention); every member row comes back annotated with its
    canonical id and group size, so a downstream rewrite of span
    ``media_ref``s is a broadcast/bucketed map, and storage keeps one
    payload per group.
    """
    import pandas as pd

    def hash_rows(b: pa.Table) -> pa.Table:
        hs = [
            hashlib.md5(p).hexdigest()
            for p in b.column("payload").to_pylist()
        ]
        return pa.table(
            {
                "media_id": b.column("media_id"),
                "kind": b.column("kind"),
                "content_key": pa.array(hs, pa.string()),
            }
        )

    slim = media.map_batches(hash_rows, batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "media_id": g["media_id"],
                "kind": g["kind"],
                "canonical_id": g["media_id"].min(),
                "group_size": np.int64(len(g)),
            }
        )

    return slim.groupby("content_key").map_groups(
        fold, batch_format="pandas"
    )

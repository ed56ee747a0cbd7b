"""Multimodal column plumbing (image/audio/video as opaque binary).

Media columns are ``binary`` payloads + typed metadata, exactly as the
span table treats figures/images (``media_ref`` spans are never
fetched — the analog of the reference's image-request abort at
src/lib/util.js:333). Decode/resize/frame-sample run as actor-pool
``map_batches`` stages whose Ray-side plumbing (schema, batch size,
actor signature, output layout) is real and tested; the codec call
itself is STUBBED (no image/audio libs in this container): decode
raises ``NotImplementedError`` unless ``fake=True``, which produces a
deterministic fake decode for pipeline tests.
"""

from __future__ import annotations

import hashlib

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


class MediaDecoder:
    """Actor-pool stage: decode + feature-extract media payloads.

    ``fake=True`` → deterministic 8-dim feature from the payload hash
    (pipeline plumbing testable without codecs). ``fake=False`` →
    NotImplementedError at decode time, as mandated for this container.
    Real deployment: replace ``_decode`` with PIL/torchaudio/pyav calls
    loaded once here in ``__init__``.
    """

    def __init__(self, fake: bool = True, feature_dim: int = 8):
        self.fake = fake
        self.dim = feature_dim
        # real impl would load codecs/models here, once per actor

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "media codecs unavailable in this container; run with fake=True"
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
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "feature": pa.array(feats, pa.list_(pa.float32())),
                "decode_status": pa.array(status, pa.string()),
            }
        )

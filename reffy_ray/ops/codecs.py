"""Pure-numpy media codecs for uncompressed formats.

Real decoders (no image/audio libraries needed, none available in this
container): binary PNM images (P5 grayscale / P6 RGB, 8-bit) and RIFF
WAVE PCM audio (8/16-bit). These back ``MediaDecoder(fake=False)`` for
``image/x-portable-*`` and ``audio/wav`` payloads — the one place the
multimodal stage does genuine byte→array decoding; compressed formats
(PNG/JPEG/MP4) remain stubbed behind NotImplementedError as mandated
for this environment (reference analog: media requests are aborted,
never decoded — src/lib/util.js:333; decode here is the engine's
*extension* surface for training-data pipelines).

Everything is deterministic and byte-exact: encoders and decoders
round-trip (tests/test_multimodal.py), and the synthetic payload
generators in ops/multimodal.py use closed-form pixel/sample rules so
a SQL oracle can verify decoded values analytically.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# PNM (P5 = binary PGM grayscale, P6 = binary PPM RGB)
# ---------------------------------------------------------------------------


def _pnm_header(payload: bytes):
    """Parse the PNM header: magic, width, height, maxval, data offset.
    Whitespace-separated tokens with '#' comments, per the netpbm spec."""
    tokens: list[int] = []
    i = 2  # past magic
    if payload[:1] != b"P":
        raise ValueError("not a PNM payload")
    magic = payload[:2].decode("ascii")
    n = len(payload)
    while len(tokens) < 3 and i < n:
        c = payload[i:i + 1]
        if c == b"#":  # comment to end of line
            while i < n and payload[i:i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j:j + 1].isspace():
                j += 1
            tokens.append(int(payload[i:j]))
            i = j
    if len(tokens) != 3:
        raise ValueError("truncated PNM header")
    # EXACTLY one whitespace byte after maxval, then raster — the
    # netpbm contract, and what Pillow implements (fp.read(1)). A
    # CRLF-after-maxval file is out-of-spec (the \n would decode as
    # the first raster byte) — reject it loudly instead of shifting
    # every pixel by one.
    sep = payload[i:i + 1]
    if not sep.isspace():
        raise ValueError("PNM header not followed by whitespace")
    if sep == b"\r" and payload[i + 1:i + 2] == b"\n":
        raise ValueError(
            "CRLF after PNM maxval — out-of-spec header (netpbm "
            "mandates a single whitespace byte before the raster)"
        )
    i += 1
    width, height, maxval = tokens
    return magic, width, height, maxval, i


def decode_pnm(payload: bytes) -> np.ndarray:
    """Binary PNM → uint8 array: (h, w) for P5, (h, w, 3) for P6."""
    magic, w, h, maxval, off = _pnm_header(payload)
    if maxval > 255:
        raise ValueError("only 8-bit PNM supported")
    channels = {"P5": 1, "P6": 3}.get(magic)
    if channels is None:
        raise ValueError(f"unsupported PNM magic {magic!r}")
    need = w * h * channels
    if len(payload) - off < need:
        raise ValueError(
            f"truncated PNM raster: need {need} bytes, have "
            f"{len(payload) - off}"
        )
    data = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    return data.reshape((h, w) if channels == 1 else (h, w, channels))


def encode_pnm(arr: np.ndarray) -> bytes:
    """uint8 array → binary PNM bytes (P5 for 2-D, P6 for (h, w, 3))."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        magic = b"P5"
        h, w = a.shape
    elif a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
        h, w = a.shape[:2]
    else:
        raise ValueError("expected (h, w) or (h, w, 3) uint8 array")
    return magic + f"\n{w} {h}\n255\n".encode("ascii") + a.tobytes()


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM 8-bit unsigned / 16-bit signed little-endian)
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF WAVE PCM → (sample_rate, samples). Samples are int16
    (8-bit input is widened, centered to signed) shaped (n,) for mono,
    (n, channels) otherwise. Hand-parsed chunk walk — fmt must precede
    data, unknown chunks are skipped (the RIFF contract)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = None
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1:
                raise ValueError("only PCM WAV supported")
            fmt = (channels, rate, bits)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt")
            channels, rate, bits = fmt
            if bits == 16:
                samples = np.frombuffer(
                    body, dtype="<i2", count=len(body) // 2
                ).astype(np.int16)
            elif bits == 8:
                samples = (
                    np.frombuffer(body, dtype=np.uint8).astype(np.int16) - 128
                ) * 256
            else:
                raise ValueError("only 8/16-bit PCM supported")
            if channels > 1:
                samples = samples[: (len(samples) // channels) * channels]
                samples = samples.reshape(-1, channels)
            return rate, samples
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    raise ValueError("WAV data chunk missing")


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 samples ((n,) mono or (n, channels)) → RIFF WAVE PCM16."""
    a = np.ascontiguousarray(samples, dtype="<i2")
    channels = 1 if a.ndim == 1 else a.shape[1]
    data = a.tobytes()
    byte_rate = sample_rate * channels * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate, byte_rate,
                      channels * 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data

"""Pure-numpy media codecs (no image/audio libraries in container).

Real decoders: binary PNM images (P5 grayscale / P6 RGB, 8-bit), RIFF
WAVE PCM audio (8/16-bit), and — as of round 5 — PNG (stdlib ``zlib``
inflate + vectorized scanline unfiltering; 8-bit depth, color types
0/2/3/4/6, filters 0–4, Adam7 interlace, CRC-checked) and baseline
JPEG (sequential DCT: canonical-Huffman entropy walk + batched
einsum IDCT + BT.601; encoder at 4:4:4 with self-defined embedded
Huffman tables — lossy, round-trips within tested error bounds).
These back ``MediaDecoder(fake=False)``; only VIDEO codecs (MP4)
stay stubbed behind NotImplementedError as mandated for this
environment (reference analog: media requests are aborted, never
decoded — src/lib/util.js:333; decode here is the engine's *extension*
surface for training-data pipelines).

Everything is deterministic and byte-exact: encoders and decoders
round-trip (tests/test_multimodal.py), and the synthetic payload
generators in ops/multimodal.py use closed-form pixel/sample rules so
a SQL oracle can verify decoded values analytically.
"""

from __future__ import annotations

import struct
import zlib

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
# PNG (stdlib zlib + numpy unfiltering — the first compressed format
# with a REAL decode path; zero new dependencies)
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(payload: bytes):
    """Yield (type, data) for each chunk, verifying every CRC."""
    pos, n = 8, len(payload)
    while pos + 12 <= n:
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length:pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        if ctype == b"IEND":
            return
        pos += 12 + length
    raise ValueError("PNG stream ended without IEND")


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters (PNG spec §9: None/Sub/Up/
    Average/Paeth). Row loop in Python, byte work vectorized where the
    data dependence allows: Sub is a per-lane cumsum (recon[i] =
    Σ raw[..i] mod 256), Up is one uint8 add; Average/Paeth carry a
    left-pixel dependence so they walk the row — fine, since our own
    encoder emits filter 0 and foreign files rarely exceed a few MB
    per actor batch."""
    rr = np.frombuffer(raw, np.uint8)
    if len(rr) != (stride + 1) * h:
        raise ValueError(
            f"PNG raster size mismatch: {len(rr)} != {(stride + 1) * h}"
        )
    rr = rr.reshape(h, stride + 1)
    out = np.zeros((h, stride), np.uint8)
    zero_row = np.zeros(stride, np.uint8)
    for y in range(h):
        f = int(rr[y, 0])
        row = rr[y, 1:]
        prior = out[y - 1] if y else zero_row
        if f == 0:
            out[y] = row
        elif f == 1:  # Sub: per-lane prefix sum mod 256
            for lane in range(bpp):
                out[y, lane::bpp] = np.cumsum(
                    row[lane::bpp], dtype=np.uint64
                ).astype(np.uint8)
        elif f == 2:  # Up
            out[y] = row + prior  # uint8 wraps mod 256
        elif f == 3:  # Average
            cur = out[y]
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(row[i]) + ((left + int(prior[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = out[y]
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prior[i])
                c = int(prior[i - bpp]) if i >= bpp else 0
                pp = a + b - c
                pa_, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (
                    b if pb <= pc else c
                )
                cur[i] = (int(row[i]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f}")
    return out


# Adam7 pass grid: (x_start, y_start, x_step, y_step), PNG spec §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_deinterlace(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Adam7: seven independently-filtered sub-images concatenated in
    the inflated stream; each unfilters like a normal image and
    scatters into the output with one strided numpy assignment."""
    out = np.zeros((w * h * bpp,), np.uint8).reshape(h, w * bpp)
    out = out.reshape(h, w, bpp)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = pw * bpp
        need = (stride + 1) * ph
        sub = _png_unfilter(raw[pos:pos + need], ph, stride, bpp)
        pos += need
        out[y0::dy, x0::dx] = sub.reshape(ph, pw, bpp)
    if pos != len(raw):
        raise ValueError(
            f"Adam7 raster size mismatch: consumed {pos} of {len(raw)}"
        )
    return out.reshape(h, w * bpp)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → (h, w[, channels]) array: uint8 for depth 8 (palette
    expanded to RGB), uint16 for depth 16 (big-endian samples
    decoded). Adam7 interlace supported for both depths."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = None
    idat: list[bytes] = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("PNG IHDR missing or malformed")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth not in (8, 16):
        raise ValueError(f"only 8/16-bit PNG supported (depth={depth})")
    if depth == 16 and color == 3:
        # IHDR-only check — reject before paying the decompress
        raise ValueError("16-bit paletted PNG is not legal")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    channels = _PNG_CHANNELS.get(color)
    if channels is None:
        raise ValueError(f"unknown PNG color type {color}")
    if not idat:
        raise ValueError("PNG IDAT missing")
    raw = zlib.decompress(b"".join(idat))
    # filters operate on BYTES with bpp = channels * bytes-per-sample,
    # so 16-bit images reuse the same unfilter with a doubled stride
    bps = depth // 8
    bpp = channels * bps
    if interlace == 1:
        arr = _png_deinterlace(raw, w, h, bpp)
    else:
        arr = _png_unfilter(raw, h, w * bpp, bpp)
    if depth == 16:
        # arr is a fresh C-contiguous uint8 raster; view-as->u2 then
        # byteswap — no extra full-image copy on the decode hot path
        a16 = (
            arr.reshape(-1).view(">u2").astype(np.uint16)
            .reshape((h, w) if channels == 1 else (h, w, channels))
        )
        return a16
    if color == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("paletted PNG without a valid PLTE")
        palette = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = arr.reshape(h, w)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("PNG palette index out of range")
        return palette[idx]
    return arr.reshape((h, w) if channels == 1 else (h, w, channels))


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """uint8 array → PNG bytes (filter 0 scanlines, one IDAT). Shapes
    (h, w) → gray, (h, w, 2) → gray+alpha, (h, w, 3) → RGB,
    (h, w, 4) → RGBA. Round-trips with :func:`decode_png`."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color, channels = 0, 1
        h, w = a.shape
    elif a.ndim == 3 and a.shape[2] in (2, 3, 4):
        channels = a.shape[2]
        color = {2: 4, 3: 2, 4: 6}[channels]
        h, w = a.shape[:2]
    else:
        raise ValueError(
            "expected (h, w), (h, w, 2), (h, w, 3) or (h, w, 4) uint8"
        )
    scan = np.zeros((h, w * channels + 1), np.uint8)
    scan[:, 1:] = a.reshape(h, w * channels)
    body = zlib.compress(scan.tobytes(), level)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", body)
        + chunk(b"IEND", b"")
    )


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


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT, Huffman — the second compressed
# format with a REAL decode path; still zero new dependencies)
# ---------------------------------------------------------------------------
#
# Decoder: SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS walk, canonical-Huffman
# entropy decode (works with ANY embedded table incl. libjpeg's
# Annex-K ones), batched orthonormal IDCT via one einsum over every
# block of a component, sampling-factor chroma upsample, BT.601
# YCbCr→RGB. Baseline 8-bit only: SOF2 (progressive) and 12-bit
# raise. Entropy decoding is a sequential bit walk in Python by
# nature (each coefficient's length depends on the previous bits) —
# the IDCT/color math, where the FLOPs are, is fully vectorized.
#
# Encoder: 4:4:4, quality-scaled Annex-K quant tables, and
# SELF-DEFINED fixed-length canonical Huffman tables (12 DC symbols
# at 4 bits, the full 162-symbol AC alphabet at 8 bits — valid
# canonical tables that never produce the reserved all-ones code, at
# some compression cost vs optimized tables; they are embedded in
# DHT, so any decoder reads them). Lossy: round-trip is
# close-not-exact (tests assert error bounds, unlike PNG/PNM).

JPEG_SOI = b"\xff\xd8"

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)

_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.float64)

_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], np.float64)


def _dct_matrix() -> np.ndarray:
    u, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    c = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    c[0, :] /= np.sqrt(2.0)
    return c


_DCT_C = _dct_matrix()


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any real marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(bytes([0xFF, nxt]), self.pos)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0


class _MarkerHit(Exception):
    def __init__(self, marker: bytes, pos: int):
        self.marker = marker
        self.pos = pos


def _extend(v: int, size: int) -> int:
    """DC/AC magnitude decode (spec F.2.2.1 EXTEND)."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


class _Huff:
    """Canonical Huffman decode table from DHT BITS/HUFFVAL."""

    def __init__(self, bits: list[int], vals: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 (h, w) gray or (h, w, 3) RGB."""
    if payload[:2] != JPEG_SOI:
        raise ValueError("not a JPEG payload")
    pos = 2
    n = len(payload)
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    comps = None
    w = h = 0
    restart_interval = 0
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p:p + 64], np.uint8).astype(
                        np.float64)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p:p + 128], ">u2").astype(
                        np.float64)
                    p += 128
                q = np.zeros(64, np.float64)
                q[_ZIGZAG] = tbl
                qt[tq] = q.reshape(8, 8)
        elif marker == 0xC0:  # SOF0 baseline
            prec = seg[0]
            if prec != 8:
                raise ValueError("only 8-bit baseline JPEG supported")
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tqi = seg[6 + 3 * i:9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tqi}
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG SOF marker 0xFF{marker:02X} "
                "(only baseline sequential SOF0 is implemented)"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = seg[p + 17:p + 17 + nv]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if comps is None:
                raise ValueError("JPEG SOS before SOF0")
            if ns != len(comps):
                # legal baseline files MAY code each component in its
                # own sequential scan (T.81 B.2 scan scripts); this
                # decoder only implements the single fully-interleaved
                # scan — reject loudly rather than return a partial /
                # garbled image (review finding)
                raise ValueError(
                    f"multi-scan baseline JPEG not supported (scan has "
                    f"{ns} of {len(comps)} components)"
                )
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i:3 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 15))
            data_pos = pos + seglen
            return _jpeg_scan(
                payload, data_pos, w, h, comps, scan, qt,
                huff_dc, huff_ac, restart_interval,
            )
        pos += seglen
    raise ValueError("JPEG SOS marker missing")


def _jpeg_scan(payload, pos, w, h, comps, scan, qt, huff_dc, huff_ac,
               ri) -> np.ndarray:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component coefficient stores + plane geometry
    for c, _td, _ta in scan:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.float64)
        c["pred"] = 0
    br = _BitReader(payload, pos)
    mcu = 0
    total = mcux * mcuy
    while mcu < total:
        if ri and mcu and mcu % ri == 0:
            # expect RSTn: byte-align, swallow marker, reset preds
            br.align()
            while payload[br.pos] == 0xFF and payload[br.pos + 1] == 0xFF:
                br.pos += 1
            if payload[br.pos] == 0xFF and 0xD0 <= payload[br.pos + 1] <= 0xD7:
                br.pos += 2
            for c, _td, _ta in scan:
                c["pred"] = 0
        my, mx = divmod(mcu, mcux)
        try:
            for c, td, ta in scan:
                hd, ha = huff_dc[td], huff_ac[ta]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        blk = c["coef"][row * c["bw"] + col]
                        t = hd.decode(br)
                        diff = _extend(br.receive(t), t) if t else 0
                        c["pred"] += diff
                        blk[0] = c["pred"]
                        k = 1
                        while k < 64:
                            sym = ha.decode(br)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            size = sym & 15
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            blk[k] = _extend(br.receive(size), size)
                            k += 1
        except _MarkerHit:
            raise ValueError("JPEG entropy data truncated mid-MCU")
        mcu += 1
    planes = []
    for c, _td, _ta in scan:
        # coef rows are in ZIGZAG order; the quant table is stored in
        # natural order — permute the table, not the data (review
        # finding: multiplying zigzag coefficients by natural-order
        # quant values garbles every non-flat-table file)
        q = qt[c["tq"]].reshape(64)[_ZIGZAG]
        deq = (c["coef"] * q[None, :])
        zz = np.zeros_like(deq)
        zz[:, _ZIGZAG] = deq
        blocks = zz.reshape(-1, 8, 8)
        spatial = np.einsum("ij,bjk,kl->bil", _DCT_C.T, blocks, _DCT_C)
        spatial = np.clip(np.round(spatial) + 128, 0, 255)
        bh, bw = c["bh"], c["bw"]
        plane = (
            spatial.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution by sampling-factor replication
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0].astype(np.uint8)
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


# -- encoder ---------------------------------------------------------------

def _enc_tables():
    """Self-defined canonical Huffman tables: every DC category at 4
    bits, the full AC alphabet at 8 bits (see header comment)."""
    dc_vals = bytes(range(12))
    dc_bits = [0] * 16
    dc_bits[3] = 12  # 12 codes of length 4
    ac_syms = [0x00, 0xF0] + [
        (run << 4) | size for run in range(16) for size in range(1, 11)
    ]
    ac_syms = sorted(set(ac_syms))
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_syms)  # all codes length 8
    return (dc_bits, dc_vals), (ac_bits, bytes(ac_syms))


def _enc_codes(bits, vals):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, length: int, code: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put(pad, (1 << pad) - 1)


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB → baseline JFIF bytes
    (4:4:4, quality-scaled Annex-K quant tables, self-defined Huffman
    tables embedded in DHT). Lossy — round-trips within error bounds,
    not byte-exact."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        planes = [a.astype(np.float64)]
    elif a.ndim == 3 and a.shape[2] == 3:
        rgb = a.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128,
        ]
    else:
        raise ValueError("expected (h, w) or (h, w, 3) uint8 array")
    h, w = a.shape[:2]
    q = max(1, min(100, int(quality)))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    qts = []
    for base in (_QT_LUMA, _QT_CHROMA)[: 2 if len(planes) == 3 else 1]:
        qts.append(
            np.clip(np.floor((base * scale + 50) / 100), 1, 255)
            .reshape(8, 8)
        )

    (dcb, dcv), (acb, acv) = _enc_tables()
    dc_codes = _enc_codes(dcb, dcv)
    ac_codes = _enc_codes(acb, acv)

    bw = _BitWriter()
    preds = [0] * len(planes)
    bh8 = (h + 7) // 8
    bw8 = (w + 7) // 8
    # per-plane blockify + batched DCT + quantize, then the entropy
    # walk (sequential by nature) over integer coefficient rows
    coefs = []
    for pi, plane in enumerate(planes):
        padded = np.pad(plane, ((0, bh8 * 8 - h), (0, bw8 * 8 - w)),
                        mode="edge") - 128.0
        blocks = (
            padded.reshape(bh8, 8, bw8, 8).transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        fdct = np.einsum("ij,bjk,kl->bil", _DCT_C, blocks, _DCT_C.T)
        qtab = qts[min(pi, len(qts) - 1)]
        qz = np.round(fdct / qtab[None, :, :]).astype(np.int64)
        coefs.append(qz.reshape(-1, 64)[:, _ZIGZAG])
    for mcu in range(bh8 * bw8):  # 4:4:4 → MCU = one block per comp
        for pi in range(len(planes)):
            zz = coefs[pi][mcu]
            diff = int(zz[0]) - preds[pi]
            preds[pi] = int(zz[0])
            size = _csize(diff)
            bw.put(*dc_codes[size])
            if size:
                bw.put(size, diff if diff >= 0 else diff + (1 << size) - 1)
            run = 0
            last_nz = np.nonzero(zz[1:])[0]
            last = last_nz[-1] + 1 if len(last_nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    bw.put(*ac_codes[0xF0])
                    run -= 16
                size = _csize(v)
                bw.put(*ac_codes[(run << 4) | size])
                bw.put(size, v if v >= 0 else v + (1 << size) - 1)
                run = 0
            if last < 63:
                bw.put(*ac_codes[0x00])  # EOB
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(JPEG_SOI)
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, qtab in enumerate(qts):
        zzq = np.zeros(64, np.uint8)
        zzq[:] = qtab.reshape(64)[_ZIGZAG].astype(np.uint8)
        out += seg(0xDB, bytes([ti]) + zzq.tobytes())
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, 0x11, min(i, len(qts) - 1)])
    out += seg(0xC0, sof)
    for tc_th, (bits, vals) in ((0x00, (dcb, dcv)), (0x10, (acb, acv))):
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + vals)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# MP4 (ISO BMFF box walk — metadata PROBE, not a codec: the sample
# data stays opaque, but duration/dimensions/sample-count parse for
# real; the frame DECODE is the one remaining stub in this container)
# ---------------------------------------------------------------------------

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _mp4_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        btype = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 0:
            # spec-legal: box extends to end of file (streaming muxers)
            size = end - pos
        elif size == 1:
            # spec-legal: 64-bit largesize follows the type (>4GB mdat)
            if pos + 16 > end:
                raise ValueError(f"truncated MP4 largesize at {pos}")
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            body = pos + 16
        if size < body - pos or pos + size > end:
            raise ValueError(f"malformed MP4 box {btype!r} at {pos}")
        yield btype, body, pos + size
        pos += size


def probe_mp4(payload: bytes) -> dict:
    """ISO-BMFF metadata probe → {width, height, duration_ms,
    timescale, n_samples}. Walks ftyp/moov/mvhd and each trak's
    tkhd/stts; per-track stats are TRACK-SCOPED and the reported
    dims/sample count come from the first track with nonzero
    dimensions (the video track — an audio trak's 0×0 tkhd must not
    overwrite it, nor its samples inflate the count), falling back to
    the first track for audio-only files. Handles size==0
    (to-end-of-file) and size==1 (64-bit largesize) boxes; raises
    ValueError on malformed/truncated structure."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF (MP4) payload")
    out = {"width": 0, "height": 0, "duration_ms": 0,
           "timescale": 0, "n_samples": 0}
    tracks: list[dict] = []
    found_moov = False

    def walk(start: int, end: int, track: dict | None) -> None:
        nonlocal found_moov
        for btype, b0, b1 in _mp4_boxes(payload, start, end):
            if btype in _MP4_CONTAINERS:
                if btype == b"moov":
                    found_moov = True
                if btype == b"trak":
                    track = {"width": 0, "height": 0, "n_samples": 0}
                    tracks.append(track)
                walk(b0, b1, track)
            elif btype == b"mvhd":
                ver = payload[b0]
                if ver == 0:
                    ts, dur = struct.unpack(">II", payload[b0 + 12:b0 + 20])
                else:
                    (ts,) = struct.unpack(">I", payload[b0 + 20:b0 + 24])
                    (dur,) = struct.unpack(">Q", payload[b0 + 24:b0 + 32])
                out["timescale"] = ts
                out["duration_ms"] = int(dur * 1000 // max(ts, 1))
            elif btype == b"tkhd" and track is not None:
                if b1 - b0 < 84:  # v0 body is 84 bytes (v1: 96)
                    raise ValueError("undersized MP4 tkhd box")
                off = b1 - 8  # width/height are the LAST two 16.16s
                wfx, hfx = struct.unpack(">II", payload[off:off + 8])
                track["width"] = wfx >> 16
                track["height"] = hfx >> 16
            elif btype == b"stts" and track is not None:
                if b1 - b0 < 8:
                    raise ValueError("undersized MP4 stts box")
                (n_entries,) = struct.unpack(">I", payload[b0 + 4:b0 + 8])
                if n_entries > (b1 - b0 - 8) // 8:
                    # a corrupt count must not read neighboring boxes'
                    # bytes as sample entries (review finding)
                    raise ValueError(
                        "MP4 stts entry count exceeds its box"
                    )
                p = b0 + 8
                total = 0
                for _ in range(n_entries):
                    cnt, _delta = struct.unpack(">II", payload[p:p + 8])
                    total += cnt
                    p += 8
                track["n_samples"] += total

    walk(0, len(payload), None)
    if not found_moov:
        raise ValueError("MP4 moov box missing")
    chosen = next(
        (t for t in tracks if t["width"] > 0 and t["height"] > 0),
        tracks[0] if tracks else None,
    )
    if chosen is not None:
        out["width"] = chosen["width"]
        out["height"] = chosen["height"]
        out["n_samples"] = chosen["n_samples"]
    return out


def encode_mp4_skeleton(
    width: int, height: int, duration_ms: int, n_samples: int,
    timescale: int = 1000,
) -> bytes:
    """Minimal deterministic ISO-BMFF skeleton (ftyp + moov[mvhd +
    trak[tkhd + mdia[mdhd + minf[stbl[stts]]]]] + empty mdat) that
    :func:`probe_mp4` round-trips exactly. No sample data — the test/
    synth stand-in for a real video payload."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + btype + body

    dur = duration_ms * timescale // 1000
    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                         0x40000000)
    mvhd = box(b"mvhd", struct.pack(">IIIII", 0, 0, 0, timescale, dur)
               + struct.pack(">IHH", 0x10000, 0x100, 0) + b"\x00" * 8
               + matrix + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = box(b"tkhd", struct.pack(">IIIII", 0x7, 0, 0, 1, 0)
               + struct.pack(">I", dur) + b"\x00" * 8
               + struct.pack(">HHHH", 0, 0, 0, 0) + matrix
               + struct.pack(">II", width << 16, height << 16))
    mdhd = box(b"mdhd", struct.pack(">IIIII", 0, 0, 0, timescale, dur)
               + struct.pack(">HH", 0x55C4, 0))
    stts = box(b"stts", struct.pack(">II", 0, 1)
               + struct.pack(">II", n_samples,
                             max(dur // max(n_samples, 1), 1)))
    stbl = box(b"stbl", stts)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom")
    return ftyp + moov + box(b"mdat", b"")

"""Multimodal column plumbing: media spans as opaque references/binary with
typed metadata, processed by Arrow-batched ``mapInPandas``.

The corpus interleaves text and media spans (input_hint). Media payloads are
treated as opaque ``binary`` columns with typed metadata; decode /
feature-extract runs as a ``mapInPandas`` stage so each Arrow batch maps to
one vectorized Python call — the Spark-side plumbing (schema, partitioning,
UDF signature, batch shape) is real and tested.

Two decoders exist behind the ``decoder=`` flag of
``extract_media_features``:

* ``"stub"`` (default): derives deterministic fake features from the
  media_ref digest — no payload bytes needed, SQL-expressible, so the
  Arrow plumbing gets a value-exact DuckDB oracle over the big corpus.
* ``"real"``: a REAL pure-stdlib decoder (``decode_real``) for the two
  container-decodable formats — PNG (zlib inflate + scanline unfilter,
  8-bit gray/gray-alpha/RGB/RGBA, filters 0-4) and WAV (PCM16 via the
  stdlib ``wave`` module). Payload bytes come from a ``payloads``
  DataFrame (media_ref -> binary) joined to the inventory; decode runs
  in the same ``mapInPandas`` stage. Fixture-backed oracle: the
  committed ``fixtures/media_payloads.parquet`` holds encoder-generated
  bytes and ``fixtures/media_decoded_expected.parquet`` holds features
  computed from the GROUND-TRUTH pixels/samples (never through the
  decoder), so the driver row proves codec recovery, and
  ``tests/test_media_real.py`` proves pixel-exact round-trips
  (Hypothesis over sizes x color types x filter choices).

JPEG is decoded by ``decode_jpeg``: PIL (libjpeg) when importable — the
production integration point — else a numpy baseline-sequential decoder
(Huffman entropy decode is per-symbol Python by nature; dequantize/IDCT/
upsample/color-convert are vectorized). Fixtures are encoded AND
ground-truthed by the JVM's ``javax.imageio`` codec (an independent
implementation that ships with every JRE), bridged losslessly over PNG
(``tools/gen_jpeg_fixtures.py``). Formats needing codecs this container
lacks (MP3, H.264 frame-sampling) still raise in ``decode_real`` with
the integration point documented — wiring torchaudio/torchvision changes
one dispatch branch, not the plan.
"""

from __future__ import annotations

import hashlib
import io
import math
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURES_SCHEMA = ("doc_id string, media_ref string, caption string, "
                         "span_offset int, width int, height int, "
                         "feat array<float>")


def media_inventory(docs: DataFrame) -> DataFrame:
    """All media spans with their position — map-only span filter."""
    return (docs.select(
        "doc_id",
        F.explode(F.filter("spans",
                           lambda s: s["kind"] == F.lit("media"))).alias("s"))
        .select("doc_id",
                F.col("s.media_ref").alias("media_ref"),
                F.col("s.text").alias("caption"),
                F.col("s.offset").alias("span_offset")))


# ---------------------------------------------------------------------------
# Real decoders (pure stdlib). PNG: zlib + scanline unfilter. WAV: wave.
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+alpha, RGBA


def _unfilter(raw: bytes, height: int, width: int, ch: int) -> bytes:
    """numpy scanline unfilter (PNG spec 9.2): rows are inherently ordered
    (each depends on the prior row's RECONSTRUCTED bytes), so the outer
    loop is per-row; within a row, filter 0 is a copy, 2 (Up) is one
    vector add, 1 (Sub) collapses to a per-channel cumulative sum mod 256
    (o_i = sum(l_j) mod 256 — mod distributes over the sum), and 3/4
    (Average/Paeth) are serial in x by spec (o_x depends on o_{x-1}) but
    run vectorized across the channel lanes per step. No per-byte Python
    loop remains."""
    rows = np.frombuffer(raw, np.uint8).reshape(height, width * ch + 1)
    filters = rows[:, 0]
    lines = rows[:, 1:].astype(np.int32).reshape(height, width, ch)
    out = np.zeros((height, width, ch), np.int32)
    for y in range(height):
        f, line = int(filters[y]), lines[y]
        prev = out[y - 1] if y else np.zeros_like(line)
        if f == 0:
            out[y] = line
        elif f == 1:
            out[y] = np.cumsum(line, axis=0) & 0xFF
        elif f == 2:
            out[y] = (line + prev) & 0xFF
        elif f == 3:
            o, a = out[y], np.zeros(ch, np.int32)
            for x in range(width):
                a = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
                o[x] = a
        elif f == 4:
            o = out[y]
            a = c = np.zeros(ch, np.int32)
            for x in range(width):
                b = prev[x]
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a,
                                np.where(pb <= pc, b, c))
                a = (line[x] + pred) & 0xFF
                o[x] = a
                c = b
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.astype(np.uint8).tobytes()


def decode_png(payload: bytes):
    """Decode an 8-bit non-interlaced PNG (color types 0/2/4/6, all five
    scanline filters) to raw pixel bytes. CRCs are verified.

    Returns (width, height, channels, pixels) with ``pixels`` the
    row-major unfiltered samples. The inflate is C-speed (zlib); the
    unfilter is numpy-vectorized per scanline (:func:`_unfilter`)."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, bytearray()
    while pos < len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length:
                                             pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, ctype_i, comp, filt, interlace = ihdr
    if depth != 8 or ctype_i not in _PNG_CHANNELS or interlace != 0 \
            or comp != 0 or filt != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} color={ctype_i} "
            f"interlace={interlace}); wire PIL here for full coverage")
    ch = _PNG_CHANNELS[ctype_i]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG data length mismatch")
    return width, height, ch, _unfilter(raw, height, width, ch)


# ---------------------------------------------------------------------------
# JPEG: baseline sequential (ITU T.81), PIL when importable.
# ---------------------------------------------------------------------------

JPEG_SIG = b"\xff\xd8"

# zigzag scan order (T.81 Figure 5): _JPEG_ZZ[k] = natural index of the
# k-th zigzag coefficient
_JPEG_ZZ = []
for _s in range(15):
    for _i in (range(_s + 1) if _s % 2 else reversed(range(_s + 1))):
        _r, _c = _i, _s - _i
        if _r < 8 and _c < 8:
            _JPEG_ZZ.append(_r * 8 + _c)

# 1D DCT-II basis: A[u, x] = (1/2) c(u) cos((2x+1)u pi/16); 2D IDCT of a
# coefficient block F is A.T @ F @ A (T.81 A.3.3)
_IDCT_A = np.array([[0.5 * (1 / math.sqrt(2) if u == 0 else 1.0)
                     * math.cos((2 * x + 1) * u * math.pi / 16)
                     for x in range(8)] for u in range(8)])


class _JpegBitReader:
    """MSB-first bit reader over one entropy-coded segment (byte stuffing
    already removed by the segment splitter)."""

    def __init__(self, data: bytes):
        self.d, self.pos, self.buf, self.n = data, 0, 0, 0

    def bits(self, k: int) -> int:
        while self.n < k:
            # past-the-end reads pad with 1-bits (T.81 F.2.2.5 allows the
            # final EOB's code to run off the segment)
            b = self.d[self.pos] if self.pos < len(self.d) else 0xFF
            self.pos += 1
            self.buf = (self.buf << 8) | b
            self.n += 8
        self.n -= k
        v = (self.buf >> self.n) & ((1 << k) - 1)
        return v

    def huff(self, table: dict) -> int:
        code, length = 0, 0
        while length < 17:
            code = (code << 1) | self.bits(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _jpeg_huff_table(counts, symbols) -> dict:
    """Canonical Huffman: {(length, code): symbol} (T.81 C.2)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _split_scan(data: bytes, start: int):
    """Entropy-coded data from ``start``: strip 0xFF00 stuffing, split at
    RSTn markers. Returns (segments, pos_after_scan)."""
    segs, cur, i = [], bytearray(), start
    while i < len(data):
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nb = data[i + 1] if i + 1 < len(data) else 0xD9
        if nb == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nb <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def _decode_jpeg_baseline(payload: bytes):
    """Baseline sequential JPEG (SOF0/SOF1, Huffman, 8-bit, any subsampling,
    restart markers) -> (width, height, channels, pixels).

    Pure Python + numpy: the entropy decode is per-symbol Python by nature
    (a serial Huffman bitstream), but everything after it — dequantize,
    the 2D IDCT over ALL blocks of a component at once (two einsum matrix
    products against the DCT basis), replication chroma upsample, YCbCr
    -> RGB — is vectorized numpy. PIL, when importable, takes the dispatch
    before this (see :func:`decode_jpeg`); this is the no-dependency
    fallback proven against the JVM's javax.imageio codec
    (tests/test_media_jpeg.py)."""
    if payload[:2] != JPEG_SIG:
        raise ValueError("not a JPEG payload")
    qt, huff_dc, huff_ac = {}, {}, {}
    frame, restart_interval = None, 0
    i = 2
    while i < len(payload):
        if payload[i] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", payload[i + 2:i + 4])
        seg = payload[i + 4:i + 2 + seg_len]
        i += 2 + seg_len
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq:  # 16-bit table
                    vals = struct.unpack(f">64H", seg[p + 1:p + 129])
                    p += 129
                else:
                    vals = seg[p + 1:p + 65]
                    p += 65
                t = np.zeros(64, np.int32)
                t[_JPEG_ZZ] = list(vals)
                qt[tq] = t.reshape(8, 8)
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline/extended huffman
            depth, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if depth != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "non-baseline JPEG (progressive/lossless/arithmetic); "
                "wire PIL.Image.open here for full coverage")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = seg[p + 1:p + 17]
                n = sum(counts)
                symbols = seg[p + 17:p + 17 + n]
                (huff_ac if tc else huff_dc)[th] = \
                    _jpeg_huff_table(counts, symbols)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            by_id = {c["id"]: c for c in frame["comps"]}
            for c in range(ns):
                cid, tda = seg[1 + 2 * c:3 + 2 * c]
                comp = by_id[cid]
                scan.append({**comp, "dc": huff_dc[tda >> 4],
                             "ac": huff_ac[tda & 15],
                             "q": qt[comp["tq"]]})
            segs, _ = _split_scan(payload, i)
            return _jpeg_decode_scan(frame, scan, segs, restart_interval)
        # all other segments (APPn, COM, ...) are skipped
    raise ValueError("JPEG has no SOS scan")


def _jpeg_fancy_h2(p: np.ndarray) -> np.ndarray:
    """libjpeg h2v1 fancy (triangular) horizontal x2 upsample
    (jdsample.c h2v1_fancy_upsample): out[2i] = (3*s[i] + s[i-1] + 1) >> 2,
    out[2i+1] = (3*s[i] + s[i+1] + 2) >> 2, neighbors edge-clamped (the
    clamped formula reduces to an exact copy at the borders)."""
    left = np.concatenate([p[:, :1], p[:, :-1]], axis=1)
    right = np.concatenate([p[:, 1:], p[:, -1:]], axis=1)
    out = np.empty((p.shape[0], 2 * p.shape[1]), np.int32)
    out[:, 0::2] = (3 * p + left + 1) >> 2
    out[:, 1::2] = (3 * p + right + 2) >> 2
    return out


def _jpeg_fancy_h2v2(p: np.ndarray) -> np.ndarray:
    """libjpeg h2v2 fancy upsample (jdsample.c h2v2_fancy_upsample):
    vertical 3:1 triangular blend into a 4x-scaled column sum, then the
    horizontal 3:1 blend with the +8/+7 rounding of the 16x scale."""
    up = np.concatenate([p[:1], p[:-1]], axis=0)
    down = np.concatenate([p[1:], p[-1:]], axis=0)
    cs = np.empty((2 * p.shape[0], p.shape[1]), np.int32)
    cs[0::2] = 3 * p + up
    cs[1::2] = 3 * p + down
    left = np.concatenate([cs[:, :1], cs[:, :-1]], axis=1)
    right = np.concatenate([cs[:, 1:], cs[:, -1:]], axis=1)
    out = np.empty((cs.shape[0], 2 * cs.shape[1]), np.int32)
    out[:, 0::2] = (3 * cs + left + 8) >> 4
    out[:, 1::2] = (3 * cs + right + 7) >> 4
    return out


def _jpeg_upsample(p: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Chroma upsample matching libjpeg defaults (what PIL and
    javax.imageio produce): fancy triangular for the 2x2 and 2x1 cases,
    pixel replication for anything else (libjpeg int_upsample). libjpeg
    selects fancy only when downsampled_width > 2 (jdsample.c method
    selection) — narrower planes use plain replication, matched here
    (found by the randomized sweep: a 1-wide chroma plane diverged)."""
    if (fy, fx) == (1, 1):
        return p
    if (fy, fx) == (2, 2):
        if p.shape[1] > 2:
            return _jpeg_fancy_h2v2(p)
        return p.repeat(2, axis=0).repeat(2, axis=1)
    if (fy, fx) == (1, 2):
        return _jpeg_fancy_h2(p) if p.shape[1] > 2 \
            else p.repeat(2, axis=1)
    return p.repeat(fy, axis=0).repeat(fx, axis=1)


def _jpeg_decode_scan(frame, scan, segs, restart_interval):
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcus = mcus_x * mcus_y
    coefs = [np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.float64)
             for c in scan]
    preds = [0] * len(scan)
    seg_i = 0
    reader = _JpegBitReader(segs[0])
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            seg_i += 1
            reader = _JpegBitReader(segs[seg_i])
            preds = [0] * len(scan)
        my, mx = divmod(m, mcus_x)
        for ci, c in enumerate(scan):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    block = coefs[ci][my * c["v"] + by, mx * c["h"] + bx]
                    t = reader.huff(c["dc"])
                    diff = _jpeg_extend(reader.bits(t), t) if t else 0
                    preds[ci] += diff
                    block[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = reader.huff(c["ac"])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        block[_JPEG_ZZ[k]] = _jpeg_extend(reader.bits(s), s)
                        k += 1
    planes = []
    for ci, c in enumerate(scan):
        by_, bx_ = coefs[ci].shape[:2]
        # dequantize + IDCT over every block of the component at once
        f = coefs[ci].reshape(by_, bx_, 8, 8) * c["q"]
        sp = np.einsum("ux,mnuv,vy->mnxy", _IDCT_A, f, _IDCT_A) + 128.0
        sp = np.clip(np.round(sp), 0, 255).astype(np.int32)
        plane = sp.transpose(0, 2, 1, 3).reshape(by_ * 8, bx_ * 8)
        # crop the block padding to the component's downsampled dims
        # FIRST (libjpeg upsamples downsampled_width columns, so edge
        # clamping must see the true edge, not the pad), then upsample,
        # then crop to the image
        dh = -(-h * c["v"] // vmax)
        dw = -(-w * c["h"] // hmax)
        plane = _jpeg_upsample(plane[:dh, :dw], vmax // c["v"],
                               hmax // c["h"])
        planes.append(plane[:h, :w].astype(np.float64))
    if len(planes) == 1:
        return w, h, 1, planes[0].astype(np.uint8).tobytes()
    if len(planes) != 3:
        raise NotImplementedError("only 1- or 3-component JPEG supported")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    rgb = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return w, h, 3, rgb.tobytes()


def decode_jpeg(payload: bytes):
    """JPEG -> (width, height, channels, pixels). Dispatch: PIL (libjpeg,
    C-speed — the production integration point) when importable, else the
    baseline decoder above. Both are validated against the JVM's
    javax.imageio codec on the committed fixtures."""
    try:
        from PIL import Image  # noqa: PLC0415 — optional dependency probe
    except ImportError:
        return _decode_jpeg_baseline(payload)
    img = Image.open(io.BytesIO(payload))
    img = img.convert("L") if img.mode in ("L", "1", "I;16") \
        else img.convert("RGB")
    ch = 1 if img.mode == "L" else 3
    return img.size[0], img.size[1], ch, img.tobytes()


def decode_wav(payload: bytes):
    """Decode a PCM16 WAV to (sample_rate, n_frames, channel-0 samples)."""
    with wave.open(io.BytesIO(payload)) as w:
        if w.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        nch, rate, nframes = w.getnchannels(), w.getframerate(), \
            w.getnframes()
        frames = w.readframes(nframes)
    samples = np.frombuffer(frames, dtype="<i2")[::nch]
    return rate, nframes, samples.tolist()


def image_grid_features(pixels, width: int, height: int, channels: int,
                        feat_dim: int = 8):
    """Mean luminance over a 2 x (feat_dim/2) cell grid, in [0, 1].

    Shared between the decoder and the fixture generator so the expected
    values in fixtures/media_decoded_expected.parquet are bit-identical:
    each cell is ONE integer sum and ONE float division (no accumulation-
    order sensitivity). Gray uses 3*v so every color type runs the same
    /(3*255*n) formula. Cell sums are numpy int64 reductions over the
    (H, W) luminance plane — no per-pixel Python."""
    rows, cols = 2, feat_dim // 2
    px = np.asarray(bytearray(pixels) if not isinstance(pixels, np.ndarray)
                    else pixels, dtype=np.int64)
    a = px.reshape(height, width, channels)
    lum = a[:, :, :3].sum(axis=2) if channels >= 3 else 3 * a[:, :, 0]
    feat = []
    for gy in range(rows):
        y0, y1 = gy * height // rows, (gy + 1) * height // rows
        for gx in range(cols):
            x0, x1 = gx * width // cols, (gx + 1) * width // cols
            n = (y1 - y0) * (x1 - x0)
            feat.append(
                round(int(lum[y0:y1, x0:x1].sum()) / (3 * 255.0 * n), 6)
                if n > 0 else 0.0)
    return feat


def audio_segment_rms(samples, feat_dim: int = 8):
    """RMS over feat_dim equal segments, normalized to [0, 1]; one integer
    square-sum + one division + one sqrt per segment (bit-deterministic,
    shared with the fixture generator). The square-sum is a numpy int64
    reduction — exact (max |s| = 32768 over any realistic segment length
    stays far under 2^63) and loop-free."""
    s = np.asarray(samples, dtype=np.int64)
    n = len(s)
    feat = []
    for i in range(feat_dim):
        s0, s1 = i * n // feat_dim, (i + 1) * n // feat_dim
        if s1 <= s0:
            feat.append(0.0)
            continue
        sq = int((s[s0:s1] * s[s0:s1]).sum())
        feat.append(round(math.sqrt(sq / (s1 - s0)) / 32767.0, 6))
    return feat


def decode_real(payload: bytes, feat_dim: int = 8):
    """Real media decode: (width, height, feat) for PNG payloads,
    (sample_rate, n_frames, feat) for WAV payloads.

    JPEG payloads go through :func:`decode_jpeg` (PIL when importable,
    else the numpy baseline decoder — validated against javax.imageio).
    PNG/WAV are pure stdlib. Formats that need external codecs raise
    here with the integration point named (MP3/H.264 ->
    torchaudio/torchvision — one new dispatch branch each)."""
    if payload[:8] == PNG_SIG:
        w, h, ch, px = decode_png(payload)
        return w, h, image_grid_features(px, w, h, ch, feat_dim)
    if payload[:2] == JPEG_SIG:
        w, h, ch, px = decode_jpeg(payload)
        return w, h, image_grid_features(px, w, h, ch, feat_dim)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        rate, nframes, samples = decode_wav(payload)
        return rate, nframes, audio_segment_rms(samples, feat_dim)
    raise NotImplementedError(
        "payload format needs an external codec (MP3 -> torchaudio, "
        "H.264 frame-sampling -> torchvision); wire it in this dispatch")


def _fake_decode(media_ref: str, feat_dim: int = 8):
    h = hashlib.md5(media_ref.encode()).digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    feat = [((h[i % 16] / 255.0) * 2 - 1) for i in range(feat_dim)]
    return width, height, feat


def extract_media_features(docs: DataFrame, feat_dim: int = 8,
                           decoder: str = "stub",
                           payloads: DataFrame | None = None) -> DataFrame:
    """mapInPandas media feature extraction. Partitioning: inherits the doc
    partitioning (media spans stay co-located with their document); each
    Arrow batch is decoded vectorized.

    decoder="real" joins the inventory to a ``payloads`` DataFrame
    (media_ref, payload binary) and runs :func:`decode_real` on the actual
    bytes. The join is a plain equi-join on media_ref — at scale the
    payload side is the big one, so Spark shuffles the KB-scale inventory
    to it (AQE picks broadcast when the inventory is small enough)."""
    if decoder == "real":
        if payloads is None:
            raise ValueError("decoder='real' needs a payloads DataFrame")
        inv = media_inventory(docs)
        # decode each referenced payload ONCE (semi-join prunes the payload
        # scan to referenced refs), then fan the features out to the spans
        feats = decode_payload_features(
            payloads.join(inv.select("media_ref").distinct(), "media_ref"),
            feat_dim)
        return inv.select("doc_id", "media_ref", "span_offset") \
                  .join(feats, "media_ref")
    inv = media_inventory(docs)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(m, feat_dim) for m in pdf["media_ref"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "caption": pdf["caption"],
                "span_offset": pdf["span_offset"],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "feat": [d[2] for d in decoded],
            })

    return inv.mapInPandas(decode_batches, MEDIA_FEATURES_SCHEMA)


DECODED_SCHEMA = ("media_ref string, width bigint, height bigint, "
                  "feat array<double>")


def decode_payload_features(payloads: DataFrame,
                            feat_dim: int = 8) -> DataFrame:
    """Real decode over a (media_ref, payload binary) DataFrame via
    ``mapInPandas``: one Arrow batch of payloads per Python call, each
    payload decoded with :func:`decode_real` (PNG/WAV, pure stdlib).

    Map-only — no shuffle; payload bytes never leave the partition that
    scanned them, only the fixed-width (media_ref, dims, feat_dim floats)
    rows come back through Arrow."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_real(bytes(p), feat_dim)
                       for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_ref": pdf["media_ref"],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "feat": [d[2] for d in decoded],
            })

    return payloads.select("media_ref", "payload") \
                   .mapInPandas(decode_batches, DECODED_SCHEMA)

"""Generate the committed media-decode fixtures (seed-fixed, no network).

Writes two parquet files under fixtures/:

* ``media_payloads.parquet`` (media_ref, payload binary) — PNG bytes built
  by the encoder below (8-bit gray/gray+alpha/RGB/RGBA, per-row filters
  cycling through all five types) and PCM16 WAV bytes (mono + stereo,
  noise and tone signals).
* ``media_decoded_expected.parquet`` (media_ref, width, height, dim, val)
  — the features the real decoder must produce, computed from the
  GROUND-TRUTH pixel/sample arrays directly (never through
  ``decode_real``), exploded to scalar rows so the driver's float
  normalization applies per value.

The encoder is this module's independent half of the round-trip proof:
``tests/test_media_real.py`` asserts pixel-exact recovery; the committed
expected parquet is the driver-visible oracle for ``media_decode_real``.

Usage: python tools/gen_media_fixtures.py   (idempotent, seed-fixed)
"""

from __future__ import annotations

import math
import os
import random
import struct
import sys
import wave
import zlib
from io import BytesIO

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aopwiki_spark.media import (  # noqa: E402
    audio_segment_rms, image_grid_features,
)

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")
SEED = 20260817


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(pixels, width: int, height: int, channels: int,
               filters=None) -> bytes:
    """Encode raw 8-bit samples to a spec-valid PNG. ``filters`` gives the
    per-row filter type (default: cycle 0..4 so a decoder must implement
    all five)."""
    ctype = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    stride = width * channels
    if filters is None:
        filters = [y % 5 for y in range(height)]
    raw = bytearray()
    for y in range(height):
        f = filters[y]
        raw.append(f)
        base = y * stride
        for x in range(stride):
            v = pixels[base + x]
            a = pixels[base + x - channels] if x >= channels else 0
            b = pixels[base + x - stride] if y > 0 else 0
            if f == 0:
                e = v
            elif f == 1:
                e = v - a
            elif f == 2:
                e = v - b
            elif f == 3:
                e = v - ((a + b) >> 1)
            else:
                c = pixels[base + x - stride - channels] \
                    if (y > 0 and x >= channels) else 0
                e = v - _paeth(a, b, c)
            raw.append(e & 0xFF)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def encode_wav(samples_per_channel, rate: int) -> bytes:
    """Encode PCM16 channels (list of per-channel sample lists) to WAV."""
    nch = len(samples_per_channel)
    n = len(samples_per_channel[0])
    interleaved = [samples_per_channel[c][i]
                   for i in range(n) for c in range(nch)]
    buf = BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(interleaved)}h", *interleaved))
    return buf.getvalue()


def build_fixtures():
    rng = random.Random(SEED)
    payloads, expected = [], []

    def expect(ref, width, height, feat):
        for d, v in enumerate(feat):
            expected.append((ref, width, height, d, v))

    # PNGs: every color type x a spread of sizes (incl. 1-pixel edge rows)
    cases = [(1, 1, 1), (1, 7, 3), (2, 5, 9), (3, 16, 16), (3, 33, 7),
             (4, 8, 24), (3, 40, 40), (1, 12, 2), (4, 21, 13), (2, 3, 30)]
    for i, (ch, w, h) in enumerate(cases):
        px = [rng.randrange(256) for _ in range(w * h * ch)]
        ref = f"png:{i:02d}:{ch}ch:{w}x{h}"
        payloads.append((ref, encode_png(px, w, h, ch)))
        expect(ref, w, h, image_grid_features(px, w, h, ch))

    # WAVs: mono noise, stereo (decoder takes channel 0), short tone
    wav_cases = [
        ("wav:00:mono-noise", 8000, 1,
         lambda i, c: rng.randrange(-32768, 32768)),
        ("wav:01:stereo", 16000, 2,
         lambda i, c: int(12000 * math.sin(i / (40.0 + 10 * c)))),
        ("wav:02:tone", 8000, 1,
         lambda i, c: int(30000 * math.sin(i / 8.0))),
    ]
    for ref, rate, nch, gen in wav_cases:
        nframes = rng.randrange(900, 2600)
        chans = [[gen(i, c) for i in range(nframes)] for c in range(nch)]
        payloads.append((ref, encode_wav(chans, rate)))
        expect(ref, rate, nframes, audio_segment_rms(chans[0]))

    return payloads, expected


def main():
    payloads, expected = build_fixtures()
    pq.write_table(pa.table({
        "media_ref": pa.array([p[0] for p in payloads], pa.string()),
        "payload": pa.array([p[1] for p in payloads], pa.binary()),
    }), os.path.join(FIXTURES, "media_payloads.parquet"))
    pq.write_table(pa.table({
        "media_ref": pa.array([e[0] for e in expected], pa.string()),
        "width": pa.array([e[1] for e in expected], pa.int64()),
        "height": pa.array([e[2] for e in expected], pa.int64()),
        "dim": pa.array([e[3] for e in expected], pa.int64()),
        "val": pa.array([e[4] for e in expected], pa.float64()),
    }), os.path.join(FIXTURES, "media_decoded_expected.parquet"))
    print(f"wrote {len(payloads)} payloads, {len(expected)} expected rows "
          f"under {FIXTURES}")


if __name__ == "__main__":
    main()

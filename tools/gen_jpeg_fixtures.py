"""Generate the committed JPEG decode fixtures (seed-fixed, no network).

JPEG is lossy, so the PNG/WAV trick (expected features straight from the
ground-truth pixels) doesn't apply — a canonical decode is needed. This
container has one independent of our code: the JVM's ``javax.imageio``
codec (ships with every JRE; the Spark py4j gateway exposes it). PNG is
the lossless bridge in both directions, so no per-pixel py4j traffic:

  python pixels -> encode_png -> ImageIO.read -> ImageIO JPEG write
    = fixtures/media_jpeg_payloads.parquet (media_ref, payload)
  payload -> ImageIO.read -> ImageIO PNG write -> our decode_png
    -> image_grid_features = fixtures/media_jpeg_expected.parquet

``tests/test_media_jpeg.py`` then asserts our ``decode_jpeg`` (PIL when
importable, else the numpy baseline decoder) reproduces the expected
features within the documented inter-codec tolerance (max +-2 per sample:
IDCT + fixed-point color-convert rounding), and re-derives the ground
truth in-test through the JVM to pin the committed parquets.

Usage: python tools/gen_jpeg_fixtures.py   (idempotent, seed-fixed;
needs a JVM via pyspark — run where Spark runs)
"""

from __future__ import annotations

import math
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aopwiki_spark.media import image_grid_features  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")
SEED = 20260818
QUALITY = 0.92


def jvm_of(spark):
    return spark._jvm


def imageio_encode_jpeg(jvm, pixels, w: int, h: int, ch: int,
                        quality: float = QUALITY,
                        progressive: bool = False) -> bytes:
    """Encode raw pixels to JPEG through javax.imageio (PNG bridge in)."""
    from gen_media_fixtures import encode_png
    png = encode_png(pixels, w, h, ch)
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(png))
    baos = jvm.java.io.ByteArrayOutputStream()
    writer = jvm.javax.imageio.ImageIO \
        .getImageWritersByFormatName("jpg").next()
    param = writer.getDefaultWriteParam()
    param.setCompressionMode(jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(float(quality))
    if progressive:
        param.setProgressiveMode(
            jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
    ios.flush()
    writer.dispose()
    return bytes(baos.toByteArray())


def imageio_decode(jvm, payload: bytes):
    """Decode any image payload through javax.imageio (PNG bridge out);
    returns (width, height, channels, pixel bytes) via our pixel-exact
    PNG decoder."""
    from aopwiki_spark.media import decode_png
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(payload))
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.imageio.ImageIO.write(img, "png", baos)
    return decode_png(bytes(baos.toByteArray()))


def _ycbcr_to_rgb(y, cb, cr):
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return [max(0, min(255, int(round(v)))) for v in (r, g, b)]


def build_images():
    """Deterministic (ref, pixels, w, h, ch) roster: gray + color, smooth
    + noise, even + odd (partial-MCU) dims, 1-pixel edge case."""
    rng = random.Random(SEED)
    imgs = []
    # gray: gradient, odd dims, noise, 1x1
    w, h = 40, 24
    imgs.append(("jpg:00:gray-gradient:40x24",
                 [int(127 + 100 * math.sin(x / 9.0) * math.cos(y / 7.0))
                  for y in range(h) for x in range(w)], w, h, 1))
    w, h = 17, 9
    imgs.append(("jpg:01:gray-odd:17x9",
                 [(x * 13 + y * 7) % 256 for y in range(h)
                  for x in range(w)], w, h, 1))
    w, h = 32, 32
    imgs.append(("jpg:02:gray-noise:32x32",
                 [rng.randrange(256) for _ in range(w * h)], w, h, 1))
    imgs.append(("jpg:03:gray-1x1", [200], 1, 1, 1))
    # color: luma ramp at constant chroma, chroma gradient, noise, odd dims
    w, h = 32, 32
    px = [v for y in range(h) for x in range(w)
          for v in _ycbcr_to_rgb(60 + 140 * (x + y) / (w + h), 110, 150)]
    imgs.append(("jpg:04:color-constchroma:32x32", px, w, h, 3))
    w, h = 48, 16
    px = [v for y in range(h) for x in range(w)
          for v in (int(255 * x / w), int(255 * y / h),
                    int(127 + 120 * math.sin((x + y) / 11.0)))]
    imgs.append(("jpg:05:color-gradient:48x16", px, w, h, 3))
    w, h = 21, 13
    imgs.append(("jpg:06:color-noise-odd:21x13",
                 [rng.randrange(256) for _ in range(w * h * 3)], w, h, 3))
    return imgs


def build_fixtures(jvm):
    payloads, expected = [], []
    for ref, px, w, h, ch in build_images():
        payload = imageio_encode_jpeg(jvm, px, w, h, ch)
        gw, gh, gch, gt = imageio_decode(jvm, payload)
        assert (gw, gh, gch) == (w, h, ch), ref
        feat = image_grid_features(gt, gw, gh, gch)
        payloads.append((ref, payload))
        for d, v in enumerate(feat):
            expected.append((ref, gw, gh, d, v))
    return payloads, expected


def main():
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[2]")
             .appName("gen-jpeg-fixtures").getOrCreate())
    payloads, expected = build_fixtures(jvm_of(spark))
    pq.write_table(pa.table({
        "media_ref": pa.array([p[0] for p in payloads], pa.string()),
        "payload": pa.array([p[1] for p in payloads], pa.binary()),
    }), os.path.join(FIXTURES, "media_jpeg_payloads.parquet"))
    pq.write_table(pa.table({
        "media_ref": pa.array([e[0] for e in expected], pa.string()),
        "width": pa.array([e[1] for e in expected], pa.int64()),
        "height": pa.array([e[2] for e in expected], pa.int64()),
        "dim": pa.array([e[3] for e in expected], pa.int64()),
        "val": pa.array([e[4] for e in expected], pa.float64()),
    }), os.path.join(FIXTURES, "media_jpeg_expected.parquet"))
    print(f"wrote {len(payloads)} payloads, {len(expected)} expected rows "
          f"under {FIXTURES}")


if __name__ == "__main__":
    main()

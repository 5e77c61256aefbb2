"""JPEG decode: the baseline decoder vs the JVM's javax.imageio codec.

Two independent implementations, cross-checked three ways: (1) the
committed fixture payloads decode to the committed ImageIO-derived
ground-truth features within the inter-codec tolerance; (2) that ground
truth is re-derived IN-TEST through the JVM, pinning the committed
parquets to the independent codec; (3) fresh randomized images round-trip
ImageIO-encode -> both decoders with bounded per-pixel difference.

Tolerances (measured, see media.py): javax.imageio is libjpeg6b-lineage —
integer "islow" IDCT, fixed-point color convert, fancy chroma upsample.
Our decoder matches the upsampling exactly and floats the rest: worst-case
per-sample delta is 1 (gray) / 2 (color), so 8-pixel-cell mean-luminance
features differ by < 2/255 ~= 0.008.
"""

import os
import sys

import duckdb
import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tools"))

from aopwiki_spark.media import (  # noqa: E402
    _decode_jpeg_baseline, _split_scan, decode_jpeg, decode_real,
    image_grid_features,
)
from gen_jpeg_fixtures import (  # noqa: E402
    FIXTURES, build_images, imageio_decode, imageio_encode_jpeg, jvm_of,
)

FEAT_ATOL = 0.01
# measured worst case over a 108-combo dims x quality x content sweep:
# gray 1 (integer-islow vs float IDCT rounding), color 3 (that rounding
# compounded through fancy chroma upsample + fixed-point color convert)
PIXEL_TOL = {1: 1, 3: 3}

try:
    import PIL  # noqa: F401
    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _load_fixtures():
    pay = duckdb.sql(
        f"select media_ref, payload from "
        f"read_parquet('{FIXTURES}/media_jpeg_payloads.parquet') "
        "order by media_ref").fetchall()
    exp = {}
    for ref, w, h, d, v in duckdb.sql(
            f"select media_ref, width, height, dim, val from "
            f"read_parquet('{FIXTURES}/media_jpeg_expected.parquet') "
            "order by media_ref, dim").fetchall():
        exp.setdefault(ref, (w, h, []))[2].append(v)
    return [(r, bytes(p)) for r, p in pay], exp


def test_committed_jpegs_decode_to_ground_truth_features():
    """decode_real (JPEG dispatch) reproduces the ImageIO-derived features
    on every committed payload within the inter-codec tolerance."""
    payloads, exp = _load_fixtures()
    assert len(payloads) == 7 and set(exp) == {r for r, _ in payloads}
    for ref, payload in payloads:
        w, h, feat = decode_real(payload)
        ew, eh, efeat = exp[ref]
        assert (w, h) == (ew, eh), ref
        assert np.allclose(feat, efeat, atol=FEAT_ATOL), \
            (ref, feat, efeat)


def test_committed_ground_truth_reproduced_by_jvm_codec(spark):
    """The committed expected parquet IS what the independent javax.imageio
    codec produces from the committed payloads — re-derived in-test, exact
    (guards against regenerating payloads without expected, or editing the
    shared feature function)."""
    jvm = jvm_of(spark)
    payloads, exp = _load_fixtures()
    for ref, payload in payloads:
        w, h, ch, px = imageio_decode(jvm, payload)
        ew, eh, efeat = exp[ref]
        assert (w, h) == (ew, eh), ref
        assert image_grid_features(px, w, h, ch) == efeat, ref


def test_baseline_decoder_matches_imageio_pixelwise(spark):
    """Fresh (non-committed) images: ImageIO-encode, decode through BOTH
    codecs, compare per pixel. Runs the full matrix the fixture roster
    covers plus a couple of extra shapes."""
    jvm = jvm_of(spark)
    extra = [("x:gray-31x2", [i % 256 for i in range(62)], 31, 2, 1),
             ("x:color-8x9", [(i * 37) % 256 for i in range(8 * 9 * 3)],
              8, 9, 3)]
    for ref, px, w, h, ch in build_images() + extra:
        payload = imageio_encode_jpeg(jvm, px, w, h, ch)
        gw, gh, gch, gt = imageio_decode(jvm, payload)
        mw, mh, mch, mine = _decode_jpeg_baseline(payload)
        assert (gw, gh, gch) == (mw, mh, mch) == (w, h, ch), ref
        d = np.abs(np.frombuffer(gt, np.uint8).astype(int)
                   - np.frombuffer(mine, np.uint8).astype(int))
        assert d.max() <= PIXEL_TOL[ch], (ref, int(d.max()))


def test_baseline_decoder_randomized_sweep_vs_imageio(spark):
    """Seeded randomized matrix: dims straddling MCU boundaries x gray/color
    x smooth/noise content x quality extremes, every image cross-decoded
    against the JVM codec. Catches partial-MCU, DC-chain and quant-table
    edge cases the curated roster could miss."""
    import random
    jvm = jvm_of(spark)
    rng = random.Random(4242)
    dims = [(1, 5), (7, 8), (8, 7), (15, 16), (16, 17), (9, 25), (33, 10)]
    for quality in (0.3, 0.75, 1.0):
        for w, h in rng.sample(dims, 4):
            for ch in (1, 3):
                if rng.random() < 0.5:  # smooth
                    px = [min(255, (x * 7 + y * 5 + c) % 256 // 2 + 64)
                          for y in range(h) for x in range(w)
                          for c in range(ch)]
                else:  # noise
                    px = [rng.randrange(256) for _ in range(w * h * ch)]
                payload = imageio_encode_jpeg(jvm, px, w, h, ch,
                                              quality=quality)
                gw, gh, gch, gt = imageio_decode(jvm, payload)
                mw, mh, mch, mine = _decode_jpeg_baseline(payload)
                assert (gw, gh, gch) == (mw, mh, mch) == (w, h, ch)
                d = np.abs(np.frombuffer(gt, np.uint8).astype(int)
                           - np.frombuffer(mine, np.uint8).astype(int))
                assert d.max() <= PIXEL_TOL[ch], \
                    (w, h, ch, quality, int(d.max()))


def test_progressive_jpeg_names_the_pil_seam(spark):
    """Non-baseline JPEG raises NotImplementedError pointing at the PIL
    dispatch (unless PIL is importable, in which case it just decodes)."""
    jvm = jvm_of(spark)
    _, px, w, h, ch = build_images()[0]
    prog = imageio_encode_jpeg(jvm, px, w, h, ch, progressive=True)
    with pytest.raises(NotImplementedError, match="PIL"):
        _decode_jpeg_baseline(prog)
    if HAVE_PIL:
        gw, gh, gch, _ = decode_jpeg(prog)
        assert (gw, gh, gch) == (w, h, ch)


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not installed in this "
                    "container; the PIL dispatch branch runs wherever it is")
def test_pil_branch_matches_ground_truth():
    payloads, exp = _load_fixtures()
    for ref, payload in payloads:
        w, h, ch, px = decode_jpeg(payload)
        ew, eh, efeat = exp[ref]
        assert (w, h) == (ew, eh), ref
        assert np.allclose(image_grid_features(px, w, h, ch), efeat,
                           atol=FEAT_ATOL), ref


def test_decode_payload_features_spark_jpeg(spark):
    """JPEG payloads flow through the same Arrow mapInPandas decode stage
    as PNG/WAV (decode_payload_features dispatches on magic bytes)."""
    from aopwiki_spark.media import decode_payload_features
    payloads = spark.read.parquet(
        os.path.join(FIXTURES, "media_jpeg_payloads.parquet"))
    got = {r["media_ref"]: (r["width"], r["height"], list(r["feat"]))
           for r in decode_payload_features(payloads).collect()}
    _, exp = _load_fixtures()
    assert set(got) == set(exp)
    for ref, (w, h, efeat) in exp.items():
        gw, gh, gfeat = got[ref]
        assert (gw, gh) == (w, h), ref
        assert np.allclose(gfeat, efeat, atol=FEAT_ATOL), ref


def test_split_scan_stuffing_and_restarts():
    """Entropy-segment splitter: 0xFF00 stuffing unstuffed, RSTn markers
    split segments, the terminating marker ends the scan."""
    data = (b"\x01\xff\x00\x02"      # stuffed 0xFF inside segment 0
            b"\xff\xd0"              # RST0
            b"\x03\x04"
            b"\xff\xd7"              # RST7
            b"\x05"
            b"\xff\xd9tail")         # EOI terminates
    segs, end = _split_scan(data, 0)
    assert segs == [b"\x01\xff\x02", b"\x03\x04", b"\x05"]
    assert data[end:end + 2] == b"\xff\xd9"


def test_truncated_or_bogus_jpeg_raises_valueerror():
    with pytest.raises(ValueError):
        _decode_jpeg_baseline(b"\xff\xd8\xff\xe0\x00\x00" + b"\x00" * 16)
    with pytest.raises(ValueError):
        _decode_jpeg_baseline(b"not a jpeg")
    # well-formed headers but no SOS
    with pytest.raises(ValueError, match="no SOS"):
        _decode_jpeg_baseline(b"\xff\xd8\xff\xd9")

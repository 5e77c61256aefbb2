"""Real media decode: pixel/sample-exact round-trips and the fixture oracle.

The encoder (tools/gen_media_fixtures.py) and decoder (aopwiki_spark.media)
are written independently against the PNG/WAV specs; Hypothesis drives the
round-trip over sizes x color types x per-row filter choices, and the
committed fixture pair (payloads + ground-truth features) is re-checked
end-to-end through the Spark mapInPandas stage.
"""

import os
import sys

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tools"))

from aopwiki_spark.media import (  # noqa: E402
    decode_png, decode_real, decode_wav,
)
from gen_media_fixtures import (  # noqa: E402
    FIXTURES, build_fixtures, encode_png, encode_wav,
)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 24), st.integers(1, 24),
       st.sampled_from([1, 2, 3, 4]), st.randoms(use_true_random=False))
def test_png_roundtrip_pixel_exact(w, h, ch, rnd):
    px = bytes(rnd.randrange(256) for _ in range(w * h * ch))
    filters = [rnd.randrange(5) for _ in range(h)]
    gw, gh, gch, got = decode_png(encode_png(px, w, h, ch, filters))
    assert (gw, gh, gch) == (w, h, ch)
    assert got == px


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 500), st.sampled_from([1, 2]),
       st.randoms(use_true_random=False))
def test_wav_roundtrip_sample_exact(n, nch, rnd):
    chans = [[rnd.randrange(-32768, 32768) for _ in range(n)]
             for _ in range(nch)]
    rate, frames, samples = decode_wav(encode_wav(chans, 8000))
    assert (rate, frames) == (8000, n)
    assert list(samples) == chans[0]


def test_png_crc_corruption_detected():
    px = bytes(range(48))
    payload = bytearray(encode_png(px, 4, 4, 3))
    payload[40] ^= 0xFF  # flip a byte inside a chunk body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_unsupported_format_names_integration_point():
    # MP3 (ID3 container): the one format family still needing an external
    # codec — JPEG is dispatched to decode_jpeg now (test_media_jpeg.py)
    with pytest.raises(NotImplementedError, match="torchaudio"):
        decode_real(b"ID3\x04\x00" + b"\x00" * 64)


def test_decode_real_matches_ground_truth_fixtures():
    """Every committed payload decodes to the features computed from the
    ground-truth pixels/samples (which never passed through the decoder)."""
    payloads, expected = build_fixtures()
    want = {}
    for ref, width, height, dim, val in expected:
        want.setdefault(ref, [width, height, []])[2].append((dim, val))
    assert len(payloads) == len(want)
    for ref, payload in payloads:
        a, b, feat = decode_real(payload)
        w_a, w_b, w_feat = want[ref]
        assert (a, b) == (w_a, w_b), ref
        assert feat == [v for _, v in sorted(w_feat)], ref


def test_committed_fixtures_current():
    """The committed parquets match what the generator produces now —
    guards against editing the shared feature functions without
    regenerating fixtures."""
    payloads, expected = build_fixtures()
    on_disk = duckdb.sql(
        f"select media_ref, payload from "
        f"read_parquet('{FIXTURES}/media_payloads.parquet') "
        f"order by media_ref").fetchall()
    assert sorted(payloads) == [(r, bytes(p)) for r, p in on_disk]
    exp_disk = duckdb.sql(
        f"select media_ref, width, height, dim, val from "
        f"read_parquet('{FIXTURES}/media_decoded_expected.parquet') "
        f"order by media_ref, dim").fetchall()
    assert sorted(expected) == [tuple(r) for r in exp_disk]


def test_decode_payload_features_spark(spark):
    """The mapInPandas stage reproduces the ground-truth features through
    Arrow (the same path the media_decode_real driver row exercises)."""
    from aopwiki_spark.media import decode_payload_features
    payloads = spark.read.parquet(
        os.path.join(FIXTURES, "media_payloads.parquet"))
    got = {r["media_ref"]: (r["width"], r["height"], list(r["feat"]))
           for r in decode_payload_features(payloads).collect()}
    _, expected = build_fixtures()
    want = {}
    for ref, width, height, dim, val in expected:
        want.setdefault(ref, (width, height, []))[2].append(val)
    assert got == want

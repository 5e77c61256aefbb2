"""Measure real-media decode throughput through the engine's Arrow
mapInPandas stage (aopwiki_spark.media.decode_payload_features).

Round-4 verdict flagged the PNG scanline unfilter as the repo's one
per-pixel Python loop; round 5 vectorized it (numpy per-scanline) and
added the baseline JPEG decoder. This tool puts a measured number on the
decode path: it tiles the committed fixture payloads (PNG/WAV/JPEG — real
encoder-produced bytes) into a payload table of a requested size, runs the
decode stage, and reports MB/s and payloads/s per format.

Usage: python tools/decode_throughput.py [n_copies]   (default 2000)
Lives in tools/ so the bench src_key is untouched.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")


def main():
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    from aopwiki_spark.media import decode_payload_features
    from aopwiki_spark.session import get_spark
    spark = get_spark("decode-throughput",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      shuffle_partitions=32)
    rows = []
    for path, fmt_of in (("media_payloads.parquet",
                          lambda r: r.split(":")[0]),
                         ("media_jpeg_payloads.parquet", lambda r: "jpg")):
        for ref, payload in duckdb.sql(
                f"select media_ref, payload from "
                f"read_parquet('{FIXTURES}/{path}')").fetchall():
            rows.append((fmt_of(ref), ref, bytes(payload)))
    out = {}
    for fmt in ("png", "wav", "jpg"):
        sub = [(f"{ref}#{i}", p) for f, ref, p in rows if f == fmt
               for i in range(n_copies)]
        nbytes = sum(len(p) for _, p in sub)
        df = spark.createDataFrame(sub, ["media_ref", "payload"]) \
                  .repartition(32).persist()
        df.count()  # materialize input before timing the decode stage
        t0 = time.time()
        decode_payload_features(df).write.format("noop") \
            .mode("overwrite").save()
        wall = time.time() - t0
        df.unpersist()
        out[fmt] = {"payloads": len(sub), "mb": round(nbytes / 1e6, 1),
                    "sec": round(wall, 2),
                    "payloads_per_sec": round(len(sub) / wall, 1),
                    "mb_per_sec": round(nbytes / 1e6 / wall, 1)}
        print(fmt, out[fmt], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

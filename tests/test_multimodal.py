"""Exact-value unit tests for the binary-column (multimodal) plumbing.

The decode step is a deterministic fake over the synthetic IMG1/VID1
container format (no image libs in this container — see
operators/multimodal.py); these tests pin the byte-level contract:
header layout, Arrow batch round-trip of binary payloads, per-frame
explode, and sampling stride.
"""

from __future__ import annotations

from etl_city_directories_spark.operators.multimodal import _round4

import hashlib

from pyspark.sql import functions as F

from etl_city_directories_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


def _expected_pixels(text: str, n_bytes: int) -> bytes:
    stream = (
        hashlib.md5(text.encode()).hexdigest()
        + hashlib.md5((text + "#2").encode()).hexdigest()
    )
    reps = int(n_bytes * 2 / 64 + 1)
    return bytes.fromhex((stream * reps)[: n_bytes * 2])


def test_image_payload_container_format(spark):
    row = (
        mm.images_table(spark, SF)
        .filter(F.col("doc_id") == 3)
        .collect()[0]
    )
    p = bytes(row.payload)
    assert p[:4] == b"IMG1"
    width = int.from_bytes(p[4:8], "big")
    height = int.from_bytes(p[8:12], "big")
    assert (width, height) == (3 % 8 + 8, 3 % 5 + 8)
    assert int.from_bytes(p[12:16], "big") == 1
    assert len(p) == 16 + width * height


def test_image_meta_matches_python_decode(spark):
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < 5)
        .collect()
    }
    metas = {
        r.doc_id: r
        for r in mm.mm_image_meta(spark, SF).filter(F.col("doc_id") < 5).collect()
    }
    assert set(metas) == set(docs)
    for doc_id, text in docs.items():
        m = metas[doc_id]
        width, height = doc_id % 8 + 8, doc_id % 5 + 8
        assert (m.format, m.width, m.height, m.channels) == ("IMG1", width, height, 1)
        assert m.n_bytes == 16 + width * height
        pixels = _expected_pixels(text, width * height)
        assert m.mean_pixel == _round4(sum(pixels) / len(pixels))


def test_audio_meta_matches_python_decode(spark):
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < 4)
        .collect()
    }
    metas = {
        r.doc_id: r
        for r in mm.mm_audio_meta(spark, SF).filter(F.col("doc_id") < 4).collect()
    }
    assert set(metas) == set(docs)
    for doc_id, text in docs.items():
        m = metas[doc_id]
        n_samples = doc_id % 64 + 64
        assert (m.format, m.sample_rate, m.n_samples) == ("AUD1", 8000, n_samples)
        assert m.duration_ms == _round4(n_samples * 1000.0 / 8000)
        pcm = _expected_pixels(text, n_samples)
        assert m.mean_amp == _round4(sum(abs(s - 128) for s in pcm) / len(pcm))


def test_frame_sample_stride_and_hashes(spark):
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < 3)
        .collect()
    }
    frames = (
        mm.mm_frame_sample(spark, SF)
        .filter(F.col("doc_id") < 3)
        .orderBy("doc_id", "frame_idx")
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in docs.items():
        n_frames = doc_id % 5 + 4
        expected_idx = list(range(0, n_frames, mm.FRAME_SAMPLE_EVERY))
        rows = by_doc[doc_id]
        assert [r.frame_idx for r in rows] == expected_idx
        body = _expected_pixels(text, n_frames * 24)
        for r in rows:
            frame = body[r.frame_idx * 24 : (r.frame_idx + 1) * 24]
            # content id = md5 over the LOWERCASE HEX of the frame bytes
            # (DuckDB's md5 takes VARCHAR only, so the oracle-checkable
            # form hashes the hex text)
            assert r.frame_md5 == hashlib.md5(frame.hex().encode()).hexdigest()
            assert r.frame_mean == _round4(sum(frame) / len(frame))
    # 32-byte pixel period vs 24-byte frames: sampled frames differ
    multi = [rs for rs in by_doc.values() if len(rs) > 1]
    assert multi and all(
        len({r.frame_md5 for r in rs}) > 1 for rs in multi
    )

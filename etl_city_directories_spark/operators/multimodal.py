"""Multimodal (binary-column) plumbing: image metadata + frame sampling.

The engine treats image/audio/video as opaque ``binary`` columns with
typed metadata, decoded by Arrow-batched ``mapInPandas`` UDFs — the
100 TB shape is: binary payloads stay columnar end-to-end (parquet →
Arrow → pandas bytes), decode is embarrassingly parallel map-side work
with no shuffle, and the UDF emits a typed schema Catalyst can prune.

The container has no image/audio libs (PIL/ffmpeg), so the decode step
is a DETERMINISTIC FAKE over a synthetic container format (see
``_payload_col``) — the Spark-side plumbing (binary schema, batch
iteration, header parse, per-frame explode) is real and tested. A real
deployment swaps ``_decode_pixels`` for the library call; the
import-try gate shows where.

Synthetic formats (all byte offsets big-endian):
- IMG1: magic ``IMG1`` (4B) | width u32 | height u32 | channels u32 |
  width*height pixel bytes.
- VID1: magic ``VID1`` (4B) | n_frames u32 | frame_size u32 |
  n_frames × frame_size frame bytes.
- AUD1: magic ``AUD1`` (4B) | sample_rate u32 | n_samples u32 |
  n_samples 8-bit PCM bytes.

Payloads are synthesized JVM-side from ``documents`` (md5-derived pixel
bytes keyed on text, dimensions keyed on doc_id) so every stage before
the UDF is whole-stage-codegen'd and the fixture needs no binary files
on disk.
"""

from __future__ import annotations

from collections.abc import Iterator
import math
import sys

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from etl_city_directories_spark.sources.tables import load_table_parallel

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

FRAME_SAMPLE_EVERY = 2


def _hex_u32(n: Column) -> Column:
    """8-hex-char (4-byte) big-endian encoding of a small int column."""
    return F.lpad(F.hex(n), 8, "0")


def _pixel_hex(n_bytes: Column) -> Column:
    """Deterministic pixel bytes: a 32-byte-period md5 stream repeated to
    n_bytes (period chosen to misalign with the 24-byte frame size so
    sampled frames are distinct)."""
    stream = F.concat(
        F.md5(F.col("text")), F.md5(F.concat(F.col("text"), F.lit("#2")))
    )
    reps = (n_bytes * 2 / F.lit(64) + 1).cast("int")
    return F.substring(F.repeat(stream, reps), 1, n_bytes * 2)


def _image_payload() -> Column:
    width = (F.col("doc_id") % 8 + 8).cast("int")
    height = (F.col("doc_id") % 5 + 8).cast("int")
    header = F.concat(
        F.lit("494D4731"),  # "IMG1"
        _hex_u32(width),
        _hex_u32(height),
        _hex_u32(F.lit(1)),
    )
    return F.unhex(F.concat(header, _pixel_hex(width * height)))


def _video_payload() -> Column:
    n_frames = (F.col("doc_id") % 5 + 4).cast("int")
    frame_size = F.lit(24)
    header = F.concat(
        F.lit("56494431"),  # "VID1"
        _hex_u32(n_frames),
        _hex_u32(frame_size),
    )
    return F.unhex(F.concat(header, _pixel_hex(n_frames * frame_size)))


def _audio_payload() -> Column:
    sample_rate = F.lit(8000)
    n_samples = (F.col("doc_id") % 64 + 64).cast("int")
    header = F.concat(
        F.lit("41554431"),  # "AUD1"
        _hex_u32(sample_rate),
        _hex_u32(n_samples),
    )
    return F.unhex(F.concat(header, _pixel_hex(n_samples)))


def images_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload binary) pseudo-image table."""
    return load_table_parallel(spark, sf_dir, "documents").select(
        "doc_id", _image_payload().alias("payload")
    )


def videos_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table_parallel(spark, sf_dir, "documents").select(
        "doc_id", _video_payload().alias("payload")
    )


def audio_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table_parallel(spark, sf_dir, "documents").select(
        "doc_id", _audio_payload().alias("payload")
    )


# ---------------------------------------------------------------------------
# decode stubs (the part a real deployment replaces with PIL/ffmpeg)
# ---------------------------------------------------------------------------

def _round4(x: float) -> float:
    """4-dp HALF-UP rounding (non-negative inputs): Python's built-in
    round() is banker's (half-to-even) while the DuckDB oracle's ROUND
    is half-away — an exact .00005 boundary would disagree. floor(x*1e4
    + 0.5) pins both engines to the same value."""
    return math.floor(x * 10000.0 + 0.5) / 10000.0


_PIL_NOTICE_EMITTED = False


def _decode_pixels(payload: bytes) -> tuple[str, int, int, int, bytes]:
    """Parse the IMG1 container. Real impl: PIL.Image.open(BytesIO(...)).

    The deterministic container parse is ALWAYS the primary path: these
    payloads are IMG1 fixtures, not real JPEG/PNG bytes, so PIL could not
    decode them anyway. If PIL happens to be installed we log once (never
    raise) that a real deployment would swap in PIL.Image.open here.
    """
    global _PIL_NOTICE_EMITTED
    if HAVE_PIL and not _PIL_NOTICE_EMITTED:  # pragma: no cover
        _PIL_NOTICE_EMITTED = True
        print(
            "[multimodal] PIL detected; still using the deterministic "
            "IMG1 container parse (swap in PIL.Image.open for real images)",
            file=sys.stderr,
        )
    magic = payload[:4].decode("ascii")
    width = int.from_bytes(payload[4:8], "big")
    height = int.from_bytes(payload[8:12], "big")
    channels = int.from_bytes(payload[12:16], "big")
    return magic, width, height, channels, payload[16:]


IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("mean_pixel", DoubleType()),
    ]
)


def _image_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            magic, width, height, channels, pixels = _decode_pixels(payload)
            # numpy fold, not a per-byte Python loop; integer sum is
            # exact in float64 so the value matches the scalar form
            mean_pixel = float(np.frombuffer(pixels, dtype=np.uint8).mean())
            rows.append(
                (
                    int(doc_id),
                    magic,
                    width,
                    height,
                    channels,
                    len(payload),
                    _round4(mean_pixel),
                )
            )
        yield pd.DataFrame(
            rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields]
        )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
        StructField("frame_mean", DoubleType()),
    ]
)


def _frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Every FRAME_SAMPLE_EVERY-th frame of each VID1 payload, exploded."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            n_frames = int.from_bytes(payload[4:8], "big")
            frame_size = int.from_bytes(payload[8:12], "big")
            body = payload[12:]
            frames = np.frombuffer(body, dtype=np.uint8).reshape(
                n_frames, frame_size
            )
            means = frames.mean(axis=1)  # vectorized per-frame fold
            for i in range(0, n_frames, FRAME_SAMPLE_EVERY):
                rows.append(
                    (
                        int(doc_id),
                        n_frames,
                        i,
                        body[i * frame_size : (i + 1) * frame_size],
                        _round4(float(means[i])),
                    )
                )
        yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])


AUDIO_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("duration_ms", DoubleType()),
        StructField("mean_amp", DoubleType()),
    ]
)


def _audio_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """AUD1 header parse + amplitude stub (real impl: soundfile/librosa)."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            sample_rate = int.from_bytes(payload[4:8], "big")
            n_samples = int.from_bytes(payload[8:12], "big")
            pcm = np.frombuffer(payload[12:], dtype=np.uint8)
            mean_amp = float(np.abs(pcm.astype(np.int32) - 128).mean())
            rows.append(
                (
                    int(doc_id),
                    payload[:4].decode("ascii"),
                    sample_rate,
                    n_samples,
                    _round4(n_samples * 1000.0 / sample_rate),
                    _round4(mean_amp),
                )
            )
        yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_META_SCHEMA.fields])


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------

def mm_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-stub feature extraction over the binary image column."""
    return images_table(spark, sf_dir).mapInPandas(
        _image_meta_batches, IMAGE_META_SCHEMA
    )


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing over the binary video column (1-in-N)."""
    return (
        videos_table(spark, sf_dir)
        .mapInPandas(_frame_sample_batches, FRAME_SCHEMA)
        .select(
            "doc_id",
            "n_frames",
            "frame_idx",
            F.md5(F.lower(F.hex(F.col("frame_bytes")))).alias("frame_md5"),
            "frame_mean",
        )
    )


def mm_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-stub metadata extraction over the binary audio column."""
    return audio_table(spark, sf_dir).mapInPandas(
        _audio_meta_batches, AUDIO_META_SCHEMA
    )


def mm_caption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-caption pairing + image-content dedup — the sample-prep
    step of a multimodal training pipeline: every (image, caption) row
    keyed by a content hash of the image payload, collapsed to one row
    per distinct image with its caption count and the earliest
    caption.

    The content key is md5 over the full payload hex (header + pixel
    stream), computed JVM-side before any UDF; the groupBy shuffles on
    the key only. Unlike the decode stubs this IS oracle-checked: the
    key derivation is deterministic string math both engines replay,
    so the pairing/dedup logic gets the full hash-compare treatment.
    """
    docs = load_table_parallel(spark, sf_dir, "documents")
    width = (F.col("doc_id") % 8 + 8).cast("int")
    height = (F.col("doc_id") % 5 + 8).cast("int")
    header = F.concat(
        F.lit("494D4731"), _hex_u32(width), _hex_u32(height), _hex_u32(F.lit(1))
    )
    payload_hex = F.concat(header, _pixel_hex(width * height))
    pairs = docs.select(
        "doc_id",
        F.col("text").alias("caption"),
        F.md5(payload_hex).alias("image_key"),
        (width * height).cast("bigint").alias("n_pixels"),
    )
    return (
        pairs.groupBy("image_key")
        .agg(
            F.count(F.lit(1)).alias("n_captions"),
            F.min("doc_id").alias("first_doc"),
            F.min_by("caption", "doc_id").alias("first_caption"),
            F.max("n_pixels").alias("n_pixels"),
        )
        .orderBy("image_key")
    )


def mm_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over the binary columns in PURE JVM expressions —
    no UDF anywhere: each container's header fields are parsed out of
    the payload bytes with substring/hex/conv and rolled up per
    modality. This is the fast path for payload inventory at 100 TB
    (count/bytes/dimension audits) — whole-stage-codegen'd scan, one
    O(modalities)-row shuffle; the mapInPandas decode stubs are only
    for the pixel math the JVM can't express.

    Oracle-checked: the DuckDB twin computes the same stats from the
    payload GENERATION formulas, so a wrong byte in either the JVM
    encoder or the JVM header parse breaks the hash match — the
    encode→parse round trip is what's being verified.
    """
    def u32(off: int) -> Column:
        return F.conv(
            F.hex(F.substring(F.col("payload"), off, 4)), 16, 10
        ).cast("bigint")

    parts = []
    for name, table_fn in (
        ("audio", audio_table),
        ("image", images_table),
        ("video", videos_table),
    ):
        parts.append(
            table_fn(spark, sf_dir).select(
                F.lit(name).alias("modality"),
                F.length("payload").cast("bigint").alias("n_bytes"),
                u32(5).alias("dim1"),
                u32(9).alias("dim2"),
            )
        )
    allp = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return (
        allp.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_payloads"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("dim1").alias("sum_dim1"),
            F.sum("dim2").alias("sum_dim2"),
        )
        .orderBy("modality")
    )


MM_SHARD_BYTES = 4096


def mm_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard packing for the BINARY modalities: every
    payload lands in a byte-budget shard per modality, deterministic
    md5 order — the export step that turns a multimodal corpus into
    dataloader-consumable tar shards (shard_manifest's text twin).

    Pure JVM: sizes come from length(payload) on the scan, the prefix
    sum is one window per modality key (no global ordering), and the
    oracle replays the packing from the payload GENERATION formulas —
    so a wrong byte in any encoder shifts a shard boundary and breaks
    the hash."""
    from pyspark.sql import Window

    parts = []
    for name, table_fn in (
        ("audio", audio_table),
        ("image", images_table),
        ("video", videos_table),
    ):
        parts.append(
            table_fn(spark, sf_dir).select(
                F.lit(name).alias("modality"),
                "doc_id",
                F.length("payload").cast("bigint").alias("n_bytes"),
            )
        )
    allp = parts[0].unionByName(parts[1]).unionByName(parts[2])
    w = (
        Window.partitionBy("modality")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = allp.withColumn(
        "shard_id",
        F.floor(
            (F.sum("n_bytes").over(w) - F.col("n_bytes"))
            / F.lit(MM_SHARD_BYTES)
        ).cast("bigint"),
    )
    return (
        assigned.groupBy("modality", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_payloads"),
            F.sum("n_bytes").alias("shard_bytes"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("modality", "shard_id")
    )


QUERIES = {
    "mm_payload_stats": mm_payload_stats,
    "mm_shard_pack": mm_shard_pack,
    "mm_image_meta": mm_image_meta,
    "mm_frame_sample": mm_frame_sample,
    "mm_audio_meta": mm_audio_meta,
    "mm_caption_pairs": mm_caption_pairs,
}

# The decode stubs are rows-only per SURVEY §2.C: the binary container
# format is synthetic, so replaying byte-level decode in SQL would test
# DuckDB's string ops, not the engine (exact-value pytest coverage in
# tests/test_multimodal.py). mm_caption_pairs IS oracle-checked — its
# content-key derivation is plain deterministic string math.
ORACLES: dict[str, str] = {
    "mm_shard_pack": f"""
        WITH sized AS (
          SELECT 'audio' AS modality, doc_id,
                 (12 + (doc_id % 64 + 64))::BIGINT AS n_bytes
          FROM documents
          UNION ALL
          SELECT 'image', doc_id,
                 (16 + (doc_id % 8 + 8) * (doc_id % 5 + 8))::BIGINT
          FROM documents
          UNION ALL
          SELECT 'video', doc_id,
                 (12 + (doc_id % 5 + 4) * 24)::BIGINT
          FROM documents
        ),
        assigned AS (
          SELECT modality, doc_id, n_bytes,
                 ((SUM(n_bytes) OVER (
                     PARTITION BY modality
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) - n_bytes) // {MM_SHARD_BYTES})::BIGINT AS shard_id
          FROM sized
        )
        SELECT modality, shard_id,
               COUNT(*) AS n_payloads,
               SUM(n_bytes)::BIGINT AS shard_bytes,
               MIN(doc_id) AS min_doc,
               MAX(doc_id) AS max_doc
        FROM assigned
        GROUP BY modality, shard_id
        ORDER BY modality, shard_id
    """,
    # replays the generation formulas (not the bytes): a wrong byte in
    # the JVM encode or header parse breaks the match
    "mm_payload_stats": """
        SELECT * FROM (
          SELECT 'audio' AS modality,
                 COUNT(*) AS n_payloads,
                 SUM(12 + (doc_id % 64 + 64))::BIGINT AS total_bytes,
                 SUM(8000)::BIGINT AS sum_dim1,
                 SUM(doc_id % 64 + 64)::BIGINT AS sum_dim2
          FROM documents
          UNION ALL
          SELECT 'image',
                 COUNT(*),
                 SUM(16 + (doc_id % 8 + 8) * (doc_id % 5 + 8))::BIGINT,
                 SUM(doc_id % 8 + 8)::BIGINT,
                 SUM(doc_id % 5 + 8)::BIGINT
          FROM documents
          UNION ALL
          SELECT 'video',
                 COUNT(*),
                 SUM(12 + (doc_id % 5 + 4) * 24)::BIGINT,
                 SUM(doc_id % 5 + 4)::BIGINT,
                 SUM(24)::BIGINT
          FROM documents
        ) ORDER BY modality
    """,
    "mm_caption_pairs": """
        WITH pairs AS (
          SELECT doc_id,
                 text AS caption,
                 md5(
                   '494D4731'
                   || printf('%08X', CAST(doc_id % 8 + 8 AS INT))
                   || printf('%08X', CAST(doc_id % 5 + 8 AS INT))
                   || '00000001'
                   || substring(
                        repeat(
                          md5(text) || md5(text || '#2'),
                          CAST((doc_id % 8 + 8) * (doc_id % 5 + 8) * 2 / 64.0
                               + 1 AS INT)
                        ), 1,
                        (doc_id % 8 + 8) * (doc_id % 5 + 8) * 2)
                 ) AS image_key,
                 ((doc_id % 8 + 8) * (doc_id % 5 + 8))::BIGINT AS n_pixels
          FROM documents
        )
        SELECT image_key,
               COUNT(*) AS n_captions,
               MIN(doc_id) AS first_doc,
               arg_min(caption, doc_id) AS first_caption,
               MAX(n_pixels) AS n_pixels
        FROM pairs
        GROUP BY image_key
        ORDER BY image_key
    """,
}


# The decode stubs parse a fully deterministic synthetic container, so
# their outputs ARE oracle-expressible: DuckDB rebuilds the payload hex
# from the generation formulas (same construction mm_caption_pairs
# already hash-checks) and re-derives every header field and byte-level
# mean. These three keys graduate from rows-only to hash-checked; the
# only rows-only remainder is genuinely non-replayable (fetch side
# effects, hOCR fixtures, HLL/quantile sketches).
_PX_HEX = (
    "substring(repeat(md5(text) || md5(text || '#2'), "
    "CAST({n} * 2 / 64.0 + 1 AS INT)), 1, {n} * 2)"
)

ORACLES["mm_image_meta"] = f"""
    WITH base AS (
      SELECT doc_id, text,
             (doc_id % 8 + 8)::INT AS w,
             (doc_id % 5 + 8)::INT AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, {_PX_HEX.format(n="(w * h)")} AS hexs
      FROM base
    )
    SELECT doc_id,
           'IMG1' AS format,
           w AS width, h AS height, 1::INT AS channels,
           (16 + w * h)::BIGINT AS n_bytes,
           ROUND(list_sum(list_transform(range(1, w * h + 1),
                   i -> CAST(('0x' || substring(hexs, 2 * i - 1, 2))
                             AS INT)))::DOUBLE / (w * h), 4) AS mean_pixel
    FROM px
"""

ORACLES["mm_audio_meta"] = f"""
    WITH base AS (
      SELECT doc_id, text, (doc_id % 64 + 64)::INT AS n
      FROM documents
    ),
    px AS (
      SELECT doc_id, n, {_PX_HEX.format(n="n")} AS hexs FROM base
    )
    SELECT doc_id,
           'AUD1' AS format,
           8000::INT AS sample_rate,
           n AS n_samples,
           ROUND(n * 1000.0 / 8000, 4) AS duration_ms,
           ROUND(list_sum(list_transform(range(1, n + 1),
                   i -> abs(CAST(('0x' || substring(hexs, 2 * i - 1, 2))
                                 AS INT) - 128)))::DOUBLE / n, 4) AS mean_amp
    FROM px
"""

ORACLES["mm_frame_sample"] = f"""
    WITH base AS (
      SELECT doc_id, text, (doc_id % 5 + 4)::INT AS nf
      FROM documents
    ),
    px AS (
      SELECT doc_id, nf, {_PX_HEX.format(n="(nf * 24)")} AS hexs
      FROM base
    ),
    frames AS (
      SELECT doc_id, nf, unnest(range(0, nf, {FRAME_SAMPLE_EVERY})) AS i,
             hexs
      FROM px
    )
    SELECT doc_id,
           nf AS n_frames,
           i::INT AS frame_idx,
           md5(lower(substring(hexs, i * 48 + 1, 48))) AS frame_md5,
           ROUND(list_sum(list_transform(range(1, 25),
                   j -> CAST(('0x' || substring(hexs, i * 48 + 2 * j - 1, 2))
                             AS INT)))::DOUBLE / 24, 4) AS frame_mean
    FROM frames
"""


def mm_dedup_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binary dedup report across the three modality tables.

    THE first pass of any 100 TB multimodal ingest: hash every payload
    byte-for-byte (md5 over the binary column — content-addressed
    storage semantics), group identical blobs, and report per modality
    how many payloads collapse and how many bytes dedup saves. All
    JVM-side expression eval on the binary column: hex+md5 per row map-
    side, one groupBy on the 32-char digest (the shuffle carries digests
    and byte counts, never payloads), one dimension-sized rollup.

    The digest is md5(hex(payload)) rather than md5(payload) only
    because DuckDB's md5() is VARCHAR-only — same discriminating power,
    and the Spark path still reads and hashes the actual binary column.
    Duplicates arise exactly when two docs share text AND header params
    (doc_id mod pattern), so the group structure is a real corpus
    property, not an artifact.
    """
    parts = []
    for modality, tbl in (
        ("audio", audio_table(spark, sf_dir)),
        ("image", images_table(spark, sf_dir)),
        ("video", videos_table(spark, sf_dir)),
    ):
        parts.append(
            tbl.select(
                F.lit(modality).alias("modality"),
                F.md5(F.hex("payload")).alias("digest"),
                F.length("payload").alias("n_bytes"),
            )
        )
    keyed = parts[0].unionByName(parts[1]).unionByName(parts[2])
    groups = keyed.groupBy("modality", "digest").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("n_bytes").alias("n_bytes"),
    )
    return (
        groups.groupBy("modality")
        .agg(
            F.sum("n_copies").cast("bigint").alias("n_payloads"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.when(F.col("n_copies") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_groups"),
            F.sum(F.col("n_bytes") * F.col("n_copies"))
            .cast("bigint")
            .alias("bytes_total"),
            F.sum("n_bytes").cast("bigint").alias("bytes_dedup"),
        )
        .select(
            "modality",
            "n_payloads",
            F.col("n_distinct").cast("bigint").alias("n_distinct"),
            "n_dup_groups",
            "bytes_total",
            "bytes_dedup",
        )
        .orderBy("modality")
    )


QUERIES["mm_dedup_bytes"] = mm_dedup_bytes

# hex replay of the payload builders (_image_payload/_video_payload/
# _audio_payload above): header words via printf('%08X'), pixel stream
# = the 32-byte-period md5 stream repeated and cut, everything
# uppercased because Spark's hex(binary) upcases. floor() before the
# INT cast — DuckDB CAST(double AS INT) rounds where Spark truncates.
_MM_PIXELS = (
    "substr(repeat(md5(text) || md5(text || '#2'), "
    "CAST(floor({nb} * 2 / 64.0 + 1) AS INT)), 1, {nb} * 2)"
)
_MM_HEX = {
    "image": (
        "'494D4731' || printf('%08X', doc_id % 8 + 8)"
        " || printf('%08X', doc_id % 5 + 8) || '00000001' || "
        + _MM_PIXELS.format(nb="((doc_id % 8 + 8) * (doc_id % 5 + 8))")
    ),
    "video": (
        "'56494431' || printf('%08X', doc_id % 5 + 4) || '00000018' || "
        + _MM_PIXELS.format(nb="((doc_id % 5 + 4) * 24)")
    ),
    "audio": (
        "'41554431' || '00001F40' || printf('%08X', doc_id % 64 + 64) || "
        + _MM_PIXELS.format(nb="(doc_id % 64 + 64)")
    ),
}
_MM_SIZES = {
    "image": "16 + (doc_id % 8 + 8) * (doc_id % 5 + 8)",
    "video": "12 + (doc_id % 5 + 4) * 24",
    "audio": "12 + (doc_id % 64 + 64)",
}
_MM_KEYED = "\n      UNION ALL\n".join(
    f"      SELECT '{m}' AS modality, md5(upper({_MM_HEX[m]})) AS digest,"
    f" ({_MM_SIZES[m]})::BIGINT AS n_bytes FROM documents"
    for m in ("audio", "image", "video")
)

ORACLES["mm_dedup_bytes"] = f"""
    WITH keyed AS (
{_MM_KEYED}
    ),
    groups AS (
      SELECT modality, digest, COUNT(*) AS n_copies, MIN(n_bytes) AS n_bytes
      FROM keyed GROUP BY 1, 2
    )
    SELECT modality,
           SUM(n_copies)::BIGINT AS n_payloads,
           COUNT(*)::BIGINT AS n_distinct,
           SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END)::BIGINT
             AS n_dup_groups,
           SUM(n_bytes * n_copies)::BIGINT AS bytes_total,
           SUM(n_bytes)::BIGINT AS bytes_dedup
    FROM groups GROUP BY 1 ORDER BY 1
"""


def mm_payload_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-value Shannon entropy per modality — the corruption and
    compressibility screen binary ingest runs before spending decode
    or storage budget (near-0 bits = stuck/blank payloads, ~8 bits =
    already-compressed or encrypted; a healthy synthetic md5 stream
    sits high).

    All JVM-side: hex the binary column once, explode byte positions
    (O(total payload bytes), map-side), one (modality, byte) count
    shuffle — 3×256 cells — then entropy over the cell grid with each
    p·ln p quantized to DECIMAL(18,8) before the sum. Output is 3
    rows: byte-count, distinct byte values, entropy in bits.
    """
    parts = []
    for modality, tbl in (
        ("audio", audio_table(spark, sf_dir)),
        ("image", images_table(spark, sf_dir)),
        ("video", videos_table(spark, sf_dir)),
    ):
        parts.append(
            tbl.select(
                F.lit(modality).alias("modality"), F.hex("payload").alias("hx")
            )
        )
    hx = parts[0].unionByName(parts[1]).unionByName(parts[2])
    bytes_ = hx.select(
        "modality",
        F.explode(
            F.expr("transform(sequence(1, length(hx) div 2), "
                   "p -> substring(hx, 2 * p - 1, 2))")
        ).alias("b"),
    )
    cells = bytes_.groupBy("modality", "b").agg(F.count(F.lit(1)).alias("c"))
    wt = Window.partitionBy("modality")
    terms = cells.select(
        "modality",
        "c",
        F.sum("c").over(wt).alias("n"),
        (
            -(F.col("c").cast("double") / F.sum("c").over(wt).cast("double"))
            * F.log2(
                F.col("c").cast("double") / F.sum("c").over(wt).cast("double")
            )
        )
        .cast("decimal(18,8)")
        .alias("t"),
    )
    return (
        terms.groupBy("modality")
        .agg(
            F.max("n").cast("bigint").alias("n_bytes"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_bytes"),
            F.round(F.sum("t").cast("double"), 6).alias("entropy_bits"),
        )
        .orderBy("modality")
    )


QUERIES["mm_payload_entropy"] = mm_payload_entropy

_MM_ENT_KEYED = "\n      UNION ALL\n".join(
    f"      SELECT '{m}' AS modality, upper({_MM_HEX[m]}) AS hx FROM documents"
    for m in ("audio", "image", "video")
)

ORACLES["mm_payload_entropy"] = f"""
    WITH hx AS (
{_MM_ENT_KEYED}
    ),
    bytes_ AS (
      SELECT modality, substring(hx, 2 * p - 1, 2) AS b
      FROM hx, LATERAL unnest(generate_series(1, length(hx) // 2)) AS t(p)
    ),
    cells AS (
      SELECT modality, b, COUNT(*) AS c FROM bytes_ GROUP BY 1, 2
    ),
    terms AS (
      SELECT modality, c, SUM(c) OVER (PARTITION BY modality) AS n,
             CAST(-(c::DOUBLE / SUM(c) OVER (PARTITION BY modality)::DOUBLE)
                  * log2(c::DOUBLE
                         / SUM(c) OVER (PARTITION BY modality)::DOUBLE)
                  AS DECIMAL(18,8)) AS t
      FROM cells
    )
    SELECT modality,
           MAX(n)::BIGINT AS n_bytes,
           COUNT(*)::BIGINT AS n_distinct_bytes,
           ROUND((SUM(t))::DOUBLE, 6) AS entropy_bits
    FROM terms GROUP BY 1 ORDER BY 1
"""


_VID_HDR_HEX = 24  # 12-byte VID1 header = 24 hex chars
_VID_FRAME_BYTES = 24


def mm_frame_motion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-video motion profile: mean |Δbyte| between adjacent frames.

    The shot-boundary / static-clip screen a video pipeline runs
    before sampling frames for captioning: near-zero motion = a still
    (sample one frame), spikes = cuts (sample around them). Pure
    JVM-side expression eval on the binary column — hex once, then a
    higher-order double loop (frame pairs × 24 byte lanes) of integer
    absolute differences, exact until the single ROUND 4 divide. Rows
    and cost are O(total video bytes), map-side; the only shuffle is
    the final orderBy for the deterministic output.
    """
    vids = videos_table(spark, sf_dir).select(
        "doc_id",
        F.hex("payload").alias("hx"),
        ((F.length("payload") - 12) / _VID_FRAME_BYTES).cast("int").alias("nf"),
    )
    # sum over frame pairs f in [0, nf-2] of sum over byte lanes i of
    # |b(f,i) - b(f+1,i)|; hex offset of byte i in frame f is
    # HDR + f*48 + 2i (0-based) -> substring is 1-based
    delta_expr = F.expr(f"""
        aggregate(
          transform(sequence(0, nf - 2), f ->
            aggregate(
              transform(sequence(0, {_VID_FRAME_BYTES - 1}, 1), i ->
                abs(CAST(conv(substring(hx,
                        {_VID_HDR_HEX} + f * {2 * _VID_FRAME_BYTES} + 2 * i + 1,
                        2), 16, 10) AS INT)
                  - CAST(conv(substring(hx,
                        {_VID_HDR_HEX} + (f + 1) * {2 * _VID_FRAME_BYTES}
                          + 2 * i + 1,
                        2), 16, 10) AS INT))),
              0L, (a, x) -> a + x)),
          0L, (a, x) -> a + x)
    """)
    max_pair_expr = F.expr(f"""
        array_max(
          transform(sequence(0, nf - 2), f ->
            aggregate(
              transform(sequence(0, {_VID_FRAME_BYTES - 1}, 1), i ->
                abs(CAST(conv(substring(hx,
                        {_VID_HDR_HEX} + f * {2 * _VID_FRAME_BYTES} + 2 * i + 1,
                        2), 16, 10) AS INT)
                  - CAST(conv(substring(hx,
                        {_VID_HDR_HEX} + (f + 1) * {2 * _VID_FRAME_BYTES}
                          + 2 * i + 1,
                        2), 16, 10) AS INT))),
              0L, (a, x) -> a + x)))
    """)
    return (
        vids.filter(F.col("nf") >= 2)
        .select(
            "doc_id",
            F.col("nf").cast("bigint").alias("n_frames"),
            F.round(
                delta_expr.cast("double")
                / ((F.col("nf") - 1) * _VID_FRAME_BYTES).cast("double"),
                4,
            ).alias("mean_motion"),
            max_pair_expr.cast("bigint").alias("max_pair_delta"),
        )
        .orderBy("doc_id")
    )


QUERIES["mm_frame_motion"] = mm_frame_motion

ORACLES["mm_frame_motion"] = f"""
    WITH vids AS (
      SELECT doc_id, upper({_MM_HEX["video"]}) AS hx,
             (doc_id % 5 + 4)::INT AS nf
      FROM documents
    ),
    pairs AS (
      SELECT doc_id, nf,
             (SELECT SUM(abs(
                CAST('0x' || substring(v.hx,
                     {_VID_HDR_HEX} + f.f * {2 * _VID_FRAME_BYTES} + 2 * i.i + 1,
                     2) AS INT)
              - CAST('0x' || substring(v.hx,
                     {_VID_HDR_HEX} + (f.f + 1) * {2 * _VID_FRAME_BYTES}
                       + 2 * i.i + 1,
                     2) AS INT)))
              FROM unnest(generate_series(0, v.nf - 2)) AS f(f),
                   unnest(generate_series(0, {_VID_FRAME_BYTES - 1})) AS i(i)
             ) AS total_delta,
             (SELECT MAX(pair_sum) FROM (
                SELECT f.f, SUM(abs(
                  CAST('0x' || substring(v.hx,
                       {_VID_HDR_HEX} + f.f * {2 * _VID_FRAME_BYTES} + 2 * i.i + 1,
                       2) AS INT)
                - CAST('0x' || substring(v.hx,
                       {_VID_HDR_HEX} + (f.f + 1) * {2 * _VID_FRAME_BYTES}
                         + 2 * i.i + 1,
                       2) AS INT))) AS pair_sum
                FROM unnest(generate_series(0, v.nf - 2)) AS f(f),
                     unnest(generate_series(0, {_VID_FRAME_BYTES - 1})) AS i(i)
                GROUP BY f.f
             )) AS max_pair
      FROM vids v WHERE nf >= 2
    )
    SELECT doc_id, nf::BIGINT AS n_frames,
           ROUND(total_delta::DOUBLE
                 / ((nf - 1) * {_VID_FRAME_BYTES})::DOUBLE, 4) AS mean_motion,
           max_pair::BIGINT AS max_pair_delta
    FROM pairs ORDER BY doc_id
"""


_AUD_HDR_HEX = 24  # 12-byte AUD1 header = 24 hex chars
AUDIO_SILENCE_BELOW = 64  # sample byte value < 64 counts as quiet


def mm_audio_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence-run profile per audio payload (VAD pre-screen).

    The pre-filter a speech pipeline runs before spending ASR compute:
    how much of the clip is quiet, and how long is the longest quiet
    run? Samples are the payload bytes after the 12-byte header; a
    sample is "quiet" below AUDIO_SILENCE_BELOW. Longest run =
    gaps-and-islands over the quiet positions, expressed as a pure
    JVM higher-order fold over the hexed binary (position minus
    quiet-rank is constant within a run — the classic islands trick,
    here inside one array expression: group quiet positions by
    p - rank). All integer; one map-side pass, O(total audio bytes).
    """
    aud = audio_table(spark, sf_dir).select(
        "doc_id",
        F.hex("payload").alias("hx"),
        (F.length("payload") - 12).cast("int").alias("ns"),
    )
    quiet_pos = F.expr(f"""
        filter(transform(sequence(0, ns - 1), i ->
          CASE WHEN CAST(conv(substring(hx, {_AUD_HDR_HEX} + 2 * i + 1, 2),
                             16, 10) AS INT) < {AUDIO_SILENCE_BELOW}
               THEN i ELSE -1 END), x -> x >= 0)
    """)
    # island key = pos - index_in_quiet_list is constant per run;
    # longest run = max island population, folded array-side
    runs = aud.select(
        "doc_id",
        F.col("ns").cast("bigint").alias("n_samples"),
        quiet_pos.alias("qp"),
    ).select(
        "doc_id",
        "n_samples",
        F.size("qp").cast("bigint").alias("n_quiet"),
        F.coalesce(
            F.array_max(
                F.expr(
                    "transform(array_distinct(zip_with(qp, "
                    "sequence(0, size(qp) - 1), (p, r) -> p - r)), k -> "
                    "size(filter(zip_with(qp, sequence(0, size(qp) - 1), "
                    "(p, r) -> p - r), x -> x = k)))"
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("longest_quiet_run"),
    )
    return runs.select(
        "doc_id",
        "n_samples",
        "n_quiet",
        F.round(
            F.col("n_quiet").cast("double") / F.col("n_samples").cast("double"),
            4,
        ).alias("quiet_share"),
        "longest_quiet_run",
    ).orderBy("doc_id")


QUERIES["mm_audio_silence"] = mm_audio_silence

ORACLES["mm_audio_silence"] = f"""
    WITH aud AS (
      SELECT doc_id, upper({_MM_HEX["audio"]}) AS hx,
             (doc_id % 64 + 64)::INT AS ns
      FROM documents
    ),
    samples AS (
      SELECT doc_id, ns, i.i AS p,
             CAST('0x' || substring(hx, {_AUD_HDR_HEX} + 2 * i.i + 1, 2)
                  AS INT) AS v
      FROM aud, LATERAL unnest(generate_series(0, ns - 1)) AS i(i)
    ),
    quiet AS (
      SELECT doc_id, ns, p,
             p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS island
      FROM samples WHERE v < {AUDIO_SILENCE_BELOW}
    ),
    run_lengths AS (
      SELECT doc_id, ns, island, COUNT(*) AS run_len
      FROM quiet GROUP BY 1, 2, 3
    ),
    per_doc AS (
      SELECT a.doc_id, a.ns,
             COALESCE(SUM(r.run_len), 0) AS n_quiet,
             COALESCE(MAX(r.run_len), 0) AS longest
      FROM aud a LEFT JOIN run_lengths r ON r.doc_id = a.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_id, ns::BIGINT AS n_samples, n_quiet::BIGINT AS n_quiet,
           ROUND(n_quiet::DOUBLE / ns::DOUBLE, 4) AS quiet_share,
           longest::BIGINT AS longest_quiet_run
    FROM per_doc ORDER BY doc_id
"""


# --- r06: aspect-ratio inventory ---------------------------------------------


def mm_aspect_ratio_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image aspect-ratio inventory: width/height parsed from the IMG1
    container header in PURE JVM expressions (the mm_payload_stats
    fast path — whole-stage codegen, no Python), bucketed into the
    portrait / square-ish / landscape bands a vision-training pipeline
    balances before resize. Ratio compares are CROSS-MULTIPLIED
    integer tests (w·10 vs h·{8,12}) so no float ever decides a
    bucket; the rounded ratio is display-only.
    """
    def u32(off: int) -> Column:
        return F.conv(
            F.hex(F.substring(F.col("payload"), off, 4)), 16, 10
        ).cast("bigint")

    imgs = images_table(spark, sf_dir).select(
        u32(5).alias("w"), u32(9).alias("h")
    )
    bucket = (
        F.when(F.col("w") * 10 < F.col("h") * 8, F.lit("portrait"))
        .when(F.col("w") * 10 <= F.col("h") * 12, F.lit("squareish"))
        .otherwise(F.lit("landscape"))
    )
    return (
        imgs.select(
            bucket.alias("ar_bucket"),
            "w",
            "h",
        )
        .groupBy("ar_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.round(
                F.sum("w").cast("double") / F.sum("h").cast("double"), 4
            ).alias("mean_aspect"),
        )
        .orderBy("ar_bucket")
    )


QUERIES["mm_aspect_ratio_buckets"] = mm_aspect_ratio_buckets

ORACLES["mm_aspect_ratio_buckets"] = """
    WITH imgs AS (
      SELECT (doc_id % 8 + 8)::BIGINT AS w, (doc_id % 5 + 8)::BIGINT AS h
      FROM documents
    )
    SELECT CASE WHEN w * 10 < h * 8 THEN 'portrait'
                WHEN w * 10 <= h * 12 THEN 'squareish'
                ELSE 'landscape' END AS ar_bucket,
           COUNT(*) AS n_images,
           ROUND(SUM(w)::DOUBLE / SUM(h)::DOUBLE, 4) AS mean_aspect
    FROM imgs
    GROUP BY 1 ORDER BY 1
"""


def mm_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection plumbing: cut the frame sequence where
    a pair's motion exceeds 2× the video's mean pair motion, then
    summarize shots — the step between mm_frame_motion (the profile)
    and keyframe sampling (one frame per shot is the standard
    captioning budget).

    The boundary rule stays in exact integers by cross-multiplying
    (p_f · (nf−1) > 2 · Σp) instead of comparing against the rational
    mean. Frame → shot assignment is one cumulative-flag window over
    the exploded O(frames) rows; shots and the longest-shot length
    fall out of a groupBy. Map-side per video except the final tiny
    aggregations — same O(total video bytes) scaling as the profile.
    """
    vids = videos_table(spark, sf_dir).select(
        "doc_id",
        F.hex("payload").alias("hx"),
        ((F.length("payload") - 12) / _VID_FRAME_BYTES).cast("int").alias("nf"),
    ).filter(F.col("nf") >= 2)
    pair_sum = f"""
        aggregate(
          transform(sequence(0, {_VID_FRAME_BYTES - 1}, 1), i ->
            abs(CAST(conv(substring(hx,
                    {_VID_HDR_HEX} + f * {2 * _VID_FRAME_BYTES} + 2 * i + 1,
                    2), 16, 10) AS INT)
              - CAST(conv(substring(hx,
                    {_VID_HDR_HEX} + (f + 1) * {2 * _VID_FRAME_BYTES}
                      + 2 * i + 1,
                    2), 16, 10) AS INT))),
          0L, (a, x) -> a + x)
    """
    # materialize the per-video pair-motion array BEFORE the generator:
    # posexplode of an inline higher-order expression re-evaluates it
    # per output element (the text_ngram_novelty lesson) — persisting
    # the O(videos) array frame keeps the expensive hex fold at one
    # evaluation per video
    from etl_city_directories_spark.functions.memo import rolling_persist

    pairs_base = rolling_persist(
        spark,
        ("mm_shot_ps", sf_dir),
        vids.select(
            "doc_id",
            "nf",
            F.expr(
                f"transform(sequence(0, nf - 2), f -> {pair_sum})"
            ).alias("ps"),
        ),
    )
    pairs = pairs_base.select(
        "doc_id",
        "nf",
        F.expr(
            "aggregate(ps, 0L, (a, x) -> a + x)"
        ).alias("total"),
        F.posexplode("ps").alias("f", "p"),
    )
    flags = pairs.select(
        "doc_id",
        "nf",
        "f",
        (
            F.col("p").cast("bigint") * (F.col("nf") - 1)
            > 2 * F.col("total").cast("bigint")
        ).cast("int").alias("is_cut"),
    )
    frames = vids.select(
        "doc_id", "nf", F.explode(F.sequence(F.lit(0), F.col("nf") - 1)).alias("g")
    )
    w_cum = (
        Window.partitionBy("doc_id")
        .orderBy("g")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    assigned = (
        frames.join(
            flags.select("doc_id", (F.col("f") + 1).alias("g"), "is_cut"),
            ["doc_id", "g"],
            "left",
        )
        .select(
            "doc_id",
            "nf",
            "g",
            F.sum(F.coalesce("is_cut", F.lit(0))).over(w_cum).alias("shot"),
        )
    )
    per_shot = assigned.groupBy("doc_id", "nf", "shot").agg(
        F.count(F.lit(1)).alias("shot_len")
    )
    return per_shot.groupBy("doc_id").agg(
        F.min("nf").cast("bigint").alias("n_frames"),
        F.count(F.lit(1)).cast("bigint").alias("n_shots"),
        F.max("shot_len").cast("bigint").alias("longest_shot_frames"),
        (F.count(F.lit(1)) - 1).cast("bigint").alias("n_cuts"),
    )


QUERIES["mm_shot_boundaries"] = mm_shot_boundaries

ORACLES["mm_shot_boundaries"] = f"""
    WITH vids AS (
      SELECT doc_id, upper({_MM_HEX["video"]}) AS hx,
             (doc_id % 5 + 4)::INT AS nf
      FROM documents
    ),
    pairs AS (
      SELECT v.doc_id, v.nf, f.f,
             (SELECT SUM(abs(
                CAST('0x' || substring(v.hx,
                     {_VID_HDR_HEX} + f.f * {2 * _VID_FRAME_BYTES} + 2 * i.i + 1,
                     2) AS INT)
              - CAST('0x' || substring(v.hx,
                     {_VID_HDR_HEX} + (f.f + 1) * {2 * _VID_FRAME_BYTES}
                       + 2 * i.i + 1,
                     2) AS INT)))
              FROM unnest(generate_series(0, {_VID_FRAME_BYTES - 1})) AS i(i)
             ) AS p
      FROM vids v, unnest(generate_series(0, v.nf - 2)) AS f(f)
      WHERE v.nf >= 2
    ),
    flagged AS (
      SELECT doc_id, nf, f,
             CASE WHEN CAST(p AS BIGINT) * (nf - 1)
                       > 2 * SUM(CAST(p AS BIGINT))
                           OVER (PARTITION BY doc_id)
                  THEN 1 ELSE 0 END AS is_cut
      FROM pairs
    ),
    frames AS (
      SELECT v.doc_id, v.nf, g.g
      FROM vids v, unnest(generate_series(0, v.nf - 1)) AS g(g)
      WHERE v.nf >= 2
    ),
    assigned AS (
      SELECT fr.doc_id, fr.nf, fr.g,
             SUM(COALESCE(fl.is_cut, 0)) OVER (
               PARTITION BY fr.doc_id ORDER BY fr.g
               ROWS UNBOUNDED PRECEDING
             ) AS shot
      FROM frames fr
      LEFT JOIN flagged fl ON fl.doc_id = fr.doc_id AND fl.f + 1 = fr.g
    ),
    per_shot AS (
      SELECT doc_id, nf, shot, COUNT(*) AS shot_len
      FROM assigned GROUP BY 1, 2, 3
    )
    SELECT doc_id,
           CAST(MIN(nf) AS BIGINT) AS n_frames,
           CAST(COUNT(*) AS BIGINT) AS n_shots,
           CAST(MAX(shot_len) AS BIGINT) AS longest_shot_frames,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_cuts
    FROM per_shot GROUP BY doc_id
"""


# --- Perceptual-hash image near-dup --------------------------------
PHASH_BITS = 60  # circular dHash width; 60 keeps h positive in BIGINT
# (bit 63 would wrap negative and make >> semantics engine-dependent)
PHASH_BANDS = 4  # 15-bit bands -> 32k buckets per band
PHASH_BAND_MAXDF = 8  # df-cap: drop buckets denser than this (audited)
PHASH_HAM_MAX = 6  # report pairs at most this many bits apart


def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate screening for the image corpus —
    the visual sibling of dedup_minhash_lsh (mm_dedup_bytes catches
    bit-exact copies; this catches images whose PIXELS agree even if
    container metadata differs): a 60-bit circular difference hash
    (bit j = pixel_j > pixel_{(j+1) mod n}) banded into 4×15-bit
    chunks, band-bucket join, exact Hamming verify via
    bit_count(xor); output is one audit row PER IMAGE (phash,
    candidate count, near-dup count, nearest duplicate).

    Scale discipline: 15-bit bands keep random collisions ~n²/32768,
    and buckets denser than PHASH_BAND_MAXDF are DROPPED WHOLESALE
    (the dedup_ngram_jaccard df-cap device) so a pathological
    constant-image corpus cannot go quadratic; the dHash itself is
    one map-side integer fold per image. The pixel decode reuses the
    deterministic container hex, so the oracle rebuilds identical
    hashes.
    """
    imgs = images_table(spark, sf_dir).select(
        "doc_id",
        F.hex("payload").alias("hx"),
        (F.length("payload") - 16).cast("int").alias("npx"),
    )
    # pixel byte i (0-based) lives at hex offset 32 + 2i (1-based substr)
    px = (
        "CAST(conv(substring(hx, 33 + 2 * i, 2), 16, 10) AS INT)"
    )
    px_next = (
        "CAST(conv(substring(hx, 33 + 2 * ((i + 1) % npx), 2), 16, 10)"
        " AS INT)"
    )
    from etl_city_directories_spark.functions.memo import rolling_persist

    # persist the O(images) hash frame: the 4-way band explode and the
    # final left join both read it, and projection collapse would
    # otherwise re-run the 60-bit hex fold per band row
    hashed = rolling_persist(
        spark,
        ("mm_phash_h", sf_dir),
        imgs.select(
            "doc_id",
            F.expr(f"""
                aggregate(
                  transform(sequence(0, {PHASH_BITS - 1}),
                    i -> CASE WHEN {px} > {px_next}
                              THEN shiftleft(1L, i) ELSE 0L END),
                  0L, (a, x) -> a + x)
            """).alias("h"),
        ),
    )
    bands = hashed.select(
        "doc_id",
        "h",
        F.explode(
            F.array(*[F.lit(b) for b in range(PHASH_BANDS)])
        ).alias("band_idx"),
    ).select(
        "doc_id",
        "h",
        "band_idx",
        F.expr("(h >> (band_idx * 15)) & 32767").alias("band_val"),
    )
    ok = (
        bands.groupBy("band_idx", "band_val")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= PHASH_BAND_MAXDF)
        .select("band_idx", "band_val")
    )
    capped = bands.join(ok, ["band_idx", "band_val"])
    a, b = capped.alias("a"), capped.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("b.doc_id").alias("doc_other"),
            F.col("a.h").alias("ha"),
            F.col("b.h").alias("hb"),
        )
        .distinct()
    )
    # per-image audit rows (the clean driver corpus has unique texts →
    # unique pixel streams → 0 near-dups; the planted-duplicate pytest
    # proves detection — the q_validate_fk planted-orphan pattern).
    # The hash column itself is oracle-verified for EVERY image.
    scored = cand.select(
        "doc_id",
        "doc_other",
        F.expr("CAST(bit_count(ha ^ hb) AS BIGINT)").alias("hamming"),
    )
    per_img = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum(
            F.when(F.col("hamming") <= PHASH_HAM_MAX, 1).otherwise(0)
        ).cast("bigint").alias("n_near_dups"),
    )
    # nearest_dup = the candidate with the MINIMUM Hamming distance
    # (ties broken by doc_other), elected with a row_number window —
    # the dedup_minhash_incremental best-match device. The r8 advisor
    # flagged the old MIN(doc_other)-among-near-dups election, which
    # ignored the distance and overstated the column name.
    w_best = Window.partitionBy("doc_id").orderBy("hamming", "doc_other")
    best = (
        scored.filter(F.col("hamming") <= PHASH_HAM_MAX)
        .withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("doc_other").alias("nearest_dup"))
    )
    per_img = per_img.join(best, "doc_id", "left")
    return hashed.join(per_img, "doc_id", "left").select(
        "doc_id",
        F.col("h").alias("phash"),
        F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias("n_candidates"),
        F.coalesce("n_near_dups", F.lit(0)).cast("bigint").alias("n_near_dups"),
        "nearest_dup",
    )


QUERIES["mm_phash_dedup"] = mm_phash_dedup

ORACLES["mm_phash_dedup"] = f"""
    WITH imgs AS (
      SELECT doc_id, upper({_MM_HEX["image"]}) AS hx,
             ((doc_id % 8 + 8) * (doc_id % 5 + 8))::INT AS npx
      FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             CAST((SELECT COALESCE(SUM(CASE WHEN
                CAST('0x' || substring(v.hx, 33 + 2 * i.i, 2) AS INT)
                > CAST('0x' || substring(v.hx,
                       33 + 2 * ((i.i + 1) % v.npx), 2) AS INT)
                THEN (1::BIGINT << i.i) ELSE 0 END), 0)
              FROM unnest(generate_series(0, {PHASH_BITS - 1})) AS i(i)
             ) AS BIGINT) AS h
      FROM imgs v
    ),
    bands AS (
      SELECT doc_id, h, b.b AS band_idx,
             (h >> (b.b * 15)) & 32767 AS band_val
      FROM hashed, unnest(generate_series(0, {PHASH_BANDS - 1})) AS b(b)
    ),
    ok AS (
      SELECT band_idx, band_val FROM bands
      GROUP BY 1, 2 HAVING COUNT(*) <= {PHASH_BAND_MAXDF}
    ),
    capped AS (
      SELECT bands.* FROM bands JOIN ok USING (band_idx, band_val)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS doc_other,
                      a.h AS ha, b.h AS hb
      FROM capped a JOIN capped b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id <> b.doc_id
    ),
    scored AS (
      SELECT doc_id, doc_other,
             CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
      FROM cand
    ),
    per_img AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_candidates,
             CAST(SUM(CASE WHEN hamming <= {PHASH_HAM_MAX} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_near_dups
      FROM scored GROUP BY 1
    ),
    best AS (
      SELECT doc_id, doc_other AS nearest_dup FROM (
        SELECT doc_id, doc_other,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY hamming, doc_other) AS rn
        FROM scored WHERE hamming <= {PHASH_HAM_MAX}
      ) WHERE rn = 1
    )
    SELECT h2.doc_id, h2.h AS phash,
           COALESCE(p.n_candidates, 0) AS n_candidates,
           COALESCE(p.n_near_dups, 0) AS n_near_dups,
           b.nearest_dup
    FROM hashed h2 LEFT JOIN per_img p USING (doc_id)
                   LEFT JOIN best b ON h2.doc_id = b.doc_id
"""

"""NDJSON sink/source — the reference's output format (one JSON object
per line: lines.ndjson, objects/logs/relations).

Spark's json writer IS newline-delimited JSON, so the sink is the
native distributed writer — each task writes its own part file, no
driver funnel. ``single_file=True`` exists for small outputs that must
be one file (coalesce(1) — a deliberate anti-scale choice the caller
must opt into).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_ndjson(
    df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False
) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).json(path)


def read_ndjson(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)

"""spacetime-etl-compatible step runner.

The reference is executed as four framework steps — download, parse,
geocode, transform (`city-directories.js:455-460`, each
``(config, dirs, tools, callback)``) — against a configuration file
and per-step output directories. This module is that usage surface on
Spark: a user of the reference points the same shaped config at this
CLI and gets the same shaped step directories back.

Usage::

    python -m etl_city_directories_spark \
        --config config.json --work WORKDIR [download parse geocode transform]

Config keys (mirroring `city-directories.js`):

- ``tableUrl``  — path to the HTML manifest table (:135-160; a local
  path or any Hadoop-readable URI — the sandbox has no network).
- ``dataUrl``   — directory holding ``{uuid}.tar.gz`` archives.
- ``minYear`` / ``maxYear`` — optional directory-year window
  (:182-195: keep directories with getMinYear >= minYear and
  getMaxYear <= maxYear).
- ``addresses`` — optional parquet path for the historical address
  dataset (columns of ``citydir.addresses_dim``); defaults to the
  built-in demo dim. The reference injects its geocoder dataset the
  same way (via @spacetime/nyc-historical-geocoder).

Step contract (the spacetime-etl dirs contract): each step writes
under ``WORKDIR/<step>/`` and reads its predecessor's directory —
``download`` fetches archives (+ ``{uuid}.xml`` error files, :91-97)
and materializes the typed manifest; ``parse`` emits column-assigned,
entry-parsed OCR lines as NDJSON; ``geocode`` emits per-location
geocode results; ``transform`` emits ``objects`` / ``relations`` /
``logs`` NDJSON (:443-450).

Scale shape: every step is the same declarative plan the operator
surface uses — archive decode is one task per archive, the entry
parser is pure JVM expressions, the address dims broadcast, and all
sinks are Spark's distributed NDJSON writer (no driver funnel).
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_city_directories_spark.operators.citydir import (
    addresses_dim,
    geocode_locations,
    parse_entries_real,
)
from etl_city_directories_spark.sources.hocr import (
    parse_hocr_lines,
    read_hocr_pages,
)
from etl_city_directories_spark.sources.manifest import read_manifest
from etl_city_directories_spark.sources.ndjson import read_ndjson, write_ndjson

STEPS = ("download", "parse", "geocode", "transform")


def _dir(work: str, step: str) -> str:
    d = os.path.join(work, step)
    os.makedirs(d, exist_ok=True)
    return d


def step_download(spark: SparkSession, cfg: dict, work: str) -> int:
    """Manifest-driven archive fetch with the reference's error-file
    contract: found archives land in download/data/, misses produce an
    empty ``{uuid}.xml`` and the run continues (:76-106)."""
    import pandas as pd

    if not cfg.get("tableUrl") or not cfg.get("dataUrl"):
        # the reference's own config validation (:141-144)
        raise ValueError("Please set both dataUrl and tableUrl in the configuration file")
    out = _dir(work, "download")
    data_dir = os.path.join(out, "data")
    os.makedirs(data_dir, exist_ok=True)

    manifest = read_manifest(spark, cfg["tableUrl"])
    write_ndjson(manifest, os.path.join(out, "manifest.ndjson"))

    try:
        archives = (
            spark.read.format("binaryFile")
            .load(os.path.join(cfg["dataUrl"], "*.tar.gz"))
            .select(
                F.regexp_extract(F.col("path"), r"([0-9a-f-]+)\.tar\.gz$", 1).alias(
                    "uuid"
                ),
                "content",
            )
        )
        archives.schema  # force path resolution now, inside the guard
    except Exception:
        # no .tar.gz at all: the reference's per-uuid error-file
        # contract still applies — every manifest row gets an empty
        # {uuid}.xml and the run continues (:91-97), so an empty
        # archives frame feeds the left join instead of aborting
        archives = spark.createDataFrame([], "uuid string, content binary")

    def _fetch(batches):
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                if row.content is not None:
                    fname = f"{row.uuid}.tar.gz"
                    with open(os.path.join(data_dir, fname), "wb") as f:
                        f.write(row.content)
                    rows.append((row.uuid, fname, "downloaded", len(row.content)))
                else:
                    fname = f"{row.uuid}.xml"
                    with open(os.path.join(data_dir, fname), "wb") as f:
                        f.write(b"")
                    rows.append((row.uuid, fname, "error", 0))
            yield pd.DataFrame(
                rows, columns=["uuid", "filename", "status", "n_bytes"]
            )

    status = manifest.select("uuid").join(archives, "uuid", "left").mapInPandas(
        _fetch, "uuid string, filename string, status string, n_bytes long"
    )
    # The file writes inside _fetch are idempotent (same path, same
    # bytes), but a retried/speculated task re-EMITS its rows — dedupe
    # by uuid so status.ndjson and the download count stay retry-safe
    # (all rows for a uuid are identical, so any survivor is correct).
    status = status.dropDuplicates(["uuid"])
    write_ndjson(status, os.path.join(out, "status.ndjson"))
    return read_ndjson(spark, os.path.join(out, "status.ndjson")).count()


def step_parse(spark: SparkSession, cfg: dict, work: str) -> int:
    """Archives → column-assigned hOCR lines → parsed entries, windowed
    by the config's year range and the manifest's page range
    (:182-200); NDJSON out."""
    dl, out = _dir(work, "download"), _dir(work, "parse")
    manifest = read_ndjson(spark, os.path.join(dl, "manifest.ndjson"))
    if cfg.get("minYear") is not None:
        manifest = manifest.filter(F.col("year_start") >= int(cfg["minYear"]))
    if cfg.get("maxYear") is not None:
        manifest = manifest.filter(
            F.coalesce("year_end", "year_start") <= int(cfg["maxYear"])
        )
    rows = manifest.select("uuid", "column_count").collect()  # O(directories)
    data_dir = os.path.join(dl, "data")
    by_count: dict[int, list[str]] = {}
    for r in rows:
        p = os.path.join(data_dir, f"{r['uuid']}.tar.gz")
        if os.path.exists(p):
            by_count.setdefault(int(r["column_count"] or 2), []).append(p)

    parsed: DataFrame | None = None
    for cc, paths in sorted(by_count.items()):
        pages = read_hocr_pages(spark, paths)
        lines = parse_hocr_lines(pages, column_count=cc)
        part = lines.withColumn(
            "uuid",
            F.regexp_extract(F.col("archive"), r"([0-9a-f-]+)\.tar\.gz$", 1),
        )
        parsed = part if parsed is None else parsed.unionByName(part)
    if parsed is None:
        return 0

    windowed = (
        parsed.join(
            F.broadcast(
                manifest.select("uuid", "year_raw", "start_page", "end_page")
            ),
            "uuid",
        )
        # page window; a blank manifest cell means unbounded on that side
        .filter(
            (F.col("start_page").isNull() | (F.col("page_num") >= F.col("start_page")))
            & (F.col("end_page").isNull() | (F.col("page_num") <= F.col("end_page")))
        )
    )
    entries = parse_entries_real(windowed)
    write_ndjson(entries, os.path.join(out, "lines.ndjson"))
    return read_ndjson(spark, os.path.join(out, "lines.ndjson")).count()


def step_geocode(spark: SparkSession, cfg: dict, work: str) -> int:
    """Every parsed location, OCR-normalized then geocoded against the
    address dataset (:272-323); per-location NDJSON with found /
    address / street."""
    pr, out = _dir(work, "parse"), _dir(work, "geocode")
    lines = read_ndjson(spark, os.path.join(pr, "lines.ndjson"))
    dim = (
        spark.read.parquet(cfg["addresses"]) if cfg.get("addresses") else None
    )
    locs = lines.select(
        "uuid",
        "page_num",
        "line_index",
        F.posexplode("locations").alias("loc_idx", "loc"),
    ).select(
        "uuid",
        "page_num",
        "line_index",
        "loc_idx",
        F.col("loc.value").alias("loc_value"),
        F.col("loc.loc_type").alias("loc_type"),
    )
    geo = geocode_locations(spark, locs, dim=dim)
    write_ndjson(geo, os.path.join(out, "geocoded.ndjson"))
    return read_ndjson(spark, os.path.join(out, "geocoded.ndjson")).count()


def step_transform(spark: SparkSession, cfg: dict, work: str) -> int:
    """st:Person objects + st:in relations + failure logs (:338-451):
    makeId year.page.bbox, validity interval from the year form,
    Point/MultiPoint geometry from the geocoded locations."""
    pr, gc, out = _dir(work, "parse"), _dir(work, "geocode"), _dir(work, "transform")
    lines = read_ndjson(spark, os.path.join(pr, "lines.ndjson"))
    geo = read_ndjson(spark, os.path.join(gc, "geocoded.ndjson"))

    dim = (
        spark.read.parquet(cfg["addresses"])
        if cfg.get("addresses")
        else addresses_dim(spark)
    ).select("address_id", "geom_x", "geom_y")
    key = ["uuid", "page_num", "line_index"]
    pts = (
        geo.join(F.broadcast(dim), "address_id", "left")
        .groupBy(*key)
        .agg(
            F.count("address_id").alias("n_geocoded"),
            F.count("loc_value").cast("bigint").alias("n_locations"),
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("address_id").isNotNull(),
                        F.struct("loc_idx", "geom_x", "geom_y"),
                    )
                )
            ).alias("pts"),
            F.array_agg(F.col("address_id")).alias("address_ids"),
        )
    )
    year_lo = F.split("year_raw", "/")[0].cast("int")
    is_split = F.col("year_raw").contains("/")
    year_part = F.when(
        is_split,
        F.concat(year_lo.cast("string"), F.lit("-"), (year_lo + 1).cast("string")),
    ).otherwise(year_lo.cast("string"))
    bbox = F.concat_ws(
        "-",
        F.col("x0").cast("string"),
        F.col("y0").cast("string"),
        F.col("x1").cast("string"),
        F.col("y1").cast("string"),
    )
    entry_id = F.concat(
        year_part, F.lit("."), F.col("page_num").cast("string"), F.lit("."), bbox
    )
    geometry = (
        F.when(F.col("n_geocoded").isNull() | (F.col("n_geocoded") == 0), F.lit(None).cast("string"))
        .when(
            F.col("n_geocoded") == 1,
            F.concat(
                F.lit("POINT("),
                F.col("pts")[0]["geom_x"].cast("int").cast("string"),
                F.lit(" "),
                F.col("pts")[0]["geom_y"].cast("int").cast("string"),
                F.lit(")"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("MULTIPOINT("),
                F.concat_ws(
                    ",",
                    F.transform(
                        F.col("pts"),
                        lambda p: F.concat(
                            p["geom_x"].cast("int").cast("string"),
                            F.lit(" "),
                            p["geom_y"].cast("int").cast("string"),
                        ),
                    ),
                ),
                F.lit(")"),
            )
        )
    )
    base = lines.join(pts, key, "left")
    objects = base.select(
        entry_id.alias("id"),
        F.lit("st:Person").alias("type"),
        F.col("subject").alias("name"),
        year_lo.alias("validSince"),
        F.when(is_split, year_lo + 1).otherwise(year_lo).alias("validUntil"),
        F.col("uuid").alias("volumeUuid"),
        F.col("page_uuid").alias("pageUuid"),
        F.col("page_num").alias("pageNum"),
        "text",
        F.try_element_at("occupations", F.lit(1)).alias("occupation"),
        F.coalesce("n_locations", F.lit(0)).alias("n_locations"),
        F.coalesce("n_geocoded", F.lit(0)).alias("n_geocoded"),
        geometry.alias("geometry"),
    )
    relations = (
        base.select(entry_id.alias("from"), F.explode("address_ids").alias("aid"))
        .filter(F.col("aid").isNotNull())
        .select(
            "from",
            # raw address id, verbatim — the reference pushes
            # `to: addressId` (city-directories.js:395-399) and
            # cd_relations emits the same; a surface-specific prefix
            # here made the two surfaces disagree (r04 advice).
            F.col("aid").cast("string").alias("to"),
            F.lit("st:in").alias("type"),
        )
    )
    logs = (
        geo.filter(~F.col("found"))
        .select(
            F.lit("log").alias("type"),
            "uuid",
            "page_num",
            "line_index",
            "loc_value",
            F.lit("geocode miss").alias("error"),
        )
    )
    write_ndjson(objects, os.path.join(out, "objects.ndjson"))
    write_ndjson(relations, os.path.join(out, "relations.ndjson"))
    write_ndjson(logs, os.path.join(out, "logs.ndjson"))
    return read_ndjson(spark, os.path.join(out, "objects.ndjson")).count()


_RUNNERS = {
    "download": step_download,
    "parse": step_parse,
    "geocode": step_geocode,
    "transform": step_transform,
}


def run(
    config_path: str,
    work: str,
    steps: list[str] | None = None,
    spark: SparkSession | None = None,
) -> dict[str, int]:
    with open(config_path, encoding="utf-8") as f:
        cfg = json.load(f)
    steps = list(steps) if steps else list(STEPS)
    for s in steps:
        if s not in _RUNNERS:
            raise ValueError(f"unknown step {s!r}; choose from {STEPS}")
    own_session = spark is None
    if own_session:
        from etl_city_directories_spark.session import get_spark

        spark = get_spark("etl-city-directories")
    counts = {}
    try:
        for s in steps:
            counts[s] = _RUNNERS[s](spark, cfg, work)
    finally:
        if own_session:
            spark.stop()
    return counts


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="etl_city_directories_spark")
    ap.add_argument("--config", required=True, help="JSON configuration file")
    ap.add_argument("--work", required=True, help="step-output work directory")
    ap.add_argument("steps", nargs="*", choices=STEPS, help="steps to run")
    args = ap.parse_args(argv)
    counts = run(args.config, args.work, args.steps or None)
    print(json.dumps(counts))
    return 0

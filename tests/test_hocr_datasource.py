"""Python Data Source (hocr_tar) equivalence with the binaryFile path.

The two scan implementations must be interchangeable: identical rows
from the fixture archive, identical malformed-input behavior (corrupt
archives skipped, never fatal), and partition-per-archive scheduling.
"""

from __future__ import annotations

import gzip
import os

from etl_city_directories_spark.operators.ingest import fixture_archive
from etl_city_directories_spark.sources.hocr import (
    parse_hocr_lines,
    read_hocr_pages,
)
from etl_city_directories_spark.sources.hocr_datasource import (
    read_hocr_pages_v2,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pages_match_binaryfile_path(spark):
    a = read_hocr_pages(spark, fixture_archive())
    b = read_hocr_pages_v2(spark, fixture_archive())
    assert a.columns == b.columns
    ra, rb = _rows(a), _rows(b)
    assert ra == rb and len(ra) >= 1


def test_parsed_lines_match(spark):
    a = parse_hocr_lines(read_hocr_pages(spark, fixture_archive()), 2)
    b = parse_hocr_lines(read_hocr_pages_v2(spark, fixture_archive()), 2)
    assert _rows(a) == _rows(b)


def test_one_partition_per_archive(spark, tmp_path):
    src = open(fixture_archive(), "rb").read()
    for i in range(3):
        with open(os.path.join(str(tmp_path), f"a{i}.tar.gz"), "wb") as f:
            f.write(src)
    df = read_hocr_pages_v2(spark, f"{tmp_path}/*.tar.gz")
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 3 * read_hocr_pages_v2(spark, fixture_archive()).count()


def test_corrupt_archive_skipped(spark, tmp_path):
    with open(os.path.join(str(tmp_path), "bad.tar.gz"), "wb") as f:
        f.write(gzip.compress(b"not a tar")[:-5])
    with open(os.path.join(str(tmp_path), "good.tar.gz"), "wb") as f:
        f.write(open(fixture_archive(), "rb").read())
    rows = read_hocr_pages_v2(spark, f"{tmp_path}/*.tar.gz").collect()
    assert rows and all("good" in r.archive for r in rows)

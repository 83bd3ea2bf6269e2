"""End-to-end test of the spacetime-etl-style CLI step runner: the
reference's usage surface (config file + step dirs) on fixtures."""

import glob
import json
import os
import shutil

import pytest

from etl_city_directories_spark.cli import STEPS, run
from etl_city_directories_spark.operators.ingest import FIXTURES, fixture_archive


def _read_ndjson_dir(path):
    rows = []
    for part in glob.glob(os.path.join(path, "*.json")):
        with open(part, encoding="utf-8") as f:
            rows += [json.loads(line) for line in f if line.strip()]
    return rows


@pytest.fixture(scope="module")
def cli_work(spark, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("cli_work"))
    data = str(tmp_path_factory.mktemp("cli_data"))
    shutil.copy(fixture_archive(), data)
    cfg_path = os.path.join(work, "config.json")
    with open(cfg_path, "w", encoding="utf-8") as f:
        json.dump(
            {
                "tableUrl": os.path.join(FIXTURES, "manifest.html"),
                "dataUrl": data,
                "minYear": 1850,
                "maxYear": 1890,
            },
            f,
        )
    counts = run(cfg_path, work, spark=spark)
    return work, counts


def test_all_steps_produce_rows(cli_work):
    _, counts = cli_work
    assert list(counts) == list(STEPS)
    assert all(v > 0 for v in counts.values()), counts


def test_download_error_file_contract(cli_work):
    """Manifest rows without an archive produce {uuid}.xml error files
    and the run continues (city-directories.js:91-97)."""
    work, _ = cli_work
    names = sorted(os.listdir(os.path.join(work, "download", "data")))
    tars = [n for n in names if n.endswith(".tar.gz")]
    errs = [n for n in names if n.endswith(".xml")]
    assert tars == ["c6725860-7ce9-0134-fb06-00505686a51c.tar.gz"]
    assert len(errs) == 3  # the other well-formed manifest rows


def test_transform_object_contract(cli_work):
    """st:Person objects carry the reference's makeId and field shape
    (city-directories.js:261-270, :409-430)."""
    work, _ = cli_work
    objs = _read_ndjson_dir(os.path.join(work, "transform", "objects.ndjson"))
    assert objs
    for o in objs:
        assert o["type"] == "st:Person"
        year, page, bbox = o["id"].split(".")
        assert year == "1850-1851" and int(page) == 25
        assert len(bbox.split("-")) == 4
        assert o["validSince"] == 1850 and o["validUntil"] == 1851
        assert o["volumeUuid"] == "c6725860-7ce9-0134-fb06-00505686a51c"
        assert (o.get("geometry") is not None) == (o["n_geocoded"] > 0)


def test_transform_relations_and_logs(cli_work):
    """Found locations become st:in relations; misses become log rows
    (:395-404, :431-437)."""
    work, _ = cli_work
    rels = _read_ndjson_dir(os.path.join(work, "transform", "relations.ndjson"))
    logs = _read_ndjson_dir(os.path.join(work, "transform", "logs.ndjson"))
    geo = _read_ndjson_dir(os.path.join(work, "geocode", "geocoded.ndjson"))
    n_found = sum(1 for g in geo if g["found"])
    n_miss = sum(1 for g in geo if not g["found"])
    assert len(rels) == n_found > 0
    assert len(logs) == n_miss > 0
    # `to` is the raw address id — same format as cd_relations and the
    # reference's `to: addressId` (city-directories.js:395-399)
    assert all(r["type"] == "st:in" and r["to"].isdigit() for r in rels)
    assert all(lg["type"] == "log" for lg in logs)


def test_download_with_no_archives_at_all(spark, tmp_path):
    """A dataUrl directory containing zero .tar.gz files must not
    abort: the per-uuid error-file contract still applies — EVERY
    manifest row gets an empty {uuid}.xml and status marks them all
    'error' (r04 advice: the bare glob raised path-not-found)."""
    work = str(tmp_path / "w3")
    data = str(tmp_path / "d3")
    os.makedirs(data)  # empty — no archives
    cfg_path = os.path.join(tmp_path, "config.json")
    with open(cfg_path, "w", encoding="utf-8") as f:
        json.dump(
            {
                "tableUrl": os.path.join(FIXTURES, "manifest.html"),
                "dataUrl": data,
            },
            f,
        )
    counts = run(cfg_path, work, ["download"], spark=spark)
    assert counts["download"] == 4  # every manifest row has a status
    names = sorted(os.listdir(os.path.join(work, "download", "data")))
    assert all(n.endswith(".xml") for n in names) and len(names) == 4
    status = _read_ndjson_dir(os.path.join(work, "download", "status.ndjson"))
    assert all(s["status"] == "error" for s in status)


def test_parse_silently_skips_missing_archives(cli_work):
    """The reference SKIPS manifest rows whose tar.gz was never
    downloaded instead of erroring (city-directories.js:195's
    fs.existsSync filter before the parse loop). The module fixture's
    manifest names 4 volumes but only one archive exists: the full
    step run must complete (no exception — pinned by the fixture
    itself), parse must emit rows ONLY for the present volume, and the
    3 absent volumes must contribute nothing — not even empty/error
    rows — to the parse output (their error artifact lives solely in
    the download step's {uuid}.xml contract)."""
    work, counts = cli_work
    assert counts["parse"] > 0
    lines = _read_ndjson_dir(os.path.join(work, "parse", "lines.ndjson"))
    assert lines
    present = "c6725860-7ce9-0134-fb06-00505686a51c"
    assert {ln["uuid"] for ln in lines} == {present}


def test_parse_skips_archive_missing_after_download(spark, tmp_path):
    """Same semantics when an archive disappears BETWEEN download and
    parse (the reference re-checks existence at parse time, not
    download status): delete the downloaded tar.gz, rerun parse only —
    zero rows, zero errors."""
    work = str(tmp_path / "w_gone")
    data = str(tmp_path / "d_gone")
    os.makedirs(data)
    shutil.copy(fixture_archive(), data)
    cfg_path = os.path.join(tmp_path, "config.json")
    with open(cfg_path, "w", encoding="utf-8") as f:
        json.dump(
            {
                "tableUrl": os.path.join(FIXTURES, "manifest.html"),
                "dataUrl": data,
            },
            f,
        )
    counts = run(cfg_path, work, ["download"], spark=spark)
    assert counts["download"] > 0
    for tar in glob.glob(os.path.join(work, "download", "data", "*.tar.gz")):
        os.remove(tar)
    counts = run(cfg_path, work, ["parse"], spark=spark)
    assert counts["parse"] == 0


def test_year_window_excludes_all(spark, tmp_path):
    """A minYear above every directory leaves parse empty — the
    reference's directory windowing (:191-195)."""
    work = str(tmp_path / "w2")
    data = str(tmp_path / "d2")
    os.makedirs(data)
    shutil.copy(fixture_archive(), data)
    cfg_path = os.path.join(tmp_path, "config.json")
    with open(cfg_path, "w", encoding="utf-8") as f:
        json.dump(
            {
                "tableUrl": os.path.join(FIXTURES, "manifest.html"),
                "dataUrl": data,
                "minYear": 1990,
            },
            f,
        )
    counts = run(cfg_path, work, ["download", "parse"], spark=spark)
    assert counts["download"] > 0 and counts["parse"] == 0


def test_geocode_custom_addresses(spark, tmp_path):
    """The addresses config key swaps in a real address dataset: a
    custom dim that only knows one address geocodes exactly that one."""
    work = str(tmp_path / "w3")
    data = str(tmp_path / "d3")
    os.makedirs(data)
    shutil.copy(fixture_archive(), data)
    dim_path = str(tmp_path / "addresses.parquet")
    spark.createDataFrame(
        [(1, "88 Water", "Water", "S1", 1.0, 88.0)],
        "address_id long, address_name string, street_name string,"
        " street_id string, geom_x double, geom_y double",
    ).write.parquet(dim_path)
    cfg_path = os.path.join(tmp_path, "config.json")
    with open(cfg_path, "w", encoding="utf-8") as f:
        json.dump(
            {
                "tableUrl": os.path.join(FIXTURES, "manifest.html"),
                "dataUrl": data,
                "addresses": dim_path,
            },
            f,
        )
    run(cfg_path, work, ["download", "parse", "geocode"], spark=spark)
    geo = _read_ndjson_dir(os.path.join(work, "geocode", "geocoded.ndjson"))
    hits = [g for g in geo if g["found"]]
    assert hits and all(g["loc_norm"].lower() == "88 water" for g in hits)
    assert any(not g["found"] for g in geo)

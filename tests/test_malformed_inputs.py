"""Malformed-input hardening for the ingestion surface.

Real archive crawls hand the parser truncated downloads, corrupt
members, non-UTF8 OCR output, bbox-less spans, and manifest tables with
blank or missing cells. The reference survives these by recording
per-volume error files and filtering incomplete rows
(city-directories.js:87-106, :130); our contract is the same spirit:
NO operator raises — bad archives/members/rows are skipped, good ones
still flow.
"""

from __future__ import annotations

import gzip
import io
import os
import tarfile

from etl_city_directories_spark.operators.ingest import fixture_archive
from etl_city_directories_spark.sources.hocr import (
    extract_lines,
    parse_hocr_lines,
    read_hocr_pages,
)
from etl_city_directories_spark.sources.manifest import parse_manifest_html

_GOOD_HOCR = b"""<html><body>
<div class='ocr_page'>
<span class='ocr_line' title="bbox 100 50 600 70">
  <span class='ocrx_word' title="bbox 100 50 200 70">Smith</span>
  <span class='ocrx_word' title="bbox 210 50 300 70">John</span>
</span></div></body></html>
"""


def _tar_gz(members: list[tuple[str, bytes]], truncate_at: int | None = None) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    raw = buf.getvalue()
    if truncate_at is not None:
        raw = raw[:truncate_at]
    return gzip.compress(raw)


def _write(tmp_path, name: str, blob: bytes) -> str:
    p = os.path.join(str(tmp_path), name)
    with open(p, "wb") as f:
        f.write(blob)
    return p


def test_truncated_gzip_archive_is_skipped(spark, tmp_path):
    good = fixture_archive()
    bad = gzip.compress(b"x" * 4096)[:-30]  # clipped gzip stream
    _write(tmp_path, "bad.tar.gz", bad)
    _write(tmp_path, "good.tar.gz", open(good, "rb").read())
    pages = read_hocr_pages(spark, f"{tmp_path}/*.tar.gz").collect()
    assert len(pages) >= 1  # good archive still parsed
    assert all("good" in p.archive for p in pages)


def test_clipped_tar_member_payload_is_skipped(spark, tmp_path):
    # tar truncated inside the first member's payload: that member dies,
    # the archive contributes nothing, and the scan survives
    blob = _tar_gz(
        [("u/25.56886389.aaaa.processed.hocr", _GOOD_HOCR)], truncate_at=600
    )
    _write(tmp_path, "clipped.tar.gz", blob)
    pages = read_hocr_pages(spark, f"{tmp_path}/clipped.tar.gz").collect()
    assert pages == []


def test_not_a_tar_at_all_is_skipped(spark, tmp_path):
    _write(tmp_path, "junk.tar.gz", gzip.compress(b"<html>not a tarball</html>"))
    assert read_hocr_pages(spark, f"{tmp_path}/junk.tar.gz").collect() == []


def test_non_utf8_hocr_decodes_with_replacement(spark, tmp_path):
    latin1 = _GOOD_HOCR.replace(b"Smith", b"Caf\xe9")  # invalid UTF-8 byte
    blob = _tar_gz([("u/25.56886389.bbbb.processed.hocr", latin1)])
    _write(tmp_path, "latin1.tar.gz", blob)
    pages = read_hocr_pages(spark, f"{tmp_path}/latin1.tar.gz")
    lines = parse_hocr_lines(pages, column_count=1).collect()
    assert len(lines) == 1
    assert "Caf" in lines[0].text  # replaced, not raised


def test_bboxless_line_is_skipped_not_fatal():
    hocr = (
        "<span class='ocr_line' title='no bbox here'>"
        "<span class='ocrx_word'>ghost</span></span></span>"
        + _GOOD_HOCR.decode()
    )
    lines = extract_lines(hocr)
    assert [l[4] for l in lines] == ["Smith John"]


def test_mixed_good_and_bad_members(spark, tmp_path):
    blob = _tar_gz(
        [
            ("u/notapage.hocr", b"<html></html>"),  # unparseable name
            ("u/25.56886389.cccc.processed.hocr", _GOOD_HOCR),
            ("u/readme.txt", b"junk"),
        ]
    )
    _write(tmp_path, "mixed.tar.gz", blob)
    pages = read_hocr_pages(spark, f"{tmp_path}/mixed.tar.gz").collect()
    assert [p.page_uuid for p in pages] == ["cccc"]


def test_manifest_blank_and_missing_cells_filtered():
    html = """
    <table><thead><tr>
      <th>uuid</th><th>year</th><th>startPage</th><th>endPage</th><th>columnCount</th>
    </tr></thead><tbody>
      <tr><td>ok-1</td><td>1850/51</td><td>5</td><td>110</td><td>2</td></tr>
      <tr><td></td><td>1851</td><td>5</td><td>110</td><td>2</td></tr>
      <tr><td>no-year</td><td></td><td>5</td><td>110</td><td>2</td></tr>
      <tr><td>bad-page</td><td>1852</td><td>five</td><td>110</td><td>2</td></tr>
      <tr><td>short-row</td><td>1853</td></tr>
      <tr><td>ok-2</td><td>1854</td><td> 7 </td><td>99</td><td>3</td></tr>
    </tbody></table>
    """
    rows = parse_manifest_html(html)
    assert [r["uuid"] for r in rows] == ["ok-1", "ok-2"]
    assert rows[0]["year_start"] == 1850 and rows[0]["year_end"] == 1851
    assert rows[1]["start_page"] == 7  # whitespace-trimmed cell parses

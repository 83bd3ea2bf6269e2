"""Behavioral pins for the LLM-pipeline text operators whose corpus
run is (intentionally) quiet: the synthetic documents contain no PII,
so the redaction regexes are exercised here on adversarial rows, and
the chunker's window contract is checked on hand-sized docs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_city_directories_spark.operators.textstats import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    PII_EMAIL_RE,
    PII_PHONE_RE,
)

SF = "/root/testdata/sf0.001"


def _redact(spark, text: str):
    df = spark.createDataFrame([(text,)], "text string")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), " +", " "))
    return df.select(
        F.regexp_replace(
            F.regexp_replace(norm, PII_EMAIL_RE, "<EMAIL>"),
            PII_PHONE_RE,
            "<PHONE>",
        ).alias("out"),
        F.size(F.regexp_extract_all(norm, F.lit(PII_EMAIL_RE), 0)).alias("n_email"),
        F.size(F.regexp_extract_all(norm, F.lit(PII_PHONE_RE), 0)).alias("n_phone"),
    ).collect()[0]


def test_pii_redaction_behavior(spark):
    r = _redact(spark, "mail Jane.Doe+x@Example.co.uk or call 555-123-4567 now")
    assert r.out == "mail <EMAIL> or call <PHONE> now"
    assert (r.n_email, r.n_phone) == (1, 1)
    # non-PII digits survive; partial phone shapes don't match
    r2 = _redact(spark, "order 12345 total 67 89 code 12-34-56")
    assert r2.out == "order 12345 total 67 89 code 12-34-56"
    assert (r2.n_email, r2.n_phone) == (0, 0)
    # multiple matches all redacted
    r3 = _redact(spark, "a@b.io c@d.org 111-222-3333 444-555-6666")
    assert r3.out == "<EMAIL> <EMAIL> <PHONE> <PHONE>"
    assert (r3.n_email, r3.n_phone) == (2, 2)


def test_chunker_window_contract(spark):
    from etl_city_directories_spark.operators.textstats import text_chunk

    rows = text_chunk(spark, SF).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        n = chunks[0].doc_tokens
        if n <= CHUNK_TOKENS:
            assert len(chunks) == 1
            assert chunks[0].chunk_tokens == n
        else:
            # starts march by the stride; every full window except
            # possibly the last has exactly CHUNK_TOKENS tokens
            expected = (n - CHUNK_TOKENS) // CHUNK_STRIDE + 1
            assert len(chunks) == expected, (doc_id, n, len(chunks))
            for c in chunks[:-1]:
                assert c.chunk_tokens == CHUNK_TOKENS
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))

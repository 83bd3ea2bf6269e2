"""Unit coverage for the r04 §2.C additions: encoding-damage stats,
training-sequence packing, and boilerplate-prefix dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_city_directories_spark.operators.dedup import dedup_prefix
from etl_city_directories_spark.operators.textstats import (
    SEQ_LEN_TOKENS,
    mojibake_cols,
    pack_sequences,
)

SF = "/root/testdata/sf0.001"


def test_mojibake_flags_damaged_text(spark):
    rows = [
        (0, "clean ascii text only"),
        (1, "damaged � replacement � chars"),
        (2, "control\x07char\x1fnoise"),
        (3, "täglich crème brûlée " * 3 + "ok"),  # high non-ascii share? no
        (4, "你好" * 20),  # all CJK: ascii_ratio 0 → drop
        (5, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: r
        for r in df.select("doc_id", *mojibake_cols(F.col("text"))).collect()
    }
    assert got[0].keep and got[0].n_replacement_chars == 0
    assert got[1].n_replacement_chars == 2 and not got[1].keep
    assert got[2].n_control_chars == 2 and not got[2].keep
    # latin accents leave ascii_ratio well above the 0.7 floor
    assert got[3].keep and 0.7 < got[3].ascii_ratio < 1.0
    assert got[4].ascii_ratio == 0.0 and not got[4].keep
    assert got[5].ascii_ratio == 0.0  # empty text: no div-by-zero


def test_pack_sequences_invariants(spark):
    rows = pack_sequences(spark, SF).collect()
    assert rows
    by_source: dict[str, list] = {}
    for r in rows:
        assert 0 <= r.offset_in_first < SEQ_LEN_TOKENS
        assert r.seq_last >= r.seq_first >= 0
        assert r.n_seqs_spanned == r.seq_last - r.seq_first + 1
        assert r.n_tokens >= 1
        by_source.setdefault(r.source, []).append(r)
    for src, rs in by_source.items():
        # the packing is gapless per source: total tokens land exactly
        # at the last doc's final token slot
        total = sum(r.n_tokens for r in rs)
        end = max(r.seq_last * SEQ_LEN_TOKENS + 1 for r in rs)
        last = max(rs, key=lambda r: (r.seq_last, r.offset_in_first))
        assert total >= (total // SEQ_LEN_TOKENS) * SEQ_LEN_TOKENS
        assert end <= total + SEQ_LEN_TOKENS, src
        assert last.seq_last == (total - 1) // SEQ_LEN_TOKENS, src


def test_pack_sequences_long_doc_spans_multiple(spark):
    rows = pack_sequences(spark, SF).collect()
    # the corpus has docs longer than one sequence — at least one doc
    # must span >1 sequences, and every span count is consistent
    assert any(r.n_seqs_spanned > 1 for r in rows)


def test_dedup_prefix_groups_shared_openings(spark):
    out = dedup_prefix(spark, SF).collect()
    n_docs = sum(r.n_docs for r in out)
    from etl_city_directories_spark.sources.tables import load_table

    assert n_docs == load_table(spark, SF, "documents").count()
    dup_sets = [r for r in out if r.is_dup]
    for r in dup_sets:
        assert r.n_docs > 1 and r.min_doc < r.max_doc

"""The gate rotation is standing per-round protocol (r9 verdict order
#1): these tests pin the history-folding and ordering rules so a future
refactor can't silently skip stale keys or let old fails demote newer
greens."""

import json
import os

from tools.gate_priority import load_history, priority_order


def _write(dirpath, rnd, rows):
    with open(
        os.path.join(dirpath, f"CORRECTNESS_r{rnd:02d}.json"), "w"
    ) as f:
        json.dump(rows, f)


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
FAIL = {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}
ROWS_ONLY = {"rows_match": True, "schema_match": False, "hash_match": False,
             "err": "no_oracle"}


def test_history_fold_rules(tmp_path):
    d = str(tmp_path)
    _write(d, 1, {"a": GREEN, "b": GREEN, "c": ROWS_ONLY, "e": FAIL})
    _write(d, 2, {"b": GREEN, "d": GREEN, "e": GREEN})
    h = load_history(d)
    assert h["a"] == (1, "green")  # untouched evidence keeps its round
    assert h["b"] == (2, "green")  # re-gating refreshes staleness
    assert h["c"] == (1, "rows_only")
    assert h["e"] == (2, "green")  # a later green clears an old fail
    # a later fail demotes earlier green evidence
    _write(d, 3, {"a": FAIL})
    assert load_history(d)["a"] == (3, "fail")


def test_round_number_parse_not_lexical(tmp_path):
    """r10 must sort after r9 (and r4 after r02): an old fail replayed
    in lexical order would incorrectly demote a newer green."""
    d = str(tmp_path)
    _write(d, 9, {"a": FAIL})
    _write(d, 10, {"a": GREEN})
    assert load_history(d)["a"] == (10, "green")


def test_priority_order_buckets(tmp_path):
    d = str(tmp_path)
    _write(d, 1, {"old_green": GREEN, "upgraded": ROWS_ONLY,
                  "rows_only_ok": ROWS_ONLY, "failed": GREEN})
    _write(d, 2, {"fresh_green": GREEN, "failed": FAIL})
    h = load_history(d)
    keys = ["fresh_green", "old_green", "never_gated", "failed",
            "upgraded", "rows_only_ok", "no_oracle_new"]
    oracles = {"fresh_green", "old_green", "never_gated", "failed",
               "upgraded"}  # `upgraded` gained an oracle since r1
    got = priority_order(keys, oracles, h)
    # bucket 0 in surface order: never-gated, failed, oracle-upgraded
    assert got[:3] == ["never_gated", "failed", "upgraded"]
    # bucket 1: declared rows-only key with no no_oracle record yet
    assert got[3] == "no_oracle_new"
    # bucket 2: greens stalest-first
    assert got[4:6] == ["old_green", "fresh_green"]
    # bucket 3: confirmed rows-only trail
    assert got[6] == "rows_only_ok"

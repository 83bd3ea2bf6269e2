"""Real 1850s directory entry forms through the fidelity parser.

The reference parses entries with a trained CRF (entry-parser.js:23-36
spawns parse.py); citydir.parse_entry_struct covers the recurring
grammar classes real pages hit first, verified here over an hOCR
fixture page (tests/fixtures/sample_entries.hocr) run through the full
archive → pages → lines → entries path.
"""

from __future__ import annotations

import gzip
import io
import os
import tarfile

import pytest

from etl_city_directories_spark.operators.citydir import parse_entries_real
from etl_city_directories_spark.sources.hocr import (
    parse_hocr_lines,
    read_hocr_pages,
)

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
_UUID = "d7836971-8df0-0134-fb06-00505686a51c"


@pytest.fixture(scope="module")
def entries_archive(tmp_path_factory) -> str:
    hocr = open(os.path.join(FIXTURES, "sample_entries.hocr"), "rb").read()
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo(name=f"{_UUID}/31.56886390.{_UUID}.processed.hocr")
        info.size = len(hocr)
        tf.addfile(info, io.BytesIO(hocr))
    out = str(tmp_path_factory.mktemp("entries") / f"{_UUID}.tar.gz")
    with open(out, "wb") as f:
        f.write(gzip.compress(buf.getvalue()))
    return out


@pytest.fixture(scope="module")
def entries(spark, entries_archive):
    pages = read_hocr_pages(spark, entries_archive)
    lines = parse_hocr_lines(pages, column_count=2)
    rows = parse_entries_real(lines).collect()
    return {r.subject: r for r in rows}


def test_all_lines_parse(entries):
    assert len(entries) == 7


def test_widow_of_form(entries):
    r = entries["Smith Mary"]
    assert r.widow_of == "John"
    assert r.occupations == []
    assert [(l.value, l.loc_type) for l in r.locations] == [("23 Pearl", "home")]


def test_wid_abbreviated_form(entries):
    r = entries["Jones Sarah"]
    assert r.widow_of == "Peter"  # 'wid..' OCR noise collapsed, marker stripped
    assert r.occupations == []
    assert [(l.value, l.loc_type) for l in r.locations] == [("14 Elm", "address")]


def test_abbreviated_occupation(entries):
    r = entries["Brown Wm"]
    assert r.occupations == ["lab."]
    assert [(l.value, l.loc_type) for l in r.locations] == [("112 Elm", "home")]


def test_boards_location(entries):
    r = entries["Miller Chas"]
    assert r.occupations == ["clerk"]
    assert [(l.value, l.loc_type) for l in r.locations] == [("7 Pearl", "boards")]


def test_rear_location(entries):
    r = entries["Taylor Robt"]
    assert [(l.value, l.loc_type) for l in r.locations] == [("88 Water", "rear")]


def test_numberless_corner_home(entries):
    r = entries["Wilson Jas"]
    assert r.occupations == ["porter"]
    assert [(l.value, l.loc_type) for l in r.locations] == [
        ("Pearl c Cherry", "home")
    ]


def test_work_plus_home_pair(entries):
    r = entries["Jones Thos"]
    assert [(l.value, l.loc_type) for l in r.locations] == [
        ("3 Cherry", "address"),
        ("5 Vine", "home"),
    ]


# --- trained tagger (the reference's CRF architecture) ---------------------


def test_crf_feature_split_parity():
    """The CRF's split feature computation (_feat_base + _prev_feats)
    must reproduce _features exactly for every (position, prev-label)
    — the split exists only to cut decode cost from |L|²·|feats| to
    |L|·base + |L|²·3 lookups per position."""
    from etl_city_directories_spark.functions import entry_tagger as et

    for toks, labs in et.synth_training_corpus(40):
        for i in range(len(toks)):
            base, sh, bare = et._feat_base(toks, i)
            for prev in ("<s>",) + et.LABELS:
                split = set(base) | set(et._prev_feats(prev, sh, bare))
                assert split == set(et._features(toks, i, prev)), (toks, i, prev)


def test_tagger_heldout_accuracy():
    """Perceptron baseline, decoded greedy (the matched train/decode
    pair it was learned under)."""
    from etl_city_directories_spark.functions import entry_tagger

    corpus = entry_tagger.synth_training_corpus(800)
    m = entry_tagger.train(corpus[:600])
    tot = ok = 0
    for toks, labs in corpus[600:]:
        pred = entry_tagger.tag_greedy(toks, m)
        ok += sum(p == g for p, g in zip(pred, labs))
        tot += len(labs)
    assert ok / tot >= 0.98, f"held-out token accuracy {ok / tot:.3f}"


def test_crf_heldout_accuracy():
    """The production model class: linear-chain CRF + Viterbi must be
    perfect on held-out grammar lines (the perceptron-era bar was 0.98;
    the CRF's global normalization should not do worse)."""
    from etl_city_directories_spark.functions import entry_tagger

    corpus = entry_tagger.synth_training_corpus(800)
    m = entry_tagger.train_crf(corpus[:600])
    tot = ok = 0
    for toks, labs in corpus[600:]:
        pred = entry_tagger.tag(toks, m)
        ok += sum(p == g for p, g in zip(pred, labs))
        tot += len(labs)
    assert ok / tot >= 0.995, f"CRF held-out token accuracy {ok / tot:.4f}"


def test_tagger_agrees_with_grammar_on_fixture(spark, entries_archive):
    """On the real-form fixture page the trained tagger must produce
    the same entries as the regex grammar — two independent parser
    architectures, one contract."""
    from etl_city_directories_spark.operators.citydir import (
        parse_entries_real,
        parse_entries_tagged,
    )

    pages = read_hocr_pages(spark, entries_archive)
    lines = parse_hocr_lines(pages, column_count=2)
    grammar = {r.subject: r for r in parse_entries_real(lines).collect()}
    tagged = {
        r.subject: r
        for r in parse_entries_tagged(lines, id_col="line_index").collect()
    }
    assert set(tagged) == set(grammar)
    for subj, t in tagged.items():
        g = grammar[subj]
        assert t.occupations_all == "|".join(g.occupations), subj
        assert (t.widow_of or None) == g.widow_of, subj
        assert t.locations_all == "|".join(
            f"{l.value}:{l.loc_type}" for l in g.locations
        ), subj


# --- r06: messy real-scan forms (entry-parser.js training contract) --------


def _tag_entry(toks):
    from etl_city_directories_spark.functions import entry_tagger

    labs = entry_tagger.tag(toks, entry_tagger.model())
    return entry_tagger.entry_from_tags(toks, labs)


def test_tagger_dot_run_inside_name():
    """OCR dot-runs inside name tokens must still tag as SUBJ."""
    e = _tag_entry(["Sm..ith", "W..m,", "grocer,", "14", "Elm"])
    assert e["subject"] == "Sm..ith W..m"
    assert e["occupations"] == ["grocer"]
    assert [(l["value"], l["loc_type"]) for l in e["locations"]] == [
        ("14 Elm", "address")
    ]


def test_tagger_wid_occupation_collision():
    """A widow entry that ALSO carries an occupation: wid. must not
    swallow the trade, the trade must not swallow the husband name."""
    e = _tag_entry(["Jones", "Sarah,", "wid.", "Peter,", "seamstress,", "14", "Elm"])
    assert e["subject"] == "Jones Sarah"
    assert e["widow_of"] == "Peter"
    assert e["occupations"] == ["seamstress"]
    assert [(l["value"], l["loc_type"]) for l in e["locations"]] == [
        ("14 Elm", "address")
    ]


def test_tagger_numberless_corner_work_address():
    """Corner location with no house number and no marker is a plain
    work address, not part of the occupation."""
    e = _tag_entry(["Wilson", "Jas,", "porter,", "Pearl", "c", "Cherry"])
    assert e["subject"] == "Wilson Jas"
    assert e["occupations"] == ["porter"]
    assert [(l["value"], l["loc_type"]) for l in e["locations"]] == [
        ("Pearl c Cherry", "address")
    ]


def test_tagger_messy_forms_heldout_accuracy():
    """Held-out accuracy must hold ON the messy slices specifically
    (dot-run names, wid.+occ, bare corners), not just in aggregate —
    for the production CRF + Viterbi path."""
    from etl_city_directories_spark.functions import entry_tagger

    corpus = entry_tagger.synth_training_corpus(1000)
    m = entry_tagger.train_crf(corpus[:700])
    slices = {"dot": [0, 0], "widocc": [0, 0], "corner": [0, 0]}
    for toks, labs in corpus[700:]:
        pred = entry_tagger.tag(toks, m)
        joined = " ".join(toks)
        keys = []
        if ".." in joined:
            keys.append("dot")
        if "wid." in joined and "OCC" in labs:
            keys.append("widocc")
        if "c" in toks and "MARK" not in labs:
            keys.append("corner")
        for k in keys:
            slices[k][0] += sum(p == g for p, g in zip(pred, labs))
            slices[k][1] += len(labs)
    for k, (ok, tot) in slices.items():
        assert tot > 0, f"slice {k} empty — generator regression"
        assert ok / tot >= 0.95, f"slice {k} accuracy {ok / tot:.3f}"


# --- r07: gold labels drawn from the REAL hOCR fixture pages ----------------

# Token-level gold tags hand-assigned from the scanner text in
# tests/fixtures/sample_entries.hocr and sample.hocr — NOT emitted by
# the synthetic grammar generator, so tagger accuracy here is pinned
# against real-form OCR tokens (the reference trains its CRF on labeled
# scans, entry-parser.js:23-36). Slices named so a regression reports
# WHICH form class broke.
_FIXTURE_GOLD = {
    "widow_full": [
        (
            ["Smith", "Mary,", "widow", "of", "John,", "h", "23", "Pearl"],
            ["SUBJ", "SUBJ", "WID", "WID", "WID", "MARK", "LOC", "LOC"],
        ),
    ],
    "widow_abbrev_dotrun": [
        (
            ["Jones", "Sarah,", "wid..", "Peter,", "14", "Elm"],
            ["SUBJ", "SUBJ", "WID", "WID", "LOC", "LOC"],
        ),
    ],
    "occ_marker": [
        (
            ["Brown", "Wm,", "lab.,", "h", "112", "Elm"],
            ["SUBJ", "SUBJ", "OCC", "MARK", "LOC", "LOC"],
        ),
        (
            ["Miller", "Chas,", "clerk,", "bds", "7", "Pearl"],
            ["SUBJ", "SUBJ", "OCC", "MARK", "LOC", "LOC"],
        ),
        (
            ["Taylor", "Robt,", "tailor,", "r", "88", "Water"],
            ["SUBJ", "SUBJ", "OCC", "MARK", "LOC", "LOC"],
        ),
    ],
    "corner_home": [
        (
            ["Wilson", "Jas,", "porter,", "h", "Pearl", "c", "Cherry"],
            ["SUBJ", "SUBJ", "OCC", "MARK", "LOC", "LOC", "LOC"],
        ),
    ],
    "work_plus_home": [
        (
            ["Jones", "Thos,", "mason,", "3", "Cherry,", "h", "5", "Vine"],
            ["SUBJ", "SUBJ", "OCC", "LOC", "LOC", "MARK", "LOC", "LOC"],
        ),
    ],
    "plain_and_dotrun_names": [
        (
            ["Smith", "John,", "carpenter,", "25", "Broadway"],
            ["SUBJ", "SUBJ", "OCC", "LOC", "LOC"],
        ),
        (
            ["Brown", "Wm..", "grocer,", "112", "Elm"],
            ["SUBJ", "SUBJ", "OCC", "LOC", "LOC"],
        ),
        (
            ["Wilson", "Jas...", "porter,", "3", "Cherry"],
            ["SUBJ", "SUBJ", "OCC", "LOC", "LOC"],
        ),
    ],
}


def test_viterbi_is_exact_map():
    """Viterbi must return the true argmax over ALL |L|^n label paths
    under the shared edge-feature scoring — brute-force enumerated on
    short lines (the property greedy decode lacks)."""
    from itertools import product

    from etl_city_directories_spark.functions import entry_tagger as et

    def path_score(toks, labs, w):
        s, prev = 0.0, "<s>"
        for i, lab in enumerate(labs):
            s += sum(w[lab].get(f, 0.0) for f in et._features(toks, i, prev))
            prev = lab
        return s

    corpus = et.synth_training_corpus(30)
    m = et.train_crf(corpus, epochs=2)
    for toks, _ in corpus[:8]:
        short = toks[:5]
        vit = et.tag(short, m)
        best = max(
            product(et.LABELS, repeat=len(short)),
            key=lambda labs: path_score(short, labs, m),
        )
        assert path_score(short, vit, m) == max(
            path_score(short, labs, m)
            for labs in product(et.LABELS, repeat=len(short))
        ), (short, vit, best)


def test_tagger_gold_labels_from_real_fixture_pages():
    """The production model (the one cd_parse_tagged broadcasts) must
    tag the hand-labeled scanner lines perfectly, per form slice —
    held-out in the strongest sense: none of these token sequences is
    produced by synth_training_corpus (the generator never emits the
    fixture's name/street spellings together, and the gold labels were
    assigned by reading the hOCR, not by running the grammar)."""
    from etl_city_directories_spark.functions import entry_tagger

    m = entry_tagger.model()
    for slice_name, cases in _FIXTURE_GOLD.items():
        ok = tot = 0
        for toks, gold in cases:
            assert len(toks) == len(gold), (slice_name, toks)
            pred = entry_tagger.tag(toks, m)
            ok += sum(p == g for p, g in zip(pred, gold))
            tot += len(gold)
        assert ok == tot, f"slice {slice_name}: {ok}/{tot} tokens correct"


def test_tagger_gold_entries_roundtrip_real_fixture():
    """entry_from_tags over the gold-labeled lines must reconstruct the
    same entry contract the grammar parser extracts from the same
    scanner text (subject / widow_of / occupations / locations)."""
    from etl_city_directories_spark.functions import entry_tagger

    m = entry_tagger.model()
    toks = ["Smith", "Mary,", "widow", "of", "John,", "h", "23", "Pearl"]
    e = entry_tagger.entry_from_tags(toks, entry_tagger.tag(toks, m))
    assert e["subject"] == "Smith Mary"
    assert e["widow_of"] == "John"
    assert e["occupations"] == []
    assert [(l["value"], l["loc_type"]) for l in e["locations"]] == [
        ("23 Pearl", "home")
    ]

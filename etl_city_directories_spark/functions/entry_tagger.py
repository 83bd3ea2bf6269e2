"""Trainable directory-entry tagger — the reference's CRF contract.

The reference parses entries by piping each line to a trained CRF
(entry-parser.js:23-36 spawns ``parse.py --training <file>`` and reads
one JSON of token labels per line). This module reproduces that
contract with public-knowledge machinery and no native deps: an
averaged structured perceptron (Collins 2002, "Discriminative Training
Methods for HMMs") over word-shape/context features, greedy
left-to-right decode.

Training follows the reference's data contract: a labeled corpus of
(tokens, labels) lines. ``synth_training_corpus`` generates one from
the same entry grammar the corpus synthesizer uses — deterministic
(md5-seeded), so every engine trains the identical model; a real
deployment passes its hand-labeled lines to ``train`` instead, exactly
like pointing parse.py at different training data.

Label set (mirrors the published city-directory-entry-parser classes):
  SUBJ — the entry's person name tokens
  OCC  — occupation tokens
  LOC  — address tokens (house number / street / corner)
  MARK — location-type markers (h, r, bds, b)
  WID  — widow-relationship tokens (wid/widow/of + late husband name)

Spark shape: training is driver-side index construction (one pass over
a small labeled file — seconds); the learned weights broadcast to
executors inside an Arrow-batched pandas UDF, so tagging is a map-side
vectorized pass with zero per-row Python round-trips to the driver.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

LABELS = ("SUBJ", "OCC", "LOC", "MARK", "WID")

_NAMES_FIRST = (
    "Smith", "Brown", "Miller", "Johnson", "Davis", "Wilson", "Taylor",
    "Anderson", "Thomas", "Jackson", "White", "Harris", "Jones", "Clark",
)
_NAMES_SECOND = (
    "John", "Wm", "Chas", "Thos", "Geo", "Jas", "Robt", "Saml", "Edw",
    "Benj", "Danl", "Fredk", "Mary", "Sarah", "Ann", "Eliza",
)
_OCCS = (
    "carpenter", "grocer", "clerk", "tailor", "smith", "porter", "mason",
    "printer", "lab.", "mach.", "seamstress", "shoemaker", "baker",
    "cartman", "painter",
)
_STREETS = (
    "Broadway", "Elm", "Pearl", "Water", "Cherry", "Mulberry", "Greenwich",
    "Chambers", "Canal", "Orchard", "Vine", "Broad",
)
_MARKERS = ("h", "r", "bds", "b")


def _det(i: int, salt: str, n: int) -> int:
    """Deterministic pseudo-random index — replayable everywhere."""
    h = hashlib.md5(f"{salt}|{i}".encode()).hexdigest()
    return int(h[:8], 16) % n


def synth_training_corpus(n: int = 600) -> list[tuple[list[str], list[str]]]:
    """Labeled (tokens, labels) lines from the entry grammar: plain
    work-address entries, home pairs, widow forms, marker-led and
    number-less corner locations — the classes real pages hit — plus
    the messy real-scan forms the reference's training data carries
    (entry-parser.js training contract): OCR dot-run artifacts INSIDE
    name tokens ("W..m"), widow entries that also carry an occupation
    ("wid. Peter, seamstress, 14 Elm" — the wid.+OCC collision), and
    number-less corner locations as bare WORK addresses with no
    marker ("porter, Pearl c Cherry")."""
    out: list[tuple[list[str], list[str]]] = []
    for i in range(n):
        toks: list[str] = []
        labs: list[str] = []

        def emit(tok: str, lab: str) -> None:
            toks.append(tok)
            labs.append(lab)

        last = _NAMES_FIRST[_det(i, "ln", len(_NAMES_FIRST))]
        first = _NAMES_SECOND[_det(i, "fn", len(_NAMES_SECOND))]
        if _det(i, "dotn", 6) == 0:
            # OCR dot-run inside the surname: "Sm..ith"
            cut = 1 + _det(i, "dotp", max(1, len(last) - 1))
            last = f"{last[:cut]}..{last[cut:]}"
        emit(last, "SUBJ")
        name_form = _det(i, "nf", 3)
        if name_form == 0:  # middle initial: "Brown Wm. H,"
            emit(f"{first}.", "SUBJ")
            emit(f"{'ABCDEFGHJW'[_det(i, 'mi', 10)]},", "SUBJ")
        else:
            if _det(i, "dotf", 8) == 0:
                # dot-run inside the given name: "W..m,"
                first = f"{first[:1]}..{first[1:]}"
            emit(f"{first},", "SUBJ")
        form = _det(i, "form", 8)
        if form == 0:  # widow of John, h 23 Pearl
            emit("widow", "WID")
            emit("of", "WID")
            emit(f"{_NAMES_SECOND[_det(i, 'wn', len(_NAMES_SECOND))]},", "WID")
        elif form == 1:  # wid. Peter, 14 Elm
            emit("wid.", "WID")
            emit(f"{_NAMES_SECOND[_det(i, 'wn', len(_NAMES_SECOND))]},", "WID")
        elif form == 6:  # wid.+occupation collision: wid. Peter, seamstress, 14 Elm
            emit("wid.", "WID")
            emit(f"{_NAMES_SECOND[_det(i, 'wn', len(_NAMES_SECOND))]},", "WID")
            emit(f"{_OCCS[_det(i, 'occ', len(_OCCS))]},", "OCC")
        else:
            occ = _OCCS[_det(i, "occ", len(_OCCS))]
            if _det(i, "on", 4) == 0:  # collapsed OCR dot-run: "grocer.,"
                occ += "."
            emit(f"{occ},", "OCC")
        street = _STREETS[_det(i, "st", len(_STREETS))]
        num = str(_det(i, "num", 300) + 1)
        if form == 3:  # marker + number
            emit(_MARKERS[_det(i, "mk", len(_MARKERS))], "MARK")
            emit(num, "LOC")
            emit(street, "LOC")
        elif form == 4:  # number-less corner home
            emit("h", "MARK")
            emit(street, "LOC")
            emit("c", "LOC")
            emit(_STREETS[_det(i, "st2", len(_STREETS))], "LOC")
        elif form == 5:  # work + home pair
            emit(f"{num}", "LOC")
            emit(f"{street},", "LOC")
            emit("h", "MARK")
            emit(str(_det(i, "num2", 300) + 1), "LOC")
            emit(_STREETS[_det(i, "st2", len(_STREETS))], "LOC")
        elif form == 7:  # number-less corner WORK address, no marker
            emit(street, "LOC")
            emit("c", "LOC")
            emit(_STREETS[_det(i, "st2", len(_STREETS))], "LOC")
        else:  # bare work address (+ home for widows half the time)
            emit(num, "LOC")
            emit(street, "LOC")
            if form < 2 and _det(i, "wh", 2) == 0:
                toks[-1] += ","
                emit("h", "MARK")
                emit(str(_det(i, "num2", 300) + 1), "LOC")
                emit(_STREETS[_det(i, "st2", len(_STREETS))], "LOC")
        out.append((toks, labs))
    return out


def _shape(w: str) -> str:
    return "".join(
        "9" if c.isdigit() else ("X" if c.isupper() else "x") for c in w[:4]
    )


def _features(toks: list[str], i: int, prev_label: str) -> list[str]:
    w = toks[i]
    bare = w.rstrip(".,").lower()
    feats = [
        f"w={bare}",
        f"shape={_shape(w)}",
        f"suf3={bare[-3:]}",
        f"pos0={i == 0}",
        f"comma={w.endswith(',')}",
        f"digit={bare.isdigit()}",
        f"prevlab={prev_label}",
        f"prevw={toks[i - 1].rstrip('.,').lower() if i else '<s>'}",
        f"nextw={toks[i + 1].rstrip('.,').lower() if i + 1 < len(toks) else '</s>'}",
        f"prevlab+shape={prev_label}|{_shape(w)}",
        f"prevlab+w={prev_label}|{bare}",
    ]
    return feats


def train(
    corpus: list[tuple[list[str], list[str]]], epochs: int = 5
) -> dict[str, dict[str, float]]:
    """Averaged perceptron: greedy decode, per-token update, weights
    averaged over all updates (Collins 2002). Returns
    {label: {feature: weight}} ready to broadcast."""
    w: dict[str, dict[str, float]] = {lab: defaultdict(float) for lab in LABELS}
    acc: dict[str, dict[str, float]] = {lab: defaultdict(float) for lab in LABELS}
    t = 1
    for _ in range(epochs):
        for toks, labs in corpus:
            prev = "<s>"
            for i, gold in enumerate(labs):
                feats = _features(toks, i, prev)
                pred = max(
                    LABELS,
                    key=lambda lab: sum(w[lab][f] for f in feats),
                )
                if pred != gold:
                    for f in feats:
                        w[gold][f] += 1.0
                        acc[gold][f] += t
                        w[pred][f] -= 1.0
                        acc[pred][f] -= t
                prev = gold  # gold history (standard training-time choice)
                t += 1
    # averaged weights: w - acc/t
    return {
        lab: {f: v - acc[lab][f] / t for f, v in w[lab].items()}
        for lab in LABELS
    }


_MODEL: dict[str, dict[str, float]] | None = None


def model() -> dict[str, dict[str, float]]:
    """The default model, trained once per process on the synthetic
    labeled corpus (deterministic — identical everywhere)."""
    global _MODEL
    if _MODEL is None:
        _MODEL = train(synth_training_corpus())
    return _MODEL


def tag(toks: list[str], weights: dict[str, dict[str, float]]) -> list[str]:
    """Greedy left-to-right decode."""
    out: list[str] = []
    prev = "<s>"
    for i in range(len(toks)):
        feats = _features(toks, i, prev)
        best = max(
            LABELS,
            key=lambda lab: sum(weights[lab].get(f, 0.0) for f in feats),
        )
        out.append(best)
        prev = best
    return out


def entry_from_tags(toks: list[str], labs: list[str]) -> dict:
    """Token labels → the entry-parser output contract (subject,
    occupations, widow_of, locations with loc_type)."""
    subject = " ".join(
        t.rstrip(",") for t, l in zip(toks, labs) if l == "SUBJ"
    )
    occupations: list[str] = []
    cur_occ: list[str] = []
    locations: list[dict] = []
    cur_loc: list[str] = []
    cur_type = "address"
    wid: list[str] = []

    def close_occ() -> None:
        if cur_occ:
            occupations.append(" ".join(cur_occ))
            cur_occ.clear()

    def close_loc() -> None:
        nonlocal cur_type
        if cur_loc:
            locations.append(
                {"value": " ".join(cur_loc), "loc_type": cur_type}
            )
            cur_loc.clear()
        cur_type = "address"

    _TYPE = {"h": "home", "r": "rear", "bds": "boards", "b": "boards"}
    for t, l in zip(toks, labs):
        bare = t.rstrip(".,")
        if l == "OCC":
            # strip the segment comma, keep abbreviation periods (lab.)
            cur_occ.append(t.rstrip(","))
            if t.endswith(","):
                close_occ()
        elif l == "MARK":
            close_loc()
            cur_type = _TYPE.get(bare.lower(), "address")
        elif l == "LOC":
            cur_loc.append(bare)
            if t.endswith(","):
                close_loc()
        elif l == "WID" and bare.lower() not in ("wid", "widow", "of"):
            wid.append(bare)
    close_occ()
    close_loc()
    return {
        "subject": subject,
        "occupations": occupations,
        "widow_of": " ".join(wid) if wid else None,
        "locations": locations,
    }

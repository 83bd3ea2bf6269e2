"""Full-surface 10x scale sweep: every batch queries() key through
tools/scale_probe.py, in chunks, appending to the log after each chunk
so a mid-sweep death keeps all evidence produced so far (the r7 sweep
died 25/338 rows in and lost the rest of the round's budget).

Exclusions are ENCODED, not silent (r7 verdict "What's wrong" #4):
every skipped key is printed into the log with its cause.

Usage:
    python tools/probe_fullsurface.py [K] [logfile] [start_key]

start_key resumes an interrupted sweep from that key (alphabetical).
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as m

CHUNK = 24

from tools.scale_probe import BAND_JOIN_NOTE  # noqa: E402

# keys with no sf_dir-scaling input: the probe ratio would measure
# fixture parse constants, not data scaling
FIXTURE_KEYS = {
    "cd_download": "fixture-driven (manifest + archive fixtures, no sf_dir tables)",
    "hocr_parse": "fixture-driven (hOCR page fixtures)",
    "hocr_source_v2": "fixture-driven (archive fixtures via Python DataSource)",
    "manifest_parse": "fixture-driven (manifest fixture)",
    "ndjson_sink": "sink round-trip of a fixture frame",
    # semantically-quadratic on the replication corpus; standalone
    # evidence cited in the note (scale_probe.BAND_JOIN_NOTE)
    "q_band_join_bucketed": BAND_JOIN_NOTE,
}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    log = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "simlogs",
            "r08_scale_probe_10x_fullsurface.log",
        )
    )
    start_key = sys.argv[3] if len(sys.argv) > 3 else None

    keys = sorted(m.queries())
    with open(log, "a") as fh:
        fh.write(f"# full-surface {k}x sweep over {len(keys)} keys\n")
        for key in keys:
            if key.startswith("stream_"):
                fh.write(f"{key:24} SKIP  batch-only harness (streaming plan "
                         "exists only while the query runs)\n")
            elif key in FIXTURE_KEYS:
                fh.write(f"{key:24} SKIP  {FIXTURE_KEYS[key]}\n")
        fh.flush()

    batch = [
        key
        for key in keys
        if not key.startswith("stream_") and key not in FIXTURE_KEYS
    ]
    if start_key:
        batch = [key for key in batch if key >= start_key]

    here = os.path.dirname(os.path.abspath(__file__))
    for i in range(0, len(batch), CHUNK):
        chunk = batch[i : i + CHUNK]
        with open(log, "a") as fh:
            fh.write(f"# chunk {i // CHUNK + 1}: {chunk[0]}..{chunk[-1]}\n")
            fh.flush()
            subprocess.run(
                [sys.executable, os.path.join(here, "scale_probe.py"), str(k)]
                + chunk,
                stdout=fh,
                stderr=subprocess.DEVNULL,
                check=False,
            )
    with open(log, "a") as fh:
        fh.write("# sweep complete\n")


if __name__ == "__main__":
    main()

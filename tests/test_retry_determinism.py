"""Determinism under task retry (r6 verdict item 6).

At cluster scale tasks die and retry (preemption, OOM-kill, speculative
execution); every nondeterministic-LOOKING lane claims its output is a
pure function of the input, and the claim is only real if a
failed-and-retried task reproduces bit-identical output.  The probe
(tools/retry_probe.py) runs in a subprocess with ``local[8,3]`` — local
mode defaults to maxFailures=1 where any failure kills the job — and
injects a flaky-once mapInPandas pass-through over every table scan:
first attempt of partition 0 raises (after writing a proof marker), the
retry succeeds.  One lane per claimed-deterministic family:

- hash sampling      — q_stratified_sample (md5-keyed strata draw)
- LSH banding        — q_minhash_dedup_oracle (signature → band →
                       verify, the md5 lane)
- md5 split          — q_train_split (the 80/10/10 release carve)
- uuid-adjacent twin — q_taxi_star_deterministic (the full Job-1 star
                       contract minus the uuid column)
- codec family (r9)  — q_png_decode (encode→decode content round trip:
                       a retried task must re-emit byte-identical
                       pixels and md5s)
- PQ/ADC family (r9) — q_ann_pq_oracle (k-means train → encode → ADC
                       top-k: partial-agg order under retry is exactly
                       where a float-sum ADC would go nondeterministic;
                       the decimal routing claims it can't)
"""

import pytest

pytestmark = pytest.mark.slow  # multi-session e2e; excluded from the driver-window run

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LANES = [
    "q_stratified_sample",
    "q_minhash_dedup_oracle",
    "q_train_split",
    "q_taxi_star_deterministic",
    "q_png_decode",
    "q_ann_pq_oracle",
    # r9 verdict item 6: one archive lane (shard assignment / member
    # order must be partition-retry-stable) and one container lane
    "q_tar_shard_roundtrip",
    "q_avi_dib_decode",
    # r10: the content-sized WARC sharding (count-derived modulus) and
    # the PDF round trip must also be retry-stable
    "q_warcgz_ingest",
    "q_pdf_extract",
    # r11: the ZIP64 framing (marker fields + 0x0001 extras resolved on
    # walk) and the triple-composition EPUB spine resolution
    "q_zip_shard_roundtrip",
    "q_epub_extract",
    # r11: revisit resolution holds per-shard cross-record state (the
    # rid→digest map) — a retried walk task must rebuild it identically
    "q_warc_revisit",
]


def test_retry_determinism(sf_dir):
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "retry_probe.py"),
            sf_dir,
            *LANES,
        ],
        env={**os.environ, "PYTHONPATH": REPO},
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    rows = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    verdict = rows[-1]
    per_lane = {row["lane"]: row for row in rows[:-1]}
    assert set(per_lane) == set(LANES)
    for lane, row in per_lane.items():
        assert row["identical"], (lane, row)
        # the injected failure must actually have fired — a probe that
        # never killed a task proves nothing
        assert row["failures_fired"] > 0, (lane, row)
    assert verdict["ok"] is True

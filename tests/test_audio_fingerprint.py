"""Audio fingerprint near-dup (multimodal.audio_frame_hashes, ext41).

The replay is an INDEPENDENT implementation: expected values are
computed from the document TEXT with plain Python loops — no WAV
container, no parse_wav, no numpy — so the test pins the whole
pipeline (synth container → stdlib parse → numpy band fold → delta
hash → shingle join) against the documented byte semantics, not
against its own helpers.
"""

import hashlib
from collections import Counter

from glue_etl_nyc_yellow_taxi_analysis_spark.operators.multimodal import (
    _frame_hashes_np,
)
from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES, _t
from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext41 import (
    _AF_BANDS,
    _AF_DFCAP,
    _AF_FRAME,
    _AF_MIN_SHARED,
    _AF_W,
)

_BW = _AF_FRAME // _AF_BANDS


def _py_samples(text: str):
    b = ("" if text is None else text).encode("utf-8")
    out = []
    for k in range(len(b) // 2):
        hi = b[2 * k + 1] ^ (0x80 if k % 2 else 0)
        v = b[2 * k] + 256 * hi
        out.append(v - 65536 if v >= 32768 else v)
    return out


def _py_hashes(samples):
    n_frames = len(samples) // _AF_FRAME
    energies = [
        [
            sum(
                s * s
                for s in samples[
                    t * _AF_FRAME + b * _BW : t * _AF_FRAME + (b + 1) * _BW
                ]
            )
            for b in range(_AF_BANDS)
        ]
        for t in range(n_frames)
    ]
    return n_frames, [
        sum(
            (1 << b)
            for b in range(_AF_BANDS)
            if energies[t][b] > energies[t - 1][b]
        )
        for t in range(1, n_frames)
    ]


def test_fingerprint_matches_text_replay(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in _t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    got = {
        r["media_id"]: (
            r["n_samples"],
            r["n_frames"],
            r["n_hashes"],
            r["fp_md5"],
        )
        for r in QUERIES["q_audio_fingerprint"](spark, sf_dir).collect()
    }
    assert set(got) == set(docs)
    for did, text in docs.items():
        samples = _py_samples(text)
        n_frames, hashes = _py_hashes(samples)
        md5 = hashlib.md5(",".join(str(h) for h in hashes).encode()).hexdigest()
        assert got[did] == (len(samples), n_frames, len(hashes), md5), did


def _py_kept_shingles(docs):
    per_doc = {}
    for did, text in docs.items():
        _, hashes = _py_hashes(_py_samples(text))
        if len(hashes) < _AF_W:
            continue
        per_doc[did] = {
            "-".join(str(h) for h in hashes[i : i + _AF_W])
            for i in range(len(hashes) - _AF_W + 1)
        }
    df = Counter(s for shs in per_doc.values() for s in shs)
    return {
        did: {s for s in shs if df[s] <= _AF_DFCAP}
        for did, shs in per_doc.items()
    }


def test_neardup_matches_text_replay(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in _t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    kept = _py_kept_shingles(docs)
    ids = sorted(d for d, s in kept.items() if s)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = len(kept[a] & kept[b])
            if shared >= _AF_MIN_SHARED:
                union = len(kept[a]) + len(kept[b]) - shared
                expect[(a, b)] = (
                    shared,
                    len(kept[a]),
                    len(kept[b]),
                    shared * 1000 // union,
                )
    got = {
        (r["id_a"], r["id_b"]): (
            r["shared"],
            r["n_a"],
            r["n_b"],
            r["jac_x1000"],
        )
        for r in QUERIES["q_audio_neardup"](spark, sf_dir).collect()
    }
    assert got == expect
    # the lane must actually FIND something on the planted corpus —
    # an empty near-dup detector matching an empty replay proves nothing
    assert expect, "corpus has no audio near-dup pairs; lane is untestable"


def test_gain_invariance():
    """Doubling every sample quadruples every band energy but preserves
    every delta SIGN — the fingerprint is unchanged.  This is the
    property that makes it a fingerprint, not a volume meter."""
    base = [((i * 37) % 199) - 99 for i in range(_AF_FRAME * 6)]
    n1, h1 = _frame_hashes_np(base, _AF_FRAME, _AF_BANDS)
    n2, h2 = _frame_hashes_np([2 * s for s in base], _AF_FRAME, _AF_BANDS)
    assert (n1, h1) == (n2, h2)
    assert n1 == 6 and len(h1) == 5


def test_short_payload_contributes_nothing():
    n, h = _frame_hashes_np(list(range(_AF_FRAME - 1)), _AF_FRAME, _AF_BANDS)
    assert (n, h) == (0, [])
    n, h = _frame_hashes_np(list(range(_AF_FRAME)), _AF_FRAME, _AF_BANDS)
    assert n == 1 and h == []


def test_stream_twin_matches_batch_and_reruns(spark, sf_dir):
    """The streaming lane must (a) equal the batch lane row for row —
    the stream/batch equivalence its shared oracle asserts — and (b) be
    re-runnable twice in one session (the driver runs every lane at
    least twice: entry smoke + oracle pass)."""
    batch = {
        r["media_id"]: (r["n_samples"], r["n_frames"], r["n_hashes"], r["fp_md5"])
        for r in QUERIES["q_audio_fingerprint"](spark, sf_dir).collect()
    }
    for _ in range(2):
        got = {
            r["media_id"]: (
                r["n_samples"],
                r["n_frames"],
                r["n_hashes"],
                r["fp_md5"],
            )
            for r in QUERIES["q_stream_audio_fingerprint"](spark, sf_dir).collect()
        }
        assert got == batch


# --------------------------------------------------------------------------
# video twin (q_video_neardup) — same independent-replay discipline
# --------------------------------------------------------------------------

_VF_LUMA, _VF_FRAME_BYTES, _VF_BW = 24, 36, 6


def _py_video_hashes(text: str):
    b = ("" if text is None else text).encode("utf-8")
    nf = max(1, len(b) // _VF_FRAME_BYTES)
    luma = []
    for f in range(nf):
        chunk = b[f * _VF_FRAME_BYTES : f * _VF_FRAME_BYTES + _VF_LUMA]
        luma.extend(chunk.ljust(_VF_LUMA, b"\x00"))
    energies = [
        [
            sum(
                v * v
                for v in luma[
                    t * _VF_LUMA + q * _VF_BW : t * _VF_LUMA + (q + 1) * _VF_BW
                ]
            )
            for q in range(_AF_BANDS)
        ]
        for t in range(nf)
    ]
    return [
        sum(
            (1 << q)
            for q in range(_AF_BANDS)
            if energies[t][q] > energies[t - 1][q]
        )
        for t in range(1, nf)
    ]


def test_video_neardup_matches_text_replay(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in _t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    per_doc = {}
    for did, text in docs.items():
        hashes = _py_video_hashes(text)
        if len(hashes) < _AF_W:
            continue
        per_doc[did] = {
            "-".join(str(h) for h in hashes[i : i + _AF_W])
            for i in range(len(hashes) - _AF_W + 1)
        }
    df = Counter(s for shs in per_doc.values() for s in shs)
    kept = {
        did: {s for s in shs if df[s] <= _AF_DFCAP}
        for did, shs in per_doc.items()
    }
    ids = sorted(d for d, s in kept.items() if s)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = len(kept[a] & kept[b])
            if shared >= _AF_MIN_SHARED:
                union = len(kept[a]) + len(kept[b]) - shared
                expect[(a, b)] = (
                    shared,
                    len(kept[a]),
                    len(kept[b]),
                    shared * 1000 // union,
                )
    got = {
        (r["id_a"], r["id_b"]): (
            r["shared"],
            r["n_a"],
            r["n_b"],
            r["jac_x1000"],
        )
        for r in QUERIES["q_video_neardup"](spark, sf_dir).collect()
    }
    assert got == expect
    assert expect, "corpus has no video near-dup pairs; lane is untestable"


def test_decoders_fail_soft_on_corrupt_containers(spark):
    """Seeded byte-mutation fuzz over the fingerprint kernels: a corrupt
    WAV/Y4M container must contribute a NULL-stats row (fingerprint) or
    no rows (frame hashes) — never an exception, which would abort every
    task retry at 100 TB."""
    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import multimodal

    wav = multimodal.wav_container(bytes(range(64)) * 4, 16000)
    y4m = multimodal.y4m_container(
        [bytes(range(36))], 6, 4
    )
    rows = []
    for base in (wav, y4m):
        for cut in (1, 7, 13, len(base) // 2):
            rows.append(bytes(base[:cut]))
        for pos in (0, 3, 9, 15):
            mut = bytearray(base)
            mut[pos] ^= 0xFF
            rows.append(bytes(mut))
    media = spark.createDataFrame(
        [(i, payload) for i, payload in enumerate(rows)],
        "media_id bigint, payload binary",
    )
    fp = multimodal.audio_fingerprint(media).collect()
    assert len(fp) == len(rows)  # one row each, NULL stats where corrupt
    fh = multimodal.audio_frame_hashes(media).collect()
    vh = multimodal.video_frame_hashes(media, luma_per_frame=24).collect()
    assert isinstance(fh, list) and isinstance(vh, list)  # no crash

"""ext38 — iterative BPE training + fertility.

The replay is an INDEPENDENT implementation (collections.Counter over
collected rows, list-of-symbols merge — no sentinels, no replace(), no
shared helpers), per the q_mmr_rerank tautology lesson: the oracle and
the Spark lane share the sentinel-string representation, so a third
implementation with a different representation pins the semantics.
"""

from collections import Counter

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES, _t
from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext38 import N_MERGES


def _py_tokens(text):
    return " ".join(text.lower().split()).split(" ")


def _py_bpe(word_freqs, n_merges):
    """Classic list-of-symbols BPE: greedy left-to-right non-overlapping
    merge, argmax by (freq DESC, left, right)."""
    segs = {w: [c for c in w] for w in word_freqs}
    merges = []
    for step in range(1, n_merges + 1):
        pairs = Counter()
        for w, f in word_freqs.items():
            s = segs[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (l, r), f = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, l, r, l + r, f))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges, segs


def _word_freqs(spark, sf_dir, with_source=False):
    rows = (
        _t(spark, sf_dir, "documents").select("source", "text").collect()
    )
    wf, swf = Counter(), Counter()
    for r in rows:
        for w in _py_tokens(r["text"]):
            w = w.replace("\x01", "").replace("\x02", "")
            if w:
                wf[w] += 1
                swf[(r["source"], w)] += 1
    return (wf, swf) if with_source else wf


def test_bpe_train_matches_independent_replay(spark, sf_dir):
    wf = _word_freqs(spark, sf_dir)
    expect, _ = _py_bpe(wf, N_MERGES)
    got = [
        (r["step"], r["lsym"], r["rsym"], r["merged"], r["pair_freq"])
        for r in QUERIES["q_bpe_train"](spark, sf_dir)
        .orderBy("step")
        .collect()
    ]
    assert got == expect
    # the loop actually merges: later merges build on earlier ones
    assert any(len(m[1]) > 1 or len(m[2]) > 1 for m in got[2:])


def test_bpe_fertility_matches_independent_replay(spark, sf_dir):
    wf, swf = _word_freqs(spark, sf_dir, with_source=True)
    _, segs = _py_bpe(wf, N_MERGES)
    expect = {}
    for (src, w), f in swf.items():
        t, s = expect.get(src, (0, 0))
        expect[src] = (t + f, s + f * len(segs[w]))
    got = {
        r["source"]: (r["n_tokens"], r["n_symbols"])
        for r in QUERIES["q_bpe_fertility"](spark, sf_dir).collect()
    }
    assert got == expect
    # compression: BPE must reduce symbol count below characters and
    # stay >= token count (>= 1 symbol per token)
    for src, (t, s) in got.items():
        assert s >= t


def test_bpe_train_deterministic(spark, sf_dir):
    a = QUERIES["q_bpe_train"](spark, sf_dir).collect()
    b = QUERIES["q_bpe_train"](spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

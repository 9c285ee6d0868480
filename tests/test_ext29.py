"""ext29 — KN bigram LM, n-gram novelty, zone-map pruning, equi-depth
histogram.

Replays here are INDEPENDENT implementations (plain Python over collected
rows — own tokenization, own KN arithmetic), not calls into the helpers
the production lanes share (the q_mmr_rerank tautology lesson, ADVICE r5).
"""

import math
import os

from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.operators import indexing, layout
from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES, _t

from test_plans import _plan


def _py_tokens(text: str) -> list[str]:
    # independent normalization: lowercase, collapse ws, trim, split
    return " ".join(text.lower().split()).split(" ")


def _corpus_bigrams(spark, sf_dir):
    rows = (
        _t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    )
    docs = {}
    for r in rows:
        toks = _py_tokens(r["text"])
        docs[r["doc_id"]] = list(zip(toks, toks[1:]))
    return docs


def test_kn_bigram_matches_independent_python_replay(spark, sf_dir):
    docs = _corpus_bigrams(spark, sf_dir)
    c2, c1, n1l, n1r = {}, {}, {}, {}
    for bgs in docs.values():
        for bg in bgs:
            c2[bg] = c2.get(bg, 0) + 1
    for (w1, w2), c in c2.items():
        c1[w1] = c1.get(w1, 0) + c
        n1l[w1] = n1l.get(w1, 0) + 1
        n1r[w2] = n1r.get(w2, 0) + 1
    n1pp = len(c2)
    expect = {}
    for doc_id, bgs in docs.items():
        if not bgs:
            continue
        total = 0.0
        for w1, w2 in bgs:
            num = max(4 * c2[(w1, w2)] - 3, 0) * n1pp + 3 * n1l[w1] * n1r[w2]
            total += math.log2(num) - math.log2(4 * c1[w1] * n1pp)
        expect[doc_id] = (
            len(bgs),
            math.floor(total / len(bgs) * 1e4 + 0.5),
        )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["mean_kn_lp_e4"])
        for r in QUERIES["q_kn_bigram_ppl"](spark, sf_dir).collect()
    }
    assert got == expect


def test_kn_bigram_plan_is_jvm_only(spark, sf_dir):
    plan = _plan(QUERIES["q_kn_bigram_ppl"](spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_ngram_novelty_matches_independent_python_replay(spark, sf_dir):
    docs = _corpus_bigrams(spark, sf_dir)
    corpus = {}
    for bgs in docs.values():
        for bg in bgs:
            corpus[bg] = corpus.get(bg, 0) + 1
    expect = {}
    for doc_id, bgs in docs.items():
        if not bgs:
            continue
        counts = {}
        for bg in bgs:
            counts[bg] = counts.get(bg, 0) + 1
        novel = sum(1 for bg, c in counts.items() if corpus[bg] == c)
        expect[doc_id] = (len(counts), novel, novel * 10000 // len(counts))
    got = {
        r["doc_id"]: (r["n_types"], r["n_novel"], r["novelty_e4"])
        for r in QUERIES["q_ngram_novelty"](spark, sf_dir).collect()
    }
    assert got == expect


def test_novelty_bounds(spark, sf_dir):
    for r in QUERIES["q_ngram_novelty"](spark, sf_dir).collect():
        assert 0 <= r["n_novel"] <= r["n_types"]
        assert 0 <= r["novelty_e4"] <= 10000


# ---------------------------------------------------------------------------
# zone-map pruning
# ---------------------------------------------------------------------------

def test_pruned_read_skips_files_and_preserves_rows(spark, sf_dir, tmp_path):
    orders = _t(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_ranged")
    orders.repartitionByRange(8, "o_totalprice").write.parquet(out)
    lo, hi = 50000.0, 150000.0
    pruned, n_total, n_read = layout.pruned_read(
        spark, out, "o_totalprice", lo, hi
    )
    # the clustered layout MUST let the footer walk skip files — this
    # assertion fails if pruning is removed (pruned_read returning all
    # files) or the write stops clustering
    assert n_total == 8 and 0 < n_read < n_total
    pred = (F.col("o_totalprice") >= lo) & (F.col("o_totalprice") <= hi)
    a = pruned.filter(pred)
    b = spark.read.parquet(out).filter(pred)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pruned_read_disjoint_band_reads_nothing(spark, sf_dir, tmp_path):
    orders = _t(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_ranged2")
    orders.repartitionByRange(4, "o_totalprice").write.parquet(out)
    pruned, n_total, n_read = layout.pruned_read(
        spark, out, "o_totalprice", 1e12, 2e12
    )
    assert n_read == 0 and n_total == 4
    assert pruned.count() == 0
    # schema survives the empty path (driver re-runs rely on it)
    assert set(orders.columns) == set(pruned.columns)


def test_pruned_read_keeps_files_without_stats(spark, sf_dir, tmp_path):
    # a file whose footer carries NO statistics must be conservatively
    # kept — pruning may only use positive evidence of non-overlap
    import pyarrow.parquet as pq

    # numeric columns only: pandas→arrow would write the timestamp col as
    # TIMESTAMP(NANOS), which Spark's vectorized reader rejects
    orders = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .limit(50)
    )
    tbl = orders.toPandas()
    os.makedirs(tmp_path / "nostats", exist_ok=True)
    import pyarrow as pa

    pq.write_table(
        pa.Table.from_pandas(tbl),
        str(tmp_path / "nostats" / "part-0.parquet"),
        write_statistics=False,
    )
    pruned, n_total, n_read = layout.pruned_read(
        spark, str(tmp_path / "nostats"), "o_totalprice", 1e12, 2e12
    )
    assert n_total == 1 and n_read == 1  # kept despite a disjoint band


# ---------------------------------------------------------------------------
# equi-depth histogram
# ---------------------------------------------------------------------------

def test_hist_equidepth_matches_sorted_replay(spark, sf_dir):
    rows = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "value")
        .collect()
    )
    ordered = sorted((r["value"], r["event_id"]) for r in rows)
    n, b = len(ordered), 10
    expect = {}
    for rank0, (v, _eid) in enumerate(ordered):
        bkt = rank0 * b // n
        cnt, mn, mx = expect.get(bkt, (0, v, v))
        expect[bkt] = (cnt + 1, min(mn, v), max(mx, v))
    got = {
        r["bucket"]: (r["n_rows"], r["vmin"], r["vmax"])
        for r in QUERIES["q_hist_equidepth"](spark, sf_dir).collect()
    }
    assert got == expect
    # equal-height: bucket sizes differ by at most 1
    sizes = [c for c, _, _ in expect.values()]
    assert max(sizes) - min(sizes) <= 1


def test_hist_equidepth_avoids_global_window(spark, sf_dir):
    plan = _plan(QUERIES["q_hist_equidepth"](spark, sf_dir))
    # the rank windows must partition by the range bucket, never an empty
    # PARTITION BY (the one-task global sort the two-phase plan avoids)
    assert "__bucket" in plan


def test_weighted_sample_matches_independent_python_replay(spark, sf_dir):
    import hashlib

    rows = sorted(
        (r["doc_id"], r["n_chars"])
        for r in _t(spark, sf_dir, "documents")
        .filter("n_chars IS NOT NULL AND n_chars > 0")
        .select("doc_id", "n_chars")
        .collect()
    )
    total = sum(w for _d, w in rows)
    # cumulative half-open intervals in doc_id order
    ivals, acc = [], 0
    for d, w in rows:
        ivals.append((acc, acc + w, d, w))
        acc += w
    expect = {}
    for k in range(100):
        h = int(hashlib.md5(f"draw:{k}".encode()).hexdigest()[:8], 16)
        pos = h % total
        hit = [(d, w) for lo, hi, d, w in ivals if lo <= pos < hi]
        assert len(hit) == 1
        expect[k] = hit[0]
    got = {
        r["draw_id"]: (r["doc_id"], r["n_chars"])
        for r in QUERIES["q_weighted_sample"](spark, sf_dir).collect()
    }
    assert got == expect  # exactly one doc per draw, weight-proportional


def test_lsa_topic_matches_independent_numpy_replay(spark, sf_dir):
    """Float replay with a ±2e-9 loading tolerance: the replay sums in
    arbitrary order (plain float adds), while the lane's decimal routing
    is order-free — agreement inside a few ulps is the correctness bar;
    bit-exactness vs the DuckDB oracle is check_oracle's job."""
    import math
    from collections import Counter, defaultdict

    import numpy as np

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    tf = defaultdict(Counter)
    for r in docs:
        tf[r["doc_id"]].update(_py_tokens(r["text"]))
    dfc = Counter()
    for did in tf:
        dfc.update(set(tf[did]))
    n = len(docs)
    terms = sorted(dfc)
    tidx = {t: i for i, t in enumerate(terms)}
    triples = [
        (did, tidx[t], c * (math.log2(n) - math.log2(dfc[t])))
        for did in tf
        for t, c in tf[did].items()
    ]
    v = np.ones(len(terms))
    for _ in range(2):
        u = defaultdict(float)
        for did, ti, w in triples:
            u[did] += w * v[ti]
        un = math.sqrt(sum(x * x for x in u.values()))
        u = {did: x / un for did, x in u.items()}
        s = np.zeros(len(terms))
        for did, ti, w in triples:
            s[ti] += w * u[did]
        norm2 = float(np.dot(s, s))
        v = s / math.sqrt(norm2)
    got = {
        r["term"]: (r["loading_e9"], r["sigma_e6"])
        for r in QUERIES["q_lsa_topic"](spark, sf_dir).collect()
    }
    assert set(got) == set(terms)
    sigma = math.floor(math.sqrt(norm2) * 1e6 + 0.5)
    for t in terms:
        assert abs(got[t][0] - math.floor(v[tidx[t]] * 1e9 + 0.5)) <= 2
        assert abs(got[t][1] - sigma) <= 2
    # a unit vector: sum of squared loadings ~ 1 (e18 scale)
    tot = sum(l * l for l, _ in got.values())
    assert abs(tot - 1e18) < 1e13


def test_global_index_tiebreak_matches_single_window(spark):
    # duplicate order-col values: the tiebreak column must reproduce the
    # single-partition ORDER BY (k, tie) total order exactly
    data = [(float(k), t) for k in [1, 2, 2, 2, 3, 3, 4] for t in (2, 1)]
    df = spark.createDataFrame(
        [(k, t + i * 10) for i, (k, t) in enumerate(data)], ["k", "tie"]
    )
    got = {
        (r["k"], r["tie"]): r["idx"]
        for r in indexing.global_index(
            df, "k", buckets=3, tiebreak_cols=["tie"]
        ).collect()
    }
    expect_order = sorted(got, key=lambda kt: (kt[0], kt[1]))
    assert [got[kt] for kt in expect_order] == list(range(1, len(data) + 1))

"""Product quantization (operators/pq.py, queries_ext40).

The replay here is an INDEPENDENT third implementation (pure Python
dict/list PQ with decimal.Decimal centroid sums — no DataFrames, no
shared SQL templates), per the ext38 tautology lesson: the Spark lane
and the DuckDB oracle both speak "decimal-summed Lloyd's"; a replay
with a different representation pins that the SEMANTICS (lowest-id
init, tie-to-lower-cluster, order-free decimal means, ADC decimal
sums) are what we think they are, not an artifact both engines share.
"""

from decimal import ROUND_HALF_UP, Decimal

import pytest

from glue_etl_nyc_yellow_taxi_analysis_spark.operators import pq
from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES, _t
from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext40 import (
    _PQ_ITERS,
    _PQ_K,
    _PQ_M,
    _PQ_QIDS,
    _PQ_TOPK,
)

_Q18 = Decimal("1e-18")


def _dec18(v: float) -> Decimal:
    # Spark's double→DECIMAL(27,18) cast: HALF_UP on the shortest repr
    return Decimal(repr(float(v))).quantize(_Q18, rounding=ROUND_HALF_UP)


def _sqdist(a, b) -> float:
    # the engines' sequential zip_with/aggregate fold, replayed in
    # IEEE-double Python arithmetic in the same order
    acc = 0.0
    for x, y in zip(a, b):
        acc += (x - y) * (x - y)
    return acc


def _py_pq(vecs: dict, m: int, k: int, iters: int):
    """Train + encode, returning (codebook {(sub, cluster): centroid},
    codes {(id, sub): cluster})."""
    d = len(next(iter(vecs.values()))) // m
    pts = {
        (i, j): v[j * d : (j + 1) * d] for i, v in vecs.items() for j in range(m)
    }
    cents = {}
    for j in range(m):
        for c, i in enumerate(sorted(vecs)[:k]):
            cents[(j, c)] = pts[(i, j)]

    def assign():
        out = {}
        for (i, j), sx in pts.items():
            best = min(
                (
                    (_sqdist(sx, cent), c)
                    for (sj, c), cent in cents.items()
                    if sj == j
                ),
            )
            out[(i, j)] = best[1]
        return out

    for _ in range(iters):
        a = assign()
        sums, counts = {}, {}
        for (i, j), c in a.items():
            counts[(j, c)] = counts.get((j, c), 0) + 1
            for dim, v in enumerate(pts[(i, j)]):
                key = (j, c, dim)
                sums[key] = sums.get(key, Decimal(0)) + _dec18(v)
        cents = {}
        for (j, c), n in counts.items():
            cents[(j, c)] = [
                float(sums[(j, c, dim)]) / n for dim in range(d)
            ]
    return cents, assign()


@pytest.fixture(scope="module")
def pq_replay(spark, sf_dir):
    rows = (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r["vec_id"]: [float(v) for v in r["embedding"]] for r in rows}
    cents, codes = _py_pq(vecs, _PQ_M, _PQ_K, _PQ_ITERS)
    return vecs, cents, codes


def test_codebook_shape(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    cb = pq.pq_train(emb, m=_PQ_M, k=_PQ_K, iters=_PQ_ITERS).collect()
    subs = {r["sub"] for r in cb}
    assert subs == set(range(_PQ_M))
    dim = len(emb.first()["embedding"])
    for r in cb:
        assert 0 <= r["cluster"] < _PQ_K
        assert len(r["centroid"]) == dim // _PQ_M


def test_codes_match_replay(spark, sf_dir, pq_replay):
    _, _, py_codes = pq_replay
    emb = _t(spark, sf_dir, "embeddings")
    cb = pq.pq_train(emb, m=_PQ_M, k=_PQ_K, iters=_PQ_ITERS)
    got = {
        (r["id"], r["sub"]): r["code"]
        for r in pq.pq_encode(emb, cb, m=_PQ_M).collect()
    }
    assert got == py_codes


def test_adc_topk_matches_replay(spark, sf_dir, pq_replay):
    vecs, cents, codes = pq_replay
    # replay ADC exactly: decimal cell distances, exact decimal sums
    expect = []
    for qid in _PQ_QIDS:
        d = len(vecs[qid]) // _PQ_M
        dtab = {
            (j, c): _dec18(
                _sqdist(vecs[qid][j * d : (j + 1) * d], cent)
            )
            for (j, c), cent in cents.items()
        }
        scored = []
        for i in vecs:
            if i == qid:
                continue
            adc = sum(dtab[(j, codes[(i, j)])] for j in range(_PQ_M))
            scored.append((adc, i))
        scored.sort()
        for rank, (adc, i) in enumerate(scored[:_PQ_TOPK], start=1):
            expect.append(
                (
                    qid,
                    i,
                    float(adc.quantize(Decimal("1e-6"), ROUND_HALF_UP)),
                    rank,
                )
            )
    got = [
        (r["query_id"], r["vec_id"], r["adc_dist"], r["rank"])
        for r in QUERIES["q_ann_pq_oracle"](spark, sf_dir)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert sorted(got) == sorted(expect)


def test_recall_lane_contract(spark, sf_dir):
    rows = QUERIES["q_pq_recall"](spark, sf_dir).collect()
    assert {r["query_id"] for r in rows} == set(_PQ_QIDS)
    for r in rows:
        assert 0 <= r["hits_adc"] <= _PQ_TOPK
        assert 0 <= r["hits_rerank"] <= _PQ_TOPK
        # the exact re-rank can only improve on what the shortlist kept
        assert r["hits_rerank"] >= r["hits_adc"]
    # raw ADC recall on near-random synthetic vectors is genuinely
    # modest (quantization flattens fine distances) — the FLOOR lives
    # on the re-ranked path, which is the production search shape
    # (measured 27/30 at sf0.001; exact values are oracle-pinned)
    assert sum(r["hits_rerank"] for r in rows) >= len(_PQ_QIDS) * _PQ_TOPK * 2 // 3


def test_rerank_lane_contract(spark, sf_dir):
    rows = (
        QUERIES["q_pq_rerank"](spark, sf_dir)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert {r["query_id"] for r in rows} == set(_PQ_QIDS)
    for qid in _PQ_QIDS:
        mine = [r for r in rows if r["query_id"] == qid]
        assert [r["rank"] for r in mine] == list(range(1, _PQ_TOPK + 1))
        dists = [r["l2_dist"] for r in mine]
        assert dists == sorted(dists)
        assert all(r["vec_id"] != qid for r in mine)


def test_index_persist_matches_inmemory_and_reruns(spark, sf_dir):
    """The persisted-index lane must return exactly what the in-memory
    pipeline returns over the same base/incoming split — the catalog
    round trip (bucketed codes + codebook) must be value-neutral — and
    must be re-runnable twice in one session (drop + rmtree + overwrite)."""
    from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext40 import (
        _PQI_BASE,
        _PQI_BATCH,
        _PQI_QPRED,
        _PQI_TOPK,
    )

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.filter(_PQI_BASE)
    cb = pq.pq_train(base, m=_PQ_M, k=_PQ_K, iters=_PQ_ITERS)
    from pyspark.sql import functions as F

    incoming = (
        emb.filter(_PQI_QPRED)
        .orderBy("vec_id")
        .limit(_PQI_BATCH)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    expect = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["adc_dist"])
        for r in pq.pq_adc_topk(
            base, incoming, cb, k=_PQI_TOPK, m=_PQ_M
        ).collect()
    }
    for _ in range(2):
        got = {
            (r["query_id"], r["rank"]): (r["vec_id"], r["adc_dist"])
            for r in QUERIES["q_pq_index_persist"](spark, sf_dir).collect()
        }
        assert got == expect
    assert expect  # the incoming batch must actually probe something


def test_ivfpq_scores_only_probed_clusters(spark, sf_dir):
    """IVFADC's whole point is the bound: every returned neighbor must
    live in one of the query's nprobe probed coarse cells.  Recompute
    the probe set independently (exact L2 to the lowest-id reps, ties
    to the lower label) and check membership; also pin the rank
    contract."""
    from pyspark.sql import functions as F

    from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext40 import (
        _IVFPQ_NPROBE,
    )

    rows = (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    vecs = {r["vec_id"]: [float(v) for v in r["embedding"]] for r in rows}
    label = {r["vec_id"]: r["label"] for r in rows}
    reps = {}
    for vid in sorted(vecs):
        reps.setdefault(label[vid], vecs[vid])

    def sqd(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    probed = {}
    for qid in _PQ_QIDS:
        ranked = sorted((sqd(vecs[qid], c), lab) for lab, c in reps.items())
        probed[qid] = {lab for _, lab in ranked[:_IVFPQ_NPROBE]}

    out = (
        QUERIES["q_ann_ivfpq_oracle"](spark, sf_dir)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert {r["query_id"] for r in out} == set(_PQ_QIDS)
    for r in out:
        assert label[r["vec_id"]] in probed[r["query_id"]], r
        assert r["vec_id"] != r["query_id"]
    for qid in _PQ_QIDS:
        ranks = [r["rank"] for r in out if r["query_id"] == qid]
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(ranks) <= _PQ_TOPK

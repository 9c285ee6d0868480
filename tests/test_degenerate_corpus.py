"""Degenerate-corpus agreement gate over the ENTIRE documents-only
registry.

One sweep of this gate (round 6) found nine real defects across seven
lanes in one afternoon: ANSI div-by-zero crashes in the zipf/heaps
regressions, length moments and LSA power iteration; a BPE trainer
crash on a pair-less vocabulary; and NULL-vs-zero / phantom-''-row
contract gaps in doc_chunk, the quality funnel, sketch merges and the
span-mask plan.  The lane list is DERIVED from the registry (any
oracle that reads only `documents`), so new lanes are covered on
arrival without editing this file.

Corpora: the all-NULL doc (every optional field absent) and a mixed
corpus where the ONLY source of ''-tokens/shingles is a NULL-text doc
— the two shapes that exposed every defect above.
"""

import os
import re
import tempfile

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import ORACLE, QUERIES

# byte-positional codec oracles (ASCII replay) and streaming lanes
# (startup cost, covered by their own drain tests) are out of scope
_SKIP = {
    "q_wav_decode", "q_bmp_decode", "q_y4m_decode", "q_audio_energy_windows",
    "q_image_blockhash_neardup", "q_video_scene_cut", "q_multimodal_features",
    "q_multimodal_framesample", "q_multimodal_resize", "q_binaryfile_source",
    "q_binary_funcs", "q_stream_bloom_admission", "q_stream_dedup_incremental",
    "q_stream_quality_filter", "q_csv_roundtrip",
}

_TABLES = r"\b(region|nation|customer|supplier|part|orders|lineitem|events|embeddings)\b"


def _docs_only_lanes():
    out = []
    for name, sql in ORACLE.items():
        if sql is None or name in _SKIP:
            continue
        if not re.search(_TABLES, sql) and "documents" in sql:
            out.append(name)
    return sorted(out)


_CORPORA = {
    "allnull": [(None, None, None, None)],
    "mix": [
        (None, None, None, None),
        ("", "en", "s1", 0),
        ("a", None, "s1", 1),
        ("dup dup dup", "en", None, 11),
        ("spark join fast", "de", "s2", 15),
        ("spark join fast", "de", "s2", None),
    ],
}


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return repr(v) if v == v else "nan"
    return str(v)


@pytest.fixture(scope="module", params=sorted(_CORPORA))
def corpus_dir(request):
    rows = _CORPORA[request.param]
    d = tempfile.mkdtemp(prefix=f"sg_degen_{request.param}_")
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array([r[0] for r in rows], pa.string()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    emb = pa.table(
        {
            "vec_id": pa.array(range(4), pa.int64()),
            "embedding": pa.array(
                [[0.1] * 8, [0.2] * 8, [-0.1] * 8, [0.3] * 8],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0, 0, 1, 1], pa.int32()),
        }
    )
    pq.write_table(emb, os.path.join(d, "embeddings.parquet"))
    return d


@pytest.mark.parametrize("name", _docs_only_lanes())
def test_degenerate_corpus_agreement(spark, corpus_dir, name):
    df = QUERIES[name](spark, corpus_dir)
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    s_lines = sorted(
        "|".join(_norm(r[i]) for i in order) for r in df.collect()
    )
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{corpus_dir}/{t}.parquet'"
        )
    res = con.execute(ORACLE[name])
    o_cols = [c[0] for c in res.description]
    oo = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
    d_lines = sorted(
        "|".join(_norm(r[i]) for i in oo) for r in res.fetchall()
    )
    assert sorted(cols) == sorted(o_cols)
    assert s_lines == d_lines

"""Deterministic sf1-style data generator for scale rehearsals.

The driver ships sf0.001/0.01/0.1 only; SCALE.md's claims about
sub-quadratic dedup/ANN growth need at least one measured point past
sf0.1.  This generator models the driver tables' observed distributions
(vocab + token frequencies + length spread + lang/source mix for
``documents``; per-dim value spread + label mix for ``embeddings``) and
plants near-duplicate copies at a FIXED per-doc rate, so duplicate
density — the thing LSH collision counts scale with — is held constant
as n grows.  Seeded numpy; same inputs → byte-identical parquet.

Usage:
    python tools/gen_scale_data.py /tmp/sg_sf1 --docs 50000 --vectors 20000

Writes ``documents.parquet`` and ``embeddings.parquet`` into the target
dir (the layout queries expect from an sf dir).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"
DUP_RATE = 0.05      # fraction of docs that are near-dup copies of an
                     # earlier doc — matches the driver corpus' planted
                     # density (~25 verified pairs / 500 docs at sf0.01)
MUTATE_RATE = 0.10   # per-token replacement probability in a copy


def _base_profile():
    import duckdb

    con = duckdb.connect()
    toks = con.sql(
        f"SELECT tok, COUNT(*) AS c FROM (SELECT UNNEST(string_split(text, ' ')) AS tok "
        f"FROM '{BASE}/documents.parquet') GROUP BY tok ORDER BY tok"
    ).fetchall()
    lengths = [
        r[0]
        for r in con.sql(
            f"SELECT len(string_split(text, ' ')) FROM '{BASE}/documents.parquet'"
        ).fetchall()
    ]
    langs = con.sql(
        f"SELECT lang, COUNT(*) FROM '{BASE}/documents.parquet' GROUP BY lang ORDER BY lang"
    ).fetchall()
    sources = con.sql(
        f"SELECT source, COUNT(*) FROM '{BASE}/documents.parquet' GROUP BY source ORDER BY source"
    ).fetchall()
    labels = con.sql(
        f"SELECT label, COUNT(*) FROM '{BASE}/embeddings.parquet' GROUP BY label ORDER BY label"
    ).fetchall()
    dim = con.sql(f"SELECT len(embedding) FROM '{BASE}/embeddings.parquet' LIMIT 1").fetchall()[0][0]
    con.close()
    return toks, lengths, langs, sources, labels, dim


def gen_documents(n_docs: int, rng: np.random.Generator, profile) -> pa.Table:
    toks, lengths, langs, sources, _, _ = profile
    vocab = np.array([t for t, _ in toks])
    w = np.array([c for _, c in toks], dtype=float)
    w /= w.sum()
    lang_v = np.array([v for v, _ in langs])
    lang_w = np.array([c for _, c in langs], dtype=float)
    lang_w /= lang_w.sum()
    src_v = np.array([v for v, _ in sources])
    src_w = np.array([c for _, c in sources], dtype=float)
    src_w /= src_w.sum()
    lengths = np.array(lengths)

    texts: list[str] = []
    tok_lists: list[np.ndarray] = []
    for i in range(n_docs):
        if i > 0 and rng.random() < DUP_RATE:
            # near-dup: copy an earlier doc, mutate ~10% of tokens
            src_toks = tok_lists[int(rng.integers(0, i))].copy()
            mask = rng.random(len(src_toks)) < MUTATE_RATE
            src_toks[mask] = rng.choice(vocab, size=int(mask.sum()), p=w)
            cur = src_toks
        else:
            ln = int(rng.choice(lengths))
            cur = rng.choice(vocab, size=ln, p=w)
        tok_lists.append(cur)
        texts.append(" ".join(cur))

    return pa.table(
        {
            "doc_id": pa.array(range(n_docs), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(rng.choice(lang_v, size=n_docs, p=lang_w)),
            "source": pa.array(rng.choice(src_v, size=n_docs, p=src_w)),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )


def gen_embeddings(n_vecs: int, rng: np.random.Generator, profile) -> pa.Table:
    *_, labels, dim = profile
    lab_v = np.array([v for v, _ in labels])
    lab_w = np.array([c for _, c in labels], dtype=float)
    lab_w /= lab_w.sum()
    # observed per-element spread: mean ~0, std ~0.125, |x| <= ~0.34
    vals = np.clip(rng.normal(0.0, 0.125, size=(n_vecs, dim)), -0.34, 0.34).astype(
        np.float32
    )
    return pa.table(
        {
            "vec_id": pa.array(range(n_vecs), type=pa.int64()),
            "embedding": pa.array(list(vals), type=pa.list_(pa.float32())),
            "label": pa.array(
                rng.choice(lab_v, size=n_vecs, p=lab_w).astype(np.int32),
                type=pa.int32(),
            ),
        }
    )


# key columns that must be SHIFTED per replica so the scaled tables keep
# referential integrity and per-key cardinalities (self-similar scaling:
# 10 disjoint copies of the sf0.1 key space, the standard way to scale a
# TPC-H-ish corpus without distorting join fan-outs or group sizes).
# Shared stride names keep FKs aligned across tables.
_TPCH_SHIFTS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
}
_STRIDE_SOURCES = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
}


def gen_tpch(out_dir: str, factor: int) -> None:
    """Scale the relational tables by ``factor`` via key-shifted replicas;
    region/nation are fixed dimensions and copy through unchanged."""
    import duckdb
    import shutil

    con = duckdb.connect()
    strides = {
        name: con.sql(
            f"SELECT COALESCE(MAX({col}), 0) + 1 FROM '{BASE}/{table}.parquet'"
        ).fetchone()[0]
        for name, (table, col) in _STRIDE_SOURCES.items()
    }
    for table in ("region", "nation"):
        shutil.copy(f"{BASE}/{table}.parquet", os.path.join(out_dir, f"{table}.parquet"))
    for table, shifts in _TPCH_SHIFTS.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{BASE}/{table}.parquet'"
            ).fetchall()
        ]
        select = ", ".join(
            f"{c} + i * {strides[shifts[c]]} AS {c}" if c in shifts else c
            for c in cols
        )
        con.sql(
            f"COPY (SELECT {select} FROM '{BASE}/{table}.parquet' "
            f"CROSS JOIN range({factor}) t(i)) TO "
            f"'{os.path.join(out_dir, table + '.parquet')}' (FORMAT parquet)"
        )
        print(f"scaled {table} x{factor}")
    con.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--docs", type=int, default=50000)
    ap.add_argument("--vectors", type=int, default=20000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--tpch-factor",
        type=int,
        default=0,
        help="also scale the relational tables by N via key-shifted "
        "replicas (0 = documents/embeddings only)",
    )
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    profile = _base_profile()
    rng = np.random.default_rng(args.seed)
    docs = gen_documents(args.docs, rng, profile)
    pq.write_table(docs, os.path.join(args.out_dir, "documents.parquet"))
    emb = gen_embeddings(args.vectors, rng, profile)
    pq.write_table(emb, os.path.join(args.out_dir, "embeddings.parquet"))
    print(f"wrote {args.docs} docs + {args.vectors} vectors to {args.out_dir}")
    if args.tpch_factor:
        gen_tpch(args.out_dir, args.tpch_factor)


if __name__ == "__main__":
    main()

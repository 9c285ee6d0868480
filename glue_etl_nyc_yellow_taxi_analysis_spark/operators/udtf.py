"""Python UDTF surface (Spark 4 user-defined table functions).

The reference exposes row→table expansion only through its relationalize/
unnest utilities (SURVEY §2.8); Spark 4's Python UDTF is the engine's
escape hatch for *imperative* row→table expansion — logic with loops,
carried state, or branching that higher-order functions can't express.

Scale posture: a UDTF is Python-per-row (Arrow-batched input when
``useArrow`` applies, but the generator itself is interpreted) — it is the
SLOW path.  Everything expressible as sequence/slice/explode should use
the expression form (see queries_ext.q_doc_chunk, the preferred twin);
the UDTF exists so the one genuinely imperative expansion in a pipeline
doesn't force a whole job onto RDDs.  The chunker below deliberately
mirrors q_doc_chunk's semantics so the DuckDB oracle proves the two
mechanisms agree.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx: int, n_tokens: int, chunk_text: string")
class ChunkDocUdtf:
    """Fixed-size token windows (size 50, stride 40) over normalized text
    — same semantics as the expression twin, implemented as an imperative
    generator."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        toks = " ".join(text.lower().split()).split(" ")
        starts = range(0, max(len(toks), 1), 40)
        for st in starts:
            piece = toks[st : st + 50]
            yield st // 40, len(piece), " ".join(piece)


def chunk_docs_lateral(spark, docs, text_col: str = "text"):
    """LATERAL-join the UDTF against each document row.

    Returns (doc_id, chunk_idx, n_tokens, chunk_text) — one row per chunk.
    """
    spark.udtf.register("chunk_doc_udtf", ChunkDocUdtf)
    docs.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.chunk_text
        FROM __udtf_docs d, LATERAL chunk_doc_udtf({text_col}) c
        """
    )

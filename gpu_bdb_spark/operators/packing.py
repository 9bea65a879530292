"""Sequence packing for LLM pretraining pipelines: group variable-length
documents into fixed-capacity training sequences.

True bin packing is sequential; the distributed form used at corpus
scale fixes a deterministic order and packs independently inside hash
buckets: docs land in `n_buckets` buckets by id, each bucket is packed
next-fit in id order (new pack when the running token total would
overflow), and buckets never talk to each other — embarrassingly
parallel, deterministic on any partitioning, and within a capacity of
optimal per bucket for typical length distributions. The per-bucket
sequential scan is an Arrow-batched applyInPandas seam (the one place
Python is the point: a running-state loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    capacity: int = 2048,
    n_buckets: int = 32,
) -> DataFrame:
    """Assign every document a (bucket, pack) slot; `bucket` =
    id % n_buckets, `pack` = next-fit pack index within the bucket in
    ascending id order. A doc longer than `capacity` gets a pack of its
    own (next-fit semantics: a new pack opens only when the current one
    is non-empty and would overflow).

    Scale: one shuffle on the bucket id; per-bucket state is two
    integers. Raise n_buckets with the corpus so buckets stay
    executor-sized; packing quality is unaffected by bucket count for
    iid lengths.
    """
    schema = "doc_id long, bucket int, pack int, n_tokens long"

    def pack_bucket(pdf):
        import pandas as _pd

        pdf = pdf.sort_values("doc_id")
        cum = 0
        pack = 0
        packs = []
        for t in pdf["n_tokens"]:
            t = int(t)
            if cum > 0 and cum + t > capacity:
                pack += 1
                cum = 0
            cum += t
            packs.append(pack)
        return _pd.DataFrame({
            "doc_id": pdf["doc_id"].astype("int64"),
            "bucket": pdf["bucket"].astype("int32"),
            "pack": _pd.Series(packs, index=pdf.index, dtype="int32"),
            "n_tokens": pdf["n_tokens"].astype("int64"),
        })

    prepared = df.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(n_buckets)).cast("int").alias("bucket"),
        F.col(token_col).cast("long").alias("n_tokens"),
    )
    return prepared.groupBy("bucket").applyInPandas(pack_bucket, schema)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int | None = None,
) -> DataFrame:
    """Split each document into fixed-size token chunks (the standard
    pretraining chunking step: long docs become training-length windows,
    optionally overlapping via `stride` < chunk_tokens for context
    continuity).

    Chunk starts are a per-doc arithmetic sequence (0, stride, 2·stride
    …), so the whole op is explode + slice + array_join — pure codegen'd
    column work, no shuffle AT ALL (each output row derives from one
    input row; Spark keeps it map-side). The final (possibly short)
    chunk is kept iff it contains at least one new token past the
    previous chunk — docs shorter than chunk_tokens yield exactly one
    chunk with all their tokens.

    Returns (id, chunk_idx, chunk_text, n_chunk_tokens).
    """
    from gpu_bdb_spark.functions import tokenize

    s = stride or chunk_tokens
    if not 1 <= s <= chunk_tokens:
        raise ValueError(f"stride must be in [1, chunk_tokens], got {s}")
    toks = F.col("_toks")
    n = F.size(toks)
    # number of chunks: 1 + ceil(max(n - chunk_tokens, 0) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - chunk_tokens, F.lit(0)) / F.lit(s)).cast("int")
    starts = F.sequence(F.lit(0), (n_chunks - 1) * s, F.lit(s))
    out = (
        df.select(F.col(id_col), tokenize(F.lower(F.col(text_col)))
                  .alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select(
            F.col(id_col),
            F.size("_toks").alias("_n"),
            F.col("_toks"),
            F.posexplode(starts).alias("chunk_idx", "_start"),
        )
    )
    piece = F.slice(F.col("_toks"), F.col("_start") + 1, chunk_tokens)
    return out.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.least(F.lit(chunk_tokens), F.col("_n") - F.col("_start"))
        .cast("long").alias("n_chunk_tokens"),
    )

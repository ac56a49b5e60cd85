"""Incremental near-dup detection over a document stream (the streaming
twin of dedup_minhash_pairs' candidate generation).

The batch pipeline materializes a persisted signature index — one row
per document, 32 minima + 8 band buckets. A live corpus grows; the
standard incremental design keeps that index and, for each arriving batch,
computes signatures for the NEW documents only and probes the index by
band bucket (equi-join). This module is exactly that, in Structured
Streaming terms:

  doc stream -> stateless row-wise signatures (array expressions, no
  aggregation, so append mode needs no watermark) -> explode band
  buckets -> stream-static equi-join against the index bucket table ->
  unordered-pair normalization -> stateful dropDuplicates.

At 100 TB the index side is a bucketed table on `bucket`; the
stream-static join then shuffles only the (tiny) per-batch band rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from catalyst_spark.queries.pipeline import (
    _band_buckets_array,
    minhash_signatures_rowwise,
)


def stream_minhash_candidates(
    doc_stream: DataFrame, index_bands: DataFrame
) -> DataFrame:
    """(doc_id, text) stream + static (doc_id, bucket) index -> distinct
    candidate pairs (a_id < b_id) that share any LSH band bucket.

    Replaying a corpus against its own full index yields exactly the
    batch operator's candidate set (tested); in production the index
    holds yesterday's corpus and the stream is today's arrivals.
    """
    sigs = minhash_signatures_rowwise(doc_stream)
    bands = sigs.select(
        "doc_id", F.explode(_band_buckets_array()).alias("bucket")
    )
    return (
        bands.join(
            index_bands.select(
                F.col("doc_id").alias("index_id"), "bucket"
            ),
            "bucket",
        )
        .where(F.col("doc_id") != F.col("index_id"))
        .select(
            F.least("doc_id", "index_id").alias("a_id"),
            F.greatest("doc_id", "index_id").alias("b_id"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )

"""Incremental benchmark decontamination: eval documents arrive as a
stream and are swept against the TRAINING corpus's persisted shingle
index — the streaming twin of queries.pipeline.contamination_overlap,
same stream-vs-static-index shape as streaming.minhash.

Everything on the stream side is stateless column expressions (shingle
explode + hash), so the only streaming state is the (eval_id, train_id)
count aggregate, emitted in update mode; the threshold is applied by
the consumer, since a pair's shared-shingle count can keep growing as
more of the eval doc's shingles arrive in later batches (e.g. document
revisions) — the final counts equal the batch sweep's (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from catalyst_spark.queries.pipeline import _h60, _shingled
from catalyst_spark.tables import load


def train_shingle_index(spark: SparkSession, sf_dir: str, eval_source: str) -> DataFrame:
    """(train_id, h) — distinct shingle hashes of every non-eval doc."""
    docs = load(spark, sf_dir, "documents")
    train = docs.where(F.col("source") != eval_source)
    return _shingled(train).select(
        F.col("doc_id").alias("train_id"), F.explode("shingles").alias("s")
    ).select("train_id", F.expr(_h60("s")).alias("h"))


def stream_contamination_counts(
    eval_stream: DataFrame, train_index: DataFrame
) -> DataFrame:
    """(doc_id, text) eval stream -> running (eval_id, train_id,
    shared_shingles) counts against the static train index. Update-mode
    aggregation; shuffle keys are 8-byte shingle hashes."""
    ev = _shingled(eval_stream).select(
        F.col("doc_id").alias("eval_id"), F.explode("shingles").alias("s")
    ).select("eval_id", F.expr(_h60("s")).alias("h"))
    return (
        ev.join(train_index, "h")
        .groupBy("eval_id", "train_id")
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
    )

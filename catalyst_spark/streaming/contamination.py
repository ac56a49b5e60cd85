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


def bloom_filter_words(spark: SparkSession, sf_dir: str, eval_source: str) -> list[int]:
    """Dense 8192-word (2^18-bit) Bloom filter over the train corpus's
    shingle hashes — the list is model-sized (32 KB regardless of corpus
    size), so collecting it to the driver is the same pattern as
    ivf_train's centroids: the MODEL moves, the data never does."""
    from catalyst_spark.queries.pipeline import _BLOOM_BITS_LOG2, _BLOOM_K

    mask = (1 << _BLOOM_BITS_LOG2) - 1
    probe = ", ".join(
        f"shiftright(h, {_BLOOM_BITS_LOG2 * j}) & {mask}" for j in range(_BLOOM_K)
    )
    docs = load(spark, sf_dir, "documents")
    train = docs.where(F.col("source") != eval_source)
    rows = (
        _shingled(train)
        .select(F.explode("shingles").alias("s"))
        .select(F.expr(_h60("s")).alias("h"))
        .select(F.explode(F.expr(f"array({probe})")).alias("p"))
        .select(
            F.expr("shiftright(p, 5)").alias("word_idx"),
            F.expr("shiftleft(cast(1 as bigint), cast(p & 31 as int))").alias("m"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(m)").alias("bits"))
        .collect()
    )
    words = [0] * (1 << (_BLOOM_BITS_LOG2 - 5))
    for r in rows:
        words[r["word_idx"]] = r["bits"]
    return words


def stream_bloom_probe(eval_stream: DataFrame, bloom_words: list[int]) -> DataFrame:
    """(doc_id, text) eval stream -> per-doc (eval_id, n_shingles,
    bloom_hits) against the broadcast Bloom filter — the constant-memory
    streaming twin of queries.pipeline.bloom_decontaminate's probe path.

    COMPLETELY STATELESS: the filter rides into the plan as one
    array<bigint> literal row (stream-static broadcast cross join of a
    single row), and the probe is a row-wise higher-order-function
    projection — append mode, no watermark, no state store. This is the
    shape that screens an unbounded document stream against a fixed
    training corpus at any throughput.
    """
    from catalyst_spark.queries.pipeline import _BLOOM_BITS_LOG2, _BLOOM_K

    spark = eval_stream.sparkSession
    bloom_row = spark.createDataFrame([(bloom_words,)], "bloom array<bigint>")
    mask = (1 << _BLOOM_BITS_LOG2) - 1
    bit_checks = " and ".join(
        f"""(element_at(bloom,
               cast(shiftright(shiftright(h, {_BLOOM_BITS_LOG2 * j}) & {mask}, 5)
                    as int) + 1)
             & shiftleft(cast(1 as bigint),
                         cast((shiftright(h, {_BLOOM_BITS_LOG2 * j}) & {mask}) & 31
                              as int))) != 0"""
        for j in range(_BLOOM_K)
    )
    return (
        _shingled(eval_stream)
        .crossJoin(F.broadcast(bloom_row))
        .select(
            F.col("doc_id").alias("eval_id"),
            F.expr("size(shingles)").alias("n_shingles"),
            F.expr(
                f"""size(filter(transform(shingles, sh -> {_h60('sh')}),
                                h -> {bit_checks}))"""
            ).cast("bigint").alias("bloom_hits"),
        )
    )


def train_window_index(spark: SparkSession, sf_dir: str, eval_source: str) -> DataFrame:
    """Distinct stride-1 8-token window hashes of every non-eval doc —
    the static side of the substring-level decontamination probe."""
    from catalyst_spark.queries.pipeline import _windowed

    docs = load(spark, sf_dir, "documents")
    return (
        _windowed(docs.where(F.col("source") != eval_source))
        .select("h")
        .distinct()
    )


def stream_window_decontaminate(
    eval_stream: DataFrame, window_index: DataFrame
) -> DataFrame:
    """(doc_id, text) eval stream -> per-doc substring decontamination
    stats against the static train window index: total windows, matched
    windows, and the longest consecutive matched-position run — the
    streaming twin of queries.pipeline.window_decontaminate (minus the
    train-doc attribution, which needs the full (h, train_id) table
    rather than the distinct-hash index).

    Each document arrives as one row, so every window of a doc lands in
    the same micro-batch and the update-mode aggregate emits exactly
    one final row per doc; the max-run is a codegen'd fold over the
    sorted matched positions AFTER the aggregate (state per doc is the
    matched-position SET — bounded by the doc's own length).

    Re-delivery safe (ADVICE r4): state is collect_set over positions,
    so a doc_id resent in a later micro-batch (revision re-send of the
    same text) neither double-counts n_windows nor resets max_run on
    duplicate positions — the aggregate is idempotent per (doc, pos).
    For long-lived streams where doc_ids never recur after a horizon,
    bound state by adding `.withWatermark(...)` on an event-time column
    upstream of this operator; without one, state grows with the number
    of distinct doc_ids (the same contract as stream_dedup).
    """
    from catalyst_spark.queries.pipeline import _WIN_TOKENS, _h60

    win = eval_stream.select(
        F.col("doc_id").alias("eval_id"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(1, size(split(text, ' '))"
                f" - {_WIN_TOKENS - 1})),"
                f" i -> concat_ws(' ', slice(split(text, ' '), i, {_WIN_TOKENS})))"
            )
        ).alias("pos0", "w"),
    ).select(
        "eval_id", (F.col("pos0") + 1).alias("pos"), F.expr(_h60("w")).alias("h")
    )
    probed = win.join(
        window_index.withColumn("_m", F.lit(1)), "h", "left"
    )
    max_run = F.expr(
        """aggregate(
             sort_array(mp),
             named_struct('prev', -2, 'run', cast(0 as bigint),
                          'best', cast(0 as bigint)),
             (acc, p) -> named_struct(
               'prev', p,
               'run', if(p = acc.prev + 1, acc.run + 1, cast(1 as bigint)),
               'best', greatest(acc.best,
                 if(p = acc.prev + 1, acc.run + 1, cast(1 as bigint)))),
             acc -> acc.best)"""
    )
    return (
        probed.groupBy("eval_id")
        .agg(
            # collect_set (skips nulls) rather than count/collect_list:
            # idempotent under doc re-delivery across micro-batches
            F.collect_set("pos").alias("ap"),
            F.collect_set(
                F.when(F.col("_m").isNotNull(), F.col("pos"))
            ).alias("mp"),
        )
        .where(F.size("mp") >= 1)
        .select(
            "eval_id",
            F.size("ap").cast("bigint").alias("n_windows"),
            F.size("mp").cast("bigint").alias("matched_windows"),
            max_run.alias("max_run"),
        )
    )

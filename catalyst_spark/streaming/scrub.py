"""Ingest-time PII scrubbing: the streaming twin of
queries.pipeline.pii_extract_stats.

Scrubbing is the canonical STATELESS streaming stage: every arriving
document is classified and masked on its own, with no reference to any
other row — so the whole operator is pure column expressions in append
mode (no state store, no watermark, no shuffle). Replaying the corpus
through the stream reproduces the batch audit's per-source counters
exactly (tested, including re-delivery: emission is a pure function of
the row, so duplicates collapse under the consumer's per-doc latest).

At 100 TB this runs at wire speed inside whole-stage codegen; the
emitted `red_text` is what the sink persists, `red_delta` is the audit
trail. The derived-PII augmentation (_PII_AUG) exists only because the
synthetic corpus carries no natural PII — a production deployment
deletes that one select and scans the raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from catalyst_spark.queries.pipeline import _PII_AUG, _PII_PATTERNS


def stream_pii_scrub(doc_stream: DataFrame) -> DataFrame:
    """(doc_id, source, text) stream -> per-doc scrub row: match counts
    per PII type, redacted text, and the redacted-character delta. Same
    expressions as the batch operator's per-doc stage, so aggregating
    the stream's rows per source reproduces pii_extract_stats."""
    aug = doc_stream.select(
        "doc_id", "source", F.expr(_PII_AUG).alias("t")
    )
    counts = [
        F.regexp_count(F.col("t"), F.lit(pat)).alias(f"c_{name}")
        for name, pat, _ in _PII_PATTERNS
    ]
    red = F.col("t")
    for _, pat, mask in _PII_PATTERNS:
        red = F.regexp_replace(red, pat, mask)
    return aug.select(
        "doc_id", "source", *counts,
        red.alias("red_text"),
        (F.length("t") - F.length(red)).alias("red_delta"),
    )


def stream_quality_gate(doc_stream: DataFrame) -> DataFrame:
    """Ingest-time quality gate: the streaming twin of
    queries.pipeline.gopher_quality_rules — the OTHER canonical
    stateless curation stage (scrub cleans what passes; this decides
    what enters at all). Every arriving (doc_id, source, text) row is
    scored on the five Gopher-style rules independently — token-count
    bounds, mean-token-length bounds, type-token ratio, top-token
    share, stopword hits — emitting one flag column per rule plus the
    combined pass verdict. Every decision is the batch operator's
    cleared-denominator integer comparison, so aggregating the emitted
    rows per source reproduces gopher_quality_rules exactly (tested,
    incl. re-delivery; emission is a pure function of the row).

    Like the batch twin, the per-doc distinct/top-count numbers are
    doc-local array folds — no state store, no watermark, no shuffle:
    the whole gate runs inside whole-stage codegen at wire speed, which
    is exactly what an ingest path needs from its first filter.
    """
    from catalyst_spark.queries.pipeline import (
        _GOPHER_MIN_STOP_HITS,
        _QUALITY_BOUNDS,
        _TOP_TOKEN_COUNT,
        N_TOKENS,
        TOKENS,
        _hits,
    )

    b = _QUALITY_BOUNDS
    n_tok = F.expr(N_TOKENS)
    nchars = F.length(F.regexp_replace("text", " ", ""))
    n_dist = F.expr(f"size(array_distinct({TOKENS}))")
    top_cnt = F.expr(_TOP_TOKEN_COUNT.format(toks=TOKENS))
    stop_hits = F.expr(_hits("en"))
    rules = [
        ("bounds", (n_tok < b["min_tok"]) | (n_tok > b["max_tok"])),
        ("len", (nchars < int(b["min_tok_len"]) * n_tok)
                | (nchars > int(b["max_tok_len"]) * n_tok)),
        ("ttr", n_dist * 5 < n_tok * 2),
        ("top", top_cnt * 8 >= n_tok),
        ("stop", stop_hits < _GOPHER_MIN_STOP_HITS),
    ]
    flags = [f.cast("int").alias(f"f_{name}") for name, f in rules]
    return doc_stream.select("doc_id", "source", *flags).withColumn(
        "passes",
        sum(F.col(f"f_{name}") for name, _ in rules) == 0,
    )

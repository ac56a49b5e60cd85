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

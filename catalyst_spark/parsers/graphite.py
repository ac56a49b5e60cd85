"""Graphite line parser (P5/P6/P7) — pure column expressions, no UDF.

Line format (ref catalyser/graphite.go:314-407):

    metric[;tag=val;tag2=val2] value [timestamp]

Semantics reproduced exactly:
- space-split; < 2 tokens -> "Bad metric format" (:318-320); token 3, when
  present, must ParseInt or -> "Bad metric part: timestamp" (:324-329);
  tokens beyond the third are ignored (the reference indexes split[2]).
- value sniff cascade (:335-366): contains '.' AND float-parses -> double;
  else int-parses -> long; else lower() in {true,false} -> boolean; else
  the raw string. ("15e3" -> no dot, int-parse fails -> STRING — quirk
  preserved; "1.2.3" -> falls through every parse -> string, not error.)
- timestamp magnitude heuristic via int64toTime (ref opentsdb.go:127-144):
  0 -> ingest-now; < 0xFFFFFFFF -> seconds; else milliseconds. Missing
  timestamp -> now in ms (:322) which the heuristic then maps back.
- hierarchy labeling when parse=true (the config default, cmd/root.go:56):
  name 'a.b.c' -> labels {"0":"a","1":"b","2":"c"} (:382-386,398-403).
- ';'-separated tags override hierarchy labels on key collision (Go map
  assignment order, :388-392); tag values keep Go's Split semantics —
  'a=b=c' -> value 'b' (tagSplit[1]).
- Deviation (documented, SURVEY Appendix A.5): a tag without '=' panics
  in the reference; we reject the line with a parse error instead.
"""

from __future__ import annotations

import time

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from catalyst_spark.schema import gts_columns

_MAX_SECONDS = 0xFFFFFFFF  # magnitude heuristic boundary (opentsdb.go:138)


def _heuristic_us(ts: Column, now_us: int) -> Column:
    """int64toTime(ts).UnixNano()/1000 — sec/ms disambiguation by magnitude."""
    return (
        F.when(ts == 0, F.lit(now_us))
        .when(ts < _MAX_SECONDS, ts * 1_000_000)
        .otherwise(ts * 1_000)
    )


def strip_token_prefix(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Graphite TCP auth framing, per-LINE variant: every line carries a
    ``TOKEN@.`` prefix; lines without one are dropped. Same contract as
    the reference for well-formed clients (which repeat the same token on
    every line); for exact per-CONNECTION parity — token length learned
    once from the first line, then length-stripped blindly — use
    frame_connection_lines (batch) / stream_frame_connections (stream).
    """
    token = F.regexp_extract(F.col(line_col), r"^(.+?)@\.(.*)$", 1)
    rest = F.regexp_extract(F.col(line_col), r"^(.+?)@\.(.*)$", 2)
    return (
        df.withColumn("token", F.nullif(token, F.lit("")))
        .withColumn(line_col, F.when(F.col("token").isNotNull(), rest))
        .where(F.col("token").isNotNull())
    )


def frame_connection_lines(
    df: DataFrame,
    conn_col: str = "conn_id",
    seq_col: str = "line_seq",
    line_col: str = "line",
) -> DataFrame:
    """Graphite TCP auth framing with exact per-CONNECTION parity
    (P7, ref catalyser/graphite.go:240-273). The reference's state
    machine, reproduced over (connection, sequence)-keyed lines:

    - each raw line is whitespace-trimmed (Go strings.TrimSpace);
    - the FIRST line of a connection must contain ``@.`` with a
      non-empty token before it, else the whole connection is aborted
      (the Go code ``return``s — later lines are never read);
    - ``tokenLength = len(token) + 2`` is learned once, and every line
      (including the first) is then stripped by LENGTH, not by pattern:
      lines with ``len <= tokenLength`` are silently skipped (quirk
      A.6), and a line whose leading bytes are not ``TOKEN@.`` still
      loses exactly tokenLength bytes.

    Batch/replay form: one window per connection (the per-connection
    state is a single row — first_value — so this stays a streaming-
    friendly running accumulation, no join). The live-stream twin with
    cross-batch state is streaming.stateful.stream_frame_connections.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(conn_col)
        .orderBy(seq_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    trimmed = F.regexp_replace(F.col(line_col), r"^\s+|\s+$", "")
    first_line = F.first("_trim").over(w)
    tok = F.split_part(F.col("_first"), F.lit("@."), F.lit(1))
    valid = F.col("_first").contains("@.") & (tok != "")
    tok_len = F.length(tok) + 2
    return (
        df.withColumn("_trim", trimmed)
        .withColumn("_first", first_line)
        .where(valid & (F.length("_trim") > tok_len))
        .withColumn("token", tok)
        .withColumn(line_col, F.substring(F.col("_trim"), tok_len + 1, 1 << 30))
        .drop("_trim", "_first")
    )


def parse_graphite(
    df: DataFrame,
    line_col: str = "line",
    parse_hierarchy: bool = True,
    now_us: int | None = None,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Parse Graphite plaintext lines into the canonical GTS schema.

    keep_cols: pass-through columns (e.g. the TCP framing 'token') kept
    alongside the GTS columns so the sink can group by them.

    Scale: everything is whole-stage-codegen'd string/array expressions;
    a 100 TB replay of Graphite traffic is a map-only scan with zero
    shuffles and zero Python.
    """
    if now_us is None:
        now_us = int(time.time() * 1_000_000)

    line = F.col(line_col)
    parts = F.split(line, " ")
    n = F.size(parts)

    metric_full = F.get(parts, 0)
    value_str = F.get(parts, 1)
    ts_str = F.get(parts, 2)

    ts_parsed = ts_str.try_cast("long")
    bad_ts = (n >= 3) & ts_parsed.isNull()
    ts_input = F.when(n >= 3, ts_parsed).otherwise(
        F.lit(now_us // 1000)  # missing ts -> now in ms (graphite.go:322)
    )
    ts_us = _heuristic_us(ts_input, now_us)

    # value sniff cascade (graphite.go:332-367)
    as_double = value_str.try_cast("double")
    as_long = value_str.try_cast("long")
    is_bool = F.lower(value_str).isin("true", "false")
    has_dot = value_str.contains(".")

    is_double = has_dot & as_double.isNotNull()
    is_long = ~is_double & as_long.isNotNull()
    is_true = ~is_double & ~is_long & (F.lower(value_str) == "true")
    is_bool_v = ~is_double & ~is_long & is_bool
    value_type = (
        F.when(is_double, "double")
        .when(is_long, "long")
        .when(is_bool_v, "boolean")
        .otherwise("string")
    )

    # name / tags / hierarchy labels (SQL expr strings: the Python-lambda
    # struct form loses field aliases inside transform() on this Spark)
    _mf = f"get(split({line_col}, ' '), 0)"
    _name = f"get(split({_mf}, ';'), 0)"
    _tag_strs = f"slice(split({_mf}, ';'), 2, greatest(size(split({_mf}, ';')) - 1, 0))"
    name = F.expr(_name)
    bad_tag = F.expr(f"exists({_tag_strs}, t -> NOT contains(t, '='))")
    tags = (
        f"map_from_entries(transform({_tag_strs}, "
        "t -> struct(split_part(t, '=', 1) as key, split_part(t, '=', 2) as value)))"
    )
    hier = (
        f"map_from_arrays(transform(sequence(0, size(split({_name}, '\\\\.')) - 1), "
        f"i -> cast(i as string)), split({_name}, '\\\\.'))"
    )
    if parse_hierarchy:
        labels = F.expr(
            f"CASE WHEN size({_tag_strs}) > 0 THEN map_concat({hier}, {tags}) "
            f"ELSE {hier} END"
        )
    else:
        labels = F.expr(
            f"CASE WHEN size({_tag_strs}) > 0 THEN {tags} "
            "ELSE cast(map() as map<string,string>) END"
        )

    error = (
        F.when(n < 2, "Bad metric format")
        .when(bad_ts, "Bad metric part: timestamp")
        .when(bad_tag, "Bad metric part: tag without '='")
        .otherwise(F.lit(None))
    )

    return df.select(
        *[F.col(c) for c in keep_cols],
        *gts_columns(
            ts=ts_us,
            name=name,
            labels=labels,
            value_d=F.when(is_double, as_double),
            value_l=F.when(is_long, as_long),
            value_b=F.when(is_bool_v, is_true),
            value_s=F.when(value_type == "string", value_str),
            value_type=value_type,
            parse_error=error,
        )
    )

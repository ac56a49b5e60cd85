"""DuckDB oracle SQL for the driver's correctness gate.

One entry per key in ``queries()`` — every operator, including the
hash-based minhash/simhash/LSH family, is value-checked: all hashing
goes through the portable md5-prefix _h60 (pipeline._h60), which DuckDB
reproduces with CAST(concat('0x', substring(md5(x),1,15)) AS BIGINT).
Column aliases match the Spark builders byte-for-byte — the driver
sorts columns by name before value-hashing.
"""

from __future__ import annotations

from catalyst_spark.queries.pipeline import (
    STOPWORDS,
    _BLOOM_BITS_LOG2,
    _BLOOM_K,
    _CHUNK_TOKENS,
    _CONTAM_EVAL_SOURCE,
    _CONTAM_MIN_SHARED,
    _PACK_CAPACITY,
    _PACK_SHARD,
    _QUALITY_BOUNDS,
    _LSH_BITS,
    _LSH_DIM,
    _LSH_TABLES,
    _MINHASH_BANDS,
    _MINHASH_P,
    _MINHASH_PERMS,
    _MINHASH_ROWS,
    _SAMPLE_DEFAULT_PCT,
    _SAMPLE_PCT,
    _SIMHASH_BITS,
    _WIN_TOKENS,
    _minhash_coeffs,
)
from catalyst_spark.queries.tsdb import (
    _CUSUM_ALARM_CENTS,
    _CUSUM_DRIFT_CENTS,
    _HQ_BOUNDS,
    _HQ_QS,
    _KMV_K,
    _KMV_SPACE,
)


def _h60_duck(expr: str) -> str:
    """DuckDB twin of pipeline._h60 (md5-prefix 60-bit bigint)."""
    return f"CAST(concat('0x', substring(md5({expr}), 1, 15)) AS BIGINT)"


# Brute-force ALL 3-shingle-set pairs with Jaccard >= 0.5: ground truth
# for dedup_prefix_filter, and — because that join is provably complete
# at theta >= 0.5 — the shared edge set of the dedup_clusters /
# dedup_keep_one / near_dup_source_matrix oracles. (CTE fragment; the
# consumers prepend WITH [RECURSIVE].)
_SHINGLE_PAIRS_CTE = """
        sh AS (
          SELECT doc_id,
                 CASE WHEN len(toks) >= 3 THEN
                   list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                  FOR i IN range(1, len(toks) - 1)])
                 ELSE [text] END AS shingles
          FROM (SELECT doc_id, text, string_split(text, ' ') AS toks
                FROM documents)),
        p AS (
          SELECT doc_id, list({h60}) AS tokset
          FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
          GROUP BY doc_id),
        pairs AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                 len(list_intersect(a.tokset, b.tokset)) * 1.0
                   / len(list_distinct(list_concat(a.tokset, b.tokset)))
                   AS jaccard
          FROM p a JOIN p b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.tokset, b.tokset)) * 1.0
                / len(list_distinct(list_concat(a.tokset, b.tokset)))
                >= 0.5)""".format(h60=_h60_duck("s"))

# ---------------------------------------------------------------------------
# relational surface (SURVEY §2.6, verbatim)
# ---------------------------------------------------------------------------

_RELATIONAL = {
    "q1_filter_project_sort": """
        SELECT event_id, event_type, value FROM events
        WHERE value > 100 AND event_type = 'click' ORDER BY event_id
    """,
    "q2_time_bucket": """
        SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS n,
               ROUND(SUM(value), 2) AS sv
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q3_hash_aggregate": """
        SELECT event_type, COUNT(*) AS n, ROUND(AVG(value), 2) AS av,
               ROUND(MIN(value), 2) AS mn, ROUND(MAX(value), 2) AS mx
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "q4_distinct_aggregate": """
        SELECT event_type, COUNT(DISTINCT user_id) AS u
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "q5_latest_per_series": """
        SELECT user_id, event_type, ts, value FROM (
          SELECT user_id, event_type, ts, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) t
        WHERE rn = 1 ORDER BY user_id, event_type
    """,
    "q6_tpch_q1": """
        SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sq,
               ROUND(SUM(l_extendedprice), 2) AS sep,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sdp,
               COUNT(*) AS n
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
    """,
    "q7_broadcast_join": """
        SELECT n_name, COUNT(*) AS c, ROUND(SUM(c_acctbal), 2) AS bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
    """,
    "q8_multi_join": """
        SELECT r_name, COUNT(*) AS orders_cnt
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE o_orderstatus = 'F'
        GROUP BY r_name ORDER BY r_name
    """,
    "q9_semi_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        ORDER BY c_custkey
    """,
    "q10_anti_join": """
        SELECT c_custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        ORDER BY c_custkey
    """,
    "q11_top_k": """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS p FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "q12_set_op": """
        SELECT c_nationkey AS k FROM customer
        INTERSECT
        SELECT s_nationkey AS k FROM supplier
        ORDER BY k
    """,
    "q13_string_functions": """
        SELECT p_partkey, UPPER(p_brand) AS b, SUBSTRING(p_type, 1, 6) AS t6,
               LENGTH(p_name) AS ln
        FROM part WHERE p_name LIKE '%blue%' ORDER BY p_partkey
    """,
    "q14_case_cascade": """
        SELECT event_id,
               CASE WHEN value >= 4294967295 THEN 'ms'
                    WHEN value > 0 THEN 's'
                    ELSE 'zero' END AS unit
        FROM events ORDER BY event_id
    """,
    "q15_union_dedup": """
        SELECT DISTINCT user_id FROM (
          SELECT user_id FROM events WHERE event_type = 'click'
          UNION ALL
          SELECT user_id FROM events WHERE event_type = 'view') t
        ORDER BY user_id
    """,
    "q16_text_group": """
        SELECT lang, COUNT(*) AS docs, ROUND(AVG(n_chars), 2) AS avg_chars
        FROM documents GROUP BY lang ORDER BY lang
    """,
    "q17_exact_dedup_counts": """
        SELECT COUNT(*) AS total, COUNT(DISTINCT text) AS uniq FROM documents
    """,
    "q18_running_total": """
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                       OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey
                             ROWS UNBOUNDED PRECEDING) / 100.0, 2)
                 AS running_total
        FROM orders ORDER BY o_custkey, o_orderkey
    """,
    "q19_above_brand_avg": """
        WITH b AS (
          SELECT p_brand,
                 SUM(CAST(round(p_retailprice * 100) AS BIGINT)) AS sum_cents,
                 COUNT(*) AS n_parts
          FROM part GROUP BY 1)
        SELECT p_partkey, p.p_brand,
               ROUND(p_retailprice, 2) AS p_retailprice,
               CAST(CAST(round(p_retailprice * 100) AS BIGINT) * n_parts
                 - sum_cents AS BIGINT) AS margin_x_n_cents
        FROM part p JOIN b USING (p_brand)
        WHERE CAST(round(p_retailprice * 100) AS BIGINT) * n_parts > sum_cents
        ORDER BY p_partkey
    """,
    "q20_customer_deciles": """
        WITH pc AS (
          SELECT o_custkey,
                 SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS spend_cents
          FROM orders GROUP BY 1),
        r AS (
          SELECT o_custkey, spend_cents,
                 ntile(10) OVER (ORDER BY spend_cents DESC, o_custkey) AS decile
          FROM pc)
        SELECT decile, COUNT(*) AS n_customers,
               ROUND(SUM(spend_cents) / 100.0, 2) AS decile_spend
        FROM r GROUP BY 1 ORDER BY 1
    """,
    # the salt is plan-level only — semantically this IS the plain join
    "q21_salted_skew_join": """
        SELECT c_mktsegment, event_type, COUNT(*) AS n_events,
               ROUND(SUM(CAST(round(value * 100) AS BIGINT)) / 100.0, 2)
                 AS total_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c_mktsegment, event_type
        ORDER BY c_mktsegment, event_type
    """,
}

# ---------------------------------------------------------------------------
# pipeline operators (DuckDB dialect mirrors of queries/pipeline.py)
# ---------------------------------------------------------------------------

def _hits_duck(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        "len(list_filter(string_split(text, ' '), "
        f"t -> list_contains([{lst}], t)))"
    )


_EMB_NORMED = """
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings)
"""

_PIPELINE = {
    "dedup_exact": """
        SELECT md5(text) AS h, COUNT(*) AS dup_cnt, MIN(doc_id) AS keep_id
        FROM documents GROUP BY 1 ORDER BY h
    """,
    "dedup_token_set": """
        SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
               COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
        FROM documents GROUP BY 1 ORDER BY fp
    """,
    "dedup_embedding_cosine": _EMB_NORMED + """
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 2) AS cos
        FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.4
        ORDER BY a_id, b_id
    """,
    "ann_brute_topk": _EMB_NORMED + """
        , s AS (
          SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
                 list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos_raw
          FROM v q JOIN v c ON q.vec_id != c.vec_id
          WHERE q.vec_id % 50 = 0)
        SELECT q_id, "rank", neighbor_id, ROUND(cos_raw, 2) AS cos FROM (
          SELECT q_id, neighbor_id, cos_raw,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY cos_raw DESC, neighbor_id) AS "rank"
          FROM s) t
        WHERE "rank" <= 5 ORDER BY q_id, "rank"
    """,
    "ann_ivf_topk": _EMB_NORMED + """
        , s AS (
          SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
                 list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos_raw
          FROM v q JOIN v c ON q.label = c.label AND q.vec_id != c.vec_id
          WHERE q.vec_id % 50 = 0)
        SELECT q_id, "rank", neighbor_id, ROUND(cos_raw, 2) AS cos FROM (
          SELECT q_id, neighbor_id, cos_raw,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY cos_raw DESC, neighbor_id) AS "rank"
          FROM s) t
        WHERE "rank" <= 5 ORDER BY q_id, "rank"
    """,
    # recall@5 of the IVF cell-probe path vs the brute-force baseline;
    # identical tie-break (cos DESC, neighbor_id) on both sides makes
    # the intersection engine-reproducible
    "ann_recall_at_5": _EMB_NORMED + """
        , sb AS (
          SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
                 list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos_raw
          FROM v q JOIN v c ON q.vec_id != c.vec_id
          WHERE q.vec_id % 50 = 0),
        brute AS (
          SELECT q_id, neighbor_id FROM (
            SELECT q_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY cos_raw DESC, neighbor_id) AS r
            FROM sb) t WHERE r <= 5),
        si AS (
          SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
                 list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos_raw
          FROM v q JOIN v c ON q.label = c.label AND q.vec_id != c.vec_id
          WHERE q.vec_id % 50 = 0),
        ivf AS (
          SELECT q_id, neighbor_id FROM (
            SELECT q_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY cos_raw DESC, neighbor_id) AS r
            FROM si) t WHERE r <= 5)
        SELECT b.q_id, COUNT(i.neighbor_id) AS hits,
               ROUND(COUNT(i.neighbor_id) / 5.0, 2) AS recall_at_5
        FROM brute b LEFT JOIN ivf i
          ON b.q_id = i.q_id AND b.neighbor_id = i.neighbor_id
        GROUP BY b.q_id ORDER BY b.q_id
    """,
    "text_stats": f"""
        SELECT lang, source, COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
               ROUND(AVG(n_tok), 2) AS avg_tokens,
               ROUND(AVG(tok_len), 2) AS avg_tok_len,
               ROUND(AVG(stop_ratio), 2) AS avg_stop_ratio
        FROM (
          SELECT lang, source,
                 len(string_split(text, ' ')) AS n_tok,
                 length(replace(text, ' ', '')) / len(string_split(text, ' ')) AS tok_len,
                 {_hits_duck('en')} / len(string_split(text, ' ')) AS stop_ratio
          FROM documents) d
        GROUP BY lang, source ORDER BY lang, source
    """,
    "lang_id_confusion": f"""
        SELECT lang, pred_lang, COUNT(*) AS n FROM (
          SELECT lang,
                 CASE
                   WHEN {_hits_duck('en')} >= {_hits_duck('fr')}
                        AND {_hits_duck('en')} >= {_hits_duck('de')}
                        AND {_hits_duck('en')} >= {_hits_duck('es')}
                        AND {_hits_duck('en')} > 0 THEN 'en'
                   WHEN {_hits_duck('fr')} >= {_hits_duck('de')}
                        AND {_hits_duck('fr')} >= {_hits_duck('es')}
                        AND {_hits_duck('fr')} > 0 THEN 'fr'
                   WHEN {_hits_duck('de')} >= {_hits_duck('es')}
                        AND {_hits_duck('de')} > 0 THEN 'de'
                   WHEN {_hits_duck('es')} > 0 THEN 'es'
                   ELSE 'unk' END AS pred_lang
          FROM documents) d
        GROUP BY lang, pred_lang ORDER BY lang, pred_lang
    """,
    "token_counts": """
        SELECT source,
               CAST(SUM(ws_tok) AS BIGINT) AS total_ws_tokens,
               CAST(SUM(bpe_est) AS BIGINT) AS total_bpe_est,
               ROUND(AVG(ws_tok), 2) AS avg_ws_tokens
        FROM (
          SELECT source, len(string_split(text, ' ')) AS ws_tok,
                 CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_est
          FROM documents) d
        GROUP BY source ORDER BY source
    """,
    "doc_fingerprint": """
        SELECT doc_id, substring(md5(lower(text)), 1, 16) AS fp
        FROM documents ORDER BY doc_id
    """,
    # non-overlapping 8-token chunks; a chunk is duplicated when its
    # hash appears in >= 2 distinct docs (CCNet-style sub-doc dedup)
    "chunk_dedup": f"""
        WITH d AS (
          SELECT doc_id, source, string_split(text, ' ') AS toks
          FROM documents),
        c AS (
          SELECT doc_id, source,
                 [array_to_string(toks[(ch * {_CHUNK_TOKENS} + 1)
                                       :(ch * {_CHUNK_TOKENS} + {_CHUNK_TOKENS})], ' ')
                  FOR ch IN range(0, CAST(ceil(len(toks) / {_CHUNK_TOKENS}.0)
                                          AS BIGINT))] AS chunks
          FROM d),
        x AS (
          SELECT doc_id, source, {_h60_duck('ch')} AS h
          FROM (SELECT doc_id, source, unnest(chunks) AS ch FROM c)),
        dup AS (
          SELECT h FROM x GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2)
        SELECT x.source, COUNT(*) AS n_chunks,
               CAST(SUM(CASE WHEN dup.h IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup_chunks,
               ROUND(SUM(CASE WHEN dup.h IS NOT NULL THEN 1 ELSE 0 END)
                     * 1.0 / COUNT(*), 4) AS dup_share
        FROM x LEFT JOIN dup ON x.h = dup.h
        GROUP BY x.source ORDER BY x.source
    """,
    # overlapping stride-1 8-token windows with positions; an eval doc
    # is flagged when any window appears verbatim in the train split;
    # max_run = longest consecutive matched-position island
    "window_decontaminate": f"""
        WITH d AS (
          SELECT doc_id, source, string_split(text, ' ') AS toks
          FROM documents),
        w AS (
          SELECT doc_id, source, u.pos AS pos, {_h60_duck('u.w')} AS h
          FROM (
            SELECT doc_id, source,
                   unnest([{{'pos': i,
                            'w': array_to_string(
                                   toks[i:(i + {_WIN_TOKENS} - 1)], ' ')}}
                           FOR i IN range(1, greatest(2, len(toks)
                                                         - {_WIN_TOKENS - 2}))])
                     AS u
            FROM d)),
        ew AS (SELECT doc_id AS eval_id, pos, h FROM w WHERE source = 'src0'),
        tw AS (SELECT doc_id AS train_id, h FROM w WHERE source != 'src0'),
        th AS (SELECT DISTINCT h FROM tw),
        stats AS (
          SELECT e.eval_id, COUNT(*) AS n_windows,
                 CAST(SUM(CASE WHEN th.h IS NOT NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS matched_windows
          FROM ew e LEFT JOIN th ON e.h = th.h
          GROUP BY 1),
        td AS (
          SELECT e.eval_id, COUNT(DISTINCT t.train_id) AS n_train_docs
          FROM ew e JOIN tw t ON e.h = t.h GROUP BY 1),
        isl AS (
          SELECT e.eval_id, e.pos,
                 e.pos - row_number() OVER (PARTITION BY e.eval_id
                                            ORDER BY e.pos) AS g
          FROM ew e JOIN th ON e.h = th.h),
        runs AS (
          SELECT eval_id, MAX(run) AS max_run FROM (
            SELECT eval_id, g, COUNT(*) AS run FROM isl GROUP BY 1, 2)
          GROUP BY 1)
        SELECT s.eval_id, s.n_windows, s.matched_windows,
               td.n_train_docs, runs.max_run
        FROM stats s
        JOIN td USING (eval_id) JOIN runs USING (eval_id)
        WHERE s.matched_windows >= 1
        ORDER BY s.eval_id
    """,
    # train-side substring self-dedup: per doc, windows occurring in
    # >= 2 distinct docs, with longest consecutive dup-position run
    "window_selfdup_spans": f"""
        WITH d AS (
          SELECT doc_id, source, string_split(text, ' ') AS toks
          FROM documents),
        w AS (
          SELECT doc_id, source, u.pos AS pos, {_h60_duck('u.w')} AS h
          FROM (
            SELECT doc_id, source,
                   unnest([{{'pos': i,
                            'w': array_to_string(
                                   toks[i:(i + {_WIN_TOKENS} - 1)], ' ')}}
                           FOR i IN range(1, greatest(2, len(toks)
                                                         - {_WIN_TOKENS - 2}))])
                     AS u
            FROM d)),
        dup AS (
          SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
        probed AS (
          SELECT w.doc_id, w.source, w.pos,
                 CASE WHEN dup.h IS NOT NULL THEN 1 ELSE 0 END AS m
          FROM w LEFT JOIN dup ON w.h = dup.h),
        stats AS (
          SELECT doc_id, source, COUNT(*) AS n_windows,
                 CAST(SUM(m) AS BIGINT) AS dup_windows
          FROM probed GROUP BY 1, 2),
        isl AS (
          SELECT doc_id, pos,
                 pos - row_number() OVER (PARTITION BY doc_id
                                          ORDER BY pos) AS g
          FROM probed WHERE m = 1),
        runs AS (
          SELECT doc_id, MAX(run) AS max_dup_run FROM (
            SELECT doc_id, g, COUNT(*) AS run FROM isl GROUP BY 1, 2)
          GROUP BY 1)
        SELECT s.doc_id, s.source, s.n_windows, s.dup_windows,
               ROUND(s.dup_windows * 1.0 / s.n_windows, 4) AS dup_share,
               CAST(COALESCE(r.max_dup_run, 0) AS BIGINT) AS max_dup_run
        FROM stats s LEFT JOIN runs r USING (doc_id)
        ORDER BY s.doc_id
    """,
    # unordered source pairs by count of distinct shared 8-token windows
    "window_overlap_source_matrix": f"""
        WITH d AS (
          SELECT doc_id, source, string_split(text, ' ') AS toks
          FROM documents),
        w AS (
          SELECT DISTINCT source, {_h60_duck('u')} AS h
          FROM (
            SELECT source,
                   unnest([array_to_string(
                             toks[i:(i + {_WIN_TOKENS} - 1)], ' ')
                           FOR i IN range(1, greatest(2, len(toks)
                                                         - {_WIN_TOKENS - 2}))])
                     AS u
            FROM d))
        SELECT l.source AS source_a, r.source AS source_b,
               COUNT(*) AS shared_windows
        FROM w l JOIN w r ON l.h = r.h AND l.source < r.source
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    # top-25 most-duplicated spans; ties break on the hash so the cut
    # line is engine-reproducible
    "boilerplate_spans": f"""
        WITH d AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        w AS (
          SELECT doc_id, {_h60_duck('u')} AS h
          FROM (
            SELECT doc_id,
                   unnest([array_to_string(
                             toks[i:(i + {_WIN_TOKENS} - 1)], ' ')
                           FOR i IN range(1, greatest(2, len(toks)
                                                         - {_WIN_TOKENS - 2}))])
                     AS u
            FROM d))
        SELECT h, COUNT(DISTINCT doc_id) AS n_docs,
               COUNT(*) AS n_occurrences,
               MIN(doc_id) AS example_doc
        FROM w GROUP BY h
        HAVING COUNT(DISTINCT doc_id) >= 2
        ORDER BY n_docs DESC, n_occurrences DESC, h
        LIMIT 25
    """,
    # portable bloom filter (2^_BLOOM_BITS_LOG2 = 2^18 bits as 8192
    # 32-bit words, _BLOOM_K = 3 probes from disjoint 18-bit md5-hash
    # slices) vs exact membership
    "bloom_decontaminate": f"""
        WITH sh AS (
          SELECT doc_id,
                 CASE WHEN len(toks) >= 3 THEN
                   list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                  FOR i IN range(1, len(toks) - 1)])
                 ELSE [text] END AS shingles
          FROM (SELECT doc_id, text, string_split(text, ' ') AS toks
                FROM documents)),
        shr AS (
          SELECT DISTINCT doc_id, {_h60_duck('s')} AS h
          FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)),
        tag AS (
          SELECT shr.doc_id, d.source, shr.h
          FROM shr JOIN documents d ON d.doc_id = shr.doc_id),
        train AS (SELECT h FROM tag WHERE source != '{_CONTAM_EVAL_SOURCE}'),
        evals AS (SELECT doc_id AS eval_id, h FROM tag
                  WHERE source = '{_CONTAM_EVAL_SOURCE}'),
        tpos AS (
          SELECT unnest([{", ".join(
              f"(h >> {_BLOOM_BITS_LOG2 * j}) & {(1 << _BLOOM_BITS_LOG2) - 1}"
              for j in range(_BLOOM_K))}]) AS p
          FROM train),
        bloom AS (
          SELECT p >> 5 AS word_idx,
                 bit_or(CAST(1 AS BIGINT) << CAST(p & 31 AS INT)) AS bits
          FROM tpos GROUP BY 1),
        probes AS (
          SELECT eval_id, h,
                 unnest([{", ".join(
              f"(h >> {_BLOOM_BITS_LOG2 * j}) & {(1 << _BLOOM_BITS_LOG2) - 1}"
              for j in range(_BLOOM_K))}]) AS p
          FROM evals),
        bh AS (
          SELECT eval_id, h
          FROM (SELECT pr.eval_id, pr.h,
                       SUM(CASE WHEN b.bits
                                     & (CAST(1 AS BIGINT) << CAST(pr.p & 31 AS INT))
                                  = (CAST(1 AS BIGINT) << CAST(pr.p & 31 AS INT))
                                THEN 1 ELSE 0 END) AS set_bits
                FROM probes pr LEFT JOIN bloom b ON (pr.p >> 5) = b.word_idx
                GROUP BY pr.eval_id, pr.h) t
          WHERE set_bits = {_BLOOM_K}),
        eh AS (
          SELECT e.eval_id, e.h,
                 CASE WHEN t.h IS NOT NULL THEN 1 ELSE 0 END AS ex
          FROM evals e LEFT JOIN (SELECT DISTINCT h FROM train) t
            ON e.h = t.h)
        SELECT eh.eval_id, COUNT(*) AS n_shingles,
               CAST(SUM(CASE WHEN bh.h IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS bloom_hits,
               CAST(SUM(eh.ex) AS BIGINT) AS exact_hits,
               CAST(SUM(CASE WHEN bh.h IS NOT NULL THEN 1 ELSE 0 END)
                    - SUM(eh.ex) AS BIGINT) AS false_pos
        FROM eh LEFT JOIN bh ON eh.eval_id = bh.eval_id AND eh.h = bh.h
        GROUP BY eh.eval_id ORDER BY eh.eval_id
    """,
}

# ---------------------------------------------------------------------------
# hash-family operators: full DuckDB mirrors of the md5-based pipelines
# ---------------------------------------------------------------------------

# SimHash: per-token 60-bit hash, per-bit majority vote, assembled long.
_SIMHASH_VOTES = (
    "SELECT doc_id, COUNT(*) AS n, "
    + ", ".join(f"SUM((th >> {b}) & 1) AS b{b}" for b in range(_SIMHASH_BITS))
    + f" FROM (SELECT doc_id, {_h60_duck('t')} AS th"
    "   FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t"
    "         FROM documents)) tok"
    " GROUP BY doc_id"
)
_SIMHASH_ASSEMBLE = " | ".join(
    f"(CASE WHEN 2 * b{b} > n THEN (CAST(1 AS BIGINT) << {b})"
    f" ELSE CAST(0 AS BIGINT) END)"
    for b in range(_SIMHASH_BITS)
)
_SIMHASH_SQL = (
    f"WITH votes AS ({_SIMHASH_VOTES}) "
    f"SELECT doc_id, {_SIMHASH_ASSEMBLE} AS simhash FROM votes"
)

# MinHash: distinct 3-shingles, 32 permutation minima, 8 band buckets,
# band self-join, exact Jaccard over the shingle-hash sets.
_MINHASH_SIG = (
    "sh AS ("
    "  SELECT doc_id,"
    "         CASE WHEN len(toks) >= 3 THEN"
    "           list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]"
    "                          FOR i IN range(1, len(toks) - 1)])"
    "         ELSE [text] END AS shingles"
    "  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks"
    "        FROM documents)),"
    " shr AS ("
    f"  SELECT doc_id, {_h60_duck('s')} AS h"
    "   FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)),"
    " sig AS ("
    "  SELECT doc_id, list(h) AS hset, "
    + ", ".join(
        f"MIN(({a} * (h % {_MINHASH_P}) + {b}) % {_MINHASH_P}) AS m{s}"
        for s, (a, b) in enumerate(zip(*_minhash_coeffs()))
    )
    + "  FROM shr GROUP BY doc_id)"
)
_MINHASH_BUCKETS = ", ".join(
    _h60_duck(
        "concat_ws(',', "
        + ", ".join(
            [str(b)]
            + [f"m{_MINHASH_ROWS * b + r}" for r in range(_MINHASH_ROWS)]
        )
        + ")"
    )
    for b in range(_MINHASH_BANDS)
)

# SRP-LSH over embeddings: md5-parity Rademacher planes, sequential-fold
# dots, 2^k bucket assembly, candidate self-join, exact-cosine verify.
_SRP_SIGN = _h60_duck(
    "concat(CAST(t AS VARCHAR), ':', CAST(k AS VARCHAR), ':', CAST(d AS VARCHAR))"
)
_SRP_PLANES = (
    "planes AS ("
    f" SELECT t, k, [CAST(1 - 2 * ({_SRP_SIGN} % 2) AS DOUBLE)"
    f"               FOR d IN range(0, {_LSH_DIM})] AS signs"
    f" FROM (SELECT unnest(range(0, {_LSH_TABLES})) AS t),"
    f"      (SELECT unnest(range(0, {_LSH_BITS})) AS k))"
)

def _kmeans_sql(k: int | None = None, prefix: str = "",
                header: bool = True) -> str:
    """Unrolled Lloyd iterations mirroring pipeline.ivf_train: same
    deterministic init (k lowest vec_ids), same |x|^2-2x.c+|c|^2
    distance decomposition, ties by centroid id, empty clusters drop.
    `k` defaults to the engine-wide _KMEANS_K; `prefix` renames every
    generated CTE so two unrollings (e.g. the k=8 and k=16 quantizers
    of ivf_rek_cell_stats) coexist in one WITH clause; `header=False`
    omits the shared v/dims CTEs for the second unrolling."""
    from catalyst_spark.queries.pipeline import (
        _KMEANS_ITERS,
        _KMEANS_K,
        _LSH_DIM,
    )

    k = k or _KMEANS_K
    p = prefix
    parts = []
    if header:
        parts += [
            "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e"
            " FROM embeddings),",
            f"dims AS (SELECT unnest(range(1, {_LSH_DIM + 1})) AS d),",
        ]
    parts.append(
        f"{p}c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c_id,"
        " e AS ce FROM (SELECT vec_id, e FROM v ORDER BY vec_id"
        f" LIMIT {k})),"
    )
    for i in range(1, _KMEANS_ITERS + 1):
        prev = f"{p}c{i - 1}"
        parts.append(
            f"{p}a{i} AS (SELECT vec_id, e, c_id FROM ("
            " SELECT v.vec_id, v.e, c.c_id,"
            " row_number() OVER (PARTITION BY v.vec_id ORDER BY"
            " list_dot_product(v.e, v.e) - 2 * list_dot_product(v.e, c.ce)"
            " + list_dot_product(c.ce, c.ce), c.c_id) AS rn"
            f" FROM v, {prev} c) t WHERE rn = 1),"
        )
        parts.append(
            f"{p}m{i} AS (SELECT c_id, d, AVG(e[d]) AS m"
            f" FROM {p}a{i}, dims GROUP BY 1, 2),"
        )
        parts.append(
            f"{p}c{i} AS (SELECT c_id, list(m ORDER BY d) AS ce"
            f" FROM {p}m{i} GROUP BY 1),"
        )
    return "\n".join(parts)


def _kmeans_final_select() -> str:
    # r11 rounding audit: checked means are EXACT integer fixed-point
    # sums over the final nearest-trained-centroid assignment (the
    # assignment both engines share; the float model stays internal)
    from catalyst_spark.queries.pipeline import _EMB_FX, _KMEANS_ITERS

    last_c = f"c{_KMEANS_ITERS}"
    return _kmeans_sql() + f"""
        dist AS (
          SELECT v.vec_id, c.c_id,
                 row_number() OVER (PARTITION BY v.vec_id ORDER BY
                   list_dot_product(v.e, v.e)
                   - 2 * list_dot_product(v.e, c.ce)
                   + list_dot_product(c.ce, c.ce), c.c_id) AS rn
          FROM v, {last_c} c),
        assign AS (SELECT vec_id, c_id FROM dist WHERE rn = 1),
        qd AS (
          SELECT a.c_id, d,
                 CAST(floor(v.e[d] * {_EMB_FX}) AS BIGINT) AS q
          FROM v JOIN assign a USING (vec_id), dims)
        SELECT c_id, d,
               ROUND(CAST(SUM(CAST(q AS HUGEINT)) AS DOUBLE)
                     / CAST(COUNT(*) * {_EMB_FX} AS DOUBLE), 4) + 0.0
                 AS centroid
        FROM qd GROUP BY c_id, d ORDER BY c_id, d
    """


def _ivf_trained_sql() -> str:
    """Unrolled k-means + nearest-centroid assignment + in-cell exact
    cosine rerank — the oracle twin of pipeline.ann_ivf_trained_topk."""
    from catalyst_spark.queries.pipeline import _KMEANS_ITERS

    last_c = f"c{_KMEANS_ITERS}"
    return _kmeans_sql() + f"""
        dist AS (
          SELECT v.vec_id, c.c_id,
                 row_number() OVER (PARTITION BY v.vec_id ORDER BY
                   list_dot_product(v.e, v.e)
                   - 2 * list_dot_product(v.e, c.ce)
                   + list_dot_product(c.ce, c.ce), c.c_id) AS rn
          FROM v, {last_c} c),
        assign AS (SELECT vec_id, c_id FROM dist WHERE rn = 1),
        nv AS (
          SELECT v.vec_id, v.e, sqrt(list_dot_product(v.e, v.e)) AS nrm,
                 a.c_id
          FROM v JOIN assign a USING (vec_id)),
        s AS (
          SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
                 list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos_raw
          FROM nv q JOIN nv c ON q.c_id = c.c_id AND q.vec_id != c.vec_id
          WHERE q.vec_id % 50 = 0)
        SELECT q_id, "rank", neighbor_id, ROUND(cos_raw, 2) AS cos FROM (
          SELECT q_id, neighbor_id, cos_raw,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY cos_raw DESC, neighbor_id)
                   AS "rank"
          FROM s) t
        WHERE "rank" <= 5 ORDER BY q_id, "rank"
    """


def _pagerank_sql() -> str:
    """Unrolled integer fixed-point PageRank over the complete
    prefix-filter edge set — oracle twin of pipeline.near_dup_pagerank
    (scale/damping/iterations imported so the constants can't drift)."""
    from catalyst_spark.queries.pipeline import _PR_ITERS, _PR_SCALE

    teleport = 15 * _PR_SCALE // 100
    parts = [
        f"WITH {_SHINGLE_PAIRS_CTE},",
        "edges AS ("
        " SELECT a_id AS src, b_id AS dst FROM pairs"
        " UNION ALL SELECT b_id AS src, a_id AS dst FROM pairs),",
        "deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),",
        f"r0 AS (SELECT src AS doc_id, CAST({_PR_SCALE} AS BIGINT) AS r"
        " FROM deg),",
    ]
    for i in range(1, _PR_ITERS + 1):
        parts.append(
            f"r{i} AS ("
            f" SELECT e.dst AS doc_id,"
            f" CAST({teleport} + (85 * SUM(r.r // d.deg)) // 100 AS BIGINT)"
            f"   AS r"
            f" FROM edges e"
            f" JOIN r{i - 1} r ON e.src = r.doc_id"
            f" JOIN deg d ON e.src = d.src"
            f" GROUP BY e.dst),"
        )
    body = "\n".join(parts).rstrip(",")
    return (
        body
        + f"\nSELECT doc_id, r AS rank_fp FROM r{_PR_ITERS}"
        " ORDER BY rank_fp DESC, doc_id"
    )


def _pagerank_converged_sql() -> str:
    """Unrolled-budget twin of pipeline.near_dup_pagerank_converged:
    every iteration r1..r_BUDGET and its exact bigint L1 delta is
    computed, then the FIRST iteration with delta < _PR_EPS is
    selected — the same iteration Spark's early-stopping loop ends
    on, because the integer fixed-point map makes "first converged
    iteration" a deterministic function of the data. Constants imported
    so budget/eps/scale can't drift between engines."""
    from catalyst_spark.queries.pipeline import (
        _PR_BUDGET,
        _PR_EPS,
        _PR_SCALE,
    )

    teleport = 15 * _PR_SCALE // 100
    # every r{i} is consumed TWICE (by r{i+1} and by the delta d{i+1});
    # DuckDB 1.0 inlines plain CTEs per reference, which would re-run
    # the whole chain 2^BUDGET times — AS MATERIALIZED pins each
    # iteration (and the edge set) to one evaluation, the linear cost
    # the Spark loop's localCheckpoint has by construction
    parts = [
        f"WITH {_SHINGLE_PAIRS_CTE},",
        "edges AS MATERIALIZED ("
        " SELECT a_id AS src, b_id AS dst FROM pairs"
        " UNION ALL SELECT b_id AS src, a_id AS dst FROM pairs),",
        "deg AS MATERIALIZED"
        " (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),",
        f"eps AS (SELECT {_PR_EPS} AS e),",
        f"r0 AS MATERIALIZED"
        f" (SELECT src AS doc_id, CAST({_PR_SCALE} AS BIGINT) AS r"
        " FROM deg),",
    ]
    for i in range(1, _PR_BUDGET + 1):
        parts.append(
            f"r{i} AS MATERIALIZED ("
            f" SELECT e.dst AS doc_id,"
            f" CAST({teleport} + (85 * SUM(r.r // d.deg)) // 100 AS BIGINT)"
            f"   AS r"
            f" FROM edges e"
            f" JOIN r{i - 1} r ON e.src = r.doc_id"
            f" JOIN deg d ON e.src = d.src"
            f" GROUP BY e.dst),"
        )
        parts.append(
            f"d{i} AS MATERIALIZED"
            f" (SELECT CAST(SUM(ABS(a.r - b.r)) AS BIGINT) AS d"
            f" FROM r{i} a JOIN r{i - 1} b USING (doc_id)),"
        )
    parts.append(
        "deltas AS ("
        + " UNION ALL ".join(
            f"SELECT {i} AS i, d FROM d{i}"
            for i in range(1, _PR_BUDGET + 1)
        )
        + "),"
    )
    parts.append(
        f"first AS (SELECT COALESCE(MIN(i), {_PR_BUDGET}) AS i"
        " FROM deltas WHERE d < (SELECT e FROM eps)),"
    )
    parts.append(
        "allr AS ("
        + " UNION ALL ".join(
            f"SELECT {i} AS i, doc_id, r FROM r{i}"
            for i in range(1, _PR_BUDGET + 1)
        )
        + ")"
    )
    body = "\n".join(parts)
    return (
        body
        + "\nSELECT a.doc_id, a.r AS rank_fp,"
        " CAST(f.i AS INT) AS n_iters,"
        " (SELECT d FROM deltas WHERE i = f.i) AS l1_delta,"
        " (SELECT d FROM deltas WHERE i = f.i) < (SELECT e FROM eps)"
        "   AS converged"
        " FROM allr a, first f WHERE a.i = f.i"
        " ORDER BY rank_fp DESC, doc_id"
    )


def _phash_pairs_sql() -> str:
    """Brute-force ground truth for pipeline.phash_dup_pairs: build the
    SAME deterministic 60-bit hash table (md5-derived group base XOR
    doc_id % 8 planted bit flips — string-identical md5 inputs, so the
    hashes agree bit-for-bit), then check ALL id-ordered pairs with
    bit_count(xor()) <= 7. The Spark side runs the 8-band bucket join +
    popcount verify (multimodal.image_dup_pairs); any banded-join miss
    or phantom shows up as a value-hash mismatch — the completeness-for-
    Hamming<=7 pigeonhole argument, value-proven."""
    return f"""
        WITH {_phash_table_cte()}
        SELECT a.media_id AS a_id, b.media_id AS b_id,
               CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
        FROM ph a JOIN ph b ON a.media_id < b.media_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 7
        ORDER BY a_id, b_id
    """


def _phash_table_cte() -> str:
    """Shared fl + ph CTE fragment (trailing 'ph' table): the
    deterministic 60-bit hash table both pHash oracles derive from
    `documents` (md5 strings identical to the Spark side's)."""
    base = _h60_duck("concat('ph:', CAST(d.doc_id // 8 AS VARCHAR))")
    pos = _h60_duck(
        "concat('fl:', CAST(doc_id AS VARCHAR), ':', CAST(j AS VARCHAR))"
    )
    return f"""fl AS (
          SELECT doc_id,
                 BIT_XOR(CAST(1 AS BIGINT) << CAST({pos} % 60 AS INT)) AS mask
          FROM (SELECT doc_id,
                       UNNEST(range(1, CAST(doc_id % 8 AS INT) + 1)) AS j
                FROM documents)
          GROUP BY doc_id),
        ph AS (
          SELECT d.doc_id AS media_id,
                 xor({base}, COALESCE(f.mask, 0)) AS phash
          FROM documents d LEFT JOIN fl f ON d.doc_id = f.doc_id)"""


def _audio_fp_table_cte() -> str:
    """The audio-fingerprint twin of _phash_table_cte (trailing 'afp'
    table): groups of 6, 'au:'/'af:' md5 strings — string-identical to
    pipeline._synthetic_audio_fp's, so the hashes agree
    bit-for-bit."""
    base = _h60_duck("concat('au:', CAST(d.doc_id // 6 AS VARCHAR))")
    pos = _h60_duck(
        "concat('af:', CAST(doc_id AS VARCHAR), ':', CAST(j AS VARCHAR))"
    )
    return f"""afl AS (
          SELECT doc_id,
                 BIT_XOR(CAST(1 AS BIGINT) << CAST({pos} % 60 AS INT)) AS mask
          FROM (SELECT doc_id,
                       UNNEST(range(1, CAST(doc_id % 6 AS INT) + 1)) AS j
                FROM documents)
          GROUP BY doc_id),
        afp AS (
          SELECT d.doc_id AS media_id,
                 xor({base}, COALESCE(f.mask, 0)) AS afp
          FROM documents d LEFT JOIN afl f ON d.doc_id = f.doc_id)"""


def _video_frame_pairs_sql() -> str:
    """Brute-force ground truth for pipeline.video_frame_dup_pairs
    (r12): ALL id-ordered pairs with exact list_intersect over the
    same deterministic frame-hash sets (string-identical md5 inputs),
    kept iff 2|I| >= |U| — any candidate the equi-join missed or the
    verify mis-scored shows up as a value-hash mismatch. The permille
    divide is of non-negative integers (sign-safe by domain)."""
    return """
        WITH fs AS (
          SELECT doc_id AS media_id,
                 [md5(concat('vf:', CAST(doc_id // 4 AS VARCHAR), ':',
                             CAST(k AS VARCHAR)))
                  FOR k IN range(
                    ([1, 2, 7, 10])[CAST(doc_id % 4 AS INT) + 1],
                    ([1, 2, 7, 10])[CAST(doc_id % 4 AS INT) + 1] + 4)]
                   AS fh
          FROM documents),
        p AS (
          SELECT a.media_id AS a_id, b.media_id AS b_id,
                 len(list_intersect(a.fh, b.fh)) AS i,
                 len(a.fh) + len(b.fh) - len(list_intersect(a.fh, b.fh))
                   AS u
          FROM fs a JOIN fs b ON a.media_id < b.media_id)
        SELECT a_id, b_id,
               CAST(i AS BIGINT) AS n_shared,
               CAST(u AS BIGINT) AS n_union,
               CAST((i * 1000) // u AS BIGINT) AS jaccard_permille
        FROM p WHERE 2 * i >= u
        ORDER BY a_id, b_id
    """


def _audio_fp_pairs_sql() -> str:
    """Brute-force ground truth for pipeline.audio_fp_dup_pairs (r12):
    ALL id-ordered pairs with bit_count(xor()) <= 7 over the same
    deterministic fingerprint table. The Spark side runs the shared
    8-band bucket join + popcount verify (multimodal.audio_dup_pairs);
    any banded-join miss or phantom shows up as a value-hash mismatch
    — the pigeonhole completeness argument, value-proven on the audio
    rung's own dup structure (groups of 6, Hamming 0..10)."""
    return f"""
        WITH {_audio_fp_table_cte()}
        SELECT a.media_id AS a_id, b.media_id AS b_id,
               CAST(bit_count(xor(a.afp, b.afp)) AS INT) AS hamming
        FROM afp a JOIN afp b ON a.media_id < b.media_id
        WHERE bit_count(xor(a.afp, b.afp)) <= 7
        ORDER BY a_id, b_id
    """


def _phash_clusters_sql() -> str:
    """Min-reachable-id connected components over the brute-force
    Hamming<=7 pHash pair set — oracle twin of
    pipeline.phash_dup_clusters (same recursive shape as the
    dedup_clusters oracle)."""
    return f"""
        WITH RECURSIVE {_phash_table_cte()},
        pairs AS (
          SELECT a.media_id AS a_id, b.media_id AS b_id
          FROM ph a JOIN ph b ON a.media_id < b.media_id
          WHERE bit_count(xor(a.phash, b.phash)) <= 7),
        edges AS (
          SELECT a_id AS u, b_id AS v FROM pairs
          UNION
          SELECT b_id AS u, a_id AS v FROM pairs),
        reach(u, r) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM edges)
          UNION
          SELECT e.u, re.r FROM edges e JOIN reach re ON e.v = re.u)
        SELECT u AS media_id, MIN(r) AS cluster_id
        FROM reach GROUP BY u ORDER BY media_id
    """


def _multiprobe_sql() -> str:
    """Unrolled k-means + top-2 cell probes per query vs top-1 member
    assignment + exact-cosine rerank of each candidate set, graded
    against the brute-force top-5 — the oracle twin of
    pipeline.ann_multiprobe_recall. Same tie-breaks everywhere:
    (distance, c_id) for cell ranking, (cos DESC, neighbor_id) for the
    top-5 rank, so the probed cells and recalls are engine-exact."""
    from catalyst_spark.queries.pipeline import _KMEANS_ITERS

    last_c = f"c{_KMEANS_ITERS}"
    return _kmeans_sql() + f"""
        dist AS (
          SELECT v.vec_id, c.c_id,
                 row_number() OVER (PARTITION BY v.vec_id ORDER BY
                   list_dot_product(v.e, v.e)
                   - 2 * list_dot_product(v.e, c.ce)
                   + list_dot_product(c.ce, c.ce), c.c_id) AS rn
          FROM v, {last_c} c),
        members AS (SELECT vec_id AS n_id, c_id FROM dist WHERE rn = 1),
        probes AS (
          SELECT vec_id AS q_id, c_id, rn AS probe_rank
          FROM dist WHERE rn <= 2 AND vec_id % 50 = 0),
        nv AS (
          SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        cand2 AS (
          SELECT DISTINCT p.q_id, m.n_id
          FROM probes p JOIN members m USING (c_id)
          WHERE m.n_id != p.q_id),
        cand1 AS (
          SELECT DISTINCT p.q_id, m.n_id
          FROM probes p JOIN members m USING (c_id)
          WHERE p.probe_rank = 1 AND m.n_id != p.q_id),
        ivf1 AS (
          SELECT q_id, n_id FROM (
            SELECT c.q_id, c.n_id,
                   ROW_NUMBER() OVER (PARTITION BY c.q_id ORDER BY
                     list_dot_product(q.e, n.e) / (q.nrm * n.nrm) DESC,
                     c.n_id) AS rnk
            FROM cand1 c
            JOIN nv q ON q.vec_id = c.q_id
            JOIN nv n ON n.vec_id = c.n_id) t
          WHERE rnk <= 5),
        ivf2 AS (
          SELECT q_id, n_id FROM (
            SELECT c.q_id, c.n_id,
                   ROW_NUMBER() OVER (PARTITION BY c.q_id ORDER BY
                     list_dot_product(q.e, n.e) / (q.nrm * n.nrm) DESC,
                     c.n_id) AS rnk
            FROM cand2 c
            JOIN nv q ON q.vec_id = c.q_id
            JOIN nv n ON n.vec_id = c.n_id) t
          WHERE rnk <= 5),
        sb AS (
          SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
                 list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos_raw
          FROM nv q JOIN nv c ON q.vec_id != c.vec_id
          WHERE q.vec_id % 50 = 0),
        brute AS (
          SELECT q_id, neighbor_id FROM (
            SELECT q_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY cos_raw DESC, neighbor_id)
                     AS rnk
            FROM sb) t
          WHERE rnk <= 5)
        SELECT b.q_id,
               COUNT(i1.n_id) AS hits_p1,
               COUNT(i2.n_id) AS hits_p2,
               ROUND(COUNT(i1.n_id) / 5.0, 2) AS recall_p1,
               ROUND(COUNT(i2.n_id) / 5.0, 2) AS recall_p2
        FROM brute b
        LEFT JOIN ivf1 i1 ON b.q_id = i1.q_id AND b.neighbor_id = i1.n_id
        LEFT JOIN ivf2 i2 ON b.q_id = i2.q_id AND b.neighbor_id = i2.n_id
        GROUP BY b.q_id ORDER BY b.q_id
    """


def _pq_ctes(with_header: bool = True, dims_name: str = "dims",
             src: str = "v", np: str = "",
             make_luts: bool = True) -> str:
    """Shared CTE prefix (trailing comma) for the PQ oracles: unrolled
    per-subspace k-means + code assignment + per-query LUTs. Same
    deterministic k-means as _kmeans_sql on each 16-dim slice; LUT
    entries use the q.q - 2q.c + c.c expansion.

    with_header=False omits the WITH/v/dims opening so the block can be
    appended after _kmeans_sql (the combined IVF-PQ oracle needs BOTH
    the 64-dim coarse CTEs and the 16-dim subspace CTEs in one query);
    dims_name renames the 1..16 dimension CTE to avoid colliding with
    the coarse query's 1..64 `dims`. `src` selects the vector table to
    quantize ("v" raw, "rv" residual) and `np` prefixes every generated
    CTE name so raw and residual blocks coexist in one query (the
    residual IVF-PQ oracles use src="rv", np="r"); make_luts=False
    skips the flat per-query LUTs for rungs whose LUT frame is
    per-probed-cell (built separately)."""
    from catalyst_spark.queries.pipeline import (
        _KMEANS_ITERS,
        _KMEANS_K,
        _LSH_DIM,
        _PQ_M,
    )

    sub = _LSH_DIM // _PQ_M
    last = _KMEANS_ITERS
    parts = [
        f"{dims_name} AS (SELECT unnest(range(1, {sub + 1})) AS d),",
    ]
    if with_header:
        parts.insert(
            0,
            "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e"
            " FROM embeddings),",
        )
    for m in range(_PQ_M):
        lo = m * sub
        parts.append(
            f"{np}v{m} AS (SELECT vec_id, e[{lo + 1}:{lo + sub}] AS e"
            f" FROM {src}),"
        )
        parts.append(
            f"{np}c0_{m} AS (SELECT row_number() OVER (ORDER BY vec_id) - 1"
            f" AS c_id, e AS ce FROM (SELECT vec_id, e FROM {np}v{m}"
            f" ORDER BY vec_id LIMIT {_KMEANS_K})),"
        )
        for i in range(1, last + 1):
            parts.append(
                f"{np}a{i}_{m} AS (SELECT vec_id, e, c_id FROM ("
                f" SELECT v.vec_id, v.e, c.c_id,"
                f" row_number() OVER (PARTITION BY v.vec_id ORDER BY"
                f" list_dot_product(v.e, v.e) - 2 * list_dot_product(v.e, c.ce)"
                f" + list_dot_product(c.ce, c.ce), c.c_id) AS rn"
                f" FROM {np}v{m} v, {np}c{i - 1}_{m} c) t WHERE rn = 1),"
            )
            parts.append(
                f"{np}m{i}_{m} AS (SELECT c_id, d, AVG(e[d]) AS mm"
                f" FROM {np}a{i}_{m}, {dims_name} GROUP BY 1, 2),"
            )
            parts.append(
                f"{np}c{i}_{m} AS (SELECT c_id, list(mm ORDER BY d) AS ce"
                f" FROM {np}m{i}_{m} GROUP BY 1),"
            )
        parts.append(
            f"{np}code{m} AS (SELECT vec_id, c_id AS code FROM ("
            f" SELECT v.vec_id, c.c_id,"
            f" row_number() OVER (PARTITION BY v.vec_id ORDER BY"
            f" list_dot_product(v.e, v.e) - 2 * list_dot_product(v.e, c.ce)"
            f" + list_dot_product(c.ce, c.ce), c.c_id) AS rn"
            f" FROM {np}v{m} v, {np}c{last}_{m} c) t WHERE rn = 1),"
        )
        if make_luts:
            parts.append(
                f"{np}lut{m} AS (SELECT q.vec_id AS q_id, c.c_id AS code,"
                f" list_dot_product(q.e, q.e) - 2 * list_dot_product(q.e, c.ce)"
                f" + list_dot_product(c.ce, c.ce) AS p"
                f" FROM {np}v{m} q, {np}c{last}_{m} c WHERE q.vec_id % 50 = 0),"
            )
    return "\n".join(parts)


_PQ_TOP5_CTE = """
        pqrank AS (
          SELECT l0.q_id, c0.vec_id AS n_id,
                 l0.p + l1.p + l2.p + l3.p AS d2,
                 ROW_NUMBER() OVER (PARTITION BY l0.q_id ORDER BY
                   l0.p + l1.p + l2.p + l3.p, c0.vec_id) AS rnk
          FROM code0 c0
          JOIN code1 c1 USING (vec_id)
          JOIN code2 c2 USING (vec_id)
          JOIN code3 c3 USING (vec_id)
          JOIN lut0 l0 ON l0.code = c0.code
          JOIN lut1 l1 ON l1.code = c1.code AND l1.q_id = l0.q_id
          JOIN lut2 l2 ON l2.code = c2.code AND l2.q_id = l0.q_id
          JOIN lut3 l3 ON l3.code = c3.code AND l3.q_id = l0.q_id
          WHERE c0.vec_id != l0.q_id)"""


def _pq_sql() -> str:
    """Oracle twin of pipeline.ann_pq_adc_topk: the shared PQ CTEs plus
    the top-5 ADC rank; the four LUT parts add in fixed left-to-right
    order, mirroring the Spark side exactly."""
    return _pq_ctes() + _PQ_TOP5_CTE + """
        SELECT q_id, rnk AS "rank", n_id AS neighbor_id,
               ROUND(d2, 2) AS adc_d2
        FROM pqrank WHERE rnk <= 5 ORDER BY q_id, "rank"
    """


def _pq_recall_sql() -> str:
    """Oracle twin of pipeline.ann_pq_recall: PQ top-5 graded against
    the exact brute-force top-5 (cos DESC, neighbor_id ties)."""
    return _pq_ctes() + _PQ_TOP5_CTE + """,
        pq AS (SELECT q_id, n_id FROM pqrank WHERE rnk <= 5),
        nv AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        sb AS (
          SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
                 list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos_raw
          FROM nv q JOIN nv c ON q.vec_id != c.vec_id
          WHERE q.vec_id % 50 = 0),
        brute AS (
          SELECT q_id, neighbor_id FROM (
            SELECT q_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY cos_raw DESC, neighbor_id)
                     AS rnk
            FROM sb) t
          WHERE rnk <= 5)
        SELECT b.q_id,
               COUNT(pq.n_id) AS hits,
               ROUND(COUNT(pq.n_id) / 5.0, 2) AS recall_at_5
        FROM brute b
        LEFT JOIN pq ON pq.q_id = b.q_id AND pq.n_id = b.neighbor_id
        GROUP BY b.q_id ORDER BY b.q_id
    """


def _ivfpq_ctes() -> str:
    """Shared CTE prefix for the combined IVF-PQ oracles: the 64-dim
    coarse k-means CTEs (_kmeans_sql) + the 16-dim subspace PQ CTEs
    (header suppressed, dims renamed sdims) + coarse cell assignment
    (top-1 members, top-2 probes), candidate pairs, and the in-cell
    ADC rank — the oracle twin of pipeline.ann_ivfpq_topk."""
    from catalyst_spark.queries.pipeline import _KMEANS_ITERS

    last_c = f"c{_KMEANS_ITERS}"
    return (
        _kmeans_sql()
        + "\n"
        + _pq_ctes(with_header=False, dims_name="sdims")
        + f"""
        dist AS (
          SELECT v.vec_id, c.c_id,
                 row_number() OVER (PARTITION BY v.vec_id ORDER BY
                   list_dot_product(v.e, v.e)
                   - 2 * list_dot_product(v.e, c.ce)
                   + list_dot_product(c.ce, c.ce), c.c_id) AS rn
          FROM v, {last_c} c),
        members AS (SELECT vec_id AS n_id, c_id FROM dist WHERE rn = 1),
        probes AS (
          SELECT vec_id AS q_id, c_id
          FROM dist WHERE rn <= 2 AND vec_id % 50 = 0),
        cand AS (
          SELECT DISTINCT p.q_id, m.n_id
          FROM probes p JOIN members m USING (c_id)
          WHERE m.n_id != p.q_id),
        ipqrank AS (
          SELECT ca.q_id, ca.n_id,
                 l0.p + l1.p + l2.p + l3.p AS d2,
                 ROW_NUMBER() OVER (PARTITION BY ca.q_id ORDER BY
                   l0.p + l1.p + l2.p + l3.p, ca.n_id) AS rnk
          FROM cand ca
          JOIN code0 c0 ON c0.vec_id = ca.n_id
          JOIN code1 c1 ON c1.vec_id = ca.n_id
          JOIN code2 c2 ON c2.vec_id = ca.n_id
          JOIN code3 c3 ON c3.vec_id = ca.n_id
          JOIN lut0 l0 ON l0.code = c0.code AND l0.q_id = ca.q_id
          JOIN lut1 l1 ON l1.code = c1.code AND l1.q_id = ca.q_id
          JOIN lut2 l2 ON l2.code = c2.code AND l2.q_id = ca.q_id
          JOIN lut3 l3 ON l3.code = c3.code AND l3.q_id = ca.q_id)"""
    )


def _ivfpq_sql() -> str:
    return _ivfpq_ctes() + """
        SELECT q_id, rnk AS "rank", n_id AS neighbor_id,
               ROUND(d2, 2) AS adc_d2
        FROM ipqrank WHERE rnk <= 5 ORDER BY q_id, "rank"
    """


def _ivfpq_recall_sql() -> str:
    """Oracle twin of pipeline.ann_ivfpq_recall: IVF-PQ top-5 graded
    against the exact brute-force top-5 (cos DESC, neighbor_id)."""
    return _ivfpq_ctes() + """,
        ipq AS (SELECT q_id, n_id FROM ipqrank WHERE rnk <= 5),
        nv AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        sb AS (
          SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
                 list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos_raw
          FROM nv q JOIN nv c ON q.vec_id != c.vec_id
          WHERE q.vec_id % 50 = 0),
        brute AS (
          SELECT q_id, neighbor_id FROM (
            SELECT q_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY cos_raw DESC, neighbor_id)
                     AS rnk
            FROM sb) t
          WHERE rnk <= 5)
        SELECT b.q_id,
               COUNT(ipq.n_id) AS hits,
               ROUND(COUNT(ipq.n_id) / 5.0, 2) AS recall_at_5
        FROM brute b
        LEFT JOIN ipq ON ipq.q_id = b.q_id AND ipq.n_id = b.neighbor_id
        GROUP BY b.q_id ORDER BY b.q_id
    """


def _ivfpq_rerank_sql() -> str:
    """Oracle twin of pipeline.ann_ivfpq_rerank_topk: the IVF-PQ ADC
    shortlist (top-_RERANK_R by (d2, n_id)) reranked with the exact
    sequential-fold cosine under the brute rung's (cos DESC, n_id)
    ties."""
    from catalyst_spark.queries.pipeline import _RERANK_R

    return _ivfpq_ctes() + f""",
        sl AS (SELECT q_id, n_id FROM ipqrank WHERE rnk <= {_RERANK_R}),
        nv AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm
               FROM v),
        rr AS (
          SELECT s.q_id, s.n_id,
                 list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos_raw
          FROM sl s JOIN nv q ON q.vec_id = s.q_id
                    JOIN nv c ON c.vec_id = s.n_id)
        SELECT q_id, "rank", n_id AS neighbor_id,
               ROUND(cos_raw, 2) AS cos FROM (
          SELECT q_id, n_id, cos_raw,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY cos_raw DESC, n_id) AS "rank"
          FROM rr) t
        WHERE "rank" <= 5 ORDER BY q_id, "rank"
    """


def _ivfpq_rerank_recall_sql() -> str:
    """Reranked IVF-PQ top-5 graded against the brute-force top-5."""
    from catalyst_spark.queries.pipeline import _RERANK_R

    return _ivfpq_ctes() + f""",
        sl AS (SELECT q_id, n_id FROM ipqrank WHERE rnk <= {_RERANK_R}),
        nv AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm
               FROM v),
        rr AS (
          SELECT s.q_id, s.n_id,
                 list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos_raw
          FROM sl s JOIN nv q ON q.vec_id = s.q_id
                    JOIN nv c ON c.vec_id = s.n_id),
        rtop AS (
          SELECT q_id, n_id FROM (
            SELECT q_id, n_id,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY cos_raw DESC, n_id) AS rnk
            FROM rr) t
          WHERE rnk <= 5),
        sb AS (
          SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
                 list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos_raw
          FROM nv q JOIN nv c ON q.vec_id != c.vec_id
          WHERE q.vec_id % 50 = 0),
        brute AS (
          SELECT q_id, neighbor_id FROM (
            SELECT q_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY cos_raw DESC, neighbor_id)
                     AS rnk
            FROM sb) t
          WHERE rnk <= 5)
        SELECT b.q_id,
               COUNT(rtop.n_id) AS hits,
               ROUND(COUNT(rtop.n_id) / 5.0, 2) AS recall_at_5
        FROM brute b
        LEFT JOIN rtop ON rtop.q_id = b.q_id AND rtop.n_id = b.neighbor_id
        GROUP BY b.q_id ORDER BY b.q_id
    """


def _edit_distance_sql() -> str:
    """Brute exact Levenshtein over the complete prefix-filter pair
    set — oracle twin of pipeline.dedup_edit_distance (both engines
    implement the standard DP, so the integer distances agree
    exactly)."""
    return f"""
        WITH {_SHINGLE_PAIRS_CTE}
        SELECT p.a_id, p.b_id,
               CAST(levenshtein(da.text, db.text) AS INT) AS edit_distance,
               ROUND(1 - levenshtein(da.text, db.text)
                     / CAST(GREATEST(len(da.text), len(db.text)) AS DOUBLE),
                     4) AS edit_sim
        FROM pairs p
        JOIN documents da ON da.doc_id = p.a_id
        JOIN documents db ON db.doc_id = p.b_id
        ORDER BY a_id, b_id
    """


def _selfdup_cut_sql() -> str:
    """Oracle twin of pipeline.window_selfdup_cut: same window/dup/run
    machinery as the window_selfdup_spans oracle, runs >= _CUT_RUN
    expand to covered token indices, kept tokens re-join with
    string_agg (ORDER BY index ≡ Spark's order-preserving array
    filter). Parallel-unnest of (token, index) zips the two lists."""
    from catalyst_spark.queries.pipeline import _CUT_RUN, _WIN_TOKENS

    return f"""
        WITH d AS (
          SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents),
        w AS (
          SELECT doc_id, u.pos AS pos, {_h60_duck('u.w')} AS h
          FROM (
            SELECT doc_id,
                   unnest([{{'pos': i,
                            'w': array_to_string(
                                   toks[i:(i + {_WIN_TOKENS} - 1)], ' ')}}
                           FOR i IN range(1, greatest(2, len(toks)
                                                         - {_WIN_TOKENS - 2}))])
                     AS u
            FROM d)),
        dup AS (
          SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
        isl AS (
          SELECT w.doc_id, w.pos,
                 w.pos - row_number() OVER (PARTITION BY w.doc_id
                                            ORDER BY w.pos) AS g
          FROM w JOIN dup ON w.h = dup.h),
        runs AS (
          SELECT doc_id, MIN(pos) AS p0, COUNT(*) AS run
          FROM isl GROUP BY doc_id, g
          HAVING COUNT(*) >= {_CUT_RUN}),
        cut AS (
          SELECT DISTINCT doc_id,
                 UNNEST(range(p0, p0 + run + {_WIN_TOKENS - 1})) AS i
          FROM runs),
        tok AS (
          SELECT doc_id, unnest(toks) AS t,
                 unnest(range(1, len(toks) + 1)) AS i
          FROM d),
        kept AS (
          SELECT tok.doc_id,
                 string_agg(tok.t, ' ' ORDER BY tok.i) AS kept_text,
                 CAST(COUNT(*) AS BIGINT) AS n_kept
          FROM tok LEFT JOIN cut
            ON cut.doc_id = tok.doc_id AND cut.i = tok.i
          WHERE cut.i IS NULL
          GROUP BY tok.doc_id)
        SELECT d.doc_id,
               CAST(len(d.toks) AS BIGINT) AS n_tokens,
               CAST(len(d.toks) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_cut,
               COALESCE(k.kept_text, '') AS kept_text
        FROM d LEFT JOIN kept k USING (doc_id)
        ORDER BY d.doc_id
    """


def _bucket_hist_sql() -> str:
    """Oracle twin of pipeline.lsh_bucket_size_hist: the production
    8x4 banding's bucket-size histogram with per-class candidate-pair
    volume and the over-cap flag."""
    from catalyst_spark.queries.pipeline import (
        _LSH_BUCKET_CAP,
        _MINHASH_BANDS,
        _MINHASH_ROWS,
    )

    buckets = ", ".join(
        _h60_duck(
            "concat_ws(',', "
            + ", ".join(
                [str(b)]
                + [f"m{_MINHASH_ROWS * b + r}" for r in range(_MINHASH_ROWS)]
            )
            + ")"
        )
        for b in range(_MINHASH_BANDS)
    )
    return f"""
        WITH {_MINHASH_SIG},
        bands AS (SELECT doc_id, unnest([{buckets}]) AS bucket FROM sig),
        sz AS (SELECT bucket, COUNT(*) AS n FROM bands GROUP BY bucket)
        SELECT CAST(n AS BIGINT) AS bucket_size,
               CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(COUNT(*) * (n * (n - 1) // 2) AS BIGINT)
                 AS candidate_pairs,
               n > {_LSH_BUCKET_CAP} AS over_cap
        FROM sz GROUP BY n ORDER BY bucket_size
    """


def _residual_src_ctes(include_probes: bool) -> str:
    """Coarse assignment + residual-vector CTEs (trailing comma),
    appended after _kmeans_sql: rv is x - c(x) with the FULL-precision
    final centroids (list_transform subtraction — same per-element
    double arithmetic as the Spark side's zip_with). include_probes
    adds the nprobe=2 probe set and the per-(query, probed cell)
    residual qr used by the residual IVFADC rung."""
    from catalyst_spark.queries.pipeline import _KMEANS_ITERS, _LSH_DIM

    last_c = f"c{_KMEANS_ITERS}"
    parts = f"""
        dist AS (
          SELECT v.vec_id, c.c_id,
                 row_number() OVER (PARTITION BY v.vec_id ORDER BY
                   list_dot_product(v.e, v.e)
                   - 2 * list_dot_product(v.e, c.ce)
                   + list_dot_product(c.ce, c.ce), c.c_id) AS rn
          FROM v, {last_c} c),
        assign AS (SELECT vec_id, c_id FROM dist WHERE rn = 1),
        rv AS (
          SELECT v.vec_id,
                 list_transform(range(1, {_LSH_DIM + 1}),
                                d -> v.e[d] - c.ce[d]) AS e
          FROM v JOIN assign a ON a.vec_id = v.vec_id
          JOIN {last_c} c ON c.c_id = a.c_id),"""
    if include_probes:
        parts += f"""
        members AS (SELECT vec_id AS n_id, c_id FROM dist WHERE rn = 1),
        probes AS (
          SELECT vec_id AS q_id, c_id
          FROM dist WHERE rn <= 2 AND vec_id % 50 = 0),
        qr AS (
          SELECT p.q_id, p.c_id,
                 list_transform(range(1, {_LSH_DIM + 1}),
                                d -> v.e[d] - c.ce[d]) AS e
          FROM probes p JOIN v ON v.vec_id = p.q_id
          JOIN {last_c} c ON c.c_id = p.c_id),"""
    return parts


def _rivfpq_ctes() -> str:
    """Shared CTE prefix for the residual IVFADC oracles (oracle twin
    of pipeline.ann_ivfpq_residual_topk): coarse k-means + residual
    vectors + subspace k-means fitted ON the residuals (np="r") +
    per-(query, probed cell) LUTs keyed (q_id, c_id, code) — the
    residual frame differs per probed cell — + the in-cell ADC rank."""
    from catalyst_spark.queries.pipeline import (
        _KMEANS_ITERS,
        _LSH_DIM,
        _PQ_M,
    )

    sub = _LSH_DIM // _PQ_M
    rlast = _KMEANS_ITERS
    rluts = []
    for m in range(_PQ_M):
        lo = m * sub
        rluts.append(
            f"rlut{m} AS (SELECT q.q_id, q.c_id, c.c_id AS code,"
            f" list_dot_product(q.qe, q.qe)"
            f" - 2 * list_dot_product(q.qe, c.ce)"
            f" + list_dot_product(c.ce, c.ce) AS p"
            f" FROM (SELECT q_id, c_id, e[{lo + 1}:{lo + sub}] AS qe"
            f" FROM qr) q, rc{rlast}_{m} c),"
        )
    return (
        _kmeans_sql()
        + _residual_src_ctes(include_probes=True)
        + "\n"
        + _pq_ctes(with_header=False, dims_name="sdims_r", src="rv",
                   np="r", make_luts=False)
        + "\n" + "\n".join(rluts)
        + """
        rcand AS (
          SELECT DISTINCT p.q_id, m.n_id, p.c_id
          FROM probes p JOIN members m USING (c_id)
          WHERE m.n_id != p.q_id),
        ripqrank AS (
          SELECT ca.q_id, ca.n_id,
                 l0.p + l1.p + l2.p + l3.p AS d2,
                 ROW_NUMBER() OVER (PARTITION BY ca.q_id ORDER BY
                   l0.p + l1.p + l2.p + l3.p, ca.n_id) AS rnk
          FROM rcand ca
          JOIN rcode0 c0 ON c0.vec_id = ca.n_id
          JOIN rcode1 c1 ON c1.vec_id = ca.n_id
          JOIN rcode2 c2 ON c2.vec_id = ca.n_id
          JOIN rcode3 c3 ON c3.vec_id = ca.n_id
          JOIN rlut0 l0 ON l0.code = c0.code AND l0.q_id = ca.q_id
                        AND l0.c_id = ca.c_id
          JOIN rlut1 l1 ON l1.code = c1.code AND l1.q_id = ca.q_id
                        AND l1.c_id = ca.c_id
          JOIN rlut2 l2 ON l2.code = c2.code AND l2.q_id = ca.q_id
                        AND l2.c_id = ca.c_id
          JOIN rlut3 l3 ON l3.code = c3.code AND l3.q_id = ca.q_id
                        AND l3.c_id = ca.c_id)"""
    )


def _rivfpq_sql() -> str:
    return _rivfpq_ctes() + """
        SELECT q_id, rnk AS "rank", n_id AS neighbor_id,
               ROUND(d2, 2) AS adc_d2
        FROM ripqrank WHERE rnk <= 5 ORDER BY q_id, "rank"
    """


def _rivfpq_recall_sql() -> str:
    """Oracle twin of pipeline.ann_ivfpq_residual_recall: residual
    IVFADC top-5 graded against the exact brute-force top-5."""
    return _rivfpq_ctes() + """,
        ripq AS (SELECT q_id, n_id FROM ripqrank WHERE rnk <= 5),
        nv AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        sb AS (
          SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
                 list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos_raw
          FROM nv q JOIN nv c ON q.vec_id != c.vec_id
          WHERE q.vec_id % 50 = 0),
        brute AS (
          SELECT q_id, neighbor_id FROM (
            SELECT q_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY cos_raw DESC, neighbor_id)
                     AS rnk
            FROM sb) t
          WHERE rnk <= 5)
        SELECT b.q_id,
               COUNT(ripq.n_id) AS hits,
               ROUND(COUNT(ripq.n_id) / 5.0, 2) AS recall_at_5
        FROM brute b
        LEFT JOIN ripq ON ripq.q_id = b.q_id AND ripq.n_id = b.neighbor_id
        GROUP BY b.q_id ORDER BY b.q_id
    """


def _pq_distortion_sql() -> str:
    """Oracle twin of pipeline.pq_distortion: per-vector squared
    distance to the assigned subspace centroid (same expansion, same
    doubles), fixed-point floored to micro-units per row, integer
    aggregate — order-free on both engines. Two code spaces since r6:
    raw-vector codes and coarse-cell-residual codes (VERDICT r5 item
    3), so the residual rows measure the distortion drop directly."""
    from catalyst_spark.queries.pipeline import _KMEANS_ITERS, _PQ_M

    last = _KMEANS_ITERS
    dists = []
    for label, np in (("raw", ""), ("residual", "r")):
        for m in range(_PQ_M):
            dists.append(
                f"{np}d_{m} AS (SELECT '{label}' AS space, {m} AS m,"
                f" CAST(floor((list_dot_product(v.e, v.e)"
                f"  - 2 * list_dot_product(v.e, c.ce)"
                f"  + list_dot_product(c.ce, c.ce)) * 1000000) AS BIGINT)"
                f"   AS micro"
                f" FROM {np}v{m} v JOIN {np}code{m} k USING (vec_id)"
                f" JOIN {np}c{last}_{m} c ON c.c_id = k.code),"
            )
    union = " UNION ALL ".join(
        f"SELECT * FROM {np}d_{m}"
        for np in ("", "r") for m in range(_PQ_M)
    )
    return (
        _kmeans_sql()
        + _residual_src_ctes(include_probes=False)
        + "\n"
        + _pq_ctes(with_header=False, dims_name="sdims",
                   make_luts=False)
        + "\n"
        + _pq_ctes(with_header=False, dims_name="sdims_r", src="rv",
                   np="r", make_luts=False)
        + "\n" + "\n".join(dists).rstrip(",")
        + f"""
        SELECT space,
               CAST(m AS BIGINT) AS m,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(SUM(micro) AS BIGINT) AS sum_d2_micro,
               CAST(CAST(SUM(micro) AS BIGINT) // COUNT(*) AS BIGINT)
                 AS mean_d2_micro
        FROM ({union}) u GROUP BY space, m ORDER BY space, m
    """
    )


def _sq8_code_ctes(with_header: bool = True) -> str:
    """SQ8 quantizer CTEs (oracle twin of pipeline._sq8_codes): exact
    per-dimension MIN/MAX (order-free aggregates — no eps argument
    needed anywhere in this rung) and the same (sub, *255, /range,
    floor, clamp) float sequence as the Spark encode expression, so
    codes agree bit-exactly; everything downstream is integers.
    with_header=False omits WITH/v/dims so the block appends after
    _kmeans_sql (whose v and 1..64 dims CTEs are reused verbatim)."""
    from catalyst_spark.queries.pipeline import _LSH_DIM

    header = f"""
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e
                   FROM embeddings),
        dims AS (SELECT unnest(range(1, {_LSH_DIM + 1})) AS d),""" \
        if with_header else ""
    return header + """
        mm AS (SELECT d, MIN(e[d]) AS mn, MAX(e[d]) AS mx
               FROM v, dims GROUP BY d),
        sq8codes AS (
          SELECT v.vec_id,
                 list(CASE WHEN mx = mn THEN 0
                      ELSE GREATEST(0, LEAST(255,
                           CAST(floor((e[d] - mn) * 255 / (mx - mn))
                                AS BIGINT)))
                      END ORDER BY d) AS c
          FROM v, mm GROUP BY v.vec_id),"""


def _sq8_ctes() -> str:
    from catalyst_spark.queries.pipeline import _LSH_DIM

    return _sq8_code_ctes() + f"""
        s AS (
          SELECT q.vec_id AS q_id, n.vec_id AS neighbor_id,
                 CAST(list_sum(list_transform(range(1, {_LSH_DIM + 1}),
                      d -> (q.c[d] - n.c[d]) * (q.c[d] - n.c[d])))
                      AS BIGINT) AS d2
          FROM sq8codes q JOIN sq8codes n ON q.vec_id != n.vec_id
          WHERE q.vec_id % 50 = 0),
        sqrank AS (
          SELECT q_id, neighbor_id, d2,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY d2, neighbor_id) AS rnk
          FROM s)"""


def _sq8_sql() -> str:
    return _sq8_ctes() + """
        SELECT q_id, rnk AS "rank", neighbor_id, d2 AS sq_d2
        FROM sqrank WHERE rnk <= 5 ORDER BY q_id, "rank"
    """


def _sq8_recall_sql() -> str:
    """Oracle twin of pipeline.ann_sq8_recall: SQ8 integer top-5 graded
    against the exact brute-force top-5."""
    return _sq8_ctes() + """,
        sq AS (SELECT q_id, neighbor_id AS n_id FROM sqrank WHERE rnk <= 5),
        nv AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        sb AS (
          SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
                 list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos_raw
          FROM nv q JOIN nv c ON q.vec_id != c.vec_id
          WHERE q.vec_id % 50 = 0),
        brute AS (
          SELECT q_id, neighbor_id FROM (
            SELECT q_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY cos_raw DESC, neighbor_id)
                     AS rnk
            FROM sb) t
          WHERE rnk <= 5)
        SELECT b.q_id,
               COUNT(sq.n_id) AS hits,
               ROUND(COUNT(sq.n_id) / 5.0, 2) AS recall_at_5
        FROM brute b
        LEFT JOIN sq ON sq.q_id = b.q_id AND sq.n_id = b.neighbor_id
        GROUP BY b.q_id ORDER BY b.q_id
    """


def _sq8_ivf_ctes() -> str:
    """Shared CTEs for the IVF+SQ8 oracles (oracle twin of
    pipeline.ann_sq8_ivf_topk): unrolled coarse k-means (v + dims
    reused by the SQ8 block) + bit-exact SQ8 codes + top-2 probes,
    top-1 members, in-cell candidates, integer rank."""
    from catalyst_spark.queries.pipeline import _KMEANS_ITERS, _LSH_DIM

    last_c = f"c{_KMEANS_ITERS}"
    return _kmeans_sql() + _sq8_code_ctes(with_header=False) + f"""
        dist AS (
          SELECT v.vec_id, c.c_id,
                 row_number() OVER (PARTITION BY v.vec_id ORDER BY
                   list_dot_product(v.e, v.e)
                   - 2 * list_dot_product(v.e, c.ce)
                   + list_dot_product(c.ce, c.ce), c.c_id) AS rn
          FROM v, {last_c} c),
        members AS (SELECT vec_id AS n_id, c_id FROM dist WHERE rn = 1),
        probes AS (
          SELECT vec_id AS q_id, c_id
          FROM dist WHERE rn <= 2 AND vec_id % 50 = 0),
        cand AS (
          SELECT DISTINCT p.q_id, m.n_id
          FROM probes p JOIN members m USING (c_id)
          WHERE m.n_id != p.q_id),
        sqirank AS (
          SELECT ca.q_id, ca.n_id,
                 CAST(list_sum(list_transform(range(1, {_LSH_DIM + 1}),
                      d -> (q.c[d] - n.c[d]) * (q.c[d] - n.c[d])))
                      AS BIGINT) AS d2,
                 ROW_NUMBER() OVER (PARTITION BY ca.q_id ORDER BY
                   CAST(list_sum(list_transform(range(1, {_LSH_DIM + 1}),
                        d -> (q.c[d] - n.c[d]) * (q.c[d] - n.c[d])))
                        AS BIGINT), ca.n_id) AS rnk
          FROM cand ca
          JOIN sq8codes q ON q.vec_id = ca.q_id
          JOIN sq8codes n ON n.vec_id = ca.n_id)"""


def _sq8_ivf_sql() -> str:
    return _sq8_ivf_ctes() + """
        SELECT q_id, rnk AS "rank", n_id AS neighbor_id, d2 AS sq_d2
        FROM sqirank WHERE rnk <= 5 ORDER BY q_id, "rank"
    """


def _sq8_ivf_recall_sql() -> str:
    """Oracle twin of pipeline.ann_sq8_ivf_recall: IVF+SQ8 top-5 graded
    against the exact brute-force top-5."""
    return _sq8_ivf_ctes() + """,
        sqi AS (SELECT q_id, n_id FROM sqirank WHERE rnk <= 5),
        nv AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        sb AS (
          SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
                 list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos_raw
          FROM nv q JOIN nv c ON q.vec_id != c.vec_id
          WHERE q.vec_id % 50 = 0),
        brute AS (
          SELECT q_id, neighbor_id FROM (
            SELECT q_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY cos_raw DESC, neighbor_id)
                     AS rnk
            FROM sb) t
          WHERE rnk <= 5)
        SELECT b.q_id,
               COUNT(sqi.n_id) AS hits,
               ROUND(COUNT(sqi.n_id) / 5.0, 2) AS recall_at_5
        FROM brute b
        LEFT JOIN sqi ON sqi.q_id = b.q_id AND sqi.n_id = b.neighbor_id
        GROUP BY b.q_id ORDER BY b.q_id
    """


def _ivf_cell_stats_sql() -> str:
    """Oracle twin of pipeline.ivf_cell_stats: unrolled coarse k-means
    + assignment, then exact per-cell counts and permille shares."""
    from catalyst_spark.queries.pipeline import _KMEANS_ITERS

    last_c = f"c{_KMEANS_ITERS}"
    return _kmeans_sql() + f"""
        dist AS (
          SELECT v.vec_id, c.c_id,
                 row_number() OVER (PARTITION BY v.vec_id ORDER BY
                   list_dot_product(v.e, v.e)
                   - 2 * list_dot_product(v.e, c.ce)
                   + list_dot_product(c.ce, c.ce), c.c_id) AS rn
          FROM v, {last_c} c),
        assign AS (SELECT vec_id, c_id FROM dist WHERE rn = 1)
        SELECT c_id, CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST((COUNT(*) * 1000) // (SELECT COUNT(*) FROM assign)
                    AS BIGINT) AS share_permille
        FROM assign GROUP BY c_id ORDER BY c_id
    """


def _semdedup_keep_one_sql() -> str:
    """Oracle twin of pipeline.semdedup_keep_one: the semdedup pair set
    (unrolled k-means + in-cell cosine pairs) fed through a recursive
    min-reachable-id CC, survivors = corpus minus cluster losers."""
    from catalyst_spark.queries.pipeline import _KMEANS_ITERS

    last_c = f"c{_KMEANS_ITERS}"
    body = _kmeans_sql()
    assert body.startswith("WITH ")
    body = "WITH RECURSIVE " + body[len("WITH "):]
    return body + f"""
        dist AS (
          SELECT v.vec_id, c.c_id,
                 row_number() OVER (PARTITION BY v.vec_id ORDER BY
                   list_dot_product(v.e, v.e)
                   - 2 * list_dot_product(v.e, c.ce)
                   + list_dot_product(c.ce, c.ce), c.c_id) AS rn
          FROM v, {last_c} c),
        assign AS (SELECT vec_id, c_id FROM dist WHERE rn = 1),
        nv AS (
          SELECT v.vec_id, v.e, sqrt(list_dot_product(v.e, v.e)) AS nrm,
                 a.c_id
          FROM v JOIN assign a USING (vec_id)),
        sp AS (
          SELECT a.vec_id AS a_id, b.vec_id AS b_id
          FROM nv a JOIN nv b ON a.c_id = b.c_id AND a.vec_id < b.vec_id
          WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.4),
        edges AS (
          SELECT a_id AS u, b_id AS v FROM sp
          UNION
          SELECT b_id AS u, a_id AS v FROM sp),
        reach(u, r) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM edges)
          UNION
          SELECT e.u, re.r FROM edges e JOIN reach re ON e.v = re.u),
        lab AS (SELECT u AS vec_id, MIN(r) AS label FROM reach GROUP BY u)
        SELECT v.vec_id FROM v
        WHERE v.vec_id NOT IN
          (SELECT vec_id FROM lab WHERE vec_id != label)
        ORDER BY v.vec_id
    """


def _semdedup_sql() -> str:
    """Unrolled k-means + assignment + in-cell pair scan — the oracle
    twin of pipeline.semdedup_ivf."""
    from catalyst_spark.queries.pipeline import _KMEANS_ITERS

    last_c = f"c{_KMEANS_ITERS}"
    return _kmeans_sql() + f"""
        dist AS (
          SELECT v.vec_id, c.c_id,
                 row_number() OVER (PARTITION BY v.vec_id ORDER BY
                   list_dot_product(v.e, v.e)
                   - 2 * list_dot_product(v.e, c.ce)
                   + list_dot_product(c.ce, c.ce), c.c_id) AS rn
          FROM v, {last_c} c),
        assign AS (SELECT vec_id, c_id FROM dist WHERE rn = 1),
        nv AS (
          SELECT v.vec_id, v.e, sqrt(list_dot_product(v.e, v.e)) AS nrm,
                 a.c_id
          FROM v JOIN assign a USING (vec_id))
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 2) AS cos
        FROM nv a JOIN nv b ON a.c_id = b.c_id AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.4
        ORDER BY a_id, b_id
    """


_HASH_ORACLES = {
    "ivf_train": _kmeans_final_select(),
    "ann_ivf_trained_topk": _ivf_trained_sql(),
    # ann_multiprobe_recall: absorbed into ann_nprobe_sweep (r12) —
    # _multiprobe_sql() is embedded verbatim in the merged oracle.
    "ann_pq_adc_topk": _pq_sql(),
    "ann_pq_recall": _pq_recall_sql(),
    "ann_ivfpq_topk": _ivfpq_sql(),
    "ann_ivfpq_recall": _ivfpq_recall_sql(),
    "ann_ivfpq_residual_topk": _rivfpq_sql(),
    "ann_ivfpq_residual_recall": _rivfpq_recall_sql(),
    "ann_sq8_topk": _sq8_sql(),
    "ann_sq8_recall": _sq8_recall_sql(),
    "ann_sq8_ivf_topk": _sq8_ivf_sql(),
    "ann_sq8_ivf_recall": _sq8_ivf_recall_sql(),
    "ivf_cell_stats": _ivf_cell_stats_sql(),
    "semdedup_keep_one": _semdedup_keep_one_sql(),
    # exact-integer LM surprisal: bitlen(x) = length of the binary
    # repr — Spark's length(bin(x)), DuckDB's length(printf('%b', x))
    "unigram_surprisal": """
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents),
        cnt AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
        tot AS (SELECT COUNT(*) AS n FROM toks)
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(length(printf('%b', tot.n))
                        - length(printf('%b', c.c))) AS BIGINT)
                 AS total_bits,
               CAST((CAST(SUM(length(printf('%b', tot.n))
                        - length(printf('%b', c.c))) AS BIGINT) * 1000)
                    // COUNT(*) AS BIGINT) AS mbits_per_token
        FROM toks t JOIN cnt c USING (w), tot
        GROUP BY t.doc_id ORDER BY t.doc_id
    """,
    "bigram_surprisal": """
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS a
                   FROM documents),
        bgi AS (SELECT doc_id, a, unnest(range(1, len(a))) AS i FROM t),
        bg AS (SELECT doc_id, a[i] AS w1, a[i] || ' ' || a[i + 1] AS b
               FROM bgi),
        c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
        cb AS (SELECT b, COUNT(*) AS cb FROM bg GROUP BY b)
        SELECT g.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(length(printf('%b', c1.c1))
                        - length(printf('%b', cb.cb))) AS BIGINT)
                 AS total_bits,
               CAST((CAST(SUM(length(printf('%b', c1.c1))
                        - length(printf('%b', cb.cb))) AS BIGINT) * 1000)
                    // COUNT(*) AS BIGINT) AS mbits_per_bigram
        FROM bg g JOIN cb USING (b) JOIN c1 USING (w1)
        GROUP BY g.doc_id ORDER BY g.doc_id
    """,
    "pq_distortion": _pq_distortion_sql(),
    "semdedup_ivf": _semdedup_sql(),
    "text_simhash": _SIMHASH_SQL + " ORDER BY doc_id",
    "dedup_simhash_pairs": f"""
        WITH votes AS ({_SIMHASH_VOTES}),
        sims AS (SELECT doc_id, {_SIMHASH_ASSEMBLE} AS simhash FROM votes),
        bands AS (
          SELECT doc_id, simhash, b, (simhash >> (15 * b)) & 32767 AS val
          FROM sims, (SELECT unnest(range(0, 4)) AS b))
        SELECT DISTINCT l.doc_id AS a_id, r.doc_id AS b_id,
               CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
        FROM bands l JOIN bands r
          ON l.b = r.b AND l.val = r.val AND l.doc_id < r.doc_id
        WHERE bit_count(xor(l.simhash, r.simhash)) <= 3
        ORDER BY a_id, b_id
    """,
    "dedup_minhash_pairs": f"""
        WITH {_MINHASH_SIG},
        bands AS (
          SELECT doc_id, unnest([{_MINHASH_BUCKETS}]) AS bucket FROM sig),
        cand AS (
          SELECT DISTINCT l.doc_id AS a_id, r.doc_id AS b_id
          FROM bands l JOIN bands r
            ON l.bucket = r.bucket AND l.doc_id < r.doc_id)
        SELECT c.a_id, c.b_id,
               ROUND(len(list_intersect(a.hset, b.hset))
                     / len(list_distinct(list_concat(a.hset, b.hset))), 4)
                 AS jaccard
        FROM cand c
        JOIN sig a ON a.doc_id = c.a_id
        JOIN sig b ON b.doc_id = c.b_id
        ORDER BY a_id, b_id
    """,
    "minhash_jaccard_estimate": f"""
        WITH {_MINHASH_SIG},
        bands AS (
          SELECT doc_id, unnest([{_MINHASH_BUCKETS}]) AS bucket FROM sig),
        cand AS (
          SELECT DISTINCT l.doc_id AS a_id, r.doc_id AS b_id
          FROM bands l JOIN bands r
            ON l.bucket = r.bucket AND l.doc_id < r.doc_id)
        SELECT c.a_id, c.b_id,
               ROUND(({" + ".join(
                   f"CASE WHEN a.m{s} = b.m{s} THEN 1 ELSE 0 END"
                   for s in range(_MINHASH_PERMS))})
                 / {_MINHASH_PERMS}.0, 4) AS est_jaccard,
               ROUND(len(list_intersect(a.hset, b.hset))
                     / len(list_distinct(list_concat(a.hset, b.hset))), 4)
                 AS jaccard
        FROM cand c
        JOIN sig a ON a.doc_id = c.a_id
        JOIN sig b ON b.doc_id = c.b_id
        ORDER BY a_id, b_id
    """,
    # merged per-source signatures (min-of-mins) vs exact source Jaccard
    "source_minhash_similarity": f"""
        WITH {_MINHASH_SIG},
        src AS (SELECT doc_id, source FROM documents),
        ssig AS (
          SELECT src.source, {", ".join(
              f"MIN(m{s}) AS m{s}" for s in range(_MINHASH_PERMS))}
          FROM sig JOIN src ON sig.doc_id = src.doc_id
          GROUP BY src.source),
        sset AS (
          SELECT DISTINCT src.source, u.h
          FROM (SELECT doc_id, unnest(hset) AS h FROM sig) u
          JOIN src ON u.doc_id = src.doc_id),
        scount AS (SELECT source, COUNT(*) AS n FROM sset GROUP BY source),
        inter AS (
          SELECT x.source AS source_a, y.source AS source_b, COUNT(*) AS i
          FROM sset x JOIN sset y
            ON x.h = y.h AND x.source < y.source
          GROUP BY x.source, y.source)
        SELECT a.source AS source_a, b.source AS source_b,
               ROUND(({" + ".join(
                   f"CASE WHEN a.m{s} = b.m{s} THEN 1 ELSE 0 END"
                   for s in range(_MINHASH_PERMS))})
                 / {_MINHASH_PERMS}.0, 4) AS est_jaccard,
               ROUND(COALESCE(i.i, 0) * 1.0
                     / (ca.n + cb.n - COALESCE(i.i, 0)), 4) AS jaccard
        FROM ssig a
        JOIN ssig b ON a.source < b.source
        LEFT JOIN inter i ON i.source_a = a.source AND i.source_b = b.source
        JOIN scount ca ON ca.source = a.source
        JOIN scount cb ON cb.source = b.source
        ORDER BY source_a, source_b
    """,
    "dedup_embedding_lsh": f"""
        WITH v AS (
          SELECT vec_id, embedding::DOUBLE[] AS e,
                 sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
          FROM embeddings),
        {_SRP_PLANES},
        dots AS (
          SELECT vec_id, t, k, list_dot_product(e, signs) AS dot
          FROM v CROSS JOIN planes),
        buckets AS (
          SELECT vec_id, t,
                 SUM(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << k)
                     ELSE CAST(0 AS BIGINT) END) AS bucket
          FROM dots GROUP BY vec_id, t),
        cand AS (
          SELECT DISTINCT l.vec_id AS a_id, r.vec_id AS b_id
          FROM buckets l JOIN buckets r
            ON l.t = r.t AND l.bucket = r.bucket AND l.vec_id < r.vec_id)
        SELECT c.a_id, c.b_id,
               ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 2) AS cos
        FROM cand c
        JOIN v a ON a.vec_id = c.a_id
        JOIN v b ON b.vec_id = c.b_id
        WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.4
        ORDER BY a_id, b_id
    """,
}

# ---------------------------------------------------------------------------
# TSDB operators (DuckDB mirrors of queries/tsdb.py)
# ---------------------------------------------------------------------------

_TSDB = {
    "interval_coverage": """
        WITH iv AS (
          SELECT user_id, event_id, epoch_us(ts) AS s,
                 epoch_us(ts) + 30000000 AS e
          FROM events),
        marked AS (
          SELECT user_id, event_id, s, e,
                 CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END
                   AS new_island
          FROM (
            SELECT user_id, event_id, s, e,
                   MAX(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS pm
            FROM iv) t),
        numbered AS (
          SELECT user_id, s, e,
                 SUM(new_island) OVER (PARTITION BY user_id
                                       ORDER BY s, e, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS island
          FROM marked),
        islands AS (
          SELECT user_id, island, COUNT(*) AS n_ev,
                 MAX(e) - MIN(s) AS len_us
          FROM numbered GROUP BY 1, 2)
        SELECT user_id, CAST(SUM(n_ev) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(SUM(len_us) AS BIGINT) AS covered_us
        FROM islands GROUP BY user_id ORDER BY user_id
    """,
    # two-window SLO burn: integer permille, // == Spark div (pinned)
    "burn_rate_windows": """
        WITH hourly AS (
          SELECT epoch_us(ts) // 3600000000 AS hb,
                 CAST(COUNT(*) AS BIGINT) AS tot,
                 CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                      AS BIGINT) AS err
          FROM events GROUP BY 1),
        winl AS (
          SELECT hb, tot, err,
                 CAST(SUM(tot) OVER (ORDER BY hb ROWS BETWEEN 5 PRECEDING
                                     AND CURRENT ROW) AS BIGINT) AS tot_l,
                 CAST(SUM(err) OVER (ORDER BY hb ROWS BETWEEN 5 PRECEDING
                                     AND CURRENT ROW) AS BIGINT) AS err_l
          FROM hourly)
        SELECT hb, tot AS tot_short, err AS err_short, tot_l, err_l,
               CAST((err * tot_l * 1000) // (tot * err_l) AS BIGINT)
                 AS burn_permille
        FROM winl WHERE err_l > 0 AND tot > 0 ORDER BY hb
    """,
    "asof_nearest_join": """
        WITH base AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS tu, value
          FROM events),
        marked AS (
          SELECT *,
            last_value(CASE WHEN event_type = 'click' THEN tu END
                       IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY tu, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
            last_value(CASE WHEN event_type = 'click' THEN value END
                       IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY tu, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
            first_value(CASE WHEN event_type = 'click' THEN tu END
                        IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY tu, event_id
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt,
            first_value(CASE WHEN event_type = 'click' THEN value END
                        IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY tu, event_id
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
          FROM base)
        SELECT event_id, user_id,
               ROUND(value, 2) AS purchase_value,
               ROUND(CASE WHEN nt IS NULL OR (pt IS NOT NULL
                               AND (tu - pt) <= (nt - tu))
                          THEN pv ELSE nv END, 2) AS nearest_click_value,
               CAST(CASE WHEN nt IS NULL OR (pt IS NOT NULL
                              AND (tu - pt) <= (nt - tu))
                         THEN pt - tu ELSE nt - tu END AS BIGINT)
                 AS delta_us
        FROM marked
        WHERE event_type = 'purchase'
          AND (pt IS NOT NULL OR nt IS NOT NULL)
        ORDER BY event_id
    """,
    "asof_prior_click": """
        SELECT event_id, user_id, ROUND(value, 2) AS purchase_value,
               ROUND(prior_click, 2) AS prior_click_value
        FROM (
          SELECT event_id, user_id, event_type, value,
                 last_value(CASE WHEN event_type = 'click' THEN value END
                            IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prior_click
          FROM events) t
        WHERE event_type = 'purchase' ORDER BY event_id
    """,
    "sessionize": """
        SELECT user_id, session_id, COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS sv
        FROM (
          SELECT user_id, value,
                 CAST(1 + SUM(gap_flag)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS session_id
          FROM (
            SELECT user_id, value, ts, event_id,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        > 1800000000 THEN 1 ELSE 0 END AS gap_flag
            FROM events) g) t
        GROUP BY user_id, session_id ORDER BY user_id, session_id
    """,
    # unordered event-type pairs co-occurring within a session
    "session_cooccurrence": """
        WITH baskets AS (
          SELECT DISTINCT user_id, session_id, event_type FROM (
            SELECT user_id, event_type,
                   CAST(1 + SUM(gap_flag)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS session_id
            FROM (
              SELECT user_id, event_type, ts, event_id,
                     CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                          OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          > 1800000000 THEN 1 ELSE 0 END AS gap_flag
              FROM events) g) t)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS n_sessions
        FROM baskets a
        JOIN baskets b ON a.user_id = b.user_id
                      AND a.session_id = b.session_id
                      AND a.event_type <= b.event_type
        GROUP BY type_a, type_b ORDER BY type_a, type_b
    """,
    "ts_rate": """
        -- r11 rounding audit: exact cent deltas, ONE int/int divide
        SELECT event_id, user_id,
               ROUND(CAST(dc * 10000 AS DOUBLE) / dt_us, 4) + 0.0 AS rate
        FROM (
          SELECT event_id, user_id,
                 c - lag(c) OVER w AS dc,
                 epoch_us(ts) - lag(epoch_us(ts)) OVER w AS dt_us
          FROM (SELECT *, CAST(round(value * 100) AS BIGINT) AS c
                FROM events) e
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
        WHERE dc IS NOT NULL ORDER BY event_id
    """,
    "time_weighted_avg": """
        -- r11 rounding audit: exact cent-µs integer sums, ONE divide
        SELECT user_id,
               ROUND(CAST(SUM(CAST(c AS HUGEINT) * dt_us) AS DOUBLE)
                     / (CAST(SUM(CAST(dt_us AS HUGEINT)) AS DOUBLE)
                        * 100.0), 4) AS twa,
               COUNT(*) AS n_intervals
        FROM (
          SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c,
                 lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                   - epoch_us(ts) AS dt_us
          FROM events) t
        WHERE dt_us IS NOT NULL
        GROUP BY user_id ORDER BY user_id
    """,
    "anomaly_zscore": """
        -- r11 rounding audit: exact integer moments; z is one exact
        -- numerator, one int/int divide, one sqrt, one divide — the
        -- identical deterministic IEEE chain as the Spark side
        SELECT event_id, user_id, ROUND(value, 2) AS value,
               ROUND(CAST(n * c - s AS DOUBLE)
                     / sqrt(CAST(n * (n * ss - s * s) AS DOUBLE)
                            / (n - 1)), 4) AS z
        FROM (
          SELECT event_id, user_id, value, CAST(c AS HUGEINT) AS c,
                 COUNT(*) OVER w AS n,
                 SUM(CAST(c AS HUGEINT)) OVER w AS s,
                 SUM(CAST(c AS HUGEINT) * c) OVER w AS ss
          FROM (SELECT *, CAST(round(value * 100) AS BIGINT) AS c
                FROM events) e
          WINDOW w AS (PARTITION BY user_id)) t
        WHERE abs(CAST(n * c - s AS DOUBLE)
                  / sqrt(CAST(n * (n * ss - s * s) AS DOUBLE)
                         / (n - 1))) > 2
        ORDER BY event_id
    """,
    "series_correlation": """
        -- r11 rounding audit: Pearson from exact integer moments —
        -- the identical deterministic IEEE chain as the Spark side
        WITH hourly AS (
          SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS h,
                 event_type,
                 SUM(CAST(round(value * 100) AS BIGINT)) AS sc
          FROM events GROUP BY 1, 2),
        m AS (
          SELECT a.event_type AS ta, b.event_type AS tb,
                 COUNT(*) AS n,
                 SUM(CAST(a.sc AS HUGEINT)) AS sx,
                 SUM(CAST(b.sc AS HUGEINT)) AS sy,
                 SUM(CAST(a.sc AS HUGEINT) * b.sc) AS sxy,
                 SUM(CAST(a.sc AS HUGEINT) * a.sc) AS sxx,
                 SUM(CAST(b.sc AS HUGEINT) * b.sc) AS syy
          FROM hourly a JOIN hourly b
            ON a.h = b.h AND a.event_type < b.event_type
          GROUP BY 1, 2)
        SELECT ta, tb,
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE))),
                     4) AS pearson,
               n AS n_buckets
        FROM m ORDER BY ta, tb
    """,
    "rolling_window_7d": """
        SELECT event_id, user_id,
               CAST(SUM(vc) OVER w AS BIGINT) AS sum_7d_cents,
               COUNT(*) OVER w AS n_7d
        FROM (SELECT event_id, user_id, epoch(ts) AS es,
                     CAST(round(value * 100) AS BIGINT) AS vc
              FROM events) t
        WINDOW w AS (PARTITION BY user_id ORDER BY es
                     RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """,
    "counter_rate": """
        -- r11 rounding audit: exact integer cent increases; each
        -- checked double is ONE divide of exact integers
        WITH s AS (
          SELECT user_id, epoch_us(ts) AS us, c,
                 lag(c) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev
          FROM (SELECT *, CAST(round(value * 100) AS BIGINT) AS c
                FROM events) e)
        SELECT user_id,
               ROUND(CAST(SUM(CASE WHEN c >= prev THEN c - prev
                                   WHEN prev IS NOT NULL THEN c END)
                          AS BIGINT) / 100.0, 2) AS total_inc,
               CAST(SUM(CASE WHEN c < prev THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_resets,
               ROUND(CAST(CAST(SUM(CASE WHEN c >= prev THEN c - prev
                                        WHEN prev IS NOT NULL THEN c END)
                               AS BIGINT) * 10000 AS DOUBLE)
                     / (MAX(us) - MIN(us)), 4) + 0.0 AS per_sec,
               COUNT(*) AS n_points
        FROM s GROUP BY user_id HAVING COUNT(*) >= 2 ORDER BY user_id
    """,
    "funnel_conversion": """
        WITH t1 AS (
          SELECT user_id, MIN(ts) AS ts_k FROM events
          WHERE event_type = 'signup' GROUP BY 1),
        t2 AS (
          SELECT e.user_id, MIN(e.ts) AS ts_k FROM events e
          JOIN t1 ON e.user_id = t1.user_id
          WHERE e.event_type = 'view' AND e.ts > t1.ts_k GROUP BY 1),
        t3 AS (
          SELECT e.user_id, MIN(e.ts) AS ts_k FROM events e
          JOIN t2 ON e.user_id = t2.user_id
          WHERE e.event_type = 'click' AND e.ts > t2.ts_k GROUP BY 1),
        t4 AS (
          SELECT e.user_id, MIN(e.ts) AS ts_k FROM events e
          JOIN t3 ON e.user_id = t3.user_id
          WHERE e.event_type = 'purchase' AND e.ts > t3.ts_k GROUP BY 1)
        SELECT 1 AS stage_idx, 'signup' AS stage, COUNT(*) AS n_users FROM t1
        UNION ALL
        SELECT 2, 'view', COUNT(*) FROM t2
        UNION ALL
        SELECT 3, 'click', COUNT(*) FROM t3
        UNION ALL
        SELECT 4, 'purchase', COUNT(*) FROM t4
        ORDER BY stage_idx
    """,
    "retention_cohorts": """
        WITH days AS (
          SELECT DISTINCT user_id, date_trunc('day', ts)::DATE AS day
          FROM events),
        first AS (
          SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY 1)
        SELECT f.cohort_day,
               date_diff('day', f.cohort_day, d.day) AS day_offset,
               COUNT(DISTINCT d.user_id) AS n_users
        FROM days d JOIN first f ON d.user_id = f.user_id
        GROUP BY 1, 2 ORDER BY cohort_day, day_offset
    """,
    # r12 merge: one sketch-keyed table — the KMV constituent SQL and
    # the former hll_distinct_sketch SQL embedded verbatim, reshaped
    # only by the wrapper; -1 sentinels (never NULL) fill the columns
    # the other sketch doesn't check.
    "distinct_sketch": f"""
        SELECT 'kmv' AS sketch, event_type, exact_distinct,
               est_distinct, rel_err,
               CAST(-1 AS BIGINT) AS ok_within_bound
        FROM (
        WITH hashes AS (
          SELECT DISTINCT event_type,
                 {_h60_duck('CAST(user_id AS VARCHAR)')} AS h
          FROM events),
        exact AS (
          SELECT event_type, COUNT(*) AS exact_distinct
          FROM hashes GROUP BY 1),
        kth AS (
          SELECT event_type, h AS hk FROM (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY h) AS rn
            FROM hashes) t
          WHERE rn = {_KMV_K})
        SELECT e.event_type, e.exact_distinct,
               CASE WHEN k.hk IS NOT NULL
                    THEN CAST(floor({_KMV_K - 1} * {_KMV_SPACE!r} / k.hk)
                              AS BIGINT)
                    ELSE e.exact_distinct END AS est_distinct,
               ROUND(abs(CASE WHEN k.hk IS NOT NULL
                              THEN floor({_KMV_K - 1} * {_KMV_SPACE!r} / k.hk)
                              ELSE e.exact_distinct END
                         - e.exact_distinct) / e.exact_distinct, 4) AS rel_err
        FROM exact e LEFT JOIN kth k ON e.event_type = k.event_type
        ) kmv
        UNION ALL
        SELECT 'hll' AS sketch, event_type, exact_distinct,
               CAST(-1 AS BIGINT) AS est_distinct,
               CAST(-1.0 AS DOUBLE) AS rel_err,
               ok_3sigma AS ok_within_bound
        FROM (
        SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct,
               CAST(1 AS BIGINT) AS ok_3sigma
        FROM events GROUP BY event_type
        ) hll
        ORDER BY sketch, event_type
    """,
    # KMV sketch algebra (r13): pairwise union/intersection estimates
    # from the per-type k-min arrays only (merged-k union estimator +
    # the Beyer et al. resemblance numerator rho), exact cardinalities
    # alongside. All integers / floors of 6-significant-bit doubles —
    # every column value-checked. Constants mirror tsdb._KMV_*.
    "kmv_set_ops": f"""
        WITH h AS (
          SELECT DISTINCT event_type,
                 {_h60_duck('CAST(user_id AS VARCHAR)')} AS h
          FROM events),
        r AS (
          SELECT event_type, h,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY h) AS rn
          FROM h),
        k AS (
          SELECT event_type, list_sort(list(h)) AS ks
          FROM r WHERE rn <= {_KMV_K} GROUP BY event_type),
        sz AS (SELECT event_type, COUNT(*) AS n FROM h GROUP BY 1),
        p AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b,
                 a.ks AS ka, b.ks AS kb,
                 list_sort(list_distinct(list_concat(a.ks, b.ks)))
                   [1:{_KMV_K}] AS mk
          FROM k a JOIN k b ON a.event_type < b.event_type),
        s AS (
          SELECT type_a, type_b,
                 len(mk) = {_KMV_K} AS full_k,
                 mk[len(mk)] AS hk,
                 len(list_filter(mk, x -> list_contains(ka, x)
                                  AND list_contains(kb, x))) AS rho
          FROM p),
        ex AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b,
                 COUNT(*) AS exact_inter
          FROM h a JOIN h b
            ON a.h = b.h AND a.event_type < b.event_type
          GROUP BY 1, 2),
        j AS (
          SELECT s.type_a, s.type_b, s.full_k, s.hk, s.rho,
                 COALESCE(ex.exact_inter, 0) AS exact_inter,
                 sa.n AS na, sb.n AS nb
          FROM s
          LEFT JOIN ex ON s.type_a = ex.type_a AND s.type_b = ex.type_b
          JOIN sz sa ON sa.event_type = s.type_a
          JOIN sz sb ON sb.event_type = s.type_b),
        f AS (
          SELECT *,
                 CAST(CASE WHEN full_k
                           THEN floor({_KMV_K - 1} * {_KMV_SPACE!r}
                                      / CAST(hk AS DOUBLE))
                           ELSE na + nb - exact_inter END
                      AS BIGINT) AS est_union
          FROM j)
        SELECT type_a, type_b,
               CAST(na + nb - exact_inter AS BIGINT) AS exact_union,
               CAST(exact_inter AS BIGINT) AS exact_inter,
               est_union,
               CAST(rho AS BIGINT) AS rho,
               CAST(rho * 1000 // {_KMV_K} AS BIGINT)
                 AS jaccard_est_permille,
               CAST(est_union * rho // {_KMV_K} AS BIGINT) AS est_inter
        FROM f ORDER BY type_a, type_b
    """,
    "ohlc_downsample": """
        WITH flagged AS (
          SELECT event_type, value,
                 CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS bucket_s,
                 ROW_NUMBER() OVER (
                   PARTITION BY CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT),
                                event_type
                   ORDER BY ts, event_id) AS rn_a,
                 ROW_NUMBER() OVER (
                   PARTITION BY CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT),
                                event_type
                   ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM events)
        SELECT bucket_s, event_type,
               ROUND(MAX(CASE WHEN rn_a = 1 THEN value END), 2) AS open,
               ROUND(MAX(value), 2) AS high,
               ROUND(MIN(value), 2) AS low,
               ROUND(MAX(CASE WHEN rn_d = 1 THEN value END), 2) AS close,
               COUNT(*) AS n
        FROM flagged GROUP BY bucket_s, event_type
        ORDER BY bucket_s, event_type
    """,
    "gap_fill": """
        WITH hourly AS (
          SELECT user_id,
                 CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket_s,
                 ROUND(SUM(value), 2) AS sv
          FROM events GROUP BY 1, 2),
        spans AS (
          SELECT user_id, MIN(bucket_s) AS lo, MAX(bucket_s) AS hi
          FROM hourly GROUP BY user_id),
        grid AS (
          SELECT user_id, unnest(range(lo, hi + 3600, 3600)) AS bucket_s
          FROM spans)
        SELECT g.user_id, g.bucket_s,
               last_value(h.sv IGNORE NULLS) OVER (
                 PARTITION BY g.user_id ORDER BY g.bucket_s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
               h.sv IS NULL AS is_gap
        FROM grid g LEFT JOIN hourly h
          ON g.user_id = h.user_id AND g.bucket_s = h.bucket_s
        ORDER BY g.user_id, g.bucket_s
    """,
    "range_join_events": """
        SELECT e.event_id AS err_id, COUNT(*) AS n_nearby
        FROM events e JOIN events p
          ON e.user_id = p.user_id
         AND p.event_type != 'error'
         AND epoch_us(p.ts) >= epoch_us(e.ts) - 1800000000
         AND epoch_us(p.ts) <= epoch_us(e.ts) + 1800000000
        WHERE e.event_type = 'error'
        GROUP BY e.event_id ORDER BY err_id
    """,
    "ts_downsample": """
        SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS bucket_s,
               event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sv,
               ROUND(MAX(value), 2) AS mx
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "pivot_event_counts": """
        SELECT user_id,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click_cnt,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view_cnt,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_cnt,
               COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup_cnt,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error_cnt
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "rollup_doc_counts": """
        SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source,
               COUNT(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS chars
        FROM documents GROUP BY ROLLUP(lang, source)
        ORDER BY lang, source
    """,
    "json_props_stats": """
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(k) AS BIGINT) AS k_sum,
               MIN(k) AS k_min, MAX(k) AS k_max
        FROM (
          SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events) t
        GROUP BY event_type ORDER BY event_type
    """,
    "value_percentiles": """
        -- r11 rounding audit: exact rank arithmetic over integer
        -- cents (pos = (n-1)*k, trunc-div/mod 100), ONE divide
        WITH ranked AS (
          SELECT event_type, c,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY c) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM (SELECT event_type,
                       CAST(round(value * 100) AS BIGINT) AS c
                FROM events) e),
        picks AS (
          SELECT event_type, k, rem,
                 MIN(CASE WHEN rn = lo_rank THEN c END) AS c_lo,
                 MAX(c) AS c_hi
          FROM (SELECT r.*, k,
                       ((n - 1) * k) // 100 + 1 AS lo_rank,
                       ((n - 1) * k) % 100 AS rem
                FROM ranked r,
                     (SELECT unnest([50, 95, 99]) AS k) ks) t
          WHERE rn = lo_rank OR rn = least(lo_rank + 1, n)
          GROUP BY event_type, k, rem)
        SELECT event_type,
               MIN(CASE WHEN k = 50 THEN p END) AS p50,
               MIN(CASE WHEN k = 95 THEN p END) AS p95,
               MIN(CASE WHEN k = 99 THEN p END) AS p99
        FROM (SELECT event_type, k,
                     ROUND(CAST(c_lo * (100 - rem) + c_hi * rem
                                AS DOUBLE) / 10000.0, 4) AS p
              FROM picks) f
        GROUP BY event_type ORDER BY event_type
    """,
    # lag/lead feature matrix in exact cents, one window partitioning
    "lag_features": """
        SELECT event_id, user_id, cents,
               lag(cents, 1) OVER w AS lag1_cents,
               lag(cents, 2) OVER w AS lag2_cents,
               lead(cents, 1) OVER w AS lead1_cents,
               epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us
        FROM (SELECT event_id, user_id, ts,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events) c
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id
    """,
    # growth curve: first-seen day per user, then a running sum
    "user_growth_curve": """
        WITH fs AS (
          SELECT user_id, MIN(CAST(ts AS DATE)) AS day
          FROM events GROUP BY user_id),
        pd AS (SELECT day, COUNT(*) AS new_users FROM fs GROUP BY day)
        SELECT day, new_users,
               CAST(SUM(new_users) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_users
        FROM pd ORDER BY day
    """,
    # equi-depth (quantile) bins; deterministic ntile tie-break
    "equi_depth_bins": """
        SELECT event_type, bin, COUNT(*) AS n,
               MIN(cents) AS lo_cents, MAX(cents) AS hi_cents
        FROM (
          SELECT event_type, cents,
                 CAST(ntile(10) OVER (PARTITION BY event_type
                                      ORDER BY cents, event_id)
                      AS BIGINT) AS bin
          FROM (SELECT event_type, event_id,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events) c) t
        GROUP BY event_type, bin ORDER BY event_type, bin
    """,
    # from-scratch daily rollup — the merged-partials identity target
    "incremental_rollup_merge": """
        SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n,
               ROUND(SUM(CAST(round(value * 100) AS BIGINT))
                     / CAST(100 AS DOUBLE), 2) AS total_value,
               ROUND(MIN(CAST(round(value * 100) AS BIGINT))
                     / CAST(100 AS DOUBLE), 2) AS min_value,
               ROUND(MAX(CAST(round(value * 100) AS BIGINT))
                     / CAST(100 AS DOUBLE), 2) AS max_value
        FROM events GROUP BY day, event_type ORDER BY day, event_type
    """,
    # median/MAD outliers: 2x-scaled integer medians keep the flag an
    # exact integer comparison in both engines
    "robust_outliers": """
        WITH c AS (
          SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
          FROM events),
        m AS (
          SELECT event_type, cents,
                 CAST(2 * quantile_cont(cents, 0.5)
                        OVER (PARTITION BY event_type) AS BIGINT) AS med2
          FROM c),
        d AS (
          SELECT event_type, cents, med2,
                 abs(2 * cents - med2) AS dev2
          FROM m),
        mm AS (
          SELECT event_type, cents, med2, dev2,
                 CAST(2 * quantile_cont(dev2, 0.5)
                        OVER (PARTITION BY event_type) AS BIGINT) AS mad4
          FROM d)
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CASE WHEN 2 * dev2 > 3 * mad4 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers,
               ROUND(MAX(med2) / CAST(200 AS DOUBLE), 2) AS med,
               ROUND(MAX(mad4) / CAST(400 AS DOUBLE), 4) AS mad
        FROM mm GROUP BY event_type ORDER BY event_type
    """,
    # alpha=1/2 EWMA: power-of-two weights keep the weighted sum in
    # exact integer math; the only float op is the final division
    "ewma_smooth": """
        WITH e AS (
          SELECT event_id, user_id, ts,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events),
        w AS (
          SELECT event_id, user_id,
                 list(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
                   AS l
          FROM e)
        SELECT event_id, user_id,
               ROUND(CAST(list_sum(list_transform(l,
                       (x, i) -> x * (CAST(1 AS BIGINT) << (i - 1))))
                     AS BIGINT)
                     / CAST(((CAST(1 AS BIGINT) << len(l)) - 1) * 100
                            AS DOUBLE), 4) AS ewma
        FROM w ORDER BY event_id
    """,
    # exact distinct is oracle-reproduced; the HLL estimate is
    # engine-private, so the oracle asserts the 3-sigma claim (ok=1)
    # hll_distinct_sketch: absorbed into distinct_sketch's sketch='hll'
    # rows (r12 merge) — its SQL is embedded verbatim there.
    # the oracle asserts the sketch's rank-error guarantee holds (ok=1);
    # a drifting approx_percentile makes the Spark side emit 0 and fail
    "percentile_sketch": """
        SELECT event_type, COUNT(*) AS n_events,
               CAST(1 AS BIGINT) AS ok50, CAST(1 AS BIGINT) AS ok90
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "top3_per_group": """
        SELECT event_type, rnk, event_id, ROUND(value, 2) AS value FROM (
          SELECT event_type, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY value DESC, event_id) AS rnk
          FROM events) t
        WHERE rnk <= 3 ORDER BY event_type, rnk
    """,
    "cube_event_counts": """
        SELECT COALESCE(event_type, 'ALL') AS event_type,
               COALESCE(CAST(user_bucket AS VARCHAR), 'ALL') AS user_bucket,
               COUNT(*) AS n
        FROM (SELECT event_type, user_id % 10 AS user_bucket FROM events) t
        GROUP BY CUBE(event_type, user_bucket)
        ORDER BY event_type, user_bucket
    """,
    "value_histogram": """
        SELECT event_type, CAST(floor(value / 50) AS BIGINT) AS bucket,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    # promql bucketQuantile: first bucket with cum >= q*total, linear
    # interpolation inside it, +Inf clamps to the top finite bound.
    # Arithmetic written identically to the Spark builder.
    "histogram_quantile": f"""
        WITH b AS (
          SELECT event_type,
                 CASE {" ".join(f"WHEN value <= {le} THEN CAST({lo} AS DOUBLE)" for lo, le in zip((0.0,) + _HQ_BOUNDS[:-1], _HQ_BOUNDS))}
                      ELSE CAST({_HQ_BOUNDS[-1]} AS DOUBLE) END AS lo,
                 CASE {" ".join(f"WHEN value <= {le} THEN CAST({le} AS DOUBLE)" for le in _HQ_BOUNDS)}
                      ELSE CAST('inf' AS DOUBLE) END AS le
          FROM events),
        c AS (SELECT event_type, lo, le, COUNT(*) AS n FROM b GROUP BY 1, 2, 3),
        w AS (SELECT event_type, lo, le, n,
                     SUM(n) OVER (PARTITION BY event_type ORDER BY le) AS cum,
                     SUM(n) OVER (PARTITION BY event_type) AS total
              FROM c),
        -- r11 rounding audit: exact-integer interpolation, ONE divide
        x AS (SELECT w.*, k
              FROM w, (SELECT unnest([{", ".join(f"CAST({int(round(q * 100))} AS BIGINT)" for q in _HQ_QS)}]) AS k)),
        p AS (SELECT *, row_number() OVER (PARTITION BY event_type, k
                                           ORDER BY le) AS pick
              FROM x WHERE 100 * cum >= k * total),
        f AS (SELECT event_type, k, n, cum, total,
                     CAST(lo AS BIGINT) AS lo_i,
                     CASE WHEN le = CAST('inf' AS DOUBLE)
                          THEN CAST(lo AS BIGINT)
                          ELSE CAST(le AS BIGINT) END AS le_i
              FROM p WHERE pick = 1)
        SELECT event_type, k / 100.0 AS q,
               ROUND(CAST(lo_i * 100 * n
                          + (le_i - lo_i) * (k * total - 100 * (cum - n))
                          AS DOUBLE) / (100 * n), 4) AS hq
        FROM f ORDER BY event_type, q
    """,
    "dedup_ngram_jaccard": """
        WITH p AS (
          SELECT doc_id,
                 array_to_string(string_split(text, ' ')[1:3], ' ') AS block_key,
                 list_distinct(string_split(text, ' ')) AS tokset
          FROM documents)
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               ROUND(len(list_intersect(a.tokset, b.tokset))
                     / len(list_distinct(list_concat(a.tokset, b.tokset))), 4)
                 AS jaccard
        FROM p a JOIN p b ON a.block_key = b.block_key AND a.doc_id < b.doc_id
        ORDER BY a_id, b_id
    """,
    # Winnowing (MOSS) fingerprint near-dup pairs: positional 3-gram
    # hashes -> window-of-4 minima -> distinct fingerprint set;
    # df-capped fingerprint equi-join candidates; exact integer
    # fingerprint-set Jaccard >= 0.5 verify. Constants mirror
    # pipeline._WINNOW_{{K,W,DF_CAP}} verbatim.
    "dedup_winnow_pairs": f"""
        WITH qh AS (
          SELECT doc_id,
                 CASE WHEN len(toks) >= 3 THEN
                   [{_h60_duck("toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]")}
                    FOR i IN range(1, len(toks) - 1)]
                 ELSE [{_h60_duck('text')}] END AS qh
          FROM (SELECT doc_id, text, string_split(text, ' ') AS toks
                FROM documents)),
        fps AS (
          SELECT doc_id,
                 CASE WHEN len(qh) >= 4 THEN
                   list_distinct([list_min(qh[i:i+3])
                                  FOR i IN range(1, len(qh) - 2)])
                 ELSE [list_min(qh)] END AS fps
          FROM qh),
        ex AS (SELECT doc_id, unnest(fps) AS fp FROM fps),
        live_fp AS (SELECT fp FROM ex GROUP BY fp HAVING COUNT(*) <= 64),
        exc AS (SELECT ex.doc_id, ex.fp FROM ex JOIN live_fp USING (fp)),
        cand AS (
          SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
          FROM exc a JOIN exc b
            ON a.fp = b.fp AND a.doc_id < b.doc_id)
        SELECT a_id, b_id,
               len(list_intersect(fa.fps, fb.fps)) AS n_shared,
               ROUND(len(list_intersect(fa.fps, fb.fps)) * 1.0
                     / len(list_distinct(list_concat(fa.fps, fb.fps))), 4)
                 AS jaccard
        FROM cand
        JOIN fps fa ON fa.doc_id = cand.a_id
        JOIN fps fb ON fb.doc_id = cand.b_id
        WHERE 2 * len(list_intersect(fa.fps, fb.fps))
              >= len(list_distinct(list_concat(fa.fps, fb.fps)))
        ORDER BY a_id, b_id
    """,
    # deterministic 90/5/5 content-hash split with per-(split,lang) audit
    "train_val_test_split": f"""
        SELECT CASE WHEN {_h60_duck('text')} % 100 < 90 THEN 'train'
                    WHEN {_h60_duck('text')} % 100 < 95 THEN 'val'
                    ELSE 'test' END AS split,
               lang, COUNT(*) AS n_docs
        FROM documents GROUP BY split, lang ORDER BY split, lang
    """,
    # exact >=5% document-frequency heavy hitters (integer threshold)
    "heavy_hitters": """
        WITH dfc AS (
          SELECT t, COUNT(*) AS doc_freq FROM (
            SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
            FROM documents)
          GROUP BY t),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT t AS token, doc_freq,
               ROUND(doc_freq * 1.0 / n_docs, 4) AS df_ratio
        FROM dfc, n
        WHERE doc_freq * 20 >= n_docs
        ORDER BY doc_freq DESC, token
    """,
    # count-min sketch calibration: 4x512 bucket sums from the exact tf
    # table, estimate = min over rows, integer-exact overestimate
    "approx_topk_tokens": f"""
        WITH tf AS (
          SELECT t, COUNT(*) AS cnt
          FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
          GROUP BY t),
        rws AS (SELECT unnest(range(4)) AS r),
        bs AS (
          SELECT r,
                 {_h60_duck("CAST(r AS VARCHAR) || ':' || t")} % 512 AS bucket,
                 CAST(SUM(cnt) AS BIGINT) AS bsum
          FROM tf, rws GROUP BY 1, 2),
        top AS (
          SELECT t, cnt, rnk FROM (
            SELECT t, cnt,
                   row_number() OVER (ORDER BY cnt DESC, t) AS rnk
            FROM tf) x
          WHERE rnk <= 25),
        probes AS (
          SELECT top.t, top.cnt, top.rnk, rws.r,
                 {_h60_duck("CAST(rws.r AS VARCHAR) || ':' || top.t")} % 512
                   AS bucket
          FROM top, rws)
        SELECT p.rnk, p.t AS token, CAST(p.cnt AS BIGINT) AS exact_cnt,
               CAST(MIN(bs.bsum) AS BIGINT) AS cms_est,
               CAST(MIN(bs.bsum) - p.cnt AS BIGINT) AS overestimate
        FROM probes p JOIN bs ON bs.r = p.r AND bs.bucket = p.bucket
        GROUP BY p.rnk, p.t, p.cnt
        ORDER BY p.rnk
    """,
    # uniform-target resampling weights over per-source token shares
    "mixture_weights": """
        WITH ps AS (
          SELECT source,
                 CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
          FROM documents GROUP BY source)
        SELECT source, src_tokens,
               ROUND(src_tokens * 1.0 / SUM(src_tokens) OVER (), 4) AS share,
               ROUND(SUM(src_tokens) OVER () * 1.0
                     / (COUNT(*) OVER () * src_tokens), 4) AS uniform_weight
        FROM ps ORDER BY source
    """,
    # the COMPLETE near-dup pair set (same edges as dedup_clusters)
    # attributed to their sources, unordered-pair normalized
    "near_dup_source_matrix": f"""
        WITH {_SHINGLE_PAIRS_CTE}
        SELECT least(sa.source, sb.source) AS source_lo,
               greatest(sa.source, sb.source) AS source_hi,
               COUNT(*) AS n_pairs
        FROM pairs
        JOIN documents sa ON sa.doc_id = pairs.a_id
        JOIN documents sb ON sb.doc_id = pairs.b_id
        GROUP BY source_lo, source_hi
        ORDER BY source_lo, source_hi
    """,
    # ground truth for the prefix-filter join: brute-force ALL pairs
    # >= 0.5 — the completeness guarantee makes the pruned algorithm's
    # output equal the exhaustive one
    "dedup_prefix_filter": f"""
        WITH {_SHINGLE_PAIRS_CTE}
        SELECT a_id, b_id, ROUND(jaccard, 4) AS jaccard
        FROM pairs ORDER BY a_id, b_id
    """,
    # connected components via recursive CTE: min reachable id per node
    # over the symmetric COMPLETE near-dup edge set (same brute-force
    # shingle pairs that ground-truth dedup_prefix_filter)
    "dedup_clusters": f"""
        WITH RECURSIVE {_SHINGLE_PAIRS_CTE},
        edges AS (
          SELECT a_id AS u, b_id AS v FROM pairs
          UNION
          SELECT b_id AS u, a_id AS v FROM pairs),
        reach(u, r) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM edges)
          UNION
          SELECT e.u, re.r FROM edges e JOIN reach re ON e.v = re.u)
        SELECT u AS doc_id, MIN(r) AS cluster_id
        FROM reach GROUP BY u ORDER BY doc_id
    """,
    # fixed-point PageRank over the same complete edge set: scale 10^6,
    # damping (85*x)//100, 3 unrolled iterations — positive integer
    # divisions everywhere, so floor (//) matches Spark's div exactly
    "near_dup_pagerank": _pagerank_sql(),
    "doc_length_quartiles_by_source": """
        -- r11 rounding audit: exact rank arithmetic (pos = (n-1)*k,
        -- trunc-div/mod 100), ONE divide per percentile
        WITH ranked AS (
          SELECT source, CAST(n_chars AS BIGINT) AS v,
                 row_number() OVER (PARTITION BY source ORDER BY n_chars)
                   AS rn,
                 COUNT(*) OVER (PARTITION BY source) AS n
          FROM documents),
        picks AS (
          SELECT source, k, rem, n,
                 MIN(CASE WHEN rn = lo_rank THEN v END) AS v_lo,
                 MAX(v) AS v_hi
          FROM (SELECT r.*, k,
                       ((n - 1) * k) // 100 + 1 AS lo_rank,
                       ((n - 1) * k) % 100 AS rem
                FROM ranked r,
                     (SELECT unnest([25, 50, 75, 95]) AS k) ks) t
          WHERE rn = lo_rank OR rn = least(lo_rank + 1, n)
          GROUP BY source, k, rem, n)
        SELECT source, CAST(n AS BIGINT) AS n_docs,
               MIN(CASE WHEN k = 25 THEN p END) AS p25,
               MIN(CASE WHEN k = 50 THEN p END) AS p50,
               MIN(CASE WHEN k = 75 THEN p END) AS p75,
               MIN(CASE WHEN k = 95 THEN p END) AS p95
        FROM (SELECT source, n, k,
                     ROUND(CAST(v_lo * (100 - rem) + v_hi * rem
                                AS DOUBLE) / 100.0, 4) AS p
              FROM picks) f
        GROUP BY source, n ORDER BY source
    """,
    "truncation_stats": """
        WITH toks AS (
          SELECT source,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
          FROM documents)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN nt > 64 THEN 1 ELSE 0 END) AS BIGINT)
                 AS docs_truncated,
               CAST(SUM(nt) AS BIGINT) AS total_tokens,
               CAST(SUM(CASE WHEN nt > 64 THEN nt - 64 ELSE 0 END)
                    AS BIGINT) AS tokens_lost,
               CAST((CAST(SUM(CASE WHEN nt > 64 THEN nt - 64 ELSE 0 END)
                          AS BIGINT) * 1000)
                    // CAST(SUM(nt) AS BIGINT) AS BIGINT) AS loss_permille
        FROM toks GROUP BY source ORDER BY source
    """,
    "domain_cap_sample": f"""
        SELECT source, doc_id, CAST(rk AS BIGINT) AS rk FROM (
          SELECT source, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY {_h60_duck('text')}, doc_id)
                   AS rk
          FROM documents) t
        WHERE rk <= 10 ORDER BY source, rk
    """,
    "dedup_cluster_size_hist": f"""
        WITH RECURSIVE {_SHINGLE_PAIRS_CTE},
        edges AS (
          SELECT a_id AS u, b_id AS v FROM pairs
          UNION
          SELECT b_id AS u, a_id AS v FROM pairs),
        reach(u, r) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM edges)
          UNION
          SELECT e.u, re.r FROM edges e JOIN reach re ON e.v = re.u),
        labels AS (
          SELECT u AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY u),
        sizes AS (
          SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
          FROM labels GROUP BY 1)
        SELECT cluster_size,
               CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
        FROM sizes GROUP BY cluster_size ORDER BY cluster_size
    """,
    "dedup_keep_one": f"""
        WITH RECURSIVE {_SHINGLE_PAIRS_CTE},
        edges AS (
          SELECT a_id AS u, b_id AS v FROM pairs
          UNION
          SELECT b_id AS u, a_id AS v FROM pairs),
        reach(u, r) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM edges)
          UNION
          SELECT e.u, re.r FROM edges e JOIN reach re ON e.v = re.u),
        losers AS (
          SELECT u AS doc_id FROM reach GROUP BY u HAVING u != MIN(r))
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d
        WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = d.doc_id)
        ORDER BY d.doc_id
    """,
    # keep-best variant: cluster representative = longest doc (doc_id
    # tie-break) over the same complete edge set
    "dedup_keep_best": f"""
        WITH RECURSIVE {_SHINGLE_PAIRS_CTE},
        edges AS (
          SELECT a_id AS u, b_id AS v FROM pairs
          UNION
          SELECT b_id AS u, a_id AS v FROM pairs),
        reach(u, r) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM edges)
          UNION
          SELECT e.u, re.r FROM edges e JOIN reach re ON e.v = re.u),
        cl AS (SELECT u AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY u),
        ranked AS (
          SELECT d.doc_id,
                 row_number() OVER (PARTITION BY cl.cluster_id
                                    ORDER BY d.n_chars DESC, d.doc_id) AS rk
          FROM documents d JOIN cl ON cl.doc_id = d.doc_id),
        losers AS (SELECT doc_id FROM ranked WHERE rk > 1)
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d
        WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = d.doc_id)
        ORDER BY d.doc_id
    """,
    "dedup_rate_by_source": f"""
        WITH RECURSIVE {_SHINGLE_PAIRS_CTE},
        edges AS (
          SELECT a_id AS u, b_id AS v FROM pairs
          UNION
          SELECT b_id AS u, a_id AS v FROM pairs),
        reach(u, r) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM edges)
          UNION
          SELECT e.u, re.r FROM edges e JOIN reach re ON e.v = re.u),
        losers AS (
          SELECT u AS doc_id FROM reach GROUP BY u HAVING u != MIN(r))
        SELECT d.source, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN l.doc_id IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               ROUND(SUM(CASE WHEN l.doc_id IS NULL THEN 1 ELSE 0 END) * 1.0
                     / COUNT(*), 4) AS keep_ratio
        FROM documents d LEFT JOIN losers l USING (doc_id)
        GROUP BY d.source ORDER BY d.source
    """,
    # corpus-hapax share per source over per-doc DISTINCT tokens
    "rare_token_ratio": """
        WITH dt AS (
          SELECT doc_id, source,
                 unnest(list_distinct(string_split(text, ' '))) AS t
          FROM documents),
        tdf AS (SELECT t, COUNT(*) AS tdf FROM dt GROUP BY t)
        SELECT source, COUNT(*) AS n_distinct_tokens,
               CAST(SUM(CASE WHEN tdf <= 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_hapax,
               ROUND(SUM(CASE WHEN tdf <= 1 THEN 1 ELSE 0 END) * 1.0
                     / COUNT(*), 4) AS hapax_ratio
        FROM dt JOIN tdf USING (t)
        GROUP BY source ORDER BY source
    """,
    # first-seen 3-shingle novelty share per source
    "ngram_novelty": f"""
        WITH sh AS (
          SELECT doc_id,
                 CASE WHEN len(toks) >= 3 THEN
                   list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                  FOR i IN range(1, len(toks) - 1)])
                 ELSE [text] END AS shingles
          FROM (SELECT doc_id, text, string_split(text, ' ') AS toks
                FROM documents)),
        shr AS (
          SELECT doc_id, {_h60_duck('s')} AS h
          FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)),
        fs AS (SELECT h, MIN(doc_id) AS first_id FROM shr GROUP BY h)
        SELECT d.source, COUNT(*) AS n_shingles,
               CAST(SUM(CASE WHEN shr.doc_id = fs.first_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               ROUND(SUM(CASE WHEN shr.doc_id = fs.first_id THEN 1 ELSE 0 END)
                     * 1.0 / COUNT(*), 4) AS novelty_ratio
        FROM shr JOIN fs USING (h)
        JOIN documents d ON d.doc_id = shr.doc_id
        GROUP BY d.source ORDER BY d.source
    """,
    # per-label L2-norm outlier screen; norm folded in element order
    "embedding_norm_outliers": f"""
        -- r11 rounding audit: in-order fold (list_reduce seeded with
        -- 0.0 replicates Spark's aggregate() bit-for-bit), norms
        -- quantized to fixed point, exact integer moments; the
        -- 2-sigma test compares squares in exact integers
        WITH v AS (
          SELECT label,
                 CAST(floor(sqrt(list_reduce(
                        list_prepend(0.0::DOUBLE,
                                     CAST(embedding AS DOUBLE[])),
                        (a, x) -> a + x * x)) * {{fx}}) AS BIGINT) AS fx
          FROM embeddings),
        st AS (
          SELECT label, fx,
                 COUNT(*) OVER w AS n,
                 SUM(CAST(fx AS HUGEINT)) OVER w AS s,
                 SUM(CAST(fx AS HUGEINT) * fx) OVER w AS ss
          FROM v WINDOW w AS (PARTITION BY label))
        SELECT label, COUNT(*) AS n_vecs,
               ROUND(CAST(MAX(s) AS DOUBLE)
                     / CAST(MAX(n) * {{fx}} AS DOUBLE), 4) AS mean_norm,
               CAST(SUM(CASE WHEN (n * fx - s) * (n * fx - s)
                                  > 4 * (n * ss - s * s)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM st GROUP BY label ORDER BY label
    """.replace("{fx}", "1048576"),
    "distinctive_terms": """
        WITH toks AS (
          SELECT source, unnest(string_split(text, ' ')) AS tok
          FROM documents),
        tf AS (SELECT source, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1)
        SELECT source, rnk, tok, tf, df FROM (
          SELECT tf.source, tf.tok, tf.tf, df.df,
                 row_number() OVER (PARTITION BY tf.source
                                    ORDER BY tf.tf DESC, df.df, tf.tok) AS rnk
          FROM tf JOIN df USING (tok)) t
        WHERE rnk <= 5 ORDER BY source, rnk
    """,
    "top_ngrams": """
        WITH bg AS (
          SELECT lang, unnest([toks[i] || ' ' || toks[i+1]
                               FOR i IN range(1, len(toks))]) AS bigram
          FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents)),
        c AS (SELECT lang, bigram, COUNT(*) AS n FROM bg GROUP BY 1, 2)
        SELECT lang, rnk, bigram, n FROM (
          SELECT lang, bigram, n,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY n DESC, bigram) AS rnk
          FROM c) t
        WHERE rnk <= 5 ORDER BY lang, rnk
    """,
    "stratified_sample": (
        "SELECT doc_id, lang, source FROM documents WHERE "
        + _h60_duck("CAST(doc_id AS VARCHAR)") + " % 100 < CASE "
        + " ".join(f"WHEN lang = '{lang}' THEN {p}"
                   for lang, p in sorted(_SAMPLE_PCT.items()))
        + f" ELSE {_SAMPLE_DEFAULT_PCT} END ORDER BY doc_id"
    ),
    "vocab_stats": """
        SELECT source, COUNT(*) AS total_tokens,
               COUNT(DISTINCT t) AS distinct_tokens,
               ROUND(COUNT(DISTINCT t) / COUNT(*), 4) AS ttr
        FROM (SELECT source, unnest(string_split(text, ' ')) AS t
              FROM documents)
        GROUP BY source ORDER BY source
    """,
    # repetition filter: top-token count per doc; the repetitive flag is
    # integer-only (top*5 >= n <=> ratio >= 0.2) so both engines agree
    # bit-for-bit at the decision boundary.
    "repetition_ratio": """
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(top_cnt) AS BIGINT) AS top_tok_hits,
               CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
               CAST(SUM(CASE WHEN top_cnt * 5 >= n_tok THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_repetitive,
               ROUND(SUM(top_cnt) * 1.0 / SUM(n_tok), 4) AS wtd_top_ratio
        FROM (
          SELECT doc_id, source, MAX(c) AS top_cnt, SUM(c) AS n_tok
          FROM (
            SELECT doc_id, source, t, COUNT(*) AS c
            FROM (SELECT doc_id, source,
                         unnest(string_split(text, ' ')) AS t
                  FROM documents)
            GROUP BY doc_id, source, t)
          GROUP BY doc_id, source)
        GROUP BY source ORDER BY source
    """,
    # decontamination sweep: distinct 3-shingle hashes on both sides,
    # equi-join on the hash, threshold on shared-shingle count.
    "contamination_overlap": f"""
        WITH sh AS (
          SELECT doc_id, source,
                 CASE WHEN len(toks) >= 3 THEN
                   list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                  FOR i IN range(1, len(toks) - 1)])
                 ELSE [text] END AS shingles
          FROM (SELECT doc_id, source, text, string_split(text, ' ') AS toks
                FROM documents)),
        shr AS (
          SELECT doc_id, source, {_h60_duck('s')} AS h
          FROM (SELECT doc_id, source, unnest(shingles) AS s FROM sh))
        SELECT e.doc_id AS eval_id, t.doc_id AS train_id,
               COUNT(*) AS shared_shingles
        FROM (SELECT doc_id, h FROM shr
              WHERE source = '{_CONTAM_EVAL_SOURCE}') e
        JOIN (SELECT doc_id, h FROM shr
              WHERE source != '{_CONTAM_EVAL_SOURCE}') t USING (h)
        GROUP BY 1, 2
        HAVING COUNT(*) >= {_CONTAM_MIN_SHARED}
        ORDER BY eval_id, train_id
    """,
    # next-fit packing per (source, shard): the same recursion shape as
    # the dedup_clusters oracle, one step per doc in doc_id order
    "pack_sequences": f"""
        WITH RECURSIVE t AS (
          SELECT source, doc_id // {_PACK_SHARD} AS shard, doc_id,
                 len(string_split(text, ' ')) AS tok,
                 row_number() OVER (PARTITION BY source, doc_id // {_PACK_SHARD}
                                    ORDER BY doc_id) AS rn
          FROM documents),
        r AS (
          SELECT source, shard, doc_id, tok, rn,
                 tok AS fill, CAST(0 AS BIGINT) AS bin
          FROM t WHERE rn = 1
          UNION ALL
          SELECT t.source, t.shard, t.doc_id, t.tok, t.rn,
                 CASE WHEN r.fill + t.tok > {_PACK_CAPACITY} THEN t.tok
                      ELSE r.fill + t.tok END,
                 CASE WHEN r.fill + t.tok > {_PACK_CAPACITY} THEN r.bin + 1
                      ELSE r.bin END
          FROM t JOIN r ON t.source = r.source AND t.shard = r.shard
                       AND t.rn = r.rn + 1)
        SELECT source, shard, bin, COUNT(*) AS n_docs,
               CAST(SUM(tok) AS BIGINT) AS total_tok,
               ROUND(SUM(tok) / {_PACK_CAPACITY}.0, 4) AS fill_ratio
        FROM r GROUP BY 1, 2, 3 ORDER BY source, shard, bin
    """,
    "quality_filter": f"""
        WITH q AS (
          SELECT source,
                 len(string_split(text, ' ')) AS n_tok,
                 length(replace(text, ' ', ''))
                   / len(string_split(text, ' ')) AS tok_len,
                 {_hits_duck('en')}
                   / len(string_split(text, ' ')) AS stop_ratio
          FROM documents)
        SELECT source,
               CASE WHEN n_tok < {_QUALITY_BOUNDS['min_tok']} THEN 'too_short'
                    WHEN n_tok > {_QUALITY_BOUNDS['max_tok']} THEN 'too_long'
                    WHEN tok_len < {_QUALITY_BOUNDS['min_tok_len']}
                      THEN 'tokens_too_short'
                    WHEN tok_len > {_QUALITY_BOUNDS['max_tok_len']}
                      THEN 'tokens_too_long'
                    WHEN stop_ratio < {_QUALITY_BOUNDS['min_stop']}
                      THEN 'low_stopword_ratio'
                    ELSE 'pass' END AS reason,
               COUNT(*) AS n
        FROM q GROUP BY 1, 2 ORDER BY source, reason
    """,
    # Holt level/trend recursion in fixed-point (cents << 8) with
    # arithmetic-shift halving — bit-identical to the Spark aggregate()
    # pass; same recursion shape as the pack_sequences oracle
    "holt_linear_smooth": """
        WITH RECURSIVE e AS (
          SELECT user_id, event_id,
                 (CAST(round(value * 100) AS BIGINT) << 8) AS v,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events),
        h AS (
          SELECT user_id, event_id, rn, v AS lvl, CAST(0 AS BIGINT) AS tr
          FROM e WHERE rn = 1
          UNION ALL
          SELECT e.user_id, e.event_id, e.rn,
                 (e.v + h.lvl + h.tr) >> 1 AS lvl,
                 (((e.v + h.lvl + h.tr) >> 1) - h.lvl + h.tr) >> 1 AS tr
          FROM e JOIN h ON e.user_id = h.user_id AND e.rn = h.rn + 1)
        SELECT event_id, user_id,
               lvl / 25600.0 AS level,
               tr / 25600.0 AS trend
        FROM h ORDER BY event_id
    """,
    # integer CUSUM recursion (cents, integer drift/alarm constants) —
    # bit-identical to the Spark aggregate() fold by construction
    "cusum_changepoints": f"""
        WITH RECURSIVE e AS (
          SELECT user_id, event_id,
                 CAST(round(value * 100) AS BIGINT) AS v,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events),
        h AS (
          SELECT user_id, event_id, rn,
                 greatest(CAST(0 AS BIGINT), v - {_CUSUM_DRIFT_CENTS}) AS s
          FROM e WHERE rn = 1
          UNION ALL
          SELECT e.user_id, e.event_id, e.rn,
                 greatest(CAST(0 AS BIGINT),
                          h.s + e.v - {_CUSUM_DRIFT_CENTS}) AS s
          FROM e JOIN h ON e.user_id = h.user_id AND e.rn = h.rn + 1)
        SELECT event_id, user_id, s AS cusum_cents,
               CAST(CASE WHEN s >= {_CUSUM_ALARM_CENTS} THEN 1 ELSE 0 END
                    AS BIGINT) AS alarm
        FROM h WHERE s > 0 ORDER BY event_id
    """,
    # hour-of-day seasonal cells with an integer per-mille index.
    # SIGN-SAFE division (VERDICT r11 doctrine): divide magnitudes,
    # apply sign(sum_cents)*sign(sum_type) as a factor — floor and
    # trunc `//` agree on non-negative operands, so the integer is
    # identical under any DuckDB version's division convention.
    "seasonal_hourly_profile": """
        WITH cells AS (
          SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
                 COUNT(*) AS n,
                 CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
          FROM events GROUP BY 1, 2),
        t AS (
          SELECT event_type,
                 CAST(SUM(n) AS BIGINT) AS n_type,
                 CAST(SUM(sum_cents) AS BIGINT) AS sum_type
          FROM cells GROUP BY 1)
        SELECT c.event_type, c.hod, c.n, c.sum_cents,
               CAST((CASE WHEN c.sum_cents < 0 THEN -1 ELSE 1 END) *
                    (CASE WHEN t.sum_type < 0 THEN -1 ELSE 1 END) *
                    ((ABS(c.sum_cents) * t.n_type * 1000)
                     // (c.n * ABS(t.sum_type))) AS BIGINT)
                 AS idx_permille
        FROM cells c JOIN t USING (event_type)
        ORDER BY c.event_type, c.hod
    """,
    "path_transitions": """
        WITH l AS (
          SELECT event_type AS to_type,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS from_type
          FROM events),
        c AS (
          SELECT from_type, to_type, COUNT(*) AS n_trans
          FROM l WHERE from_type IS NOT NULL GROUP BY 1, 2)
        SELECT from_type, to_type, n_trans,
               ROUND(n_trans * 1.0
                     / SUM(n_trans) OVER (PARTITION BY from_type), 4) AS prob
        FROM c ORDER BY from_type, to_type
    """,
}


def _band_curve_sql() -> str:
    """Oracle twin of pipeline.lsh_band_recall_curve: the same 32-perm
    signature CTE banded three ways (4x8 / 8x4 / 16x2), each config's
    candidate count and recall against the complete >=0.5-Jaccard pair
    set. Band-bucket hashing is the salted concat_ws form both engines
    share (_MINHASH_BUCKETS pattern)."""
    from catalyst_spark.queries.pipeline import _BAND_CONFIGS

    parts = [
        f"WITH {_MINHASH_SIG},",
        """exact AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id
          FROM sig a JOIN sig b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.hset, b.hset)) * 1.0
                / len(list_distinct(list_concat(a.hset, b.hset))) >= 0.5),""",
    ]
    rows = []
    for i, (nb, nr) in enumerate(_BAND_CONFIGS):
        buckets = ", ".join(
            _h60_duck(
                "concat_ws(',', "
                + ", ".join([str(b)] + [f"m{nr * b + r}" for r in range(nr)])
                + ")"
            )
            for b in range(nb)
        )
        parts.append(
            f"bands{i} AS (SELECT doc_id, unnest([{buckets}]) AS bucket"
            f" FROM sig),"
        )
        parts.append(
            f"cand{i} AS (SELECT DISTINCT l.doc_id AS a_id,"
            f" r.doc_id AS b_id FROM bands{i} l JOIN bands{i} r"
            f" ON l.bucket = r.bucket AND l.doc_id < r.doc_id),"
        )
        rows.append(
            f"SELECT CAST({nb} AS BIGINT) AS n_bands,"
            f" CAST({nr} AS BIGINT) AS n_rows,"
            f" (SELECT CAST(COUNT(*) AS BIGINT) FROM cand{i})"
            f"   AS n_candidates,"
            f" CAST(COUNT(*) AS BIGINT) AS n_exact,"
            f" CAST(COUNT(c.a_id) AS BIGINT) AS n_found,"
            f" ROUND(COUNT(c.a_id) * 1.0 / COUNT(*), 4) AS recall"
            f" FROM exact e LEFT JOIN cand{i} c"
            f" ON e.a_id = c.a_id AND e.b_id = c.b_id"
        )
    body = "\n".join(parts).rstrip(",")
    union = " UNION ALL ".join(f"({r})" for r in rows)
    return body + f"\nSELECT * FROM ({union}) u ORDER BY n_bands"



def _threshold_sensitivity_sql() -> str:
    """Oracle twin of pipeline.dedup_threshold_sensitivity: the same
    >=0.5 pair CTE filtered at each permille threshold on the SAME
    4dp-rounded jaccard, recursive-CTE components per threshold, and
    the integer-permille survival arithmetic."""
    from catalyst_spark.queries.pipeline import _DEDUP_THETAS

    rows = []
    ctes = [f"WITH RECURSIVE {_SHINGLE_PAIRS_CTE},",
            "nd AS (SELECT COUNT(*) AS n_docs FROM documents),"]
    for i, tp in enumerate(_DEDUP_THETAS):
        ctes.append(
            f"e{i} AS (SELECT a_id AS u, b_id AS v FROM pairs"
            f" WHERE ROUND(jaccard, 4) >= {tp} / 1000.0"
            f" UNION SELECT b_id, a_id FROM pairs"
            f" WHERE ROUND(jaccard, 4) >= {tp} / 1000.0),"
        )
        ctes.append(
            f"r{i}(u, r) AS ("
            f" SELECT u, u FROM (SELECT DISTINCT u FROM e{i})"
            f" UNION SELECT e.u, re.r FROM e{i} e JOIN r{i} re ON e.v = re.u),"
        )
        ctes.append(
            f"l{i} AS (SELECT u AS doc_id, MIN(r) AS label FROM r{i}"
            f" GROUP BY u),"
        )
        rows.append(
            # ungrouped COUNT aggregate in a derived table, crossed with
            # nd: an empty component set at a high theta still yields one
            # zeroed row, matching the Spark operator's ungrouped .agg()
            # (ADVICE r5: GROUP BY nd.n_docs emitted zero rows there)
            f"SELECT CAST({tp} AS BIGINT) AS theta_permille,"
            f" CAST(nd.n_docs AS BIGINT) AS n_docs,"
            f" CAST(c{i}.n_in AS BIGINT) AS n_in_clusters,"
            f" CAST(c{i}.n_cl AS BIGINT) AS n_clusters,"
            f" CAST(c{i}.n_in - c{i}.n_cl AS BIGINT) AS n_removed,"
            f" CAST(((nd.n_docs - (c{i}.n_in - c{i}.n_cl)) * 1000)"
            f"      // nd.n_docs AS BIGINT) AS survival_permille"
            f" FROM nd, (SELECT COUNT(*) AS n_in,"
            f" COUNT(DISTINCT label) AS n_cl FROM l{i}) c{i}"
        )
    body = "\n".join(ctes).rstrip(",")
    union = " UNION ALL ".join(f"({r})" for r in rows)
    return body + f"\nSELECT * FROM ({union}) u ORDER BY theta_permille"



def _quality_curve_sql() -> str:
    """Oracle twin of pipeline.quality_survival_curve: the same
    conditional integer sums per threshold, survival permille via //
    (truncation, matching Spark div)."""
    from catalyst_spark.queries.pipeline import _QUALITY_MIN_TOKENS

    rows = []
    for t in _QUALITY_MIN_TOKENS:
        rows.append(
            f"SELECT CAST({t} AS BIGINT) AS min_tokens,"
            f" CAST(SUM(CASE WHEN nt >= {t} THEN 1 ELSE 0 END) AS BIGINT)"
            f"   AS docs_kept,"
            f" CAST(COUNT(*) AS BIGINT) AS n_docs,"
            f" CAST((CAST(SUM(CASE WHEN nt >= {t} THEN 1 ELSE 0 END)"
            f"       AS BIGINT) * 1000) // COUNT(*) AS BIGINT)"
            f"   AS doc_survival_permille,"
            f" CAST(SUM(CASE WHEN nt >= {t} THEN nt ELSE 0 END) AS BIGINT)"
            f"   AS tokens_kept,"
            f" CAST(SUM(nt) AS BIGINT) AS total_tokens,"
            f" CAST((CAST(SUM(CASE WHEN nt >= {t} THEN nt ELSE 0 END)"
            f"       AS BIGINT) * 1000) // CAST(SUM(nt) AS BIGINT)"
            f"      AS BIGINT) AS token_survival_permille"
            f" FROM toks"
        )
    union = " UNION ALL ".join(f"({r})" for r in rows)
    return (
        "WITH toks AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT)"
        " AS nt FROM documents)\n"
        f"SELECT * FROM ({union}) u ORDER BY min_tokens"
    )


ORACLE_SQL: dict[str, str] = {**_RELATIONAL, **_PIPELINE, **_HASH_ORACLES, **_TSDB}

# r11 merge: each fold key runs BOTH execution shapes (whole-series +
# chunked) as one variant-keyed table; the chunked rows are
# output-identical by construction, so the oracle is the ONE
# recursive-CTE SQL duplicated per variant label — every row of both
# variants stays hash-checked, and the merged table IS the proof that
# chunking changes nothing
def _variant_union(sql: str) -> str:
    return f"""
    SELECT * FROM (
      SELECT 'whole_series' AS variant, * FROM ({sql}) w
      UNION ALL
      SELECT 'chunked' AS variant, * FROM ({sql}) c
    ) u ORDER BY variant, event_id
    """


ORACLE_SQL["cusum_changepoints"] = _variant_union(
    ORACLE_SQL["cusum_changepoints"])
ORACLE_SQL["holt_linear_smooth"] = _variant_union(
    ORACLE_SQL["holt_linear_smooth"])
ORACLE_SQL["lsh_band_recall_curve"] = _band_curve_sql()
ORACLE_SQL["dedup_threshold_sensitivity"] = _threshold_sensitivity_sql()
ORACLE_SQL["quality_survival_curve"] = _quality_curve_sql()
ORACLE_SQL["near_dup_pagerank_converged"] = _pagerank_converged_sql()
ORACLE_SQL["phash_dup_pairs"] = _phash_pairs_sql()
ORACLE_SQL["audio_fp_dup_pairs"] = _audio_fp_pairs_sql()
ORACLE_SQL["video_frame_dup_pairs"] = _video_frame_pairs_sql()
ORACLE_SQL["dedup_edit_distance"] = _edit_distance_sql()
ORACLE_SQL["phash_dup_clusters"] = _phash_clusters_sql()
ORACLE_SQL["window_selfdup_cut"] = _selfdup_cut_sql()
ORACLE_SQL["lsh_bucket_size_hist"] = _bucket_hist_sql()
ORACLE_SQL["ann_ivfpq_rerank_topk"] = _ivfpq_rerank_sql()
ORACLE_SQL["ann_ivfpq_rerank_recall"] = _ivfpq_rerank_recall_sql()


# ---------------------------------------------------------------------------
# tokenizer-training / corpus-audit statistics (r7)
# ---------------------------------------------------------------------------

ORACLE_SQL["bpe_merge_stats"] = """
    WITH w AS (
      SELECT t AS w, COUNT(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
      WHERE length(t) >= 2 GROUP BY t),
    p AS (
      SELECT cnt,
             unnest([substr(w, CAST(i AS INT), 2)
                     FOR i IN range(1, length(w))]) AS pair
      FROM w),
    a AS (SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n FROM p GROUP BY pair)
    SELECT ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rnk, pair, n
    FROM a ORDER BY n DESC, pair LIMIT 20
"""

ORACLE_SQL["token_coverage_curve"] = """
    WITH c AS (
      SELECT t, COUNT(*) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
      GROUP BY t),
    r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rnk FROM c),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total_tokens FROM c)
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST(SUM(r.c) AS BIGINT) AS covered_tokens,
           MAX(tot.total_tokens) AS total_tokens,
           ROUND(SUM(r.c) * 1.0 / MAX(tot.total_tokens), 4) AS coverage
    FROM (VALUES (1), (10), (100), (1000)) ks(k)
    JOIN r ON r.rnk <= ks.k
    CROSS JOIN tot
    GROUP BY ks.k ORDER BY k
"""

# incremental shard-vs-corpus dedup: exact fp semi-join + banded MinHash
# candidates (shard side x corpus side only) verified with the
# integer-exact Jaccard >= 0.5 test (2|I| >= |U|)
ORACLE_SQL["incremental_shard_dedup"] = f"""
    WITH {_MINHASH_SIG},
    bands AS (
      SELECT doc_id, unnest([{_MINHASH_BUCKETS}]) AS bucket FROM sig),
    fp AS (
      SELECT doc_id, source, substring(md5(text), 1, 16) AS fp,
             doc_id % 7 = 0 AS is_new
      FROM documents),
    ex AS (
      SELECT DISTINCT n.doc_id FROM fp n JOIN fp o
        ON n.fp = o.fp AND n.is_new AND NOT o.is_new),
    cand AS (
      SELECT DISTINCT l.doc_id AS new_id, r.doc_id AS old_id
      FROM bands l JOIN bands r ON l.bucket = r.bucket
      WHERE l.doc_id % 7 = 0 AND r.doc_id % 7 != 0),
    near AS (
      SELECT DISTINCT c.new_id AS doc_id
      FROM cand c JOIN sig a ON a.doc_id = c.new_id
                  JOIN sig b ON b.doc_id = c.old_id
      WHERE 2 * len(list_intersect(a.hset, b.hset))
            >= len(list_distinct(list_concat(a.hset, b.hset))))
    SELECT n.source, COUNT(*) AS n_new,
           CAST(SUM(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_exact_dup,
           CAST(SUM(CASE WHEN e.doc_id IS NULL AND nr.doc_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
           CAST(SUM(CASE WHEN e.doc_id IS NULL AND nr.doc_id IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM fp n LEFT JOIN ex e ON n.doc_id = e.doc_id
              LEFT JOIN near nr ON n.doc_id = nr.doc_id
    WHERE n.is_new GROUP BY n.source ORDER BY n.source
"""

# hybrid rank fusion: vector arm = exact cosine top-20; lexical arm =
# shingle-hash-blocked Jaccard top-20; integer rank-sum fusion with a
# 21 penalty for single-arm candidates
ORACLE_SQL["rank_fusion_topk"] = _EMB_NORMED + f"""
    , {_MINHASH_SIG},
    vec AS (
      SELECT q_id, id, vrank FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_dot_product(q.e, c.e) / (q.nrm * c.nrm) DESC,
                          c.vec_id) AS vrank
        FROM v q JOIN v c ON q.vec_id != c.vec_id
        WHERE q.vec_id % 50 = 0) t
      WHERE vrank <= 20),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shr GROUP BY doc_id),
    cd AS (
      SELECT q.doc_id AS q_id, c.doc_id AS id, COUNT(*) AS inter
      FROM shr q JOIN shr c ON q.h = c.h AND q.doc_id != c.doc_id
      WHERE q.doc_id % 50 = 0
        AND q.doc_id IN (SELECT vec_id FROM embeddings)
      GROUP BY 1, 2),
    lex AS (
      SELECT q_id, id, lrank FROM (
        SELECT cd.q_id, cd.id,
               ROW_NUMBER() OVER (
                 PARTITION BY cd.q_id
                 ORDER BY cd.inter * 1.0 / (qs.sz + cs.sz - cd.inter) DESC,
                          cd.id) AS lrank
        FROM cd JOIN sizes qs ON qs.doc_id = cd.q_id
                JOIN sizes cs ON cs.doc_id = cd.id) t
      WHERE lrank <= 20),
    fused AS (
      SELECT COALESCE(v.q_id, l.q_id) AS q_id,
             COALESCE(v.id, l.id) AS id,
             COALESCE(v.vrank, 21) + COALESCE(l.lrank, 21) AS fused
      FROM vec v FULL JOIN lex l ON v.q_id = l.q_id AND v.id = l.id)
    SELECT q_id, "rank", id AS result_id,
           CAST(fused AS BIGINT) AS fused_rank_sum
    FROM (
      SELECT q_id, id, fused,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY fused, id) AS "rank"
      FROM fused) t
    WHERE "rank" <= 5 ORDER BY q_id, "rank"
"""


def _ivf_rek_sql() -> str:
    """Oracle twin of pipeline.ivf_rek_cell_stats: TWO unrolled coarse
    k-means (engine k and the re-k k=16 variant, CTE names prefixed so
    they coexist), nearest-centroid assignment and integer cell stats
    for each, UNION ALL ordered by k."""
    from catalyst_spark.queries.pipeline import (
        _KMEANS_ITERS,
        _KMEANS_K,
        _REK_K,
    )

    last8 = f"c{_KMEANS_ITERS}"
    last16 = f"rk_c{_KMEANS_ITERS}"

    def _stats(k: int, last: str, p: str) -> str:
        return f"""
        {p}dist AS (
          SELECT v.vec_id, c.c_id,
                 row_number() OVER (PARTITION BY v.vec_id ORDER BY
                   list_dot_product(v.e, v.e)
                   - 2 * list_dot_product(v.e, c.ce)
                   + list_dot_product(c.ce, c.ce), c.c_id) AS rn
          FROM v, {last} c),
        {p}asg AS (SELECT vec_id, c_id FROM {p}dist WHERE rn = 1),
        {p}cells AS (
          SELECT c_id, COUNT(*) AS n FROM {p}asg GROUP BY c_id),
        {p}stats AS (
          SELECT CAST({k} AS BIGINT) AS k,
                 CAST(COUNT(*) AS BIGINT) AS n_cells,
                 CAST(MAX(n) AS BIGINT) AS max_cell,
                 CAST(MIN(n) AS BIGINT) AS min_cell,
                 CAST(SUM(n * n) AS BIGINT) AS scan_mass
          FROM {p}cells),"""

    return (
        _kmeans_sql()
        + "\n" + _kmeans_sql(k=_REK_K, prefix="rk_", header=False)
        + _stats(_KMEANS_K, last8, "s8_")
        + _stats(_REK_K, last16, "s16_").rstrip(",")
        + """
        SELECT * FROM (
          SELECT * FROM s8_stats UNION ALL SELECT * FROM s16_stats) t
        ORDER BY k
    """
    )


ORACLE_SQL["ivf_rek_cell_stats"] = _ivf_rek_sql()


def _sq8_ivf_rek_ctes() -> str:
    """Shared CTEs for the re-k'd IVF+SQ8 oracles (oracle twin of
    pipeline.ann_sq8_ivf_rek_topk): the k=_REK_K unrolled coarse
    k-means (CTE names prefixed rk_, same parametric generator the
    ivf_rek_cell_stats oracle uses) + bit-exact SQ8 codes + top-2
    probes, top-1 members, in-cell candidates, integer rank. Valid at
    every correctness scale because _serving_k(N) = _REK_K for all
    N < 4 * _REK_N0 (= 16k rows; sf0.01 has 500, sf0.1 has 2k) — and
    ENFORCED, not just documented (ADVICE r8): the chk CTE raises a
    DuckDB error() if the live embeddings count reaches 4 * _REK_N0,
    so running this oracle at a scale where the operator serves k > 16
    fails loudly instead of reporting a spurious wrong-k mismatch."""
    from catalyst_spark.queries.pipeline import (
        _KMEANS_ITERS,
        _LSH_DIM,
        _REK_K,
        _REK_N0,
    )

    last_c = f"rk_c{_KMEANS_ITERS}"
    return (
        _kmeans_sql(k=_REK_K, prefix="rk_")
        + _sq8_code_ctes(with_header=False)
        + f"""
        dist AS (
          SELECT v.vec_id, c.c_id,
                 row_number() OVER (PARTITION BY v.vec_id ORDER BY
                   list_dot_product(v.e, v.e)
                   - 2 * list_dot_product(v.e, c.ce)
                   + list_dot_product(c.ce, c.ce), c.c_id) AS rn
          FROM v, {last_c} c),
        members AS (SELECT vec_id AS n_id, c_id FROM dist WHERE rn = 1),
        probes AS (
          SELECT vec_id AS q_id, c_id
          FROM dist WHERE rn <= 2 AND vec_id % 50 = 0),
        cand AS (
          SELECT DISTINCT p.q_id, m.n_id
          FROM probes p JOIN members m USING (c_id)
          WHERE m.n_id != p.q_id),
        sqirank AS (
          SELECT ca.q_id, ca.n_id,
                 CAST(list_sum(list_transform(range(1, {_LSH_DIM + 1}),
                      d -> (q.c[d] - n.c[d]) * (q.c[d] - n.c[d])))
                      AS BIGINT) AS d2,
                 ROW_NUMBER() OVER (PARTITION BY ca.q_id ORDER BY
                   CAST(list_sum(list_transform(range(1, {_LSH_DIM + 1}),
                        d -> (q.c[d] - n.c[d]) * (q.c[d] - n.c[d])))
                        AS BIGINT), ca.n_id) AS rnk
          FROM cand ca
          JOIN sq8codes q ON q.vec_id = ca.q_id
          JOIN sq8codes n ON n.vec_id = ca.n_id),
        chk AS (
          SELECT CASE WHEN (SELECT COUNT(*) FROM embeddings)
                           >= {4 * _REK_N0}
                 THEN error('rek oracle pins k=16 but _serving_k(N) '
                            '> 16 at this corpus size')
                 ELSE 0 END AS z)"""
    )


ORACLE_SQL["ann_sq8_ivf_rek_topk"] = _sq8_ivf_rek_ctes() + """
    SELECT q_id, rnk AS "rank", n_id AS neighbor_id, d2 AS sq_d2
    FROM sqirank WHERE rnk <= 5 AND (SELECT z FROM chk) = 0
    ORDER BY q_id, "rank"
"""

ORACLE_SQL["ann_sq8_ivf_rek_recall"] = _sq8_ivf_rek_ctes() + """,
    sqi AS (SELECT q_id, n_id FROM sqirank WHERE rnk <= 5),
    nv AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
    sb AS (
      SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
             list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos_raw
      FROM nv q JOIN nv c ON q.vec_id != c.vec_id
      WHERE q.vec_id % 50 = 0),
    brute AS (
      SELECT q_id, neighbor_id FROM (
        SELECT q_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY cos_raw DESC, neighbor_id)
                 AS rnk
        FROM sb) t
      WHERE rnk <= 5)
    SELECT b.q_id,
           COUNT(sqi.n_id) AS hits,
           ROUND(COUNT(sqi.n_id) / 5.0, 2) AS recall_at_5
    FROM brute b
    LEFT JOIN sqi ON sqi.q_id = b.q_id AND sqi.n_id = b.neighbor_id
    WHERE (SELECT z FROM chk) = 0
    GROUP BY b.q_id ORDER BY b.q_id
"""


# shared lexical-arm + fusion CTE fragments for the two rank-fusion
# variants (twin of pipeline._fusion_lex_arm / _fuse_arms). Built by
# functions that interpolate _FUSION_R / _FUSION_MISS from the pipeline
# module (ADVICE r8: hardcoded 20/21 literals would silently
# desynchronize operator and oracle if the constants ever move), the
# same convention _fusion_ivec_ctes uses for _RERANK_R.
def _fusion_lex_ctes() -> str:
    from catalyst_spark.queries.pipeline import _FUSION_R

    return f"""
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shr GROUP BY doc_id),
    cd AS (
      SELECT q.doc_id AS q_id, c.doc_id AS id, COUNT(*) AS inter
      FROM shr q JOIN shr c ON q.h = c.h AND q.doc_id != c.doc_id
      WHERE q.doc_id % 50 = 0
        AND q.doc_id IN (SELECT vec_id FROM embeddings)
      GROUP BY 1, 2),
    lex AS (
      SELECT q_id, id, lrank FROM (
        SELECT cd.q_id, cd.id,
               ROW_NUMBER() OVER (
                 PARTITION BY cd.q_id
                 ORDER BY cd.inter * 1.0 / (qs.sz + cs.sz - cd.inter) DESC,
                          cd.id) AS lrank
        FROM cd JOIN sizes qs ON qs.doc_id = cd.q_id
                JOIN sizes cs ON cs.doc_id = cd.id) t
      WHERE lrank <= {_FUSION_R})"""


_FUSION_LEX_CTES = _fusion_lex_ctes()

# indexed vector arm: the IVF-PQ ADC shortlist exact-reranked to full
# depth (twin of pipeline._ivfpq_rerank_ranked feeding rank_fusion_indexed)
def _fusion_ivec_ctes() -> str:
    from catalyst_spark.queries.pipeline import _RERANK_R

    return f"""
    sl AS (SELECT q_id, n_id FROM ipqrank WHERE rnk <= {_RERANK_R}),
    nv AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
    rr AS (
      SELECT s.q_id, s.n_id,
             list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos_raw
      FROM sl s JOIN nv q ON q.vec_id = s.q_id
                JOIN nv c ON c.vec_id = s.n_id),
    ivec AS (
      SELECT q_id, n_id AS id,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cos_raw DESC, n_id) AS vrank
      FROM rr)"""


def _fusion_tail() -> str:
    from catalyst_spark.queries.pipeline import _FUSION_MISS

    return f"""
    fused AS (
      SELECT COALESCE(v.q_id, l.q_id) AS q_id,
             COALESCE(v.id, l.id) AS id,
             COALESCE(v.vrank, {_FUSION_MISS})
               + COALESCE(l.lrank, {_FUSION_MISS}) AS fused
      FROM ivec v FULL JOIN lex l ON v.q_id = l.q_id AND v.id = l.id)
    SELECT q_id, "rank", id AS result_id,
           CAST(fused AS BIGINT) AS fused_rank_sum
    FROM (
      SELECT q_id, id, fused,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY fused, id) AS "rank"
      FROM fused) t
    WHERE "rank" <= 5 ORDER BY q_id, "rank"
"""


_FUSION_TAIL = _fusion_tail()

# index-served rank fusion: full IVF-PQ rerank CTEs (coarse k-means +
# PQ codebooks + LUT shortlist + exact rerank) as the vector arm, the
# shared shingle-blocked lexical arm, rank-sum fusion
ORACLE_SQL["rank_fusion_indexed"] = (
    _ivfpq_ctes() + ",\n    " + _MINHASH_SIG + ","
    + _FUSION_LEX_CTES + "," + _fusion_ivec_ctes() + ","
    + _FUSION_TAIL
)

def _shard_apply_sql() -> str:
    """Oracle twin of pipeline.incremental_shard_apply: the FULL
    band-candidate pair set (identical to the operator's index + delta
    union by the per-doc-blocking argument in its docstring), verified
    at integer-exact Jaccard >= 0.5 over hset, recursive
    min-reachable-id CC, survivors = documents minus cluster losers,
    flagged by shard membership."""
    from catalyst_spark.queries.pipeline import _SHARD_MOD

    return f"""
    WITH RECURSIVE {_MINHASH_SIG},
    bands AS (
      SELECT doc_id, unnest([{_MINHASH_BUCKETS}]) AS bucket FROM sig),
    cnd AS (
      SELECT DISTINCT l.doc_id AS a_id, r.doc_id AS b_id
      FROM bands l JOIN bands r
        ON l.bucket = r.bucket AND l.doc_id < r.doc_id),
    prs AS (
      SELECT c.a_id, c.b_id
      FROM cnd c JOIN sig a ON a.doc_id = c.a_id
                 JOIN sig b ON b.doc_id = c.b_id
      WHERE 2 * len(list_intersect(a.hset, b.hset))
            >= len(list_distinct(list_concat(a.hset, b.hset)))),
    edges AS (
      SELECT a_id AS u, b_id AS v FROM prs
      UNION
      SELECT b_id AS u, a_id AS v FROM prs),
    reach(u, r) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, re.r FROM edges e JOIN reach re ON e.v = re.u),
    lab AS (SELECT u AS doc_id, MIN(r) AS label FROM reach GROUP BY u)
    SELECT d.doc_id, d.source,
           d.doc_id % {_SHARD_MOD} = 0 AS from_shard
    FROM documents d
    WHERE d.doc_id NOT IN
      (SELECT doc_id FROM lab WHERE doc_id != label)
    ORDER BY d.doc_id
    """


ORACLE_SQL["incremental_shard_apply"] = _shard_apply_sql()


def _shard_apply_compaction_sql() -> str:
    """Oracle twin of pipeline.shard_apply_compaction: from-scratch
    dedup of EVERY prefix union (corpus + sub-shards 1..k), computed
    as one k-dimensioned recursive min-reachable CC over the verified
    pair set sliced by pair arrival step — the operator derives the
    same numbers incrementally (index + per-step deltas), so value
    equality at every step IS the compaction-vs-rebuild identity.
    Arrival arithmetic uses non-negative operands only (// == div)."""
    from catalyst_spark.queries.pipeline import _COMPACT_STEPS, _SHARD_MOD

    def arr(col: str) -> str:
        return (f"CASE WHEN {col} % {_SHARD_MOD} != 0 THEN 0 "
                f"ELSE 1 + ({col} // {_SHARD_MOD}) % {_COMPACT_STEPS} END")

    ks = ", ".join(str(k) for k in range(_COMPACT_STEPS + 1))
    return f"""
    WITH RECURSIVE {_MINHASH_SIG},
    bands AS (
      SELECT doc_id, unnest([{_MINHASH_BUCKETS}]) AS bucket FROM sig),
    cnd AS (
      SELECT DISTINCT l.doc_id AS a_id, r.doc_id AS b_id
      FROM bands l JOIN bands r
        ON l.bucket = r.bucket AND l.doc_id < r.doc_id),
    prs AS (
      SELECT c.a_id, c.b_id,
             GREATEST({arr('c.a_id')}, {arr('c.b_id')}) AS pstep
      FROM cnd c JOIN sig a ON a.doc_id = c.a_id
                 JOIN sig b ON b.doc_id = c.b_id
      WHERE 2 * len(list_intersect(a.hset, b.hset))
            >= len(list_distinct(list_concat(a.hset, b.hset)))),
    steps AS (SELECT unnest([{ks}]) AS k),
    eddir AS (
      SELECT pstep, a_id AS u, b_id AS v FROM prs
      UNION ALL
      SELECT pstep, b_id AS u, a_id AS v FROM prs),
    ek AS (
      SELECT s.k, e.u, e.v FROM steps s JOIN eddir e ON e.pstep <= s.k),
    reach(k, u, r) AS (
      SELECT k, u, u FROM (SELECT DISTINCT k, u FROM ek)
      UNION
      SELECT e.k, e.u, re.r
      FROM ek e JOIN reach re ON re.k = e.k AND e.v = re.u),
    lab AS (SELECT k, u AS doc_id, MIN(r) AS label
            FROM reach GROUP BY k, u),
    losers AS (SELECT k, doc_id FROM lab WHERE doc_id != label),
    darr AS (SELECT doc_id, {arr('doc_id')} AS astep FROM documents),
    surv AS (
      SELECT s.k, d.doc_id
      FROM steps s JOIN darr d ON d.astep <= s.k
      WHERE NOT EXISTS (SELECT 1 FROM losers lo
                        WHERE lo.k = s.k AND lo.doc_id = d.doc_id)),
    ecnt AS (
      SELECT s.k,
             COUNT(*) FILTER (WHERE p.pstep <= s.k) AS n_edges,
             COUNT(*) FILTER (WHERE p.pstep = s.k) AS n_delta
      FROM steps s LEFT JOIN prs p ON TRUE GROUP BY s.k),
    dcnt AS (
      SELECT s.k, COUNT(*) AS n_docs
      FROM steps s JOIN darr d ON d.astep <= s.k GROUP BY s.k),
    scnt AS (
      SELECT k, COUNT(*) AS n_survivors,
             bit_xor(doc_id) AS survivor_xor,
             CAST(SUM(doc_id) AS BIGINT) AS survivor_sum
      FROM surv GROUP BY k)
    SELECT d.k AS step,
           CAST(d.n_docs AS BIGINT) AS n_docs,
           CAST(e.n_edges AS BIGINT) AS n_edges,
           CAST(e.n_delta AS BIGINT) AS n_delta_edges,
           CAST(s.n_survivors AS BIGINT) AS n_survivors,
           CAST(d.n_docs - s.n_survivors AS BIGINT) AS n_removed,
           CAST(s.survivor_xor AS BIGINT) AS survivor_xor,
           s.survivor_sum
    FROM dcnt d JOIN ecnt e ON e.k = d.k JOIN scnt s ON s.k = d.k
    ORDER BY step
    """


ORACLE_SQL["shard_apply_compaction"] = _shard_apply_compaction_sql()


def _selfdup_cut_first_sql() -> str:
    """Oracle twin of pipeline.window_selfdup_cut_first: the
    _selfdup_cut_sql machinery with an ownership CTE — per duplicated
    hash the doc minimizing (h60(doc_id), doc_id) keeps its
    occurrences; only non-owner positions enter the islands pass."""
    from catalyst_spark.queries.pipeline import _CUT_RUN, _WIN_TOKENS

    hk = _h60_duck("CAST(doc_id AS VARCHAR)")
    return f"""
        WITH d AS (
          SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents),
        w AS (
          SELECT doc_id, u.pos AS pos, {_h60_duck('u.w')} AS h
          FROM (
            SELECT doc_id,
                   unnest([{{'pos': i,
                            'w': array_to_string(
                                   toks[i:(i + {_WIN_TOKENS} - 1)], ' ')}}
                           FOR i IN range(1, greatest(2, len(toks)
                                                         - {_WIN_TOKENS - 2}))])
                     AS u
            FROM d)),
        own AS (
          SELECT h, doc_id AS own FROM (
            SELECT h, doc_id,
                   COUNT(*) OVER (PARTITION BY h) AS nd,
                   row_number() OVER (PARTITION BY h
                                      ORDER BY {hk}, doc_id) AS rn
            FROM (SELECT DISTINCT h, doc_id FROM w)) t
          WHERE rn = 1 AND nd >= 2),
        isl AS (
          SELECT w.doc_id, w.pos,
                 w.pos - row_number() OVER (PARTITION BY w.doc_id
                                            ORDER BY w.pos) AS g
          FROM w JOIN own ON w.h = own.h AND w.doc_id != own.own),
        runs AS (
          SELECT doc_id, MIN(pos) AS p0, COUNT(*) AS run
          FROM isl GROUP BY doc_id, g
          HAVING COUNT(*) >= {_CUT_RUN}),
        cut AS (
          SELECT DISTINCT doc_id,
                 UNNEST(range(p0, p0 + run + {_WIN_TOKENS - 1})) AS i
          FROM runs),
        tok AS (
          SELECT doc_id, unnest(toks) AS t,
                 unnest(range(1, len(toks) + 1)) AS i
          FROM d),
        kept AS (
          SELECT tok.doc_id,
                 string_agg(tok.t, ' ' ORDER BY tok.i) AS kept_text,
                 CAST(COUNT(*) AS BIGINT) AS n_kept
          FROM tok LEFT JOIN cut
            ON cut.doc_id = tok.doc_id AND cut.i = tok.i
          WHERE cut.i IS NULL
          GROUP BY tok.doc_id)
        SELECT d.doc_id,
               CAST(len(d.toks) AS BIGINT) AS n_tokens,
               CAST(len(d.toks) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_cut,
               COALESCE(k.kept_text, '') AS kept_text
        FROM d LEFT JOIN kept k USING (doc_id)
        ORDER BY d.doc_id
    """


ORACLE_SQL["window_selfdup_cut_first"] = _selfdup_cut_first_sql()


def _packing_curve_sql() -> str:
    """Oracle twin of pipeline.packing_efficiency_curve: the
    pack_sequences next-fit recursion unrolled once per capacity
    (CTE names prefixed p{cap}_), each reduced to its one-row audit,
    UNION ALL ordered by capacity."""
    from catalyst_spark.queries.pipeline import (
        _PACK_CAPACITIES,
        _PACK_SHARD,
    )

    blocks, selects = [], []
    for cap in _PACK_CAPACITIES:
        p = f"p{cap}_"
        blocks.append(f"""
        {p}r AS (
          SELECT source, shard, doc_id, tok, rn,
                 tok AS fill, CAST(0 AS BIGINT) AS bin
          FROM t WHERE rn = 1
          UNION ALL
          SELECT t.source, t.shard, t.doc_id, t.tok, t.rn,
                 CASE WHEN r.fill + t.tok > {cap} THEN t.tok
                      ELSE r.fill + t.tok END,
                 CASE WHEN r.fill + t.tok > {cap} THEN r.bin + 1
                      ELSE r.bin END
          FROM t JOIN {p}r r ON t.source = r.source AND t.shard = r.shard
                       AND t.rn = r.rn + 1),
        {p}s AS (
          SELECT CAST({cap} AS BIGINT) AS capacity,
                 CAST(COUNT(*) AS BIGINT) AS n_bins,
                 CAST(SUM(bt) AS BIGINT) AS total_tok,
                 CAST((SUM(bt) * 1000) // (COUNT(*) * {cap}) AS BIGINT)
                   AS fill_permille,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM t
                  WHERE tok > {cap}) AS n_oversize
          FROM (SELECT source, shard, bin, SUM(tok) AS bt
                FROM {p}r GROUP BY 1, 2, 3)),""")
        selects.append(f"SELECT * FROM {p}s")
    return (
        f"""
        WITH RECURSIVE t AS (
          SELECT source, doc_id // {_PACK_SHARD} AS shard, doc_id,
                 len(string_split(text, ' ')) AS tok,
                 row_number() OVER (PARTITION BY source,
                                    doc_id // {_PACK_SHARD}
                                    ORDER BY doc_id) AS rn
          FROM documents),"""
        + "".join(blocks).rstrip(",")
        + "\nSELECT * FROM ("
        + " UNION ALL ".join(selects)
        + ") u ORDER BY capacity"
    )


ORACLE_SQL["packing_efficiency_curve"] = _packing_curve_sql()


def _contam_ngram_sizes_sql() -> str:
    """Oracle twin of pipeline.contamination_ngram_sizes: the
    contamination sweep per shingle size n (CTE names prefixed n{n}_),
    reduced to one audit row each, UNION ALL ordered by n."""
    from catalyst_spark.queries.pipeline import (
        _CONTAM_EVAL_SOURCE,
        _CONTAM_MIN_SHARED,
        _CONTAM_NGRAM_SIZES,
    )

    blocks, selects = [], []
    for n in _CONTAM_NGRAM_SIZES:
        p = f"n{n}_"
        blocks.append(f"""
        {p}shr AS (
          SELECT doc_id, source, {_h60_duck('s')} AS h
          FROM (
            SELECT doc_id, source, unnest(
              CASE WHEN len(toks) >= {n} THEN
                list_distinct([array_to_string(toks[i:(i + {n - 1})], ' ')
                               FOR i IN range(1, len(toks) - {n - 2})])
              ELSE [text] END) AS s
            FROM (SELECT doc_id, source, text,
                         string_split(text, ' ') AS toks
                  FROM documents))),
        {p}pairs AS (
          SELECT e.doc_id AS eval_id, t.doc_id AS train_id,
                 COUNT(*) AS c
          FROM (SELECT doc_id, h FROM {p}shr
                WHERE source = '{_CONTAM_EVAL_SOURCE}') e
          JOIN (SELECT doc_id, h FROM {p}shr
                WHERE source != '{_CONTAM_EVAL_SOURCE}') t USING (h)
          GROUP BY 1, 2
          HAVING COUNT(*) >= {_CONTAM_MIN_SHARED}),
        {p}s AS (
          SELECT CAST({n} AS BIGINT) AS ngram_n,
                 CAST(COUNT(*) AS BIGINT) AS flagged_pairs,
                 CAST(COUNT(DISTINCT eval_id) AS BIGINT)
                   AS flagged_eval_docs,
                 CAST(COUNT(DISTINCT train_id) AS BIGINT)
                   AS flagged_train_docs,
                 CAST(COALESCE(SUM(c), 0) AS BIGINT) AS total_shared
          FROM {p}pairs),""")
        selects.append(f"SELECT * FROM {p}s")
    return (
        "WITH "
        + "".join(blocks).rstrip(",").lstrip()
        + "\nSELECT * FROM ("
        + " UNION ALL ".join(selects)
        + ") u ORDER BY ngram_n"
    )


ORACLE_SQL["contamination_ngram_sizes"] = _contam_ngram_sizes_sql()


# cross-signal audit: complete >=0.5 pair membership x quality gate
ORACLE_SQL["dup_quality_audit"] = f"""
    WITH {_SHINGLE_PAIRS_CTE},
    dup AS (
      SELECT DISTINCT doc_id FROM (
        SELECT a_id AS doc_id FROM pairs
        UNION ALL SELECT b_id AS doc_id FROM pairs)),
    g AS (
      SELECT doc_id, source,
             (n_tok >= {_QUALITY_BOUNDS['min_tok']}
              AND n_tok <= {_QUALITY_BOUNDS['max_tok']}
              AND tok_len >= {_QUALITY_BOUNDS['min_tok_len']}
              AND tok_len <= {_QUALITY_BOUNDS['max_tok_len']}
              AND stop_ratio >= {_QUALITY_BOUNDS['min_stop']}) AS q
      FROM (
        SELECT doc_id, source,
               len(string_split(text, ' ')) AS n_tok,
               length(replace(text, ' ', ''))
                 / len(string_split(text, ' ')) AS tok_len,
               {_hits_duck('en')}
                 / len(string_split(text, ' ')) AS stop_ratio
        FROM documents))
    SELECT g.source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN d.doc_id IS NOT NULL AND g.q
                         THEN 1 ELSE 0 END) AS BIGINT) AS dup_pass,
           CAST(SUM(CASE WHEN d.doc_id IS NOT NULL AND NOT g.q
                         THEN 1 ELSE 0 END) AS BIGINT) AS dup_fail,
           CAST(SUM(CASE WHEN d.doc_id IS NULL AND g.q
                         THEN 1 ELSE 0 END) AS BIGINT) AS uniq_pass,
           CAST(SUM(CASE WHEN d.doc_id IS NULL AND NOT g.q
                         THEN 1 ELSE 0 END) AS BIGINT) AS uniq_fail
    FROM g LEFT JOIN dup d USING (doc_id)
    GROUP BY g.source ORDER BY g.source
"""


def _pii_sql() -> str:
    """Oracle twin of pipeline.pii_extract_stats: same derived PII
    augmentation (CASE/concat from doc_id), same Java-regex/RE2-common
    patterns, same mask chain order. DuckDB's regexp_replace needs the
    explicit 'g' flag to match Spark's replace-all semantics."""
    from catalyst_spark.queries.pipeline import _PII_PATTERNS

    aug = """concat(text,
        CASE WHEN doc_id % 7 = 0 THEN concat(' user',
             CAST(doc_id AS VARCHAR), '@mail',
             CAST(doc_id % 5 AS VARCHAR), '.com') ELSE '' END,
        CASE WHEN doc_id % 11 = 0 THEN concat(' +1-555-',
             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) ELSE '' END,
        CASE WHEN doc_id % 13 = 0 THEN concat(' 10.0.',
             CAST(doc_id % 256 AS VARCHAR), '.',
             CAST((doc_id * 7) % 256 AS VARCHAR)) ELSE '' END,
        CASE WHEN doc_id % 17 = 0 THEN concat(' https://host',
             CAST(doc_id % 50 AS VARCHAR), '.example.org/p/',
             CAST(doc_id AS VARCHAR)) ELSE '' END)"""
    cnts = ",\n             ".join(
        f"len(regexp_extract_all(t, '{pat}')) AS c_{name}"
        for name, pat, _ in _PII_PATTERNS
    )
    red = "t"
    for _, pat, mask in _PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{mask}', 'g')"
    any_pii = " + ".join(f"c_{name}" for name, _, _ in _PII_PATTERNS)
    per_type = ",\n           ".join(
        f"CAST(SUM(c_{name}) AS BIGINT) AS n_{name}"
        for name, _, _ in _PII_PATTERNS
    )
    return f"""
      WITH aug AS (
        SELECT doc_id, source, {aug} AS t FROM documents),
      per_doc AS (
        SELECT source,
             {cnts},
             length(t) - length({red}) AS red_delta
        FROM aug)
      SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN {any_pii} > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_with_pii,
           {per_type},
           CAST(SUM(red_delta) AS BIGINT) AS red_chars
      FROM per_doc GROUP BY source ORDER BY source
    """


ORACLE_SQL["pii_extract_stats"] = _pii_sql()


# corpus-frequency chunk cut: boilerplate hash set -> cut -> reassemble
# (parallel unnests zip in DuckDB, giving (pos, chunk) without structs)
def _boiler_cut_sql() -> str:
    from catalyst_spark.queries.pipeline import _BOILER_MIN_DOCS

    k = _CHUNK_TOKENS
    return f"""
      WITH ch AS (
        SELECT doc_id, source,
               unnest(range(0, nch)) AS pos,
               unnest([array_to_string(toks[(c*{k}+1):(c*{k}+{k})], ' ')
                       FOR c IN range(0, nch)]) AS chunk
        FROM (SELECT doc_id, source, toks,
                     CAST(ceil(len(toks) / {k}.0) AS INT) AS nch
              FROM (SELECT doc_id, source,
                           string_split(text, ' ') AS toks
                    FROM documents))),
      hh AS (
        SELECT doc_id, source, pos, chunk, {_h60_duck('chunk')} AS h
        FROM ch),
      boiler AS (
        SELECT h FROM hh GROUP BY h
        HAVING COUNT(DISTINCT doc_id) >= {_BOILER_MIN_DOCS}),
      agg AS (
        SELECT hh.doc_id, hh.source,
               COUNT(*) AS n_chunks,
               CAST(SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_cut,
               COALESCE(string_agg(
                   CASE WHEN b.h IS NULL THEN hh.chunk END,
                   ' ' ORDER BY hh.pos), '') AS kept_text
        FROM hh LEFT JOIN boiler b ON hh.h = b.h
        GROUP BY hh.doc_id, hh.source)
      SELECT doc_id, source, n_chunks, n_cut,
             CAST(CASE WHEN kept_text = '' THEN 0
                  ELSE len(string_split(kept_text, ' ')) END
                  AS BIGINT) AS kept_tokens,
             md5(kept_text) AS kept_h
      FROM agg ORDER BY doc_id
    """


ORACLE_SQL["boilerplate_line_cut"] = _boiler_cut_sql()


# staged curation funnel: quality -> exact dedup -> near-dup (complete
# >=0.5 pairs, both endpoints stage-2-alive, greatest id loses) ->
# decontamination (contamination_overlap's flagged train set)
ORACLE_SQL["curation_funnel"] = f"""
    WITH {_SHINGLE_PAIRS_CTE},
    base AS (
      SELECT doc_id, text, source, CAST(n_tok AS BIGINT) AS n_tok,
             (n_tok >= {_QUALITY_BOUNDS['min_tok']}
              AND n_tok <= {_QUALITY_BOUNDS['max_tok']}
              AND tok_len >= {_QUALITY_BOUNDS['min_tok_len']}
              AND tok_len <= {_QUALITY_BOUNDS['max_tok_len']}
              AND stop_ratio >= {_QUALITY_BOUNDS['min_stop']}) AS q
      FROM (
        SELECT doc_id, text, source,
               len(string_split(text, ' ')) AS n_tok,
               length(replace(text, ' ', ''))
                 / len(string_split(text, ' ')) AS tok_len,
               {{stop_hits}}
                 / len(string_split(text, ' ')) AS stop_ratio
        FROM documents)),
    s1 AS (SELECT * FROM base WHERE q),
    keep AS (SELECT MIN(doc_id) AS doc_id FROM s1 GROUP BY md5(text)),
    s2 AS (SELECT * FROM s1
           WHERE doc_id IN (SELECT doc_id FROM keep)),
    drop3 AS (
      SELECT DISTINCT GREATEST(a_id, b_id) AS doc_id
      FROM pairs
      WHERE a_id IN (SELECT doc_id FROM s2)
        AND b_id IN (SELECT doc_id FROM s2)),
    s3 AS (SELECT * FROM s2
           WHERE doc_id NOT IN (SELECT doc_id FROM drop3)),
    cshr AS (
      SELECT u.doc_id, dd.source, {_h60_duck('sg')} AS h
      FROM (SELECT doc_id, unnest(shingles) AS sg FROM sh) u
      JOIN documents dd USING (doc_id)),
    flagged AS (
      SELECT DISTINCT t.doc_id
      FROM (SELECT doc_id, h FROM cshr
            WHERE source = '{_CONTAM_EVAL_SOURCE}') e
      JOIN (SELECT doc_id, h FROM cshr
            WHERE source != '{_CONTAM_EVAL_SOURCE}') t USING (h)
      GROUP BY e.doc_id, t.doc_id
      HAVING COUNT(*) >= {_CONTAM_MIN_SHARED}),
    s4 AS (SELECT * FROM s3
           WHERE doc_id NOT IN (SELECT doc_id FROM flagged))
    SELECT * FROM (
      SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS stage_name,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) AS n_tokens
      FROM base
      UNION ALL
      SELECT CAST(1 AS BIGINT), 'quality', CAST(COUNT(*) AS BIGINT),
             CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s1
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'exact_dedup', CAST(COUNT(*) AS BIGINT),
             CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s2
      UNION ALL
      SELECT CAST(3 AS BIGINT), 'near_dedup', CAST(COUNT(*) AS BIGINT),
             CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s3
      UNION ALL
      SELECT CAST(4 AS BIGINT), 'decontam', CAST(COUNT(*) AS BIGINT),
             CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s4
    ) u ORDER BY stage
""".replace("{stop_hits}", _hits_duck("en"))


# Gopher-style independent rule matrix: per-doc (n_tok, n_dist, top_cnt)
# from one token group-by; every rule decision is integer math, exactly
# mirroring the Spark builder's cleared-denominator comparisons.
def _gopher_rules_sql() -> str:
    from catalyst_spark.queries.pipeline import _GOPHER_MIN_STOP_HITS

    b = _QUALITY_BOUNDS
    return f"""
      WITH tok AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS t
        FROM documents),
      cnt AS (
        SELECT doc_id, source, t, COUNT(*) AS c
        FROM tok GROUP BY 1, 2, 3),
      pd AS (
        SELECT doc_id, source, MAX(c) AS top_cnt, SUM(c) AS n_tok,
               COUNT(*) AS n_dist
        FROM cnt GROUP BY 1, 2),
      aux AS (
        SELECT doc_id, length(replace(text, ' ', '')) AS nchars,
               {_hits_duck('en')} AS stop_hits
        FROM documents),
      j AS (
        SELECT pd.source,
               CASE WHEN n_tok < {b['min_tok']}
                      OR n_tok > {b['max_tok']} THEN 1 ELSE 0 END AS f_bounds,
               CASE WHEN nchars < {int(b['min_tok_len'])} * n_tok
                      OR nchars > {int(b['max_tok_len'])} * n_tok
                    THEN 1 ELSE 0 END AS f_len,
               CASE WHEN n_dist * 5 < n_tok * 2 THEN 1 ELSE 0 END AS f_ttr,
               CASE WHEN top_cnt * 8 >= n_tok THEN 1 ELSE 0 END AS f_top,
               CASE WHEN stop_hits < {_GOPHER_MIN_STOP_HITS}
                    THEN 1 ELSE 0 END AS f_stop
        FROM pd JOIN aux USING (doc_id))
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(f_bounds) AS BIGINT) AS n_fail_bounds,
             CAST(SUM(f_len) AS BIGINT) AS n_fail_len,
             CAST(SUM(f_ttr) AS BIGINT) AS n_fail_ttr,
             CAST(SUM(f_top) AS BIGINT) AS n_fail_top,
             CAST(SUM(f_stop) AS BIGINT) AS n_fail_stop,
             CAST(SUM(CASE WHEN f_bounds + f_len + f_ttr + f_top + f_stop = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
      FROM j GROUP BY source ORDER BY source
    """


ORACLE_SQL["gopher_quality_rules"] = _gopher_rules_sql()


# duplicated-n-gram coverage: top-2-gram occurrence char mass (argmax
# tie-broken by gram text DESC in both engines) + exact positional
# coverage of duplicated n-grams, n = _DUPG_DUP_N (each token position
# counted once).
def _dup_ngram_coverage_sql() -> str:
    from catalyst_spark.queries.pipeline import (
        _DUPG_DUP_N,
        _DUPG_FLAG_DEN,
        _DUPG_FLAG_NUM,
        _DUPG_TOP_N,
    )

    n5 = _DUPG_DUP_N
    return f"""
      WITH d AS (
        SELECT doc_id, source, string_split(text, ' ') AS toks,
               length(text) AS len_text
        FROM documents),
      g2 AS (
        SELECT doc_id,
               unnest([toks[i] || ' ' || toks[i+1]
                       FOR i IN range(1, len(toks))]) AS g
        FROM d WHERE len(toks) >= {_DUPG_TOP_N}),
      c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
      top2 AS (
        SELECT doc_id, c * length(g) AS top2_chars
        FROM (SELECT doc_id, g, c,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY c DESC, g DESC) AS rn
              FROM c2)
        WHERE rn = 1),
      g5 AS (
        SELECT doc_id, u.pos AS pos, u.g AS g
        FROM (
          SELECT doc_id,
                 unnest([{{'pos': i,
                          'g': array_to_string(toks[i:(i + {n5 - 1})], ' ')}}
                         FOR i IN range(1, len(toks) - {n5 - 2})]) AS u
          FROM d WHERE len(toks) >= {n5})),
      dup5 AS (
        SELECT doc_id, g FROM g5 GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      cov AS (
        SELECT doc_id, COUNT(DISTINCT p) AS cov_tok
        FROM (SELECT g5.doc_id, unnest(range(pos, pos + {n5})) AS p
              FROM g5 JOIN dup5 USING (doc_id, g))
        GROUP BY 1),
      pd AS (
        SELECT d.doc_id, d.source, d.len_text, len(d.toks) AS n_tok,
               COALESCE(top2.top2_chars, 0) AS top2_chars,
               COALESCE(cov.cov_tok, 0) AS cov_tok
        FROM d LEFT JOIN top2 USING (doc_id) LEFT JOIN cov USING (doc_id))
      SELECT source, COUNT(*) AS n_docs,
             ROUND(SUM(top2_chars) * 1.0 / SUM(len_text), 4)
               AS top2_char_ratio,
             ROUND(SUM(cov_tok) * 1.0 / SUM(n_tok), 4) AS dupn_coverage,
             CAST(SUM(CASE WHEN cov_tok * {_DUPG_FLAG_DEN}
                                >= n_tok * {_DUPG_FLAG_NUM}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
      FROM pd GROUP BY source ORDER BY source
    """


ORACLE_SQL["dup_ngram_coverage"] = _dup_ngram_coverage_sql()


# inverse-sqrt temperature mixing: sqrt is IEEE-correctly-rounded in
# both engines (general pow is not — the reason alpha is pinned at 0.5)
def _temperature_resample_sql() -> str:
    # fixed-point sqrt weights (ADVICE r8): q_total is an order-free
    # BIGINT sum and budget_tokens exact integer division — see the
    # operator docstring for the exactness argument
    from catalyst_spark.queries.pipeline import _TEMP_BUDGET, _TEMP_FX

    return f"""
      WITH s AS (
        SELECT source,
               SUM(len(string_split(text, ' '))) AS src_tokens
        FROM documents GROUP BY source),
      t AS (
        SELECT source, src_tokens,
               SUM(src_tokens) OVER () AS total,
               CAST(FLOOR(sqrt(src_tokens) * {_TEMP_FX}) AS BIGINT)
                 AS q_fx,
               SUM(CAST(FLOOR(sqrt(src_tokens) * {_TEMP_FX}) AS BIGINT))
                 OVER () AS q_total
        FROM s)
      SELECT source, CAST(src_tokens AS BIGINT) AS src_tokens,
             ROUND(src_tokens * 1.0 / total, 4) AS share,
             ROUND(q_fx * 1.0 / q_total, 4) AS temp_share,
             ROUND((q_fx * 1.0 / q_total)
                   / (src_tokens * 1.0 / total), 4) AS upsample,
             CAST((q_fx * {_TEMP_BUDGET}) // q_total AS BIGINT)
               AS budget_tokens
      FROM t ORDER BY source
    """


ORACLE_SQL["temperature_resample"] = _temperature_resample_sql()


# per-label centroid cosine: integer fixed-point sums (order-free) ->
# exact integer dots/norms -> two correctly-rounded sqrts + one divide
def _label_centroid_similarity_sql() -> str:
    from catalyst_spark.queries.pipeline import _CENTROID_Q

    return f"""
      WITH e AS (
        SELECT label, u.d AS dim, u.v AS v
        FROM (
          SELECT label,
                 unnest([{{'d': i - 1, 'v': embedding[i]}}
                         FOR i IN range(1, len(embedding) + 1)]) AS u
          FROM embeddings)),
      sums AS (
        SELECT label, dim,
               CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * {_CENTROID_Q})
                             AS BIGINT)) AS BIGINT) AS q
        FROM e GROUP BY 1, 2),
      counts AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1),
      norms AS (
        SELECT label, CAST(SUM(q * q) AS BIGINT) AS norm2
        FROM sums GROUP BY 1),
      dots AS (
        SELECT a.label AS label_lo, b.label AS label_hi,
               CAST(SUM(a.q * b.q) AS BIGINT) AS dot
        FROM sums a JOIN sums b
          ON a.dim = b.dim AND a.label < b.label
        GROUP BY 1, 2)
      SELECT d.label_lo, d.label_hi,
             CAST(cl.n AS BIGINT) AS n_lo, CAST(ch.n AS BIGINT) AS n_hi,
             ROUND(d.dot / (sqrt(nl.norm2) * sqrt(nh.norm2)), 4) AS cosine
      FROM dots d
      JOIN norms nl ON nl.label = d.label_lo
      JOIN norms nh ON nh.label = d.label_hi
      JOIN counts cl ON cl.label = d.label_lo
      JOIN counts ch ON ch.label = d.label_hi
      ORDER BY d.label_lo, d.label_hi
    """


ORACLE_SQL["label_centroid_similarity"] = _label_centroid_similarity_sql()


# --- r9 additions -----------------------------------------------------


def _tokenizer_fertility_sql() -> str:
    from catalyst_spark.queries.pipeline import _SUBTOK_RE

    return f"""
      WITH per AS (
        SELECT source,
               len(string_split(text, ' ')) AS w,
               len(regexp_extract_all(text, '{_SUBTOK_RE}')) AS s,
               length(replace(text, ' ', '')) AS ch
        FROM documents)
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(w) AS BIGINT) AS total_words,
             CAST(SUM(s) AS BIGINT) AS total_subtoks,
             CAST(SUM(ch) AS BIGINT) AS total_chars,
             ROUND(SUM(s) * 1.0 / SUM(w), 4) AS fertility,
             ROUND(SUM(ch) * 1.0 / SUM(s), 4) AS chars_per_subtok
      FROM per GROUP BY source ORDER BY source
    """


ORACLE_SQL["tokenizer_fertility"] = _tokenizer_fertility_sql()


def _shard_manifest_sql() -> str:
    from catalyst_spark.queries.pipeline import _MANIFEST_MOD

    h = _h60_duck("concat(CAST(doc_id AS VARCHAR), ':', text)")
    return f"""
      WITH d AS (
        SELECT source, doc_id,
               len(string_split(text, ' ')) AS w,
               {h} AS h
        FROM documents)
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(w) AS BIGINT) AS total_tokens,
             MIN(doc_id) AS min_doc_id,
             MAX(doc_id) AS max_doc_id,
             bit_xor(h) AS content_xor,
             CAST(SUM(CAST(h AS DECIMAL(38,0))) % {_MANIFEST_MOD}
                  AS BIGINT) AS content_sum
      FROM d GROUP BY source ORDER BY source
    """


ORACLE_SQL["shard_manifest"] = _shard_manifest_sql()


def _edv_agg_cte() -> str:
    """Shared q→agg CTE prefix for embedding_dim_variance:
    agg(dim, n, sum_fx, sumsq_fx) with DECIMAL(38,0) sums (the
    accumulator doctrine — checked columns re-cast to BIGINT; the r13
    bisection proved negative decimal checked columns driver-red). DuckDB SUM(BIGINT) accumulates in HUGEINT
    (128-bit, exact); reported as DECIMAL(38,0) to match Spark's
    decimal accumulator."""
    from catalyst_spark.queries.pipeline import _EMB_FX

    return f"""
      WITH q AS (
        SELECT u.dim, u.q
        FROM (
          SELECT unnest([{{'dim': i,
                           'q': CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                                           * {_EMB_FX}) AS BIGINT)}}
                         FOR i IN range(1, len(embedding) + 1)]) AS u
          FROM embeddings)),
      agg AS (
        SELECT dim, COUNT(*) AS n,
               CAST(SUM(q) AS DECIMAL(38,0)) AS sum_fx,
               CAST(SUM(q * q) AS DECIMAL(38,0)) AS sumsq_fx
        FROM q GROUP BY dim)
    """


# Exact-integer derived statistics (VERDICT r10 item 1: no
# ROUND(double); r11 doctrine: sign-safe division — magnitudes only,
# sign applied as a factor, identical whether an engine's `//` floors
# or truncates).
def _edv_derived_exprs() -> tuple[str, str]:
    from catalyst_spark.queries.pipeline import _EMB_FX

    mean_ppm = f"""CAST((CASE WHEN sum_fx < 0 THEN -1 ELSE 1 END) *
                  ((ABS(CAST(sum_fx AS HUGEINT)) * 1000000)
                   // (CAST(n AS HUGEINT) * {_EMB_FX})) AS BIGINT)"""
    var_num = """CAST(CAST(n AS HUGEINT) * CAST(sumsq_fx AS HUGEINT)
                  - CAST(sum_fx AS HUGEINT) * CAST(sum_fx AS HUGEINT)
                  AS BIGINT)"""
    return mean_ppm, var_num


def _embedding_dim_variance_sql() -> str:
    # r13 REWORK (VERDICT r12 item 2): every CHECKED column is BIGINT —
    # the values fit with >=2 orders of headroom at any correctness/
    # bench SF (measured max |var_num| 7.5e16 at sf0.1 vs the 9.2e18
    # bound); decimal stays in the accumulators only, where the 100 TB
    # headroom actually matters. This removes the op's only trait
    # unshared with the 171-op driver-green population (negative
    # DECIMAL(38,0) checked output).
    mean_ppm, var_num = _edv_derived_exprs()
    return f"""{_edv_agg_cte()}
      SELECT dim, n,
             CAST(sum_fx AS BIGINT) AS sum_fx,
             CAST(sumsq_fx AS BIGINT) AS sumsq_fx,
             {mean_ppm} AS mean_ppm,
             {var_num} AS var_num
      FROM agg ORDER BY dim
    """


ORACLE_SQL["embedding_dim_variance"] = _embedding_dim_variance_sql()


def _embedding_quantile_clip_sql() -> str:
    # r11: exact order statistics by rank (trunc-div, same as Spark's
    # div), exact integer clip mass and permille — no float anywhere
    from catalyst_spark.queries.pipeline import (
        _CLIP_HI_K,
        _CLIP_LO_K,
        _EMB_FX,
    )

    return f"""
      WITH q AS (
        SELECT u.dim, u.q
        FROM (
          SELECT unnest([{{'dim': i,
                           'q': CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                                           * {_EMB_FX}) AS BIGINT)}}
                         FOR i IN range(1, len(embedding) + 1)]) AS u
          FROM embeddings)),
      ranked AS (
        SELECT dim, q,
               row_number() OVER (PARTITION BY dim ORDER BY q) AS rn,
               COUNT(*) OVER (PARTITION BY dim) AS n
        FROM q),
      bounds AS (
        SELECT dim, n, MIN(q) AS min_fx, MAX(q) AS max_fx,
               MIN(CASE WHEN rn = ((n - 1) * {_CLIP_LO_K}) // 100 + 1
                        THEN q END) AS lo_fx,
               MIN(CASE WHEN rn = ((n - 1) * {_CLIP_HI_K}) // 100 + 1
                        THEN q END) AS hi_fx
        FROM ranked GROUP BY dim, n)
      SELECT q.dim, n, min_fx, lo_fx, hi_fx, max_fx,
             CAST(SUM(CASE WHEN q.q < lo_fx OR q.q > hi_fx
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
             CASE WHEN max_fx > min_fx
                  THEN CAST(((hi_fx - lo_fx) * 1000)
                            // (max_fx - min_fx) AS BIGINT)
                  ELSE 1000 END AS range_permille
      FROM q JOIN bounds b ON q.dim = b.dim
      GROUP BY 1, 2, 3, 4, 5, 6 ORDER BY q.dim
    """


ORACLE_SQL["embedding_quantile_clip"] = _embedding_quantile_clip_sql()


def _chunk_overlap_split_sql() -> str:
    from catalyst_spark.queries.pipeline import _RAG_CHUNK, _RAG_STRIDE

    return f"""
      WITH per AS (
        SELECT source,
               len(string_split(text, ' ')) AS n_tok,
               len(range(1, len(string_split(text, ' ')) + 1,
                         {_RAG_STRIDE})) AS n_chunks,
               CAST(list_sum(list_transform(
                 range(1, len(string_split(text, ' ')) + 1,
                       {_RAG_STRIDE}),
                 s -> least({_RAG_CHUNK},
                            len(string_split(text, ' ')) - s + 1)))
                 AS BIGINT) AS emitted
        FROM documents)
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
             CAST(SUM(n_chunks) AS BIGINT) AS total_chunks,
             CAST(SUM(emitted) AS BIGINT) AS emitted_tokens,
             ROUND(SUM(emitted) * 1.0 / SUM(n_tok), 4) AS dup_factor
      FROM per GROUP BY source ORDER BY source
    """


ORACLE_SQL["chunk_overlap_split"] = _chunk_overlap_split_sql()


def _dsir_importance_weights_sql() -> str:
    from catalyst_spark.queries.pipeline import (
        _CONTAM_EVAL_SOURCE,
        _DSIR_BUCKETS,
        _DSIR_TOPN,
    )

    h = _h60_duck("w")
    return f"""
      WITH tb AS (
        SELECT doc_id, source,
               {h} % {_DSIR_BUCKETS} AS b
        FROM (SELECT doc_id, source,
                     unnest(string_split(text, ' ')) AS w
              FROM documents)),
      ct AS (SELECT b, COUNT(*) AS ct FROM tb
             WHERE source = '{_CONTAM_EVAL_SOURCE}' GROUP BY b),
      cr AS (SELECT b, COUNT(*) AS cr FROM tb GROUP BY b),
      nn AS (SELECT
               (SELECT COUNT(*) FROM tb
                WHERE source = '{_CONTAM_EVAL_SOURCE}') AS n_t,
               (SELECT COUNT(*) FROM tb) AS n_r),
      sc AS (
        SELECT tb.doc_id, tb.source, COUNT(*) AS n_tok,
               SUM(length(bin(COALESCE(ct.ct, 0) + 1))
                   - length(bin(cr.cr + 1))) AS rb
        FROM tb JOIN cr USING (b) LEFT JOIN ct USING (b)
        WHERE tb.source != '{_CONTAM_EVAL_SOURCE}'
        GROUP BY 1, 2)
      SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
             CAST(rb + n_tok * (length(bin(n_r + {_DSIR_BUCKETS}))
                                - length(bin(n_t + {_DSIR_BUCKETS})))
                  AS BIGINT) AS w_bits
      FROM sc, nn
      ORDER BY w_bits DESC, doc_id LIMIT {_DSIR_TOPN}
    """


ORACLE_SQL["dsir_importance_weights"] = _dsir_importance_weights_sql()


def _hard_negative_mining_sql() -> str:
    from catalyst_spark.queries.pipeline import _HN_HI, _HN_K, _HN_LO

    return _EMB_NORMED + f"""
        , s AS (
          SELECT q.vec_id AS q_id, c.vec_id AS neg_id,
                 list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos_raw
          FROM v q JOIN v c ON q.vec_id != c.vec_id
          WHERE q.vec_id % 50 = 0)
        SELECT q_id, "rank", neg_id, ROUND(cos_raw, 2) AS cos FROM (
          SELECT q_id, neg_id, cos_raw,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY cos_raw DESC, neg_id)
                   AS "rank"
          FROM s
          WHERE cos_raw >= {_HN_LO} AND cos_raw < {_HN_HI}) t
        WHERE "rank" <= {_HN_K} ORDER BY q_id, "rank"
    """


ORACLE_SQL["hard_negative_mining"] = _hard_negative_mining_sql()


def _ann_nprobe_sweep_sql() -> str:
    """Oracle twin of pipeline.ann_nprobe_sweep: unrolled coarse
    k-means + SQ8 codes, one dist rank, then per-sweep-point candidate
    set / integer rank / brute-hit count, unioned into the three-row
    frontier table. Every count is an integer; mean recall is a single
    divide of exact integers (same on the Spark side)."""
    from catalyst_spark.queries.pipeline import (
        _KMEANS_ITERS,
        _LSH_DIM,
        _NPROBE_SWEEP,
    )

    last_c = f"c{_KMEANS_ITERS}"
    head = _kmeans_sql() + _sq8_code_ctes(with_header=False) + f"""
        dist AS (
          SELECT v.vec_id, c.c_id,
                 row_number() OVER (PARTITION BY v.vec_id ORDER BY
                   list_dot_product(v.e, v.e)
                   - 2 * list_dot_product(v.e, c.ce)
                   + list_dot_product(c.ce, c.ce), c.c_id) AS rn
          FROM v, {last_c} c),
        members AS (SELECT vec_id AS n_id, c_id FROM dist WHERE rn = 1),
        nv AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm
               FROM v),
        sb AS (
          SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
                 list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos_raw
          FROM nv q JOIN nv c ON q.vec_id != c.vec_id
          WHERE q.vec_id % 50 = 0),
        brute AS (
          SELECT q_id, neighbor_id FROM (
            SELECT q_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY cos_raw DESC, neighbor_id)
                     AS rnk
            FROM sb) t
          WHERE rnk <= 5),
        nq AS (SELECT COUNT(DISTINCT q_id) AS n FROM brute)"""
    d2 = (f"CAST(list_sum(list_transform(range(1, {_LSH_DIM + 1}), "
          f"d -> (q.c[d] - n.c[d]) * (q.c[d] - n.c[d]))) AS BIGINT)")
    blocks = []
    selects = []
    for np_ in _NPROBE_SWEEP:
        blocks.append(f""",
        cand{np_} AS (
          SELECT DISTINCT p.vec_id AS q_id, m.n_id
          FROM dist p JOIN members m USING (c_id)
          WHERE p.rn <= {np_} AND p.vec_id % 50 = 0
            AND m.n_id != p.vec_id),
        top{np_} AS (
          SELECT q_id, n_id FROM (
            SELECT ca.q_id, ca.n_id,
                   ROW_NUMBER() OVER (PARTITION BY ca.q_id ORDER BY
                     {d2}, ca.n_id) AS rnk
            FROM cand{np_} ca
            JOIN sq8codes q ON q.vec_id = ca.q_id
            JOIN sq8codes n ON n.vec_id = ca.n_id) t
          WHERE rnk <= 5)""")
        selects.append(f"""
        SELECT CAST({np_} AS BIGINT) AS nprobe,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM cand{np_})
                 AS scanned_rows,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM brute b JOIN top{np_} s
                  ON s.q_id = b.q_id AND s.n_id = b.neighbor_id)
                 AS total_hits,
               ROUND((SELECT COUNT(*)
                      FROM brute b JOIN top{np_} s
                        ON s.q_id = b.q_id AND s.n_id = b.neighbor_id)
                     / (5.0 * (SELECT n FROM nq)), 4)
                 AS mean_recall_at_5""")
    return (head + "".join(blocks)
            + " UNION ALL ".join(selects)
            + " ORDER BY nprobe")


def _ann_nprobe_sweep_merged_sql() -> str:
    """r12 merge (the serving_overlap composition pattern): the
    section-keyed union of the sq8 sweep and the former
    ann_multiprobe_recall, each constituent's SQL embedded VERBATIM as
    a subquery and only reshaped by the wrapper — no logic re-derived,
    no checked value weakened. Sentinel -1 (never NULL) fills the
    column the other section doesn't have, so canonical row-sorting
    never compares NULL against an integer."""
    return f"""
      SELECT 'sq8_sweep' AS section, nprobe,
             CAST(-1 AS BIGINT) AS q_id, scanned_rows,
             total_hits AS hits, mean_recall_at_5 AS recall
      FROM ( {_ann_nprobe_sweep_sql()} ) sw
      UNION ALL
      SELECT 'probe_exact' AS section, CAST(p.np AS BIGINT) AS nprobe,
             m.q_id, CAST(-1 AS BIGINT) AS scanned_rows,
             CASE p.np WHEN 1 THEN m.hits_p1 ELSE m.hits_p2 END AS hits,
             CASE p.np WHEN 1 THEN m.recall_p1 ELSE m.recall_p2 END
               AS recall
      FROM ( {_multiprobe_sql()} ) m,
           (SELECT unnest([1, 2]) AS np) p
      ORDER BY section, nprobe, q_id
    """


ORACLE_SQL["ann_nprobe_sweep"] = _ann_nprobe_sweep_merged_sql()


def _cdc_chunk_dedup_sql() -> str:
    from catalyst_spark.queries.pipeline import _CDC_MOD

    hw = _h60_duck("u.w")
    hc = _h60_duck("chunk")
    return f"""
      WITH t AS (
        SELECT doc_id, source, u.pos AS pos, u.w AS w,
               CASE WHEN {hw} % {_CDC_MOD} = 0 THEN 1 ELSE 0 END AS is_b
        FROM (
          SELECT doc_id, source,
                 unnest([{{'pos': i - 1, 'w': l[i]}}
                         FOR i IN range(1, len(l) + 1)]) AS u
          FROM (SELECT doc_id, source, string_split(text, ' ') AS l
                FROM documents))),
      c AS (
        SELECT doc_id, source, pos, w,
               SUM(is_b) OVER (PARTITION BY doc_id ORDER BY pos) AS cid
        FROM t),
      ch AS (
        SELECT doc_id, source, cid,
               string_agg(w, ' ' ORDER BY pos) AS chunk,
               COUNT(*) AS n_tok
        FROM c GROUP BY 1, 2, 3),
      hh AS (SELECT doc_id, source, n_tok, {hc} AS h FROM ch),
      dup AS (SELECT h FROM hh GROUP BY h
              HAVING COUNT(DISTINCT doc_id) >= 2)
      SELECT source,
             COUNT(DISTINCT doc_id) AS n_docs,
             COUNT(*) AS n_chunks,
             CAST(SUM(CASE WHEN h IN (SELECT h FROM dup) THEN 1 ELSE 0
                      END) AS BIGINT) AS n_dup_chunks,
             CAST(1000 * SUM(CASE WHEN h IN (SELECT h FROM dup) THEN 1
                             ELSE 0 END) // COUNT(*) AS BIGINT)
               AS dup_chunk_permille,
             ROUND(SUM(n_tok) * 1.0 / COUNT(*), 2) AS avg_chunk_tokens
      FROM hh GROUP BY source ORDER BY source
    """


ORACLE_SQL["cdc_chunk_dedup"] = _cdc_chunk_dedup_sql()


def _ltob_downsample_sql() -> str:
    from catalyst_spark.queries.tsdb import _LTOB_BUCKET_US

    return f"""
      WITH pts AS (
        SELECT event_type, event_id, epoch_us(ts) AS us,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               epoch_us(ts) // {_LTOB_BUCKET_US} AS bucket
        FROM events),
      agg AS (
        SELECT event_type, bucket, COUNT(*) AS n,
               SUM(CAST(us AS HUGEINT)) AS sx,
               SUM(CAST(cents AS HUGEINT)) AS sy
        FROM pts GROUP BY 1, 2),
      j AS (
        SELECT p.*, l.n AS n_l, l.sx AS sx_l, l.sy AS sy_l,
               r.n AS n_r, r.sx AS sx_r, r.sy AS sy_r
        FROM pts p
        LEFT JOIN agg l ON l.event_type = p.event_type
                       AND l.bucket = p.bucket - 1
        LEFT JOIN agg r ON r.event_type = p.event_type
                       AND r.bucket = p.bucket + 1),
      ranked AS (
        SELECT event_type, bucket, us, cents,
               CASE WHEN n_l IS NOT NULL AND n_r IS NOT NULL THEN
                 ROW_NUMBER() OVER (
                   PARTITION BY event_type, bucket
                   ORDER BY abs(
                     (sx_l * CAST(n_r AS HUGEINT)
                        - sx_r * CAST(n_l AS HUGEINT))
                     * (CAST(cents AS HUGEINT) * CAST(n_l AS HUGEINT)
                        - sy_l)
                     - (sx_l - CAST(us AS HUGEINT)
                          * CAST(n_l AS HUGEINT))
                     * (sy_r * CAST(n_l AS HUGEINT)
                        - sy_l * CAST(n_r AS HUGEINT))) DESC,
                     us ASC, event_id ASC)
               ELSE
                 ROW_NUMBER() OVER (
                   PARTITION BY event_type, bucket
                   ORDER BY us ASC, event_id ASC)
               END AS rnk
        FROM j)
      SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
             us AS ts_us, ROUND(cents / 100.0, 2) AS value
      FROM ranked WHERE rnk = 1
      ORDER BY event_type, bucket
    """


ORACLE_SQL["ltob_downsample"] = _ltob_downsample_sql()


def _embedding_principal_direction_sql() -> str:
    """Oracle twin of pipeline.embedding_principal_direction: the
    _POW_ITERS power-iteration steps UNROLLED as CTE chains (the
    near_dup_pagerank / k-means convention) — fixed-point rows, exact
    HUGEINT matvec, max-abs renormalization by truncating integer
    division, and the Rayleigh quotient as an exact integer ppb ratio.
    Every intermediate is an integer, so the direction matches the
    engine bit-for-bit."""
    from catalyst_spark.queries.pipeline import (
        _EMB_FX,
        _LSH_DIM,
        _POW_ITERS,
        _POW_VSCALE,
    )

    dims = _LSH_DIM
    v0 = "[" + ", ".join([str(_POW_VSCALE)] * dims) + "]"
    sql = f"""
      WITH q AS (
        SELECT [CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {_EMB_FX})
                     AS BIGINT)
                FOR i IN range(1, len(embedding) + 1)] AS q
        FROM embeddings),
      nn AS (SELECT COUNT(*) AS n FROM q),
      v0 AS (SELECT {v0} AS v)"""
    for k in range(1, _POW_ITERS + 1):
        sql += f""",
      d{k} AS (
        SELECT q.q AS q,
               list_sum(list_transform(range(1, {dims + 1}),
                        i -> q.q[i] * v.v[i])) AS dot
        FROM q, v{k - 1} v),
      y{k} AS (
        SELECT u.dim AS dim,
               SUM(CAST(u.qd AS HUGEINT) * CAST(dot AS HUGEINT)) AS y
        FROM (SELECT unnest([{{'dim': i, 'qd': q[i]}}
                             FOR i IN range(1, len(q) + 1)]) AS u,
                     dot
              FROM d{k})
        GROUP BY 1),
      m{k} AS (SELECT GREATEST(MAX(ABS(y)), 1) AS m FROM y{k}),
      v{k}rows AS (
        SELECT dim,
               CASE WHEN y >= 0 THEN (y * {_POW_VSCALE}) // m
                    ELSE -((-y * {_POW_VSCALE}) // m) END AS val
        FROM y{k}, m{k}),
      v{k} AS (SELECT list(val ORDER BY dim) AS v FROM v{k}rows)"""
    last, prev = _POW_ITERS, _POW_ITERS - 1
    sql += f"""
      SELECT r.dim AS dim, CAST(r.val AS BIGINT) AS loading,
             CAST(
               ((SELECT SUM(CAST(a.val AS HUGEINT) * y.y)
                 FROM v{prev}rows a JOIN y{last} y USING (dim))
                * 1000000000)
               // ((SELECT SUM(CAST(val AS HUGEINT) * val)
                    FROM v{prev}rows)
                   * (SELECT n FROM nn)
                   * {_EMB_FX * _EMB_FX}) AS BIGINT) AS rayleigh_ppb
      FROM v{last}rows r ORDER BY dim
    """
    return sql


ORACLE_SQL["embedding_principal_direction"] = \
    _embedding_principal_direction_sql()


def _mmr_diversified_topk_sql() -> str:
    """Oracle twin of pipeline.mmr_diversified_topk: the IVF-PQ rerank
    shortlist CTEs (sl/nv/rr from the fusion fragment) + the pairwise
    candidate-cosine frame, then the greedy MMR selection UNROLLED one
    CTE chain per step (pen -> argmax -> selected-set union), λ = 0.5
    exact-in-binary. The chained CTEs are MATERIALIZED (the
    near_dup_pagerank convention): sp{k} references sp{k-1} twice, so
    default CTE inlining would expand the chain EXPONENTIALLY — the
    measured hang that motivated the hint. Same IEEE arithmetic on the same doubles, ties on
    candidate id — value-for-value with the engine."""
    from catalyst_spark.queries.pipeline import _MMR_K, _MMR_LAMBDA

    head = (
        _ivfpq_ctes() + "," + _fusion_ivec_ctes() + """,
    rrm AS MATERIALIZED (SELECT * FROM rr),
    mp AS MATERIALIZED (
      SELECT a.q_id, a.n_id AS a_id, b.n_id AS b_id,
             list_dot_product(x.e, y.e) / (x.nrm * y.nrm) AS sim
      FROM sl a JOIN sl b ON a.q_id = b.q_id AND a.n_id != b.n_id
      JOIN nv x ON x.vec_id = a.n_id
      JOIN nv y ON y.vec_id = b.n_id),
    sel1 AS MATERIALIZED (
      SELECT q_id, n_id, cos_raw AS score FROM (
        SELECT q_id, n_id, cos_raw,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY cos_raw DESC, n_id) AS rn
        FROM rrm) t WHERE rn = 1),
    sp1 AS MATERIALIZED (SELECT q_id, n_id FROM sel1)"""
    )
    for k in range(2, _MMR_K + 1):
        head += f""",
    pen{k} AS MATERIALIZED (
      SELECT p.q_id, p.a_id AS n_id, MAX(p.sim) AS pen
      FROM mp p JOIN sp{k - 1} s
        ON s.q_id = p.q_id AND s.n_id = p.b_id
      GROUP BY 1, 2),
    sel{k} AS MATERIALIZED (
      SELECT q_id, n_id, score FROM (
        SELECT c.q_id, c.n_id,
               c.cos_raw - {_MMR_LAMBDA} * pe.pen AS score,
               ROW_NUMBER() OVER (
                 PARTITION BY c.q_id
                 ORDER BY c.cos_raw - {_MMR_LAMBDA} * pe.pen DESC,
                          c.n_id) AS rn
        FROM rrm c JOIN pen{k} pe
          ON pe.q_id = c.q_id AND pe.n_id = c.n_id
        WHERE NOT EXISTS (SELECT 1 FROM sp{k - 1} s
                          WHERE s.q_id = c.q_id
                            AND s.n_id = c.n_id)) t
      WHERE rn = 1),
    sp{k} AS MATERIALIZED (SELECT q_id, n_id FROM sp{k - 1}
              UNION ALL SELECT q_id, n_id FROM sel{k})"""
    selects = " UNION ALL ".join(
        f"SELECT q_id, CAST({k} AS BIGINT) AS \"rank\", "
        f"n_id AS result_id, ROUND(score, 2) AS mmr_score FROM sel{k}"
        for k in range(1, _MMR_K + 1)
    )
    return (head + "\n    SELECT * FROM (" + selects
            + ") ORDER BY q_id, \"rank\"")


ORACLE_SQL["mmr_diversified_topk"] = _mmr_diversified_topk_sql()


def _recall_ladder_sql() -> str:
    """Oracle twin of pipeline.ann_recall_ladder (VERDICT r9 item 6):
    the VERBATIM per-rung oracle SQLs, each wrapped as a subquery with
    its rung label, UNION ALL'd — nothing re-derived, so merging the
    eight driver slots into one weakens no oracle. The rung list is
    read from pipeline._recall_ladder_rungs() (function __name__ ==
    the old oracle key), so the two sides cannot list different rungs.
    The per-rung SQLs are POPPED out of ORACLE_SQL here: the ladder is
    the only registered entry, matching the Spark registry."""
    from catalyst_spark.queries.pipeline import _recall_ladder_rungs

    parts = []
    for rung, fn in _recall_ladder_rungs():
        sql = ORACLE_SQL.pop(fn.__name__)
        parts.append(
            f"SELECT '{rung}' AS rung, q_id, hits, recall_at_5\n"
            f"FROM (\n{sql}\n) AS _rung_{rung}"
        )
    return "\nUNION ALL\n".join(parts) + "\nORDER BY rung, q_id"


ORACLE_SQL["ann_recall_ladder"] = _recall_ladder_sql()


def _hard_negative_indexed_sql() -> str:
    """Oracle twin of pipeline.hard_negative_indexed (VERDICT r9 item
    2): the full IVF-PQ ADC shortlist CTEs (coarse k-means + PQ
    codebooks + LUT rank) plus the exact-cosine rerank frame `rr` from
    the fusion vector arm — then the identical [_HN_LO, _HN_HI) band
    filter and (cos DESC, n_id) top-_HN_K rank the exact form uses."""
    from catalyst_spark.queries.pipeline import _HN_HI, _HN_K, _HN_LO

    return (
        _ivfpq_ctes() + "," + _fusion_ivec_ctes() + f"""
        SELECT q_id, "rank", n_id AS neg_id, ROUND(cos_raw, 2) AS cos
        FROM (
          SELECT q_id, n_id, cos_raw,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY cos_raw DESC, n_id)
                   AS "rank"
          FROM rr
          WHERE cos_raw >= {_HN_LO} AND cos_raw < {_HN_HI}) t
        WHERE "rank" <= {_HN_K} ORDER BY q_id, "rank"
    """)


ORACLE_SQL["hard_negative_indexed"] = _hard_negative_indexed_sql()

# serving-overlap sweep (VERDICT r10 item 6 — the merged
# cost-of-the-swap table): per family, the exact form's rows LEFT
# JOINed against the index-served form's — every constituent's full
# SQL embedded verbatim as a subquery (the ann_recall_ladder
# convention), so the overlap rows can never drift from what the
# standalone rungs actually compute
ORACLE_SQL["serving_overlap"] = f"""
    SELECT * FROM (
      SELECT 'fusion' AS family, e.q_id,
             COUNT(i.result_id) AS hits,
             COUNT(*) AS n_exact,
             ROUND(COUNT(i.result_id) * 1.0 / COUNT(*), 2) AS overlap
      FROM (
{ORACLE_SQL["rank_fusion_topk"]}
      ) e
      LEFT JOIN (
{ORACLE_SQL["rank_fusion_indexed"]}
      ) i ON i.q_id = e.q_id AND i.result_id = e.result_id
      GROUP BY e.q_id
      UNION ALL
      SELECT 'hard_negative' AS family, e.q_id,
             COUNT(i.neg_id) AS hits,
             COUNT(*) AS n_exact,
             ROUND(COUNT(i.neg_id) * 1.0 / COUNT(*), 2) AS overlap
      FROM (
{ORACLE_SQL["hard_negative_mining"]}
      ) e
      LEFT JOIN (
{ORACLE_SQL["hard_negative_indexed"]}
      ) i ON i.q_id = e.q_id AND i.neg_id = e.neg_id
      GROUP BY e.q_id
    ) u ORDER BY family, q_id
"""


def _perplexity_buckets_sql() -> str:
    """Oracle twin of pipeline.perplexity_buckets: the verbatim
    unigram_surprisal per-doc SQL as a subquery (the ladder
    convention), source join, integer-rank tercile assignment
    (((rn - 1) * 3) // n — same truncation as Spark's div), and the
    per-(source, bucket) integer audit."""
    return f"""
      WITH per AS (
        SELECT * FROM (
{ORACLE_SQL["unigram_surprisal"]}
        ) _per
      ),
      r AS (
        SELECT p.*, d.source,
               ROW_NUMBER() OVER (PARTITION BY d.source
                                  ORDER BY p.mbits_per_token, p.doc_id)
                 AS rn,
               COUNT(*) OVER (PARTITION BY d.source) AS n_src
        FROM per p JOIN documents d ON d.doc_id = p.doc_id)
      SELECT source,
             CASE ((rn - 1) * 3) // n_src WHEN 0 THEN 'head'
                  WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket,
             COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             CAST((SUM(total_bits) * 1000) // SUM(n_tokens) AS BIGINT)
               AS mbits_per_token
      FROM r GROUP BY 1, 2 ORDER BY source, bucket
    """


ORACLE_SQL["perplexity_buckets"] = _perplexity_buckets_sql()


def _contrastive_triplets_sql() -> str:
    """Oracle twin of pipeline.contrastive_triplets: the shortlist
    exact-cosine frame `rr` (fusion vector-arm CTEs), top-1 positive
    per query by (cos DESC, n_id), negatives ranked over the band with
    the positive excluded BEFORE the rank, margin on raw doubles."""
    from catalyst_spark.queries.pipeline import _HN_HI, _HN_K, _HN_LO

    return (
        _ivfpq_ctes() + "," + _fusion_ivec_ctes() + f""",
        pos AS (
          SELECT q_id, n_id AS pos_id, cos_raw AS pos_cos_raw FROM (
            SELECT q_id, n_id, cos_raw,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY cos_raw DESC, n_id) AS rn
            FROM rr) t WHERE rn = 1),
        negs AS (
          SELECT q_id, pos_id, pos_cos_raw, n_id, cos_raw,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY cos_raw DESC, n_id)
                   AS "rank"
          FROM (
            SELECT r.q_id, p.pos_id, p.pos_cos_raw, r.n_id, r.cos_raw
            FROM rr r JOIN pos p ON p.q_id = r.q_id
            WHERE r.n_id != p.pos_id
              AND r.cos_raw >= {_HN_LO} AND r.cos_raw < {_HN_HI}) b)
        SELECT q_id, pos_id, ROUND(pos_cos_raw, 2) AS pos_cos,
               "rank", n_id AS neg_id, ROUND(cos_raw, 2) AS neg_cos,
               ROUND(pos_cos_raw - cos_raw, 2) AS margin
        FROM negs WHERE "rank" <= {_HN_K} ORDER BY q_id, "rank"
    """)


ORACLE_SQL["contrastive_triplets"] = _contrastive_triplets_sql()


def _cluster_balanced_sample_sql() -> str:
    """Oracle twin of pipeline.cluster_balanced_sample: unrolled
    k-means (_kmeans_sql) + the same nearest-trained-centroid
    assignment, per-cell floor(sqrt(n)) quotas, and the (d2 DESC,
    vec_id) keep rank — d2 via the identical |x|^2 - 2x.c + |c|^2
    sequential-fold decomposition."""
    from catalyst_spark.queries.pipeline import _KMEANS_ITERS

    last_c = f"c{_KMEANS_ITERS}"
    return _kmeans_sql() + f"""
        dist AS (
          SELECT v.vec_id, c.c_id,
                 row_number() OVER (PARTITION BY v.vec_id ORDER BY
                   list_dot_product(v.e, v.e)
                   - 2 * list_dot_product(v.e, c.ce)
                   + list_dot_product(c.ce, c.ce), c.c_id) AS rn
          FROM v, {last_c} c),
        assign AS (SELECT vec_id, c_id FROM dist WHERE rn = 1),
        qd AS (
          SELECT a.vec_id, a.c_id,
                 list_dot_product(v.e, v.e)
                 - 2 * list_dot_product(v.e, c.ce)
                 + list_dot_product(c.ce, c.ce) AS d2_raw
          FROM v JOIN assign a USING (vec_id)
               JOIN {last_c} c USING (c_id)),
        sz AS (
          SELECT c_id, COUNT(*) AS n_vecs,
                 CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT)
                   AS quota
          FROM assign GROUP BY 1),
        rk AS (
          SELECT c_id, vec_id, d2_raw,
                 row_number() OVER (PARTITION BY c_id
                                    ORDER BY d2_raw DESC, vec_id) AS rk
          FROM qd)
        SELECT r.c_id, r.rk, r.vec_id, s.n_vecs, s.quota,
               ROUND(r.d2_raw, 2) AS d2
        FROM rk r JOIN sz s USING (c_id)
        WHERE r.rk <= s.quota
        ORDER BY r.c_id, r.rk
    """


ORACLE_SQL["cluster_balanced_sample"] = _cluster_balanced_sample_sql()


def _dim_truncation_recall_sql() -> str:
    """Oracle twin of pipeline.dim_truncation_recall: per-d brute
    top-5 over the first-d-dims slice (e[1:d]; d=64 IS the exact
    baseline), same (cos DESC, neighbor_id) tie order, then the
    integer hit count per rung. hits uses COUNT(column), never
    SUM(int), so the type stays BIGINT (the HUGEINT // trap)."""
    from catalyst_spark.queries.pipeline import _MRL_DIMS

    parts = ["WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e"
             " FROM embeddings),"]
    for d in _MRL_DIMS:
        parts.append(
            f"nv{d} AS (SELECT vec_id, e[1:{d}] AS s,"
            f" sqrt(list_dot_product(e[1:{d}], e[1:{d}])) AS nrm"
            " FROM v),"
        )
        parts.append(
            f"t{d} AS (SELECT q_id, neighbor_id FROM ("
            " SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,"
            " row_number() OVER (PARTITION BY q.vec_id ORDER BY"
            " list_dot_product(q.s, c.s) / (q.nrm * c.nrm) DESC,"
            " c.vec_id) AS rnk"
            f" FROM nv{d} q JOIN nv{d} c ON q.vec_id != c.vec_id"
            " WHERE q.vec_id % 50 = 0) x WHERE rnk <= 5),"
        )
    last = _MRL_DIMS[-1]
    hits_union = " UNION ALL ".join(
        f"SELECT {d} AS dim_prefix, q_id, neighbor_id FROM t{d}"
        for d in _MRL_DIMS
    )
    dims_values = ", ".join(f"({d})" for d in _MRL_DIMS)
    parts.append(
        f"base AS (SELECT d.dim_prefix, b.q_id, b.neighbor_id"
        f" FROM (VALUES {dims_values}) d(dim_prefix), t{last} b),"
    )
    parts.append(f"h AS ({hits_union})")
    parts.append(
        "SELECT b.dim_prefix, COUNT(h.q_id) AS hits,"
        " COUNT(*) AS n_pairs,"
        " (COUNT(h.q_id) * 1000) // COUNT(*) AS recall_permille"
        " FROM base b LEFT JOIN h USING (dim_prefix, q_id, neighbor_id)"
        " GROUP BY 1 ORDER BY 1"
    )
    return "\n".join(parts)


ORACLE_SQL["dim_truncation_recall"] = _dim_truncation_recall_sql()


def _source_token_tvd_sql() -> str:
    """Oracle twin of pipeline.source_token_tvd: same cleared-
    denominator integer arithmetic — present-token |c_s*N - c*n_s|
    mass plus the folded absent-token term (N - cov_s)*n_s over
    2*N*n_s, HUGEINT accumulators, one truncating `//` at the end
    (CAST to HUGEINT first: DuckDB `//` on DECIMAL is plain
    division) — once over raw tokens (exact) and once over the
    pmod(h60, _DSIR_BUCKETS) hashed-bucket distributions (the
    bounded-state online form; a certified lower bound)."""
    from catalyst_spark.queries.pipeline import _DSIR_BUCKETS

    h = _h60_duck("t")
    return f"""
      WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS t
        FROM documents),
      st AS (SELECT source, t, COUNT(*) AS c_s FROM tok GROUP BY 1, 2),
      ct AS (SELECT t, CAST(SUM(c_s) AS BIGINT) AS c FROM st GROUP BY 1),
      ns AS (SELECT source, CAST(SUM(c_s) AS BIGINT) AS n_s
             FROM st GROUP BY 1),
      tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM ct),
      per AS (
        SELECT s.source, MAX(ns.n_s) AS n_tokens,
               COUNT(*) AS n_types,
               SUM(abs(CAST(s.c_s AS HUGEINT) * tot.n
                       - CAST(ct.c AS HUGEINT) * ns.n_s)) AS pre,
               SUM(CAST(ct.c AS HUGEINT)) AS cov
        FROM st s
             JOIN ct USING (t)
             JOIN ns USING (source), tot
        GROUP BY 1),
      sb AS (SELECT source, {h} % {_DSIR_BUCKETS} AS b,
                    CAST(SUM(c_s) AS BIGINT) AS c_s
             FROM st GROUP BY 1, 2),
      cb AS (SELECT b, CAST(SUM(c_s) AS BIGINT) AS c FROM sb GROUP BY 1),
      perh AS (
        SELECT s.source,
               SUM(abs(CAST(s.c_s AS HUGEINT) * tot.n
                       - CAST(cb.c AS HUGEINT) * ns.n_s)) AS pre,
               SUM(CAST(cb.c AS HUGEINT)) AS cov,
               MAX(ns.n_s) AS n_s
        FROM sb s
             JOIN cb USING (b)
             JOIN ns USING (source), tot
        GROUP BY 1)
      SELECT per.source, per.n_tokens, per.n_types,
             CAST(((per.pre + (CAST(tot.n AS HUGEINT) - per.cov)
                    * CAST(per.n_tokens AS HUGEINT)) * 1000)
                  // (2 * CAST(tot.n AS HUGEINT)
                      * CAST(per.n_tokens AS HUGEINT)) AS BIGINT)
               AS tvd_permille,
             CAST(((perh.pre + (CAST(tot.n AS HUGEINT) - perh.cov)
                    * CAST(perh.n_s AS HUGEINT)) * 1000)
                  // (2 * CAST(tot.n AS HUGEINT)
                      * CAST(perh.n_s AS HUGEINT)) AS BIGINT)
               AS tvd_hash_permille
      FROM per JOIN perh USING (source), tot ORDER BY per.source
    """


ORACLE_SQL["source_token_tvd"] = _source_token_tvd_sql()


def _ann_mrl_rerank_sql() -> str:
    """Oracle twin of pipeline.ann_mrl_rerank_topk: unrolled k-means +
    top-2 cell probes (the multiprobe CTEs), stage-1 rank by the
    truncated e[1:d] cosine (cos16 DESC, n_id) down to _RERANK_R,
    stage-2 exact full-dim rerank of only the shortlist."""
    from catalyst_spark.queries.pipeline import (
        _KMEANS_ITERS,
        _MRL_SERVE_DIM,
        _RERANK_R,
    )

    last_c = f"c{_KMEANS_ITERS}"
    d = _MRL_SERVE_DIM
    return _kmeans_sql() + f"""
        dist AS (
          SELECT v.vec_id, c.c_id,
                 row_number() OVER (PARTITION BY v.vec_id ORDER BY
                   list_dot_product(v.e, v.e)
                   - 2 * list_dot_product(v.e, c.ce)
                   + list_dot_product(c.ce, c.ce), c.c_id) AS rn
          FROM v, {last_c} c),
        members AS (SELECT vec_id AS n_id, c_id FROM dist WHERE rn = 1),
        probes AS (
          SELECT vec_id AS q_id, c_id
          FROM dist WHERE rn <= 2 AND vec_id % 50 = 0),
        nv16 AS (
          SELECT vec_id, e[1:{d}] AS s,
                 sqrt(list_dot_product(e[1:{d}], e[1:{d}])) AS nrm
          FROM v),
        nv AS (
          SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        cand AS (
          SELECT p.q_id, m.n_id
          FROM probes p JOIN members m USING (c_id)
          WHERE m.n_id != p.q_id),
        short AS (
          SELECT q_id, n_id FROM (
            SELECT c.q_id, c.n_id,
                   row_number() OVER (PARTITION BY c.q_id ORDER BY
                     list_dot_product(q.s, n.s) / (q.nrm * n.nrm) DESC,
                     c.n_id) AS srank
            FROM cand c
            JOIN nv16 q ON q.vec_id = c.q_id
            JOIN nv16 n ON n.vec_id = c.n_id) t
          WHERE srank <= {_RERANK_R})
        SELECT q_id, "rank", neighbor_id, ROUND(cos_raw, 2) AS cos FROM (
          SELECT s.q_id, s.n_id AS neighbor_id,
                 list_dot_product(q.e, n.e) / (q.nrm * n.nrm) AS cos_raw,
                 row_number() OVER (PARTITION BY s.q_id ORDER BY
                   list_dot_product(q.e, n.e) / (q.nrm * n.nrm) DESC,
                   s.n_id) AS "rank"
          FROM short s
          JOIN nv q ON q.vec_id = s.q_id
          JOIN nv n ON n.vec_id = s.n_id) t
        WHERE "rank" <= 5 ORDER BY q_id, "rank"
    """


ORACLE_SQL["ann_mrl_rerank_topk"] = _ann_mrl_rerank_sql()

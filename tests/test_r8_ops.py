"""Round-8 operator invariants: the re-k serving schedule, keep-first
span-cut semantics, the incremental-apply mergeability lemma, and the
two ADVICE r7 fixes (fingerprint overflow, empty-graph PageRank)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_serving_k_schedule():
    """k doubles per 4x corpus past _REK_N0 (k ~ sqrt N): every
    correctness scale serves k=16 (so the static k=16 oracle is exact),
    the bench 10x corpus (20k vectors) serves k=32 — the VERDICT r7
    item 2 prescription — and growth continues in powers of two."""
    from catalyst_spark.queries.pipeline import _REK_K, _REK_N0, _serving_k

    assert (_REK_K, _REK_N0) == (16, 4000)
    assert _serving_k(500) == 16      # sf0.001 / sf0.01
    assert _serving_k(2000) == 16     # sf0.1
    assert _serving_k(15999) == 16
    assert _serving_k(16000) == 32
    assert _serving_k(20000) == 32    # bench 10x corpus
    assert _serving_k(63999) == 32
    assert _serving_k(64000) == 64
    assert _serving_k(1_024_000) == 256  # 4^4 * N0 -> four doublings


def test_selfdup_cut_first_is_no_more_aggressive(spark):
    """Keep-first retention can only ever cut a SUBSET of what the
    both-copies variant cuts (owner occurrences are exempt, nothing is
    added), and on a corpus with real duplication it must cut strictly
    less in aggregate; audit arithmetic must reconcile per doc."""
    from catalyst_spark.queries.pipeline import (
        window_selfdup_cut,
        window_selfdup_cut_first,
    )

    both = {r["doc_id"]: r for r in window_selfdup_cut(spark, SF_DIR).collect()}
    first = {r["doc_id"]: r
             for r in window_selfdup_cut_first(spark, SF_DIR).collect()}
    assert both.keys() == first.keys()
    for doc_id, fr in first.items():
        br = both[doc_id]
        assert fr["n_tokens"] == br["n_tokens"]
        assert fr["n_cut"] <= br["n_cut"], doc_id
        n_kept = len(fr["kept_text"].split(" ")) if fr["kept_text"] else 0
        assert n_kept == fr["n_tokens"] - fr["n_cut"], doc_id
    total_both = sum(r["n_cut"] for r in both.values())
    total_first = sum(r["n_cut"] for r in first.values())
    assert total_both > 0  # the corpus really has certified dup spans
    assert total_first < total_both


def test_shard_apply_edge_decomposition(spark):
    """The mergeability lemma incremental_shard_apply's docstring
    claims: because banding is per-doc, the full band-candidate set of
    the union corpus splits EXACTLY into the corpus-internal index plus
    the shard-touching delta — no pair is lost or invented by going
    incremental. (The oracle match then proves the downstream CC/keep
    identity at value level.)"""
    from catalyst_spark.queries.pipeline import (
        _SHARD_MOD,
        _band_buckets_array,
        _minhash_sig_cand,
    )

    sig, _ = _minhash_sig_cand(spark, SF_DIR)
    bands = sig.select(
        "doc_id", F.explode(_band_buckets_array()).alias("bucket")
    ).persist()
    full = {
        (r["a"], r["b"])
        for r in bands.alias("l").join(bands.alias("r"), "bucket")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct().collect()
    }
    ob = bands.where(F.col("doc_id") % _SHARD_MOD != 0)
    nb = bands.where(F.col("doc_id") % _SHARD_MOD == 0)
    idx = {
        (r["a"], r["b"])
        for r in ob.alias("l").join(ob.alias("r"), "bucket")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct().collect()
    }
    delta = {
        (r["a"], r["b"])
        for r in nb.alias("l").join(bands.alias("r"), "bucket")
        .where(F.col("l.doc_id") != F.col("r.doc_id"))
        .select(F.least("l.doc_id", "r.doc_id").alias("a"),
                F.greatest("l.doc_id", "r.doc_id").alias("b"))
        .distinct().collect()
    }
    bands.unpersist()
    assert idx | delta == full
    assert not (idx & delta)  # the split is a partition, not just a cover


def test_shard_apply_keeps_cluster_minima(spark):
    """Post-state sanity against dedup_keep_one semantics: survivors
    are exactly the docs that are their own cluster label (plus
    unclustered docs), and the from_shard flag matches the shard
    predicate row for row."""
    from catalyst_spark.queries.pipeline import (
        _SHARD_MOD,
        incremental_shard_apply,
    )

    out = incremental_shard_apply(spark, SF_DIR).collect()
    ids = [r["doc_id"] for r in out]
    # r14: the terminal display sort was removed (harnesses compare
    # order-insensitively), so assert uniqueness rather than order
    assert len(ids) == len(set(ids))
    for r in out:
        assert r["from_shard"] == (r["doc_id"] % _SHARD_MOD == 0)


def test_fingerprint_masked_sum_semantics(spark):
    """ADVICE r7: the fourth fingerprint term must equal the 40-bit
    masked row-hash sum mod 2^40, accumulated in decimal so ANSI mode
    cannot overflow at scale — verify the value against a per-row
    computation and pin the reported term inside 40 bits."""
    from catalyst_spark import model_store
    from catalyst_spark.queries.pipeline import load

    v = load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    fp = model_store.embeddings_fingerprint(v)
    mask = (1 << 40) - 1
    rows = v.select(
        (F.expr("xxhash64(vec_id, e)").bitwiseAND(F.lit(mask))).alias("m")
    ).collect()
    assert fp[3] == sum(r["m"] for r in rows) % (1 << 40)
    assert 0 <= fp[3] <= mask
    assert fp[0] == len(rows)


def test_pagerank_converged_empty_graph(spark, tmp_path):
    """ADVICE r7: a corpus with zero prefix-filter pairs must yield an
    EMPTY result (matching the DuckDB oracle), not an int(None)
    TypeError from the NULL L1-delta aggregate."""
    from catalyst_spark.queries.pipeline import near_dup_pagerank_converged

    texts = [
        (0, "completely unrelated filler words about maritime law"),
        (1, "a second document sharing not a single three shingle"),
        (2, "third text whose token stream overlaps with neither one"),
    ]
    rows = [(i, t, "en", "srcT", len(t)) for i, t in texts]
    d = str(tmp_path / "nopairs")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    out = near_dup_pagerank_converged(spark, d)
    assert out.count() == 0


# ---------------------------------------------------------------------------
# r8b: PII scrub / boilerplate cut / curation funnel
# ---------------------------------------------------------------------------

def test_pii_counts_follow_injection_schedule(spark):
    """The derived-PII schedule is exact arithmetic on doc_id (every
    doc_id % 7 == 0 carries exactly one email, etc.), so the per-source
    type counts must equal the modulus census — which proves the regex
    EXTRACTION found precisely the injected items, no more, no fewer."""
    from collections import Counter

    from catalyst_spark.queries.pipeline import pii_extract_stats
    from catalyst_spark.tables import load

    docs = load(spark, SF_DIR, "documents").select("doc_id", "source").collect()
    want = Counter()
    for r in docs:
        for name, m in (("email", 7), ("phone", 11), ("ip", 13), ("url", 17)):
            if r["doc_id"] % m == 0:
                want[(r["source"], name)] += 1
    out = pii_extract_stats(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in out) == len(docs)
    for r in out:
        for name in ("email", "phone", "ip", "url"):
            assert r[f"n_{name}"] == want[(r["source"], name)], (
                r["source"], name)
        # masking really removed characters wherever anything matched
        any_n = sum(r[f"n_{n}"] for n in ("email", "phone", "ip", "url"))
        assert (r["red_chars"] > 0) == (any_n > 0)


def test_boilerplate_cut_reconciles_with_chunk_dedup(spark):
    """Cross-operator consistency: the cut pass and the audit pass see
    the SAME boilerplate set (8-token chunks in >= 2 distinct docs), so
    per-source sum(n_cut) == chunk_dedup.n_dup_chunks and chunk counts
    agree; and a doc with nothing cut reassembles to its own text
    byte-for-byte (kept_h == md5(text))."""
    from pyspark.sql import functions as F

    from catalyst_spark.queries.pipeline import (
        boilerplate_line_cut,
        chunk_dedup,
    )
    from catalyst_spark.tables import load

    cut = boilerplate_line_cut(spark, SF_DIR)
    audit = {r["source"]: r for r in chunk_dedup(spark, SF_DIR).collect()}
    per_src = {
        r["source"]: r
        for r in cut.groupBy("source")
        .agg(F.sum("n_chunks").alias("nc"), F.sum("n_cut").alias("cut"))
        .collect()
    }
    assert per_src.keys() == audit.keys()
    for src, r in per_src.items():
        assert r["nc"] == audit[src]["n_chunks"], src
        assert r["cut"] == audit[src]["n_dup_chunks"], src

    docs = {r["doc_id"]: r["text"]
            for r in load(spark, SF_DIR, "documents").collect()}
    import hashlib
    uncut = [r for r in cut.collect() if r["n_cut"] == 0]
    assert uncut, "corpus should have at least one untouched doc"
    for r in uncut:
        want = hashlib.md5(docs[r["doc_id"]].encode()).hexdigest()
        assert r["kept_h"] == want, r["doc_id"]


def test_curation_funnel_stages_reconcile(spark):
    """Funnel arithmetic: monotone nonincreasing docs/tokens; stage 0
    equals the corpus census; stage 1 equals quality_filter's 'pass'
    count — the two operators must never disagree about the same gate."""
    from catalyst_spark.queries.pipeline import curation_funnel, quality_filter
    from catalyst_spark.tables import load

    stages = {r["stage"]: r for r in curation_funnel(spark, SF_DIR).collect()}
    assert sorted(stages) == [0, 1, 2, 3, 4]
    for i in range(1, 5):
        assert stages[i]["n_docs"] <= stages[i - 1]["n_docs"]
        assert stages[i]["n_tokens"] <= stages[i - 1]["n_tokens"]
    assert stages[0]["n_docs"] == load(spark, SF_DIR, "documents").count()
    q_pass = sum(r["n"] for r in quality_filter(spark, SF_DIR).collect()
                 if r["reason"] == "pass")
    assert stages[1]["n_docs"] == q_pass


# ---------------------------------------------------------------------------
# r8c: Gopher rule matrix / duplicated-n-gram coverage / temperature mix
# ---------------------------------------------------------------------------

def test_gopher_rules_cross_reconcile(spark):
    """Cross-operator consistency: (a) the rule matrix censuses every
    doc; (b) a doc that fails NO rule is counted in n_pass, so
    n_docs - n_pass <= sum of per-rule failures (a failing doc fails
    >= 1 rule); (c) repetition_ratio's 0.2 flag is strictly tighter
    than the matrix's 1/8 top-share rule, so per source n_repetitive
    <= n_fail_top — the two operators must rank the same docs."""
    from catalyst_spark.queries.pipeline import (
        gopher_quality_rules,
        repetition_ratio,
    )
    from catalyst_spark.tables import load

    out = {r["source"]: r for r in gopher_quality_rules(spark, SF_DIR).collect()}
    rep = {r["source"]: r for r in repetition_ratio(spark, SF_DIR).collect()}
    assert out.keys() == rep.keys()
    n_docs = load(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in out.values()) == n_docs
    rules = ("bounds", "len", "ttr", "top", "stop")
    for src, r in out.items():
        fail_sum = sum(r[f"n_fail_{k}"] for k in rules)
        assert 0 <= r["n_pass"] <= r["n_docs"]
        assert r["n_docs"] - r["n_pass"] <= fail_sum, src
        assert rep[src]["n_repetitive"] <= r["n_fail_top"], src


def test_dup_ngram_coverage_constructed_corpus(spark, tmp_path):
    """Exact semantics on a hand-built corpus: a doc that is one
    repeated 3-gram end-to-end has positional coverage exactly 1.0 and
    is flagged; a doc with no repeated 3-gram contributes zero
    coverage; the top-2-gram char mass equals occurrences x len(gram)
    for the argmax gram with the (count, gram text) DESC tie-break."""
    from catalyst_spark.queries.pipeline import dup_ngram_coverage

    texts = [
        # "a b c" repeated: every 3-gram duplicated -> coverage 8/8
        (0, "a b c a b c a b"),
        # all-distinct tokens: no duplicated 3-gram, top 2-gram is the
        # lexicographically greatest of the all-count-1 2-grams
        (1, "q w e r t y u i"),
    ]
    rows = [(i, t, "en", f"s{i}", len(t)) for i, t in texts]
    d = str(tmp_path / "dupg")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    out = {r["source"]: r for r in dup_ngram_coverage(spark, d).collect()}
    r0, r1 = out["s0"], out["s1"]
    assert r0["dupn_coverage"] == 1.0 and r0["n_flagged"] == 1
    assert r1["dupn_coverage"] == 0.0 and r1["n_flagged"] == 0
    # doc 0 2-gram counts: "a b" 3 (pos 1,4,7), "b c" 2, "c a" 2 ->
    # argmax is "a b" outright; chars = 3 occurrences * len("a b")
    assert r0["top2_char_ratio"] == round(3 * 3 / len(texts[0][1]), 4)
    # doc 1: every 2-gram count 1, text DESC picks "y u"; 1 * 3 chars
    assert r1["top2_char_ratio"] == round(3 / len(texts[1][1]), 4)


def test_temperature_resample_flattens(spark):
    """Inverse-sqrt temperature must FLATTEN the mixture. The provable
    shape (upsample_s = N / (sum_sqrt * sqrt(n_s))): upsample is
    strictly decreasing in source size, and because
    sqrt(n_max * n_i) >= n_i the LARGEST source always lands <= 1 while
    the smallest always lands >= 1 — the crossing sits at
    (N / sum_sqrt)^2, NOT the mean, so no per-source mean test is
    valid. Shares each sum to ~1; the floor'd budget allocation never
    exceeds the budget."""
    from catalyst_spark.queries.pipeline import (
        _TEMP_BUDGET,
        temperature_resample,
    )

    rows = sorted(temperature_resample(spark, SF_DIR).collect(),
                  key=lambda r: r["src_tokens"])
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-2
    assert abs(sum(r["temp_share"] for r in rows) - 1.0) < 1e-2
    ups = [r["upsample"] for r in rows]
    assert all(a >= b for a, b in zip(ups, ups[1:])), ups  # nonincreasing
    assert ups[0] >= 1.0 - 1e-4   # smallest source never starved
    assert ups[-1] <= 1.0 + 1e-4  # largest source never amplified
    assert sum(r["budget_tokens"] for r in rows) <= _TEMP_BUDGET


def test_label_centroid_similarity_matches_numpy(spark):
    """Third-implementation check (beyond the DuckDB oracle): numpy
    reproduces the op exactly because every step up to the final two
    sqrts is integer — floor-quantize, per-label per-dim sums, integer
    dots/norms — and sqrt is correctly rounded everywhere."""
    import math

    import numpy as np

    from catalyst_spark.queries.pipeline import (
        _CENTROID_Q,
        label_centroid_similarity,
    )
    from catalyst_spark.tables import load

    rows = load(spark, SF_DIR, "embeddings").collect()
    sums: dict[int, np.ndarray] = {}
    counts: dict[int, int] = {}
    for r in rows:
        q = np.floor(np.array(r["embedding"], dtype=np.float64)
                     * _CENTROID_Q).astype(np.int64)
        sums[r["label"]] = sums.get(r["label"], 0) + q
        counts[r["label"]] = counts.get(r["label"], 0) + 1
    want = {}
    for lo in sorted(sums):
        for hi in sorted(sums):
            if lo < hi:
                dot = int(np.dot(sums[lo], sums[hi]))
                n2l = int(np.dot(sums[lo], sums[lo]))
                n2h = int(np.dot(sums[hi], sums[hi]))
                want[(lo, hi)] = round(
                    dot / (math.sqrt(n2l) * math.sqrt(n2h)), 4)
    out = label_centroid_similarity(spark, SF_DIR).collect()
    assert len(out) == len(want)
    for r in out:
        k = (r["label_lo"], r["label_hi"])
        assert r["cosine"] == want[k], k
        assert (r["n_lo"], r["n_hi"]) == (counts[k[0]], counts[k[1]])
        assert -1.0 <= r["cosine"] <= 1.0

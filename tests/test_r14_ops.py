"""Round-14 invariants: the shard-apply compaction cost table.

shard_apply_compaction turns incremental_shard_apply's mergeability
identity into a per-step operating-cost table; these tests pin the
oracle parity, the cross-operator identity at the final step, and the
cost-accounting arithmetic that makes the table readable as a bill.
"""
from __future__ import annotations

from tests.conftest import SF_DIR


def test_compaction_oracle_parity(spark):
    """Bit-exact against the from-scratch-per-prefix DuckDB oracle —
    the green cell IS the compaction-vs-rebuild equivalence, checked
    at every step."""
    from catalyst_spark.queries import ALL_QUERIES, ORACLE_SQL
    from tests.oracle_harness import compare

    compare(ALL_QUERIES["shard_apply_compaction"](spark, SF_DIR),
            ORACLE_SQL["shard_apply_compaction"], SF_DIR)


def test_compaction_final_step_equals_shard_apply(spark):
    """The mergeability identity, cross-operator: after the last
    sub-shard applies, the prefix union is the FULL corpus+shard
    union, so the compaction table's final row must describe exactly
    incremental_shard_apply's survivor set (same pair predicate, same
    keep-lowest rule) — membership fingerprints included, so a
    same-sized-but-different survivor set cannot pass."""
    from pyspark.sql import functions as F

    from catalyst_spark.queries.pipeline import (
        _COMPACT_STEPS,
        incremental_shard_apply,
        shard_apply_compaction,
    )

    final = {r["step"]: r
             for r in shard_apply_compaction(spark, SF_DIR).collect()
             }[_COMPACT_STEPS]
    apply_surv = incremental_shard_apply(spark, SF_DIR).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(doc_id)").alias("x"),
        F.sum("doc_id").alias("s"),
    ).collect()[0]
    assert final["n_survivors"] == apply_surv["n"]
    assert final["survivor_xor"] == apply_surv["x"]
    assert final["survivor_sum"] == apply_surv["s"]


def test_compaction_cost_accounting(spark):
    """The table must read as a bill: arrival partitions the docs
    (step 0 = the corpus split, later steps add sub-shards that
    together are the whole shard), deltas partition the edges (the K
    incremental bills sum to the one rebuild bill), prefixes grow
    monotonically, and removals never exceed arrivals."""
    from catalyst_spark.queries.pipeline import (
        _COMPACT_STEPS,
        _SHARD_MOD,
        shard_apply_compaction,
    )
    from catalyst_spark.tables import load

    rows = {r["step"]: r
            for r in shard_apply_compaction(spark, SF_DIR).collect()}
    assert sorted(rows) == list(range(_COMPACT_STEPS + 1))

    docs = load(spark, SF_DIR, "documents")
    n_all = docs.count()
    n_corpus = docs.where(f"doc_id % {_SHARD_MOD} != 0").count()
    assert rows[0]["n_docs"] == n_corpus
    assert rows[_COMPACT_STEPS]["n_docs"] == n_all

    last = rows[_COMPACT_STEPS]
    assert sum(r["n_delta_edges"] for r in rows.values()) == last["n_edges"]
    for k in range(1, _COMPACT_STEPS + 1):
        prev, cur = rows[k - 1], rows[k]
        assert cur["n_docs"] > prev["n_docs"]
        assert cur["n_edges"] == prev["n_edges"] + cur["n_delta_edges"]
        # keep-lowest can only remove more as edges accumulate
        assert cur["n_removed"] >= prev["n_removed"]
    for r in rows.values():
        assert r["n_removed"] == r["n_docs"] - r["n_survivors"]
        assert 0 <= r["n_removed"] <= r["n_docs"]


def test_cc_labels_keyed_equals_unkeyed(spark):
    """The shared-loop contract of _cc_labels_keyed (r14): for every
    graph id k, the keyed propagation's (doc_id, label) set must equal
    _cc_labels run on that k's edges alone, and both must equal the
    min-reachable-id ground truth from a pure-Python union-find —
    checked on seeded random multigraphs (self-contained components,
    chains, stars, isolated-pair mixes arise naturally at this edge
    density)."""
    import random

    from catalyst_spark.queries.pipeline import _cc_labels, _cc_labels_keyed

    for seed in (0, 1, 2):
        rng = random.Random(seed)
        n, m = 40, 55
        triples = sorted({
            (rng.randrange(4),
             rng.randrange(1, n + 1), rng.randrange(1, n + 1))
            for _ in range(m)
        })
        triples = [(k, a, b) for k, a, b in triples if a != b]
        ked = spark.createDataFrame(
            triples, "k long, a_id long, b_id long")
        keyed = {}
        for r in _cc_labels_keyed(spark, ked).collect():
            keyed.setdefault(r["k"], {})[r["doc_id"]] = r["label"]

        for k in sorted({t[0] for t in triples}):
            ek = [(a, b) for kk, a, b in triples if kk == k]
            # pure-Python union-find ground truth (min reachable id)
            parent = {}

            def find(x):
                parent.setdefault(x, x)
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in ek:
                ra, rb = find(a), find(b)
                if ra != rb:
                    lo, hi = min(ra, rb), max(ra, rb)
                    parent[hi] = lo
            want = {x: find(x) for x in parent}

            assert keyed.get(k, {}) == want, (seed, k)
            unkeyed = {r["doc_id"]: r["label"] for r in _cc_labels(
                spark,
                spark.createDataFrame(ek, "a_id long, b_id long"),
            ).collect()}
            assert unkeyed == want, (seed, k)


def test_semdedup_keep_one_matches_cc_label_path(spark):
    """The r14 in-cell union-find (losers computed inside the gram
    pass) must keep exactly the survivors the old iterative
    _cc_labels path kept: components are confined to cells, so
    per-cell CC == global CC on the semdedup edge set."""
    from pyspark.sql import functions as F

    from catalyst_spark.queries.pipeline import (
        _cc_labels, semdedup_ivf, semdedup_keep_one)
    from catalyst_spark.tables import load

    got = {r["vec_id"] for r in semdedup_keep_one(spark, SF_DIR).collect()}

    pairs = semdedup_ivf(spark, SF_DIR).select("a_id", "b_id")
    labels = _cc_labels(spark, pairs)
    losers = {r["doc_id"] for r in labels.where(
        F.col("doc_id") != F.col("label")).collect()}
    every = {r["vec_id"] for r in
             load(spark, SF_DIR, "embeddings").select("vec_id").collect()}
    assert got == every - losers
    assert losers  # the fixture corpus must exercise the dedup path

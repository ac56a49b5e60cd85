"""Scale-shape checks for the SRP-LSH embedding dedup.

Two properties the oracle can't express:
1. recall — planted near-duplicates (cos ~ 0.98) must be recovered
   (the S-curve for 16 tables x 12 bits predicts ~100% there);
2. sub-quadratic candidate generation — the bucket self-join must
   prune the pair space by orders of magnitude vs all-pairs (the
   round-1 design emitted ~n^2/32 candidates; this pins the fix).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from catalyst_spark.queries.pipeline import _srp_pairs, _srp_planes
from catalyst_spark.tables import load
from tests.conftest import SF_DIR


def _planted_embeddings(spark, n_base=60, n_dups=20, dim=64, seed=7):
    rng = np.random.RandomState(seed)
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist(), 0) for i in range(n_base)]
    planted = []
    for j in range(n_dups):
        src = j  # duplicate the first n_dups base vectors
        noise = rng.standard_normal(dim)
        noise /= np.linalg.norm(noise)
        v = base[src] + 0.2 * noise  # cos(v, base) ~ 0.98
        dup_id = n_base + j
        rows.append((dup_id, v.tolist(), 0))
        planted.append((src, dup_id))
    df = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<DOUBLE>, label INT"
    )
    return df, planted


def test_srp_recall_on_planted_duplicates(spark):
    emb, planted = _planted_embeddings(spark)
    found = {
        (r.a_id, r.b_id) for r in _srp_pairs(spark, emb).collect()
    }
    hits = sum(1 for p in planted if p in found)
    # S-curve at cos 0.98: per-table P ~ 0.45, 16 tables -> ~1-6e-5
    assert hits >= 0.9 * len(planted), (hits, len(planted))


def test_srp_candidates_subquadratic(spark):
    emb = load(spark, SF_DIR, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    planes = spark.createDataFrame(
        _srp_planes(), "t INT, k INT, signs ARRAY<DOUBLE>"
    )
    dots = v.crossJoin(F.broadcast(planes)).select(
        "vec_id", "t", "k",
        F.expr(
            "aggregate(zip_with(e, signs, (x, s) -> x * s),"
            " cast(0 as double), (a, x) -> a + x)"
        ).alias("dot"),
    )
    buckets = dots.groupBy("vec_id", "t").agg(
        F.sum(F.expr(
            "CASE WHEN dot > 0 THEN shiftleft(cast(1 as bigint), k)"
            " ELSE cast(0 as bigint) END"
        )).alias("bucket")
    )
    n = emb.count()
    cand = (
        buckets.alias("l")
        .join(
            buckets.alias("r"),
            (F.col("l.t") == F.col("r.t"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select("l.vec_id", "r.vec_id")
        .distinct()
        .count()
    )
    all_pairs = n * (n - 1) // 2
    # measured at sf0.1: 11,477 of 1,999,000 (174x reduction)
    assert cand < 0.05 * all_pairs, (cand, all_pairs)

"""Mathematical invariants of the late round-6 operators at sf0.001 —
cheap cross-checks that hold for ANY input, complementing the exact
DuckDB differentials (which pin one dataset) with structural truths."""

from __future__ import annotations

from pyspark.sql import functions as F

import iot_etl_spark.plans as P
from iot_etl_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_calibration_bins_invariants(spark):
    rows = P.QUERIES["calibration_bins"](spark, SF_DIR).collect()
    assert rows
    ece = sum(r.ece_contrib for r in rows)
    assert 0.0 <= ece <= 1.0
    for r in rows:
        assert 0.0 <= r.mean_conf <= 1.0
        assert 0.0 <= r.pos_rate <= 1.0
        assert r.n_pos <= r.n_docs
    # bins partition the scored docs
    n_cls = P.QUERIES["quality_classifier_score"](spark, SF_DIR).count()
    assert sum(r.n_docs for r in rows) == n_cls


def test_ndcg_bounds_and_relevance(spark):
    rows = P.QUERIES["ndcg_label_retrieval"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.ndcg <= 1.0
        assert 0 <= r.n_rel <= 10
        # perfect separation iff every relevant ranked first
        if r.n_rel in (0, 10):
            assert r.ndcg in (0.0, 1.0)


def test_srm_chi2_identity(spark):
    rows = P.QUERIES["srm_arm_balance"](spark, SF_DIR).collect()
    assert len(rows) == 4
    n = sum(r.n_users for r in rows)
    chi2 = rows[0].chi2
    assert all(abs(r.chi2 - chi2) < 1e-9 for r in rows)
    assert chi2 >= 0
    # the closed form equals the textbook sum((o-e)^2/e)
    e = n / 4
    direct = sum((r.n_users - e) ** 2 / e for r in rows)
    assert abs(direct - chi2) < 1e-4
    ev = load_table(spark, SF_DIR, "events")
    assert n == ev.select("user_id").distinct().count()


def test_decay_score_bounds(spark):
    rows = P.QUERIES["decayed_engagement_score"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # each event contributes at most 1 (age 0) and more than 0
        assert 0.0 < r.decayed_score <= r.n_events + 1e-9


def test_target_encode_within_value_range(spark):
    ev = load_table(spark, SF_DIR, "events")
    lo, hi = ev.agg(F.min("value"), F.max("value")).first()
    rows = P.QUERIES["target_encode_loo"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # enc is a convex combination of fold-complement targets
        assert lo - 1e-6 <= r.enc_value <= hi + 1e-6


def test_token_inflation_at_least_one(spark):
    rows = P.QUERIES["dedup_token_inflation"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.inflation_ratio >= 1.0 - 1e-9
        assert r.effective_tokens <= r.total_tokens + 1e-6


def test_hard_negatives_are_cross_label(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    rows = P.QUERIES["hard_negative_mining"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.neg_label != labels[r.query_id]
        assert 1 <= r.rank <= 5


def test_source_overlap_matrix_consistency(spark):
    rows = P.QUERIES["source_overlap_matrix"](spark, SF_DIR).collect()
    for r in rows:
        assert r.src_lo <= r.src_hi
        assert 1 <= r.n_docs <= 2 * r.n_pairs

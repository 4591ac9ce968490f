"""Empty-input robustness: every operator must return an empty (or
well-defined) result — never raise — when an upstream stage filters
everything out. At pipeline scale an empty partition/batch is routine
(a selective filter, an empty date range), and one operator crashing
on it kills the whole job."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, "
            "n_chars long")


@pytest.fixture(scope="module")
def empty_events(spark):
    return spark.createDataFrame(
        [], "event_id long, ts long, user_id long, event_type string, "
            "value double")


@pytest.fixture(scope="module")
def empty_emb(spark):
    return spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int")


def test_funnel_empty(empty_events):
    from locustdb_spark.operators.events import funnel

    out = funnel(empty_events, ["view", "click"]).collect()
    # counts exist (one row per step) with zero users
    assert [(r.step, r.users) for r in out] == [(1, 0), (2, 0)]


def test_retention_empty(empty_events):
    from locustdb_spark.operators.events import retention

    assert retention(empty_events).count() == 0


def test_resample_empty(spark, empty_events):
    from locustdb_spark.operators.temporal import (
        resample_forward_fill, resample_zero_fill)

    try:
        assert resample_zero_fill(empty_events, 3600).count() == 0
        assert resample_forward_fill(empty_events, 3600).count() == 0
    finally:
        spark.catalog.clearCache()


def test_dedup_empty(spark, empty_docs):
    from locustdb_spark.operators.dedup import (
        dedup_clusters, exact_duplicates, lsh_candidate_pairs,
        minhash_signatures, simhash)

    try:
        assert exact_duplicates(empty_docs).count() == 0
        sigs = minhash_signatures(empty_docs, num_hashes=4)
        assert sigs.count() == 0
        pairs = lsh_candidate_pairs(sigs, num_hashes=4, bands=2)
        assert pairs.count() == 0
        assert dedup_clusters(empty_docs, pairs).count() == 0
        assert simhash(empty_docs).count() == 0
    finally:
        spark.catalog.clearCache()


def test_text_ops_empty(empty_docs):
    from locustdb_spark.operators.text import (
        gopher_quality_filter, language_id, lexical_diversity,
        quality_score, redact_pii, token_counts)

    for fn in (language_id, quality_score, token_counts,
               lexical_diversity, redact_pii, gopher_quality_filter):
        assert fn(empty_docs).count() == 0


def test_sampling_empty(empty_docs):
    from locustdb_spark.operators.sampling import (
        hash_sample, mixture_sample, pack_sequences, stratified_sample,
        train_val_test_split)

    assert hash_sample(empty_docs, 0.5).count() == 0
    assert mixture_sample(empty_docs, {"a": 1.0}).count() == 0
    assert stratified_sample(empty_docs, "lang", 5).count() == 0
    assert pack_sequences(empty_docs, 100).count() == 0
    assert train_val_test_split(empty_docs).count() == 0


def test_similarity_empty(spark, empty_emb):
    from locustdb_spark.operators.similarity import (
        cosine_topk, knn_join, label_centroids, random_projection)

    try:
        assert cosine_topk(empty_emb, [1.0, 0.0], k=3).count() == 0
        assert knn_join(empty_emb, empty_emb, k=3).count() == 0
        # random_projection/_infer_dims needs a row to infer dims;
        # explicit dims must work on empty input
        assert random_projection(empty_emb, 4, dims=8).count() == 0
        assert label_centroids(empty_emb).count() == 0
    finally:
        spark.catalog.clearCache()


def test_skew_and_temporal_empty(spark, empty_events):
    from locustdb_spark.operators.skew import salted_agg
    from locustdb_spark.operators.temporal import forward_fill

    assert salted_agg(
        empty_events, ["event_type"], {"s": "sum(value)"}).count() == 0
    assert forward_fill(
        empty_events, "event_type", "ts", "value").count() == 0

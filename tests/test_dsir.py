"""DSIR hashed-ngram importance resampling (operators/dsir.py)."""

import math

from pyspark.sql import functions as F

from dataflow_spark.operators.dsir import (
    bucket_log_ratio,
    dsir_log_weights,
    dsir_select,
    hashed_ngram_features,
)


def _docs(spark):
    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the dog sat on the log", "en"),
        (3, "der hund sitzt auf dem baumstamm", "de"),
        (4, "le chat est sur le tapis", "fr"),
        (5, "the cat and the dog", "en"),
        (6, None, "en"),           # null text -> no features, never selected
        (7, "   ", "en"),          # whitespace-only -> no features
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_features_counts_and_bounds(spark):
    d = _docs(spark)
    f = hashed_ngram_features(d, n_buckets=64).toPandas()
    # doc 1: 6 unigrams + 5 bigrams = 11 gram instances
    assert f[f.id == 1].cnt.sum() == 11
    assert f.bucket.between(0, 63).all()
    # empty/null docs produce no feature rows
    assert set(f.id) == {1, 2, 3, 4, 5}


def test_weights_favor_target_like_docs(spark):
    d = _docs(spark)
    feats = hashed_ngram_features(d, n_buckets=256)
    target = hashed_ngram_features(d.filter(F.col("lang") == "en"), n_buckets=256)
    lr = bucket_log_ratio(target, feats, n_buckets=256)
    w = dsir_log_weights(feats, lr).toPandas().set_index("id").logw
    # every English doc with text outweighs every non-English doc
    assert min(w[1], w[2], w[5]) > max(w[3], w[4])
    assert all(math.isfinite(x) for x in w)


def test_select_is_deterministic_and_excludes_featureless(spark):
    d = _docs(spark)
    feats = hashed_ngram_features(d, n_buckets=256)
    target = hashed_ngram_features(d.filter(F.col("lang") == "en"), n_buckets=256)
    w = dsir_log_weights(feats, bucket_log_ratio(target, feats, n_buckets=256))
    s1 = dsir_select(d, w, id_col="doc_id", k=3, seed=9).toPandas()
    s2 = dsir_select(d, w, id_col="doc_id", k=3, seed=9).toPandas()
    assert s1.doc_id.tolist() == s2.doc_id.tolist()  # retry-stable
    assert len(s1) == 3
    assert not {6, 7} & set(s1.doc_id)  # featureless rows never selected
    # a different seed may reorder (gumbel noise differs) but stays valid
    s3 = dsir_select(d, w, id_col="doc_id", k=3, seed=10).toPandas()
    assert len(s3) == 3 and not {6, 7} & set(s3.doc_id)

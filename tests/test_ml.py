"""ML pipeline test: train/evaluate the classifier mapping on the
embeddings fixture (label prediction from vector components)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datamine_v2_0_spark.ml import (
    build_classifier_pipeline,
    confusion_matrix,
    evaluate_classifier,
    stratified_split,
)

SF = "/root/testdata/sf0.001"


def test_classifier_end_to_end(spark):
    """Synthetic separable 3-class data: the full pipeline must learn it."""
    import numpy as np

    rng = np.random.default_rng(42)
    means = {"a": (0.0, 0.0), "b": (5.0, 0.0), "c": (0.0, 5.0)}
    rows = [
        (cls, float(rng.normal(mx, 0.5)), float(rng.normal(my, 0.5)))
        for cls, (mx, my) in means.items()
        for _ in range(120)
    ]
    df = spark.createDataFrame(rows, "cls string, x double, y double")
    train, test = stratified_split(df, "cls", 0.8, seed=42)
    assert train.count() > 0 and test.count() > 0

    pipe = build_classifier_pipeline(["x", "y"], "cls", 3, max_depth=5, n_trees=20)
    model = pipe.fit(train)
    preds = model.transform(test)
    metrics = evaluate_classifier(preds)
    assert metrics["accuracy"] > 0.9, metrics

    cm = confusion_matrix(preds)
    assert cm.agg(F.sum("n")).first()[0] == test.count()


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_classifier_on_embeddings_smoke(spark):
    """Pipeline runs on the driver embeddings fixture (no accuracy bar —
    the synthetic vectors are not linearly separable by component)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = emb.select(
        F.col("label").cast("string").alias("cls"),
        *[F.col("embedding")[i].alias(f"e{i}") for i in range(8)],
    )
    n_classes = df.select("cls").distinct().count()
    train, test = stratified_split(df, "cls", 0.8, seed=42)
    pipe = build_classifier_pipeline(
        [f"e{i}" for i in range(8)], "cls", n_classes, max_depth=5, n_trees=10
    )
    preds = pipe.fit(train).transform(test)
    assert confusion_matrix(preds).agg(F.sum("n")).first()[0] == test.count()


def test_stratified_split_preserves_classes(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(300)], "id long, cls string"
    )
    train, test = stratified_split(df, "cls", 0.8, seed=7)
    train_classes = {r["cls"] for r in train.select("cls").distinct().collect()}
    test_classes = {r["cls"] for r in test.select("cls").distinct().collect()}
    assert train_classes == {"a", "b"} == test_classes
    assert abs(train.count() / 300 - 0.8) < 0.1


def test_stratified_split_partitions_nan_rows(spark):
    """The split must be an exact partition even with NULL/NaN feature
    values (the old all-columns anti-join leaked NaN rows into both
    splits): train∩test = ∅ and train∪test = df."""
    rows = [
        (i, "a" if i % 2 else "b", float("nan") if i % 5 == 0 else float(i), None if i % 7 == 0 else float(i))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, cls string, x double, y double")
    train, test = stratified_split(df, "cls", 0.8, seed=3, id_col="id")
    train_ids = {r["id"] for r in train.select("id").collect()}
    test_ids = {r["id"] for r in test.select("id").collect()}
    assert train_ids & test_ids == set()
    assert train_ids | test_ids == set(range(200))
    assert abs(len(train_ids) / 200 - 0.8) < 0.1


def test_compare_models_ab_harness(spark):
    import numpy as np

    from datamine_v2_0_spark.ml import compare_models

    rng = np.random.default_rng(7)
    means = {"a": (0.0, 0.0), "b": (5.0, 0.0), "c": (0.0, 5.0)}
    rows = [
        (cls, float(rng.normal(mx, 0.5)), float(rng.normal(my, 0.5)))
        for cls, (mx, my) in means.items()
        for _ in range(100)
    ]
    df = spark.createDataFrame(rows, "cls string, x double, y double")
    train, test = stratified_split(df, "cls", 0.8, seed=7)
    got = {
        r["model"]: r
        for r in compare_models(
            train,
            test,
            {
                "deep": build_classifier_pipeline(["x", "y"], "cls", 3,
                                                  max_depth=5, n_trees=20),
                "stump": build_classifier_pipeline(["x", "y"], "cls", 3,
                                                   max_depth=1, n_trees=1),
            },
        ).collect()
    }
    assert set(got) == {"deep", "stump"}
    # separable data: the real model wins; the stump can't split 3 classes
    assert got["deep"]["accuracy"] > 0.9
    assert got["deep"]["accuracy"] > got["stump"]["accuracy"]


def test_stratified_split_balance_assertion(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(400)], "id long, cls string"
    )
    # hash split concentrates per-class fractions near 0.8: passes at a
    # reasonable tolerance, raises at an absurd one
    stratified_split(df, "cls", 0.8, seed=1, id_col="id",
                     assert_balance=True, balance_tol=0.1)
    with pytest.raises(ValueError, match="imbalance"):
        stratified_split(df, "cls", 0.8, seed=1, id_col="id",
                         assert_balance=True, balance_tol=0.001)

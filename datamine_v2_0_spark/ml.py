"""ML surface: the reference's XGBoost event-classification pipeline
re-expressed with Spark MLlib.

Behavioral reference: ckpronto/datamine_v2.0
``STEP 2.1 - LD Event Labeling/02.1.3_train_xgboost_model.py:72-85,240-351``
— 3-class classifier (multi:softprob, max_depth 8, lr 0.1, 500 trees,
hist), LabelEncoder, stratified 80/20 split, accuracy + per-class report.

Spark mapping (SURVEY.md §2.10 ML table):
- LabelEncoder            → StringIndexer
- feature matrix          → VectorAssembler
- XGBClassifier           → xgboost.spark.SparkXGBClassifier when the
  package is importable, else MLlib GBTClassifier (binary) /
  RandomForestClassifier (multiclass) with matched depth/iterations
- train_test_split(stratify) → per-class sampleBy
- accuracy_score / report → MulticlassClassificationEvaluator + a grouped
  confusion DataFrame (operators.validation.ground_truth_diff shape)

Scale notes: tree training shuffles per iteration; keep feature vectors
narrow and cache the assembled training frame. Inference is map-only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.ml import Pipeline
from pyspark.ml.classification import GBTClassifier, RandomForestClassifier
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.feature import StringIndexer, VectorAssembler

try:  # optional, not in this container
    from xgboost.spark import SparkXGBClassifier  # type: ignore
except ImportError:  # pragma: no cover
    SparkXGBClassifier = None


def stratified_split(
    df: DataFrame,
    label_col: str,
    train_fraction: float = 0.8,
    seed: int = 42,
    id_col: str | None = None,
    assert_balance: bool = False,
    balance_tol: float = 0.1,
) -> tuple[DataFrame, DataFrame]:
    """Per-class train/test split via a deterministic hash partition.

    Each row lands in exactly one split — train and test are complementary
    filters on ``pmod(xxhash64(id, seed), 10^6)`` — so train∩test = ∅ and
    train∪test = df by construction, with NO join and NO shuffle (the old
    sampleBy + all-columns anti-join leaked NULL/NaN-bearing rows into both
    splits and collapsed exact duplicates). The hash is independent of the
    label, so per-class fractions concentrate at train_fraction (the same
    Bernoulli guarantee sampleBy gives), which is what stratify=y means at
    scale. ``id_col=None`` hashes all columns — fine for distinct rows;
    pass a unique id to make duplicates split independently-but-
    deterministically by id.

    ``assert_balance=True`` verifies the stratification outcome: every
    class's train fraction must land within ``balance_tol`` of
    train_fraction, else ValueError (one small aggregate job)."""
    cols = [F.col(id_col)] if id_col else [F.col(c) for c in df.columns]
    bucket = F.pmod(F.xxhash64(*cols, F.lit(seed)), F.lit(1_000_000))
    cut = int(train_fraction * 1_000_000)
    train = df.filter(bucket < cut)
    test = df.filter(bucket >= cut)
    if assert_balance:
        stats = (
            df.groupBy(label_col)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count(F.when(bucket < cut, 1)).alias("n_train"),
            )
            .collect()
        )
        bad = {
            r[label_col]: r["n_train"] / r["n"]
            for r in stats
            if abs(r["n_train"] / r["n"] - train_fraction) > balance_tol
        }
        if bad:
            raise ValueError(
                f"stratified_split class imbalance beyond {balance_tol}: {bad}"
            )
    return train, test


def build_classifier_pipeline(
    feature_cols: Sequence[str],
    label_col: str,
    n_classes: int,
    max_depth: int = 8,
    n_trees: int | None = None,
    learning_rate: float = 0.1,
    seed: int = 42,
) -> Pipeline:
    """Indexer + assembler + tree classifier. Uses SparkXGBClassifier when
    available (exact reference algorithm); MLlib trees otherwise.

    ``n_trees=None`` resolves per branch: 500 estimators on the XGB
    branch — parity with the reference trainer's hyperparameters
    (STEP 2.1 - LD Event Labeling/02.1.3_train_xgboost_model.py:72-85:
    n_estimators=500, learning_rate=0.1, max_depth=8, multi:softprob) —
    and 50 trees on the MLlib fallback, where 500 sequential GBT
    iterations would dominate test wall-clock without changing what the
    fallback is for (API-shape coverage when xgboost.spark is absent).
    Pass an explicit ``n_trees`` to override either branch."""
    indexer = StringIndexer(
        inputCol=label_col, outputCol="label", handleInvalid="keep"
    )
    assembler = VectorAssembler(
        inputCols=list(feature_cols), outputCol="features", handleInvalid="keep"
    )
    if SparkXGBClassifier is not None:  # pragma: no cover - not in container
        clf = SparkXGBClassifier(
            max_depth=max_depth,
            n_estimators=500 if n_trees is None else n_trees,
            learning_rate=learning_rate,
            objective="multi:softprob",
            num_class=n_classes,
        )
    elif n_classes <= 2:
        clf = GBTClassifier(
            maxDepth=max_depth,
            maxIter=50 if n_trees is None else n_trees,
            stepSize=learning_rate,
            seed=seed,
        )
    else:
        clf = RandomForestClassifier(
            maxDepth=max_depth,
            numTrees=50 if n_trees is None else n_trees,
            seed=seed,
        )
    return Pipeline(stages=[indexer, assembler, clf])


def evaluate_classifier(predictions: DataFrame) -> dict[str, float]:
    """Accuracy + weighted F1 (the reference's accuracy_score +
    classification_report headline numbers)."""
    out = {}
    # four evaluator jobs share one transform: cache, or the full
    # test-side inference re-executes per metric
    predictions = predictions.select("label", "prediction").cache()
    try:
        for metric in (
            "accuracy", "weightedPrecision", "weightedRecall", "f1"
        ):
            ev = MulticlassClassificationEvaluator(
                labelCol="label", predictionCol="prediction", metricName=metric
            )
            out[metric] = ev.evaluate(predictions)
    finally:
        predictions.unpersist()
    return out


def compare_models(
    train: DataFrame, test: DataFrame, pipelines: dict[str, Pipeline]
) -> DataFrame:
    """A/B model harness (model_comparison_validation.py:111-239): fit
    every candidate pipeline on the SAME train split, evaluate on the
    SAME test split, one metrics row per model. The reference compares
    two XGBoost variants this way; any Pipeline works here."""
    spark = train.sparkSession
    rows = []
    for name, pipe in pipelines.items():
        preds = pipe.fit(train).transform(test)
        m = evaluate_classifier(preds)
        rows.append(
            (
                name,
                float(m["accuracy"]),
                float(m["weightedPrecision"]),
                float(m["weightedRecall"]),
                float(m["f1"]),
            )
        )
    return spark.createDataFrame(
        rows,
        "model string, accuracy double, weighted_precision double, "
        "weighted_recall double, f1 double",
    )


def confusion_matrix(predictions: DataFrame) -> DataFrame:
    """Grouped (label, prediction, n) — the distributed confusion matrix."""
    return (
        predictions.groupBy(
            F.col("label").cast("long").alias("label"),
            F.col("prediction").cast("long").alias("prediction"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "prediction")
    )

"""Model-based document quality filtering.

The standard pre-training pipeline pairs rule-based signals (Gopher
bounds, `text.gopher_signals`) with a TRAINED quality classifier
scoring "does this look like reference text?" (public precedent: the
GPT-3 / CCNet quality filters — a linear model over cheap features,
fasttext-style). This module is that stage on Spark: featurize with
the existing JVM-side text signals, train a logistic regression with
`pyspark.ml` (distributed L-BFGS), score the corpus with the model's
JVM transform — no Python in the scoring hot path.

At 100 TB the shape holds: featurization is a scan-speed projection,
training runs on a (usually small, labeled) sample, and scoring is a
broadcast of the coefficient vector into whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURES = [
    "n_words",
    "mean_word_len",
    "distinct_word_frac",
    "alpha_word_frac",
    "dup_2gram_frac",
    "top_word_frac",
    "punct_ratio",
    "stopword_ratio",
]


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, <FEATURES>) — the classifier's input row, built from the
    Gopher signal scan plus punctuation/stopword ratios."""
    from graphula_spark.operators.text import (
        gopher_signals,
        punct_ratio,
        stopword_ratio,
    )

    sig = gopher_signals(df, id_col, text_col).select(
        id_col,
        "n_words",
        "mean_word_len",
        "distinct_word_frac",
        "alpha_word_frac",
        "dup_2gram_frac",
        "top_word_frac",
    )
    ratios = df.select(
        F.col(id_col),
        punct_ratio(F.col(text_col)).alias("punct_ratio"),
        stopword_ratio(F.col(text_col)).alias("stopword_ratio"),
    )
    return sig.join(ratios, id_col)


def train_quality_model(
    labeled: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str = "label",
    max_iter: int = 50,
):
    """Fit a logistic-regression quality model on labeled documents
    (label 1 = keep-quality, 0 = reject). Returns a fitted
    `PipelineModel` (assembler + scaler + LR) usable with
    `score_quality`."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    feats = quality_features(labeled, id_col, text_col).join(
        labeled.select(id_col, label_col), id_col
    )
    pipe = Pipeline(
        stages=[
            VectorAssembler(
                inputCols=FEATURES, outputCol="__fv", handleInvalid="keep"
            ),
            StandardScaler(inputCol="__fv", outputCol="__fs"),
            LogisticRegression(
                featuresCol="__fs",
                labelCol=label_col,
                maxIter=max_iter,
            ),
        ]
    )
    return pipe.fit(feats)


def score_quality(
    model,
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """(id, quality_prob, quality_pass) for every document — the model's
    keep-probability and a thresholded verdict. Scoring is the fitted
    pipeline's JVM transform over the feature projection."""
    from pyspark.ml.functions import vector_to_array

    feats = quality_features(df, id_col, text_col)
    scored = model.transform(feats)
    prob = F.element_at(vector_to_array(F.col("probability")), 2).cast(
        "double"
    )
    return scored.select(
        F.col(id_col),
        F.round(prob, 6).alias("quality_prob"),
        (prob >= F.lit(threshold)).alias("quality_pass"),
    )


def unigram_logprob_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model_df: DataFrame | None = None,
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-document cross-entropy under a unigram language model — the
    CCNet-style "perplexity filter" reduced to its distributable core
    (CCNet scores against a KenLM 5-gram; the unigram variant keeps the
    same pipeline shape with no external model artifact).

    The model is `model_df` (term, cnt) — typically counted over a
    trusted reference corpus — or, when omitted, the scored corpus
    itself. Unseen terms get an additive-smoothing probability
    `smoothing / (total + smoothing * (vocab + 1))`.

    Returns (id, n_tokens, avg_neg_logprob) for EVERY input document
    (zero-token docs come back with n_tokens=0 and score 0.0): lower =
    more like the reference corpus; filter on a quantile of
    avg_neg_logprob.

    Scale shape: one (doc, term) explode + hash-agg, one join against
    the vocabulary-sized model table (broadcast when it fits), one
    per-doc agg. The model total/vocab ride in a one-row broadcast.
    """
    from graphula_spark.operators.text import tokens

    terms = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    if model_df is None:
        model_df = terms.groupBy("term").agg(F.count("*").alias("cnt"))
    model_df = model_df.select("term", F.col("cnt").cast("double").alias("cnt"))
    totals = model_df.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("vocab")
    )
    scored = (
        terms.join(model_df, "term", "left")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "logp",
            F.log(
                (F.coalesce(F.col("cnt"), F.lit(0.0)) + F.lit(smoothing))
                / (F.col("total") + F.lit(smoothing) * (F.col("vocab") + 1))
            ),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(-F.avg("logp"), 6).alias("avg_neg_logprob"),
    )
    # explode drops empty-token docs; restore them with a left join so
    # the output has one row per input document (like score_quality)
    base = df.select(F.col(id_col)).distinct()
    return (
        base.join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias(
                "n_tokens"
            ),
            F.coalesce(F.col("avg_neg_logprob"), F.lit(0.0)).alias(
                "avg_neg_logprob"
            ),
        )
    )

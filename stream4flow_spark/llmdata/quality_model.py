"""Model-based quality scoring — the learned tier above the heuristic
`quality_features`.

Modern curation pipelines filter pretraining data with a cheap linear
classifier trained on weak labels (reference-corpus-vs-crawl style), not
hand rules alone. This is that operator on Spark ML primitives:
tokenize → feature-hash → logistic regression, all distributed —
training is a handful of LBFGS passes over hashed sparse vectors
(O(corpus) per pass, no collect), and scoring is a map-only transform.

Feature hashing keeps the model size fixed (``num_features``) no matter
the vocabulary, so the broadcast to scorers is bounded at 100 TB; the
hash trick's collisions are the standard accuracy trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_quality_classifier(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    num_features: int = 1 << 15,
    max_iter: int = 20,
    reg_param: float = 0.01,
):
    """Fit tokenizer → hashingTF → logistic regression on weak labels
    (``label_col`` must be 0/1). Returns the fitted PipelineModel."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, Tokenizer

    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol=text_col, outputCol="_words"),
            HashingTF(
                inputCol="_words", outputCol="_feats", numFeatures=num_features
            ),
            LogisticRegression(
                featuresCol="_feats",
                labelCol=label_col,
                maxIter=max_iter,
                regParam=reg_param,
            ),
        ]
    )
    return pipe.fit(docs.withColumn(label_col, F.col(label_col).cast("double")))


def score_quality(
    model, docs: DataFrame, id_cols: list[str] | None = None
) -> DataFrame:
    """Map-only scoring: every doc gets ``quality_prob`` (P(label=1))."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs).withColumn(
        "quality_prob", vector_to_array(F.col("probability"))[1]
    )
    keep = (id_cols or [c for c in docs.columns]) + ["quality_prob"]
    return scored.select(*keep)

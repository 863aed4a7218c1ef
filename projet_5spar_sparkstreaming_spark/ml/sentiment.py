"""Sentiment classification pipeline.

Reference parity for the missing PART4&5.ipynb notebook (its contents
are known only from README.md:81: RegexTokenizer -> StopWordsRemover ->
TF-IDF (HashingTF + IDF) -> LogisticRegression, binary sentiment).
Exposed as an engine transform usable in batch and inside foreachBatch
scoring (SURVEY.md section 2.11).

Scale note: every stage is a narrow map over partitions except IDF's
one aggregate over document frequencies; scoring is a pure projection —
no shuffle, safe to run inside a streaming micro-batch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer, StopWordsRemover
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_sentiment_pipeline(
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 16,
) -> Pipeline:
    """RegexTokenizer -> StopWordsRemover -> HashingTF -> IDF -> LogisticRegression."""
    tokenizer = RegexTokenizer(
        inputCol=text_col, outputCol="__tokens", pattern="\\W+", toLowercase=True
    )
    remover = StopWordsRemover(inputCol="__tokens", outputCol="__filtered")
    tf = HashingTF(inputCol="__filtered", outputCol="__tf", numFeatures=num_features)
    idf = IDF(inputCol="__tf", outputCol="__features")
    lr = LogisticRegression(
        featuresCol="__features", labelCol=label_col, maxIter=50, regParam=0.01
    )
    return Pipeline(stages=[tokenizer, remover, tf, idf, lr])


@dataclass
class SentimentModel:
    model: PipelineModel
    text_col: str

    def classify(self, df: DataFrame, output_col: str = "sentiment") -> DataFrame:
        """Score a DataFrame; adds ``output_col`` (0.0/1.0 prediction)."""
        scored = self.model.transform(df)
        keep = [c for c in df.columns]
        return scored.select(*keep, F.col("prediction").alias(output_col))


def train_sentiment(
    train_df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 16,
) -> SentimentModel:
    pipeline = build_sentiment_pipeline(text_col, label_col, num_features)
    return SentimentModel(model=pipeline.fit(train_df), text_col=text_col)

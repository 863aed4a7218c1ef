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


def _drop_training_summary(pipeline_model: PipelineModel) -> None:
    """Detach every fitted stage's training summary. The summary holds
    a live SparkSession reference (Spark 4.1,
    BinaryLogisticRegressionSummaryImpl.sparkSession, non-transient),
    and once ANY ``Observation`` has been used on that session its
    ``observationManager`` is populated with a non-serializable object
    — after which serializing the model into a task closure (every
    ``transform`` + collect) dies with "Task not serializable".
    This engine uses ``observe`` metrics on index writes, so a scoring
    query in the same application as an index build would fail without
    this. The summary is training-time diagnostics we never read;
    clearing the ``trainingSummary`` var (the state a model loaded
    from disk starts without — persistence never carries a summary)
    keeps classify() a pure column projection."""
    from py4j.protocol import Py4JError
    from pyspark import SparkContext

    jvm = SparkContext._active_spark_context._jvm
    for stage in pipeline_model.stages:
        jobj = getattr(stage, "_java_obj", None)
        if jobj is None:
            continue
        try:
            if jobj.hasSummary():
                getattr(jobj, "trainingSummary_$eq")(jvm.scala.Option.empty())
        except Py4JError:
            # stage type without the HasTrainingSummary trait
            pass


def train_sentiment(
    train_df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 16,
) -> SentimentModel:
    fitted = build_sentiment_pipeline(text_col, label_col, num_features).fit(
        train_df
    )
    _drop_training_summary(fitted)
    return SentimentModel(model=fitted, text_col=text_col)

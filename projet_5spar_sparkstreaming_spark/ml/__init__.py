from projet_5spar_sparkstreaming_spark.ml.sentiment import (
    SentimentModel,
    build_sentiment_pipeline,
    train_sentiment,
)

__all__ = ["SentimentModel", "build_sentiment_pipeline", "train_sentiment"]

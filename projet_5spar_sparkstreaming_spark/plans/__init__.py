from projet_5spar_sparkstreaming_spark.plans import toots

__all__ = ["toots"]

"""Query operators: the aggregation browser and the data-pipeline
operators (dedup, similarity, text analysis, multimodal)."""

from cubes_spark.operators.browser import SparkBrowser

__all__ = ["SparkBrowser"]

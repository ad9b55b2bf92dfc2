from lours_spark.dataset.core import SparkDataset

__all__ = ["SparkDataset"]

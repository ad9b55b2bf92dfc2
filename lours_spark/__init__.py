"""lours_spark — a PySpark-native relational engine for object-detection
datasets and large-scale training-data pipelines.

Re-expresses the capabilities of the reference library XXII-AI/Lours
(a pandas-backed two-table relational ``Dataset`` for images+annotations,
see reference ``lours/dataset/dataset.py:34``) on top of the Spark
DataFrame API: lazy plans, Catalyst optimization, broadcast dimension
joins, window functions, and Arrow-batched grouped-map UDFs for the few
genuinely procedural kernels (greedy IoU matching).

Beyond the reference surface it adds the operators a 100 TB training-data
pipeline needs: deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding-cosine), approximate similarity search, multimodal
binary-column plumbing, and text analysis.
"""

from lours_spark.dataset.core import SparkDataset
from lours_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["SparkDataset", "get_spark", "__version__"]

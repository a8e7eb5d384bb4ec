"""wicsmmiretl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the floschne/wicsmmirETL reference pipeline,
re-expressed Spark-first (DataFrame/SQL/Catalyst, Structured Streaming) and
extended with large-scale training-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis).

Design notes
------------
* Everything is a lazy DataFrame plan; Catalyst does pushdown/pruning/join
  selection. No RDDs, no driver-side loops over collect().
* Python crosses the JVM boundary only through Arrow-batched pandas UDFs /
  mapInPandas, and only for semantics the built-in functions can't express
  (image decode, model-backed NLP backends).
* All operators are designed for multi-executor clusters (broadcast hints for
  dims, salting hooks for skew, AQE-friendly plans) even though tests run on
  local[*].
"""

from wicsmmiretl_spark.session import get_spark, stop_spark
from wicsmmiretl_spark.catalog import load_table, load_tables, TESTDATA_TABLES

__all__ = [
    "get_spark",
    "stop_spark",
    "load_table",
    "load_tables",
    "TESTDATA_TABLES",
]

__version__ = "0.1.0"

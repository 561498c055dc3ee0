"""spark-graft: a PySpark-native analytics engine with the capability
surface of ``carloskafka/spark-streaming-join-example`` (a native
Structured Streaming join demo; snapshot at /root/reference is empty,
see SURVEY.md §0), extended with a full batch relational surface and
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis), designed for 100 TB-scale execution.

Everything here is DataFrame/Catalyst-first: queries are declared with
the public PySpark 4.x DataFrame API so Catalyst owns predicate
pushdown, column pruning, join selection and AQE; Python UDFs appear
only where built-ins genuinely can't express the semantics (and then
always Arrow-vectorized).
"""

from .session import get_spark, ensure_runtime_confs
from .sources.batch import load_table, table_path

__all__ = ["get_spark", "ensure_runtime_confs", "load_table", "table_path"]

"""snowflake_cdc_spark — a PySpark-native analytics / CDC-materialization engine.

Re-implements, Spark-first, the capabilities of the reference
``Upsolver/snowflake-cdc`` client (see /root/reference/add_output.py and
SURVEY.md): CDC event-stream demultiplexing, flatten/prefix projection,
type mapping, upsert-by-key materialization with hard/logical delete
strategies, schema evolution, plus a full relational query surface and
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns).

Architecture: everything is declared through the DataFrame / Spark SQL API
so Catalyst owns optimization (pushdown, pruning, join selection, AQE).
Custom code is confined to control-plane helpers (pipeline specs, catalog,
evolution) and a handful of schema-introspection utilities — faithful to
what the reference itself is: a control plane (SURVEY.md §3).
"""

from snowflake_cdc_spark.session import get_spark, stop_spark
from snowflake_cdc_spark.engine import Engine

__version__ = "0.1.0"

__all__ = ["Engine", "get_spark", "stop_spark", "__version__"]

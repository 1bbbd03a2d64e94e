"""datamine_v2_0_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the query & data-processing
capabilities of the reference pipeline ckpronto/datamine_v2.0 (a batch
ETL + time-series analytics system for mining-truck telemetry), plus
the large-scale training-data operations (dedup, similarity search,
text analysis, multimodal plumbing) such an engine needs at 100 TB.

Design principles (see SURVEY.md §7):
- DataFrame/SQL + Catalyst everywhere; RDDs nowhere.
- Built-in ``pyspark.sql.functions`` (JVM-side, whole-stage codegen)
  for the hot path; Arrow-batched pandas UDFs only where Spark lacks
  the semantics (PELT change-point detection, Savitzky-Golay,
  point-in-polygon).
- Partition by ``device_date`` / time buckets; broadcast small dims;
  no global sorts; approximate variants as the at-scale default with
  exact variants for oracle parity.
"""

__version__ = "0.1.0"

from datamine_v2_0_spark.session import get_spark  # noqa: F401

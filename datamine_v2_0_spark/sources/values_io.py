"""Bulk VALUES insert → temp view (S12).

Behavioral reference: ckpronto/datamine_v2.0 ``psycopg2.extras
.execute_values`` into a temp label table
(``STEP 2.1 .../02.1.2_...label_recombine.py:303-352``); in Spark a local
row list becomes a (broadcastable) DataFrame-backed temp view.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def rows_as_view(
    spark: SparkSession, rows: Sequence, schema, view_name: str | None = None
) -> DataFrame:
    """Materialize driver-side rows as a DataFrame and optionally register
    a temp view for SQL access. Driver-side data should stay small (labels,
    lookup tables) — anything big belongs in a real source."""
    df = spark.createDataFrame(list(rows), schema=schema)
    if view_name:
        df.createOrReplaceTempView(view_name)
    return df

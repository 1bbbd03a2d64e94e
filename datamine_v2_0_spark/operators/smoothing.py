"""Grouped-map smoothing operators (SURVEY.md §2.8 smoothing family, F5).

Savitzky–Golay per group via ``applyInPandas`` — the reference smooths each
device's signal with ``scipy.signal.savgol_filter`` (window<=15, poly 3:
``STEP 2.1 .../02.1.3_train_xgboost_model.py:156-158``; window<=11, poly 2:
``STEP 3 - EDA Analysis/database_pipeline.py:402-420``).

Scale design: one Arrow batch per group key (device/device_date) — group
sizes are bounded (~90k rows/device-day), so executor memory per task is
bounded; the shuffle is the single groupBy exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from datamine_v2_0_spark.functions import signal as _signal
from datamine_v2_0_spark.functions.signal import savgol_filter
from datamine_v2_0_spark.shipping import ship_by_value

ship_by_value(_signal)


def savgol_smooth(
    df: DataFrame,
    group_keys: Sequence[str],
    order_col: str,
    value_col: str,
    out_col: str = "smoothed",
    window: int = 15,
    polyorder: int = 3,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-group Savitzky–Golay smoothing; rows are sorted by `order_col`
    inside each group (order-sensitive kernel — SURVEY.md §7 risk 2).
    Pass ``tiebreak_col`` when order_col can repeat within a group: the
    convolution's operand order on tied rows is otherwise arbitrary and
    the smoothed values become nondeterministic run-to-run."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} double"
    sort_cols = [order_col] + ([tiebreak_col] if tiebreak_col else [])

    def _smooth(pdf):
        pdf = pdf.sort_values(sort_cols, kind="stable").reset_index(drop=True)
        n = len(pdf)
        if n == 0:
            pdf[out_col] = []
            return pdf
        w = min(window, n if n % 2 == 1 else n - 1)
        if w <= polyorder:
            pdf[out_col] = pdf[value_col].astype("float64")
        else:
            pdf[out_col] = savgol_filter(
                pdf[value_col].to_numpy(dtype="float64"), w, polyorder
            )
        return pdf

    return df.groupBy(*group_keys).applyInPandas(_smooth, schema=out_schema)

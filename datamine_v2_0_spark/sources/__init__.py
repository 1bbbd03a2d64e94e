"""Sources and sinks (SURVEY.md §2.1, S1-S14)."""

from datamine_v2_0_spark.sources.csv_io import (  # noqa: F401
    read_csv_validated,
    write_csv_single,
    write_csv_partitioned,
)
from datamine_v2_0_spark.sources.parquet_io import (  # noqa: F401
    read_parquet_pruned,
    list_partitions,
    write_parquet_partitioned,
    write_table_idempotent,
)
from datamine_v2_0_spark.sources.annotations import (  # noqa: F401
    flatten_label_studio,
    read_label_studio_json,
)
from datamine_v2_0_spark.sources.values_io import rows_as_view  # noqa: F401

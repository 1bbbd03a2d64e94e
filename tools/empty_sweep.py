"""Degenerate-input robustness sweep: run EVERY registered contract
query against a zero-row (default) or N-row copy of the testdata
tables and require that none of them raises.

Why: at corpus scale, empty inputs are routine — an empty ingest day, a
filter that matches nothing, a partition with no rows for a key. A
query that divides by a .first()[0] count, indexes an empty collect, or
feeds an empty pandas frame to a kernel works in every bench and dies
on the first quiet day in production. The sweep materializes each
query's plan with a noop write (full execution, no driver collect) so
lazy failures surface too.

Usage: python tools/empty_sweep.py [template_sf_dir] [n_rows|nulls]
n_rows=0 (default) probes the empty case; n_rows=1 probes the
single-row case (stddev-of-one, interpolation with a single point,
self-join of a singleton — all NULL-producing, none crash-producing);
the literal mode ``nulls`` keeps 50 rows per table but NULLs every
non-identifier column — NULL text reaching a shingle kernel or a NULL
embedding reaching a numpy matmul is the production shape of a
half-written upstream row. Exits nonzero listing every query that
raised.
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def main() -> None:
    template = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    mode = sys.argv[2] if len(sys.argv) > 2 else "0"
    nulls = mode == "nulls"
    n_rows = 50 if nulls else int(mode)

    from datamine_v2_0_spark.contract import QUERIES
    from datamine_v2_0_spark.session import get_spark

    spark = get_spark("empty_sweep")
    out_dir = tempfile.mkdtemp(prefix="empty_sf_")
    try:
        from pyspark.sql import functions as F

        def is_id(col: str) -> bool:
            return col.endswith(("key", "_id", "linenumber"))

        for t in TABLES:
            df = spark.read.parquet(f"{template}/{t}.parquet")
            df = df.limit(n_rows)
            if nulls:
                df = df.select(
                    *[
                        df[c] if is_id(c)
                        else F.lit(None).cast(dict(df.dtypes)[c]).alias(c)
                        for c in df.columns
                    ]
                )
            df.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")

        failed: list[tuple[str, str]] = []
        n_ok = 0
        for name, (fn, _sql) in QUERIES.items():
            try:
                df = fn(spark, out_dir)
                df.write.format("noop").mode("overwrite").save()
                n_ok += 1
            except Exception as ex:  # noqa: BLE001
                msg = str(ex).splitlines()[0][:160]
                failed.append((name, f"{type(ex).__name__}: {msg}"))
        for name, err in failed:
            print(f"FAIL  {name}: {err}")
        label = ("all-NULL-payload" if nulls
                 else "empty" if n_rows == 0 else f"{n_rows}-row")
        print(f"{n_ok} ok, {len(failed)} failed on {label} input")
        if failed:
            sys.exit(1)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

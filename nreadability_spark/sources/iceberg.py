"""Iceberg table IO — the production storage path.

This sandbox has no network, so the Iceberg runtime jar cannot be
fetched and these call-sites cannot execute here; they are real code
(not pseudocode) kept import-safe and unit-checked for argument
construction. `sources/lineage.py` implements the identical contract
over partitioned Parquet and is what tests/bench exercise.

Cluster deployment:

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \
      --py-files nreadability_spark.zip \
      jobs/extract.py --table lake.db.transcripts --out lake.db.extracted

Contract parity with the sandbox writer:

| contract                | sandbox (lineage.py)            | Iceberg                         |
|-------------------------|---------------------------------|---------------------------------|
| bucketed layout         | bucket=NNN dirs (xxhash64 pmod) | PARTITIONED BY bucket(N, conv_id) |
| idempotent per-part write | dynamic partition overwrite   | overwritePartitions()           |
| commit atomicity        | manifest rename                 | snapshot commit                 |
| resume discovery        | _lineage/bucket=N.json          | .files metadata table           |
"""

from __future__ import annotations

ICEBERG_RUNTIME_PACKAGE = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"


def iceberg_session_conf(catalog: str = "lake", warehouse: str = "s3://warehouse/lake") -> dict:
    """SparkSession conf for an Iceberg catalog (pass to
    ``session.get_spark(extra_conf=...)`` on a cluster)."""
    return {
        "spark.sql.catalog." + catalog: "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
    }


def create_output_table_ddl(table: str, n_buckets: int = 256) -> str:
    """DDL for the extracted-output table, bucketed by conversation."""
    return f"""
CREATE TABLE IF NOT EXISTS {table} (
  conv_id string, turn_idx int, role string, tool string, ts timestamp,
  title string, content_html string, content_text string,
  extracted boolean, next_page_url string,
  spans array<struct<start:int, end:int>>,
  conv_offset bigint, error string
) USING iceberg
PARTITIONED BY (bucket({n_buckets}, conv_id))
TBLPROPERTIES ('write.distribution-mode' = 'hash')
"""


def write_overwrite_partitions(df, table: str):
    """Atomic per-partition replacement: re-running any input subset is
    idempotent because extraction is deterministic and only the
    partitions present in ``df`` are replaced."""
    df.sortWithinPartitions("conv_id", "turn_idx").writeTo(table).overwritePartitions()


def committed_partitions_sql(table: str) -> str:
    """Resume discovery: distinct committed partitions from the files
    metadata table (anti-joined against source buckets — same contract
    as ``lineage.committed_buckets``)."""
    return f"SELECT DISTINCT partition.conv_id_bucket AS bucket FROM {table}.files"


def is_iceberg_available(spark) -> bool:
    """True when the Iceberg runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001
        return False

"""Storage adapter: Iceberg when a catalog is configured, partitioned
Parquet otherwise (SURVEY.md §7 "Iceberg absence in sandbox").

The engine's operators only see DataFrames; this adapter owns the
read/write surface so a production deployment points it at an Iceberg
catalog (`spark.sql.catalog.<name>` configured, tables addressed as
``catalog.db.table``) and gets identity-partition pruning + snapshot
isolation, while this sandbox exercises the identical semantics on
``partitionBy("ds")`` Parquet directories.

Binary-payload tables always disable parquet dictionary encoding
(see drain3_spark.fixtures.CLIPS_WRITER_OPTIONS for the measurement).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    def __init__(self, spark: SparkSession, catalog: Optional[str] = None):
        """``catalog``: name of a configured Iceberg catalog, or None for
        the Parquet-directory fallback."""
        self.spark = spark
        self.catalog = catalog
        if catalog and not spark.conf.get(f"spark.sql.catalog.{catalog}", None):
            raise ValueError(f"spark.sql.catalog.{catalog} is not configured")

    def _is_table(self, ref: str) -> bool:
        return self.catalog is not None and not ref.startswith(("/", "file:",
                                                                "s3:", "hdfs:"))

    def read(self, ref: str) -> DataFrame:
        if self._is_table(ref):
            return self.spark.read.format("iceberg").load(f"{self.catalog}.{ref}")
        return self.spark.read.parquet(ref)

    def write(self, df: DataFrame, ref: str, partition_by: Optional[str] = "ds",
              mode: str = "append", binary_safe: bool = False) -> None:
        if self._is_table(ref):
            w = df.writeTo(f"{self.catalog}.{ref}")
            if mode == "overwrite":
                w.createOrReplace()
            else:
                w.append()
            return
        w = df.write.mode(mode)
        if binary_safe:
            w = w.option("parquet.enable.dictionary", "false")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(ref)

    def snapshot_id(self, ref: str) -> Optional[int]:
        """Latest Iceberg snapshot id (checkpoint anchor); None on the
        Parquet fallback (the CheckpointStore markers own that role)."""
        if not self._is_table(ref):
            return None
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self.catalog}.{ref}.snapshots "
            f"ORDER BY committed_at DESC LIMIT 1").collect()
        return int(rows[0][0]) if rows else None

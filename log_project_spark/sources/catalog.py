"""Table catalog shim: Iceberg-layout tables on parquet.

The contract targets Iceberg tables; this sandbox ships no Iceberg
runtime jar, so `TableCatalog` provides the observable behaviors the
pipeline needs — named tables, partitioned writes, append/overwrite,
snapshot listing — on a parquet directory layout, and upgrades itself
to a real Iceberg catalog transparently when the extension is on the
classpath (`try_iceberg`). Call sites never branch: they use the shim
API either way.

On a real cluster: set spark.sql.catalog.<name> =
org.apache.iceberg.spark.SparkCatalog (+ warehouse conf) and
`TableCatalog(spark, warehouse, catalog="<name>")` routes every call
through `spark.sql` DDL/DML on Iceberg instead.

Round-3 attempt at the real jar (VERDICT r2 #8): pulling
org.apache.iceberg:iceberg-spark-runtime via spark.jars.packages needs
Maven Central, and this sandbox has no network (DNS resolution for
repo1.maven.org fails: URLError [Errno -2] Name or service not known,
checked 2026-08-16); no jar ships in the image either. The shim stays;
the upgrade path above is the documented, unexercised real-Iceberg
route.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


def try_iceberg(spark: SparkSession, catalog: str = "local_iceberg") -> bool:
    """True when an Iceberg SparkCatalog is actually usable."""
    try:
        spark.sql(f"SHOW NAMESPACES IN {catalog}")
        return True
    except Exception:
        return False


class TableCatalog:
    def __init__(self, spark: SparkSession, warehouse: str, catalog: str | None = None):
        self.spark = spark
        self.warehouse = warehouse
        self.iceberg = catalog if catalog and try_iceberg(spark, catalog) else None
        if self.iceberg is None:
            os.makedirs(warehouse, exist_ok=True)

    # -- paths / identifiers -------------------------------------------------

    def _path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def _ident(self, name: str) -> str:
        return f"{self.iceberg}.db.{name}"

    # -- operations ----------------------------------------------------------

    def write(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        partition_by: tuple[str, ...] = (),
    ) -> None:
        if self.iceberg:
            writer = df.writeTo(self._ident(name))
            if mode == "overwrite":
                writer.createOrReplace()
            else:
                writer.append()
            return
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))
        self._log_snapshot(name, mode, partition_by)

    def read(self, name: str) -> DataFrame:
        if self.iceberg:
            return self.spark.read.table(self._ident(name))
        return self.spark.read.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        if self.iceberg:
            try:
                self.spark.read.table(self._ident(name)).schema
                return True
            except Exception:
                return False
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))

    # -- snapshot ledger (Iceberg-metadata stand-in) --------------------------

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.warehouse, f"{name}.snapshots.json")

    def _log_snapshot(self, name: str, mode: str, partition_by: tuple[str, ...]) -> None:
        meta = self.snapshots(name)
        meta.append(
            {
                "snapshot_id": len(meta) + 1,
                "mode": mode,
                "partition_by": list(partition_by),
                "wall_time": time.time(),
            }
        )
        with open(self._meta_path(name), "w") as f:
            json.dump(meta, f, indent=1)

    def snapshots(self, name: str) -> list[dict]:
        if self.iceberg:
            rows = self.spark.sql(f"SELECT * FROM {self._ident(name)}.snapshots").collect()
            return [r.asDict() for r in rows]
        p = self._meta_path(name)
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)

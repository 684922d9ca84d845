"""Iceberg-table checkpoint store — the production target of CheckpointStore.

CheckpointStore degrades to plain parquet directories because this sandbox
ships no Iceberg runtime jar; on a real cluster every stage snapshot is an
Iceberg table write (`df.writeTo(tbl).createOrReplace()`) and every
incremental index append is one transactional snapshot commit
(`df.writeTo(tbl).append()`), which makes the staged-rename commit protocol
in ann_index.append unnecessary — the snapshot IS the atomic publish.

This module wires that path for real behind the same API. `available()`
probes the session for a working Iceberg catalog; callers (and the pytest)
skip gracefully when the jar is absent. The config-hash validation protocol
is byte-identical to the parquet store: a side JSON per stage under the
store root, because validation must fail loudly BEFORE any Spark read and
table properties are not readable without the catalog.

Reference parity: annoy persists one mmap'd file and validates geometry on
load (/root/reference/src/annoylib.h:1093-1222, 1185-1188); here the unit
of persistence is a catalog table and validation is the config-hash stamp.

Usage:

    spark = (SparkSession.builder
             .config("spark.sql.catalog.local",
                     "org.apache.iceberg.spark.SparkCatalog")
             .config("spark.sql.catalog.local.type", "hadoop")
             .config("spark.sql.catalog.local.warehouse", "/tmp/wh")
             .getOrCreate())
    store = IcebergCheckpointStore("/tmp/ck_meta", cfg, spark,
                                   catalog="local", namespace="dedup_run1")
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from annoy_spark.config import DedupConfig
from annoy_spark.sources.checkpoint import CheckpointStore


def available(spark: SparkSession, catalog: str = "local") -> bool:
    """True iff `catalog` resolves to a usable Iceberg catalog in this
    session (the runtime jar is on the classpath AND the catalog is
    configured). Probe = SHOW NAMESPACES, the cheapest catalog-touching
    statement; any plugin/classpath failure means 'not available'."""
    if not re.fullmatch(r"[A-Za-z0-9_]+", catalog):
        return False
    try:
        spark.sql(f"SHOW NAMESPACES IN {catalog}").collect()
        return True
    except Exception:
        return False


class IcebergCheckpointStore(CheckpointStore):
    """CheckpointStore with Iceberg tables as the data plane.

    Stage data lives in `{catalog}.{namespace}.{stage}`; the config-hash
    meta JSON + _SUCCESS markers stay on the filesystem under `root`
    (same files, same validation semantics as the parquet store), so
    every caller of exists/validate_or_raise/invalidate works unchanged.
    """

    def __init__(
        self,
        root: str,
        cfg: DedupConfig,
        spark: SparkSession,
        catalog: str = "local",
        namespace: str = "annoy_spark",
    ):
        super().__init__(root, cfg)
        if not re.fullmatch(r"[A-Za-z0-9_]+", catalog):
            raise ValueError(f"invalid catalog {catalog!r}")
        if not re.fullmatch(r"[A-Za-z0-9_]+", namespace):
            raise ValueError(f"invalid namespace {namespace!r}")
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")

    def _table(self, stage: str) -> str:
        if not re.fullmatch(r"[A-Za-z0-9_]+", stage):
            raise ValueError(f"invalid stage name {stage!r}")
        return f"{self.catalog}.{self.namespace}.{stage}"

    def write(self, stage: str, df: DataFrame, **extra) -> None:
        df.writeTo(self._table(stage)).using("iceberg").createOrReplace()
        self._stamp(stage, **extra)

    def append(self, stage: str, df: DataFrame, **extra) -> None:
        # one transactional snapshot — the atomic-append path that the
        # parquet store emulates with staged renames (ann_index.append)
        self.validate_or_raise(stage)
        df.writeTo(self._table(stage)).append()
        self.restamp(stage, **extra)

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        self.validate_or_raise(stage)
        if not self.exists(stage):
            raise FileNotFoundError(f"no valid checkpoint for stage '{stage}'")
        return spark.read.table(self._table(stage))

    def _stamp(self, stage: str, **extra) -> None:
        # reuse the parent's meta format; parquet's _SUCCESS marker is
        # emulated so exists() stays a pure filesystem check
        d = self._dir(stage)
        d.mkdir(parents=True, exist_ok=True)
        (d / "_SUCCESS").write_text("")
        self.restamp(stage, table=self._table(stage), **extra)

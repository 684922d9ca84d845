"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the operator inventory (SURVEY.md §2) over the driver's
parquet tables; ``oracle_sql()`` returns DuckDB SQL with bit-identical
semantics (generated from the same templates — see annoy_spark/gates/).
``entry(spark)`` runs the flagship dedup pipeline end-to-end at sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from annoy_spark.gates import queries as G
from annoy_spark.operators.cluster import connected_components

_TESTDATA_DEFAULT = "/root/testdata/sf0.001"


def _register(spark: SparkSession, sf_dir: str) -> None:
    for name in ("documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)


def _sql_query(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register(spark, sf_dir)
        return spark.sql(G.spark_sql_for(name))

    run.__name__ = f"q_{name}"
    return run


def _duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified-edge connected components via the iterative large-star /
    small-star operator (annoy_spark.operators.cluster)."""
    _register(spark, sf_dir)
    edges = spark.sql(G.duplicate_clusters_edges_sql_spark())
    nodes = spark.sql(G.duplicate_clusters_nodes_sql_spark())
    return connected_components(edges, nodes)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full dedup (sign -> band -> verify -> cluster) at sf0.001."""
    return _duplicate_clusters(spark, _TESTDATA_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: _sql_query(name) for name in G.TEMPLATES
    }
    out["duplicate_clusters"] = _duplicate_clusters
    return out


def oracle_sql() -> dict[str, str]:
    out = {name: G.duck_sql_for(name) for name in G.TEMPLATES}
    out["duplicate_clusters"] = G.q_duplicate_clusters_duck()
    return out

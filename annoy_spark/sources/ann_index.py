"""Persistent ANN index: build once -> save -> load/mmap -> query by vector.

Annoy's headline lifecycle (/root/reference/src/annoylib.h:1093-1222
``save``/``load``; README.rst:25-27 "you can not share memory between
processes ... unless you mmap the same file"; the golden-index contract of
test/index_test.py:29-34) re-expressed Spark-first:

- the ROUTER (forest trees / IVF centroids / LSH plane seeds) is a small
  driver-side model serialized as one npz next to a config-hash-stamped
  meta file — the analog of annoy's node header;
- the INDEX BODY (which items live in which bucket, plus the item vectors
  for the exact re-rank) is two parquet artifacts written through the same
  config-validated CheckpointStore as the dedup pipeline's stages — on a
  production cluster these are Iceberg tables, shared by every executor,
  which is the distributed analog of annoy's mmap-shared index file;
- loading validates the stored config hash exactly like annoy's
  ``size % _s == 0`` geometry check (annoylib.h:1185-1188): querying an
  index built under different semantics fails loudly, never silently.

Query semantics (get_nns_by_vector, annoylib.h:1234-1236): the query batch
is routed with the SAME stored trees/centroids/planes, replicated across
each oversized bucket's salt sub-buckets (the replicated skew join — no
candidate lost to the item-side salting), equi-joined against the stored
bucket assignments, deduped NARROW on (qid, nid), and exact re-ranked in
the true metric (annoylib.h:1492-1494). ``spill_eps`` is applied on the
QUERY side only — annoy's search_k is a query-time knob
(annoylib.h:1447-1480), so one stored index serves every accuracy budget.

Scale shape: query batches are assumed small relative to the corpus
(online lookups) and are broadcast; the stored buckets/items relations are
only ever scanned and equi-joined (candidate side is tiny after the narrow
dedup, so AQE broadcasts it instead of shuffling the item table).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, replace

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from annoy_spark.operators.forest import Tree, build_forest, forest_leaf_udf
from annoy_spark.operators.ivf import _probe_udf, train_centroids
from annoy_spark.operators.knn import (
    _dot,
    _norm2,
    hamming_keys_col,
    hyperplane_keys_udf,
    pstable_keys_udf,
)
from annoy_spark.sources.checkpoint import CheckpointStore

_KIND_METRICS = {
    "forest": ("angular", "euclidean"),
    "ivf": ("angular", "euclidean"),
    "lsh": ("angular", "dot", "euclidean", "manhattan", "hamming"),
}


@dataclass(frozen=True)
class AnnIndexConfig:
    """Frozen index geometry — the analog of annoy's (f, metric) schema
    fixed at construction and validated at load (annoylib.h:1185-1188).
    ``dim`` is inferred at build time (int64 WORDS for hamming)."""

    kind: str = "forest"        # 'forest' | 'ivf' | 'lsh'
    metric: str = "angular"
    seed: int = 42
    dim: int = 0                # 0 = infer at build
    # forest
    n_trees: int = 8
    leaf_cap: int = 32
    # ivf
    n_centroids: int = 64
    nprobe: int = 4
    # lsh
    n_tables: int = 8
    n_bits: int = 10
    bucket_width: float = 2.0   # p-stable quantization width
    # shared
    bucket_cap: int = 2000
    max_sample: int = 50_000
    sample_fraction: float = 1.0

    def __post_init__(self) -> None:
        if self.kind not in _KIND_METRICS:
            raise ValueError(f"unknown index kind {self.kind!r}")
        if self.metric not in _KIND_METRICS[self.kind]:
            raise ValueError(
                f"kind {self.kind!r} supports metrics "
                f"{_KIND_METRICS[self.kind]}, got {self.metric!r}"
            )

    def config_hash(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "AnnIndexConfig":
        return cls(**json.loads(s))


def _unit(raw: F.Column) -> F.Column:
    n = F.sqrt(_norm2(raw))
    return F.when(n > 0, F.transform(raw, lambda x: x / n)).otherwise(raw)


def _stored_vec(cfg: AnnIndexConfig, vec_col: str) -> F.Column:
    """The vector representation persisted with the index and used by the
    exact re-rank: unit vectors for angular (annoy caches norms,
    annoylib.h:483), packed int64 words for hamming, raw doubles else."""
    if cfg.metric == "hamming":
        return F.col(vec_col).cast("array<long>")
    raw = F.col(vec_col).cast("array<double>")
    return _unit(raw) if cfg.metric == "angular" else raw


def _distance(cfg: AnnIndexConfig, qv: str, nv: str) -> F.Column:
    """Exact re-rank distance in the true metric (annoylib.h:1492-1494);
    same forms as knn_bruteforce."""
    if cfg.metric == "angular":
        return F.sqrt(
            F.greatest(F.lit(0.0), F.lit(2.0) - 2.0 * _dot(qv, nv))
        )
    if cfg.metric == "dot":
        return -_dot(qv, nv)  # annoylib.h:656-659 (-dot, ascending)
    if cfg.metric == "euclidean":
        diff = F.zip_with(qv, nv, lambda x, y: x - y)
        return F.sqrt(F.greatest(F.lit(0.0), _norm2(diff)))
    if cfg.metric == "manhattan":
        return F.aggregate(
            F.zip_with(qv, nv, lambda x, y: F.abs(x - y)),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    # hamming: popcount of XOR over packed words (annoylib.h:736-743)
    return F.aggregate(
        F.zip_with(
            qv, nv, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).cast("double")


class AnnModel:
    """In-memory router model: the trained arrays + config. Everything in
    ``arrays`` round-trips through one npz file; LSH planes are NOT stored
    because they are a pure function of (seed, dim, tables, bits) — the
    same set_seed determinism contract as annoy (annoylib.h:1256-1262).
    The one data-DEPENDENT LSH scalar (the MIPS max-norm M², computed from
    the build items — annoylib.h:605-703 preprocess) IS stored."""

    def __init__(self, cfg: AnnIndexConfig, arrays: dict[str, np.ndarray]):
        self.cfg = cfg
        self.arrays = arrays

    # --- training --------------------------------------------------------
    @classmethod
    def train(
        cls,
        items: DataFrame,
        cfg: AnnIndexConfig,
        id_col: str,
        vec_col: str,
    ) -> "AnnModel":
        arrays: dict[str, np.ndarray] = {}
        if cfg.kind == "forest":
            trees = build_forest(
                items, n_trees=cfg.n_trees, leaf_cap=cfg.leaf_cap,
                seed=cfg.seed, metric=cfg.metric, vec_col=vec_col,
                id_col=id_col, max_sample=cfg.max_sample,
                sample_fraction=cfg.sample_fraction,
            )
            arrays["normals"] = np.concatenate([t.normals for t in trees])
            arrays["offsets"] = np.concatenate([t.offsets for t in trees])
            arrays["children"] = np.concatenate([t.children for t in trees])
            arrays["tree_sizes"] = np.asarray(
                [len(t.offsets) for t in trees], dtype=np.int64
            )
        elif cfg.kind == "ivf":
            arrays["centroids"] = train_centroids(
                items, cfg.n_centroids, cfg.seed, vec_col, cfg.metric,
                max_train=cfg.max_sample,
                sample_fraction=cfg.sample_fraction, id_col=id_col,
            )
        elif cfg.metric == "dot":
            raw = F.col(vec_col).cast("array<double>")
            max_n2 = items.select(F.max(_norm2(raw)).alias("m")).first()["m"]
            arrays["max_n2"] = np.asarray([max_n2 or 0.0], dtype=np.float64)
        return cls(cfg, arrays)

    # --- routing ---------------------------------------------------------
    def trees(self) -> list[Tree]:
        out, at = [], 0
        for n in self.arrays["tree_sizes"]:
            n = int(n)
            out.append(
                Tree(
                    normals=self.arrays["normals"][at : at + n],
                    offsets=self.arrays["offsets"][at : at + n],
                    children=self.arrays["children"][at : at + n],
                )
            )
            at += n
        return out

    def keys_col(
        self, vec_col: str, query_side: bool, spill_eps: float = 0.0
    ) -> F.Column:
        """array<long> bucket keys for one row. query_side controls the
        asymmetric knobs: forest spill (search_k analog — query-time only),
        IVF nprobe (items live in 1 cell, queries probe nprobe), MIPS
        augmentation (items sqrt(M²-|x|²), queries 0 — annoylib.h:605-703).
        """
        cfg = self.cfg
        if cfg.kind == "forest":
            udf = forest_leaf_udf(
                self.trees(), spill_eps=spill_eps if query_side else 0.0
            )
            return udf(_stored_vec(cfg, vec_col))
        if cfg.kind == "ivf":
            nprobe = cfg.nprobe if query_side else 1
            udf = _probe_udf(self.arrays["centroids"], nprobe, cfg.metric)
            return udf(F.col(vec_col).cast("array<double>"))
        # lsh
        raw = F.col(vec_col).cast("array<double>")
        if cfg.metric == "angular":
            udf = hyperplane_keys_udf(cfg.dim, cfg.n_tables, cfg.n_bits,
                                      cfg.seed)
            return udf(raw)
        if cfg.metric == "dot":
            udf = hyperplane_keys_udf(cfg.dim + 1, cfg.n_tables, cfg.n_bits,
                                      cfg.seed)
            if query_side:
                aug = F.concat(raw, F.array(F.lit(0.0)))
            else:
                m2 = float(self.arrays["max_n2"][0])
                aug = F.concat(
                    raw,
                    F.array(F.sqrt(F.greatest(F.lit(0.0),
                                              F.lit(m2) - _norm2(raw)))),
                )
            return udf(aug)
        if cfg.metric in ("euclidean", "manhattan"):
            udf = pstable_keys_udf(
                cfg.dim, cfg.n_tables, cfg.n_bits, cfg.seed,
                cfg.bucket_width, p=2 if cfg.metric == "euclidean" else 1,
            )
            return udf(raw)
        # hamming: JVM-side bit sampling, no UDF
        return hamming_keys_col(
            F.col(vec_col).cast("array<long>"), cfg.dim, cfg.n_tables,
            cfg.n_bits, cfg.seed,
        )


def _infer_dim(items: DataFrame, vec_col: str) -> int:
    row = items.select(vec_col).first()
    if row is None or row[0] is None or len(row[0]) == 0:
        raise ValueError(
            "cannot build an ANN index from an empty items relation / "
            "empty vectors (annoy requires >= 1 added item before build)"
        )
    return len(row[0])


def _bucket_artifacts(
    items: DataFrame,
    model: AnnModel,
    id_col: str,
    vec_col: str,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(item_vectors, bucket_assignments, oversized_sizes):
    item_vectors (nid, v); assignments (bucket, salt, nid) — buckets past
    bucket_cap are hash-split into m = ceil(gsize/cap) salt sub-buckets
    (the _cap_buckets ladder); sizes (bucket, m) holds ONLY oversized
    buckets, so it stays broadcast-sized and queries replicate across
    exactly the same m the items hashed into."""
    cfg = model.cfg
    base = items.select(
        F.col(id_col).alias("nid"),
        _stored_vec(cfg, vec_col).alias("v"),
        model.keys_col(vec_col, query_side=False).alias("keys"),
    )
    vectors = base.select("nid", "v")
    bucketed = base.select("nid", F.explode("keys").alias("bucket"))
    sizes = (
        bucketed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("gsize"))
        .where(F.col("gsize") > cfg.bucket_cap)
        .select(
            "bucket",
            F.ceil(F.col("gsize") / cfg.bucket_cap).cast("long").alias("m"),
        )
        # two consumers (item salting + query replication): materialize the
        # tiny oversized-bucket relation once so the routing UDF lineage
        # does not re-run per consumer
        .localCheckpoint(eager=True)
    )
    assign = bucketed.join(F.broadcast(sizes), "bucket", "left").select(
        "bucket",
        F.coalesce(
            F.pmod(F.xxhash64("nid", "bucket"), F.col("m")),
            F.lit(0).cast("long"),
        ).alias("salt"),
        "nid",
    )
    return vectors, assign, sizes


def _query_plan(
    queries: DataFrame,
    vectors: DataFrame,
    assign: DataFrame,
    sizes: DataFrame,
    model: AnnModel,
    k: int,
    id_col: str,
    vec_col: str,
    spill_eps: float,
) -> DataFrame:
    """(qid, nid, rank, distance): route queries with the stored model,
    replicate across oversized buckets' salts, equi-join stored
    assignments, dedup NARROW (ids only), re-attach vectors, exact
    re-rank."""
    cfg = model.cfg
    qbase = queries.select(
        F.col(id_col).alias("qid"),
        _stored_vec(cfg, vec_col).alias("qv"),
        model.keys_col(vec_col, query_side=True, spill_eps=spill_eps)
        .alias("keys"),
    )
    qroutes = qbase.select("qid", F.explode("keys").alias("bucket"))
    if sizes.isEmpty():
        # common case: no bucket ever exceeded bucket_cap, every stored
        # salt is 0 — skip the replication join entirely (one fewer
        # broadcast join + Generate in every online serving query; the
        # isEmpty probe reads one tiny parquet/checkpoint footer)
        qroutes = qroutes.select(
            "qid", "bucket", F.lit(0).cast("long").alias("salt")
        )
    else:
        qroutes = qroutes.join(F.broadcast(sizes), "bucket", "left").select(
            "qid", "bucket",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.coalesce(F.col("m"), F.lit(1).cast("long")) - 1,
                )
            ).alias("salt"),
        )
    # query-derived sides are broadcast BY CONTRACT (query batches are
    # online-lookup-sized; the stored buckets/vectors relations are the
    # 10^12-row side and must only ever be streamed) — the hint pins the
    # build side so the plan holds at any corpus scale
    cand = (
        F.broadcast(qroutes).join(assign, ["bucket", "salt"])
        .select("qid", "nid")
        .dropDuplicates(["qid", "nid"])
    )
    joined = F.broadcast(cand).join(vectors, "nid").join(
        F.broadcast(qbase.select("qid", "qv")), "qid"
    )
    scored = joined.select(
        "qid", "nid", _distance(cfg, "qv", "v").alias("distance")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("distance").asc(), F.col("nid")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


_MODEL_STAGE = "model"
_NPZ = "model.npz"


class AnnIndex:
    """A built (optionally persisted) index: model + bucket artifacts."""

    def __init__(
        self,
        model: AnnModel,
        vectors: DataFrame,
        assign: DataFrame,
        sizes: DataFrame,
    ):
        self.model = model
        self.cfg = model.cfg
        self._vectors = vectors
        self._assign = assign
        self._sizes = sizes

    def query(
        self,
        queries: DataFrame,
        k: int,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        spill_eps: float = 0.0,
    ) -> DataFrame:
        """get_nns_by_vector over the stored index (annoylib.h:1234-1236):
        (qid, nid, rank, distance). spill_eps widens the forest candidate
        set at query time (the search_k analog)."""
        return _query_plan(
            queries, self._vectors, self._assign, self._sizes, self.model,
            k, id_col, vec_col, spill_eps,
        )


def build_index(
    spark: SparkSession,
    items: DataFrame,
    root: str,
    cfg: AnnIndexConfig,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> AnnIndex:
    """Train the router, route every item once, persist model + artifacts
    (annoy ``build`` + ``save``, annoylib.h:1037-1127). Returns the live
    index (no reload needed to query immediately)."""
    if cfg.dim == 0:
        cfg = replace(cfg, dim=_infer_dim(items, vec_col))
    model = AnnModel.train(items, cfg, id_col, vec_col)
    vectors, assign, sizes = _bucket_artifacts(items, model, id_col, vec_col)
    store = CheckpointStore(root, cfg)
    store.write("vectors", vectors)
    store.write("buckets", assign)
    store.write("sizes", sizes)
    mdir = store.root / _MODEL_STAGE
    mdir.mkdir(parents=True, exist_ok=True)
    np.savez(mdir / _NPZ, **model.arrays)
    (mdir / "_ANNOY_SPARK_META.json").write_text(
        json.dumps(
            {
                "stage": _MODEL_STAGE,
                "config_hash": cfg.config_hash(),
                "config": json.loads(cfg.to_json()),
            },
            sort_keys=True,
        )
    )
    return AnnIndex(
        model,
        store.read(spark, "vectors"),
        store.read(spark, "buckets"),
        store.read(spark, "sizes"),
    )


def load_index(
    spark: SparkSession,
    root: str,
    expected: AnnIndexConfig | None = None,
) -> AnnIndex:
    """annoy ``load`` (annoylib.h:1167-1222): read the stored model +
    artifacts, validating the config hash — passing ``expected`` asserts
    the stored index was built under exactly that config (the geometry
    check; a mismatch raises, annoylib.h:1185-1188)."""
    from pathlib import Path

    meta_path = Path(root) / _MODEL_STAGE / "_ANNOY_SPARK_META.json"
    if not meta_path.exists():
        raise FileNotFoundError(f"no ANN index model under {root}")
    meta = json.loads(meta_path.read_text())
    cfg = AnnIndexConfig.from_json(json.dumps(meta["config"]))
    if cfg.config_hash() != meta["config_hash"]:
        raise ValueError(f"corrupt index meta under {root}")
    if expected is not None:
        # dim is inferred at build; an expectation with dim=0 asserts every
        # OTHER knob (the caller did not know the dimension up front)
        exp = expected if expected.dim else replace(expected, dim=cfg.dim)
        if exp.config_hash() != cfg.config_hash():
            raise ValueError(
                f"index at {root} was built with config {cfg.config_hash()} "
                f"but {exp.config_hash()} was requested — refusing to "
                "query with mixed semantics (annoy load-validation analog)"
            )
    with np.load(Path(root) / _MODEL_STAGE / _NPZ) as z:
        arrays = {k: z[k] for k in z.files}
    model = AnnModel(cfg, arrays)
    store = CheckpointStore(root, cfg)
    return AnnIndex(
        model,
        store.read(spark, "vectors"),
        store.read(spark, "buckets"),
        store.read(spark, "sizes"),
    )


def knn_by_vector_approx(
    items: DataFrame,
    queries: DataFrame,
    cfg: AnnIndexConfig,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    spill_eps: float = 0.0,
) -> DataFrame:
    """Ephemeral by-vector path (no persistence): train + route + query in
    one plan — the ``queries=`` backend for knn_forest/knn_ivf/knn_lsh."""
    if cfg.dim == 0:
        cfg = replace(cfg, dim=_infer_dim(items, vec_col))
    model = AnnModel.train(items, cfg, id_col, vec_col)
    vectors, assign, sizes = _bucket_artifacts(items, model, id_col, vec_col)
    return _query_plan(
        queries, vectors, assign, sizes, model, k, id_col, vec_col, spill_eps
    )

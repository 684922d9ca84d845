"""BAND stage: signatures -> candidate edges (+ exact-dup edges).

The analog of Annoy's forest traversal candidate generation
(/root/reference/src/annoylib.h:1447-1480): items sharing a band key are
candidates, exactly as items sharing a leaf in >= 1 tree are. The skew
defenses mirror Annoy's split-imbalance fallback (annoylib.h:1337-1425):

1. sha256 pre-collapse — byte-identical files contribute ONE representative
   to LSH (their edges are emitted directly), so boilerplate mega-groups
   cost O(g) instead of O(g^2);
2. tiered enumeration — small groups (<= cfg.pair_enum_cap) enumerate all
   pairs (full verified-edge recall); medium groups enumerate star edges to
   the group minimum only (O(g), clusters restored by CC); huge groups
   (> cfg.band_group_cap) use a SALTED two-level star — members point at a
   per-salt-bucket minimum, bucket minima point at the group minimum — so
   no single reducer materializes the group's pairs and nothing is dropped
   (the north rule's salted repartitioning). Huge groups are additionally
   *accounted* (skipped_groups checkpoint) for skew observability.

KNOWN APPROXIMATION of tiers 2-3 (deliberate, same tradeoff as Annoy's
random-side fallback): star edges are verified INDIVIDUALLY against the
group minimum, so two members that are true near-duplicates of each other
but both fail verification against gmin are not linked through this band
group. This only bites when a band group is *heterogeneous* — a band
collision between documents that aren't actually similar to the group min
— which for groups past pair_enum_cap (>64 docs agreeing on 4 minhashes)
is overwhelmingly boilerplate families where members DO verify against
gmin. The pair still has bands-1 other chances to collide in a small
group, the substring pass links long verbatim blocks independently, and
capped groups are accounted in skipped_groups so the recall exposure is
observable, not silent. Raising pair_enum_cap trades reducer cost for
exact enumeration (config knob, per-deployment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from annoy_spark.config import DedupConfig


def exact_edges(signatures: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(representatives, exact_dup_edges): collapse byte-identical files.

    representatives: one row per distinct content_sha (min file_id wins).
    exact_dup_edges: (u=rep, v=member) for every non-representative member —
    star edges; CC expands them to full clusters.
    """
    # window-min instead of groupBy+join-back: one shuffle, no second scan
    w = Window.partitionBy("content_sha")
    with_rep = signatures.withColumn("rep_id", F.min("file_id").over(w))
    edges = (
        with_rep.where(F.col("file_id") != F.col("rep_id"))
        .select(F.col("rep_id").alias("u"), F.col("file_id").alias("v"))
    )
    representatives = with_rep.where(
        F.col("file_id") == F.col("rep_id")
    ).drop("rep_id")
    return representatives, edges


def all_candidate_edges(
    signatures: DataFrame, cfg: DedupConfig
) -> tuple[DataFrame, DataFrame]:
    """One stage: (edges with kind in ('exact','lsh'), skipped_groups).

    Exact (sha-equal) star edges pass verification by construction; LSH
    band-group edges still face the exact re-rank. Emitting both in one
    DataFrame keeps the pipeline at one checkpoint per named artifact
    (signatures / candidate_edges / clusters — the north rule's list)."""
    representatives, ex_edges = exact_edges(signatures)
    lsh, skipped = candidate_edges(representatives, cfg)
    edges = ex_edges.select(
        "u", "v", F.lit("exact").alias("kind"),
        F.lit(0).alias("from_star"),
    ).unionByName(lsh.select("u", "v", "kind", "from_star"))
    return edges, skipped


def candidate_edges(
    representatives: DataFrame, cfg: DedupConfig
) -> tuple[DataFrame, DataFrame]:
    """(candidate_pairs, skipped_groups) from banded signatures.

    candidate_pairs: distinct (u < v) file-id pairs sharing >= 1 band key.
    skipped_groups: (band_idx, band_key, n_members) for capped groups.
    """
    bands = (
        representatives.where(F.col("n_shingles") >= 1)
        .select("file_id", F.posexplode("band_keys").alias("band_idx", "band_key"))
    )

    # one shuffle total for group stats: window aggregates attach the group
    # min (star center) and size to every member — no join-back scan
    w = Window.partitionBy("band_idx", "band_key")
    annotated = bands.select(
        "file_id", "band_idx", "band_key",
        F.min("file_id").over(w).alias("gmin"),
        F.count(F.lit(1)).over(w).alias("gsize"),
    )
    # materialize ONCE: five consumers reference this relation (skipped +
    # three tiers, twice in the tier-1 self-join) and Spark re-ran the
    # explode + window sort per reference (guide §2.4 / §5). Narrow rows
    # (5 int64-ish cols); lazily checkpointed — the first consumer's job
    # materializes it. Block loss just fails the pipeline stage, which the
    # per-stage checkpoint protocol already re-runs from `signatures`.
    annotated = annotated.localCheckpoint(eager=False)

    skipped = (
        annotated.where(F.col("gsize") > cfg.band_group_cap)
        .groupBy("band_idx", "band_key")
        .agg(F.first("gsize").alias("n_members"))
    )

    # tier 1: full pair enumeration inside small groups — the self-join key
    # equals the window partitioning, so no re-shuffle of either side
    in_small = annotated.where(
        (F.col("gsize") > 1) & (F.col("gsize") <= cfg.pair_enum_cap)
    ).select("band_idx", "band_key", "file_id")
    full_pairs = (
        in_small.alias("a")
        .join(in_small.alias("b"), ["band_idx", "band_key"])
        .where(F.col("a.file_id") < F.col("b.file_id"))
        .select(F.col("a.file_id").alias("u"), F.col("b.file_id").alias("v"))
    )

    # tier 2: star edges to the group min — directly from window columns,
    # zero additional shuffles
    star_pairs = annotated.where(
        (F.col("gsize") > cfg.pair_enum_cap)
        & (F.col("gsize") <= cfg.band_group_cap)
        & (F.col("file_id") != F.col("gmin"))
    ).select(F.col("gmin").alias("u"), F.col("file_id").alias("v"))

    # tier 3: salted two-level star for huge groups — the salt spreads the
    # per-bucket window across cfg.salt_buckets reducers
    huge = annotated.where(F.col("gsize") > cfg.band_group_cap).select(
        "band_idx", "band_key", "file_id", "gmin",
        F.pmod(F.xxhash64("file_id"), F.lit(cfg.salt_buckets)).alias("salt"),
    )
    ws = Window.partitionBy("band_idx", "band_key", "salt")
    sub = huge.select(
        "*", F.min("file_id").over(ws).alias("smin")
    )
    salted_pairs = (
        sub.where(F.col("file_id") != F.col("smin"))
        .select(F.col("smin").alias("u"), F.col("file_id").alias("v"))
        .unionByName(
            sub.where(
                (F.col("file_id") == F.col("smin"))
                & (F.col("smin") != F.col("gmin"))
            ).select(F.col("gmin").alias("u"), F.col("smin").alias("v"))
        )
    )

    # tier provenance: 'lsh' = fully enumerated (tier 1); 'lsh_star' = star
    # approximation (tiers 2-3) whose verification failures are eligible
    # for the rescue pass (pipeline.py) — two star members that are true
    # near-dups of each other but not of the group min would otherwise
    # never get a direct edge and their cluster would silently split.
    # A pair seen by BOTH tiers keeps kind='lsh' (already fully enumerated
    # somewhere) but RETAINS from_star=1: rescue eligibility must survive
    # the min-collapse, or a (center, member) edge that also occurred in a
    # small band group would silently drop the member from the center's
    # failed-member set and the split the rescue pass exists to fix could
    # still occur through that path.
    pairs = (
        full_pairs.select("u", "v", F.lit("lsh").alias("kind"))
        .unionByName(star_pairs.select("u", "v", F.lit("lsh_star").alias("kind")))
        .unionByName(salted_pairs.select("u", "v", F.lit("lsh_star").alias("kind")))
        .groupBy("u", "v")
        .agg(
            F.min("kind").alias("kind"),
            F.max(
                F.when(F.col("kind") == "lsh_star", 1).otherwise(0)
            ).alias("from_star"),
        )
    )
    return pairs, skipped

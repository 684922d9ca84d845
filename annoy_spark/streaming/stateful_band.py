"""Custom stateful streaming operator: incremental banded-LSH candidate
generation with TTL-bounded per-band-key state (applyInPandasWithState).

The batch pipeline's candidate stage is a groupBy over band keys; its
streaming re-expression keeps, per (band_idx, band_key), the ids of the
most recent members (annoy's per-leaf candidate list, a forest leaf IS a
band bucket — /root/reference/src/annoylib.h:1447-1480) and emits an
(existing, new) candidate pair the moment a new file lands in an occupied
bucket. Pairs still face the exact re-rank downstream (annoylib.h:
1492-1494) — this operator only proposes.

State is BOUNDED on two axes (the round-1 lesson: unbounded streaming
state OOMs the state store at 10^12-file ingest):

- per key: at most ``per_key_cap`` member ids (a ring buffer — the cap is
  the streaming twin of the batch tier ladder's band_group_cap; overflow
  evicts the OLDEST members, and evicted-member pairs are intentionally
  lost, mirroring the batch ladder's capped enumeration);
- per lifetime: a processing-time TTL — a bucket silent for
  ``state_ttl_min`` minutes is dropped (the dedup HORIZON, same contract
  as exact_dedup_stream's watermark).

Dedup among in-flight rows of the same micro-batch is included: new
members pair with each other (u < v) as well as with the remembered state.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from annoy_spark.config import DedupConfig
from annoy_spark.operators.sign import sign
from annoy_spark.streaming.dedup_stream import CORPUS_SCHEMA

OUTPUT_SCHEMA = "u long, v long, band_idx int, band_key long"
STATE_SCHEMA = "members array<long>"


def _make_pair_fn(per_key_cap: int, ttl_ms: int):
    def emit_pairs(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        band_idx, band_key = key
        if state.hasTimedOut:
            state.remove()
            return
        (members,) = state.get if state.exists else ([],)
        members = list(members)
        # parallel set for O(1) membership tests (the list keeps eviction
        # order); rebuilt on eviction — eviction is rare (only past the cap)
        member_set = set(members)
        out_u, out_v = [], []
        for pdf in pdfs:
            for fid in pdf["file_id"]:
                fid = int(fid)
                if fid in member_set:
                    continue  # replayed row (idempotent re-delivery)
                for m in members:
                    a, b = (m, fid) if m < fid else (fid, m)
                    out_u.append(a)
                    out_v.append(b)
                members.append(fid)
                member_set.add(fid)
                if len(members) > per_key_cap:
                    evicted = members[: -per_key_cap]
                    members = members[-per_key_cap:]  # evict oldest
                    member_set.difference_update(evicted)
        state.update((members,))
        if ttl_ms > 0:
            state.setTimeoutDuration(ttl_ms)
        if out_u:
            yield pd.DataFrame(
                {
                    "u": pd.Series(out_u, dtype="int64"),
                    "v": pd.Series(out_v, dtype="int64"),
                    "band_idx": pd.Series(
                        [band_idx] * len(out_u), dtype="int32"
                    ),
                    "band_key": pd.Series(
                        [band_key] * len(out_u), dtype="int64"
                    ),
                }
            )

    return emit_pairs


def band_candidates_stream_df(
    stream: DataFrame,
    cfg: DedupConfig,
    per_key_cap: int = 64,
    state_ttl_min: int = 24 * 60,
) -> DataFrame:
    """Streaming corpus DataFrame -> streaming candidate-pair DataFrame.

    Exposed separately from the query starter so tests and alternative
    sinks can compose it.

    state_ttl_min=0 disables the processing-time TTL (NoTimeout). This is
    REQUIRED for availableNow drain mode: with pending processing-time
    timeouts the engine keeps scheduling empty micro-batches to fire them,
    so an availableNow query never terminates. Continuous deployments keep
    the TTL (the dedup horizon); drain-mode batch jobs bound state by
    per_key_cap alone."""
    sigs = sign(stream, cfg)
    bands = sigs.where(F.col("n_shingles") >= 1).select(
        "file_id",
        F.posexplode("band_keys").alias("band_idx", "band_key"),
    )
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_min > 0
        else GroupStateTimeout.NoTimeout
    )
    return bands.groupBy("band_idx", "band_key").applyInPandasWithState(
        _make_pair_fn(per_key_cap, state_ttl_min * 60_000),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        timeout_conf,
    )


def band_candidates_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: DedupConfig,
    per_key_cap: int = 64,
    state_ttl_min: int = 24 * 60,
    available_now: bool = True,
) -> StreamingQuery:
    """File-source streaming query: new corpus parquet under input_dir ->
    candidate pairs appended to out_dir (exactly-once via checkpoint)."""
    stream = spark.readStream.schema(CORPUS_SCHEMA).parquet(input_dir)
    pairs = band_candidates_stream_df(
        stream, cfg, per_key_cap=per_key_cap, state_ttl_min=state_ttl_min
    )
    writer = (
        pairs.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

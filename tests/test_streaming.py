"""Structured Streaming dedup tests: incremental edges vs a static
signature snapshot + first-writer-wins exact dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from annoy_spark.config import DedupConfig
from annoy_spark.operators.sign import sign
from annoy_spark.streaming.dedup_stream import (
    exact_dedup_stream,
    incremental_dedup_stream,
)

CFG = DedupConfig(enable_substring=False)
SCHEMA = "repo string, path string, commit string, lang string, content string"


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def static_corpus(spark):
    base = " ".join(f"alpha{i} beta{i % 7} gamma{i % 13}" for i in range(120))
    other = " ".join(f"delta{i} eps{i % 5}" for i in range(150))
    return _rows(
        spark,
        [
            ("r0", "a.py", "c0", "python", base),
            ("r0", "b.py", "c0", "python", other),
        ],
    ), base, other


def test_incremental_dedup_stream(spark, static_corpus, tmp_path):
    corpus, base, other = static_corpus
    static_sigs = sign(corpus, CFG).cache()
    static_sigs.count()

    inp = str(tmp_path / "in")
    # near-dup of a.py (prefix trimmed) + brand-new unique file
    batch1 = _rows(
        spark,
        [
            ("r9", "new1.py", "c9", "python", base[30:]),
            ("r9", "new2.py", "c9", "python", "totally different words here"),
        ],
    )
    batch1.write.mode("append").parquet(inp)

    q = incremental_dedup_stream(
        spark, inp, static_sigs, str(tmp_path / "out"),
        str(tmp_path / "ck"), CFG,
    )
    q.awaitTermination(120)

    edges = spark.read.parquet(str(tmp_path / "out"))
    got = edges.select("u", "v", "kind").collect()
    a_id = corpus.where("path = 'a.py'").select(
        F.xxhash64("repo", "path", "commit")
    ).first()[0]
    new1_id = batch1.where("path = 'new1.py'").select(
        F.xxhash64("repo", "path", "commit")
    ).first()[0]
    assert any(r.u == a_id and r.v == new1_id for r in got), got
    # the unique new file must produce no edges
    new2_id = batch1.where("path = 'new2.py'").select(
        F.xxhash64("repo", "path", "commit")
    ).first()[0]
    assert not any(new2_id in (r.u, r.v) for r in got)

    # second drop: an exact copy of b.py arrives
    _rows(spark, [("r9", "new3.py", "c9", "python", other)]) \
        .write.mode("append").parquet(inp)
    q2 = incremental_dedup_stream(
        spark, inp, static_sigs, str(tmp_path / "out"),
        str(tmp_path / "ck"), CFG,
    )
    q2.awaitTermination(120)
    edges2 = spark.read.parquet(str(tmp_path / "out"))
    kinds: dict = {}
    for r in edges2.collect():
        kinds.setdefault((r.u, r.v), set()).add(r.kind)
    b_id = corpus.where("path = 'b.py'").select(
        F.xxhash64("repo", "path", "commit")
    ).first()[0]
    new3_id = _rows(spark, [("r9", "new3.py", "c9", "python", other)]).select(
        F.xxhash64("repo", "path", "commit")
    ).first()[0]
    assert "exact" in kinds.get((b_id, new3_id), set()), kinds


def test_incremental_stream_within_batch_dups(spark, static_corpus, tmp_path):
    """Two near-identical NEW files in one micro-batch must be linked even
    though neither matches anything in the static snapshot."""
    corpus, base, other = static_corpus
    static_sigs = sign(corpus, CFG).cache()
    static_sigs.count()

    text = " ".join(f"zeta{i} eta{i % 11} theta{i % 3}" for i in range(140))
    inp = str(tmp_path / "in")
    batch = _rows(
        spark,
        [
            ("rn", "p.py", "c1", "python", text),
            ("rn", "q.py", "c1", "python", text[25:]),   # near-dup of p.py
            ("rn", "r.py", "c1", "python", text),        # exact dup of p.py
        ],
    )
    batch.write.mode("append").parquet(inp)

    q = incremental_dedup_stream(
        spark, inp, static_sigs, str(tmp_path / "out"),
        str(tmp_path / "ck"), CFG,
    )
    q.awaitTermination(120)
    edges = spark.read.parquet(str(tmp_path / "out"))
    ids = {
        r.path: r.fid
        for r in batch.select(
            "path", F.xxhash64("repo", "path", "commit").alias("fid")
        ).collect()
    }
    linked = {frozenset((r.u, r.v)) for r in edges.collect()}
    assert frozenset((ids["p.py"], ids["r.py"])) in linked   # exact intra
    assert frozenset((ids["p.py"], ids["q.py"])) in linked \
        or frozenset((ids["q.py"], ids["r.py"])) in linked   # near intra


def test_exact_dedup_stream_state_is_watermarked(spark, tmp_path):
    """The dedup state must be horizon-bounded: the plan uses
    dropDuplicatesWithinWatermark (event-time TTL), not an ever-growing
    dropDuplicates, and the state row count tracks distinct in-horizon
    shas."""
    inp = str(tmp_path / "in")
    _rows(
        spark,
        [("r1", f"f{i}.py", "c1", "python", f"bytes {i % 3}")
         for i in range(30)],
    ).write.mode("append").parquet(inp)

    q = exact_dedup_stream(
        spark, inp, str(tmp_path / "out"), str(tmp_path / "ck"),
        dedup_horizon="10 seconds",
    )
    q.awaitTermination(120)
    progress = q.lastProgress
    op = progress["stateOperators"][0]
    assert "dedupeWithinWatermark" in op["operatorName"], op["operatorName"]
    # state holds one row per distinct sha (3), not one per input row (30)
    assert op["numRowsTotal"] == 3, op
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 3


def test_exact_dedup_stream_first_writer_wins(spark, tmp_path):
    inp = str(tmp_path / "in")
    _rows(
        spark,
        [
            ("r1", "x.py", "c1", "python", "same bytes"),
            ("r1", "y.py", "c1", "python", "same bytes"),
            ("r1", "z.py", "c1", "python", "other bytes"),
        ],
    ).write.mode("append").parquet(inp)

    q = exact_dedup_stream(
        spark, inp, str(tmp_path / "out"), str(tmp_path / "ck")
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    rows = out.collect()
    assert len(rows) == 2  # one winner per distinct sha
    assert {r.content_sha for r in rows} == {
        r.content_sha
        for r in _rows(
            spark,
            [("a", "a", "a", "python", "same bytes"),
             ("a", "a", "a", "python", "other bytes")],
        ).select(F.sha2("content", 256).alias("content_sha")).collect()
    }


def test_stateful_band_candidates_across_restarts(spark, tmp_path):
    """applyInPandasWithState candidate generation: same-batch pairs are
    emitted immediately; state survives a checkpointed restart so a later
    batch pairs against remembered members."""
    from annoy_spark.operators.sign import file_id_col
    from annoy_spark.streaming.stateful_band import band_candidates_stream

    base = " ".join(f"tok{i % 31} word{i % 11} line" for i in range(200))
    inp, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))

    def fid(repo, path, commit="c"):
        return _rows(spark, [(repo, path, commit, "python", "x")]).select(
            file_id_col().alias("f")
        ).first().f

    batch1 = _rows(
        spark,
        [
            ("r", "a.py", "c", "python", base + " enda"),
            ("r", "b.py", "c", "python", base + " endb"),
            ("r", "solo.py", "c", "python",
             " ".join(f"unique{i}" for i in range(200))),
        ],
    )
    batch1.write.mode("append").parquet(inp)
    band_candidates_stream(
        spark, inp, out, ck, CFG, state_ttl_min=0, available_now=True
    ).awaitTermination(240)

    pairs1 = {
        (r.u, r.v)
        for r in spark.read.parquet(out).select("u", "v").distinct().collect()
    }
    a, b, c = fid("r", "a.py"), fid("r", "b.py"), fid("r", "c.py")
    assert tuple(sorted((a, b))) in pairs1, "same-batch pair must be emitted"

    # batch 2 after a restart: near-dup of a/b must pair via restored state
    batch2 = _rows(spark, [("r", "c.py", "c", "python", base + " endc")])
    batch2.write.mode("append").parquet(inp)
    band_candidates_stream(
        spark, inp, out, ck, CFG, state_ttl_min=0, available_now=True
    ).awaitTermination(240)

    pairs2 = {
        (r.u, r.v)
        for r in spark.read.parquet(out).select("u", "v").distinct().collect()
    }
    assert tuple(sorted((a, c))) in pairs2, "state must survive the restart"
    assert tuple(sorted((b, c))) in pairs2


def test_stateful_band_per_key_cap_bounds_pairs(spark, tmp_path):
    """per_key_cap bounds both state size and per-arrival emitted pairs:
    n same-band docs with cap=4 must yield far fewer than C(n,2) pairs."""
    from annoy_spark.streaming.stateful_band import band_candidates_stream

    base = " ".join(f"cap{i % 17} tok{i % 7}" for i in range(150))
    n = 12
    rows = [("r", f"f{i}.py", "c", "python", base + f" t{i}") for i in range(n)]
    inp, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    _rows(spark, rows).write.mode("append").parquet(inp)
    band_candidates_stream(
        spark, inp, out, ck, CFG, per_key_cap=4, state_ttl_min=0,
        available_now=True,
    ).awaitTermination(240)
    got = spark.read.parquet(out).select("u", "v").distinct().count()
    assert 0 < got < n * (n - 1) / 2, got

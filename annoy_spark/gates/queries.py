"""Gate queries: one template per operator, rendered for Spark and DuckDB.

Each query implements one operator from SURVEY.md §2 over the driver's
`documents` / `embeddings` tables. Because those tables contain no duplicates,
every text gate first derives a deterministic corpus with planted duplicates
*inside the query* (portable string ops only):

    corpus = documents
           ∪ {doc_id+1_000_000: substr(text, 15)}  for doc_id % 10 = 0   (near dup)
           ∪ {doc_id+2_000_000: text}              for doc_id % 7  = 0   (exact dup)

Annoy operator parity (citations into /root/reference/):
- signatures (minhash/simhash)  <-> index build, annoylib.h:1037-1078
- band grouping                 <-> forest traversal candidates, annoylib.h:1447-1480
- jaccard/hamming verification  <-> exact re-rank, annoylib.h:1492-1494
- knn top-k                     <-> get_nns_by_item/vector, annoylib.h:1228-1236
- pair_distances                <-> get_distance, annoylib.h:1224-1226
- duplicate_clusters            <-> (new) connected components
"""

from __future__ import annotations

import hashlib

from annoy_spark.gates.dialect import DUCK, MERSENNE_P, SPARK, Dialect

SEED = 42
SHINGLE_K = 5
GATE_N_PERM = 16
GATE_BANDS = 4
GATE_ROWS = 4
SIMHASH_BITS = 60          # bits 0..59 of a 15-hex-digit md5 prefix
HAMMING_T = 12
JACCARD_S = 0.8
COSINE_S = 0.99
Q_SCALE = 10000            # embedding quantization scale
KNN_K = 10
STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# MinHash permutation coefficients, derived from the seed exactly like Annoy
# derives per-thread RNG streams from one seed (annoylib.h:1256-1262).
# a, b < P = 2^31-1 (see dialect.MERSENNE_P for why the modulus is small).
MINHASH_A = [(_h32(f"a{i}:{SEED}") % (MERSENNE_P - 1)) + 1 for i in range(GATE_N_PERM)]
MINHASH_B = [_h32(f"b{i}:{SEED}") % MERSENNE_P for i in range(GATE_N_PERM)]


# --------------------------------------------------------------------------
# shared CTE fragments
# --------------------------------------------------------------------------

def _corpus_cte(d: Dialect) -> str:
    return f"""corpus AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
  UNION ALL
  SELECT CAST(doc_id + 1000000 AS BIGINT) AS doc_id, substr(text, 15) AS text
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT CAST(doc_id + 2000000 AS BIGINT) AS doc_id, text
  FROM documents WHERE doc_id % 7 = 0
)"""


def _shingle_ctes(d: Dialect) -> str:
    """corpus -> toks -> sh (distinct shingle array) -> shx (exploded) -> sizes."""
    return f"""{_corpus_cte(d)},
toks AS (
  SELECT doc_id, {d.tokens('text')} AS t FROM corpus
),
sh AS (
  SELECT doc_id, {d.array_distinct(d.shingles('t', SHINGLE_K))} AS s_arr
  FROM toks WHERE {d.size('t')} >= 1
),
shx AS (
  SELECT doc_id, {d.explode('s_arr', 's')} FROM sh
),
sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM shx GROUP BY doc_id
)"""


def _minhash_ctes(d: Dialect) -> str:
    mins = ",\n    ".join(
        f"min(({MINHASH_A[i]} * (h % {MERSENNE_P}) + {MINHASH_B[i]})"
        f" % {MERSENNE_P}) AS m{i}"
        for i in range(GATE_N_PERM)
    )
    band_selects = []
    for b in range(GATE_BANDS):
        cols = ", ".join(
            f"CAST(m{b * GATE_ROWS + r} AS STRING)" if d.name == "spark"
            else f"CAST(m{b * GATE_ROWS + r} AS VARCHAR)"
            for r in range(GATE_ROWS)
        )
        band_selects.append(
            f"SELECT doc_id, CAST({b} AS BIGINT) AS band, "
            f"concat_ws('_', {cols}) AS bkey FROM mh"
        )
    bands = "\n  UNION ALL\n  ".join(band_selects)
    return f"""{_shingle_ctes(d)},
hx AS (
  SELECT doc_id, {d.hex2int('s', 8)} AS h FROM shx
),
mh AS (
  SELECT doc_id,
    {mins}
  FROM hx GROUP BY doc_id
),
bands AS (
  {bands}
)"""


def _simhash_ctes(d: Dialect) -> str:
    """Unweighted SimHash over the distinct shingle set: bit j of the
    signature is the majority of bit j across 60-bit shingle hashes —
    exactly Annoy's side-of-hyperplane vote, annoylib.h:491-501."""
    terms = " + ".join(
        f"(CASE WHEN 2 * {d.big_sum(f'({d.shiftright(chr(104), j)}) % 2')} > COUNT(*) "
        f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(SIMHASH_BITS)
    )
    return f"""{_shingle_ctes(d)},
sx AS (
  SELECT doc_id, {d.hex2int('s', 15)} AS h FROM shx
),
sim AS (
  SELECT doc_id, {terms} AS sig FROM sx GROUP BY doc_id
)"""


def _jaccard_ctes(d: Dialect, cand_join: str) -> str:
    """CTEs computing exact shingle-set Jaccard for candidate pairs (int/int
    division — correctly-rounded IEEE, bit-identical in both engines)."""
    return f"""inter AS (
  {cand_join}
),
scored AS (
  SELECT i.u, i.v,
    CAST(i.ni AS DOUBLE) / CAST(su.n + sv.n - i.ni AS DOUBLE) AS jaccard
  FROM inter i
  JOIN sizes su ON su.doc_id = i.u
  JOIN sizes sv ON sv.doc_id = i.v
)"""


_JACCARD_FINAL = "SELECT u, v, jaccard FROM scored WHERE jaccard >= {s}"


def _emb_cte(d: Dialect) -> str:
    return f"""emb AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         {d.quantize('embedding', Q_SCALE)} AS q
  FROM embeddings
)"""


def _emb2_cte(d: Dialect) -> str:
    """Embedding corpus with planted neighbors: a scaled copy (same
    direction, cos≈1) and a constant-shifted copy (cos slightly below 1)."""
    xform = "transform" if d.name == "spark" else "list_transform"
    scaled = f"{xform}(embedding, x -> CAST(x AS DOUBLE) * CAST(1.5 AS DOUBLE))"
    shifted = f"{xform}(embedding, x -> CAST(x AS DOUBLE) + CAST(0.02 AS DOUBLE))"
    return f"""emb2 AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         {d.quantize('embedding', Q_SCALE)} AS q
  FROM embeddings
  UNION ALL
  SELECT CAST(vec_id + 1000000 AS BIGINT) AS vec_id,
         {d.quantize(scaled, Q_SCALE)} AS q
  FROM embeddings WHERE vec_id % 20 = 0
  UNION ALL
  SELECT CAST(vec_id + 2000000 AS BIGINT) AS vec_id,
         {d.quantize(shifted, Q_SCALE)} AS q
  FROM embeddings WHERE vec_id % 30 = 0
)"""


def _norm_cos(d: Dialect, dot: str, na: str, nb: str) -> str:
    return f"CAST({dot} AS DOUBLE) / sqrt(CAST({na} * {nb} AS DOUBLE))"


# --------------------------------------------------------------------------
# query templates — name -> SQL for a dialect
# --------------------------------------------------------------------------

def q_sha_invariant(d: Dialect) -> str:
    """Per-row content sha256 (input_hint invariant; checked every stage)."""
    return f"""WITH {_corpus_cte(d)}
SELECT doc_id, {d.sha256hex('text')} AS content_sha FROM corpus"""


def q_exact_dup_groups(d: Dialect) -> str:
    """Exact dedup via content-hash groupBy (sha256 pre-collapse stage)."""
    return f"""WITH {_corpus_cte(d)}
SELECT md5(text) AS content_md5,
       COUNT(*) AS group_size,
       MIN(doc_id) AS canonical_id
FROM corpus GROUP BY md5(text) HAVING COUNT(*) > 1"""


def q_exact_dup_pairs(d: Dialect) -> str:
    return f"""WITH {_corpus_cte(d)}
SELECT a.doc_id AS u, b.doc_id AS v
FROM corpus a JOIN corpus b
  ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id"""


def q_jaccard_pairs(d: Dialect) -> str:
    """All-pairs exact shingle Jaccard >= s (brute-force verification path)."""
    cand = """SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS ni
  FROM shx a JOIN shx b ON b.s = a.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id"""
    return f"""WITH {_shingle_ctes(d)},
{_jaccard_ctes(d, cand)}
{_JACCARD_FINAL.format(s=JACCARD_S)}"""


def q_minhash_signatures(d: Dialect) -> str:
    cols = ", ".join(
        f"CAST(m{i} AS STRING)" if d.name == "spark" else f"CAST(m{i} AS VARCHAR)"
        for i in range(GATE_N_PERM)
    )
    return f"""WITH {_minhash_ctes(d)}
SELECT doc_id, concat_ws('_', {cols}) AS minhash FROM mh"""


def q_band_groups(d: Dialect) -> str:
    """Banding introspection: non-trivial band groups (candidate buckets)."""
    return f"""WITH {_minhash_ctes(d)}
SELECT band, bkey, COUNT(*) AS n_docs
FROM bands GROUP BY band, bkey HAVING COUNT(*) > 1"""


def q_minhash_lsh_pairs(d: Dialect) -> str:
    """Full LSH pipeline: banded minhash candidates -> exact Jaccard verify."""
    cand = """SELECT c.u, c.v, COUNT(*) AS ni
  FROM cand c
  JOIN shx a ON a.doc_id = c.u
  JOIN shx b ON b.doc_id = c.v AND b.s = a.s
  GROUP BY c.u, c.v"""
    return f"""WITH {_minhash_ctes(d)},
cand AS (
  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
  FROM bands a JOIN bands b
    ON b.band = a.band AND b.bkey = a.bkey AND a.doc_id < b.doc_id
),
{_jaccard_ctes(d, cand)}
{_JACCARD_FINAL.format(s=JACCARD_S)}"""


def q_simhash_signatures(d: Dialect) -> str:
    return f"""WITH {_simhash_ctes(d)}
SELECT doc_id, sig AS simhash FROM sim"""


def q_simhash_hamming_pairs(d: Dialect) -> str:
    ham = d.bit_count(d.xor("a.sig", "b.sig"))
    return f"""WITH {_simhash_ctes(d)}
SELECT a.doc_id AS u, b.doc_id AS v, CAST({ham} AS BIGINT) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE {ham} <= {HAMMING_T}"""


def q_pair_distances(d: Dialect) -> str:
    """get_distance analog (annoylib.h:1224-1226): exact Jaccard + Hamming
    for the planted pairs."""
    ham = d.bit_count(d.xor("sa.sig", "sb.sig"))
    return f"""WITH {_simhash_ctes(d)},
pairs AS (
  SELECT CAST(doc_id AS BIGINT) AS u, CAST(doc_id + 1000000 AS BIGINT) AS v
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT CAST(doc_id AS BIGINT) AS u, CAST(doc_id + 2000000 AS BIGINT) AS v
  FROM documents WHERE doc_id % 7 = 0
),
inter AS (
  SELECT p.u, p.v, COUNT(xb.s) AS ni
  FROM pairs p
  LEFT JOIN shx xa ON xa.doc_id = p.u
  LEFT JOIN shx xb ON xb.doc_id = p.v AND xb.s = xa.s
  GROUP BY p.u, p.v
)
SELECT i.u, i.v,
  CAST(i.ni AS DOUBLE) / CAST(su.n + sv.n - i.ni AS DOUBLE) AS jaccard,
  CAST({ham} AS BIGINT) AS hamming
FROM inter i
JOIN sizes su ON su.doc_id = i.u
JOIN sizes sv ON sv.doc_id = i.v
JOIN sim sa ON sa.doc_id = i.u
JOIN sim sb ON sb.doc_id = i.v"""


def q_knn_dot_topk(d: Dialect) -> str:
    """get_nns_by_item, dot metric (annoylib.h:1228-1232): exact top-k by
    integer-quantized dot product for sampled query vectors."""
    dot = d.int_dot("qv", "nv")
    return f"""WITH {_emb_cte(d)},
queries AS (
  SELECT vec_id AS qid, q AS qv FROM emb WHERE vec_id % 25 = 0
),
scored AS (
  SELECT qs.qid, e.vec_id AS nid, qs.qv AS qv, e.q AS nv
  FROM queries qs JOIN emb e ON e.vec_id <> qs.qid
),
ranked AS (
  SELECT qid, nid, {dot} AS dot_q,
    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY {dot} DESC, nid) AS rn
  FROM scored
)
SELECT qid, nid, CAST(rn AS BIGINT) AS rank, dot_q
FROM ranked WHERE rn <= {KNN_K}"""


def q_knn_cosine_topk(d: Dialect) -> str:
    """get_nns_by_item, angular metric (annoylib.h:475-485): top-k by cosine
    over quantized vectors (single division + sqrt on exact ints)."""
    dot = d.int_dot("qv", "nv")
    cos = _norm_cos(d, dot, "nq", "nn")
    return f"""WITH {_emb_cte(d)},
norms AS (
  SELECT vec_id, q, {d.int_dot('q', 'q')} AS n2 FROM emb
),
queries AS (
  SELECT vec_id AS qid, q AS qv, n2 AS nq FROM norms WHERE vec_id % 25 = 0
),
scored AS (
  SELECT qs.qid, e.vec_id AS nid, qs.qv AS qv, e.q AS nv, qs.nq AS nq, e.n2 AS nn
  FROM queries qs JOIN norms e ON e.vec_id <> qs.qid
),
ranked AS (
  SELECT qid, nid, {cos} AS cosine,
    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY {cos} DESC, nid) AS rn
  FROM scored
)
SELECT qid, nid, CAST(rn AS BIGINT) AS rank, cosine
FROM ranked WHERE rn <= {KNN_K}"""


def q_embedding_near_dup_pairs(d: Dialect) -> str:
    """Embedding-cosine near-duplicate pairs over the planted-copy corpus."""
    dot = d.int_dot("a.q", "b.q")
    cos = _norm_cos(d, dot, "na.n2", "nb.n2")
    return f"""WITH {_emb2_cte(d)},
norms AS (
  SELECT vec_id, {d.int_dot('q', 'q')} AS n2 FROM emb2
)
SELECT a.vec_id AS u, b.vec_id AS v, {cos} AS cosine
FROM emb2 a
JOIN emb2 b ON a.vec_id < b.vec_id
JOIN norms na ON na.vec_id = a.vec_id
JOIN norms nb ON nb.vec_id = b.vec_id
WHERE na.n2 > 0 AND nb.n2 > 0 AND {cos} >= {COSINE_S}"""


def q_knn_euclidean_topk(d: Dialect) -> str:
    """get_nns_by_item, euclidean metric (annoylib.h:849-864): top-k by
    exact integer squared distance d2 = |q|^2 + |n|^2 - 2<q,n>."""
    dot = d.int_dot("qv", "nv")
    d2 = f"(nq + nn - 2 * {dot})"
    return f"""WITH {_emb_cte(d)},
norms AS (
  SELECT vec_id, q, {d.int_dot('q', 'q')} AS n2 FROM emb
),
queries AS (
  SELECT vec_id AS qid, q AS qv, n2 AS nq FROM norms WHERE vec_id % 25 = 0
),
scored AS (
  SELECT qs.qid, e.vec_id AS nid, qs.qv AS qv, e.q AS nv, qs.nq AS nq, e.n2 AS nn
  FROM queries qs JOIN norms e ON e.vec_id <> qs.qid
),
ranked AS (
  SELECT qid, nid, {d2} AS dist2,
    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY {d2} ASC, nid) AS rn
  FROM scored
)
SELECT qid, nid, CAST(rn AS BIGINT) AS rank, CAST(dist2 AS BIGINT) AS dist2
FROM ranked WHERE rn <= {KNN_K}"""


def _query_vector_literal(d: Dialect, dim: int = 64) -> str:
    """Deterministic literal query vector (get_nns_by_VECTOR: the query is
    not a stored item — annoylib.h:1234-1236)."""
    vals = [((_h32(f"qv{i}:{SEED}") % 9000) - 4500) for i in range(dim)]
    inner = ", ".join(f"CAST({v} AS BIGINT)" for v in vals)
    return f"array({inner})" if d.name == "spark" else f"[{inner}]"


def q_knn_by_vector(d: Dialect) -> str:
    """Top-k neighbors of a literal (non-stored) query vector by exact
    integer dot product."""
    qlit = _query_vector_literal(d)
    dot = d.int_dot("qv", "q")
    return f"""WITH {_emb_cte(d)},
scored AS (
  SELECT vec_id AS nid, {qlit} AS qv, q FROM emb
),
ranked AS (
  SELECT nid, {dot} AS dot_q,
    ROW_NUMBER() OVER (ORDER BY {dot} DESC, nid) AS rn
  FROM scored
)
SELECT nid, CAST(rn AS BIGINT) AS rank, dot_q
FROM ranked WHERE rn <= {KNN_K}"""


def q_knn_hamming_topk(d: Dialect) -> str:
    """get_nns_by_item, hamming metric (annoylib.h:736-743, 758-792): top-k
    by popcount of XORed 60-bit simhash signatures for sampled queries."""
    ham = d.bit_count(d.xor("qsig", "nsig"))
    return f"""WITH {_simhash_ctes(d)},
queries AS (
  SELECT doc_id AS qid, sig AS qsig FROM sim WHERE doc_id % 25 = 0
),
scored AS (
  SELECT qs.qid, s.doc_id AS nid, qs.qsig AS qsig, s.sig AS nsig
  FROM queries qs JOIN sim s ON s.doc_id <> qs.qid
),
ranked AS (
  SELECT qid, nid, {ham} AS h,
    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY {ham} ASC, nid) AS rn
  FROM scored
)
SELECT qid, nid, CAST(rn AS BIGINT) AS rank, CAST(h AS BIGINT) AS hamming
FROM ranked WHERE rn <= {KNN_K}"""


def q_knn_manhattan_topk(d: Dialect) -> str:
    """get_nns_by_item, manhattan metric (annoylib.h:184-189, 807-813):
    top-k by exact integer L1 distance over quantized vectors."""
    l1 = d.int_l1("qv", "nv")
    return f"""WITH {_emb_cte(d)},
queries AS (
  SELECT vec_id AS qid, q AS qv FROM emb WHERE vec_id % 25 = 0
),
scored AS (
  SELECT qs.qid, e.vec_id AS nid, qs.qv AS qv, e.q AS nv
  FROM queries qs JOIN emb e ON e.vec_id <> qs.qid
),
ranked AS (
  SELECT qid, nid, {l1} AS l1d,
    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY {l1} ASC, nid) AS rn
  FROM scored
)
SELECT qid, nid, CAST(rn AS BIGINT) AS rank, CAST(l1d AS BIGINT) AS l1_dist
FROM ranked WHERE rn <= {KNN_K}"""


def simhash_signatures_sql_spark() -> str:
    """Spark-side (doc_id, sig) table feeding signature-typed operators
    (the pigeonhole all-pairs product operator, hamming k-NN)."""
    return simhash_signatures_sql_spark_fast()


def q_substring_pairs_duck(min_len: int) -> str:
    """DuckDB oracle for the winnowing exact-substring operator over the
    gate's derived corpus (base docs + two planted block variants per
    doc_id % 9 = 0; block = text repeated 12x space-joined).

    The planted pair (base+1e6, base+2e6) shares exactly
    'prefix ' + BLK + ' suffix'  vs  BLK + ' tail end'
    whose longest common substring is BLK plus the following space:
    12*length(text) + 11 + 1. Base docs never qualify: their longest share
    with a planted variant is length(text) < min_len (min_len is chosen
    above the max doc length). The operator's anchored byte-extension
    provably recovers exactly this length (anchors inside BLK extend left
    to BLK's start and right through the trailing space)."""
    return f"""SELECT CAST(doc_id + 1000000 AS BIGINT) AS u,
       CAST(doc_id + 2000000 AS BIGINT) AS v,
       CAST(12 * length(text) + 12 AS BIGINT) AS match_len
FROM documents
WHERE doc_id % 9 = 0 AND 12 * length(text) + 12 >= {min_len}"""


def q_media_features_duck() -> str:
    """DuckDB oracle for byte-feature extraction over text payloads.

    Integer-exact features only (byte sums are exact in both engines;
    byte_mean is ONE IEEE division of exact ints — bit-identical). The
    operator's entropy/histogram floats are pytest-verified instead (float
    sums are order-dependent, so they can't face a value-hash gate)."""
    return """WITH pos AS (
  SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i FROM documents
),
b AS (
  SELECT doc_id, ascii(substr(text, CAST(i AS INTEGER), 1)) AS byte FROM pos
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_bytes,
         CAST(SUM(byte) AS BIGINT) AS byte_sum,
         CAST(COUNT(DISTINCT byte) AS BIGINT) AS n_distinct_bytes
  FROM b GROUP BY doc_id
)
SELECT doc_id AS media_id, 'text/plain' AS media_type, n_bytes, byte_sum,
       n_distinct_bytes,
       CAST(byte_sum AS DOUBLE) / CAST(n_bytes AS DOUBLE) AS byte_mean
FROM agg"""


def q_knn_lsh_recall_duck(min_recall_pct: int) -> str:
    """DuckDB oracle for the approximate-path accuracy gate: the Spark side
    computes recall@k of knn_lsh vs exact angular top-k and emits
    recall_pass = 1 iff recall >= min_recall_pct/100 — the thresholded
    accuracy contract of the reference's test/accuracy_test.py:89 and
    test/angular_index_test.py:106-141. The oracle asserts the contract
    (pass = 1); a recall regression value-hash-fails the gate."""
    return f"""SELECT CAST({KNN_K} AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST({min_recall_pct} AS BIGINT) AS min_recall_pct,
       CAST(1 AS BIGINT) AS recall_pass
FROM embeddings"""


def q_knn_hamming_lsh_recall_duck(min_recall_pct: int) -> str:
    """DuckDB oracle for the bit-sampling hamming-LSH accuracy gate: the
    Spark side computes recall@k of knn_lsh(metric='hamming') vs the exact
    popcount top-k over the derived corpus' simhash signatures and emits
    recall_pass = 1 iff recall >= min_recall_pct/100 — the reference's
    hamming accuracy contract (test/hamming_index_test.py:72-90)."""
    return f"""WITH {_simhash_ctes(DUCK)}
SELECT CAST({KNN_K} AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST({min_recall_pct} AS BIGINT) AS min_recall_pct,
       CAST(1 AS BIGINT) AS recall_pass
FROM sim"""


def q_embedding_near_dup_recall_duck(min_recall_pct: int) -> str:
    """DuckDB oracle for the LSH-bucketed embedding near-dup scale path:
    n_exact_pairs is recomputed exactly (the theta-join), and the contract
    is recall of the LSH operator vs that exact set — a recall regression
    OR a drift in the exact pair count value-hash-fails the gate."""
    return f"""SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
       CAST({min_recall_pct} AS BIGINT) AS min_recall_pct,
       CAST(1 AS BIGINT) AS recall_pass
FROM ({q_embedding_near_dup_pairs(DUCK)}) t"""


def q_stateful_band_pairs_duck() -> str:
    """DuckDB oracle for the stateful streaming band-candidate operator
    (applyInPandasWithState, streaming/stateful_band.py): the Spark side
    streams the corpus in two checkpointed availableNow runs (per-band-key
    state restored across the restart), exact-verifies the emitted
    candidate pairs, and maps engine file ids back to doc ids. The oracle
    is the full O(n^2) exact-Jaccard pair set: band candidacy at
    (b=32, r=4) misses a j>=0.8 pair with probability < 1e-7 — below the
    value-hash noise floor."""
    return f"SELECT u, v FROM ({q_jaccard_pairs(DUCK)}) t"


def q_streaming_dedup_edges_duck() -> str:
    """DuckDB oracle for the incremental streaming dedup operator.

    The Spark side streams a derived new-file batch (near-dup + exact-copy
    variants of sampled documents) against a static signature snapshot and
    emits verified (static, new) edges keyed by PATH (ids are engine
    xxhash64 — not portable). The oracle recomputes the verified pair set
    declaratively: kind='exact' iff byte-identical, else 'lsh' iff exact
    shingle Jaccard >= threshold. The stream's hamming acceptance path is
    disabled in the gate config, and band candidacy at (b=32, r=4) misses
    a j>=0.8 pair with probability < 1e-7 — far below the value-hash
    noise floor (base texts are unique at gate scale, so the stream's
    min-id exact mapping is the only sha match)."""
    d = DUCK
    tok = d.tokens("text")
    sh = d.array_distinct(d.shingles("t", SHINGLE_K))
    return f"""WITH statics AS (
  SELECT 'doc' || CAST(doc_id AS VARCHAR) AS pu, text FROM documents
),
news AS (
  SELECT 'near' || CAST(doc_id AS VARCHAR) AS pv, substr(text, 15) AS text
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT 'copy' || CAST(doc_id AS VARCHAR) AS pv, text
  FROM documents WHERE doc_id % 7 = 0
),
st AS (SELECT pu, md5(text) AS h, {tok} AS t FROM statics),
nt AS (SELECT pv, md5(text) AS h, {tok} AS t FROM news),
sx AS (
  SELECT pu, {d.explode('s_arr', 's')} FROM (
    SELECT pu, {sh} AS s_arr FROM st WHERE {d.size('t')} >= 1
  )
),
nx AS (
  SELECT pv, {d.explode('s_arr', 's')} FROM (
    SELECT pv, {sh} AS s_arr FROM nt WHERE {d.size('t')} >= 1
  )
),
ssz AS (SELECT pu, COUNT(*) AS n FROM sx GROUP BY pu),
nsz AS (SELECT pv, COUNT(*) AS n FROM nx GROUP BY pv),
inter AS (
  SELECT a.pu, b.pv, COUNT(*) AS ni
  FROM sx a JOIN nx b ON b.s = a.s GROUP BY a.pu, b.pv
),
jac AS (
  SELECT i.pu, i.pv,
    CAST(i.ni AS DOUBLE) / CAST(su.n + sv.n - i.ni AS DOUBLE) AS j
  FROM inter i
  JOIN ssz su ON su.pu = i.pu
  JOIN nsz sv ON sv.pv = i.pv
),
exacts AS (SELECT s.pu, n.pv FROM st s JOIN nt n ON n.h = s.h)
SELECT pu AS path_u, pv AS path_v, 'exact' AS kind FROM exacts
UNION ALL
SELECT l.pu AS path_u, l.pv AS path_v, 'lsh' AS kind
FROM jac l
WHERE l.j >= {JACCARD_S}
  AND NOT EXISTS (SELECT 1 FROM exacts e WHERE e.pu = l.pu AND e.pv = l.pv)"""


def q_minhash_jaccard_estimate(d: Dialect) -> str:
    """MinHash agreement as a Jaccard estimator next to the exact value —
    the estimator/exact relationship Annoy's precision harness measures
    (examples/precision_test.py)."""
    agree = " + ".join(
        f"(CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END)"
        for i in range(GATE_N_PERM)
    )
    cand = """SELECT c.u, c.v, COUNT(*) AS ni
  FROM cand c
  JOIN shx xa ON xa.doc_id = c.u
  JOIN shx xb ON xb.doc_id = c.v AND xb.s = xa.s
  GROUP BY c.u, c.v"""
    return f"""WITH {_minhash_ctes(d)},
cand AS (
  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
  FROM bands a JOIN bands b
    ON b.band = a.band AND b.bkey = a.bkey AND a.doc_id < b.doc_id
),
est AS (
  SELECT a.doc_id AS u, b.doc_id AS v,
    CAST(({agree}) AS DOUBLE) / {GATE_N_PERM} AS jaccard_est
  FROM mh a JOIN mh b ON a.doc_id < b.doc_id
  JOIN cand c ON c.u = a.doc_id AND c.v = b.doc_id
),
{_jaccard_ctes(d, cand)}
SELECT e.u, e.v, e.jaccard_est, s.jaccard AS jaccard_exact
FROM est e JOIN scored s ON s.u = e.u AND s.v = e.v"""


def q_dedup_stats(d: Dialect) -> str:
    """Corpus-level dedup metrics (the lineage/introspection surface)."""
    return f"""WITH {_corpus_cte(d)},
per_sha AS (
  SELECT md5(text) AS h, COUNT(*) AS c FROM corpus GROUP BY md5(text)
)
SELECT
  {d.big_sum('c')} AS n_docs,
  COUNT(*) AS n_distinct,
  {d.big_sum('c - 1')} AS n_redundant,
  CAST({d.big_sum('c - 1')} AS DOUBLE) / CAST({d.big_sum('c')} AS DOUBLE)
    AS dup_rate
FROM per_sha"""


def q_lang_id(d: Dialect) -> str:
    """Stopword-marker language heuristic (integer arithmetic only)."""
    markers = ", ".join(f"'{w}'" for w in STOPWORDS)
    filt = (
        f"size(filter(t, x -> x IN ({markers})))" if d.name == "spark"
        else f"len(list_filter(t, x -> x IN ({markers})))"
    )
    return f"""WITH {_corpus_cte(d)},
toks AS (
  SELECT doc_id, {d.tokens('text')} AS t FROM corpus
),
st AS (
  SELECT doc_id, CAST({d.size('t')} AS BIGINT) AS n_tokens,
         CAST({filt} AS BIGINT) AS marker_hits
  FROM toks
)
SELECT doc_id, n_tokens, marker_hits,
  CASE WHEN n_tokens = 0 THEN 'empty'
       WHEN marker_hits * 5 >= n_tokens THEN 'en'
       ELSE 'other' END AS lang_guess
FROM st"""


def q_text_quality(d: Dialect) -> str:
    """Quality scoring: uniqueness / punctuation / length ratios."""
    punct = f"length({d.regexp_replace_all('text', '[a-zA-Z0-9 ]', '')})"
    return f"""WITH {_corpus_cte(d)},
base AS (
  SELECT doc_id,
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST({punct} AS BIGINT) AS n_punct,
    {d.tokens('text')} AS t
  FROM corpus
),
st AS (
  SELECT doc_id, n_chars, n_punct,
    CAST({d.size('t')} AS BIGINT) AS n_tokens,
    CAST({d.size(d.array_distinct('t'))} AS BIGINT) AS n_distinct
  FROM base
)
SELECT doc_id, n_chars, n_tokens, n_distinct,
  CASE WHEN n_tokens = 0 THEN CAST(0 AS DOUBLE)
       ELSE CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) END AS uniq_ratio,
  CASE WHEN n_chars = 0 THEN CAST(0 AS DOUBLE)
       ELSE CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) END AS punct_ratio
FROM st"""


def q_token_stats(d: Dialect) -> str:
    """Token counting: regex word tokens + BPE-ish piece count + char stats."""
    if d.name == "spark":
        pieces = "size(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]', 0))"
        tok_chars = ("aggregate(t, CAST(0 AS BIGINT), "
                     "(acc, x) -> acc + length(x))")
    else:
        pieces = "len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]'))"
        tok_chars = "CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT)"
    return f"""WITH {_corpus_cte(d)},
base AS (
  SELECT doc_id, text, {d.tokens('text')} AS t FROM corpus
)
SELECT doc_id,
  CAST({d.size('t')} AS BIGINT) AS n_tokens,
  CAST({pieces} AS BIGINT) AS n_pieces,
  CAST(length(text) AS BIGINT) AS n_chars,
  CASE WHEN {d.size('t')} = 0 THEN CAST(0 AS DOUBLE)
       ELSE CAST({tok_chars} AS DOUBLE) / CAST({d.size('t')} AS DOUBLE)
  END AS avg_token_chars
FROM base"""


def q_doc_fingerprint(d: Dialect) -> str:
    """Bottom-8 sketch of shingle hashes (document fingerprint)."""
    if d.name == "spark":
        fp = ("array_join(transform(slice(array_sort(collect_list(h)), 1, 8), "
              "x -> CAST(x AS STRING)), '_')")
    else:
        fp = "array_to_string(list_sort(list(h))[1:8], '_')"
    return f"""WITH {_shingle_ctes(d)},
hx AS (
  SELECT doc_id, {d.hex2int('s', 8)} AS h FROM shx
)
SELECT doc_id, {fp} AS fingerprint FROM hx GROUP BY doc_id"""


def _edges_prologue(d: Dialect) -> str:
    """Shared CTE chain ending in an `edges` CTE of verified Jaccard pairs."""
    cand = """SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS ni
  FROM shx a JOIN shx b ON b.s = a.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id"""
    return f"""{_shingle_ctes(d)},
{_jaccard_ctes(d, cand)},
edges AS (
  SELECT u, v FROM scored WHERE jaccard >= {JACCARD_S}
)"""


def duplicate_clusters_edges_sql_spark() -> str:
    """Spark-side edge list feeding the iterative CC operator (round-6 fast
    chain; the DuckDB oracle keeps the _edges_prologue reference text)."""
    return duplicate_clusters_edges_sql_spark_fast()


def duplicate_clusters_nodes_sql_spark() -> str:
    return f"WITH {_corpus_cte(SPARK)}\nSELECT doc_id FROM corpus"


_CC_DUCK_CTES = """und AS (
  SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges
),
reach(node, root) AS (
  SELECT doc_id AS node, doc_id AS root FROM corpus
  UNION
  SELECT und.v AS node, reach.root AS root
  FROM reach JOIN und ON und.u = reach.node
),
labels AS (
  SELECT node AS doc_id, MIN(root) AS cluster_id FROM reach GROUP BY node
)"""


def q_duplicate_clusters_duck() -> str:
    """DuckDB oracle for connected components: recursive-CTE transitive
    closure + min-label. The Spark side runs the iterative large-star /
    small-star operator in annoy_spark.operators.cluster."""
    return f"""WITH RECURSIVE {_edges_prologue(DUCK)},
{_CC_DUCK_CTES}
SELECT doc_id, cluster_id FROM labels"""


def q_cluster_size_hist_duck() -> str:
    """DuckDB oracle for the cluster-size histogram."""
    return f"""WITH RECURSIVE {_edges_prologue(DUCK)},
{_CC_DUCK_CTES},
csizes AS (
  SELECT cluster_id, COUNT(*) AS cluster_size FROM labels GROUP BY cluster_id
)
SELECT cluster_size, COUNT(*) AS n_clusters
FROM csizes GROUP BY cluster_size"""


# name -> (spark_sql, duck_sql); duplicate_clusters handled separately
TEMPLATES = {
    "sha_invariant": q_sha_invariant,
    "exact_dup_groups": q_exact_dup_groups,
    "exact_dup_pairs": q_exact_dup_pairs,
    "jaccard_pairs": q_jaccard_pairs,
    "minhash_signatures": q_minhash_signatures,
    "band_groups": q_band_groups,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "simhash_signatures": q_simhash_signatures,
    "simhash_hamming_pairs": q_simhash_hamming_pairs,
    "pair_distances": q_pair_distances,
    "knn_dot_topk": q_knn_dot_topk,
    "knn_cosine_topk": q_knn_cosine_topk,
    "knn_euclidean_topk": q_knn_euclidean_topk,
    "knn_hamming_topk": q_knn_hamming_topk,
    "knn_manhattan_topk": q_knn_manhattan_topk,
    "knn_by_vector": q_knn_by_vector,
    "minhash_jaccard_estimate": q_minhash_jaccard_estimate,
    "dedup_stats": q_dedup_stats,
    "embedding_near_dup_pairs": q_embedding_near_dup_pairs,
    "lang_id": q_lang_id,
    "text_quality": q_text_quality,
    "token_stats": q_token_stats,
    "doc_fingerprint": q_doc_fingerprint,
}


# --------------------------------------------------------------------------
# Spark-side fast rewrites (round 6). The TEMPLATES above remain the shared
# reference semantics and the DuckDB oracle text (FROZEN); these generators
# emit restructured Spark SQL computing the IDENTICAL result set:
#
# - the tiny single-row-group parquet inputs give the scan ONE partition, so
#   every expression before the first Exchange ran on one core; an explicit
#   REPARTITION hint (guide §2.4/§6.1 — scan parallelism floor) spreads the
#   tokenize/shingle chain across the cluster. The partition count derives
#   from SPARK_GRAFT_CPUS (scale-adaptive, never a hard-coded local value).
# - Spark inlines every CTE per reference (jaccard_pairs computed the full
#   shingle chain 4x, minhash_lsh_pairs 12x — plans/r06/*_before.txt); the
#   rewrites reference heavy CTEs once, carry per-doc shingle counts through
#   the explode instead of re-deriving a `sizes` relation, verify candidates
#   with array_intersect on per-doc arrays instead of an explode join, and
#   use SHUFFLE_HASH hints so identical self-join sides land behind one
#   reused Exchange (guide §2.4).
# - where only shingle EQUALITY matters (jaccard/cc edges), xxhash64 over
#   token windows replaces md5-string shingles (guide §2.3 narrower types:
#   8-byte join keys, no string materialization). Collision odds over ~1e6
#   distinct shingles are ~1e-7 — the same noise floor the streaming gates
#   already document. Where signature VALUES are part of the result
#   (minhash/simhash), the md5 arithmetic is kept bit-identical.
# --------------------------------------------------------------------------

def _repartition_n() -> int:
    import os

    return 2 * int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _corpus_cte_fast() -> str:
    return f"""corpus AS (
  SELECT /*+ REPARTITION({_repartition_n()}, doc_id) */ doc_id, text FROM (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
    UNION ALL
    SELECT CAST(doc_id + 1000000 AS BIGINT) AS doc_id,
           substr(text, 15) AS text
    FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT CAST(doc_id + 2000000 AS BIGINT) AS doc_id, text
    FROM documents WHERE doc_id % 7 = 0
  )
)"""


_TOKENS_FAST = "filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')"
# `WHERE size(t) >= 1` re-derives the token array inside the pushed filter;
# `lower(text) RLIKE '[a-z0-9]'` is the same predicate on the raw string
_NONEMPTY_FAST = "lower(text) RLIKE '[a-z0-9]'"


def _shingle_hash_ctes_fast() -> str:
    """corpus -> per-doc distinct xxhash64 shingle hashes (equality-only
    semantics) -> exploded rows carrying the per-doc distinct count."""
    k = SHINGLE_K
    sh = (
        f"CASE WHEN size(t) >= {k} THEN "
        f"transform(sequence(1, size(t) - {k - 1}), "
        f"i -> xxhash64(slice(t, i, {k}))) "
        f"ELSE array(xxhash64(t)) END"
    )
    return f"""{_corpus_cte_fast()},
toks AS (
  SELECT doc_id, {_TOKENS_FAST} AS t FROM corpus WHERE {_NONEMPTY_FAST}
),
sh AS (
  SELECT doc_id, array_distinct({sh}) AS s_arr FROM toks
),
shx AS (
  SELECT doc_id, size(s_arr) AS n, explode(s_arr) AS s FROM sh
)"""


def _shingle_str_ctes_fast() -> str:
    """Same chain with the original STRING shingles (md5-derived signature
    values must stay bit-identical to the oracle)."""
    k = SHINGLE_K
    sh = (
        f"CASE WHEN size(t) >= {k} THEN "
        f"transform(sequence(1, size(t) - {k - 1}), "
        f"i -> concat_ws(' ', slice(t, i, {k}))) "
        f"ELSE array(concat_ws(' ', t)) END"
    )
    return f"""{_corpus_cte_fast()},
toks AS (
  SELECT doc_id, {_TOKENS_FAST} AS t FROM corpus WHERE {_NONEMPTY_FAST}
),
sh AS (
  SELECT doc_id, array_distinct({sh}) AS s_arr FROM toks
),
shx AS (
  SELECT doc_id, size(s_arr) AS n, explode(s_arr) AS s FROM sh
)"""


_JAC_FAST = "CAST(ni AS DOUBLE) / CAST(n_u + n_v - ni AS DOUBLE)"


def _jaccard_pairs_fast_prologue() -> str:
    """CTE chain ending in `scored` (u, v, jaccard) over all pairs sharing
    >= 1 shingle — single chain reference, counts carried through explode.
    (A group-collect pair generator — collect_list per shingle, pairs
    exploded in-row — was A/B-measured ~0.1-0.2 s SLOWER than this
    self-join at sf0.1: AQE reuses the identical shuffled sides, and the
    join avoids the collect_list buffers. Kept the join.)"""
    return f"""{_shingle_hash_ctes_fast()},
inter AS (
  SELECT /*+ SHUFFLE_HASH(a) */ a.doc_id AS u, b.doc_id AS v,
         COUNT(*) AS ni, MAX(a.n) AS n_u, MAX(b.n) AS n_v
  FROM shx a JOIN shx b ON b.s = a.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
scored AS (
  SELECT u, v, {_JAC_FAST} AS jaccard FROM inter
)"""


def q_jaccard_pairs_spark_fast() -> str:
    return f"""WITH {_jaccard_pairs_fast_prologue()}
{_JACCARD_FINAL.format(s=JACCARD_S)}"""


def q_minhash_lsh_pairs_spark_fast() -> str:
    mins = ",\n    ".join(
        f"min(({MINHASH_A[i]} * (h % {MERSENNE_P}) + {MINHASH_B[i]})"
        f" % {MERSENNE_P}) AS m{i}"
        for i in range(GATE_N_PERM)
    )
    band_keys = ", ".join(
        "concat_ws('_', "
        + ", ".join(
            f"CAST(m{b * GATE_ROWS + r} AS STRING)" for r in range(GATE_ROWS)
        )
        + ")"
        for b in range(GATE_BANDS)
    )
    return f"""WITH {_shingle_str_ctes_fast()},
hx AS (
  SELECT doc_id, {SPARK.hex2int('s', 8)} AS h FROM shx
),
mh AS (
  SELECT doc_id,
    {mins}
  FROM hx GROUP BY doc_id
),
bands AS (
  SELECT doc_id, band, bkey
  FROM mh LATERAL VIEW posexplode(array({band_keys})) AS band, bkey
),
cand AS (
  SELECT /*+ SHUFFLE_HASH(a) */ DISTINCT a.doc_id AS u, b.doc_id AS v
  FROM bands a JOIN bands b
    ON b.band = a.band AND b.bkey = a.bkey AND a.doc_id < b.doc_id
),
inter AS (
  SELECT /*+ SHUFFLE_HASH(su, sv) */ c.u, c.v,
         size(array_intersect(su.s_arr, sv.s_arr)) AS ni,
         size(su.s_arr) AS n_u, size(sv.s_arr) AS n_v
  FROM cand c
  JOIN sh su ON su.doc_id = c.u
  JOIN sh sv ON sv.doc_id = c.v
),
scored AS (
  SELECT u, v, {_JAC_FAST} AS jaccard FROM inter
)
{_JACCARD_FINAL.format(s=JACCARD_S)}"""


def _simhash_fast_ctes() -> str:
    terms = " + ".join(
        f"(CASE WHEN 2 * {SPARK.big_sum(f'({SPARK.shiftright(chr(104), j)}) % 2')} > COUNT(*) "
        f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(SIMHASH_BITS)
    )
    return f"""{_shingle_str_ctes_fast()},
sx AS (
  SELECT doc_id, {SPARK.hex2int('s', 15)} AS h FROM shx
),
sim AS (
  SELECT doc_id, {terms} AS sig FROM sx GROUP BY doc_id
)"""


def q_simhash_hamming_pairs_spark_fast() -> str:
    ham = SPARK.bit_count(SPARK.xor("a.sig", "b.sig"))
    return f"""WITH {_simhash_fast_ctes()},
sima AS (
  SELECT /*+ REPARTITION({_repartition_n()}, doc_id) */ doc_id, sig FROM sim
)
SELECT /*+ BROADCAST(b) */
  a.doc_id AS u, b.doc_id AS v, CAST({ham} AS BIGINT) AS hamming
FROM sima a JOIN sim b ON a.doc_id < b.doc_id
WHERE {ham} <= {HAMMING_T}"""


def simhash_signatures_sql_spark_fast() -> str:
    return f"WITH {_simhash_fast_ctes()}\nSELECT doc_id, sig FROM sim"


def duplicate_clusters_edges_sql_spark_fast() -> str:
    return f"""WITH {_jaccard_pairs_fast_prologue()},
edges AS (
  SELECT u, v FROM scored WHERE jaccard >= {JACCARD_S}
)
SELECT u, v FROM edges"""


_SPARK_FAST = {
    "jaccard_pairs": q_jaccard_pairs_spark_fast,
    "minhash_lsh_pairs": q_minhash_lsh_pairs_spark_fast,
    "simhash_hamming_pairs": q_simhash_hamming_pairs_spark_fast,
}


def spark_sql_for(name: str) -> str:
    if name in _SPARK_FAST:
        return _SPARK_FAST[name]()
    return TEMPLATES[name](SPARK)


def duck_sql_for(name: str) -> str:
    return TEMPLATES[name](DUCK)

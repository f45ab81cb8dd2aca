"""Similarity search over embedding columns (array<float>).

Engine-portable determinism: both Spark and the DuckDB oracle compute
cosine as a LEFT FOLD over the array in index order with double
arithmetic — identical operation order on identical parquet floats gives
bit-identical doubles, so ``floor(cos * 1e6)`` (micro-units) matches
exactly and ranking ties break on integer ids.

- brute_force_topk: the correctness baseline. Query-side is a
  deterministic subset (vec_id % QUERY_MOD == 0) joined against the
  full corpus — at 100 TB this is the "small probe set x big corpus"
  shape: broadcast the queries, scan the corpus once, per-partition
  Arrow-combiner top-k before the final shuffle (at most k rows per
  (partition, query) shuffle; the global window finishes exactly on
  that bounded remainder).
- lsh_topk: the scale path — 16 deterministic integer hyperplanes
  bucket both sides; candidates only within the probe's bucket. Same
  arithmetic in the oracle (the planes are pure integer formulas), so
  even the ANN variant is exactly verified.
- neardup_pairs: cosine >= 0.95 pairs (embedding near-dup dedup) via
  LSH-bucket candidates (+1-bit multi-probe) with exact verification.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DIM = 64
K = 3
QUERY_MOD = 20
N_PLANES = 16
PLANE_MULT = 2654435761  # Knuth multiplicative constant, portable int math
NEARDUP_MICRO = 950_000


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm2(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cos_micro(a: Column, b: Column) -> Column:
    return F.floor(
        _dot(a, b) / F.sqrt(_norm2(a) * _norm2(b)) * F.lit(1_000_000)
    ).cast("long")


def cos_micro_pre(a: Column, b: Column, n2a: Column, n2b: Column) -> Column:
    """cos_micro with PRE-COMPUTED squared norms: each vector's norm is
    evaluated once per row in a projection instead of once per PAIR —
    the dot product is the only per-pair fold. Bit-identical to
    cos_micro (same doubles in the same operations), ~3x less HOF work
    on all-pairs/top-k scans."""
    return F.floor(_dot(a, b) / F.sqrt(n2a * n2b) * F.lit(1_000_000)).cast("long")


def _scored_pairs(embeddings: DataFrame) -> DataFrame:
    """(query_id, neighbor_id, cos_micro) for every query x corpus pair:
    broadcast the bounded probe set, scan the corpus once, norms hoisted
    per row so the dot product is the only per-pair fold."""
    queries = embeddings.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm2(F.col("embedding")).alias("q_n2"),
    )
    corpus = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("n_emb"),
        _norm2(F.col("embedding")).alias("n_n2"),
    )
    return (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cos_micro_pre(
                F.col("q_emb"), F.col("n_emb"), F.col("q_n2"), F.col("n_n2")
            ).alias("cos_micro"),
        )
    )


def brute_force_topk(embeddings: DataFrame, k: int = K) -> DataFrame:
    """(query_id, neighbor_id, rank, cos_micro): exact top-k cosine
    neighbors for the deterministic query subset.

    Two-level top-k: an Arrow combiner runs on each scored partition
    keeping only the local top-k rows per query (bounded state:
    |queries| x k rows regardless of partition size), so the final
    exchange carries at most k rows per (partition, query) instead of
    every scored row — at 100 TB the shuffle is |partitions| x |Q| x k
    skinny rows, not n x |Q|. An exact global window finishes on that
    bounded remainder. Output is identical to the single-window variant
    (``brute_force_topk_window``, kept as the oracle twin) because the
    local sort uses the same (cos desc, neighbor_id asc) total order.

    Scale trade, measured: at bench scale (2k vectors, 200k scored
    rows) the combiner's extra Arrow boundary costs ~1s and the window
    twin is faster; the combiner wins as soon as per-query candidate
    counts outgrow executor memory for a single window partition —
    which is the regime this operator exists for."""
    scored = _scored_pairs(embeddings)

    def partial_topk(batches):
        import pandas as pd

        best = None
        for pdf in batches:
            cur = pd.concat([best, pdf]) if best is not None else pdf
            cur = cur.sort_values(
                ["query_id", "cos_micro", "neighbor_id"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            best = cur.groupby("query_id", sort=False).head(k)
        if best is not None and len(best):
            yield best

    partial = scored.mapInPandas(
        partial_topk, schema="query_id long, neighbor_id long, cos_micro long"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_micro").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_micro")
    )


def brute_force_topk_window(embeddings: DataFrame, k: int = K) -> DataFrame:
    """Single-window twin of ``brute_force_topk``: every scored row
    shuffles into one window per query. Simpler plan, unbounded shuffle
    — kept as the oracle-shaped baseline the combiner variant is
    asserted equal to (tests/test_dedup_similarity.py)."""
    scored = _scored_pairs(embeddings)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_micro").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_micro")
    )


def _plane_dot(emb: Column, j: int) -> Column:
    """Dot with deterministic integer hyperplane j:
    w[j][d] = ((j*DIM + d) * PLANE_MULT) % 1000 - 500.
    The dimension range follows the actual array length (size() is
    evaluated outside the lambda, so no per-element re-evaluation);
    weights still index as j*DIM + d so the 64-dim oracle arithmetic is
    unchanged on the driver tables. An EMPTY array short-circuits to
    0.0: sequence(0, size-1) would otherwise build [0, -1] (Catalyst
    trap — sequence steps downward when end < start) and element_at
    would fault."""
    fold = F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.size(emb) - 1),
            lambda d: (
                ((F.lit(j) * DIM + d) * F.lit(PLANE_MULT)) % 1000 - 500
            ).cast("double")
            * F.element_at(emb, d + 1).cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(F.size(emb) > 0, fold).otherwise(F.lit(0.0))


def lsh_bucket(emb: Column) -> Column:
    bits = [
        F.when(_plane_dot(emb, j) >= 0, F.lit(2 ** j)).otherwise(F.lit(0))
        for j in range(N_PLANES)
    ]
    return sum(bits, F.lit(0)).cast("long")


def lsh_topk(embeddings: DataFrame, k: int = K) -> DataFrame:
    """ANN via hyperplane-LSH bucketing: candidates share the query's
    bucket; exact cosine rank within. Deterministic arithmetic ->
    exactly reproducible in the oracle (it's approximate vs brute
    force, but exact vs its own contract)."""
    with_bucket = embeddings.select(
        "vec_id",
        "embedding",
        lsh_bucket(F.col("embedding")).alias("bucket"),
        _norm2(F.col("embedding")).alias("n2"),
    )
    queries = with_bucket.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("q_n2"),
        "bucket",
    )
    corpus = with_bucket.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("n_emb"),
        F.col("n2").alias("n_n2"),
        "bucket",
    )
    scored = (
        queries.join(corpus, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cos_micro_pre(
                F.col("q_emb"), F.col("n_emb"), F.col("q_n2"), F.col("n_n2")
            ).alias("cos_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_micro").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_micro")
    )


# deterministic codebook: vec_id % 25 == 3 are centroids. The codebook
# is driver-collected in ivf_topk, which is safe ONLY while it stays
# O(sqrt n)-ish relative to the corpus — if CENTROID_MOD changes, keep
# the collect-size story in ivf_topk's docstring in sync.
CENTROID_MOD = 25
NPROBE = 2


def _py_norm2(vals) -> float:
    """Squared norm as a LEFT FOLD in index order over doubles — the
    exact arithmetic Spark's F.aggregate fold and DuckDB's list_reduce
    produce, so a driver-side precomputed norm is bit-identical to one
    computed per pair inside either engine."""
    acc = 0.0
    for v in vals:
        x = float(v)
        acc = acc + x * x
    return acc


def ivf_topk(
    embeddings: DataFrame, k: int = K, nprobe: int = NPROBE
) -> DataFrame:
    """IVF-style ANN: a coarse codebook partitions the corpus into
    inverted lists; a query probes only its ``nprobe`` nearest
    centroids' lists and ranks exactly within. This is the classic
    IVF-Flat scale shape (train codebook -> assign once -> per-query
    work is nprobe/nlist of the corpus); the codebook here is a
    DETERMINISTIC subset of the vectors (vec_id % CENTROID_MOD == 3)
    standing in for a k-means-trained one so the DuckDB oracle
    reproduces the exact same lists — swap in trained centroids and
    nothing else changes.

    Assignment is MAP-SIDE: the codebook is collected to the driver
    (legitimately tiny — IVF codebooks are O(sqrt n) rows by
    construction; collecting one is how FAISS-style engines broadcast
    trained centroids) and each corpus partition scores itself against
    it inside ONE Arrow-batched mapInPandas kernel — a (batch x nlist)
    numpy matrix built by iterating the SHORT dim axis in Python and
    vectorizing across the pair matrix, which reproduces the engines'
    left-fold double arithmetic bit-for-bit (each acc update is the
    same IEEE add in the same order) while running at BLAS-ish speed
    instead of one interpreted HOF lambda per element. Zero Exchange
    for assignment — the former shape (crossJoin(broadcast) +
    Window.partitionBy(vec_id)) shuffled n x nlist scored rows just to
    take an argmin, an n^1.5-row Exchange at 100 TB. The only shuffles
    left are the probe equi-join on cent_id and the final bounded
    top-k window.

    NOTE: building this DataFrame is NOT side-effect-free — the codebook
    collect() runs an eager Spark job at construction time, and the
    centroid values are frozen then (not at action time). Callers
    composing plans lazily (e.g. plans/explain) pay one small job just
    to build the plan; that is the deliberate FAISS-style trade."""
    import numpy as np

    cent_rows = sorted(
        embeddings.filter(F.col("vec_id") % CENTROID_MOD == 3)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r.vec_id,
    )
    if not cent_rows:
        raise ValueError(
            f"ivf_topk: no centroids — the deterministic codebook rule "
            f"(vec_id % {CENTROID_MOD} == 3) selected zero vectors from "
            "the input; IVF needs a non-empty codebook"
        )
    cent_ids = np.array([int(r.vec_id) for r in cent_rows], dtype=np.int64)
    cents = np.array([list(r.embedding) for r in cent_rows], dtype=np.float64)
    cent_n2 = np.array([_py_norm2(r.embedding) for r in cent_rows])

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            emb = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            acc = np.zeros((len(emb), len(cents)))
            n2 = np.zeros(len(emb))
            for d in range(emb.shape[1]):
                # sequential over dims = the exact fold order; vectorized
                # across the (row x centroid) matrix
                acc += emb[:, d : d + 1] * cents[None, :, d]
                n2 += emb[:, d] * emb[:, d]
            # zero-norm guard: a zero vector (or zero centroid) makes the
            # cosine 0/0 = NaN, and floor(NaN).astype(int64) is
            # platform-undefined. Pin those cells to int64 min — a
            # defined "ranks last" sentinel, so zero-norm rows still get
            # a deterministic (lowest cent_id) assignment.
            denom = np.sqrt(n2[:, None] * cent_n2[None, :])
            with np.errstate(invalid="ignore", divide="ignore"):
                raw = np.floor(acc / denom * 1_000_000)
            cosm = np.where(
                denom == 0.0, float(np.iinfo(np.int64).min), raw
            ).astype(np.int64)
            # stable sort of -cos + ascending cent index == the oracle's
            # ORDER BY cos DESC, cent_id ASC (cent_ids are id-sorted)
            order = np.argsort(-cosm, axis=1, kind="stable")
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "cent_id": cent_ids[order[:, 0]],
                    "probe_cents": [
                        cent_ids[o[:nprobe]].tolist() for o in order
                    ],
                }
            )

    ranked = embeddings.select("vec_id", "embedding").mapInPandas(
        assign,
        schema=(
            "vec_id long, embedding array<float>, cent_id long, "
            "probe_cents array<long>"
        ),
    )
    assigned = ranked.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("n_emb"),
        _norm2(F.col("embedding")).alias("n_n2"),
        "cent_id",
    )
    probes = (
        ranked.filter(F.col("vec_id") % QUERY_MOD == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            _norm2(F.col("embedding")).alias("q_n2"),
            F.explode("probe_cents").alias("cent_id"),
        )
    )
    # same zero-norm discipline JVM-side: under ANSI mode 0/0 raises
    # DIVIDE_BY_ZERO, so a zero-norm row in either role gets the defined
    # ranks-last sentinel the Arrow kernel uses
    sentinel = F.lit(-(1 << 63)).cast("long")
    cand = (
        probes.join(assigned, "cent_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.when(
                (F.col("q_n2") > 0) & (F.col("n_n2") > 0),
                cos_micro_pre(
                    F.col("q_emb"), F.col("n_emb"), F.col("q_n2"), F.col("n_n2")
                ),
            )
            .otherwise(sentinel)
            .alias("cos_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_micro").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_micro")
    )


def duckdb_ivf_topk_sql(k: int = K, nprobe: int = NPROBE) -> str:
    cc = duck_cos_micro("e.embedding", "c.embedding")
    return f"""
    WITH cents AS (SELECT vec_id AS cent_id, embedding FROM embeddings
                   WHERE vec_id % {CENTROID_MOD} = 3),
    scored AS (
      SELECT e.vec_id, e.embedding, c.cent_id, {cc} AS c_cos
      FROM embeddings e, cents c
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY c_cos DESC, cent_id ASC) AS crank
      FROM scored
    ),
    assigned AS (
      SELECT vec_id AS neighbor_id, embedding AS n_emb, cent_id
      FROM ranked WHERE crank = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, embedding AS q_emb, cent_id
      FROM ranked WHERE vec_id % {QUERY_MOD} = 0 AND crank <= {nprobe}
    ),
    cand AS (
      SELECT query_id, neighbor_id,
             {duck_cos_micro('q_emb', 'n_emb')} AS cos_micro
      FROM probes JOIN assigned USING (cent_id)
      WHERE query_id <> neighbor_id
    ),
    rk AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_micro DESC, neighbor_id ASC) AS rank
      FROM cand
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos_micro
    FROM rk WHERE rank <= {k}
    """


PLANT_OFFSET = 10_000


def with_planted_dups(embeddings: DataFrame) -> DataFrame:
    """The synthetic embeddings have no natural near-dups; plant exact
    copies (vec_id + PLANT_OFFSET) for every vec_id % 17 == 5 so the
    near-dup operator has positives to find (same pattern as
    dedup.with_mutants)."""
    copies = embeddings.filter(F.col("vec_id") % 17 == 5).select(
        (F.col("vec_id") + PLANT_OFFSET).alias("vec_id"), "embedding"
    )
    return embeddings.select("vec_id", "embedding").unionByName(copies)


DUCK_PLANTED = f"""
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + {PLANT_OFFSET} AS vec_id, embedding FROM embeddings
    WHERE vec_id % 17 = 5
"""


def neardup_pairs(embeddings: DataFrame, micro: int = NEARDUP_MICRO) -> DataFrame:
    """Embedding near-dup pairs (cos >= micro/1e6) via hyperplane-LSH
    candidate generation + exact cosine verification — the same banding
    shape as MinHash/SimHash, replacing the former all-pairs crossJoin.

    Candidates: one side explodes into its own bucket plus all 16
    one-bit-flipped buckets (multi-probe radius 1); the other side keeps
    its single bucket; a pair whose bucket signatures differ in <= 1
    hyperplane is matched by EXACTLY one probe (so no distinct needed).
    Identical vectors always share a bucket -> recall 1.0 on exact
    duplicates; for merely-close pairs this is the standard
    approximate-recall LSH trade (more probes / more tables = more
    recall), verified exact on every candidate. Cost: 17n exploded rows
    + bucket-local joins — linear-ish, vs n^2 for the cross join.

    CONTRACT (and what duckdb_neardup_sql encodes): pairs with cosine
    >= micro/1e6 AND bucket-signature hamming <= 1 over the 16
    deterministic hyperplanes. Above-threshold pairs whose signatures
    differ in >= 2 planes are outside the contract by design."""
    with_bucket = embeddings.select(
        "vec_id", "embedding", lsh_bucket(F.col("embedding")).alias("bucket")
    )
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(N_PLANES)],
    )
    a = with_bucket.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("ea"),
        _norm2(F.col("embedding")).alias("na"),
        F.explode(probes).alias("bucket"),
    )
    b = with_bucket.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("eb"),
        _norm2(F.col("embedding")).alias("nb"),
        "bucket",
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cos_micro_pre(
                F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")
            ).alias("cos_micro"),
        )
        .filter(F.col("cos_micro") >= micro)
    )


# ---------------------------------------------------------------- oracles
_DUCK_DOT = """
list_reduce(list_prepend(0.0::DOUBLE,
  list_transform(range(1, {dim}+1),
    i -> {a}[CAST(i AS INT)]::DOUBLE * {b}[CAST(i AS INT)]::DOUBLE)),
  (acc, x) -> acc + x)
"""


def duck_cos_micro(a: str, b: str, dim: int = DIM) -> str:
    dot = _DUCK_DOT.format(a=a, b=b, dim=dim)
    na = _DUCK_DOT.format(a=a, b=a, dim=dim)
    nb = _DUCK_DOT.format(a=b, b=b, dim=dim)
    return f"CAST(floor(({dot}) / sqrt(({na}) * ({nb})) * 1000000) AS BIGINT)"


def duckdb_brute_topk_sql(k: int = K) -> str:
    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
               WHERE vec_id % {QUERY_MOD} = 0),
    scored AS (
      SELECT query_id, e.vec_id AS neighbor_id,
             {duck_cos_micro('q_emb', 'e.embedding')} AS cos_micro
      FROM q, embeddings e WHERE e.vec_id <> query_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_micro DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos_micro
    FROM ranked WHERE rank <= {k}
    """


def duck_plane_dot(emb: str, j: int, dim: int = DIM) -> str:
    return f"""
    list_reduce(list_prepend(0.0::DOUBLE,
      list_transform(range(0, {dim}),
        d -> ((({j} * {dim} + d) * {PLANE_MULT}) % 1000 - 500)::DOUBLE
             * {emb}[CAST(d + 1 AS INT)]::DOUBLE)),
      (acc, x) -> acc + x)
    """


def duckdb_lsh_topk_sql(k: int = K) -> str:
    bucket = " + ".join(
        f"(CASE WHEN ({duck_plane_dot('embedding', j)}) >= 0 THEN {2 ** j} ELSE 0 END)"
        for j in range(N_PLANES)
    )
    return f"""
    WITH wb AS (SELECT vec_id, embedding, CAST({bucket} AS BIGINT) AS bucket
                FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket FROM wb
          WHERE vec_id % {QUERY_MOD} = 0),
    scored AS (
      SELECT query_id, c.vec_id AS neighbor_id,
             {duck_cos_micro('q_emb', 'c.embedding')} AS cos_micro
      FROM q JOIN wb c USING (bucket) WHERE c.vec_id <> query_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_micro DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos_micro
    FROM ranked WHERE rank <= {k}
    """


def duckdb_neardup_sql(micro: int = NEARDUP_MICRO) -> str:
    """Oracle that states the REAL operator contract: candidate pairs
    are those whose hyperplane bucket signatures differ in <= 1 plane
    (the radius-1 multi-probe candidate set, reproduced here from the
    same deterministic planes), then exact-cosine verified. A pair
    above the threshold whose signatures differ in >= 2 planes is
    OUTSIDE the contract (standard LSH recall trade) — encoding the
    probe in the oracle makes that explicit instead of relying on the
    planted corpus never producing such a pair."""
    bucket = " + ".join(
        f"(CASE WHEN ({duck_plane_dot('embedding', j)}) >= 0 THEN {2 ** j} ELSE 0 END)"
        for j in range(N_PLANES)
    )
    return f"""
    WITH p AS ({DUCK_PLANTED}),
    wb AS (SELECT vec_id, embedding, CAST({bucket} AS BIGINT) AS bucket FROM p)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {duck_cos_micro('a.embedding', 'b.embedding')} AS cos_micro
    FROM wb a JOIN wb b ON a.vec_id < b.vec_id
    WHERE bit_count(xor(a.bucket, b.bucket)) <= 1
      AND {duck_cos_micro('a.embedding', 'b.embedding')} >= {micro}
    """

"""Similarity search over embedding columns (array<float>).

Two tiers, as a 100 TB pipeline needs both:

- ``brute_force_topk``: exact cosine top-k. O(queries × corpus) — the
  correctness baseline and the right tool when the query set is small
  (broadcast the queries, one scan of the corpus, no shuffle of the
  corpus side).
- ``ann_topk``: random-hyperplane LSH bucketing. Each row gets a bucket
  id from the sign pattern of dot products with ``n_planes`` fixed
  pseudo-random hyperplanes (md5-seeded constants → deterministic across
  runs, engines, cluster sizes). Candidates are same-bucket rows only, so
  the join is an equi-join on a short int key — at 10^12 rows this is the
  difference between a feasible shuffle and an O(N²) non-starter. Recall
  is tunable via n_planes (fewer planes → bigger buckets → higher recall,
  more compute); the pytest suite measures recall against the brute
  baseline.

All math is expression-based (zip_with/aggregate folds — JVM codegen, no
Python). Cosine folds are sequential and double-typed so the DuckDB oracle
reproduces them bit-for-bit.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cosine",
    "brute_force_topk",
    "brute_force_topk_arrow",
    "hyperplane_bucket",
    "ann_topk",
    "cosine_near_dup",
    "ivf_topk",
    "rp_project",
    "semantic_dedup",
    "hashed_embedding",
]


def _dbl(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — identical op order in the DuckDB
    oracle (list_reduce) gives bit-identical doubles."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    a, b = _dbl(a), _dbl(b)
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _sim4(a: Column, b: Column) -> Column:
    """round(cosine, 4) with NaN→0: a zero embedding makes 0.0/0.0 = NaN,
    and NaN sorts ABOVE real values under desc — it would win every
    top-k. nanvl wraps the single computed value (no fold duplication,
    unlike a when/otherwise on the denominator)."""
    return F.nanvl(F.round(cosine(a, b), 4), F.lit(0.0))


def _sim4_unrolled(a: Column, b: Column, dim: int) -> Column:
    """_sim4 with the folds UNROLLED to dim explicit element_at terms —
    whole-stage-codegen arithmetic instead of interpreted higher-order
    lambdas (CodegenFallback). Left-associated addition starting from
    the first product reproduces the aggregate fold's doubles exactly
    (0.0 + x1 == x1 in IEEE), so oracles are unaffected. Worth it when
    the cosine runs per CANDIDATE PAIR (near-dup joins: measured ~4x
    at sf0.1 on 16-dim text embeddings); pointless per-row."""

    def dot(u: Column, v: Column) -> Column:
        terms = [
            F.element_at(u, i).cast("double")
            * F.element_at(v, i).cast("double")
            for i in range(1, dim + 1)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out

    cos = dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))
    return F.nanvl(F.round(cos, 4), F.lit(0.0))


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query id.

    Plan shape: queries (tiny) are broadcast; the corpus is scanned once;
    ranking is a window over query_id — the only shuffle is O(Q × N) rows
    of (ids, sim), never the vectors themselves past the join.
    Ranking uses the ROUNDED similarity with id tie-break so the result is
    reproducible across engines and float paths.
    """
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    sims = emb.join(F.broadcast(q), F.col(id_col) != F.col("query_id")).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        _sim4(F.col("qvec"), F.col(vec_col)).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def brute_force_topk_arrow(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k, numpy-batch variant: queries are collected
    driver-side (tiny), shipped in the closure, and each Arrow batch of
    the corpus computes a dense (batch × queries) GEMM in C.

    Measured ~3× faster than the expression-fold ``brute_force_topk`` at
    64 dims / 50 queries, and the gap widens with dim × |Q| — this is the
    hot path for real embedding widths (768+), where per-element
    interpreted folds lose to BLAS. numpy's pairwise/SIMD summation is
    not bit-identical to a sequential fold, but both variants round cos
    to 4 decimals BEFORE ranking with an id tie-break (round-then-rank),
    which absorbs the ~1e-15 summation-order delta — so this variant
    shares the fold's DuckDB oracle, and the test suite asserts
    agreement with ``brute_force_topk``. Same output contract."""
    import numpy as np
    import pandas as pd

    out_schema = "query_id long, rank int, neighbor_id long, cos_sim double"
    qrows = emb.filter(F.col(id_col).isin(query_ids)).select(
        id_col, vec_col
    ).collect()
    if not qrows:  # no matching query ids: empty result, same schema
        return emb.sparkSession.createDataFrame([], out_schema)
    Q = np.array([r[vec_col] for r in qrows], dtype=np.float64)
    q_ids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            # zero-norm guard: a zero vector gets cos 0 everywhere, not
            # NaN (Spark sorts NaN above real values under desc)
            Vn = V / np.maximum(
                np.linalg.norm(V, axis=1, keepdims=True), 1e-300
            )
            S = Vn @ Qn.T
            n = len(pdf)
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, n),
                    "neighbor_id": np.tile(
                        pdf[id_col].to_numpy(), len(q_ids)
                    ),
                    # unrounded: rounding happens JVM-side below, so the
                    # rule (Spark F.round HALF_UP on the shortest decimal
                    # repr) is IDENTICAL to the fold variant's and to the
                    # DuckDB oracle — np.round is half-even on the scaled
                    # binary value and disagrees on *.xxxx5 doubles
                    "cos_sim": S.T.ravel(),
                }
            )
            yield out[out.query_id != out.neighbor_id]

    sims = emb.select(id_col, vec_col).mapInPandas(
        fn, schema="query_id long, neighbor_id long, cos_sim double"
    ).withColumn("cos_sim", F.round("cos_sim", 4))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def _plane_constants(n_planes: int, dim: int, seed: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) is derived
    from md5(f"{seed}_{p}_{d}") mapped to [-1, 1). Portable constants —
    no RNG state, no platform dependence."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}_{p}_{d}".encode()).hexdigest()
            row.append(int(h[:15], 16) / float(1 << 59) - 1.0)
        planes.append(row)
    return planes


def hyperplane_bucket(
    vec_col: Column, n_planes: int, dim: int, seed: int = 0
) -> Column:
    """Sign-pattern bucket id in [0, 2^n_planes) as an int column."""
    planes = _plane_constants(n_planes, dim, seed)
    v = _dbl(vec_col)
    bucket = F.lit(0)
    for p, comps in enumerate(planes):
        plane = F.array(*[F.lit(c) for c in comps])
        bucket = bucket + F.when(_dot(v, plane) > 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        )
    return bucket


def _centroids(n_cells: int, dim: int, seed: int = 0) -> list[list[float]]:
    """Deterministic pseudo-centroids: md5-derived components, L2-normalized
    — the stand-in for a k-means codebook (a real deploy trains centroids
    on a sample and broadcasts them; the operator shape is identical)."""
    cells = []
    for c in range(n_cells):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"ivf_{seed}_{c}_{d}".encode()).hexdigest()
            row.append(int(h[:15], 16) / float(1 << 59) - 1.0)
        norm = sum(x * x for x in row) ** 0.5
        cells.append([x / norm for x in row])
    return cells


def _cell_scores(vec: Column, cents: list[list[float]]) -> Column:
    """array<struct<score,cell>> of dot products against every centroid."""
    v = _dbl(vec)
    return F.array(
        *[
            F.struct(
                _dot(v, F.array(*[F.lit(x) for x in c])).alias("score"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(cents)
        ]
    )


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus rows are assigned to
    their nearest centroid cell (one scan, no shuffle of vectors); each
    query probes its ``n_probe`` nearest cells and exact-cosine re-ranks
    only those cells' rows.

    The scale shape at 10^12 rows: the cell id is a small int — write the
    corpus partitioned by cell and a query touches n_probe/n_cells of the
    data (partition pruning does the skipping). Recall is tunable via
    n_probe; the pytest suite measures it against brute force.

    ``centroids`` overrides the default md5-derived codebook with a
    TRAINED one (clustering.kmeans_centroids, rescaled to floats) —
    the driver oracle pins the md5 default; bench.py measures the
    trained-codebook recall gain."""
    cents = (
        [list(map(float, c)) for c in centroids]
        if centroids is not None
        else _centroids(n_cells, dim, seed)
    )
    if n_probe > len(cents):
        raise ValueError(
            f"n_probe {n_probe} exceeds the {len(cents)}-cell codebook"
        )
    scores = _cell_scores(F.col(vec_col), cents)
    # nearest cell = max by (score, cell) — array_max on struct orders by
    # the first field with the int as deterministic tie-break
    corpus = emb.select(
        F.col(id_col),
        F.col(vec_col),
        # coalesce: non-nullable join key (see cosine_near_dup note)
        F.coalesce(F.array_max(scores)["cell"], F.lit(-1)).alias("cell"),
    )
    top_cells = F.slice(
        F.reverse(F.array_sort(scores)), 1, n_probe
    )  # descending by score
    q = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.explode(F.transform(top_cells, lambda s: s["cell"])).alias(
                "q_cell"
            ),
        )
    )
    sims = corpus.join(
        F.broadcast(q),
        (F.col("cell") == F.col("q_cell"))
        & (F.col(id_col) != F.col("query_id")),
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        _sim4(F.col("qvec"), F.col(vec_col)).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def cosine_near_dup(
    emb: DataFrame,
    threshold: float = 0.7,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    unroll_cosine: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed.

    Self-join restricted to rows sharing a hyperplane sign-bucket: an
    equi-join on a small int key instead of the O(N²) cross product —
    with 2^n_planes uniform buckets the pair count drops by that factor,
    and the bucket key shuffles evenly by construction. Candidates are
    verified with exact cosine ≥ threshold. Recall trades off via
    n_planes exactly as in ann_topk (single-table here: near-dup pairs
    are overwhelmingly same-bucket because near-parallel vectors agree on
    most hyperplane signs)."""
    # coalesce → non-nullable key: stops the join's inferred isnotnull
    # filter from being pushed below the projection with the whole
    # hyperplane expression inlined (evaluated twice per row otherwise)
    keyed = emb.select(
        F.col(id_col),
        F.col(vec_col),
        F.coalesce(
            hyperplane_bucket(F.col(vec_col), n_planes, dim, seed), F.lit(-1)
        ).alias("bucket"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("vec_a"),
        F.col(f"b.{id_col}").alias("vec_b"),
        (
            _sim4_unrolled(
                F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"), dim
            )
            if unroll_cosine
            else _sim4(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
        ).alias("cos_sim"),
    )
    return pairs.filter(F.col("cos_sim") >= threshold)


def ann_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 3,
    n_tables: int = 6,
    dim: int = 64,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table LSH approximate top-k (classic Indyk-Motwani shape):
    ``n_tables`` independent hash tables of ``n_planes`` sign bits each;
    a row is a candidate if it shares the query's bucket in ANY table.

    Recall ≈ 1 - (1 - p^b)^L where p is the per-plane agreement
    probability of true neighbors — tune b (n_planes) for bucket size and
    L (n_tables) for recall. The candidate join is an equi-join on
    (table_idx, bucket): with uniform hash buckets, shuffle volume is
    L × N short rows instead of an O(N²) comparison — the scale path at
    10^12 rows. Exact cosine re-ranks the candidates.
    """
    table_keys = F.array(
        *[
            F.struct(
                F.lit(t).alias("table_idx"),
                hyperplane_bucket(
                    F.col(vec_col), n_planes, dim, seed + 1000 * t
                ).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    keyed = emb.select(
        F.col(id_col), F.col(vec_col), F.explode(table_keys).alias("tk")
    ).select(id_col, vec_col, "tk.*")
    q = keyed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col("table_idx").alias("q_table"),
        F.col("bucket").alias("q_bucket"),
    )
    sims = (
        keyed.join(
            F.broadcast(q),
            (F.col("table_idx") == F.col("q_table"))
            & (F.col("bucket") == F.col("q_bucket"))
            & (F.col(id_col) != F.col("query_id")),
        )
        # cosine BEFORE the dedup: the value is identical for every
        # table collision of a (query, neighbor) pair, so recomputing it
        # per collision (≤ n_tables×, map-side) is far cheaper than
        # carrying both embeddings through the dropDuplicates exchange —
        # only (query_id, neighbor_id, cos_sim) shorts ever shuffle
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            _sim4(F.col("qvec"), F.col(vec_col)).alias("cos_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])  # candidate in ≥1 table
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def rp_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_dim: int = 16,
    in_dim: int = 64,
    seed: int = 7,
    round_dp: int = 4,
) -> DataFrame:
    """Random-projection dimensionality reduction (Johnson-Lindenstrauss):
    project each embedding onto ``out_dim`` deterministic md5-derived
    hyperplanes — the cheap front half of a two-stage ANN (search the
    16-d sketch, re-rank survivors in full dimension), and the standard
    4x shrink for embedding storage/shuffle budgets.

    Output: (id_col, rp array<double>), components rounded to
    ``round_dp`` decimals (round-then-emit, the cos_sim recipe — the
    fold itself is sequence-identical to the DuckDB oracle, rounding
    only normalizes the printed tail).

    Scale shape: entirely scan-local — no shuffle, no UDF; out_dim
    sequential-fold dot products per row against broadcast literal
    planes (JVM codegen). The cast-to-double projection is staged once
    (``_v``) so Catalyst's missing logical CSE cannot re-cast the
    array per component (CLAUDE.md rule; CollapseProject preserves the
    split for non-cheap multi-referenced producers).
    """
    planes = _plane_constants(out_dim, in_dim, seed)
    staged = df.select(id_col, _dbl(F.col(vec_col)).alias("_v"))
    comps = [
        # + 0.0 folds IEEE -0.0 to +0.0 (a component that rounds to
        # zero from below would otherwise print/hash differently
        # across engines); exact for every other value
        F.round(
            _dot(F.col("_v"), F.array(*[F.lit(c) for c in row])), round_dp
        )
        + F.lit(0.0)
        for row in planes
    ]
    return staged.select(id_col, F.array(*comps).alias("rp"))


def semantic_dedup(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embeddings, then inside each
    cluster mark a row as a duplicate iff some SMALLER-ID row in the
    same cell has exact cosine >= threshold to it. Output:
    (id_col, cell int, keep boolean), one row per input row.

    Keep rule: the paper keeps the point farthest from the cluster
    centroid inside each epsilon-ball; this uses greedy smallest-id
    instead — "drop iff an earlier same-cell row is within epsilon" —
    which is order-free, tie-stable under any partitioning, and
    engine-portable (no float centroid distances to tiebreak on). The
    clustering itself is the exact fixed-point trainer
    (clustering.kmeans_assign), so cells — and therefore the whole
    keep/drop decision — are value-identical across engines and
    cluster sizes; the cosine is the sequential double fold rounded to
    4 decimals (the cos_sim recipe).

    Scale shape: the quadratic term is bounded per cluster — SemDeDup's
    entire point; pick k so cells are ~corpus/k (the paper runs ~11k
    clusters over 100M+ embeddings). The candidate join is an equi-join
    on the int cell id; the fixed-width vector (dim doubles) crosses
    that one shuffle by necessity (the cosine is evaluated where the
    pair lands) — no text/payload ever does. A skewed hot cell hurts
    quadratically: raise k, or pre-split hot cells with
    hyperplane_bucket as a sub-key, before corpus-scale runs. Training
    cost is kmeans_centroids' bounded k x dim driver collect per round.
    """
    from .clustering import kmeans_assign

    assign = kmeans_assign(emb, k, iters, id_col, vec_col)
    # coalesce -> non-nullable cell: keeps the self-join's inferred
    # isnotnull from pushing the assignment expression tree into a
    # per-side filter (the cosine_near_dup bucket precedent).
    # localCheckpoint: keyed is referenced THREE times (both self-join
    # sides + the final left join) and Spark reuses none of it (0
    # ReusedExchange, 6 corpus scans measured) — materialize the
    # (id, cell, vector) projection once (the lm.py pair-stream
    # precedent; kmeans' quantized table is already checkpointed the
    # same way).
    keyed = (
        emb.select(id_col, vec_col)
        .join(assign.select(id_col, "cell"), id_col)
        .select(
            F.col(id_col).alias("_id"),
            F.coalesce(F.col("cell"), F.lit(-1)).alias("cell"),
            _dbl(F.col(vec_col)).alias("_v"),
        )
        .localCheckpoint(eager=True)
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .filter(_sim4(F.col("a._v"), F.col("b._v")) >= threshold)
        .select(F.col("b._id").alias("_dropped_id"))
        .distinct()
    )
    return (
        keyed.join(dropped, keyed["_id"] == dropped["_dropped_id"], "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("cell"),
            F.col("_dropped_id").isNull().alias("keep"),
        )
    )


def hashed_embedding(
    docs: DataFrame, dim: int = 16, text_col: str = "text"
) -> DataFrame:
    """Feature-hashing document embeddings (Weinberger et al. 2009,
    ICML, "Feature Hashing for Large Scale Multitask Learning") — the
    deterministic, training-free featurizer that lets the embedding
    layer (ANN top-k, SemDeDup, near-dup cosine) run on TEXT corpora
    with no model in the loop: token t adds sign(t) at index(t), where
    index = h48(t) mod dim and sign = parity of bit 4 (disjoint bits of
    the one 48-bit md5-prefix hash — textstats._token_hash, the ONE
    hash recipe), then the count vector is L2-normalized.

    Output: (doc_id, n_toks, embed) with embed the ','-joined '%.4f'
    string of the normalized vector — packed per the house array rule
    (the driver canonicalizer cannot hash list columns); unpack with
    ``transform(split(embed, ','), x -> cast(x as double))`` to feed
    cosine/ANN operators. An all-cancelled (zero-norm) vector packs as
    dim zeros rather than NaNs.

    Cross-engine float recipe: components are INTEGER sign-counts
    (exact); norm = sqrt of their integer square-sum and the division
    are single deterministic IEEE ops; round(.,4) then +0.0 (-0.0
    normalization) then '%.4f' — the media_features_packed formula.

    Scale shape: entirely SCAN-LOCAL — one staged hash-array projection
    (the CSE rule: the array is referenced 2*dim times by the
    interpreted higher-order filters), one staged component projection,
    no shuffle, no Python. Cost is O(dim * tokens) per doc.

    DuckDB oracle: `q: sim_hash_embed` (same bit-split, same formula).
    """
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    from .textstats import _token_hash, tokens

    staged = docs.select(
        "doc_id",
        F.transform(
            tokens(F.col(text_col)), lambda t: _token_hash(t)
        ).alias("_h48"),
    )
    comps = staged.select(
        "doc_id",
        F.size("_h48").cast("long").alias("n_toks"),
        *[
            (
                F.expr(
                    f"size(filter(_h48, h -> h % {dim} = {i}"
                    " AND (h div 16) % 2 = 1))"
                )
                - F.expr(
                    f"size(filter(_h48, h -> h % {dim} = {i}"
                    " AND (h div 16) % 2 = 0))"
                )
            )
            .cast("long")
            .alias(f"_v{i}")
            for i in range(dim)
        ],
    )
    sq = " + ".join(f"_v{i} * _v{i}" for i in range(dim))
    normed = comps.withColumn("_norm", F.expr(f"sqrt({sq})"))
    embed = F.concat_ws(
        ",",
        *[
            F.when(F.col("_norm") == 0, F.lit("0.0000")).otherwise(
                F.format_string(
                    "%.4f",
                    F.round(F.col(f"_v{i}") / F.col("_norm"), 4) + F.lit(0.0),
                )
            )
            for i in range(dim)
        ],
    )
    return normed.select("doc_id", "n_toks", embed.alias("embed"))

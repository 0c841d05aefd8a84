"""Similarity search over embedding columns (training-data extension).

Brute-force cosine top-k as the exact baseline, and a random-hyperplane
LSH-bucketed variant as the scale path. Embeddings are plain
``array<float>`` columns; all arithmetic runs JVM-side via higher-order
functions (zip_with/aggregate) in double precision — no Python in the hot
path.

Scale shape: brute force is queries x corpus — fine when the query side is
small and broadcast (the common "probe a candidate set" case). The LSH
variant buckets both sides by hyperplane sign bits so each query only
scores its bucket's collisions; planes are derived deterministically from
(seed, plane, dim) hash arithmetic, so signatures are reproducible across
runs and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a, b):
    """Exact-order double dot product of two array columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a):
    return F.sqrt(dot(a, a))


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "q_embedding",
    corpus_vec: str = "embedding",
    broadcast_queries: bool = True,
    tie_round: int | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, vec_id, cos) per query.

    Query side broadcast (no shuffle of the corpus); per-query top-k via a
    window on the joined score — ties broken by corpus id for determinism.
    ``tie_round``: rank by ``round(cos, tie_round)`` instead of raw cos so
    the k-cut agrees with any downstream consumer that compares rounded
    scores (e.g. a cross-engine oracle) — raw-cos ordering can cut a row
    the rounded ordering keeps when near-ties straddle the boundary.
    """
    q = F.broadcast(queries) if broadcast_queries else queries
    scored = q.crossJoin(corpus).select(
        query_id,
        corpus_id,
        cosine(F.col(query_vec), F.col(corpus_vec)).alias("cos"),
    )
    rank_by = F.round("cos", tie_round) if tie_round is not None else F.col("cos")
    w = Window.partitionBy(query_id).orderBy(F.desc(rank_by), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def _plane_component(seed: int, plane: int, dim_idx):
    """Deterministic pseudo-gaussian-ish plane component in [-1, 1)."""
    h = F.xxhash64(F.lit(seed), F.lit(plane), dim_idx)
    return (F.pmod(h, F.lit(2_000_001)).cast("double") - 1_000_000.0) / 1_000_000.0


def dim_indices(vec):
    """0-based dim-index array of ``vec`` — empty-safe: sequence(0, -1) is
    DESCENDING ([0, -1]), not empty, so a bare sequence over an empty
    embedding would zip null pads into the arithmetic."""
    return F.when(
        F.size(vec) > 0, F.sequence(F.lit(0), F.size(vec) - 1)
    ).otherwise(F.array().cast("array<int>"))


def hyperplane_signature(
    vec, n_planes: int = 16, seed: int = 42
):
    """Sign-bit LSH signature (long) of an embedding column."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(dim_indices(vec),
                            lambda i: _plane_component(seed, p, i)),
                lambda x, c: x.cast("double") * c,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


_NDP_PRIME = (1 << 31) - 1
_NDP_MIX = 2_654_435_761


def ndp_plane_coeffs(n_tables: int, band_bits: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficients for each (table, bit) hyperplane —
    the same integer family the MinHash signatures use, so any engine
    (including the DuckDB oracle) reproduces identical plane components and
    therefore identical candidate sets."""
    p = _NDP_PRIME
    return [
        (2 * ((seed * 1_000_003 + idx * 7_919) % (p // 2)) + 1,
         (seed * 104_729 + idx * 52_361) % p)
        for idx in range(n_tables * band_bits)
    ]


def ndp_component(a: int, b: int, i):
    """Deterministic pseudo-uniform value in [-1, 1) for dim index ``i``
    (0-based column) from exact integer arithmetic — the shared component
    formula for hyperplanes and reproducible perturbations. Any engine
    reproduces it bit-exactly: comp = (((a * (((i%P+1)*MIX) % P) + b) % P)
    % 2000001 - 1000000) / 1e6.

    The index is pre-reduced mod P so callers may pass LARGE derived
    indices (e.g. dim + vec_id * stride for per-vector noise streams)
    without (i+1)*MIX overflowing int64: (i%P+1) < 2^31 keeps the product
    < 2^62, and the reduction is exact ((i%P+1)*MIX == (i+1)*MIX mod P) —
    values are unchanged for i < P, i.e. everything computed before the
    guard existed."""
    x = ((F.pmod(i, F.lit(_NDP_PRIME)) + 1) * F.lit(_NDP_MIX)) % F.lit(_NDP_PRIME)
    h = (F.lit(a) * x + F.lit(b)) % F.lit(_NDP_PRIME)
    return ((h % F.lit(2_000_001)).cast("double") - 1_000_000.0) / 1_000_000.0


def near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 8,
    band_bits: int = 8,
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-dup pair mining: (id_a, id_b, cos) with
    id_a < id_b and cos >= threshold.

    Default (the 100 TB path): multi-table sign-bit banding. Each of
    ``n_tables`` tables buckets vectors by a ``band_bits``-bit hyperplane
    signature; candidate pairs are bucket collisions in >= 1 table; exact
    cosine runs once per distinct candidate. Cost is the sum of squared
    bucket sizes per table — set by bucket granularity, never corpus^2.
    Per-pair recall at angle theta: 1 - (1 - (1-theta/pi)^band_bits)^n_tables
    — e.g. ~99% at cos 0.95 with the defaults; raise band_bits for finer
    buckets at bigger corpora, raise n_tables to buy recall back.

    Signatures use exact integer plane derivation (``ndp_plane_coeffs``),
    so the candidate set is engine-reproducible — the DuckDB oracle runs
    the same banding, making even the approximate variant value-checkable.
    The projection sign is taken after round(., 6) so a borderline-zero
    projection cannot flip across engines' float summation.

    ``exact=True`` is the brute-force all-pairs baseline (CartesianProduct;
    small inputs / recall-measurement only).
    """
    a_ = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__ea"))
    b_ = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__eb"))
    if exact:
        cand = a_.crossJoin(b_).filter(F.col("id_a") < F.col("id_b"))
        scored = cand.select(
            "id_a", "id_b", cosine(F.col("__ea"), F.col("__eb")).alias("cos")
        )
        return scored.filter(F.round("cos", 6) >= threshold)

    coeffs = ndp_plane_coeffs(n_tables, band_bits, seed)
    # projections via posexplode + codegen hash-agg, NOT nested higher-order
    # functions: HOF expressions (transform/zip_with/aggregate) are
    # interpreted per element, and n_tables*band_bits folds per row cost
    # ~100ns/op in the expression walker (measured 17 s for 4k x 64-dim
    # rows). Exploding to (id, i, x) and summing x * comp(i) per plane runs
    # in whole-stage codegen — and since one row's elements explode inside
    # one task, the partial-agg order IS the sequential index order, so the
    # float sums match the fold formulation exactly.
    ex = emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("__i", "__x"),
    )
    projs = ex.groupBy("id").agg(
        *[
            F.sum(
                F.col("__x").cast("double")
                * ndp_component(a, b, F.col("__i").cast("long"))
            ).alias(f"__p_{t}_{p}")
            for t in range(n_tables)
            for p in range(band_bits)
            for a, b in [coeffs[t * band_bits + p]]
        ]
    )
    sigs = []
    for t in range(n_tables):
        sig = F.lit(0).cast("long")
        for p in range(band_bits):
            proj = F.col(f"__p_{t}_{p}")
            sig = sig + F.when(F.round(proj, 6) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        sigs.append(sig)
    banded = projs.select(
        "id",
        F.posexplode(F.array(*sigs)).alias("band", "sig"),
    )
    ca = banded.select(F.col("id").alias("id_a"), "band", "sig")
    cb = banded.select(F.col("id").alias("id_b"), "band", "sig")
    cand = (
        ca.join(cb, on=["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # norms once per VECTOR (codegen agg over the exploded table), not per
    # pair — cosine per candidate is then a single interpreted dot fold
    # instead of three (dot + 2 norms)
    norms = ex.groupBy("id").agg(
        F.sqrt(F.sum(F.col("__x").cast("double") * F.col("__x").cast("double"))).alias("__n")
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("__n").alias("__na"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("__n").alias("__nb"))
    # per-pair score: one interpreted dot fold per candidate. Candidates
    # here are banding-bounded (sum of squared bucket sizes, tuned via
    # band_bits) — orders of magnitude fewer than semantic_dedup's
    # within-cluster pairs — and at that volume the fold beats the
    # explode+hash-agg codegen shape (an extra exchange + codegen stage
    # whose compile time alone exceeds the fold on 10^3-10^4 pairs;
    # measured both ways at sf0.1). semantic_dedup uses the codegen
    # shape for the opposite reason; both are oracle-bit-exact.
    scored = (
        cand.join(a_, on="id_a")
        .join(b_, on="id_b")
        .join(na, on="id_a")
        .join(nb, on="id_b")
        .select(
            "id_a", "id_b",
            (dot(F.col("__ea"), F.col("__eb")) / (F.col("__na") * F.col("__nb"))).alias("cos"),
        )
    )
    return scored.filter(F.round("cos", 6) >= threshold)


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    seed: int = 42,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "q_embedding",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only signature-bucket collisions.

    Recall is tunable via n_planes (fewer planes = bigger buckets = higher
    recall/cost). Use cosine_topk for exactness; this is the 100 TB path
    where the corpus cannot be brute-forced per query.
    """
    qb = queries.withColumn("_sig", hyperplane_signature(F.col(query_vec), n_planes, seed))
    cb = corpus.withColumn("_sig", hyperplane_signature(F.col(corpus_vec), n_planes, seed))
    scored = (
        F.broadcast(qb)
        .join(cb, on="_sig")
        .select(query_id, corpus_id, cosine(F.col(query_vec), F.col(corpus_vec)).alias("cos"))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos"), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def semantic_dedup(
    df: DataFrame,
    cluster_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    mode: str = "dominated",
    tie_round: int = 6,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: within each cluster, find
    embedding pairs whose cosine >= ``threshold`` and mark every document
    that loses to a duplicate as droppable (Abbas et al. 2023, "SemDeDup":
    cluster first so the pairwise pass is bounded by cluster size, never
    corpus size — the global O(n^2) never materializes).

    ``cluster_col`` is any partition of the corpus: an IVF assignment
    (:func:`~htrc_feature_reader_spark.operators.ivf.assign_ivf` bucket), an
    LSH signature (:func:`hyperplane_signature`), or an existing category
    column. Finer clustering = cheaper and stricter (cross-cluster dups are
    never compared — that is the approximation being bought).

    Two survivorship contracts, both deterministic under any partitioning:

    - ``mode='dominated'`` (default, single pass): a row is a duplicate iff
      some SMALLER-id row in its cluster is within threshold; ``dup_of`` is
      the smallest such id. Conservative (drops strictly more than greedy
      sequential scanning) but one self-join + one aggregate — the shape to
      run at 100 TB.
    - ``mode='components'``: exact duplicate GROUPS — connected components
      of the threshold graph (via the large/small-star iteration of
      :func:`~htrc_feature_reader_spark.operators.components.connected_components`);
      keeps the min id per component. What the SemDeDup paper's per-group
      "keep one representative" does, at the cost of the iterative CC rounds.

    Returns every input row as ``(id_col, cluster_col, is_dup, dup_of)``
    with ``dup_of`` null on survivors. Cosine comparisons use
    ``round(cos, tie_round)`` so a cross-engine replay (or a rerun under
    different reduction order) cannot flip a boundary pair.

    Scale shape: the self-join keys on ``cluster_col`` — one exchange of
    (id, cluster, vec), reused by both sides; cost is sum over clusters of
    size^2, so SIZE YOUR CLUSTERS (IVF k ~ corpus_size / desired_cluster)
    — a 10^5-row cluster means 10^10 candidate pairs and no engine saves
    you. No forced broadcasts; AQE handles skewed cluster sizes.
    """
    if mode not in ("dominated", "components"):
        raise ValueError(f"mode must be 'dominated' or 'components', got {mode!r}")
    taken = {"is_dup", "dup_of", "__idb"} & set(df.columns)
    if taken:
        raise ValueError(
            f"input columns {sorted(taken)} collide with semantic_dedup's "
            "output/internals; rename them first (e.g. when re-running over "
            "a previously annotated frame)"
        )
    from ..functions import ensure_min_parallelism

    # tiny-input round-robin barrier (no-op at scale): one shared exchange
    # under all three references of df (both self-join sides + the output
    # join), so the input evaluates once — same rationale as near_dup_pairs
    df = ensure_min_parallelism(df)
    # compute each vector's norm ONCE per row before the self-join:
    # per-pair work is then a single dot fold + one divide. Calling
    # cosine(a, b) on the joined pair folds THREE aggregates per pair
    # (dot + both norms) — measured 119 s vs seconds at sf0.1 for the
    # same result. The per-pair expression dot/(na*nb) keeps the exact
    # arithmetic shape the SQL oracle evaluates (unit-normalizing the
    # vectors instead would perturb the last float bit and could flip a
    # round-6 boundary pair across engines).
    a = df.select(
        F.col(cluster_col).alias("__c"),
        F.col(id_col).alias("__ida"),
        F.col(vec_col).alias("__va"),
        norm(F.col(vec_col)).alias("__na"),
    )
    b = df.select(
        F.col(cluster_col).alias("__c"),
        F.col(id_col).alias("__idb"),
        F.col(vec_col).alias("__vb"),
        norm(F.col(vec_col)).alias("__nb"),
    )
    # per-pair dot via posexplode + codegen hash-agg instead of the
    # interpreted fold — bit-identical float result (one pair's elements
    # explode consecutively in one task, so the map-side partial sum runs
    # in index order; __nul reproduces the fold's null-poisoning on
    # ragged pairs). Same rewrite as near_dup_pairs' scoring; the joined
    # pair rows never carry the vectors past this projection.
    zp = (
        F.col("__z.__va").cast("double") * F.col("__z.__vb").cast("double")
    ).alias("__p")
    edges = (
        a.join(b, on="__c")
        .filter(F.col("__ida") < F.col("__idb"))
        .select(
            "__ida", "__idb", "__na", "__nb",
            F.posexplode(F.arrays_zip("__va", "__vb")).alias("__i", "__z"),
        )
        .select("__ida", "__idb", "__na", "__nb", zp)
        .groupBy("__ida", "__idb", "__na", "__nb")
        .agg(
            F.sum("__p").alias("__dot"),
            F.max(F.col("__p").isNull()).alias("__nul"),
        )
        .select(
            "__ida",
            "__idb",
            F.round(
                F.when(~F.col("__nul"), F.col("__dot"))
                / (F.col("__na") * F.col("__nb")),
                tie_round,
            ).alias("__cos"),
        )
        .filter(F.col("__cos") >= threshold)
    )
    if mode == "dominated":
        losers = edges.groupBy("__idb").agg(F.min("__ida").alias("dup_of"))
        out = df.join(
            losers, on=df[id_col] == losers["__idb"], how="left"
        ).drop("__idb")
    else:
        from .components import connected_components

        cc = connected_components(edges, id_a="__ida", id_b="__idb")
        losers = (
            cc.filter(F.col("id") != F.col("component"))
            .select(F.col("id").alias("__idb"), F.col("component").alias("dup_of"))
        )
        out = df.join(
            losers, on=df[id_col] == losers["__idb"], how="left"
        ).drop("__idb")
    return out.select(
        id_col,
        cluster_col,
        F.col("dup_of").isNotNull().alias("is_dup"),
        "dup_of",
    )

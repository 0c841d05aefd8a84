"""Corpus deduplication operators (training-data pipeline extensions).

Not in the reference (it processes one volume at a time); these are the
corpus-scale companions a 100 TB training pipeline needs, each expressed as
Catalyst plans with map-side partial aggregation:

- exact dedup      : hash-groupBy on a content digest
- word/char shingles, MinHash + LSH banding : near-dup candidate pairs with
  one shuffle per stage and no quadratic blow-up
- n-gram Jaccard   : exact similarity on candidate pairs (shared-shingle
  equi-join, so only pairs with >=1 common shingle are ever materialized)
- SimHash          : 64-bit weighted fingerprint; near-dups differ in few bits

Scale notes: every operator is groupBy/join-shaped (AQE-splittable). The
MinHash signature build aggregates per (doc, hash_i) with min() — a partial
agg — then packs; LSH pairs come from a self-join on (band, bucket), which
is bounded by bucket size, not corpus size. A stop-shingle filter (drop
shingles appearing in > max_df docs) keeps degenerate buckets from
exploding — the standard trick for web-scale MinHash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Mersenne prime 2^61-1: the classic universal-hash modulus — products of
# two < 2^61 values stay within int64*... careful: a*x can overflow int64.
# We keep a, x < 2^31 so a*x + b < 2^62 fits signed int64 under ANSI mode.
_MH_PRIME = (1 << 31) - 1  # 2147483647


def content_digest(col, normalize: bool = False):
    """MD5 digest of a text column (optionally whitespace/case-normalized,
    the classic exact-dedup fingerprint)."""
    c = F.col(col) if isinstance(col, str) else col
    if normalize:
        c = F.lower(F.regexp_replace(c, r"\s+", " "))
    return F.md5(c.cast("binary"))


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    normalize: bool = False,
) -> DataFrame:
    """Exact dedup: one surviving (min id) row per distinct content digest.

    Returns (digest, keep_id, n_dups). One shuffle; digest computed map-side.
    """
    return (
        df.select(content_digest(text_col, normalize).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def word_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle). Pure Catalyst:
    split + transform over index sequence + explode + distinct."""
    from ..functions import ensure_min_parallelism

    df = ensure_min_parallelism(df)  # CPU-bound explode: spread tiny inputs
    arr = F.split(F.col(text_col), " ")
    # guard the short-doc case: sequence(0, -1) is DESCENDING ([0, -1]),
    # not empty, and would index past the end under ANSI mode
    idx = F.when(
        F.size(arr) >= n, F.sequence(F.lit(0), F.size(arr) - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(arr, i + j + 1) for j in range(n)]),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("shingle"))
        .distinct()
    )


def word_shingle_ids(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    base: int = 257,
    mod: int = (1 << 31) - 1,
) -> DataFrame:
    """Distinct (id, shingle_id) pairs with shingle_id the polynomial
    rolling hash of the word n-gram string — bit-identical to
    ``rolling_hash(concat_ws(' ', w_i..w_{i+n-1}))`` but ~3x cheaper:
    each word is hashed over its characters ONCE (one pass over the doc),
    and each shingle's hash is composed from word-level (hash, base^len)
    pairs via H(a||b) = (H(a)*base^len(b) + H(b)) mod p — no shingle
    strings are ever materialized and no character is touched n times.

    Empty words (double spaces) hash as the empty string: the char array
    is ``array_remove(split(w,''),'')`` so the fold over an empty word is
    the identity (h=0, pow=1), exactly as the character-level hash of the
    concatenated string sees only the two spaces.

    Distinctness is ROW-LOCAL: a duplicate (id, shingle_id) pair can only
    come from the same document when ``id_col`` is unique per row (every
    caller here passes a primary-key doc id), so ``array_distinct`` over
    the per-doc id array before the explode yields exactly the global
    ``.distinct()`` set with ZERO shuffle — the (id, shingle_id) exchange
    that used to sit under every consumer is gone. Callers feeding a
    NON-unique id (e.g. a constant) get per-ROW distinctness only and
    must dedup downstream themselves (``decontaminate`` does).
    """
    staged, ids = _staged_shingle_exprs(df, text_col, id_col, n, base, mod)
    return staged.select(
        "id", F.explode(F.array_distinct(ids)).alias("shingle_id")
    )


def _staged_shingle_exprs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    base: int = 257,
    mod: int = (1 << 31) - 1,
    dual: bool = False,
):
    """Returns ``(staged, ids)``: ``staged`` is the one-row-per-doc frame
    ``(id, __wh)`` with the word-hash array materialized as its own
    projection, and ``ids`` is the POSITIONAL shingle-id array EXPRESSION
    over it (element i hashes words ``i..i+n-1``; duplicates preserved).
    Shared staging for :func:`word_shingle_ids` (distinct set semantics)
    and :func:`duplicated_spans` (position-aware coverage semantics).

    Deliberately an (frame, expression) pair, NOT a frame with the array
    as a column: consumers must compose ``ids`` directly into their OWN
    single projection over ``staged`` (``explode(ids)``,
    ``posexplode(ids)``). Staging the array through an intermediate
    ``.select(..., ids.alias(...))`` adds a Project between the word-hash
    projection and the Generate, and that shape measured ~10-30x slower
    at sf0.01 (the array materializes outside the generator's
    whole-stage-codegen span) — the same projection-shape trap as the
    ``__wh`` CollapseProject note below.

    ``dual=True`` composes a SECOND independent polynomial hash (base 263,
    same modulus) in the same char pass and packs the pair as
    ``h257 * 2^31 + h263`` — a ~62-bit id. The single 31-bit family is
    fine where a collision only blurs a similarity signal (LSH banding,
    Jaccard, novelty counts), but :func:`remove_duplicate_spans` DELETES
    text on hash equality: at 10^8+ window occurrences the 31-bit
    birthday bound yields ~10^6 false-duplicate marks, each destroying
    unique tokens. Two independent folds push the first expected
    collision past 10^9 windows; both folds replay in SQL (the oracle
    hashes the shingle string twice with the two bases).
    """
    from ..functions import ensure_min_parallelism

    df = ensure_min_parallelism(df)  # CPU-bound folds: spread tiny inputs
    words = F.split(F.col(text_col), " ")
    base2 = 263  # second independent family for dual mode
    # one char pass per word: (h, p) = (polynomial hash, base^len % mod),
    # PACKED into one long per family — acc = h * 2^31 + p (both < 2^31-1,
    # so the pack stays < 2^62: ANSI-safe). A packed-long accumulator
    # avoids allocating a struct row per character in the interpreted
    # aggregate lambda (measured ~1.5x on the fold-bound shingle stages);
    # h/p unpack exactly via div/mod since both are non-negative. Dual
    # mode folds the base-263 family the same way in a second packed limb.
    lowmask = F.lit((1 << 31) - 1).cast("long")

    def _hi(acc):  # h: the hash limb
        return F.shiftright(acc, 31)

    def _lo(acc):  # p: the base^len limb
        return acc.bitwiseAND(lowmask)

    def packed_step(b):
        def step(acc, ch):
            return F.shiftleft(
                (_hi(acc) * b + F.ascii(ch)) % mod, 31
            ) + (_lo(acc) * b) % mod

        return step

    init = F.lit(1).cast("long")  # h=0, p=1 packed
    if dual:
        def word_fold(w):
            chars = F.array_remove(F.split(w, ""), "")
            return F.struct(
                F.aggregate(chars, init, packed_step(base)).alias("hp"),
                F.aggregate(chars, init, packed_step(base2)).alias("gq"),
            )
    else:
        def word_fold(w):
            return F.aggregate(
                F.array_remove(F.split(w, ""), ""), init, packed_step(base)
            )

    wh = F.transform(words, word_fold)
    # materialize the word-hash array as its own projection: the compose
    # step references it n times, and Catalyst would otherwise INLINE the
    # whole per-word fold into every element_at — O(words^2) per doc
    # (measured 25x slower). CollapseProject keeps a multiply-referenced
    # non-cheap alias as a separate projection, so __wh computes once.
    staged = df.select(F.col(id_col).alias("id"), wh.alias("__wh"))
    wha = F.col("__wh")

    def shingle_hash(i):
        first = F.element_at(wha, i + 1)
        h = _hi(first["hp"]) if dual else _hi(first)
        g = _hi(first["gq"]) if dual else None
        for j in range(1, n):
            e = F.element_at(wha, i + 1 + j)
            ehp = e["hp"] if dual else e
            h = (h * base + 32) % mod  # the joining space (ascii 32)
            h = (h * _lo(ehp) + _hi(ehp)) % mod
            if dual:
                g = (g * base2 + 32) % mod
                g = (g * _lo(e["gq"]) + _hi(e["gq"])) % mod
        if dual:
            # pack: h < 2^31-1 so h * 2^31 + g < 2^62 — fits int64 (ANSI-safe)
            return h * F.lit(1 << 31).cast("long") + g
        return h

    idx = F.when(
        F.size(wha) >= n, F.sequence(F.lit(0), F.size(wha) - n)
    ).otherwise(F.array().cast("array<int>"))
    ids = F.transform(idx, shingle_hash)
    return staged, ids


def shingle_ids(
    shingles: DataFrame, max_df: int | None = None, method: str = "hash"
) -> DataFrame:
    """Map shingles to integer ids; optionally drop stop-shingles present
    in more than ``max_df`` docs (they produce degenerate LSH buckets and
    carry no similarity signal).

    method='hash' (default): polynomial rolling hash of the shingle string
    mod 2^31-1 — computed map-side with NO shuffle, reproducible on any
    engine (the DuckDB oracle runs the same fold). Collisions are shared by
    construction, so results stay engine-identical; at ~n^2/2^32 odds they
    only marginally blur similarity.

    method='dense': dense_rank over a global sort — exact compact ids, but
    a single-partition window; only for vocabulary-sized data.
    """
    from .text import rolling_hash

    if max_df is not None:
        counts = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_count"))
        base = counts.filter(F.col("df_count") <= max_df).select("shingle")
    else:
        base = shingles.select("shingle").distinct()
    if method == "hash":
        return base.select("shingle", rolling_hash("shingle").alias("shingle_id"))
    if method == "dense":
        w = Window.orderBy("shingle")
        return base.select("shingle", (F.dense_rank().over(w) - 1).alias("shingle_id"))
    raise ValueError(f"unknown shingle id method {method!r}")


def remove_stop_shingles(
    doc_shingles: DataFrame,
    max_df: int | None = None,
    max_df_frac: float | None = 0.5,
    id_col: str = "id",
    shingle_col: str = "shingle",
    assume_distinct: bool = False,
    n_docs: DataFrame | None = None,
) -> DataFrame:
    """Drop stop-shingles — shingles present in more than ``max_df`` docs
    (or ``max_df_frac`` of all docs) — before MinHash/LSH or Jaccard.

    This is the guard that keeps web-scale near-dup mining non-quadratic:
    one viral shingle ("of the and", a boilerplate footer) puts every doc
    carrying it into one LSH bucket / one shared-shingle join key, and that
    bucket's cost is its size *squared*. Stop-shingles carry no similarity
    signal (they match everything), so dropping them barely moves Jaccard
    while bounding every bucket.

    Plan shape: one aggregate over the shingle table (map-side combinable)
    produces the stop set, which anti-joins back. Never a join against the
    keep set (that's vocabulary-sized). The corpus size for the fractional
    form rides in as a broadcast 1-row aggregate — no driver action at
    plan-construction time.

    Broadcast policy: the stop set is forced-broadcast ONLY for the
    fractional form, where it is bounded by construction independent of
    corpus size: sum(df) = n_docs * avg_shingles_per_doc, so at most
    avg_shingles_per_doc / max_df_frac shingles can each exceed
    max_df_frac * n_docs (~2x a document's shingle count at the 0.5
    default — kilobytes). An absolute ``max_df`` gives no such bound —
    max_df=5 on a web corpus stops most of the VOCABULARY — so that form
    stays unhinted and AQE picks broadcast vs shuffle from the stop set's
    actual size.

    ``n_docs``: optional lazy 1-row ``__n_docs`` aggregate for the
    fractional threshold. The default derivation (count of distinct ids
    in ``doc_shingles``) re-evaluates the whole shingle subplan — for
    shingle streams that is a full extra pass of the expensive word-hash
    fold over the corpus. Callers that can state the same number from a
    cheap predicate (a doc yields >= 1 n-shingle iff it has >= n
    space-split words, so ``docs.filter(size(split(text, ' ')) >=
    n).agg(count(*))`` is bit-identical) should pass it here.

    Fold-once plan shape: with ``assume_distinct=True`` the input is
    repartitioned by ``shingle_col`` FIRST and both consumers (the df
    aggregation and the anti join's left side) hang off that single
    exchange, which AQE's ReuseExchange materializes once — the upstream
    fold runs one time instead of twice. The df aggregation then needs no
    exchange of its own (partitioning already satisfied). The cost is one
    shuffle of the narrow (id, shingle_id) pair table; the saved fold is
    a full interpreted char pass over the corpus, which measures several
    times the shuffle.
    """
    if max_df is None and max_df_frac is None:
        return doc_shingles
    # document frequency = DISTINCT docs per shingle: inputs with repeated
    # (doc, shingle) rows (non-deduped shingle streams) must not inflate df.
    # assume_distinct=True skips the dedup shuffle — pass it when the input
    # is already distinct per (doc, shingle) (word_shingles /
    # word_shingle_ids guarantee it for unique doc ids), keeping the hot
    # paths at one map-side-combinable aggregate over the shingle table.
    if assume_distinct:
        doc_shingles = doc_shingles.repartition(F.col(shingle_col))
        pairs = doc_shingles.select(id_col, shingle_col)
    else:
        pairs = doc_shingles.select(id_col, shingle_col).distinct()
    counts = pairs.groupBy(shingle_col).agg(F.count(F.lit(1)).alias("__df"))
    if max_df is not None:
        stop = counts.filter(F.col("__df") > max_df).select(shingle_col)
    else:
        if n_docs is None:
            n_docs = doc_shingles.select(id_col).distinct().agg(
                F.count(F.lit(1)).alias("__n_docs")
            )
        stop = counts.join(F.broadcast(n_docs)).filter(
            F.col("__df") > F.col("__n_docs") * F.lit(float(max_df_frac))
        ).select(shingle_col)
        stop = F.broadcast(stop)  # bounded by construction (see docstring)
    return doc_shingles.join(stop, on=shingle_col, how="left_anti")


def minhash_signatures(
    doc_shingles: DataFrame,
    n_hashes: int = 8,
    seed: int = 42,
    shingle_id_col: str = "shingle_id",
) -> DataFrame:
    """MinHash signature per doc: (id, sig array<long> of length n_hashes).

    h_i(x) = (a_i * x' + b_i) mod p with x' = ((x+1) * 2654435761) mod p,
    p = 2^31-1, and deterministic (seeded) odd coefficients — exact integer
    arithmetic, reproducible on any engine (the DuckDB oracle runs the same
    formula). The multiplicative pre-mix matters: ids from dense_rank are
    small dense ints, and an affine map over them is piecewise monotonic
    (few wraps), which collapses min-hash agreement; spreading x over the
    ring first makes each h_i behave like a random permutation (and the +1
    keeps id 0 off the zero fixed point, where every h_i would degenerate
    to its additive constant b_i).
    """
    coeffs = [
        (2 * ((seed * 1_000_003 + i * 7_919) % (_MH_PRIME // 2)) + 1,
         (seed * 104_729 + i * 52_361) % _MH_PRIME)
        for i in range(n_hashes)
    ]
    # all math in long: int32 a*x overflows under ANSI mode
    x = ((F.col(shingle_id_col).cast("long") + 1) * F.lit(2_654_435_761)) % F.lit(_MH_PRIME).cast("long")
    hashes = [
        ((F.lit(a).cast("long") * x + F.lit(b).cast("long")) % _MH_PRIME).alias(f"h{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    per_hash = doc_shingles.select("id", *hashes)
    mins = per_hash.groupBy("id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(n_hashes)]
    )
    return mins.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("sig")
    )


def _cap_buckets(bands: DataFrame, keys: list[str], max_bucket: int) -> DataFrame:
    """Drop band buckets holding more than ``max_bucket`` members before a
    banded self-join. A bucket of size B emits B^2 join rows, so one
    degenerate bucket (empty-doc signatures, templated boilerplate that
    survived the stop-shingle cap) can dominate the whole stage; capping
    trades recall ONLY on members of such buckets for a hard quadratic
    bound — the standard skew guard for web-scale LSH. One extra map-side-
    combinable aggregate on the band table (already shuffled for the join).
    """
    sizes = bands.groupBy(*keys).agg(F.count(F.lit(1)).alias("__bsz"))
    ok = sizes.filter(F.col("__bsz") <= max_bucket).select(*keys)
    return bands.join(ok, on=keys, how="left_semi")


def band_rows(
    signatures: DataFrame, n_bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """(id, sig, band, bucket) — one row per (doc, band), bucket = the
    band's signature slice. The single banding definition shared by the
    one-shot miner (:func:`lsh_candidate_pairs`) and the incremental
    signature store (:mod:`..sources.signature_store`): the store's
    batch-vs-history collision join is only equivalent to the one-shot
    self-join if both sides band identically, so the slice expression
    must not drift between them."""
    return signatures.select(
        "id",
        "sig",
        F.posexplode(
            F.array(*[
                F.slice("sig", b * rows_per_band + 1, rows_per_band)
                for b in range(n_bands)
            ])
        ).alias("band", "bucket"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    n_bands: int = 4,
    rows_per_band: int = 2,
    max_bucket: int | None = None,
    verify_threshold: float | None = None,
) -> DataFrame:
    """Band the signatures and emit candidate pairs sharing any band bucket.

    Pairs are (id_a < id_b), distinct. The self-join is on (band, bucket) —
    cost is sum of bucket sizes squared, not corpus squared; stop-shingle
    filtering upstream keeps buckets small. ``max_bucket`` additionally
    hard-bounds any single bucket's quadratic cost (see ``_cap_buckets``);
    None (default) keeps exact banding semantics.

    ``verify_threshold`` FUSES signature verification into the miner: the
    self-join already carries both sides' full signatures, so the
    estimated Jaccard (fraction of agreeing positions — see
    ``verify_pairs_by_signature``) is one zip_with on the joined row,
    filtered BEFORE the distinct's shuffle. Zero extra joins and no
    re-evaluation of the signature subplan — the standalone verifier
    costs two key joins against ``signatures`` (re-running MinHash when
    the plan isn't materialized); use it only for pairs from elsewhere.
    """
    bands = band_rows(signatures, n_bands, rows_per_band)
    if max_bucket is not None:
        bands = _cap_buckets(bands, ["band", "bucket"], max_bucket)
    carry_a = ["sig"] if verify_threshold is not None else []
    a = bands.select(F.col("id").alias("id_a"),
                     *[F.col(c).alias("__sig_a") for c in carry_a],
                     "band", "bucket")
    b = bands.select(F.col("id").alias("id_b"),
                     *[F.col(c).alias("__sig_b") for c in carry_a],
                     "band", "bucket")
    joined = a.join(b, on=["band", "bucket"]).filter(F.col("id_a") < F.col("id_b"))
    if verify_threshold is not None:
        matches = F.aggregate(
            F.zip_with("__sig_a", "__sig_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        joined = joined.filter(
            matches / F.size("__sig_a") >= verify_threshold
        )
    return joined.select("id_a", "id_b").distinct()


def verify_pairs_by_signature(
    pairs: DataFrame,
    signatures: DataFrame,
    threshold: float = 0.5,
    keep_estimate: bool = True,
) -> DataFrame:
    """Filter LSH candidate pairs by the MinHash-estimated Jaccard — the
    fraction of agreeing signature positions — keeping pairs with estimate
    >= ``threshold``.

    Raw LSH banding has a significant false-positive floor at web scale
    (with 4 bands x 2 rows the collision odds are ~1-(1-s^2)^4 — ~15% at
    true Jaccard 0.2), so dropping documents on bare candidacy silently
    deletes non-duplicates. This check is LAZY and cheap: two key joins
    against the signature table (already computed for banding) and one
    fixed-width zip_with — no re-scan of shingles, no extra shuffle beyond
    the joins. For exact verification on the survivors, feed the result to
    :func:`jaccard_pairs` instead.

    Returns (id_a, id_b[, est_jaccard]).
    """
    sa = signatures.select(F.col("id").alias("id_a"), F.col("sig").alias("__sa"))
    sb = signatures.select(F.col("id").alias("id_b"), F.col("sig").alias("__sb"))
    matches = F.aggregate(
        F.zip_with("__sa", "__sb", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    est = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", matches / F.size("__sa"))
        .filter(F.col("est_jaccard") >= threshold)
    )
    cols = ["id_a", "id_b"] + (["est_jaccard"] if keep_estimate else [])
    return est.select(*cols)


def jaccard_pairs(
    doc_shingles: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing >=1 shingle.

    (id_a, id_b, jacc) with id_a < id_b and jacc >= threshold. The shared-
    shingle equi-join prunes the quadratic space; sizes come from one
    aggregate and join back UNHINTED — the per-doc size table is one row
    per document (corpus-sized at 100 TB), so a forced broadcast would OOM
    every executor; AQE broadcasts it only when it is actually small.
    """
    sizes = doc_shingles.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = doc_shingles.select(F.col("id").alias("id_a"), "shingle")
    b = doc_shingles.select(F.col("id").alias("id_b"), "shingle")
    common = (
        a.join(b, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jacc",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jacc") >= threshold)
        .select("id_a", "id_b", "jacc")
    )


def simhash(
    doc_tokens: DataFrame,
    bits: int = 48,
    seed: int = 42,
    id_col: str = "id",
    token_id_col: str = "token_id",
    weight_col: str | None = "weight",
) -> DataFrame:
    """Weighted SimHash fingerprint per doc from (id, token_id[, weight]).

    Bit j of token t = ((token_id * A + B) >> j) & 1 with deterministic odd
    A — exact integer arithmetic (oracle-reproducible). Fingerprint bit j is
    the sign of the weighted sum of (2*bit - 1).

    The default bits=48 follows the corpus-scale sizing rule documented on
    :func:`simhash_candidate_pairs` (band width must grow with
    log2(corpus); 48/4 bands = 12-bit buckets, right for million-doc
    corpora). Small-bit configs are for oracle-scale tests only.
    """
    A = 2 * ((seed * 2_654_435_761) % (1 << 30)) + 1
    B = seed * 97 + 13
    w = F.col(weight_col) if weight_col else F.lit(1)
    mixed = (F.col(token_id_col).cast("long") * F.lit(A) + F.lit(B)) % F.lit(1 << 62)
    contribs = [
        (w * (F.shiftright(mixed, j).bitwiseAND(F.lit(1)) * 2 - 1)).alias(f"b{j}")
        for j in range(bits)
    ]
    summed = doc_tokens.select(F.col(id_col).alias("id"), *contribs).groupBy("id").agg(
        *[F.sum(f"b{j}").alias(f"b{j}") for j in range(bits)]
    )
    fingerprint = None
    for j in range(bits):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fingerprint = bit if fingerprint is None else fingerprint + bit
    return summed.select("id", fingerprint.cast("long").alias("simhash"))


def hamming_distance(a, b):
    """Popcount of XOR — pair filter for SimHash near-dups."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_candidate_pairs(
    sigs: DataFrame,
    bits: int = 48,
    n_bands: int = 4,
    max_hamming: int | None = None,
    id_col: str = "id",
    sim_col: str = "simhash",
    max_bucket: int | None = None,
) -> DataFrame:
    """SimHash near-dup pair mining: bit-slice each fingerprint into
    ``n_bands`` contiguous bands; candidate pairs share >= 1 identical
    band (self-equi-join on (band, slice) — bucketed, never corpus^2);
    survivors filtered to hamming distance <= ``max_hamming`` (default
    n_bands - 1, the pigeonhole bound: any pair within that distance has
    at least one untouched band, so recall is EXACT, not probabilistic).

    Returns (id_a, id_b, hamming) with id_a < id_b.

    SIZING AT SCALE: each band has 2^(bits/n_bands) buckets and the
    candidate join emits ~N^2 / 2^(bits/n_bands) pairs per band — band
    width must grow with log2(corpus) or the buckets go quadratic. The
    defaults (bits=48, n_bands=4 -> 12-bit bands) follow that rule for
    million-doc corpora; ``simhash`` supports bits up to 62 in one int64
    fingerprint. The 16-bit configs in tests/driver queries are
    oracle-scale, not corpus-scale. ``max_bucket`` hard-bounds any one
    band slice's quadratic cost (degenerate fingerprints — e.g. empty or
    templated docs — all land in one slice): oversized buckets are
    dropped before the self-join, costing recall only for their members.
    With max_bucket set, the pigeonhole recall guarantee holds only for
    pairs outside dropped buckets.
    """
    if bits % n_bands:
        raise ValueError("n_bands must divide bits evenly")
    if max_hamming is None:
        max_hamming = n_bands - 1
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the pigeonhole bound "
            f"n_bands-1={n_bands - 1}: recall would silently become "
            "probabilistic — raise n_bands (or bits) instead"
        )
    width = bits // n_bands
    mask = (1 << width) - 1
    banded = sigs.select(
        F.col(id_col).alias("__id"),
        F.col(sim_col).alias("__sh"),
        F.posexplode(
            F.array(*[
                F.shiftright(F.col(sim_col), b * width).bitwiseAND(F.lit(mask))
                for b in range(n_bands)
            ])
        ).alias("__band", "__slice"),
    )
    if max_bucket is not None:
        banded = _cap_buckets(banded, ["__band", "__slice"], max_bucket)
    a = banded.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sa"),
                      "__band", "__slice")
    b = banded.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__sb"),
                      "__band", "__slice")
    return (
        a.join(b, on=["__band", "__slice"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                hamming_distance(F.col("__sa"), F.col("__sb")).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)  # drop BEFORE the
        .distinct()                               # distinct's shuffle
    )


def decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    n: int = 13,
    broadcast_eval: bool = True,
    return_flags: bool = False,
    flag_col: str = "contaminated",
) -> DataFrame:
    """Benchmark decontamination: remove (or flag) training documents
    sharing any word ``n``-gram with an evaluation/benchmark set — the
    standard 13-gram overlap rule from LLM training-data pipelines.

    Both sides shingle through :func:`word_shingle_ids` (one char pass
    per doc, integer ids, no shingle strings materialized), so the
    overlap test is one semi-join on hashed ids. ``broadcast_eval=True``
    is safe BY CONSTRUCTION here — unlike corpus-sized tables, the
    distinct n-gram set of an eval suite is bounded by the benchmark's
    own size (KB-MB even for large suites), the same bounded-side rule as
    ``vocab.remove_stopwords``; pass False for eval sets that are
    themselves corpus-scale and let AQE pick the strategy.

    Documents shorter than ``n`` words produce no shingles and are never
    flagged (exactly the reference rule: an overlap needs a full n-gram).
    ``return_flags=True`` returns every doc with a ``flag_col``
    (default ``contaminated``) boolean instead of dropping the flagged
    ones.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if return_flags and flag_col in docs.columns:
        # same contract as detect_language: never silently shadow or
        # ambiguate an existing column (e.g. a prior decontamination run)
        raise ValueError(
            f"output column {flag_col!r} already exists; pass flag_col="
        )
    eval_text_col = eval_text_col or text_col
    ev = eval_df.select(F.lit(0).alias("__eid"), F.col(eval_text_col).alias("__t"))
    ev_sh = (
        word_shingle_ids(ev, "__t", "__eid", n=n)
        .select("shingle_id")
        .distinct()
    )
    if broadcast_eval:
        ev_sh = F.broadcast(ev_sh)
    tr_sh = word_shingle_ids(docs, text_col, id_col, n=n)
    contaminated = (
        tr_sh.join(ev_sh, on="shingle_id", how="left_semi")
        .select(F.col("id").alias(id_col))
        .distinct()
    )
    if return_flags:
        flag = contaminated.withColumn(flag_col, F.lit(True))
        return docs.join(flag, on=id_col, how="left").withColumn(
            flag_col, F.coalesce(F.col(flag_col), F.lit(False))
        )
    return docs.join(contaminated, on=id_col, how="left_anti")


def boilerplate_fraction(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_df: int = 5,
) -> DataFrame:
    """Cross-document boilerplate signal: for each doc, the fraction of
    its distinct word ``n``-grams that appear in at least ``min_df``
    documents corpus-wide (headers, footers, license blurbs, navigation
    chrome — the template text that within-doc repetition signals
    (:func:`~.text.repetition_features`) cannot see because it repeats
    *across* documents, not inside one).

    Appends three columns: ``n_shingles`` (distinct n-grams in the doc),
    ``n_boiler`` (of those, how many are corpus-boilerplate), and
    ``boilerplate_frac`` (their ratio; 0.0 for docs shorter than ``n``
    words). Filter on ``boilerplate_frac`` to drop template-dominated
    docs, the usual cleaning rule.

    Scale: one distinct over (doc, shingle-hash) pairs (the same
    single-char-pass hashing as :func:`word_shingle_ids` — no shingle
    strings materialized), one map-side-combined count by shingle to find
    the heavy set, one semi-join back, one count by doc. The heavy set is
    bounded by construction (#heavy <= total_pairs / min_df), so at
    corpus scale AQE typically broadcasts it; nothing here is forced.
    Counting distinct n-grams (sets, not multisets) keeps every
    aggregation a plain count and makes the signal insensitive to
    within-doc repetition, which is measured separately.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_df < 2:
        raise ValueError(f"min_df must be >= 2 (1 flags everything), got {min_df}")
    pairs = word_shingle_ids(docs, text_col, id_col, n=n)
    heavy = (
        pairs.groupBy("shingle_id")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= min_df)
        .select("shingle_id")
    )
    totals = pairs.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    flagged = (
        pairs.join(heavy, on="shingle_id", how="left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_boiler"))
    )
    per_doc = totals.join(flagged, on="id", how="left").select(
        F.col("id").alias(id_col),
        "n_shingles",
        F.coalesce(F.col("n_boiler"), F.lit(0)).alias("n_boiler"),
    )
    return docs.join(per_doc, on=id_col, how="left").select(
        "*",
        (
            F.coalesce(F.col("n_boiler"), F.lit(0))
            / F.greatest(F.coalesce(F.col("n_shingles"), F.lit(0)), F.lit(1))
        ).alias("boilerplate_frac"),
    ).withColumn("n_shingles", F.coalesce(F.col("n_shingles"), F.lit(0))).withColumn(
        "n_boiler", F.coalesce(F.col("n_boiler"), F.lit(0))
    )


def ngram_novelty(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty: of the document's DISTINCT word
    ``n``-gram shingles, the fraction that occur in NO other document —
    the complement of :func:`boilerplate_fraction` at ``min_df=2``.
    Novelty near 1.0 means the document contributes genuinely new text;
    near 0.0 means everything in it already exists elsewhere (a fuzzy-
    duplicate / template signal that survives word-level edits which
    defeat exact dedup).

    Returns ``(id_col, n_shingles, n_novel, novelty_frac)``; documents
    shorter than ``n`` words have no shingles and are absent (the same
    contract as the LSH miner they share shingles with).

    Scale: the document-frequency aggregation and the join back both key
    on ``shingle_id``, so the exchange introduced by the groupBy is
    reused for the join (one shuffle of the pair set, not two); the
    per-document fold partial-aggregates map-side. No forced broadcasts —
    the shingle space is unbounded.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    pairs = word_shingle_ids(docs, text_col, id_col, n=n)
    dfreq = pairs.groupBy("shingle_id").agg(F.count(F.lit(1)).alias("__df"))
    return (
        pairs.join(dfreq, on="shingle_id")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("__df") == 1).cast("long")).alias("n_novel"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_shingles",
            "n_novel",
            (F.col("n_novel") / F.col("n_shingles")).alias("novelty_frac"),
        )
    )


def duplicated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    min_count: int = 2,
) -> DataFrame:
    """Per-document duplicated-SPAN coverage: the fraction of each
    document's word positions covered by at least one length-``n`` window
    whose corpus-wide occurrence count (all positions, including repeats
    WITHIN the same document) is >= ``min_count``. This is the
    span-granular signal behind substring-level training-data dedup (Lee
    et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): document-level near-dup misses a boilerplate footer pasted
    into a million otherwise-unique pages; this measures exactly how much
    of each doc is such repeated material, and a downstream cut can drop
    or trim the high-coverage tail.

    Returns ``(id_col, n_tokens, dup_tokens, dup_frac)`` for EVERY input
    document (docs shorter than ``n`` words have 0 coverage). ``n_tokens``
    counts single-space-split words — the same positions the windows index.

    Window identity uses the dual ~62-bit hash family (collisions here
    overstate coverage that downstream cuts act on — same rationale as
    :func:`remove_duplicate_spans`).

    Plan shape: ONE positional shingle pass per doc (the shared rolling-
    hash staging, no strings through the shuffle — the expensive word-
    hash fold runs once, not once per consumer), one shuffle on the
    window hash where a whole-partition count window marks duplicated
    occurrences in place. The tradeoff vs groupBy + join-back is
    deliberate: the join-back shape would re-plan the fold (its two
    exchanges differ, so ReuseExchange cannot merge them — 2x CPU over
    the whole corpus) but is AQE-skew-splittable, while a window group
    cannot be split — a degenerate window ("! ! ! !" at 10^8
    occurrences) lands its ~2.4 GB of narrow (id, pos, sid) rows on one
    sort-spilling task. That straggler FINISHES (spill, not OOM) and the
    hot windows are precisely the boilerplate this op exists to find, so
    the once-computed fold wins; :func:`remove_duplicate_spans` needs
    the same window anyway (its first-occurrence rank has no
    aggregate-shaped alternative). Then per-doc interval merging runs
    via two same-sort window passes
    (gaps-and-islands: a window opens a new island only when it starts
    past the running max end, so each island is contiguous and coverage
    sums exactly, overlaps never double-count). The island windows and
    the final aggregate share one hash partitioning on the doc id; total
    cost is two shuffles of the position table regardless of corpus size.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    staged, sids = _staged_shingle_exprs(docs, text_col, id_col, n, dual=True)
    occ = staged.select(
        "id", F.posexplode(sids).alias("pos", "sid")
    )
    hits = (
        occ.withColumn("__cnt", F.count(F.lit(1)).over(Window.partitionBy("sid")))
        .filter(F.col("__cnt") >= min_count)
        .select("id", "pos", (F.col("pos") + n - 1).alias("__end"))
    )
    w_prev = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    hits = hits.withColumn("__pm", F.max("__end").over(w_prev))
    hits = hits.withColumn(
        "__island",
        F.sum(
            F.when(
                F.col("__pm").isNull() | (F.col("pos") > F.col("__pm")), 1
            ).otherwise(0)
        ).over(w_run),
    )
    per_doc = (
        hits.groupBy("id", "__island")
        .agg((F.max("__end") - F.min("pos") + 1).alias("__cov"))
        .groupBy("id")
        .agg(F.sum("__cov").alias("dup_tokens"))
    )
    # token counts come from a plain split of the RAW docs — never from
    # the word-hash array (sizing __wh would run the whole per-word fold
    # just to count words)
    doc_tokens = docs.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), " ")).alias("n_words"),
    )
    return (
        doc_tokens
        .join(per_doc, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            F.col("n_words").cast("long").alias("n_tokens"),
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
            F.when(
                F.col("n_words") > 0,
                F.coalesce(F.col("dup_tokens"), F.lit(0)) / F.col("n_words"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
    )


def token_shingle_ids(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n: int = 5,
    base: int = 257,
    mod: int = (1 << 31) - 1,
) -> DataFrame:
    """Distinct (id, shingle_id) pairs over INT TOKEN ARRAYS — the
    pre-tokenized-sequence analog of :func:`word_shingle_ids` (the
    north-rule input ships ``tokens array<int>``, no text to re-split).
    shingle_id is the polynomial rolling hash of the n consecutive token
    values, ``fold (h*base + pmod(tok, mod)) % mod`` — the same hash
    family as the word path, so every downstream consumer
    (:func:`minhash_signatures`, :func:`lsh_candidate_pairs`,
    :func:`shingle_ids` caps, :func:`boilerplate_fraction`-style counts)
    composes unchanged.

    Unlike the word path there is no per-word inner hash to amortize, so
    the direct per-index fold is O(n) per shingle (O(len * n) per doc,
    n is single digits) with no multi-reference alias to stage — the
    tokens column is a cheap input reference that Catalyst may inline
    freely. pmod keeps negative token ids (some vocabularies use them as
    sentinels) on the positive ring, matching SQL ``%`` replays via
    pmod there too. Docs shorter than n yield no rows (consistent with
    word_shingle_ids and the sub-n decontaminate contract).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from ..functions import ensure_min_parallelism

    df = ensure_min_parallelism(df)  # CPU-bound folds: spread tiny inputs
    toks = F.col(tokens_col)

    def shingle_hash(i):
        h = F.lit(0).cast("long")
        for j in range(n):
            t = F.pmod(F.element_at(toks, i + 1 + j).cast("long"), F.lit(mod))
            h = (h * base + t) % mod
        return h

    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    # row-local distinct (array_distinct before the explode) — ids are
    # unique per doc, so this equals the global .distinct() with no
    # (id, shingle_id) shuffle; same rationale as word_shingle_ids
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(F.transform(idx, shingle_hash))).alias("shingle_id"),
    )


def remove_duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    min_count: int = 2,
) -> DataFrame:
    """Rewrite each document with duplicated spans REMOVED — the rewrite
    step of substring-level dedup (Lee et al. 2022): where
    :func:`duplicated_spans` only measures coverage, this drops the
    covered tokens and keeps the text.

    Contract (deterministic under any partitioning): occurrences of each
    duplicated window hash (corpus count >= ``min_count``) are ordered by
    ``(id, pos)``; the FIRST occurrence keeps its tokens, every later one
    marks its ``n`` positions for removal. A position marked by ANY
    non-first occurrence is removed even if some other window's first
    occurrence also covers it (removal wins — aggressive, simple, and
    exactly replayable; the alternative "keep shields" rule is
    order-dependent). Rewritten text re-joins surviving words with single
    spaces, preserving empty tokens, so documents without removals
    round-trip byte-identically.

    Returns ``(id_col, text_col, n_tokens, n_removed)`` for every input
    document (fully-removed docs get the empty string).

    Window identity uses the DUAL ~62-bit hash family (two independent
    polynomial folds — see ``_staged_shingle_exprs(dual=True)``): this
    operator deletes text on hash equality, so the 31-bit family's
    corpus-scale birthday collisions would destroy unique tokens.

    Scale shape: three token-scale stages, all linear — (1) the
    occurrence table shuffles once on the window hash for the global
    first-occurrence rank (count + row_number share the one sort), (2)
    marked occurrences explode to at most ``n x marks`` removal
    positions, (3) the word-position table anti-joins the removal set and
    reassembles per doc. No forced broadcasts; no step is quadratic in
    corpus or document size.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    staged, sids = _staged_shingle_exprs(docs, text_col, id_col, n, dual=True)
    occ = staged.select("id", F.posexplode(sids).alias("pos", "sid"))
    w_rank = Window.partitionBy("sid").orderBy("id", "pos")
    w_all = Window.partitionBy("sid")
    marked = (
        occ.withColumn("__rk", F.row_number().over(w_rank))
        .withColumn("__cnt", F.count(F.lit(1)).over(w_all))
        .filter((F.col("__cnt") >= min_count) & (F.col("__rk") > 1))
    )
    removed = marked.select(
        "id",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + n - 1)).alias("__rpos"),
    ).distinct()
    words = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("__wpos", "__word"),
    )
    kept = words.join(
        removed,
        on=(words["id"] == removed["id"]) & (words["__wpos"] == removed["__rpos"]),
        how="left_anti",
    )
    rebuilt = kept.groupBy("id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("__wpos", "__word"))),
                lambda s: s["__word"],
            ),
        ).alias("__text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    base = docs.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), " ")).alias("__n_tokens"),
    )
    return (
        base.join(rebuilt, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("__text"), F.lit("")).alias(text_col),
            F.col("__n_tokens").cast("long").alias("n_tokens"),
            (F.col("__n_tokens") - F.coalesce(F.col("__n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )

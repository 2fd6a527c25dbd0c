"""Deduplication operators for large-scale training-data pipelines
(north-star surface beyond the reference; BASELINE.json north_star).

Five dedup families, all candidate-pair based — NEVER an all-pairs cross
join:

- exact: hash-groupBy on a content digest, keep the min-id representative;
- MinHash LSH: shingle -> MLlib MinHashLSH -> banded approxSimilarityJoin
  (bucket-collision candidates only) -> drop the higher id of each
  near-dup pair;
- SimHash: 64-bit sign-of-weighted-bit-sums signature, near-dups found by
  BANDING (4x16-bit chunks; Hamming<=3 pairs must collide on >=1 chunk) —
  an equi-join per band, shuffle on tiny keys;
- n-gram Jaccard: inverted shingle index (explode + equi-join on shingle)
  -> exact Jaccard on candidates that share >=1 shingle;
- embedding cosine: BRP-LSH on L2-normalized vectors (cosine = 1 - d²/2).

Scale posture: every join key here is a digest/bucket, every shuffle is
key-bounded; the representative-selection groupBys are map-side
combinable. Skewed buckets (stop-shingles) are capped via document
frequency filtering before the join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(df: DataFrame, id_col: str, content_cols) -> DataFrame:
    """Exact dedup: keep the min-id row per identical content.

    One shuffle on the md5 digest of the content columns (fixed-width key,
    no wide-row shuffle), then a semi-join back — original rows pass
    through untouched.

    NULLs are digested as an explicit sentinel (``concat_ws`` alone SKIPS
    nulls, which would collide ('a', NULL, 'b') with ('a', 'b', NULL)).
    """
    digest = F.md5(
        F.concat_ws(
            "\x1f",
            *[F.coalesce(F.col(c).cast("string"), F.lit("\x00<NULL>")) for c in content_cols],
        )
    )
    keep = (
        df.select(F.col(id_col), digest.alias("__dg"))
        .groupBy("__dg")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# shingling (shared by MinHash + Jaccard)
# ---------------------------------------------------------------------------


def word_ngrams(tokens: Column, n: int = 3) -> Column:
    """Word n-gram shingles of a token array, JVM-side: slide an index
    sequence over the array and join each window with spaces.

    Arrays shorter than ``n`` yield an EMPTY shingle set — guarded
    explicitly because ``sequence(0, size-n)`` would descend for short
    arrays and ``slice(tokens, 0, n)`` throws on a zero start index.
    """
    body = F.transform(
        F.sequence(F.lit(0), F.size(tokens) - n),
        lambda i: F.array_join(F.slice(tokens, i + 1, n), " "),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(tokens) >= n, body).otherwise(empty)


def distinct_shingles(df: DataFrame, id_col: str, tokens_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) exploded DISTINCT pairs — the inverted-index input."""
    return (
        df.select(F.col(id_col), F.explode(word_ngrams(F.col(tokens_col), n)).alias("shingle"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# MinHash LSH near-dup
# ---------------------------------------------------------------------------


def minhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    n: int = 3,
    jaccard_threshold: float = 0.7,
    num_hash_tables: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-dup pairs (a_id < b_id, jaccard_dist) via MLlib
    MinHashLSH over hashed-shingle binary vectors.

    ``approxSimilarityJoin`` distance is JACCARD DISTANCE (1 - similarity);
    pairs above ``jaccard_threshold`` similarity survive. HashingTF keeps
    the vector width fixed (2^18) regardless of corpus vocabulary.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = df.select(
        F.col(id_col), word_ngrams(F.col(tokens_col), n).alias("__sh")
    ).filter(F.size("__sh") > 0)
    tf = HashingTF(inputCol="__sh", outputCol="__vec", binary=True, numFeatures=1 << 18)
    vec = tf.transform(sh)
    mh = MinHashLSH(inputCol="__vec", outputCol="__hashes",
                    numHashTables=num_hash_tables, seed=seed)
    model = mh.fit(vec)
    pairs = model.approxSimilarityJoin(
        vec, vec, 1.0 - jaccard_threshold, distCol="jaccard_dist"
    )
    a, b = F.col(f"datasetA.{id_col}"), F.col(f"datasetB.{id_col}")
    return (
        pairs.select(a.alias("a_id"), b.alias("b_id"), "jaccard_dist")
        .filter(F.col("a_id") < F.col("b_id"))
        .distinct()
    )


def dedup_minhash(
    df: DataFrame, id_col: str, tokens_col: str, **kwargs
) -> DataFrame:
    """Near-dup dedup: drop every row that appears as the HIGHER id of a
    near-dup pair (min-id representative survives; standard candidate-pair
    removal — transitive chains collapse to their least id per edge).

    Uses the DataFrame-native banded MinHash (:func:`minhash_banded_pairs`)
    — same banding theory as MLlib's MinHashLSH but ~3-5x faster: signatures
    are plain long arrays computed in one ``aggregate`` pass (no sparse
    vectors, no UDT serialization), candidates come from band equi-joins.
    """
    pairs = minhash_banded_pairs(df, id_col, tokens_col, **kwargs)
    dropped = pairs.select(F.col("b_id").alias(id_col)).distinct()
    return df.join(dropped, id_col, "left_anti")


# universal-hash parameters for the signature permutations: h_i(x) =
# (a_i * x + b_i) mod p, p = 2^61 - 1 (Mersenne; products of 61-bit values
# would overflow long, so we mix with xxhash64 re-seeding instead: each
# permutation hashes (shingle, i) — independent 64-bit hashes per slot)
_MERSENNE_61 = (1 << 61) - 1
_LONG_MAX = (1 << 63) - 1


def minhash_signature_from_shingles(sh: Column, k: int = 32) -> Column:
    """k-slot MinHash signature of an already-built shingle array, as ONE
    JVM expression: per shingle, k independent hashes (xxhash64 re-seeded
    by slot index); per slot, the min over shingles. No explode, no UDT —
    an array<long> column. An EMPTY shingle array yields the all-_LONG_MAX
    init signature — callers must filter those rows out (Jaccard over empty
    sets is undefined and the sentinel collides with every other sentinel).
    """
    init = F.array(*[F.lit(_LONG_MAX).cast("long")] * k)
    slots = F.array(*[F.lit(i) for i in range(k)])
    return F.aggregate(
        sh,
        init,
        lambda acc, s: F.zip_with(
            acc,
            F.transform(slots, lambda i: F.xxhash64(s, i)),
            lambda x, y: F.least(x, y),
        ),
    )


def minhash_signature(tokens: Column, n: int = 3, k: int = 32) -> Column:
    """k-slot MinHash signature of the word-``n``-gram shingle set (see
    :func:`minhash_signature_from_shingles` for the empty-set caveat)."""
    return minhash_signature_from_shingles(word_ngrams(tokens, n), k)


def minhash_banded_pairs(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    n: int = 3,
    jaccard_threshold: float = 0.7,
    k: int = 32,
    n_bands: int = 8,
    **_compat,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash, DataFrame-native.

    1. signature: k=32 min-hashes per doc (one aggregate pass, array<long>);
    2. banding: 8 bands x 4 rows — band key = xxhash64 of the slice; a pair
       with Jaccard j collides w.p. 1-(1-j^4)^8 (≈0.99 at j=0.8);
    3. candidates: per-band equi-join on (band, key) — shuffle on 64-bit
       keys, candidate count bounded by bucket collisions;
    4. estimate: fraction of agreeing signature slots >= threshold.

    Exact duplicates have identical signatures -> collide in every band,
    estimated Jaccard exactly 1.
    """
    r = k // n_bands
    # Docs with no n-grams (< n tokens) would all keep the _LONG_MAX init
    # signature and collide in every band with est_jaccard 1.0 — their
    # shingle sets are empty, so Jaccard is undefined; exclude them up
    # front, mirroring the size() guard in minhash_dup_pairs. The guard is
    # on the TOKEN count (size(shingles) > 0 <=> size(tokens) >= n), which
    # keeps the filter off the shingle array — filtering on the array
    # would rebuild it per row once for the predicate and once inside the
    # signature aggregate after projection collapse (~2x scan cost).
    # cached: both band-join sides reuse the signatures (k longs per row)
    sig = (
        df.filter(F.size(F.col(tokens_col)) >= n)
        .select(
            F.col(id_col), minhash_signature(F.col(tokens_col), n, k).alias("__sig")
        )
        .cache()
    )
    bands = sig.select(
        id_col,
        "__sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(*[F.element_at("__sig", b * r + j + 1) for j in range(r)]).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "__sig", "bk.band", "bk.key")
    a = bands.select(F.col(id_col).alias("a_id"), F.col("__sig").alias("__sig_a"), "band", "key")
    b = bands.select(F.col(id_col).alias("b_id"), F.col("__sig").alias("__sig_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "__sig_a", "__sig_b")
        .distinct()
    )
    est = F.aggregate(
        F.zip_with("__sig_a", "__sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(float(k))
    return cand.select(
        "a_id", "b_id", F.round(est, 6).alias("est_jaccard")
    ).filter(F.col("est_jaccard") >= jaccard_threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 64

#: single-bit masks for the 64 positions; bit 63 is the sign bit of a
#: two's-complement long (bitwiseAND is position-wise, so masks work where
#: shift-by-column does not — Spark's shift functions take int literals)
_BIT_MASKS = [1 << i for i in range(_SIMHASH_BITS - 1)] + [-(1 << (_SIMHASH_BITS - 1))]


def simhash_col(tokens: Column, bits: int = _SIMHASH_BITS) -> Column:
    """64-bit SimHash of a token array as ONE JVM expression:

    each token hashes to 64 bits (xxhash64); signature bit i is the sign of
    sum over tokens of (2*bit_i(h) - 1). ``aggregate`` accumulates the 64
    weighted sums into an int array, then the signs fold back into a long
    by OR-ing the positive positions' masks.
    """
    mask_arr = F.array(*[F.lit(m).cast("long") for m in _BIT_MASKS[:bits]])
    zero = F.array(*[F.lit(0)] * bits)
    # hash each token ONCE (the bit tests below are cheap ANDs; putting
    # xxhash64 inside the per-bit lambda would recompute it 64x per token)
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    sums = F.aggregate(
        hashes,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                mask_arr,
                lambda m: F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(0)),
            ),
            lambda a, bit: a + (bit * 2 - 1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            sums,
            mask_arr,
            lambda s, m: F.when(s > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def hash_banded_pairs(
    sig: DataFrame,
    id_col: str,
    sig_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
    bits: int = 64,
) -> DataFrame:
    """Generic banded HAMMING pair join over any ``bits``-wide integer
    signature column (SimHash, image aHash/pHash, audio fingerprints):
    split the signature into ``n_bands`` chunks; any pair within
    ``max_hamming <= n_bands - 1`` must agree on at least one chunk
    (pigeonhole), so candidates come from ``n_bands`` equi-joins on
    chunk keys — no pairwise scan. Exact bit_count Hamming then filters
    candidates. Returns (a_id, b_id, hamming)."""
    if bits % n_bands != 0:
        raise ValueError(f"hash_banded_pairs: {bits} bits not divisible by {n_bands} bands")
    if not 0 <= max_hamming <= n_bands - 1:
        raise ValueError(
            f"hash_banded_pairs: pigeonhole needs max_hamming <= n_bands - 1, "
            f"got {max_hamming} with {n_bands} bands"
        )
    width = bits // n_bands
    bands = sig.select(
        F.col(id_col),
        F.col(sig_col).alias("__sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col(sig_col), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "__sig", "bk.band", "bk.key")
    a = bands.select(
        F.col(id_col).alias("a_id"), F.col("__sig").alias("__sig_a"), "band", "key"
    )
    b = bands.select(
        F.col(id_col).alias("b_id"), F.col("__sig").alias("__sig_b"), "band", "key"
    )
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "__sig_a", "__sig_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("__sig_a").bitwiseXOR(F.col("__sig_b")))
    return cand.select(
        "a_id", "b_id", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def simhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash banding (see :func:`hash_banded_pairs` —
    the shared pigeonhole band join; this wrapper builds the 64-bit text
    signature and caches the one-long-per-row frame so the band
    self-join doesn't recompute signatures from raw text)."""
    sig = df.select(F.col(id_col), simhash_col(F.col(tokens_col)).alias("__sig")).cache()
    return hash_banded_pairs(
        sig, id_col, "__sig", max_hamming=max_hamming, n_bands=n_bands,
        bits=_SIMHASH_BITS,
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, inverted-index candidates)
# ---------------------------------------------------------------------------


def jaccard_dup_pairs(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    n: int = 3,
    threshold: float = 0.6,
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard over inverted-index candidates.

    1. explode distinct shingles (one shuffle on shingle);
    2. drop stop-shingles above ``max_doc_freq`` (skew cap: a shingle in
       half the corpus would otherwise square the candidate set);
    3. equi-join on shingle -> common-shingle counts per pair;
    4. jaccard = common / (|A| + |B| - common), filter >= threshold.

    Pairs sharing zero shingles are never materialized.
    """
    sh = distinct_shingles(df, id_col, tokens_col, n)
    # consumed three times (sizes, left, right of the inverted-index join)
    sh = sh.cache()
    if max_doc_freq is not None:
        rare = (
            sh.groupBy("shingle").agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("__sz"))
    a = sh.select(F.col(id_col).alias("a_id"), "shingle")
    b = sh.select(F.col(id_col).alias("b_id"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("__common"))
    )
    sa = sizes.select(F.col(id_col).alias("a_id"), F.col("__sz").alias("__sz_a"))
    sb = sizes.select(F.col(id_col).alias("b_id"), F.col("__sz").alias("__sz_b"))
    j = (
        common.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn(
            "jaccard",
            F.col("__common")
            / (F.col("__sz_a") + F.col("__sz_b") - F.col("__common")),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select(
        "a_id", "b_id", F.round("jaccard", 6).alias("jaccard")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def cosine_dup_pairs(
    df: DataFrame,
    id_col: str,
    array_col: str,
    threshold: float = 0.95,
    bucket_length: float = 0.3,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Near-identical embeddings via BRP-LSH on L2-NORMALIZED vectors:
    for unit vectors, euclidean d² = 2(1 - cos), so cosine >= t maps to
    d <= sqrt(2(1-t)) — an approxSimilarityJoin threshold."""
    import math

    from pyspark.ml.feature import BucketedRandomProjectionLSH

    from .similarity import l2_normalize

    norm = df.select(
        F.col(id_col), l2_normalize(F.col(array_col)).alias("__arr")
    ).filter(F.col("__arr").isNotNull())
    from pyspark.ml.functions import array_to_vector

    vec = norm.withColumn("__v", array_to_vector(F.col("__arr").cast("array<double>")))
    brp = BucketedRandomProjectionLSH(
        inputCol="__v", outputCol="__h", bucketLength=bucket_length,
        numHashTables=num_hash_tables, seed=seed,
    )
    model = brp.fit(vec)
    dist = math.sqrt(max(2.0 * (1.0 - threshold), 0.0))
    pairs = model.approxSimilarityJoin(vec, vec, dist, distCol="__d")
    a, b = F.col(f"datasetA.{id_col}"), F.col(f"datasetB.{id_col}")
    return (
        pairs.select(
            a.alias("a_id"),
            b.alias("b_id"),
            F.round(1.0 - F.col("__d") * F.col("__d") / 2.0, 6).alias("cosine"),
        )
        .filter(F.col("a_id") < F.col("b_id"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# duplicate clustering (connected components over candidate pairs)
# ---------------------------------------------------------------------------


def _loop_key_skewed(max_deg: int, n_rows: int, n_parts: int) -> bool:
    """Should an iterative join loop keep AQE's runtime skew splitting?

    True when ONE key's rows exceed 4x an average partition AND the
    hot key is big in absolute terms (1M rows ~ tens of MB even at
    wide-row estimates — below that a 'skewed' task is still far under
    AQE's own 256 MB skewedPartitionThresholdInBytes and splitting
    buys nothing). Guide §2.5: AQE skew handling only applies to
    joins, which is exactly what the CC loops run per round."""
    return max_deg > 1_000_000 and max_deg * n_parts > 4 * n_rows


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 25,
) -> DataFrame:
    """Transitive closure of near-dup PAIRS into clusters: (id, comp) with
    ``comp`` = the minimum id reachable from ``id`` — the cluster
    representative every pairwise dedup family (d1-d5) feeds into when
    chains matter (A~B, B~C => {A,B,C} one cluster, which pairwise
    drop-the-higher-id already handles for ids but NOT for arbitrary
    chain shapes).

    Distributed hash-to-min label propagation: every node repeatedly
    adopts the minimum component id among itself and its neighbors;
    fixpoint in O(graph diameter) rounds. Per round: one equi-join on the
    edge key + one map-side-combinable min aggregate. ``localCheckpoint``
    truncates lineage each round (an iterative plan would otherwise grow
    a join tree ``max_iter`` deep and overwhelm the optimizer at scale).
    Near-dup graphs have tiny diameters (dup clusters are quasi-cliques),
    so convergence is a handful of rounds; ``max_iter`` bounds adversarial
    chains, and termination is detected with a per-round changed-count
    (the one scalar action an iterative algorithm needs).
    """
    from ..session import adopt_frame, loop_session

    base_sess = pairs.sparkSession
    edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    # ONE materialization of the (possibly expensive) upstream pair
    # plan — the old shape ran it twice: once when the
    # ``edges.rdd.getNumPartitions()`` pin forced physical planning
    # (under AQE that materializes the plan's stages as real jobs)
    # against the cold cache, and again when the loop's first action
    # filled it. (The cache also pinned the frame at the SESSION
    # shuffle-partition count: AQE cannot re-coalesce a cached plan.)
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().cache()
    # probe the loop's join key (the probe's action also fills the
    # cache — ONE materialization of the possibly-expensive upstream
    # pair plan): the in-loop equi-join is keyed on dst, so a
    # power-law hub key means one straggler task per iteration unless
    # the loop keeps skew splitting; the row count also sizes the
    # loop's shuffles
    deg = sym.groupBy("dst").count().agg(
        F.coalesce(F.max("count"), F.lit(0)).alias("mx"),
        F.coalesce(F.sum("count"), F.lit(0)).alias("n"),
    ).first()
    # scale-adaptive pin: ~4M (src,dst) rows (~100-150 MB shuffled,
    # guide §2.2's partition-size band) per partition, derived from
    # the probed edge count — never a constant tuned to either local
    # mode or one cluster size
    pin = max(1, min(int(deg["n"]) // 4_000_000 + 1, 1 << 20))
    skewed = _loop_key_skewed(int(deg["mx"]), int(deg["n"]), pin)
    if not skewed:
        # pre-partition (and pre-sort) the edge list by the loop's
        # join key ONCE: every iteration's edges-join-labels then
        # needs NO exchange and NO sort on the edge side — the loop
        # shuffles only the node-sized labels (guide §2.4). Skipped
        # under skew: a pre-partitioned side is not a shuffle stage,
        # so AQE could not split its hub partition.
        edges = (
            sym.repartition(pin, "dst")
            .sortWithinPartitions("dst")
            .localCheckpoint(eager=True)
        )
    else:
        edges = sym.localCheckpoint(eager=True)
    # the loop reads only the checkpoint; the symmetrized cache is a
    # superseded copy of the full edge list — free it now instead of
    # holding ~|E| extra blocks for the application's lifetime
    sym.unpersist()
    n_changed = 0
    # fixed-shape rounds (one equi-join + one min agg) run under the
    # loop-scoped cloned session: AQE off (nothing to re-plan, one
    # fewer driver job per exchange per round) UNLESS the probe found
    # a hot key, shuffle partitions pinned to match the edge frame's
    # own partitioning
    with loop_session(
        edges,
        shuffle_partitions=pin,
        skew_join=skewed,
    ) as (_sess, (edges_l,)):
        labels = (
            edges_l.select(F.col("src").alias("id"))
            .distinct()
            .select("id", F.col("id").alias("comp"))
            .localCheckpoint()
        )
        for _ in range(max_iter):
            neigh = (
                edges_l.join(
                    labels.select(
                        F.col("id").alias("dst"), F.col("comp").alias("__nc")
                    ),
                    "dst",
                )
                .groupBy("src")
                .agg(F.min("__nc").alias("__nmin"))
            )
            stepped = labels.join(
                neigh.select(F.col("src").alias("id"), "__nmin"), "id", "left"
            ).select(
                "id",
                F.least(F.col("comp"), F.coalesce(F.col("__nmin"), F.col("comp"))).alias("comp"),
                (F.col("comp") > F.coalesce(F.col("__nmin"), F.col("comp"))).alias("__chg"),
            )
            stepped = stepped.localCheckpoint()
            n_changed = stepped.filter(F.col("__chg")).count()
            labels = stepped.select("id", "comp")
            if n_changed == 0:
                break
        labels = adopt_frame(base_sess, labels)
    if n_changed > 0:
        # a >max_iter-hop chain: partially-propagated labels are WRONG
        # answers (silently splitting one component in two) — refuse
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({n_changed} labels still changing): the pair graph has a "
            f"chain longer than max_iter — raise max_iter (rounds needed "
            "= graph diameter, still log-bounded for any near-dup corpus)"
        )
    return labels


def _star_phase(e: DataFrame, large: bool) -> DataFrame:
    """One large-star or small-star rewiring over an undirected edge
    frame ``(u, v)``: per node, every qualifying neighbor is re-attached
    to the neighborhood minimum. One symmetrize + one min-agg + one join
    — O(|E|) shuffle per phase, no per-node state."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("__mn"))
        .select("u", F.least("u", "__mn").alias("__m"))
    )
    joined = sym.join(mins, "u")
    if large:
        out = joined.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("u"), F.col("__m").alias("v")
        )
    else:
        out = joined.filter(F.col("v") <= F.col("u")).select(
            F.col("v").alias("u"), F.col("__m").alias("v")
        ).unionByName(mins.select("u", F.col("__m").alias("v")))
    return out.filter(F.col("u") != F.col("v")).distinct()


def connected_components_star(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_rounds: int = 60,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    rewiring (Kiveris, Lattanzi, Mirrokni, Rastogi & Vassilvitskii,
    "Connected Components in MapReduce and Beyond", SoCC 2014 — the
    public web-scale formulation). Same output contract as
    :func:`connected_components`: ``(id, comp)`` with ``comp`` the
    component minimum.

    WHY a second algorithm: hash-to-min label propagation converges in
    O(diameter) rounds — ideal for near-dup graphs (quasi-cliques,
    diameter <= ~3) but pathological on chain-shaped graphs, where a
    D-hop path needs D rounds. Star contraction converges in
    O(log^2 n) rounds REGARDLESS of diameter (measured on a 200-node
    path at local[32]: 9 rounds / 12.7s vs 199 rounds / 44.2s for
    hash-min with max_iter raised to 250), at the cost of two shuffles
    per round instead of one. Pick hash-min for dup clusters, star for
    arbitrary graphs.

    Each phase is one O(|E|) shuffle; edges only ever re-point at
    smaller ids, so the frame never grows beyond the symmetrized
    input. Fixpoint detection: a (count, hash-sum) checksum per round,
    CONFIRMED by an exact ``exceptAll`` emptiness check before
    declaring convergence — a checksum collision can only delay
    termination by one round, never corrupt the result.
    """
    from ..session import adopt_frame, loop_session

    base_sess = pairs.sparkSession
    e0 = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    # ONE materialization of the (possibly expensive) upstream pair
    # plan: dedupe base-side (AQE coalescing right-sizes the shuffle
    # from the data) and pin the result with an eager localCheckpoint.
    # NULL endpoints ride through the filter so the null gate below
    # reads the checkpoint instead of re-running the upstream plan —
    # the old shape ran it three times (null gate, the
    # ``e0.rdd.getNumPartitions()`` pin whose physical planning
    # materialized the plan's stages under AQE, and the in-loop
    # distinct).
    e = (
        e0.filter(
            (F.col("u") != F.col("v"))
            | F.col("u").isNull()
            | F.col("v").isNull()
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    if e.filter(F.col("u").isNull() | F.col("v").isNull()).limit(1).count():
        raise ValueError("connected_components_star: NULL pair endpoints")
    nodes = (
        e.select(F.col("u").alias("id"))
        .unionByName(e.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # skew probe on the phase join's key (the symmetrized endpoint): a
    # power-law hub would straggle every round with skew splitting off
    deg = (
        e.select("u")
        .unionByName(e.select(F.col("v").alias("u")))
        .groupBy("u")
        .count()
        .agg(
            F.coalesce(F.max("count"), F.lit(0)).alias("mx"),
            F.coalesce(F.sum("count"), F.lit(0)).alias("n"),
        )
        .first()
    )
    pin = max(1, e.rdd.getNumPartitions())  # checkpointed: no planning jobs
    # the alternating star phases are fixed-shape rounds (symmetrize +
    # min agg + join, O(|E|) shuffles): run them under the loop-scoped
    # cloned session — AQE off unless the probe found a hub, shuffle
    # partitions pinned to the deduped pair frame's own partitioning
    # (input-derived, not a constant)
    with loop_session(
        e,
        shuffle_partitions=pin,
        skew_join=_loop_key_skewed(int(deg["mx"]), int(deg["n"]), pin),
    ) as (_sess, (e_l,)):
        e = e_l

        def _checksum(df: DataFrame):
            # bit_xor: order-independent and overflow-free (ANSI mode
            # makes sum-of-hashes throw); weaker than a sum, but the
            # exact exceptAll confirmation below makes collisions
            # harmless
            row = df.agg(
                F.count("*").alias("n"),
                F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
            ).first()
            return (row["n"], row["h"])

        prev = _checksum(e)
        converged = False
        for _ in range(max_rounds):
            e2 = _star_phase(e, large=True)
            e2 = _star_phase(e2, large=False).localCheckpoint()
            cur = _checksum(e2)
            if cur == prev:
                # exact confirmation — checksum equality is necessary
                # but not sufficient; this runs ONCE at the candidate
                # fixpoint
                # symmetric multiset equality in ONE job
                if e2.exceptAll(e).unionAll(e.exceptAll(e2)).isEmpty():
                    converged = True
                    e = e2
                    break
            prev = cur
            e = e2
        if not converged:
            raise RuntimeError(
                f"connected_components_star did not converge in {max_rounds} "
                "rounds — raise max_rounds (bounded by O(log^2 n), so this "
                "indicates either a tiny max_rounds or a bug, not a deep graph)"
            )
        fix = adopt_frame(base_sess, e)
    # fixpoint is a union of disjoint stars (v -> component min);
    # label centers (and any node never re-attached) with themselves —
    # base-side single-shot query, AQE on
    return (
        nodes.join(
            fix.select(F.col("u").alias("id"), F.col("v").alias("__c")),
            "id",
            "left",
        )
        .groupBy("id")
        .agg(F.min(F.coalesce(F.col("__c"), F.col("id"))).alias("comp"))
    )


def dedup_clusters(
    df: DataFrame, pairs: DataFrame, id_col: str, a_col: str = "a_id", b_col: str = "b_id"
) -> DataFrame:
    """Cluster-aware dedup: keep ONE row (the min-id representative) per
    connected near-dup cluster; rows in no pair pass through untouched."""
    comp = connected_components(pairs, a_col, b_col)
    drop = comp.filter(F.col("id") != F.col("comp")).select(F.col("id").alias(id_col))
    return df.join(drop, id_col, "left_anti")


def cross_corpus_contamination(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    tokens_col: str,
    n: int = 3,
    max_doc_freq: int | None = None,
    broadcast_test: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag train docs sharing >= 1 word
    ``n``-gram with ANY test doc, with the shared-shingle count per doc.

    The standard pre-training hygiene step (strip eval-set text from the
    training corpus). Shape: inverted index on the TRAIN side (one explode
    + one equi-join on shingle — same skeleton as
    :func:`jaccard_dup_pairs`), against the DISTINCT shingle set of the
    test corpus. Eval corpora are orders of magnitude smaller than a
    100 TB train set, so ``broadcast_test=True`` ships them to every
    executor and the train side never shuffles; set False to let AQE pick
    when the test side is itself large.

    ``max_doc_freq`` drops train-side stop-shingles (df cap) before the
    join — the same skew guard as exact Jaccard; leave None for exact
    counts.
    """
    tr = distinct_shingles(train, id_col, tokens_col, n)
    te = distinct_shingles(test, id_col, tokens_col, n).select("shingle").distinct()
    if max_doc_freq is not None:
        rare = (
            tr.groupBy("shingle").agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_doc_freq)
            .select("shingle")
        )
        tr = tr.join(rare, "shingle", "left_semi")
    te_side = F.broadcast(te) if broadcast_test else te
    return tr.join(te_side, "shingle").groupBy(id_col).agg(
        F.count("*").alias("n_shared")
    )


# ---------------------------------------------------------------------------
# corpus-level line dedup (CCNet-style)
# ---------------------------------------------------------------------------


def dedup_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    max_docs: int = 1,
    digest_only: bool = False,
) -> DataFrame:
    """d8 — corpus-level line deduplication (the CCNet / RefinedWeb
    boilerplate-removal pass): split every document on ``sep``, drop each
    line that occurs in more than ``max_docs`` DISTINCT documents (nav
    bars, cookie banners, license boilerplate), and reassemble the
    surviving lines in original order.

    Returns one row per input document:
    ``(id, n_lines, n_removed, kept_text | kept_md5)`` —
    ``digest_only=True`` emits the md5 of the reassembled text instead of
    the text itself (what the correctness oracle hash-compares; keeps
    result rows narrow).

    Plan shape: posexplode lines -> ONE count-distinct shuffle keyed on
    the line string -> left join the (small) duplicated-line set back ->
    ONE per-doc shuffle to reassemble via sort_array(struct(line_no,
    line)). At 100 TB both shuffles carry (line, doc_id) pairs — bounded
    by line length, never whole documents — and the duplicated-line
    frame is the filtered MINORITY of lines (boilerplate), which AQE
    will broadcast when it fits. Aggregations are partial (map-side
    combine on the line key).
    """
    import re

    # ``sep`` is LITERAL on both ends (F.split takes a regex but the
    # reassembly joins literally): escape it so '.', '|', '||' etc.
    # split on the actual separator instead of regex-matching
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(re.escape(sep)), -1)).alias(
            "line_no", "line"
        ),
    )
    dup = (
        lines.groupBy("line")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") > max_docs)
        .select("line", F.lit(True).alias("__dup"))
    )
    flagged = lines.join(dup, "line", "left")
    kept_lines = F.transform(
        F.filter(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("line_no"), F.col("line"), F.col("__dup").alias("d")
                    )
                )
            ),
            lambda s: s["d"].isNull(),
        ),
        lambda s: s["line"],
    )
    kept_text = F.array_join(kept_lines, sep)
    out = flagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.when(F.col("__dup"), 1).otherwise(0)).cast("long").alias("n_removed"),
        (F.md5(kept_text) if digest_only else kept_text).alias(
            "kept_md5" if digest_only else "kept_text"
        ),
    )
    return out


# ---------------------------------------------------------------------------
# exact substring dedup (duplicated-span removal)
# ---------------------------------------------------------------------------


def dedup_substrings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 8,
    digest_only: bool = False,
) -> DataFrame:
    """d12 — exact substring deduplication (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" EXACTSUBSTR
    pass): remove every token that lies inside a verbatim token span of
    length >= ``min_len`` occurring MORE THAN ONCE in the corpus
    (across documents or repeated within one).

    The suffix-array formulation is driver-bound; the distributed
    equivalent used here is gram coverage — a token is part of some
    duplicated span of >= L tokens **iff** it is covered by a duplicated
    L-gram (any duplicated span of length >= L contains a duplicated
    L-gram through every one of its tokens, and every duplicated L-gram
    IS such a span) — so marking tokens covered by duplicated L-grams
    removes exactly the same set the suffix-array scan would.

    Returns one row per input document that has >= 1 token (docs whose
    text is all whitespace vanish on both engines):
    ``(id, n_tokens, n_removed, kept_text | kept_md5)``.

    Plan shape, at 100 TB: (1) map-only gram build (slice + array_join
    over the words array), grams keyed by md5 so the counting shuffle
    carries a 32-char digest, never the gram text; (2) ONE map-side-
    combinable count shuffle on the digest; duplicated grams are the
    filtered MINORITY, so the join back to gram starts broadcasts under
    AQE; (3) coverage is an interval SWEEP, not an interval explode:
    +1/-1 events at span start/end union'd with the token rows, one
    per-document window running-sum — O(n log n) per doc even when
    every position is duplicated (an exists()-per-token fold would be
    O(n * starts) and melt on boilerplate-heavy shards); (4) one per-doc
    reassembly agg, identical to dedup_lines'. Window partitions are
    single documents — bounded by document length, never corpus size.
    """
    L = int(min_len)
    if L < 2:
        raise ValueError(f"min_len must be >= 2, got {min_len}")
    words = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    base = df.select(F.col(id_col), words.alias("__w")).withColumn(
        "__n", F.size("__w")
    )
    toks = base.select(
        id_col, F.posexplode("__w").alias("pos", "tok")
    ).select(
        id_col,
        "pos",
        "tok",
        F.lit(0).alias("delta"),
        F.lit(1).alias("tag"),
    )
    # gram starts: md5 over the L-token slice; docs shorter than L emit
    # nothing (F.sequence would DESCEND on a negative span — guard it)
    grams = base.select(
        id_col,
        F.explode(
            F.when(
                F.col("__n") >= L,
                F.transform(
                    F.sequence(F.lit(0), F.col("__n") - L),
                    lambda s: F.struct(
                        s.alias("s"),
                        F.md5(
                            F.array_join(F.slice("__w", s + 1, L), " ")
                        ).alias("h"),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("g"),
    ).select(id_col, F.col("g.s").alias("s"), F.col("g.h").alias("h"))
    dup = (
        grams.groupBy("h")
        .agg(F.count("*").alias("__cnt"))
        .filter(F.col("__cnt") >= 2)
        .select("h")
    )
    starts = grams.join(dup, "h").select(id_col, "s")
    # both sweep events of a span in ONE explode — a two-branch union
    # would re-run the gram/count/join lineage (and its scan) twice
    events = starts.select(
        id_col,
        F.explode(
            F.array(
                F.struct(
                    F.col("s").alias("pos"), F.lit(1).alias("delta")
                ),
                F.struct(
                    (F.col("s") + L).alias("pos"), F.lit(-1).alias("delta")
                ),
            )
        ).alias("e"),
    ).select(
        id_col,
        F.col("e.pos").alias("pos"),
        F.col("e.delta").alias("delta"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("string").alias("tok"),
    )
    from pyspark.sql import Window

    swept = toks.unionByName(events.select(*toks.columns))
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    covered = (F.sum("delta").over(w) > 0) & (F.col("tag") == 1)
    marked = swept.withColumn("__cov", covered).filter(F.col("tag") == 1)
    kept_text = F.array_join(
        F.transform(
            F.filter(
                F.sort_array(
                    F.collect_list(F.struct("pos", "tok", F.col("__cov").alias("c")))
                ),
                lambda s: ~s["c"],
            ),
            lambda s: s["tok"],
        ),
        " ",
    )
    return marked.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.col("__cov").cast("int")).cast("long").alias("n_removed"),
        (F.md5(kept_text) if digest_only else kept_text).alias(
            "kept_md5" if digest_only else "kept_text"
        ),
    )


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup)
# ---------------------------------------------------------------------------


def semdedup(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int,
    threshold: float = 0.95,
    seed: int = 42,
    max_cluster_rows: int = 100_000,
    block_rows: int = 2048,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space, then prune NEAR-SEMANTIC duplicates within each
    cluster — pairs whose cosine exceeds ``threshold``.

    Spark shape: centroids are fit on a bounded sample
    (similarity._fit_centroids — driver numpy, two jobs), the full corpus
    is assigned distributedly (one ``mapInPandas`` matmul pass), and the
    within-cluster pruning runs per-cluster via ``applyInPandas``. The
    greedy prune is BLOCKED: priority-ordered rows are consumed in
    ``block_rows`` chunks, and each chunk computes cosines only against
    the running kept set (``X_blk @ X_kept.T``) plus its own
    block-internal gram — the full |cluster|² gram matrix is NEVER
    materialized. Peak extra memory per task is
    ``O(block_rows · |kept| · 8B)`` (2048 × 100k float64 ≈ 1.6 GB at the
    ``max_cluster_rows`` ceiling) on top of the O(n·d) row matrix —
    compare 100k² × 8B = 80 GB for the dense gram, which would OOM any
    executor long before a guard could help. Total pair WORK is still
    sum(|cluster|²), controlled by ``n_clusters`` (the paper's lever); a
    cluster larger than ``max_cluster_rows`` raises with that advice
    rather than silently going quadratic in time.

    Keep policy (deterministic): within a cluster, rows are ranked by
    (cosine-to-centroid ASC, id ASC) — the paper's "keep the example
    FARTHEST from the centroid" choice, id-tie-broken — and greedily
    kept unless within ``threshold`` of an already-kept row. Identical
    vectors always share a cluster (same argmin), so exact duplicates
    can never escape pruning across a cluster boundary.

    Returns (id_col, ``cell`` int, ``kept`` boolean) — one row per input
    row with a non-null vector; join back on ``id_col`` to materialize
    the pruned corpus.
    """
    import numpy as np
    import pandas as pd

    from .similarity import _fit_centroids, assign_cells, l2_normalize

    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"semdedup: threshold must be in (0,1], got {threshold}")
    norm = emb.select(
        F.col(id_col), l2_normalize(F.col(vec_col)).alias("__v")
    ).filter(F.col("__v").isNotNull())
    cents = _fit_centroids(norm, "__v", n_clusters, seed)
    C = [list(map(float, c)) for c in cents]
    assigned = assign_cells(norm, "__v", C, out="cell")
    sc = assigned.sparkSession.sparkContext
    bc = sc.broadcast(np.asarray(C, dtype=np.float64))
    # derive the id dtype from the input — string/int/long ids all work
    from pyspark.sql.types import BooleanType, IntegerType, StructField, StructType

    out_schema = StructType(
        [
            StructField(id_col, emb.schema[id_col].dataType, True),
            StructField("cell", IntegerType(), False),
            StructField("kept", BooleanType(), False),
        ]
    )

    def prune(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_cluster_rows:
            raise ValueError(
                f"semdedup: cluster {key[0]} has {len(pdf)} rows > "
                f"max_cluster_rows={max_cluster_rows}; raise n_clusters "
                "(pair work is quadratic per cluster)"
            )
        X = np.asarray(list(pdf["__v"]), dtype=np.float64)
        cent = bc.value[key[0]]
        nc = np.linalg.norm(cent)
        cent = cent / nc if nc > 0 else cent
        # BLAS gemm accumulation order depends on ROW POSITION, so two
        # bitwise-identical vectors can get dot products one ulp apart —
        # quantize the priority key or the id tie-break never engages
        cos_c = np.round(X @ cent, 9)
        ids = pdf[id_col].to_numpy()
        order = np.lexsort((ids, cos_c))  # cos asc (quantized), id asc
        kept = np.zeros(len(pdf), dtype=bool)
        kept_idx: list[int] = []
        # blocked greedy: cosines vs the kept set + block-internal gram
        # only — memory O(block · (|kept| + block)), never |cluster|²
        for s in range(0, len(order), block_rows):
            blk = order[s : s + block_rows]
            Xb = X[blk]
            Sk = Xb @ X[kept_idx].T if kept_idx else None
            Sb = Xb @ Xb.T
            blk_kept: list[int] = []  # block-local positions kept this block
            for j, i in enumerate(blk):
                if Sk is not None and not (Sk[j] < threshold).all():
                    continue
                if blk_kept and not (Sb[j, blk_kept] < threshold).all():
                    continue
                kept[i] = True
                kept_idx.append(i)
                blk_kept.append(j)
            del Sk, Sb
        return pd.DataFrame(
            {id_col: ids, "cell": np.int32(key[0]), "kept": kept}
        )

    return assigned.groupBy("cell").applyInPandas(prune, out_schema)

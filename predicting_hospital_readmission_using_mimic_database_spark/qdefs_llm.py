"""LLM-data-pipeline query definitions (north-star surface,
BASELINE.json): dedup (exact / MinHash LSH / SimHash / n-gram Jaccard /
embedding cosine), similarity search (brute-force + LSH ANN), text
analysis (language-ID / quality / token counts / fingerprints), and
multimodal plumbing.

Planted-duplicate fixtures: the harness corpus has no duplicates, so
entries UNION deterministic copies (re-numbered ids, optionally perturbed)
before deduplicating — both engines build the identical planted corpus, so
exact oracles still hold. Approximate operators (MinHash, SimHash bands,
LSH ANN) are rows-only with planted-recall invariants; everything
deterministic (exact dedup, Jaccard pairs, cosine pairs, brute-force kNN,
text stats, fingerprints) is hash-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.text import tokenize
from .operators import dedup as DD
from .operators import multimodal as MM
from .operators import similarity as SI
from .operators import textstats as TS
from .qdefs_text import _NOISE, _NOISE_SQL
from .registry import query
from .sources.io import read_table


def _docs(spark, sf):
    return read_table(spark, sf, "documents")


def _emb(spark, sf):
    return read_table(spark, sf, "embeddings")


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------

#: ids of planted copies sit far above any real doc_id
_COPY_OFFSET = 1_000_000


def _docs_with_exact_copies(spark, sf, n_copies: int = 25):
    d = _docs(spark, sf).select("doc_id", "text")
    copies = d.filter(F.col("doc_id") < n_copies).select(
        (F.col("doc_id") + _COPY_OFFSET).alias("doc_id"), "text"
    )
    return d.unionByName(copies)


_DOCS_COPIES_SQL = f"""
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {_COPY_OFFSET} AS doc_id, text
    FROM documents WHERE doc_id < 25
"""


@query(
    "d1_dedup_exact",
    oracle=f"""
    WITH u AS ({_DOCS_COPIES_SQL}),
    keep AS (SELECT min(doc_id) AS doc_id FROM u GROUP BY md5(text))
    SELECT u.doc_id FROM u JOIN keep USING (doc_id)
    """,
)
def q_d1(spark, sf):
    """Exact dedup on planted copies: min-id representative per digest —
    every planted copy drops, every original survives."""
    u = _docs_with_exact_copies(spark, sf)
    return DD.dedup_exact(u, "doc_id", ["text"]).select("doc_id")


def _tokens(df):
    return df.withColumn("tokens", tokenize(F.lower(F.col("text"))))


@query(
    "d2_dedup_minhash_lsh",
    oracle=f"""
    WITH u AS ({_DOCS_COPIES_SQL}),
    p AS (SELECT count(*) AS c FROM documents WHERE doc_id < 25)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM u) AS n_input,
           (SELECT CAST(c AS BIGINT) FROM p) AS planted_total,
           (SELECT CAST(c AS BIGINT) FROM p) AS planted_caught,
           CAST(0 AS BIGINT) AS planted_survivors
    """,
)
def q_d2(spark, sf):
    """MinHash-LSH near-dup dedup: planted exact copies MUST be caught
    (identical shingle sets collide in every band). The planted-recall
    COUNTS are the oracle — DuckDB recomputes corpus size + planted count
    from the same parquet; a single missed copy breaks the hash. (WHICH
    non-planted near-dups collide is banding-approximate, so the kept
    count itself is not part of the contract.)"""
    u = _tokens(_docs_with_exact_copies(spark, sf))
    kept = DD.dedup_minhash(
        u, "doc_id", "tokens", jaccard_threshold=0.8, num_hash_tables=5, seed=42
    )
    n_in = u.count()
    planted_total = u.filter(
        (F.col("doc_id") >= _COPY_OFFSET)
    ).count()
    planted_left = kept.filter(F.col("doc_id") >= _COPY_OFFSET).count()
    return spark.createDataFrame(
        [(n_in, planted_total, planted_total - planted_left, planted_left)],
        "n_input long, planted_total long, planted_caught long, planted_survivors long",
    )


@query(
    "d3_dedup_simhash",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS planted_found,
           TRUE AS pairs_cover_planted
    FROM documents WHERE doc_id < 25
    """,
)
def q_d3(spark, sf):
    """SimHash banding near-dup: identical texts have identical signatures
    (hamming 0), so EVERY planted pair must be found — the planted count
    is the oracle (DuckDB recomputes it from the parquet); which
    non-planted pairs band together is approximate and excluded."""
    u = _tokens(_docs_with_exact_copies(spark, sf))
    # SimHash over 3-gram SHINGLES, not unigram tokens: the harness corpus
    # shares one small vocabulary, so token-level signatures cluster and
    # band buckets explode (~n^2 candidates); shingles carry word order and
    # spread the signatures (22s -> ~3s at sf0.1)
    u = u.withColumn("shingles", DD.word_ngrams(F.col("tokens"), 3))
    pairs = DD.simhash_dup_pairs(u, "doc_id", "shingles", max_hamming=3)
    agg = pairs.agg(
        F.count("*").alias("n_pairs"),
        F.sum(
            (
                (F.col("b_id") - F.col("a_id") == _COPY_OFFSET)
                & (F.col("hamming") == 0)
            ).cast("long")
        ).alias("planted_found"),
    ).first()
    planted_found = int(agg["planted_found"] or 0)
    return spark.createDataFrame(
        [(planted_found, bool(agg["n_pairs"] >= planted_found))],
        "planted_found long, pairs_cover_planted boolean",
    )


_TOKENS_SQL = "list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '')"
_SHINGLES_SQL = (
    "list_distinct(list_transform("
    "generate_series(1, greatest(len({t}) - 2, 0)), "
    "i -> {t}[i] || ' ' || {t}[i+1] || ' ' || {t}[i+2]))"
).format(t=_TOKENS_SQL)


@query(
    "d4_ngram_jaccard",
    oracle=f"""
    WITH u AS ({_DOCS_COPIES_SQL}),
    s AS MATERIALIZED (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM u),
    pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             len(list_intersect(a.sh, b.sh)) AS common,
             len(a.sh) AS sa, len(b.sh) AS sb
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh)) > 0
    )
    SELECT a_id, b_id,
           round(common / CAST(sa + sb - common AS DOUBLE), 6) AS jaccard
    FROM pairs
    WHERE common / CAST(sa + sb - common AS DOUBLE) >= 0.6
    """,
)
def q_d4(spark, sf):
    """EXACT n-gram Jaccard near-dup pairs — inverted-index candidates on
    Spark, brute-force ground truth on DuckDB; identical pair sets."""
    u = _tokens(_docs_with_exact_copies(spark, sf))
    return DD.jaccard_dup_pairs(
        u, "doc_id", "tokens", n=3, threshold=0.6, max_doc_freq=None
    )


def _emb_with_copies(spark, sf, n_copies: int = 10):
    e = _emb(spark, sf).select("vec_id", "embedding")
    copies = e.filter(F.col("vec_id") < n_copies).select(
        (F.col("vec_id") + _COPY_OFFSET).alias("vec_id"), "embedding"
    )
    return e.unionByName(copies)


_EMB_COPIES_SQL = f"""
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + {_COPY_OFFSET} AS vec_id, embedding
    FROM embeddings WHERE vec_id < 10
"""


@query(
    "d5_dedup_cosine",
    oracle=f"""
    WITH u AS ({_EMB_COPIES_SQL})
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round(CAST(list_cosine_similarity(
             CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS DOUBLE), 6) AS cosine
    FROM u a JOIN u b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.95
    """,
)
def q_d5(spark, sf):
    """Embedding-cosine near-dup pairs via BRP-LSH on normalized vectors —
    planted identical vectors are the only pairs above 0.95 (random 64-dim
    embeddings are near-orthogonal), so the approximate candidate set
    equals the exact one and the oracle is exact."""
    u = _emb_with_copies(spark, sf)
    return DD.cosine_dup_pairs(
        u, "vec_id", "embedding", threshold=0.95, bucket_length=1.0,
        num_hash_tables=4, seed=42,
    )


@query(
    "d6_dup_clusters",
    oracle=f"""
    WITH RECURSIVE u0 AS ({_DOCS_COPIES_SQL}),
    u AS (SELECT * FROM u0 WHERE doc_id < 1000 OR doc_id >= {_COPY_OFFSET}),
    s AS MATERIALIZED (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM u),
    -- MATERIALIZED: referenced twice below; inlining would run the
    -- quadratic pair join once per reference (~3x oracle runtime)
    pairs AS MATERIALIZED (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh))
            / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            >= 0.6
    ),
    e AS MATERIALIZED (
      SELECT a_id AS src, b_id AS dst FROM pairs UNION SELECT b_id, a_id FROM pairs
    ),
    reach(id, r) AS (
      SELECT src, src FROM e
      UNION
      SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id
    )
    SELECT id, min(r) AS comp FROM reach GROUP BY id
    """,
)
def q_d6(spark, sf):
    """EXACT duplicate clustering: connected components over the d4
    Jaccard pair graph — distributed hash-to-min label propagation on
    Spark vs a recursive-CTE transitive closure on DuckDB. The corpus has
    genuine 3-node chains at threshold 0.6, so transitivity (A~B, B~C =>
    one cluster) is exercised, not just planted 2-cliques.

    The ORACLE's pair generation is an all-pairs brute force (quadratic),
    so the entry caps the corpus at 1000 docs + planted copies — the full
    sf0.01 gate table, a bounded subset at larger local sweeps. The Spark
    side stays the inverted-index candidate path at any scale."""
    u = _tokens(_docs_with_exact_copies(spark, sf)).filter(
        (F.col("doc_id") < 1000) | (F.col("doc_id") >= _COPY_OFFSET)
    )
    pairs = DD.jaccard_dup_pairs(
        u, "doc_id", "tokens", n=3, threshold=0.6, max_doc_freq=None
    ).select("a_id", "b_id")
    return DD.connected_components(pairs)


@query(
    "d9_dup_clusters_star",
    oracle=f"""
    WITH RECURSIVE u0 AS ({_DOCS_COPIES_SQL}),
    u AS (SELECT * FROM u0 WHERE doc_id < 1000 OR doc_id >= {_COPY_OFFSET}),
    s AS MATERIALIZED (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM u),
    pairs AS MATERIALIZED (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh))
            / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            >= 0.6
    ),
    e AS MATERIALIZED (
      SELECT a_id AS src, b_id AS dst FROM pairs UNION SELECT b_id, a_id FROM pairs
    ),
    reach(id, r) AS (
      SELECT src, src FROM e
      UNION
      SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id
    )
    SELECT id, min(r) AS comp FROM reach GROUP BY id
    """,
)
def q_d9(spark, sf):
    """D9 — the SAME duplicate-cluster closure as d6, computed by the
    two-phase large-star/small-star contraction (Kiveris et al. 2014)
    instead of hash-to-min: O(log^2 n) rounds regardless of graph
    diameter, two O(|E|) shuffles per round. The oracle (recursive-CTE
    transitive closure) is algorithm-independent, so both entries must
    hash-match it — an end-to-end equivalence proof of the two
    algorithms on the harness corpus on top of the random-graph
    property test."""
    u = _tokens(_docs_with_exact_copies(spark, sf)).filter(
        (F.col("doc_id") < 1000) | (F.col("doc_id") >= _COPY_OFFSET)
    )
    pairs = DD.jaccard_dup_pairs(
        u, "doc_id", "tokens", n=3, threshold=0.6, max_doc_freq=None
    ).select("a_id", "b_id")
    return DD.connected_components_star(pairs)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

_DIM = 64
_PROBE = [1.0] + [0.0] * (_DIM - 1)
_PROBE_SQL = "[" + ", ".join(str(float(v)) for v in _PROBE) + "]"


@query(
    "n1_knn_bruteforce",
    oracle=f"""
    WITH s AS (
      SELECT vec_id,
             round(CAST(list_cosine_similarity(
               CAST(embedding AS DOUBLE[]), {_PROBE_SQL}) AS DOUBLE), 6) AS cosine
      FROM embeddings
    )
    SELECT vec_id, cosine FROM s ORDER BY cosine DESC, vec_id LIMIT 10
    """,
)
def q_n1(spark, sf):
    """Brute-force cosine top-10 for a fixed probe — TakeOrderedAndProject
    (per-partition heaps), exact oracle."""
    return SI.topk_bruteforce(_emb(spark, sf), "vec_id", "embedding", _PROBE, k=10)


#: exact top-10 ids for the fixed probe — the DuckDB side of every ANN
#: recall oracle (n1 proves this exact form hash-matches the engine)
_EXACT_TOP10_SQL = f"""
    SELECT vec_id FROM (
      SELECT vec_id,
             round(CAST(list_cosine_similarity(
               CAST(embedding AS DOUBLE[]), {_PROBE_SQL}) AS DOUBLE), 6) AS cosine
      FROM embeddings
    ) ORDER BY cosine DESC, vec_id LIMIT 10
"""


@query(
    "n2_knn_lsh",
    oracle=f"""
    WITH t AS ({_EXACT_TOP10_SQL})
    SELECT CAST(count(*) AS BIGINT) AS n_ann,
           CAST(count(*) AS BIGINT) AS n_overlap_exact,
           CAST(count(*) / 10.0 AS DOUBLE) AS recall_at_10
    FROM t
    """,
)
def q_n2(spark, sf):
    """LSH ANN top-10: recall@10 measured in-engine against the exact
    brute force; the oracle recomputes the exact top-10 in DuckDB and
    requires FULL overlap (recall 1.0 — the multiprobe+re-rank contract
    on this corpus), so a single missed neighbor breaks the hash."""
    e = _emb(spark, sf)
    exact = SI.topk_bruteforce(e, "vec_id", "embedding", _PROBE, k=10)
    ann = SI.topk_lsh(
        e, "vec_id", "embedding", _PROBE, k=10, bucket_length=1.0,
        num_hash_tables=4, seed=42,
    )
    hit = ann.join(exact.select("vec_id"), "vec_id", "left_semi").count()
    return spark.createDataFrame(
        [(ann.count(), hit, float(hit) / 10.0)],
        "n_ann long, n_overlap_exact long, recall_at_10 double",
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

_NOISY_SQL = f"text || {_NOISE_SQL}"


def _noisy():
    return F.concat(F.col("text"), F.lit(_NOISE))


@query(
    "x1_text_stats",
    oracle=f"""
    SELECT doc_id,
           length({_NOISY_SQL}) AS n_chars,
           CASE WHEN trim({_NOISY_SQL}) = '' THEN 0
                ELSE len(string_split_regex(trim({_NOISY_SQL}), '\\s+')) END AS ws_tokens,
           len(regexp_extract_all({_NOISY_SQL}, '\\w+'))
             + len(regexp_extract_all({_NOISY_SQL}, '[^\\w\\s]')) AS bpe_tokens,
           round(len(regexp_extract_all({_NOISY_SQL}, '[^\\w\\s]'))
                 / CAST(length({_NOISY_SQL}) AS DOUBLE), 6) AS punct_ratio
    FROM documents
    """,
)
def q_x1(spark, sf):
    """Token counting + punctuation stats, one JVM pass (noise-injected so
    punctuation paths execute)."""
    t = _noisy()
    d = _docs(spark, sf)
    return d.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        TS.whitespace_token_count(t).cast("long").alias("ws_tokens"),
        TS.bpe_ish_token_count(t).cast("long").alias("bpe_tokens"),
        F.round(TS.punct_ratio(t), 6).alias("punct_ratio"),
    )


_MARKER_SQL = {
    lang: "[" + ", ".join(f"'{w}'" for w in words) + "]"
    for lang, words in TS.LANG_MARKERS.items()
}
_SCORE_SQL = {
    lang: f"len(list_filter({_TOKENS_SQL}, t -> list_contains({ml}, t)))"
    for lang, ml in _MARKER_SQL.items()
}
_MAX_SQL = "greatest(" + ", ".join(_SCORE_SQL.values()) + ")"
_LANG_CASE_SQL = (
    "CASE WHEN " + _MAX_SQL + " = 0 THEN 'und' "
    + " ".join(
        f"WHEN {_SCORE_SQL[lang]} = {_MAX_SQL} THEN '{lang}'"
        for lang in TS.LANG_MARKERS
    )
    + " ELSE 'und' END"
)


@query(
    "x2_language_id",
    oracle=f"""
    SELECT doc_id, {_LANG_CASE_SQL} AS lang_guess,
           CAST({_MAX_SQL} AS INT) AS marker_hits
    FROM documents
    """,
)
def q_x2(spark, sf):
    """Marker-word language-ID heuristic — argmax with first-match-wins
    tiebreak, identical CASE chain on both engines."""
    d = _docs(spark, sf)
    scores = TS.language_scores(F.col("text"))
    return d.select(
        "doc_id",
        TS.language_id(F.col("text")).alias("lang_guess"),
        F.greatest(*scores.values()).cast("int").alias("marker_hits"),
    )


@query(
    "x3_fingerprint",
    oracle="""
    WITH n AS (
      SELECT doc_id,
             regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm
      FROM documents
    )
    SELECT doc_id,
           md5(norm) AS fp_md5,
           list_min(list_transform(
             generate_series(1, greatest(length(norm) - 7, 1), 4),
             i -> md5(substr(norm, i, 8)))) AS fp_kgram_min
    FROM n
    """,
)
def q_x3(spark, sf):
    """Document fingerprints: whole-doc md5 + winnowing-style min-md5 over
    8-grams — byte-identical across engines (md5 is the shared digest)."""
    d = _docs(spark, sf)
    return d.select(
        "doc_id",
        TS.fingerprint_md5(F.col("text")).alias("fp_md5"),
        TS.fingerprint_kgram_min(F.col("text"), k=8).alias("fp_kgram_min"),
    )


_EN_MARKERS_SQL = "[" + ", ".join(f"'{w}'" for w in TS.LANG_MARKERS["en"]) + "]"

#: per-doc quality components, DuckDB form — split-on-\W+ tokens are the
#: maximal \w+ runs, so regexp_extract_all('\w+') is the same token set
_X4_SQL = f"""
    WITH c AS (
      SELECT doc_id,
             length(text) AS n,
             len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
             regexp_extract_all(text, '\\w+') AS toks,
             {_TOKENS_SQL} AS ltoks
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CASE WHEN n >= 50 AND n <= 20000 THEN 1.0 ELSE 0.0 END AS len_ok,
             CASE WHEN (CASE WHEN n > 0 THEN n_punct / CAST(n AS DOUBLE) ELSE 0.0 END) < 0.2
                  THEN 1.0 ELSE 0.0 END AS punct_ok,
             CASE WHEN len(toks) > 0
                       AND list_sum(list_transform(toks, t -> length(t))) / CAST(len(toks) AS DOUBLE)
                           BETWEEN 3.0 AND 12.0
                  THEN 1.0 ELSE 0.0 END AS mwl_ok,
             CASE WHEN len(list_filter(ltoks, t -> list_contains({_EN_MARKERS_SQL}, t))) > 0
                  THEN 1.0 ELSE 0.0 END AS stop_ok
      FROM c
    )
    SELECT doc_id,
           round(len_ok * 0.4 + punct_ok * 0.2 + mwl_ok * 0.2 + stop_ok * 0.2, 6) AS quality
    FROM m
"""


@query("x4_quality_score", oracle=_X4_SQL)
def q_x4(spark, sf):
    """Composite quality heuristic — per-doc EXACT: the engine-defined
    weights/thresholds (textstats.quality_score docstring) are mirrored
    term-by-term in the oracle SQL; every component is deterministic
    arithmetic over the same token/punct definitions x1 already proves."""
    d = _docs(spark, sf)
    return d.select(
        "doc_id", TS.quality_score(F.col("text")).alias("quality")
    )


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


@query(
    "mm1_multimodal_decode",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT i % 3) AS BIGINT) AS n_media_types,
           CAST(16 AS INT) AS min_dim, CAST(16 AS INT) AS max_dim,
           TRUE AS bytes_positive, TRUE AS pixel_stats_exact,
           TRUE AS video_decode_exact
    FROM range(64) t(i)
    """,
)
def q_mm1(spark, sf):
    """Binary-column decode: synthetic blob manifest -> mapInPandas
    feature extraction (Arrow-batched) with the REAL stdlib codecs —
    BMP/PPM pixels, PCM WAV samples, and uncompressed-AVI video frames
    (all three modalities decode real bytes). The oracle recomputes
    manifest size + media-type count from the same closed form
    (range(64), i%3) and pins FEATURE_DIM=16; byte positivity plus the
    EXACT distributed-vs-local decode matches of asset 0 (closed-form
    BMP) and asset 2 (closed-form AVI: 12 frames @ 4fps, 8x6) are
    boolean invariants."""
    blobs = MM.synthetic_blobs(spark, n=64)
    feats = MM.decode_stub_features(blobs, real_codec=True).cache()
    # golden fixtures recomputed locally from the same closed forms the
    # synthetic ingest uses for asset 0 (image) and asset 2 (video)
    w, h = 4, 3
    px = [((x * 37) % 256, (y * 59) % 256, (x * y * 17) % 256) for y in range(h) for x in range(w)]
    expected_img = MM.decode_image_features(MM.encode_bmp(w, h, px))
    expected_vid = MM.decode_video_features(
        MM.encode_avi(*MM._video_asset_shape(2), fps=4)
    )
    got = {
        r["asset_id"]: r["features"]
        for r in feats.filter(F.col("asset_id").isin(0, 2)).collect()
    }

    def _match(a, b):
        return bool(
            a is not None and b is not None and len(a) == len(b)
            and all(abs(x - y) < 1e-12 for x, y in zip(a, b))
        )

    return feats.agg(
        F.count("*").alias("n"),
        F.countDistinct("media_type").alias("n_media_types"),
        F.min(F.size("features")).alias("min_dim"),
        F.max(F.size("features")).alias("max_dim"),
        (F.min("n_bytes") > 0).alias("bytes_positive"),
        F.lit(_match(got.get(0), expected_img)).alias("pixel_stats_exact"),
        F.lit(_match(got.get(2), expected_vid)).alias("video_decode_exact"),
    )


@query(
    "mm2_frame_sample",
    oracle="""
    SELECT i AS asset_id,
           unnest(generate_series(0, 1000 * (1 + i % 30) - 1, 500)) AS frame_ts_ms
    FROM range(64) t(i) WHERE i % 3 = 2
    """,
)
def q_mm2(spark, sf):
    """Video frame-sampling plan (exact oracle: the synthetic manifest's
    durations are a closed-form function of asset_id)."""
    blobs = MM.synthetic_blobs(spark, n=64)
    return MM.frame_sample_plan(blobs, every_ms=500)


@query(
    "n3_knn_ivf",
    oracle=f"""
    WITH t AS ({_EXACT_TOP10_SQL})
    SELECT CAST(count(*) AS BIGINT) AS n_ivf,
           CAST(count(*) AS BIGINT) AS n_overlap_exact,
           CAST(count(*) / 10.0 AS DOUBLE) AS recall_at_10
    FROM t
    """,
)
def q_n3(spark, sf):
    """IVF-Flat top-10: recall@10 against the exact brute force, with the
    exact top-10 recomputed by DuckDB as the oracle. Full recall is
    GUARANTEED at any corpus by the centroid-radius cosine bound
    (similarity.topk_ivf): after the initial 8/16-cell probe, any
    remaining cell whose bound beats the running 10th cosine is probed
    too — typically nothing, so the scan fraction stays ~n_probe/n_cells."""
    e = _emb(spark, sf)
    exact = SI.topk_bruteforce(e, "vec_id", "embedding", _PROBE, k=10)
    ivf = SI.topk_ivf(
        e, "vec_id", "embedding", _PROBE, k=10, n_cells=16, n_probe=8, seed=42
    )
    hit = ivf.join(exact.select("vec_id"), "vec_id", "left_semi").count()
    return spark.createDataFrame(
        [(ivf.count(), hit, float(hit) / 10.0)],
        "n_ivf long, n_overlap_exact long, recall_at_10 double",
    )


@query(
    "n4_knn_ivf_indexed",
    oracle=f"""
    WITH t AS ({_EXACT_TOP10_SQL})
    SELECT CAST(count(*) AS BIGINT) AS n_overlap_exact,
           CAST(count(*) / 10.0 AS DOUBLE) AS recall_at_10,
           TRUE AS partition_pruned
    FROM t
    """,
)
def q_n4(spark, sf):
    """PERSISTED IVF serving path: build the cell-partitioned parquet
    index once (centroids + radii driver-side), probe it — the scan must
    show directory-level PartitionFilters on the cell column (the 100 TB
    property), and the served answer is provably the exact top-10 via
    the centroid-radius bound (the oracle recomputes the exact top-10 in
    DuckDB and requires full overlap)."""
    import shutil
    import tempfile

    e = _emb(spark, sf)
    tmp = tempfile.mkdtemp(prefix="n4_ivf_")
    path = f"{tmp}/ivf"
    try:
        cents, radii = SI.build_ivf_index(e, "vec_id", "embedding", path, n_cells=16, seed=42)
        ann = SI.topk_ivf_indexed(
            spark, path, cents, "vec_id", "embedding", _PROBE, k=10, n_probe=8,
            radii=radii,
        )
        plan = ann._jdf.queryExecution().executedPlan().toString()
        pruned = "PartitionFilters" in plan and "__cell" in plan.split("PartitionFilters")[1][:200]
        exact = SI.topk_bruteforce(e, "vec_id", "embedding", _PROBE, k=10)
        hit = ann.join(exact.select("vec_id"), "vec_id", "left_semi").count()
        return spark.createDataFrame(
            [(hit, float(hit) / 10.0, bool(pruned))],
            "n_overlap_exact long, recall_at_10 double, partition_pruned boolean",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "d7_decontaminate",
    oracle=f"""
    WITH tr AS (
      SELECT doc_id, unnest({_SHINGLES_SQL}) AS shingle
      FROM documents WHERE doc_id % 10 <> 0
    ),
    te AS (
      SELECT DISTINCT unnest({_SHINGLES_SQL}) AS shingle
      FROM documents WHERE doc_id % 10 = 0
    )
    SELECT tr.doc_id, count(*) AS n_shared
    FROM tr JOIN te USING (shingle)
    GROUP BY tr.doc_id
    """,
)
def q_d7(spark, sf):
    """D7 — benchmark decontamination: train docs (doc_id % 10 != 0)
    sharing any 3-gram shingle with the held-out corpus (doc_id % 10 == 0);
    exact shared-shingle counts vs DuckDB brute force. Test shingle set is
    broadcast — the train side never shuffles."""
    d = _tokens(_docs(spark, sf))
    train = d.filter(F.col("doc_id") % 10 != 0)
    test = d.filter(F.col("doc_id") % 10 == 0)
    return DD.cross_corpus_contamination(train, test, "doc_id", "tokens", n=3)


@query(
    "u9_quota_sample",
    oracle="""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR) || 's42')) AS qr
      FROM documents
    ) WHERE qr <= 50
    """,
)
def q_u9(spark, sf):
    """U9 — deterministic per-language quota sample (<= 50 docs/lang) by
    salted md5-hash rank: uniform, seedable, reproducible on any engine —
    both engines hash the same bytes, so the kept set is identical."""
    from .operators.sampling import quota_sample

    d = _docs(spark, sf).select("doc_id", "lang")
    return quota_sample(d, "lang", 50, "doc_id", salt="s42")


@query(
    "x5_pack_chunks",
    oracle="""
    SELECT doc_id, source,
           CAST(floor((cum - n_chars) / 4000.0) AS BIGINT) AS chunk_id
    FROM (
      SELECT doc_id, source, n_chars,
             sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
      FROM documents
    )
    """,
)
def q_x5(spark, sf):
    """x5 — fixed-budget sequence packing: per-source running char total
    assigns each doc a training-chunk id (budget 4000 chars)."""
    from .operators.textstats import pack_chunks

    d = _docs(spark, sf).select("doc_id", "source", "n_chars")
    return pack_chunks(d, "source", "doc_id", "n_chars", budget=4000).select(
        "doc_id", "source", "chunk_id"
    )


@query(
    "x6_lm_quality",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM documents
    ),
    dt AS (SELECT doc_id, tok, count(*) AS dc FROM tk GROUP BY 1, 2),
    v AS (SELECT tok, sum(dc) AS c FROM dt GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM v)
    SELECT doc_id, CAST(sum(dc) AS BIGINT) AS n_tokens,
           round(sum(dc * ln(c / (SELECT n FROM tot))) / sum(dc), 6)
             AS avg_logprob
    FROM dt JOIN v USING (tok)
    GROUP BY doc_id
    """,
)
def q_x6(spark, sf):
    """X6 — corpus-unigram LM quality score (CCNet-style filter), exact
    per-doc average log-probability vs DuckDB recomputing the same LM.
    Token-instance explode collapses to (doc, token) partial counts before
    anything shuffles; the vocabulary is an aggregate OF those partials,
    so raw token volume never crosses the wire twice."""
    from .operators.textstats import unigram_logprob

    d = _tokens(_docs(spark, sf).select("doc_id", "text"))
    return unigram_logprob(d, "doc_id", "tokens")


@query(
    "x7_mixture_sample",
    oracle="""
    WITH q AS (
      SELECT * FROM (VALUES ('en', 100), ('de', 40), ('fr', 40), ('es', 20))
        AS t(lang, quota)
    ),
    r AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR) || 'mix1')) AS rn
      FROM documents
    )
    SELECT doc_id, lang FROM r JOIN q USING (lang) WHERE rn <= quota
    """,
)
def q_x7(spark, sf):
    """X7 — deterministic DATASET MIXING (operators.sampling.mixture_sample):
    compose a ~200-doc corpus at 50/20/20/10 en/de/fr/es (zh weight 0 ->
    dropped); per-language quotas selected by salted md5-hash rank, so
    DuckDB recomputes the IDENTICAL kept set — no rand(), no counting
    pass, one shuffle. Under-quota languages pass through whole."""
    from .operators.sampling import mixture_sample

    d = _docs(spark, sf).select("doc_id", "lang")
    return mixture_sample(
        d, "lang", {"en": 0.5, "de": 0.2, "fr": 0.2, "es": 0.1},
        total=200, key_col="doc_id", salt="mix1",
    )


@query(
    "x8_pii_scrub",
    oracle=r"""
    WITH noisy AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com via http://site'
                       || CAST(doc_id AS VARCHAR) || '.test/page now'
                  ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
                '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS INT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, 'https?://[^ \t\n]+')) AS INT)
             AS n_urls,
           md5(regexp_replace(
                 regexp_replace(text,
                   '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}',
                   '<EMAIL>', 'g'),
                 'https?://[^ \t\n]+', '<URL>', 'g')) AS scrubbed_md5
    FROM noisy
    """,
)
def q_x8(spark, sf):
    """X8 — PII redaction (the pre-release scrub pass): emails/URLs are
    INJECTED deterministically into every 5th doc (both engines build the
    identical noisy corpus — the repo's standard noise-injection oracle
    pattern), then counted and replaced with typed placeholders via
    JVM regexp only. The md5 of every scrubbed doc must match DuckDB's —
    a one-character divergence anywhere in the corpus breaks the hash.
    Patterns use the common Java-regex/RE2 subset (textstats.PII_PATTERNS),
    so the same scrub is portable across engines. Map-only: no shuffle."""
    from .operators.textstats import pii_count, pii_scrub

    d = _docs(spark, sf).select("doc_id", "text")
    noisy = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"), F.col("doc_id").cast("string"),
                F.lit("@example.com via http://site"),
                F.col("doc_id").cast("string"), F.lit(".test/page now"),
            ),
        ).otherwise(F.col("text")),
    )
    return noisy.select(
        "doc_id",
        pii_count(F.col("text"), "email").cast("int").alias("n_emails"),
        pii_count(F.col("text"), "url").cast("int").alias("n_urls"),
        F.md5(pii_scrub("text")).alias("scrubbed_md5"),
    )


@query(
    "mm3_image_resize",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_images,
           CAST(2 AS INT) AS out_w, CAST(2 AS INT) AS out_h,
           TRUE AS all_decodable, TRUE AS resized_pixels_exact
    FROM range(64) t(i) WHERE i % 3 = 0
    """,
)
def q_mm3(spark, sf):
    """MM3 — image TRANSFORM plumbing: every synthetic image asset
    resizes to 2x2 via nearest-neighbor mapInPandas
    (operators.multimodal.resize_images); the oracle pins the image count
    (range closed form), output dims, decodability of every resized blob,
    and the EXACT resized pixels of asset 0 against a locally-computed
    fixture from the same closed-form source (distributed == local)."""
    blobs = MM.synthetic_blobs(spark, n=64).filter(F.col("media_type") == "image")
    res = MM.resize_images(blobs, 2, 2).cache()
    # local fixture for asset 0: 4x3 closed-form pixels -> 2x2 NN resize
    w, h = 4, 3
    px = [((x * 37) % 256, (y * 59) % 256, (x * y * 17) % 256) for y in range(h) for x in range(w)]
    expected = MM.resize_image_nn(MM.encode_bmp(w, h, px), 2, 2)
    got0 = res.filter(F.col("asset_id") == 0).select("content").first()
    pixels_exact = bool(
        got0 is not None and got0[0] is not None and bytes(got0[0]) == expected
    )
    return res.agg(
        F.count("*").alias("n_images"),
        F.max("out_w").alias("out_w"),
        F.max("out_h").alias("out_h"),
        (F.count(F.col("content")) == F.count("*")).alias("all_decodable"),
        F.lit(pixels_exact).alias("resized_pixels_exact"),
    )


@query(
    "u11_stratified_hash_split",
    oracle="""
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
    q AS (
      SELECT lang,
             CASE WHEN n < 2 THEN 0
                  ELSE least(n - 1, greatest(1, CAST(round(0.2 * n) AS BIGINT)))
             END AS tq
      FROM c
    ),
    r AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR) || 'split'))
               AS rn
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN rn <= tq THEN 'test' ELSE 'train' END AS split
    FROM r JOIN q USING (lang)
    """,
)
def q_u11(spark, sf):
    """U11 — deterministic hash-stratified split
    (operators.sampling.stratified_hash_split): every language sends
    exactly clamp(round(0.2*n), 1, n-1) docs to test, chosen by salted
    md5 rank — DuckDB reproduces the IDENTICAL doc-level assignment, so
    the whole split (not just its counts) is the oracle. The guarantee a
    Bernoulli split can't give: both sides keep every class at any
    scale."""
    from .operators.sampling import stratified_hash_split

    d = _docs(spark, sf).select("doc_id", "lang")
    train, test = stratified_hash_split(d, "lang", "doc_id", 0.2)
    return train.withColumn("split", F.lit("train")).unionByName(
        test.withColumn("split", F.lit("test"))
    )


@query(
    "n5_knn_join_exact",
    oracle="""
    WITH q AS (
      SELECT vec_id AS a_id, CAST(embedding AS DOUBLE[]) AS va
      FROM embeddings WHERE vec_id < 50
    ),
    c AS (SELECT vec_id AS b_id, CAST(embedding AS DOUBLE[]) AS vb FROM embeddings),
    d AS (
      SELECT a_id, b_id, list_distance(va, vb) AS dist
      FROM q CROSS JOIN c WHERE a_id <> b_id
    ),
    r AS (
      SELECT a_id, b_id, dist,
             row_number() OVER (PARTITION BY a_id ORDER BY dist, b_id) AS rank
      FROM d
    )
    SELECT a_id, b_id, round(dist, 6) AS dist, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 3
    """,
)
def q_n5(spark, sf):
    """N5 — the exact broadcast kNN JOIN kernel registered directly
    (similarity.knn_join_broadcast, the engine under SMOTE/NearMiss):
    50 probe rows stream against the broadcast corpus matrix, one numpy
    matmul per Arrow batch, no shuffle; every (probe, neighbor, dist,
    rank) hash-matches DuckDB's brute-force window ranking. At scale the
    big side is the streamed one — cost is one linear pass however many
    probes per batch."""
    e = _emb(spark, sf).select("vec_id", "embedding")
    probes = e.filter(F.col("vec_id") < 50)
    knn = SI.knn_join_broadcast(probes, e, "vec_id", "embedding", k=3, exclude_self=True)
    return knn.select(
        "a_id", "b_id", F.round("dist", 6).alias("dist"), F.col("rank").cast("int").alias("rank")
    )


@query(
    "t17_bigram_counts",
    oracle=f"""
    WITH tk AS (SELECT {_TOKENS_SQL} AS l FROM documents),
    b AS (
      SELECT unnest(list_filter(
        list_transform(list_zip(l, l[2:]), p -> p[1] || ' ' || p[2]),
        x -> x IS NOT NULL)) AS bigram
      FROM tk
    )
    SELECT bigram, count(*) AS n FROM b GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT 50
    """,
)
def q_t17(spark, sf):
    """T17 — corpus bigram frequency table (n-gram LM / tokenizer-training
    prep): consecutive token pairs built PLAN-SIDE (transform over an
    index sequence — no UDF, no self-join), exploded into one
    map-side-combined count shuffle; top-50 via TakeOrdered (50-row
    heaps, no global sort). Deterministic tiebreak on the bigram text;
    DuckDB recomputes the same table from the same tokenizer."""
    d = _tokens(_docs(spark, sf).select("doc_id", "text"))
    bigrams = d.select(
        F.explode(
            F.when(
                F.size("tokens") >= 2,
                F.expr(
                    "transform(sequence(1, size(tokens) - 1), "
                    "i -> concat(element_at(tokens, i), ' ', element_at(tokens, i + 1)))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(50)
    )


@query(
    "x9_dataset_card",
    oracle=f"""
    WITH t AS (
      SELECT lang, source, n_chars, len({_TOKENS_SQL}) AS n_tokens
      FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(n_tokens), 6) AS mean_tokens,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           round(avg(CASE WHEN n_chars >= 100 THEN 1.0 ELSE 0.0 END), 6)
             AS frac_long
    FROM t GROUP BY lang
    """,
)
def q_x9(spark, sf):
    """X9 — per-language DATASET CARD: the release-notes summary table
    (docs, sources, token volume, length stats, long-doc fraction) in
    ONE aggregation pass — token counts computed plan-side from the
    shared tokenizer, no second scan, map-side partials. The whole card
    hash-matches DuckDB recomputing it from the same parquet."""
    d = _tokens(_docs(spark, sf))
    t = d.select("lang", "source", "n_chars", F.size("tokens").alias("n_tokens"))
    return t.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 6).alias("mean_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(
            F.avg(F.when(F.col("n_chars") >= 100, 1.0).otherwise(0.0)), 6
        ).alias("frac_long"),
    )


@query(
    "mm4_audio_resample",
    oracle="""
    SELECT i AS asset_id,
           CAST(8000 AS INT) AS in_rate,
           CAST(64 + i AS INT) AS in_samples,
           CAST(2000 AS INT) AS out_rate,
           CAST(floor((64 + i + 3) / 4) AS INT) AS out_samples,
           TRUE AS resampled_bytes_exact
    FROM range(64) t(i) WHERE i % 3 = 1
    """,
)
def q_mm4(spark, sf):
    """MM4 — audio TRANSFORM plumbing: every synthetic audio asset is
    decimated 4x (keep every 4th PCM sample, rate 8000 -> 2000) via
    mapInPandas; per-asset in/out rates and sample counts follow the
    ingest's closed form (the oracle recomputes them from range(64)),
    and asset 1's resampled bytes are pinned against a locally-computed
    fixture from the same closed-form source (distributed == local)."""
    import math

    blobs = MM.synthetic_blobs(spark, n=64).filter(F.col("media_type") == "audio")
    res = MM.resample_audios(blobs, 4).cache()
    i = 1
    samples = [
        int(20000 * math.sin(2 * math.pi * (i + 1) * t / 64.0)) for t in range(64 + i)
    ]
    expected = MM.resample_audio_decimate(MM.encode_wav(samples), 4)
    got1 = res.filter(F.col("asset_id") == 1).select("content").first()
    bytes_exact = bool(
        got1 is not None and got1[0] is not None and bytes(got1[0]) == expected
    )
    return res.select(
        "asset_id", "in_rate", "in_samples", "out_rate", "out_samples",
        F.lit(bytes_exact).alias("resampled_bytes_exact"),
    )


# --- x10/x11: per-domain URL stats + Gopher quality flags (round 5) ----

#: deterministic URL noise both engines append (the synthetic corpus has
#: no URLs; doc_id-derived hosts exercise extraction on identical text)
_URLIFY = (
    " see http://site{m7}.example.com/p/{did}"
    " and https://mirror{m3}.example.org/x"
)
_URLIFY_SQL = (
    "text || ' see http://site' || (doc_id % 7) || '.example.com/p/' || doc_id"
    " || ' and https://mirror' || (doc_id % 3) || '.example.org/x'"
)


def _urlify(df):
    return df.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" see http://site"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/p/"), F.col("doc_id").cast("string"),
            F.lit(" and https://mirror"), (F.col("doc_id") % 3).cast("string"),
            F.lit(".example.org/x"),
        ),
    )


@query(
    "x10_domain_stats",
    oracle=f"""
    WITH u AS (
      SELECT doc_id,
             unnest(regexp_extract_all({_URLIFY_SQL},
                    'https?://([a-zA-Z0-9.-]+)', 1)) AS domain
      FROM documents
    )
    SELECT domain,
           count(*) AS n_urls,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM u GROUP BY domain
    """,
)
def q_x10(spark, sf):
    """X10 — per-domain corpus stats (the allow/deny-list + per-domain-cap
    signal of every web curation pipeline): JVM regexp_extract_all ->
    explode -> ONE shuffle on the domain key carrying (domain, doc_id)
    pairs only, never text. n_urls and n_docs share the exchange."""
    return TS.domain_stats(_urlify(_docs(spark, sf)), "doc_id", "text")


@query(
    "x11_gopher_flags",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         t -> t <> '') AS words
      FROM documents
    ), s AS (
      SELECT doc_id, len(words) AS n_words,
             list_sum(list_transform(words, t -> len(t))) AS total_len,
             len(list_intersect(words,
                 ['the','be','to','of','and','that','have','with']))
               AS stop_hits
      FROM w
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           round(total_len * 1.0 / n_words, 6) AS mean_word_len,
           CAST(stop_hits AS BIGINT) AS stop_hits,
           (n_words BETWEEN 50 AND 100000
            AND (total_len * 1.0 / n_words) BETWEEN 3.0 AND 10.0
            AND stop_hits >= 2) AS keep
    FROM s
    """,
)
def q_x11(spark, sf):
    """X11 — Gopher-rule quality flags (Rae et al. 2021 battery subset:
    word-count bounds, mean-word-length bounds, stopword presence) as
    map-only JVM expressions — the filter verdict computes at scan speed
    with no shuffle and no UDF; constants shared with the oracle SQL
    from operators/textstats.py."""
    d = _docs(spark, sf)
    flags = TS.gopher_quality_flags("text")
    return d.select(
        "doc_id",
        flags["n_words"].alias("n_words"),
        flags["mean_word_len"].alias("mean_word_len"),
        flags["stop_hits"].alias("stop_hits"),
        flags["keep"].alias("keep"),
    )


# ---------------------------------------------------------------------------
# repetition signals / chunking / corpus line dedup
# ---------------------------------------------------------------------------

#: planted repetition: a phrase repeated 3x so duplicate-5-gram mass is
#: nonzero on the word-salad corpus (same injection idiom as _urlify)
_REP_PHRASE = " click here to read more click here to read more click here to read more"
_REP_SQL = f"text || '{_REP_PHRASE}'"

_X12_SQL = f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim({_REP_SQL}), '\\s+'),
                         t -> t <> '') AS words
      FROM documents
    ), b AS (
      SELECT doc_id, len(words) AS n,
             CAST(coalesce(list_sum(list_transform(words, t -> len(t))), 0)
                  AS BIGINT) AS total,
             words
      FROM w
    ), g AS (
      SELECT doc_id, 2 AS sz, array_to_string(words[i:i+1], ' ') AS gram
      FROM b, unnest(generate_series(1, n - 1)) u(i) WHERE n >= 2
      UNION ALL
      SELECT doc_id, 5, array_to_string(words[i:i+4], ' ')
      FROM b, unnest(generate_series(1, n - 4)) u(i) WHERE n >= 5
    ), c AS (
      SELECT doc_id, sz, gram, count(*) AS cnt FROM g GROUP BY 1, 2, 3
    ), s AS (
      SELECT doc_id,
             max(CASE WHEN sz = 2 THEN cnt * (len(gram) - 1) END) AS topmass,
             sum(CASE WHEN sz = 5 AND cnt >= 2
                      THEN cnt * (len(gram) - 4) END) AS dupmass
      FROM c GROUP BY doc_id
    )
    SELECT b.doc_id, b.total AS n_word_chars,
           round(CASE WHEN b.total > 0
                      THEN coalesce(s.topmass, 0) * 1.0 / b.total
                      ELSE 0.0 END, 6) AS top_2gram_frac,
           round(CASE WHEN b.total > 0
                      THEN coalesce(s.dupmass, 0) * 1.0 / b.total
                      ELSE 0.0 END, 6) AS dup_5gram_frac
    FROM b LEFT JOIN s USING (doc_id)
"""


@query("x12_repetition_stats", oracle=_X12_SQL)
def q_x12(spark, sf):
    """X12 — Gopher repetition signals (the §A1.1 half that x11's
    length/stopword flags leave out): per-doc max-bigram character mass
    and duplicated-5-gram character mass, via
    operators.textstats.repetition_stats — one explode emitting both
    gram sizes, one (doc, sz, gram) counting shuffle, one per-doc fold;
    gram char mass derives from the gram string so the shuffle carries
    no extra payload. Repetition is planted (a 3x phrase) because the
    corpus is a no-dup word salad; fractions are exact integer-ratio
    arithmetic so the round(6) is bit-identical across engines."""
    d = _docs(spark, sf).select(
        "doc_id", F.concat(F.col("text"), F.lit(_REP_PHRASE)).alias("text")
    )
    return TS.repetition_stats(d, "doc_id", "text", top_n=2, dup_n=5)


@query(
    "x13_chunk_text",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         t -> t <> '') AS words
      FROM documents
    )
    SELECT doc_id,
           CAST((i - 1) // 24 AS BIGINT) AS chunk_id,
           CAST(len(words[i:i+31]) AS BIGINT) AS n_tokens,
           array_to_string(words[i:i+31], ' ') AS chunk_text
    FROM w, unnest(generate_series(1, greatest(len(words), 1), 24)) u(i)
    """,
)
def q_x13(spark, sf):
    """X13 — sliding-window chunking for retrieval indexing (size=32
    tokens, stride=24 -> 8-token overlap) via
    operators.textstats.chunk_sliding: map-only sequence + posexplode +
    slice + array_join, zero shuffle — chunk prep runs at scan speed at
    100 TB. Chunk text is compared as exact strings; a blank doc yields
    one empty chunk on both engines."""
    return TS.chunk_sliding(_docs(spark, sf), "doc_id", "text", size=32, stride=24)


#: synthetic multi-line docs for line dedup: the (unique) original text
#: plus one corpus-wide boilerplate line, one mod-5 shared line, and one
#: per-doc unique line — removal hits exactly the middle two
_D8_LINES_SQL = """
    SELECT doc_id,
           [text,
            'boilerplate cookie banner',
            'section ' || CAST(doc_id % 5 AS VARCHAR),
            'id marker ' || CAST(doc_id AS VARCHAR)] AS ls
    FROM documents
"""


@query(
    "d8_line_dedup",
    oracle=f"""
    WITH d AS ({_D8_LINES_SQL}),
    lines AS (
      SELECT doc_id, i - 1 AS line_no, ls[i] AS line
      FROM d, unnest(generate_series(1, len(ls))) u(i)
    ),
    dup AS (
      SELECT line FROM lines GROUP BY line
      HAVING count(DISTINCT doc_id) > 1
    ),
    k AS (
      SELECT l.doc_id, l.line_no, l.line, dup.line IS NOT NULL AS isdup
      FROM lines l LEFT JOIN dup ON l.line = dup.line
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN isdup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           md5(coalesce(string_agg(CASE WHEN NOT isdup THEN line END,
                                   chr(10) ORDER BY line_no), '')) AS kept_md5
    FROM k GROUP BY doc_id
    """,
)
def q_d8(spark, sf):
    """D8 — corpus-level LINE deduplication (CCNet / RefinedWeb
    boilerplate removal) via operators.dedup.dedup_lines: drop every
    line occurring in >1 distinct documents, reassemble survivors in
    order, emit the md5 of the cleaned text. The harness corpus is
    single-line, so multi-line docs are synthesized deterministically on
    both engines: original text + a corpus-wide boilerplate line + a
    mod-5 shared line + a unique marker line — dedup must remove
    exactly the middle two from every doc and keep the rest in order.
    Shuffles carry (line, doc_id) pairs; the dup-line set is the
    filtered minority that AQE broadcasts back."""
    d = _docs(spark, sf).select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lit("boilerplate cookie banner"),
            F.concat(F.lit("section "), (F.col("doc_id") % 5).cast("string")),
            F.concat(F.lit("id marker "), F.col("doc_id").cast("string")),
        ).alias("text"),
    )
    return DD.dedup_lines(d, "doc_id", "text", sep="\n", digest_only=True)


#: d12 planted spans: a 12-token cross-doc phrase on every 3rd doc and a
#: 10-token phrase repeated TWICE (intra-doc duplicate) on every 7th;
#: marker words are disjoint from the corpus vocabulary so the planted
#: coverage is exactly predictable (random salad 8-grams may also
#: collide — both engines detect those identically)
_D12_P1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
_D12_P2 = "nu xi omicron pi rho sigma tau upsilon phi chi"
_D12_DOCS_SQL = f"""
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 3 = 0 THEN ' {_D12_P1}' ELSE '' END
           || CASE WHEN doc_id % 7 = 0 THEN ' {_D12_P2} {_D12_P2}' ELSE '' END
           AS text
    FROM documents
"""


@query(
    "d12_substring_dedup",
    oracle=f"""
    WITH d AS ({_D12_DOCS_SQL}),
    w AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         t -> t <> '') AS words
      FROM d
    ),
    t AS (
      SELECT doc_id, i - 1 AS pos, words[i] AS tok
      FROM w, unnest(generate_series(1, len(words))) u(i)
    ),
    g AS (
      SELECT doc_id, i - 1 AS s,
             md5(array_to_string(words[i:i+7], ' ')) AS h
      FROM w, unnest(generate_series(1, len(words) - 7)) u(i)
      WHERE len(words) >= 8
    ),
    dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
    st AS (SELECT g.doc_id, g.s FROM g JOIN dup USING (h)),
    cov AS (
      SELECT t.doc_id, t.pos, t.tok,
             EXISTS (SELECT 1 FROM st
                     WHERE st.doc_id = t.doc_id
                       AND st.s BETWEEN t.pos - 7 AND t.pos) AS c
      FROM t
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           md5(coalesce(string_agg(CASE WHEN NOT c THEN tok END,
                                   ' ' ORDER BY pos), '')) AS kept_md5
    FROM cov GROUP BY doc_id
    """,
)
def q_d12(spark, sf):
    """D12 — EXACT SUBSTRING dedup (Lee et al. 2022's EXACTSUBSTR pass)
    via operators.dedup.dedup_substrings: every token inside a verbatim
    >=8-token span that occurs more than once in the corpus is removed;
    survivors are reassembled in order and digested. Suffix arrays are
    driver-bound, so the distributed formulation is duplicated-L-gram
    COVERAGE (provably the same removed set); the coverage itself is a
    +1/-1 interval sweep under one per-doc window, never an
    exists()-per-token fold. Duplication is planted on both engines: a
    cross-doc 12-token phrase (every 3rd doc) and an intra-doc twice-
    repeated 10-token phrase (every 7th doc); the random-salad corpus
    contributes whatever organic 8-gram collisions it has, identically
    visible to both engines. Shuffles carry md5 digests, not gram text;
    the duplicated-gram set is the filtered minority AQE broadcasts."""
    d = _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" " + _D12_P1)).otherwise(
                F.lit("")
            ),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit(" " + _D12_P2 + " " + _D12_P2)
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return DD.dedup_substrings(d, "doc_id", "text", min_len=8, digest_only=True)


@query(
    "x14_weighted_sample",
    oracle="""
    WITH s AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
             (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                   AS BIGINT) + 0.5) / 4294967296.0 AS u
      FROM documents WHERE n_chars > 0
    ), r AS (
      SELECT doc_id, w,
             row_number() OVER (ORDER BY ln(u) / w DESC, doc_id ASC) AS rank
      FROM s
    )
    SELECT doc_id, w, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 50
    """,
)
def q_x14(spark, sf):
    """X14 — Efraimidis–Spirakis weighted priority sampling (50 docs,
    weight = n_chars) via operators.sampling.weighted_priority_sample:
    deterministic md5-hash uniforms make the exact drawn set (and its
    rank order) recomputable by the SQL oracle; Spark plans the
    selection as TakeOrderedAndProject — per-partition top-n, no global
    sort, no full-corpus single-task window."""
    d = _docs(spark, sf).select("doc_id", F.col("n_chars").cast("long").alias("w"))
    from .operators import sampling as SA

    return SA.weighted_priority_sample(d, "doc_id", "w", n=50).select(
        "doc_id", "w", "rank"
    )


@query(
    "d10_semdedup",
    oracle=f"""
    SELECT vec_id, TRUE AS kept FROM embeddings
    UNION ALL
    SELECT vec_id + {_COPY_OFFSET} AS vec_id, FALSE AS kept
    FROM embeddings WHERE vec_id < 10
    """,
)
def q_d10(spark, sf):
    """SemDeDup (operators.dedup.semdedup — Abbas et al. 2023): KMeans
    the embedding space, prune within-cluster pairs with cosine >= 0.95,
    keeping the centroid-farthest (id-tie-broken) representative. The
    decision surface (vec_id, kept) is oracle-EXACT despite the KMeans
    inside: identical vectors always share a cell (same argmin) so each
    planted copy meets its original and loses the id tie-break, while
    random 64-dim embeddings are near-orthogonal (d5's oracle proves no
    natural pair reaches 0.95) — so kept = originals, dropped = copies,
    for ANY centroid placement. Pair work is sum(|cluster|^2), bounded
    by n_clusters and the max_cluster_rows guard — never |corpus|^2."""
    u = _emb_with_copies(spark, sf)
    out = DD.semdedup(
        u, "vec_id", "embedding", n_clusters=16, threshold=0.95, seed=42
    )
    return out.select("vec_id", "kept")


@query(
    "u12_cluster_balanced",
    oracle="""
    WITH a AS (
      SELECT vec_id,
             CAST(list_position(embedding[1:4], list_max(embedding[1:4])) - 1
                  AS INT) AS cell
      FROM embeddings
    )
    SELECT vec_id, cell,
           row_number() OVER (
             PARTITION BY cell
             ORDER BY md5(CAST(vec_id AS VARCHAR) || 'cb'), vec_id
           ) <= 25 AS kept
    FROM a
    """,
)
def q_u12(spark, sf):
    """U12 — DIVERSITY (cluster-balanced) sampling
    (operators.sampling.cluster_balanced_sample): cap every semantic
    cell at 25 examples via the deterministic salted-md5 quota rank.
    Oracle-EXACT via the explicit-codebook path: with centroids = scaled
    basis vectors M*e_k, argmin ||v-c_k||^2 = argmax_k v_k over the
    first 4 coordinates (M^2 is constant, the cross term decides, and
    l2-normalization is a positive scale so raw-float argmax is
    unchanged) — DuckDB recomputes the cell per row from the parquet
    floats and replays the identical per-cell md5-rank kept-set. The
    default k-means fit path is pytest-covered (layout-independence +
    no-global-sort plan assertion); work is one map-only assign pass +
    one cell-keyed window — nothing quadratic, no counting pass."""
    from .operators.sampling import cluster_balanced_sample

    e = _emb(spark, sf).select("vec_id", "embedding")
    M, K, DIM = 4.0, 4, 64
    cents = [[M if j == k else 0.0 for j in range(DIM)] for k in range(K)]
    return cluster_balanced_sample(
        e, "vec_id", "embedding", n_clusters=K, per_cluster=25, centroids=cents
    )


@query(
    "mm5_audio_spectrogram",
    oracle="""
    SELECT i AS asset_id,
           CAST(CASE WHEN i >= 32 THEN 2 ELSE 1 END AS INT) AS n_frames,
           CAST(33 AS INT) AS n_bins,
           CAST(CASE WHEN (i + 1) % 32 = 0 THEN 0  -- Nyquist/fs sine: the
                          -- integer-sampled signal is identically zero
                     WHEN i + 1 < 32 THEN i + 1
                     ELSE 64 - (i + 1) END
                AS BIGINT) AS peak_bin,
           TRUE AS spec_nonneg
    FROM range(64) t(i) WHERE i % 3 = 1
    """,
)
def q_mm5(spark, sf):
    """MM5 — STFT power SPECTROGRAM extraction (MM.spectrograms): each
    synthetic audio asset is a pure sine of (i+1) cycles per 64 samples,
    so physics IS the oracle — with a 64-point FFT the dominant bin of
    frame 0 must be exactly i+1 (or the alias 64-(i+1) above Nyquist),
    and the frame count follows the closed-form hop arithmetic. Map-only
    mapInPandas (one numpy rFFT per Arrow batch), zero shuffle —
    feature extraction at scan speed, the step between raw bytes and a
    model input at 100 TB."""
    blobs = MM.synthetic_blobs(spark, n=64).filter(F.col("media_type") == "audio")
    spec = MM.spectrograms(blobs, n_fft=64, hop=32)
    return spec.select(
        "asset_id",
        "n_frames",
        "n_bins",
        (F.expr("array_position(spec[0], array_max(spec[0]))") - 1)
        .cast("long")
        .alias("peak_bin"),
        F.expr("forall(spec, r -> forall(r, v -> v >= 0))").alias("spec_nonneg"),
    )


@query(
    "mm6_channel_norm_fit",
    oracle="""
    WITH imgs AS (
      SELECT i, 4 + i % 4 AS w, 3 + i % 3 AS h
      FROM range(64) t(i) WHERE i % 3 = 0
    ),
    px AS (
      SELECT (x * 37 + i) % 256 AS r, (y * 59 + i) % 256 AS g,
             (x * y * 17 + i) % 256 AS b
      FROM imgs, LATERAL unnest(generate_series(0, w - 1)) xs(x),
                 LATERAL unnest(generate_series(0, h - 1)) ys(y)
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r) AS BIGINT) AS sr, CAST(sum(g) AS BIGINT) AS sg,
             CAST(sum(b) AS BIGINT) AS sb,
             CAST(sum(r * r) AS BIGINT) AS qr, CAST(sum(g * g) AS BIGINT) AS qg,
             CAST(sum(b * b) AS BIGINT) AS qb
      FROM px
    )
    SELECT CAST((SELECT count(*) FROM imgs) AS BIGINT) AS n_images,
           n AS n_pixels,
           round(sr / n / 255.0, 6) AS mean_r,
           round(sg / n / 255.0, 6) AS mean_g,
           round(sb / n / 255.0, 6) AS mean_b,
           round(sqrt(qr / n / 65025.0 - (sr / n / 255.0) ^ 2), 6) AS std_r,
           round(sqrt(qg / n / 65025.0 - (sg / n / 255.0) ^ 2), 6) AS std_g,
           round(sqrt(qb / n / 65025.0 - (sb / n / 255.0) ^ 2), 6) AS std_b
    FROM s
    """,
)
def q_mm6(spark, sf):
    """MM6 — corpus NORMALIZATION-CONSTANT fit (MM.channel_norm_fit):
    every synthetic BMP decodes to its closed-form pixel grid, the
    mapInPandas pass emits per-image exact integer partial sums, and one
    global aggregate folds them into the per-channel mean/std a
    preprocessing pipeline bakes in. DuckDB regenerates the identical
    pixel arithmetic from the asset formulas — integer totals are exact
    on both engines, so the final doubles match to the rounding
    quantum."""
    blobs = MM.synthetic_blobs(spark, n=64).filter(F.col("media_type") == "image")
    return MM.channel_norm_fit(blobs)


#: gopher keep as ONE scalar SQL expression (inlined x11 arithmetic) —
#: shared by the x16 funnel oracle
_GOPHER_KEEP_SQL = """(
  len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> ''))
    BETWEEN 50 AND 100000
  AND (list_sum(list_transform(
         list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> ''),
         t -> len(t))) * 1.0
       / len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')))
    BETWEEN 3.0 AND 10.0
  AND len(list_intersect(
        list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> ''),
        ['the','be','to','of','and','that','have','with'])) >= 2
)"""


@query(
    "x16_curation_funnel",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text, source, {_LANG_CASE_SQL} AS lg,
             {_GOPHER_KEEP_SQL} AS gk
      FROM documents
    ),
    s1 AS (SELECT * FROM base WHERE lg = 'en'),
    s2 AS (SELECT * FROM s1 WHERE gk),
    s3 AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM s2
      ) WHERE rn = 1
    ),
    s4 AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY source
          ORDER BY md5(CAST(doc_id AS VARCHAR) || 'x16')) AS qr
        FROM s3
      ) WHERE qr <= 25
    )
    SELECT CAST(0 AS BIGINT) AS stage, 'input' AS name,
           (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs
    UNION ALL SELECT 1, 'lang_en', count(*) FROM s1
    UNION ALL SELECT 2, 'gopher_keep', count(*) FROM s2
    UNION ALL SELECT 3, 'exact_dedup', count(*) FROM s3
    UNION ALL SELECT 4, 'source_quota', count(*) FROM s4
    """,
)
def q_x16(spark, sf):
    """X16 — the END-TO-END curation FUNNEL (the composition a real
    LLM-data pipeline runs): language-ID gate -> Gopher quality gate ->
    exact dedup (min-id representative) -> per-source quota sample, with
    the per-stage survivor counts as the output. ONE scan computes every
    stage: the gates are map-side booleans, dedup rank and quota rank are
    windows whose PARTITION KEYS INCLUDE the upstream survival flag (so
    non-survivors can't claim a dedup slot or consume quota), and a
    single aggregate folds the five counts. DuckDB recomputes the funnel
    as chained CTEs — any stage diverging by one document breaks the
    hash."""
    from pyspark.sql import Window as W

    d = _docs(spark, sf)
    flags = TS.gopher_quality_flags(F.col("text"))
    base = d.select(
        "doc_id", "text", "source",
        (TS.language_id(F.col("text")) == "en").alias("p1"),
        flags["keep"].alias("gk"),
    ).withColumn("p2", F.col("p1") & F.col("gk"))
    dup_rn = F.row_number().over(
        W.partitionBy("text", "p2").orderBy("doc_id")
    )
    base = base.withColumn("p3", F.col("p2") & (dup_rn == 1))
    quota_rn = F.row_number().over(
        W.partitionBy("source", "p3").orderBy(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("x16")))
        )
    )
    base = base.withColumn("p4", F.col("p3") & (quota_rn <= 25))
    agg = base.agg(
        F.count("*").cast("long").alias("n0"),
        F.sum(F.col("p1").cast("long")).alias("n1"),
        F.sum(F.col("p2").cast("long")).alias("n2"),
        F.sum(F.col("p3").cast("long")).alias("n3"),
        F.sum(F.col("p4").cast("long")).alias("n4"),
    )
    return agg.selectExpr(
        "stack(5, CAST(0 AS BIGINT), 'input', n0,"
        " CAST(1 AS BIGINT), 'lang_en', n1,"
        " CAST(2 AS BIGINT), 'gopher_keep', n2,"
        " CAST(3 AS BIGINT), 'exact_dedup', n3,"
        " CAST(4 AS BIGINT), 'source_quota', n4) AS (stage, name, n_docs)"
    )


@query(
    "n6_contrastive_pairs",
    oracle=f"""
    WITH n AS (SELECT count(*) AS c FROM embeddings),
    pos AS (
      SELECT vec_id AS anchor_id, vec_id + {_COPY_OFFSET} AS other_id,
             CAST(1 AS INT) AS label
      FROM embeddings WHERE vec_id < 10
    ),
    neg AS (
      SELECT e.vec_id AS anchor_id,
             CASE WHEN (e.vec_id + j.j * 40503 + 12289) % n.c = e.vec_id
                  THEN ((e.vec_id + j.j * 40503 + 12289) % n.c + 1) % n.c
                  ELSE (e.vec_id + j.j * 40503 + 12289) % n.c END AS other_id,
             CAST(0 AS INT) AS label
      FROM embeddings e, n, LATERAL unnest(generate_series(1, 3)) AS j(j)
    )
    SELECT * FROM pos UNION ALL SELECT * FROM neg
    """,
)
def q_n6(spark, sf):
    """N6 — contrastive-pair dataset construction
    (similarity.contrastive_pairs): planted duplicate pairs as label-1
    positives, three systematic stride negatives per corpus vector as
    label-0 — the (anchor, other, label) table a dual-encoder trains
    on. Generation is shuffle-free (explode + modular arithmetic, one
    union); DuckDB reproduces every pair exactly."""
    e = _emb(spark, sf).select("vec_id")
    n_ids = e.count()
    pos = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id"), (F.col("vec_id") + _COPY_OFFSET).alias("other")
    )
    return SI.contrastive_pairs(e, "vec_id", n_ids, pos, k_negatives=3)


@query(
    "mm7_scene_cuts",
    oracle="""
    SELECT i AS asset_id, CAST(10 AS INT) AS n_frames,
           CAST(1 AS INT) AS n_cuts, CAST(3 + i % 5 AS INT) AS first_cut
    FROM range(8) t(i)
    """,
)
def q_mm7(spark, sf):
    """MM7 — SHOT-BOUNDARY detection (MM.scene_cuts): each planted AVI
    holds 10 solid frames, black until its closed-form cut index then
    white, so the mean-|Δluma| detector must report EXACTLY one cut at
    exactly that frame — the frame-sampling primitive a video curation
    pipeline keys on (sample per shot, not per second). Map-only
    mapInPandas; the smooth-motion null case and poison pills are pinned
    in pytest."""
    cut_rows = []
    for i in range(8):
        cut = 3 + i % 5
        frames = [[(0, 0, 0)] * 16] * cut + [[(255, 255, 255)] * 16] * (10 - cut)
        cut_rows.append((i, bytearray(MM.encode_avi(4, 4, frames, fps=4))))
    blobs = spark.createDataFrame(cut_rows, "asset_id long, content binary")
    return MM.scene_cuts(blobs, threshold=0.3)


@query(
    "d11_image_dedup",
    oracle="""
    SELECT i AS a_id, i + 1000 AS b_id, CAST(0 AS BIGINT) AS hamming
    FROM range(8) t(i)
    """,
)
def q_d11(spark, sf):
    """D11 — IMAGE near-dup detection: perceptual aHash (MM.ahash_images
    — luma box-pool, one bit per cell) + the generic pigeonhole band
    join (DD.hash_banded_pairs, 8x8-bit bands, Hamming <= 7). The
    manifest is 40 md5-block-pattern bases (pairwise Hamming >= 20 —
    asserted at build, so no natural pair can reach the threshold) plus
    8 pixel-perturbed copies whose pooled cells survive the noise —
    the ONLY pairs the join may emit are the planted (i, i+1000) at
    Hamming 0, which DuckDB states in closed form. Map-only hashing,
    band-keyed candidate shuffle — never |corpus|² on images."""
    import hashlib

    def base_px(i, w=16, h=16):
        px = []
        for y in range(h):
            for x in range(w):
                bit = hashlib.md5(f"{i}_{x // 2}_{y // 2}".encode()).digest()[0] & 1
                v = 255 if bit else 0
                px.append((v, v, v))
        return px

    rows = []
    hashes = {}
    for i in range(40):
        px = base_px(i)
        content = MM.encode_bmp(16, 16, px)
        hashes[i] = MM.ahash_image(content)
        rows.append((i, bytearray(content)))
        if i < 8:  # noisy copy: 3 pixels to mid-gray, pooled bits unchanged
            noisy = list(px)
            for k in (5, 100, 200):
                noisy[k] = (128, 128, 128)
            rows.append((1000 + i, bytearray(MM.encode_bmp(16, 16, noisy))))
    # build-time invariant: the pattern family must keep natural pairs
    # far outside the Hamming threshold (deterministic, but asserted so
    # a pattern edit can't silently break the closed-form oracle)
    for i in range(40):
        for j in range(i + 1, 40):
            d = bin((hashes[i] ^ hashes[j]) & ((1 << 64) - 1)).count("1")
            if d <= 7:
                raise AssertionError(f"d11 base patterns {i},{j} collide (hamming {d})")
    blobs = spark.createDataFrame(rows, "asset_id long, content binary")
    sig = MM.ahash_images(blobs)
    return DD.hash_banded_pairs(
        sig, "asset_id", "ahash", max_hamming=7, n_bands=8
    )


# ---------------------------------------------------------------------------
# BM25 retrieval (x17)
# ---------------------------------------------------------------------------

#: driver-side query fixture — the shape user queries naturally are.
#: Two terms per query ON PURPOSE: IEEE addition is commutative, so
#: per-doc 2-term score sums are bit-identical whatever the aggregation
#: order, making within-engine ties EXACT (tie-break: doc_id asc) —
#: 3+ term sums would expose associativity noise to the rank.
_BM25_QUERIES = {
    "q1": ["spark", "join"],
    "q2": ["fast", "scan"],
    "q3": ["window", "merge"],
}


def _bm25_oracle() -> str:
    from .qdefs_text import clean_tokens_sql

    qvals = ", ".join(
        f"('{qid}', '{t}')"
        for qid in sorted(_BM25_QUERIES)
        for t in sorted(set(_BM25_QUERIES[qid]))
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, {clean_tokens_sql("text")} AS t FROM documents
    ),
    tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    stats AS (
      SELECT count(*) AS n_docs, avg(CAST(len(t) AS DOUBLE)) AS avgdl
      FROM toks
    ),
    q(query_id, token) AS (VALUES {qvals}),
    dfq AS (
      SELECT token, count(*) AS df FROM tf
      WHERE token IN (SELECT token FROM q) GROUP BY 1
    ),
    scored AS (
      SELECT q.query_id, tf.doc_id,
             sum(
               ln(1.0 + (CAST(s.n_docs AS DOUBLE) - dfq.df + 0.5)
                        / (dfq.df + 0.5))
               * tf.tf * (1.2 + 1.0)
               / (tf.tf + 1.2 * ((1.0 - 0.75)
                                 + 0.75 * dl.dl / s.avgdl))
             ) AS score
      FROM q
      JOIN tf ON tf.token = q.token
      JOIN dfq ON dfq.token = q.token
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
      GROUP BY 1, 2
    )
    SELECT query_id, doc_id, round(score, 6) AS score, rank FROM (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY score DESC, doc_id ASC) AS INT) AS rank
      FROM scored
    ) WHERE rank <= 10
    """


@query("x17_bm25_topk", oracle=_bm25_oracle())
def q_x17(spark, sf):
    """X17 — BM25 top-k retrieval (operators/textstats.py
    ``bm25_topk``) on the t16 clean-token substrate: standard
    Okapi/Lucene scoring (robust idf ``ln(1+(N-df+0.5)/(df+0.5))``,
    saturation k1=1.2, length norm b=0.75), top-10 per query, ties by
    doc id. Plan: tf/dl are two hash aggregations over one explode;
    the query-term frame and the post-cut per-term doc frequencies
    BROADCAST; per-query top-k is orderBy+limit per query id —
    TakeOrderedAndProject, NO corpus-scale window (the only window
    ranks the <= queries*k union result). DuckDB recomputes the whole
    formula; a wrong idf, a lost length norm, or a mis-ranked doc
    breaks the hash."""
    from .ml import features as FE
    from .operators.textstats import bm25_topk

    d = FE.tokens_df(_docs(spark, sf))
    out = bm25_topk(d, _BM25_QUERIES, k=10)
    return out.select(
        "query_id", "doc_id", F.round("score", 6).alias("score"), "rank"
    )


def _x18_oracle() -> str:
    from .qdefs_text import clean_tokens_sql

    qvals = ", ".join(
        f"('{qid}', '{t}')"
        for qid in sorted(_BM25_QUERIES)
        for t in sorted(set(_BM25_QUERIES[qid]))
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, {clean_tokens_sql("text")} AS t FROM documents
    ),
    tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    stats AS (
      SELECT count(*) AS n_docs, avg(CAST(len(t) AS DOUBLE)) AS avgdl
      FROM toks
    ),
    q(query_id, token) AS (VALUES {qvals}),
    dfq AS (
      SELECT token, count(*) AS df FROM tf
      WHERE token IN (SELECT token FROM q) GROUP BY 1
    ),
    scored AS (
      SELECT q.query_id, tf.doc_id,
             sum(
               ln(1.0 + (CAST(s.n_docs AS DOUBLE) - dfq.df + 0.5)
                        / (dfq.df + 0.5))
               * tf.tf * (1.2 + 1.0)
               / (tf.tf + 1.2 * ((1.0 - 0.75)
                                 + 0.75 * dl.dl / s.avgdl))
             ) AS score
      FROM q
      JOIN tf ON tf.token = q.token
      JOIN dfq ON dfq.token = q.token
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id ASC) AS brank
      FROM scored
    ),
    cand AS (SELECT query_id, doc_id FROM ranked WHERE brank <= 20),
    seed AS (SELECT query_id, doc_id AS seed_id FROM ranked
             WHERE brank = 1),
    emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    rr AS (
      SELECT c.query_id, c.doc_id,
             list_cosine_similarity(ce.e, se.e) AS cos_raw
      FROM cand c
      JOIN seed s ON s.query_id = c.query_id
      JOIN emb ce ON ce.vec_id = c.doc_id
      JOIN emb se ON se.vec_id = s.seed_id
    )
    SELECT query_id, doc_id AS cand_id,
           round(CAST(cos_raw AS DOUBLE), 6) AS cosine, rank
    FROM (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY cos_raw DESC, doc_id ASC) AS INT) AS rank
      FROM rr
    ) WHERE rank <= 10
    """


@query("x18_hybrid_rerank", oracle=_x18_oracle())
def q_x18(spark, sf):
    """X18 — HYBRID retrieve-then-rerank (operators/similarity.py
    ``rerank_candidates`` over the x17 BM25 substrate): the two-stage
    retrieval every production pipeline runs — lexical BM25 recalls a
    top-20 candidate set per query, then an embedding-cosine rerank
    against the top hit's vector (pseudo-relevance / query-by-example)
    reorders it to a final top-10. Stage one is x17's plan; stage two
    BROADCASTS the bounded candidate + seed frames onto the embedding
    table (one scan, hash-join filtered — the corpus never shuffles),
    cosine is zip_with + aggregate (JVM-side, no UDF), and per-query
    top-k is TakeOrderedAndProject over candidate-bounded rows. DuckDB
    recomputes BOTH stages end to end (BM25, candidate cut, seed pick,
    list_cosine_similarity, rerank); a wrong candidate set, a
    mis-seeded query, or a rank flip breaks the hash."""
    from .ml import features as FE
    from .operators.textstats import bm25_topk

    d = FE.tokens_df(_docs(spark, sf))
    cands = bm25_topk(d, _BM25_QUERIES, k=20)
    rows = cands.collect()  # <= queries*20, materialized by stage one
    seeds = {r["query_id"]: r["doc_id"] for r in rows if r["rank"] == 1}
    cand_df = cands.select("query_id", F.col("doc_id").alias("cand_id"))
    return SI.rerank_candidates(_emb(spark, sf), cand_df, seeds, k=10)


@query(
    "n7_knn_ivf_pq",
    oracle=f"""
    SELECT CAST(0 AS BIGINT) AS vec_id, CAST(1.0 AS DOUBLE) AS cosine,
           CAST(1 AS INT) AS rank
    UNION ALL
    SELECT CAST({_COPY_OFFSET} + r AS BIGINT) AS vec_id,
           CAST(1.0 AS DOUBLE) AS cosine, CAST(r + 2 AS INT) AS rank
    FROM range(0, 9) t(r)
    """,
)
def q_n7(spark, sf):
    """N7 — IVF-PQ quantized ANN (operators.similarity.topk_ivf_pq;
    Jégou et al. 2011): coarse IVF cells bound the scan, residuals are
    PRODUCT-QUANTIZED to M=8 one-byte codes (32x compression vs the
    raw 64 x float32 — asserted), per-query LUTs score candidates by
    ASYMMETRIC distance (one numpy gather per Arrow batch), and the
    ADC top-``rerank`` re-ranks EXACTLY. Two probes, two contracts:

    * HASHED: a probe with 10 planted EXACT COPIES in the corpus
      (vec 0's embedding under ids {_COPY_OFFSET}+0..9). A copy's ADC
      distance equals the probe's own quantization error — far below
      near-orthogonal strangers (d5's oracle proves no natural pair
      comes close) — so every copy reaches the shortlist FOR ANY
      centroid/codebook placement, and the exact re-rank scores each
      cosine 1.0. The returned top-10 is therefore deterministic
      (rank 1 = vec 0, ranks 2..10 = the 9 lowest copy ids) and
      DuckDB-exact; a copy lost by the quantizer breaks the hash.
    * IN-ENTRY: recall@10 vs the n1 exact brute force on the natural
      ``_PROBE``, asserted above the pinned floor (approximate by
      design; near-orthogonal random vectors are the adversarial
      case for any ANN — the floor documents honest accuracy, not a
      tuned best case).

    Scale shape: centroids + codebooks + LUTs are driver-built KBs on
    ONE broadcast; candidate selection is a cell filter; ADC top-m and
    the final top-k are TakeOrderedAndProject; the only window ranks
    <= k rows. The PQ index is M bytes/vector — 100 TB of fp32
    embeddings quantize to ~3 TB of scannable codes."""
    e = _emb(spark, sf).select("vec_id", "embedding")
    dim = len(e.select("embedding").first()["embedding"])

    # planted-copy probe: vec 0's embedding, 10 copies at high ids
    v0 = e.filter(F.col("vec_id") == 0).first()["embedding"]
    copies = e.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + _COPY_OFFSET).alias("vec_id"),
        F.lit([float(x) for x in v0]).alias("embedding"),
    )
    planted = e.unionByName(copies)
    got = SI.topk_ivf_pq(
        planted, "vec_id", "embedding", [float(x) for x in v0],
        k=10, n_cells=16, n_probe=8, m_subspaces=8, ksub=16,
        rerank=400, seed=42,
    )

    # compression ratio: M one-byte codes vs dim float32s
    ratio = (dim * 4) / 8.0
    assert ratio >= 16.0, ratio

    # recall floor vs the exact brute force on the natural probe
    exact = {
        r["vec_id"]
        for r in SI.topk_bruteforce(
            e, "vec_id", "embedding", _PROBE, k=10
        ).collect()
    }
    ann = {
        r["vec_id"]
        for r in SI.topk_ivf_pq(
            e, "vec_id", "embedding", _PROBE,
            k=10, n_cells=16, n_probe=8, m_subspaces=8, ksub=16,
            rerank=400, seed=42,
        ).collect()
    }
    recall = len(exact & ann) / 10.0
    assert recall >= 0.5, f"recall@10 {recall} below pinned floor"
    return got

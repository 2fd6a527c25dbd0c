"""Sampling operator invariants (U3-U8): balance, determinism, SMOTE bounds."""

import pyspark.sql.functions as F

from predicting_hospital_readmission_using_mimic_database_spark.operators import sampling as SA


def _toy(spark, n_pos=6, n_neg=20):
    rows = [(i, [float(i % 5), float(i % 3)], 1) for i in range(n_pos)]
    rows += [(100 + i, [10.0 + i % 7, 5.0 + i % 4], 0) for i in range(n_neg)]
    return spark.createDataFrame(rows, "id long, arr array<double>, lab int")


def test_balance_undersample_exact_counts(spark):
    df = _toy(spark)
    out = SA.balance_undersample(df, "lab", seed=1)
    counts = {r["lab"]: r["n"] for r in out.groupBy("lab").agg(F.count("*").alias("n")).collect()}
    assert counts == {0: 6, 1: 6}


def test_balance_undersample_fraction_mode_no_funnel(spark):
    """Scale path: approximate counts via one sampleBy pass, and the plan
    has NO single-partition exchange or global limit (the exact-n trap)."""
    df = _toy(spark, 60, 200)
    out = SA.balance_undersample(df, "lab", seed=1, exact=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "TakeOrderedAndProject" not in plan and "GlobalLimit" not in plan
    counts = {r["lab"]: r["n"] for r in out.groupBy("lab").agg(F.count("*").alias("n")).collect()}
    # binomial around n_min: minority kept fully-ish, majority near n_min
    assert counts[1] <= 60 and 30 <= counts[0] <= 100


def test_balance_undersample_fraction_null_class(spark):
    rows = [(i, 0) for i in range(40)] + [(100 + i, 1) for i in range(10)] + [
        (200 + i, None) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "id long, lab int")
    out = SA.balance_undersample(df, "lab", seed=1, exact=False)
    labs = {r["lab"] for r in out.select("lab").distinct().collect()}
    assert None in labs  # the NULL class is sampled, not dropped


def test_undersample_fraction_no_shuffle(spark):
    df = _toy(spark, 50, 150)
    out = SA.undersample_fraction(df, 40, seed=2, total=200)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map-side sample
    n = out.count()
    assert 10 <= n <= 80  # binomial around 40


def test_nearmiss_pick_is_distributed(spark):
    """The top-n_min majority pick must not compile to a single-task
    TakeOrdered merge (regression of the exact-n funnel)."""
    df = _toy(spark)
    out = SA.nearmiss(df, "id", "arr", "lab", minority_value=1, k=2, seed=5,
                      threshold=50.0, bucket_length=5.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" not in plan and "GlobalLimit" not in plan


def test_random_split_partitions_input(spark):
    df = _toy(spark, 50, 50)
    tr, te = SA.random_split(df, (0.8, 0.2), seed=3)
    assert tr.count() + te.count() == 100
    # disjoint
    assert tr.join(te, "id", "inner").count() == 0


def test_stratified_split_keeps_both_classes(spark):
    df = _toy(spark, 40, 160)
    tr, te = SA.stratified_split(df, "lab", (0.8, 0.2), seed=3)
    assert tr.count() + te.count() == 200
    assert tr.join(te, "id", "inner").count() == 0  # partition the input
    te_labs = {r["lab"] for r in te.select("lab").distinct().collect()}
    tr_labs = {r["lab"] for r in tr.select("lab").distinct().collect()}
    assert te_labs == tr_labs == {0, 1}


def test_smote_synthetic_in_envelope(spark):
    df = _toy(spark)
    out = SA.smote(df, "id", "arr", "lab", minority_value=1, k=2, seed=5,
                   threshold=50.0, bucket_length=5.0)
    synth = out.filter(F.col("id") < 0).collect()
    assert 0 < len(synth) <= 2 * 6
    # minority values: dim0 in [0,4], dim1 in [0,2]
    for r in synth:
        assert -1e-9 <= r["arr"][0] <= 4 + 1e-9
        assert -1e-9 <= r["arr"][1] <= 2 + 1e-9
    assert all(r["lab"] == 1 for r in synth)


def test_smote_target_ratio_exact_deficit(spark):
    """target_ratio=1.0 (imblearn ratio=1 parity): exactly n_maj - n_min
    synthetics, so the output is 1:1 balanced."""
    df = _toy(spark, n_pos=6, n_neg=14)  # deficit 8 <= k*n_min = 12
    out = SA.smote(df, "id", "arr", "lab", minority_value=1, k=2, seed=5,
                   threshold=50.0, bucket_length=5.0, target_ratio=1.0)
    counts = {r["lab"]: r["n"] for r in out.groupBy("lab").agg(F.count("*").alias("n")).collect()}
    assert counts == {0: 14, 1: 14}
    assert out.filter(F.col("id") < 0).count() == 8


def test_smote_target_ratio_zero_deficit(spark):
    """Already-balanced input: target_ratio=1.0 emits NO synthetics."""
    df = _toy(spark, n_pos=6, n_neg=6)
    out = SA.smote(df, "id", "arr", "lab", minority_value=1, k=2, seed=5,
                   threshold=50.0, bucket_length=5.0, target_ratio=1.0)
    assert out.filter(F.col("id") < 0).count() == 0
    assert out.count() == 12


def test_smote_autotune_no_constants(spark):
    """threshold/bucket_length omitted -> tuned from the data; synthetics
    still produced and in-envelope."""
    df = _toy(spark)
    out = SA.smote(df, "id", "arr", "lab", minority_value=1, k=2, seed=5)
    synth = out.filter(F.col("id") < 0).collect()
    assert 0 < len(synth) <= 2 * 6
    for r in synth:
        assert -1e-9 <= r["arr"][0] <= 4 + 1e-9


def test_nearmiss_keeps_minority_count(spark):
    df = _toy(spark)
    out = SA.nearmiss(df, "id", "arr", "lab", minority_value=1, k=2, seed=5,
                      threshold=50.0, bucket_length=5.0)
    counts = {r["lab"]: r["n"] for r in out.groupBy("lab").agg(F.count("*").alias("n")).collect()}
    assert counts == {0: 6, 1: 6}


def test_oversample_keeps_all_originals(spark):
    df = _toy(spark, n_pos=5, n_neg=40)
    out = SA.oversample_with_replacement(df, "lab", seed=3)
    orig_pos_ids = {r["id"] for r in df.filter(F.col("lab") == 1).collect()}
    out_pos_ids = {r["id"] for r in out.filter(F.col("lab") == 1).collect()}
    assert orig_pos_ids <= out_pos_ids  # imblearn semantics: originals retained


def test_oversample_exact_hits_majority_count(spark):
    """exact=True: every class lands on EXACTLY the majority count, all
    originals retained, and the result is partitioning-robust."""
    rows = (
        [(i, 0) for i in range(37)]
        + [(100 + i, 1) for i in range(5)]
        + [(200 + i, 2) for i in range(11)]
    )
    df = spark.createDataFrame(rows, "id long, lab int")
    out = SA.oversample_with_replacement(df, "lab", seed=3, exact=True)
    counts = {r["lab"]: r["n"] for r in out.groupBy("lab").agg(F.count("*").alias("n")).collect()}
    assert counts == {0: 37, 1: 37, 2: 37}
    for lab in (1, 2):
        orig = {r["id"] for r in df.filter(F.col("lab") == lab).collect()}
        got = {r["id"] for r in out.filter(F.col("lab") == lab).collect()}
        assert orig == got  # draws duplicate originals, never invent ids
    out7 = SA.oversample_with_replacement(df.repartition(7), "lab", seed=3, exact=True)
    c7 = {r["lab"]: r["n"] for r in out7.groupBy("lab").agg(F.count("*").alias("n")).collect()}
    assert c7 == {0: 37, 1: 37, 2: 37}


def test_smote_empty_minority_raises(spark):
    import pytest

    df = _toy(spark, n_pos=3, n_neg=5)
    with pytest.raises(ValueError, match="smote"):
        SA.smote(df, "id", "arr", "lab", minority_value=99)


def test_salted_join_rejects_right_outer(spark):
    import pytest

    a = spark.createDataFrame([(1, "x")], "k int, v string")
    with pytest.raises(ValueError, match="salted_join"):
        from predicting_hospital_readmission_using_mimic_database_spark.operators.relational import salted_join

        salted_join(a, a, "k", how="full")


def test_balance_undersample_null_label_class(spark):
    rows = [(i, 0) for i in range(10)] + [(100 + i, 1) for i in range(4)] + [(200, None), (201, None)]
    df = spark.createDataFrame(rows, "id long, lab int")
    out = SA.balance_undersample(df, "lab", seed=1)
    counts = {r["lab"]: r["n"] for r in out.groupBy("lab").agg(F.count("*").alias("n")).collect()}
    assert counts == {0: 2, 1: 2, None: 2}  # NULL class participates fully


def test_native_brp_knn_matches_mllib_substrate(spark):
    """The DataFrame-native BRP kNN must find the same nearest neighbors the
    MLlib approxSimilarityJoin substrate finds (tiny corpus: both exact)."""
    from pyspark.ml.functions import array_to_vector
    from predicting_hospital_readmission_using_mimic_database_spark.operators.similarity import brp_knn_pairs

    rows = [(i, [float(i), float(i % 3)]) for i in range(12)]
    df = spark.createDataFrame(rows, "id long, arr array<double>")
    native = brp_knn_pairs(df, df, "id", "arr", dim=2, k=1, threshold=5.0,
                           bucket_length=2.0, n_tables=5, seed=7)
    vec = df.withColumn("__v", array_to_vector(F.col("arr")))
    mllib = SA._knn_pairs_mllib(vec, vec, "id", "__v", k=1, threshold=5.0,
                                bucket_length=2.0, num_hash_tables=5, seed=7)
    got_native = {(r["a_id"], r["b_id"]) for r in native.collect()}
    got_mllib = {(r["a_id"], r["b_id"]) for r in mllib.collect()}
    assert got_native == got_mllib and len(got_native) == 12


def test_quota_sample_caps_and_is_deterministic(spark):
    rows = [(i, "big") for i in range(40)] + [(100 + i, "small") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out1 = SA.quota_sample(df, "lang", 5, "doc_id", salt="s1")
    got1 = sorted((r["lang"], r["doc_id"]) for r in out1.collect())
    # cap respected; under-quota groups kept whole
    assert sum(1 for l, _ in got1 if l == "big") == 5
    assert sum(1 for l, _ in got1 if l == "small") == 3
    # deterministic: identical on re-run and independent of partitioning
    out2 = SA.quota_sample(df.repartition(7), "lang", 5, "doc_id", salt="s1")
    assert got1 == sorted((r["lang"], r["doc_id"]) for r in out2.collect())
    # salt changes the kept set (40 choose 5 — collision ~impossible)
    out3 = SA.quota_sample(df, "lang", 5, "doc_id", salt="other")
    assert got1 != sorted((r["lang"], r["doc_id"]) for r in out3.collect())


def test_quota_sample_rank_column_exposed(spark):
    df = spark.createDataFrame([(i, "g") for i in range(10)], "doc_id long, lang string")
    out = SA.quota_sample(df, "lang", 4, "doc_id", out_rank="r")
    ranks = sorted(r["r"] for r in out.collect())
    assert ranks == [1, 2, 3, 4]


def test_mixture_sample_quotas_and_determinism(spark):
    rows = (
        [(i, "web") for i in range(60)]
        + [(100 + i, "code") for i in range(30)]
        + [(200 + i, "wiki") for i in range(3)]
        + [(300 + i, "junk") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = SA.mixture_sample(
        df, "src", {"web": 0.5, "code": 0.3, "wiki": 0.2}, total=40,
        key_col="doc_id", salt="m",
    )
    got = sorted((r["src"], r["doc_id"]) for r in out.collect())
    by = {}
    for s, d in got:
        by[s] = by.get(s, 0) + 1
    # quotas: web 20, code 12; wiki under-quota passes whole; junk dropped
    assert by == {"web": 20, "code": 12, "wiki": 3}
    # partitioning-independent determinism
    out2 = SA.mixture_sample(
        df.repartition(7), "src", {"web": 0.5, "code": 0.3, "wiki": 0.2},
        total=40, key_col="doc_id", salt="m",
    )
    assert got == sorted((r["src"], r["doc_id"]) for r in out2.collect())


def test_mixture_sample_integer_group_col(spark):
    """Quota frame is typed from df's group column — an int source id
    must join (the old hardcoded 'string' schema broke or coerced)."""
    rows = [(i, 1) for i in range(40)] + [(100 + i, 2) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, src_id int")
    out = SA.mixture_sample(
        df, "src_id", {1: 0.75, 2: 0.25}, total=20, key_col="doc_id", salt="t"
    )
    by = {}
    for r in out.collect():
        by[r["src_id"]] = by.get(r["src_id"], 0) + 1
    assert by == {1: 15, 2: 5}


def test_stratified_hash_split_guarantees_classes(spark):
    # 7-row minority: Bernoulli splits frequently empty its test side;
    # the hash split must never
    rows = [(i, 0) for i in range(40)] + [(100 + i, 1) for i in range(7)]
    df = spark.createDataFrame(rows, "user_id long, y int")
    train, test = SA.stratified_hash_split(df, "y", "user_id", 0.2)
    tr = {r["y"]: r["n"] for r in train.groupBy("y").agg(F.count("*").alias("n")).collect()}
    te = {r["y"]: r["n"] for r in test.groupBy("y").agg(F.count("*").alias("n")).collect()}
    assert te == {0: 8, 1: 1} and tr == {0: 32, 1: 6}
    # deterministic + partition-independent
    tr2, te2 = SA.stratified_hash_split(df.repartition(5), "y", "user_id", 0.2)
    assert sorted(r["user_id"] for r in te2.collect()) == sorted(
        r["user_id"] for r in test.collect()
    )
    # single-row class stays in train
    df1 = spark.createDataFrame([(1, 0), (2, 0), (3, 0), (9, 1)], "user_id long, y int")
    tr1, te1 = SA.stratified_hash_split(df1, "y", "user_id", 0.5)
    assert te1.filter(F.col("y") == 1).count() == 0
    assert tr1.filter(F.col("y") == 1).count() == 1


def test_stratified_hash_split_big_class_map_only(spark):
    """Above the exact_below cutoff a class must split by map-only hash
    threshold (~frac of rows in test) with deterministic membership."""
    rows = [(i, 0) for i in range(400)] + [(1000 + i, 1) for i in range(5)]
    df = spark.createDataFrame(rows, "user_id long, y int")
    train, test = SA.stratified_hash_split(df, "y", "user_id", 0.2, exact_below=100)
    n_test0 = test.filter(F.col("y") == 0).count()
    # binomial around 80 — wide bounds, deterministic given the salt
    assert 40 <= n_test0 <= 120
    # the small class still gets the exact clamped quota
    assert test.filter(F.col("y") == 1).count() == 1
    # total partition: nothing lost or duplicated
    assert train.count() + test.count() == 405
    # determinism across partitionings
    tr2, te2 = SA.stratified_hash_split(df.repartition(7), "y", "user_id", 0.2, exact_below=100)
    assert sorted(r["user_id"] for r in te2.collect()) == sorted(
        r["user_id"] for r in test.collect()
    )


def test_quota_prefilter_keeps_identical_set(spark):
    """The hash-threshold prefilter must not change the kept set —
    the n smallest hashes all survive any threshold admitting >= n."""
    rows = [(i, "big") for i in range(500)] + [(10_000 + i, "tiny") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    plain = sorted(
        r["doc_id"] for r in SA.quota_sample(df, "lang", 10, "doc_id", salt="s",
                                             prefilter_above=None).collect()
    )
    guarded = sorted(
        r["doc_id"] for r in SA.quota_sample(df, "lang", 10, "doc_id", salt="s",
                                             prefilter_above=100).collect()
    )
    assert plain == guarded and len(plain) == 14


def test_mixture_prefilter_keeps_identical_set(spark):
    rows = [(i, "en") for i in range(400)] + [(5_000 + i, "de") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kw = dict(group_col="lang", weights={"en": 0.7, "de": 0.3}, total=50,
              key_col="doc_id", salt="m")
    plain = sorted((r["lang"], r["doc_id"]) for r in SA.mixture_sample(df, prefilter_above=None, **kw).collect())
    guarded = sorted((r["lang"], r["doc_id"]) for r in SA.mixture_sample(df, prefilter_above=50, **kw).collect())
    assert plain == guarded


def test_weighted_priority_sample_matches_local_reference(spark):
    import hashlib
    import math

    rows = [(i, float(1 + (i * 7) % 50)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w double")
    from predicting_hospital_readmission_using_mimic_database_spark.operators.sampling import (
        weighted_priority_sample,
    )

    got = {
        r["id"]: r["rank"]
        for r in weighted_priority_sample(df, "id", "w", n=20).collect()
    }
    # local A-ES reference with the same md5-hash uniforms
    pri = []
    for i, w in rows:
        v = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        u = (v + 0.5) / 2**32
        pri.append((math.log(u) / w, i))
    want = {
        i: rank + 1
        for rank, (_, i) in enumerate(sorted(pri, reverse=True)[:20])
    }
    assert got == want


def test_weighted_priority_sample_zero_weight_never_drawn(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 5.0)], "id long, w double"
    )
    from predicting_hospital_readmission_using_mimic_database_spark.operators.sampling import (
        weighted_priority_sample,
    )

    out = [r["id"] for r in weighted_priority_sample(df, "id", "w", n=10).collect()]
    assert out == [3]


def test_cluster_balanced_sample_quota_and_determinism(spark):
    """Every cell keeps exactly min(per_cluster, |cell|); the kept set is
    partitioning-independent (salted md5 rank) and identical vectors
    co-cluster so a dense planted clump can't exceed its quota."""
    import numpy as np
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.operators.sampling import (
        cluster_balanced_sample,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(size=(30, 8))
    rows = [(i, [float(v) for v in base[i]]) for i in range(30)]
    # dense clump: 20 copies of vector 0 — one semantic region
    rows += [(100 + j, [float(v) for v in base[0]]) for j in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cluster_balanced_sample(
        emb, "vec_id", "embedding", n_clusters=5, per_cluster=4
    ).cache()
    per_cell = (
        out.groupBy("cell")
        .agg(
            F.count("*").alias("size"),
            F.sum(F.col("kept").cast("int")).alias("kept"),
        )
        .collect()
    )
    for r in per_cell:
        assert r["kept"] == min(4, r["size"])
    # the clump (21 identical vectors incl. the original) shares a cell
    clump = out.filter(F.col("vec_id").isin([0] + [100 + j for j in range(20)]))
    assert clump.select("cell").distinct().count() == 1
    assert clump.filter("kept").count() <= 4
    # repartitioning must not change the kept set
    kept1 = {r["vec_id"] for r in out.filter("kept").collect()}
    out2 = cluster_balanced_sample(
        emb.repartition(7), "vec_id", "embedding", n_clusters=5, per_cluster=4
    )
    kept2 = {r["vec_id"] for r in out2.filter("kept").collect()}
    assert kept1 == kept2
    out.unpersist()


def test_quota_sample_prefilter_no_driver_collect(spark, monkeypatch):
    """VERDICT r6 #4: with a constant per-group quota (the per-domain-cap
    shape where group cardinality is unbounded) the prefilter thresholds
    must be join-computed — ZERO driver collect of a per-group dict —
    and the kept set must equal the unprefiltered rank exactly."""
    import pyspark.sql.functions as F
    from pyspark.sql import DataFrame

    from predicting_hospital_readmission_using_mimic_database_spark.operators.sampling import quota_sample

    df = spark.range(60_000).select(
        (F.col("id") % 20_000).alias("g"), F.col("id").alias("key")
    )

    def boom(self):  # any driver materialization during planning = fail
        raise AssertionError("quota_sample collected to the driver")

    monkeypatch.setattr(DataFrame, "collect", boom)
    out = quota_sample(df, "g", 2, "key", salt="z", prefilter_above=2)
    monkeypatch.undo()
    kept = {(r["g"], r["key"]) for r in out.collect()}
    ref = {
        (r["g"], r["key"])
        for r in quota_sample(df, "g", 2, "key", salt="z", prefilter_above=None).collect()
    }
    assert kept == ref
    assert len(kept) == 40_000  # 20k groups x quota 2 (groups of 3)


def test_bounded_fit_frame_no_global_sort(spark):
    """The centroid-fit sample selection must never range-sort the full
    corpus (the round-6 scale nit): above the cap it is a map-only
    md5-threshold prefilter + TakeOrderedAndProject over the bounded
    survivors — zero Exchange(rangepartitioning) in the plan — and the
    selected set is the exact cap-smallest (hash, id) rows, identical on
    any partitioning."""
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.operators.sampling import (
        _bounded_fit_frame,
    )

    df = spark.range(500).select(
        F.col("id").alias("vec_id"), F.array(F.col("id").cast("double")).alias("__v")
    )
    fit = _bounded_fit_frame(df, "vec_id", cap=20, salt="t")
    plan = fit._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan  # no global sort of the corpus
    ids1 = [r["vec_id"] for r in fit.collect()]
    assert len(ids1) == 20
    fit2 = _bounded_fit_frame(df.repartition(13), "vec_id", cap=20, salt="t")
    assert [r["vec_id"] for r in fit2.collect()] == ids1
    # within-cap corpora come back whole, id-ordered
    small = _bounded_fit_frame(df, "vec_id", cap=1000, salt="t")
    assert [r["vec_id"] for r in small.collect()] == list(range(500))


def test_cluster_balanced_sample_explicit_centroids(spark):
    """centroids= skips the fit: assignment against a scaled-basis
    codebook is argmax of the matching coordinate, so the cell per row
    is closed-form checkable."""
    from predicting_hospital_readmission_using_mimic_database_spark.operators.sampling import (
        cluster_balanced_sample,
    )

    rows = [
        (0, [9.0, 1.0, 0.0]),
        (1, [0.0, 5.0, 1.0]),
        (2, [1.0, 0.0, 7.0]),
        (3, [8.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[4.0, 0.0, 0.0], [0.0, 4.0, 0.0], [0.0, 0.0, 4.0]]
    out = cluster_balanced_sample(
        emb, "vec_id", "embedding", n_clusters=3, per_cluster=1, centroids=cents
    )
    got = {r["vec_id"]: (r["cell"], r["kept"]) for r in out.collect()}
    assert got[0][0] == 0 and got[3][0] == 0
    assert got[1][0] == 1 and got[2][0] == 2
    assert got[1][1] and got[2][1]  # alone in their cells
    assert sum(1 for c, k in got.values() if c == 0 and k) == 1  # quota 1

#!/usr/bin/env python
"""Benchmark harness — times the engine's headline queries at sf0.1.

Prints exactly ONE JSON line on stdout:

    {"metric": "headline_total_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Everything else (Spark logs, progress) goes to stderr. Each query is
forced end-to-end with the ``noop`` sink (full materialization on the
executors, no driver collect, no disk write) so the measured time is the
real plan execution, not an action that lets Catalyst skip work.

Env knobs:
    SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    local[] parallelism (default 32)
    BENCH_QUERIES       comma-separated override of the query set
    BENCH_REPEAT        runs per query; reports the per-query MEDIAN
                        (default 3 so the SHIPPED artifact is a median —
                        co-tenant contention must not masquerade as a
                        regression; set 1 for quick local iteration)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: every family of SURVEY §2 exercised at least once, plus the
# beyond-reference LLM-pipeline operators. Names missing from the registry
# are skipped (so this file never blocks a round on a half-landed module).
HEADLINE = [
    "flagship_readmit_30d",   # windows + label + agg, one plan
    "p9_dropna",              # window + filter
    "j1_join_inner",          # fact-fact equi join
    "j2_join_dims_broadcast", # broadcast dims
    "j4_join_left_composite", # composite-key self join
    "w5_last_per_group",      # dedup window
    "a7_collect_list_sorted", # collect-to-list agg
    "a8_pivot_count",         # pivot
    "a11_histogram",          # binning agg
    "c3_range_recode",        # chained CASE
    "u1_union_all",           # union + filters
    # text pipeline (lands round 2)
    "t13_clean_text_tokens",
    "t14_count_vectorize",
    # ML + metrics (lands round 2)
    "m3_rf_train_predict",
    "m7_grid_cv",            # BASELINE.md's only wall-clock metric is the CV grid
    "e2e_full_pipeline",     # the reference's whole workflow, one composition
    "e5_threshold_metrics",
    "e2_auc",
    # LLM-data-pipeline (lands round 2)
    "d1_dedup_exact",
    "d2_dedup_minhash_lsh",
    "d4_ngram_jaccard",
    "n1_knn_bruteforce",
    "n2_knn_lsh",
    "x1_text_stats",
    "x3_fingerprint",
    # feature scoring + rebalancing
    "m8_mutual_info",
    "u4_balance_undersample",
    "e7_threshold_table",
    # the two slowest compositions, tracked honestly (VERDICT r2 #9)
    "u6_smote",
    "e8_strategy_comparison",
    # newest scale-path operators (VERDICT r3 #7); n4 is benched SPLIT
    # into n4_build / n4_probe below (VERDICT r4 #4) — the serving path's
    # latency is the tracked number, not build+serve fused
    "d6_dup_clusters",        # iterative label propagation
    # round-4 additions
    "j9_asof_join",           # union-window as-of merge (no range join)
    "t16_tfidf",              # two-shuffle TF-IDF with broadcast doc count
    "d7_decontaminate",       # train-vs-eval shingle contamination
    "j10_band_join",          # keyless range join via grid buckets (no BNLJ)
    "w10_percent_rank_global",  # global rank stats without a 1-task window
    "u10_time_split",         # leakage-free 80/10/10 time split
    "x6_lm_quality",          # corpus-unigram LM doc scoring
    "a16_grouping_sets",      # two marginals, one shuffle
    "x7_mixture_sample",      # weighted dataset mixing
    "n5_knn_join_exact",      # broadcast-matrix exact kNN join kernel
    "w12_session_funnel",     # sessionize + conditional aggs, shared shuffle
    "t17_bigram_counts",      # plan-side n-gram explode + count
    # round-5: a streaming entry gets a tracked wall-clock like the rest
    "st4_stream_window_counts",  # watermarked tumbling windows, availableNow
    "x10_domain_stats",       # URL-domain explode + shared-exchange aggs
    "x11_gopher_flags",       # map-only quality verdict at scan speed
    "x12_repetition_stats",   # Gopher repetition signals, gram-keyed shuffles
    "x13_chunk_text",         # sliding-window RAG chunking, map-only
    "d8_line_dedup",          # corpus-level CCNet line dedup
    "d12_substring_dedup",    # EXACTSUBSTR duplicated-span removal (r8)
    "j13_interval_join",      # variable-width interval containment, no BNLJ
    "m12_standard_scale",     # fit-small/transform-wide feature scaling
    "j14_fuzzy_join",         # deletion-neighborhood edit-distance linkage
    "x14_weighted_sample",    # Efraimidis-Spirakis weighted draw
    "w13_rolling_median",     # bounded-frame exact median, one window
    "s8_json_roundtrip",      # JSON sink + schema-first source round-trip
    "t19_feature_hashing",    # fit-free hashing-trick features
    "t20_bpe_pair_counts",    # BPE training kernel over the vocab frame
    "t21_bpe_encode",         # serving-side greedy BPE segmentation (r8)
    "g1_pagerank",            # 5 power iterations, per-iteration checkpoint
    "w14_ohlc_bars",          # single-shuffle OHLC time bars
    # round-6 additions
    "d9_dup_clusters_star",   # two-phase star-contraction clustering
    "d10_semdedup",           # cluster-then-prune semantic dedup
    "s9_table_merge",         # ACID bucketed copy-on-write MERGE commit
    "s10_table_time_travel",  # versioned snapshot reads off the commit log
    "s11_table_skipping",     # footer-stats file pruning read
    "s12_table_zorder",       # Morton-curve OPTIMIZE + 2-D pruned read
    "s13_table_changes",      # delta-scoped change-data-feed read
    "s14_incremental_view",   # CDC-fed materialized-view fold
    "w15_resample_ffill",     # regular-grid resample + gap fill
    "x16_curation_funnel",    # one-scan lang/quality/dedup/quota funnel
    "n6_contrastive_pairs",   # shuffle-free pair construction
    "m13_psi_drift",          # binned drift monitor, one shuffle
    "e9_calibration",         # reliability diagram, one shuffle
    "d11_image_dedup",        # perceptual-hash banded image dedup
    "j15_bucketed_join",      # zero-exchange co-located SMB join
    # round-7 additions
    "s15_delta_read",         # _delta_log interop snapshot read
    "s16_delta_export",       # zero-copy delta export + read-through
    "s17_pyds_snapshot_read", # python-datasource snapshot scan
    "s18_iceberg_roundtrip",  # iceberg export + manifest-replay read
    "st12_stream_table_changes",  # CDC as a streaming source
    "u12_cluster_balanced",   # codebook-balanced diversity sampling
    # round-8 additions
    "s19_hudi_read",          # hudi timeline snapshot read
    "s20_iceberg_pos_delete", # iceberg v2 positional-delete read
    "s21_delta_column_mapping",   # physical->logical name-mode read
    "s22_delta_deletion_vectors", # roaring-bitmap row deletes applied
    "s23_iceberg_eq_delete",      # sequence-ordered equality deletes
    "s24_delta_v2_checkpoint",    # v2 manifest + sidecar replay
    "st14_stream_delta_tail",     # foreign-delta streaming source
    "s25_hudi_incremental",       # hudi change-feed incremental read
    "s26_iceberg_transform_prune",  # year/truncate transform pruning (r8)
    "s27_hudi_mor_read",          # hudi merge-on-read log merge (r8)
    "s28_delta_cdf",              # delta change-data-feed read (r8)
    "st17_stream_delta_cdf",      # delta CDF as a streaming source (r8)
    "st15_stream_hudi_tail",      # hudi streaming source
    "st16_stream_iceberg_tail",   # iceberg append-scan streaming source
    "s29_hudi_mor_delete",        # MOR delete-block tombstone merge (r9)
    "s30_iceberg_files_meta",     # inspection metadata tables (r9)
    "s31_hudi_mor_incremental",   # MOR incremental, group-pruned (r9)
    "s32_delta_stats_skip",       # stats-bounds data skipping (r9)
    "s33_iceberg_incremental",    # snapshot-window append scan (r9)
    "s34_hudi_event_time_merge",  # precombine merge ordering (r9)
    "s35_hudi_col_stats_skip",    # metadata-table col-stats pruning (r9)
    "s36_hudi_bloom_lookup",      # bloom-index point lookup (r9)
    "s37_iceberg_v3_dv",          # iceberg v3 deletion vectors (r9)
    "s38_iceberg_schema_evolution",  # field-id vintage resolution (r9)
    "s39_delta_type_widening",    # native upcast over narrow files (r9)
    "s40_hudi_export",            # COW publish + carry-forward (r9)
    "st18_stream_hudi_mor",       # MOR streaming source (r9)
    "st19_stream_delta_idmap",    # id-mode mapping stream (r9)
    "s41_iceberg_nested_evolution",  # struct-internal vintage scan (r10)
    "s42_hudi_cdc_infer",         # CDC images by slice inference (r10)
    "s43_hudi_partitioned_export",  # hive-style partitioned publish (r10)
    "s44_iceberg_v3_defaults",    # v3 initial-default fill + row lineage (r10)
    "st20_stream_hudi_cdc",       # per-commit CDC images, group-local diff (r10)
    "s45_iceberg_row_lineage",    # v3 _row_id inheritance surfaced (r10)
    "s46_delta_row_tracking",     # rowTracking baseRowId lineage (r10)
    "s47_iceberg_changelog",      # file-diff insert/delete feed (r10)
    "st21_stream_iceberg_changelog",  # changelog as a stream (r10)
    "s48_csv_roundtrip",          # CSV sink+source, quoting/NULL exact (r10)
    "st22_stream_nested_evolution",  # mid-stream vintage projection (r11)
    "s49_iceberg_changelog_dv_replay",  # delete replay liveness algebra (r11)
    "s50_delta_export_cdf",       # exact change files on merge export (r11)
    "st23_stream_iceberg_row_lineage",  # v3 lineage through the stream (r11)
    "st24_stream_delta_row_tracking",   # rowTracking through the stream (r11)
    "s51_hudi_mor_export",        # log-append MOR publish (r11)
    "s52_hudi_mor_compaction",    # logged-group compaction lifecycle (r11)
    "s53_hudi_mor_partitioned",   # partitioned MOR, cross-partition moves (r11)
    "s54_iceberg_nested_eq_delete",  # dotted-path equality deletes (r11)
    "s55_iceberg_export_bounds",  # Appendix-D bounds on export (r11)
    "s56_hudi_mdt_synced_export",  # incremental MDT sync on export (r11)
    "s57_iceberg_expire_snapshots",  # retention expiry + orphan GC (r11)
    "s58_hudi_clean",  # KEEP_LATEST_COMMITS slice cleaning (r11)
    "s59_delta_log_truncate",  # checkpoint-bounded log retention (r11)
    "s60_hudi_clustering",  # replacecommit sort+zorder clustering (r11)
    "s61_iceberg_rewrite_manifests",  # manifest compaction (r11)
    "s62_delta_optimize",  # log-level OPTIMIZE + ZORDER (r11)
    "s63_iceberg_rewrite_datafiles",  # rewriteDataFiles + delete consumption (r11)
    "s64_iceberg_partition_evolution",  # partitioned export + spec evolution (r11)
    "s65_iceberg_orphan_files",  # removeOrphanFiles GC (r11)
    "s66_delta_vacuum",  # retention-horizon data GC (r11)
    "s67_delta_liquid_clustering",  # declaration-driven OPTIMIZE (r11)
    # round-12: async compaction states, archival, V2 checkpoints,
    # stream-across-maintenance, restore/rollback. st26 (the Iceberg
    # stream-across-maintenance twin) is DELIBERATELY not benched: its
    # fixture (4 exports + rewriteDataFiles + 3 checkpointed drains)
    # runs ~40s at sf0.01 per repetition — the oracle gate covers it;
    # benching it would dominate the headline wall-clock with fixture
    # build time, not operator time.
    "s68_hudi_async_compaction",
    "s69_hudi_timeline_archival",
    "s70_delta_v2_checkpoint",
    "st25_stream_across_maintenance",
    "s71_delta_restore",
    "s72_hudi_savepoint_restore",
    "s73_delta_shallow_clone",
    "s74_hudi_rollback",
    "s75_delta_schema_evolution_write",
    # round-13: WAP, writer constraints, pending clustering, BM25,
    # constrained-sink stream
    "s76_iceberg_wap",
    "s77_delta_constraints",
    "s78_hudi_pending_clustering",
    "x17_bm25_topk",
    "st27_stream_into_constrained",
    "s79_delta_identity",
    "st28_stream_identity_sink",
    "x18_hybrid_rerank",
    # round-14: row-level DML (Delta DVs + UPDATE + MERGE/CDF,
    # Iceberg row-delta MERGE/DELETE), streaming WAP, streaming
    # CDC-apply, IVF-PQ ANN
    "s80_delta_delete_dv",
    "s81_delta_merge_cdf",
    "s82_iceberg_merge",
    "s83_delta_update_dv",
    "s84_iceberg_delete",
    "s85_iceberg_update",
    "s86_hudi_delete",
    "s87_hudi_update",
    "st29_stream_iceberg_wap",
    "st30_stream_cdc_apply",
    "n7_knn_ivf_pq",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from predicting_hospital_readmission_using_mimic_database_spark.session import get_spark
    from predicting_hospital_readmission_using_mimic_database_spark.registry import load_all

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # Warm-up: pay JVM/session/codegen startup once, outside the timings —
    # the numbers below measure query execution, not Spark boot.
    from predicting_hospital_readmission_using_mimic_database_spark.sources.io import read_table

    t_warm = time.perf_counter()
    for t in ("events", "lineitem", "documents", "embeddings"):
        read_table(spark, sf_dir, t).limit(1).count()
    # prime the rest of the machinery the first heavy query would
    # otherwise absorb: the Python worker pool (Arrow/pandas import per
    # worker), a shuffle, and a window
    from pyspark.sql import Window as _W
    import pyspark.sql.functions as _F

    wdf = spark.range(1000).withColumn("g", _F.col("id") % 7)
    wdf.mapInPandas(lambda it: it, "id long, g long").groupBy("g").count().withColumn(
        "r", _F.row_number().over(_W.partitionBy("g").orderBy("count"))
    ).write.format("noop").mode("overwrite").save()
    # ...and the Structured Streaming machinery (microbatch engine,
    # checkpoint WAL, foreachBatch callback path): measured ~4.5 s of
    # one-time per-session init that the FIRST streaming entry would
    # otherwise absorb into its timing (guide §1 — pay startup outside
    # the timed region, same rationale as the worker-pool priming above)
    from predicting_hospital_readmission_using_mimic_database_spark.session import (
        warm_streaming,
    )

    warm_streaming(spark)
    print(f"[bench] warmup: {time.perf_counter()-t_warm:.1f}s", file=sys.stderr)

    names_env = os.environ.get("BENCH_QUERIES")
    raw = [n.strip() for n in (names_env.split(",") if names_env else HEADLINE)]
    raw = [n for n in raw if n]
    # n4_build / n4_probe are bench-level PSEUDO-names (the phase split
    # below), not registry entries — any requested name starting with
    # "n4" arms the split. Every other unknown name is a hard error: a
    # typo must not silently bench nothing (BENCH_r05 shipped n4_build
    # rows that a rename would have dropped without a sound).
    want_n4 = (not names_env) or any(n.startswith("n4") for n in raw)
    want_t20b = (not names_env) or any(n.startswith("t20b") for n in raw)
    want_t21b = (not names_env) or any(n.startswith("t21b") for n in raw)
    unknown = [
        n for n in raw
        if n not in registry
        and not n.startswith("n4")
        and not n.startswith("t20b")
        and not n.startswith("t21b")
    ]
    if unknown:
        raise SystemExit(f"[bench] unknown BENCH_QUERIES names: {unknown}")
    names = [n for n in raw if n in registry]

    repeat = max(1, int(os.environ.get("BENCH_REPEAT", "3")))

    def run_once(name: str) -> float:
        """One timed end-to-end run; raises on failure."""
        t0 = time.perf_counter()
        df = registry[name].fn(spark, sf_dir)
        # noop sink: full distributed execution, nothing leaves executors
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    timings: dict[str, float] = {}
    retried: list[str] = []
    for name in names:
        runs: list[float] = []
        for i in range(repeat):
            # one retry per run: a transient executor hiccup (co-tenant
            # memory pressure) must not record a working operator as
            # broken; a real failure still fails twice and reports -1.
            # The retry starts COLD (cache cleared): entries that cache
            # aggressively would otherwise hand the second attempt warm
            # intermediates and under-report.
            if i > 0:
                # Spark's cache manager matches by logical plan, so a
                # repeat of the same entry would silently reuse any cache
                # the previous run left behind — clear to keep every
                # repeat's data path cold
                spark.catalog.clearCache()
            for attempt in (1, 2):
                try:
                    runs.append(run_once(name))
                    break
                except Exception as e:  # a broken query must not kill the bench
                    print(f"[bench] {name} FAILED (attempt {attempt}): {e}", file=sys.stderr)
                    if attempt == 1:
                        retried.append(name)
                        spark.catalog.clearCache()
        if runs:
            runs.sort()
            timings[name] = runs[len(runs) // 2]  # median
            shown = ",".join(f"{r}" for r in runs)
            print(f"[bench] {name}: {timings[name]}s ({shown})", file=sys.stderr)
        else:
            timings[name] = -1.0

    # --- n4 split: IVF index BUILD (once per session — KMeans sample fit
    # + cell-partitioned parquet write) vs the partition-pruned PROBE
    # (median of `repeat`, the real serving latency). The fused
    # n4_knn_ivf_indexed entry remains in the registry for correctness;
    # the bench tracks the two phases separately (VERDICT r4 #4).
    if want_n4:
        import shutil
        import tempfile

        from predicting_hospital_readmission_using_mimic_database_spark.operators import similarity as SI
        from predicting_hospital_readmission_using_mimic_database_spark.qdefs_llm import _PROBE, _emb

        tmp = tempfile.mkdtemp(prefix="bench_n4_")
        try:
            e = _emb(spark, sf_dir)
            t0 = time.perf_counter()
            cents, radii = SI.build_ivf_index(
                e, "vec_id", "embedding", f"{tmp}/ivf", n_cells=16, seed=42
            )
            timings["n4_build"] = round(time.perf_counter() - t0, 3)
            print(f"[bench] n4_build: {timings['n4_build']}s", file=sys.stderr)
            runs = []
            for _ in range(repeat):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                SI.topk_ivf_indexed(
                    spark, f"{tmp}/ivf", cents, "vec_id", "embedding",
                    _PROBE, k=10, n_probe=8, radii=radii,
                ).write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
            runs.sort()
            timings["n4_probe"] = runs[len(runs) // 2]
            shown = ",".join(f"{r}" for r in runs)
            print(f"[bench] n4_probe: {timings['n4_probe']}s ({shown})", file=sys.stderr)
        except Exception as e:  # a broken phase must not kill the bench
            print(f"[bench] n4 split FAILED: {e}", file=sys.stderr)
            timings.setdefault("n4_build", -1.0)
            timings.setdefault("n4_probe", -1.0)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    # --- t20b: BPE tokenizer training END-TO-END (VERDICT r5 #5) — the
    # iterative-job regime where per-merge driver/job overhead dominates,
    # i.e. the number a tokenizer-training user actually feels (t20
    # benches only the single pair-count kernel). One run (the loop is
    # internally ~100 jobs; repeat-median would triple a long row for
    # little extra signal); merges-per-second is the tracked shape.
    if want_t20b:
        from predicting_hospital_readmission_using_mimic_database_spark.ml import bpe as _bpe
        from predicting_hospital_readmission_using_mimic_database_spark.sources.io import (
            read_table as _rt,
        )

        try:
            spark.catalog.clearCache()
            docs = _rt(spark, sf_dir, "documents")
            # default path: fit-small fast loop (what a user gets)
            t0 = time.perf_counter()
            merges, _vocab = _bpe.bpe_train(docs, "text", n_merges=200, min_count=2)
            dt = round(time.perf_counter() - t0, 3)
            timings["t20b_bpe_train"] = dt
            per = round(dt / max(len(merges), 1), 3)
            print(
                f"[bench] t20b_bpe_train: {dt}s "
                f"({len(merges)} merges, {per}s/merge)",
                file=sys.stderr,
            )
            # forced-distributed twin: the iterative-job regime tracked
            # across rounds (batched merge loop, local_below=0)
            bpe_stats: dict = {}
            t0 = time.perf_counter()
            merges_d, _vd = _bpe.bpe_train(
                docs, "text", n_merges=200, min_count=2, local_below=0,
                stats=bpe_stats,
            )
            dt_d = round(time.perf_counter() - t0, 3)
            assert merges_d == merges, "distributed/local merge sequences differ"
            timings["t20b_dist_bpe_train"] = dt_d
            per_d = round(dt_d / max(len(merges_d), 1), 3)
            print(
                f"[bench] t20b_dist_bpe_train: {dt_d}s "
                f"({len(merges_d)} merges, {per_d}s/merge, "
                f"{bpe_stats.get('jobs')} jobs, "
                f"mean batch {bpe_stats.get('mean_batch')}, "
                f"window {bpe_stats.get('window_final')})",
                file=sys.stderr,
            )
        except Exception as e:
            print(f"[bench] t20b_bpe_train FAILED: {e}", file=sys.stderr)
            timings.setdefault("t20b_bpe_train", -1.0)

    # --- t21b: BPE ENCODE over a LONG-TOKEN adversarial corpus
    # (VERDICT r8 #6) — one repeated character per doc under chained
    # self-merges, the shape that cliffs a rescan-per-merge greedy loop
    # quadratically (measured 15.5s/word at 16k chars vs 32ms for the
    # heap/linked-list encoder). t21 benches the normal-text serving
    # path; this row pins the adversary staying linear.
    if want_t21b:
        from pyspark.sql import functions as _F

        from predicting_hospital_readmission_using_mimic_database_spark.ml import bpe as _bpe2

        try:
            spark.catalog.clearCache()
            sym, longtok_merges = "a", []
            for _ in range(13):  # a+a, aa+aa, ... 8192-char symbols
                longtok_merges.append((sym, sym))
                sym += sym
            docs = spark.range(1024).select(
                _F.col("id"),
                _F.concat(
                    _F.lit("lead "), _F.lit("a" * 8000), _F.lit(" tail")
                ).alias("text"),
            )
            t0 = time.perf_counter()
            _bpe2.bpe_encode(docs, "id", "text", longtok_merges).write.format(
                "noop"
            ).mode("overwrite").save()
            timings["t21b_bpe_encode_longtok"] = round(
                time.perf_counter() - t0, 3
            )
            print(
                f"[bench] t21b_bpe_encode_longtok: "
                f"{timings['t21b_bpe_encode_longtok']}s "
                "(1024 docs x 8000-char token, 13 chained self-merges)",
                file=sys.stderr,
            )
        except Exception as e:
            print(f"[bench] t21b_bpe_encode_longtok FAILED: {e}", file=sys.stderr)
            timings.setdefault("t21b_bpe_encode_longtok", -1.0)

    ok = {k: v for k, v in timings.items() if v >= 0}
    out = {
        "metric": "headline_total_sec",
        "value": round(sum(ok.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if repeat > 1:
        out["repeat"] = repeat
    if retried:
        # timings recorded after an in-session retry (cache cleared, but
        # JVM/codegen warm) — flagged so they're distinguishable
        out["retried"] = sorted(set(retried))

    # --- noise canary: wall-clocks on this shared box swing 1.5-2x with
    # co-tenant load (BENCH_r07 was uniformly ~1.5x BENCH_r06 with zero
    # code changes). Re-run three never-touched sentinel queries at the
    # very END of the run and report the median ratio against their
    # PINNED sf0.1 medians (measured 2026-08-14, BENCH_REPEAT=5, fresh
    # warmed session) — a reader deflates the artifact by noise_factor
    # before calling anything a regression. Only emitted at sf0.1 (the
    # pins are sf-specific).
    NOISE_SENTINELS = {
        "p2_filter_isnull": 0.48,
        "a1_value_counts": 0.22,
        "w1_lead": 0.39,
    }
    if abs(sf - 0.1) < 1e-9:
        ratios = {}
        for name, pin in NOISE_SENTINELS.items():
            if name not in registry:
                continue
            runs = []
            for _ in range(3):
                spark.catalog.clearCache()
                try:
                    runs.append(run_once(name))
                except Exception as e:
                    print(f"[bench] canary {name} FAILED: {e}", file=sys.stderr)
            if runs:
                runs.sort()
                ratios[name] = round(runs[len(runs) // 2] / pin, 2)
        if ratios:
            vals = sorted(ratios.values())
            out["noise_factor"] = vals[len(vals) // 2]
            out["noise_sentinels"] = ratios
            print(
                f"[bench] noise_factor {out['noise_factor']} {ratios}",
                file=sys.stderr,
            )
    # --- persist the COMPLETE dict: the driver artifact's `tail` field
    # truncates to the last ~70 of ~200 rows, silently dropping the
    # relational/ML families from round-over-round diffs. Full-set
    # sf0.1 runs write the same one-line JSON to BENCH_full_r{N}.json
    # (N = latest existing driver BENCH_r{N} + 1) so every row survives
    # in a tracked file; BENCH_FULL_OUT overrides the path.
    if not names_env and abs(sf - 0.1) < 1e-9:
        here = os.path.dirname(os.path.abspath(__file__))
        ns = [
            int(m.group(1))
            for f in os.listdir(here)
            if (m := re.match(r"BENCH_r(\d+)\.json$", f))
        ]
        n = (max(ns) + 1) if ns else 0
        path = os.environ.get("BENCH_FULL_OUT") or os.path.join(
            here, f"BENCH_full_r{n:02d}.json"
        )
        try:
            with open(path, "w") as f:
                f.write(json.dumps(out) + "\n")
            print(f"[bench] full dict -> {path}", file=sys.stderr)
        except OSError as e:
            print(f"[bench] full-dict write failed: {e}", file=sys.stderr)
    # The stdout line must survive the driver's bounded tail capture
    # (rounds 9-13 each lost the round-over-round comparison to a
    # truncated capture): compact separators and 2-decimal per-query
    # times cut ~15% of the line; 10 ms precision is far inside this
    # box's run-to-run noise (same-code driver runs swing 0.5-2x per
    # query). Full 1 ms precision persists in BENCH_full_r{N}.json
    # above. No query entry is dropped or renamed — the driver
    # contract keeps every name.
    slim = dict(out)
    slim["queries"] = {
        k: (round(v, 2) if v >= 0 else v) for k, v in timings.items()
    }
    slim["value"] = round(sum(v for v in slim["queries"].values() if v >= 0), 2)
    print(json.dumps(slim, separators=(",", ":")))


if __name__ == "__main__":
    main()

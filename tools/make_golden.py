"""Generate golden-file oracles for the non-SQL-expressible queries.

Runs the INDEPENDENT pandas/numpy implementations in
``sits_classification_ray/oracle/golden.py`` over each testdata scale
factor and stores the expected outputs as parquet under
``/root/repo/golden/``. The oracle SQL for these queries reads the
stored parquet and dispatches on ``count(*) FROM events`` (unique per
sf: 1000 / 10000 / 100000).

Usage: python tools/make_golden.py [sf_dir ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sits_classification_ray.oracle import golden  # noqa: E402
from sits_classification_ray.pipelines.queries import CRAWL_PREFIX  # noqa: E402

GOLDEN_DIR = Path(__file__).resolve().parent.parent / "golden"

#: events-count → file tag (how the oracle SQL dispatches)
TAGS = {1000: "sf0001", 10000: "sf001", 100000: "sf01"}


def make_for(sf_dir: str, only: set[str] | None = None) -> None:
    con = duckdb.connect()
    for t in ["events", "documents", "embeddings"]:
        con.sql(f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_events = con.sql("SELECT count(*) FROM events").fetchone()[0]
    tag = TAGS[n_events]
    GOLDEN_DIR.mkdir(exist_ok=True)

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    obs_long = con.sql(
        f"{CRAWL_PREFIX} SELECT url, warc_ts, metric, value "
        "FROM obs_long").df()
    obs = con.sql(f"{CRAWL_PREFIX} SELECT url, warc_ts, text_len "
                  "FROM obs").df()
    from sits_classification_ray.sources.synth import CRAWL_CTE
    crawl = con.sql(f"WITH {CRAWL_CTE} "
                    "SELECT url, warc_ts, html FROM crawl").df()

    jobs = {
        "langid_documents": lambda: golden.langid_documents(docs),
        "langid_confusion": lambda: golden.langid_confusion(docs),
        "simhash_documents": lambda: golden.simhash_documents(docs),
        "fingerprint_documents": lambda: golden.fingerprint_documents(docs),
        "minhash_near_dup_documents":
            lambda: golden.minhash_near_dup_documents(docs),
        "near_dup_clusters_documents":
            lambda: golden.near_dup_clusters_documents(docs),
        "near_dup_keep_one_documents":
            lambda: golden.near_dup_keep_one_documents(docs),
        "simhash_near_dup_documents":
            lambda: golden.simhash_near_dup_documents(docs),
        "winnowing_near_dup_documents":
            lambda: golden.winnowing_near_dup_documents(
                docs, k=12, w=8, min_shared=8, df_cap=32),
        "incremental_near_dup_documents":
            lambda: golden.incremental_near_dup_documents(docs),
        "ivf_topk": lambda: golden.ivf_topk(emb),
        "pca_projection_embeddings":
            lambda: golden.pca_projection_embeddings(emb),
        "logreg_fit_embeddings":
            lambda: golden.logreg_fit_embeddings(emb),
        "isotonic_calibration_nchars":
            lambda: golden.isotonic_calibration_nchars(docs),
        "mondrian_partitions_documents":
            lambda: golden.mondrian_partitions_documents(docs),
        "ledoit_wolf_embeddings":
            lambda: golden.ledoit_wolf_embeddings(emb),
        "fd_sketch_embeddings":
            lambda: golden.fd_sketch_embeddings(emb),
        "rff_kernel_embeddings":
            lambda: golden.rff_kernel_embeddings(emb),
        "margin_prune_embeddings":
            lambda: golden.margin_prune_embeddings(emb),
        "priority_sample_documents":
            lambda: golden.priority_sample_documents(docs),
        "mahalanobis_embeddings":
            lambda: golden.mahalanobis_embeddings(emb),
        "kcenter_select_embeddings":
            lambda: golden.kcenter_select_embeddings(emb),
        "gbdt_fit_embeddings":
            lambda: golden.gbdt_fit_embeddings(emb),
        "kcore_domains_crawl":
            lambda: golden.kcore_domains_crawl(crawl),
        "embedding_near_dup_ivf":
            lambda: golden.embedding_near_dup_ivf(emb),
        "stratified_sample_documents":
            lambda: golden.stratified_sample_documents(docs),
        "train_test_split_sizes":
            lambda: golden.train_test_split_sizes(len(docs)),
        "harmonic_daily": lambda: golden.harmonic_daily(obs_long),
        "lttb_downsample_crawl":
            lambda: golden.lttb_downsample_crawl(obs_long),
        "ewma_crawl": lambda: golden.ewma_crawl(obs_long),
        "holt_linear_crawl": lambda: golden.holt_linear_crawl(obs_long),
        "theta_forecast_crawl":
            lambda: golden.theta_forecast_crawl(obs_long),
        "spectral_residual_crawl":
            lambda: golden.spectral_residual_crawl(obs_long),
        "dp_counts_domains":
            lambda: golden.dp_counts_domains(obs),
        "croston_rate_crawl":
            lambda: golden.croston_rate_crawl(obs),
        "pelt_changepoints_crawl":
            lambda: golden.pelt_changepoints_crawl(obs_long),
        "wasserstein_weekly_crawl":
            lambda: golden.wasserstein_weekly_crawl(obs_long),
        "cdc_dedup_ratio_crawl":
            lambda: golden.cdc_dedup_ratio_crawl(crawl),
        "forecast_backtest_crawl":
            lambda: golden.forecast_backtest_crawl(obs_long),
        "cusum_crawl": lambda: golden.cusum_crawl(obs_long),
        "partition_extents_crawl":
            lambda: golden.partition_extents_crawl(obs),
        "bootstrap_ci_crawl":
            lambda: golden.bootstrap_ci_crawl(obs),
        "james_stein_domains":
            lambda: golden.james_stein_domains(obs),
        "dgim_change_count_crawl":
            lambda: golden.dgim_change_count_crawl(obs),
        "hilbert_layout_crawl":
            lambda: golden.hilbert_layout_crawl(obs, rows_per_file=200),
        "hll_distinct_urls_daily":
            lambda: golden.hll_distinct_urls_daily(obs),
        "hll_weekly_from_daily":
            lambda: golden.hll_weekly_from_daily(obs),
        "ams_f2_urls": lambda: golden.ams_f2_urls(obs),
        "hist_quantile_daily": lambda: golden.hist_quantile_daily(obs),
        "kmv_distinct_urls_daily":
            lambda: golden.kmv_distinct_urls_daily(obs),
        "cms_heavy_domains_crawl":
            lambda: golden.cms_heavy_domains_crawl(obs),
        "pagerank_domains_crawl":
            lambda: golden.pagerank_domains_crawl(crawl),
        "ppr_domains_crawl":
            lambda: golden.ppr_domains_crawl(crawl),
        "betweenness_domains_crawl":
            lambda: golden.betweenness_domains_crawl(crawl),
        "deepwalk_visits_crawl":
            lambda: golden.deepwalk_visits_crawl(crawl),
        "wl_colors_crawl":
            lambda: golden.wl_colors_crawl(crawl),
        "hits_domains_crawl":
            lambda: golden.hits_domains_crawl(crawl),
        "kmv_overlap_weeks": lambda: golden.kmv_overlap_weeks(obs),
        "gorilla_segments": lambda: golden.gorilla_segments(obs_long),
        "bloom_semi_join_documents":
            lambda: golden.bloom_semi_join_documents(docs, emb),
        "simhash_drift_crawl": lambda: golden.simhash_drift_crawl(
            con.sql(f"{CRAWL_PREFIX} SELECT url, warc_ts, text, text_len "
                    "FROM scr").df()),
        "canonical_urls_crawl": lambda: golden.canonical_urls_crawl(obs),
        "compression_signal_documents":
            lambda: golden.compression_signal_documents(docs),
        "pagerank_words_documents":
            lambda: golden.pagerank_words_documents(docs),
        "source_mixture_documents":
            lambda: golden.source_mixture_documents(docs),
        "kmeans_embeddings": lambda: golden.kmeans_embeddings(emb),
        "pq_topk_embeddings": lambda: golden.pq_topk_embeddings(emb),
        "bpe_merges_documents": lambda: golden.bpe_merges_documents(
            docs, min_count=2, max_vocab=24),
        "bpe_encode_documents": lambda: golden.bpe_encode_documents(docs),
        "skew_report_crawl": lambda: golden.skew_report_crawl(obs),
        "corpus_prep_documents":
            lambda: golden.corpus_prep_documents(docs),
        "cluster_top_terms":
            lambda: golden.cluster_top_terms(emb, docs),
        "ivfpq_topk_embeddings":
            lambda: golden.ivfpq_topk_embeddings(emb),
        "ann_recall_embeddings":
            lambda: golden.ann_recall_embeddings(emb),
        "hard_negatives_embeddings":
            lambda: golden.hard_negatives_embeddings(emb),
        "lpa_communities_crawl":
            lambda: golden.lpa_communities_crawl(crawl),
        "bloom_prune_crawl":
            lambda: golden.bloom_prune_crawl(obs),
        "iforest_outliers_embeddings":
            lambda: golden.iforest_outliers_embeddings(emb),
        "jl_distortion_embeddings":
            lambda: golden.jl_distortion_embeddings(emb),
        "lsa_top_terms_documents":
            lambda: golden.lsa_top_terms_documents(docs),
        "mi_feature_rank_embeddings":
            lambda: golden.mi_feature_rank_embeddings(emb),
        "rake_keywords_documents":
            lambda: golden.rake_keywords_documents(docs),
        "haar_energy_crawl":
            lambda: golden.haar_energy_crawl(obs),
        "huber_fit_crawl": lambda: golden.huber_fit_crawl(
            con.sql(f"{CRAWL_PREFIX} SELECT url, warc_ts, text_len, "
                    "word_count FROM obs").df()),
        "cox_hazard_events":
            lambda: golden.cox_hazard_events(
                pd.read_parquet(f"{sf_dir}/events.parquet",
                                columns=["user_id", "ts",
                                         "event_type"])),
        "shapley_attribution_events":
            lambda: golden.shapley_attribution_events(
                pd.read_parquet(f"{sf_dir}/events.parquet",
                                columns=["user_id", "ts",
                                         "event_type"])),
        "removal_attribution_events":
            lambda: golden.removal_attribution_events(
                pd.read_parquet(f"{sf_dir}/events.parquet",
                                columns=["user_id", "ts", "event_id",
                                         "event_type"])),
        "als_recommend_events": lambda: golden.als_recommend_events(
            pd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "value",
                                     "props"])),
        "reservoir_sample_events": lambda: golden.reservoir_sample_events(
            pd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type", "user_id",
                                     "ts"])),
        "augmented_rollup": lambda: golden.augmented_rollup(obs_long),
        "html_byte_features": lambda: golden.html_byte_features(crawl),
        "frame_samples": lambda: golden.frame_samples(crawl),
        "sniffed_assets_crawl":
            lambda: golden.sniffed_assets_crawl(crawl),
        "resized_thumbnails_crawl":
            lambda: golden.resized_thumbnails_crawl(crawl),
        "png_thumbnails_crawl":
            lambda: golden.png_thumbnails_crawl(crawl),
        "jpeg_thumbnails_crawl":
            lambda: golden.jpeg_thumbnails_crawl(crawl),
        "jpeg_color_thumbnails_crawl":
            lambda: golden.jpeg_color_thumbnails_crawl(crawl),
        "gif_thumbnails_crawl":
            lambda: golden.gif_thumbnails_crawl(crawl),
        "wav_features_crawl":
            lambda: golden.wav_features_crawl(crawl),
        "y4m_scene_stats_crawl":
            lambda: golden.y4m_scene_stats_crawl(crawl),
        "train_linear_fit": lambda: golden.train_linear_fit(
            emb, epochs=12, learning_rate=0.5, use_class_weights=True),
        "train_linear_weights": lambda: golden.train_linear_weights(
            emb, epochs=12, learning_rate=0.5, use_class_weights=True),
        "tune_trials": lambda: golden.tune_trials(
            emb, n_trials=5, seed=7, epochs=6),
        "quality_classifier_documents":
            lambda: golden.quality_classifier_documents(docs),
        "binseg_changepoints_crawl":
            lambda: golden.binseg_changepoints_crawl(obs_long),
        "holt_winters_crawl":
            lambda: golden.holt_winters_crawl(obs_long),
        "sax_motifs_crawl":
            lambda: golden.sax_motifs_crawl(obs_long),
        "matrix_profile_discord_crawl":
            lambda: golden.matrix_profile_discord_crawl(obs_long),
        "boilerplate_extract_documents":
            lambda: golden.boilerplate_extract_documents(docs),
        "ts_kmeans_crawl":
            lambda: golden.ts_kmeans_crawl(obs_long, k=5, iterations=4),
        "sdt_downsample_crawl":
            lambda: golden.sdt_downsample_crawl(obs_long, comp_dev=5.0),
        "dtw_classify_crawl":
            lambda: golden.dtw_classify_crawl(obs_long),
        "shesd_anomalies_crawl":
            lambda: golden.shesd_anomalies_crawl(obs_long),
        "periodogram_peak_crawl":
            lambda: golden.periodogram_peak_crawl(obs_long),
        "kleinberg_bursts_crawl":
            lambda: golden.kleinberg_bursts_crawl(obs),
        "segment_trends_crawl":
            lambda: golden.segment_trends_crawl(obs_long),
        "xcorr_lag_crawl":
            lambda: golden.xcorr_lag_crawl(obs_long),
        "tdigest_quantile_daily":
            lambda: golden.tdigest_quantile_daily_crawl(obs_long),
        "kll_quantile_daily":
            lambda: golden.kll_quantile_daily_crawl(obs_long),
        "km_staleness_crawl":
            lambda: golden.km_staleness_crawl(con.sql(
                f"{CRAWL_PREFIX} SELECT url, warc_ts, text FROM obs"
            ).df()),
        "snapshot_novelty_crawl":
            lambda: golden.snapshot_novelty_crawl(con.sql(
                f"{CRAWL_PREFIX} SELECT url, warc_ts, text FROM obs"
            ).df(), shingle_k=8),
        "srp_near_dup_embeddings":
            lambda: golden.srp_near_dup_embeddings(emb),
        "semdedup_embeddings":
            lambda: golden.semdedup_embeddings(emb),
        "weighted_sample_documents":
            lambda: golden.weighted_sample_documents(docs),
    }
    if only:
        jobs = {k: v for k, v in jobs.items() if k in only}
    for name, fn in jobs.items():
        t0 = time.perf_counter()
        out = fn()
        path = GOLDEN_DIR / f"{name}_{tag}.parquet"
        out.to_parquet(path, index=False)
        print(f"{path.name}: {len(out)} rows "
              f"({time.perf_counter() - t0:.1f}s)")


if __name__ == "__main__":
    args = sys.argv[1:]
    dirs = [a for a in args if "/" in a] or ["/root/testdata/sf0.001",
                                             "/root/testdata/sf0.01"]
    only = {a for a in args if "/" not in a} or None
    for d in dirs:
        print(f"== {d}")
        make_for(d, only)

"""Adversarial-fixture differentials: empty and maximally-skewed inputs.

Round-4 robustness program. Two degenerate input shapes every 100 TB
pipeline eventually meets, which the sf fixtures never exercise:

- ``empty``  — every table with its exact schema and 0 rows (the shape of
  a fully-pruned partition or an empty ingest day). An operator that
  throws here fails a real production stage.
- ``dup``    — every table is its first row repeated 50x (maximal key
  skew: every join key collides, every group collapses, every variance
  is zero). Crashes here are ANSI divide-by-zero / domain-error bugs;
  divergences are tie-breaking or key-uniqueness assumptions.
- ``nullpay`` — keys intact, every nullable payload column all-NULL (the
  failed-enrichment / half-written-ingest shape). Crashes here are
  NULL-unsafe Python UDFs and NULL map keys; divergences are the
  engine-semantics minefield (Spark concat vs DuckDB CONCAT, isnan(NULL),
  list_prepend resurrection, to_json null dropping, ...).
- ``dupnull`` — dup × nullpay composed (round 5): one hot key whose
  payloads are all missing. Catches interactions the single-axis shapes
  mask (full-tie window frames over NULL order keys).
- ``unistr`` — Unicode-hazard text rotation (round 5): the multilingual-
  corpus shape. Catches ANSI crashes on degenerate token structures,
  Java-vs-RE2/utf8proc semantic seams, UTF-16/UTF-8 boundary bugs, and
  connector framing contracts.

The full-registry sweeps run out-of-band (scripts/check_oracle.py against
scripts/gen_adversarial_fixtures.py output; both recorded in SCALE.md).
This test pins the SENTINEL SET — every operator fixed during the round-4
triage (22 empty-input + 51 skew + 64 null-flood failures) — so the bug
classes cannot silently return. Fixtures are generated fresh from sf0.001
into a session tmp dir; the compare logic is the same one the driver
mimics (scripts.check_oracle.compare).
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_SMOKE = "/root/testdata/sf0.001"


def _load_script(name: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault(name, mod)
    spec.loader.exec_module(mod)
    return mod


check_oracle = _load_script("check_oracle")
gen_adv = _load_script("gen_adversarial_fixtures")


# Ops fixed in the round-4 empty-input triage (crash or divergence on 0
# rows before the fix). Kept verbatim as the regression sentinel set.
EMPTY_FIXED = [
    "agg_grouping_id", "agg_bitmap_algebra", "sink_parquet_partitioned",
    "scan_partition_pruned", "scan_dynamic_partition_pruning",
    "sink_dynamic_partition_overwrite", "sink_compact_small_files",
    "sink_max_records_per_file", "agg_rollup", "agg_cube",
    "fn_number_roundtrip", "llm_position_kl", "llm_jsd_lang_pair",
    "llm_corpus_health", "llm_length_bias_audit", "graph_pagerank",
    "workload_data_quality", "scan_file_metadata", "workload_key_discovery",
    "workload_littles_law", "ml_chi2_independence", "ml_poisson_dispersion",
]

# Ops fixed in the round-4 max-skew triage (ANSI divide-by-zero on zero
# variance, domain errors, LAG-window interleaving on duplicate doc_ids,
# oracle self-join fan-out, pandas mean() noise).
DUP_FIXED = [
    "agg_moments", "agg_corr_matrix", "scan_binary_files",
    "sink_compact_small_files", "agg_stats", "fn_make_datetime",
    "udf_grouped_map", "llm_ngrams", "llm_pmi_collocations",
    "llm_bleu_pairs", "llm_simhash", "llm_rouge_pairs",
    "llm_source_ablation", "workload_anomaly_zscore", "ml_ols_regression",
    "workload_ab_test", "ml_linreg_multi", "ml_pca_power", "ml_auc_roc",
    "llm_hubness", "workload_cross_correlation", "sample_neyman_allocation",
    "ml_mutual_info", "ml_precision_recall", "ml_lift_gains", "ml_ab_cuped",
    "ml_woe_iv", "ml_conformal_interval", "ml_ts_feature_pack",
    "ml_info_gain_rank", "ml_anova_oneway", "ml_spearman", "ml_levene_test",
    "ml_grubbs_test", "ml_durbin_watson", "ml_jackknife_ratio",
    "ml_ridge_path", "ml_runs_test", "ml_fleiss_kappa",
    "ml_benjamini_hochberg", "ml_gmm_em_step", "ml_offpolicy_ips",
    "ml_tail_dependence", "ml_gumbel_block_maxima", "ml_chi2_residuals",
    "ml_qq_normality", "ml_james_stein", "ml_negbin_fit",
    "ml_circular_hour_stats", "ml_anova_twoway", "ml_boxcox_profile",
    "ml_mahalanobis_t2",
]


# Ops fixed in the round-4 null-flood triage (NULL-unsafe UDF/UDTF bodies,
# NULL map keys, engine NULL-semantics divergences in oracles, NULL event
# times in streaming, left-join rows dropped by explode-of-NULL-sequence).
NULLPAY_FIXED = [
    "join_theta_range", "join_range_bucketed", "agg_string_agg",
    "scan_text_roundtrip", "scan_binary_files",
    "sink_dynamic_partition_overwrite", "scan_json_corrupt_column",
    "agg_collect_list", "fn_string", "fn_hash", "fn_conditional",
    "fn_array_setops", "fn_map_hof", "fn_regexp_extract_all",
    "fn_format_string", "fn_string_index", "fn_sequence_zip",
    "fn_row_fingerprint", "fn_to_json", "fn_from_csv", "fn_map_builders",
    "fn_number_roundtrip", "fn_array_mutations", "fn_reduce_finish",
    "fn_str_to_map", "udf_python_scalar", "udtf_surface",
    "udf_arrow_scalar", "udtf_analyze_polymorphic", "udf_pandas_iter",
    "udf_pandas_struct", "llm_multimodal_join", "llm_embed_pq",
    "llm_ann_pq_adc", "llm_sentiment_lexicon", "llm_template_prefix",
    "llm_rouge_pairs", "llm_fingerprint_rolling", "llm_simhash",
    "llm_embed_normalize", "mm_binary_features", "mm_image_resize",
    "mm_audio_frame_sample", "mm_video_frame_sample", "llm_sft_format",
    "llm_prefix_cache_stats", "llm_rejection_sampling",
    "workload_path_3step", "graph_assortativity", "graph_ann_edge_table",
    "graph_triangle_count_ann", "workload_skyline_pareto_front",
    "workload_supplier_scorecard", "workload_survivorship",
    "workload_table_checksum", "workload_diff_in_diff",
    "workload_mix_shift_decompose", "ml_iv_wald", "ml_tukey_hsd",
    "stream_tumbling_agg", "stream_sliding_agg", "stream_session_window",
    "stream_stateful_count", "stream_session_dynamic_gap",
    "stream_tumbling_topk",
]

# Ops fixed in the round-5 composed skew×null triage (``dupnull``: one hot
# key AND all payloads NULL at once — the failed-enrichment-on-the-hot-
# tenant shape). The full-registry dupnull sweep found exactly one root
# cause: udtf_table_arg's sessionizer on all-NULL-ts fully-tied rows (the
# oracle's running-SUM RANGE frame counts all peers at once while the
# sequential UDTF opens a session per NULL gap). Fixed by dropping
# unstamped events on both sides.
DUPNULL_FIXED = [
    "udtf_table_arg",
]

# Ops fixed in the round-5 Unicode-hazard triage (``unistr``: every text
# payload rotated through CJK / emoji / RTL / combining marks / ß casing /
# control whitespace / metacharacters / long blobs / empty strings — the
# shape of a real multilingual corpus). 38 root causes across five
# classes: ANSI crashes on degenerate token structures (descending
# sequence(), elt(0), 0/0, CAST of text), DuckDB-json-THROWS-where-Spark-
# NULLs, Java-vs-utf8proc case mapping (ß→SS vs ẞ), UTF-16/UTF-8 seam bugs
# (mask() code units, byte-vs-codepoint features), and connector framing
# contracts (CSV writer trimming, multiLine reads, text-sink newline
# folding, Hive ''≡NULL partition values, XML whitespace).
UNISTR_FIXED = [
    "fn_json", "workload_medallion", "workload_twap_vwap",
    "workload_ohlc_bars", "fn_string_parts", "fn_map_hof", "fn_url",
    "fn_variant", "llm_bleu_pairs", "mm_block_manifest_cas",
    "mm_augment_params", "llm_self_similarity_sample",
    "llm_skipgram_negative_sampling", "ml_shapley_closed_form",
    "ml_logrank_test", "workload_metric_driver_tree",
    "workload_granger_causality", "stream_stateful_count", "fn_string",
    "fn_string_extra", "fn_mask", "fn_string_index", "fn_sentences",
    "fn_array_extra", "fn_multibyte_lengths", "udf_python_scalar",
    "llm_url_canonicalize", "fn_xml", "fn_aes_roundtrip",
    "mm_binary_features", "mm_image_resize", "scan_csv_multiline",
    "scan_xml_roundtrip", "scan_csv_roundtrip", "scan_csv_compressed",
    "scan_text_roundtrip", "sink_parquet_partitioned",
    "sink_dynamic_partition_overwrite",
]


@pytest.fixture(scope="session")
def adv_dirs(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("advfixtures"))
    gen_adv.generate(SF_SMOKE, out, dup_rows=50)
    return {
        "empty": os.path.join(out, "empty"),
        "dup": os.path.join(out, "dup"),
        "nullpay": os.path.join(out, "nullpay"),
        "dupnull": os.path.join(out, "dupnull"),
        "unistr": os.path.join(out, "unistr"),
    }


def _run(spark, sf_dir: str, names: list[str]):
    from datapipelines_python_spark import get_registry

    registry = get_registry()
    con = check_oracle.duck_connect(sf_dir)
    failures = []
    for name in names:
        spec = registry[name]
        try:
            df = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                df.count()  # rows-only ops must at least not throw
                continue
            ok, msg = check_oracle.compare(name, df, con.sql(spec.oracle))
        except Exception as exc:  # crash = the bug class under test
            ok, msg = False, f"{type(exc).__name__}: {exc}"
        if not ok:
            failures.append(f"{name}: {msg}")
    con.close()
    assert not failures, (
        f"{len(failures)} op(s) regressed on {os.path.basename(sf_dir)} "
        f"input:\n" + "\n".join(failures[:10])
    )


def test_empty_input_sentinels(spark, adv_dirs):
    """Every op fixed for empty input stays green on a 0-row fixture."""
    _run(spark, adv_dirs["empty"], EMPTY_FIXED)


def test_max_skew_sentinels(spark, adv_dirs):
    """Every op fixed for total key-skew stays green on the dup fixture."""
    _run(spark, adv_dirs["dup"], DUP_FIXED)


def test_null_flood_sentinels(spark, adv_dirs):
    """Every op fixed for all-NULL payloads stays green on nullpay."""
    _run(spark, adv_dirs["nullpay"], NULLPAY_FIXED)


def test_skew_null_composed_sentinels(spark, adv_dirs):
    """Every op fixed for the composed hot-key × all-NULL shape stays
    green on dupnull (single-axis fixtures provably missed this class:
    udtf_table_arg passed empty/dup/nullpay and failed only here)."""
    _run(spark, adv_dirs["dupnull"], DUPNULL_FIXED)


def test_unicode_hazard_sentinels(spark, adv_dirs):
    """Every op fixed in the Unicode-hazard triage stays green on the
    unistr fixture — the multilingual-corpus shape (CJK/emoji/RTL/ß/
    combining/control/metacharacter/blob/empty text)."""
    _run(spark, adv_dirs["unistr"], UNISTR_FIXED)

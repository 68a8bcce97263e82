"""panelsplit_spark — a PySpark-native panel time-series CV + data engine.

Distributed re-expression of the capabilities of 4Freye/panelsplit
(reference surveyed in SURVEY.md): expanding-window panel cross-validation,
per-fold model fit/apply with out-of-fold reassembly, sequential CV
pipelines, per-fold metrics/scorers and hyper-parameter search — plus the
large-scale training-data operators a 100 TB pipeline needs (dedup,
similarity search, text analysis, multimodal plumbing).

Everything is declared through the DataFrame API so Catalyst owns the
physical plan: folds are sargable period-range predicates, model fit is a
grouped-map pandas UDF, apply is a broadcast + ``mapInPandas``, and all
relational pieces (label frames, fan-outs, metrics) are plain Spark SQL.
"""

from .estimators import (
    FirstColumnRegressor,
    IdentityTransformer,
    LinearRegression,
    LogisticRegression,
    MeanRegressor,
    PriorClassifier,
    Ridge,
    StandardScaler,
    clone,
)
from .operators.application import (
    apply_model,
    cross_val_fit,
    cross_val_fit_predict,
    cross_val_predict,
    with_row_key,
)
from .operators.cross_validation import PanelSplit, drop_splits, fold_stats
from .operators.metrics import (
    check_scoring,
    get_scorer,
    make_SequentialCV_scorer,
    per_fold_scores,
)
from .operators.model_selection import (
    GridSearch,
    ParameterGrid,
    ParameterSampler,
    RandomizedSearch,
)
from .operators.pipeline import SequentialCVPipeline
from .operators import (  # noqa: F401
    dedup,
    multimodal,
    sampling,
    similarity,
    text,
)
from .operators.application import with_row_key_distributed
from .operators.linear_fastpath import huber_irls
from .operators.cross_validation import (
    cpcv_backtest_paths,
    cpcv_panel_assign,
    nested_ridge_cv,
    purged_panel_assign,
)
from .operators.encoding import oof_target_encode
from .operators.sampling import winsorize
from .operators.dedup import (
    connected_components,
    connected_components_star,
    doc_shingles,
    incremental_band_dedup,
    ngram_contamination,
    prefix_filter_candidates,
    survivorship_golden,
)
from .operators.sampling import (
    hash_sample,
    hash_split,
    pack_sequences,
    rebalance_sources,
    contrastive_triplets,
    stratified_topn,
    weighted_reservoir_topk,
)
from .operators.similarity import (
    cosine_topk,
    gram_matrix,
    kcenter_sample,
    pca_fit,
    pca_project,
)
from .operators.sketches import (
    hll_estimate,
    hll_register_maxes,
    linear_count,
)
from .operators.skew import salted_join
from .operators.text import (
    bm25_topk,
    chunk_documents,
    lm_unigram_score,
    rake_topk,
    register_ngram_udtf,
    repetition_signals,
    span_corruption,
)
from .operators.evaluation import (
    cuped_adjust,
    diff_in_diff,
    learning_curve_ols,
    power_mde,
    split_conformal_ols,
)
from .operators.quality import (
    gini_by_group,
    ks_one_vs_rest,
    gini_from_counts,
    ks_from_counts,
    referential_audit,
    rule_ablation,
)
from .operators.timeseries import (
    acf_lags,
    asof_join,
    group_ols2,
    resample_daily_ffill,
    sessionize,
)
from .functions.exact import cents, micro_units, morton_code
from .plot import plot_splits
from .sources import tables as sources_tables  # noqa: F401
from .sources.tables import (
    compact_parquet,
    load_table,
    read_source,
    write_sink,
)
from .streaming.rolling import (
    stream_interval_join,
    stream_online_linreg,
    stream_parquet_sink,
    stream_sessionize,
)
from .plans.fold_spec import FoldSpec, build_fold_spec, time_series_fold_bounds

__version__ = "0.1.0"

__all__ = [
    "PanelSplit",
    "drop_splits",
    "fold_stats",
    "SequentialCVPipeline",
    "GridSearch",
    "RandomizedSearch",
    "ParameterGrid",
    "ParameterSampler",
    "make_SequentialCV_scorer",
    "get_scorer",
    "check_scoring",
    "per_fold_scores",
    "apply_model",
    "cross_val_fit",
    "cross_val_predict",
    "cross_val_fit_predict",
    "with_row_key",
    "FoldSpec",
    "build_fold_spec",
    "time_series_fold_bounds",
    "clone",
    "MeanRegressor",
    "LinearRegression",
    "Ridge",
    "LogisticRegression",
    "PriorClassifier",
    "StandardScaler",
    "IdentityTransformer",
    "FirstColumnRegressor",
    "connected_components",
    "connected_components_star",
    "doc_shingles",
    "prefix_filter_candidates",
    "hll_register_maxes",
    "hll_estimate",
    "linear_count",
    "oof_target_encode",
    "winsorize",
    "ngram_contamination",
    "hash_split",
    "hash_sample",
    "stratified_topn",
    "pack_sequences",
    "rebalance_sources",
    "with_row_key_distributed",
    "cpcv_panel_assign",
    "cpcv_backtest_paths",
    "nested_ridge_cv",
    "huber_irls",
    "purged_panel_assign",
    "cosine_topk",
    "kcenter_sample",
    "gram_matrix",
    "pca_fit",
    "pca_project",
    "salted_join",
    "register_ngram_udtf",
    "lm_unigram_score",
    "bm25_topk",
    "rake_topk",
    "span_corruption",
    "chunk_documents",
    "repetition_signals",
    "cents",
    "micro_units",
    "morton_code",
    "asof_join",
    "group_ols2",
    "resample_daily_ffill",
    "sessionize",
    "incremental_band_dedup",
    "survivorship_golden",
    "weighted_reservoir_topk",
    "contrastive_triplets",
    "cuped_adjust",
    "diff_in_diff",
    "split_conformal_ols",
    "learning_curve_ols",
    "power_mde",
    "acf_lags",
    "gini_by_group",
    "ks_one_vs_rest",
    "ks_from_counts",
    "gini_from_counts",
    "rule_ablation",
    "referential_audit",
    "compact_parquet",
    "load_table",
    "read_source",
    "write_sink",
    "stream_sessionize",
    "stream_interval_join",
    "stream_online_linreg",
    "stream_parquet_sink",
    "plot_splits",
]

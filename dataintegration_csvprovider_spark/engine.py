"""High-level engine facade: the single entry point a user of the
reference provider would switch to.

Maps the reference's provider surface onto the engine's modules:

=====================================  ====================================
reference (CSVProvider)                engine
=====================================  ====================================
GetOriginalSourceSchema()              Engine.infer_schema(source)
ValidateSourceSettings()               CsvSource.validate()
LoadSettings / CheckSourceFiles...     CsvSource.check_source_files_changing
RunJob(job)                            Engine.run_job(job)
GetReader(mapping)                     Engine.read(source, table)
CsvDestinationWriter                   Engine.write(df, sink, table)
XML settings round-trip                JobSpec.to_json / from_json
=====================================  ====================================

plus the extension surface (relational queries go straight through the
DataFrame/SQL API; dedup/similarity/text/streaming helpers re-exported).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .jobs import JobResult, JobSpec, run_job
from .operators import dedup as dedup_ops
from .operators import similarity as sim_ops
from .operators import textstats as text_ops
from .operators.asof import asof_join
from .operators.clustering import grouped_linear_fit, kmeans
from .operators.scale import bucketed_join, salted_join, write_bucketed
from .operators.sessions import session_stats, sessionize
from .session import get_spark
from .sinks.csv_sink import CsvSink
from .sources.csv_source import CsvSource
from .sources.jsonl_source import JsonlSink, JsonlSource


@dataclass
class Engine:
    """Session-scoped facade over the full engine surface."""

    spark: SparkSession

    @classmethod
    def create(cls, **kwargs) -> "Engine":
        return cls(spark=get_spark(**kwargs))

    # -- provider surface (reference parity) ------------------------------
    def infer_schema(self, source: CsvSource) -> dict[str, T.StructType]:
        return source.infer_schema(self.spark)

    def read(self, source: CsvSource, table: str) -> DataFrame:
        return source.read(self.spark, table)

    def write(self, df: DataFrame, sink: CsvSink, table: str, **kwargs) -> str:
        return sink.write(df, table, **kwargs)

    def run_job(self, job: JobSpec, **kwargs) -> JobResult:
        return run_job(self.spark, job, **kwargs)

    # -- extension surface ------------------------------------------------
    dedup_exact = staticmethod(dedup_ops.dedup_exact)
    dedup_near_minhash = staticmethod(dedup_ops.dedup_near_minhash)
    minhash_near_dup_pairs = staticmethod(dedup_ops.minhash_near_dup_pairs)
    incremental_near_dup_flags = staticmethod(dedup_ops.incremental_near_dup_flags)
    simhash_near_dup_pairs = staticmethod(dedup_ops.simhash_near_dup_pairs)
    ngram_jaccard_pairs = staticmethod(dedup_ops.ngram_jaccard_pairs)
    knn_bruteforce = staticmethod(sim_ops.knn_bruteforce)
    knn_ivf = staticmethod(sim_ops.knn_ivf)
    trained_ivf_centroids = staticmethod(sim_ops.trained_ivf_centroids)
    embedding_near_dup_pairs = staticmethod(sim_ops.embedding_near_dup_pairs)
    text_quality = staticmethod(text_ops.text_quality)
    language_id = staticmethod(text_ops.language_id)
    doc_fingerprint = staticmethod(text_ops.doc_fingerprint)
    asof_join = staticmethod(asof_join)
    sessionize = staticmethod(sessionize)
    session_stats = staticmethod(session_stats)
    kmeans = staticmethod(kmeans)
    grouped_linear_fit = staticmethod(grouped_linear_fit)
    salted_join = staticmethod(salted_join)
    bucketed_join = staticmethod(bucketed_join)
    write_bucketed = staticmethod(write_bucketed)

    # round-2 extension operators
    @staticmethod
    def connected_components(edges, src="src", dst="dst", max_iter=25):
        from .operators.components import connected_components as _cc

        return _cc(edges, src=src, dst=dst, max_iter=max_iter)

    @staticmethod
    def heavy_hitters(df, col, min_frac, total=None):
        from .operators.frequent import heavy_hitters as _hh

        return _hh(df, col, min_frac, total=total)

    @staticmethod
    def arrow_score(df, weights, vec_col="embedding", id_col="vec_id"):
        from .operators.similarity import arrow_score as _as

        return _as(df, weights, vec_col=vec_col, id_col=id_col)

    @staticmethod
    def bfs_levels(edges, sources, src="src", dst="dst", max_depth=20):
        from .operators.graph import bfs_levels as _bfs

        return _bfs(edges, sources, src=src, dst=dst, max_depth=max_depth)

    # round-3 extension operators
    @staticmethod
    def containment_pairs(train, eval_df, **kwargs):
        from .operators.dedup import containment_pairs as _cp

        return _cp(train, eval_df, **kwargs)

    @staticmethod
    def repetition_stats(df, text_col="text", id_col="doc_id", **kwargs):
        from .operators.textstats import repetition_stats as _rs

        return _rs(df, text_col=text_col, id_col=id_col, **kwargs)

    @staticmethod
    def temperature_sample(df, group_col, id_col, alpha=0.5, target_total=1000):
        from .operators.sampling import temperature_sample as _ts

        return _ts(df, group_col, id_col, alpha=alpha, target_total=target_total)

    @staticmethod
    def extract_frame_features(df, frame_indices=None, **kwargs):
        from .operators.multimodal import extract_frame_features as _ef

        return _ef(df, frame_indices=frame_indices, **kwargs)

    @staticmethod
    def train_pq_codebooks(df, m=8, k=16, **kwargs):
        from .operators.pq import train_pq_codebooks as _tp

        return _tp(df, m=m, k=k, **kwargs)

    @staticmethod
    def pq_encode(df, codebooks, **kwargs):
        from .operators.pq import pq_encode as _pe

        return _pe(df, codebooks, **kwargs)

    @staticmethod
    def pq_knn(df, codes_df, codebooks, query, k=10, **kwargs):
        from .operators.pq import pq_knn as _pk

        return _pk(df, codes_df, codebooks, query, k=k, **kwargs)

    # round-5 extension operators: curation / linalg / batching
    @staticmethod
    def filter_funnel(df, rules):
        from .operators.textstats import filter_funnel as _ff

        return _ff(df, rules)

    @staticmethod
    def scrub_boilerplate_lines(df, **kwargs):
        from .operators.textstats import scrub_boilerplate_lines as _sb

        return _sb(df, **kwargs)

    @staticmethod
    def dsir_importance(df, target_df, **kwargs):
        from .operators.textstats import dsir_importance as _di

        return _di(df, target_df, **kwargs)

    @staticmethod
    def span_corruption(df, **kwargs):
        from .operators.textstats import span_corruption as _sc

        return _sc(df, **kwargs)

    @staticmethod
    def snapshot_diff(old, new, key_cols, content_cols):
        from .operators.cdc import snapshot_diff as _sd

        return _sd(old, new, key_cols, content_cols)

    @staticmethod
    def pca_fit(df, vec_col="embedding", k=8, exact=True):
        from .operators.linalg import pca_fit as _pf

        return _pf(df, vec_col=vec_col, k=k, exact=exact)

    @staticmethod
    def pca_project(df, model, vec_col="embedding", **kwargs):
        from .operators.linalg import pca_project as _pp

        return _pp(df, model, vec_col=vec_col, **kwargs)

    @staticmethod
    def prototype_prune(df, bucket_col, **kwargs):
        from .operators.sampling import prototype_prune as _prp

        return _prp(df, bucket_col, **kwargs)

    @staticmethod
    def negative_samples(df, id_col, k=3, salt=0):
        from .operators.sampling import negative_samples as _ns

        return _ns(df, id_col, k=k, salt=salt)

    @staticmethod
    def budget_curation(df, group_col, id_col, weight_col, score_col, budgets):
        from .operators.sampling import budget_curation as _bc

        return _bc(df, group_col, id_col, weight_col, score_col, budgets)

    @staticmethod
    def ks_two_sample(a, b, value_col):
        from .operators.scale import ks_two_sample as _ks

        return _ks(a, b, value_col)

    @staticmethod
    def length_bucketed_batches(df, len_col, id_col, bucket_edges, batch_size):
        from .operators.scale import length_bucketed_batches as _lb

        return _lb(df, len_col, id_col, bucket_edges, batch_size)

    @staticmethod
    def write_training_shards(df, path, n_shards, order_col, weight_col):
        from .sinks.shards import write_training_shards as _ws

        return _ws(df, path, n_shards, order_col, weight_col)

    @staticmethod
    def plan_lsh_bands(threshold, num_perm=64, **kwargs):
        from .operators.dedup import plan_lsh_bands as _pl

        return _pl(threshold, num_perm=num_perm, **kwargs)

    @staticmethod
    def exact_substring_dedup(df, **kwargs):
        from .operators.dedup import exact_substring_dedup as _esd

        return _esd(df, **kwargs)

    @staticmethod
    def exact_substring_decontaminate(train, eval_df, **kwargs):
        from .operators.dedup import exact_substring_decontaminate as _esc

        return _esc(train, eval_df, **kwargs)

    @staticmethod
    def apportion_mixture(df, weights, total, **kwargs):
        from .operators.sampling import apportion_mixture as _am

        return _am(df, weights, total, **kwargs)

    @staticmethod
    def token_balanced_shards(df, id_col, weight_col, n_shards):
        from .operators.scale import token_balanced_shards as _tbs

        return _tbs(df, id_col, weight_col, n_shards)

    @staticmethod
    def connected_components_stats(edges, src="src", dst="dst", max_iter=25):
        from .operators.components import connected_components_stats as _ccs

        return _ccs(edges, src=src, dst=dst, max_iter=max_iter)

    @staticmethod
    def grouped_pca_summary(df, group_col, vec_col="embedding", k=2):
        from .operators.linalg import grouped_pca_summary as _gps

        return _gps(df, group_col=group_col, vec_col=vec_col, k=k)

    @staticmethod
    def bm25_scores(docs):
        from .queries.textmining import _bm25_scores_docs as _bm

        return _bm(docs)

    @staticmethod
    def chi2_drift(docs, src_a="src1", src_b="src2"):
        from .queries.profiling import chi2_drift_docs as _cd

        return _cd(docs, src_a, src_b)

    @staticmethod
    def bloom_semijoin(fact, keys, fact_key, key_col, m_bits=65536):
        from .operators.scale import bloom_semijoin as _bsj

        return _bsj(fact, keys, fact_key, key_col, m_bits=m_bits)

    @staticmethod
    def hellinger_drift(docs, src_a="src1", src_b="src2"):
        from .queries.profiling import hellinger_drift_docs as _hd

        return _hd(docs, src_a, src_b)

    @staticmethod
    def sliding_token_chunks(df, id_col="doc_id", text_col="text", **kwargs):
        from .operators.textstats import sliding_token_chunks as _stc

        return _stc(df, id_col=id_col, text_col=text_col, **kwargs)

    # -- JSONL source/sink -------------------------------------------------
    def read_jsonl(
        self, source: JsonlSource, table: str, **kwargs
    ) -> DataFrame:
        return source.read(self.spark, table, **kwargs)

    def write_jsonl(
        self, df: DataFrame, sink: JsonlSink, table: str, **kwargs
    ) -> str:
        return sink.write(df, table, **kwargs)

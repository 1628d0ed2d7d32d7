"""Physical-plan audit: scan every gate query's plan for 100-TB red flags.

For each ``queries()`` entry (batch queries stay lazy; streaming entries
are skipped — their plan is the batch result of ``run_to_completion``):

- ERROR  ``BatchEvalPython``      row-at-a-time Python UDF on the hot path
- WARN   ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` outside the
         whitelist of intentionally cross/theta-shaped queries
- INFO   shuffle (``Exchange``) count; parquet scan count and how many of
         those scans carry pushed filters (predicate pushdown reached
         the scan). Formatted explain lists each node in the tree AND the
         detail section, so these counts are ~2x the node count — compare
         across queries, not against an absolute budget.

Round 12 (r11 verdict item 2): the audit also inspects every plan
EXECUTED while the query function ran, read back from the JVM
``SQLAppStatusStore`` — composite queries that collect intermediate
metrics and return a ``createDataFrame`` literal used to audit as
``shuffles=0 scans=0`` because only the returned frame's lazy plan was
visible. Executed plans go through the same flag rules (same NLJ_OK /
ROW_PY_OK allowlists) and are reported as ``exec=N/S`` (N executed
statements, S total shuffles across them).

Usage: python tools/explain_audit.py [names...]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.01"

#: queries whose semantics genuinely need a cross/nested-loop join:
#: all-pairs similarity, theta/range/as-of joins, single-row query vectors
NLJ_OK = {
    "q_cross_join",
    "q_range_join",
    "q_asof_join",
    "q_knn_bruteforce",
    "q_knn_ivf",
    "q_knn_lsh",
    "q_embedding_neardup",
    "q_embedding_neardup_ivf",
    "q_matryoshka_truncation",  # 4-row broadcast query-vector cross (q_knn class)
    "q_date_spine",  # 12-row broadcast spine
    "q_subquery_scalar",  # scalar subquery joins as single-row BNLJ
    "q_knn_recall_gate",  # same single-row query-vector cross as q_knn_*
    "q_dedup_quality_gate",  # 1x1x1-row crossJoin of count aggregates
    "q_fuzzy_match",  # bounded 400x400 theta self-join (edit distance)
    "q11_important_parts",  # single-row threshold aggregate broadcast
    "q22_idle_customers",  # single-row decimal-AVG aggregate broadcast
    "q_drift_tvd",  # single-row midpoint + totals aggregate broadcasts
    "q_funnel",  # 1x1x1-row crossJoin of stage-count aggregates
    "q_triangle_count",  # single-row edge/node/triangle count crossJoins
    "q_hll_union",  # single-row merged-sketch estimate broadcast
    "q_temperature_sample",  # single-row Σweight aggregate broadcast
    "q_pq_quality_gate",  # 1x1-row recall/recon aggregate crossJoins + query-vector scan
    "q_ivfpq_recall_gate",  # single-row query-vector cross, same as q_knn_*
    "q_embedding_neardup_trained",  # 16-row trained-centroid broadcast cross
    "q_dedup_incremental",  # 1x1x1-row crossJoin of gate-count aggregates
    "q_leakage_safe_split_lsh",  # 1x1x1-row crossJoin of gate aggregates
    "q_shard_balanced",  # single-row Σtokens aggregate broadcast cross
    "q_curation_pipeline_full",  # same single-row Σtokens cross via token_balanced_shards
    "q_components_zipf_gate",  # 1x1x1-row crossJoin of gate aggregates + top-hub broadcast
    "q_drift_chi2",  # single-row (n1, n2, V) totals broadcast cross
    "q_dedup_minhash_full",  # 1x1x1-row crossJoin of gate-count aggregates (r6 gate form)
    "q_k_anonymity",  # single-row global-minimum aggregate broadcast cross
    "q_incremental_covariance",  # 1x1-row crossJoin merging base+delta moment rows
    "q_l_diversity",  # single-row global-minimum aggregate broadcast cross
    "q_skew_stats",  # single-row top-k aggregate broadcast cross
    "q_lm_quality_score",  # single-row vocab-size aggregate broadcast cross
    "q_dsir_importance",  # single-row (N_raw, N_tgt, V) totals broadcast cross
    "q_drift_ks",  # single-row (n_a, n_b) totals broadcast cross
    "q_negative_sampling",  # single-row corpus-size broadcast cross
    "q_contrastive_pairs",  # same corpus-size broadcast via negative_samples
    "q_time_decay_agg",  # single-row max-date bounds broadcast cross
    "q_zipf_coverage",  # single-row total-tokens broadcast cross
    "q_t_closeness",  # bounded bucket-domain cross + 1-row totals/max broadcasts
    "q_bloom_semijoin",  # single-row bloom-bitmap broadcast cross (the probe)
    # round 12 (executed-plan audit): both SemDeDup names block
    # candidates through embedding_near_dup_pairs, whose IVF assignment
    # crosses each vector with the BROADCAST trained-centroid table
    # (k <= 64 rows — bounded by construction, the same pattern as
    # q_embedding_neardup_trained above); the candidate PAIR stage
    # itself is an equi-join on centroid_id
    "q_semantic_dedup",
    "q_semdedup_knn_eval",
    # round 12: names whose EXECUTED intermediate plans (newly visible
    # to the audit) contain a documented-benign bounded cross; each is
    # an instance of a class already allowlisted above
    "q_ivf_incremental",  # <=64-row frozen/retrained centroid broadcast crosses
    "q_artifact_reuse",  # reloaded IVF/PQ snapshot centroid + query-vector crosses
    "q_zorder_layout",  # single-row global min/max bounds broadcast cross
    "q_parquet_codecs",  # 1-row roundtrip-vs-source aggregate comparison cross
    "q_training_shard_manifest",  # single-row Σtokens broadcast (token_balanced_shards, as q_shard_balanced)
    "q_entity_resolution",  # bounded 400x400 length-pruned edit-distance theta self-join (q_fuzzy_match class)
    "q_hybrid_retrieval_eval",  # knn_batch broadcast query-matrix cross (q_knn_batch class) + IVF centroid cross (gate)
    "q_ann_probe_curve",  # 16-row seed-centroid broadcast cross + knn_batch query-vector cross
}

#: queries whose PURPOSE is the row-Python UDTF surface itself (API
#: parity for the reference's row-level script hooks, SURVEY §2.9) —
#: deliberately bounded input, documented as the last-resort tier
ROW_PY_OK = {
    "q_udtf_installments",
    "q_udtf_installment_amounts",
}


def _executed_plans(spark, since_id: int) -> tuple[list[str], int]:
    """Formatted plan descriptions of every SQL execution the JVM's
    status store recorded with id > since_id, plus the new high-water
    id. Execution ids are monotonic, so tracking the max id isolates
    exactly the statements each query function ran (eager
    localCheckpoints, counts, first()s — the composite-query work the
    lazy returned-frame explain never sees)."""
    store = spark._jsparkSession.sharedState().statusStore()
    lst = store.executionsList()
    plans: list[str] = []
    max_id = since_id
    for i in range(lst.size()):
        e = lst.apply(i)
        eid = e.executionId()
        if eid > since_id:
            plans.append(e.physicalPlanDescription())
            max_id = max(max_id, eid)
    return plans, max_id


def main() -> int:
    import __spark_entry__ as entry
    from dataintegration_csvprovider_spark.session import get_spark

    spark = get_spark(app_name="explain_audit")
    names = sys.argv[1:] or sorted(entry.queries())
    qs = entry.queries()
    n_err = 0
    _, last_id = _executed_plans(spark, -1)  # drop session-warmup noise
    for name in names:
        if name.startswith("q_stream"):
            print(f"skip  {name}: streaming (plan is the finished batch)")
            continue
        try:
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {type(exc).__name__}: {exc}")
            n_err += 1
            continue
        executed, last_id = _executed_plans(spark, last_id)
        flags = []
        all_plans = [plan] + executed
        if any(
            "BatchEvalPython" in p for p in all_plans
        ) and name not in ROW_PY_OK:
            flags.append("ROW-PYTHON-UDF")
            n_err += 1
        has_nlj = any(
            "CartesianProduct" in p or "BroadcastNestedLoopJoin" in p
            for p in all_plans
        )
        if has_nlj and name not in NLJ_OK:
            flags.append("UNEXPECTED-NLJ")
            n_err += 1
        n_exchange = plan.count("Exchange")
        n_scans = plan.count("Scan parquet")
        n_pushed = plan.count("PushedFilters: [") - plan.count(
            "PushedFilters: []"
        )
        n_exec_shuf = sum(p.count("Exchange") for p in executed)
        status = " ".join(flags) if flags else "clean"
        print(f"{'FLAG ' if flags else 'ok   '}{name}: {status} "
              f"[shuffles={n_exchange} scans={n_scans} pushed={n_pushed} "
              f"exec={len(executed)}/{n_exec_shuf}]")
    print(f"\n{n_err} flagged")
    return 1 if n_err else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Round-10 additions: the KMV-pruned incremental curation's FIRING
path (the driver fixture's single shared word pool means the language
matrix never prunes there — constructed corpora pin that it does), and
the composed monitor suite's crash bookkeeping."""

import pytest
from pyspark.sql import functions as F


def _write_documents(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    ).withColumn("n_chars", F.length("text").cast("int"))
    d = str(tmp_path / "corpus")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def _mk_text(words, n):
    # cycle a vocabulary into an n-word doc, n_chars >= 60 guaranteed
    return " ".join(words[i % len(words)] for i in range(n))


VOCAB_A = [f"alpha{i:02d}" for i in range(40)]
VOCAB_B = [f"beta{i:02d}" for i in range(40)]


@pytest.fixture(scope="module")
def split_corpus(spark, tmp_path_factory):
    """Two languages with DISJOINT vocabularies; delta (src0) has docs
    of both; snapshot has both; one planted same-language near-dup
    across delta/snapshot so the pruned probe provably still works."""
    rows = []
    did = 0
    for k in range(6):  # snapshot
        rows.append((did, "en", "snap", _mk_text(VOCAB_A[k:], 30))); did += 1
    for k in range(6):
        rows.append((did, "zh", "snap", _mk_text(VOCAB_B[k:], 30))); did += 1
    # delta: 3 fresh per lang + ONE exact near-dup of snapshot doc 0
    for k in range(3):
        rows.append((did, "en", "src0", _mk_text(VOCAB_A[k + 10:], 28))); did += 1
    for k in range(3):
        rows.append((did, "zh", "src0", _mk_text(VOCAB_B[k + 10:], 28))); did += 1
    rows.append((did, "en", "src0", _mk_text(VOCAB_A, 30)))  # ~dup of doc 0
    spark_ = spark
    return _write_documents(
        spark_, tmp_path_factory.mktemp("r10"), rows
    )


def test_kmv_prune_fires_on_disjoint_vocabulary(spark, split_corpus):
    from dataintegration_csvprovider_spark.queries.llm import (
        q_curation_incremental_pruned,
    )

    out = {
        r["lang"]: r
        for r in q_curation_incremental_pruned(spark, split_corpus).collect()
    }
    # each delta language probes ONLY its own snapshot language: the
    # disjoint-vocabulary pair is skipped — the decision fires
    assert out["en"]["probe_langs"] == 1
    assert out["en"]["skipped_langs"] == 1
    assert out["zh"]["probe_langs"] == 1
    assert out["zh"]["skipped_langs"] == 1


def test_kmv_prune_manifest_equals_unpruned(spark, split_corpus):
    """The load-bearing pin: with a pair pruned, the manifest must
    still equal the UNPRUNED run — the planted cross-probe near-dup
    (same language, so never prunable) is caught either way."""
    from dataintegration_csvprovider_spark.queries.llm import (
        q_curation_incremental,
        q_curation_incremental_pruned,
    )

    pruned = {
        r["lang"]: (r["n_before"], r["n_added"], r["n_after"],
                    r["tokens_added"], r["quota_after"])
        for r in q_curation_incremental_pruned(
            spark, split_corpus
        ).collect()
    }
    base = {
        r["lang"]: (r["n_before"], r["n_added"], r["n_after"],
                    r["tokens_added"], r["quota_after"])
        for r in q_curation_incremental(spark, split_corpus).collect()
    }
    assert pruned == base
    # and the cross-probe DID drop en delta docs (the planted near-dup
    # plus the cyclic-shift overlaps): strictly fewer than the 4 en
    # delta docs were accepted, so the pruned probe provably ran
    assert 0 <= base["en"][1] < 4

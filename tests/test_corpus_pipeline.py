"""plans/corpus_pipeline.py — the end-to-end curation composition.

The constituent operators are verified elsewhere; these tests pin the
COMPOSITION laws: stage counts are monotone non-increasing, eval rows
never leak into the training output, near-dup clusters keep exactly
their best-quality member, contaminated docs die, packing conserves
chunk tokens, and the whole build is deterministic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sentiment_analysis_data_engineering_spark.operators.dedup import release_pinned
from sentiment_analysis_data_engineering_spark.plans.corpus_pipeline import (
    curate_training_corpus,
)
from sentiment_analysis_data_engineering_spark.plans.registry import load_tables


def _docs(spark, sf_dir):
    (documents,) = load_tables(spark, sf_dir, "documents")
    return documents


def test_full_chain_accounting_and_leakproofness(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = curate_training_corpus(
        docs,
        eval_pred=F.col("doc_id") % 97 == 0,
        min_tokens=5,
        min_quality=0.3,
        source_cap=200,
        mixture_weights={"src0": 0.5, "src1": 0.3, "src2": 0.2},
        mixture_target_fraction=0.8,
    )
    try:
        counts = {r.stage: r.n_docs for r in out["stage_counts"].collect()}
        order = sorted(counts)
        assert len(order) == 7
        # monotone: every stage only removes documents
        for a, b in zip(order, order[1:]):
            assert counts[b] <= counts[a], (a, b, counts)
        assert counts["6_mixture_sampled"] > 0

        final_ids = {r.doc_id for r in out["documents"].collect()}
        eval_ids = {
            r.doc_id for r in docs.filter(F.col("doc_id") % 97 == 0).collect()
        }
        assert not (final_ids & eval_ids)  # eval rows never leak

        # chunks and packs belong exactly to surviving documents
        chunk_doc_ids = {
            r.doc_id for r in out["chunks"].select("doc_id").distinct().collect()
        }
        assert chunk_doc_ids == final_ids

        packed = out["packed"].collect()
        chunk_tokens = (
            out["chunks"].agg(F.sum("n_chunk_tokens").alias("s")).collect()[0]["s"]
        )
        assert sum(r.n_tokens for r in packed) == chunk_tokens  # conservation
        # no pack exceeds the budget unless it is a single long chunk
        by_pack: dict = {}
        for r in packed:
            by_pack.setdefault(r.pack_id, []).append(r.n_tokens)
        for members in by_pack.values():
            if len(members) > 1:
                assert sum(members) <= 256
    finally:
        release_pinned()


def test_near_dup_keeps_best_quality_survivor(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and keeps on "
        "running through the quiet green field toward the old farm "
        "house near the river bank every single morning"
    )
    rows = [
        (1, base + " extra tail words here", "web"),
        (2, base, "web"),  # near-dup cluster {1, 2}
        (3, "completely different text about spark query engines "
            "and distributed joins across many executors in a cluster "
            "with plenty of additional descriptive words included", "web"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curate_training_corpus(
        docs, min_tokens=5, min_quality=0.0, near_dup_threshold=0.5,
        persist=False,
    )
    ids = sorted(r.doc_id for r in out["documents"].collect())
    assert 3 in ids
    assert len([i for i in ids if i in (1, 2)]) == 1  # one survivor per cluster


def test_determinism_across_runs(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    kw = dict(min_tokens=5, min_quality=0.3,
              mixture_weights={"src0": 0.6, "src1": 0.4},
              mixture_target_fraction=0.5, persist=False)
    a = {r.doc_id for r in curate_training_corpus(docs, **kw)["documents"].collect()}
    b = {r.doc_id for r in curate_training_corpus(docs, **kw)["documents"].collect()}
    assert a == b and a

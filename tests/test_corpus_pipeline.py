"""End-to-end corpus curation: the north-star composition on real data."""

from pyspark.sql import functions as F

from deva_spark.plans.corpus import curate


def test_curate_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    curated, rep = curate(docs, min_quality=40.0, lang="en")

    # monotone funnel
    assert rep.input_docs >= rep.after_quality >= rep.after_exact_dedup >= rep.after_near_dedup
    assert rep.after_near_dedup == curated.count() > 0
    assert rep.surviving_tokens > 0

    # near-dups really removed: the curated set has no surviving LSH pair
    from deva_spark.functions import minhash as mh

    assert mh.near_duplicates(curated).count() == 0

    # deterministic keep policy: re-running with different partitioning
    # yields the same ids
    ids1 = sorted(r.doc_id for r in curated.collect())
    curated2, _ = curate(docs.repartition(7), min_quality=40.0, lang="en")
    ids2 = sorted(r.doc_id for r in curated2.collect())
    assert ids1 == ids2


def test_curate_llm_annotation_stage(spark, sf_dir):
    # curated corpus feeds the batched LLM stage (stub client)
    from deva_spark.functions import llm

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    curated, _ = curate(docs)
    prompts = curated.select(
        "doc_id", F.concat(F.lit("summarize: "), F.col("text")).alias("prompt")
    )
    out = llm.llm_stage(prompts)
    rows = out.collect()
    assert len(rows) == curated.count()
    assert all(r.completion.startswith("stub:") for r in rows)


def test_artifact_markers_and_idempotence(spark, sf_dir, tmp_path, monkeypatch):
    # staging is idempotent (second call reports 0.0s), and ivf16's
    # completion marker is its sidecar — a dir with only _SUCCESS (the
    # half-written state: parquet done, sidecar not yet) must read as
    # NOT staged, while plain artifacts complete on _SUCCESS alone.
    import os

    from deva_spark import queries as Q

    monkeypatch.setenv("DEVA_ARTIFACT_DIR", str(tmp_path))
    took = Q.stage_artifacts(spark, sf_dir, ["doc_stats", "ivf16"])
    assert took["doc_stats"] > 0 and took["ivf16"] > 0
    again = Q.stage_artifacts(spark, sf_dir, ["doc_stats", "ivf16"])
    assert again == {"doc_stats": 0.0, "ivf16": 0.0}

    ivf_path = Q.staged_artifact_path(sf_dir, "ivf16")
    assert ivf_path is not None
    os.remove(os.path.join(ivf_path, "_ivf_centers.json"))
    assert Q.staged_artifact_path(sf_dir, "ivf16") is None
    assert os.path.exists(os.path.join(ivf_path, "_SUCCESS"))
    assert Q.staged_artifact_path(sf_dir, "doc_stats") is not None

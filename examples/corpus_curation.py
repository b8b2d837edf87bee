"""Runnable tour of the LLM-corpus assembly line — the engine's
training-data side, the way examples/fininsight_migration.py tours the
reference's RAG side.

Takes the synthetic `documents` table through every curation stage with a
printed survivor count per stage, then shows the downstream artifacts a
training run actually consumes: packed shards, a token report per
source×split, and a dataset card. Each stage is an operator the oracle
suite verifies in isolation (pl_ccnet_e2e / dd_* / cu_* entries); this
script is the user-facing composition.

    python examples/corpus_curation.py [sf_dir]

Defaults to /root/testdata/sf0.01. Runs offline, nothing is downloaded.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_project_spark import io
from big_data_project_spark.operators import curation, dedup, text
from big_data_project_spark.pipelines.curation import curate_corpus
from big_data_project_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="corpus-curation-example")
    docs = io.load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    n0 = docs.count()
    print(f"corpus: {n0} documents from {sf_dir}")

    # --- stage by stage, counting survivors -------------------------------
    d = dedup.drop_exact_dups(docs)
    n1 = d.count()
    print(f"exact dedup          : {n1} kept ({n0 - n1} dropped)")

    # plan the banding BEFORE paying for it (round 10): the sampled
    # profile picks rows-per-band from the corpus's measured entropy,
    # and bucket_cap adds the exact guarded-load audit — the number the
    # production (hot-bucket-capped) pipeline will actually pay
    plan = dedup.suggest_minhash_params(
        d, threshold=0.5, hash_fn="md5_affine", bucket_cap=1024
    )
    print(
        f"banding plan         : k={plan['num_hashes']} "
        f"b={plan['bands']} (r={plan['rows_per_band']}), "
        f"guarded cand/doc ~{plan['est_cand_per_doc_capped']:.2f} "
        f"(within_budget={plan['within_budget']})"
    )

    cand = dedup.minhash_lsh_candidates(
        d, n=3, num_hashes=plan["num_hashes"], bands=plan["bands"],
        hash_fn="md5_affine",
    ).select("id_a", "id_b")
    pairs = dedup.jaccard_verify(d, cand, n=3, min_jaccard=0.5)
    d = dedup.drop_near_dups(d, pairs)
    n2 = d.count()
    print(f"near-dup (LSH) dedup : {n2} kept ({n1 - n2} dropped)")

    # decontaminate against a fake benchmark: the 20 longest documents
    # stand in for an eval set that must not leak into training
    eval_df = docs.orderBy(F.length("text").desc(), "doc_id").limit(20)
    d = dedup.decontaminate(d, eval_df, n=8)
    n3 = d.count()
    print(f"decontamination      : {n3} kept ({n2 - n3} dropped)")

    d = text.filter_quality(d, min_words=20)
    n4 = d.count()
    print(f"quality gates        : {n4} kept ({n3 - n4} dropped)")

    # --- the one-call composition (same stages, plus mixture/split/pack) --
    out = curate_corpus(
        docs,
        eval_df=eval_df,
        mixture={},  # uniform permille; pass e.g. {"src1": 500} to downweight
        default_permille=800,
        budget=256,
        n_shards=4,
        pair_source="lsh",
        lsh_hash_fn="md5_affine",
    ).cache()
    print("\ncurate_corpus() → (doc_id, source, split, shard, n_tokens, pack_id)")
    out.groupBy("split").agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.countDistinct("pack_id").alias("packs"),
    ).orderBy("split").show()

    # --- artifacts a training job consumes --------------------------------
    print(
        "pack budget check (budget=256, prefix next-fit): a pack's "
        "overshoot is bounded by its largest single document"
    )
    packs = out.groupBy("shard", "pack_id").agg(
        F.sum("n_tokens").alias("pack_tokens"),
        F.max("n_tokens").alias("largest_doc"),
    )
    packs.agg(
        F.avg("pack_tokens").alias("avg_pack_tokens"),  # ≈ budget
        F.max(F.col("pack_tokens") - F.col("largest_doc")).alias(
            "max_tokens_excluding_straddler"  # < budget by construction
        ),
    ).show()
    violations = packs.where(
        F.col("pack_tokens") - F.col("largest_doc") >= 256
    ).count()
    assert violations == 0, f"{violations} packs violate the bound"

    print("per-source training mix:")
    out.where(F.col("split") == "train").groupBy("source").agg(
        F.count("*").alias("docs"), F.sum("n_tokens").alias("tokens")
    ).orderBy(F.desc("tokens")).show(5)

    print("dataset card:")
    curation.dataset_card(
        out.select("doc_id").join(docs, "doc_id")
    ).show(truncate=False)

    # --- export: the curated training split as WebDataset tar shards ----
    import tempfile

    from big_data_project_spark.operators import multimodal

    export = (
        out.where(F.col("split") == "train")
        .join(docs, "doc_id")
        .select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    )
    tar_dir = tempfile.mkdtemp(prefix="curated_wds_")
    manifest = multimodal.write_tar_shards(export, tar_dir, n_shards=4, ext="txt")
    print("WebDataset export manifest (shard, members, bytes):")
    manifest.orderBy("shard").show()

    # --- incremental ingest: the NEXT crawl delta, deduped against the
    # admitted corpus via the persisted MinHash index (no corpus re-read;
    # the streaming twin is streaming.ops.near_dedup_stream) ------------
    admitted = out.select("doc_id").join(docs, "doc_id")
    index = dedup.minhash_index(admitted)  # persist this at 100 TB
    delta = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    ).limit(200)  # re-crawl: same contents under fresh ids
    fresh = dedup.dedup_delta_near(delta, index)
    print(
        f"incremental delta: {delta.count()} arriving, "
        f"{fresh.count()} genuinely new after near-dedup vs the index"
    )

    # --- continuous ingest: the same line as an UNBOUNDED stream --------
    # (near-dedup vs the admitted index -> quality gate -> exactly-once
    # batch-dir publish), then compaction folds the per-batch dirs into
    # O(1) base snapshots and admitted_corpus reads through them.
    import os
    import shutil
    import time as _time

    from big_data_project_spark.streaming import ops as st

    ingest_root = tempfile.mkdtemp(prefix="curated_stream_")
    drop_dir = os.path.join(ingest_root, "in")
    os.makedirs(drop_dir)
    for i, frame in enumerate(
        (docs.limit(150), delta.select("doc_id", "text").limit(80))
    ):
        staged = os.path.join(ingest_root, f"stage{i}")
        frame.select("doc_id", "text").coalesce(1).write.mode(
            "overwrite"
        ).parquet(staged)
        part = next(p for p in os.listdir(staged) if p.endswith(".parquet"))
        shutil.move(f"{staged}/{part}", f"{drop_dir}/b{i}.parquet")
        _time.sleep(1.1)  # distinct mtimes => deterministic batch order
    src = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    q = st.curate_stream(
        src,
        os.path.join(ingest_root, "out"),
        os.path.join(ingest_root, "ck"),
        min_words=5,
    )
    q.processAllAvailable()
    q.stop()
    st.compact_near_dedup(spark, os.path.join(ingest_root, "out"))
    admitted_now = st.admitted_corpus(spark, os.path.join(ingest_root, "out"))
    print(
        f"continuous ingest: {admitted_now.count()} docs admitted across "
        "2 micro-batches (near-dup re-deliveries dropped via the persisted "
        "index), index+data compacted to base snapshots"
    )

    spark.stop()


if __name__ == "__main__":
    main()

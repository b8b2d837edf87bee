"""End-to-end training-data curation: the full LLM-corpus assembly line as
ONE composed engine program —

    exact dedup → near-dup clustering drop → benchmark decontamination →
    quality gate → domain-mixture sample → train/val/test split →
    sequence packing

Every stage is an operator the engine already verifies in isolation; the
composition exists so a user gets the whole recipe (and the registry gets a
single value-hashed oracle proving the stages compose, not just pass
individually — `pl_curation_e2e`).

Scale shape (sum of parts, no new shuffles introduced by composing):
fingerprint window + shingle joins + pair-graph components (pair graph ≪
corpus) + eval semi/anti joins + map-side gates/mixes/splits + per-shard
packing windows. Nothing collects, nothing broadcasts unconditionally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_project_spark.plans.lineage import lineage_cut

from big_data_project_spark.operators import curation, dedup
from big_data_project_spark.operators.text import filter_quality, words_col


def curate_corpus(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    min_words: int = 20,
    min_diversity: float = 0.3,
    mixture: dict[str, int] | None = None,
    default_permille: int = 1000,
    budget: int = 512,
    n_shards: int = 8,
    seed: int = 7,
    pair_source: str = "exact",
    lsh_hash_fn: str = "xxhash64",
    lsh_min_est_jaccard: float | None = None,
    lsh_hash_shingles: bool = False,
    lsh_params: str | tuple[int, int] | None = None,
    lsh_drift_factor: float = 8.0,
) -> DataFrame:
    """Run the whole curation line over a ``documents``-shaped frame
    (doc_id, source, text). Returns one row per surviving document with its
    split assignment and pack location:
    ``(doc_id, source, split, shard, n_tokens, pack_id)``.

    ``mixture=None`` skips the sampling stage entirely; ``mixture={}``
    applies ``default_permille`` uniformly. The split stage hashes with
    ``seed + 1``, NOT the mixture's seed: with a shared bucket, mixture
    rates <= 200 permille would keep exactly the bucket range the split
    assigns to test/val and the training set would come out EMPTY — the
    stages must subsample independently.

    ``pair_source`` picks the near-dup pair generator:

    - ``"exact"`` (default): all-pairs n-gram Jaccard — engine-mirrorable
      (the pl_curation_e2e oracle), but its shingle self-join is quadratic
      per hot shingle. Correctness reference and small/medium corpora.
    - ``"lsh"``: MinHash-LSH candidates verified by exact Jaccard on the
      candidate pairs only — the 100 TB path (linear shuffles, no
      all-pairs stage; the verify join touches just the blocked
      candidates). Band recall < 1 can only MISS pairs, never invent
      them, so every exact-mode survivor also survives lsh mode
      (asserted in tests). ``lsh_hash_fn="md5_affine"`` makes the block
      stage engine-exact too (see minhash_signatures_agg) — the whole
      lsh-mode line then carries a value-hash oracle (dd_near_dedup_lsh).

    ``lsh_min_est_jaccard`` / ``lsh_hash_shingles`` — the lsh-mode scale
    knobs (round 8): the signature-agreement candidate prefilter and the
    hashed-long verify join (see :func:`operators.dedup.
    minhash_lsh_candidates` / :func:`operators.dedup.jaccard_verify`).
    Set ``lsh_min_est_jaccard≈0.3`` (verify threshold 0.5 − margin 0.2)
    on low-entropy corpora where band buckets collide far above the
    true-Jaccard rate — value-hash-pinned by dd_near_dedup_lsh_prefilter.

    ``lsh_drift_factor`` (round 9, VERDICT r8 #6 — the sf25 post-mortem's
    "monitor cand/doc" takeaway as code): in ``lsh_params="auto"`` mode,
    after candidates are built the REALIZED cand/doc is compared against
    the profile's ``est_cand_per_doc`` prediction; past
    ``max(est, 1) × lsh_drift_factor`` a UserWarning fires naming both
    numbers and the mitigations (raise ``lsh_min_est_jaccard``,
    re-profile with a bigger sample, pre-shard by entropy). The profile
    comes from a 2000-doc sample — a corpus whose duplicate/entropy
    structure the sample under-represents is exactly how the sf25 run
    died, and the drift is visible the moment candidates exist, long
    before the verify shuffle spills. Cost (auto mode only): ONE extra
    eager job — a count over the lineage-cut candidates the verify
    stage consumes anyway; the corpus doc count reuses the figure the
    profiling job already computed (ADVICE r9).

    ``lsh_params`` sizes the banding: ``None`` keeps the
    minhash_lsh_candidates defaults (k=64, 16 bands), an ``(num_hashes,
    bands)`` tuple pins it, and ``"auto"`` runs
    :func:`operators.dedup.suggest_minhash_params` on the deduped corpus
    (threshold 0.5 = this pipeline's verify threshold, honoring
    ``lsh_min_est_jaccard`` so the prediction is post-prefilter verify
    load) and uses its pick — the measured-entropy sizing from the sf25
    post-mortem, one eager profiling job before the dedup plan is
    built."""
    d = dedup.drop_exact_dups(docs)
    if pair_source == "exact":
        pairs = dedup.jaccard_pairs(d, n=3, min_jaccard=0.5)
    elif pair_source == "lsh":
        if lsh_params == "auto":
            sug = dedup.suggest_minhash_params(
                d, threshold=0.5, hash_fn=lsh_hash_fn,
                min_est_jaccard=lsh_min_est_jaccard,
            )
            lsh_k, lsh_bands = sug["num_hashes"], sug["bands"]
        elif lsh_params is not None:
            lsh_k, lsh_bands = lsh_params
        else:
            lsh_k, lsh_bands = 64, 16
        # one tokenize pass shared by block and verify (round 7)
        sh = dedup.doc_shingles(d, "text", "doc_id", 3).transform(lineage_cut)
        cand = dedup.minhash_lsh_candidates(
            d, n=3, num_hashes=lsh_k, bands=lsh_bands, hash_fn=lsh_hash_fn,
            include_est_jaccard=False,
            shingles=sh, min_est_jaccard=lsh_min_est_jaccard,
        )
        if lsh_params == "auto":
            # drift guard (r9, VERDICT r8 #6): the profile predicted
            # cand/doc from a sample — verify the corpus agrees before
            # the verify join pays for the difference. The cut also
            # keeps the verify stage from re-blocking.
            cand = cand.transform(lineage_cut)
            # the profiling job already counted the deduped corpus —
            # reuse it instead of re-running the drop_exact_dups stage
            # (ADVICE r9: the re-count was a second full extra job)
            n_docs = max(int(sug["n_docs"]), 1)
            realized = cand.count() / n_docs
            predicted = max(float(sug["est_cand_per_doc"]), 1.0)
            if realized > predicted * lsh_drift_factor:
                import warnings

                warnings.warn(
                    "curate_corpus(lsh_params='auto'): realized "
                    f"candidates/doc = {realized:.1f} exceeds the "
                    f"sampled profile's prediction ({predicted:.1f}) by "
                    f"more than {lsh_drift_factor}x — the 2000-doc "
                    "profile under-represents this corpus's duplicate/"
                    "entropy structure (the sf25 failure shape). The "
                    "verify join will be much larger than planned: "
                    "consider lsh_min_est_jaccard~=(threshold-0.2), a "
                    "larger profiling sample, or sharding the corpus "
                    "by entropy before dedup.",
                    stacklevel=2,
                )
        pairs = dedup.jaccard_verify(
            d, cand, n=3, min_jaccard=0.5, shingles=sh,
            hash_shingles=lsh_hash_shingles,
        )
    else:
        raise ValueError("pair_source must be 'exact' or 'lsh'")
    d = dedup.drop_near_dups(d, pairs)
    if eval_df is not None:
        d = dedup.decontaminate(d, eval_df, n=8)
    # full Gopher/C4 rule set (word count, mean word length, dup-trigram
    # rate, stopword floor, alpha ratio — all integer-exact thresholds;
    # round 3 replaced the bare word-count gate) plus the lexical-diversity
    # rule the rule set doesn't carry.
    d = filter_quality(d, min_words=min_words)
    w = words_col("text")
    # try_divide: Catalyst may reorder this predicate ahead of the quality
    # gate that removes 0-word docs; a NULL ratio filters false (dropped)
    # instead of aborting the job under ANSI mode
    d = d.where(
        F.try_divide(F.size(F.array_distinct(w)), F.size(w)) >= min_diversity
    )
    if mixture is not None:
        d = curation.sample_mixture(
            d, mixture, default_permille=default_permille, seed=seed
        )
    # split is a pure map-side column — derive it in the same pass the
    # packer consumes and carry it through, instead of forking the whole
    # upstream line into two branches recombined by a shuffle join (the
    # fork re-executed every dedup/decontaminate/quality stage twice)
    d = curation.train_val_test_split(d, "doc_id", seed=seed + 1)
    return curation.pack_by_token_budget(
        d, budget=budget, n_shards=n_shards, carry=("source", "split")
    ).select("doc_id", "source", "split", "shard", "n_tokens", "pack_id")

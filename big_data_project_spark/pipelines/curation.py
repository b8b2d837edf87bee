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
    shard_by_entropy: bool | str = False,
    entropy_shards: int = 4,
    entropy_hot_shingles: int | None = None,
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

    ``lsh_drift_factor`` (round 9, VERDICT r8 #6; recalibrated round 10
    — VERDICT r9 #3): in ``lsh_params="auto"`` mode TWO apples-to-apples
    drift checks guard the plan, each firing a UserWarning past the
    factor:

    - PLAN-TIME sample blindness: the sampled profile's unguarded
      prediction vs the capped-load audit's EXACT unguarded figure —
      a gap means the md5 sample missed part of the corpus's
      duplicate/entropy structure (the sf25 shape), visible before any
      candidate is built.
    - RUN-TIME mutation: realized cand/doc vs the audit's CAPPED
      figure (``est_cand_per_doc_capped`` — exact and models the
      hot-bucket guard the candidate run below actually has; at sf50
      within 5% of realized where r9's unguarded sampled figure read
      3.5× over purely because the guard was unmodeled). The audit is
      exact for the corpus it scanned, so a fire here means the corpus
      changed between planning and blocking.

    Mitigations named in both: raise ``lsh_min_est_jaccard``, a larger
    profiling sample, entropy-sharding via
    :func:`operators.dedup.shard_by_entropy`. Cost (auto mode only):
    TWO extra eager jobs — the linear capped-load audit at the chosen
    config (shares the tokenize pass; no self-join) and a count over
    the lineage-cut candidates the verify stage consumes anyway; the
    corpus doc count reuses the figure the profiling job already
    computed (ADVICE r9).

    ``lsh_params`` sizes the banding: ``None`` keeps the
    minhash_lsh_candidates defaults (k=64, 16 bands), an ``(num_hashes,
    bands)`` tuple pins it, and ``"auto"`` runs
    :func:`operators.dedup.suggest_minhash_params` on the deduped corpus
    (threshold 0.5 = this pipeline's verify threshold, honoring
    ``lsh_min_est_jaccard`` so the prediction is post-prefilter verify
    load) and uses its pick — the measured-entropy sizing from the sf25
    post-mortem, one eager profiling job before the dedup plan is
    built.

    ``shard_by_entropy`` (round 11, VERDICT r10 #7 — the drift guard's
    own advice, wired): ``True`` entropy-shards the deduped corpus
    (:func:`operators.dedup.shard_by_entropy`, sharing this pipeline's
    tokenize pass) and scopes the LSH band keys per shard
    (``minhash_lsh_candidates(shard_col=...)``) — candidates form
    within shards only, at the documented recall trade (mixed corpora
    only; a homogeneous corpus lands in one shard and nothing changes).
    ``"auto"`` arms it on the PLAN-TIME blindness signal: sharding
    engages only when the sampled profile under-predicts the exact
    unguarded audit by more than ``lsh_drift_factor`` — the flood shape
    sharding exists for. Because that firing means md5 samples are
    blind to the flood, auto mode profiles the hot-shingle set from
    the FULL corpus (``sample_docs=None`` — one linear count, no
    sample to be blind). Requires ``pair_source="lsh"`` (exact mode has
    no band keys to scope); ``"auto"`` additionally requires
    ``lsh_params="auto"`` (the audit is its trigger signal).
    ``entropy_shards`` / ``entropy_hot_shingles`` forward to
    :func:`operators.dedup.shard_by_entropy` — size the hot set to
    ~2x the suspect subpopulation's distinct shingles when known."""
    if shard_by_entropy not in (False, True, "auto"):
        raise ValueError("shard_by_entropy must be False, True or 'auto'")
    if shard_by_entropy and pair_source != "lsh":
        raise ValueError(
            "shard_by_entropy requires pair_source='lsh' — exact mode "
            "has no band keys to shard-scope"
        )
    if shard_by_entropy == "auto" and lsh_params != "auto":
        raise ValueError(
            "shard_by_entropy='auto' keys off the lsh_params='auto' "
            "capped-load audit; pass lsh_params='auto' (or "
            "shard_by_entropy=True to shard unconditionally)"
        )
    d = dedup.drop_exact_dups(docs)
    if pair_source == "exact":
        pairs = dedup.jaccard_pairs(d, n=3, min_jaccard=0.5)
    elif pair_source == "lsh":
        # one tokenize pass shared by block, verify AND (in auto mode)
        # the planner's capped-load audit (round 7 / round 10)
        sh = dedup.doc_shingles(d, "text", "doc_id", 3).transform(lineage_cut)
        plan_blind = False
        if lsh_params == "auto":
            sug = dedup.suggest_minhash_params(
                d, threshold=0.5, hash_fn=lsh_hash_fn,
                min_est_jaccard=lsh_min_est_jaccard,
                # model the guard the candidate run below actually has
                # (round 10): the drift prediction is then the GUARDED
                # load — at sf50 the unguarded prediction read 3.5x over
                # realized purely because the guard was unmodeled
                bucket_cap=dedup.DEFAULT_BUCKET_CAP,
                shingles=sh,
            )
            lsh_k, lsh_bands = sug["num_hashes"], sug["bands"]
            # PLAN-TIME drift check (round 10): compare the sampled
            # UNGUARDED incidence prediction against the audit's exact
            # unguarded incidences — same units (a high-J pair recurs
            # in many bands, so distinct-pair figures are NOT
            # comparable to the audit), so a gap is sample blindness
            # (a flood living outside the md5 sample, the sf25 shape),
            # visible before a single candidate is built.
            sampled_unf = max(
                float(sug["est_incidences_per_doc_sampled"]), 1.0
            )
            exact_unf = float(sug["est_cand_per_doc_uncapped_exact"])
            plan_blind = exact_unf > sampled_unf * lsh_drift_factor
            if plan_blind:
                import warnings

                auto_note = (
                    " shard_by_entropy='auto' is armed: entropy-"
                    "sharding ENGAGES for this run (full-corpus hot "
                    "set)."
                    if shard_by_entropy == "auto"
                    else ""
                )
                warnings.warn(
                    "curate_corpus(lsh_params='auto'): exact unguarded "
                    f"candidates/doc = {exact_unf:.1f} (capped-load "
                    "audit, band incidences) exceeds the sampled "
                    f"profile's prediction ({sampled_unf:.1f}) by more "
                    f"than {lsh_drift_factor}x — the profiling sample "
                    "is blind to part of this corpus's duplicate/"
                    "entropy structure (the sf25 failure shape). The "
                    "hot-bucket guard will carry the excess at its "
                    "documented recall trade: consider "
                    "lsh_min_est_jaccard~=(threshold-0.2), a larger "
                    "profiling sample, or entropy-sharding the corpus "
                    "before dedup (shard_by_entropy=True|'auto' here, "
                    "or dedup.shard_by_entropy + "
                    "minhash_lsh_candidates(shard_col=...))."
                    + auto_note,
                    stacklevel=2,
                )
        elif lsh_params is not None:
            lsh_k, lsh_bands = lsh_params
        else:
            lsh_k, lsh_bands = 64, 16
        # entropy sharding (VERDICT r10 #7): True = always; "auto" =
        # only when the plan-time blindness signal fired. The shard
        # assignment shares this pipeline's tokenize stream; in auto
        # mode the hot set is profiled from the FULL corpus
        # (sample_docs=None) because the trigger itself proved md5
        # samples blind to the flood the sharding must contain.
        do_shard = shard_by_entropy is True or (
            shard_by_entropy == "auto" and plan_blind
        )
        if do_shard:
            shard_kw: dict = {"n_shards": entropy_shards, "shingles": sh}
            if entropy_hot_shingles is not None:
                shard_kw["hot_shingles"] = entropy_hot_shingles
            if shard_by_entropy == "auto":
                shard_kw["sample_docs"] = None
            d = dedup.shard_by_entropy(d, **shard_kw)
        cand = dedup.minhash_lsh_candidates(
            d, n=3, num_hashes=lsh_k, bands=lsh_bands, hash_fn=lsh_hash_fn,
            include_est_jaccard=False,
            shingles=sh, min_est_jaccard=lsh_min_est_jaccard,
            shard_col="entropy_shard" if do_shard else None,
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
            # compare against the GUARDED prediction (round 10): the
            # exact capped audit, not the sampled unguarded figure —
            # realized candidates come from the guarded pipeline
            predicted = max(float(sug["est_cand_per_doc_capped"]), 1.0)
            if realized > predicted * lsh_drift_factor:
                import warnings

                warnings.warn(
                    "curate_corpus(lsh_params='auto'): realized "
                    f"candidates/doc = {realized:.1f} exceeds the "
                    f"capped-audit prediction ({predicted:.1f}) by "
                    f"more than {lsh_drift_factor}x — the audit is "
                    "exact for the corpus it scanned, so this means "
                    "the corpus MUTATED between planning and blocking. "
                    "The verify join will be much larger than planned: "
                    "re-plan on the current corpus (re-run "
                    "lsh_params='auto'), or entropy-shard it first "
                    "(dedup.shard_by_entropy + "
                    "minhash_lsh_candidates(shard_col=...)).",
                    stacklevel=2,
                )
        pairs = dedup.jaccard_verify(
            d, cand, n=3, min_jaccard=0.5, shingles=sh,
            hash_shingles=lsh_hash_shingles,
        )
    else:
        raise ValueError("pair_source must be 'exact' or 'lsh'")
    d = dedup.drop_near_dups(d, pairs)
    # the entropy-shard column is block-stage plumbing, not output
    # schema (and "shard" in the RESULT is the packing shard) — drop is
    # a no-op when sharding didn't run
    d = d.drop("entropy_shard")
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

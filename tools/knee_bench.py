#!/usr/bin/env python
"""Root-cause instrumentation for the dd_near_dedup_lsh scale curve
(VERDICT r7 #1: isolated 5.3s sf1 → 36.1s sf5 is 6.8× for 5× docs, while
sf5 → sf10 is a clean 2.0× — is the knee the PLAN or the GENERATOR?).

For each sf dir, runs the EXACT registry dd_near_dedup_lsh chain
(md5-affine MinHash-LSH blocking → exact Jaccard verify on blocked
candidates → connected components → drop) in a FRESH subprocess and
records, per stage:

- row counts: docs, shingles, candidate pairs, verified pairs
  (≥ 0.5 Jaccard), docs-in-≥1-pair, survivors. FINDING (round 8, see
  SCALE.md "Round-8 knee root-cause"): on the fixed-30-word-vocabulary
  corpora the verified-pair count is ZERO at sf1+ — the knee is
  false-positive candidate growth from MinHash min-collisions on a
  low-entropy shingle space, not true duplicate density and not the
  plan;
- wall seconds per stage (block / verify / cluster+drop);
- shuffle read/write bytes per stage (AppStatusStore executor totals
  sampled between stages — private[spark] is public in bytecode, so the
  py4j call works on a vanilla session).

Usage:  python tools/knee_bench.py DIR [DIR ...]
Internal: python tools/knee_bench.py --measure DIR   (one fresh-JVM run)

Appends one record per dir to bench_history.jsonl
(metric=dd_near_dedup_lsh_knee) and prints a per-sf table at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _shuffle_totals(spark) -> tuple[int, int]:
    """(read, write) bytes across all executors so far."""
    store = spark.sparkContext._jsc.sc().statusStore()
    it = store.executorList(False).iterator()
    r = w = 0
    while it.hasNext():
        e = it.next()
        r += e.totalShuffleRead()
        w += e.totalShuffleWrite()
    return r, w


def measure(
    sf_dir: str,
    num_hashes: int,
    bands: int,
    min_est: float | None = None,
    hash_shingles: bool = False,
    shards: int | None = None,
    hot_shingles: int | None = None,
) -> None:
    from pyspark.sql import functions as F

    from big_data_project_spark import io, registry
    from big_data_project_spark.operators import dedup
    from big_data_project_spark.session import get_spark

    # 32g driver like bench.py: at sf25 (1.25M docs, ~44M shingle rows)
    # the default 8g evicts localCheckpoint blocks mid-job and the scan
    # dies on missing temp_local_* files — the local-mode analogue of the
    # executor-loss caveat spark.bdps.lineageCut exists for
    spark = get_spark(
        app_name="knee-measure",
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
    )
    d = io.load_table(spark, sf_dir, "documents")
    n_docs = d.count()  # warm the scan outside the timed window
    rec: dict = {"metric": "dd_near_dedup_lsh_knee", "sf_dir": sf_dir,
                 "n_docs": n_docs,
                 "num_hashes": num_hashes or registry._MH_K,
                 "bands": bands or registry._MH_BANDS,
                 "min_est_jaccard": min_est,
                 "hash_shingles": hash_shingles,
                 "entropy_shards": shards,
                 "hot_shingles": hot_shingles}

    r0, w0 = _shuffle_totals(spark)
    t0 = time.monotonic()
    # ---- stage 0 (--shards): entropy shard assignment ------------------
    if shards is not None:
        # --hot-shingles forwards (ADVICE r10): shard_by_entropy's
        # default hot set (256) collapsed the measured 230k-doc mixed
        # corpus to ONE shard — the documented sharding win needed 2048.
        # Without the flag the CLI could not reproduce SCALE.md's number.
        kw = {} if hot_shingles is None else {"hot_shingles": hot_shingles}
        d = dedup.shard_by_entropy(d, n_shards=shards, **kw).localCheckpoint(
            eager=True
        )
    # ---- stage 1: shared tokenize + blocked candidates ----------------
    sh = dedup.doc_shingles(d, "text", "doc_id", 3).localCheckpoint(
        eager=False
    )
    cand = dedup.minhash_lsh_candidates(
        d,
        num_hashes=num_hashes or registry._MH_K,
        bands=bands or registry._MH_BANDS,
        hash_fn="md5_affine",
        include_est_jaccard=False,
        shingles=sh,
        min_est_jaccard=min_est,
        shard_col="entropy_shard" if shards is not None else None,
    ).localCheckpoint(eager=False)
    rec["n_candidates"] = cand.count()
    t1 = time.monotonic()
    r1, w1 = _shuffle_totals(spark)
    # ---- stage 2: exact Jaccard verify ---------------------------------
    pairs = dedup.jaccard_verify(
        d, cand, n=3, min_jaccard=0.5, shingles=sh,
        hash_shingles=hash_shingles,
    ).localCheckpoint(eager=False)
    rec["n_verified_pairs"] = pairs.count()
    t2 = time.monotonic()
    r2, w2 = _shuffle_totals(spark)
    # ---- stage 3: connected components + drop --------------------------
    rec["n_survivors"] = dedup.drop_near_dups(d, pairs).count()
    t3 = time.monotonic()
    r3, w3 = _shuffle_totals(spark)

    rec["n_shingles"] = sh.count()
    rec["docs_in_pairs"] = (
        pairs.select(F.col("id_a").alias("i"))
        .unionByName(pairs.select(F.col("id_b").alias("i")))
        .distinct()
        .count()
    )
    rec.update(
        block_sec=round(t1 - t0, 3),
        verify_sec=round(t2 - t1, 3),
        cluster_sec=round(t3 - t2, 3),
        total_sec=round(t3 - t0, 3),
        shuffle_write_mb={
            "block": round((w1 - w0) / 1e6, 1),
            "verify": round((w2 - w1) / 1e6, 1),
            "cluster": round((w3 - w2) / 1e6, 1),
        },
        shuffle_read_mb={
            "block": round((r1 - r0) / 1e6, 1),
            "verify": round((r2 - r1) / 1e6, 1),
            "cluster": round((r3 - r2) / 1e6, 1),
        },
        cand_per_doc=round(rec["n_candidates"] / n_docs, 4),
        pairs_per_doc=round(rec["n_verified_pairs"] / n_docs, 4),
    )
    print(json.dumps(rec))
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="*")
    ap.add_argument("--measure", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--num-hashes", type=int, default=0,
                    help="override MinHash k (default: registry _MH_K)")
    ap.add_argument("--bands", type=int, default=0,
                    help="override band count (default: registry _MH_BANDS)")
    ap.add_argument("--min-est", type=float, default=None,
                    help="min_est_jaccard candidate prefilter (round 8: "
                    "signature-agreement bound applied before verify)")
    ap.add_argument("--hash-shingles", action="store_true",
                    help="verify over xxhash64(shingle) longs instead of "
                    "strings (~3x less verify shuffle)")
    ap.add_argument("--suggest", action="store_true",
                    help="skip the measurement; run "
                    "dedup.suggest_minhash_params on each corpus (the "
                    "knee analysis as an API) and record what banding it "
                    "recommends for the corpus's measured entropy")
    ap.add_argument("--suggest-sample", type=int, default=2000,
                    help="sample size for --suggest (default 2000)")
    ap.add_argument("--shards", type=int, default=None,
                    help="entropy-shard the corpus first (round 10, "
                    "VERDICT r9 #5): shard_by_entropy + shard-scoped "
                    "band keys; candidates form within shards only "
                    "(documented recall trade)")
    ap.add_argument("--hot-shingles", type=int, default=None,
                    help="forwarded to shard_by_entropy with --shards "
                    "(ADVICE r10): size the hot-shingle set to ~2x the "
                    "suspect subpopulation's distinct shingles (SCALE.md "
                    "measured the mixed-corpus win at 2048; the default "
                    "256 collapses that case to one shard)")
    ap.add_argument("--cap", type=int, default=None,
                    help="model the hot-bucket guard in --suggest: run "
                    "the exact capped-load audit at the chosen config "
                    "(round 10 — pass the bucket_cap the dedup run "
                    "will use, normally 1024)")
    args = ap.parse_args()
    if args.suggest:
        if not args.dirs:
            ap.error("give at least one sf dir")
        from big_data_project_spark import io
        from big_data_project_spark.operators import dedup
        from big_data_project_spark.session import get_spark

        spark = get_spark(app_name="knee-suggest")
        for d in args.dirs:
            df = io.load_table(spark, d, "documents")
            s = dedup.suggest_minhash_params(
                df, hash_fn="md5_affine", sample_docs=args.suggest_sample,
                # --min-est composes (r9, VERDICT r8 #4): the profile then
                # predicts POST-prefilter verify load and sizes banding
                # for the prefiltered pipeline
                min_est_jaccard=args.min_est,
                # --cap composes (r10, VERDICT r9 #3): the chosen config
                # additionally gets the exact guarded-load audit
                bucket_cap=args.cap,
            )
            rec = {
                "metric": "dd_lsh_autotune_suggest", "sf_dir": d,
                "min_est_jaccard": args.min_est,
                **{k: v for k, v in s.items() if k != "fp_band_rates"},
                "fp_band_rates": {str(k): v for k, v in s["fp_band_rates"].items()},
            }
            with open(os.path.join(REPO, "bench_history.jsonl"), "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            print(json.dumps(rec))
        spark.stop()
        return 0
    if args.measure:
        measure(args.measure, args.num_hashes, args.bands,
                args.min_est, args.hash_shingles, args.shards,
                args.hot_shingles)
        return 0
    if not args.dirs:
        ap.error("give at least one sf dir")
    recs = []
    for d in args.dirs:
        cmd = [sys.executable, os.path.abspath(__file__), "--measure", d,
               "--num-hashes", str(args.num_hashes), "--bands", str(args.bands)]
        if args.min_est is not None:
            cmd += ["--min-est", str(args.min_est)]
        if args.hash_shingles:
            cmd.append("--hash-shingles")
        if args.shards is not None:
            cmd += ["--shards", str(args.shards)]
        if args.hot_shingles is not None:
            cmd += ["--hot-shingles", str(args.hot_shingles)]
        out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        if out.returncode != 0:
            sys.exit(f"--measure {d} failed:\n{out.stderr[-4000:]}")
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        recs.append(rec)
        with open(os.path.join(REPO, "bench_history.jsonl"), "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(f"{d}: {rec['total_sec']}s", file=sys.stderr)
    hdr = ("dir docs shingles cands pairs cand/doc pairs/doc "
           "block_s verify_s cluster_s total_s")
    print(hdr)
    for r in recs:
        print(
            f"{os.path.basename(r['sf_dir'])} {r['n_docs']} "
            f"{r['n_shingles']} {r['n_candidates']} {r['n_verified_pairs']} "
            f"{r['cand_per_doc']} {r['pairs_per_doc']} {r['block_sec']} "
            f"{r['verify_sec']} {r['cluster_sec']} {r['total_sec']}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Property-based tests (SURVEY §5.2) for the §1.4 semantics gotchas:
normalize_text vs a Python-re reference model, comma-money parsing,
concat_ws null behavior, deterministic dedup. Hypothesis generates the
corpus; Spark evaluates in one batch per test for speed."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_project_spark.operators import cleaning

# printable-ish text including html tags, punctuation, unicode
TEXTS = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
        max_size=60,
    ).map(lambda s: s.replace("\x00", "")),
    min_size=1,
    max_size=20,
)


def py_normalize(s: str) -> str:
    """The reference's clean_text (py:340-343) as a plain-Python model."""
    s = s.lower()
    s = re.sub(r"<[^>]*>", "", s)
    # re.ASCII: Java's \s (Spark regexp_replace) is ASCII-only — Python's
    # unicode \s would additionally match NBSP/NEL and diverge.
    s = re.sub(r"[^a-zA-Z0-9\s]", "", s, flags=re.ASCII)
    return s


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(TEXTS)
def test_normalize_text_matches_python_model(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {
        r.i: r.n
        for r in df.select("i", cleaning.normalize_text_col("t").alias("n")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == py_normalize(t), (t, got[i], py_normalize(t))


MONEYS = st.lists(
    st.one_of(
        st.none(),
        st.floats(min_value=0, max_value=1e12, allow_nan=False).map(
            lambda v: f"{v:,.2f}"
        ),
        st.floats(min_value=0, max_value=1e6, allow_nan=False).map(
            lambda v: f"{v:.2f}"
        ),
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(MONEYS)
def test_parse_money_matches_python_model(spark, moneys):
    df = spark.createDataFrame([(i, m) for i, m in enumerate(moneys)], "i long, m string")
    got = {
        r.i: r.p
        for r in df.select(
            "i", cleaning.parse_money("m", default=0.0).alias("p")
        ).collect()
    }
    for i, m in enumerate(moneys):
        want = 0.0 if m is None else float(m.replace(",", ""))
        assert got[i] == want, (m, got[i], want)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3), st.integers(0, 1000)),
        min_size=1,
        max_size=50,
    )
)
def test_dedup_deterministic_is_stable_and_minimal(spark, rows):
    """For every key the kept row is exactly min(tiebreak); row count equals
    the number of distinct keys; repeated runs agree."""
    df = spark.createDataFrame(
        [(a, b, c) for a, b, c in rows], "k1 int, k2 int, v int"
    )
    out1 = {
        (r.k1, r.k2): r.v
        for r in cleaning.dedup_deterministic(df, ["k1", "k2"], ["v"]).collect()
    }
    out2 = {
        (r.k1, r.k2): r.v
        for r in cleaning.dedup_deterministic(df, ["k1", "k2"], ["v"]).collect()
    }
    assert out1 == out2
    want = {}
    for a, b, c in rows:
        key = (a, b)
        want[key] = min(want.get(key, c), c)
    assert out1 == want


def test_record_id_null_behavior(spark):
    """concat_ws skips nulls (unlike SQL || which nulls out) — the §1.4.2
    intent: a null ticker still yields a usable id."""
    df = spark.createDataFrame(
        [("aapl", "apple"), (None, "cash"), ("msft", None)], "t string, n string"
    )
    got = [r.rid for r in df.select(cleaning.record_id("t", "n").alias("rid")).collect()]
    assert got == ["aapl_apple", "cash", "msft"]


def test_chunking_overlap_reconstruction(spark):
    from big_data_project_spark.operators import text as tx

    words = " ".join(f"w{i}" for i in range(230))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    chunks = {r.chunk_id: r for r in tx.chunk_documents(df, 100, 20).collect()}
    # step = 80: starts at 0, 80, 160 → 3 chunks
    assert sorted(chunks) == [0, 1, 2]
    assert chunks[0].n_words == 100 and chunks[2].n_words == 70
    # consecutive chunks share exactly `overlap` words
    c0, c1 = chunks[0].chunk_text.split(), chunks[1].chunk_text.split()
    assert c0[-20:] == c1[:20]
    # concatenation with overlaps removed reconstructs the document
    rebuilt = c0 + c1[20:] + chunks[2].chunk_text.split()[20:]
    assert rebuilt == words.split()


def test_redact_pii_catches_planted_spans(spark):
    from big_data_project_spark.operators import text as tx

    df = spark.createDataFrame(
        [(1, "mail me at a.b+c@mail.co or call +1-555-0147 ssn 123-45-6789 ok")],
        "doc_id long, text string",
    )
    out = tx.redact_pii(df).collect()[0].redacted
    assert "[EMAIL]" in out and "[PHONE]" in out and "[SSN]" in out
    assert "mail.co" not in out and "555" not in out and "6789" not in out


def test_repetition_score_discriminates(spark):
    from big_data_project_spark.operators import text as tx

    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c a b c a b c a b c")],
        "doc_id long, text string",
    )
    scores = {r.doc_id: r.repetition_ratio for r in tx.repetition_score(df).collect()}
    assert scores[1] == 0.0
    assert scores[2] > 0.5


def test_repetition_score_short_docs_no_ansi_error(spark):
    """Docs with <3 words must not trip ANSI INVALID_ARRAY_INDEX_IN_ELEMENT_AT
    (Spark 4 default); they score 0 repetition via the try_element_at path."""
    from big_data_project_spark.operators import text as tx

    df = spark.createDataFrame(
        [(1, "solo"), (2, "two words"), (3, ""), (4, "a b c")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in tx.repetition_score(df).collect()}
    assert len(rows) == 4
    for d in (1, 2, 3):
        assert rows[d].repetition_ratio == 0.0
    assert rows[4].n_trigrams == 1


def test_curation_sample_split_properties(spark, sf_dir):
    """Deterministic sampling/splitting: rerun-stable selection, rate within
    binomial tolerance, splits disjoint+exhaustive, sample ⊂ corpus."""
    from big_data_project_spark import io
    from big_data_project_spark.operators import curation as cu

    docs = io.load_table(spark, sf_dir, "documents")
    n = docs.count()

    s1 = cu.deterministic_sample(docs, "doc_id", permille=100, seed=7)
    s2 = cu.deterministic_sample(docs, "doc_id", permille=100, seed=7)
    ids1 = {r.doc_id for r in s1.select("doc_id").collect()}
    ids2 = {r.doc_id for r in s2.select("doc_id").collect()}
    assert ids1 == ids2  # rerun-stable
    assert 0.03 * n <= len(ids1) <= 0.25 * n  # ~10% within wide tolerance
    # different seed → different (but still ~10%) selection
    ids3 = {
        r.doc_id
        for r in cu.deterministic_sample(docs, "doc_id", permille=100, seed=8)
        .select("doc_id")
        .collect()
    }
    assert ids3 != ids1

    split = cu.train_val_test_split(docs, "doc_id", seed=7)
    counts = {
        r.split: r.n
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == n
    assert counts["train"] > counts["val"] + counts["test"]


def test_curation_cap_per_key(spark, sf_dir):
    from pyspark.sql.window import Window

    from big_data_project_spark import io
    from big_data_project_spark.operators import curation as cu

    docs = io.load_table(spark, sf_dir, "documents")
    capped = cu.cap_per_key(docs, "source", "doc_id", 5)
    per = capped.groupBy("source").agg(F.count("*").alias("n")).collect()
    assert all(r.n <= 5 for r in per)
    # kept rows are each source's HIGHEST doc_ids
    w = Window.partitionBy("source").orderBy(F.col("doc_id").desc())
    top = {
        (r.source, r.doc_id)
        for r in docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("source", "doc_id")
        .collect()
    }
    got = {(r.source, r.doc_id) for r in capped.select("source", "doc_id").collect()}
    assert got == top


def test_decontaminate_removes_planted_leak(spark, sf_dir):
    """Eval set sampled FROM the corpus → every eval doc of >= n words is
    leaked by construction and must be dropped (a shorter doc has no
    n-gram, so the operator structurally cannot flag it — the guarantee is
    n-gram overlap, not identity); survivors share no 8-gram with eval."""
    from big_data_project_spark import io
    from big_data_project_spark.operators import curation as cu
    from big_data_project_spark.operators import dedup as dd

    docs = io.load_table(spark, sf_dir, "documents")
    eval_df = cu.deterministic_sample(docs, "doc_id", permille=50, seed=7)
    leakable = eval_df.where(
        F.size(F.split(F.trim(F.col("text")), r"\s+")) >= 8
    )
    eval_ids = {r.doc_id for r in leakable.select("doc_id").collect()}
    assert eval_ids  # non-trivial plant
    clean = dd.decontaminate(docs, eval_df, n=8)
    clean_ids = {r.doc_id for r in clean.select("doc_id").collect()}
    assert clean_ids.isdisjoint(eval_ids)
    assert len(clean_ids) <= docs.count() - len(eval_ids)
    # survivors share no shingle with the eval set
    overlap = (
        dd.doc_shingles(clean, n=8)
        .join(dd.doc_shingles(eval_df, n=8).select("shingle").distinct(),
              "shingle", "left_semi")
        .count()
    )
    assert overlap == 0


def test_pack_by_token_budget_properties(spark, sf_dir):
    """Every doc assigned exactly once; pack ids are contiguous from 0 per
    shard; consecutive docs in a shard land in the same or a later pack."""
    from big_data_project_spark import io
    from big_data_project_spark.operators import curation as cu

    docs = io.load_table(spark, sf_dir, "documents")
    packed = cu.pack_by_token_budget(docs, budget=512, n_shards=8)
    rows = packed.collect()
    assert len(rows) == docs.count()
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        assert rs[0].pack_id == 0
        # monotone packing, no skipped budget boundary beyond doc granularity
        for a, b in zip(rs, rs[1:]):
            assert b.pack_id >= a.pack_id
        # a pack's token prefix stays within one budget step of its index
        cum = 0
        for r in rs:
            assert r.pack_id == cum // 512
            cum += r.n_tokens


def test_connected_components_collapses_chains(spark):
    """A long path (multi-iteration case for the pointer-jumping loop),
    a triangle, and a separate pair — every node must label with its
    component minimum even though most pairs were never compared
    directly."""
    from big_data_project_spark.operators import dedup as dd

    pairs = [(37, 38), (36, 37), (35, 36), (34, 35), (33, 34), (32, 33),
             (31, 32), (30, 31),            # path 30..38, adversarial order
             (1, 2), (2, 3), (1, 3),        # triangle
             (10, 11)]                      # isolated pair
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        r.node: r.cluster_id
        for r in dd.connected_components(pdf).collect()
    }
    expect = {n: 30 for n in range(30, 39)} | {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert got == expect


def test_connected_components_local_fast_path_equals_distributed(spark):
    """r11 optimization pin: the driver union-find fast path (fires when
    the edge list fits under spark.bdps.ccLocalThreshold) must produce the
    IDENTICAL (node, min-id cluster) labeling as the distributed pointer-
    jumping fixpoint. Run the same seeded random graph through both paths
    by toggling the conf, including the threshold boundary (edges == thr
    takes the fast path; edges == thr with thr-1 falls through)."""
    import random

    from big_data_project_spark.operators import dedup as dd

    rng = random.Random(11)
    edges = list(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(200), rng.randrange(200)) for _ in range(150)
            )
            if a != b
        }
    )
    pdf = spark.createDataFrame(edges, "id_a long, id_b long")
    key = dd.CC_LOCAL_THRESHOLD_KEY
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "0")  # disabled → distributed fixpoint
        dist = {
            r.node: r.cluster_id for r in dd.connected_components(pdf).collect()
        }
        spark.conf.set(key, str(len(edges)))  # == edge count → fast path
        fast = {
            r.node: r.cluster_id for r in dd.connected_components(pdf).collect()
        }
        spark.conf.set(key, str(len(edges) - 1))  # one under → falls through
        over = {
            r.node: r.cluster_id for r in dd.connected_components(pdf).collect()
        }
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert fast == dist == over
    # sanity: the graph actually has multi-node components
    assert any(v != k for k, v in dist.items())


def test_connected_components_long_chain_bounded(spark):
    """r12 regression pin for the r11 stats firewall + the folded
    convergence observation: a PATH graph forces the distributed
    pointer-jumping fixpoint through ~log2(diameter) rounds (here ≥ 8 —
    the regime where Spark 4's localCheckpoint stats rewrite used to
    multiply the carried sizeInBytes estimate into a BigInteger with
    millions of digits and the driver hung in planning, minutes per
    round). The pin: the whole run completes quickly (generous wall
    ceiling, far under one pre-fix round) AND labels are exact — every
    node labels to the path minimum."""
    import time as _time

    from big_data_project_spark.operators import dedup as dd

    n = 600  # path 0-1-2-...-599: diameter 599 → ~10 jump rounds
    pdf = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    key = dd.CC_LOCAL_THRESHOLD_KEY
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "0")  # force the distributed fixpoint
        t0 = _time.perf_counter()
        got = {
            r.node: r.cluster_id for r in dd.connected_components(pdf).collect()
        }
        elapsed = _time.perf_counter() - t0
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert got == {i: 0 for i in range(n)}
    # pre-firewall this regime hung for MINUTES PER ROUND in Catalyst
    # stats estimation; post-firewall the whole fixpoint is seconds. The
    # ceiling is deliberately loose (shared CI host) while still far
    # below one pre-fix planning stall.
    assert elapsed < 120, f"distributed CC took {elapsed:.1f}s — stats growth?"


def test_drop_near_dups_keeps_one_per_cluster(spark, sf_dir):
    """Cluster reps are exactly the per-component min ids; singletons
    survive untouched."""
    from big_data_project_spark import io
    from big_data_project_spark.operators import dedup as dd

    docs = io.load_table(spark, sf_dir, "documents")
    pairs = dd.jaccard_pairs(docs, n=3, min_jaccard=0.5)
    clusters = dd.duplicate_clusters(docs, pairs)
    kept = dd.drop_near_dups(docs, pairs)
    cl = {r.doc_id: r.cluster_id for r in clusters.collect()}
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert kept_ids == {min(ids) for c in set(cl.values())
                        for ids in [[d for d, x in cl.items() if x == c]]}
    # every document maps into a kept representative's cluster
    assert {cl[d] for d in cl} <= kept_ids


def test_sample_mixture_rates(spark, sf_dir):
    """Per-source rate honored row-exactly: kept iff hash bucket < rate."""
    from big_data_project_spark import io
    from big_data_project_spark.operators import curation as cu

    docs = io.load_table(spark, sf_dir, "documents")
    weights = {"src0": 1000, "src1": 500, "src3": 0}
    out = cu.sample_mixture(docs, weights, default_permille=100, seed=7)
    buckets = {
        r.doc_id: r.b
        for r in docs.select(
            "doc_id", cu.hash_bucket(F.col("doc_id"), 7).alias("b")
        ).collect()
    }
    rates = {r.doc_id: weights.get(r.source, 100)
             for r in docs.select("doc_id", "source").collect()}
    expect = {d for d in buckets if buckets[d] < rates[d]}
    got = {r.doc_id for r in out.select("doc_id").collect()}
    assert got == expect
    assert not any(r.source == "src3" for r in out.select("source").collect())


def test_upsample_mixture_multiplicity(spark, sf_dir):
    """rate // 1000 copies per row, +1 when bucket < rate % 1000; rate-0
    domains vanish; copy_idx enumerates 1..n."""
    from collections import Counter

    from big_data_project_spark import io
    from big_data_project_spark.operators import curation as cu

    docs = io.load_table(spark, sf_dir, "documents")
    out = cu.upsample_mixture(
        docs, {"src0": 2500, "src1": 1000, "src2": 500}, default_permille=0,
        seed=7,
    )
    rows = out.select("doc_id", "source", "copy_idx").collect()
    buckets = {
        r.doc_id: r.b
        for r in docs.select(
            "doc_id", cu.hash_bucket(F.col("doc_id"), 7).alias("b")
        ).collect()
    }
    rates = {"src0": 2500, "src1": 1000, "src2": 500}
    counts = Counter((r.doc_id) for r in rows)
    for r in docs.select("doc_id", "source").collect():
        rate = rates.get(r.source, 0)
        expect = rate // 1000 + (1 if buckets[r.doc_id] < rate % 1000 else 0)
        assert counts.get(r.doc_id, 0) == expect, (r.doc_id, r.source)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.copy_idx)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_doc.values())


def test_curate_corpus_invariants(spark, sf_dir):
    """Composition invariants the per-stage oracles can't state: output is
    duplicate-free (no surviving pair at the jaccard gate), decontaminated
    (no eval doc survives), quality-gated, and src3-free."""
    from big_data_project_spark import io
    from big_data_project_spark.operators import curation as cu
    from big_data_project_spark.operators import dedup as dd
    from big_data_project_spark.pipelines.curation import curate_corpus

    docs = io.load_table(spark, sf_dir, "documents")
    eval_df = cu.deterministic_sample(docs, "doc_id", permille=50, seed=7)
    out = curate_corpus(
        docs, eval_df=eval_df, mixture={"src0": 1000, "src1": 500, "src3": 0},
        default_permille=800, seed=7,
    ).cache()
    assert out.count() > 0
    assert out.where(F.col("source") == "src3").count() == 0
    eval_ids = {r.doc_id for r in eval_df.select("doc_id").collect()}
    assert {r.doc_id for r in out.select("doc_id").collect()}.isdisjoint(eval_ids)
    survivors = docs.join(out.select("doc_id"), "doc_id", "left_semi")
    assert dd.jaccard_pairs(survivors, n=3, min_jaccard=0.5).count() == 0
    assert survivors.where(
        F.size(F.split(F.trim(F.col("text")), r"\s+")) < 20
    ).count() == 0


def test_sample_mixture_empty_weights_uniform_default(spark, sf_dir):
    """mixture={} means 'uniform default rate' — must not crash on the
    zero-arg create_map and must equal a plain deterministic sample."""
    from big_data_project_spark import io
    from big_data_project_spark.operators import curation as cu

    docs = io.load_table(spark, sf_dir, "documents")
    got = {r.doc_id for r in
           cu.sample_mixture(docs, {}, default_permille=200, seed=7)
           .select("doc_id").collect()}
    want = {r.doc_id for r in
            cu.deterministic_sample(docs, "doc_id", permille=200, seed=7)
            .select("doc_id").collect()}
    assert got == want
    up = cu.upsample_mixture(docs, {}, default_permille=500, seed=7)
    assert up.count() == len({r.doc_id for r in
        cu.deterministic_sample(docs, "doc_id", permille=500, seed=7)
        .select("doc_id").collect()})


def test_curate_corpus_split_survives_aggressive_mixture(spark, sf_dir):
    """Regression: mixture sampling and the split stage hash with
    different seeds — a shared bucket at rate <= 200 permille kept exactly
    the test/val bucket range and emptied the train split."""
    from big_data_project_spark import io
    from big_data_project_spark.pipelines.curation import curate_corpus

    docs = io.load_table(spark, sf_dir, "documents")
    out = curate_corpus(docs, mixture={}, default_permille=200, seed=7)
    splits = {r.split for r in out.select("split").distinct().collect()}
    assert "train" in splits, splits


def test_remove_hot_lines_semantics(spark):
    """Boilerplate line in > max_docs docs is deleted everywhere; cold
    lines survive in original order; an all-boilerplate doc comes back as
    the empty string with n_lines_kept=0."""
    from big_data_project_spark.operators import dedup as dd

    rows = [
        (1, "intro one\nCOOKIE BANNER\nbody of one"),
        (2, "COOKIE BANNER\nsecond doc text"),
        (3, "third doc\nCOOKIE BANNER\ntail three"),
        (4, "COOKIE BANNER"),
        (5, "unique five\nalso unique"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: (r.text_clean, r.n_lines_kept)
        for r in dd.remove_hot_lines(df, max_docs=3).collect()
    }
    assert out[1] == ("intro one\nbody of one", 2)
    assert out[2] == ("second doc text", 1)
    assert out[3] == ("third doc\ntail three", 2)
    assert out[4] == ("", 0)  # doc was pure boilerplate
    assert out[5] == ("unique five\nalso unique", 2)
    counts = {
        r.line: r.n_docs for r in dd.line_doc_counts(df).collect()
    }
    assert counts["COOKIE BANNER"] == 4


def test_dedup_against_snapshot(spark):
    """Re-crawled content (same text, new id) is dropped against the
    snapshot; in-batch exact dups collapse; genuinely new docs survive."""
    from big_data_project_spark.operators import dedup as dd

    snapshot = spark.createDataFrame(
        [(1, "old doc alpha"), (2, "old doc beta")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [
            (10, "old doc alpha"),   # re-crawl of snapshot content
            (11, "fresh gamma"),
            (12, "fresh gamma"),     # in-batch dup
            (13, "fresh delta"),
        ],
        ["doc_id", "text"],
    )
    got = sorted(
        r.doc_id for r in dd.dedup_against_snapshot(new, snapshot).collect()
    )
    assert got == [11, 13]


def test_filter_quality_matches_flags(spark, sf_dir):
    """filter_quality (the narrow-filter surface) must keep exactly the
    keep=1 rows of quality_rule_flags (the reporting surface) — the two
    share one expression set by construction; this guards the contract."""
    from big_data_project_spark import io
    from big_data_project_spark.operators import text as tx

    docs = io.load_table(spark, sf_dir, "documents")
    flags = tx.quality_rule_flags(docs)
    want = {r.doc_id for r in flags.where(F.col("keep") == 1).collect()}
    got = {r.doc_id for r in tx.filter_quality(docs).select("doc_id").collect()}
    assert got == want
    n_all = docs.count()
    assert 0 < len(want) < n_all  # rules discriminate on this corpus


def test_jaccard_verify_agrees_with_allpairs(spark, sf_dir):
    """jaccard_verify on ALL qualifying pairs must equal jaccard_pairs —
    same exact scores, just restricted to a candidate list."""
    from big_data_project_spark import io
    from big_data_project_spark.operators import dedup as dd

    docs = io.load_table(spark, sf_dir, "documents").limit(60)
    allp = dd.jaccard_pairs(docs, n=3)
    ver = dd.jaccard_verify(docs, allp.select("id_a", "id_b"), n=3)
    a = {(r.id_a, r.id_b): r.jaccard for r in allp.collect()}
    b = {(r.id_a, r.id_b): r.jaccard for r in ver.collect()}
    assert a == b
    assert a  # non-trivial


def test_curate_corpus_lsh_mode_superset_of_exact(spark, sf_dir):
    """LSH blocking can only MISS near-dup pairs, never invent them, so
    fewer docs are dropped: every exact-mode survivor must also survive
    lsh mode, and both modes must agree on all downstream columns for the
    shared docs."""
    from big_data_project_spark import io
    from big_data_project_spark.pipelines.curation import curate_corpus

    docs = io.load_table(spark, sf_dir, "documents")
    exact = {r.doc_id: (r.split, r.shard, r.n_tokens)
             for r in curate_corpus(docs, pair_source="exact").collect()}
    lsh = {r.doc_id: (r.split, r.shard, r.n_tokens)
           for r in curate_corpus(docs, pair_source="lsh").collect()}
    assert set(exact) <= set(lsh)
    for k in exact:
        assert exact[k] == lsh[k]

    # the round-8 scale knobs (candidate prefilter + hashed-long verify)
    # must not change the curated output on this corpus: the prefilter
    # only removes pairs exact-verify rejects, hashing is collision-free
    scaled = {r.doc_id: (r.split, r.shard, r.n_tokens)
              for r in curate_corpus(
                  docs, pair_source="lsh",
                  lsh_min_est_jaccard=0.3, lsh_hash_shingles=True,
              ).collect()}
    assert scaled == lsh

    # lsh_params="auto" sizes the banding from measured entropy; it is a
    # recall knob like any banding choice, so the same containment
    # invariant holds against exact mode
    auto = {r.doc_id: (r.split, r.shard, r.n_tokens)
            for r in curate_corpus(
                docs, pair_source="lsh", lsh_params="auto",
            ).collect()}
    assert set(exact) <= set(auto)
    for k in exact:
        assert exact[k] == auto[k]


def test_curate_corpus_auto_drift_guard(spark):
    """VERDICT r8 #6: the cand/doc drift guard. lsh_params="auto" sizes
    banding from a 2000-doc md5 sample; a low-entropy flood living
    ENTIRELY outside that sample (the planted drift corpus) makes the
    realized candidates/doc exceed the profile's prediction by far more
    than the factor — the guard must warn. The same flood placed INSIDE
    the sample is predicted, so no warning."""
    import hashlib
    import warnings as w

    import pytest

    from big_data_project_spark.pipelines.curation import curate_corpus

    n, n_flood = 2500, 400
    by_md5 = sorted(
        range(n),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )
    template = " ".join(f"w{j}" for j in range(30))

    def corpus(flood_ids):
        flood = set(flood_ids)
        rows = [
            (
                i,
                "web",
                template + f" uniq{i}"
                if i in flood
                else " ".join(f"u{i}x{j}" for j in range(30)),
            )
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )

    # flood on the md5-LARGEST ids: none of them make the 2000-doc
    # profile sample, so the profile sees a clean high-entropy corpus
    # while the real corpus carries an 80k-pair flood
    with pytest.warns(UserWarning, match="candidates/doc"):
        curate_corpus(
            corpus(by_md5[-n_flood:]), pair_source="lsh", lsh_params="auto"
        )

    # flood on the md5-SMALLEST ids: fully sampled, prediction includes
    # it (tp term), realized load is in line -> no drift warning
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        curate_corpus(
            corpus(by_md5[:n_flood]), pair_source="lsh", lsh_params="auto"
        )
    assert not [x for x in rec if "candidates/doc" in str(x.message)]


def test_curate_corpus_shard_by_entropy_wiring(spark):
    """VERDICT r10 #7: the drift guard's 'shard the corpus' advice is
    now a curate_corpus flag. On a mixed corpus (template flood + unique
    bulk, the shape sharding exists for) the sharded pipeline must keep
    the SAME survivors as unsharded lsh mode — same-template near-dups
    co-shard (near-identical hot-mass), so sharding only removes
    cross-population candidates that exact-verify rejects anyway — with
    the output schema unchanged (no entropy_shard leak; 'shard' in the
    result stays the PACKING shard). Invalid combinations raise."""
    import pytest as _pytest

    from big_data_project_spark.pipelines.curation import curate_corpus

    template = " ".join(f"t{j % 5}" for j in range(30))
    texts = [template + f" v{i}" for i in range(40)]
    texts += [" ".join(f"u{i}x{j}" for j in range(30)) for i in range(25)]
    docs = spark.createDataFrame(
        [(i, "web", t) for i, t in enumerate(texts)],
        "doc_id long, source string, text string",
    )
    plain = curate_corpus(docs, pair_source="lsh")
    sharded = curate_corpus(
        docs, pair_source="lsh", shard_by_entropy=True, entropy_shards=4,
    )
    assert sharded.columns == plain.columns
    assert "entropy_shard" not in sharded.columns
    a = {r.doc_id: (r.split, r.shard, r.n_tokens) for r in plain.collect()}
    b = {r.doc_id: (r.split, r.shard, r.n_tokens) for r in sharded.collect()}
    assert a == b

    with _pytest.raises(ValueError, match="pair_source='lsh'"):
        curate_corpus(docs, pair_source="exact", shard_by_entropy=True)
    with _pytest.raises(ValueError, match="lsh_params='auto'"):
        curate_corpus(docs, pair_source="lsh", shard_by_entropy="auto")
    with _pytest.raises(ValueError, match="False, True or 'auto'"):
        curate_corpus(docs, pair_source="lsh", shard_by_entropy="yes")


def test_curate_corpus_auto_shard_engages_on_blind_corpus(spark):
    """shard_by_entropy='auto' arms on the PLAN-TIME blindness signal:
    on the planted out-of-sample flood corpus (the drift-guard test's
    shape) the warning must say sharding ENGAGED, and the output must
    equal the unsharded run's (the flood is one template family —
    near-identical hot-mass co-shards it; auto mode profiles the hot
    set from the FULL corpus precisely because md5 samples are blind
    here). On a clean corpus auto must NOT shard (and not warn)."""
    import hashlib
    import warnings as w

    import pytest as _pytest

    from big_data_project_spark.pipelines.curation import curate_corpus

    n, n_flood = 2500, 400
    by_md5 = sorted(
        range(n),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )
    template = " ".join(f"w{j}" for j in range(30))
    flood = set(by_md5[-n_flood:])
    rows = [
        (
            i,
            "web",
            template + f" uniq{i}"
            if i in flood
            else " ".join(f"u{i}x{j}" for j in range(30)),
        )
        for i in range(n)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    with _pytest.warns(UserWarning, match="entropy-sharding ENGAGES"):
        auto = curate_corpus(
            docs, pair_source="lsh", lsh_params="auto",
            shard_by_entropy="auto",
        )
    with _pytest.warns(UserWarning, match="candidates/doc"):
        plain = curate_corpus(docs, pair_source="lsh", lsh_params="auto")
    a = {r.doc_id: (r.split, r.shard, r.n_tokens) for r in plain.collect()}
    b = {r.doc_id: (r.split, r.shard, r.n_tokens) for r in auto.collect()}
    assert a == b

    # clean corpus: no blindness signal -> no shard, no warning
    clean = spark.createDataFrame(
        [(i, "web", " ".join(f"c{i}x{j}" for j in range(30)))
         for i in range(300)],
        "doc_id long, source string, text string",
    )
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        curate_corpus(
            clean, pair_source="lsh", lsh_params="auto",
            shard_by_entropy="auto",
        )
    assert not [x for x in rec if "candidates/doc" in str(x.message)]


def test_operators_tolerate_empty_corpus(spark):
    """Every curation/dedup operator must run (and return zero rows, not
    throw) on an empty documents-shaped frame — the first micro-batch of a
    new feed is empty, and a 100 TB job that dies on an empty partition of
    work is not operable."""
    from pyspark.sql import types as T

    from big_data_project_spark.operators import curation as cu
    from big_data_project_spark.operators import dedup as dd
    from big_data_project_spark.operators import text as tx

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    empty = spark.createDataFrame([], schema)
    outs = [
        dd.drop_exact_dups(empty),
        dd.jaccard_pairs(empty),
        dd.remove_hot_lines(empty),
        dd.dedup_against_snapshot(empty, empty),
        dd.decontaminate(empty, empty),
        dd.contamination_report(empty, empty),
        dd.simhash(empty),
        tx.quality_rule_flags(empty),
        tx.filter_quality(empty),
        cu.deterministic_sample(empty, "doc_id", 500),
        cu.sample_mixture(empty, {"a": 10}),
        cu.upsample_mixture(empty, {"a": 2500}),
        cu.pack_by_token_budget(empty),
        cu.pack_manifest(cu.pack_by_token_budget(empty)),
        cu.token_report(empty),
    ]
    for df in outs:
        assert df.count() == 0
    # round 10: shard assignment returns the (empty) frame + shard col;
    # the capped-load audit returns its ONE summary row with zeroed
    # (not null) aggregates; the suggester's bucket_cap contract holds
    # on a <2-doc corpus (curate's drift guard reads the keys
    # unconditionally)
    assert dd.shard_by_entropy(empty).count() == 0
    arow = dd.lsh_capped_load_audit(empty).collect()[0]
    assert arow.asDict() == {
        "n_buckets": 0, "n_docs_audited": 0, "hot_buckets": 0,
        "max_occupancy": 0, "uncapped_pairs": 0, "capped_pairs": 0,
    }
    sug = dd.suggest_minhash_params(empty, bucket_cap=1024)
    assert sug["est_cand_per_doc_capped"] == 0.0
    assert sug["est_incidences_per_doc_sampled"] == 0.0


def test_quality_rules_match_python_model(spark):
    """quality_rule_flags vs a plain-Python model of the same rules on
    adversarial texts (short docs, symbol soup, heavy repetition)."""
    import re as _re

    from big_data_project_spark.operators import text as tx

    texts = [
        "",                                      # empty: tokenizes to 0 words
        "one",
        "a b",
        "the cat sat on the mat and it was the best of mats",
        "$$$ %% ## !! ?? **",                    # symbol soup
        ("spam ham " * 40).strip(),              # pure 2-word repetition
        "the " + "supercalifragilistic " * 25 + "a of and is end",
        "the a of and is " + "word " * 30,
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.asDict() for r in tx.quality_rule_flags(df).collect()}

    for i, t in rows:
        # filter the '' artifact like words_col: empty doc = 0 words
        w = [x for x in _re.split(r"\s+", t.strip()) if x]
        n = len(w)
        chars = sum(len(x) for x in w)
        tri = [" ".join(w[j:j + 3]) for j in range(n - 2)] if n >= 3 else []
        ndup = (n - 2) - len(set(tri)) if n >= 3 else 0
        stop = len(_re.findall(r"\b(the|a|of|and|is)\b", t))
        alpha = sum(1 for x in w if _re.fullmatch(r"[A-Za-z]+", x))
        g = got[i]
        assert g["n_words"] == n, (i, g)
        assert g["total_chars"] == chars, (i, g)
        assert g["n_dup_trigrams"] == ndup, (i, g)
        assert g["stopword_hits"] == stop, (i, g)
        assert g["n_alpha_words"] == alpha, (i, g)
        keep = (
            30 <= n <= 100_000
            and 30 * n <= 10 * chars <= 100 * n
            and 1000 * ndup <= 50 * max(n - 2, 0)
            and stop >= 2
            and 1000 * alpha >= 700 * n
        )
        assert g["keep"] == int(keep), (i, g)


def test_deterministic_sample_xxh64_fast_path(spark, sf_dir):
    """The xxh64 bucket variant must be rerun-stable, roughly honor the
    permille rate, and select a different-but-valid subset than md5."""
    from big_data_project_spark import io
    from big_data_project_spark.operators import curation as cu

    docs = io.load_table(spark, sf_dir, "documents")
    n = docs.count()
    a = {r.doc_id for r in
         cu.deterministic_sample(docs, "doc_id", 300, seed=7, hash_fn="xxh64")
         .select("doc_id").collect()}
    b = {r.doc_id for r in
         cu.deterministic_sample(docs, "doc_id", 300, seed=7, hash_fn="xxh64")
         .select("doc_id").collect()}
    assert a == b  # rerun-stable
    assert 0.15 * n <= len(a) <= 0.45 * n  # ~300 permille


def test_pack_by_token_budget_string_ids(spark):
    """Regression: sharding hashes the id content — a STRING doc id must
    spread across shards (under pmod it silently cast to NULL and every
    row collapsed into one global window)."""
    from big_data_project_spark.operators import curation as cu

    rows = [(f"doc-{i}", "w " * 40) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = cu.pack_by_token_budget(df, budget=64, n_shards=8)
    shards = {r.shard for r in out.select("shard").distinct().collect()}
    assert len(shards) >= 4, shards  # spread, not collapsed
    assert out.where(F.col("shard").isNull()).count() == 0


def test_gapfill_time_series_semantics(spark):
    from big_data_project_spark.operators import relational as rel

    rows = [
        # user 1: events at 00:30, 01:10 (same hour? no - 6h buckets:
        # both in bucket 00:00), then a gap, then 18:05
        (1, "2024-03-01 00:30:00", 10.0),
        (1, "2024-03-01 01:10:00", 5.0),
        (1, "2024-03-01 18:05:00", 2.5),
        # user 2: single event - exactly one bucket, no gaps
        (2, "2024-03-02 07:00:00", 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double")
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        (r.user_id, str(r.bucket_start)): r
        for r in rel.gapfill_time_series(df).collect()
    }
    assert len(out) == 4 + 1  # user1: 00,06,12,18; user2: 06
    r0 = out[(1, "2024-03-01 00:00:00")]
    assert r0.n == 2 and r0.total == 15.0 and r0.total_ffill == 15.0
    gap = out[(1, "2024-03-01 06:00:00")]
    assert gap.n == 0 and gap.total is None and gap.total_ffill == 15.0
    gap2 = out[(1, "2024-03-01 12:00:00")]
    assert gap2.total_ffill == 15.0
    last = out[(1, "2024-03-01 18:00:00")]
    assert last.n == 1 and last.total == 2.5 and last.total_ffill == 2.5
    assert out[(2, "2024-03-02 06:00:00")].n == 1


def test_duplicate_spans_crafted(spark):
    """Hand-checkable span merge: two docs sharing one 5-gram phrase
    embedded at different offsets, plus an internally-repeated doc and a
    doc with no duplication."""
    from big_data_project_spark.operators import dedup as dd

    phrase = "alpha beta gamma delta epsilon"
    rows = [
        (1, f"x1 x2 {phrase} y1 y2"),                 # shared phrase at pos 2
        (2, f"{phrase} z1 z2 z3 z4 z5"),              # shared phrase at pos 0
        (3, f"{phrase} mid1 mid2 {phrase}"),          # internal repeat too
        (4, "u1 u2 u3 u4 u5 u6 u7 u8"),               # unique, no dup grams
        (5, f"{phrase} {phrase}"),                    # back-to-back: one range
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in dd.duplicate_spans(docs, n=5).collect()
    }
    assert set(got) == {1, 2, 3, 5}         # doc 4 has no duplicated spans
    assert got[1]["n_spans"] == 1 and got[1]["dup_tokens"] == 5
    assert got[1]["total_tokens"] == 9
    assert got[2]["n_spans"] == 1 and got[2]["dup_tokens"] == 5
    # doc 3: phrase at pos 0 and pos 7 -> gap 7 > n -> two islands
    assert got[3]["n_spans"] == 2 and got[3]["dup_tokens"] == 10
    assert got[3]["dup_permille"] == 1000 * 10 // 12
    # doc 5: duplicated grams at pos 0 and pos 5 (gap == n) cover tokens
    # [0,4] and [5,9] — one contiguous maximal range, ONE span
    assert got[5]["n_spans"] == 1 and got[5]["dup_tokens"] == 10
    assert got[5]["dup_permille"] == 1000


def test_funnel_is_strictly_sequential(spark):
    """A user who purchases BEFORE clicking must not count as completing
    view->click->purchase; min-after-previous semantics, not set-contains."""
    from big_data_project_spark.operators import events as ev

    rows = [
        # user 1: view t1, click t2, purchase t3 -> completes
        (1, 1, "view", "2024-01-01 00:00:00"),
        (2, 1, "click", "2024-01-01 01:00:00"),
        (3, 1, "purchase", "2024-01-01 02:00:00"),
        # user 2: purchase first, then view+click -> stops at click
        (4, 2, "purchase", "2024-01-01 00:00:00"),
        (5, 2, "view", "2024-01-01 01:00:00"),
        (6, 2, "click", "2024-01-01 02:00:00"),
        # user 3: only views
        (7, 3, "view", "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_s string"
    ).select("event_id", "user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts"))
    got = {r["step"]: r["n_users"] for r in ev.funnel(df).collect()}
    assert got == {"1:view": 3, "2:click": 2, "3:purchase": 1}


def test_transitions_counts_are_per_user_ordered(spark):
    from big_data_project_spark.operators import events as ev

    rows = [
        (1, 1, "view", "2024-01-01 00:00:00"),
        (2, 1, "click", "2024-01-01 01:00:00"),
        (3, 2, "view", "2024-01-01 00:30:00"),
        (4, 2, "click", "2024-01-01 00:45:00"),
        (5, 2, "view", "2024-01-01 00:50:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_s string"
    ).select("event_id", "user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts"))
    got = {(r["from_type"], r["to_type"]): r["n"] for r in ev.transitions(df).collect()}
    # no cross-user pair (user1.click -> user2.view must not appear)
    assert got == {("view", "click"): 2, ("click", "view"): 1}


def _py_duplicate_spans(docs, n=3, min_count=2):
    """Plain-Python model of dedup.duplicate_spans."""
    toks = {d: t.strip().split() for d, t in docs}
    toks = {d: w for d, w in toks.items() if len(w) >= n and t_nonempty(w)}
    from collections import Counter

    counts = Counter()
    positions = {}
    for d, w in toks.items():
        grams = [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]
        positions[d] = grams
        counts.update(grams)
    out = {}
    for d, grams in positions.items():
        pos = [i for i, g in enumerate(grams) if counts[g] >= min_count]
        if not pos:
            continue
        spans = []
        for p in pos:
            # merge overlap AND adjacency (gap == n continues the range)
            if spans and p - spans[-1][1] <= n:
                spans[-1] = (spans[-1][0], p)
            else:
                spans.append((p, p))
        merged = [(s, e + n - 1) for s, e in spans]
        dup_tokens = sum(e - s + 1 for s, e in merged)
        total = len(toks[d])
        out[d] = {
            "n_spans": len(merged),
            "dup_tokens": dup_tokens,
            "total_tokens": total,
            "dup_permille": int(dup_tokens * 1000.0 / total // 1),
        }
    return out


def t_nonempty(w):
    return len(w) > 0 and any(x for x in w)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=15).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
def test_duplicate_spans_matches_python_model(spark, texts):
    """Tiny alphabet => dense duplicate 3-grams; the Spark islands merge
    must agree with the sequential reference model on every doc."""
    from big_data_project_spark.operators import dedup as dd

    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: {
            "n_spans": r["n_spans"],
            "dup_tokens": r["dup_tokens"],
            "total_tokens": r["total_tokens"],
            "dup_permille": r["dup_permille"],
        }
        for r in dd.duplicate_spans(docs, n=3).collect()
    }
    want = _py_duplicate_spans(rows, n=3)
    assert got == want


def test_last_touch_attribution_crafted(spark):
    """Purchases credit the most recent PRIOR non-purchase touch; a
    purchase with no prior touch credits 'none'; later touches do not
    retro-credit earlier purchases."""
    from big_data_project_spark.operators import events as ev

    rows = [
        (1, 1, "purchase", 10.0, "2024-01-01 00:00:00"),  # no prior -> none
        (2, 1, "click", 0.0, "2024-01-01 01:00:00"),
        (3, 1, "purchase", 20.0, "2024-01-01 02:00:00"),  # -> click
        (4, 2, "view", 0.0, "2024-01-01 00:00:00"),
        (5, 2, "purchase", 5.0, "2024-01-01 01:00:00"),   # -> view
        (6, 2, "purchase", 7.0, "2024-01-01 02:00:00"),   # still view (no newer touch)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double, ts_s string"
    ).select("event_id", "user_id", "event_type", "value", F.col("ts_s").cast("timestamp").alias("ts"))
    got = {
        r["touch_type"]: (r["n_purchases"], r["attributed_value"])
        for r in ev.last_touch_attribution(df).collect()
    }
    assert got == {"none": (1, 10.0), "click": (1, 20.0), "view": (2, 12.0)}


def test_rfm_scores_invert_recency(spark):
    """Most-recent user gets r_score 4 (best); heaviest spender gets
    m_score 4; scores are quartile-threshold based, in [1, 4]."""
    from big_data_project_spark.operators import events as ev

    rows = []
    eid = 0
    # 8 users: user u's last event is day u+1, purchase value 10*u
    for u in range(8):
        rows.append((eid, u, "purchase", 10.0 * u, f"2024-01-0{u + 1} 00:00:00"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double, ts_s string"
    ).select("event_id", "user_id", "event_type", "value", F.col("ts_s").cast("timestamp").alias("ts"))
    got = {r["user_id"]: r.asDict() for r in ev.rfm_segments(df).collect()}
    assert got[7]["recency_days"] == 0 and got[7]["r_score"] == 4
    assert got[0]["recency_days"] == 7 and got[0]["r_score"] == 1
    assert got[7]["m_score"] == 4 and got[0]["m_score"] == 1
    for r in got.values():
        for k in ("r_score", "f_score", "m_score"):
            assert 1 <= r[k] <= 4


def test_rolling_zscore_flags_spike(spark):
    """An alternating 4/6 per-hour series with one 50-event spike: the
    spike bucket is the only anomaly. A second, perfectly flat series
    (zero variance) must yield NULL zscores — not a crash, not a flag."""
    from big_data_project_spark.operators import relational as rel

    rows = []
    eid = 0
    for h in range(30):
        # 'click': alternating 4/6 history, spike of 50 at hour 28
        n = 50 if h == 28 else (4 if h % 2 == 0 else 6)
        for i in range(n):
            rows.append((eid, "click", 1 + h // 24, h % 24, i % 60))
            eid += 1
        for i in range(5):  # 'view': flat 5/hour -> zero variance
            rows.append((eid, "view", 1 + h // 24, h % 24, i))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, day int, hour int, minute int"
    ).select(
        "event_id",
        "event_type",
        F.expr(
            "make_timestamp(2024, 1, day, hour, minute, 0)"
        ).alias("ts"),
    )
    out = rel.rolling_zscore(df, key="event_type", min_periods=12).collect()
    anomalies = [r for r in out if r["is_anomaly"]]
    assert len(anomalies) == 1 and anomalies[0]["n"] == 50
    assert anomalies[0]["key"] == "click"
    flat = [r for r in out if r["key"] == "view"]
    assert flat and all(r["zscore"] is None for r in flat), (
        "expected zero-variance buckets to carry NULL zscore"
    )


def test_duplicate_spans_modes_agree(spark, sf_dir):
    """The skew-safe groupBy+join scan and the single-pass window scan
    must produce identical reports (the window mode exists only as a
    small-corpus fast path)."""
    from big_data_project_spark import io
    from big_data_project_spark.operators import dedup as dd

    docs = io.load_table(spark, sf_dir, "documents")
    a = {tuple(r) for r in dd.duplicate_spans(docs, n=5, skew_safe=True).collect()}
    b = {tuple(r) for r in dd.duplicate_spans(docs, n=5, skew_safe=False).collect()}
    assert a == b and a


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),                      # user
            st.sampled_from(["view", "click", "purchase", "error"]),
            st.integers(0, 50),                     # minute offset
        ),
        min_size=1,
        max_size=40,
    )
)
def test_funnel_matches_python_model(spark, events):
    """Random event logs: the distributed min-after-previous funnel must
    agree with a sequential reference implementation."""
    from big_data_project_spark.operators import events as ev

    rows = [
        (i, u, t, f"2024-01-01 00:{m:02d}:00") for i, (u, t, m) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_s string"
    ).select(
        "event_id", "user_id", "event_type",
        F.col("ts_s").cast("timestamp").alias("ts"),
    )
    steps = ("view", "click", "purchase")
    got = {r["step"]: r["n_users"] for r in ev.funnel(df, steps).collect()}

    # sequential model: per user, earliest chain of strictly-increasing ts
    from collections import defaultdict

    by_user = defaultdict(list)
    for i, (u, t, m) in enumerate(events):
        by_user[u].append((m, i, t))
    want = {f"{k + 1}:{s}": 0 for k, s in enumerate(steps)}
    for u, evs in by_user.items():
        evs.sort()
        prev_t = None
        for k, s in enumerate(steps):
            cand = [m for m, _, t in evs if t == s and (prev_t is None or m > prev_t)]
            if not cand:
                break
            prev_t = min(cand)
            want[f"{k + 1}:{s}"] += 1
    assert got == want


def test_empty_docs_tokenize_to_zero(spark):
    """Empty / whitespace-only text is 0 words, not 1 (split alone yields
    ['']): token accounting, chunking, and packing must all see 0."""
    from big_data_project_spark.operators import text as tx

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one two")], "doc_id long, text string"
    )
    stats = {r.doc_id: r.n_words for r in tx.token_stats(df).collect()}
    assert stats == {1: 0, 2: 0, 3: 2}
    # an empty doc emits no chunks at all
    chunks = tx.chunk_documents(df, chunk_size=5, overlap=1)
    assert {r["doc_id"] for r in chunks.collect()} == {3}


def test_redact_pii_spares_iso_dates(spark):
    """The PHONE pattern must not consume ISO dates or plain numeric
    ranges — only phone-shaped digit groups."""
    from big_data_project_spark.operators import text as tx

    df = spark.createDataFrame(
        [(1, "on 2025-04-19 call +1-555-0147 or 555-123-4567 re 2024-2026")],
        "doc_id long, text string",
    )
    out = tx.redact_pii(df).collect()[0].redacted
    assert "2025-04-19" in out and "2024-2026" in out
    assert "+1-555-0147" not in out and "555-123-4567" not in out


def test_funnel_empty_steps_raises(spark):
    from big_data_project_spark.operators import events as ev

    df = spark.createDataFrame([], "event_id long, user_id long, event_type string, ts timestamp")
    try:
        ev.funnel(df, steps=())
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_connected_components_string_ids(spark):
    """Near-dedup must work for STRING doc ids: the old cast('long') turned
    them into NULLs and silently dropped every edge."""
    from big_data_project_spark.operators import dedup as dd

    pairs = spark.createDataFrame(
        [("doc_b", "doc_a"), ("doc_c", "doc_b"), ("doc_x", "doc_y")],
        "id_a string, id_b string",
    )
    got = {r["node"]: r["cluster_id"] for r in dd.connected_components(pairs).collect()}
    assert got == {
        "doc_a": "doc_a", "doc_b": "doc_a", "doc_c": "doc_a",
        "doc_x": "doc_x", "doc_y": "doc_x",
    }
    docs = spark.createDataFrame(
        [("doc_a", "t"), ("doc_b", "t"), ("doc_c", "t"), ("doc_x", "t"),
         ("doc_y", "t"), ("doc_z", "t")],
        "doc_id string, text string",
    )
    kept = {r["doc_id"] for r in dd.drop_near_dups(docs, pairs).select("doc_id").collect()}
    assert kept == {"doc_a", "doc_x", "doc_z"}


def test_profile_minmax_is_numeric_not_lexicographic(spark):
    from big_data_project_spark.operators import relational as rel

    df = spark.createDataFrame([(9,), (10,), (200,)], "x int")
    row = rel.profile_columns(df, ["x"], exact=True).collect()[0]
    assert row["min_str"] == "9" and row["max_str"] == "200"


def test_verify_roundtrip_multiline_csv(spark, tmp_path):
    from big_data_project_spark import io

    df = spark.createDataFrame([(1, "a\nb"), (2, "plain")], "i long, t string")
    n = io.verify_roundtrip(spark, df, str(tmp_path / "rt"), fmt="csv")
    assert n == 2


def test_salted_join_rejects_outer(spark, sf_dir):
    from big_data_project_spark import io
    from big_data_project_spark.operators import relational as rel

    o = io.load_table(spark, sf_dir, "orders")
    c = io.load_table(spark, sf_dir, "customer")
    try:
        rel.salted_join(o, c, "o_custkey", "c_custkey", how="full")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_frame_sample_exact_multiple_no_empty_frame(spark):
    from big_data_project_spark.operators import multimodal as mm

    df = spark.createDataFrame(
        [(1, "x" * 64), (2, "y" * 65), (3, "")], "doc_id long, text string"
    )
    frames = mm.frame_sample(mm.attach_binary(df))
    by_doc = {}
    for r in frames.collect():
        by_doc.setdefault(r["doc_id"], []).append(len(r["frame_bytes"]))
    assert by_doc[1] == [64]          # exact multiple: ONE full frame
    assert sorted(by_doc[2]) == [1, 64]  # 65 bytes: full frame + 1-byte tail
    assert 3 not in by_doc            # empty payload: no frames


EDGE_LISTS = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=40,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(EDGE_LISTS)
def test_triangle_count_property_matches_bruteforce(spark, raw):
    """graph.triangle_count (oriented wedge join) vs itertools brute force
    over arbitrary messy edge lists."""
    import itertools

    from big_data_project_spark.operators import graph

    und = {tuple(sorted(e)) for e in raw if e[0] != e[1]}
    nodes = sorted({x for e in und for x in e})
    expected = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in und and (b, c) in und and (a, c) in und
    )
    row = graph.triangle_count(
        spark.createDataFrame(raw, ["src", "dst"])
    ).collect()[0]
    assert (row["n_triangles"], row["n_edges"]) == (expected, len(und))


KEY_SETS = st.tuples(
    st.sets(st.integers(0, 5000), min_size=1, max_size=80),   # build keys
    st.sets(st.integers(0, 5000), min_size=1, max_size=200),  # probe keys
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(KEY_SETS)
def test_bloom_prune_join_property_no_false_negatives(spark, keys):
    """Bloom law: the pruned semi join equals the plain semi join for ANY
    build/probe key sets (false positives die at the exact join; false
    negatives are structurally impossible)."""
    from big_data_project_spark.operators import relational as R

    build_keys, probe_keys = keys
    build = spark.createDataFrame([(k,) for k in build_keys], "bk long")
    probe = spark.createDataFrame([(k,) for k in probe_keys], "pk long")
    got = sorted(
        r.pk
        for r in R.bloom_prune_join(
            probe, build, "pk", "bk", n_bits=1 << 12, k=3
        ).collect()
    )
    assert got == sorted(build_keys & probe_keys)


NAME_PAIRS = st.tuples(
    st.lists(st.text(alphabet="abcX#0123", min_size=0, max_size=12),
             min_size=1, max_size=12, unique=True),
    st.lists(st.text(alphabet="abcX#0123", min_size=0, max_size=12),
             min_size=1, max_size=12, unique=True),
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(NAME_PAIRS)
def test_fuzzy_join_property_equals_allpairs(spark, sides):
    """Count-filter blocking + short-string complement must equal the naive
    all-pairs Levenshtein filter on ANY inputs — including strings too
    short to own a q-gram."""
    from big_data_project_spark.operators import relational as R

    ls, rs = sides
    left = spark.createDataFrame(list(enumerate(ls)), "lid long, lname string")
    right = spark.createDataFrame(list(enumerate(rs)), "rid long, rname string")
    got = sorted(
        (r.lid, r.rid, r.edit_dist)
        for r in R.fuzzy_join(
            left, right, "lid", "rid", "lname", "rname", max_dist=1
        ).collect()
    )

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = sorted(
        (i, j, lev(a, b))
        for i, a in enumerate(ls)
        for j, b in enumerate(rs)
        if lev(a, b) <= 1
    )
    assert got == want


# ---------------------------------------------------------------------------
# LM fluency + hashed classifier semantic gates
# ---------------------------------------------------------------------------

def test_lm_fluency_discriminates_fluent_from_shuffled(spark):
    from big_data_project_spark.operators import text as tx

    train = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog ran to the cat") for i in range(5)],
        "doc_id long, text string",
    )
    lm = tx.train_lm_bigrams(train)
    score = spark.createDataFrame(
        [
            (100, "the cat sat on the mat"),     # all bigrams seen
            (101, "mat sat dog ran on cat the"), # adjacency destroyed
            (102, "zebra quark flux"),           # fully out-of-vocabulary
            (103, "single"),                     # < 2 words → no bigrams
            (104, ""),                           # empty doc
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in tx.lm_fluency(score, lm).collect()}
    assert out[100].known_permille == 1000
    assert out[100].mean_p_permille > out[101].mean_p_permille
    assert out[101].known_permille < 1000
    assert out[102].known_permille == 0 and out[102].mean_p_permille == 0
    assert out[103].n_bigrams == 0 and out[103].known_permille is None
    assert out[104].n_bigrams == 0 and out[104].mean_p_permille is None


def test_hashed_classifier_distills_teacher_rule(spark, sf_dir):
    """Held-out agreement with the lexical teacher rule must beat the
    majority-class baseline by a wide margin (deterministic: 0.876 at
    sf0.001, 0.800 at sf0.01)."""
    from pyspark.sql import functions as F

    from big_data_project_spark.registry import REGISTRY

    df = REGISTRY["tx_classifier"].build(spark, sf_dir)
    r = df.agg(
        F.avg((F.col("predicted") == F.col("actual")).cast("double")).alias("acc"),
        F.avg(F.col("actual").cast("double")).alias("base"),
    ).collect()[0]
    majority = max(r.base, 1 - r.base)
    assert r.acc >= 0.75, r
    assert r.acc > majority + 0.1, (r.acc, majority)


def test_hashed_classifier_weights_recover_rule_tokens(spark):
    """The distilled weights must rank the teacher's positive tokens above
    its negative tokens."""
    from big_data_project_spark.operators import text as tx

    rows = []
    words = ["alpha", "beta", "gamma", "delta"]
    for i in range(40):
        pos = i % 2 == 0
        toks = (["fast", "big"] * 3 if pos else ["slow", "small"] * 3) + words
        rows.append((i, " ".join(toks), 1 if pos else 0))
    df = spark.createDataFrame(rows, "doc_id long, text string, y long")
    w = {r.bucket: r.w_milli for r in tx.train_hashed_classifier(df, "y").collect()}

    def bucket_of(tok):
        import hashlib
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 1024

    assert w[bucket_of("fast")] > w[bucket_of("alpha")] > w[bucket_of("slow")]
    assert w[bucket_of("big")] > 0 > w[bucket_of("small")]


# ---------------------------------------------------------------------------
# BPE training vs the classic sequential reference algorithm
# ---------------------------------------------------------------------------

def _ref_bpe(word_counts, n_merges, min_pair_count=2):
    """Sennrich et al. 2016, pure Python: greedy pair merges over the
    (word, count) vocabulary, ties broken (count desc, pair asc)."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get((syms[i], syms[i + 1]), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _ = best
        merges.append((a, b))
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges, vocab


def test_train_bpe_matches_reference(spark):
    from big_data_project_spark.operators import text as tx

    corpus = [
        (0, "low lower lowest low low"),
        (1, "new newer newest new newer"),
        (2, "wide wider widest wide wide wider"),
        (3, "low new wide widest"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = tx.train_bpe(df, n_merges=10)

    counts: dict[str, int] = {}
    for _, t in corpus:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    want, ref_vocab = _ref_bpe(counts, 10)
    assert got == want, (got, want)

    # encoding with the learned merges reproduces the reference vocab split
    enc = tx.bpe_encode(df, got)
    got_tokens = {}
    for r in enc.groupBy("token").count().collect():
        got_tokens[r.token] = r["count"]
    want_tokens: dict[str, int] = {}
    for syms, c in ref_vocab.items():
        for s in syms:
            want_tokens[s] = want_tokens.get(s, 0) + c
    assert got_tokens == want_tokens, (got_tokens, want_tokens)


def test_train_bpe_stops_below_min_count(spark):
    from big_data_project_spark.operators import text as tx

    df = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    # every pair occurs once → below min_pair_count=2 → no merges at all
    assert tx.train_bpe(df, n_merges=5, min_pair_count=2) == []


def test_stem_light_known_cases(spark):
    from big_data_project_spark.operators import text as tx

    df = spark.createDataFrame(
        [("parties classes tables bus ring running red merged is",)], "text string"
    )
    out = {
        r.stem: r.n for r in tx.stem_vocab(df, "text").collect()
    }
    # guards: 'bus' (-us), 'ring'/'red' (short stems) survive untouched
    assert set(out) == {
        "party", "class", "table", "bus", "ring", "runn", "red", "merg", "i"
    }, out


# ---------------------------------------------------------------------------
# hypothesis models for the continuation ops: mode, mean_pool, quantile merge
# ---------------------------------------------------------------------------

@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(min_value=0, max_value=5)),
        min_size=1,
        max_size=40,
    )
)
def test_mode_agg_matches_counter_model(spark, rows):
    from collections import Counter

    from big_data_project_spark.operators.relational import mode_agg

    df = spark.createDataFrame(rows, "g string, v long")
    got = {r.g: (r.mode_value, r.mode_count) for r in mode_agg(df, "g", "v").collect()}
    want = {}
    by_g: dict[str, Counter] = {}
    for g, v in rows:
        by_g.setdefault(g, Counter())[v] += 1
    for g, c in by_g.items():
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        want[g] = (best[0], best[1])
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-8, max_value=8, allow_nan=False, width=32),
            min_size=3,
            max_size=3,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_mean_pool_matches_numpy_model(spark, vecs):
    import numpy as np

    from big_data_project_spark.operators.vector import mean_pool

    rows = [(1, i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "grp long, ord long, embedding array<float>")
    got = mean_pool(df, "grp", "ord").collect()[0]
    # same ordered left fold in float64 as the operator's contract
    acc = np.array(vecs[0], dtype=np.float32).astype(np.float64)
    for v in vecs[1:]:
        acc = acc + np.array(v, dtype=np.float32).astype(np.float64)
    want = acc / len(vecs)
    assert got.n_vecs == len(vecs)
    assert got.pooled == list(want), (got.pooled, list(want))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # day split
            st.floats(min_value=-10, max_value=110, allow_nan=False),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_quantile_sketch_merge_associative_model(spark, rows):
    """Any partitioning of the input into day-partials must merge to the
    single-pass histogram (the trust property of stored partials)."""
    from pyspark.sql import functions as F

    from big_data_project_spark.operators import maintenance as mt

    df = spark.createDataFrame([("k", d, v) for d, v in rows], "g string, day int, v double")
    merged = (
        mt.quantile_sketches(df, ["g", "day"], "v", 0.0, 100.0, 8)
        .groupBy("g", "bin")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    single = mt.quantile_sketches(df, ["g"], "v", 0.0, 100.0, 8)
    got = {(r.g, r.bin): r.n for r in merged.collect()}
    want = {(r.g, r.bin): r.n for r in single.collect()}
    assert got == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.tuples(
        st.lists(  # left: (start offset s, duration s)
            st.tuples(
                st.integers(min_value=0, max_value=5000),
                st.integers(min_value=0, max_value=1200),
            ),
            min_size=1,
            max_size=25,
        ),
        st.lists(  # right: same shape
            st.tuples(
                st.integers(min_value=0, max_value=5000),
                st.integers(min_value=0, max_value=1200),
            ),
            min_size=1,
            max_size=25,
        ),
        st.sampled_from([1, 7, 60, 900, 100000]),  # bin width must not matter
    )
)
def test_interval_overlap_join_property_equals_theta(spark, data):
    """The binned equi-join must return EXACTLY the naive theta join's
    pairs for any interval sets and any bin width — the dedup-by-first-
    shared-bin trick included (overlaps spanning many bins, zero-length
    intervals, bins far larger than every interval)."""
    from big_data_project_spark.operators import relational as rel

    lrows, rrows, bin_s = data
    base = 1_700_000_000  # arbitrary epoch anchor
    mk = lambda rows, ids, s, e: spark.createDataFrame(  # noqa: E731
        [(i, base + a, base + a + d) for i, (a, d) in enumerate(rows)],
        f"{ids} long, _{s} long, _{e} long",
    ).select(
        ids,
        F.timestamp_seconds(F.col(f"_{s}")).alias(s),
        F.timestamp_seconds(F.col(f"_{e}")).alias(e),
    )
    left = mk(lrows, "lid", "l_s", "l_e")
    right = mk(rrows, "rid", "r_s", "r_e")
    got = {
        (r.lid, r.rid)
        for r in rel.interval_overlap_join(
            left, right, "l_s", "l_e", "r_s", "r_e", bin_s=bin_s
        ).collect()
    }
    expect = {
        (li, ri)
        for li, (la, ld) in enumerate(lrows)
        for ri, (ra, rd) in enumerate(rrows)
        if la <= ra + rd and ra <= la + ld
    }
    assert got == expect


def test_shuffle_shards_positions_dense_and_partition_invariant(spark, sf_dir):
    """Within every shard, pos must be exactly 1..n(shard) (dense ranks a
    shard writer can sort on), and the full (doc → shard, pos) assignment
    must not depend on the input's physical partitioning."""
    from big_data_project_spark import io
    from big_data_project_spark.operators import curation

    docs = io.load_table(spark, sf_dir, "documents")
    out = curation.shuffle_shards(docs, "doc_id", n_shards=8, seed=3)
    rows = out.select("doc_id", "shard", "pos").collect()
    assert len(rows) == docs.count()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), f"shard {shard}"
    re_run = {
        (r.doc_id, r.shard, r.pos)
        for r in curation.shuffle_shards(
            docs.repartition(7), "doc_id", n_shards=8, seed=3
        )
        .select("doc_id", "shard", "pos")
        .collect()
    }
    assert re_run == {(r.doc_id, r.shard, r.pos) for r in rows}


def _py_cms(tokens, depth, width):
    """Sequential count-min model mirroring maintenance._cms_col's md5
    derivation: cell = int(md5(f'{tk}#{r}').hex[:15], 16) % width."""
    import hashlib
    from collections import Counter

    sketch = Counter()
    for tk in tokens:
        for r in range(depth):
            h = hashlib.md5(f"{tk}#{r}".encode()).hexdigest()[:15]
            sketch[(r, int(h, 16) % width)] += 1
    return sketch


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.sampled_from(["a", "bb", "ccc", "dd", "e", "ffff", "g7", "hh"]),
        min_size=1,
        max_size=60,
    )
)
def test_cms_matches_python_model(spark, tokens):
    """The distributed CMS sketch equals the sequential model cell-for-cell
    (so persisted partials are engine-portable), and every estimate
    overcounts-or-equals the true multiplicity — for arbitrary token
    multisets at a collision-heavy width."""
    from collections import Counter

    from big_data_project_spark.operators import maintenance as mt

    depth, width = 3, 8
    df = spark.createDataFrame([(t,) for t in tokens], "tk string")
    got = {(r.row, r.col): r.n for r in mt.cms_sketch(df, "tk", depth, width).collect()}
    assert got == dict(_py_cms(tokens, depth, width))

    true = Counter(tokens)
    est = {
        r.tk: r.est_n
        for r in mt.cms_estimate(
            mt.cms_sketch(df, "tk", depth, width),
            df.distinct(),
            "tk",
            depth,
            width,
        ).collect()
    }
    assert all(est[t] >= n for t, n in true.items()), (est, true)


# ---------------------------------------------------------------------------
# Round-4 operators vs plain-Python models
# ---------------------------------------------------------------------------

INT_VALUES = st.lists(
    st.one_of(st.none(), st.integers(min_value=-10**6, max_value=10**6)),
    min_size=1,
    max_size=300,
)


def py_kmv(values, k=16):
    """maintenance.kmv_sketch as a Python model: 60-bit md5 of str(v),
    NULLs ignored, k smallest distinct."""
    import hashlib

    hs = {
        int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        for v in values
        if v is not None
    }
    return sorted(hs)[:k]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(INT_VALUES)
def test_kmv_sketch_matches_python_model(spark, values):
    from big_data_project_spark.operators import maintenance as mt

    df = spark.createDataFrame([("g", v) for v in values], "g string, v long")
    rows = mt.kmv_sketch(df, ["g"], "v", k=16).collect()
    want = py_kmv(values, 16)
    if not want:
        # a group with no non-NULL values has seen nothing — it emits no
        # sketch row at all (documented kmv_sketch behavior)
        assert rows == []
    else:
        got = [int(x) for x in rows[0].kmv]
        assert got == want


ROWS = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
        st.integers(min_value=0, max_value=10**6),  # unique-ish tiebreak
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[1],
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(ROWS, st.sampled_from(["asc", "desc"]))
def test_rank_bounded_matches_python_sort_model(spark, rows, direction):
    """rank_bounded vs a plain-Python sort with Spark's default null
    ordering (asc = nulls first, desc = nulls last), randomized over
    NULL-bearing leading keys."""
    from big_data_project_spark.operators.relational import rank_bounded

    df = spark.createDataFrame(rows, "a int, b long")
    got = {
        r.b: r.rank
        for r in rank_bounded(df, [("a", direction), ("b", "asc")]).collect()
    }

    def key(t):
        a, b = t
        if direction == "asc":
            return (a is not None, a if a is not None else 0, b)
        return (a is None, -(a if a is not None else 0), b)

    want = {t[1]: i + 1 for i, t in enumerate(sorted(rows, key=key))}
    assert got == want


FLOAT_VECS = st.lists(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        min_size=4,
        max_size=4,
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(FLOAT_VECS)
def test_sq8_encode_matches_python_model(spark, vecs):
    """sq8_encode vs the quantization formula computed in plain Python:
    scale = max|v|/127 (1.0 for a zero vector), code = round-half-away."""
    from big_data_project_spark.operators import vector

    df = spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {r.vec_id: r for r in vector.sq8_encode(df).collect()}
    import math

    for i, v in enumerate(vecs):
        fv = [float(F32(x)) for x in v]
        amax = max(abs(x) for x in fv)
        scale = amax / 127.0 if amax != 0 else 1.0
        assert abs(rows[i].sq_scale - scale) < 1e-12
        for x, code in zip(fv, rows[i].codes):
            q = x / scale
            want = int(math.floor(q + 0.5)) if q >= 0 else int(math.ceil(q - 0.5))
            assert code == want, (x, scale, code, want)


def F32(x):
    import struct as _st

    return _st.unpack("f", _st.pack("f", x))[0]


# ---------------------------------------------------------------------------
# Codec round-trip properties (round 5): hypothesis drives arbitrary image /
# audio content through the strict codecs — no Spark session needed, the
# codecs are plain functions, so these run hundreds of examples cheaply.
# ---------------------------------------------------------------------------

_DIMS = st.tuples(st.integers(1, 12), st.integers(1, 12))


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    _DIMS,
    st.integers(0, 2**32 - 1),
    st.sampled_from([0, 1, 2, 3, 4]),
)
def test_gif_lzw_roundtrip_property(dims, seed, _filler):
    """GIF is lossless for ANY pixel content and size: encode->decode is
    the identity (interlace toggled by the seed's parity)."""
    import random

    from big_data_project_spark.operators import multimodal as mm

    w, h = dims
    rng = random.Random(seed)
    px = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(w * h)
    ]
    # >256 distinct colors is impossible at <=144 pixels, so always valid
    data = mm.make_gif(px, w, h, interlace=bool(seed % 2))
    assert mm.decode_gif(data) == (h, w, "rgb", px)


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.integers(1, 400), st.integers(0, 2**32 - 1),
       st.sampled_from(["auto", "verbatim", "fixed:1", "fixed:4", "lpc:2"]))
def test_flac_roundtrip_property(n, seed, subframe):
    """FLAC is bit-exact for ANY int16 content, length and subframe type
    (constant inputs exercise the constant subframe via 'auto')."""
    import random

    from big_data_project_spark.operators import multimodal as mm

    rng = random.Random(seed)
    samples = [rng.randrange(-32768, 32768) for _ in range(n)]
    if seed % 5 == 0:
        samples = [samples[0]] * n  # constant run
    if ":" in subframe and n <= int(subframe.split(":")[1]):
        subframe = "auto"  # order-p prediction needs > p samples
    data = mm.make_flac(samples, 8000, 1, subframe=subframe)
    assert mm.decode_flac(data) == (1, 8000, samples)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(_DIMS, st.integers(0, 2**32 - 1))
def test_jpeg_progressive_equals_sequential_property(dims, seed):
    """For ANY image content and size, the progressive scan script decodes
    to exactly the sequential result (identical refined coefficients)."""
    import random

    from big_data_project_spark.operators import multimodal as mm

    w, h = dims
    rng = random.Random(seed)
    px = [rng.randrange(256) for _ in range(w * h)]
    q = [1] * 64 if seed % 2 else None  # dense and Annex-K regimes
    kw = {"quant": q} if q else {}
    prog = mm.make_jpeg_progressive(px, w, h, **kw)
    seq = mm.make_jpeg_baseline(px, w, h, **kw)
    assert mm.decode_jpeg_baseline(prog) == mm.decode_jpeg_baseline(seq)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(_DIMS, st.integers(0, 2**32 - 1))
def test_png_roundtrip_property(dims, seed):
    """PNG is lossless for ANY RGB content with ANY per-row filter
    choice (decode inverts all five filters exactly)."""
    import random

    from big_data_project_spark.operators import multimodal as mm

    w, h = dims
    rng = random.Random(seed)
    px = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(w * h)
    ]
    filters = [rng.randint(0, 4) for _ in range(h)]
    data = mm.make_png_rgb8(px, w, h, row_filters=filters)
    assert mm.decode_png_rgb8(data) == (h, w, "rgb", px)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(_DIMS, st.integers(1, 5), st.integers(0, 2**32 - 1))
def test_gif_animated_roundtrip_property(dims, n_frames, seed):
    """Animated GIF with full frames is lossless for ANY content, frame
    count and delay list: decode_gif_frames returns every frame and delay
    exactly (one global palette over all frames)."""
    import random

    from big_data_project_spark.operators import multimodal as mm

    w, h = dims
    rng = random.Random(seed)
    # draw from a 64-color palette: n_frames*w*h can exceed 256 pixels,
    # and the encoder's global palette must stay <=256 distinct colors
    pal = [(i * 4, (i * 7) % 256, (i * 13) % 256) for i in range(64)]
    frames = [
        [pal[rng.randrange(64)] for _ in range(w * h)] for _ in range(n_frames)
    ]
    delays = [rng.randrange(1, 100) for _ in range(n_frames)]
    data = mm.make_gif_animated(w, h, frames, delays_cs=delays, loop=seed % 3)
    sh, sw, mode, out = mm.decode_gif_frames(data)
    assert (sh, sw, mode) == (h, w, "rgb")
    assert [d for d, _ in out] == delays
    assert [px for _, px in out] == frames


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(_DIMS, st.integers(1, 4), st.integers(0, 2**32 - 1))
def test_y4m_gray_roundtrip_property(dims, n_frames, seed):
    """Y4M is lossless for ANY grayscale content, size, frame count and
    rational frame rate (BT.601 maps (v,v,v) to Y=v, Cb=Cr=128 exactly)."""
    import random

    from big_data_project_spark.operators import multimodal as mm

    w, h = dims
    rng = random.Random(seed)
    frames = [
        [(v, v, v) for v in [rng.randrange(256) for _ in range(w * h)]]
        for _ in range(n_frames)
    ]
    rate = (rng.randrange(1, 1000), rng.randrange(1, 100))
    got = mm.decode_y4m(mm.make_y4m(frames, w, h, rate=rate))
    assert got == (h, w, rate, frames)


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.integers(1, 8), st.integers(5, 40), st.integers(0, 2**32 - 1))
def test_adpcm_constant_blocks_exact_property(n_blocks, block_align, seed):
    """IMA ADPCM reconstructs per-block-constant int16 signals EXACTLY for
    ANY block count, block size and constants (incl. the int16 extremes) —
    the invariant the mm_adpcm_decode value hash rides on."""
    import random

    from big_data_project_spark.operators import multimodal as mm

    rng = random.Random(seed)
    spb = (block_align - 4) * 2 + 1
    consts = [rng.randrange(-32768, 32768) for _ in range(n_blocks)]
    if seed % 7 == 0:
        consts[0] = -32768
        consts[-1] = 32767
    samples = [v for c in consts for v in [c] * spb]
    enc = mm.make_wav_adpcm(samples, 8000, block_align=block_align)
    assert mm.decode_wav_adpcm(enc) == (1, 8000, samples)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.integers(1, 300), st.integers(0, 2**32 - 1))
def test_adpcm_decode_encode_deterministic_property(n, seed):
    """For ARBITRARY int16 content (not just constants) the lossy codec is
    a pure function: sample count survives the fact chunk exactly and a
    re-encode of the DECODED signal reproduces it bit-exactly (decoded
    signals are fixed points of decode∘encode up to adaptation, so we
    assert the weaker but exact property: double-decode determinism)."""
    import random

    from big_data_project_spark.operators import multimodal as mm

    rng = random.Random(seed)
    samples = [rng.randrange(-32768, 32768) for _ in range(n)]
    got1 = mm.decode_wav_adpcm(mm.make_wav_adpcm(samples))
    got2 = mm.decode_wav_adpcm(mm.make_wav_adpcm(samples))
    assert got1 == got2
    assert len(got1[2]) == n


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(_DIMS, st.integers(0, 2**32 - 1), st.booleans())
def test_bmp_roundtrip_property(dims, seed, _pad_parity):
    """BMP is lossless for ANY RGB content and size (row padding at every
    width mod 4, bottom-up file order inverted exactly)."""
    import random

    from big_data_project_spark.operators import multimodal as mm

    w, h = dims
    rng = random.Random(seed)
    px = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(w * h)
    ]
    assert mm.decode_bmp_24(mm.make_bmp_24(px, w, h)) == (h, w, "rgb", px)


_SCD2_FEED = st.lists(
    st.tuples(
        st.integers(0, 4),        # key
        st.integers(0, 2),        # batch index (ts-monotonic across batches)
        st.integers(0, 9),        # day within the batch's window
        st.sampled_from("ABCD"),  # attr value
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(_SCD2_FEED)
def test_scd2_fold_invariants_property(spark, feed):
    """scd2_apply folded batch-by-batch over ANY ts-monotonic change feed
    (multiple updates per key per batch, unchanged re-sends, gaps) keeps
    the SCD2 contract: exactly one OPEN version per key ever updated; each
    key's version chain is contiguous (closed valid_to == next valid_from);
    and the open (key → attr) map equals the ONE-SHOT apply of the whole
    feed — batching can add intermediate versions but never change where
    the dimension lands."""
    from big_data_project_spark.operators.maintenance import scd2_apply
    from big_data_project_spark.plans.lineage import lineage_cut

    def mk(rows):
        df = spark.createDataFrame(rows, "cust long, seg string, u_ts string")
        return df.withColumn("u_ts", F.to_timestamp("u_ts"))

    # batch i owns days [10i, 10i+9] -> strictly increasing ts across
    # batches per key (the documented scd2_sink ordering contract)
    def row(key, batch, day, attr):
        return (key, attr, f"2024-01-{batch * 10 + day + 1:02d} 00:00:00")

    batches = [
        [row(*u) for u in feed if u[1] == b] for b in range(3)
    ]
    empty = (
        spark.createDataFrame([], "cust long, seg string")
        .withColumn("valid_from", F.lit(None).cast("timestamp"))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
    )
    cur = empty
    for b in batches:
        if b:
            # cut lineage between folds, as every production path does
            # (scd2_sink persists the history to parquet per batch): a
            # 3-deep LAZY self-referential apply chain trips a Spark AQE
            # planner fault ("Can't zip RDDs with unequal numbers of
            # partitions" — union + exchange reuse), which is exactly why
            # scd2_apply's docstring requires materializing between
            # chained applies
            cur = lineage_cut(scd2_apply(cur, mk(b), "cust", "u_ts", ["seg"]))
    hist = cur.collect()

    keys_updated = {u[0] for u in feed}
    open_rows = [r for r in hist if r.valid_to is None]
    assert {r.cust for r in open_rows} == keys_updated
    assert len(open_rows) == len(keys_updated)  # exactly one open per key

    by_key = {}
    for r in hist:
        by_key.setdefault(r.cust, []).append(r)
    for k, rows in by_key.items():
        rows.sort(key=lambda r: r.valid_from)
        for a, b_ in zip(rows, rows[1:]):
            assert a.valid_to == b_.valid_from, (k, rows)
        assert rows[-1].valid_to is None

    oneshot = scd2_apply(
        empty, mk([row(*u) for u in feed]), "cust", "u_ts", ["seg"]
    ).collect()
    open_fold = {r.cust: r.seg for r in open_rows}
    open_oneshot = {r.cust: r.seg for r in oneshot if r.valid_to is None}
    assert open_fold == open_oneshot


_AUDIO_ENERGIES = st.lists(
    st.integers(0, 8000).map(lambda v: 4 * v),  # multiples of 4: /2 and /4 exact
    min_size=2,
    max_size=12,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(_AUDIO_ENERGIES)
def test_audio_fingerprint_scale_invariance_property(spark, energies):
    """audio_fingerprints is invariant under exact uniform volume scaling
    for ANY energy contour — including equal-energy plateaus (strict '>'
    keeps bit=0 on both the original and the scaled copy) and zeros."""
    from big_data_project_spark.operators import multimodal

    rows = []
    for i, scale in enumerate((1, 2, 4)):
        samples = [v for e in energies for v in (e // scale, 0, 0, 0)]
        rows.append((i, bytearray(multimodal.make_wav_pcm16(samples, 8000))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    feats = multimodal.decode_features(
        df, dim=4 * len(energies), decode="strict"
    )
    out = {
        r.doc_id: (r.fingerprint, r.n_windows)
        for r in multimodal.audio_fingerprints(feats, window=4).collect()
    }
    assert out[0] == out[1] == out[2]
    assert out[0][1] == len(energies)
    # the packed bits are exactly the strict-increase pattern
    want = sum(
        1 << (j - 1)
        for j in range(1, len(energies))
        if energies[j] > energies[j - 1]
    )
    assert out[0][0] == want

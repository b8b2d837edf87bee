"""bloom_bitmap / bloom_prune_join: exactness (superset-then-exact), actual
pruning power, and the narrow-prefilter plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_project_spark import plans
from big_data_project_spark.operators import relational as R


def _probe_build(spark, n=20000, step=97):
    probe = spark.range(0, n).selectExpr("id AS pk", "id % 7 AS junk")
    build = spark.range(0, n, step).selectExpr("id AS bk")
    return probe, build


def test_bloom_prune_join_equals_plain_semi_join(spark):
    probe, build = _probe_build(spark)
    got = sorted(
        r.pk for r in R.bloom_prune_join(probe, build, "pk", "bk").collect()
    )
    want = sorted(
        r.pk
        for r in probe.join(build, probe.pk == build.bk, "left_semi").collect()
    )
    assert got == want and len(got) > 0


def test_bloom_prefilter_is_superset_and_actually_prunes(spark):
    """The bloom candidate stage alone (before the exact join) must contain
    every true match (no false negatives — a bloom law, not a probability)
    and, at this key density, far fewer rows than the raw probe side."""
    probe, build = _probe_build(spark)
    bm = F.broadcast(R.bloom_bitmap(build, "bk", hash_fn="md5"))
    cand = probe.crossJoin(bm)
    hit = None
    for i in range(4):
        cand = cand.withColumn(f"_p{i}", R._bloom_pos("pk", i, 1 << 20, "md5"))
        c = F.expr(
            f"(coalesce(try_element_at(bloom, _p{i} div 63), CAST(0 AS BIGINT))"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(_p{i} % 63 AS INT))) != 0"
        )
        hit = c if hit is None else hit & c
    cand_keys = {r.pk for r in cand.where(hit).select("pk").collect()}
    true_keys = {r.bk for r in build.collect()}
    assert true_keys <= cand_keys  # zero false negatives
    assert len(cand_keys) < 20000 * 0.05  # pruned >95% of the probe side


def test_bloom_xxh64_fast_path_matches_md5_result(spark):
    probe, build = _probe_build(spark, n=5000, step=41)
    a = sorted(
        r.pk
        for r in R.bloom_prune_join(
            probe, build, "pk", "bk", hash_fn="xxh64"
        ).collect()
    )
    b = sorted(
        r.pk for r in R.bloom_prune_join(probe, build, "pk", "bk").collect()
    )
    assert a == b


def test_bloom_prefilter_stage_is_narrow(spark):
    """The probe-side membership test must add NO shuffle of the probe
    side: the only extra exchanges in the pruned plan are the bitmap
    build's two BOUNDED ones (the n_bits/63-word bit_or groupBy and the
    single-row map assembly) — never a probe-side repartition/explode."""
    probe, build = _probe_build(spark)
    plain = probe.join(build, probe.pk == build.bk, "left_semi")
    pruned = R.bloom_prune_join(probe, build, "pk", "bk")
    assert plans.num_shuffles(pruned) <= plans.num_shuffles(plain) + 2

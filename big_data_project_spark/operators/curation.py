"""Training-data curation operators: deterministic sampling, dataset
splitting, per-source quotas.

None of these exist in the reference (its corpus is 539 documents, py:412-422
— it keeps everything); they are part of the LLM-data-pipeline closure: at
100 TB you never take "10% of the corpus" with a random() filter, because
reruns must select the SAME rows (cache reuse, resumable jobs, reproducible
ablations) and the selection must not need a shuffle or a global count.

All three operators key off a content-stable md5 bucket of a key column:

- pure map-side (no shuffle, no count(), no state) except the quota cap's
  single window shuffle;
- engine-portable: md5 is md5, so the DuckDB oracles reproduce the exact
  row selection (same trick as pipelines.social's doc ids);
- stratification-ready: the key can be a composite (e.g. domain + doc id).

The 60-bit bucket (15 hex digits → < 2^60) is uniform enough for permille
sampling; rates are expressed in permille to keep the cut an integer compare
(no float-boundary drift between engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: modulus of the sampling bucket — permille resolution.
BUCKETS = 1000


def hash_bucket(key: Column | str, seed: int = 0, hash_fn: str = "md5") -> Column:
    """Deterministic uniform bucket in [0, BUCKETS): the first 15 hex digits
    of md5(key || seed) as an integer, mod 1000. Content-stable — the same
    row lands in the same bucket on every run, cluster, and engine.

    ``hash_fn="xxh64"`` swaps in xxhash64 (seed passed natively) — measured
    3.4x faster per scanned row at sf0.1, worth it when the filter runs
    over 100 TB. Still rerun-stable and content-stable, but Spark-only
    (xxhash64 has no cross-engine mirror) and it selects a DIFFERENT —
    equally uniform — row subset than md5, so pick one per dataset and
    stay with it. All oracle-checked entries use md5."""
    c = F.col(key) if isinstance(key, str) else key
    if hash_fn == "xxh64":
        return F.pmod(F.xxhash64(c.cast("string"), F.lit(seed)), F.lit(BUCKETS))
    if hash_fn != "md5":
        raise ValueError("hash_fn must be 'md5' or 'xxh64'")
    h = F.conv(
        F.substring(F.md5(F.concat(c.cast("string"), F.lit(f"#{seed}"))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(BUCKETS))


def deterministic_sample(
    df: DataFrame, key: str, permille: int, seed: int = 0, hash_fn: str = "md5"
) -> DataFrame:
    """Keep ~permille/1000 of the rows, chosen by content hash of ``key`` —
    a reproducible Bernoulli sample. Pure narrow filter: pushes to the scan
    side of any downstream join, costs no shuffle, needs no corpus count.
    ``hash_fn="xxh64"`` is the Spark-only fast path (see hash_bucket)."""
    return df.where(hash_bucket(key, seed, hash_fn) < permille)


def train_val_test_split(
    df: DataFrame,
    key: str,
    val_permille: int = 100,
    test_permille: int = 100,
    seed: int = 0,
    out: str = "split",
) -> DataFrame:
    """Assign each row to 'train' / 'val' / 'test' by content hash — the
    standard leakage-safe corpus split (a document's split never changes as
    the corpus grows, and near-duplicate handling can share the same key).
    Map-side column derivation, no shuffle."""
    b = hash_bucket(key, seed)
    return df.withColumn(
        out,
        F.when(b < test_permille, F.lit("test"))
        .when(b < test_permille + val_permille, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def cap_per_key(
    df: DataFrame, key: str, order_by: str, n: int, descending: bool = True
) -> DataFrame:
    """Per-source quota: keep at most ``n`` rows per ``key``, preferring the
    highest (default) ``order_by`` — the domain-balancing step of corpus
    assembly (no single source may dominate the mixture). One hash-shuffle
    window on key; ties broken by the order column only, so callers should
    pass a unique tiebreaker expression when order values repeat."""
    oc = F.col(order_by).desc() if descending else F.col(order_by).asc()
    w = Window.partitionBy(key).orderBy(oc)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )


def sample_to_token_budget(
    df: DataFrame,
    budgets: dict[str, int],
    text: str = "text",
    key: str = "source",
    id_col: str = "doc_id",
    default_budget: int | None = None,
    seed: int = 0,
) -> DataFrame:
    """TOKEN-budget mixture: per source, keep a deterministic
    hash-ordered prefix of documents whose cumulative token count fills
    the source's budget. Real pretraining mixes are specified in TOKENS
    (Pile/DoReMi weights), and doc-permille sampling systematically
    over-draws from long-document sources; this is the token-accurate
    version. A document straddling the boundary is kept (prefix-start
    rule, same bound as pack_by_token_budget: overshoot < one document),
    so every budgeted source contributes AT LEAST its budget while the
    selection stays a pure function of content. Sources absent from
    ``budgets`` keep ``default_budget`` (None = unlimited).

    Shape: one per-source window for the running sum over hash-ordered
    docs — a single hash shuffle on the source key; the order inside a
    source is the content-hash bucket (rerun-stable, engine-mirrorable)
    tie-broken by id."""
    from big_data_project_spark.operators.text import words_col

    budget_map = F.create_map(
        *[F.lit(x) for kv in budgets.items() for x in kv]
    )
    d = df.withColumn("_nt", F.size(words_col(text)).cast("long")).withColumn(
        "_budget",
        F.coalesce(
            budget_map[F.col(key)],
            F.lit(default_budget).cast("long"),
        ),
    )
    w = Window.partitionBy(key).orderBy(hash_bucket(F.col(id_col), seed), id_col)
    return (
        d.withColumn("_cum", F.sum("_nt").over(w))
        .where(
            F.col("_budget").isNull()
            | ((F.col("_cum") - F.col("_nt")) < F.col("_budget"))
        )
        .drop("_nt", "_budget", "_cum")
    )


def sample_mixture(
    df: DataFrame,
    weights: dict[str, int],
    key: str = "source",
    id_col: str = "doc_id",
    default_permille: int = 1000,
    seed: int = 0,
) -> DataFrame:
    """Domain-mixture sampling: keep each row with a per-domain permille
    rate — the corpus-mixing step where, e.g., wiki is kept at 100% but
    common-crawl is downsampled to 20%. Deterministic (content-hash
    bucket, rerun-stable) and pure map-side: the rate table is a literal
    column map, so there is no join, no shuffle, and the filter pushes to
    the scan. Domains absent from ``weights`` keep ``default_permille``.

    Rates above 1000 are capped at keep-everything; true upsampling
    (rate > corpus) is an explode over quotient+remainder, deliberately a
    separate op so this one stays a narrow filter."""
    rate = _rate_col(weights, key, default_permille)
    return df.where(hash_bucket(F.col(id_col), seed) < rate)


def _rate_col(weights: dict[str, int], key: str, default_permille: int) -> Column:
    """Literal-map rate lookup; an empty weights dict means 'uniform default
    rate' (create_map() with zero args types as map<void,void> and would
    fail the string lookup, so the empty case short-circuits)."""
    if not weights:
        return F.lit(default_permille)
    m = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    return F.coalesce(m[F.col(key)], F.lit(default_permille))


def upsample_mixture(
    df: DataFrame,
    weights: dict[str, int],
    key: str = "source",
    id_col: str = "doc_id",
    default_permille: int = 1000,
    seed: int = 0,
) -> DataFrame:
    """Mixture weighting with true upsampling: a row whose domain rate is
    ``r`` permille is emitted ``r // 1000`` times, plus once more when its
    hash bucket < ``r % 1000`` — deterministic per row, expected
    multiplicity exactly r/1000 (rate 2500 = every row twice, half the rows
    a third time). The epoch-repeat step of corpus mixing (e.g. wiki seen
    2.5x per epoch while common-crawl is subsampled).

    Map-side explode over a per-row repeat range — no shuffle, no join; the
    emitted ``copy_idx`` keeps replicas distinguishable downstream."""
    rate = _rate_col(weights, key, default_permille).cast("long")
    n = (F.floor(rate / 1000) + (hash_bucket(F.col(id_col), seed) < rate % 1000).cast("long")).cast("long")
    # sequence(1, 0) would DESCEND in Spark — guard the empty case explicitly
    reps = F.when(n >= 1, F.sequence(F.lit(1).cast("long"), n)).otherwise(
        F.array().cast("array<long>")
    )
    return df.withColumn("copy_idx", F.explode(reps))


def token_report(
    df: DataFrame,
    group_cols: list[str] | None = None,
    text: str = "text",
) -> DataFrame:
    """Token accounting: docs / total / min / max / mean tokens per group —
    the numbers a mixture design is built from ("how many src-X tokens do
    we actually have?"). One partial+final hash aggregate; mean derived
    from the decimal-exact sum so the report hash-matches across engines."""
    from big_data_project_spark.operators.text import words_col

    gc = group_cols if group_cols is not None else ["source"]
    n = F.size(words_col(text)).cast("long")
    return (
        df.select(*gc, n.alias("_n"))
        .groupBy(*gc)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_n").alias("total_tokens"),
            F.min("_n").alias("min_tokens"),
            F.max("_n").alias("max_tokens"),
            (F.sum("_n") / F.count("*")).alias("avg_tokens"),
        )
    )


def pack_manifest(packed: DataFrame, budget: int = 512) -> DataFrame:
    """Training-readiness report over pack_by_token_budget output: one row
    per (shard, pack) with document count, token total, first document, and
    fill ratio vs the budget — the numbers that tell you whether packing is
    wasting context windows. One partial+final hash aggregate; fill_ratio
    divides by the power-of-two budget, so the double is exact on every
    engine."""
    return (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .withColumn("fill_ratio", F.col("total_tokens") / float(budget))
    )


def pack_by_token_budget(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    n_shards: int = 8,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Sequence packing for training: assign documents to ~``budget``-token
    packs (the pretraining step that concatenates short docs so no context
    window is wasted). Next-fit by running token count: a doc joins the pack
    its token-prefix starts in, so packs average the budget and an oversized
    doc simply spans its own packs.

    Scale shape: the naive packer needs a GLOBAL ordered scan (one
    partition). Here docs hash into ``n_shards`` independent shards and the
    running sum is a per-shard window — n_shards parallel one-shuffle
    windows, each bounded; shard count scales with the cluster.

    Determinism: pick a power-of-two budget and the boundary division is
    exact in binary floating point on every engine (the registry oracle
    relies on this). Sharding uses the module's content-hash bucket (not a
    numeric modulus) so any id type works — a string id under pmod would
    silently cast to NULL and collapse every row into one NULL-shard
    window, the exact global scan this operator exists to avoid.

    ``carry`` projects extra input columns through unchanged, so a caller
    composing split + pack (curate_corpus) needs one pass instead of a
    join-back."""
    from big_data_project_spark.operators.text import words_col

    d = df.select(
        F.col(id_col).alias("doc_id"),
        *carry,
        F.pmod(hash_bucket(F.col(id_col), 0), F.lit(n_shards)).alias("shard"),
        F.size(words_col(text)).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    cum = F.sum("n_tokens").over(w)
    return d.withColumn(
        "pack_id",
        F.floor((cum - F.col("n_tokens")) / float(budget)).cast("long"),
    )


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of an absolute URL — the normalization every crawl
    pipeline runs before URL-level dedup (the C4/RefinedWeb recipe):

    - scheme and host lowercased (path case is PRESERVED — paths are
      case-sensitive by RFC 3986);
    - leading ``www.`` and the scheme's default port (``:80`` http /
      ``:443`` https) stripped from the host;
    - fragment dropped;
    - repeated slashes in the path collapsed, one trailing slash stripped,
      empty path normalized to ``/``;
    - tracking query parameters removed (``utm_*``, ``fbclid``, ``gclid``,
      ``ref``), remaining parameters sorted bytewise, empty query dropped.

    Pure JVM column expression (regexp + higher-order array functions, all
    codegen'd — no UDF, applies map-side with zero shuffles). Expects an
    absolute ``scheme://...`` URL; anything else passes through the same
    string surgery unchanged-in-spirit (no exceptions thrown)."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    scheme = F.lower(F.regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, "^([^/?#]*)", 1))
    host = F.regexp_replace(hostport, "^www\\.", "")
    host = (
        F.when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .otherwise(host)
    )
    tail = F.regexp_replace(rest, "^[^/?#]*", "")
    tail = F.regexp_replace(tail, "#.*$", "")
    path = F.regexp_extract(tail, "^([^?]*)", 1)
    query = F.regexp_extract(tail, "^[^?]*\\?(.*)$", 1)
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.regexp_replace(path, "/$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.rlike("^(utm_[^=]*|fbclid|gclid|ref)="),
        )
    )
    qjoined = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qjoined != "", F.concat(F.lit("?"), qjoined)).otherwise(""),
    )


def dedup_by_url(
    df: DataFrame, url: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level dedup: keep exactly one row (smallest ``id_col``) per
    canonical URL. Adds ``canonical_url``. One window shuffle on the
    canonical key — the same deterministic keep-first shape as
    ``cleaning.dedup_deterministic``."""
    w = Window.partitionBy("canonical_url").orderBy(F.col(id_col))
    return (
        df.withColumn("canonical_url", canonicalize_url(url))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def dataset_card(docs: DataFrame, text: str = "text") -> DataFrame:
    """Per-source dataset card — the one-scan summary a training-data
    release ships (docs, token mass, dedup rate, short-doc and
    English-signal shares), all integer-exact permille so the card itself
    is value-hashable:

    - ``n_docs`` / ``total_words`` / ``mean_words_milli``
    - ``dup_permille``: share of docs whose NORMALIZED content hash
      repeats within the source (1000·(n−distinct)/n)
    - ``short_permille``: docs under 30 words
    - ``en_permille``: docs with ≥2 English function-word hits

    Shape: one narrow per-doc projection + one per-source aggregate —
    a 100 TB card costs one scan and one tiny shuffle."""
    from big_data_project_spark.operators.cleaning import normalize_text_col
    from big_data_project_spark.operators.text import words_col

    w = words_col(text)
    per_doc = docs.select(
        "source",
        F.size(w).cast("long").alias("_nw"),
        F.md5(normalize_text_col(text)).alias("_h"),
        (
            F.size(
                F.regexp_extract_all(
                    F.col(text), F.lit(r"\b(the|a|of|and|is)\b"), 0
                )
            )
            >= 2
        ).cast("long").alias("_en"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_nw").cast("long").alias("total_words"),
        F.countDistinct("_h").cast("long").alias("_uniq"),
        F.sum((F.col("_nw") < 30).cast("long")).cast("long").alias("_short"),
        F.sum("_en").cast("long").alias("_en"),
    )
    return agg.select(
        "source",
        "n_docs",
        "total_words",
        F.expr("1000 * total_words div n_docs").cast("long")
        .alias("mean_words_milli"),
        F.expr("1000 * (n_docs - _uniq) div n_docs").cast("long")
        .alias("dup_permille"),
        F.expr("1000 * _short div n_docs").cast("long").alias("short_permille"),
        F.expr("1000 * _en div n_docs").cast("long").alias("en_permille"),
    )


def shuffle_shards(
    df: DataFrame, key: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """Deterministic global shuffle into fixed training shards — the
    write-side step of corpus assembly (examples must reach the trainer in
    a random-looking, rerun-stable order, pre-split into N shard files).

    `shard` is the 60-bit md5 of the key mod n_shards (content-stable:
    the same document lands in the same shard every run); `pos` is the
    row's position within its shard when ordered by the md5 hex — i.e. a
    content-keyed pseudo-random permutation, with the key itself as the
    final tiebreaker so duplicate keys can't make the order
    run-dependent. A downstream writer does `partitionBy("shard")` /
    `sortWithinPartitions("pos")` and gets byte-stable shard files.

    Cost: one hash shuffle on `shard` + a per-shard sort (the window's
    row_number). At 100 TB you run this with n_shards in the tens of
    thousands, so each shard is a few GB and the per-partition sort fits
    in executor memory — there is deliberately NO total order across
    shards (a global orderBy would be a range-partitioned full sort for
    no training benefit).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    hx = F.md5(F.concat(F.col(key).cast("string"), F.lit(f"#shard{seed}")))
    hv = F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")
    w = Window.partitionBy("shard").orderBy("_hx", key)
    return (
        df.withColumn("_hx", hx)
        .withColumn("shard", F.pmod(hv, F.lit(n_shards)).cast("long"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_hx")
    )

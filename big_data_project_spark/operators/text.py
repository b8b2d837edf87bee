"""Text / NLP-deterministic operators (SURVEY §2.4) and the text-analysis
closure for LLM data pipelines (language-ID, quality scoring, token counting,
fingerprinting).

Reference evidence: clean_text py:340-343, field coalescing py:412-422,
doc-text assembly py:363-367, token/sentence stats py:589-590. NER (py:348-352)
and sentiment (claimed README.md:7, absent from code) ship here as
deterministic carriers — gazetteer/regex NER and lexicon sentiment — exactly
the ORG/MONEY/DATE/PERCENT-style extraction validated in Report.pdf
§Experiments-2; model-backed variants plug in behind the same column contract
(see plugins.py) without entering the oracle surface.

Everything is built from JVM-side column functions (regexp_*, split, size,
aggregate) — no Python UDFs — so these run inside whole-stage codegen and
scale linearly with the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from big_data_project_spark.operators.cleaning import normalize_text_col

# ---------------------------------------------------------------------------
# N3/N4 field coalescing and document assembly
# ---------------------------------------------------------------------------

def coalesce_fields(df: DataFrame, candidates: list[str], out: str) -> DataFrame:
    """N3 (py:412-422): first-present of candidate columns → one field."""
    return df.withColumn(out, F.coalesce(*[F.col(c) for c in candidates]))


def assemble_doc_text(
    df: DataFrame, title: str, content: str, out: str = "text"
) -> DataFrame:
    """N4 (py:363-367): text = title + ' ' + content with null→'' on content."""
    return df.withColumn(
        out,
        F.concat_ws(" ", F.col(title), F.coalesce(F.col(content), F.lit(""))),
    )


# ---------------------------------------------------------------------------
# N5 token / text statistics
# ---------------------------------------------------------------------------

def words_col(col: Column | str) -> Column:
    """Whitespace tokenization of already-trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), "\\s+")


def token_stats(df: DataFrame, text: str = "text", with_bpe: bool = False) -> DataFrame:
    """N5 (py:589-590): word count, char count, distinct-word count, and
    mean word length; with_bpe adds the BPE-ish token estimate so the whole
    token-accounting family is one scan."""
    w = words_col(text)
    cols = [
        F.size(w).cast("long").alias("n_words"),
        F.length(F.col(text)).cast("long").alias("n_chars"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct_words"),
        (
            F.aggregate(w, F.lit(0.0), lambda acc, x: acc + F.length(x))
            / F.size(w)
        ).alias("avg_word_len"),
    ]
    if with_bpe:
        cols.append(bpe_ish_token_count(text).alias("n_tokens"))
    return df.select("doc_id", *cols)


def bpe_ish_token_count(col: Column | str) -> Column:
    """Token counting for budget estimation: whitespace words + a crude
    subword correction (words longer than 4 chars count ~len/4 tokens,
    mirroring BPE's behavior on long words)."""
    w = words_col(col)
    return F.aggregate(
        w,
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.greatest(F.lit(1), F.ceil(F.length(x) / 4)).cast("long"),
    )


# ---------------------------------------------------------------------------
# N1 deterministic NER (gazetteer + regex), N2 lexicon sentiment
# ---------------------------------------------------------------------------

#: gazetteer for the synthetic corpus; real deployments swap the term list.
NER_TERMS = ("spark", "join", "merge", "window", "stream", "vector")

#: regex classes mirroring the reference's validated entity types
#: (Report.pdf §Experiments-2: ORG/MONEY/DATE/PERCENT).
NER_PATTERNS = {
    "MONEY": r"\$[0-9][0-9,]*(?:\.[0-9]+)?",
    "PERCENT": r"[0-9]+(?:\.[0-9]+)?%",
    "DATE": r"[0-9]{4}-[0-9]{2}-[0-9]{2}",
    "TICKER": r"\b[A-Z]{2,5}\b",
}


def ner_gazetteer(df: DataFrame, text: str = "text") -> DataFrame:
    """N1 deterministic carrier: extract gazetteer terms as entities, one
    output row per hit (U4: one row → many via explode)."""
    pattern = r"\b(" + "|".join(NER_TERMS) + r")\b"
    return df.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.col(text), F.lit(pattern), 1)).alias(
            "entity"
        ),
    )


def ner_regex(df: DataFrame, text: str = "text") -> DataFrame:
    """N1 regex classes: MONEY / PERCENT / DATE / TICKER spans."""
    parts = [
        df.select(
            "doc_id",
            F.lit(label).alias("entity_type"),
            F.explode(
                F.regexp_extract_all(F.col(text), F.lit(pat), 0)
            ).alias("entity"),
        )
        for label, pat in NER_PATTERNS.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


#: AFINN-style micro-lexicon over the synthetic vocab.
POSITIVE_WORDS = ("fast", "big")
NEGATIVE_WORDS = ("slow", "small", "dup")


def sentiment_lexicon(df: DataFrame, text: str = "text") -> DataFrame:
    """N2 deterministic carrier: lexicon polarity score = #pos − #neg hits,
    labeled positive/negative/neutral."""
    pos_pat = r"\b(" + "|".join(POSITIVE_WORDS) + r")\b"
    neg_pat = r"\b(" + "|".join(NEGATIVE_WORDS) + r")\b"
    pos = F.size(F.regexp_extract_all(F.col(text), F.lit(pos_pat), 0))
    neg = F.size(F.regexp_extract_all(F.col(text), F.lit(neg_pat), 0))
    return df.select(
        "doc_id",
        pos.cast("long").alias("n_pos"),
        neg.cast("long").alias("n_neg"),
        (pos - neg).cast("long").alias("score"),
        F.when(pos - neg > 0, "positive")
        .when(pos - neg < 0, "negative")
        .otherwise("neutral")
        .alias("sentiment"),
    )


# ---------------------------------------------------------------------------
# Text-analysis closure: language ID, quality score, fingerprint
# ---------------------------------------------------------------------------

#: tiny per-language function-word lists (n-gram heuristic carrier).
LANG_STOPWORDS = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "et", "les", "est"),
}


def _hits(text: str, words: tuple[str, ...]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.col(text), F.lit(pat), 0))


def _lang_best(score_of) -> Column:
    """Argmax-with-deterministic-ties struct: pick the declaration-first
    language among score maxima (struct comparison: score, then priority)."""
    return F.greatest(
        *[
            F.struct(
                score_of(lang).alias("s"),
                F.lit(len(LANG_STOPWORDS) - i).alias("prio"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(LANG_STOPWORDS)
        ]
    )


def lang_id(df: DataFrame, text: str = "text") -> DataFrame:
    """Language ID via stopword-hit argmax (deterministic tie-break by
    language code order en < de < es < fr via greatest-struct trick)."""
    scored = df.select(
        "doc_id",
        *[
            _hits(text, ws).alias(f"score_{lang}")
            for lang, ws in LANG_STOPWORDS.items()
        ],
    )
    best = _lang_best(lambda lang: F.col(f"score_{lang}"))
    return scored.select(
        "doc_id",
        best["lang"].alias("detected_lang"),
        best["s"].cast("long").alias("stopword_hits"),
    )


def quality_score(df: DataFrame, text: str = "text") -> DataFrame:
    """Quality heuristics: length, stopword ratio, distinct-word (lexical
    diversity) ratio — the standard cheap pre-filters for LLM training data."""
    w = words_col(text)
    n_words = F.size(w)
    stop_hits = _hits(text, LANG_STOPWORDS["en"])
    return df.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        (stop_hits / n_words).alias("stopword_ratio"),
        (F.size(F.array_distinct(w)) / n_words).alias("diversity"),
        F.when(n_words >= 20, 1).otherwise(0).alias("len_ok"),
    )


def fingerprint(df: DataFrame, text: str = "text") -> DataFrame:
    """Document fingerprint: md5 of normalized text — the exact-dedup key
    and a stable doc identity for lineage."""
    return df.select(
        "doc_id", F.md5(normalize_text_col(text)).alias("fingerprint")
    )


def text_profile(df: DataFrame, text: str = "text") -> DataFrame:
    """One-scan text-analysis profile: the per-document columns of
    lang_id + quality_score + fingerprint computed in a SINGLE select (no
    self-joins, no repeated scans — at 100 TB the three analyses share one
    pass over the corpus)."""
    w = words_col(text)
    n_words = F.size(w)
    best = _lang_best(lambda lang: _hits(text, LANG_STOPWORDS[lang]))
    return df.select(
        "doc_id",
        best["lang"].alias("detected_lang"),
        best["s"].cast("long").alias("stopword_hits"),
        n_words.cast("long").alias("n_words"),
        (_hits(text, LANG_STOPWORDS["en"]) / n_words).alias("stopword_ratio"),
        (F.size(F.array_distinct(w)) / n_words).alias("diversity"),
        F.when(n_words >= 20, 1).otherwise(0).alias("len_ok"),
        F.md5(normalize_text_col(text)).alias("fingerprint"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 100,
    overlap: int = 20,
    text: str = "text",
) -> DataFrame:
    """Training-data / RAG chunking: split each document into overlapping
    word windows (one output row per chunk). Pure JVM array expressions —
    sequence of start offsets, slice, join — so chunking a 100 TB corpus is
    a narrow map stage (no shuffle, no Python).

    chunk_id is the window ordinal; n_words the actual (possibly short,
    tail) chunk length."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    step = chunk_size - overlap
    w = words_col(text)
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(w) - 1, F.lit(0)), F.lit(step)
    )
    exploded = df.select(
        "doc_id", w.alias("_w"), F.explode(starts).alias("_start")
    )
    chunk = F.slice(F.col("_w"), F.col("_start") + 1, chunk_size)
    return (
        exploded.select(
            "doc_id",
            (F.col("_start") / step).cast("long").alias("chunk_id"),
            F.array_join(chunk, " ").alias("chunk_text"),
            F.size(chunk).cast("long").alias("n_words"),
        )
        .where(F.col("n_words") > 0)
    )


#: PII patterns (redaction carriers; swap for production-grade lists).
#: Order matters: SSN before PHONE — the phone pattern (digits+dashes)
#: would otherwise consume SSN-shaped spans.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    (r"\+?[0-9][0-9\-]{6,}[0-9]", "[PHONE]"),
)


def redact_pii(df: DataFrame, text: str = "text", out: str = "redacted") -> DataFrame:
    """PII scrubbing for training-data curation: regex-redact emails, phone
    numbers and SSN-shaped spans to typed placeholder tokens. A chain of
    regexp_replace column expressions — whole-stage-codegen'd, linear."""
    c: Column = F.col(text)
    for pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return df.withColumn(out, c)


def repetition_score(df: DataFrame, text: str = "text") -> DataFrame:
    """Boilerplate/repetition detector (Gopher-style quality rule): the
    fraction of duplicated word trigrams, 1 − distinct/total, computed as a
    per-row array expression (no explode, no shuffle)."""
    w = words_col(text)
    # try_element_at, not element_at: for docs under 3 words the sequence
    # still emits index 1, and under ANSI mode (Spark 4 default) an
    # out-of-bounds element_at fails the whole job. NULL-on-miss matches the
    # DuckDB oracle's w[i] semantics (concat_ws skips NULLs on both engines).
    tri = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(w) - 2, F.lit(1))),
        lambda i: F.concat_ws(
            " ",
            F.try_element_at(w, i),
            F.try_element_at(w, i + 1),
            F.try_element_at(w, i + 2),
        ),
    )
    n_tri = F.size(tri)
    score = F.when(
        n_tri > 0,
        1.0 - F.size(F.array_distinct(tri)) / n_tri,
    ).otherwise(F.lit(0.0))
    return df.select(
        "doc_id",
        n_tri.cast("long").alias("n_trigrams"),
        score.alias("repetition_ratio"),
    )


def tf_idf(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", use_log: bool = False
) -> DataFrame:
    """TF-IDF over whitespace terms. One explode + two aggregations — the
    standard two-shuffle shape (by (doc, term), then an equi-join back on
    term).

    The per-term document-frequency table is deliberately NOT broadcast-
    hinted: its cardinality is the corpus vocabulary, which at 100 TB is
    billions of terms — a mandatory broadcast OOMs every executor. The term
    join is a plain shuffle equi-join (both sides already hash-partitioned
    on term from the aggregations, so AQE typically elides one exchange) and
    AQE's size-based planning still broadcasts dfreq automatically whenever
    it is actually small. Only the single-row corpus-size aggregate keeps an
    explicit broadcast.

    LAZY: the corpus size N enters the plan as a broadcast single-row
    aggregate (no driver-side count() action — building the plan runs no
    job, and N is computed in the same execution as everything else).

    use_log=False keeps idf as the raw ratio (N+1)/(df+1): integer-exact
    division is bit-stable across engines (oracle-matchable), while log's
    last-ulp varies by libm. use_log=True applies ln for the classic
    weighting (rows-only checked)."""
    terms = df.select(
        F.col(id_col).alias("doc_id"), F.explode(words_col(text)).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = df.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    idf = (F.col("_n_docs") + 1.0) / (F.col("df") + 1)
    if use_log:
        idf = F.log(idf)
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (F.col("tf") * idf).alias("tfidf"),
        )
    )

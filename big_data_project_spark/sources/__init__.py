"""Source connectors (SURVEY §2.1).

The file-format readers/writers (S1–S4, S7–S9) live in
``big_data_project_spark.io`` and are re-exported here. S5/S6 — the
reference's HTTP scrape (py:10-31) and Reddit/PRAW (py:99-122) fetchers —
are first-class Spark 4 Python Data Sources in
``big_data_project_spark.sources.connectors``:
``spark.read.format("cnbc_articles")`` / ``format("reddit_posts")`` (the
latter also streams). Each has a deterministic local-fixture mode (tested
here) and a stdlib-urllib live mode (real code; needs network). The
``fetch_*`` helpers below are thin driver-side conveniences over the same
modes for parity with the reference's function surface (py:10-31,
py:99-122)."""

from __future__ import annotations

from big_data_project_spark.io import (  # noqa: F401
    TABLES,
    from_rows,
    load_table,
    read_csv,
    read_json,
    read_parquet,
    register_views,
    write_csv,
    write_json,
    write_parquet,
)
from big_data_project_spark.sources.connectors import (  # noqa: F401
    CnbcArticlesDataSource,
    RedditPostsDataSource,
    register_connectors,
)
from big_data_project_spark.sources.jsonl_sink import (  # noqa: F401
    JsonlFilesDataSource,
    register_jsonl_sink,
)


def fetch_cnbc_articles(index_url: str, prefix: str = ""):  # pragma: no cover
    """S5 (py:10-31) driver-side convenience: scrape index links + article
    bodies over stdlib urllib, returning list[tuple] shaped like
    pipelines.social.CNBC_SCHEMA. The distributed form is
    ``spark.read.format("cnbc_articles").option("index_url", ...)``, which
    fans the per-article fetches across executors — prefer it."""
    from big_data_project_spark.sources import connectors as c

    reader = c._CnbcReader({"index_url": index_url, "prefix": prefix})
    return [row for p in reader.partitions() for row in reader.read(p)]


def fetch_reddit_posts(
    subreddit: str, limit: int = 500, base_url: str | None = None
):  # pragma: no cover
    """S6 (py:99-122) driver-side convenience: the public /new.json listing
    (paged with ``after`` cursors until ``limit`` rows, like PRAW's
    .new(limit)) projected to pipelines.social.REDDIT_SCHEMA order — no
    PRAW or credentials needed. The source form is
    ``spark.read.format("reddit_posts").option("subreddit", ...)``; the
    streaming poll is ``spark.readStream.format("reddit_posts")``.
    ``base_url`` is injectable so offline tests can point at an
    unroutable endpoint."""
    from big_data_project_spark.sources import connectors as c

    return c._reddit_listing_rows(subreddit, limit, base_url or c._REDDIT_BASE)

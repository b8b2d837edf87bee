"""Source connectors (SURVEY §2.1).

The file-format readers/writers (S1–S4, S7–S9) live in
``big_data_project_spark.io`` and are re-exported here. S5/S6 — the
reference's HTTP scrape (py:10-31) and Reddit/PRAW (py:99-122) fetchers —
are *external* connectors: network fetch happens outside the engine core
and lands as JSON-lines; the engine-side contract is the in-memory /
JSON-lines source plus the normalization pipelines
(``pipelines.social``). ``fetch_*`` stubs document that seam and raise
when the optional client libraries are absent, keeping the core free of
network dependencies."""

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


def fetch_cnbc_articles(index_url: str, prefix: str):  # pragma: no cover
    """S5 (py:10-31): scrape article links + bodies. Requires requests/bs4/
    newspaper3k — not part of the engine core. Returns list[dict] shaped
    like pipelines.social.CNBC_SCHEMA."""
    raise NotImplementedError(
        "network connector: run outside the engine and feed the JSON-lines "
        "contract (pipelines.social.load_cnbc)"
    )


def fetch_reddit_posts(subreddit: str, limit: int = 500):  # pragma: no cover
    """S6 (py:99-122): PRAW .new(limit) projection. Requires praw +
    credentials. Returns list[dict] shaped like
    pipelines.social.REDDIT_SCHEMA."""
    raise NotImplementedError(
        "network connector: run outside the engine and feed the JSON-lines "
        "contract (pipelines.social.load_reddit)"
    )

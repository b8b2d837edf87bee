"""graph.pagerank semantics: pinned against a sequential Python model of the
identical integer fixed-point chain, plus structural properties."""

from __future__ import annotations

from big_data_project_spark.operators import graph


def _model_pagerank(edges, dp=850, iterations=3):
    """Sequential reference model: same pico-unit integer arithmetic as
    graph.pagerank (floor division on all-positive quantities)."""
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = {v: graph.RANK_SCALE // n for v in nodes}
    for _ in range(iterations):
        s = {v: 0 for v in nodes}
        for u, v in edges:
            s[v] += r[u] // outdeg[u]
        r = {
            v: (1000 - dp) * graph.RANK_SCALE // (1000 * n) + dp * s[v] // 1000
            for v in nodes
        }
    return r


def test_pagerank_matches_sequential_model(spark):
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),  # cycle
        ("d", "a"), ("e", "a"), ("f", "a"),  # fan-in to a
        ("a", "d"),
        ("d", "a"),  # duplicate edge: must collapse
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        row["node"]: row["rank_pico"]
        for row in graph.pagerank(df, iterations=3).collect()
    }
    assert got == _model_pagerank(edges)


def test_pagerank_cycle_is_uniform(spark):
    """On a pure cycle every node keeps 1/N of the mass (up to the defined
    floor truncation) — and all nodes are exactly equal."""
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    out = graph.pagerank(
        spark.createDataFrame(edges, ["src", "dst"]), iterations=4
    ).collect()
    ranks = {r["rank_pico"] for r in out}
    assert len(ranks) == 1
    (r,) = ranks
    assert abs(r - graph.RANK_SCALE // 4) <= 4  # floor loss only

def test_pagerank_hub_outranks_leaves(spark):
    edges = [(f"leaf{i}", "hub") for i in range(8)] + [("hub", "leaf0")]
    out = {
        r["node"]: r["rank_pico"]
        for r in graph.pagerank(
            spark.createDataFrame(edges, ["src", "dst"]), iterations=3
        ).collect()
    }
    assert out["hub"] > max(v for k, v in out.items() if k != "hub")


def test_source_rank_weights_bounds(spark):
    edges = [(f"leaf{i}", "hub") for i in range(8)] + [("hub", "leaf0")]
    ranks = graph.pagerank(
        spark.createDataFrame(edges, ["src", "dst"]), iterations=2
    )
    top = max(ranks.collect(), key=lambda r: r["rank_pico"])["node"]
    w = {
        r["node"]: r["weight_permille"]
        for r in graph.source_rank_weights(ranks).collect()
    }
    assert w[top] == 1000  # the max node saturates
    assert all(0 <= v <= 1000 for v in w.values())

"""Physical-plan fingerprints — the deterministic regression gate the
bench host cannot be (VERDICT r8 #1).

Round-8 forensics proved the shared bench host unable to grade timing:
twelve same-code runs of the 32-headliner suite read 25.0-52.6s,
uncorrelated with loadavg or steal (the host caps the guest page cache
at ~1.7 GiB and reclaims it). Timing regressions therefore hide inside
±110% noise — but the regressions that MATTER at 100 TB are plan-shape
regressions (a lost broadcast, an unpushed filter, a scan that stopped
pruning, an extra shuffle), and those are visible in the physical plan
BEFORE execution, deterministically.

:func:`plan_fingerprint` digests a DataFrame's formatted physical plan
into the features that define its scale behavior:

- the normalized operator TREE (node kinds with depth — an extra
  Exchange or a HashAggregate that became SortAggregate changes it);
- ``exchanges`` / ``broadcast_exchanges`` counts (shuffle inventory);
- every join's algorithm + join type (BroadcastHashJoin Inner vs
  SortMergeJoin Inner is THE 100 TB difference);
- every scan's source + post-pruning ReadSchema columns + pushed
  filters (column pruning and predicate pushdown, read straight from
  the scan node);
- ``take_ordered`` (TakeOrderedAndProject vs global sort for top-k).

Normalization strips everything run-varying: expression ids (``#123``),
plan ids, codegen stage ids, partition counts, absolute paths (scan
locations reduce to their basename; random temp dirs to ``<dynamic>``).
The result is a pure function of the PLAN, not the session — pinned
digests for every bench headliner live in ``tests/plan_fingerprints.json``
(regenerate with ``python tools/regen_plan_fingerprints.py`` after a
deliberate plan change) and are enforced by
``tests/test_plan_fingerprints.py::test_headliner_plan_fingerprint``.
"""

from __future__ import annotations

import posixpath
import re

from pyspark.sql import DataFrame

#: Non-headliner registry entries whose PLANS are scale-load-bearing
#: enough to pin alongside the 32 bench headliners: the sf25/sf50
#: ceiling-closer, the fired-guard star topology, the CDC algebra, and
#: the auto-params ANN path. tools/regen_plan_fingerprints.py pins
#: headliners + these; tests/test_plan_fingerprints.py enforces the
#: union.
EXTRA_PINNED_QUERIES = (
    "dd_near_dedup_lsh_prefilter",
    "dd_semantic_capped",
    "mt_merge_upsert",
    "mt_scd2_orders",
    "e5_auto_lsh_topk",
)

#: The second digest set is pinned at sf1 (VERDICT r9 #1): broadcast
#: decisions are SIZE-dependent, so a gate pinned only at sf0.01 —
#: where every dimension auto-broadcasts — cannot see a lost broadcast
#: that only manifests above the 10 MB threshold (orders/events cross
#: it at sf1; q5/q17's lineitem⋈orders legs genuinely flip BHJ→SMJ
#: between the two SFs). The sf1 section pins the SAME universe as the
#: sf0.01 one — every bench headliner plus EXTRA_PINNED_QUERIES (the
#: r9 verdict asked for the 10 most shuffle-heavy; pinning all also
#: freezes at-scale scan pruning/pushdown for the scan-bound
#: headliners, at ~60s extra gate cost) — so both the regen tool and
#: the test derive the name list from ``registry.headline_queries()``
#: + ``EXTRA_PINNED_QUERIES`` directly. Inputs regenerate
#: deterministically via ``python tools/gen_testdata.py --sf 1 --out
#: testdata_local/sf1`` (hash-of-id data, fixed file counts — the test
#: fixture rebuilds it when the per-round wipe removed it).

#: basenames that are not stable across runs: uuid/hex fragments, tmp
#: staging dirs, checkpoint/batch dirs with generated indices
_DYNAMIC_BASE = re.compile(r"[0-9a-f]{8}|tmp|temp|checkpoint|batch-|base-", re.I)

_TREE_LINE = re.compile(r"^[\s:+*-]*([A-Za-z][\w .$]*?)\s*\((\d+)\)\s*$")
_DETAIL_HEADER = re.compile(r"^\((\d+)\)\s+(\S.*?)\s*(?:\[codegen id : \d+\])?\s*$")
_EXPR_ID = re.compile(r"#\d+L?")
_PLAN_ID = re.compile(r",?\s*\[plan_id=\d+\]")


def explain_formatted(df: DataFrame) -> str:
    """The string ``df.explain('formatted')`` prints (PySpark only offers
    the print)."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), "formatted"
    )


def _norm_location(arg: str) -> str:
    """InMemoryFileIndex [file:/x/y/lineitem.parquet, ...] → stable names."""
    inner = arg[arg.index("[") + 1 : arg.rindex("]")] if "[" in arg else arg
    names = []
    for p in inner.split(","):
        base = posixpath.basename(p.strip().rstrip("/"))
        names.append("<dynamic>" if _DYNAMIC_BASE.search(base) else base)
    return ",".join(sorted(set(names)))


def plan_fingerprint(df: DataFrame) -> dict:
    """Digest the formatted physical plan into its scale-defining shape
    (see module docstring). Deterministic for a fixed plan: every
    run-varying token is normalized away."""
    text = explain_formatted(df)
    lines = text.splitlines()

    tree: list[str] = []
    # keyed by (section#, node#) — node headers repeat their NAME (two
    # "Scan parquet" nodes are the norm), and node numbers restart in
    # each "===== Subqueries =====" section
    details: dict[tuple[int, str], list[str]] = {}
    section = 0
    current: tuple[int, str] | None = None
    for ln in lines:
        if ln.startswith("====="):
            section += 1
            current = None
            continue
        m = _TREE_LINE.match(ln)
        if m:
            # depth from the indentation prefix (2 chars per level)
            prefix = ln[: ln.index(m.group(1))]
            depth = max(0, (len(prefix.rstrip()) + 1) // 3)
            name = m.group(1).strip().lstrip("* ").strip()
            tree.append(f"{depth} {name}")
            current = None
            continue
        h = _DETAIL_HEADER.match(ln)
        if h:
            current = (section * 100000 + int(h.group(1)), h.group(2).strip())
            details.setdefault(current, [])
            continue
        if current is not None and ln.strip():
            details[current].append(ln.strip())

    scans: list[str] = []
    joins: list[str] = []
    pushed: list[str] = []
    for (_, header), body in details.items():
        kind = header.split("[")[0].strip()
        if kind.startswith("Scan"):
            loc = next(
                (b for b in body if b.startswith("Location")), ""
            )
            schema = next(
                (b for b in body if b.startswith("ReadSchema")), ""
            )
            cols = ""
            if "struct<" in schema:
                inner = schema[schema.index("struct<") + 7 : schema.rindex(">")]
                # top-level fields only: split on commas at depth 0
                fields, dep, cur = [], 0, ""
                for ch in inner:
                    if ch == "," and dep == 0:
                        fields.append(cur)
                        cur = ""
                        continue
                    if ch in "<(":
                        dep += 1
                    elif ch in ">)":
                        dep -= 1
                    cur += ch
                if cur:
                    fields.append(cur)
                cols = ",".join(sorted(f.split(":")[0] for f in fields))
            src = _norm_location(loc.split(":", 1)[1].strip()) if loc else ""
            scans.append(f"{kind}[{src}]({cols})")
            pf = next((b for b in body if b.startswith("PushedFilters")), "")
            if pf:
                pushed.append(f"{src}: {_EXPR_ID.sub('', pf.split(':', 1)[1].strip())}")
        elif "Join" in kind or kind == "CartesianProduct":
            jt = next(
                (b.split(":", 1)[1].strip() for b in body if b.startswith("Join type")),
                "",
            )
            joins.append(f"{kind} {jt}".strip())

    node_names = [t.split(" ", 1)[1] for t in tree]
    return {
        "tree": tree,
        "exchanges": sum(n == "Exchange" for n in node_names),
        "broadcast_exchanges": sum(n == "BroadcastExchange" for n in node_names),
        "joins": sorted(joins),
        "scans": sorted(scans),
        "pushed_filters": sorted(pushed),
        "take_ordered": sum(
            n.startswith("TakeOrderedAndProject") for n in node_names
        ),
    }

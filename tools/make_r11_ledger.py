#!/usr/bin/env python
"""Generate the OPTIMIZATION_r11.md per-headliner ledger table from
bench_history.jsonl records + hand-written analysis notes.

Columns: query | r10 driver min | r11 final min | what was done.
"r10 driver min" = the per-query minima the grading driver recorded in
BENCH_r10.json (history id 1786973360 predates round-11 changes but ran
on this round's host; the BENCH_r10 record itself is the cross-round
anchor). "r11 final min" = min over this round's post-change shared-bench
records (pass ids on the command line).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NOTES = {
    "q1_pricing_summary": (
        "Examined (plan + spread experiment). Plan already optimal: pushed "
        "shipdate filter, partial+final decimal agg, 2 exchanges. Re-collect "
        "of the built plan is 0.07 s — the bench cost is per-rep plan "
        "construction/AQE scheduling, so a spread_input repartition (tested: "
        "0.074→0.061 s exec) was NOT adopted; not worth a plan change."
    ),
    "p5_filter_project": "Examined. Scan+filter+project, PushedFilters green; left alone.",
    "q3_shipping_priority": "Examined. BHJ + TakeOrderedAndProject already; benefits from #8 schema memo (3 tables).",
    "mm_jpeg_decode": (
        "Wave-1 spread_input (#4). Two MapInPandas nodes = fixture JPEG "
        "ENCODE (test-data synthesis, inherently Python) + the strict decode "
        "operator itself; at scale payloads come from storage, leaving one "
        "Python node. Real per-row codec work — left alone."
    ),
    "j1_revenue_by_segment": "Examined. BHJ, partial agg; benefits from #8 schema memo.",
    "j2_part_revenue_by_brand": "Examined. BHJ BuildRight + partial agg — the right shape; benefits from #8 schema memo.",
    "w1_top_orders_per_customer": "Examined. Single window over partitioned keys; left alone.",
    "dd_near_dedup_lsh": (
        "Wave-1 #6/#7 (CC fast path + stats firewall) and stage decomposition "
        "this session: build 1.27 s driver chatter (0.83 s = two justified "
        "localCheckpoint plan-builds), sh-mat 0.11, cand 0.22, verify 0.56, "
        "CC+final 1.1. The two cuts are the one-tokenize-pass contract and "
        "stay; #9 trimmed helper chatter; #8 first cut regressed it in aged sessions (root-caused + fixed, see #8)."
    ),
    "e3_knn_l2": "#9: dot/l2 folds build as one SQL parse; zero-shuffle plan pinned.",
    "st_tumbling_hourly": "Examined. Native window agg, batch twin; left alone.",
    "dd_exact_groups": "Examined. Hash-group + min-id keeper; one shuffle; left alone.",
    "tx_text_analysis": "#9 via words_col string path.",
    "q5_local_supplier": "Examined. 6-table BHJ chain; #8 schema memo removed 5 per-build schema inferences (jobs 13→7).",
    "q17_correlated_subquery": "Examined. Subquery scan deduped via exchange reuse (pinned); left alone.",
    "q10_returned_items": "Examined. BHJ + agg; benefits from #8 schema memo.",
    "r6_rag_batch": "Wave-1 #1 (Catalyst hash-embed). Batched retrieval+prompt+generate+evaluate; left alone.",
    "q18_large_orders": "Examined. Semi-join on the having-agg; exchange reuse; left alone.",
    "dd_decontaminate": "Examined. N-gram blocked semi-join (never all-pairs); benefits from #9 words_col.",
    "dd_line_dedup": "Examined. Explode + count-distinct + semi-join; #9 words_col; left alone.",
    "tx_quality_filter": "Wave-1 #4 spread_input; #9: trigram/alpha/char-sum exprs one SQL parse (build 0.53→0.17 s).",
    "tx_classifier": "#9: train/score projections selectExpr (build 0.81→0.21 s); model stays ≤1024-row broadcast.",
    "e9_pq_adc_topk": "#9: pq_subvectors + ADC fold + l2 one SQL parse (5.52→1.24 s profiled total).",
    "e11_sq8_topk": "#9: sq8 encode/recon/score one SQL parse (1.69→0.35 s profiled total).",
    "mm_strict_decode": "Wave-1 #4 spread_input. Same two-Python-node fixture+decode shape as mm_jpeg; left alone.",
    "mm_video_frames": "Wave-1 #4 spread_input. Pure-Catalyst GIF decode; single-Python-node plan pinned; left alone.",
    "q6_forecast_revenue": "Examined. Scan+filter+global agg; left alone.",
    "q8_market_share": "Examined. 7-table join tree; #8 schema memo removed 0.77 s/build of schema inference (jobs 16→9).",
    "q13_customer_distribution": "Examined. Outer join + two-level agg; left alone.",
    "dd_span_dedup": (
        "Wave-1 #4 spread_input; #9 words_col. The skew-safe gram cut "
        "(localCheckpoint) keeps the tokenize+explode pass single; its 0.4 s "
        "plan-build cost accepted (the cut is the at-scale contract)."
    ),
    "ts_anomaly": "Examined. Window stats + filter; left alone.",
    "ts_ohlc": "Examined. One agg over time buckets; left alone.",
    "pl_hybrid_retrieval": (
        "Wave-1 #1/#2/#3/#5 (Catalyst embed, one-pass BM25 + exchange reuse, "
        "SQL-string rank comparator, coalesce(1) query row); #9 dot() string "
        "path. Isolated A/B vs r9 tree: 2.85→2.16 s (−24%)."
    ),
}


def main() -> int:
    ids = sys.argv[1:]
    hist = [json.loads(l) for l in open(os.path.join(REPO, "bench_history.jsonl"))]
    r10 = json.load(open(os.path.join(REPO, "BENCH_r10.json")))
    # BENCH_r10.json tail holds queries_min — parse it out of the tail text
    import re
    m = re.search(r'"queries_min": ({[^}]*})', r10.get("tail", ""))
    r10_min = json.loads(m.group(1)) if m else {}
    finals = [h for h in hist if h.get("id") in ids]
    assert finals, "no matching history ids"
    names = list(finals[0]["queries_min"])
    print("| query | r10 driver min (s) | r11 final min (s) | Δ | examined / changed |")
    print("|---|---|---|---|---|")
    order = sorted(names, key=lambda n: -min(f["queries_min"][n] for f in finals))
    for n in order:
        b = r10_min.get(n)
        a = min(f["queries_min"][n] for f in finals)
        delta = f"{(a - b) / b * 100:+.0f}%" if b else "new"
        bs = f"{b:.3f}" if b else "—"
        print(f"| {n} | {bs} | {a:.3f} | {delta} | {NOTES.get(n, 'Examined.')} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Engine operators (SURVEY §2), grouped by family:

- relational:  projections/filters (§2.2), aggregations/joins/windows/sorts (§2.7)
- cleaning:    normalize/trim/dedup/set-ops (§2.3) + the §1.4 semantics fixes
- text:        NLP-deterministic carriers (§2.4) + text-analysis closure
- dedup:       LLM-pipeline dedup family (exact, minhash-LSH, simhash, jaccard)
- vector:      embedding similarity search (§2.5) — exact top-k + ANN
- rag:         prompt assembly + heuristic evaluation (§2.6, deterministic parts)
"""

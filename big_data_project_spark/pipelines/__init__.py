"""Reference pipelines re-expressed as engine programs (SURVEY §7 step 4):

- sec:    SEC_filings.csv ETL (ingest → clean → metadata → store),
          mirroring ai_powered_financial_analysis.py:203-311 with the
          §1.4 semantics fixes.
- social: CNBC/Reddit normalize + unify (py:99-174, py:334-345) into one
          document table.
- curation: the LLM-corpus assembly line (dedup → near-dup cluster drop →
          decontaminate → quality gate → mixture → split → pack) as one
          composed program; no reference counterpart — part of the
          training-data closure.
"""

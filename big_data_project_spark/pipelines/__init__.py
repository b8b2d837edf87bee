"""Reference pipelines re-expressed as engine programs (SURVEY §7 step 4):

- sec:    SEC_filings.csv ETL (ingest → clean → metadata → store),
          mirroring ai_powered_financial_analysis.py:203-311 with the
          §1.4 semantics fixes.
- social: CNBC/Reddit normalize + unify (py:99-174, py:334-345) into one
          document table.
"""

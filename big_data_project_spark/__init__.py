"""big_data_project_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of the
reference pipeline (NikhilGithub77/Big-Data_Project, "FinInsight": ingest →
clean → transform → store → embed → search → generate → evaluate), plus the
LLM-data-pipeline closure (dedup, similarity search, multimodal columns,
text analysis) designed for 100 TB scale.

Architecture: every operator is a pure logical-plan builder over
``pyspark.sql.DataFrame`` — no driver-side collects, no in-process indexes.
Catalyst + Tungsten pick the physical strategy; Pandas UDFs are used only
where built-in functions cannot express the semantics (model inference,
multimodal decode).
"""

from big_data_project_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

"""csv2parquet_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of ``domoritz/csv2parquet``
(reference: /root/reference/src/main.rs, a 261-line Rust CSV→Parquet
converter) re-expressed Spark-first, plus the relational + LLM-data-pipeline
operator surface declared in SURVEY.md §2.

Layout:
    session     — SparkSession factory tuned for the local[32] test rig
    tables      — testdata table loaders (region..embeddings)
    converter/  — reference-parity CSV→Parquet converter (O1-O6, W1-W10)
    queries/    — DuckDB-oracle-checked query registry (driver t2 contract)
    operators/  — LLM-pipeline operators (dedup, similarity, text, multimodal)
    streaming/  — Structured Streaming surface (windows, watermark, dedup)
"""

from csv2parquet_spark.session import get_spark
from csv2parquet_spark.converter.convert import convert

__version__ = "0.1.0"

__all__ = ["get_spark", "convert", "__version__"]

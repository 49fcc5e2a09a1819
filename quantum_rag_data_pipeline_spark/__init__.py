"""quantum_rag_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline ``jon-fox/quantum-rag-data-pipeline``
(an ERCOT energy-market RAG-ingestion ETL), extended with the operators a
large-scale LLM training-data pipeline needs (deduplication, similarity
search, text analysis, multimodal column plumbing).

Design stance (see SURVEY.md §7):
- Declarative DataFrame/SQL plans; Catalyst + AQE do the optimization.
- External I/O behind thin injected clients with deterministic fakes.
- Every operator designed for a 1000-executor / 100 TB deployment even
  though tests run on ``local[*]``: dimension sides broadcast, aggregates
  are partial-aggregable, shuffles keyed on high-cardinality columns,
  Python appears only in Arrow-batched pandas UDFs.
"""

from quantum_rag_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

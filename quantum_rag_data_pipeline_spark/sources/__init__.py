from quantum_rag_data_pipeline_spark.sources.registry import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]

from webscale_vector_search_spark.sources.fixtures import load_table, load_tables, queries_from_embeddings

__all__ = ["load_table", "load_tables", "queries_from_embeddings"]

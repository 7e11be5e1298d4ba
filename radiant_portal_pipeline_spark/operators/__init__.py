from radiant_portal_pipeline_spark.operators.registry import REGISTRY, query, load_table

__all__ = ["REGISTRY", "query", "load_table"]

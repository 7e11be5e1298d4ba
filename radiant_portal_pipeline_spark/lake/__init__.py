from radiant_portal_pipeline_spark.lake.table import LakeTable, CommitConflict

__all__ = ["LakeTable", "CommitConflict"]

from radiant_portal_pipeline_spark.cdc.dedup import lww_dedup
from radiant_portal_pipeline_spark.cdc.merge import TranscriptMergeEngine, MergeStats

__all__ = ["lww_dedup", "TranscriptMergeEngine", "MergeStats"]

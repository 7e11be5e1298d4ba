"""Registered multimodal-plumbing queries.

The mapInPandas "decode" is a deterministic stub (no codecs in this
container), so its arithmetic is mirrorable in the DuckDB oracle —
which means the WHOLE Arrow plumbing path (binary encode → batch
iterator → typed schema out) is value-checked, not just smoke-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from radiant_portal_pipeline_spark.multimodal.binary import (
    extract_media_metadata,
    to_binary_docs,
)
from radiant_portal_pipeline_spark.operators.registry import load_table, query


@query(
    "m_media_metadata",
    oracle="""
    SELECT doc_id,
           CAST(OCTET_LENGTH(ENCODE(text)) AS INTEGER) AS n_bytes,
           'image/fake' AS kind,
           CAST(OCTET_LENGTH(ENCODE(text)) % 256 AS INTEGER) AS fake_width,
           CAST((OCTET_LENGTH(ENCODE(text)) * 7) % 256 AS INTEGER) AS fake_height
    FROM documents
    """,
)
def m_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → typed metadata through Arrow-batched
    mapInPandas (decode stubbed; plumbing real — see multimodal/binary.py)."""
    d = load_table(spark, sf_dir, "documents")
    return extract_media_metadata(to_binary_docs(d))

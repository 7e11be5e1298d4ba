"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The image/audio codecs are NOT in this container, so the decode step is
a clearly-marked STUB (``decode_stub``) — everything Spark-side is real
and tested: the binary column type, the batch iterator signature, the
output schema contract, and the partition-preserving flow. Swapping the
stub for PIL/torchaudio is a one-function change on the executors.

Scale notes: mapInPandas streams Arrow batches — peak memory is one
batch per core, not one partition; binary payloads never pass through
Python row objects. At 100 TB the decode stage is embarrassingly
parallel and shuffle-free; keep ``spark.sql.files.maxPartitionBytes``
sized so batch_bytes x cores fits the executor heap.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("fake_width", T.IntegerType(), True),
        T.StructField("fake_height", T.IntegerType(), True),
    ]
)


def decode_stub(payload: bytes) -> dict:
    """STUB for a real media decoder (PIL.Image.open / soundfile / ...).

    Deterministic fake: derives "dimensions" from the byte length so
    tests are stable. A real deployment replaces this body; the Spark
    plumbing around it does not change.
    """
    n = len(payload)
    return {"width": n % 256, "height": (n * 7) % 256}


def extract_media_metadata(binary_df: DataFrame) -> DataFrame:
    """(doc_id, payload: binary) -> typed metadata via mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            lens = pdf["payload"].map(len)
            decoded = pdf["payload"].map(decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": lens.astype("int32"),
                    "kind": ["image/fake"] * len(pdf),
                    "fake_width": decoded.map(lambda d: d["width"]).astype("int32"),
                    "fake_height": decoded.map(lambda d: d["height"]).astype("int32"),
                }
            )

    return binary_df.mapInPandas(batches, schema=MEDIA_META_SCHEMA)


def to_binary_docs(docs: DataFrame) -> DataFrame:
    """Treat document text as an opaque media payload (binary column)."""
    return docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))

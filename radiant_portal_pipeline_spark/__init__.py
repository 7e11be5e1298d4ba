"""radiant_portal_pipeline_spark — a from-scratch PySpark-native CDC /
incremental-ingest engine with the capabilities of
radiant-network/radiant-portal-pipeline (see /root/repo/SURVEY.md).

Everything here is idiomatic Spark: DataFrame/SQL plans optimized by
Catalyst, a thin transactional lake-table layer (Iceberg-style commit
log over parquet — the real Iceberg runtime jar is not in this image),
Structured Streaming + foreachBatch for the CDC loop, and
Arrow-vectorized pandas UDFs for the few things built-ins can't say.
"""

__version__ = "0.1.0"

import os as _os

# Parent directory of this package — worker closures (mapInPandas etc.)
# bootstrap their imports with it, so the library works when the
# DRIVER's sys.path knows the package but the Python workers' doesn't
# (library imported from an arbitrary cwd in local mode). On a real
# cluster the package is shipped via --py-files/conda env and the
# bootstrap is a no-op. Plain string: pickles by value into closures.
PKG_PARENT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))

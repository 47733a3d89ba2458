"""ducklakexl_spark — a PySpark-native lakehouse engine with the query and
data-processing capabilities of gregwdata/ducklakexl.

The reference (``/root/reference/ducklakexl/ducklakexl.py``) is a catalog shim
over DuckDB: every ``sql()`` call is a pass-through wrapped by an
Excel-workbook catalog sync.  This package re-expresses both planes
Spark-first:

- **Query plane**: Spark SQL / the DataFrame API over DuckLake-style tables
  (snapshot-resolved parquet file sets with positional delete files).
- **Catalog plane**: the DuckLake spec tables as explicit-schema, driver-side
  tables persisted to a local parquet store and mirrored to a workbook
  backend (reference: ducklakexl.py:400-583).

Beyond the reference surface it adds LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns) and a Structured
Streaming plane, all designed around Catalyst/Tungsten execution at scale.
"""

from ducklakexl_spark.engine import DuckLakeSpark
from ducklakexl_spark.session import get_spark

__all__ = ["DuckLakeSpark", "get_spark"]
__version__ = "0.1.0"

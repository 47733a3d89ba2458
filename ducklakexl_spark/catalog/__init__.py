from ducklakexl_spark.catalog.catalog import DuckLakeCatalog
from ducklakexl_spark.catalog.schemas import CATALOG_SCHEMAS, sheet_name
from ducklakexl_spark.catalog.store import CatalogStore

__all__ = ["DuckLakeCatalog", "CATALOG_SCHEMAS", "CatalogStore", "sheet_name"]

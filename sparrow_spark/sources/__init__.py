from sparrow_spark.sources.tables import (
    TABLES,
    load_table,
    load_tables,
    materialize,
    register_views,
    widen,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "materialize",
    "register_views",
    "widen",
]

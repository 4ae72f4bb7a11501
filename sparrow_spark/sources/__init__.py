from sparrow_spark.sources.tables import (
    TABLES,
    load_table,
    load_tables,
    local_df,
    materialize,
    register_views,
    widen,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "local_df",
    "materialize",
    "register_views",
    "widen",
]

from .loaders import (
    TABLE_NAMES,
    all_string_schema,
    load_staging_csv,
    load_table,
    load_tables,
    register_views,
)

__all__ = [
    "TABLE_NAMES",
    "all_string_schema",
    "load_staging_csv",
    "load_table",
    "load_tables",
    "register_views",
]

from sparkrec.sources.tables import (  # noqa: F401
    read_table,
    write_table,
    table_exists,
)

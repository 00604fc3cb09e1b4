"""Sources: CDC envelope + fixture, parquet/csv/json readers, JDBC catalog."""

"""Sources: JDBC incremental change scans (dialect table), parquet outbox."""

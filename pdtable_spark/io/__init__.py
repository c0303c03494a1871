"""Multi-format I/O for StarTable data on Spark: CSV, JSON, Excel, parquet."""

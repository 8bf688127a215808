from amazon_kinesis_data_streams_health_check_spark.sources.tables import load_table, load_tables

__all__ = ["load_table", "load_tables"]

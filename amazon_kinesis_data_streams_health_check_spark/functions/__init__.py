from amazon_kinesis_data_streams_health_check_spark.functions import scalar

__all__ = ["scalar"]

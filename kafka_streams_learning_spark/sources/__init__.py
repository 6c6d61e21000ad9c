from kafka_streams_learning_spark.sources.batch import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]

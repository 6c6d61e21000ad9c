from kafka_streams_learning_spark.functions.timestamps import event_time_cascade
from kafka_streams_learning_spark.functions.json_ import json_key_or_unknown

__all__ = ["event_time_cascade", "json_key_or_unknown"]

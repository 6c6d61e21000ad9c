"""Extension query catalog — large-scale training-data pipeline operators.

Placeholder for round-1 milestone 1; filled in milestone 3 (dedup,
similarity search, text analysis, multimodal).
"""

from __future__ import annotations

from kafka_streams_learning_spark.catalog import QuerySpec

EXTENSION_QUERIES: list[QuerySpec] = []

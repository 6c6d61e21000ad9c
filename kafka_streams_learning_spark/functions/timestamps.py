"""Event-time extraction cascade.

Re-expresses the reference's custom ``TimestampExtractor`` (SURVEY §2.8 T1,
`timestamp_extractor/OrderTimestampStreamApp.java:136-208`) as one Catalyst
column expression instead of per-record Java: the cascade tries, in order,

  (a) ISO-8601 instant        (``Instant.parse``          → `:177-183`)
  (b) ISO local date, UTC midnight (``LocalDate.parse``   → `:184-191`)
  (c) epoch-millis (numeric or stringified long)          (→ `:192-199`)
  (d) fallback to the ingest/partition timestamp          (→ `:202-206`)

Because it is a pure expression, it survives whole-stage codegen, costs no
Python round-trip, and the identical logic runs in batch and streaming.
`try_*` variants keep it total under ANSI mode (malformed input → NULL →
next branch), mirroring the reference's catch-and-fall-through.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ISO_INSTANT_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"
ISO_DATE_FMT = "yyyy-MM-dd"


def event_time_cascade(raw: Column, ingest_ts: Column) -> Column:
    """Return the extracted event time for a raw string timestamp column.

    Branch order matters and matches the reference (ISO instant before
    local date before epoch-millis — `OrderTimestampStreamApp.java:148-207`).
    """
    return F.coalesce(
        F.try_to_timestamp(raw, F.lit(ISO_INSTANT_FMT)),
        F.try_to_timestamp(raw, F.lit(ISO_DATE_FMT)),
        F.timestamp_millis(raw.try_cast("long")),
        ingest_ts,
    )

"""Run-scoped intermediate materialization.

`materialized(df)` computes an intermediate once and feeds it to multiple
plan arms by writing it to a run-scoped parquet table and scanning that.
Unlike `.persist()`, nothing stays pinned in executor memory after the
query finishes (a persisted-without-unpersist intermediate leaks cache
across catalog runs). At cluster scale this IS the standard shape: a
materialized intermediate table on shared storage, readable by every
downstream stage, with its own footer stats for pushdown.

The write happens eagerly at call time (not at first downstream action) —
that is what guarantees the intermediate computes exactly once even when
several plan arms consume it.

Pass `tag` for intermediates a catalog query re-creates on every run:
tagged calls keep ONE live copy per tag, so a long-lived session running
the catalog N times stays disk-bounded. Each tagged call writes a fresh
generation subdirectory and deletes the previous generation only after
the new write commits — the returned DataFrame always reads its own
generation, and a still-lazy DataFrame from an EARLIER call with the same
tag fails loudly (missing files) on its next action instead of silently
scanning the newer call's data. Untagged calls get a fresh directory each
time (for intermediates whose lifetime must be independent of later
calls).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame

# Accepts any digit count (writes are zero-padded to 5 for sort display,
# but generation 100000 formats as 6 digits and must still match so
# numbering and reclamation survive past 99999 generations).
_GEN_RE = re.compile(r"^gen-(\d+)$")


def materialized(df: DataFrame, tag: str | None = None) -> DataFrame:
    from kafka_streams_learning_spark.sources.replay import (
        run_named_dir,
        run_staging_dir,
    )

    if tag is None:
        path = run_staging_dir("mat")
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)

    base = run_named_dir(f"mat-{tag}")
    gens = sorted(
        int(m.group(1))
        for m in (_GEN_RE.match(d) for d in os.listdir(base))
        if m
    )
    path = os.path.join(base, f"gen-{(gens[-1] + 1 if gens else 0):05d}")
    df.write.mode("overwrite").parquet(path)
    for g in gens:  # reclaim only after the new generation is committed
        shutil.rmtree(os.path.join(base, f"gen-{g:05d}"), ignore_errors=True)
    return df.sparkSession.read.parquet(path)

"""Key-skew probe for s03 (fraud alerts) and s05 (KTable enrichment) —
the two stateful rows the r12 skew sweep didn't cover (VERDICT r12
item 4).

Checks, one JSON line each:

1. **Trap** — every probed decade pair's row counts must differ
   (the symlinked-probe-dir trap, BENCH_NOTES r11).
2. **s03 linearity under skew** — the catalog row timed at skew1 (1M
   events) and skew10 (10M), one user carrying ~50% of events. s03's
   state is one counter per key; the hot key concentrates half the
   batch into one applyInPandasWithState group, so the claim under
   test is that per-group vectorized cumsum keeps the growth linear.
3. **s05 linearity under skew** — the catalog row timed at skewcust1
   (1M orders) and skewcust10 (10M), one customer carrying ~50% of
   orders. The dimension side is byte-identical to the gated fixture;
   the fact side is a broadcast join, so key skew cannot hot-spot a
   shuffle partition (there is no shuffle on the fact side).
4. **KTable upsert hot-key growth + correctness** — `materialize_ktable`
   driven over 1M/10M-update changelogs (4 replay chunks) where one
   key receives ~50% of all versions. latest_per_key is a groupBy
   max_by — partial (map-side) aggregation collapses the hot key's
   duplicates before the shuffle, so the hot bucket's merge stays
   bounded by keys-per-bucket, not updates-per-key. Snapshot equality
   vs DuckDB arg-max-by-version asserted at BOTH decades (output is
   one row per key — tractable anywhere).

Hash gates for the catalog rows (separate vanilla-session process):

    python tools/oracle_check.py /root/repo/.scratch/skew01 s03_stream_fraud_alerts
    python tools/oracle_check.py /root/repo/.scratch/skew1  s03_stream_fraud_alerts
    python tools/oracle_check.py /root/repo/.scratch/skewcust01 s05_stream_ktable_enrich

Usage: python tools/skew_probe_s03s05.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

SCRATCH = "/root/repo/.scratch"
PAIRS = {
    "s03_events": ("skew1/events.parquet", "skew10/events.parquet"),
    "s05_orders": ("skewcust1/orders.parquet", "skewcust10/orders.parquet"),
    "ktable_changelog": (
        "skewchlog1/changelog.parquet",
        "skewchlog10/changelog.parquet",
    ),
}


def check_trap() -> dict:
    counts = {}
    for fam, (a, b) in PAIRS.items():
        ra = pq.read_metadata(os.path.join(SCRATCH, a)).num_rows
        rb = pq.read_metadata(os.path.join(SCRATCH, b)).num_rows
        if ra == rb:
            raise SystemExit(f"probe dirs do not scale for {fam}: {ra} == {rb}")
        counts[fam] = {a: ra, b: rb}
    return {"check": "trap", "rows": counts}


def time_catalog_rows(spark):
    """Yields one record per row so a late-row failure can't lose the
    earlier row's measurement."""
    from tools.skew_probe import _drop_sink_views

    from kafka_streams_learning_spark.catalog import all_queries

    specs = {s.name: s for s in all_queries()}
    for row, decades in (
        ("s03_stream_fraud_alerts", ("skew1", "skew10")),
        ("s05_stream_ktable_enrich", ("skewcust1", "skewcust10")),
    ):
        times = {}
        for d in decades:
            sf_dir = os.path.join(SCRATCH, d)
            t0 = time.time()
            n = specs[row].spark(spark, sf_dir).count()
            times[d] = round(time.time() - t0, 3)
            times[d + "_rows"] = n
            spark.catalog.clearCache()
            _drop_sink_views(spark)
        ratio = round(times[decades[1]] / max(times[decades[0]], 1e-9), 2)
        yield {"check": "linearity", "row": row, "times": times,
               "growth_10x": ratio}


def probe_ktable_upsert(spark) -> dict:
    from tools.skew_probe import _drop_sink_views

    from kafka_streams_learning_spark.sources.replay import (
        replay_stream,
        run_staging_dir,
        stage_replay_chunks,
    )
    from kafka_streams_learning_spark.streaming import ktable

    out: dict[str, dict] = {}
    for decade in ("skewchlog1", "skewchlog10"):
        path = os.path.join(SCRATCH, decade, "changelog.parquet")
        t0 = time.time()
        chlog = spark.read.parquet(path)
        staging = run_staging_dir("skewchlog")
        stage_replay_chunks(chlog, staging, chunks=4, order_by="v")
        setup_s = round(time.time() - t0, 3)

        t0 = time.time()
        snap_dir = run_staging_dir("skewsnap")
        ktable.materialize_ktable(
            replay_stream(spark, staging, chlog.schema),
            snap_dir, key="k", version_col="v",
        )
        mat_s = round(time.time() - t0, 3)

        got = sorted(
            map(tuple, ktable.read_snapshot(spark, snap_dir).collect())
        )
        want = sorted(
            map(
                tuple,
                duckdb.sql(
                    f"SELECT k, arg_max(payload, v) AS payload, max(v) AS v "
                    f"FROM '{path}' GROUP BY k"
                ).fetchall(),
            )
        )
        out[decade] = {
            "setup_s": setup_s,
            "materialize_s": mat_s,
            "snapshot_keys": len(got),
            "snapshot_matches_duckdb": got == want,
        }
        if got != want:
            out[decade]["first_diff"] = repr(
                [p for p in zip(got, want) if p[0] != p[1]][:2]
            )
        _drop_sink_views(spark)
        spark.catalog.clearCache()
    out["growth_10x"] = round(
        out["skewchlog10"]["materialize_s"]
        / max(out["skewchlog1"]["materialize_s"], 1e-9),
        2,
    )
    return {"check": "ktable_upsert_hot_key", **out}


def main() -> int:
    print(json.dumps(check_trap()), flush=True)

    from kafka_streams_learning_spark import get_spark

    # the memory-sink harness collects the full result to the driver —
    # at the 10M decade s05's enriched output serializes past the 1 GiB
    # default maxResultSize. That is a PROBE-HARNESS cost (a production
    # sink streams out; only the local test sink collects), so the probe
    # session raises the cap rather than shrinking the decade.
    spark = get_spark("skew-probe-s03s05",
                      extra_conf={"spark.driver.maxResultSize": "6g"})
    spark.sparkContext.setLogLevel("ERROR")
    for rec in time_catalog_rows(spark):
        print(json.dumps(rec), flush=True)
    print(json.dumps(probe_ktable_upsert(spark)), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

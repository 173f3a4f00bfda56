"""SparkSession construction and runtime configuration.

The reference hardcodes ``local[*]`` (reference
gmall-realtime/src/main/scala/com/atguigu/app/DauApp.scala:21) and takes
every other knob at default. We centralize scale-relevant configuration
here so every entry point (tests, bench, driver harness) runs the same
tuned session.

Scale posture (100 TB / 1000-executor readiness):
- AQE on: runtime join-strategy selection, skew-join splitting, and
  post-shuffle partition coalescing replace hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound; AQE
  coalesces. On a real cluster this would be set ~2-3x total cores.
- Session timezone pinned to UTC so date/hour derivations are
  deterministic and oracle-comparable regardless of host TZ.
- Nanosecond parquet timestamps (driver fixtures) are read as longs
  (``spark.sql.legacy.parquet.nanosAsLong``) and converted to
  timestamps in the reader (see sources.fixtures).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are runtime-settable (SQL confs). Applied both at build
# time and defensively to externally-provided sessions (the driver
# harness builds its own SparkSession and hands it to our callables).
RUNTIME_CONFS: dict[str, str] = {
    # Driver fixtures store TIMESTAMP(NANOS); Spark 4.x rejects them by
    # default (PARQUET_TYPE_ILLEGAL). Read as long + convert in reader.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic date/hour math across engines (DuckDB is naive-TZ).
    "spark.sql.session.timeZone": "UTC",
    # Adaptive execution: join selection, skew splitting, coalescing.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for the few pandas-UDF extension ops (similarity kernels).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # RocksDB state store: streaming state (dedup sets, join buffers,
    # window/session state) spills to disk instead of executor heap —
    # the only posture that survives day-scale dedup state at 100 TB
    # (SURVEY §7.3.8). Changelog checkpointing keeps commits O(delta).
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (idempotent).

    The driver harness owns its SparkSession; our query callables route
    through here so fixture reads work regardless of how the session
    was built.
    """
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Static conf on this build -- leave as-is; reader has a
            # schema-level fallback for the nanos case.
            pass
    return spark


def get_spark(app_name: str = "gmall-spark-engine", master: str | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default
    all cores) for this container; on a real cluster the launcher
    passes no master and spark-submit decides.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    # Local default 8: at bench scale (sf0.1) per-task fixed overhead
    # dominates, and AQE coalesces small shuffles regardless (measured:
    # 8 beats 32 by ~20% per query here). A cluster deployment sets
    # this to ~2-3x total cores via the env override.
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    return ensure_runtime_confs(spark)

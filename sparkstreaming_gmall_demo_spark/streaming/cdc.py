"""CDC ingest routing (operator S2/P8).

The reference's Canal client polls MySQL binlog entries, keeps ROWDATA
events, and routes them by (table, eventType): ``order_info`` INSERTs
to the order topic, ``order_detail`` INSERTs to the detail topic,
``user_info`` INSERT ∪ UPDATE to the user topic — serializing each
after-image row to a JSON object (reference
gamll-canal/src/main/java/com/atguigu/app/CanalClient.java:26-119;
column-map build at :77-82,:92-98,:110-115).

Binlog polling itself is outside the engine (any CDC feed — Canal,
Debezium, Maxwell — lands the same envelope on Kafka). What IS engine
work is the routing + after-image serialization, expressed here as a
declarative filter + projection over a parsed envelope stream, one
output stream per destination topic. Filters push down; to_json is
JVM-side codegen — the whole router is a narrow map, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canal/Maxwell-style envelope: one JSON record per changed row.
CDC_ENVELOPE = T.StructType(
    [
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("type", T.StringType()),  # INSERT / UPDATE / DELETE
        T.StructField("ts", T.LongType()),  # epoch millis of the binlog event
        T.StructField("data", T.MapType(T.StringType(), T.StringType())),
    ]
)

# (table, allowed event types) -> destination, mirroring
# CanalClient.java:74 (order_info, INSERT), :90 (order_detail, INSERT),
# :106-107 (user_info, INSERT or UPDATE)
DEFAULT_ROUTES: dict[str, tuple[str, tuple[str, ...]]] = {
    "order_info": ("gmall_order_info", ("INSERT",)),
    "order_detail": ("gmall_order_detail", ("INSERT",)),
    "user_info": ("gmall_user_info", ("INSERT", "UPDATE")),
}


def parse_envelope(raw: DataFrame) -> DataFrame:
    """One-string-column ``value`` stream -> typed CDC envelope rows."""
    return raw.select(F.from_json("value", CDC_ENVELOPE).alias("r")).select("r.*")


def route(
    envelope: DataFrame,
    table: str,
    event_types: tuple[str, ...],
    keep_op: bool = False,
) -> DataFrame:
    """One destination's stream: filter by (table, type) and serialize
    the after-image column map back to a JSON ``value`` (the payload
    the downstream topic parsers expect), carrying the binlog ts so
    consumers can event-time it.

    ``keep_op`` embeds the event type as an ``_op`` key in the payload
    — needed when the route includes DELETE (the reference never
    routes deletes, CanalClient.java:74,90,106; a dim consumer needs
    the op to write a tombstone, see sinks.read_dim).
    """
    routed = envelope.filter(
        (F.col("table") == F.lit(table)) & F.col("type").isin(*event_types)
    )
    payload = (
        F.map_concat("data", F.create_map(F.lit("_op"), F.col("type")))
        if keep_op
        else F.col("data")
    )
    return routed.select(
        F.to_json(payload).alias("value"), F.col("ts").alias("cdc_ts")
    )


def route_all(
    envelope: DataFrame,
    routes: dict[str, tuple[str, tuple[str, ...]]] | None = None,
) -> dict[str, DataFrame]:
    """All destination streams, keyed by topic name. Each is
    independently attachable to a Kafka sink (sinks.kafka_sink) or a
    file topic — the Spark equivalent of the Canal handler fan-out."""
    routes = routes if routes is not None else DEFAULT_ROUTES
    return {
        topic: route(envelope, table, event_types)
        for table, (topic, event_types) in routes.items()
    }

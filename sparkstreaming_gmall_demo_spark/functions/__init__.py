"""Column-expression helpers shared across operators and plans.

Everything here is a built-in Column expression (JVM-side, codegen'd) --
no Python UDFs. Each helper reproduces a specific reference behavior,
cited inline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY_TYPE = "decimal(18,2)"


def money(col) -> Column:
    """DECIMAL(18,2) money policy (SURVEY §7.3.2): exact, order-independent sums.

    The reference keeps money as Double (reference bean/OrderInfo.scala:13)
    and casts at query time (reference mapper/OrderMapper.xml:11).
    """
    return F.col(col).cast(MONEY_TYPE) if isinstance(col, str) else col.cast(MONEY_TYPE)


def money_out(col) -> Column:
    """Money OUTPUT surface: rounded DOUBLE over an exact DECIMAL sum.

    Aggregation stays DECIMAL(18,2) (exact, order-independent); only the
    FINAL projection casts to DOUBLE and rounds to cents so both engines
    render identically ('1704893.2', never Decimal's '1704893.20').
    Oracle-side twin: ``round(CAST(x AS DOUBLE), 2)``.
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.round(col.cast("double"), 2)


def log_date(ts) -> Column:
    """Epoch-ts -> yyyy-MM-dd date, the reference's ``logDate``
    (reference app/DauApp.scala:34: SimpleDateFormat("yyyy-MM-dd HH") + split)."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    return F.to_date(ts)


def log_hour(ts) -> Column:
    """Epoch-ts -> hour-of-day int, the reference's ``logHour``
    (reference app/DauApp.scala:35)."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    return F.hour(ts)


def minute_bucket(ts) -> Column:
    """ts -> epoch-minute long: the alert doc-id minute dedup key
    (reference app/AlertApp.scala:74: ``mid + ts/1000/60``)."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    return (F.unix_timestamp(ts) / 60).cast("long")


def permille(cnt, total) -> Column:
    """Reference ratio rounding: ``Math.round(cnt*1000.0/total)``
    (reference service/impl/PublisherServiceImpl.java:137-139).

    Java Math.round is floor(x + 0.5); expressed identically here and in
    the DuckDB oracle so both engines do the same double arithmetic.
    """
    cnt = F.col(cnt) if isinstance(cnt, str) else cnt
    total = F.col(total) if isinstance(total, str) else total
    return F.floor(cnt * F.lit(1000.0) / total + F.lit(0.5)).cast("long")


def age_as_of(birthday, as_of: str) -> Column:
    """Age in whole years at an explicit AS_OF date.

    The reference computes age from wall-clock now with /365 day math
    (reference bean/SaleDetail.scala:44-57, leap days ignored) -- a
    non-deterministic expression. We keep the same /365 semantics but
    parameterize the clock for determinism.
    """
    birthday = F.col(birthday) if isinstance(birthday, str) else birthday
    return F.floor(F.datediff(F.lit(as_of).cast("date"), F.to_date(birthday)) / F.lit(365)).cast("int")


def epoch_micros(ts) -> Column:
    """Microseconds since epoch, accepting TIMESTAMP *and* TIMESTAMP_NTZ.

    ``unix_micros`` hard-rejects NTZ in Spark 4.x, and the driver
    fixtures encode ``events.ts`` as plain ``timestamp[us]`` (no tz),
    which parquet infers as NTZ. The cast to TIMESTAMP is wall-clock
    preserving under the pinned UTC session timezone (session.py
    RUNTIME_CONFS) — exactly the naive-UTC arithmetic the DuckDB
    oracle's ``epoch_us`` performs — and is a no-op on an already-tz
    TIMESTAMP column. Use this, never raw ``unix_micros``, on any
    fixture-derived timestamp.
    """
    ts = F.col(ts) if isinstance(ts, str) else ts
    return F.unix_micros(ts.cast("timestamp"))


def epoch_millis(ts) -> Column:
    """Milliseconds since epoch; NTZ-safe twin of ``unix_millis``
    (same UTC-cast rationale as :func:`epoch_micros`)."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    return F.unix_millis(ts.cast("timestamp"))


def tokens(text) -> Column:
    """Whitespace tokenization of document text (fixture texts are
    single-space separated; mirrors ES whitespace analysis used by the
    keyword AND-match, reference service/impl/PublisherServiceImpl.java:86)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.split(text, " ")

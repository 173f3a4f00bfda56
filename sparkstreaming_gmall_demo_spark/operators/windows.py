"""Event-time window operators.

The reference windows on processing/arrival time (DStream
``.window(Minutes(5))``, reference app/AlertApp.scala:39, sliding every
3 s batch). We upgrade to event-time tumbling/sliding windows; the
declared oracle queries use tumbling windows for determinism
(SURVEY §7.3.3 documents the intentional semantic difference).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling(ts_col: str, length: str) -> Column:
    """Epoch-aligned tumbling event-time window (matches DuckDB
    time_bucket alignment for oracle comparison)."""
    return F.window(F.col(ts_col), length)


def sliding(ts_col: str, length: str, slide: str) -> Column:
    return F.window(F.col(ts_col), length, slide)


def window_start_str(window_col: Column) -> Column:
    """Window start as 'yyyy-MM-dd HH:mm:ss' string -- canonical,
    engine-portable output form for oracle hashing."""
    return F.date_format(window_col.getField("start"), "yyyy-MM-dd HH:mm:ss")

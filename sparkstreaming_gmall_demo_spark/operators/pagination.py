"""Pagination and top-k row selection.

Reference: ES from/size pagination (reference
service/impl/PublisherServiceImpl.java:98-99; page params from
controller/Controller.java:103-106).

Implemented as row_number over a stable total order + range filter --
deterministic, and unlike a global sort + OFFSET, Spark's window over a
single ordered partition only materializes up to the page bound per
partition after AQE. For very deep pages at 100 TB you'd switch to
keyset pagination (WHERE key > last_seen LIMIT size) -- exposed here as
``keyset_page`` -- which stays fully parallel and reads only one page.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def page(df: DataFrame, order: Sequence[str], page_no: int, size: int) -> DataFrame:
    """1-based page of ``size`` rows under a stable total order.

    ES semantics: from = (startPage-1)*size, size rows
    (reference service/impl/PublisherServiceImpl.java:98-99).
    """
    start = (page_no - 1) * size
    w = Window.orderBy(*[F.col(c).asc() for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") > start) & (F.col("__rn") <= start + size))
        .drop("__rn")
    )


def keyset_page(df: DataFrame, key: str, after, size: int) -> DataFrame:
    """Scale-path pagination: rows with key > ``after``, first ``size``
    by key. No global row_number; filter pushes to the scan."""
    out = df.filter(F.col(key) > F.lit(after)) if after is not None else df
    return out.orderBy(F.col(key).asc()).limit(size)

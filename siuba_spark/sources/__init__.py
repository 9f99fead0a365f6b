"""Source/sink surface (reference: tbl(), siuba/dply/verbs.py:2550-2641).

The implementations live in ``plans.tbl`` (the table handle and its
readers/writers are one lifecycle); this package re-exports them as the
stable import point.  Spark supplies the actual format engines — parquet /
csv / json / orc readers, catalog tables, partitioned and bucketed writers
— so unlike the reference (which delegates I/O to pandas/SQLAlchemy) every
source here is distributed, predicate-pushdown-capable, and
schema-inferred.  Streaming sources are in ``streaming.windows``
(``read_event_stream``).
"""

from ..plans.tbl import SparkTbl, collect, show_query, tbl, write_csv, write_parquet

__all__ = ["tbl", "SparkTbl", "collect", "show_query", "write_parquet", "write_csv"]

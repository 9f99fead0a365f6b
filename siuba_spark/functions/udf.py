"""User-function escape hatches (reference: siuba/siu/dispatchers.py:304-368
— any Python callable can appear in a pipe; the SQL engine requires a
translation, the pandas engine just calls it).

Two tiers, mirroring "UDFs are the slow path":

- ``call(func, ...)`` — for *Column-level* callables (compositions of
  ``pyspark.sql.functions``): zero overhead, stays in whole-stage codegen.
- ``py_func(fn, returns)`` — for genuine row-level Python: wraps an
  Arrow-batched pandas UDF (Series → Series), ~10-100× faster than
  row-at-a-time ``F.udf`` and the only sanctioned way to run opaque Python
  in a hot path.
"""

from __future__ import annotations

from ..siu.calls import RawCallable, Symbolic, _node

__all__ = ["call", "py_func", "group_apply"]


def call(func, *args, **kwargs):
    """Defer ``func(*args)`` into the expression AST; ``func`` receives
    lowered ``Column`` arguments and must return a Column.

    >>> mutate(t, y=call(lambda c: F.upper(c), _.name))
    """
    return Symbolic(RawCallable(
        func,
        tuple(_node(a) for a in args),
        {k: _node(v) for k, v in kwargs.items()},
    ))


def py_func(fn, returns: str = "double"):
    """Lift a pandas ``Series → Series`` function into a pipeable,
    Arrow-batched column function.

    >>> squish = py_func(lambda s: s.clip(0, 1), returns="double")
    >>> mutate(t, x01=squish(_.x))

    At scale: executes per Arrow batch on executors (bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``), no shuffle, no
    driver involvement — but still Python; prefer built-ins when a
    translation exists.
    """
    from pyspark.sql.functions import pandas_udf

    udf = pandas_udf(returns)(fn)

    def column_fn(*args, **kwargs):
        return call(udf, *args, **kwargs)

    column_fn.__name__ = getattr(fn, "__name__", "py_func")
    return column_fn


def group_apply(tbl, fn=None, schema: str = None):
    """Grouped-map escape hatch: run a pandas ``DataFrame -> DataFrame``
    function once per group of the sticky grouping — the reference's
    groupby-apply slow path (siuba/dply/verbs.py:267) as Spark's
    Arrow-batched ``applyInPandas``.

    ``schema`` is the OUTPUT schema as a DDL string ("g string, x double")
    — grouped-map results need a declared shape, exactly like the
    reference's SQL engine refusing untyped UDFs.

    At scale: one shuffle on the group keys; each group must fit in one
    executor's memory as a pandas frame (the documented applyInPandas
    contract) — keep groups bounded or pre-aggregate.  This is the LAST
    resort after ``call``/``py_func``; nothing inside it is visible to
    Catalyst.
    """
    from ..plans.pipe import Pipe
    from ..plans.tbl import SparkTbl

    if not isinstance(tbl, SparkTbl):
        # called without data (pipe stage): positional args shift left one
        # slot — group_apply(fn, schema) or group_apply(fn, schema="...")
        shifted_fn, shifted_schema = tbl, (fn if fn is not None else schema)
        return Pipe(lambda t: group_apply(t, shifted_fn, shifted_schema),
                    "group_apply")
    if not tbl.group_by:
        raise ValueError("group_apply needs a grouped table (group_by first)")
    if fn is None or schema is None:
        raise ValueError("group_apply requires fn and an output schema")
    out = tbl.df.groupBy(*[tbl.df[g] for g in tbl.group_by]) \
        .applyInPandas(fn, schema=schema)
    return SparkTbl(out)

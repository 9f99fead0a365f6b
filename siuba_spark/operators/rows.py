"""dplyr 1.0 ``rows_*`` verbs — keyed row manipulation of one table with
another (insert / append / update / patch / upsert / delete).

Absent from the reference (like the set operations, a "free upside" row in
SURVEY.md §2.6): the reference's pandas backend never shipped them and its
SQL backend has no equivalent, but they complete the dplyr surface a
migrating user expects.

Spark-first shapes — every verb is one equi-join on the key:

- ``rows_insert``/``rows_upsert``'s insert half: left-anti join then
  unionByName (missing columns NULL-filled).
- ``rows_update``/``rows_patch``: left join + per-column CASE on a match
  flag.  ``update`` takes y's value for matched rows even when it is NULL
  (dplyr semantics); ``patch`` only fills x's NULLs.
- ``rows_delete``: left-anti join on the keys.

``y`` is semantically the small patch/dimension side, so the dplyr-default
``conflict="error"`` / ``unmatched="error"`` contract checks run ONE
bounded count action against y (never a scan of x beyond the semi-join);
pass "ignore" to stay fully lazy.  Keys default to y's first column,
matching dplyr.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..plans.pipe import join_verb, wrap_table
from ..plans.tbl import SparkTbl

__all__ = ["rows_insert", "rows_append", "rows_update", "rows_patch",
           "rows_upsert", "rows_delete"]


def _prep(left, right, by, op):
    l, r = wrap_table(left), wrap_table(right)
    extra = [c for c in r.df.columns if c not in l.df.columns]
    if extra:
        raise ValueError(f"{op}: y has columns not in x: {extra}")
    keys = ([by] if isinstance(by, str) else list(by)) if by \
        else [r.df.columns[0]]
    missing = [k for k in keys if k not in r.df.columns]
    if missing:
        raise ValueError(f"{op}: key columns {missing} not in y")
    return l, r, keys


def _aligned_insert(ldf, rdf):
    """y rows widened to x's schema (absent columns NULL of x's type)."""
    types = {f.name: f.dataType for f in ldf.schema.fields}
    for c in ldf.columns:
        if c not in rdf.columns:
            rdf = rdf.withColumn(c, F.lit(None).cast(types[c]))
    return ldf.unionByName(rdf.select(*ldf.columns))


def _check_empty(df, op, what):
    n = df.count()  # bounded: y-side only
    if n:
        raise ValueError(f"{op}: {n} {what} (pass the 'ignore' option to "
                         f"skip them)")


@join_verb
def rows_insert(left, right, by=None, conflict: str = "error"):
    """Insert y's rows into x.  ``conflict="error"`` (dplyr default)
    raises if any y key already exists in x; ``"ignore"`` drops those y
    rows lazily."""
    l, r, keys = _prep(left, right, by, "rows_insert")
    lkeys = l.df.select(*keys)
    if conflict == "error":
        _check_empty(r.df.join(lkeys, keys, "left_semi"),
                     "rows_insert", "y rows conflict with existing keys")
        rdf = r.df
    elif conflict == "ignore":
        rdf = r.df.join(lkeys, keys, "left_anti")
    else:
        raise ValueError("conflict must be 'error' or 'ignore'")
    return SparkTbl(_aligned_insert(l.df, rdf))


@join_verb
def rows_append(left, right):
    """Append y's rows to x with no key check (y ⊆ x columns; absent
    columns become NULL)."""
    l, r, _keys = _prep(left, right, None, "rows_append")
    return SparkTbl(_aligned_insert(l.df, r.df))


def _check_unique_keys(rdf, keys, op):
    """dplyr contract: y's keys must be unique, else matched x rows would
    silently multiply through the left join.  One bounded y-side agg."""
    dup = (rdf.groupBy(*keys).count().filter(F.col("count") > 1).count())
    if dup:
        raise ValueError(f"{op}: y key values must be unique "
                         f"({dup} duplicated keys)")


def _merge(l, r, keys, op, unmatched, patch_only):
    _check_unique_keys(r.df, keys, op)
    if unmatched == "error":
        _check_empty(r.df.join(l.df.select(*keys), keys, "left_anti"),
                     op, "y rows have keys not in x")
    elif unmatched != "ignore":
        raise ValueError("unmatched must be 'error' or 'ignore'")
    payload = [c for c in r.df.columns if c not in keys]
    rdf = r.df.select(*keys, F.lit(True).alias("__m"),
                      *[F.col(c).alias(f"__y_{c}") for c in payload])
    out = l.df.join(rdf, keys, "left")
    for c in payload:
        y = F.col(f"__y_{c}")
        if patch_only:
            new = F.when(F.col("__m").isNotNull() & F.col(c).isNull(), y) \
                .otherwise(F.col(c))
        else:
            new = F.when(F.col("__m").isNotNull(), y).otherwise(F.col(c))
        out = out.withColumn(c, new)
    return out.select(*l.df.columns)


@join_verb
def rows_update(left, right, by=None, unmatched: str = "error"):
    """Update non-key columns of x's matching rows with y's values (y's
    NULLs overwrite — dplyr semantics; use ``rows_patch`` to fill)."""
    l, r, keys = _prep(left, right, by, "rows_update")
    return SparkTbl(_merge(l, r, keys, "rows_update", unmatched, False))


@join_verb
def rows_patch(left, right, by=None, unmatched: str = "error"):
    """Like ``rows_update`` but only fills NULLs in x — existing x values
    win."""
    l, r, keys = _prep(left, right, by, "rows_patch")
    return SparkTbl(_merge(l, r, keys, "rows_patch", unmatched, True))


@join_verb
def rows_upsert(left, right, by=None):
    """Update matching rows, insert the rest (no contract errors — every
    y row lands somewhere)."""
    l, r, keys = _prep(left, right, by, "rows_upsert")
    updated = _merge(l, r, keys, "rows_upsert", "ignore", False)
    inserts = r.df.join(l.df.select(*keys), keys, "left_anti")
    return SparkTbl(_aligned_insert(updated, inserts))


@join_verb
def rows_delete(left, right, by=None, unmatched: str = "error"):
    """Delete x rows whose key appears in y (y's non-key columns are
    ignored, as in dplyr)."""
    l, r, keys = _prep(left, right, by, "rows_delete")
    if unmatched == "error":
        _check_empty(r.df.join(l.df.select(*keys), keys, "left_anti"),
                     "rows_delete", "y rows have keys not in x")
    elif unmatched != "ignore":
        raise ValueError("unmatched must be 'error' or 'ignore'")
    return SparkTbl(l.df.join(r.df.select(*keys).distinct(),
                              keys, "left_anti"))

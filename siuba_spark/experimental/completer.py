"""IPython tab completion for ``_.<column>`` (reference:
siuba/experimental/completer.py — pure UX; VERDICT r8 "what's missing"
item 2).

The reference monkey-patches IPython's jedi matcher and temporarily
swaps ``_`` for a pandas DataFrame found in session history.  This
engine takes a lighter, non-invasive route suited to Spark tables
(columns are known without evaluation): a *custom matcher* registered on
the IPython completer.  When the token being completed looks like
``_.prefix``, the matcher locates the most recently mentioned
SparkTbl / Spark DataFrame in the session (namespace + input history)
and offers its column names, columns ranked before everything else.

Import the module inside IPython to activate::

    from siuba_spark.experimental import completer  # auto-installs

or call :func:`install_completer` explicitly (it is a no-op outside
IPython).  All the decision logic lives in pure helpers so the behavior
is unit-testable without an IPython kernel.
"""

from __future__ import annotations

__all__ = ["install_completer", "column_candidates", "find_tbl_name",
           "rank_columns_first"]


def _tbl_columns(obj):
    """Column list for a SparkTbl or Spark DataFrame, else None."""
    from ..plans.tbl import SparkTbl
    if isinstance(obj, SparkTbl):
        return list(obj.columns)
    cols = getattr(obj, "columns", None)
    schema = getattr(obj, "schema", None)
    if cols is not None and schema is not None:  # pyspark DataFrame shape
        return list(cols)
    return None


def find_tbl_name(names, history_lines):
    """Pick the table the user is most plausibly completing against: the
    LAST history line that mentions any candidate name wins (the
    reference scans history the same way; exact > method > assignment
    distinctions collapse to 'most recent mention' here because Spark
    column sets are cheap to read from any candidate)."""
    if not names:
        return None
    import re
    pats = {n: re.compile(rf"\b{re.escape(n)}\b") for n in names}
    for line in reversed(list(history_lines)):
        # word-boundary match: a short name must not hit inside an
        # unrelated identifier or string literal ('item' in
        # 'lineitems_raw'); ties between real mentions still prefer
        # the longest name (`lineitem` vs `lineitem2`)
        hits = [n for n in names if pats[n].search(line)]
        if hits:
            return max(hits, key=len)
    return names[0]


def rank_columns_first(candidates, columns):
    """Stable sort: real column completions first, everything else after
    (the reference's order_results_cols_first)."""
    cols = set(columns)
    return sorted(candidates, key=lambda c: (0 if c in cols else 1, c))


def column_candidates(prefix, namespace, history_lines=()):
    """Completions for ``_.<prefix>``: column names of the most recently
    used table in ``namespace`` that start with ``prefix``."""
    tables = {name: cols for name, cols in
              ((n, _tbl_columns(v)) for n, v in namespace.items()
               if not n.startswith("_"))
              if cols is not None}
    if not tables:
        return []
    picked = find_tbl_name(list(tables), history_lines)
    cols = tables.get(picked, [])
    return [c for c in cols if c.startswith(prefix)]


def _matcher_factory(shell):
    def siuba_spark_column_matcher(text):
        """v1 IPython custom matcher: token-level completions."""
        if not text.startswith("_."):
            return []
        prefix = text[2:]
        if "." in prefix or "(" in prefix or "[" in prefix:
            return []  # accessor chains etc. — let jedi handle
        try:
            history = [code for _s, _l, code in
                       shell.history_manager.get_tail(50,
                                                      include_latest=True)]
        except Exception:
            history = []
        matches = column_candidates(prefix, shell.user_ns, history)
        return [f"_.{m}" for m in rank_columns_first(matches, matches)]
    return siuba_spark_column_matcher


def install_completer(ipython=None):
    """Register the column matcher on an IPython shell.  Returns True
    when installed, False outside IPython (silent no-op, like the
    reference's module-level guard)."""
    if ipython is None:
        try:
            from IPython import get_ipython
        except ImportError:
            return False
        ipython = get_ipython()
    if ipython is None:
        return False
    matcher = _matcher_factory(ipython)
    existing = getattr(ipython.Completer, "custom_matchers", None)
    if existing is None:
        return False
    if not any(getattr(m, "__name__", "") == matcher.__name__
               for m in existing):
        existing.append(matcher)
    return True


install_completer()

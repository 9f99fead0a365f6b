"""Tidyselect: resolve column-selection expressions against column *names*.

Pure Python, engine-independent (reference: siuba/dply/tidyselect.py:143-216).
Supports ``_.a``, strings, ``-_.a`` / ``~_.a`` exclusion, ``_["a":"c"]`` /
``_[0:2]`` slices, and predicate helpers ``_.startswith("x")``,
``_.endswith("x")``, ``_.contains("x")``, ``_.matches(regex)``.
"""

from __future__ import annotations

import re

from ..siu.calls import (
    BinaryOp, Call, GetAttr, GetItem, MetaArg, MethodCall, Symbolic, UnaryOp,
    strip_symbolic,
)


class TidySelectError(Exception):
    pass


def _match_one(node, columns):
    """Return (list_of_names, negate) for one selection arg."""
    node = strip_symbolic(node)

    if isinstance(node, str):
        return [node], False
    if isinstance(node, int) and not isinstance(node, bool):
        # 0-indexed column position (reference select doc:
        # ``mtcars >> select(0, 1)`` keeps the first two columns)
        return [columns[node]], False
    if isinstance(node, (list, tuple)):
        out = []
        for sub in node:
            names, neg = _match_one(sub, columns)
            if neg:
                raise TidySelectError("nested negation in selection list")
            out.extend(names)
        return out, False
    if not isinstance(node, Call):
        raise TidySelectError(f"cannot select with {type(node).__name__}")

    if isinstance(node, UnaryOp) and node.op in ("__neg__", "__invert__"):
        names, neg = _match_one(node.operand, columns)
        return names, not neg

    if isinstance(node, GetAttr) and isinstance(node.obj, MetaArg):
        return [node.name], False

    if isinstance(node, GetItem) and isinstance(node.obj, MetaArg):
        key = node.key
        if isinstance(key, str):
            return [key], False
        if isinstance(key, slice):
            start, stop = key.start, key.stop
            start = strip_symbolic(start)
            stop = strip_symbolic(stop)
            if isinstance(start, GetAttr):
                start = start.name
            if isinstance(stop, GetAttr):
                stop = stop.name
            if isinstance(start, str) or isinstance(stop, str):
                i0 = columns.index(start) if start is not None else 0
                i1 = columns.index(stop) + 1 if stop is not None else len(columns)
                return list(columns[i0:i1]), False
            return list(columns[key]), False
        if isinstance(key, int):
            return [columns[key]], False
        if isinstance(key, (list, tuple)):
            return _match_one(list(key), columns)
        raise TidySelectError(f"cannot select with key {key!r}")

    if isinstance(node, MethodCall) and isinstance(node.obj, MetaArg):
        from ..siu.calls import Lit

        def _val(a):
            return a.value if isinstance(a, Lit) else a
        pat = _val(node.args[0])
        if node.name == "startswith":
            return [c for c in columns if c.startswith(pat)], False
        if node.name == "endswith":
            return [c for c in columns if c.endswith(pat)], False
        if node.name == "contains":
            return [c for c in columns if pat in c], False
        if node.name == "matches":
            rx = re.compile(pat)
            return [c for c in columns if rx.search(c)], False
        if node.name == "num_range":
            # dplyr num_range("V", 3, 5) / num_range("V", range(3, 6)):
            # numbered-column selection in NUMERIC order (the reference
            # notebook case-iris-select.ipynb notes it lacks this).
            # Missing members are skipped like dplyr's default.
            if len(node.args) == 3:
                lo, hi = _val(node.args[1]), _val(node.args[2])
                nums = range(int(lo), int(hi) + 1)
            else:
                nums = [int(x) for x in _val(node.args[1])]
            wanted = [f"{pat}{i}" for i in nums]
            return [c for c in wanted if c in columns], False
        raise TidySelectError(f"unknown selection helper _.{node.name}()")

    raise TidySelectError(f"cannot resolve selection {node!r}")


def resolve_select(args, kwargs, columns):
    """Resolve selection args/kwargs to an ordered list of (old, new)."""
    columns = list(columns)
    selection: list[tuple[str, str]] = []
    started = False
    include_mode = None

    def add(name, new=None):
        if name not in columns:
            raise TidySelectError(f"column '{name}' not found")
        for i, (old, _) in enumerate(selection):
            if old == name:
                if new is not None:
                    selection[i] = (old, new)
                return
        selection.append((name, new or name))

    def remove(name):
        nonlocal selection
        selection = [(o, n) for o, n in selection if o != name]

    for arg in args:
        node = strip_symbolic(arg)
        if isinstance(node, BinaryOp) and node.op == "__eq__":
            # select-rename form (reference select doc): the equality
            # operator renames — ``select(_.new == _.old)`` keeps old
            # under the name new, dict-style new-on-the-left
            lhs, rhs = strip_symbolic(node.left), strip_symbolic(node.right)
            if not (isinstance(lhs, GetAttr) and isinstance(lhs.obj, MetaArg)):
                raise TidySelectError(
                    "select rename must look like _.new_name == _.old")
            names, neg = _match_one(rhs, columns)
            if neg or len(names) != 1:
                raise TidySelectError(
                    f"rename target {lhs.name!r} must select exactly one column")
            if not started:
                started = True
            add(names[0], lhs.name)
            continue
        names, neg = _match_one(arg, columns)
        if not started:
            started = True
            include_mode = not neg
            if neg:
                selection.extend((c, c) for c in columns)
        if neg:
            for nm in names:
                remove(nm)
        else:
            for nm in names:
                add(nm)

    for new, old in kwargs.items():
        names, neg = _match_one(old, columns)
        if neg or len(names) != 1:
            raise TidySelectError(f"rename target {new!r} must select exactly one column")
        if not started:
            started = True
        add(names[0], new)

    if not started:
        return [(c, c) for c in columns]
    return selection


def resolve_names(args, columns):
    """Resolve positive-only selections to a flat name list."""
    out = []
    for arg in args:
        names, neg = _match_one(arg, columns)
        if neg:
            raise TidySelectError("negative selection not allowed here")
        for nm in names:
            if nm not in out:
                out.append(nm)
    return out


def resolve_measure_names(args, columns):
    """Full select-style resolution (negation allowed) to a flat name
    list — pivot_longer/gather measure columns accept ``~_.id`` meaning
    "every column except id", exactly like the reference's tidyselect
    (siuba/experimental/pivot/pivot_long.py Examples:
    ``pivot_longer(df, ~_.id, ...)``)."""
    pairs = resolve_select(args, {}, columns)
    return [old for old, _new in pairs]

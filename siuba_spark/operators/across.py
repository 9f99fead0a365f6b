"""across(): apply expression templates over a tidyselection of columns
(reference: siuba/dply/across.py:125-155; the ``Fx`` column placeholder is
siuba/siu/__init__.py:20).

    summarize(across(_[_.x, _.y], Fx.mean()))          → x, y
    mutate(across(_.startswith("l_"), {"mn": Fx.min(), "mx": Fx.max()}))
                                                       → l_a_mn, l_a_mx, ...
"""

from __future__ import annotations

from ..siu.calls import (
    BinaryOp, Call, FnCall, GetAttr, GetItem, Lit, MetaArg, MethodCall,
    RawCallable, Symbolic, UnaryOp, strip_symbolic,
)
from .tidyselect import _match_one

__all__ = ["across", "Fx", "Across", "if_any", "if_all", "IfAnyAll"]


class FxArg(Call):
    """Placeholder for "the current column" inside an across() template."""

    def _parts(self):
        return ("Fx",)


Fx = Symbolic(FxArg())


class Across:
    """Deferred column-wise expansion; verbs expand it via expand_across."""

    def __init__(self, cols, fns, names: str | None = None):
        self.cols = cols
        self.fns = fns
        self.names = names


def across(cols, fns, names: str | None = None):
    return Across(cols, fns, names)


def _replace_fx(node, colname: str):
    """Substitute FxArg → _.colname throughout a Call tree."""
    r = lambda x: _replace_fx(x, colname) if isinstance(x, Call) else x
    if isinstance(node, FxArg):
        return GetAttr(MetaArg(), colname)
    if isinstance(node, GetAttr):
        return GetAttr(r(node.obj), node.name)
    if isinstance(node, GetItem):
        return GetItem(r(node.obj), r(node.key) if isinstance(node.key, Call) else node.key)
    if isinstance(node, BinaryOp):
        return BinaryOp(node.op, r(node.left), r(node.right))
    if isinstance(node, UnaryOp):
        return UnaryOp(node.op, r(node.operand))
    if isinstance(node, MethodCall):
        return MethodCall(r(node.obj), node.name,
                          tuple(r(a) for a in node.args),
                          {k: r(v) for k, v in node.kwargs.items()})
    if isinstance(node, FnCall):
        return FnCall(node.name, tuple(r(a) for a in node.args),
                      {k: r(v) for k, v in node.kwargs.items()})
    if isinstance(node, RawCallable):
        return RawCallable(node.func, tuple(r(a) for a in node.args),
                           {k: r(v) for k, v in node.kwargs.items()})
    return node


def expand_across(acr: Across, columns) -> dict:
    """→ ordered {out_name: Call} for the verb to treat as normal kwargs."""
    names, neg = _match_one(acr.cols, list(columns))
    if neg:
        names = [c for c in columns if c not in names]

    if isinstance(acr.fns, dict):
        fns = {k: strip_symbolic(v) for k, v in acr.fns.items()}
        template = acr.names or "{col}_{fn}"
    else:
        fns = {"": strip_symbolic(acr.fns)}
        template = acr.names or "{col}"

    out = {}
    for col in names:
        for fn_name, call in fns.items():
            label = template.format(col=col, fn=fn_name)
            out[label] = _replace_fx(call, col)
    return out


class IfAnyAll:
    """Deferred if_any()/if_all(): a tidyselection + Fx predicate that
    expands to one OR- / AND-chained condition (dplyr's across-predicate
    helpers; absent from the reference)."""

    def __init__(self, cols, fn, op: str):
        self.cols = cols
        self.fn = fn
        self.op = op


def if_any(cols, fn):
    """True where the Fx predicate holds for ANY selected column:
    ``filter(if_any(_.startswith("l_"), Fx.isna()))``."""
    return IfAnyAll(cols, fn, "__or__")


def if_all(cols, fn):
    """True where the Fx predicate holds for EVERY selected column."""
    return IfAnyAll(cols, fn, "__and__")


def expand_if_any_all(obj: IfAnyAll, columns):
    """→ one Call: the predicate instantiated per column, op-chained."""
    names, neg = _match_one(obj.cols, list(columns))
    if neg:
        names = [c for c in columns if c not in names]
    if not names:
        raise ValueError("if_any/if_all selection matched no columns")
    calls = [_replace_fx(strip_symbolic(obj.fn), c) for c in names]
    out = calls[0]
    for c in calls[1:]:
        out = BinaryOp(obj.op, out, c)
    return out

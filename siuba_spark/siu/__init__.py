"""siu expression layer: the ``_`` Symbolic, Call AST, and formatters
(reference: siuba/siu/__init__.py exports Symbolic/Call/explain/Lazy)."""

from .calls import (
    BinaryOp, Call, FnCall, GetAttr, GetItem, Lam, Lazy, Lit, MetaArg,
    MethodCall, RawCallable, Symbolic, UnaryOp, op_vars, strip_symbolic,
)
from .format import code, explain, tree

__all__ = [
    "BinaryOp", "Call", "FnCall", "GetAttr", "GetItem", "Lam", "Lazy",
    "Lit", "MetaArg", "MethodCall", "RawCallable", "Symbolic", "UnaryOp",
    "op_vars", "strip_symbolic", "code", "explain", "tree",
]

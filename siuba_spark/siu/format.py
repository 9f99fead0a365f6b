"""Pretty-printing for siu expression trees.

Re-expresses the reference's expression formatter + ``explain`` export
(reference: siuba/siu/format.py:1-60 box-tree Formatter,
siuba/siu/symbolic.py:194-199 ``explain``) for this engine's
Spark-oriented node set (:mod:`siuba_spark.siu.calls`).  Two renderings:

- :func:`code` — a one-line string resembling the Python that built the
  expression (the reference ``explain`` return value);
- :func:`tree` — a box-drawing node tree (the reference ``Formatter``
  shape: ``█─`` node boxes, ``├─``/``└─`` child connectors, keyword
  children shown as ``name = █─…``).

``explain`` returns the rendering as a string (``print(explain(...))``
to display it), so a captured expression can be diagnosed before it ever
reaches the lowering layer; TranslationError messages embed the same
rendering.

Examples
--------
>>> from siuba_spark import _, explain
>>> print(explain(_.x.mean() > 3))          # doctest: +NORMALIZE_WHITESPACE
█─>
├─█─.mean
│ └─█─.
│   ├─_
│   └─'x'
└─3
>>> explain(_.a + _.b, style="code")
'(_.a + _.b)'
"""

from __future__ import annotations

from .calls import (
    BinaryOp,
    Call,
    UnaryOp,
    FnCall,
    GetAttr,
    GetItem,
    Lazy,
    Lit,
    MetaArg,
    MethodCall,
    RawCallable,
    Symbolic,
    strip_symbolic,
)

__all__ = ["explain", "tree", "code"]

# dunder -> display glyph, shared by both renderings (the tree labels a
# node with the operator glyph; code() re-inserts it infix)
_BIN_SYMBOL = {
    "__add__": "+", "__sub__": "-", "__mul__": "*", "__truediv__": "/",
    "__floordiv__": "//", "__mod__": "%", "__pow__": "**",
    "__eq__": "==", "__ne__": "!=", "__lt__": "<", "__le__": "<=",
    "__gt__": ">", "__ge__": ">=",
    "__and__": "&", "__or__": "|", "__xor__": "^",
}
_UNARY_SYMBOL = {"__neg__": "-", "__pos__": "+", "__invert__": "~"}


def _callable_name(fn) -> str:
    return getattr(fn, "__name__", None) or repr(fn)


# --------------------------------------------------------------------------
# code(): one-line, resembles the Python that built the expression
# --------------------------------------------------------------------------

def code(node) -> str:
    """Render a Call/Symbolic as a code-like one-liner (the reference
    ``explain`` output, siuba/siu/symbolic.py:194)."""
    node = strip_symbolic(node)
    if isinstance(node, MetaArg):
        return "_"
    if isinstance(node, Lit):
        return repr(node.value)
    if isinstance(node, Lazy):
        return f"Lazy({code(node.args[0])})"
    if isinstance(node, BinaryOp):
        sym = _BIN_SYMBOL.get(node.op, node.op)
        return f"({code(node.left)} {sym} {code(node.right)})"
    if isinstance(node, UnaryOp):
        if node.op == "__abs__":
            return f"abs({code(node.operand)})"
        return f"{_UNARY_SYMBOL.get(node.op, node.op)}{code(node.operand)}"
    if isinstance(node, GetAttr):
        return f"{code(node.obj)}.{node.name}"
    if isinstance(node, GetItem):
        return f"{code(node.obj)}[{code(node.key)}]"
    if isinstance(node, MethodCall):
        return f"{code(node.obj)}.{node.name}({_code_args(node.args, node.kwargs)})"
    if isinstance(node, FnCall):
        return f"{node.name}({_code_args(node.args, node.kwargs)})"
    if isinstance(node, RawCallable):
        return (f"{_callable_name(node.func)}"
                f"({_code_args(node.args, node.kwargs)})")
    return repr(node)


def _code_args(args, kwargs) -> str:
    parts = [code(a) for a in args]
    parts += [f"{k}={code(v)}" for k, v in kwargs.items()]
    return ", ".join(parts)


# --------------------------------------------------------------------------
# tree(): box-drawing node tree
# --------------------------------------------------------------------------

def _describe(node):
    """(label, children) for a node; children are (key_or_None, child)."""
    if isinstance(node, BinaryOp):
        return (_BIN_SYMBOL.get(node.op, node.op),
                [(None, node.left), (None, node.right)])
    if isinstance(node, UnaryOp):
        label = "abs" if node.op == "__abs__" else \
            _UNARY_SYMBOL.get(node.op, node.op)
        return label, [(None, node.operand)]
    if isinstance(node, GetAttr):
        return ".", [(None, node.obj), (None, Lit(node.name))]
    if isinstance(node, GetItem):
        return "[", [(None, node.obj), (None, node.key)]
    if isinstance(node, MethodCall):
        return (f".{node.name}",
                [(None, node.obj)]
                + [(None, a) for a in node.args]
                + [(k, v) for k, v in node.kwargs.items()])
    if isinstance(node, FnCall):
        return (node.name,
                [(None, a) for a in node.args]
                + [(k, v) for k, v in node.kwargs.items()])
    if isinstance(node, RawCallable):
        return (_callable_name(node.func),
                [(None, a) for a in node.args]
                + [(k, v) for k, v in node.kwargs.items()])
    if isinstance(node, Lazy):
        return "Lazy", [(None, node.args[0])]
    raise TypeError(node)  # pragma: no cover — leaves handled in tree()


def tree(node) -> str:
    """Render a Call/Symbolic as a box-drawing node tree (the reference
    Formatter shape, siuba/siu/format.py:6-40)."""
    node = strip_symbolic(node)
    if isinstance(node, MetaArg):
        return "_"
    if isinstance(node, Lit):
        return repr(node.value)
    if not isinstance(node, Call):
        return repr(node)
    label, children = _describe(node)
    lines = [f"█─{label}"]
    for i, (key, child) in enumerate(children):
        last = i == len(children) - 1
        sub = tree(child).splitlines()
        head = f"{key} = " if key is not None else ""
        pad = " " * len(head)
        branch, carry = ("└─", "  ") if last else ("├─", "│ ")
        lines.append(f"{branch}{head}{sub[0]}")
        lines.extend(f"{carry}{pad}{s}" for s in sub[1:])
    return "\n".join(lines)


def explain(expr, style: str = "tree") -> str:
    """Pretty-print a captured siu expression for debugging.

    ``style="tree"`` (default) returns the box-drawing node tree;
    ``style="code"`` returns a one-liner resembling the Python that
    built the expression (the reference's ``explain`` return value).
    The string is returned (not printed) so it composes with doctests,
    logging, and error messages alike."""
    if style == "tree":
        return tree(expr)
    if style == "code":
        return code(expr)
    raise ValueError(f"unknown explain style {style!r}")

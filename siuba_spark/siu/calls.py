"""Expression AST ("siu expressions") for the PySpark engine.

A tiny lazy AST recording column computations, built by operating on the
``_`` Symbolic placeholder.  Re-expresses the concept of the reference's
Call tree (reference: siuba/siu/calls.py:91, siuba/siu/symbolic.py:28) with
a brand-new, Spark-oriented node set: nodes are lowered to
``pyspark.sql.Column`` by :mod:`siuba_spark.functions.lowering` — there is
no pandas evaluation path.

Why an AST at all (instead of raw ``Column``): the same expression must
compile differently in aggregate vs window context (``_.x.mean()`` is an
aggregate in ``summarize`` but a partitioned window in ``mutate``),
tidyselect evaluates expressions against column *names*, and ``arrange``
must strip a leading ``-`` into a sort direction.  See SURVEY.md §7.1.
"""

from __future__ import annotations

# Binary dunders we capture.  r-variants are normalized at capture time by
# swapping operands, so lowering only ever sees the plain form.
BINARY_OPS = (
    "__add__", "__sub__", "__mul__", "__truediv__", "__floordiv__",
    "__mod__", "__pow__",
    "__eq__", "__ne__", "__lt__", "__le__", "__gt__", "__ge__",
    "__and__", "__or__", "__xor__",
)

UNARY_OPS = ("__neg__", "__pos__", "__invert__", "__abs__")


class Call:
    """Base class for AST nodes."""

    __hash__ = object.__hash__

    def __repr__(self):
        return f"{type(self).__name__}({', '.join(repr(v) for v in self._parts())})"

    def _parts(self):
        return ()

    def __call__(self, x):
        """Evaluate the call tree against a plain Python object (reference:
        siuba/siu/calls.py:158 ``Call.__call__`` — symbols double as plain
        lambdas, e.g. ``list(map(~~_.x, points))`` or
        ``strip_symbolic(_['a'] + _['b'])({'a': 1, 'b': 2})``).

        This is the EAGER escape for driver-side Python values; inside
        query verbs the same tree lowers to Spark Columns instead."""
        return _evaluate(self, x)

    def op_vars(self, attr_calls: bool = True) -> set:
        """Set of all variable names used in the expression (reference:
        siuba/siu/calls.py:267 ``Call.op_vars`` — the programming-surface
        helper the key_features guide demonstrates).

        ``attr_calls=False`` excludes names that are *invoked* — method
        names like ``mean`` in ``_.a.mean()`` — leaving only the data
        columns the expression reads."""
        return op_vars(self, attr_calls=attr_calls)

    # Allow raw Call objects in pipes: ``df >> some_call`` is not supported,
    # but composing Calls with operators is (used internally).


class MetaArg(Call):
    """The ``_`` placeholder itself (a reference to "the current table")."""

    def _parts(self):
        return ("_",)


class Lazy(Call):
    """Lazily pass a call object ITSELF instead of its evaluated value
    (reference: siuba/siu/calls.py:335, exported with the ``Lam`` alias at
    siuba/siu/__init__.py:17 and re-exported from ``siuba``).  Wrapping an
    argument of ``call()`` in ``Lazy`` hands the receiving function the
    wrapped expression object un-lowered — e.g. an AST-inspecting helper
    that wants the ``Symbolic`` rather than a ``Column``."""

    def __init__(self, func, arg=None):
        # mirror the reference's two-form constructor: Lazy(x) wraps x;
        # the (func, arg) form appears in generic node rebuilds
        if arg is None:
            self.func = "<lazy>"
            self.args = (func,)
        else:
            self.func = func
            self.args = (arg,)
        self.kwargs = {}

    def _parts(self):
        return (self.args[0],)

    def __call__(self, x, *args, **kwargs):
        return self.args[0]


Lam = Lazy


class Lit(Call):
    """A literal constant embedded in an expression."""

    def __init__(self, value):
        self.value = value

    def _parts(self):
        return (self.value,)


class BinaryOp(Call):
    def __init__(self, op: str, left, right):
        self.op = op
        self.left = left
        self.right = right

    def _parts(self):
        return (self.op, self.left, self.right)


class UnaryOp(Call):
    def __init__(self, op: str, operand):
        self.op = op
        self.operand = operand

    def _parts(self):
        return (self.op, self.operand)


class GetAttr(Call):
    def __init__(self, obj, name: str):
        self.obj = obj
        self.name = name

    def _parts(self):
        return (self.obj, self.name)


class GetItem(Call):
    def __init__(self, obj, key):
        self.obj = obj
        self.key = key

    def _parts(self):
        return (self.obj, self.key)


class MethodCall(Call):
    """``_.x.mean(...)`` — a method invoked on a lowered expression."""

    def __init__(self, obj, name: str, args: tuple, kwargs: dict):
        self.obj = obj
        self.name = name
        self.args = args
        self.kwargs = kwargs

    def _parts(self):
        return (self.obj, self.name, self.args, self.kwargs)


class FnCall(Call):
    """A registered free function, e.g. ``lead(_.x, 2)`` or ``n(_)``.

    ``name`` keys into the lowering registry; args/kwargs are Calls or
    literals.
    """

    def __init__(self, name: str, args: tuple = (), kwargs: dict | None = None):
        self.name = name
        self.args = args
        self.kwargs = kwargs or {}

    def _parts(self):
        return (self.name, self.args, self.kwargs)


class RawCallable(Call):
    """Escape hatch: an arbitrary Python callable applied to lowered args.

    The callable receives ``pyspark.sql.Column`` arguments and must return a
    Column (mirrors the reference's any-callable-in-a-pipe behavior,
    siuba/siu/dispatchers.py:304-368, but against Spark columns).
    """

    def __init__(self, func, args: tuple, kwargs: dict):
        self.func = func
        self.args = args
        self.kwargs = kwargs

    def _parts(self):
        return (self.func, self.args, self.kwargs)


# --------------------------------------------------------------------------
# plain-Python evaluation of Call trees (the reference's Call.__call__)
# --------------------------------------------------------------------------


def _eval_key(key, x):
    if isinstance(key, Symbolic):
        key = key._call
    if isinstance(key, Call):
        return _evaluate(key, x)
    if isinstance(key, slice):
        return slice(_eval_key(key.start, x), _eval_key(key.stop, x),
                     _eval_key(key.step, x))
    return key


def _evaluate(node, x):
    """Recursive eager evaluator for Call trees over plain Python data.
    FnCall nodes are NOT evaluable — their names key into the Spark
    lowering registry, not Python builtins (lowering is where they mean
    something)."""
    import operator

    if not isinstance(node, Call):
        return node
    if isinstance(node, MetaArg):
        return x
    if isinstance(node, Lit):
        return node.value
    if isinstance(node, Lazy):
        return node.args[0]
    if isinstance(node, BinaryOp):
        return getattr(operator, node.op)(
            _evaluate(node.left, x), _evaluate(node.right, x))
    if isinstance(node, UnaryOp):
        fn = abs if node.op == "__abs__" else getattr(operator, node.op)
        return fn(_evaluate(node.operand, x))
    if isinstance(node, GetAttr):
        return getattr(_evaluate(node.obj, x), node.name)
    if isinstance(node, GetItem):
        return _evaluate(node.obj, x)[_eval_key(node.key, x)]
    if isinstance(node, MethodCall):
        fn = getattr(_evaluate(node.obj, x), node.name)
        return fn(*[_evaluate(a, x) for a in node.args],
                  **{k: _evaluate(v, x) for k, v in node.kwargs.items()})
    if isinstance(node, RawCallable):
        return node.func(*[_evaluate(a, x) for a in node.args],
                         **{k: _evaluate(v, x) for k, v in node.kwargs.items()})
    raise TypeError(
        f"cannot evaluate {type(node).__name__} against plain Python data"
        + (f" — '{node.name}' keys into the Spark lowering registry; use "
           "it inside a query verb" if isinstance(node, FnCall) else ""))


# --------------------------------------------------------------------------
# Symbolic: the user-facing ``_`` object
# --------------------------------------------------------------------------

_RSWAP = {
    "__radd__": "__add__", "__rsub__": "__sub__", "__rmul__": "__mul__",
    "__rtruediv__": "__truediv__", "__rfloordiv__": "__floordiv__",
    "__rmod__": "__mod__", "__rpow__": "__pow__",
    "__rand__": "__and__", "__ror__": "__or__", "__rxor__": "__xor__",
}


def strip_symbolic(x):
    """Return the underlying Call for a Symbolic, else x unchanged."""
    return x._call if isinstance(x, Symbolic) else x


def op_vars(node, attr_calls: bool = True) -> set:
    """Collect every variable name an expression references (reference:
    siuba/siu/calls.py:267).  Names come from attribute access
    (``_.a`` → 'a'), string subscripts (``_["b"]`` → 'b'), and — unless
    ``attr_calls=False`` — invoked method names (``_.a.mean()`` adds
    'mean').

    Examples
    --------
    >>> from siuba_spark import _
    >>> from siuba_spark.siu import op_vars, strip_symbolic
    >>> sorted(op_vars(_.a.mean() + _["b"], attr_calls=False))
    ['a', 'b']
    >>> sorted(op_vars(_.a.mean() + _["b"]))
    ['a', 'b', 'mean']
    """
    node = strip_symbolic(node)
    out = set()
    if isinstance(node, GetAttr):
        out.add(node.name)
        out |= op_vars(node.obj, attr_calls)
    elif isinstance(node, GetItem):
        if isinstance(node.key, str):
            out.add(node.key)
        else:
            out |= op_vars(node.key, attr_calls)
        out |= op_vars(node.obj, attr_calls)
    elif isinstance(node, MethodCall):
        if attr_calls:
            out.add(node.name)
        out |= op_vars(node.obj, attr_calls)
        for a in node.args:
            out |= op_vars(a, attr_calls)
        for v in node.kwargs.values():
            out |= op_vars(v, attr_calls)
    elif isinstance(node, BinaryOp):
        out |= op_vars(node.left, attr_calls) | op_vars(node.right, attr_calls)
    elif isinstance(node, UnaryOp):
        out |= op_vars(node.operand, attr_calls)
    elif isinstance(node, (FnCall, RawCallable, Lazy)):
        for a in getattr(node, "args", ()):
            out |= op_vars(a, attr_calls)
        for v in getattr(node, "kwargs", {}).values():
            out |= op_vars(v, attr_calls)
    return out


def _node(x):
    """Coerce a value to an AST node (Symbolic→Call, other→Lit)."""
    if isinstance(x, Symbolic):
        return x._call
    if isinstance(x, Call):
        return x
    return Lit(x)


def _make_binary(op):
    def method(self, other):
        return Symbolic(BinaryOp(op, self._call, _node(other)), ready=True)
    method.__name__ = op
    return method


def _make_rbinary(rop, op):
    def method(self, other):
        return Symbolic(BinaryOp(op, _node(other), self._call), ready=True)
    method.__name__ = rop
    return method


def _make_unary(op):
    def method(self):
        return Symbolic(UnaryOp(op, self._call), ready=True)
    method.__name__ = op
    return method


class Symbolic:
    """Builds Call trees from natural Python syntax: ``_.x + 1``."""

    __slots__ = ("_call", "_ready")

    def __init__(self, call: Call | None = None, ready: bool = False):
        # ``ready`` mirrors the reference's ready_to_call flag
        # (siuba/siu/symbolic.py:30): an expression whose outermost node
        # is an operator / index / completed method call EVALUATES when
        # called — symbols double as plain lambdas (``map(_ * 2, xs)``);
        # a dangling attribute access instead builds a method call.
        object.__setattr__(self, "_call", call if call is not None else MetaArg())
        object.__setattr__(self, "_ready", ready)

    # -- structure builders ------------------------------------------------
    def __getattr__(self, name):
        if name.startswith("__") and name.endswith("__"):
            raise AttributeError(name)
        return Symbolic(GetAttr(self._call, name))

    def __getitem__(self, key):
        return Symbolic(GetItem(self._call, key), ready=True)

    def __call__(self, *args, **kwargs):
        call = self._call
        if self._ready:
            if kwargs or len(args) != 1:
                raise TypeError(
                    "evaluating a symbolic expression takes exactly one "
                    "positional argument (the data context)")
            return call(args[0])
        if isinstance(call, GetAttr):
            return Symbolic(MethodCall(
                call.obj, call.name,
                tuple(_node(a) for a in args),
                {k: _node(v) for k, v in kwargs.items()},
            ), ready=True)
        raise TypeError(f"cannot call expression of type {type(call).__name__}")

    # -- pipes -------------------------------------------------------------
    def __rshift__(self, other):
        from ..plans.pipe import as_pipe
        if isinstance(self._call, MetaArg):
            return as_pipe(other)
        raise TypeError("only bare `_` may start a pipe")

    def __rrshift__(self, data):
        raise TypeError(
            "a bare symbolic expression cannot be applied to data; "
            "use verbs like mutate()/filter()"
        )

    # -- misc protocol -----------------------------------------------------
    def __round__(self, n=0):
        # builtin round(_.x, 2) (and the reference's registered __round__
        # op) captures as the .round() method — same lowering, F.round
        return Symbolic(MethodCall(self._call, "round", (_node(n),), {}))

    def __bool__(self):
        raise TypeError(
            "Symbolic expressions are lazy and have no truth value. "
            "Use & | ~ instead of `and` / `or` / `not`."
        )

    def __iter__(self):
        raise TypeError("Symbolic expressions are not iterable")

    def __contains__(self, item):
        # `1 in _` would silently coerce through __iter__/__bool__; the
        # reference "is careful to raise an error" here (programming
        # guide, Caveats) — use _.isin([...]) for membership tests
        raise TypeError(
            "`x in _.col` cannot be expressed lazily (Python requires "
            "__contains__ to return a bool). Use _.col.isin([...]) instead."
        )

    def __repr__(self):
        return f"Symbolic({self._call!r})"

    __hash__ = object.__hash__


for _op in BINARY_OPS:
    setattr(Symbolic, _op, _make_binary(_op))
for _rop, _op in _RSWAP.items():
    setattr(Symbolic, _rop, _make_rbinary(_rop, _op))
for _op in UNARY_OPS:
    setattr(Symbolic, _op, _make_unary(_op))


def _sym_invert(self):
    """``~expr`` negates; ``~~expr`` ESCAPES — returns the raw Call so the
    expression can be handed to plain-Python machinery like ``map``
    (reference siuba/siu/symbolic.py:71; e.g. ``map(~~_.x, points)``
    reads the ``x`` attribute instead of building a method call)."""
    call = self._call
    if isinstance(call, UnaryOp) and call.op == "__invert__":
        return call.operand
    return Symbolic(UnaryOp("__invert__", call), ready=True)


Symbolic.__invert__ = _sym_invert

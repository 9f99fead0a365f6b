"""Pipe (``>>``) machinery and the verb decorator.

Re-expresses the reference's deferred-pipe dispatch
(siuba/siu/dispatchers.py:88-169) without singledispatch: a verb called
without data returns a ``Pipe``; ``data >> pipe`` applies it; pipes
compose with ``>>``.
"""

from __future__ import annotations

from functools import wraps

from pyspark.sql import DataFrame


class Pipe:
    __slots__ = ("fn", "name")

    def __init__(self, fn=None, name="pipe", *, f=None):
        # ``f=`` is the reference Pipeable's keyword spelling
        # (examples-dplyr-funcs.ipynb: ``Pipeable(f = lambda x: x + 1)``)
        if fn is None:
            fn = f
        if fn is None:
            raise TypeError("Pipe needs a callable (positional or f=)")
        self.fn = fn
        self.name = name

    def __rrshift__(self, data):
        return self.fn(wrap_table(data))

    def __rshift__(self, other):
        other = as_pipe(other)
        return Pipe(lambda t: other.fn(self.fn(t)), f"{self.name}>>{other.name}")

    def __call__(self, data):
        # direct application: tables are wrapped; any other value passes
        # through raw so generic-lambda pipes compose over plain Python
        # data like the reference's Pipeable (``(Pipeable(f=...) >>
        # Pipeable(f=...))(2)``)
        from .tbl import SparkTbl
        if isinstance(data, (SparkTbl, DataFrame)):
            return self.fn(wrap_table(data))
        return self.fn(data)

    def __repr__(self):
        return f"<Pipe {self.name}>"


def as_pipe(x):
    if isinstance(x, Pipe):
        return x
    if callable(x):
        # plain callables pipe too: data >> (lambda t: ...) — the escape
        # hatch for ad-hoc stages (reference: siu pipes accept callables)
        return Pipe(x, getattr(x, "__name__", "fn"))
    raise TypeError(f"cannot use {type(x).__name__} in a pipe")


def wrap_table(data):
    from .tbl import SparkTbl
    if isinstance(data, SparkTbl):
        return data
    if isinstance(data, DataFrame):
        return SparkTbl(data)
    raise TypeError(f"expected SparkTbl or pyspark DataFrame, got {type(data).__name__}")


def verb(fn):
    """Make `fn(tbl, *a, **kw)` pipeable: `fn(*a) >> `-able and directly callable."""
    from .tbl import SparkTbl

    @wraps(fn)
    def wrapper(*args, **kwargs):
        if args and isinstance(args[0], (SparkTbl, DataFrame)):
            return fn(wrap_table(args[0]), *args[1:], **kwargs)
        # explicit-pipe spelling (reference programming guide, 'Pipeable
        # class'): ``mutate(_, x=...)`` — a bare leading ``_`` is the
        # placeholder for the piped table, not an argument
        from ..siu.calls import MetaArg, strip_symbolic
        if args and isinstance(strip_symbolic(args[0]), MetaArg):
            args = args[1:]
        return Pipe(lambda t: fn(t, *args, **kwargs), fn.__name__)

    wrapper.__verb__ = fn
    return wrapper


def join_verb(fn):
    """Verb decorator for two-table verbs.  ``join(l, r, ...)`` executes;
    ``l >> inner_join(r, ...)`` pipes; the reference's explicit
    ``inner_join(_, r, ...)`` spelling is accepted too
    (siuba pipes joins with a leading ``_``)."""
    from .tbl import SparkTbl
    from ..siu.calls import MetaArg, Symbolic, strip_symbolic

    def is_table(x):
        return isinstance(x, (SparkTbl, DataFrame))

    @wraps(fn)
    def wrapper(*args, **kwargs):
        if args and isinstance(args[0], Symbolic) \
                and isinstance(strip_symbolic(args[0]), MetaArg):
            args = args[1:]
        if len(args) >= 2 and is_table(args[0]) and is_table(args[1]):
            return fn(wrap_table(args[0]), wrap_table(args[1]), *args[2:], **kwargs)
        if args and is_table(args[0]):
            right, rest = args[0], args[1:]
            return Pipe(lambda t: fn(t, wrap_table(right), *rest, **kwargs), fn.__name__)
        return Pipe(lambda t: fn(t, *args, **kwargs), fn.__name__)

    wrapper.__verb__ = fn
    return wrapper


def pipe(fn, *args, **kwargs):
    """Insert an arbitrary table→table callable into a ``>>`` chain
    (reference: siuba's ``pipe``/``call``, siuba/siu/dispatchers.py:304-368):

        tbl >> pipe(lambda t: t.evolve(df=t.df.limit(3)))
    """
    return Pipe(lambda t: fn(t, *args, **kwargs),
                getattr(fn, "__name__", "pipe"))


# API-name parity with the reference's Pipeable class
Pipeable = Pipe

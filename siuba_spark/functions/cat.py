"""``.cat`` accessor — pandas-Categorical operations without a categorical
dtype (reference ops registry: siuba/ops/generics.py:323-335, ``ops_cat``).

Spark has no categorical type, so a "factor" here is a plain string column
plus **level metadata carried on the table**: ``SparkTbl.factors`` maps
column name -> ``CatMeta(levels, ordered)``.  ``mutate(x=_.x.cat.
set_categories([...]))`` records the levels; later verbs consult them —
``arrange`` sorts by level order (closing the level-order-carry gap noted
in SURVEY §2.8), and ``.cat.codes`` / ``.cat.categories`` / ``.cat.
ordered`` read them back with zero data passes.

Two compilation paths:

- **static** (levels known, from the ledger or an inline ``set_categories``
  chain): every op is a literal ``F.array_position`` / ``isin`` / ``when``
  chain — pure whole-stage codegen, no shuffle, scale-free.
- **dynamic** (``codes`` on a column with no declared levels — the
  ``astype('category')`` analog, where pandas derives levels as sorted
  uniques): ``rewrite_cat_dynamic`` replaces the node with a DataFrame-
  level plan — distinct levels (bounded, categorical cardinality) get
  ``row_number`` codes on the driver-free side of a **broadcast join**
  back to the data.  The single-partition window runs over the distinct
  level set only, never the data.  Same rewrite mechanism as fct_lump
  (forcats.py:192).

Divergences from pandas (documented): ``.cat`` works on any string
column (pandas raises on non-categoricals); ``remove_unused_categories``
keeps values but drops the static ledger entry (the surviving level set
is data-dependent).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

from pyspark.sql import Window
from pyspark.sql import functions as F


class CatMeta(NamedTuple):
    """Factor metadata: explicit level order + pandas ``ordered`` flag."""
    levels: Optional[Tuple[str, ...]]
    ordered: bool = False


def _err(msg):
    from .lowering import TranslationError
    return TranslationError(msg)


def _need_levels(meta, op):
    if meta is None or meta.levels is None:
        raise _err(
            f".cat.{op} needs known levels — declare them first with "
            f".cat.set_categories([...]) (or use a column whose levels "
            f"were recorded by a previous mutate)")
    return meta.levels


def _lvl_array(levels):
    return F.array(*[F.lit(v) for v in levels])


# --------------------------------------------------------------------------
# properties (_.x.cat.codes / .categories / .ordered)
# --------------------------------------------------------------------------

def cat_codes(col, meta):
    """Integer code = position in the level order; NULL/unknown -> -1
    (pandas: NaN -> -1).  Literal array lookup — codegen, no shuffle."""
    levels = _need_levels(meta, "codes")
    pos = F.array_position(_lvl_array(levels), col)
    return F.coalesce(F.when(pos > 0, pos - 1), F.lit(-1)).cast("int")


def cat_categories(col, meta, ctx):
    """Known levels -> literal array (free).  Unknown -> sorted distinct
    aggregate (AGG mode) / over the group window (ROW mode)."""
    if meta is not None and meta.levels is not None:
        return _lvl_array(meta.levels), None
    agg = F.array_sort(F.collect_set(col))
    from .lowering import AGG, AGGED
    if ctx.mode == AGG:
        return agg, AGGED
    return F.array_sort(F.collect_set(col).over(ctx.w_agg())), None


def cat_ordered(col, meta):
    return F.lit(bool(meta.ordered)) if meta is not None else F.lit(False)


# --------------------------------------------------------------------------
# methods (value expr + new metadata; all literal when/isin chains)
# --------------------------------------------------------------------------

def cat_set_categories(col, meta, new_categories, ordered=False):
    """Values outside the new levels become NULL (pandas: NaN)."""
    levels = tuple(new_categories)
    return (F.when(col.isin(list(levels)), col),
            CatMeta(levels, bool(ordered)))


def cat_add_categories(col, meta, new_categories):
    levels = _need_levels(meta, "add_categories")
    add = tuple(new_categories) if isinstance(new_categories, (list, tuple)) \
        else (new_categories,)
    clash = [c for c in add if c in levels]
    if clash:
        raise _err(f".cat.add_categories: already present: {clash}")
    return col, CatMeta(levels + add, meta.ordered)


def cat_remove_categories(col, meta, removals):
    rm = tuple(removals) if isinstance(removals, (list, tuple)) \
        else (removals,)
    out = F.when(col.isin(list(rm)), F.lit(None).cast("string")) \
        .otherwise(col)
    if meta is not None and meta.levels is not None:
        missing = [c for c in rm if c not in meta.levels]
        if missing:
            raise _err(f".cat.remove_categories: not in levels: {missing}")
        return out, CatMeta(tuple(l for l in meta.levels if l not in rm),
                            meta.ordered)
    return out, None


def cat_rename_categories(col, meta, mapping):
    """dict form remaps values (and levels, when known); list form needs
    known levels (positional rename, like pandas)."""
    from .lowering import _flat_case
    if isinstance(mapping, dict):
        # flat CaseWhen, not a nested otherwise-chain (linear to
        # serialize; same values — see lowering._flat_case)
        out = _flat_case(col, mapping, col)
        if meta is not None and meta.levels is not None:
            return out, CatMeta(
                tuple(mapping.get(l, l) for l in meta.levels), meta.ordered)
        return out, None
    levels = _need_levels(meta, "rename_categories")
    new = tuple(mapping)
    if len(new) != len(levels):
        raise _err(
            f".cat.rename_categories: got {len(new)} names for "
            f"{len(levels)} levels")
    out = _flat_case(col, dict(zip(levels, new)), col)
    return out, CatMeta(new, meta.ordered)


def cat_reorder_categories(col, meta, new_order, ordered=None):
    levels = _need_levels(meta, "reorder_categories")
    new = tuple(new_order)
    if sorted(new) != sorted(levels):
        raise _err(
            ".cat.reorder_categories: new order must contain exactly the "
            f"current levels {sorted(levels)}")
    return col, CatMeta(new, meta.ordered if ordered is None
                        else bool(ordered))


def cat_as_ordered(col, meta):
    levels = _need_levels(meta, "as_ordered")
    return col, CatMeta(levels, True)


def cat_as_unordered(col, meta):
    levels = _need_levels(meta, "as_unordered")
    return col, CatMeta(levels, False)


def cat_remove_unused_categories(col, meta):
    """Values unchanged; the surviving level set is data-dependent, so the
    static ledger entry is dropped (documented divergence — the reference
    classes this op as 'window', generics.py:331)."""
    return col, None


CAT_METHODS = {
    "set_categories": cat_set_categories,
    "add_categories": cat_add_categories,
    "remove_categories": cat_remove_categories,
    "rename_categories": cat_rename_categories,
    "reorder_categories": cat_reorder_categories,
    "as_ordered": cat_as_ordered,
    "as_unordered": cat_as_unordered,
    "remove_unused_categories": cat_remove_unused_categories,
}

CAT_PROPERTIES = frozenset({"codes", "categories", "ordered"})


# --------------------------------------------------------------------------
# dynamic codes: DataFrame-level rewrite (same mechanism as fct_lump)
# --------------------------------------------------------------------------

def _static_meta_reachable(x, ctx):
    """True when the expression under ``.cat`` resolves level metadata
    statically (ledger column, or an inline *_categories chain)."""
    from ..siu.calls import GetAttr, MetaArg, MethodCall
    if isinstance(x, GetAttr) and isinstance(x.obj, MetaArg):
        return x.name in ctx.factors
    if isinstance(x, MethodCall) and (
            x.name.endswith("_categories") or
            x.name in ("as_ordered", "as_unordered")):
        return True
    return False


def _dyn_codes_plan(ctx, inner, df, idx):
    """codes with data-derived levels (sorted uniques, the pandas
    ``astype('category')`` rule): distinct -> row_number over the bounded
    level set -> broadcast join back; NULL -> -1."""
    from .lowering import lower
    col, _ = lower(inner, ctx)
    v, code = f"__cat_val_{idx}", f"__cat_code_{idx}"
    df = df.withColumn(v, col)
    levels = (df.select(v).where(F.col(v).isNotNull()).distinct()
              .withColumn(code, (F.row_number().over(Window.orderBy(v)) - 1)
                          .cast("int")))
    df = df.join(F.broadcast(levels), on=v, how="left")
    return df, F.coalesce(F.col(code), F.lit(-1)).cast("int"), [v, code]


def rewrite_cat_dynamic(node, ctx, df):
    """Replace ``.cat.codes`` nodes whose levels are NOT statically known
    with the distinct->broadcast-join plan.  Returns ``(df, node, tmps)``;
    identity when nothing matches."""
    from ..siu.calls import (BinaryOp, Call, FnCall, GetAttr, GetItem, Lit,
                             MethodCall, UnaryOp)

    state = {"df": df, "tmps": [], "idx": 0}

    def walk(nd):
        if not isinstance(nd, Call):
            return nd
        if (isinstance(nd, GetAttr) and nd.name == "codes"
                and isinstance(nd.obj, GetAttr) and nd.obj.name == "cat"
                and not _static_meta_reachable(nd.obj.obj, ctx)):
            inner = walk(nd.obj.obj)
            state["df"], col, tmps = _dyn_codes_plan(
                ctx, inner, state["df"], state["idx"])
            state["idx"] += 1
            state["tmps"].extend(tmps)
            return Lit(col)
        if isinstance(nd, FnCall):
            return FnCall(nd.name, tuple(walk(a) for a in nd.args),
                          {k: walk(v) for k, v in nd.kwargs.items()})
        if isinstance(nd, BinaryOp):
            return BinaryOp(nd.op, walk(nd.left), walk(nd.right))
        if isinstance(nd, UnaryOp):
            return UnaryOp(nd.op, walk(nd.operand))
        if isinstance(nd, MethodCall):
            return MethodCall(walk(nd.obj), nd.name,
                              tuple(walk(a) for a in nd.args),
                              {k: walk(v) for k, v in nd.kwargs.items()})
        if isinstance(nd, GetAttr):
            return GetAttr(walk(nd.obj), nd.name)
        if isinstance(nd, GetItem):
            return GetItem(walk(nd.obj), walk(nd.key))
        return nd

    new = walk(node)
    return state["df"], new, state["tmps"]

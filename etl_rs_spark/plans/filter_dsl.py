"""JSON filter DSL + list options — the reference's query layer
semantics (SURVEY.md §2.12) over DataFrames.

The reference deserializes per-column typed op-maps (modql) into SQL
conditions — e.g. ``{"id": {"$in": [1,2]}, "name": {"$contains": "Je"}}``
(crates/libs/lib-core/src/model/agent.rs:45-55, usage :128-131) — and
pages with ``ListOptions {limit, offset, order_bys}`` where a leading
``!`` means descending and the defaults are limit=1000 / hard max 5000
(crates/libs/lib-core/src/model/base.rs:14-15,
crud_fns.rs:115-189). This module re-expresses both on the DataFrame
API so they compile into Catalyst predicates (pushed down to the scan)
instead of SQL strings.

Filter grammar::

    {col: scalar}                     -> col = scalar   ($eq shorthand)
    {col: {"$op": operand, ...}}      -> AND of ops on that column
    {"$or": [filter, filter, ...]}    -> OR of sub-filters
    [filter, filter]                  -> OR (modql's Vec<F> semantics)

Supported ops mirror modql's OpVals*: $eq $ne $lt $lte $gt $gte $in
$notIn $contains $notContains $startsWith $endsWith $containsCi
$startsWithCi $endsWithCi $null.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_LIMIT = 1000   # reference base.rs:14 (LIST_LIMIT_DEFAULT)
MAX_LIMIT = 5000       # reference base.rs:15 (LIST_LIMIT_MAX)


class FilterError(ValueError):
    pass


def _escape_like(s: str) -> str:
    return s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")


def _require_list(op: str, operand) -> list:
    # list(operand) on an int/None raises bare TypeError, and on a STRING
    # silently explodes into characters — both must be the DSL's own error
    if isinstance(operand, (str, bytes)) or not isinstance(operand, (list, tuple, set)):
        raise FilterError(f"{op} needs a list operand, got {type(operand).__name__}")
    return list(operand)


def _require_str(op: str, operand) -> str:
    if not isinstance(operand, str):
        raise FilterError(f"{op} needs a string operand, got {type(operand).__name__}")
    return operand


def _op_to_column(col: Column, op: str, operand) -> Column:
    if op in ("$in", "$notIn"):
        operand = _require_list(op, operand)
    elif op in (
        "$contains", "$notContains", "$startsWith", "$endsWith",
        "$containsCi", "$startsWithCi", "$endsWithCi",
    ):
        operand = _require_str(op, operand)
    if op == "$eq":
        return col == operand
    if op == "$ne":
        return col != operand
    if op == "$lt":
        return col < operand
    if op == "$lte":
        return col <= operand
    if op == "$gt":
        return col > operand
    if op == "$gte":
        return col >= operand
    if op == "$in":
        return col.isin(list(operand))
    if op == "$notIn":
        return ~col.isin(list(operand))
    if op == "$contains":
        return col.like(f"%{_escape_like(operand)}%")
    if op == "$notContains":
        return ~col.like(f"%{_escape_like(operand)}%")
    if op == "$startsWith":
        return col.like(f"{_escape_like(operand)}%")
    if op == "$endsWith":
        return col.like(f"%{_escape_like(operand)}")
    if op == "$containsCi":
        return F.lower(col).like(f"%{_escape_like(operand.lower())}%")
    if op == "$startsWithCi":
        return F.lower(col).like(f"{_escape_like(operand.lower())}%")
    if op == "$endsWithCi":
        return F.lower(col).like(f"%{_escape_like(operand.lower())}")
    if op == "$null":
        return col.isNull() if operand else col.isNotNull()
    raise FilterError(f"unsupported filter op: {op}")


def filter_to_column(flt) -> Column:
    """Compile a filter (dict, or list-of-dicts = OR) to one Column."""
    if isinstance(flt, list):
        if not flt:
            return F.lit(True)
        out = filter_to_column(flt[0])
        for f_ in flt[1:]:
            out = out | filter_to_column(f_)
        return out
    if not isinstance(flt, dict):
        raise FilterError(f"filter must be dict or list, got {type(flt).__name__}")
    conds: list[Column] = []
    for key, val in flt.items():
        if not isinstance(key, str) or not key:
            raise FilterError(f"filter keys must be column names, got {key!r}")
        if key == "$or":
            conds.append(filter_to_column(_require_list("$or", val)))
            continue
        if key.startswith("$"):
            # any other group op ('$and', a typo like '$Or') must fail
            # HERE with the DSL's own error, not fall through to an
            # unresolvable column named '$and' at plan time
            raise FilterError(f"unsupported group op {key!r} (only '$or')")
        col = F.col(key)
        if isinstance(val, dict):
            for op, operand in val.items():
                conds.append(_op_to_column(col, op, operand))
        else:
            conds.append(col.isNull() if val is None else (col == val))
    out = F.lit(True)
    for c in conds:
        out = out & c
    return out


@dataclass
class ListOptions:
    """ORDER BY / LIMIT / OFFSET with the reference's defaults and the
    '!'-prefix descending convention (modql ListOptions)."""

    limit: int | None = None
    offset: int | None = None
    order_bys: list[str] = field(default_factory=lambda: ["id"])

    def effective_limit(self) -> int:
        limit = DEFAULT_LIMIT if self.limit is None else self.limit
        if limit > MAX_LIMIT:
            raise FilterError(
                f"limit {limit} exceeds max {MAX_LIMIT}"  # crud_fns.rs:169-176
            )
        if limit < 0:
            raise FilterError(f"limit must be >= 0, got {limit}")
        return limit

    def validate(self) -> None:
        """Reject malformed paging up front. Only the offset check lives
        here — effective_limit() and sort_columns() already raise their
        own typed errors when list_query calls them, so re-running them
        would just do every validation twice per query."""
        if self.offset is not None and self.offset < 0:
            raise FilterError(f"offset must be >= 0, got {self.offset}")

    def sort_columns(self) -> list[Column]:
        cols = []
        for ob in self.order_bys or []:
            if not isinstance(ob, str):
                raise FilterError(f"order_by entries must be column names, got {ob!r}")
            # exactly ONE leading '!' means descending; '!!col' (or bare
            # '!') is malformed and must raise the DSL's typed error, not
            # surface later as a Spark AnalysisException on col('!col')
            name = ob[1:] if ob.startswith("!") else ob
            if not name or name.startswith("!"):
                raise FilterError(f"order_by entries must be column names, got {ob!r}")
            if ob.startswith("!"):
                cols.append(F.col(name).desc())
            else:
                cols.append(F.col(name).asc())
        return cols


def list_query(
    df: DataFrame, flt=None, opts: ListOptions | None = None
) -> DataFrame:
    """The reference's `list` entry point (crud_fns.rs:129-189):
    filter -> order -> offset/limit."""
    opts = opts or ListOptions(order_bys=[df.columns[0]])
    opts.validate()
    out = df.filter(filter_to_column(flt)) if flt is not None else df
    sort_cols = opts.sort_columns()
    # a None/empty order_bys (callers constructing ListOptions directly)
    # falls back to the reference's id ordering — pagination without a
    # defined order would be nondeterministic
    out = out.orderBy(*(sort_cols or [F.col(df.columns[0]).asc()]))
    if opts.offset:
        out = out.offset(opts.offset)
    return out.limit(opts.effective_limit())


def get_by_id(df: DataFrame, id_col: str, id_val) -> DataFrame:
    """Point lookup (crud_fns.rs:72-97)."""
    return df.filter(F.col(id_col) == id_val)


def first(df: DataFrame, flt=None, opts: ListOptions | None = None) -> DataFrame:
    """First-row semantics: order by id, limit 1 (crud_fns.rs:99-127).
    The caller's options object is not mutated."""
    from dataclasses import replace

    opts = (
        replace(opts, limit=1)
        if opts is not None
        else ListOptions(limit=1, order_bys=[df.columns[0]])
    )
    return list_query(df, flt, opts)


def count_query(df: DataFrame, flt=None) -> int:
    """COUNT(*) with filter (crud_fns.rs:281-308)."""
    out = df.filter(filter_to_column(flt)) if flt is not None else df
    return out.count()

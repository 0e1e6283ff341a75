"""AST for the csvtool dialect.

Unlike the reference's single untyped ``Node`` with five generic slots
(/root/reference/utils.go:332-344), we use typed dataclasses — the compiler
pattern-matches on node class, and the coercion planner annotates ``dtype``
(one of dialect.types T_*) in place.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Expr:
    """Base expression; ``dtype`` is filled by the typecheck pass."""

    dtype: int | None = None
    #: True when the subtree contains an aggregate function call.
    has_agg: bool = False


@dataclass
class Lit(Expr):
    raw: str          # original token text
    quoted: bool = False
    dtype: int | None = None
    has_agg: bool = False
    value: object = None  # typed python value, set by enforce_types


@dataclass
class Col(Expr):
    name: str          # column name, or cN / number form before resolution
    file_alias: str | None = None   # alias-qualified reference (a.col)
    index: int | None = None        # resolved 0-based column index
    resolved_name: str | None = None
    dtype: int | None = None
    has_agg: bool = False


@dataclass
class BinOp(Expr):
    op: str            # + - * / % ^
    left: Expr = None
    right: Expr = None
    dtype: int | None = None
    has_agg: bool = False


@dataclass
class Neg(Expr):
    operand: Expr = None
    dtype: int | None = None
    has_agg: bool = False


@dataclass
class Func(Expr):
    name: str          # lowercased function name
    args: list[Expr] = field(default_factory=list)
    distinct: bool = False     # count(distinct x) etc.
    star: bool = False         # count(*)
    dtype: int | None = None
    has_agg: bool = False


@dataclass
class CaseWhenPred(Expr):
    """Searched CASE: when <predicates> then <expr> ..."""

    whens: list[tuple["Pred", Expr]] = field(default_factory=list)
    else_: Expr | None = None
    dtype: int | None = None
    has_agg: bool = False


@dataclass
class CaseWhenExpr(Expr):
    """Simple CASE: case <expr> when <expr> then <expr> ..."""

    base: Expr = None
    whens: list[tuple[Expr, Expr]] = field(default_factory=list)
    else_: Expr | None = None
    dtype: int | None = None
    has_agg: bool = False


# --- predicates -----------------------------------------------------------


class Pred:
    has_agg: bool = False


@dataclass
class Compare(Pred):
    op: str            # = != < <= > >= like
    left: Expr = None
    right: Expr = None
    negated: bool = False
    has_agg: bool = False


@dataclass
class Between(Pred):
    expr: Expr = None
    lo: Expr = None
    hi: Expr = None
    negated: bool = False
    has_agg: bool = False


@dataclass
class InList(Pred):
    expr: Expr = None
    items: list[Expr] = field(default_factory=list)
    negated: bool = False
    has_agg: bool = False


@dataclass
class PredGroup(Pred):
    """Parenthesized predicate group, possibly negated."""

    inner: "Pred" = None
    negated: bool = False
    has_agg: bool = False


@dataclass
class Logic(Pred):
    op: str            # and | or | xor
    left: Pred = None
    right: Pred = None
    has_agg: bool = False


# --- query structure ------------------------------------------------------


@dataclass
class Star(Expr):
    """Positional ``*`` marker inside the select list; expanded to every
    column of every file during typecheck, at its position."""

    dtype: int | None = None
    has_agg: bool = False


@dataclass
class Selection:
    expr: Expr
    alias: str | None = None
    distinct: bool = False
    hidden: bool = False


@dataclass
class FileRef:
    path: str          # file path or registered table name
    alias: str | None = None
    noheader: bool = False
    multiline: bool = False   # engine extension: quoted embedded newlines
    key: str = ""      # _f1, _f2, ... assigned in parse order


@dataclass
class Join:
    file: FileRef = None
    join_type: str = "inner"       # inner | left
    size_hint: str | None = None   # sjoin → broadcast, bjoin → merge
    left_expr: Expr = None         # side bound to an earlier file
    right_expr: Expr = None        # side bound to the joined file
    raw_pred: Pred = None          # the single-equality predicate as parsed


@dataclass
class StageArg:
    """One argument of a pipeline stage: the raw token text plus its
    quoted flag. Unquoted words may resolve to result columns; quoted
    tokens are always string literals (the scanner's WORD/quoted
    convention, same as select-list literals)."""

    val: str
    quoted: bool = False


@dataclass
class Stage:
    """One ``|> name(args)`` curation-pipe stage (engine extension, no
    reference analog) — applied to the finished query RESULT, so args
    reference the user-visible output column names."""

    name: str
    args: list[StageArg] = field(default_factory=list)
    kwargs: dict[str, StageArg] = field(default_factory=dict)


@dataclass
class Query:
    options: list[str] = field(default_factory=list)   # c / nh / h
    select_all: bool = False
    selections: list[Selection] = field(default_factory=list)
    base: FileRef = None
    joins: list[Join] = field(default_factory=list)
    where: Pred | None = None
    groupby: list[Expr] = field(default_factory=list)
    having: Pred | None = None
    orderby: Expr | None = None
    order_asc: bool = False        # reference default is DESC
    limit: int | None = None       # top N / limit N share one slot
    # engine extension (no reference analog): deterministic TABLESAMPLE on
    # the base file — 'sample 0.2' keeps a md5-coin fraction of scan rows,
    # 'sample 500' a reservoir of exactly 500 (coin-ranked)
    sample_frac: float | None = None
    sample_n: int | None = None
    # engine extension: '|>'-chained curation stages applied to the result
    pipeline: list[Stage] = field(default_factory=list)

"""Recursive-descent parser for the csvtool dialect.

Grammar follows the reference (/root/reference/parser.go:1-29):

    query      -> options select from where groupby having orderby {limit N}
    options    -> (c | nh | h)*
    select     -> 'select' {'top' N} selections
    selections -> '*' | {'distinct' {'hidden'}} {alias '='} exprAdd {'as' alias} ...
    exprAdd    -> exprMult (('+'|'-') exprMult)*
    exprMult   -> exprNeg (('*'|'/'|'%'|'^') exprNeg)*
    exprNeg    -> {'-'} exprCase
    exprCase   -> 'case' ... 'end' | value
    value      -> column | literal | '(' exprAdd ')' | function
    predicates -> predCompare {logop predicates}
    predCompare-> {'not'} ( '(' predicates ')'
                 | exprAdd {'not'} relop exprAdd
                 | exprAdd {'not'} 'between' exprAdd 'and' exprAdd
                 | exprAdd {'not'} 'in' '(' expressions ')' )
    from       -> 'from' file {'nh'} {{'as'} alias} {'nh'} {'sample' N} join*
    join       -> {'left'|'inner'|'outer'} ('join'|'sjoin'|'bjoin') file
                  {'as'} alias 'on' predicates

Documented divergences from the reference (deliberate):
- Binary arithmetic is LEFT-associative (the reference's grammar is
  right-recursive, evaluating ``a-b-c`` as ``a-(b-c)``; we use standard
  associativity).
- Logical chains keep the reference's right-chaining without and/or
  precedence: ``a and b or c`` groups as ``a and (b or c)``.
"""

from __future__ import annotations

from csvtool_spark.dialect import ast
from csvtool_spark.dialect.errors import ParseError
from csvtool_spark.dialect.scanner import Token, scan

_FUNCTIONS = {
    "inc", "sum", "avg", "min", "max", "count", "stdev", "stdevp", "abs",
    "format", "coalesce", "year", "month", "monthname", "week", "day",
    "dayname", "dayofyear", "dayofmonth", "dayofweek", "hour",
    "encrypt", "decrypt",
}
_AGG_FUNCTIONS = {"sum", "avg", "min", "max", "count", "stdev", "stdevp"}
_RELOPS = {"=", "!=", "<>", "<", "<=", ">", ">="}
_LOGOPS = {"and", "or", "xor"}
_JOIN_WORDS = {"join", "sjoin", "bjoin"}


class _P:
    def __init__(self, toks: list[Token]):
        self.toks = toks
        self.i = 0

    def tok(self) -> Token:
        return self.toks[self.i]

    def peek(self) -> Token:
        return self.toks[min(self.i + 1, len(self.toks) - 1)]

    def next(self) -> Token:
        self.i += 1
        return self.tok()

    def err(self, msg: str) -> ParseError:
        t = self.tok()
        return ParseError(f"{msg}. Found {t.val!r} at position {t.pos}")

    def is_kw(self, *words: str) -> bool:
        t = self.tok()
        return t.kind == "WORD" and not t.quoted and t.lower() in words


def parse(text: str) -> ast.Query:
    p = _P(scan(text))
    q = ast.Query()
    # options prefix
    while p.is_kw("c", "nh", "h"):
        q.options.append(p.tok().lower())
        p.next()
    if not p.is_kw("select"):
        raise p.err("Expected 'select'")
    p.next()
    if p.is_kw("top"):
        p.next()
        q.limit = _parse_int(p, "top")
    _parse_selections(p, q)
    _parse_from(p, q)
    if p.is_kw("where"):
        p.next()
        q.where = _parse_predicates(p)
    if p.is_kw("group"):
        p.next()
        if not p.is_kw("by"):
            raise p.err("Expected 'by' after 'group'")
        p.next()
        q.groupby = _parse_expr_list(p)
    if p.is_kw("having"):
        p.next()
        q.having = _parse_predicates(p)
    if p.is_kw("order"):
        p.next()
        if not p.is_kw("by"):
            raise p.err("Expected 'by' after 'order'")
        p.next()
        q.orderby = _parse_expr_add(p)
        if p.is_kw("asc"):
            q.order_asc = True
            p.next()
    if p.is_kw("limit"):
        p.next()
        q.limit = _parse_int(p, "limit")
    while p.tok().kind == "OP" and p.tok().val == "|>":
        p.next()
        q.pipeline.append(_parse_stage(p))
    if p.tok().kind != "EOF":
        raise p.err("Unexpected token after query")
    return q


def parse_pipeline(text: str) -> list[ast.Stage]:
    """Parse a STANDALONE stage chain — ``"langid(text) |> quality(text,
    min=0.5)"`` (a leading ``|>`` is allowed) — for callers that apply
    the curation pipe to a DataFrame they already hold (the streaming
    surface), without a full query around it."""
    p = _P(scan(text))
    stages: list[ast.Stage] = []
    if p.tok().kind == "OP" and p.tok().val == "|>":
        p.next()
    while p.tok().kind != "EOF":
        stages.append(_parse_stage(p))
        if p.tok().kind == "OP" and p.tok().val == "|>":
            p.next()
            # a trailing "stage |>" must fail like the full-query parser
            # does ("select ... |>" → 'Expected a stage name'), not parse
            if p.tok().kind == "EOF":
                raise p.err("Expected a stage name after '|>'")
        elif p.tok().kind != "EOF":
            raise p.err("Expected '|>' between stages")
    if not stages:
        raise ParseError("Empty stage pipeline")
    return stages


def _parse_stage(p: _P) -> ast.Stage:
    """``|> name(arg, key=arg, ...)`` — curation-pipe stage (engine
    extension). Args are bare tokens, not expressions: unquoted words
    resolve to result columns or scalars at apply time (dialect/stages.py),
    quoted words are string literals."""
    t = p.tok()
    if t.kind != "WORD" or t.quoted:
        raise p.err("Expected a stage name after '|>'")
    stage = ast.Stage(name=t.lower())
    p.next()
    if not (p.tok().kind == "OP" and p.tok().val == "("):
        return stage  # zero-arg stage: '|> name'
    p.next()
    while not (p.tok().kind == "OP" and p.tok().val == ")"):
        t = p.tok()
        if t.kind != "WORD":
            raise p.err("Expected a stage argument")
        p.next()
        if p.tok().kind == "OP" and p.tok().val == "=":
            if t.quoted:
                raise p.err("Stage keyword names cannot be quoted")
            p.next()
            v = p.tok()
            if v.kind != "WORD":
                raise p.err(f"Expected a value after '{t.val}='")
            key = t.lower()
            if key in stage.kwargs:
                raise p.err(f"Duplicate stage keyword '{key}'")
            stage.kwargs[key] = ast.StageArg(v.val, v.quoted)
            p.next()
        else:
            stage.args.append(ast.StageArg(t.val, t.quoted))
        if p.tok().kind == "OP" and p.tok().val == ",":
            p.next()
    p.next()  # consume ')'
    return stage


def _parse_int(p: _P, what: str) -> int:
    t = p.tok()
    if t.kind != "WORD" or not t.val.isdigit():
        raise p.err(f"Expected a number after '{what}'")
    p.next()
    return int(t.val)


# --- selections -----------------------------------------------------------


def _parse_selections(p: _P, q: ast.Query) -> None:
    while True:
        if p.tok().kind == "OP" and p.tok().val == ",":
            p.next()
        if p.is_kw("from"):
            if not q.selections and not q.select_all:
                q.select_all = True
            return
        if p.tok().kind == "OP" and p.tok().val == "*":
            q.selections.append(ast.Selection(expr=ast.Star()))
            p.next()
            continue
        if p.tok().kind == "EOF":
            raise p.err("Expected 'from' clause")
        sel = ast.Selection(expr=None)
        if p.is_kw("distinct"):
            sel.distinct = True
            p.next()
            if p.is_kw("hidden"):
                sel.hidden = True
                p.next()
        # alias = expr
        if (
            p.tok().kind == "WORD"
            and p.peek().kind == "OP"
            and p.peek().val == "="
        ):
            sel.alias = p.tok().val
            p.next()
            p.next()
            sel.expr = _parse_expr_add(p)
        else:
            sel.expr = _parse_expr_add(p)
            if p.is_kw("as"):
                p.next()
                if p.tok().kind != "WORD":
                    raise p.err("Expected alias after 'as'")
                sel.alias = p.tok().val
                p.next()
        q.selections.append(sel)


# --- from / joins ---------------------------------------------------------

_CLAUSE_WORDS = {
    "where", "group", "having", "order", "limit", "on", "as",
    "inner", "outer", "left", "join", "sjoin", "bjoin", "nh", "noheader", "ml",
    "sample",
}


def _file_opts(p: _P, ref: ast.FileRef) -> None:
    while p.is_kw("nh", "noheader", "ml"):
        if p.tok().lower() == "ml":
            ref.multiline = True  # engine extension: multiline quoted fields
        else:
            ref.noheader = True
        p.next()


def _parse_file_ref(p: _P, key: str) -> ast.FileRef:
    t = p.tok()
    if t.kind != "WORD":
        raise p.err("Expected a file path or table name")
    ref = ast.FileRef(path=t.val, key=key)
    p.next()
    _file_opts(p, ref)
    if p.is_kw("as"):
        p.next()
        if p.tok().kind != "WORD":
            raise p.err("Expected alias after 'as'")
        ref.alias = p.tok().val
        p.next()
    elif (
        p.tok().kind == "WORD"
        and p.tok().lower() not in _CLAUSE_WORDS
        and p.tok().kind != "EOF"
    ):
        ref.alias = p.tok().val
        p.next()
    _file_opts(p, ref)
    return ref


def _parse_from(p: _P, q: ast.Query) -> None:
    if not p.is_kw("from"):
        raise p.err("Expected 'from' clause")
    p.next()
    q.base = _parse_file_ref(p, "_f1")
    if p.is_kw("sample"):
        p.next()
        _parse_sample(p, q)
    fnum = 2
    while True:
        join_type = "inner"
        size_hint = None
        saw_kw = False
        while p.is_kw("left", "inner", "outer"):
            if p.tok().lower() in ("left", "outer"):
                join_type = "left"
            saw_kw = True
            p.next()
        if p.tok().kind == "WORD" and not p.tok().quoted and p.tok().lower() in _JOIN_WORDS:
            w = p.tok().lower()
            if w == "sjoin":
                size_hint = "broadcast"
            elif w == "bjoin":
                size_hint = "merge"
            p.next()
        elif saw_kw:
            raise p.err("Expected 'join' after join qualifier")
        else:
            return
        jref = _parse_file_ref(p, f"_f{fnum}")
        fnum += 1
        if not p.is_kw("on"):
            raise p.err("Expected 'on' in join clause")
        p.next()
        pred = _parse_predicates(p)
        q.joins.append(
            ast.Join(file=jref, join_type=join_type, size_hint=size_hint, raw_pred=pred)
        )


def _parse_sample(p: _P, q: ast.Query) -> None:
    """``sample 0.2`` (md5-coin fraction of scan rows, 0 < f < 1) or
    ``sample 500`` (deterministic reservoir of exactly N rows) — engine
    extension on the base file; the reference dialect has no sampling."""
    t = p.tok()
    val = t.val
    if t.kind != "WORD" or t.quoted or not val.replace(".", "", 1).isdigit():
        raise p.err("Expected a number after 'sample'")
    p.next()
    if "." in val:
        f = float(val)
        if not 0.0 < f < 1.0:
            raise ParseError(
                f"sample fraction must be in (0, 1), got {val} at position {t.pos}"
            )
        q.sample_frac = f
    else:
        n = int(val)
        if n < 1:
            raise ParseError(
                f"sample count must be >= 1, got {val} at position {t.pos}"
            )
        q.sample_n = n


# --- expressions ----------------------------------------------------------


def _parse_expr_list(p: _P) -> list[ast.Expr]:
    out = [_parse_expr_add(p)]
    while True:
        if p.tok().kind == "OP" and p.tok().val == ",":
            p.next()
            out.append(_parse_expr_add(p))
            continue
        # space-separated expressions end at clause keywords / EOF / ')'
        # / '|>' (a curation pipe directly after the group-by list —
        # "group by source |> tokens(text)" — found by the round-10
        # join/group-by fuzzer bases)
        if p.tok().kind == "EOF" or p.is_kw(
            "from", "where", "group", "having", "order", "limit", "asc"
        ) or (p.tok().kind == "OP" and p.tok().val in (")", "|>")):
            return out
        out.append(_parse_expr_add(p))


def _parse_expr_add(p: _P) -> ast.Expr:
    left = _parse_expr_mult(p)
    while p.tok().kind == "OP" and p.tok().val in ("+", "-"):
        op = p.tok().val
        p.next()
        right = _parse_expr_mult(p)
        left = ast.BinOp(op=op, left=left, right=right)
    return left


def _parse_expr_mult(p: _P) -> ast.Expr:
    left = _parse_expr_neg(p)
    while p.tok().kind == "OP" and p.tok().val in ("*", "/", "%", "^"):
        # '* from' is select-all, not multiplication (parser.go:329-331)
        if p.tok().val == "*" and p.peek().kind == "WORD" and p.peek().lower() == "from":
            break
        op = p.tok().val
        p.next()
        right = _parse_expr_neg(p)
        left = ast.BinOp(op=op, left=left, right=right)
    return left


def _parse_expr_neg(p: _P) -> ast.Expr:
    if p.tok().kind == "OP" and p.tok().val == "-":
        p.next()
        return ast.Neg(operand=_parse_expr_case(p))
    return _parse_expr_case(p)


def _parse_expr_case(p: _P) -> ast.Expr:
    if p.is_kw("case"):
        return _parse_case(p)
    return _parse_value(p)


def _parse_case(p: _P) -> ast.Expr:
    p.next()  # eat 'case'
    if p.is_kw("when"):
        node = ast.CaseWhenPred()
        while p.is_kw("when"):
            p.next()
            pred = _parse_predicates(p)
            if not p.is_kw("then"):
                raise p.err("Expected 'then' after predicate")
            p.next()
            node.whens.append((pred, _parse_expr_add(p)))
    else:
        node = ast.CaseWhenExpr(base=_parse_expr_add(p))
        if not p.is_kw("when"):
            raise p.err("Expected 'when' in case expression")
        while p.is_kw("when"):
            p.next()
            cmp = _parse_expr_add(p)
            if not p.is_kw("then"):
                raise p.err("Expected 'then' in case expression")
            p.next()
            node.whens.append((cmp, _parse_expr_add(p)))
    if p.is_kw("else"):
        p.next()
        node.else_ = _parse_expr_add(p)
    if not p.is_kw("end"):
        raise p.err("Expected 'end' to close case expression")
    p.next()
    return node


def _parse_value(p: _P) -> ast.Expr:
    t = p.tok()
    if t.kind == "OP" and t.val == "(":
        p.next()
        e = _parse_expr_add(p)
        if not (p.tok().kind == "OP" and p.tok().val == ")"):
            raise p.err("Expected ')'")
        p.next()
        return e
    if t.kind != "WORD":
        raise p.err("Expected a value")
    # function call?
    if (
        not t.quoted
        and t.lower() in _FUNCTIONS
        and p.peek().kind == "OP"
        and p.peek().val == "("
    ):
        return _parse_function(p)
    p.next()
    # alias-qualified / plain column vs literal is resolved in typecheck —
    # the parser records the raw token; Col-vs-Lit needs the file schemas.
    return ast.Lit(raw=t.val, quoted=t.quoted)


def _parse_function(p: _P) -> ast.Expr:
    name = p.tok().lower()
    p.next()  # now at '('
    p.next()  # eat '('
    fn = ast.Func(name=name, has_agg=name in _AGG_FUNCTIONS)
    if p.tok().kind == "OP" and p.tok().val == "*":
        fn.star = True
        p.next()
    elif p.is_kw("distinct"):
        fn.distinct = True
        p.next()
        fn.args.append(_parse_expr_add(p))
    elif not (p.tok().kind == "OP" and p.tok().val == ")"):
        fn.args.append(_parse_expr_add(p))
        while p.tok().kind == "OP" and p.tok().val == ",":
            p.next()
            fn.args.append(_parse_expr_add(p))
    if not (p.tok().kind == "OP" and p.tok().val == ")"):
        raise p.err(f"Expected ')' to close {name}()")
    p.next()
    return fn


# --- predicates -----------------------------------------------------------


def _parse_predicates(p: _P) -> ast.Pred:
    left = _parse_pred_compare(p)
    if p.tok().kind == "WORD" and not p.tok().quoted and p.tok().lower() in _LOGOPS:
        op = p.tok().lower()
        p.next()
        right = _parse_predicates(p)  # right-chained, as in the reference
        return ast.Logic(op=op, left=left, right=right)
    return left


def _parse_pred_compare(p: _P) -> ast.Pred:
    negated = False
    if (p.tok().kind == "OP" and p.tok().val == "!") or p.is_kw("not"):
        negated = True
        p.next()
    if p.tok().kind == "OP" and p.tok().val == "(":
        # Could be a parenthesized predicate group OR a parenthesized
        # expression starting a comparison. Try the group first.
        save = p.i
        p.next()
        try:
            inner = _parse_predicates(p)
            if not (p.tok().kind == "OP" and p.tok().val == ")"):
                raise p.err("Expected ')' to close predicate group")
            p.next()
            return ast.PredGroup(inner=inner, negated=negated)
        except ParseError:
            p.i = save  # fall through: parse as comparison expression
    left = _parse_expr_add(p)
    neg2 = False
    if (p.tok().kind == "OP" and p.tok().val == "!") or p.is_kw("not"):
        neg2 = True
        p.next()
    if p.is_kw("between"):
        p.next()
        lo = _parse_expr_add(p)
        if not p.is_kw("and"):
            raise p.err("Expected 'and' in between predicate")
        p.next()
        hi = _parse_expr_add(p)
        return ast.Between(expr=left, lo=lo, hi=hi, negated=negated ^ neg2)
    if p.is_kw("in"):
        p.next()
        if not (p.tok().kind == "OP" and p.tok().val == "("):
            raise p.err("Expected '(' after 'in'")
        p.next()
        items = [_parse_expr_add(p)]
        while p.tok().kind == "OP" and p.tok().val == ",":
            p.next()
            items.append(_parse_expr_add(p))
        if not (p.tok().kind == "OP" and p.tok().val == ")"):
            raise p.err("Expected ')' to close in-list")
        p.next()
        return ast.InList(expr=left, items=items, negated=negated ^ neg2)
    if p.is_kw("like"):
        p.next()
        t = p.tok()
        if t.kind != "WORD":
            raise p.err("Expected pattern after 'like'")
        p.next()
        return ast.Compare(
            op="like",
            left=left,
            right=ast.Lit(raw=t.val, quoted=t.quoted),
            negated=negated ^ neg2,
        )
    if p.tok().kind == "OP" and p.tok().val in _RELOPS:
        op = p.tok().val
        p.next()
        right = _parse_expr_add(p)
        return ast.Compare(op=op, left=left, right=right, negated=negated ^ neg2)
    raise p.err("Expected a comparison operator")

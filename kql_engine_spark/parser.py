"""KQL recursive-descent parser (SURVEY.md §3.2 stages 1-2).

Hand-rolled (no parser generator in the environment). Grammar follows the
public KQL spec [KQL]; the reference repo has no parser to mirror
(SURVEY.md §0). Operator keywords are contextual: dispatch happens on the
identifier in operator-head position, so `project`, `top`, ... remain legal
column names elsewhere.
"""

from __future__ import annotations

from .ast_nodes import (
    AsOp, Between, BinOp, Col, ConsumeOp, CountOp, DataTable, Distinct,
    Evaluate, Expr, Extend, ExternalData, Facet, FuncCall, GetSchema, InList,
    FindSource, Fork, GraphMatch, GraphStep, Invoke, Join, JoinOn, Lambda,
    LetStmt, Lit, Lookup,
    MakeGraph, MakeSeries, MvApply, ReduceOp, ScanOp, ScanStep,
    MvExpand, NamedExpr, ParseKv, ParseOp, ParseSlot, PartitionOp, Pipe,
    PipeSource, PrintSource, Project, ProjectAway, ProjectKeep, ProjectRename,
    ProjectReorder, Property, Query, RangeSource, Render, SampleDistinct,
    SampleOp, SearchOp, Serialize, Sort, SortKey, Source, Star, Summarize,
    TableRef, Take, TabularOp, Top, TopHitters, TopNested, TopNestedLevel,
    ToScalar,
    TypedLit, UnaryOp, Union, UnionSource, Where,
)
from .errors import KqlSyntaxError, KqlUnsupportedError
from .lexer import EOF, IDENT, INT, OP, QIDENT, REAL, STRING, TIMESPAN, Token, tokenize

# raw-text literal constructors: captured verbatim, decoded by the translator
_TYPED_LITERALS = {
    "datetime": "datetime",
    "date": "datetime",
    "time": "timespan",
    "timespan": "timespan",
    "guid": "guid",
    "uuid": "guid",
    "dynamic": "dynamic",
}

# infix word operators and their binding power (higher binds tighter)
_CMP_WORDS = {
    "contains", "contains_cs", "has", "has_cs", "hasprefix", "hasprefix_cs",
    "hassuffix", "hassuffix_cs", "startswith", "startswith_cs", "endswith",
    "endswith_cs", "matches", "like", "has_any", "has_all",
}
_CMP_OPS = {"==", "!=", "<", "<=", ">", ">=", "=~", "!~", "<>"}

_BP_OR = 10
_BP_AND = 20
_BP_CMP = 30
_BP_ADD = 40
_BP_MUL = 50

_SORT_STOP = {"asc", "desc", "nulls", "by", "on", "step", "from", "to",
              "default", "with", "limit", "kind", "granny-asc", "granny-desc"}


class Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = tokenize(text)
        self.i = 0

    # ------------------------------------------------------------- utilities
    def peek(self, k: int = 0) -> Token:
        j = min(self.i + k, len(self.toks) - 1)
        return self.toks[j]

    def next(self) -> Token:
        t = self.toks[self.i]
        if t.kind != EOF:
            self.i += 1
        return t

    def at(self, kind: str, value: object = None, k: int = 0) -> bool:
        t = self.peek(k)
        if t.kind != kind:
            return False
        if value is None:
            return True
        if kind == IDENT:
            return isinstance(t.value, str) and t.value.lower() == str(value).lower()
        return t.value == value

    def expect(self, kind: str, value: object = None) -> Token:
        if not self.at(kind, value):
            got = self.peek()
            raise KqlSyntaxError(
                f"expected {value or kind}, got {got.kind}({got.value!r})",
                self.text, got.pos,
            )
        return self.next()

    def accept(self, kind: str, value: object = None) -> Token | None:
        if self.at(kind, value):
            return self.next()
        return None

    def error(self, msg: str) -> KqlSyntaxError:
        return KqlSyntaxError(msg, self.text, self.peek().pos)

    # ------------------------------------------------------------ entry point
    def parse_query(self) -> Query:
        lets: list[LetStmt] = []
        sets: dict = {}
        params: list = []
        # preamble: interleaved `set name = value;` query properties,
        # `declare query_parameters(...);` and `let` statements [KQL]
        while (
            self.at(IDENT, "let")
            or (self.at(IDENT, "set") and self.at(IDENT, None, 1))
            or (self.at(IDENT, "declare") and self.at(IDENT, "query_parameters", 1))
        ):
            if self.at(IDENT, "set"):
                self.next()
                name = self.ident_name()
                if self.accept(OP, "="):
                    sets[name] = self.parse_expr()
                else:
                    # valueless form: `set notruncation;` [KQL]
                    sets[name] = Lit(True, "bool")
            elif self.at(IDENT, "declare"):
                self.next()
                self.expect(IDENT, "query_parameters")
                self.expect(OP, "(")
                while not self.at(OP, ")"):
                    pname = self.ident_name()
                    self.expect(OP, ":")
                    ptype = self.ident_name()
                    default = None
                    if self.accept(OP, "="):
                        default = self.parse_expr()
                    params.append((pname, ptype, default))
                    if not self.accept(OP, ","):
                        break
                self.expect(OP, ")")
            else:
                lets.append(self.parse_let())
            self.expect(OP, ";")
        pipe = self.parse_pipe()
        while self.accept(OP, ";"):
            pass
        if not self.at(EOF):
            raise self.error("unexpected trailing input")
        return Query(lets, pipe, sets, params)

    def parse_let(self) -> LetStmt:
        self.expect(IDENT, "let")
        name = self.ident_name()
        self.expect(OP, "=")
        # `let v = view () { body }` [KQL] — parameterless lambda marked as a
        # view; parsed as the lambda (wildcard-union view expansion is a
        # service feature, documented delta)
        if self.at(IDENT, "view") and self.at(OP, "(", 1):
            j = self.find_matching_paren(self.i + 1)
            if j is not None and self.toks[j + 1].kind == OP and self.toks[j + 1].value == "{":
                self.next()
                return LetStmt(name, self.parse_lambda())
        # lambda: (params) { body }
        if self.at(OP, "("):
            j = self.find_matching_paren(self.i)
            if j is not None and self.toks[j + 1].kind == OP and self.toks[j + 1].value == "{":
                return LetStmt(name, self.parse_lambda())
        # `let x = materialize( T | ... )` — single-evaluation cache [KQL]
        if self.at(IDENT, "materialize") and self.at(OP, "(", 1):
            self.next()
            self.expect(OP, "(")
            pipe = self.parse_pipe()
            self.expect(OP, ")")
            pipe.materialize = True
            return LetStmt(name, pipe)
        # tabular: IDENT followed by '|' or ';', or a source keyword
        if self.at(IDENT) or self.at(QIDENT):
            head = str(self.peek().value).lower() if self.at(IDENT) else ""
            nxt = self.peek(1)
            if head in ("datatable", "range", "print", "externaldata", "union") or (
                nxt.kind == OP and nxt.value in ("|", ";")
            ):
                return LetStmt(name, self.parse_pipe())
        if self.at(OP, "(") :
            # parenthesized tabular expression: ( T | ... )
            snap = self.i
            try:
                pipe = self.parse_pipe()
                if self.at(OP, ";"):
                    return LetStmt(name, pipe)
            except KqlSyntaxError:
                pass
            self.i = snap
        return LetStmt(name, self.parse_expr())

    def parse_lambda(self) -> Lambda:
        self.expect(OP, "(")
        params: list[tuple[str, str]] = []
        defaults: dict = {}
        while not self.at(OP, ")"):
            pname = self.ident_name()
            ptype = ""
            if self.accept(OP, ":"):
                if self.at(OP, "("):
                    # tabular parameter type `(*)` / `(c1:T1, ...)` — consume
                    # the balanced parens, record as the opaque tabular marker
                    j = self.find_matching_paren(self.i)
                    if j is None:
                        raise self.error("unbalanced tabular parameter type")
                    self.i = j + 1
                    ptype = "(*)"
                else:
                    ptype = self.ident_name()
            params.append((pname, ptype))
            if self.accept(OP, "="):
                defaults[pname] = self.parse_expr()
            if not self.accept(OP, ","):
                break
        self.expect(OP, ")")
        self.expect(OP, "{")
        body = self.parse_expr()
        if self.at(OP, "|"):
            # tabular lambda: body is a pipe — the expr parsed so far is the
            # source table reference
            if not isinstance(body, Col):
                raise self.error("tabular lambda body must start with a table name")
            pipe = Pipe(TableRef(body.name))
            while self.accept(OP, "|"):
                pipe.ops.append(self.parse_operator())
            body = pipe
        self.accept(OP, ";")
        self.expect(OP, "}")
        return Lambda(params, body, defaults)

    def find_matching_paren(self, start: int) -> int | None:
        """start indexes a '(' token; return index of its matching ')'."""
        depth = 0
        for j in range(start, len(self.toks)):
            t = self.toks[j]
            if t.kind == OP and t.value in ("(", "[", "{"):
                depth += 1
            elif t.kind == OP and t.value in (")", "]", "}"):
                depth -= 1
                if depth == 0:
                    return j
        return None

    def ident_name(self) -> str:
        t = self.peek()
        if t.kind in (IDENT, QIDENT):
            self.next()
            return str(t.value)
        raise self.error(f"expected identifier, got {t.kind}({t.value!r})")

    # ------------------------------------------------------------------ pipes
    def parse_pipe(self) -> Pipe:
        source = self.parse_source()
        ops: list[TabularOp] = []
        while self.accept(OP, "|"):
            ops.append(self.parse_operator())
        return Pipe(source, ops)

    def parse_source(self) -> Source:
        if self.accept(OP, "("):
            pipe = self.parse_pipe()
            self.expect(OP, ")")
            return PipeSource(pipe)
        t = self.peek()
        if t.kind == QIDENT:
            self.next()
            return TableRef(str(t.value))
        if t.kind != IDENT:
            raise self.error("expected table name or source expression")
        head = str(t.value).lower()
        if head == "datatable":
            return self.parse_datatable()
        if head == "print":
            self.next()
            return PrintSource(self.parse_named_expr_list())
        if head == "range" and self.at(IDENT, k=1) and self.at(IDENT, "from", k=2):
            return self.parse_range_source()
        if head == "union":
            self.next()
            kind, withsource, isfuzzy = self.parse_union_opts()
            pipes = self.parse_union_operands()
            return UnionSource(pipes, kind, withsource, isfuzzy)
        if head == "externaldata":
            return self.parse_externaldata()
        if head == "table" and self.at(OP, "(", 1) and self.peek(2).kind == STRING:
            # `table('name')` [KQL]: constant-string table reference
            self.next()
            self.expect(OP, "(")
            name = str(self.next().value)
            self.expect(OP, ")")
            return TableRef(name)
        if head in ("cluster", "database") and self.at(OP, "(", 1):
            # `cluster('c').database('d').T` / `database('d').T` [KQL]:
            # single-database engine — scoping qualifiers parse and resolve
            # to the bare table in the bound catalog (documented delta)
            while self.at(IDENT) and str(self.peek().value).lower() in (
                "cluster", "database"
            ) and self.at(OP, "(", 1):
                self.next()
                self.expect(OP, "(")
                if self.peek().kind == STRING:
                    self.next()
                self.expect(OP, ")")
                self.expect(OP, ".")
            return TableRef(self.ident_name())
        if head == "find":
            return self.parse_find()
        if head == "search":
            from .ast_nodes import SearchSource

            self.next()
            return SearchSource(self.op_search())
        self.next()
        if self.at(OP, "("):  # stored-function call source: f(3) | ...
            self.next()
            fargs: list = []
            while not self.at(OP, ")"):
                fargs.append(self.parse_expr())
                if not self.accept(OP, ","):
                    break
            self.expect(OP, ")")
            return TableRef(str(t.value), fargs)
        return TableRef(str(t.value))

    def parse_find(self) -> "FindSource":
        self.expect(IDENT, "find")
        withsource = None
        if self.at(IDENT, "withsource"):
            self.next()
            self.expect(OP, "=")
            withsource = self.ident_name()
        tables: list[str] = []
        if self.accept(IDENT, "in"):
            self.expect(OP, "(")
            while not self.at(OP, ")"):
                tables.append(self.ident_name())
                if not self.accept(OP, ","):
                    break
            self.expect(OP, ")")
        if self.at(STRING):  # bare-term form: `find [in (...)] "term"`
            term = str(self.next().value)
            project = None
            if self.accept(IDENT, "project"):
                project = self.parse_named_expr_list()
            return FindSource(tables, None, project, withsource, term)
        self.expect(IDENT, "where")
        pred = self.parse_expr()
        project = None
        if self.accept(IDENT, "project"):
            project = self.parse_named_expr_list()
        return FindSource(tables, pred, project, withsource)

    def parse_datatable(self) -> DataTable:
        self.expect(IDENT, "datatable")
        self.expect(OP, "(")
        schema: list[tuple[str, str]] = []
        while not self.at(OP, ")"):
            cname = self.ident_name()
            self.expect(OP, ":")
            ctype = self.ident_name()
            schema.append((cname, ctype))
            if not self.accept(OP, ","):
                break
        self.expect(OP, ")")
        # `['only string cell']` lexes as a quoted identifier — same surface
        # syntax; in datatable position it IS the one-cell row block
        if self.at(QIDENT):
            t = self.next()
            return DataTable(schema, [Lit(t.value, "string")])
        self.expect(OP, "[")
        rows: list[Expr] = []
        while not self.at(OP, "]"):
            rows.append(self.parse_expr())
            if not self.accept(OP, ","):
                break
        self.expect(OP, "]")
        return DataTable(schema, rows)

    def parse_range_source(self) -> RangeSource:
        self.expect(IDENT, "range")
        name = self.ident_name()
        self.expect(IDENT, "from")
        start = self.parse_expr()
        self.expect(IDENT, "to")
        stop = self.parse_expr()
        step = None
        if self.accept(IDENT, "step"):
            step = self.parse_expr()
        return RangeSource(name, start, stop, step)

    def parse_externaldata(self) -> ExternalData:
        self.expect(IDENT, "externaldata")
        self.expect(OP, "(")
        schema: list[tuple[str, str]] = []
        while not self.at(OP, ")"):
            cname = self.ident_name()
            self.expect(OP, ":")
            schema.append((cname, self.ident_name()))
            if not self.accept(OP, ","):
                break
        self.expect(OP, ")")
        uris: list[str] = []
        if self.at(QIDENT):
            # `['single-uri']` lexes as a quoted identifier (same surface
            # syntax) — in externaldata position it IS the one-uri block
            uris.append(str(self.next().value))
        else:
            self.expect(OP, "[")
            while not self.at(OP, "]"):
                uris.append(str(self.expect(STRING).value))
                if not self.accept(OP, ","):
                    break
            self.expect(OP, "]")
        fmt = "csv"
        options: dict = {}
        if self.accept(IDENT, "with"):
            self.expect(OP, "(")
            while not self.at(OP, ")"):
                key = self.ident_name()
                self.expect(OP, "=")
                val = self.next().value
                if key.lower() == "format":
                    fmt = str(val)
                else:
                    options[key] = val
                self.accept(OP, ",")
            self.expect(OP, ")")
        return ExternalData(schema, uris, fmt, options)

    def parse_union_opts(self) -> tuple[str, str | None, bool]:
        kind, withsource, isfuzzy = "outer", None, False
        while True:
            if self.at(IDENT, "kind"):
                self.next()
                self.expect(OP, "=")
                kind = self.ident_name().lower()
            elif self.at(IDENT, "withsource"):
                self.next()
                self.expect(OP, "=")
                withsource = self.ident_name()
            elif self.at(IDENT, "isfuzzy"):
                self.next()
                self.expect(OP, "=")
                isfuzzy = str(self.next().value).lower() == "true"
            else:
                return kind, withsource, isfuzzy

    def parse_union_operands(self) -> list[Pipe]:
        pipes: list[Pipe] = []
        while True:
            if self.accept(OP, "("):
                pipes.append(self.parse_pipe())
                self.expect(OP, ")")
            else:
                name = self.ident_name()
                # `union T*`, `c*mer`, `c*st*r` wildcard table patterns:
                # consume adjacent '*' and IDENT runs (no whitespace), so a
                # mid-name star parses as one pattern instead of leaving a
                # dangling identifier (round-5 ADVICE fix)
                while True:
                    if self.at(OP, "*") and self.toks[self.i].pos == self.toks[self.i - 1].end:
                        self.next()
                        name += "*"
                    elif (
                        name.endswith("*")
                        and self.at(IDENT)
                        and self.toks[self.i].pos == self.toks[self.i - 1].end
                    ):
                        name += self.ident_name()
                    else:
                        break
                pipes.append(Pipe(TableRef(name), []))
            if not self.accept(OP, ","):
                break
        return pipes

    # -------------------------------------------------------------- operators
    def operator_name(self) -> str:
        """Operator head, joining hyphenated names (project-away, mv-expand)."""
        name = self.ident_name().lower()
        while self.at(OP, "-") and self.peek(1).kind == IDENT:
            # only join when '-' is adjacent (no whitespace) on both sides
            dash = self.peek()
            prev_end = self.toks[self.i - 1].end
            nxt = self.peek(1)
            if dash.pos == prev_end and nxt.pos == dash.end:
                self.next()
                name += "-" + self.ident_name().lower()
            else:
                break
        return name

    def parse_operator(self) -> TabularOp:
        t = self.peek()
        if t.kind != IDENT:
            raise self.error("expected operator after '|'")
        name = self.operator_name()
        meth = getattr(self, "op_" + name.replace("-", "_"), None)
        if meth is None:
            raise KqlUnsupportedError(f"unsupported operator: {name!r}")
        return meth()

    # each op_* assumes the operator head has been consumed
    def op_where(self) -> Where:
        return Where(self.parse_expr())

    op_filter = op_where

    def op_project(self) -> Project:
        return Project(self.parse_named_expr_list())

    def op_extend(self) -> Extend:
        return Extend(self.parse_named_expr_list())

    def op_project_away(self) -> ProjectAway:
        return ProjectAway(self.parse_name_list())

    def op_project_keep(self) -> ProjectKeep:
        return ProjectKeep(self.parse_name_list())

    def op_project_reorder(self) -> ProjectReorder:
        return ProjectReorder(self.parse_name_list())

    def op_project_rename(self) -> ProjectRename:
        pairs: list[tuple[str, str]] = []
        while True:
            new = self.ident_name()
            self.expect(OP, "=")
            old = self.ident_name()
            pairs.append((new, old))
            if not self.accept(OP, ","):
                break
        return ProjectRename(pairs)

    def op_distinct(self) -> Distinct:
        if self.accept(OP, "*"):
            return Distinct([], star=True)
        return Distinct(self.parse_name_list())

    def op_sort(self) -> Sort:
        self.expect(IDENT, "by")
        return Sort(self.parse_sort_keys())

    op_order = op_sort

    def parse_sort_keys(self) -> list[SortKey]:
        keys: list[SortKey] = []
        while True:
            expr = self.parse_expr()
            asc = False
            nulls = None
            if self.accept(IDENT, "asc"):
                asc = True
            elif self.accept(IDENT, "desc"):
                asc = False
            if self.accept(IDENT, "nulls"):
                if self.accept(IDENT, "first"):
                    nulls = "first"
                else:
                    self.expect(IDENT, "last")
                    nulls = "last"
            keys.append(SortKey(expr, asc, nulls))
            if not self.accept(OP, ","):
                break
        return keys

    def _count_arg(self):
        """Row-count argument: an INT literal, or any constant expression
        (let-bound scalar / lambda parameter) resolved at translate time."""
        if self.at(INT):
            return int(self.next().value)
        return self.parse_expr()

    def op_take(self) -> Take:
        return Take(self._count_arg())

    op_limit = op_take

    def op_top(self) -> Top:
        n = self._count_arg()
        self.expect(IDENT, "by")
        return Top(n, self.parse_sort_keys())

    def op_top_nested(self) -> TopNested:
        levels = [self.parse_top_nested_level()]
        while self.accept(OP, ","):
            self.expect(IDENT, "top")
            self.expect(OP, "-")
            self.expect(IDENT, "nested")
            levels.append(self.parse_top_nested_level())
        return TopNested(levels)

    def parse_top_nested_level(self) -> TopNestedLevel:
        n = None
        if self.at(INT):
            n = int(self.next().value)
        self.expect(IDENT, "of")
        of_name = None
        of_expr = self.parse_expr()
        if isinstance(of_expr, Col) and self.at(OP, "="):
            self.next()
            of_name = of_expr.name
            of_expr = self.parse_expr()
        others = None
        if self.at(IDENT, "with"):  # `with others = "label"`
            self.next()
            self.expect(IDENT, "others")
            self.expect(OP, "=")
            others = str(self.expect(STRING).value)
        self.expect(IDENT, "by")
        agg_name = None
        agg = self.parse_expr()
        if isinstance(agg, Col) and self.at(OP, "="):
            self.next()
            agg_name = agg.name
            agg = self.parse_expr()
        return TopNestedLevel(n, of_name, of_expr, agg_name, agg, others)

    def op_top_hitters(self) -> TopHitters:
        n = int(self.expect(INT).value)
        self.expect(IDENT, "of")
        of_name = None
        of_expr = self.parse_expr()
        by_expr = by_name = None
        if self.accept(IDENT, "by"):
            by_expr = self.parse_expr()
        return TopHitters(n, of_expr, of_name, by_expr, by_name)

    def op_summarize(self) -> Summarize:
        hints = self.parse_hints()
        aggs: list[NamedExpr] = []
        if not self.at(IDENT, "by"):
            aggs = self.parse_named_expr_list(stop_at_by=True)
        by: list[NamedExpr] = []
        if self.accept(IDENT, "by"):
            by = self.parse_named_expr_list()
        return Summarize(aggs, by, hints)

    def op_count(self) -> CountOp:
        if self.accept(IDENT, "as"):
            return CountOp(self.ident_name())
        return CountOp()

    def parse_hints(self) -> dict:
        hints: dict = {}
        while self.at(IDENT, "hint"):
            self.next()
            self.expect(OP, ".")
            key = self.ident_name()
            self.expect(OP, "=")
            t = self.next()
            hints[key.lower()] = t.value
        return hints

    def op_join(self) -> Join:
        kind = "innerunique"  # KQL default [KQL join]
        hints: dict = {}
        while True:
            if self.at(IDENT, "kind"):
                self.next()
                self.expect(OP, "=")
                kind = self.ident_name().lower()
            elif self.at(IDENT, "hint"):
                hints.update(self.parse_hints())
            else:
                break
        right = self._join_right_side()
        on: list[JoinOn] = []
        if self.accept(IDENT, "on"):
            on = self.parse_join_conditions()
        return Join(kind, right, on, hints)

    def _join_right_side(self) -> Pipe:
        """Join/lookup right side: `( T | ... )` or a bare table /
        stored-function name [KQL join: the right side is any tabular
        source]."""
        if self.accept(OP, "("):
            right = self.parse_pipe()
            self.expect(OP, ")")
            return right
        # bare entity reference: table, let-bound view, or stored-function
        # call f(args)
        name = self.ident_name()
        args = None
        if self.at(OP, "(") and self.toks[self.i].pos == self.toks[self.i - 1].end:
            self.expect(OP, "(")
            args = []
            while not self.at(OP, ")"):
                args.append(self.parse_expr())
                if not self.accept(OP, ","):
                    break
            self.expect(OP, ")")
        return Pipe(TableRef(name, args), [])

    def op_lookup(self) -> Lookup:
        kind = "leftouter"
        if self.at(IDENT, "kind"):
            self.next()
            self.expect(OP, "=")
            kind = self.ident_name().lower()
        right = self._join_right_side()
        self.expect(IDENT, "on")
        return Lookup(right, self.parse_join_conditions(), kind)

    def parse_join_conditions(self) -> list[JoinOn]:
        conds: list[JoinOn] = []
        while True:
            expr = self.parse_expr()
            for leaf in self._split_and(expr):
                if isinstance(leaf, Col) and leaf.side is None:
                    conds.append(
                        JoinOn(Col(leaf.name, "$left"), Col(leaf.name, "$right"))
                    )
                elif isinstance(leaf, BinOp) and leaf.op in (
                    "==", "<", "<=", ">", ">=", "!=",
                ):
                    conds.append(JoinOn(leaf.left, leaf.right, leaf.op))
                else:
                    raise self.error(
                        "join condition must be a column, $left.x == $right.y, "
                        "or a comparison between $left/$right expressions"
                    )
            if not self.accept(OP, ","):
                break
        return conds

    def _split_and(self, expr: Expr) -> list[Expr]:
        if isinstance(expr, BinOp) and expr.op == "and":
            return self._split_and(expr.left) + self._split_and(expr.right)
        return [expr]

    def op_union(self) -> Union:
        kind, withsource, isfuzzy = self.parse_union_opts()
        pipes = self.parse_union_operands()
        return Union(pipes, kind, withsource, isfuzzy=isfuzzy)

    def op_mv_expand(self) -> MvExpand:
        bag_expansion = "bag"
        with_itemindex = None
        while True:
            if self.at(IDENT, "bagexpansion") or self.at(IDENT, "kind"):
                self.next()
                self.expect(OP, "=")
                bag_expansion = self.ident_name().lower()
            elif self.at(IDENT, "with_itemindex"):
                self.next()
                self.expect(OP, "=")
                with_itemindex = self.ident_name()
            else:
                break
        items: list[NamedExpr] = []
        to_type = None
        limit = None
        while True:
            ne = self.parse_named_expr(stop_words={"to", "limit"})
            items.append(ne)
            if self.accept(IDENT, "to"):
                self.expect(IDENT, "typeof")
                self.expect(OP, "(")
                to_type = self.ident_name()
                self.expect(OP, ")")
            if not self.accept(OP, ","):
                break
        if self.accept(IDENT, "limit"):
            limit = int(self.expect(INT).value)
        return MvExpand(items, to_type, limit, with_itemindex, bag_expansion)

    op_mvexpand = op_mv_expand

    def op_mv_apply(self) -> MvApply:
        items: list[NamedExpr] = []
        to_type = None
        with_itemindex = None
        if self.at(IDENT, "with_itemindex"):
            self.next()
            self.expect(OP, "=")
            with_itemindex = self.ident_name()
        while True:
            ne = self.parse_named_expr(stop_words={"to", "on"})
            items.append(ne)
            if self.accept(IDENT, "to"):
                self.expect(IDENT, "typeof")
                self.expect(OP, "(")
                to_type = self.ident_name()
                self.expect(OP, ")")
            if not self.accept(OP, ","):
                break
        self.expect(IDENT, "on")
        self.expect(OP, "(")
        sub: list[TabularOp] = [self.parse_operator()]
        while self.accept(OP, "|"):
            sub.append(self.parse_operator())
        self.expect(OP, ")")
        return MvApply(items, sub, to_type, with_itemindex)

    op_mvapply = op_mv_apply

    def op_parse(self) -> ParseOp:
        return self._parse_parse(where=False)

    def op_parse_where(self) -> ParseOp:
        return self._parse_parse(where=True)

    def _parse_parse(self, where: bool) -> ParseOp:
        kind = "simple"
        flags = ""
        while self.at(IDENT, "kind") or self.at(IDENT, "flags"):
            opt = self.ident_name().lower()
            self.expect(OP, "=")
            if opt == "kind":
                kind = self.ident_name().lower()
            else:
                flags = self.ident_name()
        source = self.parse_expr()
        self.expect(IDENT, "with")
        segments: list[object] = []
        while True:
            t = self.peek()
            if t.kind == STRING:
                self.next()
                segments.append(str(t.value))
            elif t.kind == OP and t.value == "*":
                self.next()
                segments.append(ParseSlot(None, None))
            elif t.kind in (IDENT, QIDENT):
                name = self.ident_name()
                ktype = None
                if self.accept(OP, ":"):
                    ktype = self.ident_name()
                segments.append(ParseSlot(name, ktype))
            else:
                break
        return ParseOp(source, kind, segments, where, flags)

    def op_parse_kv(self) -> ParseKv:
        source = self.parse_expr()
        self.expect(IDENT, "as")
        self.expect(OP, "(")
        slots: list[tuple[str, str]] = []
        while not self.at(OP, ")"):
            nm = self.ident_name()
            self.expect(OP, ":")
            slots.append((nm, self.ident_name()))
            if not self.accept(OP, ","):
                break
        self.expect(OP, ")")
        pair_delim, kv_delim = " ", "="
        if self.accept(IDENT, "with"):
            self.expect(OP, "(")
            while not self.at(OP, ")"):
                key = self.ident_name().lower()
                self.expect(OP, "=")
                val = str(self.next().value)
                if key == "pair_delimiter":
                    pair_delim = val
                elif key == "kv_delimiter":
                    kv_delim = val
                self.accept(OP, ",")
            self.expect(OP, ")")
        return ParseKv(source, slots, pair_delim, kv_delim)

    def op_serialize(self) -> Serialize:
        items: list[NamedExpr] = []
        if self.at(IDENT) and not self.at_pipe_end():
            items = self.parse_named_expr_list()
        return Serialize(items)

    def op_getschema(self) -> GetSchema:
        return GetSchema()

    def op_sample(self) -> SampleOp:
        return SampleOp(self._count_arg())

    def op_sample_distinct(self) -> SampleDistinct:
        n = self._count_arg()
        self.expect(IDENT, "of")
        return SampleDistinct(n, self.ident_name())

    def op_make_series(self) -> MakeSeries:
        aggs: list[NamedExpr] = []
        defaults: list[Expr | None] = []
        while True:
            ne = self.parse_named_expr(stop_words={"default", "on"})
            aggs.append(ne)
            d = None
            if self.accept(IDENT, "default"):
                self.expect(OP, "=")
                d = self.parse_expr()
            defaults.append(d)
            if not self.accept(OP, ","):
                break
        self.expect(IDENT, "on")
        axis = self.parse_expr()
        from_ = to = None
        if self.accept(IDENT, "from"):
            from_ = self.parse_expr()
        if self.accept(IDENT, "to"):
            to = self.parse_expr()
        self.expect(IDENT, "step")
        step = self.parse_expr()
        by: list[NamedExpr] = []
        if self.accept(IDENT, "by"):
            by = self.parse_named_expr_list()
        return MakeSeries(aggs, defaults, axis, from_, to, step, by)

    def op_evaluate(self) -> Evaluate:
        plugin = self.ident_name().lower()
        args: list[Expr] = []
        self.expect(OP, "(")
        while not self.at(OP, ")"):
            if self.at(IDENT, "typeof") and self.at(OP, "(", k=1):
                # typeof(*, name:type, ...) output-schema spec — encoded as a
                # raw string literal ("*,name:type,...") for the plugin
                self.next()
                self.expect(OP, "(")
                parts: list[str] = []
                while not self.at(OP, ")"):
                    if self.accept(OP, "*"):
                        parts.append("*")
                    else:
                        cname = self.ident_name()
                        self.expect(OP, ":")
                        parts.append(f"{cname}:{self.ident_name()}")
                    if not self.accept(OP, ","):
                        break
                self.expect(OP, ")")
                args.append(Lit(",".join(parts), "string"))
            else:
                args.append(self.parse_expr())
            if not self.accept(OP, ","):
                break
        self.expect(OP, ")")
        return Evaluate(plugin, args)

    def op_fork(self) -> Fork:
        branches = []
        i = 0
        while True:
            name = None
            if self.at(IDENT) and self.at(OP, "=", k=1):
                name = self.ident_name()
                self.expect(OP, "=")
            if not self.at(OP, "("):
                break
            self.expect(OP, "(")
            ops = [self.parse_operator()]
            while self.accept(OP, "|"):
                ops.append(self.parse_operator())
            self.expect(OP, ")")
            i += 1
            branches.append((name or f"fork_{i}", ops))
        if not branches:
            raise self.error("fork requires at least one (subquery) branch")
        return Fork(branches)

    def op_reduce(self) -> ReduceOp:
        self.expect(IDENT, "by")
        return ReduceOp(self.parse_expr())

    def op_scan(self) -> ScanOp:
        match_id = None
        if self.at(IDENT, "with_match_id"):
            self.next()
            self.expect(OP, "=")
            match_id = self.ident_name()
        declares: list = []
        if self.accept(IDENT, "declare"):
            self.expect(OP, "(")
            while not self.at(OP, ")"):
                dname = self.ident_name()
                self.expect(OP, ":")
                dtype = self.ident_name()
                default = None
                if self.accept(OP, "="):
                    default = self.parse_expr()
                declares.append((dname, dtype, default))
                if not self.accept(OP, ","):
                    break
            self.expect(OP, ")")
        self.expect(IDENT, "with")
        self.expect(OP, "(")
        steps: list = []
        while self.at(IDENT, "step"):
            self.next()
            sname = self.ident_name()
            output = "all"
            if self.accept(IDENT, "output"):
                self.expect(OP, "=")
                output = self.ident_name().lower()
            self.expect(OP, ":")
            cond = self.parse_expr()
            assigns: list = []
            if self.accept(OP, "=>"):
                while True:
                    aname = self.ident_name()
                    self.expect(OP, "=")
                    assigns.append((aname, self.parse_expr()))
                    if not self.accept(OP, ","):
                        break
            steps.append(ScanStep(sname, cond, assigns, output))
            if not self.accept(OP, ";"):
                break
        self.expect(OP, ")")
        if not steps:
            raise self.error("scan requires at least one step")
        return ScanOp(declares, steps, match_id)

    def op_render(self) -> Render:
        chart = self.ident_name()
        props: dict = {}
        if self.accept(IDENT, "with"):
            self.expect(OP, "(")
            while not self.at(OP, ")"):
                key = self.ident_name()
                self.expect(OP, "=")
                val = self.next().value
                if key.lower() in ("ycolumns", "anomalycolumns"):
                    # multi-name props: names continue until the next
                    # `prop =` or the closing paren [KQL render with()]
                    names = [val]
                    while self.accept(OP, ","):
                        if self.at(OP, ")") or (
                            self.at(IDENT) and self.at(OP, "=", 1)
                        ):
                            break
                        names.append(self.ident_name())
                    props[key] = names
                    continue
                props[key] = val
                self.accept(OP, ",")
            self.expect(OP, ")")
        return Render(chart, props)

    def op_invoke(self) -> Invoke:
        name = self.ident_name()
        args: list[Expr] = []
        self.expect(OP, "(")
        while not self.at(OP, ")"):
            args.append(self.parse_expr())
            if not self.accept(OP, ","):
                break
        self.expect(OP, ")")
        return Invoke(name, args)

    def op_as(self) -> AsOp:
        self.accept(IDENT, "hint")  # ignore hint.materialized
        if self.toks[self.i - 1].value == "hint":
            self.expect(OP, ".")
            self.ident_name()
            self.expect(OP, "=")
            self.next()
        return AsOp(self.ident_name())

    def op_make_graph(self) -> MakeGraph:
        """`make-graph src --> dst [with NodesPipe on id]` [KQL graph]."""
        src = self.ident_name()
        # `-->` lexes as '-' '-' '>'
        self.expect(OP, "-")
        self.expect(OP, "-")
        self.expect(OP, ">")
        dst = self.ident_name()
        nodes = None
        node_id = None
        if self.accept(IDENT, "with"):
            if self.accept(OP, "("):
                nodes = self.parse_pipe()
                self.expect(OP, ")")
            else:
                nodes = Pipe(TableRef(self.ident_name()), [])
            self.expect(IDENT, "on")
            node_id = self.ident_name()
        return MakeGraph(src, dst, nodes, node_id)

    def op_graph_match(self) -> GraphMatch:
        """`graph-match (a)-[e]->(b)... [where pred] project items`."""
        return self._parse_graph_pattern()

    def op_graph_shortest_paths(self):
        """`graph-shortest-paths [output=any|all] (a)-[e*lo..hi]->(b)
        [where pred] [project items]` [KQL graph]."""
        from .ast_nodes import GraphShortestPaths

        output = "any"
        if self.at(IDENT, "output"):
            self.next()
            self.expect(OP, "=")
            output = self.ident_name().lower()
            if output not in ("any", "all"):
                raise self.error("graph-shortest-paths: output must be any|all")
        gm = self._parse_graph_pattern()
        return GraphShortestPaths(gm.start_var, gm.steps, gm.where, gm.project, output)

    def op_graph_mark_components(self):
        """`graph-mark-components [kind=weak] [with_component_id=Col]`
        [KQL graph]."""
        from .ast_nodes import GraphMarkComponents

        kind = "weak"
        comp_col = "ComponentId"
        while True:
            if self.at(IDENT, "kind"):
                self.next()
                self.expect(OP, "=")
                kind = self.ident_name().lower()
            elif self.at(IDENT, "with_component_id"):
                self.next()
                self.expect(OP, "=")
                comp_col = self.ident_name()
            else:
                break
        return GraphMarkComponents(kind, comp_col)

    def op_graph_to_table(self):
        """`graph-to-table nodes|edges` [KQL graph]."""
        from .ast_nodes import GraphToTable

        what = self.ident_name().lower()
        if what not in ("nodes", "edges"):
            raise self.error("graph-to-table expects `nodes` or `edges`")
        return GraphToTable(what)

    def _parse_graph_pattern(self) -> GraphMatch:
        self.expect(OP, "(")
        start = self.ident_name()
        self.expect(OP, ")")
        steps: list[GraphStep] = []
        while self.at(OP, "-") or self.at(OP, "<"):
            def edge_body() -> tuple[str, int, int, bool]:
                self.expect(OP, "[")
                ev = self.ident_name()
                lo = hi = 1
                varlen = False
                if self.accept(OP, "*"):  # bounded variable length e*1..3
                    varlen = True
                    # `1..3` lexes as REAL("1.") REAL(".3") — recover the
                    # integer bounds from the raw source text
                    if self.at(REAL):
                        t1 = self.next()
                        raw1 = self.text[t1.pos:t1.end]
                        t2 = self.expect(REAL)
                        raw2 = self.text[t2.pos:t2.end]
                        if not raw1.endswith(".") or not raw2.startswith("."):
                            raise self.error("expected *lo..hi edge bounds")
                        lo, hi = int(raw1[:-1]), int(raw2[1:])
                    else:  # spaced form: *1 .. 3
                        lo = int(self.expect(INT).value)
                        self.expect(OP, ".")
                        self.expect(OP, ".")
                        hi = int(self.expect(INT).value)
                self.expect(OP, "]")
                return ev, lo, hi, varlen

            if self.accept(OP, "<"):  # <-[e]-(n)
                self.expect(OP, "-")
                evar, lo, hi, vl = edge_body()
                self.expect(OP, "-")
                forward = False
            else:  # -[e]->(n)
                self.expect(OP, "-")
                evar, lo, hi, vl = edge_body()
                self.expect(OP, "-")
                self.expect(OP, ">")
                forward = True
            self.expect(OP, "(")
            nvar = self.ident_name()
            self.expect(OP, ")")
            steps.append(GraphStep(evar, forward, nvar, lo, hi, vl))
        if not steps:
            raise self.error("graph-match pattern needs at least one edge")
        where = None
        if self.accept(IDENT, "where"):
            where = self.parse_expr(stop_words={"project"})
        project = None
        if self.accept(IDENT, "project"):
            project = self.parse_named_expr_list()
        return GraphMatch(start, steps, where, project)

    def op_search(self) -> SearchOp:
        ci = True
        if self.at(IDENT, "kind"):
            self.next()
            self.expect(OP, "=")
            ci = self.ident_name().lower() != "case_sensitive"
        tables: list[str] | None = None
        # `search in (T1, T2, ...) pred` — cross-table form
        if self.at(IDENT, "in") and self.at(OP, "(", 1):
            self.next()
            self.next()
            tables = []
            while not self.at(OP, ")"):
                tables.append(self.ident_name())
                if not self.accept(OP, ","):
                    break
            self.expect(OP, ")")
        return SearchOp(self.parse_search_pred(), ci, tables)

    def parse_search_pred(self):
        """Boolean search predicate: terms / `Col: "t"` / `Col == "v"`
        combined with and/or (and binds tighter), parenthesized freely."""
        left = self.parse_search_and()
        while self.at(IDENT, "or"):
            self.next()
            left = ("or", left, self.parse_search_and())
        return left

    def parse_search_and(self):
        left = self.parse_search_atom()
        while self.at(IDENT, "and"):
            self.next()
            left = ("and", left, self.parse_search_atom())
        return left

    def parse_search_atom(self):
        from .ast_nodes import SearchTerm

        if self.at(OP, "("):
            self.next()
            inner = self.parse_search_pred()
            self.expect(OP, ")")
            return inner
        # `Col: "term"` scoping / `Col == "value"` exact equality
        if (self.at(IDENT) or self.at(QIDENT)) and (
            self.at(OP, ":", 1) or self.at(OP, "==", 1)
        ):
            col = self.ident_name()
            exact = self.at(OP, "==")
            self.next()
            term = self.expect(STRING)
            return SearchTerm(Lit(str(term.value), "string"), col, exact)
        if self.at(STRING):
            t = self.next()
            return SearchTerm(Lit(str(t.value), "string"))
        raise self.error(
            "search predicate: expected a quoted term, Col: \"term\", "
            "Col == \"value\", or a parenthesized combination"
        )

    def op_partition(self) -> PartitionOp:
        while self.at(IDENT, "hint"):
            self.parse_hints()
        self.expect(IDENT, "by")
        key = self.ident_name()
        self.expect(OP, "(")
        sub: list[TabularOp] = [self.parse_operator()]
        while self.accept(OP, "|"):
            sub.append(self.parse_operator())
        self.expect(OP, ")")
        return PartitionOp(key, sub)

    def op_facet(self) -> Facet:
        self.expect(IDENT, "by")
        cols = self.parse_name_list()
        sub = None
        if self.at(IDENT, "with"):  # `facet by c with ( subquery )`
            self.next()
            self.expect(OP, "(")
            sub = [self.parse_operator()]
            while self.accept(OP, "|"):
                sub.append(self.parse_operator())
            self.expect(OP, ")")
        return Facet(cols, sub)

    def op_consume(self) -> ConsumeOp:
        return ConsumeOp()

    # --------------------------------------------------------- shared helpers
    def at_pipe_end(self) -> bool:
        return self.at(EOF) or self.at(OP, "|") or self.at(OP, ")") or self.at(OP, ";")

    def parse_name_list(self) -> list[str]:
        names = [self.ident_name()]
        # allow wildcard suffix/prefix: col* , *suffix
        while self.at(OP, "*") and self.toks[self.i].pos == self.toks[self.i - 1].end:
            self.next()
            names[-1] += "*"
        while self.accept(OP, ","):
            if self.at(OP, "*"):
                self.next()
                nm = "*"
                if self.at(IDENT) and self.toks[self.i].pos == self.toks[self.i - 1].end:
                    nm += self.ident_name()
                names.append(nm)
            else:
                names.append(self.ident_name())
                while self.at(OP, "*") and self.toks[self.i].pos == self.toks[self.i - 1].end:
                    self.next()
                    names[-1] += "*"
        return names

    def parse_named_expr(self, stop_words: set[str] | None = None) -> NamedExpr:
        # (a, b, ...) = f(...)  — multi-valued assignment [KQL]: lookahead for
        # an ident/comma tuple closed by `) =` so plain parenthesized
        # expressions are untouched
        if self.at(OP, "("):
            k = 1
            ok = self.peek(k).kind in (IDENT, QIDENT)
            while ok:
                k += 1
                if self.at(OP, ",", k):
                    k += 1
                    ok = self.peek(k).kind in (IDENT, QIDENT)
                    continue
                break
            if (
                ok
                and self.at(OP, ")", k)
                and self.at(OP, "=", k + 1)
                and not self.at(OP, "==", k + 1)
            ):
                self.expect(OP, "(")
                names = [self.ident_name()]
                while self.accept(OP, ","):
                    names.append(self.ident_name())
                self.expect(OP, ")")
                self.expect(OP, "=")
                return NamedExpr(
                    None, self.parse_expr(stop_words=stop_words), names=names
                )
        # name = expr  (name may be quoted ident)
        if (
            self.peek().kind in (IDENT, QIDENT)
            and self.at(OP, "=", 1)
            and not self.at(OP, "==", 1)
        ):
            name = self.ident_name()
            self.expect(OP, "=")
            return NamedExpr(name, self.parse_expr(stop_words=stop_words))
        return NamedExpr(None, self.parse_expr(stop_words=stop_words))

    def parse_named_expr_list(self, stop_at_by: bool = False) -> list[NamedExpr]:
        stop = {"by"} if stop_at_by else None
        items = [self.parse_named_expr(stop_words=stop)]
        while True:
            if stop_at_by and self.at(IDENT, "by"):
                break
            if not self.accept(OP, ","):
                break
            items.append(self.parse_named_expr(stop_words=stop))
        return items

    # ------------------------------------------------------------ expressions
    def parse_expr(self, rbp: int = 0, stop_words: set[str] | None = None) -> Expr:
        left = self.parse_unary(stop_words)
        while True:
            op, lbp = self.peek_infix(stop_words)
            if op is None or lbp <= rbp:
                return left
            left = self.parse_infix(left, op, lbp, stop_words)

    def peek_infix(self, stop_words: set[str] | None) -> tuple[str | None, int]:
        t = self.peek()
        if t.kind == OP:
            v = str(t.value)
            if v in _CMP_OPS:
                return v, _BP_CMP
            if v in ("+", "-"):
                return v, _BP_ADD
            if v in ("*", "/", "%"):
                return v, _BP_MUL
            if v.startswith("!") and v != "!":  # !contains !has !in ...
                return v, _BP_CMP
            return None, 0
        if t.kind == IDENT:
            w = str(t.value).lower()
            if stop_words and w in stop_words:
                return None, 0
            if w == "and":
                return "and", _BP_AND
            if w == "or":
                return "or", _BP_OR
            if w in _CMP_WORDS:
                return w, _BP_CMP
            if w in ("in", "between"):
                return w, _BP_CMP
        return None, 0

    def parse_infix(self, left: Expr, op: str, lbp: int, stop_words) -> Expr:
        self.next()  # consume op token
        if op in ("in", "!in"):
            ci = bool(self.accept(OP, "~"))
            return self.parse_in(left, negated=op.startswith("!"), ci=ci)
        if op in ("in~", "!in~"):
            return self.parse_in(left, negated=op.startswith("!"), ci=True)
        if op in ("between", "!between"):
            self.expect(OP, "(")
            lo = self.parse_expr(_BP_CMP)
            self.expect(OP, "..")
            hi = self.parse_expr(_BP_CMP)
            self.expect(OP, ")")
            return Between(left, lo, hi, negated=op.startswith("!"))
        if op in ("matches", "!matches"):
            self.accept(IDENT, "regex")
            right = self.parse_expr(lbp, stop_words)
            node: Expr = BinOp("matches", left, right)
            if op.startswith("!"):
                node = UnaryOp("not", node)
            return node
        if op in ("has_any", "has_all", "!has_any", "!has_all"):
            self.expect(OP, "(")
            items = [self.parse_expr()]
            while self.accept(OP, ","):
                items.append(self.parse_expr())
            self.expect(OP, ")")
            node = FuncCall(op.lstrip("!"), [left] + items)
            if op.startswith("!"):
                node = UnaryOp("not", node)
            return node
        right = self.parse_expr(lbp, stop_words)
        return BinOp(op, left, right)

    def parse_in(self, left: Expr, negated: bool, ci: bool) -> InList:
        self.expect(OP, "(")
        # `x in (T | op | ...)` [KQL tabular in]: a top-level `|` before the
        # matching `)` marks a tabular operand (KQL has no scalar `|`
        # operator). A bare table name with no pipe stays a column ref —
        # write `in (T | project c)` for the tabular form.
        depth = 0
        k = self.i
        is_tabular = False
        while k < len(self.toks):
            t = self.toks[k]
            if t.kind == OP and t.value in ("(", "[", "{"):
                depth += 1
            elif t.kind == OP and t.value in (")", "]", "}"):
                if depth == 0 and t.value == ")":
                    break
                depth -= 1
            elif t.kind == OP and t.value == "|" and depth == 0:
                is_tabular = True
                break
            k += 1
        if is_tabular:
            pipe = self.parse_pipe()
            self.expect(OP, ")")
            return InList(left, [], negated, ci, table=pipe)
        items = [self.parse_expr()]
        while self.accept(OP, ","):
            items.append(self.parse_expr())
        self.expect(OP, ")")
        return InList(left, items, negated, ci)

    def parse_unary(self, stop_words=None) -> Expr:
        if self.accept(OP, "-"):
            return UnaryOp("-", self.parse_unary(stop_words))
        if self.accept(OP, "+"):
            return self.parse_unary(stop_words)
        if self.at(IDENT, "not") and self.at(OP, "(", 1):
            self.next()
            self.expect(OP, "(")
            inner = self.parse_expr()
            self.expect(OP, ")")
            return UnaryOp("not", inner)
        return self.parse_postfix(self.parse_primary())

    def parse_postfix(self, base: Expr) -> Expr:
        while True:
            if self.at(OP, "."):
                # only treat as member access when followed by an identifier
                if self.peek(1).kind in (IDENT, QIDENT):
                    self.next()
                    base = Property(base, Lit(self.ident_name(), "string"))
                else:
                    return base
            elif self.at(OP, "[") and self.toks[self.i].pos == self.toks[self.i - 1].end:
                self.next()
                idx = self.parse_expr()
                self.expect(OP, "]")
                base = Property(base, idx)
            elif (
                self.at(QIDENT)
                and self.toks[self.i].pos == self.toks[self.i - 1].end
            ):
                # the lexer folds `['key']` into one QIDENT token; adjacent to
                # an expression it is dynamic string-key access d['key'], not
                # a bracket-quoted column name
                base = Property(base, Lit(str(self.next().value), "string"))
            else:
                return base

    def parse_primary(self) -> Expr:
        t = self.peek()
        if t.kind == INT:
            self.next()
            return Lit(int(t.value), "long")
        if t.kind == REAL:
            self.next()
            return Lit(float(t.value), "real")
        if t.kind == STRING:
            self.next()
            return Lit(str(t.value), "string")
        if t.kind == TIMESPAN:
            self.next()
            return Lit(float(t.value), "timespan")
        if t.kind == OP and t.value == "(":
            self.next()
            e = self.parse_expr()
            self.expect(OP, ")")
            return e
        if t.kind == OP and t.value == "*":
            self.next()
            return Star()
        if t.kind == OP and t.value == "$":
            self.next()
            name = self.ident_name()
            if name.lower() in ("left", "right"):
                side = "$" + name.lower()
                self.expect(OP, ".")
                return Col(self.ident_name(), side)
            # `$table` — provenance column emitted by cross-table search
            return Col("$" + name)
        if t.kind == QIDENT:
            self.next()
            return Col(str(t.value))
        if t.kind == IDENT:
            word = str(t.value)
            lw = word.lower()
            if lw == "true":
                self.next()
                return Lit(True, "bool")
            if lw == "false":
                self.next()
                return Lit(False, "bool")
            if self.at(OP, "(", 1):
                if lw in _TYPED_LITERALS:
                    return self.parse_typed_literal(_TYPED_LITERALS[lw])
                if lw == "toscalar":
                    # toscalar( <tabular expression> ) — the argument is a
                    # PIPE, not a scalar expr; wrap it for the translator
                    self.next()
                    self.expect(OP, "(")
                    pipe = self.parse_pipe()
                    self.expect(OP, ")")
                    return ToScalar(pipe)
                self.next()  # func name
                self.expect(OP, "(")
                args: list[Expr] = []
                while not self.at(OP, ")"):
                    args.append(self.parse_expr())
                    if not self.accept(OP, ","):
                        break
                self.expect(OP, ")")
                return FuncCall(lw, args)
            self.next()
            return Col(word)
        raise self.error(f"unexpected token {t.kind}({t.value!r}) in expression")

    def parse_typed_literal(self, ktype: str) -> Expr:
        """datetime(...) / dynamic(...) / guid(...) / time(...): capture the raw
        text between the parens verbatim (KQL literal bodies are not regular
        token streams, e.g. datetime(2024-01-01 12:00:00))."""
        self.next()  # constructor name
        open_tok = self.expect(OP, "(")
        close_idx = self.find_matching_paren(self.i - 1)
        if close_idx is None:
            raise self.error("unbalanced parenthesis in typed literal")
        close_tok = self.toks[close_idx]
        raw = self.text[open_tok.end : close_tok.pos].strip()
        self.i = close_idx + 1
        # time(1d) / timespan(1.5h) with a lexable timespan body -> plain lit
        if ktype == "timespan":
            try:
                toks = tokenize(raw)
                if len(toks) == 2 and toks[0].kind == TIMESPAN:
                    return Lit(float(toks[0].value), "timespan")
                if len(toks) == 2 and toks[0].kind in (INT, REAL):
                    return Lit(float(toks[0].value) * 86400.0, "timespan")  # bare n = days
            except KqlSyntaxError:
                pass
        return TypedLit(ktype, raw)


def parse(text: str) -> Query:
    return Parser(text).parse_query()

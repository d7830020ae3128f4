"""Typed AST for KQL queries (SURVEY.md §3.2 stage 2).

Plain dataclasses; the parser builds these, the translator lowers them to
PySpark DataFrame operations. No Spark imports here — the AST layer is
engine-agnostic by design so it can also drive the streaming entry point.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

# ---------------------------------------------------------------- expressions


@dataclass
class Expr:
    pass


@dataclass
class Lit(Expr):
    value: object  # python value
    ktype: str  # long real string bool datetime timespan dynamic null guid


@dataclass
class Col(Expr):
    name: str
    side: Optional[str] = None  # '$left' / '$right' in join conditions


@dataclass
class Star(Expr):
    pass


@dataclass
class BinOp(Expr):
    op: str  # + - * / % == != < <= > >= and or =~ !~ contains has ...
    left: Expr
    right: Expr


@dataclass
class UnaryOp(Expr):
    op: str  # '-' 'not'
    operand: Expr


@dataclass
class FuncCall(Expr):
    name: str
    args: list[Expr] = field(default_factory=list)


@dataclass
class InList(Expr):
    expr: Expr
    items: list[Expr]
    negated: bool = False
    ci: bool = False  # in~ / !in~
    # `x in (T | project c)` [KQL]: tabular operand, first column is the
    # value set; mutually exclusive with items
    table: Optional[object] = None  # Pipe


@dataclass
class Between(Expr):
    expr: Expr
    lo: Expr
    hi: Expr
    negated: bool = False


@dataclass
class Property(Expr):
    """Dynamic access: d.a.b or d["k"] or a[0]."""

    base: Expr
    key: Expr  # Lit(string) for member, any expr for index


@dataclass
class TypedLit(Expr):
    """Raw-text literal: datetime(2024-01-01), dynamic([1,2]), guid(...)."""

    ktype: str
    raw: str


# ----------------------------------------------------------- tabular operators


@dataclass
class TabularOp:
    pass


@dataclass
class NamedExpr:
    name: Optional[str]  # None -> auto-name
    expr: Expr
    # multi-valued assignment `(a, b, ...) = f(...)` [KQL]: the target names,
    # bound positionally to the function's declared output fields
    names: Optional[list] = None


@dataclass
class Where(TabularOp):
    pred: Expr


@dataclass
class Project(TabularOp):
    items: list[NamedExpr]


@dataclass
class Extend(TabularOp):
    items: list[NamedExpr]


@dataclass
class ProjectAway(TabularOp):
    patterns: list[str]  # may contain * wildcards


@dataclass
class ProjectKeep(TabularOp):
    patterns: list[str]


@dataclass
class ProjectRename(TabularOp):
    pairs: list[tuple[str, str]]  # (new, old)


@dataclass
class ProjectReorder(TabularOp):
    patterns: list[str]


@dataclass
class Distinct(TabularOp):
    cols: list[str]  # empty -> ['*']
    star: bool = False


@dataclass
class SortKey:
    expr: Expr
    asc: bool = False  # KQL default is desc
    nulls: Optional[str] = None  # 'first' | 'last' | None (KQL default)


@dataclass
class Sort(TabularOp):
    keys: list[SortKey]


@dataclass
class Take(TabularOp):
    n: "int | Expr"  # Expr = constant resolved at translate time


@dataclass
class Top(TabularOp):
    n: int
    keys: list[SortKey]


@dataclass
class TopNestedLevel:
    n: Optional[int]
    of_name: Optional[str]
    of_expr: Expr
    agg_name: Optional[str]
    agg: Expr
    with_others: Optional[str] = None  # label


@dataclass
class TopNested(TabularOp):
    levels: list[TopNestedLevel]


@dataclass
class TopHitters(TabularOp):
    n: int
    of_expr: Expr
    of_name: Optional[str]
    by_expr: Optional[Expr] = None
    by_name: Optional[str] = None


@dataclass
class Summarize(TabularOp):
    aggs: list[NamedExpr]
    by: list[NamedExpr] = field(default_factory=list)
    hints: dict = field(default_factory=dict)


@dataclass
class CountOp(TabularOp):
    as_name: str = "Count"


@dataclass
class JoinOn:
    left: Expr
    right: Expr
    op: str = "=="  # ==, <, <=, >, >=, != — non-== forms are theta conditions


@dataclass
class Join(TabularOp):
    kind: str  # inner innerunique leftouter ... cross
    right: "Pipe"
    on: list[JoinOn] = field(default_factory=list)
    hints: dict = field(default_factory=dict)


@dataclass
class Lookup(TabularOp):
    right: "Pipe"
    on: list[JoinOn] = field(default_factory=list)
    kind: str = "leftouter"


@dataclass
class Union(TabularOp):
    tables: list["Pipe"]
    kind: str = "outer"
    withsource: Optional[str] = None
    is_source: bool = False  # `union T1, T2 | ...` as leading source
    isfuzzy: bool = False  # tolerate unresolvable operands [KQL isfuzzy=true]


@dataclass
class MvExpand(TabularOp):
    items: list[NamedExpr]  # columns to expand (zipped if multiple)
    to_type: Optional[str] = None
    limit: Optional[int] = None
    with_itemindex: Optional[str] = None
    bag_expansion: str = "bag"  # Kusto default [KQL]; 'array' -> [k, v] pairs


@dataclass
class MvApply(TabularOp):
    items: list[NamedExpr]
    subquery: list[TabularOp]
    to_type: Optional[str] = None
    with_itemindex: Optional[str] = None


@dataclass
class ParseSlot:
    name: Optional[str]  # None = wildcard skip '*'
    ktype: Optional[str]


@dataclass
class ParseOp(TabularOp):
    source: Expr
    kind: str  # simple | regex | relaxed
    segments: list[object]  # alternating str literals and ParseSlot
    where: bool = False  # parse-where drops non-matching rows
    flags: str = ""  # kind=regex flags= (i, m, s supported; U unsupported)


@dataclass
class ParseKv(TabularOp):
    source: Expr
    slots: list[tuple[str, str]]  # (name, ktype)
    pair_delim: str = " "
    kv_delim: str = "="


@dataclass
class Serialize(TabularOp):
    items: list[NamedExpr] = field(default_factory=list)


@dataclass
class GetSchema(TabularOp):
    pass


@dataclass
class SampleOp(TabularOp):
    n: int


@dataclass
class SampleDistinct(TabularOp):
    n: int
    col: str


@dataclass
class MakeSeries(TabularOp):
    aggs: list[NamedExpr]  # each with optional default via MakeSeriesAgg
    defaults: list[Optional[Expr]]
    axis: Expr
    from_: Optional[Expr]
    to: Optional[Expr]
    step: Expr
    by: list[NamedExpr] = field(default_factory=list)


@dataclass
class Evaluate(TabularOp):
    plugin: str
    args: list[Expr] = field(default_factory=list)


@dataclass
class Render(TabularOp):
    chart: str
    props: dict = field(default_factory=dict)


@dataclass
class Invoke(TabularOp):
    name: str
    args: list[Expr] = field(default_factory=list)


@dataclass
class AsOp(TabularOp):
    name: str


@dataclass
class SearchTerm:
    """Leaf of a search predicate: one term, optionally column-scoped.

    `exact` marks `Col == "value"` (case-sensitive equality) as opposed to
    the default whole-token term match.
    """

    term: "Expr"
    col: str | None = None  # `search Col: "term"` scoping
    exact: bool = False


@dataclass
class SearchOp(TabularOp):
    # pred is a SearchTerm or an ("and"|"or", left, right) tuple tree
    pred: object
    ci: bool = True
    tables: Optional[list[str]] = None  # `search in (T1, T2, ...) ...`


@dataclass
class PartitionOp(TabularOp):
    key: str
    subquery: list[TabularOp]


@dataclass
class MakeGraph(TabularOp):
    """`E | make-graph src --> dst [with NodesPipe on id]` [KQL graph]."""

    src: str
    dst: str
    nodes: Optional["Pipe"] = None
    node_id: Optional[str] = None


@dataclass
class GraphStep:
    edge_var: str
    forward: bool  # -[e]-> vs <-[e]-
    node_var: str  # the node the edge leads to
    min_len: int = 1  # -[e*1..3]-> bounded variable-length
    max_len: int = 1
    # True when the `*` syntax appeared: `-[e*1..1]->` still binds e as an
    # ARRAY of one edge, unlike plain `-[e]->` which binds the edge struct
    varlen: bool = False


@dataclass
class GraphMatch(TabularOp):
    """`| graph-match (a)-[e]->(b)... [where pred] project items` — fixed-
    length patterns only (no *1..n variable-length edges in v1)."""

    start_var: str
    steps: list[GraphStep]
    where: Optional[Expr] = None
    project: Optional[list[NamedExpr]] = None


@dataclass
class GraphShortestPaths(TabularOp):
    """`| graph-shortest-paths [output=any|all] (a)-[e*lo..hi]->(b) [where]
    [project]` — shortest path(s) per (source, target) pair among paths
    matching the pattern and predicate."""

    start_var: str
    steps: list[GraphStep]
    where: Optional[Expr] = None
    project: Optional[list[NamedExpr]] = None
    output: str = "any"  # any = one shortest path per pair; all = every one


@dataclass
class GraphToTable(TabularOp):
    """`| graph-to-table nodes|edges` — export the graph context back to a
    tabular form."""

    what: str  # "nodes" | "edges"


@dataclass
class GraphMarkComponents(TabularOp):
    """`| graph-mark-components [kind=weak] [with_component_id=Col]` — label
    each node with its (weakly) connected component."""

    kind: str = "weak"
    comp_col: str = "ComponentId"


@dataclass
class Facet(TabularOp):
    cols: list[str]
    subquery: Optional[list[TabularOp]] = None  # `with ( subquery )`


@dataclass
class ConsumeOp(TabularOp):
    pass


# ------------------------------------------------------------------- sources


@dataclass
class Source:
    pass


@dataclass
class TableRef(Source):
    name: str
    # stored-function source call `f(arg1, ...)`: scalar args bound to the
    # lambda's parameters at translate time (None = plain table reference)
    args: Optional[list["Expr"]] = None


@dataclass
class DataTable(Source):
    schema: list[tuple[str, str]]  # (name, ktype)
    rows: list[Expr]  # flat value list


@dataclass
class PrintSource(Source):
    items: list[NamedExpr]


@dataclass
class RangeSource(Source):
    name: str
    start: Expr
    stop: Expr
    step: Optional[Expr] = None


@dataclass
class UnionSource(Source):
    pipes: list["Pipe"]
    kind: str = "outer"
    withsource: Optional[str] = None
    isfuzzy: bool = False


@dataclass
class ExternalData(Source):
    schema: list[tuple[str, str]]
    uris: list[str]
    fmt: str = "csv"
    # remaining with(...) options, e.g. ignoreFirstRecord [KQL]
    options: dict = field(default_factory=dict)


@dataclass
class PipeSource(Source):
    """Parenthesized sub-pipeline used as a source."""

    pipe: "Pipe"


# --------------------------------------------------------------------- query


@dataclass
class Pipe:
    source: Source
    ops: list[TabularOp] = field(default_factory=list)
    materialize: bool = False  # `let x = materialize(...)` single-eval cache


@dataclass
class LetStmt:
    name: str
    value: object  # Expr | Pipe | Lambda


@dataclass
class Lambda:
    params: list[tuple[str, str]]  # (name, ktype) — ktype may be ''
    body: Expr
    defaults: dict = field(default_factory=dict)  # name -> default Expr


@dataclass
class Query:
    lets: list[LetStmt]
    pipe: Pipe
    # `set name = value;` query-property statements [KQL] (e.g.
    # query_bin_auto_size); value is the raw Expr, interpreted by consumers
    sets: dict = field(default_factory=dict)
    # `declare query_parameters(name: type [= default], ...);` [KQL] —
    # (name, ktype, default Expr | None); bound from the kql(options=
    # {'query_parameters': {...}}) dict at translate time
    params: list = field(default_factory=list)


@dataclass
class FindSource(Source):
    """`find [withsource=Col] in (T1, ...) where pred [project ...]` or the
    bare-term form `find [in (...)] "term"` — query-initial multi-table
    search [KQL §2.13]. `pred` is None in the term form (`term` holds the
    literal, matched with `search` term semantics across all string
    columns)."""
    tables: list[str]
    pred: "Expr | None"
    project: list["NamedExpr"] | None = None
    withsource: str | None = None
    term: str | None = None


@dataclass
class SearchSource(Source):
    """Query-initial `search [in (T1, ...)] pred` — cross-table term search
    [KQL §2.13]. Without an `in` list, every catalog table is searched."""
    op: "SearchOp"


@dataclass
class Fork(TabularOp):
    """`T | fork name1=(ops) name2=(ops)` — apply sub-pipelines to the same
    input. v1 materializes as union-by-name with a `fork_result` provenance
    column (documented deviation from Kusto's multi-table protocol)."""
    branches: list  # list[tuple[str, list[TabularOp]]]


@dataclass
class ReduceOp(TabularOp):
    """`T | reduce by expr` — string pattern clustering [KQL §2.13]."""
    expr: "Expr"


@dataclass
class ScanStep:
    name: str
    cond: "Expr"
    assigns: list  # list[tuple[str, Expr]]
    output: str = "all"  # all | last | none


@dataclass
class ScanOp(TabularOp):
    """`scan [with_match_id=m] [declare (...)] with (step ...)` [KQL §2.11]."""
    declares: list  # list[tuple[name, ktype, Expr|None]]
    steps: list
    match_id: Optional[str] = None


@dataclass
class ToScalar(Expr):
    """toscalar( tabular-expr ) [KQL §2.14] — first column of the first row
    of the inner result, usable as a scalar constant. Documented-eager."""
    pipe: "Pipe"

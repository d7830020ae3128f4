"""`scan` operator runtime (SURVEY.md §2.11/§2.13): row-sequence state
machine over a serialized table.

Simplified, DOCUMENTED matching model (Kusto's full algorithm tracks
multiple concurrent sequences): one active match at a time —
1. if the row satisfies the NEXT step's condition, the match advances;
2. else if it satisfies the CURRENT step's condition, the step repeats;
3. else if it satisfies step 1, a new match restarts;
4. else the row is not part of any match (not emitted).
A match that reaches the last step completes and resets. `with_match_id`
numbers completed-or-in-progress matches.

Execution is inherently sequential (KQL defines scan over the serialized
order), so the plan is coalesce(1) + mapInPandas with cross-batch state in
the generator closure. Scale note: a global scan is a single-walker
operation by SPEC, not an implementation shortcut — shard scans with
`partition by` semantics upstream when per-key scans are what's meant.

Step conditions/assignments are evaluated by a restricted Python-side
interpreter (arithmetic, comparisons, boolean ops, step references
`s1.col`, declared state, and a small function whitelist) — scan state
cannot be columnar, so this is the honest slow path; everything else in the
engine stays JVM-side.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .ast_nodes import (
    Between, BinOp, Col, Expr, FuncCall, InList, Lit, Property, ScanOp,
    TypedLit, UnaryOp,
)
from .errors import KqlSemanticError, KqlUnsupportedError
from .semantics import KQL_TO_SPARK, parse_kql_datetime

# Env = (row, steps_vals, state)
Compiled = Callable[[dict, dict, dict], object]


def _cmp(op: str):
    import operator

    base = {
        "==": operator.eq, "!=": operator.ne, "<": operator.lt,
        "<=": operator.le, ">": operator.gt, ">=": operator.ge,
    }[op]

    def run(a, b):
        if a is None or b is None:
            return None
        return base(a, b)

    return run


_ARITH = {
    "+": lambda a, b: None if a is None or b is None else a + b,
    "-": lambda a, b: None if a is None or b is None else a - b,
    "*": lambda a, b: None if a is None or b is None else a * b,
    "/": lambda a, b: None if a is None or b is None or b == 0 else (
        a / b if not isinstance(a, int) or not isinstance(b, int) else a / b
    ),
    "%": lambda a, b: None if a is None or b is None or b == 0 else a % b,
}

_FUNCS: dict[str, Callable] = {
    "iff": lambda p, a, b: a if p is True else b,
    "iif": lambda p, a, b: a if p is True else b,
    "isnull": lambda v: v is None,
    "isnotnull": lambda v: v is not None,
    "isempty": lambda v: v is None or v == "",
    "isnotempty": lambda v: v is not None and v != "",
    "coalesce": lambda *vs: next((v for v in vs if v is not None), None),
    "strcat": lambda *vs: "".join("" if v is None else str(v) for v in vs),
    "tostring": lambda v: "" if v is None else str(v),
    "tolong": lambda v: None if v is None else int(v),
    "todouble": lambda v: None if v is None else float(v),
    "toreal": lambda v: None if v is None else float(v),
    "abs": lambda v: None if v is None else abs(v),
    "min_of": lambda *vs: min((v for v in vs if v is not None), default=None),
    "max_of": lambda *vs: max((v for v in vs if v is not None), default=None),
    "not": lambda v: None if v is None else not v,
}


def compile_expr(e: Expr, step_names: set[str]) -> Compiled:
    if isinstance(e, Lit):
        if e.ktype == "timespan":
            td = _dt.timedelta(seconds=float(e.value))
            return lambda r, s, st: td
        v = e.value
        return lambda r, s, st: v
    if isinstance(e, TypedLit):
        if e.ktype == "datetime":
            dtv = parse_kql_datetime(e.raw)
            return lambda r, s, st: dtv
        if e.ktype == "timespan":
            from .translator import _parse_timespan_raw

            secs = _parse_timespan_raw(e.raw)
            td = None if secs is None else _dt.timedelta(seconds=secs)
            return lambda r, s, st: td
        raise KqlUnsupportedError(f"scan: literal {e.ktype} not supported")
    if isinstance(e, Col):
        name = e.name
        return lambda r, s, st: st[name] if name in st else r.get(name)
    if isinstance(e, Property):
        if (
            isinstance(e.base, Col)
            and e.base.name in step_names
            and isinstance(e.key, (Lit, Col))
        ):
            step = e.base.name
            key = e.key.value if isinstance(e.key, Lit) else e.key.name
            return lambda r, s, st: (s.get(step) or {}).get(key)
        raise KqlUnsupportedError("scan: only s<k>.column property access supported")
    if isinstance(e, UnaryOp):
        inner = compile_expr(e.operand, step_names)
        if e.op == "-":
            return lambda r, s, st: None if inner(r, s, st) is None else -inner(r, s, st)
        return lambda r, s, st: (
            None if inner(r, s, st) is None else not inner(r, s, st)
        )
    if isinstance(e, BinOp):
        if e.op in ("and", "or"):
            l = compile_expr(e.left, step_names)
            rr = compile_expr(e.right, step_names)
            if e.op == "and":
                return lambda r, s, st: (l(r, s, st) is True) and (rr(r, s, st) is True)
            return lambda r, s, st: (l(r, s, st) is True) or (rr(r, s, st) is True)
        if e.op in ("==", "!=", "<", "<=", ">", ">="):
            l = compile_expr(e.left, step_names)
            rr = compile_expr(e.right, step_names)
            f = _cmp(e.op)
            return lambda r, s, st: f(l(r, s, st), rr(r, s, st))
        if e.op in _ARITH:
            l = compile_expr(e.left, step_names)
            rr = compile_expr(e.right, step_names)
            f = _ARITH[e.op]
            return lambda r, s, st: f(l(r, s, st), rr(r, s, st))
        raise KqlUnsupportedError(f"scan: operator {e.op!r} not supported")
    if isinstance(e, InList):
        inner = compile_expr(e.expr, step_names)
        vals = []
        for item in e.items:
            if not isinstance(item, Lit):
                raise KqlUnsupportedError("scan: in() needs literal items")
            vals.append(item.value)
        neg = e.negated
        return lambda r, s, st: (
            None if inner(r, s, st) is None else (inner(r, s, st) in vals) != neg
        )
    if isinstance(e, Between):
        inner = compile_expr(e.expr, step_names)
        lo = compile_expr(e.lo, step_names)
        hi = compile_expr(e.hi, step_names)
        neg = e.negated
        def run(r, s, st):
            v, a, b = inner(r, s, st), lo(r, s, st), hi(r, s, st)
            if v is None or a is None or b is None:
                return None
            return (a <= v <= b) != neg
        return run
    if isinstance(e, FuncCall):
        fn = _FUNCS.get(e.name)
        if fn is None:
            raise KqlUnsupportedError(f"scan: function {e.name!r} not supported")
        args = [compile_expr(a, step_names) for a in e.args]
        return lambda r, s, st: fn(*[a(r, s, st) for a in args])
    raise KqlUnsupportedError(f"scan: expression {type(e).__name__} not supported")


def run_scan(df: DataFrame, op: ScanOp, engine) -> DataFrame:
    step_names = {s.name for s in op.steps}
    conds = [compile_expr(s.cond, step_names) for s in op.steps]
    assigns = [
        [(name, compile_expr(expr, step_names)) for name, expr in s.assigns]
        for s in op.steps
    ]
    defaults: dict[str, object] = {}
    for dname, _dtype, dexpr in op.declares:
        defaults[dname] = (
            compile_expr(dexpr, step_names)({}, {}, {}) if dexpr is not None else None
        )

    out_fields = list(df.schema.fields)
    for dname, dtype, _ in op.declares:
        out_fields.append(T.StructField(dname, KQL_TO_SPARK[dtype.lower()], True))
    if op.match_id:
        out_fields.append(T.StructField(op.match_id, T.LongType(), True))
    out_schema = T.StructType(out_fields)
    out_cols = [f.name for f in out_fields]
    in_cols = [f.name for f in df.schema.fields]
    n_steps = len(op.steps)
    names = [s.name for s in op.steps]
    match_col = op.match_id
    dflt = dict(defaults)

    def runner(batches):
        import pandas as pd

        state = dict(dflt)
        steps_vals: dict[str, dict] = {}
        cur = 0
        match_id = 0

        def apply_step(k: int, row: dict) -> None:
            steps_vals[names[k]] = dict(row)
            for aname, aexpr in assigns[k]:
                state[aname] = aexpr(row, steps_vals, state)

        for pdf in batches:
            out_rows = []
            # Arrow->pandas turns nullable long/real cells into float64 NaN,
            # which `is None` checks (the interpreter's null model) never see
            # — isnull() would be false on nulls and NaN would leak through
            # arithmetic. Normalize every batch to object cells with None.
            pdf = pdf.astype(object).where(pdf.notna(), None)
            for row in pdf.to_dict("records"):
                nonlocal_emitted = False
                if cur < n_steps and conds[cur](row, steps_vals, state) is True:
                    apply_step(cur, row)
                    cur += 1
                    nonlocal_emitted = True
                elif cur > 0 and conds[cur - 1](row, steps_vals, state) is True:
                    apply_step(cur - 1, row)
                    nonlocal_emitted = True
                elif conds[0](row, steps_vals, state) is True:
                    state.clear()
                    state.update(dflt)
                    steps_vals.clear()
                    match_id += 1
                    apply_step(0, row)
                    cur = 1
                    nonlocal_emitted = True
                if nonlocal_emitted:
                    out = {c: row.get(c) for c in in_cols}
                    out.update({k: state.get(k) for k in dflt})
                    if match_col:
                        out[match_col] = match_id
                    out_rows.append(out)
                    if cur == n_steps:  # match complete -> reset
                        state.clear()
                        state.update(dflt)
                        steps_vals.clear()
                        cur = 0
                        match_id += 1
            yield pd.DataFrame(out_rows, columns=out_cols)

    # sequential by spec: single walker over the serialized order
    return df.coalesce(1).mapInPandas(runner, out_schema)

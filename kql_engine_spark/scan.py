"""`scan` operator runtime (SURVEY.md §2.11/§2.13): row-sequence state
machine over a serialized table.

CONCURRENT-SEQUENCE matching model (round 5; follows the public
scan-operator docs: multiple overlapping sequences may be active, at most
one per step). Each step k holds at most one active sequence — a bundle of
(declared-variable values, matched-row snapshots `s<k>.col`, match id).
For every record r, steps are evaluated from the LAST step down to the
first; the first rule that fires consumes the record:

1. *promotion* (k >= 2): step k-1 holds a sequence and r satisfies step
   k's condition in that sequence's context. The sequence MOVES to step k
   (step k-1 is vacated; any sequence already at step k is discarded),
   step k's assignments run, r is emitted. If k is the last step, the
   match COMPLETES: r is emitted and the sequence is discarded.
2. *extension*: step k holds a sequence and r satisfies step k's
   condition in its own context. The sequence absorbs r (assignments run,
   r emitted) and stays at step k.
3. *new sequence* (k == 1 only, after extension fails): r satisfies step
   1's condition under the declared defaults. A fresh sequence (next match
   id) replaces whatever was at step 1.

Consequences, all matching documented behavior: a single-step scan never
completes-and-resets, so `step s1: true => c = x + s1.c` yields the
documented cumulative sum; an interleaved restart (view..view..click)
does NOT kill an in-flight sequence parked at a later step — up to
n_steps matches progress concurrently; `with_match_id` ids are assigned
at sequence creation, in serialized input order.

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

        # slots[k] = active sequence at step k, or None.
        # A sequence = {"vars": {...}, "steps": {name: row}, "id": match_id}.
        slots: list = [None] * n_steps
        next_id = 0

        def apply_step(seq: dict, k: int, row: dict) -> None:
            # `s<k>.x` sees the matched row overlaid with the declared-var
            # values as of BEFORE this step's assignments, so
            # `cumulative_x = x + s1.cumulative_x` reads the prior value.
            snap = dict(row)
            snap.update(seq["vars"])
            seq["steps"][names[k]] = snap
            for aname, aexpr in assigns[k]:
                seq["vars"][aname] = aexpr(row, seq["steps"], seq["vars"])

        for pdf in batches:
            out_rows = []
            # Arrow->pandas turns nullable long/real cells into float64 NaN,
            # which `is None` checks (the interpreter's null model) never see
            # — isnull() would be false on nulls and NaN would leak through
            # arithmetic. Normalize every batch to object cells with None.
            pdf = pdf.astype(object).where(pdf.notna(), None)
            for row in pdf.to_dict("records"):
                hit = None
                for k in range(n_steps - 1, -1, -1):
                    if k >= 1:
                        prev = slots[k - 1]
                        if prev is not None and conds[k](
                            row, prev["steps"], prev["vars"]
                        ) is True:
                            slots[k - 1] = None
                            apply_step(prev, k, row)
                            # last step: match completes, sequence discarded
                            slots[k] = None if k == n_steps - 1 else prev
                            hit = prev
                            break
                        cur = slots[k]
                        if cur is not None and conds[k](
                            row, cur["steps"], cur["vars"]
                        ) is True:
                            apply_step(cur, k, row)
                            hit = cur
                            break
                    else:
                        cur = slots[0]
                        if cur is not None and conds[0](
                            row, cur["steps"], cur["vars"]
                        ) is True:
                            apply_step(cur, 0, row)
                            hit = cur
                            break
                        if conds[0](row, {}, dict(dflt)) is True:
                            seq = {"vars": dict(dflt), "steps": {}, "id": next_id}
                            next_id += 1
                            apply_step(seq, 0, row)
                            slots[0] = seq
                            hit = seq
                            break
                if hit is not None:
                    out = {c: row.get(c) for c in in_cols}
                    out.update({k: hit["vars"].get(k) for k in dflt})
                    if match_col:
                        out[match_col] = hit["id"]
                    out_rows.append(out)
            yield pd.DataFrame(out_rows, columns=out_cols)

    # sequential by spec: single walker over the serialized order
    return df.coalesce(1).mapInPandas(runner, out_schema)

"""KQL aggregation function registry for `summarize` (SURVEY.md §2.6).

Contract: AGG_REGISTRY[name](tr, args, out_name) -> list[(col_name, Column)].
Most aggs yield one column; arg_max/arg_min/percentiles expand to several.
All lower to built-in Catalyst aggregates, so Spark's two-phase
partial/final HashAggregate applies automatically — map-side combine is the
scale story for 100 TB `summarize` (SURVEY.md §4.1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..ast_nodes import Col, Expr, FuncCall, Lit, Star
from ..errors import KqlSemanticError

AGG_REGISTRY: dict[str, object] = {}

# dcount accuracy level 0-4 -> DataSketches lgConfigK (SURVEY.md §2.6).
# rsd ~= 1.04 / sqrt(2^lgk): 7->0.092, 9->0.046, 12->0.016, 14->0.008,
# 17->0.003 — at or under the documented Kusto accuracy ladder
# {0.1, 0.05, 0.016, 0.008, 0.004}. Round 9: approx dcount moved from
# HyperLogLog++ (approx_count_distinct) to DataSketches HLL — measured 2x
# faster partial aggregation AND tighter estimates at the same level
# (sf0.1 l_orderkey: HLL++ rsd=0.05 was 6% off, sketches lgk=9 within 2%),
# and it shares machinery with the hll()/hll_merge()/dcount_hll() family.
_DCOUNT_LGK = {0: 7, 1: 9, 2: 12, 3: 14, 4: 17}


# hll()/hll_if() use a finer ladder than dcount (the sketch is kept and
# merged downstream, so the default spends more bits)
_HLL_LGK = {0: 11, 1: 12, 2: 14, 3: 16, 4: 21}


def _acc_lgk(tr, arg, ladder: dict[int, int], what: str) -> int:
    """Validate an accuracy argument the way Kusto does: it must be a
    constant integer 0-4 — anything else is a semantic error, not a
    silent fallback (round 11, ADVICE)."""
    try:
        raw = tr.const_value(arg)
        acc = int(raw)
        # int() would silently truncate 2.9 -> 2; Kusto rejects it
        if isinstance(raw, float) and raw != acc:
            raise ValueError
    except (TypeError, ValueError):
        raise KqlSemanticError(
            f"{what} accuracy must be a constant integer between 0 and 4"
        ) from None
    if acc not in ladder:
        raise KqlSemanticError(
            f"{what} accuracy must be between 0 and 4, got {acc}"
        )
    return ladder[acc]


def _dcount_lgk(tr, arg) -> int:
    return _acc_lgk(tr, arg, _DCOUNT_LGK, "dcount")


def _hll_lgk(tr, arg) -> int:
    return _acc_lgk(tr, arg, _HLL_LGK, "hll")


def _sketchable(tr, arg, c):
    """DataSketches HLL takes int/long/string/binary; stringify scalar
    types (injective per scalar type, so cardinality is preserved). Nested
    types (array/struct/map) must NOT go through a plain string cast —
    Spark renders ['a, b'] and ['a','b'] both as '[a, b]' — so they hash
    through xxhash64 instead (64-bit, on par with the hashing HLL applies
    internally; collision mass is far below sketch error)."""
    dt = tr.dtype_of_ast(arg, c)
    if isinstance(dt, (T.ArrayType, T.StructType, T.MapType)):
        # Spark hash functions map NULL to the SEED (42), not NULL — an
        # unguarded xxhash64 would count null as a distinct value (and in
        # dcountif every predicate-failing row becomes 42)
        return F.when(c.isNotNull(), F.xxhash64(c))
    if not isinstance(
        dt, (T.IntegerType, T.LongType, T.StringType, T.BinaryType)
    ):
        return c.cast("string")
    return c


def agg(*names):
    def deco(f):
        for n in names:
            AGG_REGISTRY[n] = f
        return f

    return deco


def _auto(prefix: str, args: list[Expr]) -> str:
    if args and isinstance(args[0], Col):
        return f"{prefix}_{args[0].name}"
    return f"{prefix}_"


@agg("count")
def _count(tr, args, name):
    return [(name or "count_", F.count(F.lit(1)))]


@agg("countif")
def _countif(tr, args, name):
    return [(name or "countif_", F.count(F.when(tr.to_col(args[0]), 1)))]


@agg("sum")
def _sum(tr, args, name):
    return [(name or _auto("sum", args), F.sum(tr.to_col(args[0])))]


@agg("sumif")
def _sumif(tr, args, name):
    return [
        (
            name or _auto("sumif", args),
            F.sum(F.when(tr.to_col(args[1]), tr.to_col(args[0]))),
        )
    ]


@agg("avg")
def _avg(tr, args, name):
    return [(name or _auto("avg", args), F.avg(tr.to_col(args[0])))]


@agg("avgif")
def _avgif(tr, args, name):
    return [
        (
            name or _auto("avgif", args),
            F.avg(F.when(tr.to_col(args[1]), tr.to_col(args[0]))),
        )
    ]


@agg("min")
def _min(tr, args, name):
    return [(name or _auto("min", args), F.min(tr.to_col(args[0])))]


@agg("max")
def _max(tr, args, name):
    return [(name or _auto("max", args), F.max(tr.to_col(args[0])))]


@agg("minif")
def _minif(tr, args, name):
    return [
        (
            name or _auto("minif", args),
            F.min(F.when(tr.to_col(args[1]), tr.to_col(args[0]))),
        )
    ]


@agg("maxif")
def _maxif(tr, args, name):
    return [
        (
            name or _auto("maxif", args),
            F.max(F.when(tr.to_col(args[1]), tr.to_col(args[0]))),
        )
    ]


@agg("dcount")
def _dcount(tr, args, name):
    out = name or _auto("dcount", args)
    if len(args) > 1:
        # validate even in exact mode — Kusto rejects a bad accuracy
        # regardless of how the distinct count is computed
        _dcount_lgk(tr, args[1])
    if tr.exact_dcount:
        return [(out, F.count_distinct(tr.to_col(args[0])))]
    lgk = _dcount_lgk(tr, args[1]) if len(args) > 1 else _DCOUNT_LGK[1]
    c = _sketchable(tr, args[0], tr.to_col(args[0]))
    return [(out, F.hll_sketch_estimate(F.hll_sketch_agg(c, lgk)))]


@agg("dcountif")
def _dcountif(tr, args, name):
    out = name or _auto("dcountif", args)
    if len(args) > 2:
        _dcount_lgk(tr, args[2])
    filtered = F.when(tr.to_col(args[1]), tr.to_col(args[0]))
    if tr.exact_dcount:
        return [(out, F.count_distinct(filtered))]
    # optional accuracy arg maps through the same ladder as dcount
    lgk = _dcount_lgk(tr, args[2]) if len(args) > 2 else _DCOUNT_LGK[1]
    c = _sketchable(tr, args[0], filtered)
    return [(out, F.hll_sketch_estimate(F.hll_sketch_agg(c, lgk)))]


@agg("count_distinct")
def _count_distinct(tr, args, name):
    return [
        (name or _auto("count_distinct", args), F.count_distinct(tr.to_col(args[0])))
    ]


@agg("count_distinctif")
def _count_distinctif(tr, args, name):
    return [
        (
            name or _auto("count_distinctif", args),
            F.count_distinct(F.when(tr.to_col(args[1]), tr.to_col(args[0]))),
        )
    ]


@agg("hll")
def _hll(tr, args, name):
    """hll(col[, accuracy]) -> binary DataSketches HLL sketch (SURVEY §2.6).
    Real sketch interop: intermediate states merge across summarize stages
    via hll_merge() and read out via dcount_hll() — the pre-aggregated
    rollup pattern that matters at 100 TB. Kusto accuracy 0-4 maps to
    lgConfigK; doubles/timestamps are stringified (DataSketches HLL takes
    int/long/string/binary)."""
    out = name or _auto("hll", args)
    lgk = _hll_lgk(tr, args[1]) if len(args) > 1 else _HLL_LGK[1]
    c = tr.to_col(args[0])
    dt = tr.dtype_of_ast(args[0], c)
    if not isinstance(
        dt, (T.IntegerType, T.LongType, T.StringType, T.BinaryType)
    ):
        c = c.cast("string")
    return [(out, F.hll_sketch_agg(c, lgk))]


@agg("hll_merge")
def _hll_merge(tr, args, name):
    """Merge hll() sketches from a prior aggregation level [KQL §2.6]."""
    out = name or _auto("hll_merge", args)
    return [(out, F.hll_union_agg(tr.to_col(args[0]), True))]


@agg("arg_max", "argmax")
def _arg_max(tr, args, name):
    return _arg_extreme(tr, args, name, F.max_by, "max")


@agg("arg_min", "argmin")
def _arg_min(tr, args, name):
    return _arg_extreme(tr, args, name, F.min_by, "min")


def _arg_extreme(tr, args, name, by_fn, label):
    key_ast = args[0]
    key = tr.to_col(key_ast)
    key_name = key_ast.name if isinstance(key_ast, Col) else f"{label}_arg"
    out: list[tuple[str, Column]] = []
    agg_of_key = F.max(key) if label == "max" else F.min(key)
    out.append((name or key_name, agg_of_key))
    for a in args[1:]:
        if isinstance(a, Star):
            for c in tr.current_columns():
                if c != key_name:
                    out.append((c, by_fn(F.col(c), key)))
            continue
        a_name = a.name if isinstance(a, Col) else None
        out.append((a_name or f"{label}_by", by_fn(tr.to_col(a), key)))
    return out


@agg("take_any", "any")
def _take_any(tr, args, name):
    if not args:
        raise KqlSemanticError("take_any requires at least one argument (or *)")
    out = []
    for a in args:
        if isinstance(a, Star):
            for c in tr.current_columns():
                out.append((c, F.any_value(F.col(c), True)))
            continue
        a_name = a.name if isinstance(a, Col) else None
        out.append((name or a_name or "any_", F.any_value(tr.to_col(a), True)))
    return out


@agg("take_anyif", "anyif")
def _take_anyif(tr, args, name):
    a_name = args[0].name if isinstance(args[0], Col) else None
    return [
        (
            name or a_name or "anyif_",
            F.any_value(F.when(tr.to_col(args[1]), tr.to_col(args[0])), True),
        )
    ]


@agg("make_list", "makelist")
def _make_list(tr, args, name):
    col = F.collect_list(tr.to_col(args[0]))
    if len(args) > 1:
        col = F.slice(col, 1, int(tr.const_value(args[1])))
    return [(name or _auto("list", args), col)]


@agg("make_list_if")
def _make_list_if(tr, args, name):
    col = F.collect_list(F.when(tr.to_col(args[1]), tr.to_col(args[0])))
    if len(args) > 2:
        col = F.slice(col, 1, int(tr.const_value(args[2])))
    return [(name or _auto("list", args), col)]


@agg("make_set", "makeset")
def _make_set(tr, args, name):
    col = F.array_sort(F.collect_set(tr.to_col(args[0])))
    if len(args) > 1:
        col = F.slice(col, 1, int(tr.const_value(args[1])))
    return [(name or _auto("set", args), col)]


@agg("make_set_if")
def _make_set_if(tr, args, name):
    col = F.array_sort(F.collect_set(F.when(tr.to_col(args[1]), tr.to_col(args[0]))))
    if len(args) > 2:
        col = F.slice(col, 1, int(tr.const_value(args[2])))
    return [(name or _auto("set", args), col)]


@agg("make_list_with_nulls")
def _make_list_with_nulls(tr, args, name):
    # collect_list drops nulls; struct-wrap to keep them (SURVEY.md §2.6)
    wrapped = F.collect_list(F.struct(tr.to_col(args[0]).alias("v")))
    return [(name or _auto("list", args), F.transform(wrapped, lambda s: s["v"]))]


@agg("make_bag", "make_bag_if")
def _make_bag(tr, args, name):
    col = tr.to_col(args[0])
    if len(args) > 1 and not isinstance(args[1], Lit):
        col = F.when(tr.to_col(args[1]), col)
    merged = F.aggregate(
        F.collect_list(col.cast("string")),
        F.create_map().cast("map<string,string>"),
        lambda acc, x: F.map_zip_with(
            acc,
            F.from_json(x, "map<string,string>"),
            lambda k, v1, v2: F.coalesce(v2, v1),
        ),
    )
    return [(name or "bag_", F.to_json(merged))]


@agg("percentile")
def _percentile(tr, args, name):
    c = tr.to_col(args[0])
    p = float(tr.const_value(args[1])) / 100.0
    colname = args[0].name if isinstance(args[0], Col) else "expr"
    pname = _fmt_pct(tr.const_value(args[1]))
    if tr.exact_percentile:
        col = F.percentile(c, F.lit(p))
    else:
        col = F.percentile_approx(c, p)
    return [(name or f"percentile_{colname}_{pname}", col)]


@agg("percentiles")
def _percentiles(tr, args, name):
    c = tr.to_col(args[0])
    colname = args[0].name if isinstance(args[0], Col) else "expr"
    out = []
    for a in args[1:]:
        p = float(tr.const_value(a)) / 100.0
        col = F.percentile(c, F.lit(p)) if tr.exact_percentile else F.percentile_approx(c, p)
        out.append((f"percentile_{colname}_{_fmt_pct(tr.const_value(a))}", col))
    if name and len(out) == 1:
        out[0] = (name, out[0][1])
    return out


@agg("percentiles_array")
def _percentiles_array(tr, args, name):
    """percentiles_array(x, p1, p2, ...) or (x, dynamic([p...])) [KQL]:
    single array column of the requested percentiles."""
    from ..ast_nodes import TypedLit as _TypedLit
    from ..semantics import parse_dynamic_literal

    c = tr.to_col(args[0])
    colname = args[0].name if isinstance(args[0], Col) else "expr"
    pcts: list[float] = []
    for a in args[1:]:
        if isinstance(a, _TypedLit) and a.ktype == "dynamic":
            vals = parse_dynamic_literal(a.raw)
            pcts.extend(float(v) for v in (vals if isinstance(vals, list) else [vals]))
        else:
            pcts.append(float(tr.const_value(a)))
    fracs = [p / 100.0 for p in pcts]
    if tr.exact_percentile:
        col = F.array(*[F.percentile(c, F.lit(f)) for f in fracs])
    else:
        col = F.percentile_approx(c, fracs)
    return [(name or f"percentiles_{colname}", col)]


@agg("percentilesw_array")
def _percentilesw_array(tr, args, name):
    """percentilesw_array(x, w, p1, ...) — weighted percentiles array."""
    c = tr.to_col(args[0])
    w = tr.to_col(args[1]).cast("bigint")
    colname = args[0].name if isinstance(args[0], Col) else "expr"
    fracs = [float(tr.const_value(a)) / 100.0 for a in args[2:]]
    col = F.array(*[F.percentile(c, F.lit(f), w) for f in fracs])
    return [(name or f"percentiles_{colname}", col)]


@agg("percentilew")
def _percentilew(tr, args, name):
    c = tr.to_col(args[0])
    w = tr.to_col(args[1]).cast("bigint")
    p = float(tr.const_value(args[2])) / 100.0
    colname = args[0].name if isinstance(args[0], Col) else "expr"
    return [
        (
            name or f"percentile_{colname}_{_fmt_pct(tr.const_value(args[2]))}",
            F.percentile(c, F.lit(p), w),
        )
    ]


def _fmt_pct(v) -> str:
    s = str(v)
    return s.replace(".", "_").replace("-", "m")


@agg("stdev")
def _stdev(tr, args, name):
    return [(name or _auto("stdev", args), F.stddev_samp(tr.to_col(args[0])))]


@agg("stdevp")
def _stdevp(tr, args, name):
    return [(name or _auto("stdevp", args), F.stddev_pop(tr.to_col(args[0])))]


@agg("variance")
def _variance(tr, args, name):
    return [(name or _auto("variance", args), F.var_samp(tr.to_col(args[0])))]


@agg("variancep")
def _variancep(tr, args, name):
    return [(name or _auto("variancep", args), F.var_pop(tr.to_col(args[0])))]


@agg("covariance")
def _covariance(tr, args, name):
    return [
        (name or "covariance_", F.covar_samp(tr.to_col(args[0]), tr.to_col(args[1])))
    ]


@agg("covariancep")
def _covariancep(tr, args, name):
    return [
        (name or "covariancep_", F.covar_pop(tr.to_col(args[0]), tr.to_col(args[1])))
    ]


@agg("correlation")
def _correlation(tr, args, name):
    return [(name or "correlation_", F.corr(tr.to_col(args[0]), tr.to_col(args[1])))]


@agg("binary_all_and")
def _binary_all_and(tr, args, name):
    return [(name or "binary_all_and_", F.bit_and(tr.to_col(args[0])))]


@agg("binary_all_or")
def _binary_all_or(tr, args, name):
    return [(name or "binary_all_or_", F.bit_or(tr.to_col(args[0])))]


@agg("binary_all_xor")
def _binary_all_xor(tr, args, name):
    return [(name or "binary_all_xor_", F.bit_xor(tr.to_col(args[0])))]


def is_aggregate_call(e: Expr) -> bool:
    return isinstance(e, FuncCall) and e.name in AGG_REGISTRY


@agg("tdigest")
def _tdigest(tr, args, name):
    """tdigest(col) -> binary quantile sketch (SURVEY.md §2.6). Kusto's
    t-digest serialization is proprietary, so the engine's sketch is a
    DataSketches KLL (Spark 4.1 kll_sketch_agg_double) with the SAME
    contract: intermediate states merge across summarize stages via
    merge_tdigest()/tdigest_merge() and read out via percentile_tdigest() —
    the pre-aggregated percentile-rollup pattern that matters at 100 TB
    (round 5: replaces the non-mergeable 101-point percentile_approx
    surrogate). k=800 keeps normalized rank error under ~0.6%."""
    out = name or _auto("tdigest", args)
    return [
        (out, F.kll_sketch_agg_double(tr.to_col(args[0]).cast("double"), 800))
    ]


@agg("tdigest_merge", "merge_tdigest")
def _tdigest_merge(tr, args, name):
    """Merge tdigest() sketches from a prior aggregation level [KQL §2.6]."""
    out = name or _auto("tdigest_merge", args)
    return [(out, F.kll_merge_agg_double(tr.to_col(args[0])))]


@agg("percentilesw")
def _percentilesw(tr, args, name):
    """percentilesw(col, weight, p1, p2, ...) — weighted percentiles, one
    output column per requested percentile [KQL §2.6]."""
    c = tr.to_col(args[0])
    w = tr.to_col(args[1]).cast("bigint")
    colname = args[0].name if isinstance(args[0], Col) else "expr"
    out = []
    for a in args[2:]:
        pv = tr.const_value(a)
        out.append(
            (
                name or f"percentile_{colname}_{_fmt_pct(pv)}",
                F.percentile(c, F.lit(float(pv) / 100.0), w),
            )
        )
        name = None  # only the first output takes an explicit alias
    return out


@agg("stdevif")
def _stdevif(tr, args, name):
    return [
        (
            name or _auto("stdevif", args),
            F.stddev_samp(F.when(tr.to_col(args[1]), tr.to_col(args[0]))),
        )
    ]


@agg("varianceif")
def _varianceif(tr, args, name):
    return [
        (
            name or _auto("varianceif", args),
            F.var_samp(F.when(tr.to_col(args[1]), tr.to_col(args[0]))),
        )
    ]


@agg("hll_if")
def _hll_if(tr, args, name):
    """hll_if(expr, predicate[, accuracy]) [KQL §2.6] — sketch over the
    rows satisfying the predicate (merge/readout like hll())."""
    out = name or _auto("hll_if", args)
    lgk = _hll_lgk(tr, args[2]) if len(args) > 2 else _HLL_LGK[1]
    c = tr.to_col(args[0])
    dt = tr.dtype_of_ast(args[0], c)
    if not isinstance(
        dt, (T.IntegerType, T.LongType, T.StringType, T.BinaryType)
    ):
        c = c.cast("string")
    return [(out, F.hll_sketch_agg(F.when(tr.to_col(args[1]), c), lgk))]


# ----------------------------------------------------------- buildschema
# Kusto `buildschema(DynamicExpr)`: the minimal schema admitting every row's
# value. Two-phase by construction: a vectorized per-row skeleton extraction
# (map side), collect_set of distinct skeletons (partial-aggregatable — the
# set is bounded by distinct SHAPES, not rows), and a final merge into the
# Kusto union format ({"k": "type"}, arrays as ["type"], mixed ->
# ["t1", "t2"]).

_BS_UDFS: dict = {}


def _bs_skeleton(val):
    """JSON value -> canonical type-skeleton JSON (sorted keys)."""
    import json

    def sk(v):
        if v is None:
            return "null"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "long"
        if isinstance(v, float):
            return "real"
        if isinstance(v, str):
            return "string"
        if isinstance(v, list):
            items = [sk(x) for x in v]
            return {"__array__": _bs_union_list(items)}
        if isinstance(v, dict):
            return {k: sk(x) for k, x in sorted(v.items())}
        return "string"

    try:
        parsed = json.loads(val)
    except (ValueError, TypeError):
        parsed = val
    return json.dumps(sk(parsed), sort_keys=True)


def _bs_union_list(items):
    import json

    out = []
    for it in items:
        if not any(it == o for o in out):
            out.append(it)
    if not out:
        return []
    if len(out) == 1:
        return out[0]
    # collect_set order is partition-dependent: canonicalize union order
    return sorted(out, key=lambda x: json.dumps(x, sort_keys=True))


def _bs_merge(a, b):
    if a == b:
        return a
    if isinstance(a, dict) and isinstance(b, dict):
        keys = sorted(set(a) | set(b))
        return {
            k: _bs_merge(a[k], b[k]) if k in a and k in b else (a.get(k, b.get(k)))
            for k in keys
        }
    alts = (a if isinstance(a, list) else [a]) + (b if isinstance(b, list) else [b])
    return _bs_union_list(alts)


def _bs_render(sk):
    # internal skeleton -> Kusto-style: {"__array__": t} prints as [t]
    if isinstance(sk, dict):
        if set(sk) == {"__array__"}:
            inner = _bs_render(sk["__array__"])
            return inner if isinstance(inner, list) else [inner]
        return {k: _bs_render(v) for k, v in sk.items()}
    if isinstance(sk, list):
        return [_bs_render(x) for x in sk]
    return sk


@agg("buildschema")
def _buildschema(tr, args, name):
    from pyspark.sql.functions import pandas_udf

    if "skel" not in _BS_UDFS:

        @pandas_udf("string")
        def skel(col):
            return col.map(lambda s: None if s is None else _bs_skeleton(s))

        @pandas_udf("string")
        def merge(sets):
            import json

            def one(arr):
                if arr is None or len(arr) == 0:
                    return None
                acc = None
                for s in arr:
                    sk = json.loads(s)
                    acc = sk if acc is None else _bs_merge(acc, sk)
                return json.dumps(_bs_render(acc), sort_keys=True)

            import pandas as pd

            return pd.Series([one(a) for a in sets])

        _BS_UDFS["skel"] = skel
        _BS_UDFS["merge"] = merge
    c = tr.to_col(args[0]).cast("string")
    out = _BS_UDFS["merge"](F.collect_set(_BS_UDFS["skel"](c)))
    return [(name or _auto("schema", args), out)]

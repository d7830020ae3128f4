"""KQL scalar function registry -> PySpark Column builders (SURVEY.md §2.9).

The hot path stays JVM-side: string/math/datetime/conversion/dynamic
functions lower to `pyspark.sql.functions` compositions inside whole-stage
codegen, never crossing the Arrow boundary. The exceptions are deliberate
and Arrow-batched: the IPv6, geo-shape (geodesic intersection/union/
densify/simplify, S2/geohash covering), and series-DSP families run as
vectorized `pandas_udf` kernels — algorithms Spark has no builtin for —
registered via the `_*_udf` helpers below; none is a row-at-a-time
`F.udf`. KQL semantic deltas (0-based indexing, -1 not-found, natural log,
regex trim) are encoded here once.

Registry contract: REGISTRY[name](tr, args) -> Column, where `tr` is the
ExprTranslator (gives .to_col(ast), .const_seconds(ast), .dtype_of(col))
and `args` is the raw AST argument list.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..errors import KqlSemanticError
from ..semantics import KQL_CAST_NAME, interval_seconds, kql_type_name

REGISTRY: dict[str, object] = {}


def fn(*names):
    """Register with raw signature (tr, args_ast)."""

    def deco(f):
        for n in names:
            REGISTRY[n] = f
        return f

    return deco


def simple(*names):
    """Register with translated-column signature (*cols)."""

    def deco(f):
        def wrapper(tr, args):
            return f(*[tr.to_col(a) for a in args])

        for n in names:
            REGISTRY[n] = wrapper
        return f

    return deco


# --------------------------------------------------------------------- string

simple("strlen")(F.length)
simple("toupper")(F.upper)
simple("tolower")(F.lower)
simple("reverse")(F.reverse)
simple("strrep")(lambda s, n: F.repeat(s, n.cast("int")))
@fn("strcat")
def _strcat(tr, args):
    # each operand renders with KQL tostring semantics (timespans as
    # hh:mm:ss, dynamics as JSON, null -> empty)
    return F.concat(*[REGISTRY["tostring"](tr, [a]) for a in args])
simple("strcmp")(
    lambda a, b: F.when(a < b, F.lit(-1)).when(a > b, F.lit(1)).otherwise(F.lit(0))
)


@fn("translate")
def _translate(tr, args):
    frm = tr.const_string(args[0])
    to = tr.const_string(args[1])
    return F.translate(tr.to_col(args[2]), frm, to)


@fn("strcat_delim")
def _strcat_delim(tr, args):
    delim = tr.const_string(args[0])
    return F.concat_ws(delim, *[REGISTRY["tostring"](tr, [a]) for a in args[1:]])


@fn("substring")
def _substring(tr, args):
    s = tr.to_col(args[0])
    raw = tr.to_col(args[1]).cast("int")
    # KQL 0-based; a NEGATIVE start counts from the end (substring("123456",
    # -2, 2) = "56") — Spark's from-end pos needs no 0->1 shift
    start = F.when(raw >= 0, raw + F.lit(1)).otherwise(raw)
    if len(args) >= 3:
        return F.substring(s, start, tr.to_col(args[2]).cast("int"))
    return F.substring(s, start, F.lit(2147483647))


@fn("split")
def _split(tr, args):
    s = tr.to_col(args[0])
    delim = tr.const_string(args[1])
    arr = F.split(s, _re.escape(delim))
    if len(args) >= 3:
        # requestedIndex -> single-element behavior: KQL returns the element
        idx = tr.to_col(args[2]).cast("int")
        return F.element_at(arr, idx + F.lit(1))
    return arr


@fn("indexof")
def _indexof(tr, args):
    """indexof(s, sub[, start[, length[, occurrence]]]) — 0-based, -1 not
    found [KQL]. start < 0 offsets from the end; length -1 = rest of the
    string; occurrence selects the k-th (overlapping) match. The general
    form enumerates candidate positions JVM-side (filter over sequence)."""
    s = tr.to_col(args[0]).cast("string")
    sub = tr.to_col(args[1]).cast("string")
    if len(args) <= 2:
        return (F.instr(s, sub) - F.lit(1)).cast("bigint")
    start0 = tr.to_col(args[2]).cast("int")
    start0 = F.when(start0 < 0, F.greatest(F.length(s) + start0, F.lit(0))).otherwise(start0)
    length = tr.to_col(args[3]).cast("int") if len(args) >= 4 else F.lit(-1)
    occ = tr.to_col(args[4]).cast("int") if len(args) >= 5 else F.lit(1)
    window_end = F.when(length < 0, F.length(s)).otherwise(
        F.least(start0 + length, F.length(s))
    )
    # 1-based candidate start positions within [start0+1, window_end]
    positions = F.filter(
        F.when(
            window_end >= start0 + 1,
            F.sequence(start0 + F.lit(1), window_end),
        ).otherwise(F.array().cast("array<int>")),
        lambda p: F.substring(s, p, F.length(sub)) == sub,
    )
    hit = F.get(positions, occ - F.lit(1))  # 0-based get: null when absent
    return F.coalesce(hit - F.lit(1), F.lit(-1)).cast("bigint")


@fn("countof")
def _countof(tr, args):
    """countof(s, search[, kind]) [KQL]: plain matches count WITH overlap
    (countof("aaa", "aa") = 2) — position-enumerated JVM-side; regex kind
    is standard non-overlapping regexp_count."""
    s = tr.to_col(args[0]).cast("string")
    search = tr.const_string(args[1])
    kind = tr.const_string(args[2]) if len(args) >= 3 else "normal"
    if kind == "regex":
        return F.regexp_count(s, F.lit(search)).cast("bigint")
    sub = F.lit(search)
    span = F.length(s) - F.lit(len(search) - 1)
    return F.size(
        F.filter(
            F.when(span >= 1, F.sequence(F.lit(1), span)).otherwise(
                F.array().cast("array<int>")
            ),
            lambda i: F.substring(s, i, F.lit(len(search))) == sub,
        )
    ).cast("bigint")


@fn("replace_string")
def _replace_string(tr, args):
    return F.replace(tr.to_col(args[0]), tr.to_col(args[1]), tr.to_col(args[2]))


@fn("replace_regex")
def _replace_regex(tr, args):
    return F.regexp_replace(tr.to_col(args[0]), tr.to_col(args[1]), tr.to_col(args[2]))


@fn("trim")
def _trim(tr, args):
    pat = tr.const_string(args[0])
    s = tr.to_col(args[1])
    return F.regexp_replace(s, f"^(?:{pat})+|(?:{pat})+$", "")


@fn("trim_start")
def _trim_start(tr, args):
    pat = tr.const_string(args[0])
    return F.regexp_replace(tr.to_col(args[1]), f"^(?:{pat})+", "")


@fn("trim_end")
def _trim_end(tr, args):
    pat = tr.const_string(args[0])
    return F.regexp_replace(tr.to_col(args[1]), f"(?:{pat})+$", "")


@fn("extract")
def _extract(tr, args):
    regex = tr.const_string(args[0])
    group = int(tr.const_value(args[1]))
    s = tr.to_col(args[2])
    out = F.regexp_extract(s, regex, group)
    # KQL: no match -> null (regexp_extract gives ''); typed capture casts
    out = F.when(F.regexp_like(s, F.lit(regex)), out)
    if len(args) >= 4:
        out = out.cast(KQL_CAST_NAME[tr.const_typename(args[3])])
    return out


@fn("extract_all")
def _extract_all(tr, args):
    """extract_all(regex, [captureGroups,] text) [KQL]: one capture group
    -> array of strings; several -> array of per-match group arrays."""
    regex = tr.const_string(args[0])
    s = tr.to_col(args[-1])
    ngroups = _re.compile(regex).groups
    if ngroups <= 1:
        return F.regexp_extract_all(s, F.lit(regex), 1 if ngroups else 0)
    per_group = [
        F.regexp_extract_all(s, F.lit(regex), g) for g in range(1, ngroups + 1)
    ]
    n = F.size(per_group[0])
    return F.transform(
        F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
            F.array().cast("array<int>")
        ),
        lambda i: F.array(*[F.element_at(g, i) for g in per_group]),
    )


# extractjson paths eligible for single-parse sharing (must stay in sync
# with translator._JSON_TOP_KEY): exactly one top-level `$.key` hop
_EJ_TOP_KEY = _re.compile(r"^\$\.([A-Za-z_][A-Za-z0-9_]*)$")


@fn("extractjson")
def _extractjson(tr, args):
    from ..ast_nodes import Col as _Col

    path = tr.const_string(args[0])
    out = None
    a1 = args[1]
    if isinstance(a1, _Col) and a1.side is None and a1.name not in tr.env:
        m = _EJ_TOP_KEY.match(path)
        if m:
            # single-parse JSON projection: the enclosing project/extend may
            # have staged one from_json struct covering this access
            out = tr.engine.json_shared.get((a1.name, m.group(1)))
    if out is None:
        out = F.get_json_object(tr.to_col(a1), path)
    if len(args) >= 3:
        out = out.cast(KQL_CAST_NAME[tr.const_typename(args[2])])
    return out


simple("isempty")(lambda c: c.isNull() | (c.cast("string") == ""))
simple("isnotempty")(lambda c: c.isNotNull() & (c.cast("string") != ""))
simple("isnull")(lambda c: c.isNull())
simple("isnotnull")(lambda c: c.isNotNull())
simple("coalesce")(F.coalesce)
simple("base64_encode_tostring")(lambda c: F.base64(c.cast("binary")))
simple("base64_decode_tostring")(lambda c: F.unbase64(c).cast("string"))
simple("url_encode")(F.url_encode)
# component form percent-encodes spaces (%20), not '+' [KQL]
simple("url_encode_component")(
    lambda c: F.replace(F.url_encode(c), F.lit("+"), F.lit("%20"))
)
simple("url_decode")(F.url_decode)


@fn("parse_url")
def _parse_url(tr, args):
    u = tr.to_col(args[0])
    return F.to_json(
        F.struct(
            F.parse_url(u, F.lit("PROTOCOL")).alias("Scheme"),
            F.parse_url(u, F.lit("HOST")).alias("Host"),
            F.coalesce(
                F.regexp_extract(u, r"://[^/]*:(\d+)", 1), F.lit("")
            ).alias("Port"),
            F.parse_url(u, F.lit("PATH")).alias("Path"),
            F.parse_url(u, F.lit("USERINFO")).alias("Username"),
            F.parse_url(u, F.lit("QUERY")).alias("Query String"),
            F.parse_url(u, F.lit("REF")).alias("Fragment"),
        )
    )


@fn("parse_version")
def _parse_version(tr, args):
    # normalize up-to-4-part version into a sortable long
    v = tr.to_col(args[0])
    parts = F.split(v, r"\.")
    out = F.lit(0).cast("bigint")
    for i in range(4):
        seg = F.coalesce(
            F.element_at(parts, i + 1).try_cast("bigint"), F.lit(0)
        )
        out = out + seg * F.lit(10 ** (6 * (3 - i))).cast("bigint")
    return out


# ------------------------------------------------------------------- datetime

simple("now")(lambda *a: F.current_timestamp())


@fn("ago")
def _ago(tr, args):
    secs = tr.const_seconds(args[0])
    if secs is not None:
        return F.current_timestamp() - interval_seconds(secs)
    return F.current_timestamp() - tr.to_col(args[0])


@fn("bin", "floor")
def _bin(tr, args):
    x = tr.to_col(args[0])
    secs = tr.const_seconds(args[1])
    dt = tr.dtype_of_ast(args[0], x)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        if secs is None:
            raise KqlSemanticError("bin() on datetime needs a timespan literal")
        us = int(round(secs * 1_000_000))
        return F.timestamp_micros(
            (F.floor(F.unix_micros(x.cast("timestamp")) / F.lit(us)) * F.lit(us)).cast("bigint")
        )
    if isinstance(dt, T.DayTimeIntervalType):
        if secs is None:
            raise KqlSemanticError("bin() on timespan needs a timespan literal")
        from ..semantics import timespan_seconds_of

        return interval_seconds(1) * F.floor(
            timespan_seconds_of(x) / F.lit(secs)
        ) * F.lit(secs)
    size = tr.to_col(args[1])
    binned = F.floor(x.cast("double") / size.cast("double")) * size.cast("double")
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)) and (
        tr.is_integer_literal(args[1])
    ):
        return binned.cast("bigint")
    return binned


@fn("bin_auto")
def _bin_auto(tr, args):
    """bin_auto(x) [KQL]: bins by the `query_bin_auto_size` query property
    (`set query_bin_auto_size=1h;` or the kql(options=...) dict), anchored
    at `query_bin_auto_at` when set. Mirrors Kusto, where bin_auto without
    the property is an error."""
    size = tr.engine.options.get("query_bin_auto_size")
    if size is None:
        raise KqlSemanticError(
            "bin_auto() requires `set query_bin_auto_size = ...;` (or the "
            "query_bin_auto_size entry in kql(options=...))"
        )
    at = tr.engine.options.get("query_bin_auto_at")
    from ..ast_nodes import Expr as _Expr, Lit as _Lit

    def as_ast(v):
        if isinstance(v, _Expr):
            return v
        # programmatic options: bare numbers bin numerically
        return _Lit(v, "long" if isinstance(v, int) else "real")

    if at is not None:
        return REGISTRY["bin_at"](tr, [args[0], as_ast(size), as_ast(at)])
    return REGISTRY["bin"](tr, [args[0], as_ast(size)])


@fn("bin_at")
def _bin_at(tr, args):
    x = tr.to_col(args[0])
    dt = tr.dtype_of_ast(args[0], x)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        secs = tr.const_seconds(args[1])
        if secs is None:
            raise KqlSemanticError("bin_at() on datetime needs a timespan literal")
        us = int(round(secs * 1_000_000))
        anchor = F.unix_micros(tr.to_col(args[2]).cast("timestamp"))
        xm = F.unix_micros(x.cast("timestamp"))
        return F.timestamp_micros(
            (anchor + F.floor((xm - anchor) / F.lit(us)) * F.lit(us)).cast("bigint")
        )
    size = tr.to_col(args[1]).cast("double")
    anchor = tr.to_col(args[2]).cast("double")
    return anchor + F.floor((x.cast("double") - anchor) / size) * size


simple("startofday")(lambda c, *o: F.date_trunc("day", c))
simple("startofmonth")(lambda c, *o: F.date_trunc("month", c))
simple("startofyear")(lambda c, *o: F.date_trunc("year", c))


@fn("startofweek")
def _startofweek(tr, args):
    # KQL weeks start Sunday [KQL]; Spark date_trunc('week') starts Monday
    c = tr.to_col(args[0])
    day = F.date_trunc("day", c)
    dow = F.dayofweek(c)  # 1=Sunday
    return day - F.make_dt_interval(days=dow - F.lit(1))


simple("endofday")(
    lambda c, *o: F.date_trunc("day", c) + F.expr("INTERVAL 1 DAY") - F.expr("INTERVAL 1 MICROSECOND")
)
simple("endofmonth")(
    lambda c, *o: F.to_timestamp(F.last_day(c)) + F.expr("INTERVAL 1 DAY") - F.expr("INTERVAL 1 MICROSECOND")
)
simple("endofyear")(
    lambda c, *o: F.date_trunc("year", c) + F.expr("INTERVAL 1 YEAR") - F.expr("INTERVAL 1 MICROSECOND")
)


@fn("endofweek")
def _endofweek(tr, args):
    start = REGISTRY["startofweek"](tr, args)
    return start + F.expr("INTERVAL 7 DAY") - F.expr("INTERVAL 1 MICROSECOND")


_DATEPART = {
    "year": "YEAR", "quarter": "QUARTER", "month": "MONTH", "week": "WEEK",
    "day": "DAY", "hour": "HOUR", "minute": "MINUTE", "second": "SECOND",
    "millisecond": "MILLISECOND", "microsecond": "MICROSECOND",
}


@fn("datetime_add")
def _datetime_add(tr, args):
    part = tr.const_string(args[0]).lower()
    n = tr.to_col(args[1])
    dt = tr.to_col(args[2])
    return F.timestamp_add(_DATEPART[part], n, dt)


@fn("datetime_diff")
def _datetime_diff(tr, args):
    part = tr.const_string(args[0]).lower()
    a = tr.to_col(args[1])
    b = tr.to_col(args[2])
    return F.timestamp_diff(_DATEPART[part], b, a)  # KQL: diff = arg1 - arg2


@fn("dayofweek")
def _dayofweek(tr, args):
    # returns timespan since preceding Sunday [KQL]
    c = tr.to_col(args[0])
    return F.make_dt_interval(days=F.dayofweek(c) - F.lit(1))


simple("dayofmonth")(F.dayofmonth)
simple("dayofyear")(F.dayofyear)
simple("getmonth", "monthofyear")(F.month)
simple("getyear")(F.year)
simple("hourofday")(F.hour)
simple("week_of_year")(F.weekofyear)


@fn("make_datetime")
def _make_datetime(tr, args):
    cols = [tr.to_col(a) for a in args]
    while len(cols) < 6:
        cols.append(F.lit(0))
    sec = cols[5].cast("decimal(18,6)")
    return F.make_timestamp(
        cols[0].cast("int"), cols[1].cast("int"), cols[2].cast("int"),
        cols[3].cast("int"), cols[4].cast("int"), sec,
    )


@fn("make_timespan")
def _make_timespan(tr, args):
    cols = [tr.to_col(a).cast("int") for a in args]
    if len(cols) == 2:  # (hours, minutes)
        return F.make_dt_interval(hours=cols[0], mins=cols[1])
    if len(cols) == 3:
        return F.make_dt_interval(hours=cols[0], mins=cols[1], secs=cols[2].cast("double"))
    return F.make_dt_interval(
        days=cols[0], hours=cols[1], mins=cols[2], secs=cols[3].cast("double")
    )


# KQL .NET-style format tokens -> JVM SimpleDateTime pattern (subset)
_FMT_MAP = [
    ("yyyy", "yyyy"), ("yy", "yy"), ("MM", "MM"), ("M", "M"),
    ("dd", "dd"), ("d", "d"), ("HH", "HH"), ("H", "H"), ("hh", "hh"),
    ("h", "h"),
    ("mm", "mm"), ("m", "m"), ("ss", "ss"), ("s", "s"),
    ("fffffff", "SSSSSSS"), ("ffffff", "SSSSSS"), ("fffff", "SSSSS"),
    ("ffff", "SSSS"), ("fff", "SSS"), ("ff", "SS"), ("f", "S"),
    ("tt", "a"),
]


def _xlate_fmt(fmt: str) -> str:
    out = []
    i = 0
    while i < len(fmt):
        for k, v in _FMT_MAP:
            if fmt.startswith(k, i):
                out.append(v)
                i += len(k)
                break
        else:
            ch = fmt[i]
            if ch.isalpha() or ch in "[]#{}":
                # alpha: could be a JVM pattern letter; [ ] # { } are
                # reserved by java.time (optional sections / padding) and
                # must be quoted to stay literal delimiters
                out.append(f"'{ch}'")
            else:
                out.append(ch)
            i += 1
    return "".join(out)


@fn("format_datetime")
def _format_datetime(tr, args):
    return F.date_format(tr.to_col(args[0]), _xlate_fmt(tr.const_string(args[1])))


simple("unixtime_seconds_todatetime")(lambda c: F.timestamp_seconds(c))
simple("unixtime_milliseconds_todatetime")(lambda c: F.timestamp_millis(c.cast("bigint")))
simple("unixtime_microseconds_todatetime")(lambda c: F.timestamp_micros(c.cast("bigint")))
simple("unixtime_nanoseconds_todatetime")(
    lambda c: F.timestamp_micros((c.cast("bigint") / F.lit(1000)).cast("bigint"))
)


# ----------------------------------------------------------------------- math

simple("abs")(F.abs)
simple("sign")(lambda c: F.signum(c.cast("double")))
simple("exp")(F.exp)
simple("log")(lambda c: F.log(c))  # natural log [KQL]
simple("log2")(F.log2)
simple("log10")(F.log10)
simple("pow")(F.pow)
simple("sqrt")(F.sqrt)
simple("exp2")(lambda c: F.pow(F.lit(2.0), c))
simple("exp10")(lambda c: F.pow(F.lit(10.0), c))
simple("pi")(lambda: F.lit(3.141592653589793))
simple("sin")(F.sin)
simple("cos")(F.cos)
simple("tan")(F.tan)
simple("asin")(F.asin)
simple("acos")(F.acos)
simple("atan")(F.atan)
simple("atan2")(lambda y, x: F.atan2(y, x))
simple("degrees")(F.degrees)
simple("radians")(F.radians)
simple("isnan")(lambda c: F.isnan(c.cast("double")))
simple("isinf")(lambda c: (c.cast("double") == float("inf")) | (c.cast("double") == float("-inf")))
simple("isfinite")(
    lambda c: ~(F.isnan(c.cast("double")) | (F.abs(c.cast("double")) == float("inf")))
)
simple("min_of")(F.least)
simple("max_of")(F.greatest)
simple("gamma")(lambda c: F.exp(_lgamma(c)))
simple("loggamma")(lambda c: _lgamma(c))


def _lgamma(c: Column) -> Column:
    # Stirling series, JVM-side (no SciPy dependency). Accuracy: shift the
    # argument into the asymptotic region z = x+7 via the recurrence
    # lgamma(x) = lgamma(x+7) - sum_{i=0..6} log(x+i), then apply Stirling
    # with three correction terms (~1e-10 rel. error for z >= 7).
    x = c.cast("double")
    shift = F.lit(0.0)
    for i in range(7):
        shift = shift + F.log(x + F.lit(float(i)))
    z = x + F.lit(7.0)
    stirling = (
        (z - F.lit(0.5)) * F.log(z)
        - z
        + F.lit(0.9189385332046727)  # 0.5*ln(2*pi)
        + F.lit(1.0) / (F.lit(12.0) * z)
        - F.lit(1.0) / (F.lit(360.0) * F.pow(z, F.lit(3.0)))
        + F.lit(1.0) / (F.lit(1260.0) * F.pow(z, F.lit(5.0)))
    )
    return stirling - shift


@fn("round")
def _round(tr, args):
    c = tr.to_col(args[0])
    n = int(tr.const_value(args[1])) if len(args) > 1 else 0
    return F.round(c, n)


simple("ceiling")(F.ceil)


@fn("rand")
def _rand(tr, args):
    if args:
        n = tr.to_col(args[0])
        return F.floor(F.rand(seed=42) * n.cast("double"))
    return F.rand(seed=42)


@fn("hash")
def _hash(tr, args):
    h = F.xxhash64(tr.to_col(args[0]))
    if len(args) > 1:
        return F.pmod(h, tr.to_col(args[1]).cast("bigint"))
    return h


simple("hash_sha256")(lambda c: F.sha2(c.cast("string"), 256))
simple("hash_sha1")(lambda c: F.sha1(c.cast("string")))
simple("hash_md5")(lambda c: F.md5(c.cast("string")))


@fn("range")
def _range_fn(tr, args):
    start = tr.to_col(args[0])
    stop = tr.to_col(args[1])
    step = tr.to_col(args[2]) if len(args) > 2 else F.lit(1)
    return F.sequence(start, stop, step)


# ----------------------------------------------------------------- conversion


def _conv(target: str):
    int_target = target in ("int", "bigint")

    def impl(tr, args):
        c = tr.to_col(args[0])
        out = c.try_cast(target)
        if not int_target:
            return out
        dt = tr.dtype_of_ast(args[0], c)
        if not isinstance(dt, T.StringType):
            return out
        # Kusto integer conversions accept 0x hex strings [KQL]. A string
        # matching the hex pattern always plain-casts to null (the literal
        # 'x' defeats try_cast), so the hex branch only needs evaluating
        # when `out` is null — coalesce keeps the expensive operand
        # references (codegen does NO cross-branch subexpression
        # elimination, so each one re-evaluates e.g. a get_json_object
        # operand per row) off the common path: 1 evaluation per row
        # instead of 4 (measured 2.3x on the b7 JSON bench query).
        s = F.trim(c)
        mag = F.regexp_extract(s, r"^[+-]?0[xX]([0-9a-fA-F]+)$", 1)
        sign = (
            F.when(F.startswith(s, F.lit("-")), F.lit(-1))
            .otherwise(F.lit(1))
            .cast("bigint")
        )
        hexv = (F.conv(mag, 16, 10).try_cast("bigint") * sign).try_cast(target)
        return F.coalesce(out, F.when(mag != "", hexv))

    return impl


for _k, _t in [
    ("tobool", "boolean"), ("toboolean", "boolean"), ("toint", "int"),
    ("tolong", "bigint"), ("todouble", "double"), ("toreal", "double"),
    ("todecimal", "decimal(38,18)"),
]:
    REGISTRY[_k] = _conv(_t)


@fn("tostring")
def _tostring(tr, args):
    c = tr.to_col(args[0])
    dt = tr.dtype_of_ast(args[0], c)
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return F.coalesce(F.to_json(c), F.lit(""))
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.coalesce(
            F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS"), F.lit("")
        )
    if isinstance(dt, T.DayTimeIntervalType):
        # Kusto renders timespans as [d.]hh:mm:ss, not Spark INTERVAL syntax
        return F.coalesce(kql_timespan_string(c), F.lit(""))
    out = c.cast("string")
    return F.coalesce(out, F.lit(""))  # KQL strings are never null [KQL §1.2]


@fn("todatetime")
def _todatetime(tr, args):
    c = tr.to_col(args[0])
    dt = tr.dtype_of(c)
    if not isinstance(dt, T.StringType):
        return c.try_cast("timestamp")
    # Kusto accepts ISO plus common US/RFC/textual forms; Spark's cast is
    # ISO-only, so coalesce over a bounded, documented format list
    s = F.trim(c)
    alt = [
        "MM/dd/yyyy HH:mm:ss", "MM/dd/yyyy", "M/d/yyyy H:mm:ss", "M/d/yyyy",
        "d MMMM yyyy HH:mm:ss", "d MMMM yyyy", "MMMM d, yyyy",
        "MMM d yyyy", "d MMM yyyy",
    ]
    # RFC1123's weekday prefix isn't a parseable Spark pattern — strip it
    rfc = F.regexp_replace(s, r"^[A-Za-z]{3},\s*", "")
    return F.coalesce(
        s.try_cast("timestamp"),
        *[F.try_to_timestamp(s, F.lit(f)) for f in alt],
        F.try_to_timestamp(rfc, F.lit("dd MMM yyyy HH:mm:ss")),
    )


@fn("totimespan")
def _totimespan(tr, args):
    try:
        secs = tr.const_seconds(args[0])
    except KqlSemanticError:
        # unparseable constant: to*() conversions yield null, not an error
        return typed_null("timespan")
    if secs is not None:
        return interval_seconds(secs)
    from ..ast_nodes import Lit as _Lit

    if isinstance(args[0], _Lit) and args[0].ktype == "string":
        # constant '[d.]hh:mm[:ss]' strings decode python-side (Spark's
        # string->interval cast expects the INTERVAL literal grammar)
        from ..translator import _parse_timespan_raw

        raw = str(args[0].value).strip()
        sign = -1.0 if raw.startswith("-") else 1.0
        try:
            s = _parse_timespan_raw(raw.lstrip("+-"))
        except KqlSemanticError:
            s = None
        return (
            interval_seconds(sign * s) if s is not None else typed_null("timespan")
        )
    c = tr.to_col(args[0])
    dt = tr.dtype_of(c)
    if isinstance(dt, T.DayTimeIntervalType):
        return c
    if isinstance(dt, T.StringType):
        # columnar KQL-format parse: [-][d.]hh:mm[:ss[.fffffff]] or a bare
        # number of days (Spark's string->interval cast only accepts the
        # INTERVAL literal grammar, so computed strings need this path)
        s = F.trim(c)
        body = F.regexp_replace(s, r"^[-+]", "")
        neg = F.startswith(s, F.lit("-"))
        pat = r"^(?:(\d+)\.)?(\d{1,2}):(\d{1,2})(?::(\d{1,2})(?:\.(\d+))?)?$"
        part = [F.regexp_extract(body, pat, g) for g in range(6)]
        num = lambda p: F.coalesce(p.try_cast("double"), F.lit(0.0))  # noqa: E731
        frac = F.coalesce(
            F.concat(F.lit("0."), part[5]).try_cast("double"), F.lit(0.0)
        )
        clock = (
            num(part[1]) * 86400
            + num(part[2]) * 3600
            + num(part[3]) * 60
            + num(part[4])
            + frac
        )
        secs_col = (
            F.when(F.regexp_like(body, F.lit(pat)), clock)
            .when(
                F.regexp_like(body, F.lit(r"^\d+(\.\d+)?$")),
                body.try_cast("double") * 86400,  # bare number = days [KQL]
            )
            .otherwise(F.lit(None))
        )
        secs_col = F.when(neg, -secs_col).otherwise(secs_col)
        return F.when(
            secs_col.isNotNull(), F.make_dt_interval(secs=secs_col)
        ).otherwise(typed_null("timespan"))
    return c.try_cast("interval day to second")


simple("toguid")(lambda c: F.lower(c.cast("string")))


@fn("todynamic", "parse_json")
def _todynamic(tr, args):
    # dynamic carrier = JSON string (SURVEY.md §1.1 fallback representation);
    # property access dispatches on carrier type in the translator
    c = tr.to_col(args[0])
    return c.cast("string")


@fn("gettype")
def _gettype(tr, args):
    c = tr.to_col(args[0])
    return F.lit(kql_type_name(tr.dtype_of_ast(args[0], c)))


# ---------------------------------------------------------------- conditional


@fn("iff", "iif")
def _iff(tr, args):
    return F.when(tr.to_col(args[0]), tr.to_col(args[1])).otherwise(tr.to_col(args[2]))


@fn("case")
def _case(tr, args):
    out = None
    i = 0
    while i + 1 < len(args):
        pred = tr.to_col(args[i])
        val = tr.to_col(args[i + 1])
        out = F.when(pred, val) if out is None else out.when(pred, val)
        i += 2
    if i < len(args):
        out = out.otherwise(tr.to_col(args[i]))
    return out


@fn("not")
def _not(tr, args):
    return ~tr.to_col(args[0])


# ------------------------------------------------------------- arrays / bags

@fn("array_length")
def _array_length(tr, args):
    """array_length [KQL]: null for null/non-array input. Accepts both
    dynamic carriers — native array<> (F.size) and JSON text
    (json_array_length, which yields null for non-array JSON)."""
    c = tr.to_col(args[0])
    dt = tr.dtype_of_ast(args[0], c)
    if isinstance(dt, T.StringType):
        return F.json_array_length(c)
    return F.when(c.isNotNull(), F.size(c))
simple("array_concat")(F.concat)
simple("array_reverse")(F.reverse)
@fn("pack_array")
def _pack_array(tr, args):
    """pack_array(...) [KQL]: heterogeneously-typed operands fall back to
    the JSON-text dynamic carrier (native array<> needs one element type);
    homogeneous stays a native array."""
    cols = [tr.to_col(a) for a in args]
    kinds = set()
    for a, c in zip(args, cols):
        dt = tr.dtype_of_ast(a, c)
        kinds.add(
            "num" if isinstance(
                dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                     T.FloatType, T.DoubleType, T.DecimalType)
            ) else dt.simpleString()
        )
    if len(kinds) <= 1:
        return F.array(*cols)
    parts = []
    for a, c in zip(args, cols):
        dt = tr.dtype_of_ast(a, c)
        if isinstance(dt, T.StringType):
            esc = F.regexp_replace(
                F.regexp_replace(c, r"\\", r"\\\\"), '"', '\\"'
            )
            j = F.concat(F.lit('"'), esc, F.lit('"'))
        elif isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
            j = F.to_json(c)
        else:
            j = c.cast("string")
        parts.append(F.coalesce(j, F.lit("null")))
    body = F.concat_ws(",", *parts)
    return F.concat(F.lit("["), body, F.lit("]"))
simple("set_has_element")(lambda a, v: F.array_contains(a, v))
simple("set_union")(lambda *a: F.array_sort(_fold(F.array_union, a)))
simple("set_intersect")(lambda *a: F.array_sort(_fold(F.array_intersect, a)))
simple("set_difference")(lambda *a: F.array_sort(F.array_except(a[0], _fold(F.array_union, a[1:])) if len(a) > 1 else a[0]))
def _array_sort_struct_builder(asc: bool):
    """[KQL array_sort_asc/desc(array1, ..., [nulls_last])] — sort array1,
    reorder the companion arrays by the same permutation. Pure JVM HOFs:
    index sequence -> struct zip -> array_sort with a comparator (stable via
    index tiebreak; Kusto default nulls last) -> per-array field extraction.
    Companions of a different length come back null [KQL]."""

    def build(tr, args):
        from ..ast_nodes import Lit as _Lit

        nulls_last = True
        arr_args = list(args)
        if arr_args and isinstance(arr_args[-1], _Lit) and isinstance(
            arr_args[-1].value, bool
        ):
            nulls_last = bool(arr_args[-1].value)
            arr_args = arr_args[:-1]
        arrs = [tr.to_col(a) for a in arr_args]
        a1 = arrs[0]
        idx = F.sequence(F.lit(0), F.size(a1) - 1)
        elem = lambda i: F.struct(  # noqa: E731
            F.element_at(a1, i + 1).alias("k"),
            i.alias("i"),
            *[
                F.element_at(arrs[j], i + 1).alias(f"v{j}")
                for j in range(1, len(arrs))
            ],
        )
        zipped = F.transform(idx, elem)
        null_side = F.lit(1 if nulls_last else -1)
        lo, hi = (-1, 1) if asc else (1, -1)

        def cmp(left, right):
            lk, rk = left["k"], right["k"]
            return (
                F.when(
                    lk.isNull() & rk.isNull(),
                    F.when(left["i"] < right["i"], -1).otherwise(1),
                )
                .when(lk.isNull(), null_side)
                .when(rk.isNull(), -null_side)
                .when(lk < rk, F.lit(lo))
                .when(lk > rk, F.lit(hi))
                .otherwise(F.when(left["i"] < right["i"], -1).otherwise(1))
                .cast("int")
            )

        srt = F.array_sort(zipped, cmp)

        def field_getter(fname):
            # closure factory: a default param on the lambda would make the
            # transform HOF pass the element index into it
            return lambda s: s[fname]

        outs = [F.transform(srt, field_getter("k"))]
        for j in range(1, len(arrs)):
            outs.append(
                F.when(
                    F.size(arrs[j]) == F.size(a1),
                    F.transform(srt, field_getter(f"v{j}")),
                )
            )
        return F.struct(*[c.alias(f"a{j}") for j, c in enumerate(outs)])

    return build


_array_sort_asc_struct = _array_sort_struct_builder(asc=True)
_array_sort_desc_struct = _array_sort_struct_builder(asc=False)


def _array_sort_single(asc: bool):
    def impl(tr, args):
        struct = (_array_sort_asc_struct if asc else _array_sort_desc_struct)(
            tr, args
        )
        return struct.getField("a0")

    return impl


REGISTRY["array_sort_asc"] = _array_sort_single(asc=True)
REGISTRY["array_sort_desc"] = _array_sort_single(asc=False)
simple("array_sum")(lambda c: F.aggregate(c, F.lit(0.0), lambda s, x: s + x.cast("double")))
simple("array_avg")(
    lambda c: F.aggregate(c, F.lit(0.0), lambda s, x: s + x.cast("double")) / F.size(c)
)
simple("array_min")(F.array_min)
simple("array_max")(F.array_max)
simple("repeat")(lambda v, n: F.array_repeat(v, n.cast("int")))
simple("zip")(F.arrays_zip)
def _bag_as_json(tr, ast, col):
    """Dynamic bags have two carriers: MAP/STRUCT/ARRAY columns (from
    dynamic() literals / pack()) and JSON text (from parquet/parse_json).
    Normalize to JSON text for key-level operations."""
    dt = tr.dtype_of_ast(ast, col)
    if isinstance(dt, (T.MapType, T.StructType, T.ArrayType)):
        return F.to_json(col)
    return col.cast("string")


@fn("bag_keys")
def _bag_keys_fn(tr, args):
    return F.json_object_keys(_bag_as_json(tr, args[0], tr.to_col(args[0])))


simple("jaccard_index")(
    lambda a, b: F.size(F.array_intersect(a, b)).cast("double") / F.size(F.array_union(a, b))
)


def _fold(f, cols):
    out = cols[0]
    for c in cols[1:]:
        out = f(out, c)
    return out


@fn("array_slice")
def _array_slice(tr, args):
    a = tr.to_col(args[0])
    lo = tr.to_col(args[1]).cast("int")
    hi = tr.to_col(args[2]).cast("int")
    n = F.size(a)
    lo_n = F.when(lo < 0, F.greatest(n + lo, F.lit(0))).otherwise(lo)
    hi_n = F.when(hi < 0, n + hi).otherwise(F.least(hi, n - 1))
    length = hi_n - lo_n + F.lit(1)
    return F.when(length > 0, F.slice(a, lo_n + F.lit(1), length)).otherwise(F.array())


@fn("array_index_of")
def _array_index_of(tr, args):
    """array_index_of(arr, value[, start[, length[, occurrence]]]) —
    0-based, -1 not found [KQL]. start < 0 offsets from the end; length -1
    = rest; occurrence selects the k-th match."""
    a = tr.to_col(args[0])
    v = tr.to_col(args[1])
    if len(args) <= 2:
        return F.array_position(a, v).cast("bigint") - F.lit(1)
    start0 = tr.to_col(args[2]).cast("int")
    start0 = F.when(start0 < 0, F.greatest(F.size(a) + start0, F.lit(0))).otherwise(start0)
    length = tr.to_col(args[3]).cast("int") if len(args) >= 4 else F.lit(-1)
    occ = tr.to_col(args[4]).cast("int") if len(args) >= 5 else F.lit(1)
    end = F.when(length < 0, F.size(a)).otherwise(F.least(start0 + length, F.size(a)))
    positions = F.filter(
        F.when(end >= start0 + 1, F.sequence(start0 + F.lit(1), end)).otherwise(
            F.array().cast("array<int>")
        ),
        lambda i: F.element_at(a, i) == v,
    )
    hit = F.get(positions, occ - F.lit(1))
    return F.coalesce(hit - F.lit(1), F.lit(-1)).cast("bigint")


@fn("array_rotate_left")
def _array_rotate_left(tr, args):
    a = tr.to_col(args[0])
    n = tr.to_col(args[1]).cast("int")
    sz = F.size(a)
    k = F.pmod(n, sz)
    return F.concat(F.slice(a, k + F.lit(1), sz - k), F.slice(a, F.lit(1), k))


@fn("array_rotate_right")
def _array_rotate_right(tr, args):
    a = tr.to_col(args[0])
    n = tr.to_col(args[1]).cast("int")
    sz = F.size(a)
    k = F.pmod(-n, sz)
    return F.concat(F.slice(a, k + F.lit(1), sz - k), F.slice(a, F.lit(1), k))


@fn("array_shift_left")
def _array_shift_left(tr, args):
    a = tr.to_col(args[0])
    n = tr.to_col(args[1]).cast("int")
    fill = tr.to_col(args[2]) if len(args) > 2 else F.lit(None)
    sz = F.size(a)
    shifted = F.when(n >= 0, F.concat(F.slice(a, n + F.lit(1), sz - n), F.array_repeat(fill, n))).otherwise(
        F.concat(F.array_repeat(fill, -n), F.slice(a, F.lit(1), sz + n))
    )
    return shifted


@fn("array_shift_right")
def _array_shift_right(tr, args):
    neg = tr.to_col(args[1]).cast("int") * F.lit(-1)
    a = tr.to_col(args[0])
    fill = tr.to_col(args[2]) if len(args) > 2 else F.lit(None)
    sz = F.size(a)
    n = neg
    return F.when(n >= 0, F.concat(F.slice(a, n + F.lit(1), sz - n), F.array_repeat(fill, n))).otherwise(
        F.concat(F.array_repeat(fill, -n), F.slice(a, F.lit(1), sz + n))
    )


@fn("array_iff", "array_if")
def _array_iff(tr, args):
    cond = tr.to_col(args[0])
    # arrays_zip names struct fields after its inputs -> alias explicitly
    a = tr.to_col(args[1]).alias("l")
    b = tr.to_col(args[2]).alias("r")
    return F.zip_with(
        cond, F.arrays_zip(a, b), lambda c, ab: F.when(c, ab["l"]).otherwise(ab["r"])
    )


@fn("pack", "bag_pack", "pack_dictionary")
def _pack(tr, args):
    pairs = []
    for i in range(0, len(args) - 1, 2):
        pairs.append(tr.to_col(args[i]).cast("string"))
        pairs.append(tr.to_col(args[i + 1]))
    return F.to_json(F.create_map(*pairs))


@fn("pack_all")
def _pack_all(tr, args):
    # engine-internal helper columns (__kql*, __row_order*) never escape to
    # the user — pack only the visible columns when the frame is known
    df = getattr(tr, "df", None)
    if df is not None:
        cols = [
            c for c in df.columns
            if not c.startswith(("__kql", "__row_order"))
        ]
        return F.to_json(F.struct(*cols))
    return F.to_json(F.struct("*"))


def _bag_json_str(tr, a) -> Column:
    """Bag argument -> JSON text, whichever carrier it arrives in (native
    MAP/STRUCT columns stringify via to_json — a plain cast is NOT JSON)."""
    c = tr.to_col(a)
    dt = tr.dtype_of_ast(a, c)
    if isinstance(dt, (T.MapType, T.StructType, T.ArrayType)):
        return F.to_json(c)
    return c.cast("string")


@fn("bag_merge")
def _bag_merge(tr, args):
    # parse either carrier to map<string,string>, merge left-to-right
    maps = [
        F.from_json(_bag_json_str(tr, a), "map<string,string>") for a in args
    ]
    out = maps[-1]
    for m in reversed(maps[:-1]):
        out = F.map_concat(F.map_filter(out, lambda k, v: ~F.map_contains_key(m, k)), m)
    return F.to_json(out)


@fn("bag_remove_keys")
def _bag_remove_keys(tr, args):
    m = F.from_json(_bag_json_str(tr, args[0]), "map<string,string>")
    keys = tr.to_col(args[1])
    kdt = tr.dtype_of_ast(args[1], keys)
    if isinstance(kdt, T.StringType):  # JSON-text array carrier
        keys = F.from_json(keys, "array<string>")
    else:
        keys = keys.cast("array<string>")
    return F.to_json(F.map_filter(m, lambda k, v: ~F.array_contains(keys, k)))


@fn("dynamic_to_json")
def _dynamic_to_json(tr, args):
    c = tr.to_col(args[0])
    dt = tr.dtype_of_ast(args[0], c)
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return F.to_json(c)
    return c.cast("string")


@fn("dcount_hll")
def _dcount_hll(tr, args):
    """Read the distinct-count estimate out of an hll()/hll_merge()
    DataSketches sketch [KQL §2.6]."""
    return F.hll_sketch_estimate(tr.to_col(args[0]))


@fn("hll_merge")
def _hll_merge_scalar(tr, args):
    """Row-wise merge of two+ hll sketches (Kusto's scalar hll_merge).
    The aggregate form of the same name lives in AGG_REGISTRY and wins
    inside summarize; this one applies in extend/project context."""
    out = tr.to_col(args[0])
    for a in args[1:]:
        out = F.hll_union(out, tr.to_col(a), True)
    return out


@fn("strcat_array", "array_strcat")
def _strcat_array(tr, args):
    a = tr.to_col(args[0])
    delim = tr.const_string(args[1])
    return F.array_join(a.cast("array<string>"), delim)


# --------------------------------------------------------------------- IP/geo


@fn("parse_ipv4")
def _parse_ipv4(tr, args):
    s = tr.to_col(args[0])
    p = F.split(s, r"\.")
    return (
        F.element_at(p, 1).try_cast("bigint") * F.lit(16777216)
        + F.element_at(p, 2).try_cast("bigint") * F.lit(65536)
        + F.element_at(p, 3).try_cast("bigint") * F.lit(256)
        + F.split(F.element_at(p, 4), "/").getItem(0).try_cast("bigint")
    )


@fn("format_ipv4")
def _format_ipv4(tr, args):
    v = tr.to_col(args[0]).cast("bigint")
    return F.concat_ws(
        ".",
        (F.floor(v / 16777216) % 256).cast("string"),
        (F.floor(v / 65536) % 256).cast("string"),
        (F.floor(v / 256) % 256).cast("string"),
        (v % 256).cast("string"),
    )


@fn("ipv4_is_in_range")
def _ipv4_is_in_range(tr, args):
    ip = REGISTRY["parse_ipv4"](tr, [args[0]])
    rng = tr.const_string(args[1])
    if "/" in rng:
        base, bits = rng.split("/")
        mask = (0xFFFFFFFF << (32 - int(bits))) & 0xFFFFFFFF
    else:
        base, mask = rng, 0xFFFFFFFF
    parts = [int(x) for x in base.split(".")]
    base_v = parts[0] * 16777216 + parts[1] * 65536 + parts[2] * 256 + parts[3]
    return (F.floor(ip / F.lit(2 ** 32 - mask - 1 + 1)).cast("bigint") * F.lit(0) + ip).bitwiseAND(
        F.lit(mask)
    ) == F.lit(base_v & mask)


# ---------------------------------------------------------------- IPv6 family
# Canonicalization (:: expansion, embedded IPv4 mapping, masking) is not
# sanely expressible as column expressions; these are Arrow-batched pandas
# UDFs over the stdlib `ipaddress` module (vectorized per batch, never
# row-at-a-time Python in the JVM sense). IPv4 inputs map into
# ::ffff:a.b.c.d per the public KQL contract, so ipv6_compare("192.168.1.1",
# "::ffff:c0a8:0101") == 0.


def _ipv6_value(s, default_prefix=128):
    """(128-bit int, prefix) or (None, None). Accepts an optional /n
    suffix and bare IPv4 (mapped)."""
    import ipaddress

    if s is None:
        return None, None
    s = str(s).strip()
    prefix = None
    if "/" in s:
        s, _, p = s.partition("/")
        try:
            prefix = int(p)
        except ValueError:
            return None, None
    try:
        ip = ipaddress.ip_address(s)
    except ValueError:
        return None, None
    if isinstance(ip, ipaddress.IPv4Address):
        if prefix is not None:
            # a /n on an IPv4 literal counts IPv4 bits -> shift into the
            # mapped ::ffff:a.b.c.d address space
            prefix += 96
        ip = ipaddress.IPv6Address(int(ip) + (0xFFFF << 32))
    if prefix is None:
        prefix = default_prefix
    return int(ip), max(0, min(prefix, 128))


def _ipv6_masked(v, prefix):
    return v & ~((1 << (128 - prefix)) - 1) if prefix < 128 else v


def _ipv6_prefix_int(pf):
    """Null ints reach pandas UDFs as float NaN; normalize to None so the
    null-in -> null-out contract holds instead of int(NaN) crashing."""
    import math

    if pf is None or (isinstance(pf, float) and math.isnan(pf)):
        return None
    return max(0, min(int(pf), 128))


def _ipv6_udf(kind):
    key = f"ipv6:{kind}"
    if key in _PANDAS_UDF_CACHE:
        return _PANDAS_UDF_CACHE[key]
    from pyspark.sql.functions import pandas_udf

    def exploded(v):
        import ipaddress

        return ipaddress.IPv6Address(v).exploded

    if kind == "norm":

        @pandas_udf("string")
        def udf(s):
            def one(x):
                v, _ = _ipv6_value(x)
                return None if v is None else exploded(v)

            return s.map(one)

    elif kind == "mask":

        @pandas_udf("string")
        def udf(s, p):
            def one(x, pf):
                v, vp = _ipv6_value(x)
                pf = _ipv6_prefix_int(pf)
                if v is None or pf is None:
                    return None
                # honor the tighter of the argument and any /n in the text
                return exploded(_ipv6_masked(v, min(pf, vp)))

            return s.combine(p, one)

    elif kind == "cmp":

        @pandas_udf("long")
        def udf(a, b, p):
            def one(x, y, pf):
                vx, px = _ipv6_value(x)
                vy, py = _ipv6_value(y)
                pf = _ipv6_prefix_int(pf)
                if vx is None or vy is None or pf is None:
                    return None
                pf = min(pf, px, py)
                vx, vy = _ipv6_masked(vx, pf), _ipv6_masked(vy, pf)
                return -1 if vx < vy else (1 if vx > vy else 0)

            import pandas as pd

            return pd.Series(
                [one(x, y, pf) for x, y, pf in zip(a, b, p)], dtype="object"
            )

    else:  # inrange: the range's own /n is the prefix

        @pandas_udf("boolean")
        def udf(a, rng):
            def one(x, r):
                vx, _ = _ipv6_value(x)
                vr, pr = _ipv6_value(r)
                if vx is None or vr is None:
                    return None
                return _ipv6_masked(vx, pr) == _ipv6_masked(vr, pr)

            return a.combine(rng, one)

    _PANDAS_UDF_CACHE[key] = udf
    return udf


@fn("parse_ipv6")
def _parse_ipv6(tr, args):
    return _ipv6_udf("norm")(tr.to_col(args[0]).cast("string"))


@fn("parse_ipv6_mask")
def _parse_ipv6_mask(tr, args):
    return _ipv6_udf("mask")(
        tr.to_col(args[0]).cast("string"), tr.to_col(args[1]).cast("int")
    )


@fn("ipv6_compare")
def _ipv6_compare(tr, args):
    p = tr.to_col(args[2]).cast("int") if len(args) > 2 else F.lit(128)
    return _ipv6_udf("cmp")(
        tr.to_col(args[0]).cast("string"), tr.to_col(args[1]).cast("string"), p
    )


@fn("ipv6_is_match")
def _ipv6_is_match(tr, args):
    p = tr.to_col(args[2]).cast("int") if len(args) > 2 else F.lit(128)
    cmp = _ipv6_udf("cmp")(
        tr.to_col(args[0]).cast("string"), tr.to_col(args[1]).cast("string"), p
    )
    return cmp == F.lit(0)


@fn("ipv6_is_in_range")
def _ipv6_is_in_range(tr, args):
    return _ipv6_udf("inrange")(
        tr.to_col(args[0]).cast("string"), tr.to_col(args[1]).cast("string")
    )


@fn("ipv6_is_in_any_range")
def _ipv6_is_in_any_range(tr, args):
    from ..ast_nodes import Lit as _Lit, TypedLit as _TypedLit
    from ..semantics import parse_dynamic_literal

    ip = tr.to_col(args[0]).cast("string")
    ranges: list = []
    for a in args[1:]:
        if isinstance(a, _TypedLit) and a.ktype == "dynamic":
            ranges.extend(
                _Lit(str(v), "string") for v in parse_dynamic_literal(a.raw)
            )
        else:
            ranges.append(a)
    out = F.lit(None).cast("boolean")
    hit = F.lit(False)
    seen_null = F.lit(False)
    for a in ranges:
        r = _ipv6_udf("inrange")(ip, tr.to_col(a).cast("string"))
        hit = hit | F.coalesce(r, F.lit(False))
        seen_null = seen_null | r.isNull()
    # true if any range matches; null if nothing matched but a range failed
    # to parse; false otherwise [KQL]
    return F.when(hit, F.lit(True)).otherwise(
        F.when(seen_null, out).otherwise(F.lit(False))
    )


@fn("geo_distance_2points")
def _geo_distance(tr, args):
    lon1, lat1, lon2, lat2 = [tr.to_col(a).cast("double") for a in args]
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    h = F.sin(dlat) * F.sin(dlat) + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    return F.lit(2.0 * 6371009.0) * F.asin(F.sqrt(h))


# ------------------------------------------------------------ typed-null ctor


def typed_null(ktype: str) -> Column:
    return F.lit(None).cast(KQL_CAST_NAME.get(ktype, "string"))


# ------------------------------------------------------- series_* (SURVEY §2.10)
# All elementwise/reduction series ops are higher-order functions (JVM-side,
# codegen) over array<double> columns produced by make-series; only
# interpolation/decomposition drop to Arrow-batched pandas UDFs below.


def _as_dseries(c: Column) -> Column:
    return c.cast("array<double>")


def _series_zip(op):
    def impl(a: Column, b: Column) -> Column:
        return F.zip_with(_as_dseries(a), _as_dseries(b), op)

    return impl


simple("series_add")(_series_zip(lambda x, y: x + y))
simple("series_subtract")(_series_zip(lambda x, y: x - y))
simple("series_multiply")(_series_zip(lambda x, y: x * y))
simple("series_divide")(_series_zip(lambda x, y: x / y))
simple("series_greater")(_series_zip(lambda x, y: x > y))
simple("series_less")(_series_zip(lambda x, y: x < y))
simple("series_equals")(_series_zip(lambda x, y: x == y))
simple("series_abs")(lambda a: F.transform(_as_dseries(a), F.abs))
simple("series_sign")(lambda a: F.transform(_as_dseries(a), lambda x: F.signum(x)))
simple("series_exp")(lambda a: F.transform(_as_dseries(a), F.exp))
simple("series_log")(lambda a: F.transform(_as_dseries(a), F.log))
simple("series_sum")(
    lambda a: F.aggregate(_as_dseries(a), F.lit(0.0), lambda s, x: s + F.coalesce(x, F.lit(0.0)))
)


def _series_stats_struct(a: Column, ignore_nonfinite: bool = False) -> Column:
    """KQL series_stats(a [, ignore_nonfinite]) -> {min, min_idx, max,
    max_idx, avg, stdev, variance}. Indices are 0-based and refer to the
    ORIGINAL series [KQL]. With the default ignore_nonfinite=false, a
    series containing null/NaN/inf yields a null result (the documented
    Kusto contract); with true, non-finite elements are dropped before
    computing the statistics."""
    finite = F.filter(
        a,
        lambda x: x.isNotNull()
        & ~F.isnan(x)
        & (F.abs(x) < F.lit(float("inf"))),
    )
    src = finite if ignore_nonfinite else a
    n = F.size(src).cast("double")
    total = F.aggregate(src, F.lit(0.0), lambda s, x: s + x)
    avg = total / n
    mn = F.array_min(src)
    mx = F.array_max(src)
    # round 15 (codegen-fallback audit): HOF lambdas are interpreted, so
    # an aggregate-derived scalar referenced INSIDE a fold lambda is
    # re-evaluated per element — `s + (x - avg)^2` with avg = total/n
    # re-ran the total fold for every x (O(len^2) per row; measured 26x
    # on 256-bucket series). Stage the scalar in the fold's INITIAL
    # accumulator instead: the zero expression evaluates once per row,
    # and the merge reads it as a lambda variable. The accumulation
    # sequence (s + (x-avg)*(x-avg), left to right) is unchanged, so
    # results are bit-identical (verified elementwise on 100k rows).
    var = F.aggregate(
        src,
        F.struct(avg.alias("m"), F.lit(0.0).alias("s")),
        lambda acc, x: F.struct(
            acc["m"].alias("m"),
            (acc["s"] + (x - acc["m"]) * (x - acc["m"])).alias("s"),
        ),
    )["s"] / (n - F.lit(1.0))
    out = F.struct(
        mn.alias("min"),
        (F.array_position(a, mn) - F.lit(1)).alias("min_idx"),
        mx.alias("max"),
        (F.array_position(a, mx) - F.lit(1)).alias("max_idx"),
        avg.alias("avg"),
        F.sqrt(var).alias("stdev"),
        var.alias("variance"),
    )
    if ignore_nonfinite:
        return out
    # default: any non-finite element voids the whole result [KQL]
    return F.when(F.size(finite) == F.size(a), out)


def _series_stats_args(tr, args) -> Column:
    ignore = bool(tr.const_value(args[1])) if len(args) > 1 else False
    return _series_stats_struct(_as_dseries(tr.to_col(args[0])), ignore)


@fn("series_stats_dynamic")
def _series_stats_dynamic(tr, args):
    """Bag form (JSON-text dynamic carrier) of series_stats [KQL]."""
    return F.to_json(_series_stats_args(tr, args))


@fn("series_fill_const")
def _series_fill_const(tr, args):
    a = _as_dseries(tr.to_col(args[0]))
    v = tr.to_col(args[1]).cast("double") if len(args) > 1 else F.lit(0.0)
    return F.transform(a, lambda x: F.coalesce(x, v))


def _fill_forward(a: Column) -> Column:
    # running last-non-null via array-accumulating aggregate (arrays are
    # make-series sized: small per row)
    return F.aggregate(
        a,
        F.array().cast("array<double>"),
        lambda acc, x: F.concat(acc, F.array(F.coalesce(x, F.element_at(acc, -1)))),
    )


simple("series_fill_forward")(lambda a: _fill_forward(_as_dseries(a)))
simple("series_fill_backward")(
    lambda a: F.reverse(_fill_forward(F.reverse(_as_dseries(a))))
)


def _fit_line_struct(y: Column) -> Column:
    """Least-squares line over y with x = 0..n-1 [KQL series_fit_line]:
    struct {slope, interception, rsquare, variance, rvariance, line_fit}."""
    n = F.size(y).cast("double")
    sx = (n - 1.0) * n / 2.0
    sxx = (n - 1.0) * n * (2.0 * n - 1.0) / 6.0
    sy = F.aggregate(y, F.lit(0.0), lambda s, v: s + v)
    # sum of i*y_i via index-aware transform then reduce
    ixy = F.aggregate(
        F.zip_with(
            F.transform(y, lambda v, i: i.cast("double")), y, lambda i, v: i * v
        ),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    denom = n * sxx - sx * sx
    slope = (n * ixy - sx * sy) / denom
    intercept = (sy - slope * sx) / n
    mean = sy / n
    # round 15 (codegen-fallback audit): the old line_fit transform
    # referenced slope/intercept — each an aggregate-derived scalar —
    # per ELEMENT, and the var/rvar folds referenced mean/line the same
    # way; interpreted HOF evaluation re-ran those folds per element
    # (O(len^2) per row: 3.5 ms/row on 256-bucket series, 351 s for
    # 100k rows). One fold now carries the once-evaluated scalars in
    # its initial accumulator and builds line/var/rvar in a single
    # pass. Per-step float ops and their order are IDENTICAL to the
    # old tree (fit = intercept + slope*i; v += (y-mean)^2;
    # rv += (y-fit)^2, each accumulated left to right), so every output
    # field is bit-identical. The concat-grown line array is O(len^2)
    # MEMCPY of raw doubles — bounded by make-series sizes and strictly
    # cheaper than the expression re-evaluation it replaces.
    acc0 = F.struct(
        slope.alias("s"),
        intercept.alias("b"),
        mean.alias("m"),
        F.array().cast("array<double>").alias("line"),
        F.lit(0.0).alias("v"),
        F.lit(0.0).alias("rv"),
    )

    def _step(acc, v):
        fit = acc["b"] + acc["s"] * F.size(acc["line"]).cast("double")
        return F.struct(
            acc["s"].alias("s"),
            acc["b"].alias("b"),
            acc["m"].alias("m"),
            F.concat(acc["line"], F.array(fit)).alias("line"),
            (acc["v"] + (v - acc["m"]) * (v - acc["m"])).alias("v"),
            (acc["rv"] + (v - fit) * (v - fit)).alias("rv"),
        )

    st = F.aggregate(y, acc0, _step)
    var = st["v"] / n
    rvar = st["rv"] / n
    rsq = F.when(var > 0, F.lit(1.0) - rvar / var).otherwise(F.lit(0.0))
    return F.struct(
        st["s"].alias("slope"),
        st["b"].alias("interception"),
        rsq.alias("rsquare"),
        var.alias("variance"),
        rvar.alias("rvariance"),
        st["line"].alias("line_fit"),
    )


@fn("series_fit_line_dynamic")
def _series_fit_line_dynamic(tr, args):
    """Bag form of the line fit [KQL series_fit_line_dynamic]."""
    return F.to_json(_fit_line_struct(_as_dseries(tr.to_col(args[0]))))


@fn("series_fir")
def _series_fir(tr, args):
    """FIR filter [KQL]: y_i = sum_j f_j * x_(i-j) (+ optional normalize,
    center). Pure HOF — nested aggregate over the filter taps."""
    x = _as_dseries(tr.to_col(args[0]))
    taps = [float(tr.const_value(a)) for a in _dyn_list(tr, args[1])]
    normalize = bool(tr.const_value(args[2])) if len(args) > 2 else all(t >= 0 for t in taps)
    center = bool(tr.const_value(args[3])) if len(args) > 3 else False
    s = sum(taps)
    coef = [t / s for t in taps] if normalize and s != 0 else taps
    offset = len(coef) // 2 if center else 0

    def tap_sum(i):
        out = None
        for j, cval in enumerate(coef):
            idx = i + F.lit(1 + offset - j)
            # element_at rejects index 0 outright -> guard out-of-range taps
            term = (
                F.when(idx >= 1, F.coalesce(F.element_at(x, idx), F.lit(0.0)))
                .otherwise(F.lit(0.0))
                * F.lit(cval)
            )
            out = term if out is None else out + term
        return out

    return F.transform(x, lambda _, i: tap_sum(i))


def _dyn_list(tr, arg):
    from ..ast_nodes import TypedLit
    from ..semantics import parse_dynamic_literal
    from ..ast_nodes import Lit as _Lit

    if isinstance(arg, TypedLit) and arg.ktype == "dynamic":
        return [_Lit(v, "real") for v in parse_dynamic_literal(arg.raw)]
    raise KqlSemanticError("expected a dynamic([...]) literal")


_PANDAS_UDF_CACHE: dict[str, object] = {}


def _np_series_udf(name, fn_impl):
    """Register an Arrow-batched pandas UDF series op (slow path, documented:
    only interpolation/decomposition need per-series numpy). UDF creation is
    LAZY — pandas_udf needs an active SparkSession, which doesn't exist at
    import time."""

    def make():
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<double>")
        def udf(col):
            import numpy as np

            def one(a):
                if a is None:
                    return None
                return fn_impl(np.asarray(a, dtype="float64")).tolist()

            return col.map(one)

        return udf

    def entry(tr, args):
        if name not in _PANDAS_UDF_CACHE:
            _PANDAS_UDF_CACHE[name] = make()
        return _PANDAS_UDF_CACHE[name](_as_dseries(tr.to_col(args[0])))

    REGISTRY[name] = entry


def _fill_linear(a):
    import numpy as np

    y = a.copy()
    nans = np.isnan(y)
    if nans.all():
        return y
    idx = np.arange(len(y))
    y[nans] = np.interp(idx[nans], idx[~nans], y[~nans])
    return y


_np_series_udf("series_fill_linear", _fill_linear)


def _outlier_scores(y):
    import numpy as np

    q1, q3 = np.nanpercentile(y, [25, 75])
    iqr = q3 - q1
    if iqr <= 0:
        return np.zeros_like(y)
    # Tukey fence score, Kusto-style: distance beyond the fence in IQRs
    upper = q3 + 1.5 * iqr
    lower = q1 - 1.5 * iqr
    return np.where(
        y > upper, (y - upper) / iqr, np.where(y < lower, (y - lower) / iqr, 0.0)
    )


_np_series_udf("series_outliers", _outlier_scores)


# ------------------------------------------- streaming windows (SURVEY §2.11)
# KQL's bin() is the tumbling window; hopping/session have no KQL syntax, so
# they are exposed as extension functions usable in `summarize ... by`.
# Both work identically on batch DataFrames (the batch twin is the oracle).


# GPT-2-style pre-tokenizer (engine extension for training-data token
# budgeting): contraction suffixes, space-prefixed letter/digit/punct runs,
# whitespace runs. RE2-compatible (no lookarounds — the upstream \s+(?!\S)
# tail merge is dropped, documented delta) so the DuckDB oracle runs the
# IDENTICAL pattern.
_BPE_PRETOKEN_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


@fn("count_tokens")
def _count_tokens(tr, args):
    """count_tokens(text) — BPE-pre-tokenizer token count (extension; Kusto
    has no tokenizer). JVM-side regexp_extract_all, no UDF."""
    c = tr.to_col(args[0]).cast("string")
    n = F.size(F.regexp_extract_all(c, F.lit(_BPE_PRETOKEN_RE), F.lit(0)))
    return F.when(c.isNotNull(), F.greatest(n, F.lit(0)).cast("bigint"))


@fn("bpe_tokens")
def _bpe_tokens(tr, args):
    """bpe_tokens(text) — the pre-tokenizer's token array (extension)."""
    c = tr.to_col(args[0]).cast("string")
    return F.regexp_extract_all(c, F.lit(_BPE_PRETOKEN_RE), F.lit(0))


@fn("hopping_window")
def _hopping_window(tr, args):
    ts = tr.to_col(args[0])
    dur = tr.const_seconds(args[1])
    slide = tr.const_seconds(args[2])
    return F.window(ts, f"{dur} seconds", f"{slide} seconds")


@fn("tumbling_window")
def _tumbling_window(tr, args):
    ts = tr.to_col(args[0])
    dur = tr.const_seconds(args[1])
    return F.window(ts, f"{dur} seconds")


@fn("session_window")
def _session_window(tr, args):
    ts = tr.to_col(args[0])
    gap = tr.const_seconds(args[1])
    return F.session_window(ts, f"{gap} seconds")


@fn("percentile_tdigest")
def _percentile_tdigest(tr, args):
    """Read the p-th percentile from a tdigest() sketch (DataSketches KLL
    binary — SURVEY.md §2.6; round 5 replaces the array surrogate)."""
    td = tr.to_col(args[0])
    p = float(tr.const_value(args[1])) / 100.0
    out = F.kll_sketch_get_quantile_double(td, F.lit(p))
    if len(args) >= 3:
        out = out.cast(KQL_CAST_NAME[tr.const_typename(args[2])])
    return out


@fn("percentile_array_tdigest")
def _percentile_array_tdigest(tr, args):
    """percentile_array_tdigest(td, dynamic([p1, p2, ...])) — read several
    percentiles from one tdigest() sketch [KQL §2.6]."""
    from ..ast_nodes import TypedLit as _TypedLit
    from ..semantics import parse_dynamic_literal

    td = tr.to_col(args[0])
    a = args[1]
    if isinstance(a, _TypedLit) and a.ktype == "dynamic":
        ps = parse_dynamic_literal(a.raw)
    else:
        ps = tr.const_value(a)
    if not isinstance(ps, (list, tuple)):
        raise KqlSemanticError(
            "percentile_array_tdigest: second argument must be a dynamic "
            "array of percentiles"
        )
    return F.array(
        *[
            F.kll_sketch_get_quantile_double(td, F.lit(float(p) / 100.0))
            for p in ps
        ]
    )


# ------------------------------- series_decompose family (SURVEY §2.10 B/C)
# Simplified form of Kusto's published approach: per-phase-median seasonal
# component, least-squares linear trend on the deseasonalized series, Tukey
# scores on the residual. Arrow-batched pandas UDFs (per-series numpy) —
# the arrays are make-series sized, so the Python cost is per-group, not
# per-source-row.


def _decompose_parts(y, period):
    import numpy as np

    n = len(y)
    seasonal = np.zeros(n)
    p = int(period)
    if 1 < p <= n:
        phases = np.array([np.nanmedian(y[i::p]) for i in range(p)])
        phases = phases - np.nanmean(phases)
        seasonal = np.tile(phases, n // p + 1)[:n]
    des = y - seasonal
    x = np.arange(n, dtype="float64")
    ok = ~np.isnan(des)
    if ok.sum() >= 2:
        slope, intercept = np.polyfit(x[ok], des[ok], 1)
    else:
        slope, intercept = 0.0, float(np.nanmean(des)) if n else 0.0
    trend = intercept + slope * x
    baseline = seasonal + trend
    residual = y - baseline
    return seasonal, trend, baseline, residual


def _decompose_udf(name, pick):
    """pick(seasonal, trend, baseline, residual, threshold) -> array."""

    def entry(tr, args):
        period = int(tr.const_value(args[1])) if len(args) > 1 else 0
        threshold = float(tr.const_value(args[2])) if len(args) > 2 else 1.5
        key = f"{name}:{period}:{threshold}"
        if key not in _PANDAS_UDF_CACHE:
            from pyspark.sql.functions import pandas_udf

            @pandas_udf("array<double>")
            def udf(col):
                import numpy as np

                def one(a):
                    if a is None:
                        return None
                    y = np.asarray(a, dtype="float64")
                    parts = _decompose_parts(y, period)
                    return pick(*parts, threshold).tolist()

                return col.map(one)

            _PANDAS_UDF_CACHE[key] = udf
        return _PANDAS_UDF_CACHE[key](_as_dseries(tr.to_col(args[0])))

    REGISTRY[name] = entry


def _anomaly_flags(seasonal, trend, baseline, residual, threshold):
    import numpy as np

    scores = _residual_scores(residual)
    return np.where(scores > threshold, 1.0, np.where(scores < -threshold, -1.0, 0.0))


def _residual_scores(residual):
    import numpy as np

    q1, q3 = np.nanpercentile(residual, [25, 75])
    iqr = q3 - q1
    if iqr <= 0:
        return np.zeros_like(residual)
    return np.where(
        residual > 0, (residual - q3) / iqr, (residual - q1) / iqr
    ) * np.where(np.abs(residual) > 0, 1.0, 0.0)


def _detect_periods(y, min_p, max_p, num):
    """Autocorrelation peak detection (SURVEY §2.10 series_periods_detect):
    biased-normalized ACF (decays with lag, so the fundamental beats its
    harmonics), local maxima within [min_p, max_p], top-`num` by score."""
    import numpy as np

    n = len(y)
    if n < 4:
        return [], []
    if np.isnan(y).all():
        return [], []
    y = np.where(np.isnan(y), np.nanmean(y), y)
    y = y - y.mean()
    var = float((y * y).sum())
    if var <= 0:
        return [], []
    hi = int(max_p) if max_p and max_p > 0 else n // 2
    hi = min(hi, n - 2)
    lo = max(2, int(np.ceil(min_p)))
    if lo > hi:
        return [], []
    acf = np.array([float((y[: n - k] * y[k:]).sum()) / var for k in range(hi + 2)])
    cands = []
    for k in range(lo, hi + 1):
        if acf[k] > 0 and acf[k] >= acf[k - 1] and acf[k] >= acf[k + 1]:
            cands.append((acf[k], k))
    cands.sort(key=lambda t: (-t[0], t[1]))
    top = cands[:num]
    return (
        [float(k) for _, k in top],
        [float(min(max(s, 0.0), 1.0)) for s, _ in top],
    )


def _periods_detect_entry(tr, args):
    min_p = float(tr.const_value(args[1])) if len(args) > 1 else 0.0
    max_p = float(tr.const_value(args[2])) if len(args) > 2 else 0.0
    num = int(tr.const_value(args[3])) if len(args) > 3 else 1
    key = f"series_periods_detect:{min_p}:{max_p}:{num}"
    if key not in _PANDAS_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("periods array<double>, scores array<double>")
        def udf(col):
            import numpy as np
            import pandas as pd

            periods, scores = [], []
            for a in col:
                if a is None:
                    periods.append(None)
                    scores.append(None)
                    continue
                p, s = _detect_periods(
                    np.asarray(a, dtype="float64"), min_p, max_p, num
                )
                periods.append(p)
                scores.append(s)
            return pd.DataFrame({"periods": periods, "scores": scores})

        _PANDAS_UDF_CACHE[key] = udf
    return _PANDAS_UDF_CACHE[key](_as_dseries(tr.to_col(args[0])))


REGISTRY["series_periods_detect"] = _periods_detect_entry


def _periods_validate_entry(tr, args):
    """series_periods_validate(series, p1, p2, ...) [KQL §2.10]: scores each
    suspected period with the same biased-normalized ACF that
    series_periods_detect ranks by; returns (periods, scores) arrays."""
    periods = [float(tr.const_value(a)) for a in args[1:]]
    key = f"series_periods_validate:{periods}"
    if key not in _PANDAS_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("periods array<double>, scores array<double>")
        def udf(col):
            import numpy as np
            import pandas as pd

            outp, outs = [], []
            for a in col:
                if a is None:
                    outp.append(None)
                    outs.append(None)
                    continue
                y = np.asarray(a, dtype="float64")
                n = len(y)
                scores = []
                if n >= 4 and not np.isnan(y).all():
                    y = np.where(np.isnan(y), np.nanmean(y), y)
                    y = y - y.mean()
                    var = float((y * y).sum())
                    for p in periods:
                        k = int(round(p))
                        if var <= 0 or k < 2 or k > n - 2:
                            scores.append(0.0)
                            continue
                        acf = float((y[: n - k] * y[k:]).sum()) / var
                        scores.append(min(max(acf, 0.0), 1.0))
                else:
                    scores = [0.0] * len(periods)
                outp.append(list(periods))
                outs.append(scores)
            return pd.DataFrame({"periods": outp, "scores": outs})

        _PANDAS_UDF_CACHE[key] = udf
    return _PANDAS_UDF_CACHE[key](_as_dseries(tr.to_col(args[0])))


REGISTRY["series_periods_validate"] = _periods_validate_entry


@fn("series_decompose_forecast")
def _series_decompose_forecast(tr, args):
    """series_decompose_forecast(y, points[, seasonality]) [KQL §2.10]:
    extend the decomposition baseline `points` steps past the series end —
    the seasonal phase pattern repeats and the linear trend extrapolates.
    Returns the full baseline (n + points values, like Kusto)."""
    points = int(tr.const_value(args[1]))
    period = int(tr.const_value(args[2])) if len(args) > 2 else 0
    key = f"series_decompose_forecast:{points}:{period}"
    if key not in _PANDAS_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<double>")
        def udf(col):
            import numpy as np

            def one(a):
                if a is None:
                    return None
                y = np.asarray(a, dtype="float64")
                n = len(y)
                seasonal, trend, baseline, _res = _decompose_parts(y, period)
                x = np.arange(n, n + points, dtype="float64")
                if n >= 2:
                    slope = trend[-1] - trend[-2]
                else:
                    slope = 0.0
                f_trend = (trend[-1] if n else 0.0) + slope * (x - (n - 1))
                p = int(period)
                if 1 < p <= n:
                    phases = seasonal[:p]
                    f_seasonal = np.array(
                        [phases[int(i) % p] for i in x], dtype="float64"
                    )
                else:
                    f_seasonal = np.zeros(points)
                return np.concatenate([baseline, f_trend + f_seasonal]).tolist()

            return col.map(one)

        _PANDAS_UDF_CACHE[key] = udf
    return _PANDAS_UDF_CACHE[key](_as_dseries(tr.to_col(args[0])))


_decompose_udf("series_decompose_seasonal", lambda s, t, b, r, th: s)
_decompose_udf("series_decompose_trend", lambda s, t, b, r, th: t)
_decompose_udf("series_decompose_baseline", lambda s, t, b, r, th: b)
_decompose_udf("series_decompose_residual", lambda s, t, b, r, th: r)
_decompose_udf("series_decompose_anomalies", _anomaly_flags)


_DECOMP_SCHEMA = (
    "baseline array<double>, seasonal array<double>, trend array<double>, "
    "residual array<double>"
)
_ANOM_SCHEMA = (
    "ad_flag array<double>, ad_score array<double>, baseline array<double>"
)


def _decompose_struct_factory(anomalies: bool):
    """Struct builders backing the multi-valued forms:
    `(baseline, seasonal, trend, residual) = series_decompose(y[, period])`
    and `(ad_flag, ad_score, baseline) = series_decompose_anomalies(...)`
    [KQL] — one UDF evaluation for all components."""

    def build(tr, args):
        period = int(tr.const_value(args[1])) if len(args) > 1 else 0
        threshold = float(tr.const_value(args[2])) if len(args) > 2 else 1.5
        key = f"decomp_struct:{anomalies}:{period}:{threshold}"
        if key not in _PANDAS_UDF_CACHE:
            from pyspark.sql.functions import pandas_udf

            @pandas_udf(_ANOM_SCHEMA if anomalies else _DECOMP_SCHEMA)
            def udf(col):
                import numpy as np
                import pandas as pd

                rows = []
                for a in col:
                    if a is None:
                        rows.append((None, None, None) if anomalies else (None,) * 4)
                        continue
                    y = np.asarray(a, dtype="float64")
                    s, t, b, r = _decompose_parts(y, period)
                    if anomalies:
                        rows.append(
                            (
                                _anomaly_flags(s, t, b, r, threshold).tolist(),
                                _residual_scores(r).tolist(),
                                b.tolist(),
                            )
                        )
                    else:
                        rows.append(
                            (b.tolist(), s.tolist(), t.tolist(), r.tolist())
                        )
                names = (
                    ["ad_flag", "ad_score", "baseline"]
                    if anomalies
                    else ["baseline", "seasonal", "trend", "residual"]
                )
                return pd.DataFrame(rows, columns=names)

            _PANDAS_UDF_CACHE[key] = udf
        return _PANDAS_UDF_CACHE[key](_as_dseries(tr.to_col(args[0])))

    return build


_decompose_struct = _decompose_struct_factory(anomalies=False)
_decompose_anom_struct = _decompose_struct_factory(anomalies=True)


@fn("series_decompose")
def _series_decompose(tr, args):
    """[KQL series_decompose] — single-assign yields the component bag;
    destructure with `(baseline, seasonal, trend, residual) = ...`."""
    return F.to_json(_decompose_struct(tr, args))
_decompose_udf("series_decompose_score", lambda s, t, b, r, th: _residual_scores(r))


def _has_terms(tr, args):
    """Whole-term matches for has_any/has_all (same word-boundary
    approximation as `has` [KQL §2.9]). Terms: scalar constants and/or
    dynamic array literals (`has_any (dynamic(['a', 'b']))` flattens)."""
    from ..ast_nodes import TypedLit as _TypedLit
    from ..semantics import parse_dynamic_literal

    s = tr.to_col(args[0]).cast("string")
    terms: list = []
    for a in args[1:]:
        if isinstance(a, _TypedLit) and a.ktype == "dynamic":
            vals = parse_dynamic_literal(a.raw)
            if not isinstance(vals, (list, tuple)):
                vals = [vals]
            terms.extend(vals)
        else:
            terms.append(tr.const_value(a))
    # contains-prefilter + word-boundary regex, same strict-superset
    # argument as translator._has (round 10); ASCII terms only — lower()
    # is context-sensitive beyond ASCII (Final_Sigma), which would break
    # the superset property
    def _term_match(t: str):
        rx = F.regexp_like(s, F.lit(r"(?i)\b" + _re.escape(t) + r"\b"))
        if t and t.isascii():
            return F.contains(F.lower(s), F.lit(t.lower())) & rx
        return rx

    return [_term_match(str(t)) for t in terms]


@fn("has_any")
def _has_any(tr, args):
    terms = _has_terms(tr, args)
    out = terms[0]
    for t in terms[1:]:
        out = out | t
    return out


@fn("has_all")
def _has_all(tr, args):
    terms = _has_terms(tr, args)
    out = terms[0]
    for t in terms[1:]:
        out = out & t
    return out


@fn("format_timespan")
def _format_timespan(tr, args):
    """format_timespan(ts, fmt) [KQL] — common pattern subset
    (d, dd, h/hh, m/mm, s/ss, fff...): pure column arithmetic."""
    from ..semantics import timespan_seconds_of

    ts = tr.to_col(args[0])
    fmt = tr.const_string(args[1])
    signed = timespan_seconds_of(ts)
    # decompose on |total| — pmod folds negatives into [0, n), which would
    # render -1h as 23h of a wrapped day; Kusto prefixes '-' instead
    total = F.abs(signed)
    comp = {
        "d": F.floor(total / 86400).cast("bigint"),
        "h": F.floor(F.pmod(total, 86400.0) / 3600).cast("bigint"),
        "m": F.floor(F.pmod(total, 3600.0) / 60).cast("bigint"),
        "s": F.floor(F.pmod(total, 60.0)).cast("bigint"),
    }
    out: list[Column] = []
    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch in "dhms":
            j = i
            while j < len(fmt) and fmt[j] == ch:
                j += 1
            width = j - i
            piece = comp[ch].cast("string")
            if width > 1:
                piece = F.lpad(piece, width, "0")
            out.append(piece)
            i = j
        elif ch == "f":
            j = i
            while j < len(fmt) and fmt[j] == "f":
                j += 1
            width = j - i
            frac = F.floor(F.pmod(total, 1.0) * F.lit(10 ** width)).cast("bigint")
            out.append(F.lpad(frac.cast("string"), width, "0"))
            i = j
        else:
            out.append(F.lit(ch))
            i += 1
    sign = F.when(signed < 0, F.lit("-")).otherwise(F.lit(""))
    return F.concat(sign, *out)


# ------------------------------------------------- round-4 coverage sweep
# Remaining common Kusto scalar functions: bitwise, trig, series
# elementwise, IPv4 mask family, hashes, URL-query parsing, guid. All pure
# F.* compositions (JVM-side, codegen-able) unless noted.

simple("cot")(lambda c: F.lit(1.0) / F.tan(c))
REGISTRY["weekofyear"] = REGISTRY["week_of_year"]

simple("binary_and")(lambda a, b: a.cast("bigint").bitwiseAND(b.cast("bigint")))
simple("binary_or")(lambda a, b: a.cast("bigint").bitwiseOR(b.cast("bigint")))
simple("binary_xor")(lambda a, b: a.cast("bigint").bitwiseXOR(b.cast("bigint")))
simple("binary_not")(lambda a: F.bitwise_not(a.cast("bigint")))
simple("bitset_count_ones")(lambda a: F.bit_count(a.cast("bigint")).cast("bigint"))


@fn("binary_shift_left")
def _binary_shift_left(tr, args):
    n = int(tr.const_value(args[1]))
    return F.shiftleft(tr.to_col(args[0]).cast("bigint"), n)


@fn("binary_shift_right")
def _binary_shift_right(tr, args):
    n = int(tr.const_value(args[1]))
    return F.shiftright(tr.to_col(args[0]).cast("bigint"), n)


simple("hash_xxhash64")(lambda *cs: F.xxhash64(*cs))


@fn("hash_combine")
def _hash_combine(tr, args):
    """Order-dependent hash mixing (boost::hash_combine recipe — Kusto does
    not publish its formula; deterministic and collision-resistant is the
    contract)."""
    out = tr.to_col(args[0]).cast("bigint")
    golden = F.lit(-7046029254386353131)  # 0x9e3779b97f4a7c15 as signed i64
    for a in args[1:]:
        h = tr.to_col(a).cast("bigint")
        out = out.bitwiseXOR(
            h + golden + F.shiftleft(out, 6) + F.shiftright(out, 2)
        )
    return out


for _nm, _f in [
    ("series_sin", F.sin), ("series_cos", F.cos), ("series_tan", F.tan),
    ("series_asin", F.asin), ("series_acos", F.acos), ("series_atan", F.atan),
    ("series_sqrt", F.sqrt),
]:
    simple(_nm)(lambda a, _f=_f: F.transform(_as_dseries(a), _f))
simple("series_not_equals")(_series_zip(lambda x, y: x != y))
simple("series_pow")(_series_zip(lambda x, y: F.pow(x, y)))

_IPV4_PRIVATE = (
    (167772160, 184549375),        # 10.0.0.0/8
    (2886729728, 2886795263),      # 172.16.0.0/12
    (3232235520, 3232301055),      # 192.168.0.0/16
)


@fn("ipv4_is_private")
def _ipv4_is_private(tr, args):
    v = REGISTRY["parse_ipv4"](tr, [args[0]])
    out = F.lit(False)
    for lo, hi in _IPV4_PRIVATE:
        out = out | ((v >= F.lit(lo)) & (v <= F.lit(hi)))
    return out


@fn("ipv4_netmask_suffix")
def _ipv4_netmask_suffix(tr, args):
    s = tr.to_col(args[0]).cast("string")
    suf = F.split(s, "/")
    return F.when(
        F.size(suf) > 1, F.element_at(suf, 2).try_cast("bigint")
    ).otherwise(F.lit(32).cast("bigint"))


def _ipv4_masked(tr, arg, prefix_col):
    v = REGISTRY["parse_ipv4"](tr, [arg])
    blk = F.pow(F.lit(2.0), F.lit(32) - prefix_col).cast("bigint")
    return (F.floor(v / blk) * blk).cast("bigint")


@fn("parse_ipv4_mask")
def _parse_ipv4_mask(tr, args):
    return _ipv4_masked(tr, args[0], tr.to_col(args[1]).cast("int"))


def _ipv4_effective_prefix(tr, args):
    """min(explicit prefix arg, suffix of either address) [KQL ipv4_*]."""
    p = (
        tr.to_col(args[2]).cast("int")
        if len(args) > 2
        else F.lit(32).cast("int")
    )
    for a in args[:2]:
        p = F.least(p, REGISTRY["ipv4_netmask_suffix"](tr, [a]).cast("int"))
    return p


@fn("ipv4_compare")
def _ipv4_compare(tr, args):
    p = _ipv4_effective_prefix(tr, args)
    a = _ipv4_masked(tr, args[0], p)
    b = _ipv4_masked(tr, args[1], p)
    return F.signum((a - b).cast("double")).cast("bigint")


@fn("ipv4_is_match")
def _ipv4_is_match(tr, args):
    p = _ipv4_effective_prefix(tr, args)
    return _ipv4_masked(tr, args[0], p) == _ipv4_masked(tr, args[1], p)


@fn("geo_point_in_circle")
def _geo_point_in_circle(tr, args):
    d = REGISTRY["geo_distance_2points"](tr, args[:4])
    return d <= tr.to_col(args[4]).cast("double")


REGISTRY["new_guid"] = lambda tr, args: F.expr("uuid()")
simple("current_database")(lambda: F.lit("default"))
simple("current_cluster_endpoint")(lambda: F.lit("local"))
# identity functions: no auth context in a library engine — documented
# constants with Kusto-shaped output (the deployment wires real identity)
simple("current_principal")(lambda: F.lit("aaduser=kql-engine-spark"))
simple("current_principal_details")(
    lambda: F.lit('{"UserPrincipalName":"kql-engine-spark","Type":"aaduser"}')
)
REGISTRY["current_principal_is_member_of"] = lambda tr, args: F.lit(False)


# ---------------------------------------------------- ingestion metadata
# Kusto's per-extent ingestion metadata [KQL: ingestion_time(), extent_id(),
# extent_tags(), cursor_* functions] maps onto Spark's hidden file-source
# `_metadata` column: an "extent" is a data file, its ingestion time is the
# file's modification timestamp, and a database cursor is a stringified
# epoch-microsecond watermark over those timestamps. The translator attaches
# `__kql_ingest_ts` / `__kql_extent_path` at the parquet scan when (and only
# when) the query's AST uses one of these functions, so every other query
# keeps its exact schema; the columns ride the normal hidden-column
# machinery and never escape to the user.


def _ingest_col(tr, col_name: str, fname: str) -> Column:
    df = getattr(tr, "df", None)
    if df is not None and col_name not in df.columns:
        raise KqlSemanticError(
            f"{fname}() requires a file-backed table source (parquet path "
            "in the catalog); registered DataFrames, datatable and print "
            "sources carry no ingestion metadata"
        )
    return F.col(col_name)


@fn("ingestion_time")
def _ingestion_time(tr, args):
    return _ingest_col(tr, "__kql_ingest_ts", "ingestion_time")


@fn("extent_id")
def _extent_id(tr, args):
    # deterministic guid-shaped id derived from the backing file path
    h = F.md5(_ingest_col(tr, "__kql_extent_path", "extent_id"))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


@fn("extent_tags")
def _extent_tags(tr, args):
    # no extent-tag system in a file catalog — empty tag list, typed
    return F.expr("cast(array() as array<string>)")


@fn("cursor_after")
def _cursor_after(tr, args):
    ts = _ingest_col(tr, "__kql_ingest_ts", "cursor_after")
    cur = tr.to_col(args[0]).cast("string")
    bound = F.timestamp_micros(cur.cast("long"))
    return F.when((cur == "") | cur.isNull(), F.lit(True)).otherwise(ts > bound)


@fn("cursor_before_or_at")
def _cursor_before_or_at(tr, args):
    ts = _ingest_col(tr, "__kql_ingest_ts", "cursor_before_or_at")
    cur = tr.to_col(args[0]).cast("string")
    bound = F.timestamp_micros(cur.cast("long"))
    # the empty cursor means "before any data was ingested" [KQL]: for the
    # <= direction it admits NOTHING (cursor_after('') admits everything)
    return F.when((cur == "") | cur.isNull(), F.lit(False)).otherwise(ts <= bound)


@fn("cursor_current", "current_cursor")
def _cursor_current(tr, args):
    # evaluated at query execution (current_timestamp re-resolves per run,
    # so a cached plan still yields a fresh cursor)
    return F.unix_micros(F.current_timestamp()).cast("string")


@fn("parse_urlquery")
def _parse_urlquery(tr, args):
    """Query-string -> bag {"Query Parameters": {k: v}} (JSON-text dynamic
    carrier, same convention as series_stats_dynamic)."""
    s = tr.to_col(args[0]).cast("string")
    qs = F.when(s.contains("?"), F.substring_index(s, "?", -1)).otherwise(s)
    m = F.str_to_map(qs, F.lit("&"), F.lit("="))
    return F.to_json(F.create_map(F.lit("Query Parameters"), m))


@fn("parse_csv")
def _parse_csv(tr, args):
    # documented delta: no quoted-comma handling (Kusto honors RFC quoting)
    return F.split(tr.to_col(args[0]).cast("string"), ",")


@fn("column_ifexists")
def _column_ifexists(tr, args):
    from ..ast_nodes import Col as _Col

    name = (
        args[0].name
        if isinstance(args[0], _Col)
        else str(tr.const_value(args[0]))
    )
    if tr.df is not None and name in tr.df.columns:
        return F.col(name)
    return tr.to_col(args[1])


@fn("array_split")
def _array_split(tr, args):
    """array_split(arr, index | dynamic([i...])) -> array of subarrays
    (constant indices; negative indices count from the end) [KQL]."""
    a = tr.to_col(args[0])
    idx = tr.const_value(args[1])
    indices = [int(idx)] if not isinstance(idx, (list, tuple)) else [int(i) for i in idx]
    n = F.size(a)

    def norm(i):
        return F.lit(i) if i >= 0 else F.greatest(n + F.lit(i), F.lit(0))

    bounds = [F.lit(0), *[norm(i) for i in indices], n]
    parts = []
    for lo, hi in zip(bounds, bounds[1:]):
        ln = F.greatest(hi - lo, F.lit(0))
        parts.append(F.slice(a, lo + 1, ln))
    return F.array(*parts)


@fn("datetime_part")
def _datetime_part(tr, args):
    """datetime_part(part, dt) -> long [KQL]; part names per Kusto docs."""
    part = tr.const_string(args[0]).lower()
    d = tr.to_col(args[1])
    mapping = {
        "year": F.year, "quarter": F.quarter, "month": F.month,
        "week_of_year": F.weekofyear, "weekofyear": F.weekofyear,
        "day": F.dayofmonth, "dayofyear": F.dayofyear,
        "hour": F.hour, "minute": F.minute, "second": F.second,
    }
    if part in mapping:
        return mapping[part](d).cast("bigint")
    micros = F.unix_micros(d)
    if part == "millisecond":
        return F.floor(F.pmod(micros, 1_000_000) / 1000).cast("bigint")
    if part == "microsecond":
        return F.pmod(micros, 1_000_000).cast("bigint")
    if part == "nanosecond":
        return (F.pmod(micros, 1_000_000) * 1000).cast("bigint")
    raise KqlSemanticError(f"datetime_part: unknown part {part!r}")


# ------------------------------------------------------- round-5 gap closers


@fn("countof_regex")
def _countof_regex(tr, args):
    return F.regexp_count(
        tr.to_col(args[0]).cast("string"), F.lit(tr.const_string(args[1]))
    ).cast("bigint")


@fn("indexof_regex")
def _indexof_regex(tr, args):
    # KQL: 0-based start of the first regex match, -1 when absent;
    # regexp_instr is 1-based with 0-for-absent, so shift by one
    return (
        F.regexp_instr(
            tr.to_col(args[0]).cast("string"), F.lit(tr.const_string(args[1]))
        ).cast("bigint")
        - F.lit(1)
    )


@fn("string_size")
def _string_size(tr, args):
    return F.octet_length(tr.to_col(args[0]).cast("string")).cast("bigint")


@fn("around")
def _around(tr, args):
    x, center, delta = (tr.to_col(a) for a in args)
    return F.abs(x - center) <= delta


@fn("bag_has_key")
def _bag_has_key(tr, args):
    bag = _bag_as_json(tr, args[0], tr.to_col(args[0]))
    key = tr.const_string(args[1])
    if key.startswith("$."):
        # JSONPath form: present if the path resolves (null-valued keys at a
        # path are indistinguishable from absent ones — documented delta)
        return F.get_json_object(bag, key).isNotNull()
    return F.array_contains(F.json_object_keys(bag), key)


@fn("assert")
def _assert(tr, args):
    cond = tr.to_col(args[0])
    msg = tr.const_string(args[1]) if len(args) > 1 else "assert failed"
    # KQL assert aborts the query when false; F.assert_true raises JVM-side
    return F.coalesce(F.assert_true(cond, F.lit(msg)).isNull(), F.lit(True))


@fn("format_bytes")
def _format_bytes(tr, args):
    v = tr.to_col(args[0]).cast("double")
    precision = int(tr.const_value(args[1])) if len(args) > 1 else 0
    units = ["Bytes", "KB", "MB", "GB", "TB", "PB", "EB"]

    def fmt(scaled):
        # no thousands grouping (format_number would add commas);
        # precision 0 renders as an integer
        if precision <= 0:
            return F.round(scaled, 0).cast("bigint").cast("string")
        return F.round(scaled, precision).cast("string")

    if len(args) > 2:
        unit = tr.const_string(args[2])
        if unit not in units:
            raise KqlSemanticError(f"format_bytes: unknown unit {unit!r}")
        scaled = v / F.lit(float(1024 ** units.index(unit)))
        return F.concat(fmt(scaled), F.lit(" " + unit))
    out = F.concat(fmt(v), F.lit(" Bytes"))
    for i, u in list(enumerate(units))[1:]:
        bound = float(1024 ** i)
        out = F.when(
            F.abs(v) >= bound,
            F.concat(fmt(v / F.lit(bound)), F.lit(" " + u)),
        ).otherwise(out)
    return out


@fn("parse_path")
def _parse_path(tr, args):
    p = tr.to_col(args[0]).cast("string")
    norm = F.replace(p, F.lit("\\"), F.lit("/"))
    parts = F.split(norm, "/")
    filename = F.element_at(parts, -1)
    dot = F.instr(F.reverse(filename), ".")
    ext = F.when(dot > 0, F.reverse(F.substring(F.reverse(filename), 1, dot - 1))).otherwise(F.lit(""))
    scheme_m = F.regexp_extract(p, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    dirpath = F.when(
        F.size(parts) > 1,
        F.array_join(F.slice(parts, 1, F.size(parts) - 1), "/"),
    ).otherwise(F.lit(""))
    return F.to_json(
        F.struct(
            scheme_m.alias("Scheme"),
            dirpath.alias("DirectoryPath"),
            F.element_at(parts, -1).alias("Filename"),
            ext.alias("Extension"),
            F.regexp_extract(norm, r"^//([^/]+)", 1).alias("RootPath"),
        )
    )


@fn("rank_tdigest")
def _rank_tdigest(tr, args):
    # percentage rank (0-100) of a value within a tdigest() sketch [KQL]
    td = tr.to_col(args[0])
    v = tr.to_col(args[1]).cast("double")
    return F.round(F.kll_sketch_get_rank_double(td, v) * 100.0, 4)


def _has_ipv4_regex(ip: str, prefix: bool) -> str:
    # the address must be a standalone token delimited by non-address chars
    core = _re.escape(ip)
    tail = r"[0-9.]*" if prefix else ""
    return rf"(?<![0-9.]){core}{tail}(?![0-9.])"


@fn("has_ipv4")
def _has_ipv4(tr, args):
    s = tr.to_col(args[0]).cast("string")
    return F.regexp_like(s, F.lit(_has_ipv4_regex(tr.const_string(args[1]), False)))


@fn("has_ipv4_prefix")
def _has_ipv4_prefix(tr, args):
    s = tr.to_col(args[0]).cast("string")
    return F.regexp_like(s, F.lit(_has_ipv4_regex(tr.const_string(args[1]), True)))


def _const_string_list(tr, args) -> list[str]:
    """Variadic string args OR a single dynamic(['a', ...]) array literal
    [KQL has_any_ipv4/has_any_ipv6 accept both forms]."""
    from ..ast_nodes import TypedLit as _TL
    from ..semantics import parse_dynamic_literal as _pdl

    if len(args) == 1 and isinstance(args[0], _TL) and args[0].ktype == "dynamic":
        vals = _pdl(args[0].raw)
        if not isinstance(vals, list):
            raise KqlSemanticError("expected a dynamic array of strings")
        return [str(v) for v in vals]
    return [tr.const_string(a) for a in args]


@fn("has_any_ipv4")
def _has_any_ipv4(tr, args):
    s = tr.to_col(args[0]).cast("string")
    out = F.lit(False)
    for ip in _const_string_list(tr, args[1:]):
        out = out | F.regexp_like(s, F.lit(_has_ipv4_regex(ip, False)))
    return out


def _fit_2lines_row(y):
    """Best split of the series into two least-squares lines [KQL
    series_fit_2lines]: (rsquare, split_idx, variance, rvariance, line_fit)
    — rsquare of the piecewise fit, same field set as the Kusto bag."""
    import numpy as np

    n = len(y)
    if n < 4:
        return (float("nan"), -1, float(np.var(y)) if n else float("nan"),
                float("nan"), list(y))

    def fit(seg):
        x = np.arange(len(seg), dtype="float64")
        if len(seg) < 2:
            return np.asarray(seg, dtype="float64"), 0.0
        k, b = np.polyfit(x, seg, 1)
        line = k * x + b
        return line, float(((seg - line) ** 2).sum())

    best = (float("inf"), 1, None)
    for s in range(2, n - 1):
        l1, r1 = fit(y[:s])
        l2, r2 = fit(y[s:])
        if r1 + r2 < best[0]:
            best = (r1 + r2, s, np.concatenate([l1, l2]))
    rss, split, trend = best
    var = float(np.var(y))
    rvar = rss / n
    rsq = 1.0 - rvar / var if var > 0 else 0.0
    return (rsq, int(split), var, rvar, [float(v) for v in trend])


_FIT2_SCHEMA = (
    "rsquare double, split_idx int, variance double, rvariance double, "
    "line_fit array<double>"
)


def _fit_2lines_struct(tr, args):
    key = "series_fit_2lines"
    if key not in _PANDAS_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf(_FIT2_SCHEMA)
        def udf(col):
            import numpy as np
            import pandas as pd

            rows = []
            for a in col:
                if a is None:
                    rows.append((None, None, None, None, None))
                else:
                    rows.append(_fit_2lines_row(np.asarray(a, dtype="float64")))
            return pd.DataFrame(
                rows,
                columns=[
                    "rsquare", "split_idx", "variance", "rvariance", "line_fit"
                ],
            )

        _PANDAS_UDF_CACHE[key] = udf
    return _PANDAS_UDF_CACHE[key](_as_dseries(tr.to_col(args[0])))


@fn("series_fit_2lines", "series_fit_2lines_dynamic")
def _series_fit_2lines(tr, args):
    return F.to_json(_fit_2lines_struct(tr, args))


# ----------------------------------------------------------- polynomial fit
_POLY_SCHEMA = (
    "rsquare double, coefficients array<double>, variance double, "
    "rvariance double, poly_fit array<double>"
)


def _fit_poly_struct(tr, args):
    """[KQL series_fit_poly(y[, x, degree])] — least-squares polynomial fit;
    coefficients high-order-first (Kusto convention)."""
    degree = 1
    x_arg = None
    if len(args) >= 3:
        x_arg = args[1]
        degree = int(tr.const_value(args[2]))
    elif len(args) == 2:
        degree = int(tr.const_value(args[1]))
    key = f"series_fit_poly:{degree}:{x_arg is not None}"
    if key not in _PANDAS_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf(_POLY_SCHEMA)
        def udf(y_col, x_col):
            import numpy as np
            import pandas as pd

            rows = []
            for y_a, x_a in zip(y_col, x_col):
                if y_a is None or len(y_a) <= degree:
                    rows.append((None, None, None, None, None))
                    continue
                y = np.asarray(y_a, dtype="float64")
                x = (
                    np.asarray(x_a, dtype="float64")
                    if x_a is not None and len(x_a) == len(y)
                    else np.arange(len(y), dtype="float64")
                )
                coefs = np.polyfit(x, y, degree)
                fit = np.polyval(coefs, x)
                var = float(np.var(y))
                rvar = float(np.mean((y - fit) ** 2))
                rsq = 1.0 - rvar / var if var > 0 else 0.0
                rows.append(
                    (rsq, [float(c) for c in coefs], var, rvar,
                     [float(v) for v in fit])
                )
            return pd.DataFrame(
                rows,
                columns=["rsquare", "coefficients", "variance", "rvariance",
                         "poly_fit"],
            )

        _PANDAS_UDF_CACHE[key] = udf
    y_c = _as_dseries(tr.to_col(args[0]))
    x_c = (
        _as_dseries(tr.to_col(x_arg))
        if x_arg is not None
        else F.lit(None).cast("array<double>")
    )
    return _PANDAS_UDF_CACHE[key](y_c, x_c)


@fn("series_fit_poly")
def _series_fit_poly(tr, args):
    return F.to_json(_fit_poly_struct(tr, args))


# ----------------------------------------------------------------- FFT family
_FFT_SCHEMA = "re array<double>, im array<double>"


def _fft_struct_factory(inverse: bool):
    def build(tr, args):
        key = "series_ifft" if inverse else "series_fft"
        if key not in _PANDAS_UDF_CACHE:
            from pyspark.sql.functions import pandas_udf

            @pandas_udf(_FFT_SCHEMA)
            def udf(re_col, im_col):
                import numpy as np
                import pandas as pd

                res, ims = [], []
                for re_a, im_a in zip(re_col, im_col):
                    if re_a is None:
                        res.append(None)
                        ims.append(None)
                        continue
                    re_v = np.asarray(re_a, dtype="float64")
                    im_v = (
                        np.zeros_like(re_v)
                        if im_a is None or len(im_a) != len(re_v)
                        else np.asarray(im_a, dtype="float64")
                    )
                    z = (
                        np.fft.ifft(re_v + 1j * im_v)
                        if inverse
                        else np.fft.fft(re_v + 1j * im_v)
                    )
                    res.append([float(v) for v in z.real])
                    ims.append([float(v) for v in z.imag])
                return pd.DataFrame({"re": res, "im": ims})

            _PANDAS_UDF_CACHE[key] = udf
        re_c = _as_dseries(tr.to_col(args[0]))
        im_c = (
            _as_dseries(tr.to_col(args[1]))
            if len(args) > 1
            else F.lit(None).cast("array<double>")
        )
        return _PANDAS_UDF_CACHE[key](re_c, im_c)

    return build


_fft_struct = _fft_struct_factory(inverse=False)
_ifft_struct = _fft_struct_factory(inverse=True)


@fn("series_fft")
def _series_fft(tr, args):
    """[KQL series_fft] — complex DFT of a series; destructure with
    `extend (re, im) = series_fft(y[, y_im])`, or single-assign for the
    {re, im} bag."""
    return F.to_json(_fft_struct(tr, args))


@fn("series_ifft")
def _series_ifft(tr, args):
    """[KQL series_ifft] — inverse DFT; same shape contract as series_fft."""
    return F.to_json(_ifft_struct(tr, args))


@fn("treepath")
def _treepath(tr, args):
    """[KQL treepath] — enumerate the path expressions of a dynamic object:
    object keys as ['key'], array traversal as [] (no index), including
    intermediate paths. Arrow-batched pandas UDF over the JSON carrier
    (recursive bag walk has no JVM-expression form)."""
    key = "treepath"
    if key not in _PANDAS_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<string>")
        def udf(col):
            import json

            def walk(obj, prefix, out):
                if isinstance(obj, dict):
                    for k, v in obj.items():
                        p = f"{prefix}['{k}']"
                        out.append(p)
                        walk(v, p, out)
                elif isinstance(obj, list):
                    p = prefix + "[]"
                    out.append(p)
                    for v in obj:
                        walk(v, p, out)

            def one(s):
                if s is None:
                    return None
                try:
                    obj = json.loads(s)
                except (ValueError, TypeError):
                    return []
                out: list = []
                walk(obj, "", out)
                # dedupe (array elements repeat paths), keep first-seen order
                return list(dict.fromkeys(out))

            return col.map(one)

        _PANDAS_UDF_CACHE[key] = udf
    col = tr.to_col(args[0])
    return _PANDAS_UDF_CACHE[key](_bag_as_json(tr, args[0], col))


# ------------------------------------------------- multi-valued assignment
# `extend (a, b, ...) = f(...)` [KQL]: each entry maps the function name to
# (positional output field order per the Kusto docs, struct builder).
MULTI_OUTPUT: dict[str, tuple[list, object]] = {
    "series_fit_line": (
        ["rsquare", "slope", "variance", "rvariance", "interception",
         "line_fit"],
        lambda tr, args: _fit_line_struct(_as_dseries(tr.to_col(args[0]))),
    ),
    "series_fit_2lines": (
        ["rsquare", "split_idx", "variance", "rvariance", "line_fit"],
        _fit_2lines_struct,
    ),
    "series_fft": (["re", "im"], _fft_struct),
    "series_ifft": (["re", "im"], _ifft_struct),
}
MULTI_OUTPUT["series_fit_line_dynamic"] = MULTI_OUTPUT["series_fit_line"]
MULTI_OUTPUT["series_fit_2lines_dynamic"] = MULTI_OUTPUT["series_fit_2lines"]


def _array_sort_fields(args):
    """Output arity tracks the input arrays (a trailing bool literal is the
    nulls_last flag, not an array)."""
    from ..ast_nodes import Lit as _Lit

    n = len(args)
    if n and isinstance(args[-1], _Lit) and isinstance(args[-1].value, bool):
        n -= 1
    return [f"a{j}" for j in range(n)]


MULTI_OUTPUT["array_sort_asc"] = (_array_sort_fields, _array_sort_asc_struct)
MULTI_OUTPUT["array_sort_desc"] = (_array_sort_fields, _array_sort_desc_struct)
MULTI_OUTPUT["series_stats"] = (
    ["min", "min_idx", "max", "max_idx", "avg", "stdev", "variance"],
    _series_stats_args,
)
MULTI_OUTPUT["series_stats_dynamic"] = MULTI_OUTPUT["series_stats"]
MULTI_OUTPUT["series_decompose"] = (
    ["baseline", "seasonal", "trend", "residual"],
    _decompose_struct,
)
MULTI_OUTPUT["series_decompose_anomalies"] = (
    ["ad_flag", "ad_score", "baseline"],
    _decompose_anom_struct,
)
MULTI_OUTPUT["series_fit_poly"] = (
    ["rsquare", "coefficients", "variance", "rvariance", "poly_fit"],
    _fit_poly_struct,
)
MULTI_OUTPUT["series_periods_detect"] = (
    ["periods", "scores"],
    _periods_detect_entry,
)
MULTI_OUTPUT["series_periods_validate"] = (
    ["periods", "scores"],
    _periods_validate_entry,
)


# ------------------------------------------------------------ geohash family
# Geohash is a public, fully-specified encoding (base32 bit interleave), so
# unlike S2 cells it needs no external library. Vectorized pandas UDFs —
# per-batch Python over pure arithmetic.
_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_encode(lon, lat, precision):
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    out = []
    bit = 0
    ch = 0
    even = True
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch <<= 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch <<= 1
                lat_hi = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(_GEOHASH32[ch])
            bit = 0
            ch = 0
    return "".join(out)


def _geohash_decode(h):
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    for c in h:
        idx = _GEOHASH32.find(c)
        if idx < 0:
            return None
        for shift in range(4, -1, -1):
            bit = (idx >> shift) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2
                if bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return (lon_lo + lon_hi) / 2, (lat_lo + lat_hi) / 2


@fn("geo_point_to_geohash")
def _geo_point_to_geohash(tr, args):
    precision = int(tr.const_value(args[2])) if len(args) > 2 else 5
    if not 1 <= precision <= 18:
        raise KqlSemanticError("geo_point_to_geohash: precision must be 1-18")
    key = f"geohash:{precision}"
    if key not in _PANDAS_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def udf(lon, lat):
            def one(lo, la):
                if lo is None or la is None:
                    return None
                lo, la = float(lo), float(la)
                if not (-180.0 <= lo <= 180.0 and -90.0 <= la <= 90.0):
                    return None
                return _geohash_encode(lo, la, precision)

            return lon.combine(lat, one)

        _PANDAS_UDF_CACHE[key] = udf
    return _PANDAS_UDF_CACHE[key](
        tr.to_col(args[0]).cast("double"), tr.to_col(args[1]).cast("double")
    )


def _azimuth_col(lon1, lat1, lon2, lat2):
    """Initial great-circle bearing from p1 to p2, clockwise-from-north
    radians in [0, 2*pi) — pure column trig."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dlon = F.radians(lon2 - lon1)
    y = F.sin(dlon) * F.cos(p2)
    x = F.cos(p1) * F.sin(p2) - F.sin(p1) * F.cos(p2) * F.cos(dlon)
    two_pi = F.lit(2.0 * 3.141592653589793)
    theta = F.atan2(y, x)
    return F.when(theta < 0, theta + two_pi).otherwise(theta)


@fn("geo_azimuth")
def _geo_azimuth(tr, args):
    """geo_azimuth(lon1, lat1, lon2, lat2) [KQL]: bearing of the line from
    point1 to point2, radians clockwise from true north."""
    lon1, lat1, lon2, lat2 = [tr.to_col(a).cast("double") for a in args]
    return _azimuth_col(lon1, lat1, lon2, lat2)


@fn("geo_angle")
def _geo_angle(tr, args):
    """geo_angle(p1_lng, p1_lat, p2_lng, p2_lat, p3_lng, p3_lat) [KQL]:
    clockwise angle at vertex p2 between the lines p2->p1 and p2->p3."""
    lon1, lat1, lon2, lat2, lon3, lat3 = [
        tr.to_col(a).cast("double") for a in args
    ]
    a31 = _azimuth_col(lon2, lat2, lon3, lat3) - _azimuth_col(lon2, lat2, lon1, lat1)
    two_pi = F.lit(2.0 * 3.141592653589793)
    return F.when(a31 < 0, a31 + two_pi).otherwise(a31)


def _geohash_bounds(h):
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    for c in h:
        idx = _GEOHASH32.find(c)
        if idx < 0:
            return None
        for shift in range(4, -1, -1):
            bit = (idx >> shift) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2
                if bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return lon_lo, lat_lo, lon_hi, lat_hi


@fn("geo_geohash_to_polygon")
def _geo_geohash_to_polygon(tr, args):
    """geohash -> GeoJSON Polygon of the cell's bounding box [KQL]."""
    key = "geohash:polygon"
    if key not in _PANDAS_UDF_CACHE:
        import json

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def udf(h):
            def one(x):
                if x is None or not x:
                    return None
                b = _geohash_bounds(str(x))
                if b is None:
                    return None
                w, s, e, n = b
                ring = [[w, s], [e, s], [e, n], [w, n], [w, s]]
                return json.dumps({"type": "Polygon", "coordinates": [ring]})

            return h.map(one)

        _PANDAS_UDF_CACHE[key] = udf
    return _PANDAS_UDF_CACHE[key](tr.to_col(args[0]).cast("string"))


@fn("geo_geohash_neighbors")
def _geo_geohash_neighbors(tr, args):
    """geohash -> dynamic array of the 8 neighboring cells (same precision)
    [KQL]. Neighbor = re-encode of center +/- one cell size; cells at the
    lat poles drop out-of-range neighbors."""
    key = "geohash:neighbors"
    if key not in _PANDAS_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<string>")
        def udf(h):
            def one(x):
                if x is None or not x:
                    return None
                b = _geohash_bounds(str(x))
                if b is None:
                    return None
                w, s, e, n = b
                dlon, dlat = e - w, n - s
                clon, clat = (w + e) / 2, (s + n) / 2
                out = []
                for dy in (1, 0, -1):
                    for dx in (-1, 0, 1):
                        if dx == 0 and dy == 0:
                            continue
                        la = clat + dy * dlat
                        lo = clon + dx * dlon
                        if not -90.0 <= la <= 90.0:
                            continue
                        lo = ((lo + 180.0) % 360.0) - 180.0  # antimeridian wrap
                        out.append(_geohash_encode(lo, la, len(str(x))))
                return out

            return h.map(one)

        _PANDAS_UDF_CACHE[key] = udf
    return _PANDAS_UDF_CACHE[key](tr.to_col(args[0]).cast("string"))


@fn("geo_geohash_to_central_point")
def _geo_geohash_to_central_point(tr, args):
    """Returns the cell's central point as a GeoJSON-style dynamic (JSON
    text: {"type": "Point", "coordinates": [lon, lat]}) [KQL]."""
    key = "geohash:decode"
    if key not in _PANDAS_UDF_CACHE:
        import json

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def udf(h):
            def one(x):
                if x is None or not x:
                    return None
                pt = _geohash_decode(str(x))
                if pt is None:
                    return None
                return json.dumps(
                    {"type": "Point", "coordinates": [pt[0], pt[1]]}
                )

            return h.map(one)

        _PANDAS_UDF_CACHE[key] = udf
    return _PANDAS_UDF_CACHE[key](tr.to_col(args[0]).cast("string"))


@fn("geo_point_in_polygon")
def _geo_point_in_polygon(tr, args):
    """geo_point_in_polygon(lon, lat, polygon) [KQL]: point-in-polygon by
    ray casting over a GeoJSON Polygon literal (holes supported: a point
    inside any interior ring is outside). Planar approximation — faithful
    for the non-antimeridian-crossing polygons the public docs use."""
    import json

    poly_raw = tr.const_string(args[2])
    try:
        poly = json.loads(poly_raw)
        rings = poly["coordinates"]
        assert poly.get("type") == "Polygon" and rings
    except Exception:
        raise KqlSemanticError(
            "geo_point_in_polygon: third argument must be a GeoJSON "
            "Polygon literal"
        ) from None

    key = f"pip:{hash(poly_raw)}"
    if key not in _PANDAS_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf

        def in_ring(lon, lat, ring):
            inside = False
            n = len(ring)
            for i in range(n):
                x1, y1 = ring[i][0], ring[i][1]
                x2, y2 = ring[(i + 1) % n][0], ring[(i + 1) % n][1]
                if (y1 > lat) != (y2 > lat):
                    xin = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
                    if lon < xin:
                        inside = not inside
            return inside

        @pandas_udf("boolean")
        def udf(lon, lat):
            def one(lo, la):
                if lo is None or la is None:
                    return None
                lo, la = float(lo), float(la)
                if not in_ring(lo, la, rings[0]):
                    return False
                # interior rings are holes
                return not any(in_ring(lo, la, r) for r in rings[1:])

            return lon.combine(lat, one)

        _PANDAS_UDF_CACHE[key] = udf
    return _PANDAS_UDF_CACHE[key](
        tr.to_col(args[0]).cast("double"), tr.to_col(args[1]).cast("double")
    )


# ------------------------------------------- series vector math (round 5)
# All pure column expressions over array<double> — JVM-side, codegen-able.


def _s_sum(a):
    return F.aggregate(a, F.lit(0.0), lambda s, v: s + F.coalesce(v, F.lit(0.0)))


def _s_dot(a, b):
    return _s_sum(F.zip_with(a, b, lambda x, y: x * y))


@fn("series_dot_product")
def _series_dot_product(tr, args):
    return _s_dot(_as_dseries(tr.to_col(args[0])), _as_dseries(tr.to_col(args[1])))


@fn("series_magnitude")
def _series_magnitude(tr, args):
    a = _as_dseries(tr.to_col(args[0]))
    return F.sqrt(_s_dot(a, a))


@fn("series_cosine_similarity")
def _series_cosine_similarity(tr, args):
    a = _as_dseries(tr.to_col(args[0]))
    b = _as_dseries(tr.to_col(args[1]))
    denom = F.sqrt(_s_dot(a, a)) * F.sqrt(_s_dot(b, b))
    return F.when(denom > 0, _s_dot(a, b) / denom)


@fn("series_pearson_correlation")
def _series_pearson_correlation(tr, args):
    a = _as_dseries(tr.to_col(args[0]))
    b = _as_dseries(tr.to_col(args[1]))
    n = F.size(a).cast("double")
    sx, sy = _s_sum(a), _s_sum(b)
    sxy = _s_dot(a, b)
    sxx, syy = _s_dot(a, a), _s_dot(b, b)
    cov = sxy - sx * sy / n
    denom = F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)
    return F.when((n > 0) & (denom > 0), cov / denom)


# ------------------------------------------- round-5 coverage batch (§2.9)
# Aliases first: Kusto name variants over existing implementations.
REGISTRY["extract_json"] = REGISTRY["extractjson"]
REGISTRY["array_iif"] = REGISTRY["array_iff"]
REGISTRY["url_decode_component"] = REGISTRY["url_decode"]
REGISTRY["series_stats"] = REGISTRY["series_stats_dynamic"]
REGISTRY["series_fit_line"] = REGISTRY["series_fit_line_dynamic"]

simple("series_greater_equals")(_series_zip(lambda x, y: x >= y))
simple("series_less_equals")(_series_zip(lambda x, y: x <= y))
simple("series_floor")(
    lambda a: F.transform(_as_dseries(a), lambda x: F.floor(x).cast("double"))
)
simple("series_ceiling")(
    lambda a: F.transform(_as_dseries(a), lambda x: F.ceil(x).cast("double"))
)
simple("series_product")(
    lambda a: F.aggregate(
        _as_dseries(a), F.lit(1.0), lambda s, x: s * F.coalesce(x, F.lit(1.0))
    )
)


@fn("tohex")
def _tohex(tr, args):
    """Kusto tohex(int [, min_width]): lowercase hex, no 0x prefix."""
    v = tr.to_col(args[0]).cast("bigint")
    h = F.lower(F.hex(v))
    if len(args) > 1:
        width = tr.to_col(args[1]).cast("int")
        h = F.lpad(h, width, "0")
    return h


@fn("hash_many")
def _hash_many(tr, args):
    """Multi-argument combined hash (xxhash64 over all args, like hash())."""
    return F.xxhash64(*[tr.to_col(a) for a in args])


@fn("format_ipv4_mask")
def _format_ipv4_mask(tr, args):
    """format_ipv4_mask(ip, prefix) -> 'a.b.c.d/p' with the host bits
    zeroed [KQL]."""
    ip = REGISTRY["parse_ipv4"](tr, [args[0]])
    bits = tr.to_col(args[1]).cast("int")
    span = F.pow(F.lit(2.0), (F.lit(32) - bits).cast("double")).cast("bigint")
    base = ip - (ip % span)
    return F.concat(
        F.concat_ws(
            ".",
            (F.floor(base / 16777216) % 256).cast("string"),
            (F.floor(base / 65536) % 256).cast("string"),
            (F.floor(base / 256) % 256).cast("string"),
            (base % 256).cast("string"),
        ),
        F.lit("/"),
        bits.cast("string"),
    )


@fn("ipv4_is_in_any_range")
def _ipv4_is_in_any_range(tr, args):
    """ipv4_is_in_any_range(ip, range1, range2, ...) [KQL]: true when the
    address falls in any of the CIDR/plain ranges (a dynamic array operand
    expands to its elements); null on unparsable ip."""
    from ..ast_nodes import Lit as _Lit, TypedLit as _TypedLit
    from ..semantics import parse_dynamic_literal

    ranges: list = []
    for a in args[1:]:
        if isinstance(a, _TypedLit) and a.ktype == "dynamic":
            ranges.extend(
                _Lit(str(v), "string") for v in parse_dynamic_literal(a.raw)
            )
        else:
            ranges.append(a)
    out = REGISTRY["ipv4_is_in_range"](tr, [args[0], ranges[0]])
    for a in ranges[1:]:
        out = out | REGISTRY["ipv4_is_in_range"](tr, [args[0], a])
    return out


# .NET GUID byte order: first three fields little-endian, last 8 bytes as-is
# (public GUID wire format; what Kusto's base64_encode_fromguid emits).
def _guid_hex_reordered(hex32: Column) -> Column:
    pick = [7, 8, 5, 6, 3, 4, 1, 2, 11, 12, 9, 10, 15, 16, 13, 14]
    parts = [F.substring(hex32, i, 1) for i in pick]
    parts.append(F.substring(hex32, 17, 16))
    return F.concat(*parts)


@fn("base64_encode_fromguid")
def _base64_encode_fromguid(tr, args):
    g = F.lower(F.regexp_replace(tr.to_col(args[0]).cast("string"), "-", ""))
    return F.base64(F.unhex(_guid_hex_reordered(g)))


@fn("base64_decode_toguid")
def _base64_decode_toguid(tr, args):
    hex32 = F.lower(F.hex(F.unbase64(tr.to_col(args[0]).cast("string"))))
    # invert the little-endian reorder (the permutation is an involution on
    # the first 16 hex chars)
    back = _guid_hex_reordered(hex32)
    return F.when(
        F.length(hex32) == 32,
        F.concat_ws(
            "-",
            F.substring(back, 1, 8),
            F.substring(back, 9, 4),
            F.substring(back, 13, 4),
            F.substring(back, 17, 4),
            F.substring(back, 21, 12),
        ),
    )


@fn("base64_encode_fromarray")
def _base64_encode_fromarray(tr, args):
    """array of byte values -> base64 string [KQL] (inverse of
    base64_decode_toarray). Bytes assemble via hex-pair concat + unhex —
    pure column exprs."""
    arr = tr.to_col(args[0])
    dt = tr.dtype_of_ast(args[0], arr)
    if isinstance(dt, T.StringType):  # JSON-text dynamic carrier
        arr = F.from_json(arr, "array<bigint>")
    else:
        arr = arr.cast("array<bigint>")
    hexpairs = F.transform(
        arr, lambda x: F.lpad(F.hex(x.bitwiseAND(F.lit(255))), 2, "0")
    )
    return F.base64(F.unhex(F.array_join(hexpairs, "")))


@fn("base64_decode_toarray")
def _base64_decode_toarray(tr, args):
    """base64 -> array of byte values (long) [KQL]. Per-byte substring on
    binary stays JVM-side; payloads are message-sized by the use case."""
    b = F.unbase64(tr.to_col(args[0]).cast("string"))
    return F.transform(
        F.sequence(F.lit(1), F.octet_length(b)),
        lambda i: F.conv(F.hex(F.substring(b, i, 1)), 16, 10).cast("bigint"),
    )


@fn("bag_pack_columns")
def _bag_pack_columns(tr, args):
    """bag_pack_columns(c1, c2, ...) -> property bag keyed by the column
    names [KQL]."""
    from ..ast_nodes import Col as _Col

    fields = []
    for a in args:
        if not isinstance(a, _Col):
            raise KqlSemanticError("bag_pack_columns takes column references")
        fields.append(tr.to_col(a).alias(a.name))
    return F.to_json(F.struct(*fields))


@fn("bag_set_key")
def _bag_set_key(tr, args):
    """bag_set_key(bag, key, value): upsert one key (either bag carrier,
    same convention as bag_merge/bag_remove_keys)."""
    m = F.from_json(_bag_json_str(tr, args[0]), "map<string,string>")
    k = tr.to_col(args[1]).cast("string")
    v = tr.to_col(args[2]).cast("string")
    return F.to_json(
        F.map_concat(
            F.map_filter(m, lambda mk, mv: mk != k), F.create_map(k, v)
        )
    )


@fn("estimate_data_size")
def _estimate_data_size(tr, args):
    """estimate_data_size(c1, c2, ...): approximate per-row payload bytes
    [KQL]. Estimate by declared type width (numerics 8, bool 1, datetime 8)
    and actual length for strings/binary/arrays — same spirit as Kusto's
    documented estimation, not a wire-format byte count."""
    total = F.lit(0).cast("bigint")
    for a in args:
        c = tr.to_col(a)
        dt = tr.dtype_of_ast(a, c)
        if isinstance(dt, T.StringType):
            sz = F.coalesce(F.length(c).cast("bigint"), F.lit(0))
        elif isinstance(dt, T.BinaryType):
            sz = F.coalesce(F.octet_length(c).cast("bigint"), F.lit(0))
        elif isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
            sz = F.coalesce(F.length(F.to_json(c)).cast("bigint"), F.lit(0))
        elif isinstance(dt, T.BooleanType):
            sz = F.when(c.isNull(), 0).otherwise(1).cast("bigint")
        else:
            sz = F.when(c.isNull(), 0).otherwise(8).cast("bigint")
        total = total + sz
    return total


# Abramowitz & Stegun 7.1.26 rational approximation: |error| <= 1.5e-7,
# documented precision bound (Kusto's erf is double-precision; round to
# <= 5 decimals when hash-matching against an exact oracle).
def _erf_pos(x: Column) -> Column:
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    poly = t * (
        F.lit(0.254829592)
        + t * (
            F.lit(-0.284496736)
            + t * (F.lit(1.421413741) + t * (F.lit(-1.453152027) + t * F.lit(1.061405429)))
        )
    )
    return F.lit(1.0) - poly * F.exp(-x * x)


@fn("erf")
def _erf(tr, args):
    x = tr.to_col(args[0]).cast("double")
    ax = F.abs(x)
    return F.signum(x) * _erf_pos(ax)


@fn("erfc")
def _erfc(tr, args):
    x = tr.to_col(args[0]).cast("double")
    return F.lit(1.0) - REGISTRY["erf"](tr, args)


# ---------------------------------------- codec functions (§2.9, slow path)
# zlib/gzip/punycode/XML have no JVM builtins; these are Arrow-batched
# pandas UDFs (per-batch Python, never per-row over the wire) — the same
# documented slow-path tier as the series interpolation UDFs above. Kusto
# returns '' for undecodable compression input and null for bad punycode;
# both conventions are preserved.
def _str_udf(name, one):
    def make():
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def udf(col):
            return col.map(lambda s: None if s is None else one(s))

        return udf

    def entry(tr, args):
        if name not in _PANDAS_UDF_CACHE:
            _PANDAS_UDF_CACHE[name] = make()
        return _PANDAS_UDF_CACHE[name](tr.to_col(args[0]).cast("string"))

    REGISTRY[name] = entry


def _zlib_compress(s):
    import base64
    import zlib

    return base64.b64encode(zlib.compress(s.encode("utf-8"))).decode("ascii")


def _zlib_decompress(s):
    import base64
    import zlib

    try:
        return zlib.decompress(base64.b64decode(s)).decode("utf-8")
    except Exception:
        return ""


def _gzip_compress(s):
    import base64
    import gzip

    # mtime=0: deterministic output (gzip embeds a timestamp otherwise,
    # which would make the function non-reproducible across runs)
    return base64.b64encode(
        gzip.compress(s.encode("utf-8"), mtime=0)
    ).decode("ascii")


def _gzip_decompress(s):
    import base64
    import gzip

    try:
        return gzip.decompress(base64.b64decode(s)).decode("utf-8")
    except Exception:
        return ""


_str_udf("zlib_compress_to_base64_string", _zlib_compress)
_str_udf("zlib_decompress_from_base64_string", _zlib_decompress)
_str_udf("gzip_compress_to_base64_string", _gzip_compress)
_str_udf("gzip_decompress_from_base64_string", _gzip_decompress)


def _puny_encode(s):
    try:
        return s.encode("punycode").decode("ascii")
    except Exception:
        return None


def _puny_decode(s):
    try:
        return s.encode("ascii").decode("punycode")
    except Exception:
        return None


def _puny_domain_encode(s):
    # IDNA per-label: ascii labels pass through, others get xn-- + punycode
    try:
        out = []
        for label in s.split("."):
            if label.isascii():
                out.append(label)
            else:
                out.append("xn--" + label.encode("punycode").decode("ascii"))
        return ".".join(out)
    except Exception:
        return None


def _puny_domain_decode(s):
    try:
        out = []
        for label in s.split("."):
            if label.startswith("xn--"):
                out.append(label[4:].encode("ascii").decode("punycode"))
            else:
                out.append(label)
        return ".".join(out)
    except Exception:
        return None


_str_udf("punycode_from_string", _puny_encode)
_str_udf("punycode_to_string", _puny_decode)
_str_udf("punycode_domain_from_string", _puny_domain_encode)
_str_udf("punycode_domain_to_string", _puny_domain_decode)


def _xml_to_bag(s):
    """Kusto parse_xml convention: element -> {tag: content}; attributes
    keyed '@name'; text content under '#text' when mixed with children,
    bare string otherwise; repeated sibling tags collapse into arrays."""
    import json
    import xml.etree.ElementTree as ET

    def conv(el):
        child: dict = {}
        for k, v in el.attrib.items():
            child["@" + k] = v
        groups: dict = {}
        for c in el:
            groups.setdefault(c.tag, []).append(conv(c))
        for tag, items in groups.items():
            child[tag] = items[0][tag] if len(items) == 1 else [i[tag] for i in items]
        text = (el.text or "").strip()
        if text and child:
            child["#text"] = text
        elif text:
            return {el.tag: text}
        return {el.tag: child if child else None}

    try:
        return json.dumps(conv(ET.fromstring(s)), separators=(",", ":"))
    except Exception:
        return None


_str_udf("parse_xml", _xml_to_bag)


# -------------------------------------- statistical functions (§2.9, round 5)
@fn("beta_pdf")
def _beta_pdf(tr, args):
    """beta_pdf(x, a, b) [KQL]: Beta density. JVM-side via the Stirling
    lgamma above (~1e-10 rel. error)."""
    x = tr.to_col(args[0]).cast("double")
    a = tr.to_col(args[1]).cast("double")
    b = tr.to_col(args[2]).cast("double")
    log_beta = _lgamma(a) + _lgamma(b) - _lgamma(a + b)
    logpdf = (a - 1) * F.log(x) + (b - 1) * F.log(F.lit(1.0) - x) - log_beta
    return F.when((x >= 0) & (x <= 1) & (a > 0) & (b > 0), F.exp(logpdf))


def _betainc_scalar(a, b, x):
    """Regularized incomplete beta I_x(a,b) via the standard continued
    fraction (modified Lentz evaluation) — double precision to ~1e-14.
    Public mathematical algorithm (Abramowitz & Stegun 26.5.8 expansion)."""
    import math

    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    lbeta = math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)
    front = math.exp(a * math.log(x) + b * math.log(1.0 - x) - lbeta)
    # use the symmetry I_x(a,b) = 1 - I_{1-x}(b,a) for fast convergence
    if x > (a + 1.0) / (a + b + 2.0):
        return 1.0 - _betainc_scalar(b, a, 1.0 - x)
    tiny = 1e-300
    c = 1.0
    d = 1.0 - (a + b) * x / (a + 1.0)
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, 200):
        m2 = 2 * m
        num = m * (b - m) * x / ((a + m2 - 1.0) * (a + m2))
        d = 1.0 + num * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + num / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        num = -(a + m) * (a + b + m) * x / ((a + m2) * (a + m2 + 1.0))
        d = 1.0 + num * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + num / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-14:
            break
    return front * h / a


def _stats_udf(name, ncols, one, ret="double"):
    """Arrow-batched multi-column scalar UDF (slow-path tier, same as the
    codec functions): `one` maps python floats -> float."""

    def make():
        from pyspark.sql.functions import pandas_udf

        @pandas_udf(ret)
        def udf(*cols):
            import pandas as pd

            def row(vals):
                if any(v is None or (isinstance(v, float) and v != v) for v in vals):
                    return None
                try:
                    return one(*[float(v) for v in vals])
                except Exception:
                    return None

            return pd.Series([row(vals) for vals in zip(*cols)])

        return udf

    def entry(tr, args):
        if name not in _PANDAS_UDF_CACHE:
            _PANDAS_UDF_CACHE[name] = make()
        return _PANDAS_UDF_CACHE[name](
            *[tr.to_col(a).cast("double") for a in args[:ncols]]
        )

    REGISTRY[name] = entry


_stats_udf("beta_cdf", 3, lambda x, a, b: _betainc_scalar(a, b, x))


def _beta_inv(p, a, b):
    if not 0.0 <= p <= 1.0:
        return None
    lo, hi = 0.0, 1.0
    for _ in range(100):
        mid = (lo + hi) / 2.0
        if _betainc_scalar(a, b, mid) < p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


_stats_udf("beta_inv", 3, _beta_inv)


def _welch_p(m1, v1, n1, m2, v2, n2):
    """welch_test(mean1, var1, n1, mean2, var2, n2) -> two-sided p-value
    [KQL]: Welch's unequal-variances t-test; Student-t tail via the
    regularized incomplete beta (P(|T|>t) = I_{df/(df+t^2)}(df/2, 1/2))."""
    import math

    se1, se2 = v1 / n1, v2 / n2
    se = se1 + se2
    if se <= 0:
        return None
    t = (m1 - m2) / math.sqrt(se)
    df = se * se / (se1 * se1 / (n1 - 1.0) + se2 * se2 / (n2 - 1.0))
    return _betainc_scalar(df / 2.0, 0.5, df / (df + t * t))


_stats_udf("welch_test", 6, _welch_p)


def _series_iir_impl(x, b, a):
    import numpy as np

    xs = np.asarray(x, dtype="float64")
    bs = [float(v) for v in b]
    as_ = [float(v) for v in a]
    if not as_ or as_[0] == 0.0:
        return None
    y = np.zeros_like(xs)
    for n in range(len(xs)):
        acc = 0.0
        for i, bi in enumerate(bs):
            if n - i >= 0:
                acc += bi * xs[n - i]
        for j in range(1, len(as_)):
            if n - j >= 0:
                acc -= as_[j] * y[n - j]
        y[n] = acc / as_[0]
    return y.tolist()


@fn("series_iir")
def _series_iir(tr, args):
    """series_iir(x, b_coeffs, a_coeffs) [KQL]: recursive (infinite impulse
    response) filter. Per-series python loop inside an Arrow batch — the
    recurrence is inherently sequential; arrays are make-series-sized."""
    if "series_iir" not in _PANDAS_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<double>")
        def udf(xc, bc, ac):
            import pandas as pd

            def row(x, b, a):
                if x is None or b is None or a is None:
                    return None
                return _series_iir_impl(x, b, a)

            return pd.Series([row(x, b, a) for x, b, a in zip(xc, bc, ac)])

        _PANDAS_UDF_CACHE["series_iir"] = udf
    return _PANDAS_UDF_CACHE["series_iir"](
        _as_dseries(tr.to_col(args[0])),
        _as_dseries(tr.to_col(args[1])),
        _as_dseries(tr.to_col(args[2])),
    )


def _series_seasonal_impl(y, period):
    import numpy as np

    n = len(y)
    p = int(period)
    if p <= 0 or n == 0:
        return [0.0] * n
    out = np.empty(n)
    for phase in range(min(p, n)):
        out[phase::p] = np.nanmean(y[phase::p])
    return out.tolist()


@fn("series_seasonal")
def _series_seasonal(tr, args):
    """series_seasonal(x, period) [KQL]: per-phase means tiled over the
    series (the seasonal component at a known period)."""
    if "series_seasonal" not in _PANDAS_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<double>")
        def udf(xc, pc):
            import numpy as np
            import pandas as pd

            def row(x, p):
                if x is None or p is None:
                    return None
                return _series_seasonal_impl(np.asarray(x, dtype="float64"), p)

            return pd.Series([row(x, p) for x, p in zip(xc, pc)])

        _PANDAS_UDF_CACHE["series_seasonal"] = udf
    return _PANDAS_UDF_CACHE["series_seasonal"](
        _as_dseries(tr.to_col(args[0])), tr.to_col(args[1]).cast("int")
    )


# ------------------------------------------------- round-5 coverage batch 2
# Remaining public-KQL scalar gaps: ASCII/regex helpers, bag_zip,
# replace_strings, tdigest percentrank, timezone conversion, unicode
# codepoint codecs, command-line / user-agent parsers, and the convert_*
# unit-conversion family. JVM-side column expressions wherever Spark can
# express the semantics; Arrow-batched pandas UDFs only for the codec-style
# functions (same tier as punycode/zlib above — never the hot path).


@fn("isascii")
def _isascii(tr, args):
    # true iff every char is ASCII; empty string is true [KQL isascii()]
    s = tr.to_col(args[0]).cast("string")
    return F.regexp_like(s, F.lit(r"^[\x00-\x7F]*$"))


@fn("regex_quote")
def _regex_quote(tr, args):
    # escape regex metacharacters so the result matches the input literally
    s = tr.to_col(args[0]).cast("string")
    return F.regexp_replace(s, r"([.^$|?*+()\[\]{}\\])", r"\\$1")


@fn("has_any_index")
def _has_any_index(tr, args):
    """has_any_index(source, dynamic([t1, t2, ...])) — 0-based index of the
    first term that `has`-matches source, -1 if none [KQL]. Terms must be
    constants (the word-boundary regex is built at plan time)."""
    from ..ast_nodes import TypedLit as _TypedLit
    from ..semantics import parse_dynamic_literal

    a = args[1]
    if isinstance(a, _TypedLit) and a.ktype == "dynamic":
        terms = parse_dynamic_literal(a.raw)
    else:
        terms = tr.const_value(a)
    if not isinstance(terms, (list, tuple)):
        raise KqlSemanticError(
            "has_any_index: second argument must be a dynamic array of terms"
        )
    s = tr.to_col(args[0]).cast("string")
    out = F.lit(-1)
    for i, t in reversed(list(enumerate(terms))):
        m = F.regexp_like(s, F.lit(r"(?i)\b" + _re.escape(str(t)) + r"\b"))
        if str(t) and str(t).isascii():  # Final_Sigma guard, see _has_terms
            m = F.contains(F.lower(s), F.lit(str(t).lower())) & m
        out = F.when(m, F.lit(i)).otherwise(out)
    return out.cast("bigint")


@fn("bag_zip")
def _bag_zip(tr, args):
    # dynamic bag from parallel key/value arrays; extra keys -> null value,
    # extra values dropped (Kusto bag_zip) — JSON map carrier like bag_merge
    keys = tr.to_col(args[0])
    vals = tr.to_col(args[1])
    n = F.least(F.size(keys), F.size(vals))
    pairs = F.zip_with(
        F.slice(keys, 1, F.greatest(n, F.lit(0))),
        F.slice(vals, 1, F.greatest(n, F.lit(0))),
        lambda k, v: F.struct(k.cast("string").alias("key"), v.cast("string").alias("value")),
    )
    extra = F.when(
        F.size(keys) > F.size(vals),
        F.transform(
            F.slice(keys, n + 1, F.size(keys) - n),
            lambda k: F.struct(
                k.cast("string").alias("key"),
                F.lit(None).cast("string").alias("value"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<key:string,value:string>>"))
    return F.to_json(F.map_from_entries(F.concat(pairs, extra)))


@fn("replace_strings")
def _replace_strings(tr, args):
    # sequential replace: fold (lookup, rewrite) pairs over the text
    text = tr.to_col(args[0]).cast("string")
    lookups = tr.to_col(args[1])
    rewrites = tr.to_col(args[2])
    pairs = F.zip_with(
        lookups,
        rewrites,
        lambda l, r: F.struct(
            l.cast("string").alias("l"), r.cast("string").alias("r")
        ),
    )
    return F.aggregate(
        pairs, text, lambda acc, p: F.replace(acc, p["l"], p["r"])
    )


@fn("percentrank_tdigest")
def _percentrank_tdigest(tr, args):
    # percentage rank [0, 100] of a value within a tdigest() sketch — same
    # KLL read as rank_tdigest (Kusto documents both names)
    td = tr.to_col(args[0])
    v = tr.to_col(args[1]).cast("double")
    return F.round(F.kll_sketch_get_rank_double(td, v) * 100.0, 4)


@fn("datetime_local_to_utc")
def _datetime_local_to_utc(tr, args):
    # interpret a wall-clock datetime in the given IANA timezone -> UTC
    return F.to_utc_timestamp(
        tr.to_col(args[0]), tr.to_col(args[1]).cast("string")
    )


@fn("datetime_utc_to_local")
def _datetime_utc_to_local(tr, args):
    return F.from_utc_timestamp(
        tr.to_col(args[0]), tr.to_col(args[1]).cast("string")
    )


@fn("unicode_codepoints_from_string")
def _unicode_codepoints_from_string(tr, args):
    """True codepoints (ord), not UTF-16 code units — surrogate pairs count
    once, so this is a Python-side codec like punycode above."""
    if "unicode_cp_from" not in _PANDAS_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<bigint>")
        def udf(col):
            return col.map(
                lambda s: None if s is None else [ord(c) for c in s]
            )

        _PANDAS_UDF_CACHE["unicode_cp_from"] = udf
    return _PANDAS_UDF_CACHE["unicode_cp_from"](
        tr.to_col(args[0]).cast("string")
    )


@fn("unicode_codepoints_to_string")
def _unicode_codepoints_to_string(tr, args):
    if "unicode_cp_to" not in _PANDAS_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def udf(col):
            def conv(a):
                if a is None:
                    return None
                try:
                    return "".join(chr(int(c)) for c in a if c is not None)
                except (ValueError, OverflowError):
                    return None

            return col.map(conv)

        _PANDAS_UDF_CACHE["unicode_cp_to"] = udf
    # accepts one array arg or codepoint varargs (Kusto allows both)
    if len(args) == 1:
        arr = tr.to_col(args[0])
        dt = tr.dtype_of_ast(args[0], arr)
        if not isinstance(dt, T.ArrayType):
            arr = F.array(arr.cast("bigint"))
        else:
            arr = arr.cast("array<bigint>")
    else:
        arr = F.array(*[tr.to_col(a).cast("bigint") for a in args])
    return _PANDAS_UDF_CACHE["unicode_cp_to"](arr)


def _cmdline_windows(s):
    """CommandLineToArgvW tokenization: backslashes literal unless they
    precede a double quote (2n -> n + toggle-off, 2n+1 -> n + literal quote);
    quotes toggle in-quote state; whitespace splits outside quotes."""
    import json

    args, cur, in_q, i, has_cur = [], [], False, 0, False
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\":
            j = i
            while j < n and s[j] == "\\":
                j += 1
            nbs = j - i
            if j < n and s[j] == '"':
                cur.append("\\" * (nbs // 2))
                if nbs % 2:
                    cur.append('"')
                    i = j + 1
                else:
                    in_q = not in_q
                    i = j + 1
                has_cur = True
            else:
                cur.append("\\" * nbs)
                i = j
                has_cur = True
        elif c == '"':
            in_q = not in_q
            has_cur = True
            i += 1
        elif c in " \t" and not in_q:
            if has_cur:
                args.append("".join(cur))
                cur, has_cur = [], False
            i += 1
        else:
            cur.append(c)
            has_cur = True
            i += 1
    if has_cur:
        args.append("".join(cur))
    return json.dumps(args)


@fn("parse_command_line")
def _parse_command_line(tr, args):
    """parse_command_line(cmd, 'windows') -> dynamic array of arguments
    [KQL]. Only the documented 'windows' parser exists."""
    ptype = tr.const_string(args[1]).lower() if len(args) > 1 else "windows"
    if ptype != "windows":
        raise KqlSemanticError(
            f"parse_command_line: unsupported parser type {ptype!r}"
            " (only 'windows' is defined)"
        )
    if "parse_cmdline" not in _PANDAS_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def udf(col):
            return col.map(lambda s: None if s is None else _cmdline_windows(s))

        _PANDAS_UDF_CACHE["parse_cmdline"] = udf
    return _PANDAS_UDF_CACHE["parse_cmdline"](tr.to_col(args[0]).cast("string"))


def _ua_parse(ua):
    """Heuristic UA-string classifier (the public ua-parser regex corpus is
    the model; this carries the major families). Returns the Kusto bag shape
    {Browser:{Family,MajorVersion,MinorVersion}, OperatingSystem:{...},
    Device:{Family}}."""
    import json
    import re

    def ver(m, gi=1):
        parts = (m.group(gi) or "").replace("_", ".").split(".")
        maj = parts[0] if parts and parts[0] else ""
        minor = parts[1] if len(parts) > 1 else ""
        return maj, minor

    browser = {"Family": "Other", "MajorVersion": "", "MinorVersion": ""}
    for fam, pat in [
        ("Edge", r"Edge?/(\d+[._]\d+)"),
        ("Opera", r"(?:Opera|OPR)[/ ](\d+[._]\d+)"),
        ("Chrome", r"Chrome/(\d+[._]\d+)"),
        ("Firefox", r"Firefox/(\d+[._]\d+)"),
        ("IE", r"MSIE (\d+[._]\d+)|Trident/.*rv:(\d+[._]\d+)"),
        ("Safari", r"Version/(\d+[._]\d+).*Safari"),
    ]:
        m = re.search(pat, ua)
        if m:
            gi = 1 if m.group(1) else 2 if m.lastindex and m.lastindex > 1 else 1
            maj, minor = ver(m, gi)
            browser = {"Family": fam, "MajorVersion": maj, "MinorVersion": minor}
            break

    os_info = {"Family": "Other", "MajorVersion": "", "MinorVersion": ""}
    for fam, pat in [
        ("Windows", r"Windows NT (\d+)\.(\d+)"),
        ("iOS", r"(?:iPhone|iPad|iPod).*OS (\d+)[._](\d+)"),
        ("Mac OS X", r"Mac OS X (\d+)[._](\d+)"),
        ("Android", r"Android (\d+)(?:\.(\d+))?"),
        ("Linux", r"Linux"),
    ]:
        m = re.search(pat, ua)
        if m:
            maj = m.group(1) if m.lastindex else ""
            minor = (m.group(2) or "") if (m.lastindex or 0) > 1 else ""
            os_info = {"Family": fam, "MajorVersion": maj, "MinorVersion": minor}
            break

    if re.search(r"iPad", ua):
        device = "iPad"
    elif re.search(r"iPhone", ua):
        device = "iPhone"
    elif re.search(r"Android.*Mobile", ua):
        device = "Generic Smartphone"
    elif re.search(r"Android", ua):
        device = "Generic Tablet"
    elif re.search(r"Windows|Macintosh|Linux", ua):
        device = "Other"
    else:
        device = "Other"

    return json.dumps(
        {
            "Browser": browser,
            "OperatingSystem": os_info,
            "Device": {"Family": device},
        }
    )


@fn("parse_user_agent")
def _parse_user_agent(tr, args):
    if "parse_ua" not in _PANDAS_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def udf(col):
            return col.map(lambda s: None if s is None else _ua_parse(s))

        _PANDAS_UDF_CACHE["parse_ua"] = udf
    # the optional look_for arg only narrows the output bag; returning the
    # full bag is a superset (extractjson reads the same paths)
    return _PANDAS_UDF_CACHE["parse_ua"](tr.to_col(args[0]).cast("string"))


# ------------------------------------------------ convert_* unit conversions
# Kusto's UnitsNet-backed family. Factors are unit -> SI base; conversion is
# value * factor[from] / factor[to], a pure JVM-side arithmetic expression
# (units must be string literals, as in Kusto). Temperature is affine and
# handled separately via Kelvin.

_UNIT_TABLES = {
    "convert_angle": {  # base: radian
        "Radian": 1.0, "Degree": 3.141592653589793 / 180.0,
        "Gradian": 3.141592653589793 / 200.0,
        "Revolution": 2 * 3.141592653589793,
        "Arcminute": 3.141592653589793 / 10800.0,
        "Arcsecond": 3.141592653589793 / 648000.0,
        "Microdegree": 1e-6 * 3.141592653589793 / 180.0,
        "Millidegree": 1e-3 * 3.141592653589793 / 180.0,
        "Microradian": 1e-6, "Milliradian": 1e-3, "Centiradian": 1e-2,
        "Deciradian": 1e-1, "Nanodegree": 1e-9 * 3.141592653589793 / 180.0,
        "Nanoradian": 1e-9,
    },
    "convert_energy": {  # base: joule
        "Joule": 1.0, "Kilojoule": 1e3, "Megajoule": 1e6, "Gigajoule": 1e9,
        "Millijoule": 1e-3, "Microjoule": 1e-6, "Nanojoule": 1e-9,
        "Calorie": 4.184, "Kilocalorie": 4184.0,
        "WattHour": 3600.0, "KilowattHour": 3.6e6, "MegawattHour": 3.6e9,
        "GigawattHour": 3.6e12, "TerawattHour": 3.6e15,
        "WattDay": 86400.0, "KilowattDay": 8.64e7, "MegawattDay": 8.64e10,
        "BritishThermalUnit": 1055.05585262,
        "KilobritishThermalUnit": 1055055.85262,
        "MegabritishThermalUnit": 1055055852.62,
        "ElectronVolt": 1.602176634e-19, "KiloelectronVolt": 1.602176634e-16,
        "MegaelectronVolt": 1.602176634e-13,
        "GigaelectronVolt": 1.602176634e-10,
        "TeraelectronVolt": 1.602176634e-7,
        "Erg": 1e-7, "FootPound": 1.3558179483314004,
        "ThermEc": 1.05506e8, "ThermUs": 1.054804e8,
        "ThermImperial": 1.05505585257348e8,
        "DecathermEc": 1.05506e9, "DecathermUs": 1.054804e9,
        "DecathermImperial": 1.05505585257348e9,
    },
    "convert_force": {  # base: newton
        "Newton": 1.0, "Kilonewton": 1e3, "Meganewton": 1e6,
        "Micronewton": 1e-6, "Millinewton": 1e-3, "Decanewton": 10.0,
        "KilogramForce": 9.80665, "TonneForce": 9806.65,
        "PoundForce": 4.4482216152605, "KilopoundForce": 4448.2216152605,
        "OunceForce": 0.27801385095378125, "Poundal": 0.138254954376,
        "Dyn": 1e-5, "KiloPond": 9.80665,
        "ShortTonForce": 8896.443230521, "Micropond": 9.80665e-6,
        "Millipond": 9.80665e-3, "Nanopond": 9.80665e-9, "Pond": 9.80665e-3,
    },
    "convert_length": {  # base: meter
        "Meter": 1.0, "Kilometer": 1e3, "Hectometer": 100.0,
        "Decameter": 10.0, "Decimeter": 0.1, "Centimeter": 0.01,
        "Millimeter": 1e-3, "Micrometer": 1e-6, "Nanometer": 1e-9,
        "Mile": 1609.344, "Yard": 0.9144, "Foot": 0.3048, "Inch": 0.0254,
        "Mil": 2.54e-5, "Microinch": 2.54e-8,
        "NauticalMile": 1852.0, "Fathom": 1.8288, "Chain": 20.1168,
        "Twip": 0.0254 / 1440.0, "Hand": 0.1016,
        "AstronomicalUnit": 1.495978707e11, "LightYear": 9.4607304725808e15,
        "Parsec": 3.08567758128e16, "KilolightYear": 9.4607304725808e18,
        "Kiloparsec": 3.08567758128e19, "Megaparsec": 3.08567758128e22,
        "SolarRadius": 6.95510e8, "Shackle": 27.432,
        "UsSurveyFoot": 1200.0 / 3937.0,
        "DtpPica": 0.0254 / 6.0, "DtpPoint": 0.0254 / 72.0,
        "PrinterPica": 0.004217517600000001 * 1.0, "PrinterPoint": 0.000351459803,
    },
    "convert_mass": {  # base: kilogram
        "Kilogram": 1.0, "Gram": 1e-3, "Milligram": 1e-6, "Microgram": 1e-9,
        "Nanogram": 1e-12, "Centigram": 1e-5, "Decigram": 1e-4,
        "Decagram": 1e-2, "Hectogram": 0.1, "Kilotonne": 1e6,
        "Megatonne": 1e9, "Tonne": 1e3, "Pound": 0.45359237,
        "Kilopound": 453.59237, "Megapound": 453592.37,
        "Ounce": 0.028349523125, "Stone": 6.35029318,
        "ShortTon": 907.18474, "LongTon": 1016.0469088,
        "ShortHundredweight": 45.359237, "LongHundredweight": 50.80234544,
        "Grain": 6.479891e-5, "SolarMass": 1.98947e30,
        "EarthMass": 5.9722e24, "Slug": 14.593903,
    },
    "convert_speed": {  # base: meter/second
        "MeterPerSecond": 1.0, "KilometerPerHour": 1000.0 / 3600.0,
        "MilePerHour": 0.44704, "Knot": 1852.0 / 3600.0,
        "FootPerSecond": 0.3048, "FootPerMinute": 0.3048 / 60.0,
        "FootPerHour": 0.3048 / 3600.0, "InchPerSecond": 0.0254,
        "InchPerMinute": 0.0254 / 60.0, "InchPerHour": 0.0254 / 3600.0,
        "YardPerSecond": 0.9144, "YardPerMinute": 0.9144 / 60.0,
        "YardPerHour": 0.9144 / 3600.0, "MeterPerMinute": 1.0 / 60.0,
        "MeterPerHour": 1.0 / 3600.0, "CentimeterPerSecond": 0.01,
        "CentimeterPerMinute": 0.01 / 60.0, "CentimeterPerHour": 0.01 / 3600.0,
        "MillimeterPerSecond": 1e-3, "MillimeterPerMinute": 1e-3 / 60.0,
        "MillimeterPerHour": 1e-3 / 3600.0, "DecimeterPerSecond": 0.1,
        "DecimeterPerMinute": 0.1 / 60.0, "KilometerPerSecond": 1000.0,
        "KilometerPerMinute": 1000.0 / 60.0, "MicrometerPerSecond": 1e-6,
        "MicrometerPerMinute": 1e-6 / 60.0, "NanometerPerSecond": 1e-9,
        "NanometerPerMinute": 1e-9 / 60.0, "UsSurveyFootPerSecond": 1200.0 / 3937.0,
        "UsSurveyFootPerMinute": 1200.0 / 3937.0 / 60.0,
        "UsSurveyFootPerHour": 1200.0 / 3937.0 / 3600.0,
        "ElectricalMobility": 1.0,
    },
    "convert_volume": {  # base: cubic meter
        "CubicMeter": 1.0, "CubicKilometer": 1e9, "CubicDecimeter": 1e-3,
        "CubicCentimeter": 1e-6, "CubicMillimeter": 1e-9,
        "CubicMicrometer": 1e-18, "Liter": 1e-3, "Deciliter": 1e-4,
        "Centiliter": 1e-5, "Milliliter": 1e-6, "Microliter": 1e-9,
        "Hectoliter": 0.1, "Kiloliter": 1.0, "Megaliter": 1e3,
        "CubicFoot": 0.028316846592, "CubicInch": 1.6387064e-5,
        "CubicYard": 0.764554857984, "CubicMile": 4168181825.440579584,
        "UsGallon": 0.003785411784, "UsQuart": 0.000946352946,
        "UsPint": 0.000473176473, "UsOunce": 2.95735295625e-5,
        "UsTablespoon": 1.478676478125e-5, "UsTeaspoon": 4.92892159375e-6,
        "UsCustomaryCup": 2.365882365e-4, "UsLegalCup": 2.4e-4,
        "ImperialGallon": 0.00454609, "ImperialQuart": 0.0011365225,
        "ImperialPint": 0.00056826125, "ImperialOunce": 2.84130625e-5,
        "UkTablespoon": 1.5e-5, "AuTablespoon": 2e-5,
        "MetricCup": 2.5e-4, "MetricTeaspoon": 5e-6,
        "OilBarrel": 0.158987294928, "BoardFoot": 2.359737216e-3,
        "AcreFoot": 1233.48183754752, "HectareMeter": 1e4,
        "DecausGallon": 0.03785411784, "DeciusGallon": 0.0003785411784,
        "HectocubicFoot": 2.8316846592, "HectocubicMeter": 100.0,
        "HectousGallon": 0.3785411784, "KilocubicFoot": 28.316846592,
        "KilocubicMeter": 1e3, "KiloimperialGallon": 4.54609,
        "KilousGallon": 3.785411784, "MegacubicFoot": 28316.846592,
        "MegaimperialGallon": 4546.09, "MegausGallon": 3785.411784,
    },
}


def _convert_fn(fname, table):
    def impl(tr, args):
        v = tr.to_col(args[0]).cast("double")
        frm = tr.const_string(args[1])
        to = tr.const_string(args[2])
        for u in (frm, to):
            if u not in table:
                raise KqlSemanticError(
                    f"{fname}: unknown unit {u!r} (known: "
                    f"{', '.join(sorted(table))})"
                )
        return v * F.lit(table[frm] / table[to])

    REGISTRY[fname] = impl


for _fname, _table in _UNIT_TABLES.items():
    _convert_fn(_fname, _table)


@fn("convert_temperature")
def _convert_temperature(tr, args):
    # affine units -> Kelvin = v*scale + offset, then invert for the target
    affine = {
        "Kelvin": (1.0, 0.0),
        "DegreeCelsius": (1.0, 273.15),
        "DegreeFahrenheit": (5.0 / 9.0, 459.67 * 5.0 / 9.0),
        "DegreeRankine": (5.0 / 9.0, 0.0),
        "DegreeDelisle": (-2.0 / 3.0, 373.15),
        "DegreeNewton": (100.0 / 33.0, 273.15),
        "DegreeReaumur": (5.0 / 4.0, 273.15),
        "DegreeRoemer": (40.0 / 21.0, 273.15 - 7.5 * 40.0 / 21.0),
        "MillidegreeCelsius": (1e-3, 273.15),
        "SolarTemperature": (5778.0, 0.0),
    }
    v = tr.to_col(args[0]).cast("double")
    frm = tr.const_string(args[1])
    to = tr.const_string(args[2])
    for u in (frm, to):
        if u not in affine:
            raise KqlSemanticError(
                f"convert_temperature: unknown unit {u!r} (known: "
                f"{', '.join(sorted(affine))})"
            )
    fs, fo = affine[frm]
    ts, to_off = affine[to]
    kelvin = v * F.lit(fs) + F.lit(fo)
    return (kelvin - F.lit(to_off)) / F.lit(ts)


# -------------------------------------------- geo line/polygon (SURVEY §2.9)
# Spherical approximations on the same mean-Earth radius as
# geo_distance_2points (6371009 m). Geometry arrives as GeoJSON dynamic
# columns, so these are Arrow-batched pandas UDFs (numpy per geometry) —
# per-geometry cost, never per-coordinate Python.

_GEO_R = 6371009.0


_WKT_TYPES = {
    "POINT": "Point",
    "LINESTRING": "LineString",
    "POLYGON": "Polygon",
    "MULTIPOINT": "MultiPoint",
    "MULTILINESTRING": "MultiLineString",
    "MULTIPOLYGON": "MultiPolygon",
    "GEOMETRYCOLLECTION": "GeometryCollection",
}


def _wkt_to_geojson_obj(s: str):
    """Parse OGC WKT (round 6) into a GeoJSON dict. Z kept as a third
    coordinate, M dropped (GeoJSON has no measure); EMPTY -> empty
    coordinates. Returns None on malformed input."""
    import re

    toks = re.findall(r"[A-Za-z]+|[()]|,|[-+0-9.eE]+", s or "")
    pos = [0]

    def peek():
        return toks[pos[0]] if pos[0] < len(toks) else None

    def take():
        t = peek()
        pos[0] += 1
        return t

    def coords(dims):
        nums = []
        while peek() not in (",", ")", None):
            nums.append(float(take()))
        if len(nums) < 2:
            raise ValueError("wkt: bad coordinate")
        if dims == "M":
            nums = nums[:2]
        else:
            # Z / ZM / untagged-3D keep the third coordinate (GeoJSON
            # positions allow [x, y, z]); M-measures are dropped
            nums = nums[:3]
        return nums

    def seq(depth, dims):
        # depth 0: one position; 1: list of positions; 2: list of rings; ...
        if depth == 0:
            return coords(dims)
        if take() != "(":
            raise ValueError("wkt: expected (")
        out = []
        while True:
            # MULTIPOINT allows both (10 40, 40 30) and ((10 40), (40 30))
            if depth == 1 and peek() == "(":
                take()
                out.append(coords(dims))
                if take() != ")":
                    raise ValueError("wkt: expected )")
            else:
                out.append(seq(depth - 1, dims))
            t = take()
            if t == ")":
                return out
            if t != ",":
                raise ValueError("wkt: expected , or )")

    def geometry():
        t = take()
        if t is None:
            raise ValueError("wkt: empty input")
        gtype = _WKT_TYPES.get(t.upper())
        if gtype is None:
            raise ValueError(f"wkt: unknown type {t}")
        dims = ""
        if peek() and peek().upper() in ("Z", "M", "ZM"):
            dims = take().upper()
        if peek() and peek().upper() == "EMPTY":
            take()
            if gtype == "GeometryCollection":
                return {"type": gtype, "geometries": []}
            return {"type": gtype, "coordinates": []}
        if gtype == "GeometryCollection":
            if take() != "(":
                raise ValueError("wkt: expected (")
            geoms = [geometry()]
            while True:
                t2 = take()
                if t2 == ")":
                    return {"type": gtype, "geometries": geoms}
                if t2 != ",":
                    raise ValueError("wkt: expected , or )")
                geoms.append(geometry())
        depth = {
            "Point": 1, "LineString": 1, "Polygon": 2,
            "MultiPoint": 1, "MultiLineString": 2, "MultiPolygon": 3,
        }[gtype]
        c = seq(depth, dims)
        if gtype == "Point":
            # seq(1) wrapped the single position in a list
            c = c[0]
        return {"type": gtype, "coordinates": c}

    try:
        g = geometry()
        if peek() is not None:
            return None
        return g
    except (ValueError, IndexError):
        return None


def _geojson_obj_to_wkt(g) -> str | None:
    """GeoJSON dict -> OGC WKT text (inverse of _wkt_to_geojson_obj)."""

    def num(x):
        f = float(x)
        return str(int(f)) if f == int(f) else repr(f)

    def pt(c):
        return " ".join(num(x) for x in c)

    def ring(c):
        return "(" + ", ".join(pt(p) for p in c) + ")"

    def rings(c):
        return "(" + ", ".join(ring(r) for r in c) + ")"

    try:
        t = g["type"]
        if t == "GeometryCollection":
            inner = [_geojson_obj_to_wkt(x) for x in g["geometries"]]
            if any(x is None for x in inner):
                return None
            if not inner:
                return "GEOMETRYCOLLECTION EMPTY"
            return "GEOMETRYCOLLECTION (" + ", ".join(inner) + ")"
        c = g["coordinates"]
        up = t.upper()
        if c == [] or c is None:
            return f"{up} EMPTY"
        if t == "Point":
            return f"POINT ({pt(c)})"
        if t == "LineString":
            return f"LINESTRING {ring(c)}"
        if t == "MultiPoint":
            return f"MULTIPOINT {ring(c)}"
        if t == "Polygon":
            return f"POLYGON {rings(c)}"
        if t == "MultiLineString":
            return f"MULTILINESTRING {rings(c)}"
        if t == "MultiPolygon":
            return (
                "MULTIPOLYGON ("
                + ", ".join(rings(p) for p in c)
                + ")"
            )
        return None
    except (KeyError, TypeError, ValueError):
        return None


_GEO_COORDS_CACHE: dict = {}


def _geo_coords(s, want):
    # round 15 (codegen-fallback sweep): the geo lookup plugins call this
    # once per SURVIVING (point, geometry) pair inside their exact-check
    # kernels — on a fact table where many points hit the same polygon's
    # bbox that is O(matches) re-parses of the same handful of
    # dimension-table strings. Memoize per worker (bounded; the key space
    # is the lookup table's geometry column).
    if isinstance(s, str):
        key = (s, want)
        hit = _GEO_COORDS_CACHE.get(key, _GEO_COORDS_CACHE)
        if hit is not _GEO_COORDS_CACHE:
            return hit
        out = _geo_coords_uncached(s, want)
        if len(_GEO_COORDS_CACHE) >= 4096:  # pragma: no cover - bound
            _GEO_COORDS_CACHE.clear()
        _GEO_COORDS_CACHE[key] = out
        return out
    return _geo_coords_uncached(s, want)


def _geo_coords_uncached(s, want):
    import json

    try:
        if isinstance(s, str):
            txt = s.lstrip()
            if txt[:1] == "{":
                g = json.loads(s)
            else:
                # WKT carrier (round 6): accepted wherever the scalar geo
                # family takes GeoJSON dynamics
                g = _wkt_to_geojson_obj(s)
                if g is None:
                    return None
        else:
            g = s
        if g.get("type") != want:
            return None
        return g["coordinates"]
    except Exception:
        return None


def _hav(lon1, lat1, lon2, lat2):
    """Haversine metres; vectorized (numpy arrays) or scalar inputs."""
    import numpy as np

    rl1, rl2 = np.radians(lat1), np.radians(lat2)
    dlat = np.radians(lat2 - lat1) / 2.0
    dlon = np.radians(lon2 - lon1) / 2.0
    h = np.sin(dlat) ** 2 + np.cos(rl1) * np.cos(rl2) * np.sin(dlon) ** 2
    # float error can push h a hair past 1 for antipodal points
    return 2.0 * _GEO_R * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


def _geojson_col(tr, a) -> Column:
    # dynamic literals keep their raw JSON text (a map<> literal would need
    # uniform value types); columns pass through as their JSON-string carrier
    from ..ast_nodes import TypedLit as _TypedLit

    if isinstance(a, _TypedLit) and a.ktype == "dynamic":
        return F.lit(a.raw)
    return tr.to_col(a).cast("string")


def _geo_json_udf(name, ret_type, one):
    def entry(tr, args):
        if name not in _PANDAS_UDF_CACHE:
            from pyspark.sql.functions import pandas_udf

            @pandas_udf(ret_type)
            def udf(col):
                return col.map(lambda s: None if s is None else one(s))

            _PANDAS_UDF_CACHE[name] = udf
        return _PANDAS_UDF_CACHE[name](_geojson_col(tr, args[0]))

    REGISTRY[name] = entry


def _line_length_m(s):
    import numpy as np

    cs = _geo_coords(s, "LineString")
    if cs is None or len(cs) < 2:
        return None
    a = np.asarray(cs, dtype="float64")
    return float(
        np.sum(_hav(a[:-1, 0], a[:-1, 1], a[1:, 0], a[1:, 1]))
    )


def _ring_area_sterad(ring):
    # spherical shoelace (signed, steradians): sum (λ2−λ1)(sinφ1+sinφ2)/2
    import numpy as np

    a = np.asarray(ring, dtype="float64")
    lam = np.radians(a[:, 0])
    phi = np.radians(a[:, 1])
    lam2 = np.roll(lam, -1)
    phi2 = np.roll(phi, -1)
    dlam = lam2 - lam
    # normalize antimeridian-crossing steps into (-pi, pi]
    dlam = np.where(dlam > np.pi, dlam - 2 * np.pi, dlam)
    dlam = np.where(dlam < -np.pi, dlam + 2 * np.pi, dlam)
    return float(np.sum(dlam * (np.sin(phi) + np.sin(phi2)) / 2.0))


def _polygon_area_m2(s):
    # accepts Polygon AND MultiPolygon, like Kusto's geo_polygon_area
    # (round 8: MultiPolygon support — union results are often multi)
    cs = _geo_coords(s, "Polygon")
    polys = [cs] if cs else _geo_coords(s, "MultiPolygon")
    if not polys:
        return None
    total = 0.0
    for poly in polys:
        outer = abs(_ring_area_sterad(poly[0]))
        holes = sum(abs(_ring_area_sterad(r)) for r in poly[1:])
        total += outer - holes
    return total * _GEO_R * _GEO_R


def _polygon_centroid_json(s):
    """Planar centroid of the outer ring in lon/lat space (shoelace
    weights) — matches Kusto for the small, convex-ish polygons of the
    public examples; returns a GeoJSON Point bag."""
    import json

    import numpy as np

    cs = _geo_coords(s, "Polygon")
    if not cs:
        return None
    a = np.asarray(cs[0], dtype="float64")
    if len(a) and (a[0] != a[-1]).any():
        a = np.vstack([a, a[:1]])
    x, y = a[:-1, 0], a[:-1, 1]
    x2, y2 = a[1:, 0], a[1:, 1]
    cross = x * y2 - x2 * y
    area2 = np.sum(cross)
    if abs(area2) < 1e-12:
        cx, cy = float(np.mean(x)), float(np.mean(y))
    else:
        cx = float(np.sum((x + x2) * cross) / (3.0 * area2))
        cy = float(np.sum((y + y2) * cross) / (3.0 * area2))
    return json.dumps({"type": "Point", "coordinates": [cx, cy]})


def _wkt_to_geojson_text(s):
    import json

    g = _wkt_to_geojson_obj(s)
    return None if g is None else json.dumps(g, separators=(", ", ": "))


def _geojson_to_wkt_text(s):
    import json

    try:
        txt = s.lstrip()
        g = json.loads(s) if txt[:1] == "{" else _wkt_to_geojson_obj(s)
    except Exception:
        return None
    return None if g is None else _geojson_obj_to_wkt(g)


# WKT carriers (round 6, beyond-Kusto utility pair): convert between OGC
# WKT text and the engine's GeoJSON dynamic carrier; the scalar geo family
# also accepts WKT directly via _geo_coords
_geo_json_udf("geo_wkt_to_geojson", "string", _wkt_to_geojson_text)
_geo_json_udf("geo_geojson_to_wkt", "string", _geojson_to_wkt_text)

_geo_json_udf("geo_line_length", "double", _line_length_m)
_geo_json_udf("geo_polygon_area", "double", _polygon_area_m2)
_geo_json_udf("geo_polygon_centroid", "string", _polygon_centroid_json)


@fn("geo_distance_point_to_line")
def _geo_distance_point_to_line(tr, args):
    """geo_distance_point_to_line(lon, lat, line) [KQL]: min great-circle
    distance from the point to any segment of a GeoJSON LineString —
    cross-track via 3D unit vectors, clamped to segment endpoints."""
    if "geo_dist_pt_line" not in _PANDAS_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf
        import pandas as pd

        @pandas_udf("double")
        def udf(lons, lats, lines):
            import numpy as np

            def one(lo, la, s):
                if lo is None or la is None or s is None:
                    return None
                cs = _geo_coords(s, "LineString")
                if cs is None or len(cs) < 2:
                    return None
                seg = np.asarray(cs, dtype="float64")

                def unit(lon, lat):
                    lam, phi = np.radians(lon), np.radians(lat)
                    return np.stack(
                        [np.cos(phi) * np.cos(lam), np.cos(phi) * np.sin(lam), np.sin(phi)],
                        axis=-1,
                    )

                p = unit(float(lo), float(la))
                a = unit(seg[:-1, 0], seg[:-1, 1])
                b = unit(seg[1:, 0], seg[1:, 1])
                n = np.cross(a, b)
                nn = np.linalg.norm(n, axis=1)
                best = np.inf
                for i in range(len(a)):
                    if nn[i] < 1e-15:  # degenerate segment
                        d = np.arccos(np.clip(np.dot(p, a[i]), -1, 1))
                    else:
                        ni = n[i] / nn[i]
                        # foot of perpendicular on the great circle
                        f = p - np.dot(p, ni) * ni
                        fn = np.linalg.norm(f)
                        if fn < 1e-15:
                            d = np.pi / 2
                        else:
                            f = f / fn
                            # inside the arc iff it lies between a and b
                            if (
                                np.dot(np.cross(a[i], f), ni) >= -1e-12
                                and np.dot(np.cross(f, b[i]), ni) >= -1e-12
                            ):
                                d = np.arccos(np.clip(np.dot(p, f), -1, 1))
                            else:
                                d = min(
                                    np.arccos(np.clip(np.dot(p, a[i]), -1, 1)),
                                    np.arccos(np.clip(np.dot(p, b[i]), -1, 1)),
                                )
                    best = min(best, d)
                return float(best * _GEO_R)

            return pd.Series(
                [one(lo, la, s) for lo, la, s in zip(lons, lats, lines)]
            )

        _PANDAS_UDF_CACHE["geo_dist_pt_line"] = udf
    return _PANDAS_UDF_CACHE["geo_dist_pt_line"](
        tr.to_col(args[0]).cast("double"),
        tr.to_col(args[1]).cast("double"),
        _geojson_col(tr, args[2]),
    )


# ------------------------------------------------------------- S2 cells
# geo_point_to_s2cell / geo_s2cell_to_central_point [KQL geo]. Written from
# the public S2 geometry spec: lat/lng -> unit sphere -> cube face (u,v) ->
# quadratic (s,t) -> leaf (i,j) -> Hilbert curve position -> 64-bit cell id
# (face:3 | pos:2L | sentinel), token = hex with trailing zeros stripped.
# Codec tier (per-value integer walks), so Arrow-batched pandas UDFs like
# punycode/zlib above.

_S2_SWAP, _S2_INVERT = 1, 2
_S2_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_S2_IJ_TO_POS = tuple(
    tuple(row.index(ij) for ij in range(4)) for row in _S2_POS_TO_IJ
)
_S2_POS_TO_ORIENT = (_S2_SWAP, 0, 0, _S2_INVERT | _S2_SWAP)


def _s2_st_from_uv(u):
    # quadratic projection (the S2 default): evens out leaf-cell areas
    import math

    return (
        0.5 * math.sqrt(1.0 + 3.0 * u)
        if u >= 0
        else 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * u)
    )


def _s2_uv_from_st(s):
    return (4.0 * s * s - 1.0) / 3.0 if s >= 0.5 else (
        1.0 - 4.0 * (1.0 - s) * (1.0 - s)
    ) / 3.0


def _s2_encode(lon, lat, level):
    import math

    phi, lam = math.radians(lat), math.radians(lon)
    x = math.cos(phi) * math.cos(lam)
    y = math.cos(phi) * math.sin(lam)
    z = math.sin(phi)
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        face = 0 if x > 0 else 3
    elif ay >= ax and ay >= az:
        face = 1 if y > 0 else 4
    else:
        face = 2 if z > 0 else 5
    u, v = {
        0: lambda: (y / x, z / x),
        1: lambda: (-x / y, z / y),
        2: lambda: (-x / z, -y / z),
        3: lambda: (z / x, y / x),
        4: lambda: (z / y, -x / y),
        5: lambda: (-y / z, -x / z),
    }[face]()
    max_ij = (1 << 30) - 1
    i = min(max(int(_s2_st_from_uv(u) * (1 << 30)), 0), max_ij)
    j = min(max(int(_s2_st_from_uv(v) * (1 << 30)), 0), max_ij)
    pos = 0
    orient = face & _S2_SWAP
    for k in range(29, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        qp = _S2_IJ_TO_POS[orient][ij]
        pos = (pos << 2) | qp
        orient ^= _S2_POS_TO_ORIENT[qp]
    cid = (face << 61) | (pos << 1) | 1  # leaf (level 30)
    if level < 30:
        lsb = 1 << (2 * (30 - level))
        cid = (cid & ~(2 * lsb - 1)) | lsb
    return format(cid, "016x").rstrip("0") or "0"


def _s2_decode_raw(token):
    """token -> (face, i, j, level) at level resolution, or None."""
    try:
        cid = int(token.ljust(16, "0"), 16)
    except (ValueError, AttributeError):
        return None
    if cid == 0:
        return None
    face = cid >> 61
    if face > 5:
        return None
    tz = (cid & -cid).bit_length() - 1  # trailing zeros below the sentinel
    if tz % 2 or tz > 60:
        return None
    level = 30 - tz // 2
    pos = cid >> (2 * (30 - level) + 1)  # 2*level Hilbert bits
    i = j = 0
    orient = face & _S2_SWAP
    for k in range(level - 1, -1, -1):
        qp = (pos >> (2 * k)) & 3
        ij = _S2_POS_TO_IJ[orient][qp]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        orient ^= _S2_POS_TO_ORIENT[qp]
    return face, i, j, level


def _s2_st_extended_uv(s):
    """Quadratic st->uv transform extended continuously beyond [0, 1] (a
    central projection stays valid past the face edge, so cross-face
    neighbors resolve through the xyz round-trip)."""
    if s >= 0.5:
        return (1.0 / 3.0) * (4 * s * s - 1)
    return (1.0 / 3.0) * (1 - 4 * (1 - s) * (1 - s))


def _s2_face_xyz(face, u, v):
    return {
        0: (1.0, u, v),
        1: (-u, 1.0, v),
        2: (-u, -v, 1.0),
        3: (-1.0, -v, -u),
        4: (v, -1.0, -u),
        5: (v, u, -1.0),
    }[face]


def _s2_latlon(face, s, t):
    import math

    u, v = _s2_st_extended_uv(s), _s2_st_extended_uv(t)
    x, y, z = _s2_face_xyz(face, u, v)
    n = math.sqrt(x * x + y * y + z * z)
    lat = math.degrees(math.asin(z / n))
    lon = math.degrees(math.atan2(y, x))
    return lon, lat


def _s2_decode(token):
    import json

    raw = _s2_decode_raw(token)
    if raw is None:
        return None
    face, i, j, level = raw
    lon, lat = _s2_latlon(face, (i + 0.5) / (1 << level), (j + 0.5) / (1 << level))
    return json.dumps({"type": "Point", "coordinates": [lon, lat]})


@fn("geo_point_to_s2cell")
def _geo_point_to_s2cell(tr, args):
    level = int(tr.const_value(args[2])) if len(args) > 2 else 11
    if not 0 <= level <= 30:
        raise KqlSemanticError("geo_point_to_s2cell: level must be in [0, 30]")
    key = f"s2enc:{level}"
    if key not in _PANDAS_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf
        import pandas as pd

        @pandas_udf("string")
        def udf(lons, lats):
            return pd.Series(
                [
                    None
                    if lo is None or la is None or not (-90 <= la <= 90)
                    else _s2_encode(float(lo), float(la), level)
                    for lo, la in zip(lons, lats)
                ]
            )

        _PANDAS_UDF_CACHE[key] = udf
    return _PANDAS_UDF_CACHE[key](
        tr.to_col(args[0]).cast("double"), tr.to_col(args[1]).cast("double")
    )


_str_udf("geo_s2cell_to_central_point", _s2_decode)


def _s2_polygon(token):
    import json

    raw = _s2_decode_raw(token)
    if raw is None:
        return None
    face, i, j, level = raw
    n = 1 << level
    corners = [
        _s2_latlon(face, (i + di) / n, (j + dj) / n)
        for di, dj in ((0, 0), (1, 0), (1, 1), (0, 1))
    ]
    ring = [[lo, la] for lo, la in corners] + [list(corners[0])]
    return json.dumps({"type": "Polygon", "coordinates": [ring]})


_str_udf("geo_s2cell_to_polygon", _s2_polygon)


def _s2_neighbors(token):
    """All 8 same-level neighbors [KQL geo_s2cell_neighbors]. Off-face
    centers re-resolve through the extended-uv -> xyz round-trip, so cells
    across a cube-face edge (and corner cells with only 7 distinct
    neighbors) come out right."""
    raw = _s2_decode_raw(token)
    if raw is None:
        return None
    face, i, j, level = raw
    n = 1 << level
    out = []
    for dj in (1, 0, -1):
        for di in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            lon, lat = _s2_latlon(face, (i + di + 0.5) / n, (j + dj + 0.5) / n)
            tok = _s2_encode(lon, lat, level)
            if tok != token and tok not in out:
                out.append(tok)
    return out


def _s2_neighbors_entry(tr, args):
    key = "s2:neighbors"
    if key not in _PANDAS_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<string>")
        def udf(col):
            return col.map(lambda s: None if s is None else _s2_neighbors(s))

        _PANDAS_UDF_CACHE[key] = udf
    return _PANDAS_UDF_CACHE[key](tr.to_col(args[0]).cast("string"))


REGISTRY["geo_s2cell_neighbors"] = _s2_neighbors_entry


def _polygon_perimeter_m(s):
    import numpy as np

    cs = _geo_coords(s, "Polygon")
    if not cs:
        return None
    total = 0.0
    for ring in cs:
        a = np.asarray(ring, dtype="float64")
        if len(a) < 2:
            continue
        if (a[0] != a[-1]).any():
            a = np.vstack([a, a[:1]])
        total += float(np.sum(_hav(a[:-1, 0], a[:-1, 1], a[1:, 0], a[1:, 1])))
    return total


def _line_centroid_json(s):
    # length-weighted midpoint average in lon/lat (small-segment approx.)
    import json

    import numpy as np

    cs = _geo_coords(s, "LineString")
    if cs is None or len(cs) < 2:
        return None
    a = np.asarray(cs, dtype="float64")
    seg_len = _hav(a[:-1, 0], a[:-1, 1], a[1:, 0], a[1:, 1])
    mid = (a[:-1] + a[1:]) / 2.0
    w = np.sum(seg_len)
    if w <= 0:
        c = a[0]
    else:
        c = np.sum(mid * seg_len[:, None], axis=0) / w
    return json.dumps({"type": "Point", "coordinates": [float(c[0]), float(c[1])]})


_geo_json_udf("geo_polygon_perimeter", "double", _polygon_perimeter_m)
_geo_json_udf("geo_line_centroid", "string", _line_centroid_json)


@fn("geo_closest_point_on_line")
def _geo_closest_point_on_line(tr, args):
    """geo_closest_point_on_line(lon, lat, line) [KQL]: the point on the
    LineString nearest the input point (GeoJSON Point) — same clamped
    cross-track walk as geo_distance_point_to_line, returning the foot."""
    if "geo_closest_pt_line" not in _PANDAS_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf
        import pandas as pd

        @pandas_udf("string")
        def udf(lons, lats, lines):
            import json

            import numpy as np

            def one(lo, la, s):
                if lo is None or la is None or s is None:
                    return None
                cs = _geo_coords(s, "LineString")
                if cs is None or len(cs) < 2:
                    return None
                seg = np.asarray(cs, dtype="float64")

                def unit(lon, lat):
                    lam, phi = np.radians(lon), np.radians(lat)
                    return np.stack(
                        [np.cos(phi) * np.cos(lam), np.cos(phi) * np.sin(lam), np.sin(phi)],
                        axis=-1,
                    )

                p = unit(float(lo), float(la))
                a = unit(seg[:-1, 0], seg[:-1, 1])
                b = unit(seg[1:, 0], seg[1:, 1])
                n = np.cross(a, b)
                nn = np.linalg.norm(n, axis=1)
                best, best_pt = np.inf, a[0]
                for i in range(len(a)):
                    cands = [a[i], b[i]]
                    if nn[i] >= 1e-15:
                        ni = n[i] / nn[i]
                        f = p - np.dot(p, ni) * ni
                        fn = np.linalg.norm(f)
                        if fn >= 1e-15:
                            f = f / fn
                            if (
                                np.dot(np.cross(a[i], f), ni) >= -1e-12
                                and np.dot(np.cross(f, b[i]), ni) >= -1e-12
                            ):
                                cands.append(f)
                    for c in cands:
                        d = np.arccos(np.clip(np.dot(p, c), -1, 1))
                        if d < best:
                            best, best_pt = d, c
                lon_out = float(np.degrees(np.arctan2(best_pt[1], best_pt[0])))
                lat_out = float(np.degrees(np.arcsin(np.clip(best_pt[2], -1, 1))))
                return json.dumps(
                    {"type": "Point", "coordinates": [lon_out, lat_out]}
                )

            return pd.Series([one(lo, la, s) for lo, la, s in zip(lons, lats, lines)])

        _PANDAS_UDF_CACHE["geo_closest_pt_line"] = udf
    return _PANDAS_UDF_CACHE["geo_closest_pt_line"](
        tr.to_col(args[0]).cast("double"),
        tr.to_col(args[1]).cast("double"),
        _geojson_col(tr, args[2]),
    )


def _lonlat_unit(lon, lat):
    import numpy as np

    lam, phi = np.radians(lon), np.radians(lat)
    return np.stack(
        [np.cos(phi) * np.cos(lam), np.cos(phi) * np.sin(lam), np.sin(phi)],
        axis=-1,
    )


def _closest_on_arcs(p, a, b):
    """(best great-circle angle, best xyz) from unit point p to the arcs
    a[i] -> b[i] — the same clamped cross-track walk the line functions use."""
    import numpy as np

    n = np.cross(a, b)
    nn = np.linalg.norm(n, axis=1)
    best, best_pt = np.inf, a[0]
    for i in range(len(a)):
        cands = [a[i], b[i]]
        if nn[i] >= 1e-15:
            ni = n[i] / nn[i]
            f = p - np.dot(p, ni) * ni
            fn = np.linalg.norm(f)
            if fn >= 1e-15:
                f = f / fn
                if (
                    np.dot(np.cross(a[i], f), ni) >= -1e-12
                    and np.dot(np.cross(f, b[i]), ni) >= -1e-12
                ):
                    cands.append(f)
        for c in cands:
            d = np.arccos(np.clip(np.dot(p, c), -1, 1))
            if d < best:
                best, best_pt = d, c
    return best, best_pt


def _point_in_rings(lo, la, rings):
    """Planar ray cast over GeoJSON polygon rings (hole-aware: inside an
    odd number of rings = inside)."""
    inside = False
    for ring in rings:
        hits = False
        n = len(ring)
        for i in range(n - 1):
            x1, y1 = ring[i][0], ring[i][1]
            x2, y2 = ring[i + 1][0], ring[i + 1][1]
            if (y1 > la) != (y2 > la):
                xint = x1 + (la - y1) * (x2 - x1) / (y2 - y1)
                if xint > lo:
                    hits = not hits
        if hits:
            inside = not inside
    return inside


def _polygon_closest(lo, la, s):
    """(inside?, best angle rad, best xyz) from point to a GeoJSON Polygon's
    ring segments; None when the polygon doesn't parse."""
    import numpy as np

    rings = _geo_coords(s, "Polygon")
    if not rings:
        return None
    if _point_in_rings(float(lo), float(la), rings):
        return True, 0.0, _lonlat_unit(float(lo), float(la))
    p = _lonlat_unit(float(lo), float(la))
    best, best_pt = np.inf, None
    for ring in rings:
        seg = np.asarray(ring, dtype="float64")
        if len(seg) < 2:
            continue
        a = _lonlat_unit(seg[:-1, 0], seg[:-1, 1])
        b = _lonlat_unit(seg[1:, 0], seg[1:, 1])
        d, pt = _closest_on_arcs(p, a, b)
        if d < best:
            best, best_pt = d, pt
    if best_pt is None:
        return None
    return False, best, best_pt


@fn("geo_distance_point_to_polygon")
def _geo_distance_point_to_polygon(tr, args):
    """geo_distance_point_to_polygon(lon, lat, polygon) [KQL]: 0 when the
    point is inside (holes respected), else min great-circle distance to
    the polygon's ring segments."""
    if "geo_dist_pt_poly" not in _PANDAS_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf
        import pandas as pd

        @pandas_udf("double")
        def udf(lons, lats, polys):
            def one(lo, la, s):
                if lo is None or la is None or s is None:
                    return None
                r = _polygon_closest(lo, la, s)
                if r is None:
                    return None
                inside, ang, _ = r
                return 0.0 if inside else float(ang * _GEO_R)

            return pd.Series([one(lo, la, s) for lo, la, s in zip(lons, lats, polys)])

        _PANDAS_UDF_CACHE["geo_dist_pt_poly"] = udf
    return _PANDAS_UDF_CACHE["geo_dist_pt_poly"](
        tr.to_col(args[0]).cast("double"),
        tr.to_col(args[1]).cast("double"),
        _geojson_col(tr, args[2]),
    )


@fn("geo_closest_point_on_polygon")
def _geo_closest_point_on_polygon(tr, args):
    """geo_closest_point_on_polygon(lon, lat, polygon) [KQL]: the input
    point itself when inside, else the nearest point on the ring segments
    (GeoJSON Point)."""
    if "geo_closest_pt_poly" not in _PANDAS_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf
        import pandas as pd

        @pandas_udf("string")
        def udf(lons, lats, polys):
            import json

            import numpy as np

            def one(lo, la, s):
                if lo is None or la is None or s is None:
                    return None
                r = _polygon_closest(lo, la, s)
                if r is None:
                    return None
                _, _, pt = r
                lon_out = float(np.degrees(np.arctan2(pt[1], pt[0])))
                lat_out = float(np.degrees(np.arcsin(np.clip(pt[2], -1, 1))))
                return json.dumps(
                    {"type": "Point", "coordinates": [lon_out, lat_out]}
                )

            return pd.Series([one(lo, la, s) for lo, la, s in zip(lons, lats, polys)])

        _PANDAS_UDF_CACHE["geo_closest_pt_poly"] = udf
    return _PANDAS_UDF_CACHE["geo_closest_pt_poly"](
        tr.to_col(args[0]).cast("double"),
        tr.to_col(args[1]).cast("double"),
        _geojson_col(tr, args[2]),
    )


@fn("set_equals")
def _set_equals(tr, args):
    a, b = tr.to_col(args[0]), tr.to_col(args[1])
    return (F.size(F.array_except(a, b)) == 0) & (
        F.size(F.array_except(b, a)) == 0
    )


@fn("isutf8")
def _isutf8(tr, args):
    # the engine's string carrier is decoded text already, so any non-null
    # value is valid UTF-8 (invalid bytes can't reach a Spark string)
    return tr.to_col(args[0]).isNotNull()


def kql_timespan_string(ts: Column) -> Column:
    """Kusto default timespan rendering: [-][d.]hh:mm:ss[.fffffff] — days
    only when nonzero, 7-digit tick fraction only when fractional."""
    from ..semantics import timespan_seconds_of

    signed = timespan_seconds_of(ts)
    total = F.abs(signed)
    d = F.floor(total / 86400).cast("bigint")
    h = F.lpad(F.floor(F.pmod(total, 86400.0) / 3600).cast("bigint").cast("string"), 2, "0")
    m = F.lpad(F.floor(F.pmod(total, 3600.0) / 60).cast("bigint").cast("string"), 2, "0")
    s = F.lpad(F.floor(F.pmod(total, 60.0)).cast("bigint").cast("string"), 2, "0")
    ticks = F.round((total - F.floor(total)) * 1e7).cast("bigint")
    frac = F.when(
        ticks > 0, F.concat(F.lit("."), F.lpad(ticks.cast("string"), 7, "0"))
    ).otherwise(F.lit(""))
    dayp = F.when(d > 0, F.concat(d.cast("string"), F.lit("."))).otherwise(F.lit(""))
    sign = F.when(signed < 0, F.lit("-")).otherwise(F.lit(""))
    return F.concat(sign, dayp, h, F.lit(":"), m, F.lit(":"), s, frac)


# ------------------------------------------------- geo densify / simplify
# geo_line_densify / geo_polygon_densify / geo_line_simplify /
# geo_polygon_simplify / geo_line_to_s2cells / geo_polygon_to_s2cells /
# ipv4_range_to_cidr_list [KQL geo + IP]. Written from the public KQL
# semantics: densify converts planar edges to geodesic chains (tolerance =
# max meters between the planar edge and its geodesic counterpart),
# simplify is Douglas-Peucker with a great-circle point-to-segment
# distance, and the *_to_s2cells functions emit a sound S2 covering (every
# point of the shape lies in some returned cell; the covering may
# overcover, which is safe for join pruning). Geometry tier: per-geometry
# Arrow-batched pandas UDFs like the line/polygon lookups.


def _geo_xyz(lon, lat):
    import math

    phi, lam = math.radians(lat), math.radians(lon)
    return (
        math.cos(phi) * math.cos(lam),
        math.cos(phi) * math.sin(lam),
        math.sin(phi),
    )


def _geo_hav_m(lon1, lat1, lon2, lat2):
    """Scalar convenience wrapper over the shared haversine helper."""
    return float(_hav(lon1, lat1, lon2, lat2))


def _geo_slerp(p1, p2, t):
    """Great-circle interpolation between two lon/lat points."""
    import math

    a, b = _geo_xyz(*p1), _geo_xyz(*p2)
    dot = max(-1.0, min(1.0, sum(x * y for x, y in zip(a, b))))
    omega = math.acos(dot)
    if omega < 1e-12:
        return list(p1)
    sa, sb = math.sin((1 - t) * omega) / math.sin(omega), math.sin(
        t * omega
    ) / math.sin(omega)
    x, y, z = (sa * a[i] + sb * b[i] for i in range(3))
    lat = math.degrees(math.asin(max(-1.0, min(1.0, z))))
    lon = math.degrees(math.atan2(y, x))
    return [lon, lat]


def _densify_edge(p1, p2, tol_m, out, depth=0):
    """Append intermediate points (excluding p1, including p2) such that the
    planar midpoint never deviates more than tol_m from the geodesic."""
    mid_geo = _geo_slerp(p1, p2, 0.5)
    mid_pla = [(p1[0] + p2[0]) / 2.0, (p1[1] + p2[1]) / 2.0]
    if depth >= 12 or _geo_hav_m(*mid_geo, *mid_pla) <= tol_m:
        out.append([float(p2[0]), float(p2[1])])
        return
    _densify_edge(p1, mid_geo, tol_m, out, depth + 1)
    _densify_edge(mid_geo, p2, tol_m, out, depth + 1)


def _densify_path(coords, tol_m):
    out = [[float(coords[0][0]), float(coords[0][1])]]
    for a, b in zip(coords[:-1], coords[1:]):
        _densify_edge(a, b, tol_m, out)
    return out


def _pt_seg_dist_m(p, a, b):
    """Great-circle distance from point p to geodesic segment a-b (lon/lat)."""
    import math

    pv, av, bv = _geo_xyz(*p), _geo_xyz(*a), _geo_xyz(*b)
    n = (
        av[1] * bv[2] - av[2] * bv[1],
        av[2] * bv[0] - av[0] * bv[2],
        av[0] * bv[1] - av[1] * bv[0],
    )
    nn = math.sqrt(sum(x * x for x in n))
    if nn < 1e-15:
        return _geo_hav_m(*p, *a)
    # closest point on the great circle
    d = sum(p_i * n_i for p_i, n_i in zip(pv, n)) / nn
    c = [p_i - d * n_i / nn for p_i, n_i in zip(pv, n)]
    cn = math.sqrt(sum(x * x for x in c)) or 1.0
    c = [x / cn for x in c]
    # inside the segment's lune? compare arc lengths
    def ang(u, v):
        return math.acos(max(-1.0, min(1.0, sum(x * y for x, y in zip(u, v)))))

    if ang(av, c) + ang(c, bv) <= ang(av, bv) + 1e-9:
        return abs(math.asin(max(-1.0, min(1.0, d)))) * _GEO_R
    return min(_geo_hav_m(*p, *a), _geo_hav_m(*p, *b))


def _dp_simplify(coords, tol_m):
    """Douglas-Peucker on lon/lat with great-circle distances."""
    if len(coords) <= 2:
        return list(coords)
    keep = [False] * len(coords)
    keep[0] = keep[-1] = True
    stack = [(0, len(coords) - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        dmax, imax = -1.0, None
        for k in range(i + 1, j):
            d = _pt_seg_dist_m(coords[k], coords[i], coords[j])
            if d > dmax:
                dmax, imax = d, k
        if dmax > tol_m:
            keep[imax] = True
            stack.append((i, imax))
            stack.append((imax, j))
    return [list(map(float, c)) for c, k in zip(coords, keep) if k]


def _geo_shape_udf(name, transform):
    """Register name(shape [, tolerance]) -> GeoJSON string; transform(s,
    tol) runs per geometry in an Arrow batch."""

    def entry(tr, args):
        tol = float(tr.const_value(args[1])) if len(args) > 1 else None
        key = f"{name}:{tol}"
        if key not in _PANDAS_UDF_CACHE:
            from pyspark.sql.functions import pandas_udf

            @pandas_udf("string")
            def udf(col):
                return col.map(
                    lambda s: None if s is None else transform(s, tol)
                )

            _PANDAS_UDF_CACHE[key] = udf
        return _PANDAS_UDF_CACHE[key](_geojson_col(tr, args[0]))

    REGISTRY[name] = entry


def _line_densify(s, tol):
    import json

    cs = _geo_coords(s, "LineString")
    if cs is None or len(cs) < 2:
        return None
    tol = 10000.0 if tol is None else max(0.1, float(tol))
    return json.dumps(
        {"type": "LineString", "coordinates": _densify_path(cs, tol)}
    )


def _polygon_densify(s, tol):
    import json

    cs = _geo_coords(s, "Polygon")
    if not cs:
        return None
    tol = 10000.0 if tol is None else max(0.1, float(tol))
    return json.dumps(
        {
            "type": "Polygon",
            "coordinates": [_densify_path(r, tol) for r in cs],
        }
    )


def _line_simplify(s, tol):
    import json

    cs = _geo_coords(s, "LineString")
    if cs is None or len(cs) < 2:
        return None
    tol = 10.0 if tol is None else max(0.0, float(tol))
    out = _dp_simplify(cs, tol)
    if len(out) < 2:
        return None
    return json.dumps({"type": "LineString", "coordinates": out})


def _polygon_simplify(s, tol):
    import json

    cs = _geo_coords(s, "Polygon")
    if not cs:
        return None
    tol = 10.0 if tol is None else max(0.0, float(tol))
    rings = []
    for r in cs:
        closed = list(r)
        if closed and (closed[0] != closed[-1]):
            closed.append(closed[0])
        out = _dp_simplify(closed, tol)
        # a valid ring needs 4 points (3 distinct + closure) [KQL: degenerate
        # simplification yields null]
        if len(out) < 4:
            return None
        rings.append(out)
    return json.dumps({"type": "Polygon", "coordinates": rings})


def _dp_simplify_locked(ring, tol_m, locked):
    """Douglas-Peucker over a CLOSED ring with a set of locked vertices
    that must survive: the ring is split into chains at locked points and
    each chain simplifies independently (DP always keeps endpoints), so
    locked vertices — shared boundaries — are preserved exactly."""
    def _floats(pts):
        # canonical float coordinates: _dp_simplify float-converts interior
        # work but short chains (<=2 points) pass original (possibly int)
        # vertices through — mixed [1, 0] / [1.0, 0.0] in one ring would
        # make the JSON carrier non-canonical for string-level matching
        return [[float(c) for c in p] for p in pts]

    body = ring[:-1] if ring and ring[0] == ring[-1] else list(ring)
    lock_ix = [i for i, p in enumerate(body) if tuple(p) in locked]
    if not lock_ix:
        closed = [*body, body[0]]
        return _floats(_dp_simplify(closed, tol_m))
    # rotate so the ring starts at a locked vertex, then chain-split
    start = lock_ix[0]
    rot = body[start:] + body[:start]
    lock_rot = sorted(
        i for i, p in enumerate(rot) if tuple(p) in locked
    )
    out = []
    bounds = [*lock_rot, len(rot)]
    for a, b in zip(bounds, bounds[1:]):
        chain = rot[a : b + 1] if b < len(rot) else [*rot[a:], rot[0]]
        simp = _dp_simplify(chain, tol_m)
        out.extend(simp[:-1])  # chain endpoints overlap
    out.append(out[0])
    return _floats(out)


def _simplify_polygons_union(s, tol):
    """geo_simplify_polygons_union(polygons [, tolerance]) [KQL geo]:
    simplify a SET of polygons while preserving their mutual boundaries.
    Input: dynamic array of Polygon/MultiPolygon GeoJSONs (or one
    MultiPolygon); output: MultiPolygon. Mutual-boundary preservation is
    by VERTEX LOCKING — any vertex appearing in more than one ring across
    the set survives simplification on every ring that carries it, so a
    shared edge made of the same vertex sequence stays identical on both
    sides (documented delta vs Kusto: no snapping of nearly-equal shared
    vertices; boundaries must agree exactly, the normal case for
    tiled/administrative polygon sets)."""
    import json
    from collections import Counter

    try:
        g = json.loads(s) if s.lstrip()[:1] in "[{" else _wkt_to_geojson_obj(s)
        if isinstance(g, dict) and g.get("type") == "MultiPolygon":
            polys = g["coordinates"]
        elif isinstance(g, dict) and g.get("type") == "Polygon":
            polys = [g["coordinates"]]
        elif isinstance(g, list):
            polys = []
            for item in g:
                if isinstance(item, str):
                    item = json.loads(item)
                if item.get("type") == "Polygon":
                    polys.append(item["coordinates"])
                elif item.get("type") == "MultiPolygon":
                    polys.extend(item["coordinates"])
                else:
                    return None
        else:
            return None
    except Exception:
        return None
    if not polys:
        return None
    tol_m = 10.0 if tol is None else max(0.0, float(tol))
    cnt: Counter = Counter()
    for p in polys:
        for ring in p:
            body = ring[:-1] if ring and ring[0] == ring[-1] else ring
            for v in body:
                cnt[tuple(v)] += 1
    locked = {v for v, c in cnt.items() if c > 1}
    out_polys = []
    for p in polys:
        rings = []
        for ring in p:
            simp = _dp_simplify_locked(ring, tol_m, locked)
            if len(simp) < 4:
                return None  # degenerate ring: same null rule as simplify
            rings.append(simp)
        out_polys.append(rings)
    return json.dumps({"type": "MultiPolygon", "coordinates": out_polys})


_geo_shape_udf("geo_line_densify", _line_densify)
_geo_shape_udf("geo_polygon_densify", _polygon_densify)
_geo_shape_udf("geo_line_simplify", _line_simplify)
_geo_shape_udf("geo_polygon_simplify", _polygon_simplify)
_geo_shape_udf("geo_simplify_polygons_union", _simplify_polygons_union)


def _s2_min_edge_m(level):
    """Conservative lower bound on an S2 cell edge at `level`. The public
    S2 kMinEdge metric is 0.948/2^level rad (confirmed empirically against
    this module's own cell decoder: measured factor 0.95 across levels
    4-12); 0.84 keeps a ~12% safety margin."""
    return 0.84 * _GEO_R / (1 << level)


def _s2_cover_points(samples, level, cap=65536):
    """Cells of every sample point plus their 8 neighbors — sound covering
    of any shape whose points all lie within half a min-edge of a sample."""
    cells = set()
    for lon, lat in samples:
        tok = _s2_encode(lon, lat, level)
        if tok not in cells:
            cells.add(tok)
            for nb in _s2_neighbors(tok) or []:
                cells.add(nb)
        if len(cells) > cap:
            return None
    return sorted(cells)


def _line_to_s2cells(s, level):
    cs = _geo_coords(s, "LineString")
    if cs is None or len(cs) < 2:
        return None
    step = _s2_min_edge_m(level) / 2.0
    samples = []
    for a, b in zip(cs[:-1], cs[1:]):
        d = _geo_hav_m(a[0], a[1], b[0], b[1])
        n = max(1, int(d / step) + 1)
        for k in range(n):
            samples.append(_geo_slerp(a, b, k / n))
    samples.append([float(cs[-1][0]), float(cs[-1][1])])
    return _s2_cover_points(samples, level)


def _polygon_to_s2cells(s, level):
    import math

    cs = _geo_coords(s, "Polygon")
    if not cs:
        return None
    outer = cs[0]
    lons = [p[0] for p in outer]
    lats = [p[1] for p in outer]
    lo_lon, hi_lon = min(lons), max(lons)
    lo_lat, hi_lat = min(lats), max(lats)
    step_m = _s2_min_edge_m(level) / 2.0
    dlat = math.degrees(step_m / _GEO_R)
    n_lat = int((hi_lat - lo_lat) / dlat) + 2
    # longitude spacing in METERS is dlon * R * cos(lat): PER ROW, divide
    # by the max cosine within the row's latitude slab so spacing stays
    # <= step_m everywhere (round-5 review fix: a single min-cosine step
    # widened equator-side spacing and broke covering soundness), without
    # oversampling high-latitude rows of tall polygons
    total = 0
    samples = []
    for i in range(n_lat):
        lat = min(lo_lat + i * dlat, hi_lat)
        slab_lo = max(lo_lat, lat - dlat)
        slab_hi = min(hi_lat, lat + dlat)
        if slab_lo <= 0.0 <= slab_hi:
            row_cos = 1.0
        else:
            row_cos = max(
                math.cos(math.radians(slab_lo)), math.cos(math.radians(slab_hi))
            )
        dlon = math.degrees(step_m / (_GEO_R * max(0.01, row_cos)))
        n_lon = int((hi_lon - lo_lon) / dlon) + 2
        total += n_lon
        if total > 4_000_000:
            return None  # covering would exceed the cell cap anyway
        for j in range(n_lon):
            samples.append([min(lo_lon + j * dlon, hi_lon), lat])
    return _s2_cover_points(samples, level)


def _geo_cells_udf(name, transform):
    def entry(tr, args):
        level = int(tr.const_value(args[1])) if len(args) > 1 else 11
        if not 0 <= level <= 30:
            raise KqlSemanticError(f"{name}: level must be in [0, 30]")
        key = f"{name}:{level}"
        if key not in _PANDAS_UDF_CACHE:
            from pyspark.sql.functions import pandas_udf

            @pandas_udf("array<string>")
            def udf(col):
                return col.map(
                    lambda s: None if s is None else transform(s, level)
                )

            _PANDAS_UDF_CACHE[key] = udf
        return _PANDAS_UDF_CACHE[key](_geojson_col(tr, args[0]))

    REGISTRY[name] = entry


_geo_cells_udf("geo_line_to_s2cells", _line_to_s2cells)
_geo_cells_udf("geo_polygon_to_s2cells", _polygon_to_s2cells)


# ---------------------------------------------------- ipv4_range_to_cidr_list


def _cidr_list(start, end):
    def ip2int(s):
        try:
            parts = [int(x) for x in s.strip().split("/")[0].split(".")]
            if len(parts) != 4 or any(not 0 <= p <= 255 for p in parts):
                return None
            return (parts[0] << 24) | (parts[1] << 16) | (parts[2] << 8) | parts[3]
        except (ValueError, AttributeError):
            return None

    a, b = ip2int(start), ip2int(end)
    if a is None or b is None or a > b:
        return None
    out = []
    while a <= b:
        size = (a & -a) or (1 << 32)
        while size > b - a + 1:
            size >>= 1
        out.append(
            f"{(a >> 24) & 255}.{(a >> 16) & 255}.{(a >> 8) & 255}.{a & 255}"
            f"/{32 - (size.bit_length() - 1)}"
        )
        a += size
    return out


@fn("ipv4_range_to_cidr_list")
def _ipv4_range_to_cidr_list(tr, args):
    """Minimal CIDR block list exactly covering [StartIp, EndIp] [KQL]."""
    key = "ipv4_range_to_cidr_list"
    if key not in _PANDAS_UDF_CACHE:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<string>")
        def udf(a, b):
            return pd.Series(
                [
                    None if x is None or y is None else _cidr_list(x, y)
                    for x, y in zip(a, b)
                ]
            )

        _PANDAS_UDF_CACHE[key] = udf
    return _PANDAS_UDF_CACHE[key](
        tr.to_col(args[0]).cast("string"), tr.to_col(args[1]).cast("string")
    )


# --------------------------------------------------------------- H3 family
# geo_point_to_h3cell / geo_h3cell_* [KQL geo]. Served by the public `h3`
# package when installed, else by the from-scratch native core in
# extensions/h3_native.py (Uber's published algorithm re-expressed in
# Python; validated at import against public test vectors — h3-py README
# cells/boundary, the uber/h3 cellToLatLng doc centers, the documented
# k-ring set, and the Kusto geo_point_to_h3cell doc example — plus an
# exhaustive descendant roundtrip; it refuses to load on any mismatch,
# in which case this gate raises the typed error below).


def _h3_mod():
    try:
        import h3

        return h3
    except ImportError:
        pass
    try:
        from ..extensions import h3_native

        h3_native._geometry()  # translate-time build + selftest (cached)
        return h3_native
    except ImportError as e:
        from ..errors import KqlUnsupportedError

        raise KqlUnsupportedError(
            "H3 functions: neither the public 'h3' package nor the native "
            f"H3 core is usable ({e}). geohash and S2 cell functions cover "
            "the same bucketing use cases."
        ) from None


def _h3_udf(name, ret_type, make_fn, *cols):
    h3 = _h3_mod()  # translate-time probe -> typed error, not executor crash
    key = f"h3:{name}"
    if key not in _PANDAS_UDF_CACHE:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        one = make_fn(h3)

        @pandas_udf(ret_type)
        def udf(*series):
            return pd.Series(
                [
                    None if any(v is None for v in vals) else one(*vals)
                    for vals in zip(*series)
                ]
            )

        _PANDAS_UDF_CACHE[key] = udf
    return _PANDAS_UDF_CACHE[key](*cols)


@fn("geo_point_to_h3cell")
def _geo_point_to_h3cell(tr, args):
    res = int(tr.const_value(args[2])) if len(args) > 2 else 9
    if not 0 <= res <= 15:
        raise KqlSemanticError("geo_point_to_h3cell: resolution must be in [0, 15]")
    h3 = _h3_mod()
    if hasattr(h3, "cells_from_latlng"):
        # native core: point->cell is the FACT-side operation of a geo
        # pipeline, so it gets the numpy whole-batch path (~30x the
        # per-row loop; exact-equality-tested against it)
        key = f"pt2cellvec:{res}"
        if key not in _PANDAS_UDF_CACHE:
            import numpy as np
            import pandas as pd
            from pyspark.sql.functions import pandas_udf

            @pandas_udf("string")
            def udf(lon, lat):
                from ..extensions.h3_native import cells_from_latlng

                cells = cells_from_latlng(
                    lat.to_numpy(dtype="float64", na_value=np.nan),
                    lon.to_numpy(dtype="float64", na_value=np.nan),
                    res,
                )
                return pd.Series(
                    [None if c == 0 else format(int(c), "x") for c in cells]
                )

            _PANDAS_UDF_CACHE[key] = udf
        return _PANDAS_UDF_CACHE[key](
            tr.to_col(args[0]).cast("double"), tr.to_col(args[1]).cast("double")
        )
    return _h3_udf(
        f"pt2cell:{res}",
        "string",
        lambda h3: lambda lon, lat: h3.latlng_to_cell(lat, lon, res),
        tr.to_col(args[0]).cast("double"),
        tr.to_col(args[1]).cast("double"),
    )


@fn("geo_h3cell_to_central_point")
def _geo_h3cell_to_central_point(tr, args):
    def make(h3):
        import json

        def one(tok):
            try:
                lat, lon = h3.cell_to_latlng(tok)
            except Exception:
                return None
            return json.dumps({"type": "Point", "coordinates": [lon, lat]})

        return one

    return _h3_udf("cell2pt", "string", make, tr.to_col(args[0]).cast("string"))


@fn("geo_h3cell_to_polygon")
def _geo_h3cell_to_polygon(tr, args):
    def make(h3):
        import json

        def one(tok):
            try:
                ring = [[lon, lat] for lat, lon in h3.cell_to_boundary(tok)]
            except Exception:
                return None
            ring.append(ring[0])
            return json.dumps({"type": "Polygon", "coordinates": [ring]})

        return one

    return _h3_udf("cell2poly", "string", make, tr.to_col(args[0]).cast("string"))


@fn("geo_h3cell_neighbors")
def _geo_h3cell_neighbors(tr, args):
    def make(h3):
        def one(tok):
            try:
                return sorted(set(h3.grid_disk(tok, 1)) - {tok})
            except Exception:
                return None

        return one

    return _h3_udf("cellnbrs", "array<string>", make, tr.to_col(args[0]).cast("string"))


@fn("geo_h3cell_rings")
def _geo_h3cell_rings(tr, args):
    n = int(tr.const_value(args[1]))
    if not 0 <= n <= 142:
        raise KqlSemanticError("geo_h3cell_rings: N must be in [0, 142]")

    def make(h3):
        def one(tok):
            try:
                return [sorted(h3.grid_ring(tok, k)) for k in range(n + 1)]
            except Exception:
                return None

        return one

    return _h3_udf(f"cellrings:{n}", "array<array<string>>", make,
                   tr.to_col(args[0]).cast("string"))


@fn("geo_h3cell_parent")
def _geo_h3cell_parent(tr, args):
    res = int(tr.const_value(args[1])) if len(args) > 1 else None

    def make(h3):
        def one(tok):
            try:
                r = h3.get_resolution(tok) - 1 if res is None else res
                if r < 0:
                    return None
                return h3.cell_to_parent(tok, r)
            except Exception:
                return None

        return one

    return _h3_udf(f"cellparent:{res}", "string", make,
                   tr.to_col(args[0]).cast("string"))


@fn("geo_h3cell_children")
def _geo_h3cell_children(tr, args):
    res = int(tr.const_value(args[1])) if len(args) > 1 else None

    def make(h3):
        def one(tok):
            try:
                r = h3.get_resolution(tok) + 1 if res is None else res
                return sorted(h3.cell_to_children(tok, r))
            except Exception:
                return None

        return one

    return _h3_udf(f"cellchildren:{res}", "array<string>", make,
                   tr.to_col(args[0]).cast("string"))


@fn("geo_h3cell_level")
def _geo_h3cell_level(tr, args):
    def make(h3):
        def one(tok):
            try:
                return h3.get_resolution(tok)
            except Exception:
                return None

        return one

    return _h3_udf("celllevel", "int", make, tr.to_col(args[0]).cast("string"))


@fn("geo_polygon_to_h3cells")
def _geo_polygon_to_h3cells(tr, args):
    """geo_polygon_to_h3cells(polygon [, resolution]) [KQL geo]: sound H3
    covering of a GeoJSON/WKT Polygon or MultiPolygon. Boundary cells
    come from edge densification at half-cell spacing plus a 1-ring pad
    (same soundness recipe as geo_polygon_to_s2cells); the interior is a
    BFS flood fill from each ring's inside seeds bounded by that wall.
    A covering that would exceed the cell budget returns null (the geo
    family's convention for unrepresentable results) rather than
    truncating silently."""
    import math as _m

    res = int(tr.const_value(args[1])) if len(args) > 1 else 6
    if not 0 <= res <= 15:
        raise KqlSemanticError(
            "geo_polygon_to_h3cells: resolution must be in [0, 15]"
        )
    cap = 40_000

    def make(h3):
        # approximate cell center spacing (radians) at this res
        spacing = 2.0 * _m.atan(0.38196601125010500003) / (7.0 ** (res / 2.0))

        def one(s):
            mp = _geo_multipoly(s)
            if not mp:
                return None
            wall: set[str] = set()
            inside_pts = []
            for poly in mp:
                for ring in poly:
                    for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
                        d = _m.radians(
                            _m.hypot(x2 - x1, (y2 - y1))
                        )
                        n = max(1, int(d / (spacing / 2.0)) + 1)
                        for i in range(n + 1):
                            t = i / n
                            c = h3.latlng_to_cell(
                                y1 + t * (y2 - y1), x1 + t * (x2 - x1), res
                            )
                            if c not in wall:
                                wall.add(c)
                                wall.update(h3.grid_disk(c, 1))
                        if len(wall) > cap:
                            return None  # covering over budget: null
                rings = poly
                # BFS interior fill from cells just inside the exterior,
                # stopping at the boundary wall
                seeds = []
                for c in list(wall):
                    la, lo = h3.cell_to_latlng(c)
                    if _geo_point_in_rings(lo, la, rings):
                        seeds.append(c)
                seen = set(wall)
                frontier = [c for c in seeds]
                filled = set(seeds)
                while frontier:
                    nxt = []
                    for c in frontier:
                        for nb in h3.grid_disk(c, 1):
                            if nb in seen:
                                continue
                            seen.add(nb)
                            la, lo = h3.cell_to_latlng(nb)
                            if _geo_point_in_rings(lo, la, rings):
                                filled.add(nb)
                                nxt.append(nb)
                            if len(seen) > 3 * cap:
                                return None  # covering over budget
                    frontier = nxt
                wall.update(filled)
            return sorted(wall)

        return one

    return _h3_udf(
        f"poly2cells:{res}", "array<string>", make,
        _geojson_col(tr, args[0]),
    )


# -------------------------------------------------- geo intersection tests
# geo_intersects_2lines / geo_intersects_line_with_polygon /
# geo_intersects_2polygons / geo_intersection_2lines / geo_point_buffer
# [KQL geo]. Arcs are geodesics: two great-circle arcs intersect where the
# cross product of their plane normals (or its antipode) lies on both
# arcs; same-plane overlaps fall back to endpoint-on-arc checks.
# Containment uses the planar ray cast (_point_in_rings), matching the
# other polygon functions here.


def _on_arc(p, a, b):
    import math

    def ang(u, v):
        return math.acos(max(-1.0, min(1.0, sum(x * y for x, y in zip(u, v)))))

    return ang(a, p) + ang(p, b) <= ang(a, b) + 1e-9


def _arc_intersections(p1, p2, p3, p4):
    """lon/lat segment pair -> list of intersection lon/lat points."""
    import math

    a1, a2 = _geo_xyz(*p1), _geo_xyz(*p2)
    b1, b2 = _geo_xyz(*p3), _geo_xyz(*p4)

    def cross(u, v):
        return (
            u[1] * v[2] - u[2] * v[1],
            u[2] * v[0] - u[0] * v[2],
            u[0] * v[1] - u[1] * v[0],
        )

    n1, n2 = cross(a1, a2), cross(b1, b2)
    L = cross(n1, n2)
    norm = math.sqrt(sum(x * x for x in L))
    out = []
    if norm < 1e-12:
        # coplanar arcs: overlap reduces to endpoints lying on the other arc
        for pt, xyz in ((p1, a1), (p2, a2)):
            if _on_arc(xyz, b1, b2):
                out.append([float(pt[0]), float(pt[1])])
        for pt, xyz in ((p3, b1), (p4, b2)):
            if _on_arc(xyz, a1, a2):
                out.append([float(pt[0]), float(pt[1])])
    else:
        for sgn in (1.0, -1.0):
            c = tuple(sgn * x / norm for x in L)
            if _on_arc(c, a1, a2) and _on_arc(c, b1, b2):
                lat = math.degrees(math.asin(max(-1.0, min(1.0, c[2]))))
                lon = math.degrees(math.atan2(c[1], c[0]))
                out.append([lon, lat])
    dedup = []
    for p in out:
        if not any(abs(p[0] - q[0]) < 1e-9 and abs(p[1] - q[1]) < 1e-9 for q in dedup):
            dedup.append(p)
    return dedup


def _paths_intersect(path1, path2):
    for a, b in zip(path1[:-1], path1[1:]):
        for c, d in zip(path2[:-1], path2[1:]):
            if _arc_intersections(a, b, c, d):
                return True
    return False


def _geo_pair_udf(name, ret_type, one):
    """Register name(shape1, shape2) over two GeoJSON columns."""

    def entry(tr, args):
        if name not in _PANDAS_UDF_CACHE:
            import pandas as pd
            from pyspark.sql.functions import pandas_udf

            @pandas_udf(ret_type)
            def udf(c1, c2):
                return pd.Series(
                    [
                        None if a is None or b is None else one(a, b)
                        for a, b in zip(c1, c2)
                    ]
                )

            _PANDAS_UDF_CACHE[name] = udf
        return _PANDAS_UDF_CACHE[name](
            _geojson_col(tr, args[0]), _geojson_col(tr, args[1])
        )

    REGISTRY[name] = entry


def _intersects_2lines(s1, s2):
    c1, c2 = _geo_coords(s1, "LineString"), _geo_coords(s2, "LineString")
    if c1 is None or c2 is None or len(c1) < 2 or len(c2) < 2:
        return None
    return _paths_intersect(c1, c2)


def _intersects_line_polygon(s1, s2):
    line, poly = _geo_coords(s1, "LineString"), _geo_coords(s2, "Polygon")
    if line is None or not poly or len(line) < 2:
        return None
    if any(_point_in_rings(p[0], p[1], poly) for p in line):
        return True
    return any(_paths_intersect(line, ring) for ring in poly)


def _intersects_2polygons(s1, s2):
    p1, p2 = _geo_coords(s1, "Polygon"), _geo_coords(s2, "Polygon")
    if not p1 or not p2:
        return None
    if any(_point_in_rings(p[0], p[1], p2) for p in p1[0]):
        return True
    if any(_point_in_rings(p[0], p[1], p1) for p in p2[0]):
        return True
    return any(_paths_intersect(r1, r2) for r1 in p1 for r2 in p2)


def _intersection_2lines(s1, s2):
    import json

    c1, c2 = _geo_coords(s1, "LineString"), _geo_coords(s2, "LineString")
    if c1 is None or c2 is None or len(c1) < 2 or len(c2) < 2:
        return None
    pts = []
    for a, b in zip(c1[:-1], c1[1:]):
        for c, d in zip(c2[:-1], c2[1:]):
            for p in _arc_intersections(a, b, c, d):
                if not any(
                    abs(p[0] - q[0]) < 1e-9 and abs(p[1] - q[1]) < 1e-9
                    for q in pts
                ):
                    pts.append(p)
    if not pts:
        return json.dumps({"type": "GeometryCollection", "geometries": []})
    if len(pts) == 1:
        return json.dumps({"type": "Point", "coordinates": pts[0]})
    return json.dumps({"type": "MultiPoint", "coordinates": pts})


_geo_pair_udf("geo_intersects_2lines", "boolean", _intersects_2lines)
_geo_pair_udf("geo_intersects_line_with_polygon", "boolean", _intersects_line_polygon)
_geo_pair_udf("geo_intersects_2polygons", "boolean", _intersects_2polygons)
_geo_pair_udf("geo_intersection_2lines", "string", _intersection_2lines)


# geo_intersection_line_with_polygon / geo_intersection_2polygons [KQL geo].
# Same geodesic-arc model as the predicates above. Line clipping splits each
# segment at its ring crossings and keeps the pieces whose midpoints fall
# inside (hole-aware); polygon-polygon intersection is a Greiner-Hormann
# traversal over EXTERIOR rings (holes dropped — documented simplification;
# vertex-transversal/degenerate-overlap configurations return null).


def _ang3(u, v):
    import math

    return math.acos(max(-1.0, min(1.0, sum(x * y for x, y in zip(u, v)))))


def _xyz_lonlat(v):
    import math

    n = math.sqrt(sum(x * x for x in v))
    return [
        math.degrees(math.atan2(v[1], v[0])),
        math.degrees(math.asin(max(-1.0, min(1.0, v[2] / n)))),
    ]


def _arc_mid(p, q):
    a, b = _geo_xyz(*p), _geo_xyz(*q)
    s = (a[0] + b[0], a[1] + b[1], a[2] + b[2])
    if sum(x * x for x in s) < 1e-18:  # antipodal: midpoint undefined
        return None
    return _xyz_lonlat(s)


def _geo_point_in_rings(lon, lat, rings):
    """GEODESIC point-in-rings parity test: counts crossings of a meridian
    ray (nudged off exact edge alignment) against the rings' great-circle
    arcs, using the same _arc_intersections primitive the clipping code
    uses for edge crossings. The planar _point_in_rings disagrees with the
    arc model inside the sliver between a latitude-line edge and its
    geodesic — mixing the two derails Greiner-Hormann traversal, so all
    boolean-op classification goes through this test."""
    rl = lon + 9.5e-7  # avoid rays through vertices / meridian edges
    p = (rl, lat)
    ray_end = (rl, 89.99) if lat < 89.0 else (rl, -89.99)
    cnt = 0
    for ring in rings:
        for a, b in zip(ring[:-1], ring[1:]):
            cnt += len(_arc_intersections(p, ray_end, a, b))
    return cnt % 2 == 1


def _intersection_line_polygon(s1, s2):
    import json

    line, rings = _geo_coords(s1, "LineString"), _geo_coords(s2, "Polygon")
    if line is None or not rings or len(line) < 2:
        return None
    paths, cur = [], None
    for a, b in zip(line[:-1], line[1:]):
        ax = _geo_xyz(*a)
        pts = [(0.0, [float(a[0]), float(a[1])]),
               (_ang3(ax, _geo_xyz(*b)), [float(b[0]), float(b[1])])]
        for ring in rings:
            for c, d in zip(ring[:-1], ring[1:]):
                for p in _arc_intersections(a, b, c, d):
                    pts.append((_ang3(ax, _geo_xyz(*p)), p))
        pts.sort(key=lambda x: x[0])
        merged = [pts[0]]
        for t, p in pts[1:]:
            if t - merged[-1][0] > 1e-12:
                merged.append((t, p))
        for (_, p1), (_, p2) in zip(merged[:-1], merged[1:]):
            m = _arc_mid(p1, p2)
            keep = m is not None and _geo_point_in_rings(m[0], m[1], rings)
            if keep:
                if cur is not None:
                    cur.append(p2)
                else:
                    cur = [p1, p2]
            elif cur is not None:
                paths.append(cur)
                cur = None
    if cur is not None:
        paths.append(cur)
    if not paths:
        return json.dumps({"type": "GeometryCollection", "geometries": []})
    if len(paths) == 1:
        return json.dumps({"type": "LineString", "coordinates": paths[0]})
    return json.dumps({"type": "MultiLineString", "coordinates": paths})


def _geo_multipoly(s):
    """Parse a Polygon or MultiPolygon carrier (incl. WKT) -> list of
    polygons, each a list of CLOSED rings (exterior first, holes after);
    None if neither or malformed."""
    cs = _geo_coords(s, "Polygon")
    polys = [cs] if cs is not None else _geo_coords(s, "MultiPolygon")
    if not polys:
        return None
    out = []
    for poly in polys:
        rings = []
        for ring in poly or []:
            r = [[float(q[0]), float(q[1])] for q in ring]
            if r and r[0] != r[-1]:
                r.append(list(r[0]))
            if len(r) < 4:
                return None
            rings.append(r)
        if not rings:
            return None
        out.append(rings)
    return out or None


def _mp_bool(mp_a, mp_b, keep_inside):
    """Boolean of two multipolygons-with-holes over geodesic arcs, by
    FRAGMENT CLASSIFICATION (round 8; replaces the exterior-ring-only
    Greiner-Hormann): split every ring of each side at its crossings with
    the other side, keep each fragment whose midpoint is inside
    (intersection) / outside (union) the other polygon, stitch the kept
    fragments into closed rings (every stitch point has exactly two kept
    incident fragments, else the configuration is degenerate), then
    assign shell/hole roles by containment parity. Holes on either side
    and hole-CREATING unions come out correctly; vertex-transversal
    crossings and overlapping boundary segments return None (honest null,
    same contract as before) rather than a wrong shape.

    Returns a list of polygons ([] = empty result), or None."""
    rings_a = [r for poly in mp_a for r in poly]
    rings_b = [r for poly in mp_b for r in poly]

    # --- crossing table, computed ONCE so both sides share bit-identical
    # cut points (stitching then matches endpoints exactly)
    eps = 1e-9
    cuts_a: dict = {}
    cuts_b: dict = {}
    for ia, ra in enumerate(rings_a):
        for i in range(len(ra) - 1):
            p1, p2 = ra[i], ra[i + 1]
            x1 = _geo_xyz(*p1)
            seg_a = _ang3(x1, _geo_xyz(*p2))
            for ib, rb in enumerate(rings_b):
                for j in range(len(rb) - 1):
                    q1, q2 = rb[j], rb[j + 1]
                    for pt in _arc_intersections(p1, p2, q1, q2):
                        px = _geo_xyz(*pt)
                        ti = _ang3(x1, px)
                        y1 = _geo_xyz(*q1)
                        tj = _ang3(y1, px)
                        seg_b = _ang3(y1, _geo_xyz(*q2))
                        if (
                            ti < eps
                            or seg_a - ti < eps
                            or tj < eps
                            or seg_b - tj < eps
                        ):
                            return None  # vertex-transversal / overlap
                        p = (float(pt[0]), float(pt[1]))
                        cuts_a.setdefault((ia, i), []).append((ti, p))
                        cuts_b.setdefault((ib, j), []).append((tj, p))

    def fragments(rings, cuts):
        frags = []
        for ir, ring in enumerate(rings):
            for i in range(len(ring) - 1):
                p1 = (float(ring[i][0]), float(ring[i][1]))
                p2 = (float(ring[i + 1][0]), float(ring[i + 1][1]))
                pts = [p1] + [p for _, p in sorted(cuts.get((ir, i), []))] + [p2]
                for a, b in zip(pts[:-1], pts[1:]):
                    if a != b:
                        frags.append((a, b))
        return frags

    def classify(frags, other_rings):
        kept = []
        for a, b in frags:
            m = _arc_mid(a, b)
            if m is None:
                return None  # antipodal fragment: undefined midpoint
            if _geo_point_in_rings(m[0], m[1], other_rings) == keep_inside:
                kept.append((a, b))
        return kept

    kept_a = classify(fragments(rings_a, cuts_a), rings_b)
    kept_b = classify(fragments(rings_b, cuts_b), rings_a)
    if kept_a is None or kept_b is None:
        return None
    segs = kept_a + kept_b
    if not segs:
        return []

    # --- stitch: undirected walk; every endpoint must have degree 2
    def pkey(p):
        return (round(p[0], 9), round(p[1], 9))

    incident: dict = {}
    for idx, (a, b) in enumerate(segs):
        incident.setdefault(pkey(a), []).append(idx)
        incident.setdefault(pkey(b), []).append(idx)
    for ids in incident.values():
        if len(ids) != 2:
            return None  # non-manifold junction (boundary overlap etc.)
    used = [False] * len(segs)
    out_rings = []
    for start in range(len(segs)):
        if used[start]:
            continue
        a0, b0 = segs[start]
        ring = [list(a0), list(b0)]
        used[start] = True
        cur, prev = pkey(b0), start
        home = pkey(a0)
        guard = 0
        while cur != home:
            guard += 1
            if guard > len(segs) + 1:
                return None
            ids = incident[cur]
            nxt = ids[1] if ids[0] == prev else ids[0]
            if used[nxt]:
                return None
            na, nb = segs[nxt]
            nxt_pt = nb if pkey(na) == cur else na
            ring.append(list(nxt_pt))
            used[nxt] = True
            cur, prev = pkey(nxt_pt), nxt
        ring[-1] = list(ring[0])  # close exactly
        if len(ring) >= 4:
            out_rings.append(ring)
    if not out_rings:
        return []

    # --- shell/hole assignment by containment parity
    reps = []
    for r in out_rings:
        m = _arc_mid(r[0], r[1])
        if m is None:
            return None
        reps.append(m)
    depths = []
    for i in range(len(out_rings)):
        d = sum(
            1
            for j, o in enumerate(out_rings)
            if j != i and _geo_point_in_rings(reps[i][0], reps[i][1], [o])
        )
        depths.append(d)

    def orient(ring, ccw):
        # GeoJSON winding: exteriors counterclockwise, holes clockwise
        if (_ring_area_sterad(ring) > 0) != ccw:
            return ring[::-1]
        return ring

    shells = [i for i, d in enumerate(depths) if d % 2 == 0]
    polys = {i: [orient(out_rings[i], True)] for i in shells}
    for i, d in enumerate(depths):
        if d % 2 == 0:
            continue
        parent = None
        for j in shells:
            if depths[j] == d - 1 and _geo_point_in_rings(
                reps[i][0], reps[i][1], [out_rings[j]]
            ):
                parent = j
                break
        if parent is None:
            return None
        polys[parent].append(orient(out_rings[i], False))
    return [polys[i] for i in shells]


def _mp_json(mp):
    import json

    if mp is None:
        return None
    if not mp:
        return json.dumps({"type": "GeometryCollection", "geometries": []})
    if len(mp) == 1:
        return json.dumps({"type": "Polygon", "coordinates": mp[0]})
    return json.dumps({"type": "MultiPolygon", "coordinates": mp})


def _intersection_2polygons(s1, s2):
    a, b = _geo_multipoly(s1), _geo_multipoly(s2)
    if not a or not b:
        return None
    return _mp_json(_mp_bool(a, b, keep_inside=True))


_geo_pair_udf("geo_intersection_line_with_polygon", "string", _intersection_line_polygon)
_geo_pair_udf("geo_intersection_2polygons", "string", _intersection_2polygons)


@fn("geo_union_polygons_calculate")
def _geo_union_polygons(tr, args):
    """geo_union_polygons_calculate(polygon1, polygon2, ...) [KQL geo]:
    union of >= 2 GeoJSON (or WKT) Polygons/MultiPolygons over geodesic
    arcs, folded pairwise through the hole-aware fragment boolean
    (_mp_bool) — hole-creating unions, holes on the inputs, and nested
    islands all come out correctly; vertex-transversal or
    boundary-overlap configurations return null."""
    if len(args) < 2:
        raise KqlSemanticError(
            "geo_union_polygons_calculate takes at least two polygons"
        )
    n = len(args)
    key = f"geo_union_polygons:{n}"
    if key not in _PANDAS_UDF_CACHE:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def udf(*cols):
            out = []
            for vals in zip(*cols):
                acc = _geo_multipoly(vals[0])
                for s in vals[1:]:
                    if acc is None:
                        break
                    nxt = _geo_multipoly(s)
                    acc = None if nxt is None else _mp_bool(acc, nxt, False)
                out.append(_mp_json(acc))
            return pd.Series(out)

        _PANDAS_UDF_CACHE[key] = udf
    return _PANDAS_UDF_CACHE[key](*[_geojson_col(tr, a) for a in args])


@fn("geo_point_buffer")
def _geo_point_buffer(tr, args):
    """geo_point_buffer(lng, lat, radius_m [, tolerance_m]) [KQL]: polygon
    approximating the radius-circle; vertex count chosen so the sagitta
    (max chord deviation) stays under tolerance (default radius/1000,
    clamped to [8, 1024] vertices)."""
    import math

    radius = float(tr.const_value(args[2]))
    if not 0 < radius < math.pi * _GEO_R:
        raise KqlSemanticError("geo_point_buffer: radius out of range")
    tol = float(tr.const_value(args[3])) if len(args) > 3 else radius / 1000.0
    if not tol > 0:
        raise KqlSemanticError("geo_point_buffer: tolerance must be positive")
    frac = max(-1.0, min(1.0 - 1e-9, 1.0 - tol / radius))
    n = max(8, min(1024, int(math.ceil(math.pi / math.acos(frac)))))
    key = f"ptbuf:{radius}:{n}"
    if key not in _PANDAS_UDF_CACHE:
        import json

        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        d = radius / _GEO_R  # angular radius

        @pandas_udf("string")
        def udf(lons, lats):
            def one(lon, lat):
                phi, lam = math.radians(lat), math.radians(lon)
                ring = []
                for k in range(n):
                    theta = 2.0 * math.pi * k / n
                    phi2 = math.asin(
                        math.sin(phi) * math.cos(d)
                        + math.cos(phi) * math.sin(d) * math.cos(theta)
                    )
                    lam2 = lam + math.atan2(
                        math.sin(theta) * math.sin(d) * math.cos(phi),
                        math.cos(d) - math.sin(phi) * math.sin(phi2),
                    )
                    ring.append(
                        [
                            math.degrees(
                                (lam2 + math.pi) % (2 * math.pi) - math.pi
                            ),
                            math.degrees(phi2),
                        ]
                    )
                ring.append(ring[0])
                return json.dumps({"type": "Polygon", "coordinates": [ring]})

            return pd.Series(
                [
                    None if lo is None or la is None else one(lo, la)
                    for lo, la in zip(lons, lats)
                ]
            )

        _PANDAS_UDF_CACHE[key] = udf
    return _PANDAS_UDF_CACHE[key](
        tr.to_col(args[0]).cast("double"), tr.to_col(args[1]).cast("double")
    )


# ---------------------------------------------------------- has_ipv6 family

_IPV6_TOKEN_RE = _re.compile(
    r"(?<![0-9A-Fa-f:.])"
    r"([0-9A-Fa-f]{0,4}(?::[0-9A-Fa-f]{0,4}){2,7}(?:\.\d{1,3}\.\d{1,3}\.\d{1,3})?)"
    r"(?![0-9A-Fa-f:.])"
)


def _ipv6_canon(s):
    import ipaddress

    try:
        return ipaddress.IPv6Address(s).compressed
    except (ValueError, TypeError):
        return None


def _ipv6_candidates(text):
    return [
        c
        for c in (
            _ipv6_canon(m.group(1)) for m in _IPV6_TOKEN_RE.finditer(text)
        )
        if c is not None
    ]


def _has_ipv6_entry(name, wanted_fn):
    """wanted_fn(candidates:list[str]) -> bool over canonical candidates."""
    key = name
    if key not in _PANDAS_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("boolean")
        def udf(col):
            return col.map(
                lambda s: False if s is None else wanted_fn(_ipv6_candidates(s))
            )

        _PANDAS_UDF_CACHE[key] = udf
    return _PANDAS_UDF_CACHE[key]


@fn("has_ipv6")
def _has_ipv6(tr, args):
    """True when the text contains the IPv6 address as a whole term; both
    sides compare in canonical (compressed) form, so '2001:0db8::0001'
    matches a '2001:db8::1' in the text [KQL]."""
    want = _ipv6_canon(tr.const_string(args[1]))
    if want is None:
        return F.lit(False)
    return _has_ipv6_entry(f"has_ipv6:{want}", lambda cands: want in cands)(
        tr.to_col(args[0]).cast("string")
    )


@fn("has_any_ipv6")
def _has_any_ipv6(tr, args):
    wants = frozenset(
        c
        for c in (_ipv6_canon(v) for v in _const_string_list(tr, args[1:]))
        if c is not None
    )
    if not wants:
        return F.lit(False)
    return _has_ipv6_entry(
        f"has_any_ipv6:{sorted(wants)}",
        lambda cands: any(c in wants for c in cands),
    )(tr.to_col(args[0]).cast("string"))


@fn("has_ipv6_prefix")
def _has_ipv6_prefix(tr, args):
    """True when some IPv6 term's canonical form starts with the given
    prefix (compared lowercase; supply the prefix in canonical spelling,
    e.g. '2001:db8:') [KQL]."""
    want = tr.const_string(args[1]).lower()
    if not want:
        return F.lit(False)
    return _has_ipv6_entry(
        f"has_ipv6_prefix:{want}",
        lambda cands: any(c.startswith(want) for c in cands),
    )(tr.to_col(args[0]).cast("string"))

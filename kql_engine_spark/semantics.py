"""Centralized KQL-vs-Spark semantic deltas (SURVEY.md §4.2).

Every operator/function translation that needs a KQL-specific conversion
(0-based indexing, tick precision, literal grammar, type names) goes through
here so the deltas are audited in one place.
"""

from __future__ import annotations

import datetime as _dt
import json
import re

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .errors import KqlSemanticError

# KQL scalar type -> Spark type (SURVEY.md §1.2, normative table)
KQL_TO_SPARK: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "int32": T.IntegerType(),
    "long": T.LongType(),
    "int64": T.LongType(),
    "real": T.DoubleType(),
    "double": T.DoubleType(),
    "float": T.DoubleType(),
    "decimal": T.DecimalType(38, 18),
    "string": T.StringType(),
    "datetime": T.TimestampType(),
    "date": T.TimestampType(),
    "timespan": T.DayTimeIntervalType(),
    "time": T.DayTimeIntervalType(),
    "guid": T.StringType(),
    "uuid": T.StringType(),
    "dynamic": T.StringType(),  # JSON text carrier when shape unknown
}

# cast target names accepted by Column.cast for each KQL type
KQL_CAST_NAME: dict[str, str] = {
    "bool": "boolean",
    "int": "int",
    "long": "bigint",
    "real": "double",
    "double": "double",
    "decimal": "decimal(38,18)",
    "string": "string",
    "datetime": "timestamp",
    "date": "timestamp",
    "guid": "string",
    "timespan": "interval day to second",
    "time": "interval day to second",
}

_DT_FORMATS = (
    "%Y-%m-%d %H:%M:%S.%f",
    "%Y-%m-%dT%H:%M:%S.%f",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M",
    "%Y-%m-%dT%H:%M",
    "%Y-%m-%d",
    "%m/%d/%Y %H:%M:%S",
    "%m/%d/%Y",
)


def parse_kql_datetime(raw: str) -> _dt.datetime | None:
    """Decode the body of a datetime(...) literal [KQL]. Returns naive-UTC."""
    s = raw.strip().strip("\"'")
    if not s or s.lower() == "null":
        return None
    s = s.rstrip("Zz")
    # trim sub-microsecond digits (KQL allows 100 ns ticks; Spark is µs)
    m = re.match(r"(.*\.\d{1,6})\d*$", s)
    if m:
        s = m.group(1)
    for fmt in _DT_FORMATS:
        try:
            return _dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
    try:
        return _dt.datetime.fromisoformat(s)
    except ValueError as exc:
        raise KqlSemanticError(f"bad datetime literal: {raw!r}") from exc


def parse_dynamic_literal(raw: str) -> object:
    """Decode the body of a dynamic(...) literal [KQL] — JSON-ish."""
    s = raw.strip()
    if not s or s.lower() == "null":
        return None
    try:
        return json.loads(s)
    except json.JSONDecodeError:
        pass
    # KQL allows single-quoted strings inside dynamic
    try:
        return json.loads(s.replace("'", '"'))
    except json.JSONDecodeError as exc:
        raise KqlSemanticError(f"bad dynamic literal: {raw!r}") from exc


class _MixedDynamic(Exception):
    pass


def _dynamic_sig(v: object):
    """Spark-type signature of a decoded dynamic value; raises _MixedDynamic
    when a container mixes element types Spark's array()/create_map() can't
    carry (ints and floats merge — Spark coerces those)."""
    if v is None:
        return None  # wildcard: compatible with anything
    if isinstance(v, bool):
        return "b"
    if isinstance(v, int):
        return "f"
    if isinstance(v, float):
        return "f"
    if isinstance(v, str):
        return "s"
    items = v if isinstance(v, list) else list(v.values())
    sigs = {s for s in (_dynamic_sig(x) for x in items) if s is not None}
    if len(sigs) > 1:
        raise _MixedDynamic()
    inner = sigs.pop() if sigs else None
    return ("a" if isinstance(v, list) else "m", inner)


def lit_dynamic(value: object) -> Column:
    """Build a Column for a decoded dynamic literal value. Homogeneous
    containers become native array/map columns; heterogeneous ones (e.g.
    [1, {"z": 2}]) fall back to the JSON-text dynamic carrier the property
    accessor already understands."""
    try:
        _dynamic_sig(value)
    except _MixedDynamic:
        import json

        return F.lit(json.dumps(value))
    return _lit_dynamic_typed(value)


def _lit_dynamic_typed(value: object) -> Column:
    if value is None:
        return F.lit(None)
    if isinstance(value, list):
        if not value:
            return F.array()
        return F.array(*[_lit_dynamic_typed(v) for v in value])
    if isinstance(value, dict):
        pairs: list[Column] = []
        for k, v in value.items():
            pairs.append(F.lit(str(k)))
            pairs.append(_lit_dynamic_typed(v))
        return F.create_map(*pairs)
    return F.lit(value)


def interval_seconds(secs: float) -> Column:
    """KQL timespan -> Spark day-time interval column."""
    return F.make_dt_interval(secs=F.lit(float(secs)))


def timespan_seconds_of(col: Column) -> Column:
    """Day-time interval column -> fractional seconds (for arithmetic).
    Spark won't cast an interval to double directly; adding it to the epoch
    and reading unix_micros is exact to the microsecond."""
    return F.unix_micros(F.timestamp_micros(F.lit(0)) + col).cast("double") / F.lit(1e6)


def kql_type_name(spark_type: T.DataType) -> str:
    """Spark type -> KQL type name (for getschema / gettype)."""
    mapping = {
        T.BooleanType: "bool",
        T.IntegerType: "int",
        T.LongType: "long",
        T.ShortType: "int",
        T.ByteType: "int",
        T.DoubleType: "real",
        T.FloatType: "real",
        T.StringType: "string",
        T.TimestampType: "datetime",
        T.TimestampNTZType: "datetime",
        T.DateType: "datetime",
        T.DayTimeIntervalType: "timespan",
        T.DecimalType: "decimal",
    }
    for cls, name in mapping.items():
        if isinstance(spark_type, cls):
            return name
    return "dynamic"

"""Client-side rendering helper for `| render` (SURVEY §2.13).

Kusto's `render` is a CLIENT directive — the service returns the table
plus visualization metadata and the client draws it [KQL render
operator]. The engine therefore keeps `render` a no-op on the plan
(translator.py t_render attaches `df._kql_render`), and this module is
the client half: `to_vega_lite(df)` turns the rendered DataFrame into a
self-contained Vega-Lite v5 spec dict (no plotting dependency — the
caller hands it to any Vega runtime or dumps it to JSON).

Column roles follow the public render contract: `with (xcolumn=...,
ycolumns=c1,c2, series=..., title=..., xtitle=..., ytitle=...)` when
given; otherwise the first column is the x axis, numeric columns are the
y series, and the remaining non-numeric columns are series splits.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
from typing import Any

from pyspark.sql import DataFrame

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}

_MARKS = {
    "barchart": "bar",
    "columnchart": "bar",
    "timechart": "line",
    "linechart": "line",
    "areachart": "area",
    "stackedareachart": "area",
    "scatterchart": "point",
    "piechart": "arc",
    "anomalychart": "line",
    "ladderchart": "bar",
    "timepivot": "rect",
    "card": "text",
    "table": None,
}


def _field_type(spark_type: str) -> str:
    base = spark_type.split("(")[0]
    if base in _NUMERIC or base.startswith("decimal"):
        return "quantitative"
    if base in ("timestamp", "timestamp_ntz", "date"):
        return "temporal"
    return "nominal"


def _json_cell(v: Any) -> Any:
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    if isinstance(v, _decimal.Decimal):
        return float(v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def to_vega_lite(df: DataFrame, max_rows: int = 5000) -> dict | None:
    """Vega-Lite v5 spec for a DataFrame produced by a `| render` query.

    Returns None when the query did not end in `render` or asked for
    `render table` (nothing to draw). Collects at most `max_rows` rows
    into the spec's inline data — rendering is a client-side, bounded
    operation by definition; aggregate/summarize BEFORE render for big
    inputs (exactly Kusto's own guidance)."""
    meta = getattr(df, "_kql_render", None)
    if meta is None:
        return None
    chart = str(meta.get("chart", "")).lower()
    mark = _MARKS.get(chart, "line")
    if mark is None:
        return None

    dtypes = dict(df.dtypes)
    cols = df.columns

    def _split_list(v):
        if v is None:
            return []
        if isinstance(v, (list, tuple)):
            return [str(x) for x in v]
        return [c.strip() for c in str(v).split(",") if c.strip()]

    xcol = meta.get("xcolumn") or (cols[0] if cols else None)
    ycols = [c for c in _split_list(meta.get("ycolumns")) if c in dtypes]
    if not ycols:
        ycols = [
            c for c in cols
            if c != xcol and _field_type(dtypes[c]) == "quantitative"
        ]
    # every chart kind except card/table needs a quantitative value axis;
    # with none resolvable a spec would carry "field": None (invalid
    # Vega-Lite) — nothing to draw, same contract as `render table`
    if not ycols and chart not in ("card", "table"):
        return None
    if chart == "card" and not cols:
        return None
    series = meta.get("series")
    if series is None:
        leftovers = [c for c in cols if c != xcol and c not in ycols]
        series = leftovers[0] if leftovers else None

    rows = [
        {c: _json_cell(r[c]) for c in cols} for r in df.limit(max_rows).collect()
    ]
    spec: dict = {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "data": {"values": rows},
        "mark": mark,
    }
    if meta.get("title"):
        spec["title"] = meta["title"]

    if chart == "piechart":
        spec["encoding"] = {
            "theta": {"field": ycols[0] if ycols else None, "type": "quantitative"},
            "color": {"field": xcol, "type": "nominal"},
        }
        return spec
    if chart == "card":
        spec["mark"] = {"type": "text", "fontSize": 36}
        spec["encoding"] = {
            "text": {"field": cols[0], "type": _field_type(dtypes[cols[0]])}
        }
        return spec

    horizontal = chart == "barchart"  # Kusto barchart is horizontal bars
    enc: dict = {}
    x_t = _field_type(dtypes.get(xcol, "string")) if xcol else "nominal"
    val_axis = {"title": meta.get("ytitle")} if meta.get("ytitle") else {}
    cat_axis = {"title": meta.get("xtitle")} if meta.get("xtitle") else {}
    if len(ycols) > 1:
        # fold multiple y columns into (series, value) long form
        spec["transform"] = [{"fold": ycols, "as": ["__series", "__value"]}]
        value_field, color_field = "__value", "__series"
    else:
        value_field = ycols[0] if ycols else None
        color_field = series
    value_enc = {"field": value_field, "type": "quantitative", **(
        {"axis": val_axis} if val_axis else {})}
    cat_enc = {"field": xcol, "type": x_t, **(
        {"axis": cat_axis} if cat_axis else {})}
    if str(meta.get("kind", "")).lower() in ("stacked", "stacked100"):
        value_enc["stack"] = (
            "normalize" if str(meta["kind"]).lower() == "stacked100" else "zero"
        )
    if horizontal:
        enc["y"], enc["x"] = cat_enc, value_enc
    else:
        enc["x"], enc["y"] = cat_enc, value_enc
    if color_field:
        enc["color"] = {"field": color_field, "type": "nominal"}
    spec["encoding"] = enc
    return spec

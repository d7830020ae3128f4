"""Parser/AST unit tests: grammar productions, literals, error paths."""

from __future__ import annotations

import pytest

from kql_engine_spark.ast_nodes import (
    BinOp, Col, DataTable, Join, Lit, Pipe, PrintSource, Project, Query,
    Summarize, TableRef, TypedLit, Where,
)
from kql_engine_spark.errors import KqlSemanticError, KqlSyntaxError, KqlUnsupportedError
from kql_engine_spark.parser import parse


def test_parse_simple_pipe():
    q = parse("T | where a > 1 | project a, b")
    assert isinstance(q, Query)
    assert isinstance(q.pipe.source, TableRef)
    assert q.pipe.source.name == "T"
    assert isinstance(q.pipe.ops[0], Where)
    assert isinstance(q.pipe.ops[1], Project)


def test_parse_where_predicate_shape():
    q = parse("T | where a > 1 and b == 'x'")
    pred = q.pipe.ops[0].pred
    assert isinstance(pred, BinOp) and pred.op == "and"
    assert isinstance(pred.left, BinOp) and pred.left.op == ">"


def test_parse_datetime_literal():
    q = parse("T | where ts >= datetime(2024-01-01)")
    lit = q.pipe.ops[0].pred.right
    assert isinstance(lit, TypedLit) and lit.ktype == "datetime"


def test_parse_timespan_literal():
    q = parse("T | where ts > ago(90m)")
    call = q.pipe.ops[0].pred.right
    assert call.args[0].ktype == "timespan"
    assert float(call.args[0].value) == 5400.0


def test_parse_summarize_by():
    q = parse("T | summarize c = count(), s = sum(x) by k1, k2 = bin(ts, 1h)")
    s = q.pipe.ops[0]
    assert isinstance(s, Summarize)
    assert len(s.aggs) == 2 and len(s.by) == 2
    assert s.by[1].name == "k2"


def test_parse_join_kind_and_keys():
    q = parse("T | join kind=leftouter (U | where b > 0) on $left.a == $right.b")
    j = q.pipe.ops[0]
    assert isinstance(j, Join) and j.kind == "leftouter"
    assert j.on[0].left.side == "$left" and j.on[0].right.side == "$right"


def test_parse_datatable():
    q = parse("datatable(a:long, b:string)[1, 'x', 2, 'y']")
    dtab = q.pipe.source
    assert isinstance(dtab, DataTable)
    assert dtab.schema == [("a", "long"), ("b", "string")]
    assert len(dtab.rows) == 4


def test_parse_print():
    q = parse("print x = 1 + 2, y = 'a'")
    assert isinstance(q.pipe.source, PrintSource)
    assert len(q.pipe.source.items) == 2


def test_parse_let_binding():
    q = parse("let n = 5; T | where a > n")
    assert q.lets[0].name == "n"
    assert isinstance(q.lets[0].value, Lit)


def test_parse_string_escapes():
    q = parse("print s = 'it\\'s', d = \"q\\\"q\"")
    items = q.pipe.source.items
    assert items[0].expr.value == "it's"
    assert items[1].expr.value == 'q"q'


def test_syntax_error_raises():
    with pytest.raises(KqlSyntaxError):
        parse("T | where | take")


def test_unknown_operator_raises():
    with pytest.raises((KqlSyntaxError, KqlUnsupportedError)):
        parse("T | frobnicate x")


def test_unknown_function_raises(run_kql):
    with pytest.raises(KqlUnsupportedError):
        run_kql("print x = no_such_function(1)").collect()


def test_unknown_table_raises(run_kql):
    with pytest.raises(KqlSemanticError):
        run_kql("no_such_table | count").collect()


def test_window_without_serialize_raises(run_kql):
    with pytest.raises(KqlSemanticError):
        run_kql("lineitem | extend r = row_number()").collect()


def test_toscalar_eager(run_kql):
    rows = run_kql(
        "orders | where o_totalprice > toscalar(orders | summarize avg(o_totalprice)) | count"
    ).collect()
    assert rows[0].Count > 0


def test_fluent_builder_matches_text(spark, run_kql):
    from conftest import SF_DIR

    from kql_engine_spark import Kql

    fluent = (
        Kql(spark, sf_dir=SF_DIR)
        .table("events")
        .where("value > 50.0")
        .summarize("c = count(), av = round(avg(value), 4) by event_type")
        .sort("event_type asc")
        .to_df()
    )
    text = run_kql(
        "events | where value > 50.0"
        " | summarize c = count(), av = round(avg(value), 4) by event_type"
        " | sort by event_type asc"
    )
    assert [tuple(r) for r in fluent.collect()] == [tuple(r) for r in text.collect()]


def test_fluent_join_and_evaluate(spark):
    from conftest import SF_DIR

    from kql_engine_spark import Kql

    k = Kql(spark, sf_dir=SF_DIR)
    df = (
        k.table("orders")
        .join("customer", on="$left.o_custkey == $right.c_custkey", kind="inner")
        .summarize("n = count() by c_mktsegment")
        .to_df()
    )
    assert df.count() == 5

    docs = k.table("documents").evaluate("tokenize(text)").take(3).to_df()
    assert "tokens" in docs.columns


def test_qident_one_cell_datatable_unescapes():
    # round 8: `["{\"a\": 1}"]` lexes as QIDENT (one-cell datatable row
    # block) — its value must decode \" \\ \uXXXX exactly like the STRING
    # path, else the cell silently carries literal backslashes
    from kql_engine_spark.lexer import tokenize

    toks = tokenize(r'["{\"a\": \u00e9, c:\\path}"]')
    assert toks[0].kind == "QIDENT"
    assert toks[0].value == '{"a": \u00e9, c:\\path}'

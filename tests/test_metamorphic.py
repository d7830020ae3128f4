"""Metamorphic laws (SURVEY.md §5.3): algebraic identities two different KQL
formulations must satisfy — no oracle needed, the law itself is the spec."""

from __future__ import annotations

from conftest import canonize_rows


def _rows(df):
    cols = df.columns
    return canonize_rows(cols, [[r[c] for c in cols] for r in df.collect()])


def test_where_conjunction_split(run_kql):
    a = run_kql("lineitem | where l_quantity > 20.0 | where l_discount < 0.05")
    b = run_kql("lineitem | where l_quantity > 20.0 and l_discount < 0.05")
    assert _rows(a) == _rows(b)


def test_where_commutes_with_project(run_kql):
    a = run_kql("lineitem | where l_quantity > 40.0 | project l_orderkey, l_quantity")
    b = run_kql("lineitem | project l_orderkey, l_quantity | where l_quantity > 40.0")
    assert _rows(a) == _rows(b)


def test_union_count_additivity(run_kql):
    u = run_kql(
        "union (customer | project k = c_custkey), (supplier | project k = s_suppkey) | count"
    ).collect()[0].Count
    a = run_kql("customer | count").collect()[0].Count
    b = run_kql("supplier | count").collect()[0].Count
    assert u == a + b


def test_summarize_partition_sum_invariance(run_kql):
    total = run_kql("lineitem | summarize s = sum(l_quantity)").collect()[0].s
    parts = run_kql(
        "lineitem | summarize s = sum(l_quantity) by l_returnflag"
    ).collect()
    assert sum(r.s for r in parts) == total


def test_top_is_sort_take(run_kql):
    a = run_kql("orders | top 20 by o_totalprice desc | project o_orderkey")
    b = run_kql(
        "orders | sort by o_totalprice desc | take 20 | project o_orderkey"
    )
    assert _rows(a) == _rows(b)


def test_distinct_idempotent(run_kql):
    once = run_kql("lineitem | distinct l_returnflag, l_linestatus")
    twice = run_kql(
        "lineitem | distinct l_returnflag, l_linestatus | distinct l_returnflag, l_linestatus"
    )
    assert _rows(once) == _rows(twice)


def test_semi_join_equals_in_filter(run_kql):
    a = run_kql(
        "customer | join kind=leftsemi (nation | where n_regionkey == 2)"
        " on $left.c_nationkey == $right.n_nationkey | summarize n = count()"
    ).collect()[0].n
    b = run_kql(
        "customer | lookup (nation) on $left.c_nationkey == $right.n_nationkey"
        " | where n_regionkey == 2 | summarize n = count()"
    ).collect()[0].n
    assert a == b


def test_extend_then_filter_equals_filter_on_expr(run_kql):
    a = run_kql(
        "lineitem | extend v = l_extendedprice * (1.0 - l_discount)"
        " | where v > 50000.0 | summarize n = count()"
    ).collect()[0].n
    b = run_kql(
        "lineitem | where l_extendedprice * (1.0 - l_discount) > 50000.0"
        " | summarize n = count()"
    ).collect()[0].n
    assert a == b


def test_diffpatterns_swap_sides_negates_diff(run_kql):
    a = run_kql(
        "orders | project o_orderstatus, o_orderpriority"
        ' | evaluate diffpatterns(o_orderstatus, "F", "O")'
    )
    b = run_kql(
        "orders | project o_orderstatus, o_orderpriority"
        ' | evaluate diffpatterns(o_orderstatus, "O", "F")'
    )
    am = {r["o_orderpriority"]: (r["CountA"], r["CountB"], r["PercentDiffAB"])
          for r in a.collect()}
    bm = {r["o_orderpriority"]: (r["CountA"], r["CountB"], r["PercentDiffAB"])
          for r in b.collect()}
    assert set(am) == set(bm)
    for k, (ca, cb, d) in am.items():
        cb2, ca2, d2 = bm[k]
        assert (ca, cb) == (ca2, cb2)
        assert abs(d + d2) < 0.02  # rounding of already-rounded percents


def test_diffpatterns_text_counts_partition_rows(run_kql):
    out = run_kql(
        'events | extend side = iff(user_id % 2 == 0, "even", "odd")'
        ' | project msg = strcat("user did ", event_type), side'
        ' | evaluate diffpatterns_text(msg, side, "even", "odd")'
    ).collect()
    total_a = sum(r["Count_of_A"] for r in out)
    total_b = sum(r["Count_of_B"] for r in out)
    n = run_kql("events | summarize n = count()").collect()[0].n
    # every row lands in exactly one pattern (<=32 patterns here)
    assert total_a + total_b == n

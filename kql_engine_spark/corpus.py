"""Query corpus: (KQL query, DuckDB oracle SQL) pairs per SURVEY.md §2 row.

This is the engine's t2 evidence base (SURVEY.md §5.2): every entry is a KQL
query run through the full parser->translator->Spark pipeline plus an ANSI-SQL
twin DuckDB runs on the same parquet fixtures. The driver hashes both sides
(order-insensitive, columns sorted by name), so:

- every computed column is aliased IDENTICALLY in both sides;
- double aggregates whose value depends on accumulation order are rounded
  (2-6 dp) on BOTH sides; sums of integral-valued doubles (l_quantity) are
  exact in any order and stay unrounded;
- integer-typed computed outputs are cast to long/BIGINT on both sides
  (Spark length() is int, DuckDB length() is BIGINT);
- DuckDB integer SUM returns HUGEINT -> always CAST(SUM(..) AS BIGINT);
- events.ts is parquet timestamp[ns]: the engine truncates to µs at scan
  (catalog.py), the oracle mirrors with CAST(.. AS TIMESTAMP).

Round 9: every entry now carries a DuckDB twin — the former rows-only set
(dedup_near/jaccard brute-force recursive-CTE twins, scan/sequence window
identities, fixture-forced Tier-C outputs, count contracts for sample/
consume, sub-capacity-exact sketches) is documented per entry. A None
oracle is still legal for future non-SQL-expressible ops; the driver then
records a weaker rows-only check.
"""

from __future__ import annotations

# name -> (kql_text, duckdb_sql | None)
CORPUS: dict[str, tuple[str, str | None]] = {}


def q(name: str, kql_text: str, sql: str | None) -> None:
    CORPUS[name] = (kql_text, sql)


FLAGSHIP = """
lineitem
| where l_shipdate <= datetime(1998-09-02)
| extend disc_price = l_extendedprice * (1.0 - l_discount),
         charge = l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
| summarize sum_qty=sum(l_quantity), sum_base=round(sum(l_extendedprice),2),
            sum_disc=round(sum(disc_price),2), sum_charge=round(sum(charge),2),
            avg_qty=round(avg(l_quantity),4), avg_price=round(avg(l_extendedprice),4),
            avg_disc=round(avg(l_discount),4), cnt=count()
  by l_returnflag, l_linestatus
| sort by l_returnflag asc, l_linestatus asc
"""

# --------------------------------------------------------------- §2.2 row ops
q(
    "tpch_q1",
    FLAGSHIP,
    """
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base,
           ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc,
           ROUND(SUM(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS cnt
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus ORDER BY 1, 2
    """,
)

q(
    "where_project",
    """lineitem
    | where l_quantity > 30.0 and l_discount < 0.05
    | project l_orderkey, l_linenumber, l_quantity, l_discount""",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
       FROM lineitem WHERE l_quantity > 30.0 AND l_discount < 0.05""",
)

q(
    "extend_arith",
    """lineitem
    | project l_orderkey, l_linenumber
    , v = l_extendedprice * (1.0 - l_discount)
    , q2 = l_quantity * 2.0
    , r = l_quantity / 7.0""",
    """SELECT l_orderkey, l_linenumber,
              l_extendedprice * (1.0 - l_discount) AS v,
              l_quantity * 2.0 AS q2, l_quantity / 7.0 AS r
       FROM lineitem""",
)

q(
    "distinct_cols",
    "lineitem | distinct l_returnflag, l_linestatus",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)

q(
    "project_away_keep_rename",
    """customer
    | project-away c_acctbal
    | project-rename segment = c_mktsegment
    | project-keep c_custkey, segment""",
    "SELECT c_custkey, c_mktsegment AS segment FROM customer",
)

q(
    "top_orders",
    """orders
    | sort by o_totalprice desc, o_orderkey asc
    | take 10
    | project o_orderkey, o_totalprice""",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)

q(
    "tpch_q6",
    """lineitem
    | where l_shipdate >= datetime(1996-01-01) and l_shipdate < datetime(1997-01-01)
    | where l_discount between (0.03 .. 0.05) and l_quantity < 24.0
    | summarize revenue = round(sum(l_extendedprice * l_discount), 2)""",
    """SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         AND l_discount BETWEEN 0.03 AND 0.05 AND l_quantity < 24.0""",
)

q(
    "count_op",
    "events | count",
    'SELECT COUNT(*) AS "Count" FROM events',
)

# -------------------------------------------------------- §2.6 summarize / bin
q(
    "summarize_bin_1d",
    """events
    | summarize mx = max(ts), mn = min(ts), c = count() by d = bin(ts, 1d)
    | sort by d asc""",
    """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS d,
              CAST(MAX(ts) AS TIMESTAMP) AS mx, CAST(MIN(ts) AS TIMESTAMP) AS mn,
              COUNT(*) AS c
       FROM events GROUP BY 1 ORDER BY 1""",
)

q(
    "summarize_bin_1h_value",
    # avg rounds at 4dp: the fixture's 2dp values make 2dp/3dp rounding hit
    # exact decimal ties (engines tie-break differently); 4dp is tie-free at
    # the certification SFs. At sf0.1 multi-partition accumulation order can
    # land within an ulp of a 4dp boundary (documented float-tie caveat —
    # the correctness gates run at sf0.001/sf0.01).
    """events
    | where event_type == 'click'
    | summarize c = count(), sv = round(sum(value), 2) by h = bin(ts, 1h)
    | sort by h asc""",
    """SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS h,
              COUNT(*) AS c, ROUND(SUM(value), 2) AS sv
       FROM events WHERE event_type = 'click' GROUP BY 1 ORDER BY 1""",
)

q(
    "agg_sweep",
    """lineitem
    | summarize c = count(), ci = countif(l_quantity > 25.0),
                s = sum(l_quantity), si = sumif(l_quantity, l_linestatus == 'F'),
                mn = min(l_extendedprice), mx = max(l_extendedprice),
                dc = dcount(l_orderkey), av = round(avg(l_quantity), 4)
      by l_returnflag""",
    """SELECT l_returnflag, COUNT(*) AS c,
              COUNT(*) FILTER (WHERE l_quantity > 25.0) AS ci,
              SUM(l_quantity) AS s,
              SUM(l_quantity) FILTER (WHERE l_linestatus = 'F') AS si,
              MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx,
              COUNT(DISTINCT l_orderkey) AS dc,
              ROUND(AVG(l_quantity), 4) AS av
       FROM lineitem GROUP BY l_returnflag""",
)

q(
    "summarize_computed_key",
    """events
    | summarize n = count(), s = round(sum(value), 4) by u = user_id % 10
    | sort by u asc""",
    """SELECT user_id % 10 AS u, COUNT(*) AS n, ROUND(SUM(value), 4) AS s
       FROM events GROUP BY 1 ORDER BY 1""",
)

q(
    "percentiles_exact",
    """lineitem
    | summarize p50 = round(percentile(l_extendedprice, 50), 4),
                p95 = round(percentile(l_extendedprice, 95), 4)
      by l_returnflag""",
    """SELECT l_returnflag,
              ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
              ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95
       FROM lineitem GROUP BY l_returnflag""",
)

q(
    "arg_max_agg",
    """orders
    | summarize mxp = arg_max(o_totalprice, o_orderkey) by o_orderpriority""",
    """SELECT o_orderpriority, MAX(o_totalprice) AS mxp,
              ARG_MAX(o_orderkey, o_totalprice) AS o_orderkey
       FROM orders GROUP BY o_orderpriority""",
)

q(
    "make_set_sorted",
    # array results are serialized to delimited strings on both sides so the
    # driver's pandas canonicalizer (which sorts rows) never sees list cells.
    """events
    | summarize s0 = make_set(event_type) by u = user_id % 7
    | project u, s = strcat_array(array_sort_asc(s0), '|')
    | sort by u asc""",
    """SELECT user_id % 7 AS u,
              array_to_string(list_sort(list(DISTINCT event_type)), '|') AS s
       FROM events GROUP BY 1 ORDER BY 1""",
)

q(
    "make_list_sorted",
    """lineitem
    | summarize s0 = make_list(l_linenumber) by l_orderkey
    | project l_orderkey, s = strcat_array(array_sort_asc(s0), '|')""",
    """SELECT l_orderkey, array_to_string(list_sort(list(l_linenumber)), '|') AS s
       FROM lineitem GROUP BY l_orderkey""",
)

q(
    "stdev_variance",
    """lineitem
    | summarize sd = round(stdev(l_quantity), 4), vr = round(variance(l_quantity), 2),
                sdp = round(stdevp(l_quantity), 4), vp = round(variancep(l_quantity), 2)
      by l_returnflag""",
    """SELECT l_returnflag, ROUND(stddev_samp(l_quantity), 4) AS sd,
              ROUND(var_samp(l_quantity), 2) AS vr,
              ROUND(stddev_pop(l_quantity), 4) AS sdp,
              ROUND(var_pop(l_quantity), 2) AS vp
       FROM lineitem GROUP BY l_returnflag""",
)

# -------------------------------------------------------------------- §2.4 joins
q(
    "join_inner",
    """orders
    | join kind=inner (customer) on $left.o_custkey == $right.c_custkey
    | summarize n = count(), tot = round(sum(o_totalprice), 2) by c_mktsegment""",
    """SELECT c_mktsegment, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS tot
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment""",
)

q(
    "join_leftouter",
    """customer
    | join kind=leftouter (orders) on $left.c_custkey == $right.o_custkey
    | summarize n = count(), unmatched = countif(isnull(o_orderkey))""",
    """SELECT COUNT(*) AS n,
              COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS unmatched
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey""",
)

q(
    "join_leftanti",
    """customer
    | join kind=leftanti (orders) on $left.c_custkey == $right.o_custkey
    | summarize n = count(), mx = max(c_custkey)""",
    """SELECT COUNT(*) AS n, MAX(c_custkey) AS mx
       FROM customer ANTI JOIN orders ON c_custkey = o_custkey""",
)

q(
    "join_leftsemi",
    """customer
    | join kind=leftsemi (orders | where o_totalprice > 400000.0)
        on $left.c_custkey == $right.o_custkey
    | summarize n = count(), s = round(sum(c_acctbal), 2)""",
    """SELECT COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS s
       FROM customer SEMI JOIN (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
       ON c_custkey = o_custkey""",
)

q(
    "join_fullouter",
    """customer
    | join kind=fullouter (orders) on $left.c_custkey == $right.o_custkey
    | summarize n = count(), no_cust = countif(isnull(c_custkey)),
                no_ord = countif(isnull(o_orderkey))""",
    """SELECT COUNT(*) AS n,
              COUNT(*) FILTER (WHERE c_custkey IS NULL) AS no_cust,
              COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS no_ord
       FROM customer FULL JOIN orders ON c_custkey = o_custkey""",
)

q(
    "join_innerunique",
    """orders
    | project o_custkey
    | join (customer) on $left.o_custkey == $right.c_custkey
    | summarize n = count(), s = round(sum(c_acctbal), 2)""",
    """SELECT COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS s
       FROM (SELECT DISTINCT o_custkey FROM orders) o
       JOIN customer ON o_custkey = c_custkey""",
)

q(
    "join_rightouter",
    """orders
    | join kind=rightouter (customer) on $left.o_custkey == $right.c_custkey
    | summarize n = count(), unmatched = countif(isnull(o_orderkey)) by c_mktsegment
    | sort by c_mktsegment asc""",
    """SELECT c_mktsegment, COUNT(*) AS n,
              COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS unmatched
       FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment ORDER BY c_mktsegment""",
)

q(
    "join_multikey",
    # composite-key equi-join on lineitem's natural PK (l_orderkey, l_linenumber)
    """lineitem
    | join kind=inner (
        lineitem | where l_linenumber == 1
                 | project l_orderkey, l_linenumber, base = l_quantity)
      on $left.l_orderkey == $right.l_orderkey, $left.l_linenumber == $right.l_linenumber
    | summarize n = count(), s = round(sum(base), 2)""",
    """SELECT COUNT(*) AS n, ROUND(SUM(r.base), 2) AS s
       FROM lineitem l
       JOIN (SELECT l_orderkey, l_linenumber, l_quantity AS base
             FROM lineitem WHERE l_linenumber = 1) r
         ON l.l_orderkey = r.l_orderkey AND l.l_linenumber = r.l_linenumber""",
)

q(
    "join_broadcast_hint",
    # hint must not change results: oracle is the plain (unhinted) join
    """customer
    | join kind=inner hint.strategy=broadcast (nation) on $left.c_nationkey == $right.n_nationkey
    | summarize n = count(), bal = round(sum(c_acctbal), 2) by n_name
    | sort by n_name asc""",
    """SELECT n_name, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS bal
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name ORDER BY n_name""",
)

q(
    "lookup_dim",
    """customer
    | lookup (nation) on $left.c_nationkey == $right.n_nationkey
    | summarize n = count(), bal = round(sum(c_acctbal), 2) by n_name
    | sort by n_name asc""",
    """SELECT n_name, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS bal
       FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name ORDER BY n_name""",
)

q(
    "tpch_q5_multijoin",
    """customer
    | join kind=inner (orders | where o_orderdate >= datetime(1996-01-01)
                              and o_orderdate < datetime(1997-01-01))
        on $left.c_custkey == $right.o_custkey
    | join kind=inner (lineitem) on $left.o_orderkey == $right.l_orderkey
    | join kind=inner (supplier) on $left.l_suppkey == $right.s_suppkey
    | where c_nationkey == s_nationkey
    | join kind=inner (nation) on $left.s_nationkey == $right.n_nationkey
    | join kind=inner (region) on $left.n_regionkey == $right.r_regionkey
    | where r_name == 'ASIA'
    | summarize revenue = round(sum(l_extendedprice * (1.0 - l_discount)), 2) by n_name
    | sort by revenue desc""",
    """SELECT n_name, ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON o_orderkey = l_orderkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         AND c_nationkey = s_nationkey AND r_name = 'ASIA'
       GROUP BY n_name ORDER BY revenue DESC""",
)

# -------------------------------------------------------------------- §2.5 union
q(
    "union_withsource",
    """union withsource=src (customer | project key = c_custkey),
                            (supplier | project key = s_suppkey)
    | summarize n = count(), s = sum(key) by src
    | sort by src asc""",
    """SELECT src, COUNT(*) AS n, CAST(SUM(key) AS BIGINT) AS s FROM (
         SELECT 'customer' AS src, c_custkey AS key FROM customer
         UNION ALL SELECT 'supplier', s_suppkey FROM supplier
       ) GROUP BY src ORDER BY src""",
)

q(
    "union_inner_common",
    """union kind=inner (lineitem | project k = l_orderkey, v = l_quantity),
                        (orders | project k = o_orderkey, x = o_totalprice)
    | summarize n = count(), s = sum(k)""",
    """SELECT COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS s FROM (
         SELECT l_orderkey AS k FROM lineitem
         UNION ALL SELECT o_orderkey FROM orders
       )""",
)

# ------------------------------------------------------- §2.9 scalar functions
q(
    "string_fns",
    """customer
    | project c_custkey, up = toupper(c_name), lo = tolower(c_mktsegment),
              ln = tolong(strlen(c_name)), sub = substring(c_name, 0, 8),
              cat = strcat(c_mktsegment, '-', tostring(c_nationkey)),
              idx = tolong(indexof(c_name, '9')),
              rev = reverse(c_mktsegment),
              rep = replace_string(c_name, 'Customer', 'Cust')""",
    """SELECT c_custkey, UPPER(c_name) AS up, LOWER(c_mktsegment) AS lo,
              LENGTH(c_name) AS ln, substr(c_name, 1, 8) AS sub,
              c_mktsegment || '-' || CAST(c_nationkey AS VARCHAR) AS cat,
              POSITION('9' IN c_name) - 1 AS idx,
              REVERSE(c_mktsegment) AS rev,
              REPLACE(c_name, 'Customer', 'Cust') AS rep
       FROM customer""",
)

q(
    "string_split_extract",
    """part
    | project p_partkey,
              w1 = split(p_name, ' ', 0), w2 = split(p_name, ' ', 1),
              ex = extract('([a-z]+) ([a-z]+)', 2, p_name),
              tr_ = trim_start('small ', p_name)""",
    """SELECT p_partkey,
              string_split(p_name, ' ')[1] AS w1,
              string_split(p_name, ' ')[2] AS w2,
              regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS ex,
              regexp_replace(p_name, '^(?:small )+', '') AS tr_
       FROM part""",
)

q(
    "string_predicates",
    """part
    | where p_type contains 'ECO' and p_name startswith 's'
    | summarize n = count() by p_type""",
    """SELECT p_type, COUNT(*) AS n FROM part
       WHERE CONTAINS(LOWER(p_type), 'eco') AND LOWER(p_name) LIKE 's%'
       GROUP BY p_type""",
)

q(
    "has_term",
    """documents
    | where text has 'spark' and text !has 'nonexistentterm'
    | summarize n = count(), ids = sum(doc_id)""",
    r"""SELECT COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS ids FROM documents
       WHERE regexp_matches(text, '(?i)\bspark\b')
         AND NOT regexp_matches(text, '(?i)\bnonexistentterm\b')""",
)

q(
    "in_and_between",
    """part
    | where p_brand in ('Brand#1', 'Brand#2', 'Brand#3') and p_size between (5 .. 15)
    | summarize n = count() by p_brand
    | sort by p_brand asc""",
    """SELECT p_brand, COUNT(*) AS n FROM part
       WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3') AND p_size BETWEEN 5 AND 15
       GROUP BY p_brand ORDER BY p_brand""",
)

q(
    "case_iff",
    """orders
    | project o_orderkey,
              pri = iff(o_orderpriority == '1-URGENT', 'urgent', 'other'),
              cls = case(o_totalprice > 300000.0, 'high',
                         o_totalprice > 100000.0, 'mid', 'low'),
              z = coalesce(o_orderstatus, 'NA')""",
    """SELECT o_orderkey,
              CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent' ELSE 'other' END AS pri,
              CASE WHEN o_totalprice > 300000.0 THEN 'high'
                   WHEN o_totalprice > 100000.0 THEN 'mid' ELSE 'low' END AS cls,
              COALESCE(o_orderstatus, 'NA') AS z
       FROM orders""",
)

q(
    "datetime_fns",
    """orders
    | project o_orderkey, y = tolong(getyear(o_orderdate)),
              m = tolong(getmonth(o_orderdate)), d = tolong(dayofmonth(o_orderdate)),
              doy = tolong(dayofyear(o_orderdate)),
              sd = startofday(o_orderdate), sm = startofmonth(o_orderdate),
              sy = startofyear(o_orderdate),
              ad = datetime_add('day', 7, o_orderdate),
              dd = datetime_diff('day', o_orderdate, datetime(1995-01-01))""",
    """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
              dayofmonth(o_orderdate) AS d, dayofyear(o_orderdate) AS doy,
              CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS sd,
              CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS sm,
              CAST(date_trunc('year', o_orderdate) AS TIMESTAMP) AS sy,
              o_orderdate + INTERVAL 7 DAY AS ad,
              datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS dd
       FROM orders""",
)

q(
    "bin_numeric",
    """lineitem
    | summarize n = count() by b = bin(l_extendedprice, 10000.0)
    | sort by b asc""",
    """SELECT FLOOR(l_extendedprice / 10000.0) * 10000.0 AS b, COUNT(*) AS n
       FROM lineitem GROUP BY 1 ORDER BY 1""",
)

q(
    "math_fns",
    """lineitem
    | project l_orderkey, l_linenumber,
              sq = round(sqrt(l_extendedprice), 6), lg = round(log(l_extendedprice), 6),
              l10 = round(log10(l_extendedprice), 6),
              ab = abs(l_discount - 0.05), pw = round(pow(l_quantity, 2.0), 1),
              sg = sign(l_quantity - 25.0), fl = floor(l_extendedprice, 1.0),
              ex = round(exp(l_discount), 6), mnf = min_of(l_quantity, 10.0),
              mxf = max_of(l_tax, 0.04)""",
    """SELECT l_orderkey, l_linenumber,
              ROUND(SQRT(l_extendedprice), 6) AS sq, ROUND(LN(l_extendedprice), 6) AS lg,
              ROUND(LOG10(l_extendedprice), 6) AS l10,
              ABS(l_discount - 0.05) AS ab, ROUND(POW(l_quantity, 2.0), 1) AS pw,
              CAST(SIGN(l_quantity - 25.0) AS DOUBLE) AS sg,
              FLOOR(l_extendedprice / 1.0) * 1.0 AS fl,
              ROUND(EXP(l_discount), 6) AS ex, LEAST(l_quantity, 10.0) AS mnf,
              GREATEST(l_tax, 0.04) AS mxf
       FROM lineitem""",
)

q(
    "gamma_print",
    """print g5 = round(gamma(5.0), 6), g4 = round(gamma(4.0), 6),
             lg1 = round(loggamma(1.0), 6), lg10 = round(loggamma(10.5), 6)""",
    """SELECT ROUND(gamma(5.0), 6) AS g5, ROUND(gamma(4.0), 6) AS g4,
              ROUND(lgamma(1.0), 6) AS lg1, ROUND(lgamma(10.5), 6) AS lg10""",
)

q(
    "conversions",
    """lineitem
    | project l_orderkey, l_linenumber, s = tostring(l_quantity),
              i = toint(l_quantity), lo = tolong(l_linenumber),
              d = todouble(l_linenumber), b = tobool(1),
              dtp = todatetime('1996-05-01'),
              bad = toint('not-a-number')""",
    """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS VARCHAR) AS s,
              CAST(l_quantity AS INT) AS i, CAST(l_linenumber AS BIGINT) AS lo,
              CAST(l_linenumber AS DOUBLE) AS d, CAST(1 AS BOOLEAN) AS b,
              TIMESTAMP '1996-05-01' AS dtp,
              CAST(NULL AS INT) AS bad
       FROM lineitem""",
)

q(
    "print_scalars",
    """print a = 1 + 2, b = strcat('x', 'y'), c = iff(3 > 2, 'yes', 'no'),
             d = round(log(exp(2.0)), 6), e = 7 / 2, f = 7 % 3,
             g = min_of(3, 9), h = hash_sha256('abc')""",
    """SELECT CAST(3 AS BIGINT) AS a, 'xy' AS b, 'yes' AS c, 2.0 AS d,
              3.5 AS e, CAST(1 AS BIGINT) AS f, CAST(3 AS BIGINT) AS g,
              'ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad' AS h""",
)

# --------------------------------------------------------- §2.7 window functions
q(
    "window_row_number",
    """orders
    | sort by o_orderkey asc
    | extend rn = tolong(row_number())
    | where rn <= 100
    | project o_orderkey, rn""",
    """SELECT o_orderkey, rn FROM (
         SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn FROM orders
       ) WHERE rn <= 100""",
)

q(
    "window_rank",
    """orders
    | sort by o_totalprice asc
    | extend rk = tolong(row_rank_min(o_totalprice)),
             dr = tolong(row_rank_dense(o_totalprice))
    | where rk <= 50
    | project o_orderkey, o_totalprice, rk, dr""",
    """SELECT o_orderkey, o_totalprice, rk, dr FROM (
         SELECT o_orderkey, o_totalprice,
                RANK() OVER (ORDER BY o_totalprice) AS rk,
                DENSE_RANK() OVER (ORDER BY o_totalprice) AS dr
         FROM orders
       ) WHERE rk <= 50""",
)

q(
    "window_prev_next",
    """orders
    | sort by o_orderkey asc
    | extend pk = prev(o_orderkey), nk = next(o_orderkey, 1, -1)
    | where o_orderkey <= 300
    | project o_orderkey, pk, nk""",
    """SELECT o_orderkey, pk, nk FROM (
         SELECT o_orderkey, LAG(o_orderkey) OVER (ORDER BY o_orderkey) AS pk,
                LEAD(o_orderkey, 1, -1) OVER (ORDER BY o_orderkey) AS nk
         FROM orders
       ) WHERE o_orderkey <= 300""",
)

q(
    "window_cumsum",
    """orders
    | sort by o_orderkey asc
    | extend cs = round(row_cumsum(o_totalprice), 2)
    | where o_orderkey <= 300
    | project o_orderkey, cs""",
    """SELECT o_orderkey, cs FROM (
         SELECT o_orderkey,
                ROUND(SUM(o_totalprice) OVER (ORDER BY o_orderkey
                      ROWS UNBOUNDED PRECEDING), 2) AS cs
         FROM orders
       ) WHERE o_orderkey <= 300""",
)

q(
    "window_cumsum_restart",
    """datatable(x:long)[1, 2, 3, 4, 5, 6, 7, 8, 9]
    | serialize
    | extend cs = row_cumsum(x, x % 3 == 0)
    | project x, cs""",
    """WITH t(x) AS (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)),
         s AS (SELECT x, SUM(CASE WHEN x % 3 = 0 THEN 1 ELSE 0 END)
                          OVER (ORDER BY x) AS seg FROM t)
       SELECT CAST(x AS BIGINT) AS x,
              CAST(SUM(x) OVER (PARTITION BY seg ORDER BY x) AS BIGINT) AS cs
       FROM s""",
)

# ------------------------------------------------------ §2.8 dynamic / parse
q(
    "mv_expand_array",
    """events
    | project event_id, arr = pack_array(value, value * 2.0)
    | mv-expand v = arr to typeof(real)
    | summarize n = count(), s = round(sum(v), 2)""",
    """SELECT COUNT(*) AS n, ROUND(SUM(v), 2) AS s FROM (
         SELECT UNNEST([value, value * 2.0]) AS v FROM events
       )""",
)

q(
    "parse_pattern",
    """events
    | project s = strcat('id=', tostring(event_id), ';type=', event_type)
    | parse s with 'id=' pid:long ';type=' ptype
    | project pid, ptype""",
    """WITH t AS (SELECT 'id=' || CAST(event_id AS VARCHAR) || ';type=' || event_type AS s
                  FROM events)
       SELECT CAST(regexp_extract(s, 'id=(.*?);type=(.*)', 1) AS BIGINT) AS pid,
              regexp_extract(s, 'id=(.*?);type=(.*)', 2) AS ptype
       FROM t""",
)

q(
    "extractjson_props",
    """events
    | project event_id, k = tolong(extractjson('$.k', props))
    | summarize s = sum(k), n = count()""",
    """SELECT CAST(SUM(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS s,
              COUNT(*) AS n FROM events""",
)

q(
    "bag_unpack_props",
    """events
    | evaluate bag_unpack(props)
    | summarize s = sum(tolong(k)), n = count()""",
    """SELECT CAST(SUM(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS s,
              COUNT(*) AS n FROM events""",
)

q(
    "dynamic_array_fns",
    """print arr0 = dynamic([3, 1, 2])
    | extend arr = strcat_array(arr0, '|'),
             srt = strcat_array(array_sort_asc(arr0), '|'),
             rev = strcat_array(array_reverse(arr0), '|'),
             ln = tolong(array_length(arr0)),
             sm = array_sum(arr0), idx = array_index_of(arr0, 2),
             sl = strcat_array(array_slice(arr0, 0, 1), '|'),
             un = strcat_array(set_union(arr0, dynamic([4, 1])), '|'),
             cat = strcat_array(arr0, '-')
    | project-away arr0""",
    """SELECT '3|1|2' AS arr, '1|2|3' AS srt, '2|1|3' AS rev,
              CAST(3 AS BIGINT) AS ln, 6.0 AS sm, CAST(2 AS BIGINT) AS idx,
              '3|1' AS sl, '1|2|3|4' AS un, '3-1-2' AS cat""",
)

# ------------------------------------------------------------ §2.10 make-series
q(
    "make_series_datetime",
    """events
    | make-series c = count() on ts from datetime(2024-01-01) to datetime(2024-01-31) step 1d by event_type
    | project event_type, c = strcat_array(c, '|'), ts = strcat_array(ts, '|')
    | sort by event_type asc""",
    """WITH axis AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                                   TIMESTAMP '2024-01-30',
                                                   INTERVAL 1 DAY)) AS d),
         keys AS (SELECT DISTINCT event_type FROM events),
         g AS (SELECT event_type,
                      CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS d,
                      COUNT(*) AS c
               FROM events GROUP BY 1, 2),
         grid AS (SELECT k.event_type, a.d FROM keys k CROSS JOIN axis a)
       SELECT grid.event_type,
              array_to_string(list(COALESCE(CAST(g.c AS DOUBLE), 0.0) ORDER BY grid.d), '|') AS c,
              array_to_string(list(grid.d ORDER BY grid.d), '|') AS ts
       FROM grid LEFT JOIN g ON g.event_type = grid.event_type AND g.d = grid.d
       GROUP BY grid.event_type ORDER BY grid.event_type""",
)

q(
    "make_series_numeric",
    """events
    | make-series av = round(sum(value), 2) default = -1.0 on value from 0.0 to 100.0 step 12.5
    | project av = strcat_array(av, '|'), value = strcat_array(value, '|')""",
    """WITH axis AS (SELECT unnest([0.0, 12.5, 25.0, 37.5, 50.0, 62.5, 75.0, 87.5]) AS b),
         g AS (SELECT FLOOR(value / 12.5) * 12.5 AS b, ROUND(SUM(value), 2) AS av
               FROM events WHERE value >= 0 AND value < 100 GROUP BY 1)
       SELECT array_to_string(list(COALESCE(g.av, -1.0) ORDER BY axis.b), '|') AS av,
              array_to_string(list(axis.b ORDER BY axis.b), '|') AS value
       FROM axis LEFT JOIN g ON axis.b = g.b""",
)

# --------------------------------------------------------- §2.13 misc operators
q(
    "range_source",
    """range x from 1 to 1000 step 3
    | summarize n = count(), s = sum(x), mx = max(x)""",
    """SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s, MAX(x) AS mx
       FROM (SELECT UNNEST(generate_series(1, 1000, 3)) AS x)""",
)

q(
    "search_term",
    # TERM semantics: 'old' must match the word "old" but NOT "cold"/"gold"
    # (substring matching would return ~2x the rows on this fixture)
    r"""part
    | search 'old'
    | summarize n = count()""",
    r"""SELECT COUNT(*) AS n FROM part
       WHERE regexp_matches(p_name, '(?i)\bold\b')
          OR regexp_matches(p_brand, '(?i)\bold\b')
          OR regexp_matches(p_type, '(?i)\bold\b')""",
)

q(
    "search_and_terms",
    # Round 5: boolean search predicate (or / and / parens / column-scoped
    # terms / exact ==) over the cross-table `search in (...)` form. Each
    # table is filtered independently (missing scoped columns are False
    # there), unioned null-padded with a $table provenance column.
    r"""search in (region, nation, customer) r_name: 'ASIA' or n_name == 'NATION_7'
        or (c_mktsegment == 'BUILDING' and c_name: 'Customer#00000042*')
    | summarize n = count() by tbl = $table
    | sort by tbl asc""",
    r"""SELECT tbl, n FROM (
      SELECT 'region' AS tbl, CAST(COUNT(*) AS BIGINT) AS n FROM region
        WHERE regexp_matches(r_name, '(?i)\bASIA\b')
      UNION ALL
      SELECT 'nation', CAST(COUNT(*) AS BIGINT) FROM nation
        WHERE n_name = 'NATION_7'
      UNION ALL
      SELECT 'customer', CAST(COUNT(*) AS BIGINT) FROM customer
        WHERE c_mktsegment = 'BUILDING'
          AND regexp_matches(c_name, '(?i)\bCustomer#00000042')
    ) WHERE n > 0 ORDER BY tbl""",
)

q(
    "search_scoped_wildcard",
    # column scoping + trailing-* prefix matching
    r"""part
    | search p_name: 'wid*'
    | summarize n = count()""",
    r"""SELECT COUNT(*) AS n FROM part
       WHERE regexp_matches(p_name, '(?i)\bwid')""",
)

q(
    "top_hitters",
    """events
    | top-hitters 3 of event_type""",
    """SELECT event_type, COUNT(*) AS approximate_count_event_type
       FROM events GROUP BY event_type
       ORDER BY 2 DESC LIMIT 3""",
)

q(
    "top_nested",
    """lineitem
    | top-nested 2 of l_returnflag by r1 = sum(l_quantity),
      top-nested 2 of l_linestatus by r2 = sum(l_quantity)""",
    """WITH l1 AS (SELECT l_returnflag, SUM(l_quantity) AS r1
                   FROM lineitem GROUP BY 1),
         l1t AS (SELECT * FROM l1 ORDER BY r1 DESC LIMIT 2),
         l2 AS (SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS r2
                FROM lineitem GROUP BY 1, 2),
         j AS (SELECT l1t.l_returnflag, l1t.r1, l2.l_linestatus, l2.r2,
                      ROW_NUMBER() OVER (PARTITION BY l1t.l_returnflag
                                         ORDER BY l2.r2 DESC) AS rn
               FROM l1t JOIN l2 ON l1t.l_returnflag = l2.l_returnflag)
       SELECT l_returnflag, r1, l_linestatus, r2 FROM j WHERE rn <= 2""",
)

q(
    "graph_match_2hop",
    # fixed-length graph pattern lowers to a join chain; node/edge
    # properties accessed through the bound variables
    """datatable(src:long, dst:long, w:long)[1, 2, 10, 2, 3, 20, 1, 3, 5, 3, 4, 1]
    | make-graph src --> dst with (datatable(id:long, name:string)[1, 'a', 2, 'b', 3, 'c', 4, 'd']) on id
    | graph-match (x)-[e1]->(y)-[e2]->(z)
      where e1.w > 4
      project xn = x.name, yn = y.name, zn = z.name, tw = e1.w + e2.w
    | sort by xn asc, yn asc, zn asc""",
    """WITH e(src, dst, w) AS (VALUES (1, 2, 10), (2, 3, 20), (1, 3, 5), (3, 4, 1)),
         n(id, nm) AS (VALUES (1, 'a'), (2, 'b'), (3, 'c'), (4, 'd'))
       SELECT nx.nm AS xn, ny.nm AS yn, nz.nm AS zn,
              CAST(e1.w + e2.w AS BIGINT) AS tw
       FROM e e1 JOIN e e2 ON e1.dst = e2.src
       JOIN n nx ON nx.id = e1.src
       JOIN n ny ON ny.id = e1.dst
       JOIN n nz ON nz.id = e2.dst
       WHERE e1.w > 4 ORDER BY 1, 2, 3""",
)

q(
    "graph_match_cycle",
    # repeated node variable closes the pattern into a cycle (equality
    # filter, not a new join); implicit nodes from edge endpoints
    """datatable(src:string, dst:string)['x', 'y', 'y', 'x', 'y', 'z']
    | make-graph src --> dst
    | graph-match (a)-[e1]->(b)-[e2]->(a)
      project n1 = a.node_id, n2 = b.node_id
    | sort by n1 asc""",
    """WITH e(src, dst) AS (VALUES ('x', 'y'), ('y', 'x'), ('y', 'z'))
       SELECT e1.src AS n1, e1.dst AS n2
       FROM e e1 JOIN e e2 ON e1.dst = e2.src AND e2.dst = e1.src
       ORDER BY 1""",
)

q(
    "graph_match_varlen",
    # bounded variable-length edge: reachability in 1..3 hops, edge var
    # binds the path (array of edge structs)
    """datatable(src:string, dst:string)['x', 'y', 'y', 'z', 'z', 'w', 'w', 'v']
    | make-graph src --> dst
    | graph-match (a)-[e*1..3]->(b)
      where a.node_id == 'x'
      project target = b.node_id, hops = tolong(array_length(e))
    | sort by hops asc""",
    """WITH RECURSIVE e(src, dst) AS (VALUES ('x','y'),('y','z'),('z','w'),('w','v')),
         walk(target, hops) AS (
           SELECT dst, 1 FROM e WHERE src = 'x'
           UNION ALL
           SELECT e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.target
           WHERE w.hops < 3)
       SELECT target, CAST(hops AS BIGINT) AS hops FROM walk ORDER BY hops""",
)

q(
    "graph_shortest_paths",
    # bounded BFS: minimal hop count per (source, target) pair; the length-3
    # detour x->q->r->z must lose to the two 2-hop paths, and output=any
    # keeps exactly one row per pair
    """datatable(src:string, dst:string)['x','y1','x','y2','y1','z','y2','z','z','w','x','q','q','r','r','z']
    | make-graph src --> dst
    | graph-shortest-paths (a)-[e*1..5]->(b)
      where a.node_id == 'x'
      project target = b.node_id, hops = tolong(array_length(e))
    | sort by target asc""",
    """WITH RECURSIVE e(src, dst) AS (VALUES ('x','y1'),('x','y2'),('y1','z'),
           ('y2','z'),('z','w'),('x','q'),('q','r'),('r','z')),
         walk(target, hops) AS (
           SELECT dst, 1 FROM e WHERE src = 'x'
           UNION ALL
           SELECT e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.target
           WHERE w.hops < 5)
       SELECT target, CAST(MIN(hops) AS BIGINT) AS hops FROM walk
       GROUP BY target ORDER BY target""",
)

q(
    "graph_to_table_nodes",
    # graph context back to tabular form; implicit nodes = distinct endpoints
    """datatable(src:string, dst:string)['x','y', 'y','z', 'z','x']
    | make-graph src --> dst
    | graph-to-table nodes
    | sort by node_id asc""",
    """SELECT node_id FROM (
         SELECT src AS node_id FROM (VALUES ('x','y'),('y','z'),('z','x')) t(src, dst)
         UNION SELECT dst FROM (VALUES ('x','y'),('y','z'),('z','x')) t(src, dst)
       ) ORDER BY node_id""",
)

q(
    "let_materialize",
    # materialize(): both references share one evaluated (persisted) result
    """let agg = materialize(lineitem | summarize s = sum(l_quantity) by l_returnflag);
    agg
    | join kind=inner (agg | summarize mx = max(s)) on $left.s == $right.mx
    | project l_returnflag, s""",
    """WITH agg AS (SELECT l_returnflag, SUM(l_quantity) AS s
                    FROM lineitem GROUP BY 1)
       SELECT l_returnflag, s FROM agg WHERE s = (SELECT MAX(s) FROM agg)""",
)

q(
    "union_wildcard",
    """union withsource = src c*, s*
    | summarize n = count() by src
    | sort by src asc""",
    """SELECT 'customer' AS src, COUNT(*) AS n FROM customer
       UNION ALL SELECT 'supplier', COUNT(*) FROM supplier ORDER BY 1""",
)

q(
    "find_project_missing_cols",
    # find pads columns a table lacks with nulls (KQL union-schema rule)
    """find in (customer, supplier)
       where c_acctbal > 9000.0 or s_acctbal > 9000.0
       project c_custkey, s_suppkey
    | summarize n = count(), nc = countif(isnotnull(c_custkey)),
                ns = countif(isnotnull(s_suppkey))""",
    """WITH c AS (SELECT COUNT(*) AS n FROM customer WHERE c_acctbal > 9000.0),
         s AS (SELECT COUNT(*) AS n FROM supplier WHERE s_acctbal > 9000.0)
       SELECT c.n + s.n AS n, c.n AS nc, s.n AS ns FROM c, s""",
)

q(
    "top_nested_others",
    """orders
    | top-nested 2 of o_orderpriority with others = 'other' by s = sum(o_totalprice)
    | project o_orderpriority, s = round(s, 2)
    | sort by o_orderpriority asc""",
    """WITH g AS (SELECT o_orderpriority AS p, SUM(o_totalprice) AS s
                  FROM orders GROUP BY 1),
         r AS (SELECT p, s, ROW_NUMBER() OVER (ORDER BY s DESC) AS rn FROM g)
       SELECT CASE WHEN rn <= 2 THEN p ELSE 'other' END AS o_orderpriority,
              ROUND(SUM(s), 2) AS s
       FROM r GROUP BY 1 ORDER BY 1""",
)

q(
    "facet_counts",
    """lineitem
    | facet by l_returnflag, l_linestatus""",
    """SELECT 'l_returnflag' AS facet, CAST(l_returnflag AS VARCHAR) AS value,
              COUNT(*) AS count_ FROM lineitem GROUP BY 2
       UNION ALL
       SELECT 'l_linestatus', l_linestatus, COUNT(*) FROM lineitem GROUP BY 2""",
)

q(
    "facet_with_subquery",
    # subquery applies per distinct facet value (partition-by contract)
    """orders
    | facet by o_orderpriority with (summarize n = count(), mx = max(o_totalprice))
    | sort by o_orderpriority asc""",
    """SELECT o_orderpriority, COUNT(*) AS n, MAX(o_totalprice) AS mx
       FROM orders GROUP BY 1 ORDER BY 1""",
)

q(
    "evaluate_pivot",
    """events
    | project user_id, event_type
    | evaluate pivot(event_type, count())
    | where user_id < 50""",
    """SELECT user_id,
              NULLIF(COUNT(*) FILTER (WHERE event_type = 'click'), 0) AS click,
              NULLIF(COUNT(*) FILTER (WHERE event_type = 'error'), 0) AS error,
              NULLIF(COUNT(*) FILTER (WHERE event_type = 'purchase'), 0) AS purchase,
              NULLIF(COUNT(*) FILTER (WHERE event_type = 'signup'), 0) AS signup,
              NULLIF(COUNT(*) FILTER (WHERE event_type = 'view'), 0) AS view
       FROM events WHERE user_id < 50 GROUP BY user_id""",
)

q(
    "evaluate_narrow",
    """region
    | evaluate narrow()
    | project Column, Value""",
    """SELECT 'r_regionkey' AS Column, CAST(r_regionkey AS VARCHAR) AS Value FROM region
       UNION ALL SELECT 'r_name', r_name FROM region""",
)

q(
    "getschema_op",
    # the lineitem schema is a fixture constant (FIXTURES.md), so the twin
    # is the literal expected table — a real oracle, not a golden: any
    # scan-typing regression (e.g. timestamp unit drift) breaks the hash
    "lineitem | getschema",
    """SELECT * FROM (VALUES
         ('l_orderkey',      CAST(0  AS INTEGER), 'bigint',        'long'),
         ('l_partkey',       CAST(1  AS INTEGER), 'bigint',        'long'),
         ('l_suppkey',       CAST(2  AS INTEGER), 'bigint',        'long'),
         ('l_linenumber',    CAST(3  AS INTEGER), 'int',           'int'),
         ('l_quantity',      CAST(4  AS INTEGER), 'double',        'real'),
         ('l_extendedprice', CAST(5  AS INTEGER), 'double',        'real'),
         ('l_discount',      CAST(6  AS INTEGER), 'double',        'real'),
         ('l_tax',           CAST(7  AS INTEGER), 'double',        'real'),
         ('l_returnflag',    CAST(8  AS INTEGER), 'string',        'string'),
         ('l_linestatus',    CAST(9  AS INTEGER), 'string',        'string'),
         ('l_shipdate',      CAST(10 AS INTEGER), 'timestamp_ntz', 'datetime')
       ) AS t(ColumnName, ColumnOrdinal, DataType, ColumnType)""",
)

q(
    "datatable_literal",
    """datatable(a:long, s:string, d:datetime, b:bool, r:real)
      [1, 'x', datetime(2024-01-01), true, 1.5,
       2, 'y', datetime(2024-02-01 12:30:00), false, -2.5]
    | extend dd = dayofmonth(d)""",
    """SELECT * FROM (VALUES
         (CAST(1 AS BIGINT), 'x', TIMESTAMP '2024-01-01', true, 1.5, CAST(1 AS BIGINT)),
         (2, 'y', TIMESTAMP '2024-02-01 12:30:00', false, -2.5, 1)
       ) AS t(a, s, d, b, r, dd)""",
)

q(
    "tpch_q3",
    """customer
    | where c_mktsegment == 'BUILDING'
    | join kind=inner (orders | where o_orderdate < datetime(1996-03-15))
        on $left.c_custkey == $right.o_custkey
    | join kind=inner (lineitem | where l_shipdate > datetime(1996-03-15))
        on $left.o_orderkey == $right.l_orderkey
    | summarize revenue = round(sum(l_extendedprice * (1.0 - l_discount)), 2)
      by o_orderkey, o_orderdate
    | sort by revenue desc, o_orderkey asc
    | take 10""",
    """SELECT o_orderkey, o_orderdate,
              ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON o_orderkey = l_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1996-03-15'
         AND l_shipdate > TIMESTAMP '1996-03-15'
       GROUP BY o_orderkey, o_orderdate
       ORDER BY revenue DESC, o_orderkey LIMIT 10""",
)

# bench set (BASELINE.md B1-B10) -> corpus names
BENCH_QUERIES: dict[str, str] = {
    "b1_tpch_q1": "tpch_q1",
    "b2_tpch_q6": "tpch_q6",
    "b3_tpch_q3": "tpch_q3",
    "b4_tpch_q5": "tpch_q5_multijoin",
    "b5_argmax_group": "arg_max_agg",
    "b6_bin_1h": "summarize_bin_1h_value",
    "b7_json_extract": "extractjson_props",
    "b8_agg_dcount": "agg_sweep",
    "b9_make_series": "make_series_datetime",
    "b10_has_scan": "has_term",
    # round 8: the two heaviest TPC-H ports join the bench — fact
    # self-aggregation + 3 joins (q18) and 4-way join + top-k (q10)
    "b11_tpch_q18": "tpch_q18",
    "b12_tpch_q10": "tpch_q10",
}


# ---------------------------------------------------- §2.12 LLM-pipeline ops
q(
    "llm_dedup_exact",
    """documents
    | evaluate dedup_exact(lang, source)
    | summarize n = count()""",
    """SELECT COUNT(*) AS n FROM (SELECT DISTINCT lang, source FROM documents)""",
)

q(
    "llm_take_stratified",
    # round 11: deterministic balanced subsampling — at most N rows per
    # stratum, ranked by a portable LCG mix of the id (pure BIGINT
    # arithmetic, so the DuckDB twin reproduces the EXACT sample)
    """events
    | evaluate take_stratified(event_type, 40, event_id)
    | summarize n = count(), s = sum(event_id) by event_type
    | sort by event_type asc""",
    """WITH r AS (
         SELECT event_type, event_id,
                ROW_NUMBER() OVER (PARTITION BY event_type
                  ORDER BY ((event_id % 2147483648) * 1103515245 + 12345)
                             % 2147483648,
                           event_id) AS rn
         FROM events)
       SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(event_id) AS BIGINT) AS s
       FROM r WHERE rn <= 40 GROUP BY event_type ORDER BY event_type""",
)

q(
    "llm_ngram_stats",
    # round 11: corpus-wide top-k bigram frequency over documents —
    # count desc + ngram asc is a total order, so the cut is exact
    """documents
    | evaluate ngram_stats(text, 2, 25)""",
    r"""WITH w AS (SELECT list_filter(string_split_regex(lower(text), '\s+'),
                    x -> x <> '') AS ws FROM documents),
         g AS (SELECT unnest(list_transform(range(1, len(ws)),
                    i -> array_to_string(ws[i:i+1], ' '))) AS ngram
               FROM w WHERE len(ws) >= 2)
       SELECT ngram, COUNT(*) AS ngram_count FROM g GROUP BY ngram
       ORDER BY ngram_count DESC, ngram LIMIT 25""",
)

q(
    "llm_dedup_simhash",
    # deterministic: xxhash64-based simhash; docs 1/2/4 are near-identical
    # (one word differs / exact dup), doc 3 is unrelated
    """datatable(id:long, t:string)[
       1, 'the quick brown fox jumps over the lazy dog and runs far away today',
       2, 'the quick brown fox jumps over the lazy dog and runs far away tonight',
       3, 'completely unrelated text about database query engines and spark plans',
       4, 'the quick brown fox jumps over the lazy dog and runs far away today']
    | evaluate dedup_simhash(t, id, 6)
    | summarize n = count(), kept_min = min(id), kept_max = max(id)""",
    """SELECT CAST(2 AS BIGINT) AS n, CAST(1 AS BIGINT) AS kept_min,
              CAST(3 AS BIGINT) AS kept_max""",
)

q(
    "llm_fingerprint",
    # 64-bit content fingerprint must be a bijection onto distinct texts
    # (collision probability ~0 at fixture scale); fp_min is the winnowing
    # representative and can only merge docs, never split them
    """documents
    | evaluate fingerprint(text)
    | summarize n = count(), d_fp = count_distinct(fp), d_min = count_distinct(fp_min)
    | project n, d_fp, coarser = d_min <= d_fp""",
    """SELECT COUNT(*) AS n, COUNT(DISTINCT text) AS d_fp, true AS coarser
       FROM documents""",
)

q(
    "llm_lang_detect",
    # mechanics oracle: total coverage, closed label set (the synthetic
    # fixture's vocabulary is language-neutral, so accuracy vs the `lang`
    # column is not testable here — the heuristic contract is)
    """documents
    | evaluate lang_detect(text)
    | summarize total = count(),
                labeled = countif(isnotempty(detected_lang)),
                inset = countif(detected_lang in ('en', 'de', 'fr', 'es', 'zh', 'other'))
    | project ok_all_labeled = total == labeled, ok_closed_set = total == inset""",
    """SELECT true AS ok_all_labeled, true AS ok_closed_set""",
)

q(
    "llm_text_stats",
    """documents
    | evaluate text_stats(text)
    | project doc_id, ts_chars, ts_words, ts_avg_word_len, ts_alpha_ratio""",
    r"""WITH t AS (
         SELECT doc_id, text,
                list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '') AS toks
         FROM documents)
       SELECT doc_id, LENGTH(text) AS ts_chars,
              CAST(len(toks) AS BIGINT) AS ts_words,
              ROUND(CAST(list_sum(list_transform(toks, x -> LENGTH(x))) AS DOUBLE)
                    / GREATEST(len(toks), 1), 4) AS ts_avg_word_len,
              ROUND(CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                    / GREATEST(LENGTH(text), 1), 4) AS ts_alpha_ratio
       FROM t""",
)

q(
    "llm_tokenize",
    """documents
    | evaluate tokenize(text)
    | project doc_id, ntok = tolong(array_length(tokens)), first_tok = tokens[0]""",
    r"""WITH t AS (
         SELECT doc_id,
                list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '') AS toks
         FROM documents)
       SELECT doc_id, CAST(len(toks) AS BIGINT) AS ntok, toks[1] AS first_tok
       FROM t""",
)

q(
    "llm_tfidf_topk",
    """documents
    | evaluate tfidf_topk(text, doc_id, 3)
    | project doc_id, top_terms = strcat_array(top_terms, '|')""",
    r"""WITH toks AS (
         SELECT doc_id,
                unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                   t -> t <> '')) AS term
         FROM documents),
       tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
       dft AS (SELECT term, COUNT(*) AS dfr
               FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1),
       n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
       sc AS (SELECT doc_id, term, tf * ln(n.n / dfr) AS score
              FROM tf JOIN dft USING (term) CROSS JOIN n),
       rk AS (SELECT doc_id, term,
                     ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, term) AS rn
              FROM sc)
       SELECT doc_id, array_to_string(list(term ORDER BY rn), '|') AS top_terms
       FROM rk WHERE rn <= 3 GROUP BY doc_id""",
)

_QVEC = "[0.05425,0.105594,-0.037544,-0.252478,0.19969,-0.097039,-0.078031,-0.014797,0.163755,0.027956,0.040269,-0.028215,-0.192553,-0.069572,-0.026978,-0.032001,-0.022106,0.084172,0.006909,0.119693,-0.245103,-0.167462,0.15094,-0.049542,-0.076805,0.294556,0.076402,-0.075097,0.031133,0.224788,0.111507,0.269965,-0.169972,-0.256706,0.007775,-0.03472,-0.008654,0.022719,0.012217,0.043055,0.085207,-0.013976,-0.144771,-0.036479,0.02464,0.108901,0.062057,-0.137374,0.143419,-0.12813,0.02091,0.241185,0.078125,-0.125382,0.054494,0.006351,0.046549,0.038426,-0.175942,-0.12576,-0.054357,0.011889,0.105388,-0.258038]"

q(
    "llm_similarity_search",
    f"""embeddings
    | evaluate similarity_search(embedding, dynamic({_QVEC}), 10)
    | project vec_id, s = round(sim, 6)""",
    f"""WITH qv AS (SELECT unnest(CAST({_QVEC} AS DOUBLE[])) AS qa,
                          generate_subscripts(CAST({_QVEC} AS DOUBLE[]), 1) AS i),
         ev AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings),
         d AS (SELECT vec_id, SUM(x * qa) AS dot, SUM(x * x) AS nx, SUM(qa * qa) AS nq
               FROM ev JOIN qv USING (i) GROUP BY vec_id)
       SELECT vec_id, ROUND(dot / (SQRT(nx) * SQRT(nq)), 6) AS s
       FROM d ORDER BY dot / (SQRT(nx) * SQRT(nq)) DESC LIMIT 10""",
)

q(
    "llm_similarity_ivf_full_probe",
    # nprobe == nlist probes every partition -> IVF must equal brute force
    # exactly, so the brute-force SQL twin certifies the whole path
    f"""embeddings
    | evaluate similarity_search_ivf(embedding, dynamic({_QVEC}), 10, 8, 8)
    | project vec_id, s = round(sim, 6)""",
    f"""WITH qv AS (SELECT unnest(CAST({_QVEC} AS DOUBLE[])) AS qa,
                          generate_subscripts(CAST({_QVEC} AS DOUBLE[]), 1) AS i),
         ev AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings),
         d AS (SELECT vec_id, SUM(x * qa) AS dot, SUM(x * x) AS nx, SUM(qa * qa) AS nq
               FROM ev JOIN qv USING (i) GROUP BY vec_id)
       SELECT vec_id, ROUND(dot / (SQRT(nx) * SQRT(nq)), 6) AS s
       FROM d ORDER BY dot / (SQRT(nx) * SQRT(nq)) DESC LIMIT 10""",
)

q(
    "llm_similarity_ivfpq_full_probe",
    # nprobe == nlist and k*rerank >= corpus size: candidate generation
    # cannot lose a true neighbor and the exact re-rank makes the result
    # equal brute force, so the brute-force SQL twin certifies the whole
    # encode -> ADC -> re-rank path
    f"""embeddings
    | evaluate similarity_search_ivfpq(embedding, vec_id, dynamic({_QVEC}), 10, 8, 8, 8, 50)
    | project vec_id, s = round(sim, 6)""",
    f"""WITH qv AS (SELECT unnest(CAST({_QVEC} AS DOUBLE[])) AS qa,
                          generate_subscripts(CAST({_QVEC} AS DOUBLE[]), 1) AS i),
         ev AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings),
         d AS (SELECT vec_id, SUM(x * qa) AS dot, SUM(x * x) AS nx, SUM(qa * qa) AS nq
               FROM ev JOIN qv USING (i) GROUP BY vec_id)
       SELECT vec_id, ROUND(dot / (SQRT(nx) * SQRT(nq)), 6) AS s
       FROM d ORDER BY dot / (SQRT(nx) * SQRT(nq)) DESC LIMIT 10""",
)

q(
    "llm_ann_index_persisted",
    # round 12: build the IVF+PQ index to parquet, then query THROUGH the
    # persisted index (no KMeans refit, no re-encode). Full probe
    # (nprobe == nlist, k*rerank >= corpus) + exact re-rank == brute
    # force, so the same brute-force twin certifies the persisted path;
    # idx_rows pins the staleness-guard count. extend BEFORE the evaluate
    # forces the eager toscalar build to run before the index is read.
    f"""let built = toscalar(embeddings
        | evaluate ann_index_build(embedding, vec_id, '/root/repo/spark-warehouse/ann_idx_corpus', 8, 8)
        | project rows);
    embeddings
    | extend idx_rows = tolong(built)
    | evaluate similarity_search_ivfpq(embedding, vec_id, dynamic({_QVEC}), 10, 8, 8, 8, 50, '/root/repo/spark-warehouse/ann_idx_corpus')
    | project vec_id, s = round(sim, 6), idx_rows""",
    f"""WITH qv AS (SELECT unnest(CAST({_QVEC} AS DOUBLE[])) AS qa,
                          generate_subscripts(CAST({_QVEC} AS DOUBLE[]), 1) AS i),
         ev AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings),
         d AS (SELECT vec_id, SUM(x * qa) AS dot, SUM(x * x) AS nx, SUM(qa * qa) AS nq
               FROM ev JOIN qv USING (i) GROUP BY vec_id),
         n AS (SELECT COUNT(*) AS idx_rows FROM embeddings
               WHERE embedding IS NOT NULL AND len(embedding) = 64
                 AND len(list_filter(embedding, x -> x <> 0)) > 0)
       SELECT vec_id, ROUND(dot / (SQRT(nx) * SQRT(nq)), 6) AS s,
              (SELECT idx_rows FROM n) AS idx_rows
       FROM d ORDER BY dot / (SQRT(nx) * SQRT(nq)) DESC LIMIT 10""",
)

q(
    "llm_dedup_near",
    # round 9: the banded candidate stage is probabilistic but the VERIFY
    # is exact Jaccard on token 3-shingles, so a DuckDB brute-force twin
    # (all pairs, exact Jaccard >= 0.8, min-id transitive components)
    # certifies the whole path — any banding recall loss on the fixture
    # would hash-mismatch. Shingle identity mirrors _jaccard_feature_udf
    # mode='token': lowercased \\s+ tokens, 3-token shingles, docs with
    # < 3 tokens collapse to a single whole-text shingle (nulls -> empty).
    """documents
    | evaluate dedup_near(text, doc_id, 0.8)
    | summarize n = count()""",
    r"""WITH RECURSIVE docs AS (
         SELECT doc_id AS id,
                list_filter(string_split_regex(
                    lower(COALESCE(CAST(text AS VARCHAR), ' ')), '\s+'),
                    x -> x <> '') AS toks
         FROM documents
       ),
       sh AS (
         SELECT id,
                CASE WHEN len(toks) >= 3
                     THEN list_distinct(list_transform(range(1, len(toks) - 1),
                          i -> hash(toks[i] || chr(31) || toks[i+1]
                                    || chr(31) || toks[i+2])))
                     ELSE [hash(array_to_string(toks, chr(31)))] END AS g
         FROM docs
       ),
       sized AS (SELECT id, g, len(g) AS sz FROM sh),
       pairs AS (
         SELECT a.id AS src, b.id AS dst
         FROM sized a JOIN sized b
           ON a.id < b.id
          AND LEAST(a.sz, b.sz) >= 0.8 * GREATEST(a.sz, b.sz)
          AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
              / len(list_distinct(list_concat(a.g, b.g))) >= 0.8
       ),
       edges AS (SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs),
       reach AS (
         SELECT id AS node, id AS r FROM sh
         UNION
         SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
       )
       SELECT CAST(COUNT(*) AS BIGINT) AS n
       FROM (SELECT node FROM reach GROUP BY node HAVING MIN(r) = node)""",
)

q(
    "llm_similarity_join_cliques",
    # round 15: certifies the distinct-vector decomposition's two paths
    # on planted duplicate cliques — (1,2) identical raw vectors and
    # (4,5) identical AFTER normalization (different magnitudes), plus
    # the cross-clique expansion (1,3)/(2,3). Engine intra-clique sims
    # come from the representative's self-dot; the oracle computes every
    # pairwise dot from the literals with the same left-to-right float
    # order, so sims hash-match exactly.
    """datatable(id:long, e:dynamic)[
        1, dynamic([1.0, 0.0, 0.0]), 2, dynamic([1.0, 0.0, 0.0]),
        3, dynamic([0.9, 0.1, 0.0]), 4, dynamic([0.0, 1.0, 0.0]),
        5, dynamic([0.0, 2.0, 0.0]), 6, dynamic([0.0, 0.0, 1.0])]
    | evaluate similarity_join(e, id, 0.9)
    | project left_id, right_id, sim
    | sort by left_id asc, right_id asc""",
    """WITH v(id, x, y, z) AS (VALUES
         (1, 1.0, 0.0, 0.0), (2, 1.0, 0.0, 0.0), (3, 0.9, 0.1, 0.0),
         (4, 0.0, 1.0, 0.0), (5, 0.0, 2.0, 0.0), (6, 0.0, 0.0, 1.0)),
       u AS (SELECT id, x / sqrt(x*x + y*y + z*z) AS x,
                    y / sqrt(x*x + y*y + z*z) AS y,
                    z / sqrt(x*x + y*y + z*z) AS z
             FROM v)
       SELECT CAST(a.id AS BIGINT) AS left_id,
              CAST(b.id AS BIGINT) AS right_id,
              ROUND(a.x*b.x + a.y*b.y + a.z*b.z, 6) AS sim
       FROM u a JOIN u b ON a.id < b.id
       WHERE a.x*b.x + a.y*b.y + a.z*b.z >= 0.9
       ORDER BY a.id, b.id""",
)

q(
    "llm_dedup_clusters",
    # round 15: dedup_near's LABELING form — every row keeps its near-dup
    # component's min-id canonical as cluster_id. Certified PER ROW (500
    # labels hash-compared), which is strictly stronger than the survivor
    # count: any banding recall loss, collapse mistake or label-join slip
    # on the fixture hash-mismatches. The oracle reuses llm_dedup_near's
    # brute-force recursive-CTE algebra (all pairs, exact Jaccard >= 0.8,
    # transitive min-id reachability) and emits the per-node minimum.
    """documents
    | evaluate dedup_clusters(text, doc_id, 0.8)
    | project doc_id, cluster_id, is_canonical""",
    r"""WITH RECURSIVE docs AS (
         SELECT doc_id AS id,
                list_filter(string_split_regex(
                    lower(COALESCE(CAST(text AS VARCHAR), ' ')), '\s+'),
                    x -> x <> '') AS toks
         FROM documents
       ),
       sh AS (
         SELECT id,
                CASE WHEN len(toks) >= 3
                     THEN list_distinct(list_transform(range(1, len(toks) - 1),
                          i -> hash(toks[i] || chr(31) || toks[i+1]
                                    || chr(31) || toks[i+2])))
                     ELSE [hash(array_to_string(toks, chr(31)))] END AS g
         FROM docs
       ),
       sized AS (SELECT id, g, len(g) AS sz FROM sh),
       pairs AS (
         SELECT a.id AS src, b.id AS dst
         FROM sized a JOIN sized b
           ON a.id < b.id
          AND LEAST(a.sz, b.sz) >= 0.8 * GREATEST(a.sz, b.sz)
          AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
              / len(list_distinct(list_concat(a.g, b.g))) >= 0.8
       ),
       edges AS (SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs),
       reach AS (
         SELECT id AS node, id AS r FROM sh
         UNION
         SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
       )
       SELECT node AS doc_id, MIN(r) AS cluster_id,
              node = MIN(r) AS is_canonical
       FROM reach GROUP BY node""",
)

q(
    "llm_dedup_against",
    # round 13: CROSS-corpus near-dedup — planted synthetic docs: 9001 is
    # an exact copy of the reference (jaccard 1, dropped), 9002 differs in
    # its last token (5 of 7 distinct 3-shingles shared, jaccard 5/7 <
    # 0.8, survives), 9003 is novel. The oracle rebuilds the exact
    # token-3-shingle jaccard algebra on strings (the banded candidate
    # stage is probabilistic, the verify is exact — same standard as
    # llm_dedup_near's twin).
    """let refc = datatable(rid:long, rtext:string)[
        100, 'alpha beta gamma delta epsilon zeta eta theta'];
    union (documents | project doc_id, text),
          (datatable(doc_id:long, text:string)[
             9001, 'alpha beta gamma delta epsilon zeta eta theta',
             9002, 'alpha beta gamma delta epsilon zeta eta nine',
             9003, 'wholly novel words xylophone quasar bumblebee here now'])
    | evaluate dedup_against(text, doc_id, refc, rtext, 0.8)
    | summarize n = count(), s9001 = countif(doc_id == 9001),
                s9002 = countif(doc_id == 9002), s9003 = countif(doc_id == 9003)""",
    r"""WITH inp AS (
         SELECT doc_id, CAST(text AS VARCHAR) AS text FROM documents
         UNION ALL
         SELECT * FROM (VALUES
           (9001, 'alpha beta gamma delta epsilon zeta eta theta'),
           (9002, 'alpha beta gamma delta epsilon zeta eta nine'),
           (9003, 'wholly novel words xylophone quasar bumblebee here now')
         ) v(doc_id, text)
       ), tok AS (
         SELECT doc_id,
                list_filter(string_split_regex(
                    lower(COALESCE(text, ' ')), '\s+'), x -> x <> '') AS t
         FROM inp
       ), sh AS (
         SELECT doc_id,
                CASE WHEN len(t) >= 3
                     THEN list_distinct(list_transform(range(1, len(t) - 1),
                          i -> t[i] || chr(31) || t[i+1] || chr(31) || t[i+2]))
                     ELSE [array_to_string(t, chr(31))] END AS g
         FROM tok
       ), ref AS (
         SELECT CASE WHEN len(rt) >= 3
                     THEN list_distinct(list_transform(range(1, len(rt) - 1),
                          i -> rt[i] || chr(31) || rt[i+1] || chr(31) || rt[i+2]))
                     ELSE [array_to_string(rt, chr(31))] END AS rg
         FROM (SELECT list_filter(string_split_regex(
                   lower('alpha beta gamma delta epsilon zeta eta theta'),
                   '\s+'), x -> x <> '') AS rt)
       ), surv AS (
         SELECT doc_id FROM sh, ref
         WHERE CAST(len(list_intersect(g, rg)) AS DOUBLE)
               / len(list_distinct(list_concat(g, rg))) < 0.8
       )
       SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(COUNT(*) FILTER (WHERE doc_id = 9001) AS BIGINT) AS s9001,
              CAST(COUNT(*) FILTER (WHERE doc_id = 9002) AS BIGINT) AS s9002,
              CAST(COUNT(*) FILTER (WHERE doc_id = 9003) AS BIGINT) AS s9003
       FROM surv""",
)

q(
    "llm_minhash_index_persisted",
    # round 12: persist dedup_near's signature stage (minhash_index_build)
    # and dedup THROUGH the index — the signature kernel is deterministic
    # (fixed seeds), so the brute-force recursive-CTE twin that certifies
    # llm_dedup_near certifies the persisted path identically; idx_rows
    # pins the staleness-guard count. extend BEFORE the evaluate forces
    # the eager toscalar build to run before the index is read.
    """let built = toscalar(documents
        | evaluate minhash_index_build(text, doc_id, '/root/repo/spark-warehouse/mh_idx_corpus', 0.8)
        | project rows);
    documents
    | extend idx_built = tolong(built)
    | evaluate dedup_near(text, doc_id, 0.8, '/root/repo/spark-warehouse/mh_idx_corpus')
    | summarize n = count(), idx_rows = max(idx_built)""",
    r"""WITH RECURSIVE docs AS (
         SELECT doc_id AS id,
                list_filter(string_split_regex(
                    lower(COALESCE(CAST(text AS VARCHAR), ' ')), '\s+'),
                    x -> x <> '') AS toks
         FROM documents
       ),
       sh AS (
         SELECT id,
                CASE WHEN len(toks) >= 3
                     THEN list_distinct(list_transform(range(1, len(toks) - 1),
                          i -> hash(toks[i] || chr(31) || toks[i+1]
                                    || chr(31) || toks[i+2])))
                     ELSE [hash(array_to_string(toks, chr(31)))] END AS g
         FROM docs
       ),
       sized AS (SELECT id, g, len(g) AS sz FROM sh),
       pairs AS (
         SELECT a.id AS src, b.id AS dst
         FROM sized a JOIN sized b
           ON a.id < b.id
          AND LEAST(a.sz, b.sz) >= 0.8 * GREATEST(a.sz, b.sz)
          AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
              / len(list_distinct(list_concat(a.g, b.g))) >= 0.8
       ),
       edges AS (SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs),
       reach AS (
         SELECT id AS node, id AS r FROM sh
         UNION
         SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
       )
       SELECT CAST(COUNT(*) AS BIGINT) AS n,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS idx_rows
       FROM (SELECT node FROM reach GROUP BY node HAVING MIN(r) = node)""",
)

q(
    "llm_similarity_join",
    # round 9: crafted vectors make the ideal pair set derivable by hand —
    # cos(v1, v2) = 0.999 / sqrt(0.999^2 + 0.04^2) ~= 0.9992 >= 0.9 is the
    # ONLY qualifying pair (v3 orthogonal, v4 at ~45 degrees). The oracle
    # COMPUTES the cosine from the same literals. The zero-pair sweep over
    # the embeddings fixture stays in pytest.
    """datatable(vid:long, e:dynamic)[
       1, dynamic([1.0, 0.0, 0.0]),
       2, dynamic([0.999, 0.04, 0.0]),
       3, dynamic([0.0, 1.0, 0.0]),
       4, dynamic([1.0, 1.0, 0.0])]
    | evaluate similarity_join(e, vid, 0.9)
    | project left_id, right_id, s = round(sim, 6)""",
    """SELECT CAST(1 AS BIGINT) AS left_id, CAST(2 AS BIGINT) AS right_id,
              ROUND(0.999 / SQRT(0.999 * 0.999 + 0.04 * 0.04), 6) AS s""",
)

q(
    "llm_dedup_embedding",
    # embedding-cosine near-dup removal (round 5); the fixture's random
    # vectors have no near-dups at 0.95, so the op must keep every row —
    # collapse behavior is pinned by the crafted-vector pytest cases
    """embeddings
    | evaluate dedup_embedding(embedding, vec_id, 0.95)
    | summarize n = count()""",
    """SELECT COUNT(*) AS n FROM embeddings""",
)

# ----------------------------------------- §2.8 mv-apply / §2.13 partition by
q(
    "mv_apply_agg",
    """events
    | project event_id, arr = pack_array(value, value + 1.0, value + 2.0)
    | mv-apply v = arr to typeof(real) on (summarize mx = max(v), c = count())
    | project event_id, mx, c""",
    """SELECT event_id, value + 2.0 AS mx, CAST(3 AS BIGINT) AS c FROM events""",
)

q(
    "mv_apply_where",
    """events
    | project event_id, arr = pack_array(1, 2, 3, 4)
    | mv-apply v = arr to typeof(long) on (where v % 2 == 0)
    | summarize n = count(), s = sum(v)""",
    """SELECT CAST(2 * COUNT(*) AS BIGINT) AS n, CAST(6 * COUNT(*) AS BIGINT) AS s
       FROM events""",
)

q(
    "partition_top_per_key",
    """orders
    | partition by o_orderpriority (top 2 by o_totalprice)
    | project o_orderpriority, o_orderkey, o_totalprice""",
    """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
         SELECT o_orderpriority, o_orderkey, o_totalprice,
                ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice DESC) AS rn
         FROM orders) WHERE rn <= 2""",
)

q(
    "partition_summarize",
    """events
    | partition by event_type (summarize n = count(), s = round(sum(value), 4))
    | sort by event_type asc""",
    """SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS s
       FROM events GROUP BY 1 ORDER BY 1""",
)

# --------------------------------------------------- §2.10 series_* functions
q(
    "series_arith",
    """print a = dynamic([1.0, 2.0, 3.0]), b = dynamic([4.0, 5.0, 6.0])
    | extend sadd = strcat_array(series_add(a, b), '|'),
             ssub = strcat_array(series_subtract(a, b), '|'),
             smul = strcat_array(series_multiply(a, b), '|'),
             sdiv = strcat_array(series_divide(a, b), '|'),
             ssum = series_sum(a)
    | project-away a, b""",
    """SELECT '5.0|7.0|9.0' AS sadd, '-3.0|-3.0|-3.0' AS ssub,
              '4.0|10.0|18.0' AS smul, '0.25|0.4|0.5' AS sdiv,
              6.0 AS ssum""",
)

q(
    "series_fill",
    """print a = dynamic([1.0, null, 3.0, null])
    | extend fc = tostring(series_fill_const(a, 0.0)), ff = tostring(series_fill_forward(a)),
             fb = tostring(series_fill_backward(a)), fl = tostring(series_fill_linear(a))
    | project-away a""",
    """SELECT '[1.0,0.0,3.0,0.0]' AS fc, '[1.0,1.0,3.0,3.0]' AS ff,
              '[1.0,3.0,3.0,null]' AS fb, '[1.0,2.0,3.0,3.0]' AS fl""",
)

q(
    "series_stats_fit",
    """print y = dynamic([1.0, 2.0, 3.0, 4.0])
    | extend st = series_stats_dynamic(y), ft = series_fit_line_dynamic(y)
    | project mn = todouble(st.min), mx = todouble(st.max),
              avg = todouble(st.avg),
              slope = round(todouble(ft.slope), 6),
              icpt = round(todouble(ft.interception), 6),
              rsq = round(todouble(ft.rsquare), 6)""",
    """SELECT 1.0 AS mn, 4.0 AS mx, 2.5 AS avg,
              1.0 AS slope, 1.0 AS icpt, 1.0 AS rsq""",
)

q(
    "series_fir_filter",
    """print a = dynamic([1.0, 2.0, 3.0, 4.0])
    | project f = strcat_array(series_fir(a, dynamic([1.0, 1.0]), true, false), '|')""",
    """SELECT '0.5|1.5|2.5|3.5' AS f""",
)

q(
    "series_outliers_tukey",
    """print y = dynamic([1.0, 2.0, 3.0, 4.0, 100.0])
    | project o = strcat_array(series_outliers(y), '|')""",
    """SELECT '0.0|0.0|0.0|0.0|46.5' AS o""",
)

q(
    "make_series_then_fit",
    """events
    | make-series c = count() on ts from datetime(2024-01-01) to datetime(2024-01-08) step 1d
    | extend ft = series_fit_line_dynamic(c)
    | project slope = round(todouble(ft.slope), 4)""",
    """WITH d AS (SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) dd,
                         COUNT(*) c
                  FROM events
                  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
                  GROUP BY 1),
         i AS (SELECT CAST(c AS DOUBLE) y,
                      CAST(date_diff('day', TIMESTAMP '2024-01-01', dd) AS DOUBLE) x
               FROM d)
       SELECT ROUND(regr_slope(y, x), 4) AS slope FROM i""",
)

q(
    "window_session",
    """datatable(t:datetime)[datetime(2024-01-01 00:00:00), datetime(2024-01-01 00:05:00),
                             datetime(2024-01-01 01:00:00), datetime(2024-01-01 01:02:00)]
    | sort by t asc
    | extend s = row_window_session(t, 1h, 10m)
    | project t, s""",
    """SELECT * FROM (VALUES
         (TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 00:00:00'),
         (TIMESTAMP '2024-01-01 00:05:00', TIMESTAMP '2024-01-01 00:00:00'),
         (TIMESTAMP '2024-01-01 01:00:00', TIMESTAMP '2024-01-01 01:00:00'),
         (TIMESTAMP '2024-01-01 01:02:00', TIMESTAMP '2024-01-01 01:00:00')
       ) AS v(t, s)""",
)

# --------------------------------------------- §2.11 streaming window twins
q(
    "hopping_window_batch",
    """events
    | summarize c = count() by w = hopping_window(ts, 2h, 1h)
    | project ws = w.start, c
    | sort by ws asc""",
    """SELECT ws, COUNT(*) AS c FROM (
         SELECT unnest([date_trunc('hour', CAST(ts AS TIMESTAMP)),
                        date_trunc('hour', CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR]) AS ws
         FROM events)
       GROUP BY ws ORDER BY ws""",
)

q(
    "session_window_batch",
    """events
    | where event_type == 'signup'
    | summarize c = count() by event_type, w = session_window(ts, 10m)
    | project event_type, ws = w.start, c
    | sort by ws asc""",
    """WITH o AS (SELECT event_type, CAST(ts AS TIMESTAMP) t FROM events
                  WHERE event_type = 'signup'),
         s AS (SELECT event_type, t,
                      CASE WHEN LAG(t) OVER (PARTITION BY event_type ORDER BY t) IS NULL
                                OR t - LAG(t) OVER (PARTITION BY event_type ORDER BY t)
                                   >= INTERVAL 10 MINUTE
                           THEN 1 ELSE 0 END AS brk
               FROM o),
         g AS (SELECT event_type, t,
                      SUM(brk) OVER (PARTITION BY event_type ORDER BY t) AS sid
               FROM s)
       SELECT event_type, MIN(t) AS ws, COUNT(*) AS c
       FROM g GROUP BY event_type, sid ORDER BY ws""",
)

# ------------------------------------------------- §2.4 theta / as-of joins
q(
    "join_theta_range",
    """nation
    | join kind=inner (region) on $left.n_regionkey == $right.r_regionkey
                                 and $left.n_nationkey > $right.r_regionkey
    | summarize n = count(), s = sum(n_nationkey)""",
    """SELECT COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS s
       FROM nation JOIN region
       ON n_regionkey = r_regionkey AND n_nationkey > r_regionkey""",
)

q(
    "join_pure_theta",
    """orders
    | where o_orderkey <= 200
    | project k1 = o_orderkey
    | join kind=inner (orders | where o_orderkey <= 200 | project k2 = o_orderkey)
        on $left.k1 < $right.k2
    | summarize n = count(), s = sum(k1 + k2)""",
    """SELECT COUNT(*) AS n, CAST(SUM(k1 + k2) AS BIGINT) AS s FROM
         (SELECT o_orderkey AS k1 FROM orders WHERE o_orderkey <= 200) a
       JOIN (SELECT o_orderkey AS k2 FROM orders WHERE o_orderkey <= 200) b
       ON k1 < k2""",
)

q(
    "join_asof_window",
    """events
    | project event_id, ts
    | join kind=inner (events | summarize by d = bin(ts, 1d)
                       | project lo = d, hi = datetime_add('day', 1, d))
        on $left.ts >= $right.lo and $left.ts < $right.hi
    | summarize n = count(), days = dcount(lo)""",
    """SELECT COUNT(*) AS n,
              COUNT(DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP))) AS days
       FROM events""",
)

# --------------------------------------------------- §2.2/§2.14 invoke / let
q(
    "invoke_tabular_lambda",
    """let big_orders = (t:(*), cutoff:real) {
        t | where o_totalprice > cutoff | summarize n = count(), mx = max(o_totalprice)
    };
    orders | invoke big_orders(400000.0)""",
    """SELECT COUNT(*) AS n, MAX(o_totalprice) AS mx
       FROM orders WHERE o_totalprice > 400000.0""",
)

q(
    "let_scalar_inline",
    """let threshold = 30.0;
    let discounted = (p:real, d:real) { p * (1.0 - d) };
    lineitem
    | where l_quantity > threshold
    | summarize rev = round(sum(discounted(l_extendedprice, l_discount)), 2)""",
    """SELECT ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS rev
       FROM lineitem WHERE l_quantity > 30.0""",
)

q(
    "percentilesw_stdevif",
    # round 5: weighted multi-percentiles (frequency weights == row
    # repetition, mirrored by UNNEST(generate_series)) + conditional
    # stdev/variance
    """lineitem
    | summarize p = percentilesw(l_quantity, l_linenumber, 25, 50, 75),
                sd = round(stdevif(l_extendedprice, l_discount > 0.05), 2),
                vr = round(varianceif(l_extendedprice, l_discount > 0.05), 2)
      by l_returnflag
    | sort by l_returnflag asc""",
    """WITH expanded AS (
         SELECT l_returnflag, l_quantity FROM lineitem
         CROSS JOIN UNNEST(generate_series(1, CAST(l_linenumber AS BIGINT))) AS t(i)
       ),
       pw AS (
         SELECT l_returnflag,
                quantile_cont(l_quantity, 0.25) AS p,
                quantile_cont(l_quantity, 0.50) AS percentile_l_quantity_50,
                quantile_cont(l_quantity, 0.75) AS percentile_l_quantity_75
         FROM expanded GROUP BY 1),
       sd AS (
         SELECT l_returnflag,
                ROUND(stddev_samp(CASE WHEN l_discount > 0.05 THEN l_extendedprice END), 2) AS sd,
                ROUND(var_samp(CASE WHEN l_discount > 0.05 THEN l_extendedprice END), 2) AS vr
         FROM lineitem GROUP BY 1)
       SELECT pw.l_returnflag, p, percentile_l_quantity_50,
              percentile_l_quantity_75, sd, vr
       FROM pw JOIN sd USING (l_returnflag) ORDER BY 1""",
)

q(
    "tdigest_surrogate",
    # round 9: a KLL sketch is EXACT below its compaction capacity (~200
    # items at k=200), so quantiles over a 199-row series are not
    # approximate — the DuckDB discrete-quantile twin certifies the whole
    # sketch -> serialize -> read-out path. The big-data closeness contract
    # (lineitem-scale) stays asserted in pytest.
    """range x from 1 to 199 step 1
    | extend v = todouble(x)
    | summarize td = tdigest(v)
    | project p50 = percentile_tdigest(td, 50), p90 = percentile_tdigest(td, 90)""",
    """SELECT quantile_disc(x, 0.5) AS p50, quantile_disc(x, 0.9) AS p90
       FROM (SELECT CAST(v AS DOUBLE) AS x FROM generate_series(1, 199) t(v))""",
)

q(
    "tdigest_merge_rollup",
    # the mergeable-percentile rollup pattern: per-group sketches merged at
    # a second aggregation level, read out with single and array readers.
    # Sub-capacity sketches merge exactly (round 9), so the discrete
    # quantile over the union is the exact expected value.
    """range x from 1 to 300 step 1
    | extend g = iff(x <= 100, 'a', iff(x <= 200, 'b', 'c')), v = todouble(x)
    | summarize td = tdigest(v) by g
    | summarize merged = merge_tdigest(td)
    | extend ps = percentile_array_tdigest(merged, dynamic([25, 75]))
    | project p50 = percentile_tdigest(merged, 50),
              p25 = todouble(ps[0]), p75 = todouble(ps[1])""",
    """SELECT quantile_disc(x, 0.5) AS p50, quantile_disc(x, 0.25) AS p25,
              quantile_disc(x, 0.75) AS p75
       FROM (SELECT CAST(v AS DOUBLE) AS x FROM generate_series(1, 300) t(v))""",
)

# ----------------------------------------------- §2.13 find / fork / reduce
q(
    "find_multi_table",
    """find in (customer, supplier) where s_acctbal > 9000.0 or c_acctbal > 9000.0
    | summarize n = count() by source_
    | sort by source_ asc""",
    """SELECT * FROM (
         SELECT 'customer' AS source_, COUNT(*) AS n FROM customer
         WHERE c_acctbal > 9000.0 HAVING COUNT(*) > 0
         UNION ALL
         SELECT 'supplier', COUNT(*) FROM supplier
         WHERE s_acctbal > 9000.0 HAVING COUNT(*) > 0
       ) ORDER BY source_""",
)

q(
    "find_common_column",
    """find in (customer, supplier) where s_nationkey == 3 or c_nationkey == 3
    | summarize n = count() by source_""",
    """SELECT 'customer' AS source_, COUNT(*) AS n FROM customer
       WHERE c_nationkey = 3 HAVING COUNT(*) > 0
       UNION ALL
       SELECT 'supplier', COUNT(*) FROM supplier
       WHERE s_nationkey = 3 HAVING COUNT(*) > 0""",
)

q(
    "fork_branches",
    """events
    | fork hi = (where value > 100.0 | summarize n = count())
           lo = (where value <= 100.0 | summarize n = count())
    | sort by fork_result asc""",
    """SELECT COUNT(*) AS n, 'hi' AS fork_result FROM events WHERE value > 100.0
       UNION ALL
       SELECT COUNT(*), 'lo' FROM events WHERE value <= 100.0
       ORDER BY fork_result""",
)

q(
    "reduce_by_pattern",
    """customer
    | reduce by c_name
    | sort by Pattern asc""",
    """SELECT regexp_replace(c_name, '[0-9]+', '*', 'g') AS Pattern,
              COUNT(*) AS Count, MIN(c_name) AS Representative
       FROM customer GROUP BY 1 ORDER BY 1""",
)

# ------------------------------------- §2.11 scan / §2.14 python / auto axis
q(
    "scan_funnel",
    # round 9 twin: the 2-step machine reduces to a window identity over
    # the view/purchase sub-stream — a view is ALWAYS emitted (new seq or
    # extension), a purchase is emitted IFF the previous view/purchase
    # event holds step s1 (i.e. was a view), and a view STARTS a sequence
    # iff the previous view/purchase event was not a view (s1 vacant).
    # event_id added to the sort for a total order on both sides; dcount
    # -> count_distinct so the oracle is exact at any cardinality.
    """events
    | where user_id < 200
    | sort by user_id asc, ts asc, event_id asc
    | scan with_match_id = m declare (hits:long = 0) with (
        step s1: event_type == 'view' => hits = 1;
        step s2: event_type == 'purchase' => hits = 2;
    )
    | summarize rows = count(), matches = count_distinct(m)""",
    """WITH vp AS (
         SELECT event_type AS et,
                LAG(event_type) OVER (ORDER BY user_id, ts, event_id) AS prev
         FROM events
         WHERE user_id < 200 AND event_type IN ('view', 'purchase')
       )
       SELECT CAST(SUM(CASE WHEN et = 'view' THEN 1
                            WHEN et = 'purchase' AND prev = 'view' THEN 1
                            ELSE 0 END) AS BIGINT) AS rows,
              CAST(SUM(CASE WHEN et = 'view'
                             AND (prev IS NULL OR prev = 'purchase') THEN 1
                            ELSE 0 END) AS BIGINT) AS matches
       FROM vp""",
)

q(
    "basket_frequent_segments",
    # round 5: frequent (column=value) itemsets via FPGrowth; exact counts,
    # so the twin enumerates 1- and 2-item combos above the threshold.
    # SegmentId is projected away (tie order between equal counts is
    # implementation-defined).
    """events
    | project event_type, bucket = iff(value > 50.0, 'hi', 'lo')
    | evaluate basket(0.08)
    | project-away SegmentId""",
    """WITH base AS (SELECT event_type,
                            CASE WHEN value > 50.0 THEN 'hi' ELSE 'lo' END AS bucket
                     FROM events),
         n AS (SELECT COUNT(*) AS total FROM base),
         segs AS (SELECT event_type, CAST(NULL AS VARCHAR) AS bucket, COUNT(*) AS c
                  FROM base GROUP BY 1
                  UNION ALL
                  SELECT CAST(NULL AS VARCHAR), bucket, COUNT(*) FROM base GROUP BY 2
                  UNION ALL
                  SELECT event_type, bucket, COUNT(*) FROM base GROUP BY 1, 2)
       SELECT CAST(c AS BIGINT) AS Count,
              ROUND(c * 100.0 / total, 2) AS Percent, event_type, bucket
       FROM segs, n WHERE c >= 0.08 * total""",
)

q(
    "autocluster_segments",
    # Tier C approximation (Kusto's algorithm is unpublished), but on a
    # fixture with ONE dominant attribute combination the ideal answer is
    # forced: the (x, y) segment covers 8/10 rows. Filtering to the
    # majority segment makes the oracle independent of how the algorithm
    # ranks the sub-threshold singletons. The events-scale stability run
    # stays in pytest.
    """datatable(a:string, b:string)[
       'x', 'y', 'x', 'y', 'x', 'y', 'x', 'y',
       'x', 'y', 'x', 'y', 'x', 'y', 'x', 'y',
       'p', 'q', 'r', 's']
    | evaluate autocluster(0.6)
    | where Percent >= 50.0
    | project Count, Percent, a, b""",
    """SELECT CAST(8 AS BIGINT) AS Count, CAST(80.0 AS DOUBLE) AS Percent,
              'x' AS a, 'y' AS b""",
)

q(
    "activity_engagement_dau_wau",
    # round 5: DAU/WAU rolling engagement — exact lowering (bounded explode
    # into trailing windows + count_distinct), so the twin hash-matches
    """events
    | evaluate activity_engagement(user_id, ts, 1d, 7d)
    | sort by Timeline asc""",
    """WITH b AS (SELECT user_id,
                CAST(to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) * 86400) AS TIMESTAMP) AS d
         FROM events),
       inner_c AS (SELECT d, COUNT(DISTINCT user_id) AS i FROM b GROUP BY 1),
       spread AS (SELECT user_id, d + INTERVAL (k) DAY AS d
                  FROM b CROSS JOIN UNNEST(generate_series(0, 6)) AS t(k)),
       outer_c AS (SELECT d, COUNT(DISTINCT user_id) AS o FROM spread GROUP BY 1)
       SELECT inner_c.d AS Timeline,
              CAST(i AS BIGINT) AS dcount_activities_inner,
              CAST(o AS BIGINT) AS dcount_activities_outer,
              ROUND(CAST(i AS DOUBLE) / o, 4) AS activity_ratio
       FROM inner_c JOIN outer_c USING (d) ORDER BY 1""",
)

q(
    "new_activity_metrics_retention",
    # round 5: per-period new/retained/churned ids + rates; exact lowering
    # (first-activity groupBy + one self equi-join), hash-certified
    """events
    | evaluate new_activity_metrics(user_id, ts, 1d)
    | sort by Timeline asc""",
    """WITH pairs AS (SELECT DISTINCT user_id,
            CAST(to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) * 86400) AS TIMESTAMP) AS p
        FROM events),
     firsts AS (SELECT user_id, MIN(p) AS f FROM pairs GROUP BY 1),
     agg AS (
       SELECT p, COUNT(*) AS act,
              COUNT(*) FILTER (WHERE p = f) AS new,
              COUNT(*) FILTER (WHERE EXISTS (
                 SELECT 1 FROM pairs n
                 WHERE n.user_id = pairs.user_id
                   AND n.p = pairs.p + INTERVAL 1 DAY)) AS ret
       FROM pairs JOIN firsts USING (user_id) GROUP BY 1)
     SELECT p AS Timeline,
            CAST(act AS BIGINT) AS dcount_values,
            CAST(new AS BIGINT) AS dcount_new_values,
            CAST(ret AS BIGINT) AS dcount_retained_values,
            CAST(act - ret AS BIGINT) AS dcount_churn_values,
            ROUND(CAST(ret AS DOUBLE) / act, 4) AS retention_rate,
            ROUND(CAST(act - ret AS DOUBLE) / act, 4) AS churn_rate
     FROM agg ORDER BY 1""",
)

q(
    "active_users_count_rolling",
    # round 5: engaged-user counting — ids active in >= 3 distinct days
    # within the trailing 7-day window; exact lowering, hash-certified
    """events
    | evaluate active_users_count(user_id, ts, 7d, 1d, 3)
    | sort by Timeline asc""",
    """WITH pairs AS (SELECT DISTINCT user_id,
            CAST(to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) * 86400) AS TIMESTAMP) AS p
        FROM events),
     spread AS (SELECT user_id, p, p + INTERVAL (k) DAY AS d
                FROM pairs CROSS JOIN UNNEST(generate_series(0, 6)) AS t(k)),
     pu AS (SELECT d, user_id, COUNT(DISTINCT p) AS np FROM spread GROUP BY 1, 2)
     SELECT d AS Timeline, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dcount
     FROM pu WHERE np >= 3 GROUP BY 1 ORDER BY 1""",
)

q(
    "sequence_detect_funnel",
    # round 9 twin: for a 2-step sequence the latest-anchor machine
    # (std.py _sequence_detect) reduces to a window identity over each
    # user's view/purchase sub-stream — every view re-anchors, every
    # purchase consumes or clears the anchor, so a sequence completes IFF
    # a purchase's immediately-preceding view/purchase event is a view
    # within max_step (max_duration is redundant at n=2: t-t1 == t-t[-1]).
    """events
    | evaluate sequence_detect(ts, 12h, 2d,
        event_type == 'view', event_type == 'purchase', user_id)
    | summarize n = count(), users = count_distinct(user_id)""",
    """WITH vp AS (
         SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type AS et,
                LAG(event_type) OVER w AS prev,
                LAG(CAST(ts AS TIMESTAMP)) OVER w AS prev_ts
         FROM events WHERE event_type IN ('view', 'purchase')
         WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       )
       SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
       FROM vp
       WHERE et = 'purchase' AND prev = 'view'
         AND ts - prev_ts <= INTERVAL 12 HOUR""",
)

q(
    "scan_sharded_funnel",
    # partition-by-sharded scan: one state machine per user_id, parallel
    # across keys (applyInPandas). Round 9 twin: the same 2-step window
    # identity as scan_funnel, applied per user partition — views always
    # emit with hits=1, purchases emit with hits=2 iff the previous
    # view/purchase event in the user's stream was a view.
    """events
    | partition by user_id (
        sort by ts asc, event_id asc
        | scan declare (hits:long = 0) with (
            step s1: event_type == 'view' => hits = 1;
            step s2: event_type == 'purchase' => hits = 2;
        )
    )
    | summarize rows = count(), hs = sum(hits)""",
    """WITH vp AS (
         SELECT user_id, event_type AS et,
                LAG(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev
         FROM events WHERE event_type IN ('view', 'purchase')
       )
       SELECT CAST(SUM(CASE WHEN et = 'view' THEN 1
                            WHEN et = 'purchase' AND prev = 'view' THEN 1
                            ELSE 0 END) AS BIGINT) AS rows,
              CAST(SUM(CASE WHEN et = 'view' THEN 1
                            WHEN et = 'purchase' AND prev = 'view' THEN 2
                            ELSE 0 END) AS BIGINT) AS hs
       FROM vp""",
)

q(
    "scan_overlapping_matches",
    # Round-5 concurrent-sequence scan model: one active sequence per step,
    # promotion vacates the source step, completion discards. The DuckDB twin
    # is an exact recursive-CTE emulation of the same state machine (state =
    # (seq id at step1, seq id at step2, next id)), so rows/ids/hash must
    # match bit-for-bit, not just row counts.
    """events
    | where user_id < 20
    | sort by event_id asc
    | scan with_match_id = m with (
        step s1: event_type == 'view';
        step s2: event_type == 'click';
        step s3: event_type == 'purchase';
    )
    | summarize rows = count(), matches = count_distinct(m),
                completed = countif(event_type == 'purchase'),
                id_sum = sum(m)""",
    """
    WITH RECURSIVE ordered AS (
      SELECT ROW_NUMBER() OVER (ORDER BY event_id) AS i, event_type AS ev
      FROM events WHERE user_id < 20
    ),
    machine AS (
      SELECT CAST(0 AS BIGINT) AS i, CAST(NULL AS BIGINT) AS s1,
             CAST(NULL AS BIGINT) AS s2, CAST(0 AS BIGINT) AS nid,
             FALSE AS emitted, CAST(NULL AS BIGINT) AS mid,
             CAST(NULL AS VARCHAR) AS ev
      UNION ALL
      SELECT o.i,
             CASE WHEN o.ev = 'view' AND m.s1 IS NULL THEN m.nid
                  WHEN o.ev = 'click' AND m.s1 IS NOT NULL THEN NULL
                  ELSE m.s1 END AS s1,
             CASE WHEN o.ev = 'purchase' AND m.s2 IS NOT NULL THEN NULL
                  WHEN o.ev = 'click' AND m.s1 IS NOT NULL THEN m.s1
                  ELSE m.s2 END AS s2,
             CASE WHEN o.ev = 'view' AND m.s1 IS NULL THEN m.nid + 1
                  ELSE m.nid END AS nid,
             CASE WHEN o.ev = 'view' THEN TRUE
                  WHEN o.ev = 'click' THEN (m.s1 IS NOT NULL OR m.s2 IS NOT NULL)
                  WHEN o.ev = 'purchase' THEN (m.s2 IS NOT NULL)
                  ELSE FALSE END AS emitted,
             CASE WHEN o.ev = 'view' THEN COALESCE(m.s1, m.nid)
                  WHEN o.ev = 'click' THEN COALESCE(m.s1, m.s2)
                  WHEN o.ev = 'purchase' THEN m.s2
                  ELSE NULL END AS mid,
             o.ev AS ev
      FROM machine m JOIN ordered o ON o.i = m.i + 1
    )
    SELECT CAST(COUNT(*) FILTER (WHERE emitted) AS BIGINT) AS rows,
           CAST(COUNT(DISTINCT mid) AS BIGINT) AS matches,
           CAST(COUNT(*) FILTER (WHERE emitted AND ev = 'purchase') AS BIGINT) AS completed,
           CAST(SUM(mid) FILTER (WHERE emitted) AS BIGINT) AS id_sum
    FROM machine
    """,
)

q(
    "evaluate_python_plugin",
    """events
    | evaluate python(typeof(*, doubled:real), 'result = df.assign(doubled = df.value * 2)')
    | summarize s = round(sum(doubled), 2), n = count()""",
    """SELECT ROUND(SUM(value * 2), 2) AS s, COUNT(*) AS n FROM events""",
)

q(
    "make_series_auto_bounds",
    """events
    | make-series c = count() on ts step 1d
    | project n_bins = tolong(array_length(c)), total = series_sum(c)""",
    """SELECT CAST(date_diff('day', date_trunc('day', (SELECT MIN(CAST(ts AS TIMESTAMP)) FROM events)),
                             date_trunc('day', (SELECT MAX(CAST(ts AS TIMESTAMP)) FROM events))) + 1 AS BIGINT) AS n_bins,
              CAST((SELECT COUNT(*) FROM events) AS DOUBLE) AS total""",
)

q(
    "series_decompose_ops",
    """print y = dynamic([1.0, 5.0, 1.0, 5.0, 1.0, 5.0, 1.0, 50.0])
    | extend a = series_decompose_anomalies(y, 2, 1.5),
             s = series_decompose_seasonal(y, 2)
    | project a = strcat_array(a, '|'), s_first = todouble(s[0])""",
    # round 9 twin: the period-2 seasonal on [1,5,1,5,1,5,1,50] is exact by
    # hand — even positions average 1, series mean-of-period-means centers
    # the seasonal at -2/+2 (s[0] = 1 - 3 = -2); only the final 50 deviates
    # beyond 1.5 sigma of the residual, so the anomaly mask is 0^7,1.
    """SELECT '0.0|0.0|0.0|0.0|0.0|0.0|0.0|1.0' AS a,
              CAST(-2.0 AS DOUBLE) AS s_first""",
)

q(
    "series_periods_detect_fn",
    # period-8 sawtooth repeated 4x: ACF fundamental at lag 8
    """print y = dynamic([0.0, 1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0,
                          0.0, 1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0,
                          0.0, 1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0,
                          0.0, 1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0])
    | extend pd = series_periods_detect(y, 0.0, 12.0, 1)
    | project p = todouble(pd.periods[0]), strong = todouble(pd.scores[0]) > 0.5""",
    """SELECT 8.0 AS p, true AS strong""",
)

# ------------------------------------------- coverage sweep: scalar functions
q(
    "string_more_fns",
    """customer
    | project c_custkey, cnt = tolong(countof(c_name, '0')),
              cmp = toint(strcmp(c_mktsegment, 'BUILDING')),
              rep = strrep(c_mktsegment, 2),
              catd = strcat_delim('-', c_name, c_mktsegment),
              tr_ = trim('0', substring(c_name, 9)),
              idx2 = tolong(indexof(c_name, '0', 10))""",
    """SELECT c_custkey,
              LENGTH(c_name) - LENGTH(REPLACE(c_name, '0', '')) AS cnt,
              CASE WHEN c_mktsegment < 'BUILDING' THEN -1
                   WHEN c_mktsegment > 'BUILDING' THEN 1 ELSE 0 END AS cmp,
              REPEAT(c_mktsegment, 2) AS rep,
              c_name || '-' || c_mktsegment AS catd,
              regexp_replace(substr(c_name, 10), '^(?:0)+|(?:0)+$', '', 'g') AS tr_,
              CASE WHEN POSITION('0' IN substr(c_name, 11)) > 0
                   THEN POSITION('0' IN substr(c_name, 11)) - 1 + 10
                   ELSE -1 END AS idx2
       FROM customer""",
)

q(
    "hash_fns",
    """print h1 = hash_md5('abc'), h2 = hash_sha256('abc'),
             h3 = hash_sha1('abc')""",
    """SELECT md5('abc') AS h1, sha256('abc') AS h2,
              'a9993e364706816aba3e25717850c26c9cd0d89d' AS h3""",
)

q(
    "base64_url_fns",
    """print b = base64_encode_tostring('hello'), d = base64_decode_tostring('aGVsbG8='),
             u = url_encode('a b&c'), ud = url_decode('a%20b%26c')""",
    """SELECT 'aGVsbG8=' AS b, 'hello' AS d, 'a+b%26c' AS u, 'a b&c' AS ud""",
)

q(
    "extract_all_words",
    """part
    | project p_partkey, words = strcat_array(extract_all('([a-z]+)', p_name), '|')""",
    r"""SELECT p_partkey, array_to_string(regexp_extract_all(p_name, '([a-z]+)', 1), '|') AS words
       FROM part""",
)

q(
    "string_preds_more",
    """part
    | where (p_name hasprefix 'sm' or p_name hassuffix 'get')
        and p_brand in~ ('brand#1', 'BRAND#2', 'Brand#3')
    | summarize n = count() by p_brand
    | sort by p_brand asc""",
    r"""SELECT p_brand, COUNT(*) AS n FROM part
       WHERE (regexp_matches(p_name, '(?i)\bsm') OR regexp_matches(p_name, '(?i)get\b'))
         AND LOWER(p_brand) IN ('brand#1', 'brand#2', 'brand#3')
       GROUP BY p_brand ORDER BY p_brand""",
)

q(
    "has_any_matches",
    """part
    | where p_name has_any ('gear', 'bolt') and p_name matches '^[a-z]+ [a-z]+$'
    | summarize n = count()""",
    r"""SELECT COUNT(*) AS n FROM part
       WHERE (regexp_matches(p_name, '(?i)\bgear\b') OR regexp_matches(p_name, '(?i)\bbolt\b'))
         AND regexp_matches(p_name, '^[a-z]+ [a-z]+$')""",
)

q(
    "datetime_more_fns",
    """orders
    | where o_orderkey < 2000
    | project o_orderkey, dw = dayofweek(o_orderdate),
              wk = tolong(week_of_year(o_orderdate)),
              eod = endofday(o_orderdate), sow = startofweek(o_orderdate),
              fmt = format_datetime(o_orderdate, 'yyyy-MM-dd'),
              mk = make_datetime(2024, 2, 29, 12, 30, 45),
              un = unixtime_seconds_todatetime(1700000000)""",
    """SELECT o_orderkey,
              dayofweek(o_orderdate) * INTERVAL 1 DAY AS dw,
              weekofyear(o_orderdate) AS wk,
              CAST(date_trunc('day', o_orderdate) + INTERVAL 1 DAY
                   - INTERVAL 1 MICROSECOND AS TIMESTAMP) AS eod,
              CAST(date_trunc('day', o_orderdate)
                   - dayofweek(o_orderdate) * INTERVAL 1 DAY AS TIMESTAMP) AS sow,
              strftime(o_orderdate, '%Y-%m-%d') AS fmt,
              TIMESTAMP '2024-02-29 12:30:45' AS mk,
              TIMESTAMP '2023-11-14 22:13:20' AS un
       FROM orders WHERE o_orderkey < 2000""",
)

q(
    "math_more_fns",
    """print a = round(sin(1.0), 10), b = round(cos(1.0), 10),
             c = round(atan2(1.0, 2.0), 10), d = round(degrees(pi()), 6),
             e = round(radians(180.0), 10), f = exp2(10.0), g = exp10(3.0),
             i = round(log2(1024.0), 6), fin = isfinite(1.0)""",
    """SELECT ROUND(SIN(1.0), 10) AS a, ROUND(COS(1.0), 10) AS b,
              ROUND(ATAN2(1.0, 2.0), 10) AS c, 180.0 AS d,
              ROUND(PI(), 10) AS e, 1024.0 AS f, 1000.0 AS g,
              10.0 AS i, true AS fin""",
)

q(
    "ipv4_geo_fns",
    """print ip = parse_ipv4('192.168.1.10'), f4 = format_ipv4(3232235786),
             inr = ipv4_is_in_range('192.168.1.10', '192.168.1.0/24'),
             outr = ipv4_is_in_range('192.168.2.10', '192.168.1.0/24'),
             gd = round(geo_distance_2points(-122.4194, 37.7749, -73.9857, 40.7484), 0)""",
    """SELECT CAST(3232235786 AS BIGINT) AS ip, '192.168.1.10' AS f4,
              true AS inr, false AS outr, 4129968.0 AS gd""",
)

q(
    "arrays_more_fns",
    """print a = dynamic([1, 2, 3]), b = dynamic([3, 4])
    | project cat2 = strcat_array(array_concat(a, b), '|'),
              rl = strcat_array(array_rotate_left(a, 1), '|'),
              sl = strcat_array(array_shift_left(a, 1, 0), '|'),
              diff = strcat_array(set_difference(a, b), '|'),
              jac = round(jaccard_index(a, b), 4),
              rep2 = strcat_array(repeat(7, 3), '|'),
              dynj = dynamic_to_json(a),
              ai = strcat_array(array_iff(dynamic([true, false, true]), a, b), '|')""",
    """SELECT '1|2|3|3|4' AS cat2, '2|3|1' AS rl, '2|3|0' AS sl,
              '1|2' AS diff, 0.25 AS jac, '7|7|7' AS rep2,
              '[1,2,3]' AS dynj, '1|4|3' AS ai""",
)

q(
    "bag_ops_fns",
    """print mb = tolong(extractjson('$.b', bag_merge(pack('a', 1, 'b', 2), pack('b', 9, 'c', 3)))),
             rb = tolong(extractjson('$.b', bag_remove_keys(pack('a', 1, 'b', 2), dynamic(['b'])))),
             keys = strcat_array(bag_keys(pack('x', 1)), '|')""",
    """SELECT CAST(2 AS BIGINT) AS mb, CAST(NULL AS BIGINT) AS rb, 'x' AS keys""",
)

q(
    "datetime_part_fn",
    """print y = datetime_part('year', datetime(2024-03-05 04:05:06.789)),
       q = datetime_part('quarter', datetime(2024-11-05)),
       m = datetime_part('month', datetime(2024-03-05)),
       d = datetime_part('day', datetime(2024-03-05)),
       h = datetime_part('hour', datetime(2024-03-05 04:05:06)),
       ms = datetime_part('millisecond', datetime(2024-03-05 04:05:06.789))""",
    """SELECT CAST(2024 AS BIGINT) AS y, CAST(4 AS BIGINT) AS q,
              CAST(3 AS BIGINT) AS m, CAST(5 AS BIGINT) AS d,
              CAST(4 AS BIGINT) AS h, CAST(789 AS BIGINT) AS ms""",
)

q(
    "bitwise_series_misc_fns",
    """print b_and = binary_and(12, 10), b_or = binary_or(12, 10),
       b_xor = binary_xor(12, 10), b_not = binary_not(0),
       shl = binary_shift_left(1, 4), shr = binary_shift_right(16, 2),
       ones = bitset_count_ones(255), ct = round(cot(1.0), 4),
       sp = strcat_array(series_pow(dynamic([2.0, 3.0]), dynamic([3.0, 2.0])), '|'),
       ssin = strcat_array(series_sin(dynamic([0.0])), '|'),
       asp = tostring(array_split(dynamic([1, 2, 3, 4, 5]), 2)),
       pc = strcat_array(parse_csv('a,b,c'), '|'),
       cie = column_ifexists('no_such_col', 42)""",
    """SELECT CAST(8 AS BIGINT) AS b_and, CAST(14 AS BIGINT) AS b_or,
              CAST(6 AS BIGINT) AS b_xor, CAST(-1 AS BIGINT) AS b_not,
              CAST(16 AS BIGINT) AS shl, CAST(4 AS BIGINT) AS shr,
              CAST(8 AS BIGINT) AS ones, 0.6421 AS ct, '8.0|9.0' AS sp,
              '0.0' AS ssin, '[[1,2],[3,4,5]]' AS asp, 'a|b|c' AS pc,
              CAST(42 AS BIGINT) AS cie""",
)

q(
    "ipv6_fns",
    # round 5: IPv6 family (pandas-UDF over stdlib ipaddress). Constant
    # inputs -> the oracle is the literal expected values, hash-certified.
    """print a = parse_ipv6('2001:db8::1'),
       b = parse_ipv6('127.0.0.1'),
       c = parse_ipv6_mask('2001:0db8:85a3::8a2e:0370:7334', 48),
       d = ipv6_compare('192.168.1.1', '::ffff:c0a8:0101'),
       e = ipv6_compare('2001:db8::1', '2001:db8::2'),
       f = ipv6_is_match('2001:db8::1', '2001:db8::ff', 120),
       g = ipv6_is_in_range('2001:db8::5', '2001:db8::/64'),
       h = ipv6_is_in_range('2001:db9::5', '2001:db8::/64'),
       i = ipv6_is_in_any_range('2001:db9::5', '2001:db8::/64', '2001:db9::/64'),
       j = parse_ipv6('not an ip')""",
    """SELECT '2001:0db8:0000:0000:0000:0000:0000:0001' AS a,
              '0000:0000:0000:0000:0000:ffff:7f00:0001' AS b,
              '2001:0db8:85a3:0000:0000:0000:0000:0000' AS c,
              CAST(0 AS BIGINT) AS d, CAST(-1 AS BIGINT) AS e,
              true AS f, true AS g, false AS h, true AS i,
              CAST(NULL AS VARCHAR) AS j""",
)

q(
    "round5_fn_sweep",
    # round-5 gap closers: regex counting/indexing, byte sizes, bag keys on
    # both dynamic carriers, ipv4 term search, tolerance compare,
    # byte formatting. Constant inputs -> literal oracle, hash-certified.
    """print cr = countof_regex('a1b2c3', '[0-9]'),
       ir = indexof_regex('hello world', 'wor'),
       irm = indexof_regex('hello', 'zzz'),
       ss = string_size('héllo'),
       ar = around(10.5, 10.0, 1.0),
       bk = bag_has_key(dynamic({"a": 1, "b": 2}), 'a'),
       bkp = bag_has_key(dynamic({"a": {"c": 3}}), '$.a.c'),
       fb = format_bytes(1536, 1),
       fb2 = format_bytes(1073741824, 2, 'MB'),
       fb3 = format_bytes(500),
       hip = has_ipv4('src=192.168.1.1 dst=10.0.0.1', '192.168.1.1'),
       hip2 = has_ipv4('ip 192.168.1.100 here', '192.168.1.1'),
       hpre = has_ipv4_prefix('ip 192.168.1.100 here', '192.168.1.'),
       hany = has_any_ipv4('saw 10.0.0.7 today', '1.2.3.4', '10.0.0.7')""",
    """SELECT CAST(3 AS BIGINT) AS cr, CAST(6 AS BIGINT) AS ir,
              CAST(-1 AS BIGINT) AS irm, CAST(6 AS BIGINT) AS ss,
              true AS ar, true AS bk, true AS bkp,
              '1.5 KB' AS fb, '1024.0 MB' AS fb2, '500 Bytes' AS fb3,
              true AS hip, false AS hip2, true AS hpre, true AS hany""",
)

q(
    "series_vector_math",
    # round 5: dot/magnitude/cosine/pearson — pure column exprs, JVM-side
    """print d = series_dot_product(dynamic([1.0,2.0,3.0]), dynamic([4.0,5.0,6.0])),
       m = series_magnitude(dynamic([3.0,4.0])),
       cs = round(series_cosine_similarity(dynamic([1.0,0.0]), dynamic([1.0,1.0])), 6),
       pc = round(series_pearson_correlation(dynamic([1.0,2.0,3.0,4.0]), dynamic([2.0,4.0,6.0,8.0])), 6),
       pn = round(series_pearson_correlation(dynamic([1.0,2.0,3.0]), dynamic([3.0,2.0,1.0])), 6)""",
    """SELECT 32.0 AS d, 5.0 AS m, 0.707107 AS cs, 1.0 AS pc, -1.0 AS pn""",
)

q(
    "geo_point_in_polygon_fn",
    # ray casting with a hole ring; constants -> literal oracle
    """print a = geo_point_in_polygon(5.0, 2.0, '{"type": "Polygon", "coordinates": [[[0,0],[10,0],[10,10],[0,10],[0,0]], [[4,4],[6,4],[6,6],[4,6],[4,4]]]}'),
       b = geo_point_in_polygon(5.0, 5.0, '{"type": "Polygon", "coordinates": [[[0,0],[10,0],[10,10],[0,10],[0,0]], [[4,4],[6,4],[6,6],[4,6],[4,4]]]}'),
       c = geo_point_in_polygon(20.0, 5.0, '{"type": "Polygon", "coordinates": [[[0,0],[10,0],[10,10],[0,10],[0,0]]]}')""",
    """SELECT true AS a, false AS b, false AS c""",
)

q(
    "geohash_fns",
    # round 5: geohash encode/decode roundtrip; constants -> literal oracle
    """print g = geo_point_to_geohash(-122.3, 47.6, 6),
       lon = round(todouble(extractjson('$.coordinates[0]',
             geo_geohash_to_central_point(geo_point_to_geohash(-122.3, 47.6, 9)))), 4),
       lat = round(todouble(extractjson('$.coordinates[1]',
             geo_geohash_to_central_point(geo_point_to_geohash(-122.3, 47.6, 9)))), 4),
       bad = geo_point_to_geohash(999.0, 47.6, 6)""",
    """SELECT 'c23nbc' AS g, -122.3 AS lon, 47.6 AS lat,
              CAST(NULL AS VARCHAR) AS bad""",
)

q(
    "ipv4_mask_fns",
    '''print priv = ipv4_is_private('192.168.1.4'), pub = ipv4_is_private('8.8.8.8'),
       nm = ipv4_netmask_suffix('10.0.0.0/24'),
       pm = format_ipv4(parse_ipv4_mask('192.168.1.77', 24)),
       cmp0 = ipv4_compare('10.1.1.1/24', '10.1.1.200'),
       cmp1 = ipv4_compare('10.1.2.1', '10.1.1.200'),
       mt = ipv4_is_match('10.1.1.1', '10.1.1.200', 24),
       gc = geo_point_in_circle(-122.4, 37.7, -122.41, 37.71, 5000.0),
       uq = extractjson("$['Query Parameters'].k2", parse_urlquery('http://x/p?k1=v1&k2=v2')),
       hs = hash_xxhash64('abc') == hash_xxhash64('abc'),
       hd = hash_combine(1, 2) != hash_combine(2, 1)''',
    """SELECT true AS priv, false AS pub, CAST(24 AS BIGINT) AS nm,
              '192.168.1.0' AS pm, CAST(0 AS BIGINT) AS cmp0,
              CAST(1 AS BIGINT) AS cmp1, true AS mt, true AS gc, 'v2' AS uq,
              true AS hs, true AS hd""",
)

q(
    "conversions_more",
    # d compares as double: the engine's todecimal carries Spark
    # DecimalType (a Decimal object through toPandas), while the oracle's
    # DECIMAL collapses to float64 in the driver's pandas fetch — wrap in
    # todouble so the VALUE is certified without a carrier-type mismatch
    """print d = todouble(todecimal('123.45')), g = gettype(123),
             t = totimespan('01:30:00'), b2 = tobool('true'),
             ti = toint('42'), gu = toguid('ABC-DEF')""",
    """SELECT CAST(CAST('123.45' AS DECIMAL(38,18)) AS DOUBLE) AS d, 'long' AS g,
              INTERVAL 90 MINUTE AS t, true AS b2, CAST(42 AS INT) AS ti,
              'abc-def' AS gu""",
)

# --------------------------------------------- coverage sweep: aggregates etc
q(
    "agg_binary_covar",
    """lineitem
    | summarize ba = binary_all_and(l_linenumber), bo = binary_all_or(l_linenumber),
                bx = binary_all_xor(l_linenumber),
                cov = round(covariance(l_quantity, l_extendedprice), 1),
                cor = round(correlation(l_quantity, l_extendedprice), 5)
      by l_returnflag""",
    """SELECT l_returnflag, bit_and(l_linenumber) AS ba, bit_or(l_linenumber) AS bo,
              bit_xor(l_linenumber) AS bx,
              ROUND(covar_samp(l_quantity, l_extendedprice), 1) AS cov,
              ROUND(corr(l_quantity, l_extendedprice), 5) AS cor
       FROM lineitem GROUP BY l_returnflag""",
)

q(
    "hll_sketch_roundtrip",
    # real sketch interop: per-group hll() sketches -> hll_merge() rollup ->
    # dcount_hll() readout, within 1% of the exact distinct count
    """let ex = toscalar(lineitem | summarize d = count_distinct(l_orderkey));
    lineitem
    | summarize h = hll(l_orderkey, 4) by l_returnflag
    | summarize est = dcount_hll(hll_merge(h))
    | project ok = abs(todouble(est) - todouble(ex)) / todouble(ex) < 0.01,
              nonzero = est > 0""",
    """SELECT true AS ok, true AS nonzero""",
)

q(
    "take_any_single_valued",
    """lineitem
    | summarize v = take_any(l_linestatus) by l_linestatus""",
    """SELECT l_linestatus, l_linestatus AS v FROM lineitem GROUP BY l_linestatus""",
)

q(
    "make_list_with_nulls_agg",
    """datatable(x:long, g:string)[1, 'a', long(null), 'a', 3, 'b']
    | summarize l0 = array_sort_asc(make_list_with_nulls(x)) by g
    | project g, l = tostring(l0)
    | sort by g asc""",
    """WITH t(x, g) AS (VALUES (CAST(1 AS BIGINT), 'a'), (NULL, 'a'), (3, 'b'))
       SELECT g, CAST(to_json(list_sort(list(x), 'ASC', 'NULLS LAST')) AS VARCHAR) AS l
       FROM t GROUP BY g ORDER BY g""",
)

q(
    "percentilew_weighted",
    """datatable(v:long, w:long)[1, 1, 2, 3, 3, 1]
    | summarize p = percentilew(v, w, 50)""",
    """SELECT 2.0 AS p""",
)

q(
    "getschema_region",
    "region | getschema",
    """SELECT * FROM (VALUES
         ('r_regionkey', 0, 'int', 'int'),
         ('r_name', 1, 'string', 'string')
       ) AS t(ColumnName, ColumnOrdinal, DataType, ColumnType)""",
)

q(
    "externaldata_csv",
    """externaldata(name:string, age:long)['/root/repo/tests/fixtures/ext_people.csv'] with(format='csv')
    | sort by age desc""",
    """SELECT name, age FROM read_csv('/root/repo/tests/fixtures/ext_people.csv',
         columns = {'name': 'VARCHAR', 'age': 'BIGINT'}, header = false)
       ORDER BY age DESC""",
)

q(
    "sink_bucketed_roundtrip",
    # round 13: materialize a hash-bucketed layout mid-pipe and keep
    # querying over the read-back scan — results must equal the plain
    # parquet path exactly (the zero-Exchange property itself is pinned
    # in tests/test_plans.py; this entry certifies the data contract)
    """lineitem
    | project l_orderkey, l_quantity
    | evaluate sink_bucketed('bkt_li_corpus', l_orderkey, 8)
    | summarize sum_qty = round(sum(l_quantity), 2) by l_orderkey
    | sort by l_orderkey asc
    | take 20""",
    """SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS sum_qty
       FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey LIMIT 20""",
)

q(
    "as_operator",
    """events
    | where value > 400.0
    | as hot
    | summarize n = count(), mx = round(max(value), 2)""",
    """SELECT COUNT(*) AS n, ROUND(MAX(value), 2) AS mx FROM events WHERE value > 400.0""",
)

q(
    "session_fn_on_events",
    """events
    | where user_id == 7
    | sort by ts asc
    | extend s = row_window_session(ts, 30d, 30m)
    | summarize sessions = dcount(s)""",
    """WITH o AS (SELECT CAST(ts AS TIMESTAMP) t FROM events WHERE user_id = 7),
         s AS (SELECT t, CASE WHEN LAG(t) OVER (ORDER BY t) IS NULL
                              OR t - LAG(t) OVER (ORDER BY t) > INTERVAL 30 MINUTE
                         THEN 1 ELSE 0 END AS brk FROM o)
       SELECT COUNT(*) AS sessions FROM s WHERE brk = 1""",
)

q(
    "sample_rows_only",
    # round 9: row CONTENT is random, but Kusto sample returns exactly
    # min(N, |T|) rows — counting makes the contract hashable
    "lineitem | sample 100 | summarize n = count()",
    """SELECT CAST(LEAST(100, (SELECT COUNT(*) FROM lineitem)) AS BIGINT) AS n""",
)

q(
    "sample_distinct_rows_only",
    # sample-distinct returns min(N, dcount) rows, each a distinct value
    "lineitem | sample-distinct 3 of l_returnflag | summarize n = count(), d = count_distinct(l_returnflag)",
    """SELECT CAST(LEAST(3, COUNT(DISTINCT l_returnflag)) AS BIGINT) AS n,
              CAST(LEAST(3, COUNT(DISTINCT l_returnflag)) AS BIGINT) AS d
       FROM lineitem""",
)

# ------------------------------------------------- coverage sweep: operators
q(
    "join_rightsemi",
    """orders
    | join kind=rightsemi (customer) on $left.o_custkey == $right.c_custkey
    | summarize n = count(), s = round(sum(c_acctbal), 2)""",
    """SELECT COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS s
       FROM customer SEMI JOIN orders ON c_custkey = o_custkey""",
)

q(
    "join_rightanti",
    """orders
    | join kind=rightanti (customer) on $left.o_custkey == $right.c_custkey
    | summarize n = count()""",
    """SELECT COUNT(*) AS n
       FROM customer ANTI JOIN orders ON c_custkey = o_custkey""",
)

q(
    "join_shuffle_hint",
    """orders
    | join kind=inner hint.strategy=shuffle hint.num_partitions=4 (customer)
        on $left.o_custkey == $right.c_custkey
    | summarize n = count() by c_mktsegment""",
    """SELECT c_mktsegment, COUNT(*) AS n
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment""",
)

q(
    "mv_expand_itemindex",
    """events
    | where event_id < 100
    | project event_id, arr = pack_array(10, 20, 30)
    | mv-expand with_itemindex = idx v = arr to typeof(long)
    | summarize n = count(), s = sum(v * idx)""",
    """SELECT COUNT(*) AS n, CAST(SUM(v * idx) AS BIGINT) AS s FROM (
         SELECT UNNEST([10, 20, 30]) AS v,
                UNNEST([CAST(0 AS BIGINT), 1, 2]) AS idx
         FROM events WHERE event_id < 100)""",
)

q(
    "mv_expand_multi_zip",
    """events
    | where event_id < 100
    | project event_id, a = pack_array(1, 2, 3), b = pack_array(10, 20)
    | mv-expand a to typeof(long), b to typeof(long)
    | summarize n = count(), nb = countif(isnull(b)), s = sum(a)""",
    """SELECT COUNT(*) AS n,
              COUNT(*) FILTER (WHERE b IS NULL) AS nb,
              CAST(SUM(a) AS BIGINT) AS s FROM (
         SELECT UNNEST([1, 2, 3]) AS a,
                UNNEST([CAST(10 AS BIGINT), 20, NULL]) AS b
         FROM events WHERE event_id < 100)""",
)

q(
    "parse_where_drops",
    """events
    | project s = iff(event_id % 2 == 0, strcat('id=', tostring(event_id)), 'garbage')
    | parse-where s with 'id=' pid:long
    | summarize n = count(), mx = max(pid)""",
    """SELECT COUNT(*) AS n, MAX(CAST(regexp_extract(s, 'id=(.*)', 1) AS BIGINT)) AS mx
       FROM (SELECT CASE WHEN event_id % 2 = 0
                         THEN 'id=' || CAST(event_id AS VARCHAR)
                         ELSE 'garbage' END AS s FROM events)
       WHERE regexp_matches(s, 'id=(.*)')""",
)

q(
    "parse_kv_pairs",
    """events
    | project s = strcat('k=', tostring(event_id), ' t=', event_type)
    | parse-kv s as (k:long, t:string) with (pair_delimiter = ' ', kv_delimiter = '=')
    | summarize n = count(), s2 = sum(k) by t
    | sort by t asc""",
    """SELECT event_type AS t, COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS s2
       FROM events GROUP BY event_type ORDER BY t""",
)

q(
    "distinct_star",
    """nation | distinct *""",
    "SELECT DISTINCT * FROM nation",
)

q(
    "datetime_boundaries",
    """orders
    | where o_orderkey < 1000
    | project o_orderkey, som = startofmonth(o_orderdate), eom = endofmonth(o_orderdate),
              soy = startofyear(o_orderdate), eoy = endofyear(o_orderdate),
              ba = bin_at(o_orderdate, 7d, datetime(1995-01-02))""",
    """SELECT o_orderkey,
              CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS som,
              CAST(date_trunc('month', o_orderdate) + INTERVAL 1 MONTH
                   - INTERVAL 1 MICROSECOND AS TIMESTAMP) AS eom,
              CAST(date_trunc('year', o_orderdate) AS TIMESTAMP) AS soy,
              CAST(date_trunc('year', o_orderdate) + INTERVAL 1 YEAR
                   - INTERVAL 1 MICROSECOND AS TIMESTAMP) AS eoy,
              TIMESTAMP '1995-01-02'
                + CAST(FLOOR(date_diff('day', TIMESTAMP '1995-01-02', o_orderdate) / 7.0)
                       * 7 AS BIGINT) * INTERVAL 1 DAY AS ba
       FROM orders WHERE o_orderkey < 1000""",
)

q(
    "format_timespan_fn",
    """print a = format_timespan(totimespan('1.02:03:04'), 'd.hh:mm:ss'),
             b = format_timespan(90m, 'hh:mm:ss'),
             c = format_timespan(totimespan('00:00:01.5'), 'ss.fff')""",
    """SELECT '1.02:03:04' AS a, '01:30:00' AS b, '01.500' AS c""",
)

q(
    "summarize_shufflekey_hint",
    """lineitem
    | summarize hint.shufflekey = l_orderkey s = sum(l_quantity), n = count() by l_orderkey
    | summarize total = sum(s), orders = count()""",
    """SELECT SUM(l_quantity) AS total, COUNT(DISTINCT l_orderkey) AS orders
       FROM lineitem""",
)

q(
    "render_is_noop",
    """lineitem
    | summarize c = count() by l_returnflag
    | sort by l_returnflag asc
    | render barchart""",
    """SELECT l_returnflag, COUNT(*) AS c FROM lineitem
       GROUP BY l_returnflag ORDER BY l_returnflag""",
)

q(
    "consume_empty",
    # consume executes the plan and surfaces zero rows with the input
    # schema — the WHERE-false twin certifies both (round 9)
    "events | consume",
    """SELECT event_id, ts, user_id, event_type, value, props
       FROM events WHERE false""",
)

q(
    "project_reorder_cols",
    """nation
    | project-reorder n_name, n_*""",
    """SELECT n_name, n_nationkey, n_regionkey FROM nation""",
)

q(
    "serialize_row_number",
    """datatable(x:long)[30, 10, 20]
    | sort by x asc
    | serialize idx = tolong(row_number())
    | project x, idx""",
    """SELECT x, idx FROM (VALUES
         (CAST(10 AS BIGINT), CAST(1 AS BIGINT)), (20, 2), (30, 3)) AS t(x, idx)""",
)

q(
    "sliding_window_counts_7d",
    # round 5: per-bin count + dcount over a trailing 7-day window — exact
    # lowering (bounded explode, factor 7), hash-certified
    """events
    | evaluate sliding_window_counts(user_id, ts, 7d, 1d)
    | sort by Timeline asc""",
    """WITH b AS (SELECT user_id,
            CAST(to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) * 86400) AS TIMESTAMP) AS d
        FROM events),
     mx AS (SELECT MAX(d) AS m FROM b),
     spread AS (SELECT user_id, d + INTERVAL (k) DAY AS d
                FROM b CROSS JOIN UNNEST(generate_series(0, 6)) AS t(k))
     SELECT d AS Timeline,
            CAST(COUNT(*) AS BIGINT) AS "Count",
            CAST(COUNT(DISTINCT user_id) AS BIGINT) AS "Dcount"
     FROM spread, mx WHERE d <= m GROUP BY 1 ORDER BY 1""",
)

q(
    "rolling_percentile_p90",
    # round 5: trailing-7-bin p90 per day; percentile() is linear
    # interpolation on both sides (Spark F.percentile ≡ DuckDB
    # quantile_cont), so the twin hash-matches after rounding
    """events
    | evaluate rolling_percentile(value, 90, ts, 1d, 7)
    | project Timeline, p90 = round(rolling_7_percentile_value_90, 4)
    | sort by Timeline asc""",
    """WITH b AS (SELECT value,
            CAST(to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) * 86400) AS TIMESTAMP) AS d
        FROM events),
     mx AS (SELECT MAX(d) AS m FROM b),
     spread AS (SELECT value, d + INTERVAL (k) DAY AS d
                FROM b CROSS JOIN UNNEST(generate_series(0, 6)) AS t(k))
     SELECT d AS Timeline,
            ROUND(quantile_cont(value, 0.90), 4) AS p90
     FROM spread, mx WHERE d <= m GROUP BY 1 ORDER BY 1""",
)

q(
    "rows_near_hits",
    # round 5: neighborhood filter in serialized order — windowed max of the
    # match flag over a rows-frame, identical frame in the DuckDB twin
    """events
    | sort by ts asc, event_id asc
    | evaluate rows_near(event_type == 'purchase', 2)
    | project event_id, user_id, event_type""",
    """SELECT event_id, user_id, event_type FROM (
         SELECT event_id, user_id, event_type,
                MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  OVER (ORDER BY ts ASC, event_id ASC
                        ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS nearhit
         FROM events) WHERE nearhit = 1""",
)

q(
    "ipv4_lookup_cidr",
    # round 5: CIDR-range lookup join, longest-prefix wins; the twin
    # precomputes each range's [start, end] and applies the same
    # row_number-by-prefix-length rule
    """let lut = datatable(cidr:string, net:string)[
      '10.0.0.0/8','ten', '10.1.0.0/16','ten-one', '192.168.0.0/16','home'];
    events
    | extend ip = iff(event_id % 5 == 0,
        strcat('172.16.0.', tostring(event_id % 256)),
        strcat('10.', tostring(user_id % 256), '.0.', tostring(event_id % 256)))
    | evaluate ipv4_lookup(lut, ip, cidr)
    | summarize c = count() by net
    | sort by net asc""",
    """WITH lut(cidr, net, s, e, b) AS (VALUES
         ('10.0.0.0/8', 'ten', 167772160, 184549375, 8),
         ('10.1.0.0/16', 'ten-one', 167837696, 167903231, 16),
         ('192.168.0.0/16', 'home', 3232235520, 3232301055, 16)),
       src AS (SELECT event_id,
           CASE WHEN event_id % 5 = 0
                THEN '172.16.0.' || CAST(event_id % 256 AS VARCHAR)
                ELSE '10.' || CAST(user_id % 256 AS VARCHAR) || '.0.'
                     || CAST(event_id % 256 AS VARCHAR) END AS ip
          FROM events),
       ipl AS (SELECT event_id,
           CAST(split_part(ip, '.', 1) AS BIGINT) * 16777216
           + CAST(split_part(ip, '.', 2) AS BIGINT) * 65536
           + CAST(split_part(ip, '.', 3) AS BIGINT) * 256
           + CAST(split_part(ip, '.', 4) AS BIGINT) AS v
          FROM src),
       m AS (SELECT event_id, net,
               ROW_NUMBER() OVER (PARTITION BY event_id
                                  ORDER BY b DESC, cidr) AS rn
             FROM ipl JOIN lut ON v BETWEEN s AND e)
       SELECT net, CAST(COUNT(*) AS BIGINT) AS c
       FROM m WHERE rn = 1 GROUP BY net ORDER BY net""",
)

q(
    "activity_counts_metrics_1d",
    # round 5: per-day activity counters incl. first-seen and cumulative
    # distinct ids — the bin-level cumsum window is bounded by bin count
    """events
    | evaluate activity_counts_metrics(user_id, ts, 1d)
    | sort by Timeline asc""",
    """WITH b AS (SELECT user_id,
            CAST(to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) * 86400) AS TIMESTAMP) AS d
        FROM events),
     per AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS cnt,
                    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dc
             FROM b GROUP BY 1),
     firsts AS (SELECT user_id, MIN(d) AS d FROM b GROUP BY 1),
     newb AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS nd FROM firsts GROUP BY 1)
     SELECT per.d AS Timeline, cnt AS "count", dc AS dcount,
            COALESCE(nd, 0) AS new_dcount,
            CAST(SUM(COALESCE(nd, 0)) OVER (ORDER BY per.d) AS BIGINT)
              AS aggregated_dcount
     FROM per LEFT JOIN newb ON per.d = newb.d ORDER BY 1""",
)

q(
    "session_count_daily",
    # round 5: sessions started per day (gap > look_back starts a session);
    # the lag window is hash-partitioned on the id — no global order
    """events
    | evaluate session_count(user_id, ts, 1d, 1h)
    | sort by Timeline asc""",
    """WITH g AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t,
            LAG(CAST(ts AS TIMESTAMP)) OVER (
              PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) AS prev
          FROM events)
     SELECT CAST(to_timestamp(CAST(floor(epoch(t) / 86400) AS BIGINT) * 86400) AS TIMESTAMP)
              AS Timeline,
            CAST(COUNT(*) AS BIGINT) AS count_sessions
     FROM g WHERE prev IS NULL OR t - prev > INTERVAL 1 HOUR
     GROUP BY 1 ORDER BY 1""",
)

q(
    "funnel_completion_steps",
    # round 5: view->click->purchase funnel completion per 7d bin of the
    # step-1 time; chained-min semantics, identical joins in the twin
    """events
    | evaluate funnel_sequence_completion(user_id, ts, 7d, event_type,
        'view', 'click', 'purchase', 7d)
    | sort by Timeline asc, Step asc""",
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_type
                  FROM events),
     s1 AS (SELECT user_id, MIN(t) AS t1 FROM e
            WHERE event_type = 'view' GROUP BY 1),
     s2 AS (SELECT e.user_id, t1, MIN(t) AS t2 FROM e JOIN s1 USING (user_id)
            WHERE event_type = 'click' AND t >= t1
              AND t <= t1 + INTERVAL 7 DAY GROUP BY 1, 2),
     s3 AS (SELECT e.user_id, t1, MIN(t) AS t3 FROM e JOIN s2 USING (user_id)
            WHERE event_type = 'purchase' AND t >= t2
              AND t <= t1 + INTERVAL 7 DAY GROUP BY 1, 2),
     u AS (
       SELECT t1, 1 AS step, 'view' AS state, user_id FROM s1
       UNION ALL SELECT t1, 2, 'click', user_id FROM s2
       UNION ALL SELECT t1, 3, 'purchase', user_id FROM s3)
     SELECT CAST(to_timestamp(CAST(floor(epoch(t1) / 604800) AS BIGINT) * 604800) AS TIMESTAMP)
              AS Timeline,
            CAST(step AS BIGINT) AS Step, state AS StateName,
            CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dcount
     FROM u GROUP BY 1, 2, 3 ORDER BY 1, 2""",
)

q(
    "dcount_intersect_hll",
    # round 5: sketch-space intersection estimates via inclusion-exclusion.
    # The hashed key is BOUNDED (mod 97) so DataSketches HLL stays in exact
    # coupon mode at EVERY scale factor — at sf0.1 the raw user_id
    # cardinality (1500) pushed the sketch into estimation and the
    # exact-set twin diverged (round-6 sweep finding); same contract as
    # hll_sketch_roundtrip
    """events
    | extend uk = user_id % 97
    | summarize h1 = hll(uk),
                h2 = hll_if(uk, event_type == 'purchase' and value > 90.0),
                h3 = hll_if(uk, event_type == 'purchase' and value > 99.0)
    | evaluate dcount_intersect(h1, h2, h3)""",
    """WITH pe AS (SELECT user_id % 97 AS uk,
            MAX(CASE WHEN event_type = 'purchase' AND value > 90.0
                     THEN 1 ELSE 0 END) AS v,
            MAX(CASE WHEN event_type = 'purchase' AND value > 99.0
                     THEN 1 ELSE 0 END) AS p
          FROM events GROUP BY 1)
     SELECT CAST(COUNT(*) AS BIGINT) AS s0,
            CAST(SUM(v) AS BIGINT) AS s1,
            CAST(SUM(CASE WHEN v = 1 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS s2
     FROM pe""",
)

q(
    "series_elementwise_more",
    # round 5: ge/le comparisons, floor/ceiling, product over series.
    # Array outputs tostring-wrapped (round 11): the driver's comparator
    # sorts the pandas frame and cannot hash raw list cells (r10 err rows).
    """print sge = tostring(series_greater_equals(dynamic([1.0,2.0,3.0]), dynamic([2.0,2.0,2.0]))),
             sle = tostring(series_less_equals(dynamic([1.0,2.0,3.0]), dynamic([2.0,2.0,2.0]))),
             sfl = tostring(series_floor(dynamic([1.7,-1.2]))),
             scl = tostring(series_ceiling(dynamic([1.2,-1.7]))),
             spr = series_product(dynamic([2.0,3.0,4.0]))""",
    """SELECT '[false,true,true]' AS sge, '[true,true,false]' AS sle,
              '[1.0,-2.0]' AS sfl, '[2.0,-1.0]' AS scl, 24.0 AS spr""",
)

q(
    "hex_guid_bytes_fns",
    # round 5: tohex widths, .NET-order guid <-> base64, byte arrays,
    # combined hashes (nonzero check: hash seed is engine-specific)
    """print hx = tohex(255), hxw = tohex(255, 8), hneg = tohex(-2),
             ge = base64_encode_fromguid('00112233-4455-6677-8899-aabbccddeeff'),
             gd = base64_decode_toguid('MyIRAFVEd2aImaq7zN3u/w=='),
             ba = tostring(base64_decode_toarray('S3VzdG8=')),
             hm_differs = hash_many('a', 1) != hash_many('a', 2)""",
    """SELECT 'ff' AS hx, '000000ff' AS hxw, 'fffffffffffffffe' AS hneg,
              'MyIRAFVEd2aImaq7zN3u/w==' AS ge,
              '00112233-4455-6677-8899-aabbccddeeff' AS gd,
              '[75,117,115,116,111]' AS ba, true AS hm_differs""",
)

q(
    "ipv4_mask_bag_fns",
    # round 5: CIDR formatting, any-range membership, column bags, key upsert
    """nation
    | where n_nationkey < 3
    | extend ip = strcat('10.', tostring(n_nationkey), '.0.200')
    | project n_nationkey,
              masked = format_ipv4_mask(ip, 16),
              anyr = ipv4_is_in_any_range(ip, '192.168.0.0/16', '10.1.0.0/16'),
              bag = bag_pack_columns(n_nationkey, n_name),
              upd = bag_set_key('{"a":"1"}', 'k', tostring(n_nationkey))
    | sort by n_nationkey asc""",
    """SELECT n_nationkey,
              '10.' || CAST(n_nationkey AS VARCHAR) || '.0.0/16' AS masked,
              n_nationkey = 1 AS anyr,
              '{"n_nationkey":' || CAST(n_nationkey AS VARCHAR)
                || ',"n_name":"' || n_name || '"}' AS bag,
              '{"a":"1","k":"' || CAST(n_nationkey AS VARCHAR) || '"}' AS upd
       FROM nation WHERE n_nationkey < 3 ORDER BY n_nationkey""",
)

q(
    "erf_estimate_size_fns",
    # round 5: erf/erfc (A&S 7.1.26, |err| <= 1.5e-7 -> round to 5dp),
    # payload-size estimation over typed columns
    """print e1 = round(erf(1.0), 5), e0 = erf(0.0), eneg = round(erf(-1.0), 5),
             ec = round(erfc(0.5), 5),
             sz = estimate_data_size('hello', 5, true)""",
    """SELECT 0.8427 AS e1, 0.0 AS e0, -0.8427 AS eneg, 0.4795 AS ec,
              CAST(14 AS BIGINT) AS sz""",
)

q(
    "codec_compress_punycode_xml",
    # round 5: zlib/gzip base64 codecs (gzip mtime pinned 0 for
    # determinism), punycode + IDNA domains, XML -> dynamic bag
    """print
      z = zlib_decompress_from_base64_string(zlib_compress_to_base64_string('hello kusto')),
      gc = gzip_compress_to_base64_string('abc'),
      bad = zlib_decompress_from_base64_string('!!notbase64!!'),
      p = punycode_from_string('München'),
      dom = punycode_domain_from_string('www.bücher.de'),
      domd = punycode_domain_to_string('www.xn--bcher-kva.de'),
      x = parse_xml('<root a="1"><item>x</item><item>y</item></root>')""",
    """SELECT 'hello kusto' AS z,
              'H4sIAAAAAAACA0tMSgYAwkEkNQMAAAA=' AS gc,
              '' AS bad, 'Mnchen-3ya' AS p,
              'www.xn--bcher-kva.de' AS dom,
              'www.bücher.de' AS domd,
              '{"root":{"@a":"1","item":["x","y"]}}' AS x""",
)

q(
    "beta_welch_iir_fns",
    # round 5: Beta distribution family (incomplete-beta continued
    # fraction), Welch's t-test p-value, IIR filter, seasonal component
    """print bp = round(beta_pdf(0.5, 2.0, 2.0), 6),
             bc = round(beta_cdf(0.25, 2.0, 2.0), 6),
             bi = round(beta_inv(0.15625, 2.0, 2.0), 6),
             w = round(welch_test(20.6, 0.2, 6.0, 22.1, 0.7, 6.0), 6),
             iir = tostring(series_iir(dynamic([1.0,0.0,0.0,0.0]), dynamic([1.0]), dynamic([1.0,-0.5]))),
             seas = tostring(series_seasonal(dynamic([1.0,2.0,3.0,1.0,2.0,3.0]), 3))""",
    """SELECT 1.5 AS bp, 0.15625 AS bc, 0.25 AS bi, 0.005156 AS w,
              '[1.0,0.5,0.25,0.125]' AS iir,
              '[1.0,2.0,3.0,1.0,2.0,3.0]' AS seas""",
)

q(
    "funnel_sequence_neighborhood",
    # round 5: prev/next state distribution around a completed funnel;
    # chained-min completers + one lag/lead window, identical in the twin
    # (no (user_id, ts) ties in the fixtures, so lag/lead is deterministic)
    """events
    | evaluate funnel_sequence(user_id, ts, event_type, 'view', 'click', 1d)
    | sort by dcount desc, prev asc, next asc""",
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_type
                  FROM events),
     s1 AS (SELECT user_id, MIN(t) AS t1 FROM e
            WHERE event_type = 'view' GROUP BY 1),
     s2 AS (SELECT e.user_id, t1, MIN(t) AS tk FROM e JOIN s1 USING (user_id)
            WHERE event_type = 'click' AND t >= t1
              AND t <= t1 + INTERVAL 1 DAY GROUP BY 1, 2),
     n AS (SELECT user_id, t,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY t) AS prev,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY t) AS nxt
           FROM e),
     j AS (SELECT n.user_id,
             MAX(CASE WHEN n.t = s2.t1 THEN n.prev END) AS prev,
             MAX(CASE WHEN n.t = s2.tk THEN n.nxt END) AS "next"
           FROM n JOIN s2 ON n.user_id = s2.user_id
           WHERE n.t = s2.t1 OR n.t = s2.tk
           GROUP BY 1)
     SELECT prev, "next", CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dcount
     FROM j GROUP BY 1, 2 ORDER BY dcount DESC, prev, "next" """,
)

# ------------------------------------------- round-5 coverage batch 2 (§2.9)
q(
    "unit_conversion_fns",
    """print km = round(convert_length(1.0, "Mile", "Kilometer"), 6),
             c = round(convert_temperature(32.0, "DegreeFahrenheit", "DegreeCelsius"), 6),
             mph = round(convert_speed(100.0, "KilometerPerHour", "MilePerHour"), 6),
             kj = round(convert_energy(1.0, "KilowattHour", "Kilojoule"), 6),
             rad = round(convert_angle(180.0, "Degree", "Radian"), 6),
             n = round(convert_force(1.0, "PoundForce", "Newton"), 6),
             kg = round(convert_mass(1.0, "Stone", "Kilogram"), 6),
             l = round(convert_volume(1.0, "UsGallon", "Liter"), 6)""",
    """SELECT 1.609344 AS km, 0.0 AS c, 62.137119 AS mph, 3600.0 AS kj,
              3.141593 AS rad, 4.448222 AS n, 6.350293 AS kg, 3.785412 AS l""",
)

q(
    "string_utility_round5",
    """print a = isascii("hello"), b = isascii("héllo"),
             q = regex_quote("a.b*c"),
             r = replace_strings("A B C", dynamic(["A","B"]), dynamic(["X","Y"])),
             i = has_any_index("this is an example", dynamic(["other","example","this"])),
             j = has_any_index("xyz", dynamic(["a"]))""",
    r"""SELECT true AS a, false AS b, 'a\.b\*c' AS q, 'X Y C' AS r,
               CAST(1 AS BIGINT) AS i, CAST(-1 AS BIGINT) AS j""",
)

q(
    "unicode_codepoint_fns",
    """print c = tostring(unicode_codepoints_from_string("Hi!")),
             s = unicode_codepoints_to_string(dynamic([72, 105])),
             v = unicode_codepoints_to_string(74, 75)""",
    """SELECT '[72,105,33]' AS c, 'Hi' AS s, 'JK' AS v""",
)

q(
    "bag_zip_fn",
    """print b = bag_zip(dynamic(["k1","k2","k3"]), dynamic([1, 2]))""",
    """SELECT '{"k1":"1","k2":"2","k3":null}' AS b""",
)

q(
    "datetime_timezone_fns",
    """print u = datetime_local_to_utc(datetime(2024-06-01 12:00:00), "America/New_York"),
             l = datetime_utc_to_local(datetime(2024-06-01 16:00:00), "America/New_York")""",
    """SELECT TIMESTAMP '2024-06-01 16:00:00' AS u,
              TIMESTAMP '2024-06-01 12:00:00' AS l""",
)

q(
    "parse_command_line_fn",
    r'''print a = parse_command_line("prog.exe /x \"quoted arg\" C:\\p\\f", "windows")''',
    r"""SELECT '["prog.exe", "/x", "quoted arg", "C:\\p\\f"]' AS a""",
)

q(
    "parse_user_agent_fn",
    """print f = extractjson("$.Browser.Family", parse_user_agent("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/91.0.4472.124 Safari/537.36")),
             o = extractjson("$.OperatingSystem.Family", parse_user_agent("Mozilla/5.0 (iPhone; CPU iPhone OS 17_2 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.2 Mobile/15E148 Safari/604.1"))""",
    """SELECT 'Chrome' AS f, 'iOS' AS o""",
)

q(
    "percentrank_tdigest_fn",
    """lineitem
    | summarize td = tdigest(l_quantity)
    | project pr25 = round(percentrank_tdigest(td, 25.0), 0),
              pr50 = round(percentrank_tdigest(td, 50.0), 0)""",
    """SELECT ROUND(100.0 * COUNT(CASE WHEN l_quantity <= 25.0 THEN 1 END) / COUNT(*), 0) AS pr25,
              ROUND(100.0 * COUNT(CASE WHEN l_quantity <= 50.0 THEN 1 END) / COUNT(*), 0) AS pr50
       FROM lineitem""",
)

q(
    "geo_line_polygon_fns",
    """print l = round(geo_line_length(dynamic({"type":"LineString","coordinates":[[0,0],[0,1]]})), 0),
             a = round(geo_polygon_area(dynamic({"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,1],[0,0]]]})), -7),
             c = geo_polygon_centroid(dynamic({"type":"Polygon","coordinates":[[[0,0],[2,0],[2,2],[0,2],[0,0]]]})),
             d = round(geo_distance_point_to_line(1.0, 1.0, dynamic({"type":"LineString","coordinates":[[0,0],[2,0]]})), 0)""",
    """SELECT 111195.0 AS l, 12360000000.0 AS a,
              '{"type": "Point", "coordinates": [1.0, 1.0]}' AS c,
              111195.0 AS d""",
)

q(
    "diffpatterns_orders",
    """orders
    | project o_orderstatus, o_orderpriority
    | evaluate diffpatterns(o_orderstatus, "F", "O")""",
    """WITH a AS (SELECT o_orderpriority, COUNT(*) AS fa FROM orders
                  WHERE o_orderstatus='F' GROUP BY 1),
         b AS (SELECT o_orderpriority, COUNT(*) AS fb FROM orders
                  WHERE o_orderstatus='O' GROUP BY 1),
         ca AS (SELECT COUNT(*) AS c FROM orders WHERE o_orderstatus='F'),
         cb AS (SELECT COUNT(*) AS c FROM orders WHERE o_orderstatus='O'),
         j AS (SELECT COALESCE(a.o_orderpriority, b.o_orderpriority) AS o_orderpriority,
                      COALESCE(fa, 0) AS fa, COALESCE(fb, 0) AS fb
               FROM a FULL OUTER JOIN b USING (o_orderpriority)),
         p AS (SELECT o_orderpriority, fa, fb,
                      fa * 100.0 / (SELECT c FROM ca) AS rawa,
                      fb * 100.0 / (SELECT c FROM cb) AS rawb,
                      ROUND(fa * 100.0 / (SELECT c FROM ca), 2) AS pa,
                      ROUND(fb * 100.0 / (SELECT c FROM cb), 2) AS pb
               FROM j)
     SELECT CAST(ROW_NUMBER() OVER (ORDER BY ABS(rawa - rawb) DESC, o_orderpriority) - 1 AS BIGINT) AS SegmentId,
            CAST(fa AS BIGINT) AS CountA, CAST(fb AS BIGINT) AS CountB,
            pa AS PercentA, pb AS PercentB,
            ROUND(pa - pb, 2) AS PercentDiffAB, o_orderpriority
     FROM p""",
)

q(
    "diffpatterns_text_events",
    # Tier C text-pattern miner, but on a fixture with two perfectly
    # discriminating message shapes the ideal output is forced: each
    # side's constant message is its own pattern at 100%/0% (round 9).
    # The events-scale behavior stays covered by metamorphic pytest.
    """datatable(msg:string, side:string)[
       'error disk full on node', 'A',
       'error disk full on node', 'A',
       'error disk full on node', 'A',
       'ok heartbeat from node', 'B',
       'ok heartbeat from node', 'B',
       'ok heartbeat from node', 'B']
    | evaluate diffpatterns_text(msg, side, 'A', 'B')""",
    """SELECT * FROM (VALUES
         (CAST(3 AS BIGINT), CAST(0 AS BIGINT),
          CAST(100.0 AS DOUBLE), CAST(0.0 AS DOUBLE), 'error disk full on node'),
         (CAST(0 AS BIGINT), CAST(3 AS BIGINT),
          CAST(0.0 AS DOUBLE), CAST(100.0 AS DOUBLE), 'ok heartbeat from node')
       ) AS t(Count_of_A, Count_of_B, Percent_of_A, Percent_of_B, Pattern)""",
)

q(
    "geo_s2cell_fns",
    """print t11 = geo_point_to_s2cell(-122.192253, 47.615554, 11),
             t14 = geo_point_to_s2cell(-122.192253, 47.615554, 14),
             rt = geo_point_to_s2cell(todouble(extractjson("$.coordinates[0]",
                    geo_s2cell_to_central_point(geo_point_to_s2cell(139.7, 35.6, 16)))),
                  todouble(extractjson("$.coordinates[1]",
                    geo_s2cell_to_central_point(geo_point_to_s2cell(139.7, 35.6, 16)))), 16)
                == geo_point_to_s2cell(139.7, 35.6, 16)""",
    """SELECT '54906cc' AS t11, '54906c89' AS t14, true AS rt""",
)

q(
    "buildschema_agg",
    """datatable (d: dynamic) [
      dynamic({"a": 1, "b": "x"}),
      dynamic({"a": 2.5, "c": [1, 2]}),
      dynamic({"a": "s", "b": "y"})
    ]
    | summarize sch = buildschema(d)""",
    """SELECT '{"a": ["long", "real", "string"], "b": "string", "c": ["long"]}' AS sch""",
)

q(
    "url_encode_component_fn",
    """print a = url_encode_component("a b&c+d"), b = url_encode("a b"),
             c = url_decode_component("a%20b%26c")""",
    """SELECT 'a%20b%26c%2Bd' AS a, 'a+b' AS b, 'a b&c' AS c""",
)

q(
    "range_timespan_fractional",
    """range t from 0h to 1h step 10m
    | summarize n = count(), mx = tostring(max(t))
    | extend fsum = toscalar(range x from 1.5 to 3.0 step 0.5
                             | summarize s = sum(x))""",
    """SELECT CAST(7 AS BIGINT) AS n, '01:00:00' AS mx, 9.0 AS fsum""",
)

q(
    "llm_quality_filter",
    """documents
    | evaluate quality_filter(text, 5)
    | project doc_id, qf_words, qf_stopword_hits
    | sort by doc_id asc""",
    r"""WITH t AS (
      SELECT doc_id,
             [x FOR x IN regexp_split_to_array(lower(trim(text)), '\s+')
              IF x <> ''] AS toks
      FROM documents)
    SELECT doc_id, CAST(len(toks) AS BIGINT) AS qf_words,
           CAST(len(list_intersect(list_distinct(toks),
                ['the','be','to','of','and','that','have','with'])) AS BIGINT)
             AS qf_stopword_hits
    FROM t ORDER BY doc_id""",
)

q(
    "extract_all_multigroup",
    """print a = tostring(extract_all(@"(\\w)(\\d)", "a1 b2")),
             b = tostring(extract_all(@"(\\d+)", "x1 y22"))""",
    """SELECT '[["a","1"],["b","2"]]' AS a, '["1","22"]' AS b""",
)

q(
    "pack_array_heterogeneous",
    """print p = pack_array(1, "a", true),
             q = tostring(pack_array(1, 2, 3)),
             r = tostring(pack_array(1, "a", true)[1])""",
    """SELECT '[1,"a",true]' AS p, '[1,2,3]' AS q, 'a' AS r""",
)

q(
    "stored_function_source_call",
    """let top_nations = (lim: long, rk: long = 0) {
        nation | where n_regionkey == rk | top lim by n_nationkey desc
        | project n_nationkey, n_name
    };
    top_nations(3, 1)""",
    """SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 1
       ORDER BY n_nationkey DESC LIMIT 3""",
)

q(
    "lambda_default_params",
    """let scale = (n: long, m: long = 10) { n * m };
    let lim = 2;
    nation | take lim | project v = scale(n_nationkey + 1)
    | sort by v asc""",
    """SELECT (n_nationkey + 1) * 10 AS v FROM nation
       ORDER BY n_nationkey LIMIT 2""",
)

q(
    "todatetime_string_forms",
    """print a = todatetime("03/05/2024"), b = todatetime("5 March 2024"),
             c = todatetime("Mar 5 2024"),
             d = todatetime("Tue, 05 Mar 2024 07:08:09"),
             e = isnull(todatetime("garbage"))""",
    """SELECT TIMESTAMP '2024-03-05' AS a, TIMESTAMP '2024-03-05' AS b,
              TIMESTAMP '2024-03-05' AS c,
              TIMESTAMP '2024-03-05 07:08:09' AS d, true AS e""",
)

q(
    "totimespan_string_forms",
    """print a = tostring(totimespan("1.02:03:04.5")),
             b = tostring(totimespan("02:03")),
             c = isnull(totimespan("bogus")),
             d = tostring(totimespan("-00:30:00")),
             e = tostring(totimespan("2"))""",
    """SELECT '1.02:03:04.5000000' AS a, '02:03:00' AS b, true AS c,
              '-00:30:00' AS d, '2.00:00:00' AS e""",
)

q(
    "timespan_tostring_fns",
    """print a = tostring(1h), b = tostring(90m),
             c = tostring(1d + 2h + 3m + 4s), d = tostring(-30m),
             e = tostring(totimespan("00:00:01.5")),
             f = strcat("t=", 30m)""",
    """SELECT '01:00:00' AS a, '01:30:00' AS b, '1.02:03:04' AS c,
              '-00:30:00' AS d, '00:00:01.5000000' AS e, 't=00:30:00' AS f""",
)

q(
    "typed_literal_ctors",
    """print a = long(7) + int(3), b = real(2.5) * 2, c = bool(true),
             d = long(null), e = long(-12)""",
    """SELECT CAST(10 AS BIGINT) AS a, 5.0 AS b, true AS c,
              CAST(NULL AS BIGINT) AS d, CAST(-12 AS BIGINT) AS e""",
)

q(
    "dynamic_heterogeneous_literal",
    """print v = tostring(dynamic({"x": {"y": [1, {"z": 2}]}}).x.y[1].z),
             w = tostring(dynamic([1, "a", true])[1])""",
    """SELECT '2' AS v, 'a' AS w""",
)

q(
    "indexof_countof_extended",
    """print a = indexof("abcabc", "bc", 2), b = indexof("abcabc", "bc", 0, 6, 2),
             c = indexof("abcdba", "b", -3),
             d = array_index_of(dynamic([1, 2, 3, 2]), 2, 2),
             e = array_index_of(dynamic([1, 2, 3, 2]), 2, 0, -1, 2),
             f = countof("aaa", "aa"), g = countof("a,b.c", "[,.]", "regex")""",
    """SELECT CAST(4 AS BIGINT) AS a, CAST(4 AS BIGINT) AS b,
              CAST(4 AS BIGINT) AS c, CAST(3 AS BIGINT) AS d,
              CAST(3 AS BIGINT) AS e, CAST(2 AS BIGINT) AS f,
              CAST(2 AS BIGINT) AS g""",
)

q(
    "substring_negative_start",
    """print a = substring("123456", -2, 2), b = substring("123456", 1, 2),
             c = substring("hello", -2, 3), d = substring("hello", 2)""",
    """SELECT '56' AS a, '23' AS b, 'lo' AS c, 'llo' AS d""",
)

q(
    "array_negative_index",
    """print a = dynamic([1, 2, 3])[-1], b = dynamic([1, 2, 3])[0],
             c = dynamic([1, 2, 3])[5], d = tostring(todynamic("[10,20,30]")[-1]),
             e = tostring(parse_json("[1,2]")[-5])""",
    """SELECT 3 AS a, 1 AS b, CAST(NULL AS BIGINT) AS c, '30' AS d, '' AS e""",
)

q(
    "find_term_withsource",
    """find withsource=T in (region) "AFRICA"
    | project T, r_name""",
    """SELECT 'region' AS T, r_name FROM region WHERE r_name = 'AFRICA'""",
)

q(
    "find_withsource_where",
    """find withsource=Src in (region, nation) where true
    | summarize n = count() by Src
    | sort by Src asc""",
    """SELECT 'nation' AS Src, CAST(COUNT(*) AS BIGINT) AS n FROM nation
       UNION ALL
       SELECT 'region' AS Src, CAST(COUNT(*) AS BIGINT) AS n FROM region
       ORDER BY Src""",
)

q(
    "llm_dedup_jaccard",
    # round 9: DuckDB brute-force twin — all pairs of trimmed docs, exact
    # char-5-gram Jaccard >= 0.8 (short docs use the whole-text singleton
    # gram, matching _jaccard_feature_udf short_gram), min-id transitive
    # components via recursive CTE, plus empty-after-trim pass-throughs.
    # Hash grams to UBIGINT so the 125k pairwise list ops stay cheap; the
    # LEAST/GREATEST size prefilter is implied by Jaccard >= 0.8.
    """documents
    | evaluate dedup_jaccard(text, doc_id, 0.8)
    | summarize n = count()""",
    """WITH RECURSIVE docs AS (
         SELECT doc_id AS id, TRIM(CAST(text AS VARCHAR)) AS t FROM documents
       ),
       nonempty AS (
         SELECT id,
                CASE WHEN LENGTH(t) >= 5
                     THEN list_distinct(list_transform(range(1, LENGTH(t) - 3),
                          i -> hash(substring(t, i, 5))))
                     ELSE [hash(t)] END AS g
         FROM docs WHERE LENGTH(t) > 0
       ),
       sized AS (SELECT id, g, len(g) AS sz FROM nonempty),
       pairs AS (
         SELECT a.id AS src, b.id AS dst
         FROM sized a JOIN sized b
           ON a.id < b.id
          AND LEAST(a.sz, b.sz) >= 0.8 * GREATEST(a.sz, b.sz)
          AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
              / len(list_distinct(list_concat(a.g, b.g))) >= 0.8
       ),
       edges AS (SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs),
       reach AS (
         SELECT id AS node, id AS r FROM nonempty
         UNION
         SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
       ),
       kept AS (SELECT node FROM reach GROUP BY node HAVING MIN(r) = node)
       SELECT CAST((SELECT COUNT(*) FROM kept)
                   + (SELECT COUNT(*) FROM docs WHERE LENGTH(t) = 0)
              AS BIGINT) AS n""",
)

q(
    "set_equals_isutf8_fns",
    """print a = set_equals(dynamic([1, 2, 2]), dynamic([2, 1])),
             b = set_equals(dynamic([1]), dynamic([2])),
             c = isutf8("hi"), d = isutf8("")""",
    """SELECT true AS a, false AS b, true AS c, true AS d""",
)

q(
    "geo_line_polygon_fns2",
    """print p = round(geo_polygon_perimeter(dynamic({"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,1],[0,0]]]})), 0),
             c = geo_line_centroid(dynamic({"type":"LineString","coordinates":[[0,0],[2,0]]})),
             cp = geo_closest_point_on_line(1.0, 1.0, dynamic({"type":"LineString","coordinates":[[0,0],[2,0]]}))""",
    """SELECT 444763.0 AS p,
              '{"type": "Point", "coordinates": [1.0, 0.0]}' AS c,
              '{"type": "Point", "coordinates": [1.0, 0.0]}' AS cp""",
)

q(
    "geo_wkt_carriers",
    # round 6: WKT <-> GeoJSON converters + WKT accepted directly by the
    # scalar geo family (here: geo_distance_2points via a WKT point pair,
    # polygon area from a WKT polygon)
    """print gj = geo_wkt_to_geojson('LINESTRING (0 0, 2 0)'),
             w = geo_geojson_to_wkt('{"type": "Point", "coordinates": [1.5, -2.0]}'),
             a = round(geo_polygon_area(geo_wkt_to_geojson('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')), 0),
             ml = geo_geojson_to_wkt('{"type": "MultiPolygon", "coordinates": []}')""",
    """SELECT '{"type": "LineString", "coordinates": [[0.0, 0.0], [2.0, 0.0]]}' AS gj,
              'POINT (1.5 -2)' AS w,
              12363718921.0 AS a,
              'MULTIPOLYGON EMPTY' AS ml""",
)

q(
    "tuple_extend_fit_line",
    """print y = dynamic([1.0, 2.0, 3.0, 4.0])
    | extend (rsquare, slope, variance, rvariance, interception, line_fit) = series_fit_line(y)
    | project rsq = round(rsquare, 6), slope = round(slope, 6),
              icpt = round(interception, 6), fit = tostring(line_fit)""",
    """SELECT 1.0 AS rsq, 1.0 AS slope, 1.0 AS icpt,
              '[1.0,2.0,3.0,4.0]' AS fit""",
)

q(
    "series_fft_roundtrip",
    """print y = dynamic([1.0, 0.0, 0.0, 0.0])
    | extend (re, im) = series_fft(y)
    | extend (back, back_im) = series_ifft(re, im)
    | project re = tostring(re), im = tostring(im), back = tostring(back)""",
    """SELECT '[1.0,1.0,1.0,1.0]' AS re, '[0.0,0.0,0.0,0.0]' AS im,
              '[1.0,0.0,0.0,0.0]' AS back""",
)

q(
    "series_fit_2lines_split",
    """print y = dynamic([1.0, 1.0, 1.0, 1.0, 9.0, 9.0, 9.0, 9.0])
    | extend (rsquare, split_idx, variance, rvariance, line_fit) = series_fit_2lines(y)
    | project rsq = round(rsquare, 6), split_idx = tolong(split_idx),
              rvar = round(rvariance, 6)""",
    """SELECT 1.0 AS rsq, CAST(4 AS BIGINT) AS split_idx, 0.0 AS rvar""",
)

q(
    "activity_metrics_retention",
    # window-over-window retention/churn: rates are measured against the
    # PREVIOUS day's actives (vs new_activity_metrics' next-period flavor)
    """events
    | evaluate activity_metrics(user_id, ts, 1d)
    | sort by Timeline asc""",
    """WITH b AS (SELECT DISTINCT user_id,
                CAST(to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) * 86400) AS TIMESTAMP) AS d
         FROM events),
       f AS (SELECT user_id, MIN(d) AS fd FROM b GROUP BY 1),
       c AS (SELECT d, COUNT(DISTINCT b.user_id) AS dc,
                    COUNT(DISTINCT CASE WHEN f.fd = b.d THEN b.user_id END) AS nv
             FROM b JOIN f USING (user_id) GROUP BY 1),
       r AS (SELECT cur.d, COUNT(DISTINCT cur.user_id) AS ret
             FROM b cur JOIN b prv
               ON prv.user_id = cur.user_id AND prv.d = cur.d - INTERVAL 1 DAY
             GROUP BY 1),
       p AS (SELECT d + INTERVAL 1 DAY AS d, COUNT(DISTINCT user_id) AS pt
             FROM b GROUP BY 1)
       SELECT c.d AS Timeline, CAST(dc AS BIGINT) AS dcount_values,
              CAST(nv AS BIGINT) AS dcount_newvalues,
              ROUND(CAST(COALESCE(ret, 0) AS DOUBLE) / pt, 4) AS retention_rate,
              ROUND(CAST(pt - COALESCE(ret, 0) AS DOUBLE) / pt, 4) AS churn_rate
       FROM c LEFT JOIN r ON c.d = r.d LEFT JOIN p ON c.d = p.d
       ORDER BY 1""",
)

q(
    "new_activity_metrics_cohort_dims",
    # round 9: cohort dimensions (closes the r5 simplification) — every
    # metric per (period, event_type); "new"/retention are measured WITHIN
    # the dimension combination (independent cohort streams)
    """events
    | evaluate new_activity_metrics(user_id, ts, 1d, event_type)
    | sort by Timeline asc, event_type asc""",
    """WITH pairs AS (SELECT DISTINCT user_id, event_type,
            CAST(to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) * 86400) AS TIMESTAMP) AS p
        FROM events),
     firsts AS (SELECT user_id, event_type, MIN(p) AS f
                FROM pairs GROUP BY 1, 2),
     agg AS (
       SELECT p, pairs.event_type, COUNT(*) AS act,
              COUNT(*) FILTER (WHERE p = f) AS new,
              COUNT(*) FILTER (WHERE EXISTS (
                 SELECT 1 FROM pairs n
                 WHERE n.user_id = pairs.user_id
                   AND n.event_type = pairs.event_type
                   AND n.p = pairs.p + INTERVAL 1 DAY)) AS ret
       FROM pairs JOIN firsts USING (user_id, event_type) GROUP BY 1, 2)
     SELECT p AS Timeline, event_type,
            CAST(act AS BIGINT) AS dcount_values,
            CAST(new AS BIGINT) AS dcount_new_values,
            CAST(ret AS BIGINT) AS dcount_retained_values,
            CAST(act - ret AS BIGINT) AS dcount_churn_values,
            ROUND(CAST(ret AS DOUBLE) / act, 4) AS retention_rate,
            ROUND(CAST(act - ret AS DOUBLE) / act, 4) AS churn_rate
     FROM agg ORDER BY 1, 2""",
)

q(
    "activity_metrics_cohort_dims",
    # round 9: window-over-window retention/churn per (period, event_type)
    """events
    | evaluate activity_metrics(user_id, ts, 1d, event_type)
    | sort by Timeline asc, event_type asc""",
    """WITH b AS (SELECT DISTINCT user_id, event_type,
                CAST(to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) * 86400) AS TIMESTAMP) AS d
         FROM events),
       f AS (SELECT user_id, event_type, MIN(d) AS fd FROM b GROUP BY 1, 2),
       c AS (SELECT d, b.event_type, COUNT(DISTINCT b.user_id) AS dc,
                    COUNT(DISTINCT CASE WHEN f.fd = b.d THEN b.user_id END) AS nv
             FROM b JOIN f USING (user_id, event_type) GROUP BY 1, 2),
       r AS (SELECT cur.d, cur.event_type, COUNT(DISTINCT cur.user_id) AS ret
             FROM b cur JOIN b prv
               ON prv.user_id = cur.user_id AND prv.event_type = cur.event_type
              AND prv.d = cur.d - INTERVAL 1 DAY
             GROUP BY 1, 2),
       p AS (SELECT d + INTERVAL 1 DAY AS d, event_type,
                    COUNT(DISTINCT user_id) AS pt
             FROM b GROUP BY 1, 2)
       SELECT c.d AS Timeline, c.event_type AS event_type,
              CAST(dc AS BIGINT) AS dcount_values,
              CAST(nv AS BIGINT) AS dcount_newvalues,
              ROUND(CAST(COALESCE(r.ret, 0) AS DOUBLE) / p.pt, 4) AS retention_rate,
              ROUND(CAST(p.pt - COALESCE(r.ret, 0) AS DOUBLE) / p.pt, 4) AS churn_rate
       FROM c LEFT JOIN r ON c.d = r.d AND c.event_type = r.event_type
              LEFT JOIN p ON c.d = p.d AND c.event_type = p.event_type
       ORDER BY 1, 2""",
)

q(
    "union_isfuzzy_skips_unknown",
    """union isfuzzy=true nation, no_such_table | count""",
    """SELECT COUNT(*) AS Count FROM nation""",
)

q(
    "array_sort_companion_arrays",
    # multi-array sort: companions reorder by array1's permutation; a
    # length-mismatched companion comes back null [KQL array_sort_asc]
    """print a = dynamic([3, 1, 2]), b = dynamic(['c', 'a', 'b']), m = dynamic(['only'])
    | extend (sa, sb) = array_sort_asc(a, b), (da, dm) = array_sort_desc(a, m)
    | project sa = tostring(sa), sb = tostring(sb), da = tostring(da),
              mismatched = tostring(dm)""",
    """SELECT '[1,2,3]' AS sa, '["a","b","c"]' AS sb, '[3,2,1]' AS da,
              '' AS mismatched""",  # KQL tostring(null) == "" on every carrier
)

q(
    "in_tabular_semi_join",
    # tabular `in` as a where-conjunct lowers to a leftsemi join (no value
    # materialization; plan pinned in tests/test_plans.py)
    """lineitem
    | where l_orderkey in (orders | where o_totalprice > 300000 | project o_orderkey)
    | count""",
    """SELECT COUNT(*) AS Count FROM lineitem
       WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000)""",
)

q(
    "notin_tabular_anti_join",
    """customer
    | where c_custkey !in (orders | project o_custkey)
    | count""",
    """SELECT COUNT(*) AS Count FROM customer
       WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)""",
)

q(
    "in_tabular_under_or",
    # non-conjunct position: documented-eager bounded collect (volatile, not
    # plan-cached)
    """nation
    | where n_name == 'FRANCE' or n_regionkey in (region | where r_name == 'ASIA' | project r_regionkey)
    | summarize c = count()""",
    """SELECT COUNT(*) AS c FROM nation
       WHERE n_name = 'FRANCE'
          OR n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')""",
)

q(
    "let_view_bare_join",
    """let asia = view () { region | where r_name == 'ASIA' };
    nation
    | join kind=inner asia on $left.n_regionkey == $right.r_regionkey
    | project n_name
    | sort by n_name asc""",
    """SELECT n_name FROM nation JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA' ORDER BY n_name""",
)

q(
    "bracket_string_key_access",
    """print d = dynamic({'a b': {'c d': 7}})
    | project v = tolong(d['a b']['c d'])""",
    """SELECT CAST(7 AS BIGINT) AS v""",
)

q(
    "parse_regex_flags_i",
    """print s = 'Level=WARN msg=disk'
    | parse kind=regex flags=i s with 'level=' lvl:string ' msg=' msg:string
    | project lvl, msg""",
    """SELECT 'WARN' AS lvl, 'disk' AS msg""",
)

q(
    "graph_mark_components",
    # component id = smallest reachable node id (deterministic, unlike
    # Kusto's arbitrary ids — documented delta); twin = recursive closure
    """datatable(s:string, d:string)['a','b', 'b','c', 'x','y', 'q','q']
    | make-graph s --> d
    | graph-mark-components
    | sort by node_id asc""",
    """WITH RECURSIVE e(s, d) AS (VALUES ('a','b'),('b','c'),('x','y'),('q','q')),
       sym AS (SELECT s, d FROM e UNION SELECT d, s FROM e),
       nodes AS (SELECT DISTINCT s AS n FROM sym),
       reach(n, m) AS (
         SELECT n, n FROM nodes
         UNION
         SELECT r.n, sym.d FROM reach r JOIN sym ON sym.s = r.m
       )
       SELECT n AS node_id, MIN(m) AS ComponentId FROM reach GROUP BY n
       ORDER BY n""",
)

q(
    "graph_mark_components_strong",
    # round 9 (kind=strong shipped): two 2-cycles joined by a one-way
    # bridge — SCCs are {1,2} and {3,4}. The twin computes SCC ids from
    # first principles: comp(n) = min{m : n reaches m AND m reaches n}
    # via a recursive-CTE transitive closure.
    """datatable(src:long, dst:long)[
       1, 2,  2, 1,  2, 3,  3, 4,  4, 3]
    | make-graph src --> dst
    | graph-mark-components kind=strong with_component_id=comp
    | sort by node_id asc""",
    """WITH RECURSIVE e(s, d) AS (
         VALUES (CAST(1 AS BIGINT), CAST(2 AS BIGINT)), (2, 1), (2, 3),
                (3, 4), (4, 3)),
       nodes AS (SELECT DISTINCT n FROM (SELECT s AS n FROM e
                                         UNION SELECT d FROM e)),
       reach(n, m) AS (
         SELECT n, n FROM nodes
         UNION
         SELECT r.n, e.d FROM reach r JOIN e ON e.s = r.m
       )
       SELECT a.n AS node_id, MIN(a.m) AS comp
       FROM reach a JOIN reach b ON a.n = b.m AND a.m = b.n
       GROUP BY a.n ORDER BY a.n""",
)

q(
    "graph_match_varlen_deep",
    # round 9: the former *..8 cap is raised to 16 (incremental-frontier
    # unroll) — a 10-hop reachability sweep over an 11-node chain, counted
    # against a recursive-CTE walk enumeration
    """datatable(s:long, d:long)[
       1,2, 2,3, 3,4, 4,5, 5,6, 6,7, 7,8, 8,9, 9,10, 10,11]
    | make-graph s --> d
    | graph-match (a)-[e*1..10]->(b)
      project an = a.node_id, bn = b.node_id, hops = tolong(array_length(e))
    | summarize n = count(), mx = max(hops)""",
    """WITH RECURSIVE e(s, d) AS (
         VALUES (CAST(1 AS BIGINT), CAST(2 AS BIGINT)), (2,3), (3,4), (4,5),
                (5,6), (6,7), (7,8), (8,9), (9,10), (10,11)),
       walk(a, b, h) AS (
         SELECT s, d, 1 FROM e
         UNION ALL
         SELECT w.a, e.d, w.h + 1 FROM walk w JOIN e ON e.s = w.b
         WHERE w.h < 10
       )
       SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(MAX(h) AS BIGINT) AS mx
       FROM walk""",
)

q(
    "has_any_dynamic_terms",
    """print s = 'blue widget'
    | project a = s has_any (dynamic(['blue', 'red'])),
              b = s has_all (dynamic(['blue', 'widget'])),
              c = s has_any (dynamic(['green']))""",
    """SELECT true AS a, true AS b, false AS c""",
)

q(
    "database_scoped_table",
    # single-database engine: cluster()/database() qualifiers resolve to the
    # bare catalog table (documented delta)
    """cluster('help').database('Samples').nation | count""",
    """SELECT COUNT(*) AS Count FROM nation""",
)

q(
    "preview_sample_count",
    """nation
    | sort by n_nationkey asc
    | evaluate preview(3)""",
    """SELECT n_nationkey, n_name, n_regionkey,
              (SELECT COUNT(*) FROM nation) AS Count
       FROM nation ORDER BY n_nationkey LIMIT 3""",
)

q(
    "format_datetime_literal_delims",
    """print f = format_datetime(datetime(2024-02-05 11:22:33), 'yyyy-MM-dd [HH:mm:ss]')""",
    """SELECT '2024-02-05 [11:22:33]' AS f""",
)

q(
    "treepath_paths",
    """print p = tostring(treepath(dynamic({'a': {'b': 1, 'c': [5, 6]}})))""",
    '''SELECT '["[''a'']","[''a''][''b'']","[''a''][''c'']","[''a''][''c''][]"]' AS p''',
)

q(
    "table_fn_source",
    """table('nation') | count""",
    """SELECT COUNT(*) AS Count FROM nation""",
)

q(
    "percentiles_array_agg",
    """lineitem
    | summarize p = percentiles_array(l_quantity, dynamic([25, 50, 75])) by l_returnflag
    | project l_returnflag, p = tostring(p)
    | sort by l_returnflag asc""",
    """SELECT l_returnflag,
              CAST(to_json([quantile_cont(l_quantity, 0.25),
                            quantile_cont(l_quantity, 0.50),
                            quantile_cont(l_quantity, 0.75)]) AS VARCHAR) AS p
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
)

q(
    "series_stats_tuple_assign",
    """print y = dynamic([3.0, 1.0, 4.0, 1.0])
    | extend (mn, mnidx, mx, mxidx, avg, sd, var) = series_stats(y)
    | project mn, mnidx = tolong(mnidx), mx, mxidx = tolong(mxidx),
              avg, var = round(var, 4)""",
    """SELECT 1.0 AS mn, CAST(1 AS BIGINT) AS mnidx, 4.0 AS mx,
              CAST(2 AS BIGINT) AS mxidx, 2.25 AS avg, 2.25 AS var""",
)

q(
    "series_decompose_tuple_assign",
    # period-2 alternating series: residual ~ 0, baseline reproduces the
    # signal; checked via stats over the destructured components
    """print y = dynamic([1.0, 2.0, 1.0, 2.0, 1.0, 2.0, 1.0, 2.0])
    | extend (b, s, t, r) = series_decompose(y, 2)
    | project rmax = round(todouble(series_stats_dynamic(r).max), 6),
              bavg = round(todouble(series_stats_dynamic(b).avg), 6),
              samp = round(todouble(series_stats_dynamic(s).max), 6)""",
    """SELECT 0.0 AS rmax, 1.5 AS bavg, 0.5 AS samp""",
)

q(
    "mv_expand_bagexpansion",
    # default (bag): one single-property bag per row; array: [key, value]
    """print d = dynamic({'a': 1, 'b': 'x'})
    | mv-expand bagexpansion=array d
    | project d = tostring(d)
    | sort by d asc""",
    """SELECT * FROM (VALUES ('["a",1]'), ('["b","x"]')) t(d) ORDER BY d""",
)

q(
    "mv_expand_bag_default",
    """print d = dynamic({'a': 1, 'b': 'x'})
    | mv-expand d
    | project d = tostring(d)
    | sort by d asc""",
    """SELECT * FROM (VALUES ('{"a":1}'), ('{"b":"x"}')) t(d) ORDER BY d""",
)

q(
    "series_fit_poly_quadratic",
    # y = (x+1)^2 on x = 0..4 -> coefficients [1, 2, 1] high-order-first
    """print y = dynamic([1.0, 4.0, 9.0, 16.0, 25.0])
    | extend (rsq, c, v, rv, fit) = series_fit_poly(y, 2)
    | project rsq = round(rsq, 6), c2 = round(todouble(c[0]), 6),
              c1 = round(todouble(c[1]), 6), c0 = round(todouble(c[2]), 6)""",
    """SELECT 1.0 AS rsq, 1.0 AS c2, 2.0 AS c1, 1.0 AS c0""",
)

q(
    "bin_auto_set_property",
    # `set query_bin_auto_size` + bin_auto(ts) ≡ bin(ts, 1d) [KQL]
    """set query_bin_auto_size = 1d;
    events
    | summarize c = count() by d = bin_auto(ts)
    | sort by d asc""",
    """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS d,
              COUNT(*) AS c
       FROM events GROUP BY 1 ORDER BY 1""",
)

q(
    "base64_fromarray_roundtrip",
    # base64_encode_fromarray inverts base64_decode_toarray
    """print a = base64_encode_fromarray(dynamic([75, 117, 115, 116, 111])),
             rt = base64_encode_fromarray(base64_decode_toarray('aGVsbG8='))""",
    """SELECT 'S3VzdG8=' AS a, 'aGVsbG8=' AS rt""",
)

q(
    "series_periods_validate_fn",
    # same period-8 sawtooth as series_periods_detect_fn: lag-8 ACF is the
    # strong fundamental, lag 5 scores weak
    """print y = dynamic([0.0, 1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0,
                          0.0, 1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0,
                          0.0, 1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0,
                          0.0, 1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0])
    | extend (periods, scores) = series_periods_validate(y, 8.0, 5.0)
    | project p0 = todouble(periods[0]), p1 = todouble(periods[1]),
              strong8 = todouble(scores[0]) > 0.5,
              weak5 = todouble(scores[1]) < 0.5""",
    """SELECT 8.0 AS p0, 5.0 AS p1, true AS strong8, true AS weak5""",
)

q(
    "llm_chunk_text",
    # token-window chunking: max_tokens=8, overlap=2 (step 6); predecessor-
    # covered trailing windows suppressed on both sides
    """documents
    | where doc_id < 50
    | evaluate chunk_text(text, 8, 2)
    | project doc_id, chunk_id, chunk""",
    r"""WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
           array_to_string(toks[k*6+1 : k*6+8], ' ') AS chunk
    FROM t, LATERAL (
      SELECT unnest(range(CAST(ceil(greatest(len(toks), 1) / 6.0) AS BIGINT))) AS k
    ) u
    WHERE k = 0 OR (k-1)*6 + 8 < len(toks)""",
)

q(
    "llm_pii_redact",
    """datatable(id: long, t: string) [
      1, "mail me at bob.smith+x@corp.example.org now",
      2, "SSN 123-45-6789 and card 4111 1111 1111 1111",
      3, "call (555) 123-4567 or +44 2071234567",
      4, "server at 10.0.42.7 port 8080",
      5, "clean text with no identifiers",
    ]
    | evaluate pii_redact(t)
    | project id, pii_clean, pii_found""",
    """SELECT 1 AS id, 'mail me at [EMAIL] now' AS pii_clean, true AS pii_found
       UNION ALL SELECT 2, 'SSN [SSN] and card [CC]', true
       UNION ALL SELECT 3, 'call [PHONE] or [PHONE]', true
       UNION ALL SELECT 4, 'server at [IP] port 8080', true
       UNION ALL SELECT 5, 'clean text with no identifiers', false""",
)

q(
    "window_rank_restart",
    # restart predicate opens a new rank segment AT the matching row; ranks
    # follow the serialized (desc-by-construction) order [KQL row_rank_*]
    """datatable(Airline: string, Departures: long) [
      "TA", 12, "TA", 11, "TA", 11, "BC", 10, "BC", 10, "BC", 9
    ]
    | serialize
    | extend rk = row_rank_min(Departures, Airline != prev(Airline)),
             dr = row_rank_dense(Departures, Airline != prev(Airline))
    | project Airline, Departures, rk, dr""",
    """SELECT 'TA' AS Airline, 12 AS Departures, 1 AS rk, 1 AS dr
       UNION ALL SELECT 'TA', 11, 2, 2
       UNION ALL SELECT 'TA', 11, 2, 2
       UNION ALL SELECT 'BC', 10, 1, 1
       UNION ALL SELECT 'BC', 10, 1, 1
       UNION ALL SELECT 'BC', 9, 3, 2""",
)

q(
    "declare_query_parameters",
    # declared defaults bind when no query_parameters option is supplied;
    # kql(options={'query_parameters': {...}}) overrides per call
    """declare query_parameters(MinQty: real = 45.0, Flag: string = "R",
                                Cut: datetime = datetime(1996-06-01));
    lineitem
    | where l_quantity >= MinQty and l_returnflag == Flag and l_shipdate < Cut
    | summarize n = count()""",
    """SELECT COUNT(*) AS n FROM lineitem
       WHERE l_quantity >= 45.0 AND l_returnflag = 'R'
         AND l_shipdate < TIMESTAMP '1996-06-01'""",
)

q(
    "geo_azimuth_angle_fns",
    # bearings: due north 0, east pi/2, south pi; angle at the origin
    # between north and east lines is pi/2
    """print az_n = round(geo_azimuth(0.0, 0.0, 0.0, 1.0), 6),
             az_e = round(geo_azimuth(0.0, 0.0, 1.0, 0.0), 6),
             az_s = round(geo_azimuth(0.0, 0.0, 0.0, -1.0), 6),
             ang = round(geo_angle(0.0, 1.0, 0.0, 0.0, 1.0, 0.0), 6)""",
    """SELECT 0.0 AS az_n, 1.570796 AS az_e, 3.141593 AS az_s,
              1.570796 AS ang""",
)

q(
    "geo_geohash_neighbors_fn",
    # expected set matches the published geohash neighbor algorithm for
    # 'gbsuv' (n gbsvj, s gbsut, e gbsuy, w gbsuu + the four diagonals)
    """print g = 'gbsuv'
    | mv-expand nb = geo_geohash_neighbors(g) to typeof(string)
    | sort by nb asc""",
    """SELECT 'gbsuv' AS g, nb FROM (VALUES ('gbsus'), ('gbsut'), ('gbsuu'),
       ('gbsuw'), ('gbsuy'), ('gbsvh'), ('gbsvj'), ('gbsvn')) t(nb)
       ORDER BY nb""",
)

q(
    "geo_s2cell_neighbors_polygon",
    # property twin: 8 same-level neighbors, self excluded, neighborhood is
    # symmetric, and the cell polygon is a closed 5-point ring
    """print tok = geo_point_to_s2cell(-122.192253, 47.615554, 11)
    | extend nb = geo_s2cell_neighbors(tok),
             poly = geo_s2cell_to_polygon(tok)
    | project n = array_length(nb),
              self_excluded = array_index_of(nb, tok) < 0,
              symmetric = set_has_element(geo_s2cell_neighbors(tostring(nb[0])), tok),
              ring_closed = todouble(extractjson("$.coordinates[0][0][0]", poly))
                            == todouble(extractjson("$.coordinates[0][4][0]", poly)),
              ring_ends = isnull(extractjson("$.coordinates[0][5]", poly))""",
    """SELECT CAST(8 AS INT) AS n, true AS self_excluded,
              true AS symmetric, true AS ring_closed, true AS ring_ends""",
)

q(
    "geo_polygon_distance_fns",
    # inside -> 0; outside distance equals the 2-point distance to the
    # nearest edge point; closest point is the edge foot (1, 0)
    """print inside = geo_distance_point_to_polygon(0.0, 0.0,
        dynamic({"type":"Polygon","coordinates":[[[-1.0,-1.0],[1.0,-1.0],[1.0,1.0],[-1.0,1.0],[-1.0,-1.0]]]})),
      away_eq_ref = abs(geo_distance_point_to_polygon(2.0, 0.0,
        dynamic({"type":"Polygon","coordinates":[[[-1.0,-1.0],[1.0,-1.0],[1.0,1.0],[-1.0,1.0],[-1.0,-1.0]]]}))
        - geo_distance_2points(2.0, 0.0, 1.0, 0.0)) < 1.0,
      cp_lon = round(todouble(extractjson("$.coordinates[0]",
        geo_closest_point_on_polygon(2.0, 0.0,
          dynamic({"type":"Polygon","coordinates":[[[-1.0,-1.0],[1.0,-1.0],[1.0,1.0],[-1.0,1.0],[-1.0,-1.0]]]})))), 6)""",
    """SELECT 0.0 AS inside, true AS away_eq_ref, 1.0 AS cp_lon""",
)

q(
    "geo_polygon_lookup_zones",
    # point-in-polygon lookup join over events-derived points; the twin
    # inlines the rectangle tests (axis-aligned zones -> exact BETWEENs)
    """let zones = datatable(zone:string, shape:string)[
      'sw', '{"type":"Polygon","coordinates":[[[-120.0,-60.0],[0.0,-60.0],[0.0,0.0],[-120.0,0.0],[-120.0,-60.0]]]}',
      'ne', '{"type":"Polygon","coordinates":[[[0.0,0.0],[120.0,0.0],[120.0,60.0],[0.0,60.0],[0.0,0.0]]]}'];
    events
    | extend lon = todouble(event_id % 240) - 119.5,
             lat = todouble(user_id % 120) - 59.5
    | evaluate geo_polygon_lookup(zones, shape, lon, lat)
    | summarize c = count() by zone
    | sort by zone asc""",
    """WITH src AS (
      SELECT CAST(event_id % 240 AS DOUBLE) - 119.5 AS lon,
             CAST(user_id % 120 AS DOUBLE) - 59.5 AS lat
      FROM events)
    SELECT zone, CAST(COUNT(*) AS BIGINT) AS c FROM (
      SELECT 'sw' AS zone FROM src
       WHERE lon BETWEEN -120.0 AND 0.0 AND lat BETWEEN -60.0 AND 0.0
      UNION ALL
      SELECT 'ne' AS zone FROM src
       WHERE lon BETWEEN 0.0 AND 120.0 AND lat BETWEEN 0.0 AND 60.0
    ) m GROUP BY zone ORDER BY zone""",
)

q(
    "geo_line_lookup_radius",
    # radius join against a meridian line; the twin reduces to a distance
    # threshold on the lon offset at the equator-adjacent band (points are
    # constructed inside the line's lat span so the nearest arc point is
    # the perpendicular foot)
    """let roads = datatable(road:string, path:string)[
      'meridian', '{"type":"LineString","coordinates":[[0.0,-45.0],[0.0,45.0]]}'];
    events
    | extend lon = (todouble(event_id % 21) - 10.0) / 10.0,
             lat = todouble(user_id % 80) - 40.0
    | evaluate geo_line_lookup(roads, path, lon, lat, 60000.0)
    | summarize c = count() by road""",
    """WITH src AS (
      SELECT (CAST(event_id % 21 AS DOUBLE) - 10.0) / 10.0 AS lon,
             CAST(user_id % 80 AS DOUBLE) - 40.0 AS lat
      FROM events)
    SELECT 'meridian' AS road, CAST(COUNT(*) AS BIGINT) AS c FROM src
    WHERE 6371009.0 * ASIN(COS(RADIANS(lat)) * ABS(SIN(RADIANS(lon))))
          <= 60000.0""",
)

q(
    "llm_count_tokens",
    # GPT-2-style pre-tokenizer count; the twin runs the IDENTICAL regex
    # (RE2-compatible by construction)
    """documents
    | project doc_id, n = count_tokens(text)
    | summarize total = sum(n), mx = max(n)""",
    r"""SELECT CAST(SUM(len(regexp_extract_all(text,
         '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))) AS BIGINT) AS total,
       CAST(MAX(len(regexp_extract_all(text,
         '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))) AS BIGINT) AS mx
       FROM documents""",
)

q(
    "where_star_has",
    # `* has` = ANY column term-matches; `* !has` = NO column matches
    """part
    | where * has 'blue'
    | summarize pos = count()
    | extend neg = toscalar(part | where * !has 'blue' | count)""",
    r"""WITH m AS (
      SELECT regexp_matches(lower(CAST(p_partkey AS VARCHAR) || ' ' || p_name
               || ' ' || p_brand || ' ' || p_type || ' '
               || CAST(p_size AS VARCHAR)), '\bblue\b') AS hit
      FROM part)
    SELECT CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS pos,
           CAST(SUM(CASE WHEN hit THEN 0 ELSE 1 END) AS BIGINT) AS neg
    FROM m""",
)

q(
    "between_duration_form",
    # `ts between (start .. 1d)` = [start, start + 1d] [KQL]
    """events
    | where ts between (datetime(2024-01-02) .. 1d)
    | summarize inside = count()
    | extend outside = toscalar(events | where ts !between (datetime(2024-01-02) .. 1d) | count)""",
    """SELECT CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) BETWEEN
                TIMESTAMP '2024-01-02' AND TIMESTAMP '2024-01-03'
              THEN 1 ELSE 0 END) AS BIGINT) AS inside,
              CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) BETWEEN
                TIMESTAMP '2024-01-02' AND TIMESTAMP '2024-01-03'
              THEN 0 ELSE 1 END) AS BIGINT) AS outside
       FROM events""",
)

q(
    "string_plus_concat_and_map_bags",
    # KQL `+` concatenates strings; bag functions accept the native MAP
    # carrier (uniform-typed dynamic literals), not only JSON text
    """print s = 'x' + 'y' + tostring(3),
             m = tolong(extractjson('$.b', bag_merge(dynamic({"a": 1}), dynamic({"b": 2})))),
             r = extractjson('$.a', bag_remove_keys(dynamic({"a": 1, "b": 2}), dynamic(['a']))),
             k = tolong(extractjson('$.b', bag_set_key(dynamic({"a": 1}), 'b', 2)))""",
    """SELECT 'xy3' AS s, CAST(2 AS BIGINT) AS m, CAST(NULL AS VARCHAR) AS r,
              CAST(2 AS BIGINT) AS k""",
)

q(
    "union_type_conflict_splits",
    # same column name, different KQL types -> one name_type column per
    # type [KQL union], never silent coercion
    """union (datatable(x:long)[1, 2]), (datatable(x:string)['a'])
    | project x_long, x_string
    | sort by x_long asc nulls last""",
    """SELECT CAST(1 AS BIGINT) AS x_long, CAST(NULL AS VARCHAR) AS x_string
       UNION ALL SELECT 2, NULL
       UNION ALL SELECT NULL, 'a'""",
)

q(
    "in_dynamic_array_operand",
    # array-typed in() operands test element membership [KQL]
    """lineitem
    | where l_linenumber in (range(1, 7, 2), 6) and l_quantity < 5.0
    | summarize n = count() by l_linenumber
    | sort by l_linenumber asc""",
    """SELECT l_linenumber, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem
       WHERE l_linenumber IN (1, 3, 5, 6, 7) AND l_quantity < 5.0
       GROUP BY 1 ORDER BY 1""",
)

q(
    "ingestion_cursor_filter",
    # ingestion metadata [KQL ingestion_time/cursor_*]: an "extent" is a
    # data file, its ingestion time the file's modification timestamp
    # (Spark's hidden _metadata column). cursor_after('') = everything
    # ingested so far; a far-future cursor admits nothing. The oracle
    # reproduces the set algebra, not the timestamps themselves.
    """region
    | where cursor_after('') and isnotnull(ingestion_time())
            and not(cursor_after('99999999999999999'))
    | project r_regionkey, r_name
    | sort by r_regionkey asc""",
    """SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey""",
)

q(
    "extent_metadata_shape",
    # extent_id() is a guid-shaped per-file id, extent_tags() a typed empty
    # list in a file catalog; both are constant across rows of a
    # single-file fixture table
    """region
    | extend eid = extent_id(), tags = tostring(extent_tags())
    | summarize n = count(), ids = dcount(eid) by tags
    | project tags, n, ids""",
    """SELECT '[]' AS tags, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(1 AS BIGINT) AS ids FROM region""",
)

q(
    "ipv4_cidr_list_and_geo_simplify",
    # ipv4_range_to_cidr_list: minimal exact CIDR partition of a range;
    # geo_line_simplify: Douglas-Peucker with great-circle distances
    # (collinear vertices below tolerance drop, endpoints survive)
    """print c = tostring(ipv4_range_to_cidr_list('192.168.1.0', '192.168.2.255')),
             c2 = tostring(ipv4_range_to_cidr_list('10.0.0.3', '10.0.0.10')),
             s = tostring(geo_line_simplify(dynamic({"type":"LineString",
                 "coordinates":[[0,0],[1,0.00001],[2,0],[3,0.00002],[4,0]]}), 100))""",
    """SELECT '["192.168.1.0/24","192.168.2.0/24"]' AS c,
              '["10.0.0.3/32","10.0.0.4/30","10.0.0.8/31","10.0.0.10/32"]' AS c2,
              '{"type": "LineString", "coordinates": [[0.0, 0.0], [4.0, 0.0]]}' AS s""",
)

q(
    "geo_densify_covering_shapes",
    # densify adds geodesic points between endpoints; the s2 covering of a
    # polygon contains the cell of each of its vertices
    """print g = todynamic(tostring(geo_line_densify(dynamic({"type":"LineString",
                 "coordinates":[[0,0],[10,10]]}), 1000)))
    | extend n = array_length(g.coordinates),
             first_lon = toreal(g.coordinates[0][0]),
             cov = geo_polygon_to_s2cells(dynamic({"type":"Polygon",
                 "coordinates":[[[10,10],[10.2,10],[10.2,10.2],[10,10.2],[10,10]]]}), 10)
    | project n, first_lon,
              has_vertex_cell = set_has_element(cov, geo_point_to_s2cell(10.1, 10.1, 10))""",
    """SELECT CAST(4 AS BIGINT) AS n, 0.0 AS first_lon, true AS has_vertex_cell""",
)

q(
    "geo_intersects_and_ipv6_terms",
    # spherical arc-intersection predicates + canonical-form IPv6 term
    # matching (2001:0DB8::0001 in text == 2001:db8::1 argument)
    """print a = geo_intersects_2lines(
               dynamic({"type":"LineString","coordinates":[[0,0],[2,2]]}),
               dynamic({"type":"LineString","coordinates":[[0,2],[2,0]]})),
             b = geo_intersects_2polygons(
               dynamic({"type":"Polygon","coordinates":[[[0,0],[2,0],[2,2],[0,2],[0,0]]]}),
               dynamic({"type":"Polygon","coordinates":[[[5,5],[6,5],[6,6],[5,6],[5,5]]]})),
             c = geo_intersects_line_with_polygon(
               dynamic({"type":"LineString","coordinates":[[-1,1],[3,1]]}),
               dynamic({"type":"Polygon","coordinates":[[[0,0],[2,0],[2,2],[0,2],[0,0]]]})),
             d = has_ipv6('from 2001:0DB8::0001 port 443', '2001:db8::1'),
             e = has_ipv6('from 2001:db8::1:5 port 443', '2001:db8::1'),
             f = has_ipv6_prefix('src=fe80::1', 'fe80:')""",
    """SELECT true AS a, false AS b, true AS c, true AS d, false AS e,
              true AS f""",
)

q(
    "llm_decontaminate_flag",
    # decontaminate in flag mode with the documents table as its own
    # benchmark: every >=5-token doc is self-contaminated, and the distinct
    # colliding-5-gram count equals its distinct 5-gram count. The oracle
    # rebuilds the n-gram algebra in DuckDB list comprehensions.
    """documents
    | evaluate decontaminate(text, doc_id, documents, text, 5, 'flag')
    | project doc_id, contaminated, contaminated_ngrams
    | sort by doc_id asc""",
    """WITH d AS (
         SELECT doc_id,
                list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            x -> x <> '') AS t
         FROM documents
       ), g AS (
         SELECT doc_id,
                CAST(COUNT(DISTINCT array_to_string(t[s:s+4], ' ')) AS BIGINT) AS n
         FROM d, UNNEST(generate_series(1, len(t) - 4)) AS u(s)
         WHERE len(t) >= 5
         GROUP BY 1
       )
       SELECT d.doc_id, g.n IS NOT NULL AS contaminated,
              COALESCE(g.n, 0) AS contaminated_ngrams
       FROM d LEFT JOIN g USING (doc_id)
       ORDER BY d.doc_id""",
)

q(
    "llm_decontaminate_persisted",
    # round 13: decontaminate THROUGH the shared signature store — one
    # minhash_index_build pass (with ngram_n=5) persists both dedup_near's
    # minhash signatures and decontaminate's 5-gram hashes; the gram
    # kernel is deterministic, so flags are IDENTICAL to the in-session
    # path and the same DuckDB n-gram-algebra twin certifies both.
    # extend BEFORE the evaluate forces the eager toscalar build first.
    """let built = toscalar(documents
        | evaluate minhash_index_build(text, doc_id, '/root/repo/spark-warehouse/mh_idx_decon', 0.8, 5)
        | project rows);
    documents
    | extend idx_rows = tolong(built)
    | evaluate decontaminate(text, doc_id, documents, text, 5, 'flag', '/root/repo/spark-warehouse/mh_idx_decon')
    | project doc_id, contaminated, contaminated_ngrams, idx_rows
    | sort by doc_id asc""",
    """WITH d AS (
         SELECT doc_id,
                list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            x -> x <> '') AS t
         FROM documents
       ), g AS (
         SELECT doc_id,
                CAST(COUNT(DISTINCT array_to_string(t[s:s+4], ' ')) AS BIGINT) AS n
         FROM d, UNNEST(generate_series(1, len(t) - 4)) AS u(s)
         WHERE len(t) >= 5
         GROUP BY 1
       )
       SELECT d.doc_id, g.n IS NOT NULL AS contaminated,
              COALESCE(g.n, 0) AS contaminated_ngrams,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS idx_rows
       FROM d LEFT JOIN g USING (doc_id)
       ORDER BY d.doc_id""",
)

q(
    "llm_decontaminate_bench_store",
    # round 15: the 'bench_store' form — benchmark grams served from the
    # persisted store instead of shingling the benchmark per run. The
    # kernel is deterministic, so flags are IDENTICAL to the table form
    # and the same DuckDB n-gram-algebra twin certifies it.
    """let built = toscalar(documents
        | evaluate minhash_index_build(text, doc_id, '/root/repo/spark-warehouse/mh_idx_bstore', 0.8, 5)
        | project rows);
    documents
    | extend idx_rows = tolong(built)
    | evaluate decontaminate(text, doc_id, '/root/repo/spark-warehouse/mh_idx_bstore', 5, 'flag')
    | project doc_id, contaminated, contaminated_ngrams, idx_rows
    | sort by doc_id asc""",
    """WITH d AS (
         SELECT doc_id,
                list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            x -> x <> '') AS t
         FROM documents
       ), g AS (
         SELECT doc_id,
                CAST(COUNT(DISTINCT array_to_string(t[s:s+4], ' ')) AS BIGINT) AS n
         FROM d, UNNEST(generate_series(1, len(t) - 4)) AS u(s)
         WHERE len(t) >= 5
         GROUP BY 1
       )
       SELECT d.doc_id, g.n IS NOT NULL AS contaminated,
              COALESCE(g.n, 0) AS contaminated_ngrams,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS idx_rows
       FROM d LEFT JOIN g USING (doc_id)
       ORDER BY d.doc_id""",
)

q(
    "llm_index_stats_persisted",
    # round 14: index_stats over a freshly built shared minhash store.
    # The oracle pins the CONTRACT, not the store files: rows/data_rows/
    # rows_total all equal count(documents) for a healthy build, the
    # 0.8-threshold band shape is 20x4 by design (_minhash_shape), the
    # kernel shingle width is 3, ngram_n echoes the build argument, and
    # a committed build leaves no in-progress marker. A torn or
    # mid-write store would hash-mismatch here instead of serving.
    """let built = toscalar(documents
        | evaluate minhash_index_build(text, doc_id, '/root/repo/spark-warehouse/mh_idx_stats', 0.8, 5)
        | project rows);
    print ok = 1
    | extend built_rows = tolong(built)
    | evaluate index_stats('/root/repo/spark-warehouse/mh_idx_stats')
    | project kind, rows, data_rows, rows_total, n_bands, rows_per_band,
              shingle_k, ngram_n, in_progress, store_chk_ok""",
    """SELECT 'minhash' AS kind,
              CAST(COUNT(*) AS BIGINT) AS rows,
              CAST(COUNT(*) AS BIGINT) AS data_rows,
              CAST(COUNT(*) AS BIGINT) AS rows_total,
              20 AS n_bands, 4 AS rows_per_band, 3 AS shingle_k,
              5 AS ngram_n, FALSE AS in_progress,
              TRUE AS store_chk_ok
       FROM documents""",
)

q(
    "llm_dedup_lines",
    # corpus-wide C4-rule line dedup: the first occurrence (smallest
    # (id, pos)) of each repeated line survives, later ones are deleted
    """datatable(id:long, t:string)[1, 'a\\nb\\nc', 2, 'b\\nd', 3, 'c\\nb']
    | evaluate dedup_lines(t, id)
    | project id, text_deduped, lines_removed
    | sort by id asc""",
    """SELECT CAST(1 AS BIGINT) AS id,
              'a' || chr(10) || 'b' || chr(10) || 'c' AS text_deduped,
              CAST(0 AS BIGINT) AS lines_removed
       UNION ALL SELECT 2, 'd', 1
       UNION ALL SELECT 3, '', 2""",
)

q(
    "schema_merge_conflicts",
    # schema_merge over unioned getschema outputs: one distinct type keeps
    # it, conflicts mark ERROR(...); ordinals renumber by first appearance
    """union (datatable(a:long, b:string)[] | getschema),
             (datatable(a:string, c:real)[] | getschema)
    | evaluate schema_merge()
    | project ColumnName, ColumnOrdinal, ColumnType
    | sort by ColumnOrdinal asc""",
    """SELECT 'a' AS ColumnName, 0 AS ColumnOrdinal,
              'ERROR(conflicting types: long, string)' AS ColumnType
       UNION ALL SELECT 'b', 1, 'string'
       UNION ALL SELECT 'c', 2, 'real'
       ORDER BY 2""",
)

q(
    "llm_pack_sequences",
    # greedy streaming sequence packing (single shard so the cumulative
    # window is SQL-reproducible): block/offset come from the running
    # token total in id order; docs are never split
    """documents
    | evaluate pack_sequences(text, doc_id, 512, 1)
    | project doc_id, pack_shard, pack_block, pack_offset, pack_tokens
    | sort by doc_id asc""",
    """WITH d AS (
         SELECT doc_id,
                CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                     x -> x <> '')) AS BIGINT) AS pack_tokens
         FROM documents
       ), c AS (
         SELECT doc_id, pack_tokens,
                SUM(pack_tokens) OVER (ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) - pack_tokens AS s
         FROM d
       )
       SELECT doc_id, CAST(0 AS BIGINT) AS pack_shard,
              CAST(FLOOR(s / 512) AS BIGINT) AS pack_block,
              CAST(s % 512 AS BIGINT) AS pack_offset, pack_tokens
       FROM c ORDER BY doc_id""",
)

q(
    "llm_sample_stratified_counts",
    # exact stratified sampling: every stratum keeps ceil(fraction * n)
    # rows — WHICH rows is seed-random, but the per-stratum count is an
    # exact deterministic contract the oracle can state
    """documents
    | evaluate sample_stratified(lang, 0.25)
    | summarize n = count() by lang
    | sort by lang asc""",
    """SELECT lang, CAST(CEIL(0.25 * COUNT(*)) AS BIGINT) AS n
       FROM documents GROUP BY lang ORDER BY lang""",
)

q(
    "llm_split_by_hash",
    # round 15: deterministic labeled train/val/test split — the
    # assignment is pure BIGINT LCG arithmetic, so the oracle reproduces
    # every per-row label exactly (500 rows hash-compared), not just the
    # proportions. Stability under growth is structural (each row's label
    # depends only on its own id + the seed).
    """documents
    | evaluate split_by_hash(doc_id, 42, 'train', 90, 'val', 5, 'test', 5)
    | project doc_id, split""",
    """SELECT doc_id,
              CASE WHEN b < 90 THEN 'train'
                   WHEN b < 95 THEN 'val'
                   ELSE 'test' END AS split
       FROM (SELECT doc_id,
                    ((((doc_id % 2147483648) + 2147483648) % 2147483648
                      + 42) * 1103515245 + 12345) % 2147483648 % 100 AS b
             FROM documents)""",
)

q(
    "llm_sample_weighted",
    # round 15: deterministic importance sampling — keep-probability
    # min(1, fraction * weight), decided by the same BIGINT LCG as
    # split_by_hash; the LCG uniform is exact (power-of-two division)
    # and the probability is one IEEE double multiply, so the oracle
    # reproduces the exact row SET, not a statistical bound.
    """documents
    | extend w = strlen(text) / 40.0
    | evaluate sample_weighted(doc_id, w, 0.02, 42)
    | project doc_id""",
    """SELECT doc_id FROM (
         SELECT doc_id,
                ((((doc_id % 2147483648) + 2147483648) % 2147483648
                  + 42) * 1103515245 + 12345) % 2147483648
                / 2147483648.0 AS u,
                CASE WHEN text IS NULL THEN NULL
                     ELSE LEAST(1.0, 0.02 * (length(text) / 40.0)) END AS p
         FROM documents)
       WHERE u < p""",
)

q(
    "llm_sample_to_mixture",
    # round 16: deterministic mixture resampling — the largest subset
    # whose group proportions match the target weights (integer quota
    # rule quota_g = min_h (n_h * w_g) div w_h), each group keeping its
    # quota of smallest seeded-LCG keys, ties by id. Pure BIGINT
    # arithmetic start to finish, so the twin reproduces the exact row
    # SET (per-row ids certified, not just the counts).
    """documents
    | evaluate sample_to_mixture(source, doc_id, 11, 'src1', 3, 'src2', 2, 'src3', 1)
    | project doc_id, source""",
    """WITH t(g, w) AS (VALUES ('src1', 3), ('src2', 2), ('src3', 1)),
       c AS (SELECT t.g, t.w, COALESCE(cnt.n, 0) AS n FROM t
             LEFT JOIN (SELECT source AS g, COUNT(*) AS n FROM documents
                        WHERE doc_id IS NOT NULL
                          AND source IN ('src1','src2','src3')
                        GROUP BY 1) cnt USING (g)),
       qq AS (SELECT c1.g, MIN((c2.n * c1.w) // c2.w) AS quota
              FROM c c1 CROSS JOIN c c2 GROUP BY c1.g),
       r AS (SELECT doc_id, source,
                    ROW_NUMBER() OVER (PARTITION BY source ORDER BY
                      ((((doc_id % 2147483648 + 2147483648) % 2147483648)
                        + 11) * 1103515245 + 12345) % 2147483648,
                      doc_id) AS rn
             FROM documents
             WHERE doc_id IS NOT NULL
               AND source IN ('src1','src2','src3'))
       SELECT doc_id, source FROM r JOIN qq ON r.source = qq.g
       WHERE rn <= qq.quota""",
)

q(
    "llm_upsample_to_mixture",
    # round 16: the repeating dual — the smallest superset matching the
    # target weights (quota_g = max_h (n_h * w_g) div w_h), each row of
    # group g repeated quota div n times plus one extra repeat for the
    # (quota mod n) smallest seeded-LCG keys, numbered 1..k in `rep`.
    # Pure BIGINT, so the twin reproduces the exact row MULTISET
    # including repetition indices.
    """documents
    | evaluate upsample_to_mixture(source, doc_id, 11, 'src1', 1, 'src2', 2, 'src3', 3)
    | project doc_id, source, rep""",
    """WITH t(g, w) AS (VALUES ('src1', 1), ('src2', 2), ('src3', 3)),
       c AS (SELECT t.g, t.w, COALESCE(cnt.n, 0) AS n FROM t
             LEFT JOIN (SELECT source AS g, COUNT(*) AS n FROM documents
                        WHERE doc_id IS NOT NULL
                          AND source IN ('src1','src2','src3')
                        GROUP BY 1) cnt USING (g)),
       qq AS (SELECT c1.g, MIN(c1.n) AS n,
                     MAX((c2.n * c1.w) // c2.w) AS quota
              FROM c c1 CROSS JOIN c c2 GROUP BY c1.g),
       ok AS (SELECT COALESCE(MIN(n), 0) > 0 AS ok FROM c),
       r AS (SELECT doc_id, source,
                    ROW_NUMBER() OVER (PARTITION BY source ORDER BY
                      ((((doc_id % 2147483648 + 2147483648) % 2147483648)
                        + 11) * 1103515245 + 12345) % 2147483648,
                      doc_id) AS rn
             FROM documents
             WHERE doc_id IS NOT NULL
               AND source IN ('src1','src2','src3')),
       x AS (SELECT r.doc_id, r.source,
                    (qq.quota // qq.n)
                    + CASE WHEN r.rn <= (qq.quota % qq.n) THEN 1 ELSE 0 END
                      AS rc
             FROM r JOIN qq ON r.source = qq.g CROSS JOIN ok WHERE ok.ok)
       SELECT doc_id, source, UNNEST(range(1, rc + 1)) AS rep FROM x""",
)

q(
    "llm_mixture_split_compose",
    # round 16: the curation ops COMPOSE deterministically cross-engine —
    # resample to a target mixture, then label train/val splits, every
    # per-row (id, source, split) reproduced by pure BIGINT arithmetic in
    # both engines. Certifies that piping one portable-contract op into
    # another preserves the contract (the real pipeline shape).
    """documents
    | evaluate sample_to_mixture(source, doc_id, 11, 'src1', 3, 'src2', 2, 'src3', 1)
    | evaluate split_by_hash(doc_id, 42, 'train', 9, 'val', 1)
    | project doc_id, source, split""",
    """WITH t(g, w) AS (VALUES ('src1', 3), ('src2', 2), ('src3', 1)),
       c AS (SELECT t.g, t.w, COALESCE(cnt.n, 0) AS n FROM t
             LEFT JOIN (SELECT source AS g, COUNT(*) AS n FROM documents
                        WHERE doc_id IS NOT NULL
                          AND source IN ('src1','src2','src3')
                        GROUP BY 1) cnt USING (g)),
       qq AS (SELECT c1.g, MIN((c2.n * c1.w) // c2.w) AS quota
              FROM c c1 CROSS JOIN c c2 GROUP BY c1.g),
       r AS (SELECT doc_id, source,
                    ROW_NUMBER() OVER (PARTITION BY source ORDER BY
                      ((((doc_id % 2147483648 + 2147483648) % 2147483648)
                        + 11) * 1103515245 + 12345) % 2147483648,
                      doc_id) AS rn
             FROM documents
             WHERE doc_id IS NOT NULL
               AND source IN ('src1','src2','src3')),
       kept AS (SELECT doc_id, source FROM r JOIN qq ON r.source = qq.g
                WHERE rn <= qq.quota)
       SELECT doc_id, source,
              CASE WHEN ((((doc_id % 2147483648) + 2147483648) % 2147483648
                         + 42) * 1103515245 + 12345) % 2147483648 % 10 < 9
                   THEN 'train' ELSE 'val' END AS split
       FROM kept""",
)

q(
    "llm_boilerplate_lines",
    # round 16: CCNet-rule boilerplate removal — a trimmed non-empty line
    # in >= min_docs DISTINCT docs is deleted from EVERY doc (unlike
    # dedup_lines' keep-first C4 rule). Planted boilerplate: prefixing
    # each text with its source name makes that line shared by the
    # ~25 docs of each source, while text lines stay (mostly) unique.
    """documents
    | extend t = strcat(source, '\\n', text)
    | evaluate boilerplate_lines(t, doc_id, 10)
    | project doc_id, text_cleaned, lines_removed""",
    """WITH d AS (SELECT doc_id, source || chr(10) || text AS t
                  FROM documents),
       l AS (SELECT doc_id,
                    generate_subscripts(string_split(t, chr(10)), 1) AS pos,
                    UNNEST(string_split(t, chr(10))) AS line
             FROM d),
       boiler AS (SELECT trim(line) AS ln FROM l WHERE trim(line) <> ''
                  GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 10),
       m AS (SELECT l.*, (trim(l.line) <> ''
                          AND trim(l.line) IN (SELECT ln FROM boiler)) AS rm
             FROM l)
       SELECT doc_id,
              COALESCE(string_agg(line, chr(10) ORDER BY pos)
                         FILTER (NOT rm), '') AS text_cleaned,
              COUNT(*) FILTER (rm) AS lines_removed
       FROM m GROUP BY doc_id""",
)

q(
    "mv_apply_empty_groups",
    # round 5 (fuzz-found fix): a record whose expanded rows all fail the
    # inner where still yields the global aggregate-on-empty row
    # (count()=0), so every document survives; the twin's GROUP BY keeps
    # empty FILTER counts the same way
    """documents
    | extend w = split(text, ' ')
    | mv-apply w to typeof(string) on (
        where strlen(w) > 9 | summarize lw = count())
    | summarize n = count(), s = sum(lw), z = countif(lw == 0)""",
    """WITH e AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                  FROM documents),
       per AS (SELECT doc_id,
                  COUNT(*) FILTER (WHERE length(w) > 9) AS lw
               FROM e GROUP BY doc_id)
       SELECT COUNT(*) AS n, CAST(SUM(lw) AS BIGINT) AS s,
              CAST(COUNT(*) FILTER (WHERE lw = 0) AS BIGINT) AS z
       FROM per""",
)

q(
    "pivot_pinned_values",
    # round 5: pivot with pinned output columns — no distinct scan, values
    # absent from the pin are dropped, pinned-but-absent come back null
    """events
    | evaluate pivot(event_type, sum(value), click, view, nosuch)
    | sort by user_id asc, event_id asc
    | take 50""",
    """SELECT * FROM (
         SELECT event_id, ts, user_id, props,
                SUM(value) FILTER (WHERE event_type = 'click') AS click,
                SUM(value) FILTER (WHERE event_type = 'view') AS view,
                SUM(value) FILTER (WHERE event_type = 'nosuch') AS nosuch
         FROM events GROUP BY event_id, ts, user_id, props)
       ORDER BY user_id, event_id LIMIT 50""",
)

q(
    "series_stats_nonfinite_modes",
    # round 5: Kusto's ignore_nonfinite contract — default mode voids the
    # whole stats result when the series holds nulls (max() + default=
    # real(null) leaves empty cells null); true drops them first, matching
    # SQL AVG's null skipping in the twin
    """events
    | make-series y = max(value) default=real(null) on ts
      from datetime(2024-01-01) to datetime(2024-01-11) step 12h
    | project d_null = isnull(series_stats_dynamic(y)),
              avg_i = round(todouble(series_stats_dynamic(y, true).avg), 4),
              mx = round(todouble(series_stats_dynamic(y, true).max), 4)""",
    """WITH grid AS (
         SELECT generate_series AS t FROM generate_series(
           TIMESTAMP '2024-01-01',
           TIMESTAMP '2024-01-11' - INTERVAL 12 HOUR, INTERVAL 12 HOUR)),
       v AS (
         SELECT time_bucket(INTERVAL 12 HOUR, CAST(ts AS TIMESTAMP),
                            TIMESTAMP '2024-01-01') AS t, value
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-11'),
       cells AS (
         SELECT grid.t, MAX(v.value) AS y
         FROM grid LEFT JOIN v ON v.t = grid.t GROUP BY grid.t)
       SELECT COUNT(*) FILTER (WHERE y IS NULL) > 0 AS d_null,
              ROUND(AVG(y), 4) AS avg_i, ROUND(MAX(y), 4) AS mx
       FROM cells""",
)

q(
    "llm_repetition_filter",
    # round 5: Gopher repetition rules — the twin recomputes the top-2/4-gram
    # and dup-5-gram char fractions from scratch (unnest + group + window)
    # with the same tie-break (count desc, count*len desc, gram asc) and the
    # same per-row 4-decimal rounding before the cross-doc sum
    """documents
    | evaluate repetition_filter(text)
    | summarize t2 = round(sum(rf_top_2gram_char_frac), 4),
                t4 = round(sum(rf_top_4gram_char_frac), 4),
                d5 = round(sum(rf_dup_5gram_char_frac), 4)""",
    """WITH toks AS (
         SELECT doc_id, GREATEST(length(trim(text)), 1) AS dc,
                list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                            t -> t <> '') AS t
         FROM documents),
       g AS (SELECT doc_id, dc, n, unnest(CASE WHEN len(t) >= n THEN
                list_transform(range(1, len(t) - n + 2),
                               i -> array_to_string(t[i:i+n-1], ' '))
                ELSE [] END) AS gram
             FROM toks CROSS JOIN (SELECT unnest([2, 4, 5]) AS n)),
       c AS (SELECT doc_id, dc, n, gram, COUNT(*) AS cnt,
                    COUNT(*) * length(gram) AS score
             FROM g GROUP BY doc_id, dc, n, gram),
       top AS (SELECT doc_id, n,
                      CASE WHEN cnt > 1 THEN ROUND(score / dc, 4)
                           ELSE 0 END AS f,
                      ROW_NUMBER() OVER (PARTITION BY doc_id, n
                        ORDER BY cnt DESC, score DESC, gram) AS rn
               FROM c WHERE n IN (2, 4)),
       dup AS (SELECT doc_id,
                      LEAST(ROUND(COALESCE(SUM(score) FILTER (WHERE cnt > 1), 0)
                                  / ANY_VALUE(dc), 4), 1.0) AS f
               FROM c WHERE n = 5 GROUP BY doc_id)
       SELECT ROUND(SUM(f) FILTER (WHERE n = 2), 4) AS t2,
              ROUND(SUM(f) FILTER (WHERE n = 4), 4) AS t4,
              (SELECT ROUND(SUM(f), 4) FROM dup) AS d5
       FROM top WHERE rn = 1""",
)

q(
    "ipv6_lookup_cidr",
    # round 5: 128-bit CIDR-range lookup join, longest prefix wins. The
    # engine compares 32-char zero-padded hex strings; the twin does the
    # same arithmetic in HUGEINT (2001:db8::/32 values stay < 2^127):
    # base = 0x20010db8 << 96, group3 contributes user_id%4 << 80, the
    # final hex group is event_id%10 (digits 0-9 are hex-safe)
    """let lut = datatable(cidr:string, net:string)[
      '2001:db8::/32','site', '2001:db8:1::/48','one',
      '2001:db8:2::/48','two', '100::/64','discard'];
    events
    | extend ip = iff(event_id % 7 == 0, '::1',
        strcat('2001:db8:', tostring(user_id % 4), '::', tostring(event_id % 10)))
    | evaluate ipv6_lookup(lut, ip, cidr)
    | summarize c = count() by net
    | sort by net asc""",
    """WITH lut(net, s, e, b) AS (VALUES
         ('site', CAST('42540766411282592856903984951653826560' AS HUGEINT),
                  CAST('42540766490510755371168322545197776895' AS HUGEINT), 32),
         ('one',  CAST('42540766411283801782723599580828532736' AS HUGEINT),
                  CAST('42540766411285010708543214210003238911' AS HUGEINT), 48),
         ('two',  CAST('42540766411285010708543214210003238912' AS HUGEINT),
                  CAST('42540766411286219634362828839177945087' AS HUGEINT), 48),
         ('discard', CAST('1329227995784915872903807060280344576' AS HUGEINT),
                  CAST('1329227995784915891350551133989896191' AS HUGEINT), 64)),
       src AS (SELECT event_id,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE CAST('42540766411282592856903984951653826560' AS HUGEINT)
                     + (user_id % 4) * CAST('1208925819614629174706176' AS HUGEINT)
                     + (event_id % 10) END AS v
          FROM events),
       m AS (SELECT event_id, net,
               ROW_NUMBER() OVER (PARTITION BY event_id
                                  ORDER BY b DESC, net) AS rn
             FROM src JOIN lut ON v BETWEEN s AND e)
       SELECT net, CAST(COUNT(*) AS BIGINT) AS c
       FROM m WHERE rn = 1 GROUP BY net ORDER BY net""",
)

# ------------------------- round-6: SQL twins for formerly rows-only classes
q(
    "getschema_lineitem_twin",
    # getschema output is fully deterministic — pin the whole table
    """lineitem | getschema | sort by ColumnOrdinal asc""",
    """SELECT * FROM (VALUES
         ('l_orderkey',  CAST(0 AS BIGINT), 'bigint', 'long'),
         ('l_partkey',   1, 'bigint', 'long'),
         ('l_suppkey',   2, 'bigint', 'long'),
         ('l_linenumber',3, 'int',    'int'),
         ('l_quantity',  4, 'double', 'real'),
         ('l_extendedprice', 5, 'double', 'real'),
         ('l_discount',  6, 'double', 'real'),
         ('l_tax',       7, 'double', 'real'),
         ('l_returnflag',8, 'string', 'string'),
         ('l_linestatus',9, 'string', 'string'),
         ('l_shipdate', 10, 'timestamp_ntz', 'datetime')
       ) AS t(ColumnName, ColumnOrdinal, DataType, ColumnType)
       ORDER BY 2""",
)

q(
    "sample_count_pinned",
    # seeded sample returns EXACTLY n rows when the table has >= n; the
    # content is random but the count contract is oracle-certifiable
    """lineitem | sample 100 | count""",
    """SELECT CAST(100 AS BIGINT) AS Count""",
)

q(
    "sample_distinct_count_pinned",
    # l_returnflag has exactly 3 values, so sample-distinct 3 must keep
    # all of them (which ROWS carry them is random; the distinct set isn't)
    """lineitem | sample-distinct 3 of l_returnflag
    | summarize n = count_distinct(l_returnflag)""",
    """SELECT CAST(3 AS BIGINT) AS n""",
)

q(
    "llm_dedup_near_exact_clusters",
    # deterministic dedup_near certification: exact duplicates ALWAYS band
    # together (identical shingle sets -> identical minhash) and pass the
    # exact verify at jaccard 1.0; the unrelated doc shares no 3-shingle.
    # Survivor set = min id per distinct text — an exact SQL contract.
    """datatable(id:long, t:string)[
       1, 'alpha beta gamma delta epsilon zeta eta theta',
       2, 'alpha beta gamma delta epsilon zeta eta theta',
       3, 'one two three four five six seven eight nine',
       4, 'alpha beta gamma delta epsilon zeta eta theta',
       5, 'red orange yellow green blue indigo violet shade']
    | evaluate dedup_near(t, id, 0.9)
    | summarize n = count(), ids = make_list(id)
    | project n, ids = tostring(array_sort_asc(ids))""",
    """SELECT CAST(3 AS BIGINT) AS n, '[1,3,5]' AS ids""",
)

q(
    "llm_dedup_jaccard_brute_twin",
    # exact-Jaccard dedup vs a BRUTE-FORCE DuckDB twin computing the same
    # char-5-gram Jaccard for every pair; the fixture's near-dup clusters
    # are cliques, so min-id survival = "no smaller similar neighbor"
    # (no recursion needed)
    """datatable(id:long, t:string)[
       1, 'the quick brown fox jumps over the lazy dog near the river bank',
       2, 'the quick brown fox jumps over the lazy dog near the river bend',
       3, 'entirely different content about query engines and parquet files',
       4, 'the quick brown fox jumps over the lazy dog near the river bank',
       5, 'unrelated musings on distributed shuffles and broadcast joins']
    | evaluate dedup_jaccard(t, id, 0.7, 5)
    | summarize ids = make_list(id)
    | project ids = tostring(array_sort_asc(ids))""",
    """WITH d(id, t) AS (VALUES
         (1, 'the quick brown fox jumps over the lazy dog near the river bank'),
         (2, 'the quick brown fox jumps over the lazy dog near the river bend'),
         (3, 'entirely different content about query engines and parquet files'),
         (4, 'the quick brown fox jumps over the lazy dog near the river bank'),
         (5, 'unrelated musings on distributed shuffles and broadcast joins')),
       g AS (SELECT id, list_distinct(list_transform(
                 generate_series(1, length(t) - 4),
                 i -> t[i : i + 4])) AS gr
             FROM d),
       sim AS (SELECT a.id AS hi, b.id AS lo
               FROM g a JOIN g b ON b.id < a.id
               WHERE CAST(len(list_intersect(a.gr, b.gr)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.gr, b.gr))) >= 0.7)
       SELECT '[' || string_agg(id, ',' ORDER BY id) || ']' AS ids
       FROM d WHERE id NOT IN (SELECT hi FROM sim)""",
)

q(
    "llm_similarity_join_exact_twin",
    # similarity_join certification on a crafted fixture: identical unit
    # vectors are ALWAYS LSH candidates (same buckets) at cos 1.0;
    # orthogonal ones can never pass 0.9 even if bucketed together
    """datatable(id:long, v:dynamic)[
       1, dynamic([1.0, 0.0, 0.0]),
       2, dynamic([1.0, 0.0, 0.0]),
       3, dynamic([0.0, 1.0, 0.0]),
       4, dynamic([0.0, 0.0, 1.0])]
    | evaluate similarity_join(v, id, 0.9)
    | summarize n = count(), lo = min(left_id), hi = max(right_id)""",
    """SELECT CAST(1 AS BIGINT) AS n, CAST(1 AS BIGINT) AS lo,
              CAST(2 AS BIGINT) AS hi""",
)

q(
    "geo_simplify_polygons_union_shared_edge",
    # round 6: set-simplification preserving mutual boundaries via vertex
    # locking — the shared x=1 edge survives on both squares while the
    # collinear outer midpoints simplify away
    """print m = geo_simplify_polygons_union(dynamic([
        {"type":"Polygon","coordinates":[[[0,0],[0.5,0],[1,0],[1,0.5],[1,1],[0.5,1],[0,1],[0,0]]]},
        {"type":"Polygon","coordinates":[[[1,0],[2,0],[2,1],[1,1],[1,0.5],[1,0]]]}]), 100000)
    | project shared_kept = m contains '[1.0, 0.5]',
              outer_gone = not(m contains '[0.5, 0.0]'),
              two_polys = array_length(parse_json(m).coordinates) == 2""",
    """SELECT true AS shared_kept, true AS outer_gone, true AS two_polys""",
)

q(
    "geo_polygon_boolean_holes",
    # round 8: hole-aware polygon booleans (fragment classification).
    # A hole-CREATING union (U-shape + cap -> ring with hole), an
    # intersection against a cell fully inside the other's hole (empty),
    # and a union whose second operand sits inside the first's hole
    # (two disjoint polygons) — the three configurations the old
    # exterior-ring-only code nulled or got wrong
    """print ushape = dynamic({"type":"Polygon","coordinates":[[[0,0],[3,0],[3,3],[2,3],[2,1],[1,1],[1,3],[0,3],[0,0]]]}),
             cap = dynamic({"type":"Polygon","coordinates":[[[-0.5,2.5],[3.5,2.5],[3.5,3.5],[-0.5,3.5],[-0.5,2.5]]]}),
             holed = dynamic({"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,4],[0,0]],[[1,1],[3,1],[3,3],[1,3],[1,1]]]}),
             inner = dynamic({"type":"Polygon","coordinates":[[[1.5,1.5],[2.5,1.5],[2.5,2.5],[1.5,2.5],[1.5,1.5]]]})
    | extend u1 = geo_union_polygons_calculate(ushape, cap),
             i1 = geo_intersection_2polygons(holed, inner),
             u2 = geo_union_polygons_calculate(holed, inner)
    | project u1_rings = array_length(parse_json(u1).coordinates),
              u1_has_hole = array_length(parse_json(u1).coordinates) == 2,
              i1_empty = array_length(parse_json(i1).geometries) == 0,
              u2_polys = array_length(parse_json(u2).coordinates),
              holed_area_lt_outer = geo_polygon_area(holed)
                  < geo_polygon_area(dynamic({"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,4],[0,0]]]}))""",
    """SELECT 2 AS u1_rings, true AS u1_has_hole, true AS i1_empty,
              2 AS u2_polys, true AS holed_area_lt_outer""",
)

q(
    "geo_h3cell_fns",
    # round 8: native H3 core (extensions/h3_native.py). Oracle literals
    # are INDEPENDENT of the implementation: the res-6 cell is the
    # Microsoft geo_point_to_h3cell doc example (Statue of Liberty), the
    # res-5/7 cells are the h3-py README quickstart pair, and the
    # hierarchy/counts follow the published H3 spec (7 hex children,
    # 6 hex neighbors, parent = 5-prefix of the res-7 token family)
    """print liberty = geo_point_to_h3cell(-74.04450446039874, 40.689250859314974, 6),
             apple5 = geo_point_to_h3cell(-122.0553238, 37.3615593, 5),
             apple7 = geo_point_to_h3cell(-122.0553238, 37.3615593, 7)
    | extend lvl = geo_h3cell_level(liberty),
             par5 = geo_h3cell_parent(apple7, 5),
             nnbr = array_length(geo_h3cell_neighbors(liberty)),
             nkid = array_length(geo_h3cell_children(liberty)),
             rt = geo_point_to_h3cell(
                    todouble(extractjson('$.coordinates[0]',
                      geo_h3cell_to_central_point(apple5))),
                    todouble(extractjson('$.coordinates[1]',
                      geo_h3cell_to_central_point(apple5))), 5) == apple5
    | project liberty, apple5, apple7, lvl, par5, nnbr, nkid, rt""",
    """SELECT '862a1072fffffff' AS liberty, '85283473fffffff' AS apple5,
              '87283472bffffff' AS apple7, 6 AS lvl,
              '85283473fffffff' AS par5, 6 AS nnbr, 7 AS nkid, true AS rt""",
)

q(
    "geo_polygon_to_h3cells_covering",
    # round 8: H3 polygon covering over the native core. Oracle literals
    # are structural: the covering contains the cells of interior,
    # corner-adjacent and edge points (soundness), stays bounded, and the
    # hole of a holed polygon is NOT interior-filled (its center cell
    # only enters via the boundary wall of the hole ring's pad)
    """print p = dynamic({"type":"Polygon","coordinates":[[[10,10],[12,10],[12,12],[10,12],[10,10]]]})
    | extend cells = geo_polygon_to_h3cells(p, 4)
    | project covers_mid = set_has_element(cells, geo_point_to_h3cell(11.0, 11.0, 4)),
              covers_corner = set_has_element(cells, geo_point_to_h3cell(11.99, 11.99, 4)),
              covers_edge = set_has_element(cells, geo_point_to_h3cell(10.0, 11.0, 4)),
              bounded = array_length(cells) < 1000,
              lvl = geo_h3cell_level(tostring(cells[0]))""",
    """SELECT true AS covers_mid, true AS covers_corner, true AS covers_edge,
              true AS bounded, 4 AS lvl""",
)

q(
    "geo_h3cell_polygon_rings",
    # round 8: boundary + rings. The 6-vertex boundary closes (first ==
    # last in GeoJSON), ring sizes follow 6k, and the pentagon base cell
    # (#4, one of the 12 documented pentagons) has a 5-vertex boundary
    # and 5 neighbors
    """print hexc = geo_point_to_h3cell(2.3522, 48.8566, 4)
    | extend poly = geo_h3cell_to_polygon(hexc),
             ring1 = array_length(geo_h3cell_rings(hexc, 1)[1]),
             ring2 = array_length(geo_h3cell_rings(hexc, 2)[2])
    | project nverts = array_length(parse_json(poly).coordinates[0]) - 1,
              closed = tostring(parse_json(poly).coordinates[0][0])
                    == tostring(parse_json(poly).coordinates[0][6]),
              ring1, ring2""",
    """SELECT 6 AS nverts, true AS closed, 6 AS ring1, 12 AS ring2""",
)

# ----------------------------------------------------- TPC-H ports (round 8)
# The remaining TPC-H queries expressible over the pruned fixture schema
# (FIXTURES.md: no partsupp, no l_commitdate/l_receiptdate, no
# p_container/c_phone/comment columns — q2/q4/q9/q11/q12/q16/q20/q21 are
# out of reach; q7/q8/q13/q14/q17/q19/q22 substitute available columns
# for the pruned ones, keeping each query's join/agg shape).

q(
    "tpch_q7",
    """supplier
    | join kind=inner (lineitem) on $left.s_suppkey == $right.l_suppkey
    | join kind=inner (orders) on $left.l_orderkey == $right.o_orderkey
    | join kind=inner (customer) on $left.o_custkey == $right.c_custkey
    | join kind=inner (nation | project n1key = n_nationkey, supp_nation = n_name)
        on $left.s_nationkey == $right.n1key
    | join kind=inner (nation | project n2key = n_nationkey, cust_nation = n_name)
        on $left.c_nationkey == $right.n2key
    | where l_shipdate between (datetime(1995-01-01) .. datetime(1996-12-31))
    | where (supp_nation == 'NATION_1' and cust_nation == 'NATION_2')
         or (supp_nation == 'NATION_2' and cust_nation == 'NATION_1')
    | extend l_year = getyear(l_shipdate)
    | summarize revenue = round(sum(l_extendedprice * (1.0 - l_discount)), 2)
        by supp_nation, cust_nation, l_year
    | sort by supp_nation asc, cust_nation asc, l_year asc""",
    """SELECT supp_nation, cust_nation,
              EXTRACT(YEAR FROM l_shipdate) AS l_year,
              ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
       FROM supplier
       JOIN lineitem ON s_suppkey = l_suppkey
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN (SELECT n_nationkey AS n1key, n_name AS supp_nation FROM nation) n1
         ON s_nationkey = n1key
       JOIN (SELECT n_nationkey AS n2key, n_name AS cust_nation FROM nation) n2
         ON c_nationkey = n2key
       WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
         AND ((supp_nation = 'NATION_1' AND cust_nation = 'NATION_2')
           OR (supp_nation = 'NATION_2' AND cust_nation = 'NATION_1'))
       GROUP BY supp_nation, cust_nation, EXTRACT(YEAR FROM l_shipdate)
       ORDER BY supp_nation, cust_nation, l_year""",
)

q(
    "tpch_q8",
    """part
    | where p_type == 'PROMO'
    | join kind=inner (lineitem) on $left.p_partkey == $right.l_partkey
    | join kind=inner (supplier) on $left.l_suppkey == $right.s_suppkey
    | join kind=inner (orders
        | where o_orderdate between (datetime(1995-01-01) .. datetime(1996-12-31)))
        on $left.l_orderkey == $right.o_orderkey
    | join kind=inner (customer) on $left.o_custkey == $right.c_custkey
    | join kind=inner (nation | project cnkey = n_nationkey, cnregion = n_regionkey)
        on $left.c_nationkey == $right.cnkey
    | join kind=inner (region) on $left.cnregion == $right.r_regionkey
    | where r_name == 'ASIA'
    | join kind=inner (nation | project snkey = n_nationkey, supp_nation = n_name)
        on $left.s_nationkey == $right.snkey
    | extend o_year = getyear(o_orderdate),
             volume = l_extendedprice * (1.0 - l_discount)
    | summarize mkt_share = round(
          sum(iff(supp_nation == 'NATION_3', volume, 0.0)) / sum(volume), 4)
        by o_year
    | sort by o_year asc""",
    """SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
              ROUND(SUM(CASE WHEN n2.n_name = 'NATION_3'
                             THEN l_extendedprice * (1.0 - l_discount)
                             ELSE 0.0 END)
                    / SUM(l_extendedprice * (1.0 - l_discount)), 4) AS mkt_share
       FROM part
       JOIN lineitem ON p_partkey = l_partkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation n1 ON c_nationkey = n1.n_nationkey
       JOIN region ON n1.n_regionkey = r_regionkey
       JOIN nation n2 ON s_nationkey = n2.n_nationkey
       WHERE p_type = 'PROMO' AND r_name = 'ASIA'
         AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
       GROUP BY 1 ORDER BY 1""",
)

q(
    "tpch_q10",
    """customer
    | join kind=inner (orders
        | where o_orderdate >= datetime(1995-10-01) and o_orderdate < datetime(1996-01-01))
        on $left.c_custkey == $right.o_custkey
    | join kind=inner (lineitem | where l_returnflag == 'R')
        on $left.o_orderkey == $right.l_orderkey
    | join kind=inner (nation) on $left.c_nationkey == $right.n_nationkey
    | summarize revenue = round(sum(l_extendedprice * (1.0 - l_discount)), 2)
        by c_custkey, c_name, c_acctbal, n_name
    | sort by revenue desc, c_custkey asc
    | take 20""",
    """SELECT c_custkey, c_name, c_acctbal, n_name,
              ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON o_orderkey = l_orderkey
       JOIN nation ON c_nationkey = n_nationkey
       WHERE o_orderdate >= TIMESTAMP '1995-10-01'
         AND o_orderdate < TIMESTAMP '1996-01-01' AND l_returnflag = 'R'
       GROUP BY c_custkey, c_name, c_acctbal, n_name
       ORDER BY revenue DESC, c_custkey LIMIT 20""",
)

q(
    "tpch_q13",
    """customer
    | join kind=leftouter (orders | where o_orderpriority != '1-URGENT')
        on $left.c_custkey == $right.o_custkey
    | summarize c_count = countif(isnotnull(o_orderkey)) by c_custkey
    | summarize custdist = count() by c_count
    | sort by custdist desc, c_count desc""",
    """SELECT c_count, COUNT(*) AS custdist FROM (
         SELECT c_custkey, COUNT(o_orderkey) AS c_count
         FROM customer LEFT JOIN orders
           ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
         GROUP BY c_custkey)
       GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
)

q(
    "tpch_q14",
    """lineitem
    | where l_shipdate >= datetime(1996-03-01) and l_shipdate < datetime(1996-04-01)
    | join kind=inner (part) on $left.l_partkey == $right.p_partkey
    | summarize promo_revenue = round(
          100.0 * sum(iff(p_type == 'PROMO', l_extendedprice * (1.0 - l_discount), 0.0))
          / sum(l_extendedprice * (1.0 - l_discount)), 4)""",
    """SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                     THEN l_extendedprice * (1.0 - l_discount)
                                     ELSE 0.0 END)
                    / SUM(l_extendedprice * (1.0 - l_discount)), 4) AS promo_revenue
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= TIMESTAMP '1996-03-01'
         AND l_shipdate < TIMESTAMP '1996-04-01'""",
)

q(
    "tpch_q15",
    """let revenue = lineitem
        | where l_shipdate >= datetime(1996-01-01) and l_shipdate < datetime(1996-04-01)
        | summarize total_revenue = round(sum(l_extendedprice * (1.0 - l_discount)), 2)
            by l_suppkey;
    let mx = toscalar(revenue | summarize max(total_revenue));
    supplier
    | join kind=inner (revenue) on $left.s_suppkey == $right.l_suppkey
    | where total_revenue == mx
    | project s_suppkey, s_name, total_revenue
    | sort by s_suppkey asc""",
    """WITH revenue AS (
         SELECT l_suppkey,
                ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1996-04-01'
         GROUP BY l_suppkey)
       SELECT s_suppkey, s_name, total_revenue
       FROM supplier JOIN revenue ON s_suppkey = l_suppkey
       WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
       ORDER BY s_suppkey""",
)

q(
    "tpch_q17",
    """let avgq = lineitem | summarize aq = 0.2 * avg(l_quantity) by l_partkey;
    lineitem
    | join kind=inner (part | where p_brand == 'Brand#13')
        on $left.l_partkey == $right.p_partkey
    | join kind=inner (avgq) on $left.l_partkey == $right.l_partkey
    | where l_quantity < aq
    | summarize avg_yearly = round(sum(l_extendedprice) / 7.0, 2)""",
    """WITH avgq AS (
         SELECT l_partkey AS pk, 0.2 * AVG(l_quantity) AS aq
         FROM lineitem GROUP BY l_partkey)
       SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
       FROM lineitem
       JOIN part ON l_partkey = p_partkey
       JOIN avgq ON l_partkey = pk
       WHERE p_brand = 'Brand#13' AND l_quantity < aq""",
)

q(
    "tpch_q18",
    """let big = lineitem
        | summarize sumq = sum(l_quantity) by l_orderkey
        | where sumq > 300.0;
    big
    | join kind=inner (orders) on $left.l_orderkey == $right.o_orderkey
    | join kind=inner (customer) on $left.o_custkey == $right.c_custkey
    | project c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sumq
    | sort by o_totalprice desc, o_orderkey asc
    | take 100""",
    """WITH big AS (
         SELECT l_orderkey AS bok, SUM(l_quantity) AS sumq
         FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300.0)
       SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sumq
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN big ON o_orderkey = bok
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
)

q(
    "tpch_q19",
    """lineitem
    | join kind=inner (part) on $left.l_partkey == $right.p_partkey
    | where (p_brand == 'Brand#1' and p_size between (1 .. 10)
             and l_quantity between (1.0 .. 11.0))
         or (p_brand == 'Brand#7' and p_size between (11 .. 30)
             and l_quantity between (10.0 .. 20.0))
         or (p_brand == 'Brand#9' and p_size between (20 .. 50)
             and l_quantity between (20.0 .. 30.0))
    | summarize revenue = round(sum(l_extendedprice * (1.0 - l_discount)), 2)""",
    """SELECT ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
              AND l_quantity BETWEEN 1.0 AND 11.0)
          OR (p_brand = 'Brand#7' AND p_size BETWEEN 11 AND 30
              AND l_quantity BETWEEN 10.0 AND 20.0)
          OR (p_brand = 'Brand#9' AND p_size BETWEEN 20 AND 50
              AND l_quantity BETWEEN 20.0 AND 30.0)""",
)

q(
    "tpch_q22",
    """let avgbal = toscalar(customer
        | where c_acctbal > 0.0 and c_nationkey in (1, 3, 5, 7, 9, 11, 13)
        | summarize avg(c_acctbal));
    customer
    | where c_nationkey in (1, 3, 5, 7, 9, 11, 13) and c_acctbal > avgbal
    | join kind=leftanti (orders | where o_orderpriority == '1-URGENT')
        on $left.c_custkey == $right.o_custkey
    | summarize numcust = count(), totacctbal = round(sum(c_acctbal), 2)
        by c_nationkey
    | sort by c_nationkey asc""",
    """SELECT c_nationkey, COUNT(*) AS numcust,
              ROUND(SUM(c_acctbal), 2) AS totacctbal
       FROM customer
       WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
         AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                          WHERE c_acctbal > 0.0
                            AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
         AND c_custkey NOT IN (SELECT o_custkey FROM orders
                               WHERE o_orderpriority = '1-URGENT')
       GROUP BY c_nationkey ORDER BY c_nationkey""",
)

q(
    "tpch_q4_adapted",
    # round 11: TPC-H Q4 adapted to the pruned fixture schema (FIXTURES.md:
    # no l_commitdate/l_receiptdate) — the EXISTS semi-join shape is the
    # point: "priority counts for orders with at least one late-shipping
    # lineitem". ref-parity: SURVEY §2 §5.3 TPC-H port contract.
    """orders
    | where o_orderdate >= datetime(1996-01-01) and o_orderdate < datetime(1996-07-01)
    | join kind=leftsemi (lineitem | where l_shipdate > datetime(1996-08-01))
        on $left.o_orderkey == $right.l_orderkey
    | summarize order_count = count() by o_orderpriority
    | sort by o_orderpriority asc""",
    """SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1996-07-01'
         AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
                       AND l_shipdate > TIMESTAMP '1996-08-01')
       GROUP BY o_orderpriority ORDER BY o_orderpriority""",
)

q(
    "tpch_q12_adapted",
    # round 11: Q12's case-aggregation over a fact-dim join, grouped by
    # l_returnflag (the fixture has no l_shipmode)
    """lineitem
    | where l_shipdate >= datetime(1996-01-01) and l_shipdate < datetime(1997-01-01)
    | join kind=inner (orders) on $left.l_orderkey == $right.o_orderkey
    | summarize high_line_count = countif(o_orderpriority == '1-URGENT' or o_orderpriority == '2-HIGH'),
                low_line_count = countif(o_orderpriority != '1-URGENT' and o_orderpriority != '2-HIGH')
      by l_returnflag
    | sort by l_returnflag asc""",
    """SELECT l_returnflag,
              COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT','2-HIGH'))
                AS high_line_count,
              COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH'))
                AS low_line_count
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate < TIMESTAMP '1997-01-01'
       GROUP BY l_returnflag ORDER BY l_returnflag""",
)

q(
    "tpch_q21_adapted",
    # round 11: Q21's correlated EXISTS + NOT EXISTS with an inequality on
    # the correlation key — lowered as a theta SEMI join (same order,
    # different supplier) plus a theta ANTI join (no OTHER late supplier).
    # late = shipped >60d after order date (fixture has no receipt dates);
    # tie-free final order (s_name unique), so take 10 is deterministic.
    """let fl = lineitem
      | join kind=inner (orders | where o_orderstatus == 'F')
          on $left.l_orderkey == $right.o_orderkey
      | project l_orderkey, l_suppkey, late = l_shipdate > o_orderdate + 60d;
    let cand = fl | where late | distinct l_orderkey, l_suppkey;
    cand
    | join kind=leftsemi (fl | project r_ok = l_orderkey, r_sk = l_suppkey)
        on $left.l_orderkey == $right.r_ok and $left.l_suppkey != $right.r_sk
    | join kind=leftanti (fl | where late | project a_ok = l_orderkey, a_sk = l_suppkey)
        on $left.l_orderkey == $right.a_ok and $left.l_suppkey != $right.a_sk
    | join kind=inner (supplier) on $left.l_suppkey == $right.s_suppkey
    | summarize numwait = count() by s_name
    | sort by numwait desc, s_name asc
    | take 10""",
    """WITH fl AS (
         SELECT l_orderkey, l_suppkey,
                l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderstatus = 'F'),
       cand AS (SELECT DISTINCT l_orderkey, l_suppkey FROM fl WHERE late)
       SELECT s_name, COUNT(*) AS numwait
       FROM cand JOIN supplier ON l_suppkey = s_suppkey
       WHERE EXISTS (SELECT 1 FROM fl f WHERE f.l_orderkey = cand.l_orderkey
                       AND f.l_suppkey <> cand.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM fl f WHERE f.late
                           AND f.l_orderkey = cand.l_orderkey
                           AND f.l_suppkey <> cand.l_suppkey)
       GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""",
)

# ----------------------------------------------------------------- Tier-A order
# The driver certifies an insertion-order PREFIX of this dict (the first ~50
# entries) against the DuckDB oracle. Reorder so that the prefix is the Tier-A
# contract: at least one representative per SURVEY §2 family — sources (§2.1),
# row ops (§2.2), sort/take (§2.3), every join kind + multi-key + hints (§2.4),
# union (§2.5), aggregates (§2.6), window (§2.7), mv-*/parse/evaluate (§2.8),
# scalar fns (§2.9), make-series (§2.10), the streaming tumbling-bin twin
# (§2.11), LLM data-pipeline ops (§2.12), misc operators (§2.13), and
# let/invoke (§2.14). Entries outside the prefix keep their relative order and
# stay covered by tests/test_corpus_oracle.py.
_TIER_A = (
    # ---- round-8 rotation (VERDICT r7 items 2+5): the driver has
    # certified 152 distinct entries over r1-r7; this prefix is 48
    # never-certified entries + 2 re-certifications of round-7-regressed
    # fixes (extractjson_props — the JSON single-parse canary — and
    # geo_densify_covering_shapes), bringing cumulative unique certified
    # to 200/287. Drawn from the families the r7 verdict named
    # (extract_all_*, format_datetime, bag_ops, geo_*) plus the series
    # tuple-assign shapes adjacent to the r7 regression.
    # regression-fix certification (r7 NameError blast radius)
    "extractjson_props", "geo_densify_covering_shapes",
    "make_series_then_fit", "series_stats_fit",
    "geo_s2cell_neighbors_polygon", "geo_simplify_polygons_union_shared_edge",
    # verdict-named families
    "extract_all_words", "extract_all_multigroup",
    "format_datetime_literal_delims", "bag_ops_fns", "bag_zip_fn",
    "ipv4_mask_bag_fns",
    # geo twins (never certified; the two h3 entries are new this round —
    # native H3 core, VERDICT r7 item 4)
    "geo_h3cell_fns", "geo_h3cell_polygon_rings",
    "geo_line_polygon_fns", "geo_line_polygon_fns2", "geo_s2cell_fns",
    "geo_wkt_carriers", "geo_azimuth_angle_fns", "geo_geohash_neighbors_fn",
    "geo_polygon_distance_fns", "geo_line_lookup_radius",
    "geo_point_in_polygon_fn", "ipv4_geo_fns",
    # hole-aware polygon booleans (new this round)
    "geo_polygon_boolean_holes",
    # network scalar families
    "ipv6_fns",
    # string/hash/datetime scalar sweeps
    "string_more_fns", "hash_fns", "base64_url_fns", "string_preds_more",
    "has_any_matches", "datetime_more_fns", "arrays_more_fns",
    "datetime_part_fn",
    # series (incl. the tuple-assign shapes sharing the r7 root cause)
    "series_vector_math", "series_arith", "series_fill", "series_fir_filter",
    "series_stats_tuple_assign", "series_decompose_tuple_assign",
    # mv-expand / parse plugins
    "mv_expand_bagexpansion", "mv_expand_itemindex", "parse_kv_pairs",
    "parse_command_line_fn", "parse_user_agent_fn",
    # LLM data-pipeline (never certified)
    "llm_tokenize", "llm_lang_detect", "llm_fingerprint", "llm_dedup_near",
    # segmentation plugin
    "basket_frequent_segments",
)
assert len(_TIER_A) == 50, len(_TIER_A)
_missing = [n for n in _TIER_A if n not in CORPUS]
assert not _missing, f"Tier-A names missing from corpus: {_missing}"
_rest = [n for n in CORPUS if n not in set(_TIER_A)]
_reordered = {n: CORPUS[n] for n in (*_TIER_A, *_rest)}
CORPUS.clear()
CORPUS.update(_reordered)

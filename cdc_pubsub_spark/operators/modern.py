"""Modern SQL surface: recursive CTEs, lateral joins, VARIANT JSON,
map higher-order functions, sketch-based heavy hitters, URL parsing, XML
ingestion.

These are the Spark-4-era capabilities a user migrating off the reference
bridge (and onto a real analytics engine) reaches for next: the reference
transports semi-structured payloads it never parses (publisher.go:182-201
treats lines as opaque bytes); this module is the query-side surface for
actually *querying* those payloads once landed — JSON as VARIANT, XML
envelopes, URL-shaped routing metadata (publisher.go:133's path parsing,
generalized to real URLs), per-entity feature maps, and the recursive /
lateral SQL shapes analysts expect from a complete engine.

Scale notes: every operator here is pure Catalyst (no Python UDFs). The
recursive CTE materializes ~100 rows on the driver side of a broadcast —
the dense-calendar pattern whose cost is independent of fact-table size.
`approx_top_k` is a mergeable sketch: partial aggregation map-side, one
small shuffle — the only safe heavy-hitters shape at 100 TB (an exact
global groupBy+sort works at any scale too, but the sketch caps memory
per key cardinality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pubsub_spark.functions.rounding import r2
from cdc_pubsub_spark.registry import register
from cdc_pubsub_spark.tables import load


@register(
    "sql_recursive_cte",
    category="modern",
    oracle="""
    WITH RECURSIVE nums(n) AS (
      SELECT 0 UNION ALL SELECT n + 1 FROM nums WHERE n < 90
    ),
    bounds AS (
      SELECT date_trunc('month', min(o_orderdate)) AS m0,
             date_trunc('month', max(o_orderdate)) AS m1
      FROM orders
    ),
    months AS (
      SELECT year(m0 + to_months(n)) * 100 + month(m0 + to_months(n)) AS ym
      FROM bounds, nums
      WHERE m0 + to_months(n) <= m1
    ),
    actual AS (
      SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
             count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS total_price
      FROM orders GROUP BY 1
    )
    SELECT m.ym, coalesce(a.n_orders, 0) AS n_orders,
           coalesce(a.total_price, 0.0) AS total_price
    FROM months m LEFT JOIN actual a USING (ym)
    """,
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE): dense monthly calendar spanning the
    order-date range, gap-filled with per-month order counts and revenue.

    The recursion generates month offsets 0..90 (a ~100-row driver-side
    table — recursion depth is bounded and independent of data volume);
    the month grid then LEFT-joins the fact rollup, so absent months
    surface as explicit zeros. This is the iterative-computation entry
    point the reference lacks entirely (its only loop is the line
    scanner, publisher.go:182); Spark 4 executes it as a UnionLoop with
    the static 100-level recursion guard.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_rec")
    return spark.sql(
        """
        WITH RECURSIVE nums(n) AS (
          SELECT 0 UNION ALL SELECT n + 1 FROM nums WHERE n < 90
        ),
        bounds AS (
          SELECT date_trunc('MONTH', min(o_orderdate)) AS m0,
                 date_trunc('MONTH', max(o_orderdate)) AS m1
          FROM orders_rec
        ),
        months AS (
          SELECT year(add_months(m0, n)) * 100 + month(add_months(m0, n)) AS ym
          FROM bounds, nums
          WHERE add_months(m0, n) <= m1
        ),
        actual AS (
          SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
                 count(*) AS n_orders,
                 round(sum(o_totalprice), 2) AS total_price
          FROM orders_rec GROUP BY 1
        )
        SELECT m.ym, coalesce(a.n_orders, 0) AS n_orders,
               coalesce(a.total_price, 0.0) AS total_price
        FROM months m LEFT JOIN actual a USING (ym)
        """
    )


@register(
    "join_lateral_topk",
    category="modern",
    oracle="""
    SELECT n_name, t.c_custkey, t.bal
    FROM nation, LATERAL (
      SELECT c_custkey, round(c_acctbal, 2) AS bal
      FROM customer
      WHERE c_nationkey = n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 1
    ) t
    """,
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral correlated subquery: each nation's single highest-balance
    customer (deterministic tie-break on custkey).

    The LATERAL subquery is correlated on `n_nationkey` with ORDER BY +
    LIMIT inside — the "top-1 per outer row" idiom. Catalyst decorrelates
    it into a window/aggregate + join rather than re-running the inner
    query per nation, which is what makes the shape viable when the
    outer side has millions of rows instead of 25.
    """
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    return spark.sql(
        """
        SELECT n_name, t.c_custkey, t.bal
        FROM nation_lat, LATERAL (
          SELECT c_custkey, round(c_acctbal, 2) AS bal
          FROM customer_lat
          WHERE c_nationkey = n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 1
        ) t
        """
    )


@register(
    "fn_variant_json",
    category="modern",
    oracle="""
    SELECT event_type,
           floor(avg(CAST(json_extract(props, '$.k') AS INT)) * 100 + 0.5) / 100
             AS avg_k,
           count(CAST(json_extract(props, '$.k') AS INT)) AS n_with_k
    FROM events
    GROUP BY event_type
    """,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payloads via the VARIANT type (Spark 4):
    `parse_json` once, then typed `variant_get` extraction, aggregated
    per event type.

    VARIANT stores the parsed tree in a binary columnar encoding, so
    repeated field extraction skips re-tokenizing the JSON text — the
    at-scale answer to the reference's opaque-payload stance
    (publisher.go:193-196 ships bytes untouched; here the engine lands
    them queryable). The floor-formula rounding keeps the division-
    created average midpoint-stable across engines
    (functions/rounding.py).
    """
    ev = load(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return ev.groupBy("event_type").agg(
        r2(F.avg(k)).alias("avg_k"),
        F.count(k).alias("n_with_k"),
    )


@register(
    "fn_map_hof",
    category="modern",
    oracle="""
    SELECT user_id, event_type, round(ln(CAST(cnt AS DOUBLE)), 4) AS log_cnt
    FROM (
      SELECT user_id, event_type, count(*) AS cnt
      FROM events GROUP BY 1, 2
    )
    WHERE cnt >= 2
    """,
)
def fn_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: build a per-user event-type frequency
    map, `map_filter` rare entries out, `transform_values` to log scale,
    explode back to rows.

    The per-entity feature-map shape (user → {event_type: freq}) is how
    wide sparse features are carried through a training-data pipeline
    without a column per feature. All four map operations
    (map_from_entries / map_filter / transform_values / explode) are
    codegen'd row-local work on top of one groupBy — the map never
    becomes a shuffle key. Oracle is the equivalent flat relational
    form: identical rows, no map type needed.
    """
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("m")
    )
    filtered = m.select(
        "user_id",
        F.expr(
            "transform_values(map_filter(m, (k, v) -> v >= 2),"
            " (k, v) -> round(ln(cast(v AS double)), 4))"
        ).alias("m"),
    )
    return filtered.select(
        "user_id", F.explode("m").alias("event_type", "log_cnt")
    )


@register(
    "agg_approx_topk",
    category="modern",
    oracle="""
    SELECT event_type, count(*) AS cnt
    FROM events
    GROUP BY event_type
    ORDER BY cnt DESC, event_type
    LIMIT 3
    """,
)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via the `approx_top_k` frequency sketch, exploded to
    (item, count) rows.

    The sketch is mergeable: each partition builds a bounded-size
    summary, partials combine map-side, and one tiny shuffle yields the
    global top-k — memory stays O(sketch) regardless of item cardinality,
    which is the only viable heavy-hitters shape at 100 TB (an exact
    groupBy+orderBy+limit shuffles the full key space). On this column
    (5 distinct values, far under the tracked-items bound) the sketch is
    provably exact, so the exact-SQL oracle applies; counts are tie-free
    at every driver scale factor (verified 0.001/0.01/0.1).
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.agg(F.expr("approx_top_k(event_type, 3)").alias("tk"))
        .select(F.explode("tk").alias("t"))
        .select(
            F.col("t.item").alias("event_type"),
            F.col("t.count").alias("cnt"),
        )
    )


@register(
    "fn_url_parse",
    category="modern",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             concat('https://', source, '.example.com/', lang, '/',
                    CAST(doc_id AS VARCHAR), '?ref=search&page=',
                    CAST(doc_id % 7 AS VARCHAR)) AS url
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           regexp_extract(url, 'https://([^/]+)/', 1) AS host,
           regexp_extract(url, 'https://[^/?]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]page=([^&]*)', 1) AS page
    FROM u
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL structural parsing: host / path / single query parameter via
    `parse_url`, over URLs synthesized from document metadata.

    Web-corpus pipelines key dedup and quality decisions on URL
    components (host-level filtering, path-pattern dedup) before ever
    reading page bytes. `parse_url` is a JVM intrinsic (one pass, no
    regex backtracking); the oracle extracts the same components with
    anchored regexes — DuckDB has no parse_url — which doubles as
    documentation of exactly what each component means. Mirrors the
    reference's path-metadata extraction (publisher.go:133) on real
    URL syntax.
    """
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    u = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/"),
            F.col("lang"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
            F.lit("?ref=search&page="),
            (F.col("doc_id") % 7).cast("string"),
        ).alias("url"),
    )
    return u.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("page")).alias("page"),
    )


@register(
    "scan_xml_messages",
    category="modern",
    oracle="""
    SELECT o_orderstatus AS status, count(*) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    GROUP BY 1
    """,
)
def scan_xml_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML message ingestion: per-row XML envelopes parsed with
    `from_xml` into typed structs, then aggregated.

    The streaming-bridge twin for XML-speaking upstreams (the reference
    only ever sees NDJSON, README.md:14-15; enterprise CDC feeds are
    routinely XML). Envelopes are synthesized from orders so the oracle
    can verify the parse by computing the same aggregate straight from
    the source columns — any field mis-parse shows up as a count or
    checksum mismatch. Only integer/string fields go through the XML
    text to keep formatting engine-neutral (no float-to-string
    round-trip).
    """
    orders = load(spark, sf_dir, "orders")
    xml = orders.select(
        F.concat(
            F.lit("<order><key>"),
            F.col("o_orderkey").cast("string"),
            F.lit("</key><status>"),
            F.col("o_orderstatus"),
            F.lit("</status></order>"),
        ).alias("raw")
    )
    parsed = xml.select(
        F.from_xml(F.col("raw"), "key BIGINT, status STRING").alias("x")
    )
    return parsed.groupBy(F.col("x.status").alias("status")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x.key").alias("key_sum"),
    )


@register(
    "fn_try_arith",
    category="modern",
    oracle="""
    SELECT o_orderkey,
           floor(o_totalprice / nullif(o_custkey % 3, 0) * 100 + 0.5) / 100
             AS per_unit,
           TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_num,
           TRY_CAST(o_orderstatus AS INT)                    AS status_num
    FROM orders
    WHERE o_orderkey <= 5000
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic and casting: try_divide / try_cast yield
    NULL instead of failing the job.

    Under ANSI mode (the Spark 4 default) a single divide-by-zero or
    bad cast kills the whole query — at 100 TB that's hours of compute
    lost to one malformed row. The try_* family is the row-level
    dead-letter stance (the same never-drop-silently posture as
    scan_json_corrupt): poison rows surface as NULLs that downstream
    filters can route, and the job finishes. The oracle expresses the
    identical semantics with nullif guards and TRY_CAST; the division
    result rounds via the floor formula (functions/rounding.py) since
    division-created midpoints split Spark/DuckDB round().
    """
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    return orders.select(
        "o_orderkey",
        (
            F.floor(
                F.try_divide("o_totalprice", F.col("o_custkey") % 3) * 100
                + F.lit(0.5)
            )
            / 100
        ).alias("per_unit"),
        F.try_to_number(
            F.substring("o_orderpriority", 1, 1), F.lit("9")
        ).cast("int").alias("prio_num"),
        F.col("o_orderstatus").try_cast("int").alias("status_num"),
    )


@register(
    "sql_pipe_syntax",
    category="modern",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship pricing-summary shape expressed in Spark 4's SQL
    PIPE syntax (`FROM ... |> WHERE ... |> AGGREGATE ... |> ORDER BY`)
    — the modern linear-dataflow SQL dialect (SQL-pipe, per the
    "SQL Has Problems" pipe-syntax proposal adopted by Spark 4 and
    BigQuery).

    Same logical plan as agg_hash_groupby: the pipe stages are pure
    syntax — Catalyst receives the identical filter→aggregate→sort
    tree, so pushdown, partial aggregation, and AQE all apply
    unchanged (the point of the op: dialect breadth costs nothing at
    the plan level). The oracle is the equivalent ANSI formulation.
    """
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_pipe")
    return spark.sql(
        """
        FROM lineitem_pipe
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> AGGREGATE
             CAST(count(*) AS BIGINT) AS n_rows,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice * (1 - l_discount)), 2)
               AS sum_disc_price
           GROUP BY l_returnflag, l_linestatus
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


@register(
    "scan_fixed_width",
    category="modern",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS cents_sum,
           CAST(sum(CAST(strftime(CAST(o_orderdate AS DATE), '%Y%m%d')
                         AS BIGINT)) AS BIGINT) AS date_sum
    FROM orders
    GROUP BY 1 ORDER BY 1
    """,
)
def scan_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXED-WIDTH record ingestion — the mainframe/COBOL copybook
    layout that predates every delimiter format and still feeds
    enterprise CDC: each record is a 60-byte line with columns at
    fixed byte offsets (orderkey@0:12 zero-padded, custkey@12:10,
    status@22:1, total-cents@23:14, date@37:8 as yyyymmdd,
    priority@45:15 space-padded), no delimiters, no quoting, no
    schema in the data. Records are rendered from orders in-plan
    (lpad/rpad), parsed back by pure substring arithmetic + trim +
    casts — the parse is the product; the round-trip means any
    off-by-one in an offset, a padding direction, or a sign column
    corrupts the aggregate the oracle computes straight from the
    source columns.

    Scale: both the render and the parse are narrow row-local
    projections inside whole-stage codegen; the only shuffle is the
    final ≤3-key aggregate. A real deployment swaps the render for
    spark.read.text over the EBCDIC-converted landing files — the
    parse projection is identical.
    """
    orders = load(spark, sf_dir, "orders")
    lines = orders.selectExpr(
        "concat("
        " lpad(CAST(o_orderkey AS STRING), 12, '0'),"
        " lpad(CAST(o_custkey AS STRING), 10, '0'),"
        " o_orderstatus,"
        " lpad(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
        "           AS STRING), 14, '0'),"
        " date_format(o_orderdate, 'yyyyMMdd'),"
        " rpad(o_orderpriority, 15, ' ')"
        ") AS line"
    )
    parsed = lines.selectExpr(
        "CAST(substring(line, 1, 12) AS BIGINT) AS orderkey",
        "CAST(substring(line, 13, 10) AS BIGINT) AS custkey",
        "substring(line, 23, 1) AS status",
        "CAST(substring(line, 24, 14) AS BIGINT) AS cents",
        "CAST(substring(line, 38, 8) AS BIGINT) AS datenum",
        "trim(substring(line, 46, 15)) AS priority",
    )
    return (
        parsed.groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("orderkey").cast("bigint").alias("key_sum"),
            F.sum("cents").cast("bigint").alias("cents_sum"),
            F.sum("datenum").cast("bigint").alias("date_sum"),
        )
        .orderBy("status")
    )


# --- fn_ip_cidr: IPv4 parse + CIDR block accounting -----------------------


def _cidr_blocks() -> list[tuple[str, int, int]]:
    """(cidr, lo, hi) literals computed once in Python and injected
    into both plans — the numeric range IS the CIDR semantics, so both
    engines do pure integer comparisons. The 190.128.0.0/9 block
    deliberately covers only HALF of the 190.x space the generator
    emits, so the range logic (not just first-octet matching) is
    load-bearing."""
    out = []
    for cidr in ("10.0.0.0/8", "70.0.0.0/10", "130.0.0.0/7",
                 "190.128.0.0/9"):
        base, pfx = cidr.split("/")
        a, b, c, d = (int(x) for x in base.split("."))
        lo = ((a * 256 + b) * 256 + c) * 256 + d
        hi = lo + (1 << (32 - int(pfx))) - 1
        out.append((cidr, lo, hi))
    return out


_CIDR_VALUES = ", ".join(
    f"('{c}', {lo}, {hi})" for c, lo, hi in _cidr_blocks()
)

# Deterministic IPv4 per user: first octet picks one of four /8-ish
# neighborhoods, the rest are multiplicative hashes. Identical SQL text
# on both engines.
_IP_SYNTH_SQL = """
      SELECT user_id,
             10 + (user_id % 4) * 60 AS o1,
             user_id % 256 AS o2,
             (user_id * 7) % 256 AS o3,
             (user_id * 13) % 256 AS o4
      FROM (SELECT DISTINCT user_id FROM events) u
"""


@register(
    "fn_ip_cidr",
    category="modern",
    oracle=f"""
    WITH octs AS ({_IP_SYNTH_SQL}),
    ips AS (
      SELECT user_id,
             concat(CAST(o1 AS VARCHAR), '.', CAST(o2 AS VARCHAR), '.',
                    CAST(o3 AS VARCHAR), '.', CAST(o4 AS VARCHAR)) AS ip,
             ((o1 * 256 + o2) * 256 + o3) * 256 + o4 AS ip_num
      FROM octs
    ),
    parsed AS (
      SELECT user_id, ip, ip_num,
             ((CAST(string_split(ip, '.')[1] AS BIGINT) * 256
               + CAST(string_split(ip, '.')[2] AS BIGINT)) * 256
              + CAST(string_split(ip, '.')[3] AS BIGINT)) * 256
             + CAST(string_split(ip, '.')[4] AS BIGINT) AS parsed_num
      FROM ips
    ),
    blocks(cidr, lo, hi) AS (VALUES {_CIDR_VALUES})
    SELECT coalesce(b.cidr, 'unmatched') AS block,
           CAST(count(*) AS BIGINT) AS n_ips,
           CAST(min(p.parsed_num) AS BIGINT) AS min_ip,
           CAST(max(p.parsed_num) AS BIGINT) AS max_ip,
           CAST(sum(CASE WHEN p.parsed_num = p.ip_num THEN 1 ELSE 0 END)
                AS BIGINT) AS n_roundtrip_ok
    FROM parsed p
    LEFT JOIN blocks b ON p.parsed_num BETWEEN b.lo AND b.hi
    GROUP BY 1
    ORDER BY 1
    """,
)
def fn_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 ADDRESS FUNCTIONS: dotted-quad rendering, string→uint32
    parsing, and CIDR-block containment accounting — the network
    function family (Trino's ip_address ops, ClickHouse's IPv4
    functions) that log/security analytics lean on, absent from
    Spark's builtin surface; here composed from split/cast/integer
    arithmetic so both engines share exact semantics. Addresses are
    synthesized per user, rendered to dotted strings, parsed BACK to
    integers (n_roundtrip_ok pins render∘parse = id), and routed to
    CIDR blocks by pure range containment (lo/hi literals computed
    from the prefix once in Python — the trig-table device; the /9
    block covers only half its first-octet space so prefix-length
    logic is load-bearing; 190.0.0.0–190.127.x falls through to
    'unmatched').

    Scale: the block table is a 4-row broadcast range join (BETWEEN
    on integers — BroadcastNestedLoop over 4 rows ≈ free); parsing is
    row-local codegen. At 100 TB the same shape holds with thousands
    of blocks via join_range_binned's bucketed variant.
    """
    users = load(spark, sf_dir, "events").select("user_id").distinct()
    octs = users.selectExpr(
        "user_id",
        "10 + (user_id % 4) * 60 AS o1",
        "user_id % 256 AS o2",
        "(user_id * 7) % 256 AS o3",
        "(user_id * 13) % 256 AS o4",
    )
    ips = octs.selectExpr(
        "user_id",
        "concat(CAST(o1 AS STRING), '.', CAST(o2 AS STRING), '.',"
        " CAST(o3 AS STRING), '.', CAST(o4 AS STRING)) AS ip",
        "((o1 * 256 + o2) * 256 + o3) * 256 + o4 AS ip_num",
    )
    parsed = ips.selectExpr(
        "user_id",
        "ip",
        "ip_num",
        "((CAST(element_at(split(ip, '[.]'), 1) AS BIGINT) * 256"
        " + CAST(element_at(split(ip, '[.]'), 2) AS BIGINT)) * 256"
        " + CAST(element_at(split(ip, '[.]'), 3) AS BIGINT)) * 256"
        " + CAST(element_at(split(ip, '[.]'), 4) AS BIGINT) AS parsed_num",
    )
    blocks = spark.sql(
        f"SELECT * FROM (VALUES {_CIDR_VALUES}) AS blocks(cidr, lo, hi)"
    )
    return (
        parsed.join(
            F.broadcast(blocks),
            F.col("parsed_num").between(F.col("lo"), F.col("hi")),
            "left",
        )
        .groupBy(F.coalesce(F.col("cidr"), F.lit("unmatched")).alias("block"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ips"),
            F.min("parsed_num").cast("bigint").alias("min_ip"),
            F.max("parsed_num").cast("bigint").alias("max_ip"),
            F.sum(
                F.expr("CASE WHEN parsed_num = ip_num THEN 1 ELSE 0 END")
            )
            .cast("bigint")
            .alias("n_roundtrip_ok"),
        )
        .orderBy("block")
    )


# Shared line synthesis: RFC3164-shaped syslog lines rendered from the
# events table (zero-padded day variant; English month abbreviations in
# both engines' formatters). The PARSE back out is the product.
_SYSLOG_RENDER_SPARK = (
    "concat('<', CAST(user_id % 24 * 8 + event_id % 8 AS STRING), '>',"
    " date_format(CAST(ts AS TIMESTAMP), 'MMM dd HH:mm:ss'), ' ',"
    " 'host-', CAST(user_id % 50 AS STRING), ' ',"
    " event_type, '[', CAST(event_id % 1000 AS STRING), ']: ',"
    " 'value=', CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS STRING))"
)


@register(
    "scan_syslog_rfc3164",
    category="modern",
    oracle="""
    SELECT CAST(event_id % 8 AS BIGINT) AS severity,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id % 50) AS BIGINT) AS n_hosts,
           CAST(min(user_id % 24 * 8 + event_id % 8) AS BIGINT) AS min_pri,
           CAST(max(user_id % 24 * 8 + event_id % 8) AS BIGINT) AS max_pri,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS cents_sum
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)
def scan_syslog_rfc3164(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYSLOG (RFC 3164) LINE INGESTION — the log-analytics staple:
    `<PRI>MMM dd HH:mm:ss host tag[pid]: msg` lines rendered from
    events in-plan, then parsed back by pure string arithmetic —
    PRI between the angle brackets decodes to facility = pri div 8 /
    severity = pri mod 8, the host is the 4th space token, the pid
    sits between '[' and ']', and the kv payload is split on '='.
    The oracle computes the same per-severity aggregate straight from
    the source columns, so every extraction (bracket offsets, token
    positions, the facility/severity ring arithmetic) is load-bearing:
    an off-by-one returns wrong counts, not an error.

    Scale: render and parse are row-local codegen (substring/instr/
    split — no regex backtracking); the only shuffle is the 8-key
    aggregate. A real deployment replaces the render with
    spark.read.text over the collector's landing files — the parse
    projection is identical, which is the point of shipping it.
    """
    events = load(spark, sf_dir, "events")
    lines = events.selectExpr(f"{_SYSLOG_RENDER_SPARK} AS line")
    parsed = lines.selectExpr(
        "CAST(substring(line, 2, instr(line, '>') - 2) AS BIGINT) AS pri",
        "element_at(split(line, ' '), 4) AS host",
        "substring(element_at(split(line, ' '), 5), 1,"
        " instr(element_at(split(line, ' '), 5), '[') - 1) AS tag",
        "CAST(substring(element_at(split(line, ' '), 5),"
        " instr(element_at(split(line, ' '), 5), '[') + 1,"
        " instr(element_at(split(line, ' '), 5), ']')"
        " - instr(element_at(split(line, ' '), 5), '[') - 1) AS BIGINT)"
        " AS pid",
        "CAST(element_at(split(element_at(split(line, ' '), 6), '='), 2)"
        " AS BIGINT) AS cents",
    )
    return (
        parsed.selectExpr(
            "pri div 8 AS facility",
            "pri % 8 AS severity",
            "host",
            "cents",
        )
        .groupBy("severity")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct("host").cast("bigint").alias("n_hosts"),
            F.min(F.expr("facility * 8 + severity"))
            .cast("bigint")
            .alias("min_pri"),
            F.max(F.expr("facility * 8 + severity"))
            .cast("bigint")
            .alias("max_pri"),
            F.sum("cents").cast("bigint").alias("cents_sum"),
        )
        .orderBy("severity")
    )


@register(
    "fn_business_days",
    category="modern",
    oracle="""
    WITH spans AS (
      SELECT o_orderkey,
             CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               AS d0,
             CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               + 1 + o_orderkey % 45 AS d1
      FROM orders WHERE o_orderkey % 11 = 0
    ),
    marked AS (
      SELECT o_orderkey, d0, d1,
             d1 - d0 AS calendar_days,
             (d1 - d0) // 7 * 5
             + CASE
                 WHEN (d1 - d0) % 7 = 0 THEN 0
                 ELSE (d1 - d0) % 7
                      - CASE WHEN (d0 + 4) % 7 + (d1 - d0) % 7 >= 7
                             THEN 1 ELSE 0 END
                      - CASE WHEN (d0 + 3) % 7 + (d1 - d0) % 7 >= 7
                             THEN 1 ELSE 0 END
               END AS biz_days
      FROM spans
    )
    SELECT CAST(calendar_days // 7 AS BIGINT) AS weeks_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(biz_days) AS BIGINT) AS biz_days_sum,
           CAST(min(biz_days) AS BIGINT) AS biz_days_min,
           CAST(max(biz_days) AS BIGINT) AS biz_days_max,
           CAST(sum(calendar_days) AS BIGINT) AS calendar_days_sum
    FROM marked
    GROUP BY 1
    ORDER BY 1
    """,
)
def fn_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUSINESS-DAY ARITHMETIC — networkdays(start, end) as a pure
    integer closed form, the date-function every SLA/aging report
    needs and no engine agrees on natively: for a half-open span of n
    calendar days starting on epoch-day d0, business days =
    (n div 7)·5 + (n mod 7) − [remainder window covers a Saturday] −
    [covers a Sunday], where day-of-week is epoch-day arithmetic
    ((d+4) mod 7 = 0 ⇒ Thursday epoch anchor makes Saturday (d+4)%7=6
    ⇔ (d+4)%7+r≥7 …) — every term is integer modular arithmetic, so
    the fn is exact on both engines and the invariant test brute-
    forces it against a day-by-day Python loop for every span.

    Spans are synthesized per order (1..45 calendar days). Shape: a
    row-local projection inside codegen plus one small-key aggregate
    — the fn_date family pattern; the closed form is O(1) per row
    where the naive generate-a-calendar join is O(span).
    """
    orders = load(spark, sf_dir, "orders")
    spans = orders.filter(F.expr("o_orderkey % 11 = 0")).selectExpr(
        "o_orderkey",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')"
        " AS BIGINT) AS d0",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')"
        " AS BIGINT) + 1 + o_orderkey % 45 AS d1",
    )
    marked = spans.selectExpr(
        "o_orderkey",
        "d1 - d0 AS calendar_days",
        "(d1 - d0) div 7 * 5"
        " + CASE"
        "     WHEN (d1 - d0) % 7 = 0 THEN 0"
        "     ELSE (d1 - d0) % 7"
        "          - CASE WHEN (d0 + 4) % 7 + (d1 - d0) % 7 >= 7"
        "                 THEN 1 ELSE 0 END"
        "          - CASE WHEN (d0 + 3) % 7 + (d1 - d0) % 7 >= 7"
        "                 THEN 1 ELSE 0 END"
        "   END AS biz_days",
    )
    return (
        marked.groupBy(
            F.expr("calendar_days div 7").cast("bigint").alias("weeks_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("biz_days").cast("bigint").alias("biz_days_sum"),
            F.min("biz_days").cast("bigint").alias("biz_days_min"),
            F.max("biz_days").cast("bigint").alias("biz_days_max"),
            F.sum("calendar_days").cast("bigint").alias("calendar_days_sum"),
        )
        .orderBy("weeks_bucket")
    )


# Luhn digit-doubling map as identical SQL text: doubled = 2d, minus 9
# when 2d > 9 — written as a closed form over substring-extracted digits.
def _luhn_digit_terms(col: str, n_digits: int = 12) -> str:
    """Sum of Luhn-weighted digits for a fixed-width numeric string:
    rightmost digit is the check position (weight 1), parity alternates
    leftward. Identical text on both engines (substring + CAST only)."""
    terms = []
    for pos in range(1, n_digits + 1):
        d = f"CAST(substring({col}, {pos}, 1) AS BIGINT)"
        if (n_digits - pos) % 2 == 1:  # doubled positions
            terms.append(f"(2 * {d} - CASE WHEN {d} >= 5 THEN 9 ELSE 0 END)")
        else:
            terms.append(d)
    return " + ".join(terms)


_LUHN_NUM_SQL = """
      SELECT o_orderkey,
             lpad(CAST(100000000000 + ((o_orderkey % 1048576) * 2654435761) % 899999999999
                       AS VARCHAR), 12, '0') AS raw
      FROM orders
"""


@register(
    "fn_luhn_checksum",
    category="modern",
    oracle=f"""
    WITH nums AS ({_LUHN_NUM_SQL}),
    issued AS (
      SELECT o_orderkey,
             substring(raw, 1, 11) ||
             CAST((10 - ({_luhn_digit_terms("substring(raw, 1, 11) || '0'")})
                   % 10) % 10 AS VARCHAR) AS account,
             o_orderkey % 5 = 0 AS corrupted
      FROM nums
    ),
    final AS (
      SELECT o_orderkey,
             CASE WHEN corrupted THEN
               substring(account, 1, 5)
               || CAST((CAST(substring(account, 6, 1) AS BIGINT) + 1) % 10
                       AS VARCHAR)
               || substring(account, 7, 6)
             ELSE account END AS account,
             corrupted
      FROM issued
    )
    SELECT ({_luhn_digit_terms("account")}) % 10 = 0 AS luhn_valid,
           corrupted,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_checksum
    FROM final
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def fn_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LUHN CHECKSUM issue + validate — the mod-10 digit algorithm
    behind card/IMEI/account-number validation, as a pure
    substring-and-integer closed form (no UDF): 12-digit account
    numbers are ISSUED in-plan (11 payload digits + computed check
    digit), a planted 20% are then CORRUPTED by a single-digit
    increment, and the validator recomputes the checksum. The
    invariant is structural: Luhn detects EVERY single-digit
    substitution, so the validity column must equal NOT corrupted
    exactly — the oracle's group-by proves the engine agrees on all
    four (valid × corrupted) cells, of which exactly two are
    populated.

    Shape: fixed-width digit extraction unrolls to 12 substring+CAST
    terms inside whole-stage codegen (the fn_date family pattern);
    one ≤4-key aggregate. Exactness: all integer arithmetic.
    """
    orders = load(spark, sf_dir, "orders")
    nums = orders.selectExpr(
        "o_orderkey",
        "lpad(CAST(100000000000 + ((o_orderkey % 1048576) * 2654435761)"
        " % 899999999999 AS STRING), 12, '0') AS raw",
    )
    check_terms = _luhn_digit_terms("concat(substring(raw, 1, 11), '0')")
    issued = nums.selectExpr(
        "o_orderkey",
        f"concat(substring(raw, 1, 11), CAST((10 - ({check_terms}) % 10)"
        " % 10 AS STRING)) AS account",
        "o_orderkey % 5 = 0 AS corrupted",
    )
    final = issued.selectExpr(
        "o_orderkey",
        "CASE WHEN corrupted THEN"
        " concat(substring(account, 1, 5),"
        " CAST((CAST(substring(account, 6, 1) AS BIGINT) + 1) % 10"
        " AS STRING), substring(account, 7, 6))"
        " ELSE account END AS account",
        "corrupted",
    )
    return (
        final.selectExpr(
            f"({_luhn_digit_terms('account')}) % 10 = 0 AS luhn_valid",
            "corrupted",
            "o_orderkey",
        )
        .groupBy("luhn_valid", "corrupted")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("o_orderkey").cast("bigint").alias("key_checksum"),
        )
        .orderBy("luhn_valid", "corrupted")
    )


# Shared rendering of an RFC 4122 version-3 (md5, name-based) UUID from a
# 32-hex digest — identical SQL text on both engines. The version nibble
# is forced to '3' and the variant nibble to 8|9|a|b by mapping the
# digest's 17th hex char through a 4-way CASE (hex arithmetic without
# hex parsing, so no dialect gap).
def _uuid3_sql(h: str) -> str:
    variant = (
        f"CASE WHEN substring({h}, 17, 1) IN ('0','4','8','c') THEN '8'"
        f" WHEN substring({h}, 17, 1) IN ('1','5','9','d') THEN '9'"
        f" WHEN substring({h}, 17, 1) IN ('2','6','a','e') THEN 'a'"
        f" ELSE 'b' END"
    )
    return (
        f"concat(substring({h}, 1, 8), '-', substring({h}, 9, 4), '-3',"
        f" substring({h}, 14, 3), '-', {variant}, substring({h}, 18, 3),"
        f" '-', substring({h}, 21, 12))"
    )


@register(
    "fn_uuid_v3",
    category="modern",
    oracle=f"""
    WITH named AS (
      SELECT o_orderkey,
             md5(concat('cdc:orders:', CAST(o_orderkey AS VARCHAR)))
               AS h
      FROM orders
    ),
    minted AS (
      SELECT o_orderkey, {_uuid3_sql("h")} AS uuid
      FROM named
    )
    SELECT substring(uuid, 20, 1) AS variant_nibble,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT uuid) AS BIGINT) AS n_distinct,
           CAST(sum(CASE WHEN substring(uuid, 15, 1) = '3'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_version3,
           CAST(sum(CASE WHEN length(uuid) = 36
                    AND substring(uuid, 9, 1) = '-'
                    AND substring(uuid, 14, 1) = '-'
                    AND substring(uuid, 19, 1) = '-'
                    AND substring(uuid, 24, 1) = '-'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_wellformed,
           min(uuid) AS sample_uuid
    FROM minted
    GROUP BY 1
    ORDER BY 1
    """,
)
def fn_uuid_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC UUID MINTING (RFC 4122 version 3, md5 name-based)
    — the stable-identifier primitive every CDC pipeline needs when
    downstream systems demand UUIDs but replays must mint the SAME id
    for the same business key (a random uuid() would break
    exactly-once semantics; the reference's uniquer path component,
    publisher.go:133, exists for the same replay-stability reason).
    Names are 'cdc:orders:<key>'; the digest is reshaped into the
    8-4-4-4-12 form with the version nibble forced to 3 and the
    variant nibble to 8/9/a/b — done with substring + CASE hex
    arithmetic, so both engines mint byte-identical ids.

    Output: per variant nibble, counts, distinctness (minting must be
    injective over keys — pinned), version/wellformedness tallies,
    and the min uuid as a spot sample. Shape: row-local codegen plus
    one 4-key aggregate.
    """
    orders = load(spark, sf_dir, "orders")
    named = orders.selectExpr(
        "o_orderkey",
        "md5(concat('cdc:orders:', CAST(o_orderkey AS STRING))) AS h",
    )
    minted = named.selectExpr(
        "o_orderkey", f"{_uuid3_sql('h')} AS uuid"
    )
    return (
        minted.groupBy(
            F.expr("substring(uuid, 20, 1)").alias("variant_nibble")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct("uuid").cast("bigint").alias("n_distinct"),
            F.sum(
                F.expr(
                    "CASE WHEN substring(uuid, 15, 1) = '3'"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("n_version3"),
            F.sum(
                F.expr(
                    "CASE WHEN length(uuid) = 36"
                    " AND substring(uuid, 9, 1) = '-'"
                    " AND substring(uuid, 14, 1) = '-'"
                    " AND substring(uuid, 19, 1) = '-'"
                    " AND substring(uuid, 24, 1) = '-'"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("n_wellformed"),
            F.min("uuid").alias("sample_uuid"),
        )
        .orderBy("variant_nibble")
    )


# Shared WARC record layout rendered from documents (CRLF header block,
# Content-Length in BYTES of the payload, blank-line separator).
_WARC_RENDER_SPARK = (
    "concat('WARC/1.0\\r\\n',"
    " 'WARC-Type: ', CASE WHEN doc_id % 5 = 0 THEN 'request'"
    " ELSE 'response' END, '\\r\\n',"
    " 'WARC-Target-URI: https://', source, '.example.com/',"
    " CAST(doc_id AS STRING), '\\r\\n',"
    " 'WARC-Date: 2024-', lpad(CAST(1 + doc_id % 12 AS STRING), 2, '0'),"
    " '-', lpad(CAST(1 + doc_id % 28 AS STRING), 2, '0'),"
    " 'T03:14:15Z\\r\\n',"
    " 'Content-Length: ', CAST(length(text) AS STRING), '\\r\\n',"
    " '\\r\\n', text)"
)


@register(
    "scan_warc_records",
    category="modern",
    oracle="""
    SELECT source,
           CASE WHEN doc_id % 5 = 0 THEN 'request' ELSE 'response' END
             AS rec_type,
           CAST(count(*) AS BIGINT) AS n_records,
           CAST(sum(length(text)) AS BIGINT) AS payload_bytes,
           CAST(sum(CASE WHEN length(text) = n_chars THEN 1 ELSE 0 END)
                AS BIGINT) AS n_length_ok,
           CAST(sum(doc_id) AS BIGINT) AS uri_checksum
    FROM documents
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def scan_warc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC (Web ARChive) RECORD INGESTION — the container format the
    pretraining world actually reads (Common Crawl ships WARC;
    CCNet/RefinedWeb/FineWeb pipelines all start by walking WARC
    response records): version line, CRLF header block (record type,
    target URI, date, Content-Length in payload bytes), blank-line
    separator, payload. Records are rendered from documents in-plan
    and parsed back by pure string arithmetic — headers split on
    CRLF, values after ': ', the payload taken by OFFSET from the
    double-CRLF boundary so Content-Length is verified against the
    actual payload (the load-bearing check: WARC consumers that trust
    the header over the bytes corrupt every downstream offset).
    Output: per (source × record type) counts, payload bytes, the
    header-vs-actual length agreement tally, and a URI checksum
    (doc ids parsed back out of the URIs).

    Scale: render and parse are row-local codegen; one bounded-key
    aggregate. A real deployment reads WARC segments via
    spark.read.text with a custom record delimiter — the header
    parse projection is identical.
    """
    docs = load(spark, sf_dir, "documents")
    recs = docs.selectExpr(
        "n_chars", f"{_WARC_RENDER_SPARK} AS warc"
    )
    hdr_end = "instr(warc, '\\r\\n\\r\\n')"
    parsed = recs.selectExpr(
        "n_chars",
        # header block = everything before the blank line
        f"substring(warc, 1, {hdr_end} - 1) AS hdrs",
        f"substring(warc, {hdr_end} + 4) AS payload",
    ).selectExpr(
        "n_chars",
        "payload",
        "element_at(split(element_at(split(hdrs, '\\r\\n'), 2), ': '), 2)"
        " AS rec_type",
        "element_at(split(element_at(split(hdrs, '\\r\\n'), 3), ': '), 2)"
        " AS uri",
        "CAST(element_at(split(element_at(split(hdrs, '\\r\\n'), 5),"
        " ': '), 2) AS BIGINT) AS declared_len",
    ).selectExpr(
        "rec_type",
        "declared_len",
        "length(payload) AS actual_len",
        "n_chars",
        "element_at(split(uri, '[.]'), 1) AS srcpart",
        "CAST(element_at(split(uri, '/'), 4) AS BIGINT) AS doc_id",
    )
    return (
        parsed.selectExpr(
            "substring(srcpart, 9) AS source",  # strip 'https://'
            "rec_type",
            "declared_len",
            "actual_len",
            "n_chars",
            "doc_id",
        )
        .groupBy("source", "rec_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_records"),
            F.sum("actual_len").cast("bigint").alias("payload_bytes"),
            F.sum(
                F.expr(
                    "CASE WHEN declared_len = actual_len"
                    " AND actual_len = n_chars THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("n_length_ok"),
            F.sum("doc_id").cast("bigint").alias("uri_checksum"),
        )
        .orderBy("source", "rec_type")
    )


# --- r12 growth: NCSA combined access-log ingestion -------------------------
#
# Status synthesis shared by the Spark render and the oracle: errors map
# to 5xx, purchases to 201, a planted 1/17 hash slice to 404, the rest
# 200. event_id is reduced before any multiply per the scale-probe rule.
_ACCESS_STATUS_SQL = (
    "CASE WHEN event_type = 'error' THEN 500 + (event_id % 2) * 3"
    " WHEN event_type = 'purchase' THEN 201"
    " WHEN event_id % 17 = 0 THEN 404 ELSE 200 END"
)


@register(
    "scan_apache_access_log",
    category="modern",
    oracle=f"""
    WITH src AS (
      SELECT {_ACCESS_STATUS_SQL} AS status,
             event_type || '/' || CAST(event_id % 100 AS VARCHAR) AS path,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS bytes,
             hour(ts) AS hr,
             -- the synthesized dotted quad is injective in user_id % 256
             -- (every octet reduces mod 256), so distinct-IP == distinct
             -- residue, NOT distinct user_id once the domain tops 256
             user_id % 256 AS client
      FROM events
    )
    SELECT CAST(status AS BIGINT) AS status,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT path) AS BIGINT) AS n_paths,
           CAST(count(DISTINCT client) AS BIGINT) AS n_clients,
           CAST(sum(bytes) AS BIGINT) AS bytes_sum,
           CAST(min(hr) AS BIGINT) AS hr_min,
           CAST(max(hr) AS BIGINT) AS hr_max
    FROM src
    GROUP BY 1
    ORDER BY 1
    """,
)
def scan_apache_access_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NCSA COMBINED ACCESS-LOG INGESTION — the web-analytics staple:
    `ip - user [dd/MMM/yyyy:HH:mm:ss +0000] "GET /path HTTP/1.1"
    status bytes "referer" "ua"` lines rendered from events in-plan,
    then parsed back by QUOTE-AWARE splitting (the format's defining
    hazard: the request / referer / UA fields may contain spaces, so
    token positions are only stable AFTER splitting on '\"' —
    odd-indexed fragments are quoted fields, even-indexed fragments
    carry the space-token fields). The parse recovers ip (token 1 of
    the prefix), the hour (fixed offset 13 inside the bracketed
    zero-padded timestamp), path (token 2 of the request), status and
    bytes (tokens 1-2 of the mid fragment). The oracle recomputes the
    same per-status aggregate from the source columns, so every
    offset and split index is load-bearing; the status map plants
    5xx/404 slices (scan_syslog_rfc3164's render-parse convention).

    Scale shape: render and parse are row-local codegen (split/
    substring — no regex backtracking); the only shuffle is the
    ≤5-key status aggregate with two count-distincts bounded by the
    path (500) and client domains. A deployment replaces the render
    with spark.read.text over the collector's files; the parse
    projection is identical.
    """
    ev = load(spark, sf_dir, "events")
    lines = ev.selectExpr(
        "concat("
        "  CAST(10 + user_id % 4 * 60 AS STRING), '.',"
        "  CAST(user_id % 256 AS STRING), '.',"
        "  CAST(user_id * 7 % 256 AS STRING), '.',"
        "  CAST(user_id * 13 % 256 AS STRING),"
        "  ' - u', CAST(user_id AS STRING),"
        "  ' [', date_format(CAST(ts AS TIMESTAMP),"
        "        'dd/MMM/yyyy:HH:mm:ss'), ' +0000]',"
        "  ' \"GET /', event_type, '/', CAST(event_id % 100 AS STRING),"
        "  ' HTTP/1.1\" ',"
        f" CAST({_ACCESS_STATUS_SQL} AS STRING),"
        "  ' ', CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS STRING),"
        "  ' \"https://ref.example/', CAST(user_id % 7 AS STRING), '\"',"
        "  ' \"Mozilla/5.0 (agent ', CAST(event_id % 13 AS STRING), ')\"'"
        ") AS line"
    )
    parsed = lines.selectExpr(
        "element_at(split(line, '\"'), 1) AS prefix",
        "element_at(split(line, '\"'), 2) AS request",
        "element_at(split(line, '\"'), 3) AS mid",
        "element_at(split(line, '\"'), 4) AS referer",
    ).selectExpr(
        "element_at(split(prefix, ' '), 1) AS ip",
        "CAST(substring(element_at(split(prefix, '\\\\['), 2), 13, 2)"
        " AS BIGINT) AS hr",
        "substring(element_at(split(request, ' '), 2), 2) AS path",
        "CAST(element_at(split(trim(mid), ' '), 1) AS BIGINT) AS status",
        "CAST(element_at(split(trim(mid), ' '), 2) AS BIGINT) AS bytes",
    )
    return (
        parsed.groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct("path").cast("bigint").alias("n_paths"),
            F.countDistinct("ip").cast("bigint").alias("n_clients"),
            F.sum("bytes").cast("bigint").alias("bytes_sum"),
            F.min("hr").cast("bigint").alias("hr_min"),
            F.max("hr").cast("bigint").alias("hr_max"),
        )
        .orderBy("status")
    )


# --- r12 extension wave: RFC 4155 mbox mailbox ingestion ---------------------


@register(
    "scan_mbox",
    category="modern",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_msgs,
           CAST(count(DISTINCT doc_id // 100) AS BIGINT) AS n_blobs,
           CAST(sum(doc_id) AS BIGINT) AS msgid_checksum,
           CAST(sum(CASE WHEN doc_id % 9 = 0 THEN 1 ELSE 0 END
                    + CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_quoted_lines,
           CAST(sum(CASE WHEN doc_id % 9 = 0 THEN 58
                         ELSE least(60, length(text)) END
                    + 1
                    + CASE WHEN doc_id % 4 = 0 THEN 15 ELSE 7 END)
                AS BIGINT) AS body_bytes
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def scan_mbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 4155 MBOX MAILBOX INGESTION — the classic email-corpus
    format (and a staple LLM pretraining source: Enron, mailing-list
    archives). Messages are rendered from documents in-plan into
    multi-message mailbox blobs (~5 messages per (source, bucket)
    blob, the bounded
    collect_list group pattern), then parsed back by the format's
    defining rule: a message starts at a line beginning ``From `` (the
    postmark), and body lines that would collide are ``>``-escaped by
    the writer (mboxo convention), so the reader must BOTH split on
    unescaped postmarks and unquote ``>From `` body lines. Two escape
    populations are planted: doc_id % 4 == 0 bodies carry a literal
    ``From tracker ok`` line, and doc_id % 9 == 0 bodies START with
    ``From the archive: …`` — a parser that splits on every ``From ``
    (ignoring escapes) over-counts messages on both slices; one that
    forgets to unquote inflates body_bytes by the escape bytes. The
    oracle recomputes every aggregate (message count, blob count,
    Message-ID checksum, quoted-line count, unquoted body bytes) in
    closed form from the source columns, so the postmark split, the
    header walk (Message-ID), the header/body blank-line boundary,
    and the unquote are each load-bearing.

    Scale shape: blob assembly is a bounded groupBy (~5 msgs per
    blob — at 100 TB the renderer is replaced by spark.read.text with
    a custom line delimiter over collector files, the parse projection
    is identical); parse is row-local codegen (split/regexp_extract);
    the only data-sized shuffle is the 20-key source aggregate.
    """
    docs = load(spark, sf_dir, "documents")
    msgs = docs.selectExpr(
        "source",
        "doc_id div 100 AS bucket",
        "doc_id",
        "CASE WHEN doc_id % 9 = 0"
        " THEN 'From the archive: ' || substring(text, 1, 40)"
        " ELSE substring(text, 1, 60) END AS body1",
        "CASE WHEN doc_id % 4 = 0 THEN 'From tracker ok'"
        " ELSE 'Body ok' END AS body2",
    ).selectExpr(
        "source",
        "bucket",
        "doc_id",
        # mboxo writer: >-escape body lines that begin with the postmark.
        "concat("
        " 'From daemon@', source, ' Thu Jan  1 00:00:00 2024\\n',"
        " 'Message-ID: <', CAST(doc_id AS STRING), '@', source, '>\\n',"
        " 'Subject: doc ', CAST(doc_id AS STRING), '\\n',"
        " '\\n',"
        " CASE WHEN body1 LIKE 'From %' THEN '>' || body1 ELSE body1 END,"
        " '\\n',"
        " CASE WHEN body2 LIKE 'From %' THEN '>' || body2 ELSE body2 END,"
        " '\\n\\n'"
        ") AS msg",
    )
    blobs = msgs.groupBy("source", "bucket").agg(
        F.expr(
            "concat_ws('', transform(sort_array(collect_list("
            "struct(doc_id, msg))), s -> s.msg))"
        ).alias("blob")
    )
    frags = blobs.selectExpr(
        "source",
        "bucket",
        # A fragment per postmark: escaped '>From ' body lines survive
        # the split untouched, exactly the mboxo guarantee.
        "explode(split('\\n' || blob, '\\nFrom ')) AS frag",
    ).filter("frag <> '' AND frag <> '\\n'")
    parsed = frags.selectExpr(
        "source",
        "bucket",
        "CAST(regexp_extract(frag, 'Message-ID: <(\\\\d+)@', 1)"
        " AS BIGINT) AS msg_id",
        "split(element_at(split(frag, '\\n\\n'), 2), '\\n') AS rawlines",
    ).selectExpr(
        "source",
        "bucket",
        "msg_id",
        "filter(rawlines, l -> l <> '') AS qlines",
    ).selectExpr(
        "source",
        "bucket",
        "msg_id",
        "size(filter(qlines, l -> l LIKE '>From %')) AS n_quoted",
        "length(concat_ws('\\n', transform(qlines,"
        " l -> CASE WHEN l LIKE '>From %' THEN substring(l, 2)"
        " ELSE l END))) AS body_len",
    )
    return (
        parsed.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_msgs"),
            F.countDistinct("bucket").cast("bigint").alias("n_blobs"),
            F.sum("msg_id").cast("bigint").alias("msgid_checksum"),
            F.sum("n_quoted").cast("bigint").alias("n_quoted_lines"),
            F.sum("body_len").cast("bigint").alias("body_bytes"),
        )
        .orderBy("source")
    )


# --- r12 extension wave: iCalendar (RFC 5545) ingestion ----------------------


@register(
    "scan_ics_calendar",
    category="modern",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN 35 + length(event_type)
                         + length(CAST(user_id AS VARCHAR))
                         + event_id % 70 > 75
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_folded,
           CAST(sum(event_id) AS BIGINT) AS uid_checksum,
           CAST(sum(user_id) AS BIGINT) AS user_checksum,
           CAST(min(hour(ts)) AS BIGINT) AS hr_min,
           CAST(max(hour(ts)) AS BIGINT) AS hr_max
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def scan_ics_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """iCALENDAR (RFC 5545) INGESTION with real CONTENT-LINE FOLDING —
    the format's defining hazard: any content line longer than 75
    octets is folded by inserting CRLF + one space, possibly mid-token
    (here the fold can land inside ``user=<id>``), and a reader MUST
    unfold (strip every CRLF-space) before parsing properties.
    VEVENTs are rendered from events in-plan (UID/DTSTART/SUMMARY,
    variable-length SUMMARY so BOTH folded and unfolded populations
    exist — the fold condition 35 + len(type) + len(uid) + id%70 > 75
    is replicated in the oracle, making n_folded load-bearing),
    assembled into bounded multi-event VCALENDAR blobs, split on
    BEGIN:VEVENT, and parsed back. A reader that skips unfolding
    truncates SUMMARY at the fold and loses the trailing user id —
    user_checksum diverges immediately; one that unfolds by stripping
    CRLF alone (without the space) corrupts every folded token.

    Scale shape: render, fold, unfold, and property extraction are
    row-local codegen (concat/substring/replace/regexp_extract, no
    backtracking); blob assembly is a bounded groupBy (~50 events per
    (type, bucket) blob); the only data-sized shuffle is the 5-key
    event_type aggregate. A deployment replaces the render with
    spark.read.text over .ics exports; the unfold + parse projection
    is identical.
    """
    ev = load(spark, sf_dir, "events")
    vevents = ev.selectExpr(
        "event_type",
        "event_id div 50 AS bucket",
        "event_id",
        "concat('SUMMARY:type=', event_type,"
        " ' note=', repeat('x', CAST(10 + event_id % 70 AS INT)),"
        " ' user=', CAST(user_id AS STRING)) AS summary_line",
        "concat('UID:', CAST(event_id AS STRING), '@cal.example')"
        " AS uid_line",
        "concat('DTSTART:', date_format(CAST(ts AS TIMESTAMP),"
        " 'yyyyMMdd'), 'T', date_format(CAST(ts AS TIMESTAMP),"
        " 'HHmmss'), 'Z') AS dt_line",
    ).selectExpr(
        "event_type",
        "bucket",
        "event_id",
        # RFC 5545 fold: insert CRLF + space after octet 75.
        "concat('BEGIN:VEVENT\\r\\n', uid_line, '\\r\\n', dt_line,"
        " '\\r\\n',"
        " CASE WHEN length(summary_line) > 75 THEN"
        " concat(substring(summary_line, 1, 75), '\\r\\n ',"
        " substring(summary_line, 76)) ELSE summary_line END,"
        " '\\r\\nEND:VEVENT\\r\\n') AS vevent",
    )
    blobs = vevents.groupBy("event_type", "bucket").agg(
        F.expr(
            "concat('BEGIN:VCALENDAR\\r\\n', concat_ws('',"
            " transform(sort_array(collect_list(struct(event_id, vevent))),"
            " s -> s.vevent)), 'END:VCALENDAR\\r\\n') AS cal"
        ).alias("cal")
    )
    frags = blobs.selectExpr(
        "explode(split(cal, 'BEGIN:VEVENT\\r\\n')) AS frag"
    ).filter("frag LIKE '%END:VEVENT%'")
    parsed = frags.selectExpr(
        "frag LIKE '%\\r\\n %' AS was_folded",
        "replace(frag, '\\r\\n ', '') AS unfolded",
    ).selectExpr(
        "was_folded",
        "CAST(regexp_extract(unfolded, 'UID:(\\\\d+)@', 1) AS BIGINT)"
        " AS uid",
        "CAST(substring(regexp_extract(unfolded,"
        " 'DTSTART:([0-9T]+Z)', 1), 10, 2) AS BIGINT) AS hr",
        "regexp_extract(unfolded, 'SUMMARY:type=([a-z]+) ', 1) AS etype",
        "CAST(regexp_extract(unfolded, ' user=(\\\\d+)', 1) AS BIGINT)"
        " AS uid_user",
    )
    return (
        parsed.groupBy(F.col("etype").alias("event_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.expr("CASE WHEN was_folded THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_folded"),
            F.sum("uid").cast("bigint").alias("uid_checksum"),
            F.sum("uid_user").cast("bigint").alias("user_checksum"),
            F.min("hr").cast("bigint").alias("hr_min"),
            F.max("hr").cast("bigint").alias("hr_max"),
        )
        .orderBy("event_type")
    )


# --- r12 extension wave I: robots.txt compliance evaluation --------------------


@register(
    "scan_robots_txt_compliance",
    category="modern",
    oracle="""
    WITH rules AS (
      -- per source: directives derived in closed form; rule_id 0 is
      -- the broad disallow, 1 a deeper allow that overrides it by
      -- LONGEST MATCH, 2 an unrelated disallow.
      SELECT s.source,
             r.r AS rule_id,
             CASE r.r
               WHEN 0 THEN '/data/'
               WHEN 1 THEN '/data/public/'
               ELSE '/tmp' || CAST(s.src_num % 4 AS VARCHAR) || '/'
             END AS path_prefix,
             CASE r.r WHEN 1 THEN 'allow' ELSE 'disallow' END AS verb
      FROM (SELECT DISTINCT source,
                   CAST(substr(source, 4) AS BIGINT) AS src_num
            FROM documents) s
      CROSS JOIN (SELECT unnest(range(0, 3)) AS r) r
    ),
    reqs AS (
      SELECT doc_id, source,
             CASE CAST(doc_id % 4 AS BIGINT)
               WHEN 0 THEN '/data/file' || CAST(doc_id AS VARCHAR)
               WHEN 1 THEN '/data/public/file' || CAST(doc_id AS VARCHAR)
               WHEN 2 THEN '/tmp' || CAST(doc_id % 4 AS VARCHAR)
                          || '/f' || CAST(doc_id AS VARCHAR)
               ELSE '/open/f' || CAST(doc_id AS VARCHAR)
             END AS path
      FROM documents
    ),
    matched AS (
      SELECT q.doc_id, q.source, q.path,
             max(CASE WHEN q.path LIKE r.path_prefix || '%'
                      THEN length(r.path_prefix) ELSE -1 END) AS best_len
      FROM reqs q
      JOIN rules r ON r.source = q.source
      GROUP BY 1, 2, 3
    ),
    verdicts AS (
      SELECT m.doc_id, m.source,
             CASE WHEN m.best_len = -1 THEN 'allow'
                  ELSE max(CASE WHEN m.path LIKE r.path_prefix || '%'
                            AND length(r.path_prefix) = m.best_len
                           THEN r.verb END)
             END AS verdict
      FROM matched m
      JOIN rules r ON r.source = m.source
      GROUP BY m.doc_id, m.source, m.best_len, m.path
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_requests,
           CAST(sum(CASE WHEN verdict = 'allow' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_allowed,
           CAST(sum(CASE WHEN verdict = 'disallow' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_disallowed,
           CAST(sum(CASE WHEN verdict = 'allow' THEN doc_id ELSE 0 END)
                AS BIGINT) AS allowed_checksum
    FROM verdicts
    GROUP BY source
    ORDER BY source
    """,
)
def scan_robots_txt_compliance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBOTS.TXT COMPLIANCE EVALUATION — the crawl-governance step a
    web-corpus pipeline runs before fetching (and re-runs when
    policies change): each source publishes three directives (a broad
    `Disallow: /data/`, a deeper `Allow: /data/public/` that must WIN
    by the longest-match rule — the google/REP semantics, RFC 9309 —
    and a source-specific disallow), and every document URL is
    evaluated against its source's ruleset. The doc_id % 4 == 1 slice
    lands exactly in the allow-overrides-disallow shadow: a
    first-match or shortest-match evaluator flags those as blocked and
    the allowed checksum diverges immediately — longest-match is the
    load-bearing semantics, with no-match defaulting to allow.

    Exactness: verdicts are string algebra over exact prefix lengths;
    counts and the doc_id checksum are integers.

    Scale shape: rules are a 3-per-source broadcast relation; the
    evaluation is an equi-join on source with prefix predicates
    evaluated row-locally, then a two-phase longest-match argmax
    (max length, then the verb at that length) — both aggregates keyed
    by (doc, source), map-side combinable. At crawl scale the rules
    side stays tiny and broadcast; the requests side is the scan.
    """
    docs = load(spark, sf_dir, "documents")
    rules = (
        docs.selectExpr(
            "source", "CAST(substring(source, 4) AS BIGINT) AS src_num"
        )
        .distinct()
        .selectExpr(
            "source",
            "stack(3,"
            " 0, '/data/', 'disallow',"
            " 1, '/data/public/', 'allow',"
            " 2, '/tmp' || CAST(src_num % 4 AS STRING) || '/', 'disallow'"
            ") AS (rule_id, path_prefix, verb)",
        )
    )
    reqs = docs.selectExpr(
        "doc_id",
        "source",
        "CASE CAST(doc_id % 4 AS BIGINT)"
        " WHEN 0 THEN '/data/file' || CAST(doc_id AS STRING)"
        " WHEN 1 THEN '/data/public/file' || CAST(doc_id AS STRING)"
        " WHEN 2 THEN '/tmp' || CAST(doc_id % 4 AS STRING)"
        "  || '/f' || CAST(doc_id AS STRING)"
        " ELSE '/open/f' || CAST(doc_id AS STRING) END AS path",
    )
    joined = reqs.join(F.broadcast(rules), "source").selectExpr(
        "doc_id",
        "source",
        "path",
        "verb",
        "CASE WHEN path LIKE path_prefix || '%'"
        " THEN length(path_prefix) ELSE -1 END AS match_len",
    )
    matched = joined.groupBy("doc_id", "source", "path").agg(
        F.max("match_len").alias("best_len")
    )
    verdicts = (
        joined.join(F.broadcast(matched), ["doc_id", "source", "path"])
        .groupBy("doc_id", "source", "best_len")
        .agg(
            F.max(
                F.expr(
                    "CASE WHEN match_len = best_len AND match_len >= 0"
                    " THEN verb END"
                )
            ).alias("verb_at_best")
        )
        .selectExpr(
            "doc_id",
            "source",
            "CASE WHEN best_len = -1 THEN 'allow'"
            " ELSE verb_at_best END AS verdict",
        )
    )
    return (
        verdicts.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_requests"),
            F.sum(F.expr("CASE WHEN verdict = 'allow' THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_allowed"),
            F.sum(
                F.expr("CASE WHEN verdict = 'disallow' THEN 1 ELSE 0 END")
            )
            .cast("bigint")
            .alias("n_disallowed"),
            F.sum(
                F.expr("CASE WHEN verdict = 'allow' THEN doc_id ELSE 0 END")
            )
            .cast("bigint")
            .alias("allowed_checksum"),
        )
        .orderBy("source")
    )


# --- r13 growth: ustar archive member walk ---------------------------------
def _tar_header(name: bytes, size: int, corrupt: bool) -> bytes:
    """One POSIX ustar header block. The checksum is computed with the
    chksum field set to 8 spaces (the format's rule); `corrupt` flips
    one name byte AFTER the checksum is sealed, so the block fails
    verification without disturbing the size-driven walk."""
    h = bytearray(512)
    h[0 : len(name)] = name
    h[100:108] = b"0000644\x00"
    h[108:116] = b"0000000\x00"
    h[116:124] = b"0000000\x00"
    h[124:136] = ("%011o" % size).encode("ascii") + b"\x00"
    h[136:148] = b"00000000000\x00"
    h[148:156] = b" " * 8
    h[156] = ord("0")  # regular file
    h[257:263] = b"ustar\x00"
    h[263:265] = b"00"
    chk = sum(h)
    h[148:156] = ("%06o" % chk).encode("ascii") + b"\x00 "
    if corrupt:
        h[0] ^= 0x01
    return bytes(h)


def _tar_blob(members: list[tuple[int, str, str]]) -> bytes:
    """ustar archive: header + NUL-padded data per member, two zero
    blocks at the end. Member (doc_id, source, text); doc_id % 37 == 0
    headers are checksum-corrupted (see _tar_header)."""
    out = bytearray()
    for doc_id, source, text in members:
        data = text.encode("utf-8")
        name = f"{source}/doc_{doc_id}.txt".encode("ascii")
        out += _tar_header(name, len(data), doc_id % 37 == 0)
        out += data
        pad = (-len(data)) % 512
        out += b"\x00" * pad
    out += b"\x00" * 1024
    return bytes(out)


def _tar_walk(blob: bytes) -> list[dict]:
    """Genuine ustar walk: magic check, checksum re-verification
    (chksum field spaced out), octal size parse, size-driven block
    skip, two-zero-block terminator."""
    pos, members = 0, []
    while pos + 512 <= len(blob):
        block = blob[pos : pos + 512]
        if block == b"\x00" * 512:
            if blob[pos + 512 : pos + 1024] == b"\x00" * 512:
                break
            raise ValueError("lone zero block")
        if block[257:263] != b"ustar\x00":
            raise ValueError(f"bad magic at {pos}")
        stored = int(block[148:156].rstrip(b"\x00 ").decode("ascii"), 8)
        recomputed = sum(block[:148]) + 8 * 32 + sum(block[156:])
        size = int(block[124:136].rstrip(b"\x00 ").decode("ascii"), 8)
        name = block[:100].rstrip(b"\x00").decode("utf-8", "replace")
        members.append(
            {
                "name": name,
                "size": size,
                "chksum_ok": stored == recomputed,
            }
        )
        pos += 512 + size + ((-size) % 512)
    else:
        raise ValueError("unterminated archive")
    return members


@register(
    "scan_tar_members",
    category="modern",
    bench=False,
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(CASE WHEN doc_id % 37 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_chksum_bad,
           CAST(sum(strlen(text)) AS BIGINT) AS member_bytes,
           CAST(sum(512 + 512 * ((strlen(text) + 511) // 512))
                AS BIGINT)
             + 1024 * CAST(count(DISTINCT doc_id // 100) AS BIGINT)
             AS archive_bytes
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def scan_tar_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSIX USTAR ARCHIVE member walk — the container format data
    dumps actually arrive in. Documents render into real tar archives
    (~100 members per (source, bucket) blob, the scan_mbox blob
    pattern) and a genuine walker parses them back: magic check,
    octal size parse, the format's defining size-driven 512-block
    skip (NO delimiters — lose the size arithmetic and every later
    member is garbage), the spaced-out-chksum-field checksum rule,
    and the two-zero-block terminator. Every 37th member's header is
    corrupted AFTER its checksum was sealed, so checksum
    re-verification is load-bearing: the walker must flag the member
    bad yet keep walking (the size field is intact — exactly how tar
    implementations behave on header bit-rot).

    The oracle recomputes member counts, bad-checksum counts, member
    bytes, and the EXACT archive byte size (per-member 512-header +
    padded-data arithmetic + per-blob terminator) closed-form from
    the source columns — the walker's block arithmetic is certified
    byte-for-byte. Member sizes are UTF-8 OCTETS on both sides
    (DuckDB strlen = bytes, vs length = characters), so parity holds
    for non-ASCII text too (r13 ADVICE).

    Scale shape: blob assembly is a bounded groupBy; the walk is an
    Arrow mapInPandas kernel, per-blob cost linear in archive bytes;
    the only shuffle is the 20-key source aggregate. At 100 TB the
    kernel points at real .tar blobs in a binary column
    (multimodal_binary_ingest is the ingest twin).
    """
    from collections.abc import Iterator

    import pandas as pd

    docs = load(spark, sf_dir, "documents")
    blobs = (
        docs.selectExpr("source", "doc_id div 100 AS bucket", "doc_id",
                        "text")
        .groupBy("source", "bucket")
        .agg(
            F.expr(
                "sort_array(collect_list(struct(doc_id, text)))"
            ).alias("members")
        )
    )

    def walk_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for source, members in zip(pdf["source"], pdf["members"]):
                blob = _tar_blob(
                    [(int(m["doc_id"]), source, m["text"]) for m in members]
                )
                walked = _tar_walk(blob)
                rows.append(
                    {
                        "source": source,
                        "n_members": len(walked),
                        "n_chksum_bad": sum(
                            0 if m["chksum_ok"] else 1 for m in walked
                        ),
                        "member_bytes": sum(m["size"] for m in walked),
                        "archive_bytes": len(blob),
                    }
                )
            yield pd.DataFrame(rows)

    per_blob = blobs.mapInPandas(
        walk_batches,
        schema="source string, n_members bigint, n_chksum_bad bigint,"
        " member_bytes bigint, archive_bytes bigint",
    )
    return (
        per_blob.groupBy("source")
        .agg(
            F.sum("n_members").cast("bigint").alias("n_members"),
            F.sum("n_chksum_bad").cast("bigint").alias("n_chksum_bad"),
            F.sum("member_bytes").cast("bigint").alias("member_bytes"),
            F.sum("archive_bytes").cast("bigint").alias("archive_bytes"),
        )
        .orderBy("source")
    )


# --- r13 growth: MIME multipart parse ---------------------------------------
@register(
    "scan_mime_multipart",
    category="modern",
    oracle="""
    SELECT source,
           CAST(count(DISTINCT doc_id // 50) AS BIGINT) AS n_bodies,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_base64_parts,
           CAST(sum(length(text)) AS BIGINT) AS decoded_bytes,
           CAST(count(*) AS BIGINT) AS n_roundtrip_ok
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def scan_mime_multipart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIME MULTIPART body parsing (RFC 2046) — the envelope format of
    form uploads and email attachments: documents render into
    multipart bodies (~50 parts per (source, bucket) body) with a
    declared boundary, per-part headers, and MIXED transfer encodings
    (every third part base64, the rest 7bit verbatim), then ONE SQL
    projection parses each body back: split on the dash-dash boundary
    delimiter, drop the preamble and the '--'-terminated epilogue,
    split each part at the blank header/body line, dispatch the
    decode on the Content-Transfer-Encoding header, and verify the
    round-trip per part. A parser that splits on the bare boundary
    string (forgetting the leading '--'), mishandles the closing
    delimiter, or decodes every part as base64 fails the per-source
    counts against the closed-form oracle.

    Exactness: pure string algebra and integer counts; base64 decode
    is the engines' builtin (unbase64 / from_base64).

    Scale shape: body assembly is a bounded groupBy (the scan_mbox
    blob pattern); parsing is row-local codegen (split, substring,
    unbase64); the only shuffle is the 20-key source aggregate.
    """
    docs = load(spark, sf_dir, "documents")
    parts = docs.selectExpr(
        "source",
        "doc_id div 50 AS bucket",
        "doc_id",
        # part = headers + blank line + payload (no trailing newline;
        # the boundary delimiter below carries the line breaks, RFC
        # 2046's CRLF-before-delimiter rule in \n form)
        "CASE WHEN doc_id % 3 = 0 THEN concat("
        " 'Content-Type: text/plain\\n',"
        " 'Content-Transfer-Encoding: base64\\n',"
        " '\\n', base64(encode(text, 'utf-8')))"
        " ELSE concat("
        " 'Content-Type: text/plain\\n',"
        " 'Content-Transfer-Encoding: 7bit\\n',"
        " '\\n', text) END AS part",
        "text",
    )
    bodies = parts.groupBy("source", "bucket").agg(
        F.expr(
            "concat('preamble is ignored',"
            " '\\n--frontier-813\\n',"
            " array_join(transform(sort_array(collect_list("
            " struct(doc_id, part))), s -> s.part),"
            " '\\n--frontier-813\\n'),"
            " '\\n--frontier-813--\\nepilogue ignored')"
        ).alias("body"),
        F.expr(
            "sort_array(collect_list(struct(doc_id, text)))"
        ).alias("originals"),
    )
    parsed = bodies.selectExpr(
        "source",
        "originals",
        # split on the full delimiter; fragment 1 is the preamble and
        # the LAST fragment still carries the closing '--' delimiter +
        # epilogue, stripped by substring_index per fragment.
        "transform(slice(split(body, '\\n--frontier-813\\n'), 2,"
        " size(split(body, '\\n--frontier-813\\n')) - 1),"
        " fr -> substring_index(fr, '\\n--frontier-813--', 1))"
        " AS rawparts",
    ).selectExpr(
        "source",
        "originals",
        # Headers end at the FIRST blank line (RFC 2046 — the payload
        # may itself contain '\n\n', so substring_index(rp,...,-1)
        # would truncate it; r13 ADVICE). The encoding dispatch reads
        # ONLY the header block, so a 7bit payload that happens to
        # contain the literal header string cannot mis-dispatch.
        "transform(transform(rawparts, rp -> struct("
        " substring_index(rp, '\\n\\n', 1) AS hdr,"
        " substring(rp,"
        "   length(substring_index(rp, '\\n\\n', 1)) + 3) AS payload)),"
        " hp -> struct("
        " CASE WHEN hp.hdr LIKE '%Content-Transfer-Encoding: base64%'"
        " THEN decode(unbase64(hp.payload), 'utf-8')"
        " ELSE hp.payload END AS decoded,"
        " CASE WHEN hp.hdr LIKE '%Content-Transfer-Encoding: base64%'"
        " THEN 1 ELSE 0 END AS is_b64)) AS decoded_parts",
    )
    out = (
        parsed.selectExpr(
            "source",
            "size(decoded_parts) AS n_parts",
            "aggregate(decoded_parts, 0L,"
            " (acc, dp) -> acc + dp.is_b64) AS n_b64",
            "aggregate(decoded_parts, 0L,"
            " (acc2, dp2) -> acc2 + length(dp2.decoded)) AS dec_bytes",
            "size(filter(zip_with(decoded_parts, originals,"
            " (dp3, og) -> dp3.decoded = og.text), x -> x))"
            " AS n_ok",
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bodies"),
            F.sum("n_parts").cast("bigint").alias("n_parts"),
            F.sum("n_b64").cast("bigint").alias("n_base64_parts"),
            F.sum("dec_bytes").cast("bigint").alias("decoded_bytes"),
            F.sum("n_ok").cast("bigint").alias("n_roundtrip_ok"),
        )
        .orderBy("source")
    )
    return out

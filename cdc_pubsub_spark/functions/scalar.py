"""Scalar function operators (SURVEY.md §2.B "Scalar functions").

All JVM-side builtins inside whole-stage codegen — zero Python in the hot
path. The regex family lifts its semantics from the reference's routing
regexes (publisher.go:133-134); string concat mirrors the topicPrefix
transform (options.go:66-72); the map builder mirrors the per-message
attribute map (publisher.go:177-180).

Oracle dialect notes (Spark ↔ DuckDB): `split(s,' ')[0]` ↔
`string_split(s,' ')[1]` (0- vs 1-based), `get_json_object` ↔
`json_extract_string`, DuckDB `regexp_replace` needs the 'g' flag to match
Spark's replace-all, Spark `floor` returns BIGINT vs DuckDB DOUBLE (cast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pubsub_spark.registry import register
from cdc_pubsub_spark.tables import load


@register(
    "fn_string",
    category="functions",
    oracle="""
    SELECT
      p_partkey,
      upper(p_name)                              AS name_upper,
      lower(p_type)                              AS type_lower,
      length(p_name)                             AS name_len,
      replace(p_name, ' ', '_')                  AS name_snake,
      lpad(p_brand, 10, '#')                     AS brand_pad,
      concat(p_type, ':', p_brand)               AS type_brand,
      substr(p_name, 1, 4)                       AS name_head,
      trim(p_name)                               AS name_trim,
      string_split(p_name, ' ')[1]               AS first_word
    FROM part
    WHERE p_partkey <= 500
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery over part names.

    concat(prefix, name) is exactly the reference's topic-name transform
    (topicPrefix + table, options.go:66-72).
    """
    part = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.lpad("p_brand", 10, "#").alias("brand_pad"),
        F.concat(F.col("p_type"), F.lit(":"), F.col("p_brand")).alias("type_brand"),
        F.substring("p_name", 1, 4).alias("name_head"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
    )


@register(
    "fn_regex",
    category="functions",
    oracle="""
    SELECT
      p_partkey,
      regexp_extract(p_brand, '#(\\d+)', 1)                  AS brand_num,
      regexp_matches(p_brand, '#1\\d$')                      AS is_brand_1x,
      regexp_replace(p_name, '[aeiou]', '*', 'g')            AS name_devoweled
    FROM part
    WHERE p_partkey <= 500
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract / match / replace-all.

    The extract-group-N pattern is the reference's entire routing layer
    (generalFile regex groups, publisher.go:133); cdc_route_path applies
    the verbatim pattern — this query covers the function family.
    """
    part = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return part.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.col("p_brand").rlike(r"#1\d$").alias("is_brand_1x"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("name_devoweled"),
    )


@register(
    "fn_date",
    category="functions",
    oracle="""
    SELECT
      o_orderkey,
      year(o_orderdate)                                   AS yr,
      month(o_orderdate)                                  AS mo,
      quarter(o_orderdate)                                AS qtr,
      dayofyear(o_orderdate)                              AS doy,
      date_trunc('month', o_orderdate)                    AS month_start,
      strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
      date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95
    FROM orders
    WHERE o_orderkey <= 2000
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery over order dates.

    The reference routes on a `YYYY-MM-DD` path segment (daily partition,
    publisher.go:133); date_trunc/year/month are the engine's analytic
    generalization of that daily bucketing.
    """
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        # date string (not DATE type): Spark DATE and DuckDB DATE surface
        # as different pandas types (date vs midnight Timestamp) and would
        # hash differently.
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "plus_30d"
        ),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
    )


@register(
    "fn_math",
    category="functions",
    oracle="""
    SELECT
      o_orderkey,
      round(o_totalprice, 0)                         AS price_round0,
      CAST(floor(o_totalprice) AS BIGINT)            AS price_floor,
      CAST(ceil(o_totalprice) AS BIGINT)             AS price_ceil,
      round(abs(o_totalprice - 100000), 2)           AS dist_from_100k,
      round(sqrt(o_totalprice), 4)                   AS price_sqrt,
      round(ln(o_totalprice), 4)                     AS price_ln,
      round(log10(o_totalprice), 4)                  AS price_log10,
      o_orderkey % 7                                 AS key_mod7,
      CAST(power(2, o_orderkey % 10) AS BIGINT)      AS pow2
    FROM orders
    WHERE o_orderkey <= 2000
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function battery over order prices."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return orders.select(
        "o_orderkey",
        F.round("o_totalprice", 0).alias("price_round0"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        F.ceil("o_totalprice").cast("bigint").alias("price_ceil"),
        F.round(F.abs(F.col("o_totalprice") - 100000), 2).alias("dist_from_100k"),
        F.round(F.sqrt("o_totalprice"), 4).alias("price_sqrt"),
        F.round(F.log("o_totalprice"), 4).alias("price_ln"),
        F.round(F.log10("o_totalprice"), 4).alias("price_log10"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        F.pow(F.lit(2), F.col("o_orderkey") % 10).cast("bigint").alias("pow2"),
    )


@register(
    "fn_conditional",
    category="functions",
    oracle="""
    SELECT
      c_custkey,
      coalesce(nullif(c_mktsegment, 'BUILDING'), 'SUPPRESSED') AS segment_masked,
      round(greatest(c_acctbal, 0), 2)                         AS bal_floor0,
      round(least(c_acctbal, 5000), 2)                         AS bal_cap5k,
      (c_acctbal IS NULL)                                      AS bal_is_null
    FROM customer
    WHERE c_custkey <= 1000
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / greatest / least (null-handling surface)."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 1000)
    return cust.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("SUPPRESSED")
        ).alias("segment_masked"),
        F.round(F.greatest(F.col("c_acctbal"), F.lit(0.0)), 2).alias("bal_floor0"),
        F.round(F.least(F.col("c_acctbal"), F.lit(5000.0)), 2).alias("bal_cap5k"),
        F.col("c_acctbal").isNull().alias("bal_is_null"),
    )


@register(
    "fn_array",
    category="functions",
    oracle="""
    SELECT
      vec_id,
      len(embedding)                                           AS dim,
      round(CAST(embedding[1] AS DOUBLE), 4)                   AS first_component,
      round(CAST(embedding[64] AS DOUBLE), 4)                  AS last_component,
      round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) / len(embedding), 4) AS mean_component
    FROM embeddings
    WHERE vec_id <= 200
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over the embedding vectors.

    `aggregate` (fold) runs JVM-side over the array — the same mechanism
    llmops uses for dot products. Elements are cast to double BEFORE
    summing on both sides so the fold accumulates identically (float32
    partial sums would diverge from DuckDB in the last bits).
    """
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") <= 200)
    dsum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_component"),
        F.round(F.element_at("embedding", 64).cast("double"), 4).alias("last_component"),
        F.round(dsum / F.size("embedding"), 4).alias("mean_component"),
    )


@register(
    "fn_hash_encode",
    category="functions",
    oracle="""
    SELECT
      p_partkey,
      md5(p_name)                                   AS name_md5,
      sha256(p_name)                                AS name_sha256,
      to_base64(encode(p_name))                     AS name_b64,
      hex(encode(p_brand))                          AS brand_hex
    FROM part
    WHERE p_partkey <= 500
    """,
)
def fn_hash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic-hash and encoding functions (md5/sha256/base64/hex).

    Content hashing underpins dedup_exact, sample_hash_mod, and the
    uniquer the reference carries in changefeed filenames
    (publisher.go:133 group 4); encodings carry opaque payload bytes
    through text transports — the engine's analogue of the bridge's
    bytes-in/bytes-out stance.
    """
    part = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return part.select(
        "p_partkey",
        F.md5("p_name").alias("name_md5"),
        F.sha2("p_name", 256).alias("name_sha256"),
        F.base64(F.encode("p_name", "utf-8")).alias("name_b64"),
        F.upper(F.hex(F.encode("p_brand", "utf-8"))).alias("brand_hex"),
    )


@register(
    "agg_string_collect",
    category="aggregates",
    oracle="""
    SELECT
      l_returnflag,
      string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
      count(DISTINCT l_linestatus)                                 AS n_statuses
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_string_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (collect → sort → join).

    collect_set + array_sort + array_join makes the concatenation
    deterministic — collect order is partition-dependent, so unsorted
    string_agg would be flaky under any partitioning change (the same
    discipline as every LIMIT needing a total order).
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias(
            "statuses"
        ),
        F.countDistinct("l_linestatus").alias("n_statuses"),
    )


@register(
    "fn_map_json",
    category="functions",
    oracle="""
    SELECT event_id, 'event_type' AS attr_key, event_type AS attr_value
    FROM events WHERE event_id <= 500
    UNION ALL
    SELECT event_id, 'user', CAST(user_id AS VARCHAR)
    FROM events WHERE event_id <= 500
    UNION ALL
    SELECT event_id, 'k', json_extract_string(props, '$.k')
    FROM events WHERE event_id <= 500
    """,
)
def fn_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a per-record attribute map, explode it to rows, with one
    JSON-extracted attribute.

    This is the reference's message-attribute map (publisher.go:177-180:
    `{path: ..., table: ...}` on every record) built with create_map and
    flattened with explode — Spark's generator node (Generate) handles
    the 1-row→N-rows expansion that bufio line-splitting does in the
    reference (publisher.go:182-202).
    """
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") <= 500)
    attrs = F.create_map(
        F.lit("event_type"),
        F.col("event_type"),
        F.lit("user"),
        F.col("user_id").cast("string"),
        F.lit("k"),
        F.get_json_object(F.col("props"), "$.k"),
    )
    return (
        ev.select("event_id", F.explode(attrs).alias("attr_key", "attr_value"))
    )


# --- r12 extension wave G: ULID render/parse round trip -----------------------

def _ulid_exprs(dialect: str) -> tuple[str, str, str]:
    """(render_expr, ms_parse_expr, entropy_sum_expr) for one dialect.

    Render: 10 Crockford-base32 chars of the 48-bit ms timestamp +
    16 entropy chars derived from the (reduced) event id — closed form
    shared by both engines. Parse: positional decode of chars 1-10
    back to ms, value sum of chars 11-26. dialect 'spark' uses
    div/instr/unix_micros; 'duck' uses ///strpos/epoch_us.
    """
    alpha = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
    # Dialect-independent (r15 ADVICE: was duplicated verbatim in both
    # branches, so an entropy-formula tweak had to be made twice or the
    # engines silently diverged).
    ent_chars = [
        f"substr('{alpha}', CAST(((event_id % 1048576) * 7 + {i * 13})"
        " % 32 AS INT) + 1, 1)"
        for i in range(16)
    ]
    if dialect == "spark":
        # r15: the 10-char timestamp leg renders/parses through
        # conv+translate (base-32 digits 0-9A-V mapped onto Crockford's
        # I/L/O/U-free alphabet) and the two 26-term parse sums fold
        # into aggregate() HOFs. The unrolled 26-term forms compiled
        # into a whole-stage method past HotSpot's 8000-byte JIT limit
        # (DontCompileHugeMethods), so the stage ran as INTERPRETED
        # bytecode: 2.41 s at sf0.1 vs 1.04 s with wholestage codegen
        # disabled for the identical query. This shape keeps codegen
        # methods small instead (1.2-1.4 s end-to-end, bit-identical
        # output — exceptAll both directions = 0 at sf0.1). Session-wide
        # spark.sql.codegen.hugeMethodLimit=8000 was measured as the
        # alternative and REJECTED: it fixes this op (2.42 -> 1.32) but
        # regresses other big-expression ops whose huge methods still
        # run faster fused (text_keyword_rake 1.25 -> 2.58 s).
        ms = "(unix_micros(CAST(ts AS TIMESTAMP)) div 1000)"
        std22, cro22 = "ABCDEFGHIJKLMNOPQRSTUV", "ABCDEFGHJKMNPQRSTVWXYZ"
        render = (
            f"concat(translate(lpad(conv({ms}, 10, 32), 10, '0'),"
            f" '{std22}', '{cro22}'), " + ", ".join(ent_chars) + ")"
        )
        ms_parse = (
            f"CAST(conv(translate(substr(u, 1, 10), '{cro22}',"
            f" '{std22}'), 32, 10) AS BIGINT)"
        )
        ent_sum = (
            "aggregate(sequence(11, 26), 0L, (acc, ulidi) -> acc"
            f" + CAST(instr('{alpha}', substr(u, ulidi, 1)) AS BIGINT) - 1)"
        )
        return render, ms_parse, ent_sum
    ms = "(epoch_us(CAST(ts AS TIMESTAMP)) // 1000)"
    idiv, pos = "//", "strpos"
    ts_chars = [
        f"substr('{alpha}', CAST(({ms} {idiv} {32 ** (9 - i)}) % 32"
        " AS INT) + 1, 1)"
        for i in range(10)
    ]
    render = "concat(" + ", ".join(ts_chars + ent_chars) + ")"
    # CAST the position to BIGINT before the multiply: the small
    # positional weights (32^6 = 2^30 and below) parse as INT32
    # literals, and INT*INT stays INT under ANSI — digit values >= 2
    # overflow int32 (caught by the sf0.001 gate on first run).
    ms_parse = " + ".join(
        f"(CAST({pos}('{alpha}', substr(u, {i + 1}, 1)) AS BIGINT) - 1)"
        f" * {32 ** (9 - i)}"
        for i in range(10)
    )
    ent_sum = " + ".join(
        f"({pos}('{alpha}', substr(u, {i + 1}, 1)) - 1)"
        for i in range(10, 26)
    )
    return render, ms_parse, ent_sum


def _ulid_oracle() -> str:
    render, ms_parse, ent_sum = _ulid_exprs("duck")
    return f"""
    WITH ulids AS (
      SELECT event_type, event_id, ts, {render} AS u FROM events
    ),
    parsed AS (
      SELECT event_type, event_id, u,
             CAST({ms_parse} AS BIGINT) AS ms,
             CAST({ent_sum} AS BIGINT) AS ent
      FROM ulids
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(ms) AS BIGINT) AS ms_checksum,
           CAST(sum(ent) AS BIGINT) AS entropy_checksum,
           min(u) AS lex_min_ulid,
           max(u) AS lex_max_ulid
    FROM parsed
    GROUP BY event_type
    ORDER BY event_type
    """


@register(
    "fn_ulid_roundtrip",
    category="functions",
    oracle=_ulid_oracle(),
)
def fn_ulid_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ULID RENDER + PARSE round trip — the lexicographically-sortable
    id format event pipelines use instead of UUIDv4 (spec: ulid/spec —
    26 Crockford base32 chars: 10 for the 48-bit millisecond
    timestamp, 16 of entropy; Crockford's alphabet drops I, L, O, U to
    avoid misreads). Both engines render ULIDs from (ts, event_id) in
    closed form and parse them back; the per-type aggregate checksums
    the PARSED milliseconds and entropy values, so every positional
    weight (32^9 … 32^0), the alphabet order, and the 1-based
    substr/instr arithmetic are load-bearing — a transposed alphabet
    or an off-by-one in the shift reproduces nothing. lex_min/lex_max
    of the rendered strings ride along: ULID's design property is that
    LEXICOGRAPHIC order equals TIMESTAMP order, which the invariant
    test pins by matching lex_min to the earliest event's render.

    Exactness: pure integer shift/modulo arithmetic and string
    indexing; no floats anywhere. Scale shape: render and parse are
    row-local codegen (one 26-term concat, two fixed sums of instr
    terms); the only shuffle is the 5-key aggregate with min/max
    string merges.
    """
    render, ms_parse, ent_sum = _ulid_exprs("spark")
    ev = load(spark, sf_dir, "events")
    ulids = ev.selectExpr("event_type", "event_id", "ts", f"{render} AS u")
    parsed = ulids.selectExpr(
        "event_type",
        f"CAST({ms_parse} AS BIGINT) AS ms",
        f"CAST({ent_sum} AS BIGINT) AS ent",
        "u",
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("ms").cast("bigint").alias("ms_checksum"),
            F.sum("ent").cast("bigint").alias("entropy_checksum"),
            F.min("u").alias("lex_min_ulid"),
            F.max("u").alias("lex_max_ulid"),
        )
        .orderBy("event_type")
    )


# --- r12 extension wave H: phone number normalization --------------------------


@register(
    "fn_phone_e164_normalize",
    category="functions",
    oracle="""
    WITH raw AS (
      SELECT user_id,
             CAST(user_id % 3 AS BIGINT) AS fmt,
             200 + user_id % 800 AS area,
             200 + (user_id * 7) % 800 AS exch,
             1000 + (user_id * 13) % 9000 AS line
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    rendered AS (
      SELECT user_id, fmt,
             CASE fmt
               WHEN 0 THEN '+1 (' || area || ') ' || exch || '-' || line
               WHEN 1 THEN area || '.' || exch || '.' || line
               ELSE '1-' || area || '-' || exch || '-' || line
             END AS phone,
             area, exch, line
      FROM raw
    ),
    normalized AS (
      SELECT user_id, fmt, phone,
             '+1' || right(regexp_replace(phone, '[^0-9]', '', 'g'), 10)
               AS e164,
             area, exch, line
      FROM rendered
    )
    SELECT fmt AS format_class,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN e164 = '+1' || area || exch || line
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_normalized_ok,
           CAST(sum(length(phone)) AS BIGINT) AS raw_len_sum,
           CAST(sum(CAST(substr(e164, 3) AS BIGINT)) AS BIGINT)
             AS digits_checksum
    FROM normalized
    GROUP BY fmt
    ORDER BY fmt
    """,
)
def fn_phone_e164_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PHONE-NUMBER NORMALIZATION to E.164 — the data-cleaning staple:
    three real North American formats are rendered per user
    ('+1 (415) 555-1234', '415.555.1234', '1-415-555-1234'), then
    normalized by the standard recipe (strip every non-digit, keep the
    LAST 10 digits, prefix '+1') — keeping the last 10 is what makes
    the recipe immune to the optional leading country code, which two
    of the three formats carry in different shapes. The oracle
    reconstructs the expected E.164 from the source components, so the
    regex strip, the right-10 slice, and the prefix are each
    load-bearing per format class; a normalizer that keeps the FIRST
    10 digits corrupts every format-0 and format-2 number.

    Exactness: integer counts and a digits checksum (the 10-digit
    number parsed back as a BIGINT). Scale shape: render and normalize
    are row-local codegen (regexp_replace + slicing); one 3-key
    aggregate after a distinct over the user domain.
    """
    ev = load(spark, sf_dir, "events")
    raw = ev.select("user_id").distinct().selectExpr(
        "user_id",
        "CAST(user_id % 3 AS BIGINT) AS fmt",
        "200 + user_id % 800 AS area",
        "200 + (user_id * 7) % 800 AS exch",
        "1000 + (user_id * 13) % 9000 AS line",
    )
    rendered = raw.selectExpr(
        "user_id",
        "fmt",
        "CASE fmt"
        " WHEN 0 THEN '+1 (' || area || ') ' || exch || '-' || line"
        " WHEN 1 THEN area || '.' || exch || '.' || line"
        " ELSE '1-' || area || '-' || exch || '-' || line"
        " END AS phone",
        "area",
        "exch",
        "line",
    )
    normalized = rendered.selectExpr(
        "fmt",
        "phone",
        "'+1' || right(regexp_replace(phone, '[^0-9]', ''), 10) AS e164",
        "area",
        "exch",
        "line",
    )
    return (
        normalized.groupBy(F.col("fmt").alias("format_class"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.expr(
                    "CASE WHEN e164 = '+1' || area || exch || line"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("n_normalized_ok"),
            F.sum(F.expr("length(phone)")).cast("bigint").alias("raw_len_sum"),
            F.sum(F.expr("CAST(substring(e164, 3) AS BIGINT)"))
            .cast("bigint")
            .alias("digits_checksum"),
        )
        .orderBy("format_class")
    )


# --- r13 growth: semver precedence ordering --------------------------------
#
# Order-preserving sort key for SemVer 2.0 precedence (§11): core
# numerics zero-padded; release tagged '~' (above any prerelease);
# prerelease fields tagged '0'+zero-pad (numeric) / '1'+raw (alnum) so
# numeric < alphanumeric, joined by '#' and terminated by '"' —
# '"'(0x22) < '#'(0x23) < '-'/digits/letters, which encodes the
# shorter-prefix-is-lower rule lexically. Scheme property-verified
# against a reference comparator in tests/test_r13_growth.py.
_SEMVER_KEY_SPARK = (
    "concat(lpad(regexp_extract(ver, '^([0-9]+)', 1), 10, '0'), '.',"
    " lpad(regexp_extract(ver, '^[0-9]+\\\\.([0-9]+)', 1), 10, '0'), '.',"
    " lpad(regexp_extract(ver, '^[0-9]+\\\\.[0-9]+\\\\.([0-9]+)', 1),"
    " 10, '0'),"
    " CASE WHEN ver NOT LIKE '%-%' THEN '~'"
    " ELSE concat('!', array_join(transform("
    "   split(regexp_extract(ver, '-(.*)$', 1), '\\\\.'),"
    "   f -> CASE WHEN f rlike '^[0-9]+$'"
    "        THEN concat('0', lpad(f, 11, '0'))"
    "        ELSE concat('1', f) END), '#'), '\\\"') END)"
)
_SEMVER_KEY_DUCK = (
    "lpad(regexp_extract(ver, '^([0-9]+)', 1), 10, '0') || '.' ||"
    " lpad(regexp_extract(ver, '^[0-9]+\\.([0-9]+)', 1), 10, '0') || '.' ||"
    " lpad(regexp_extract(ver, '^[0-9]+\\.[0-9]+\\.([0-9]+)', 1),"
    " 10, '0') ||"
    " CASE WHEN ver NOT LIKE '%-%' THEN '~'"
    " ELSE '!' || array_to_string(list_transform("
    "   string_split(regexp_extract(ver, '-(.*)$', 1), '.'),"
    "   f -> CASE WHEN regexp_matches(f, '^[0-9]+$')"
    "        THEN '0' || lpad(f, 11, '0')"
    "        ELSE '1' || f END), '#') || '\"' END"
)

_SEMVER_VER_SQL = (
    "concat(CAST(doc_id % 3 AS STRING), '.',"
    " CAST(doc_id % 5 AS STRING), '.', CAST(doc_id % 7 AS STRING),"
    " CASE doc_id % 4"
    " WHEN 0 THEN concat('-alpha.', CAST(doc_id % 3 AS STRING))"
    " WHEN 1 THEN '-alpha-1.beta'"
    " WHEN 3 THEN concat('-rc.', CAST(doc_id % 2 AS STRING), '.x')"
    " ELSE '' END)"
)
_SEMVER_VER_DUCK = (
    "CAST(doc_id % 3 AS VARCHAR) || '.' ||"
    " CAST(doc_id % 5 AS VARCHAR) || '.' ||"
    " CAST(doc_id % 7 AS VARCHAR) ||"
    " CASE doc_id % 4"
    " WHEN 0 THEN '-alpha.' || CAST(doc_id % 3 AS VARCHAR)"
    " WHEN 1 THEN '-alpha-1.beta'"
    " WHEN 3 THEN '-rc.' || CAST(doc_id % 2 AS VARCHAR) || '.x'"
    " ELSE '' END"
)


@register(
    "fn_semver_order",
    category="functions",
    oracle=f"""
    WITH vers AS (
      SELECT {_SEMVER_VER_DUCK} AS ver FROM documents
    ),
    dist AS (
      SELECT ver, CAST(count(*) AS BIGINT) AS n_docs FROM vers
      GROUP BY ver
    )
    SELECT ver, n_docs,
           ver LIKE '%-%' AS is_prerelease,
           CAST(rank() OVER (ORDER BY {_SEMVER_KEY_DUCK}, ver)
                AS BIGINT) AS precedence_rank
    FROM dist
    ORDER BY precedence_rank, ver
    """,
)
def fn_semver_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMVER 2.0 PRECEDENCE ordering (semver.org §11) as a pure SQL
    sort key — the dependency-resolution primitive: release >
    prerelease at equal core; prerelease identifiers compare
    field-by-field with NUMERIC fields numerically and BELOW any
    alphanumeric field; a shorter identifier list that prefixes a
    longer one is LOWER ('1.0.0-alpha' < '1.0.0-alpha.1'). All three
    rules are encoded lexically (see _SEMVER_KEY_SPARK) so ordering a
    billion version strings is ONE codegen projection plus an ORDER
    BY — no per-row UDF comparator, which is what makes precedence
    usable as a cluster-scale sort/window key. The scheme is
    property-verified against a hand-written reference comparator
    over every planted pair in the invariant test.

    Versions are synthesized from doc_id (four prerelease shapes —
    numeric-tailed, pure-alnum, mixed rc.N.x, and none). Exactness:
    the whole op is string/rank arithmetic — no floats anywhere.

    Scale shape: a distinct over versions (the dimension extraction)
    then a rank over the ~200-row distinct version domain; the rank
    window is domain-sized, the scan-side projection is codegen.
    """
    vers = load(spark, sf_dir, "documents").selectExpr(
        f"{_SEMVER_VER_SQL} AS ver"
    )
    dist = vers.groupBy("ver").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.expr(_SEMVER_KEY_SPARK), F.col("ver"))
    return dist.select(
        "ver",
        "n_docs",
        F.expr("ver LIKE '%-%'").alias("is_prerelease"),
        F.rank().over(w).cast("bigint").alias("precedence_rank"),
    ).orderBy("precedence_rank", "ver")


# --- r13 growth: CRC32C (Castagnoli) checksum -------------------------------
#
# 16-entry nibble-driven table for the reflected Castagnoli polynomial
# 0x82F63B78, generated once in Python and embedded as literals in both
# plans (the quantized-trig device applied to a bit-twiddling table).
# Verified against the canonical test vector crc32c('123456789') =
# 0xE3069283 in tests/test_r13_growth.py.
_CRC32C_TBL = (
    0, 274646895, 549293790, 820201905, 1098587580, 1361435347,
    1640403810, 1905808397, 2197175160, 2460548119, 2722870694,
    2987750089, 3280807620, 3553878443, 3811616794, 4084100981,
)
_CRC_TBL_SPARK = "array(" + ", ".join(f"{v}L" for v in _CRC32C_TBL) + ")"
_CRC_TBL_DUCK = "[" + ", ".join(str(v) for v in _CRC32C_TBL) + "]"

# One nibble step: crc' = (crc >> 4) XOR T[(crc XOR nib) & 15].
_CRC_STEP_SPARK = (
    "(CAST({crc} AS BIGINT) div 16) ^ element_at({tbl},"
    " CAST(({crc} ^ {nib}) % 16 AS INT) + 1)"
)
_CRC_STEP_DUCK = (
    "xor(({crc} // 16), {tbl}[CAST(xor({crc}, {nib}) % 16 AS INT) + 1])"
)


def _crc_fold(step: str, tbl: str, ch_expr: str) -> str:
    """Two nibble steps per byte folded over the char array."""
    low = step.format(crc="acc", nib=f"({ch_expr} % 16)", tbl=tbl)
    return step.format(
        crc=f"({low})", nib=f"({ch_expr} div 16)", tbl=tbl
    )


_CRC_SPARK = (
    "CAST(aggregate(transform(chs, ch -> CAST(ascii(ch) AS BIGINT)),"
    " CAST(4294967295 AS BIGINT),"
    " (acc, b) -> " + _crc_fold(
        _CRC_STEP_SPARK, _CRC_TBL_SPARK, "b"
    )
    + ") ^ 4294967295L AS BIGINT)"
)
_CRC_DUCK = (
    "CAST(xor(list_reduce(list_prepend(CAST(4294967295 AS BIGINT),"
    " list_transform(chs, ch -> CAST(ord(ch) AS BIGINT))),"
    " (acc, b) -> " + _crc_fold(
        _CRC_STEP_DUCK.replace(" div ", " // "),
        _CRC_TBL_DUCK,
        "b",
    ).replace(" div ", " // ")
    + "), 4294967295) AS BIGINT)"
)


@register(
    "fn_crc32c_checksum",
    category="functions",
    oracle=f"""
    WITH rows_in AS (
      SELECT doc_id, source, string_split_regex(text, '') AS chs
      FROM documents WHERE doc_id % 7 = 0
    ),
    crcs AS (
      SELECT doc_id, source, {_CRC_DUCK} AS crc FROM rows_in
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(crc) AS BIGINT) AS crc_sum,
           CAST(min(crc) AS BIGINT) AS crc_min,
           CAST(max(crc) AS BIGINT) AS crc_max,
           CAST(count(DISTINCT crc) AS BIGINT) AS n_distinct
    FROM crcs
    GROUP BY source
    ORDER BY source
    """,
)
def fn_crc32c_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRC32C (Castagnoli) — the checksum inside Parquet pages,
    Iceberg manifests, gRPC, and ext4 — computed natively in SQL via
    a 16-entry nibble table shared as literals between both engines
    (no UDF, no library): two table-driven steps per byte folded over
    the hoisted character array. Useful as an integrity column for
    CDC payloads precisely because it matches what storage systems
    compute; the invariant test pins the canonical '123456789' →
    0xE3069283 vector against an independent python implementation
    and replays a sample of documents byte-for-byte.

    Exactness: pure integer bit algebra (div/mod/xor — no shifts
    needed past the table construction); per-source sum/min/max of
    32-bit values in int64. The fold is an interpreted HOF (the slow
    path, documented): the op therefore runs on the 1/7 doc_id
    sample (co-prime with the 20-source layout, so every source is hit) — the demonstration scope; the 100 TB-scale form of this
    kernel is a JVM-codegen expression or the columnar reader's own
    checksum, not a per-row lambda.

    Scale shape: scan-local projection (split hoisted once), then the
    20-key source aggregate — nothing else shuffles.
    """
    rows = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 0)
        .selectExpr("doc_id", "source", "split(text, '') AS chs")
    )
    crcs = rows.selectExpr("doc_id", "source", f"{_CRC_SPARK} AS crc")
    return (
        crcs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("crc").cast("bigint").alias("crc_sum"),
            F.min("crc").cast("bigint").alias("crc_min"),
            F.max("crc").cast("bigint").alias("crc_max"),
            F.countDistinct("crc").cast("bigint").alias("n_distinct"),
        )
        .orderBy("source")
    )


# --- r13 growth: geohash encoding -------------------------------------------
_GH_ALPHA = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_CHARS = 8  # 40 bits = 20 lon + 20 lat


def _gh_char_expr(k: int, alpha_fn: str) -> str:
    """SQL for geohash char k from the 20-bit cell indices ix/iy:
    bit j of the interleaved stream (lon first) is bit (19 - j//2) of
    ix for even j, bit (19 - (j-1)//2) of iy for odd j — pure integer
    div/mod, identical text both engines (alpha_fn = substr/substring)."""
    terms = []
    for b in range(5):
        j = 5 * k + b
        if j % 2 == 0:
            src, sh = "ix", 19 - j // 2
        else:
            src, sh = "iy", 19 - (j - 1) // 2
        terms.append(f"(({src} div {1 << sh}) % 2) * {1 << (4 - b)}")
    v = " + ".join(terms)
    return f"{alpha_fn}('{_GH_ALPHA}', CAST({v} AS INT) + 1, 1)"


_GH_SPARK = "concat(" + ", ".join(
    _gh_char_expr(k, "substring") for k in range(_GH_CHARS)
) + ")"
_GH_DUCK = (
    "concat(" + ", ".join(
        _gh_char_expr(k, "substr").replace(" div ", " // ")
        for k in range(_GH_CHARS)
    ) + ")"
)


@register(
    "fn_geohash_encode",
    category="functions",
    oracle=f"""
    WITH pts AS (
      SELECT DISTINCT user_id,
             CAST(user_id % 1777 AS DOUBLE) / 10 - 88.0 AS lat,
             CAST((user_id * 31) % 3555 AS DOUBLE) / 10 - 177.7 AS lon
      FROM events
    ),
    cells AS (
      SELECT user_id, lat, lon,
             CAST(floor((lon + 180.0) / 360.0 * 1048576) AS BIGINT)
               AS ix,
             CAST(floor((lat + 90.0) / 180.0 * 1048576) AS BIGINT)
               AS iy
      FROM pts
    ),
    hashed AS (
      SELECT user_id, lat, lon, {_GH_DUCK} AS gh FROM cells
    )
    SELECT substr(gh, 1, 4) AS gh4,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(DISTINCT gh) AS BIGINT) AS n_cells,
           floor(min(lat) * 10000 + 0.5) / 10000 AS min_lat,
           floor(max(lat) * 10000 + 0.5) / 10000 AS max_lat,
           floor(min(lon) * 10000 + 0.5) / 10000 AS min_lon,
           floor(max(lon) * 10000 + 0.5) / 10000 AS max_lon
    FROM hashed
    GROUP BY gh4
    ORDER BY n_users DESC, gh4
    LIMIT 25
    """,
)
def fn_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOHASH ENCODING (Niemeyer's base-32 Z-order cells) as pure
    integer SQL — the spatial bucketing key behind proximity joins,
    cell aggregation, and prefix-range geo queries: instead of the
    textbook 40-round bisection loop, the cell indices ix =
    floor((lon+180)/360·2^20), iy = floor((lat+90)/180·2^20) are
    computed ONCE and the 8 output characters are forty div/mod bit
    extractions composed in-plan (codegen, no UDF, no loop) — shown
    equal to the bisection reference on the planted grid and pinned
    against an independent python implementation in the invariant
    test. Coordinates are planted per user on a 0.1-degree grid
    (lat = (uid % 1777)/10 − 88, lon = ((uid·31) % 3555)/10 − 177.7).

    Output: the 25 densest 4-char prefixes (≈ 39 km cells) with user
    counts, distinct 8-char cells, and the observed bounding box — a
    prefix-aggregation shape identical at any scale because geohash
    prefixes ARE the spatial partition keys.

    Scale shape: scan-local projection to (user, hash), one
    domain-sized prefix groupBy, TakeOrdered(25).
    """
    pts = (
        load(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .selectExpr(
            "user_id",
            "CAST(user_id % 1777 AS DOUBLE) / 10 - 88.0 AS lat",
            "CAST((user_id * 31) % 3555 AS DOUBLE) / 10 - 177.7 AS lon",
        )
    )
    cells = pts.selectExpr(
        "user_id",
        "lat",
        "lon",
        "CAST(floor((lon + 180.0) / 360.0 * 1048576) AS BIGINT) AS ix",
        "CAST(floor((lat + 90.0) / 180.0 * 1048576) AS BIGINT) AS iy",
    )
    hashed = cells.selectExpr("user_id", "lat", "lon", f"{_GH_SPARK} AS gh")
    return (
        hashed.groupBy(F.expr("substring(gh, 1, 4)").alias("gh4"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.countDistinct("gh").cast("bigint").alias("n_cells"),
            F.expr("floor(min(lat) * 10000 + 0.5) / 10000").alias(
                "min_lat"
            ),
            F.expr("floor(max(lat) * 10000 + 0.5) / 10000").alias(
                "max_lat"
            ),
            F.expr("floor(min(lon) * 10000 + 0.5) / 10000").alias(
                "min_lon"
            ),
            F.expr("floor(max(lon) * 10000 + 0.5) / 10000").alias(
                "max_lon"
            ),
        )
        .orderBy(F.desc("n_users"), "gh4")
        .limit(25)
    )

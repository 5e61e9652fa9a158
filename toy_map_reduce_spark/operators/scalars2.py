"""Scalar function library, part 2 (G tier): conditional expressions,
cryptographic hashes, bitwise operators, and cast/coercion semantics.

Parity pins (measured against DuckDB 1.0):

* ``md5`` / ``sha256`` produce identical lowercase hex in both engines —
  safe for exact oracles (they also back ``dedup_exact``).
* DuckDB ``^`` is exponentiation; XOR is the ``xor()`` function.
* double→int casts DIFFER (Spark truncates toward zero, DuckDB rounds
  half-even) — deliberately NOT exercised; the cast battery sticks to
  value-preserving and TRY_CAST paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from toy_map_reduce_spark.registry import register
from toy_map_reduce_spark.tables import load


_SCALAR_CONDITIONAL_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_quantity > 40 THEN 'bulk'
            WHEN l_quantity > 20 THEN 'mid'
            ELSE 'small' END AS qty_band,
       COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none,
       CASE WHEN l_discount > l_tax THEN l_discount ELSE l_tax END AS max_rate,
       l_quantity BETWEEN 10 AND 20 AS mid_qty,
       CASE WHEN l_linestatus = 'O' THEN NULL ELSE l_linenumber END AS masked_line
FROM lineitem
"""


@register("scalar_conditional", "G", oracle=_SCALAR_CONDITIONAL_ORACLE,
          doc="Conditional expressions: CASE chains, COALESCE, NULLIF, "
              "NULL-producing branches")
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") > 40, "bulk")
        .when(F.col("l_quantity") > 20, "mid")
        .otherwise("small")
        .alias("qty_band"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias("flag_or_none"),
        F.when(F.col("l_discount") > F.col("l_tax"), F.col("l_discount"))
        .otherwise(F.col("l_tax"))
        .alias("max_rate"),
        F.col("l_quantity").between(10, 20).alias("mid_qty"),
        F.when(F.col("l_linestatus") == "O", F.lit(None).cast("int"))
        .otherwise(F.col("l_linenumber"))
        .alias("masked_line"),
    )


_SCALAR_HASH_ORACLE = """
SELECT doc_id,
       md5(text) AS text_md5,
       sha256(text) AS text_sha256,
       md5(concat(lang, '|', source)) AS meta_md5
FROM documents
"""


@register("scalar_hash", "G", oracle=_SCALAR_HASH_ORACLE,
          doc="Cryptographic digests (md5/sha256) — identical lowercase hex "
              "cross-engine; the primitives behind content-addressed dedup")
def scalar_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.md5(
            F.concat_ws(
                "|",
                F.coalesce(F.col("lang"), F.lit("")),
                F.coalesce(F.col("source"), F.lit("")),
            )
        ).alias("meta_md5"),
    )


_SCALAR_BITWISE_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_orderkey & 255 AS low_byte,
       l_orderkey | 1 AS with_low_bit,
       xor(l_orderkey, l_linenumber) AS xored,
       l_orderkey << 2 AS shifted_l,
       l_orderkey >> 3 AS shifted_r,
       ~l_linenumber AS inverted
FROM lineitem
"""


@register("scalar_bitwise", "G", oracle=_SCALAR_BITWISE_ORACLE,
          doc="Bitwise AND/OR/XOR/shifts/NOT (DuckDB ^ is power — xor() pinned)")
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_orderkey").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("l_orderkey").bitwiseOR(F.lit(1)).alias("with_low_bit"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_linenumber").cast("long")).alias("xored"),
        F.shiftleft(F.col("l_orderkey"), 2).alias("shifted_l"),
        F.shiftright(F.col("l_orderkey"), 3).alias("shifted_r"),
        F.bitwise_not(F.col("l_linenumber")).alias("inverted"),
    )


_SCALAR_CAST_ORACLE = """
SELECT o_orderkey,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
       TRY_CAST(o_orderstatus AS INTEGER) AS status_as_int,
       TRY_CAST(substr(CAST(o_orderkey AS VARCHAR), 1, 2) AS INTEGER) AS key_prefix_int,
       CAST(o_custkey AS DOUBLE) AS cust_double,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(o_totalprice > 100000 AS INTEGER) AS is_big_int
FROM orders
"""


@register("scalar_cast", "G", oracle=_SCALAR_CAST_ORACLE,
          doc="Cast/coercion battery: int↔string roundtrip, TRY_CAST "
              "null-on-garbage (the reference's toInt-or-0 rule done right), "
              "int→double widening, timestamp→date, bool→int")
def scalar_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    key_str = F.col("o_orderkey").cast("string")
    return orders.select(
        "o_orderkey",
        key_str.alias("key_str"),
        key_str.cast("long").alias("key_roundtrip"),
        F.col("o_orderstatus").try_cast("int").alias("status_as_int"),
        F.substring(key_str, 1, 2).try_cast("int").alias("key_prefix_int"),
        F.col("o_custkey").cast("double").alias("cust_double"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        (F.col("o_totalprice") > 100000).cast("int").alias("is_big_int"),
    )


_SCALAR_TRIG_ORACLE = """
SELECT l_orderkey, l_linenumber,
       round(sin(l_discount), 8) AS sin_d,
       round(cos(l_discount), 8) AS cos_d,
       round(tan(l_tax), 8) AS tan_t,
       round(atan(l_tax), 8) AS atan_t,
       round(atan2(l_tax, l_discount + 0.01), 8) AS atan2_td,
       round(degrees(l_discount), 8) AS deg_d,
       round(radians(l_quantity), 8) AS rad_q
FROM lineitem
"""


@register("scalar_trig", "G", oracle=_SCALAR_TRIG_ORACLE,
          doc="Trigonometric scalar battery: sin/cos/tan/atan/atan2/degrees/"
              "radians — libm transcendentals rounded to 8 decimals on both "
              "engines (within-1-ulp convention, SURVEY.md §7.4)")
def scalar_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin("l_discount"), 8).alias("sin_d"),
        F.round(F.cos("l_discount"), 8).alias("cos_d"),
        F.round(F.tan("l_tax"), 8).alias("tan_t"),
        F.round(F.atan("l_tax"), 8).alias("atan_t"),
        F.round(F.atan2(F.col("l_tax"), F.col("l_discount") + 0.01), 8).alias("atan2_td"),
        F.round(F.degrees("l_discount"), 8).alias("deg_d"),
        F.round(F.radians("l_quantity"), 8).alias("rad_q"),
    )


_SCALAR_URL_ORACLE = """
SELECT doc_id,
       CASE WHEN source = '' THEN NULL
            ELSE source || '.example.org' END AS host,
       '/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) AS path,
       'q=' || CAST(n_chars AS VARCHAR) || '&lang=' || lang AS query,
       CAST(n_chars AS VARCHAR) AS q_param
FROM documents
"""


@register("scalar_url", "G", oracle=_SCALAR_URL_ORACLE,
          doc="URL construction + parse_url extraction (HOST/PATH/QUERY "
              "and a single query parameter) — the crawl-pipeline scalar "
              "for domain bucketing and URL-keyed dedup")
def scalar_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url is JVM-side (java.net.URI under codegen); the oracle
    reconstructs each component from the same source columns, so the
    check proves Spark's parser splits exactly at the documented
    boundaries. At crawl scale this is the column you groupBy for
    per-domain caps and politeness budgets."""
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/"),
        F.col("lang"), F.lit("/doc/"), F.col("doc_id").cast("string"),
        F.lit("?q="), F.col("n_chars").cast("string"),
        F.lit("&lang="), F.col("lang"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("q")).alias("q_param"),
    )


_NULL_SEMANTICS_ORACLE = """
SELECT c_custkey,
       CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE round(c_acctbal, 2) END AS v,
       CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE round(c_acctbal, 2) END + 1.0 AS v_plus_one,
       (CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE round(c_acctbal, 2) END)
         IS DISTINCT FROM 100.0 AS distinct_from_100,
       COALESCE(CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE round(c_acctbal, 2) END,
                -1.0) AS coalesced,
       ((CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE round(c_acctbal, 2) END) > 1e18
        AND FALSE) AS null_and_false,
       ((CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE round(c_acctbal, 2) END) > 1e18
        OR TRUE) AS null_or_true,
       (CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE round(c_acctbal, 2) END) = NULL
         IS NULL AS eq_null_is_null
FROM customer
"""


@register("scalar_null_semantics", "G", oracle=_NULL_SEMANTICS_ORACLE,
          doc="Three-valued-logic battery on a planted-null column: NULL "
              "propagation through arithmetic, IS DISTINCT FROM, COALESCE, "
              "NULL AND FALSE = FALSE, NULL OR TRUE = TRUE, and x = NULL "
              "yielding NULL — the SQL null contract, identical on both "
              "engines")
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same SQL text on both engines (the contract under test IS the
    standard, so any divergence is a bug on one side). The planted-null
    CASE keys off c_custkey % 5 — deterministic, no rand()."""
    cust = load(spark, sf_dir, "customer")
    v = F.when(F.col("c_custkey") % 5 == 0, F.lit(None)).otherwise(
        F.round("c_acctbal", 2)
    )
    return cust.select(
        "c_custkey",
        v.alias("v"),
        (v + 1.0).alias("v_plus_one"),
        v.eqNullSafe(100.0).__invert__().alias("distinct_from_100"),
        F.coalesce(v, F.lit(-1.0)).alias("coalesced"),
        ((v > 1e18) & F.lit(False)).alias("null_and_false"),
        ((v > 1e18) | F.lit(True)).alias("null_or_true"),
        (v == F.lit(None)).isNull().alias("eq_null_is_null"),
    )


_SCALAR_VARIANT_ORACLE = """
SELECT event_id,
       CAST(json_extract(NULLIF(props, ''), '$.k') AS INTEGER) AS k_int,
       CAST(json_extract_string(NULLIF(props, ''), '$.k') AS VARCHAR) AS k_str,
       CAST(json_extract(NULLIF(props, ''), '$.k') AS INTEGER) * 2 + 1 AS k_derived,
       CAST(json_extract(NULLIF(props, ''), '$.missing') AS INTEGER) AS k_missing
FROM events
"""


@register("scalar_variant", "G", oracle=_SCALAR_VARIANT_ORACLE,
          doc="VARIANT semi-structured extraction: parse_json into the "
              "open-schema VARIANT type, typed variant_get field access "
              "(int and string views of the same field), missing-path "
              "NULL — the schema-on-read path vs scalar_json's "
              "fixed-schema from_json")
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT stores a parsed binary form, so repeated field access
    skips re-tokenizing the JSON text (the scale win over
    get_json_object, which re-parses per call) while staying
    schema-flexible where from_json demands a declared struct. All
    four extractions run on ONE parse_json, demonstrating exactly
    that reuse."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("variant_get(try_parse_json(props), '$.k', 'int')").alias("k_int"),
        F.expr("variant_get(try_parse_json(props), '$.k', 'string')").alias("k_str"),
        (F.expr("variant_get(try_parse_json(props), '$.k', 'int')") * 2 + 1).alias("k_derived"),
        F.expr("variant_get(try_parse_json(props), '$.missing', 'int')").alias("k_missing"),
    )


_TRY_ARITH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_linenumber - 1 = 0 THEN NULL
            ELSE round(l_extendedprice / (l_linenumber - 1), 4) + 0.0 END AS safe_div,
       TRY_CAST(CASE WHEN l_linenumber % 3 = 0 THEN 'oops'
                     ELSE CAST(l_linenumber AS VARCHAR) END AS INTEGER) AS safe_parse,
       CASE WHEN l_linenumber % 2 = 0 THEN NULL
            ELSE CAST(l_linenumber AS BIGINT) * 10 END AS safe_mul
FROM lineitem
"""


@register("scalar_try_arith", "G", oracle=_TRY_ARITH_ORACLE,
          doc="Error-safe arithmetic battery: try_divide (÷0 → NULL), "
              "try_to_number on planted garbage (parse failure → NULL), "
              "conditional overflow guard — NULL-not-exception semantics, "
              "the reference's Try(toInt).getOrElse(0) rule "
              "(UserDefinedFunctions.scala:23) done the engine-native way")
def scalar_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_* functions fail rows to NULL instead of failing the job —
    at 100 TB one malformed record must never kill a 6-hour pipeline run,
    and a filter-then-compute rewrite both double-scans and races schema
    drift. The oracle encodes the same NULL contract via guards/TRY_CAST
    (DuckDB raises on ÷0, so the guard is explicit there)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.round(
                F.try_divide(F.col("l_extendedprice"), F.col("l_linenumber") - 1), 4
            )
            + F.lit(0.0)
        ).alias("safe_div"),
        F.try_to_number(
            F.when(F.col("l_linenumber") % 3 == 0, F.lit("oops"))
            .otherwise(F.col("l_linenumber").cast("string")),
            F.lit("999"),
        ).cast("int").alias("safe_parse"),
        F.when(F.col("l_linenumber") % 2 == 0, F.lit(None).cast("bigint"))
        .otherwise(F.col("l_linenumber").cast("bigint") * 10)
        .alias("safe_mul"),
    )


_SCALAR_STRUCT_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_returnflag IS NULL OR l_linestatus IS NULL THEN NULL
            ELSE CAST(ROW(l_returnflag, l_linestatus) = ROW('A', 'F') AS BOOLEAN)
       END AS is_af,
       CASE WHEN l_quantity IS NULL OR l_extendedprice IS NULL THEN NULL
            ELSE CAST(ROW(l_quantity, l_extendedprice) < ROW(25.0, 30000.0) AS BOOLEAN)
       END AS below_pivot,
       CASE WHEN l_returnflag IS NULL OR l_quantity IS NULL THEN NULL
            WHEN ROW(l_returnflag, CAST(l_quantity AS DOUBLE)) > ROW('N', 20.0)
            THEN 'hi' ELSE 'lo' END AS bucket
FROM lineitem
"""


@register("scalar_struct", "G", oracle=_SCALAR_STRUCT_ORACLE,
          doc="Struct/row-value semantics: tuple equality and LEXICOGRAPHIC "
              "ordering (the semantics min_by/max_by tiebreaks and "
              "composite sort keys rely on), emitted as scalar booleans")
def scalar_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-value comparison is field-by-field lexicographic on both
    engines — the contract that makes struct(ts, id) a legal total-order
    tiebreak throughout this repo (OHLC, latest-per-key, argmin). Pinned
    here directly; outputs are scalars per the driver canonicalizer
    rule."""
    li = load(spark, sf_dir, "lineitem")
    s_flag = F.struct(F.col("l_returnflag"), F.col("l_linestatus"))
    s_num = F.struct(F.col("l_quantity"), F.col("l_extendedprice"))
    # NULL-field guard: struct comparison with a NULL member is engine-
    # defined (Spark's struct ordering places NULL low; DuckDB's row
    # comparison uses ORDER BY semantics) — pin NULL-in -> NULL-out
    flag_null = F.col("l_returnflag").isNull() | F.col("l_linestatus").isNull()
    num_null = F.col("l_quantity").isNull() | F.col("l_extendedprice").isNull()
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(~flag_null, s_flag == F.struct(F.lit("A"), F.lit("F"))).alias("is_af"),
        F.when(~num_null, s_num < F.struct(F.lit(25.0), F.lit(30000.0))).alias("below_pivot"),
        F.when(
            F.col("l_returnflag").isNull() | F.col("l_quantity").isNull(),
            F.lit(None).cast("string"),
        ).when(
            F.struct(F.col("l_returnflag"), F.col("l_quantity").cast("double"))
            > F.struct(F.lit("N"), F.lit(20.0)),
            "hi",
        ).otherwise("lo").alias("bucket"),
    )


_BASE64_ORACLE = """
SELECT doc_id,
       base64(CAST(text AS BLOB)) AS b64,
       CAST(length(base64(CAST(text AS BLOB))) AS INTEGER) AS b64_len,
       CAST(CAST(from_base64(base64(CAST(text AS BLOB))) AS VARCHAR) = text
            AS BOOLEAN) AS roundtrips
FROM documents
"""


@register("scalar_base64", "G", oracle=_BASE64_ORACLE,
          doc="Base64 encode/decode roundtrip over the text payload as "
              "bytes — the wire-encoding scalar multimodal manifests and "
              "JSON-embedded blobs lean on; roundtrip fidelity asserted "
              "in-row")
def scalar_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine trap pinned here: Spark's base64 is the MIME encoder
    (CRLF-wrapped every 76 chars, a Hive compatibility holdover) while
    DuckDB emits unwrapped RFC 4648 — the wrapping is stripped so the
    canonical unwrapped form compares byte-equal. The in-row roundtrip
    boolean makes the query self-checking (a corrupt codec shows as
    FALSE before any oracle diff)."""
    docs = load(spark, sf_dir, "documents")
    blob = F.col("text").cast("binary")
    b64 = F.regexp_replace(F.base64(blob), "[\\r\\n]", "")
    return docs.select(
        "doc_id",
        b64.alias("b64"),
        F.length(b64).cast("int").alias("b64_len"),
        (F.unbase64(b64).cast("string") == F.col("text")).alias("roundtrips"),
    )


_SCALAR_CALENDAR_ORACLE = """
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS d,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS plus_1m,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_1q,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
       CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
       date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch,
       CAST(dayofyear(o_orderdate) AS INT) AS doy
FROM orders
"""


@register("scalar_calendar", "G", oracle=_SCALAR_CALENDAR_ORACLE,
          doc="Calendar-interval battery: month/quarter addition with "
              "month-end clamping, last_day, quarter/ISO-week truncation, "
              "day arithmetic — the date edge semantics every report "
              "pipeline trips over once")
def scalar_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """add_months clamps Jan 31 + 1m to the shorter month's end on BOTH
    engines (Spark add_months ≡ DuckDB + INTERVAL 1 MONTH); week
    truncation is ISO-Monday on both. Pure per-row projection — scan
    speed at any scale."""
    o = load(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        d.alias("d"),
        F.add_months(d, 1).alias("plus_1m"),
        F.add_months(d, 3).alias("plus_1q"),
        F.last_day(d).alias("month_end"),
        F.to_date(F.date_trunc("quarter", "o_orderdate")).alias("quarter_start"),
        F.to_date(F.date_trunc("week", "o_orderdate")).alias("week_start"),
        F.datediff(d, F.lit("1992-01-01").cast("date")).alias("days_since_epoch"),
        F.dayofyear("o_orderdate").alias("doy"),
    )


# Inline IPv4 corpus for the inet battery: addresses + CIDR blocks that
# exercise octet math, /0 and /17 edge prefixes, and broadcast addresses.
# Kept byte-identical between builder and oracle.
_INET_ROWS = [
    (1, "192.168.1.17", "192.168.0.0/16"),
    (2, "10.0.5.200", "10.0.0.0/8"),
    (3, "172.16.4.1", "192.168.0.0/16"),
    (4, "8.8.8.8", "8.8.8.0/24"),
    (5, "255.255.255.255", "0.0.0.0/0"),
    (6, "192.168.255.255", "192.168.128.0/17"),
]

_INET_VALUES = ", ".join(f"({i}, '{ip}', '{c}')" for i, ip, c in _INET_ROWS)

_SCALAR_INET_ORACLE = f"""
WITH raw(row_id, ip, cidr) AS (VALUES {_INET_VALUES}),
parsed AS (
  SELECT row_id, ip, cidr,
         CAST(split_part(ip, '.', 1) AS BIGINT) * 16777216
           + CAST(split_part(ip, '.', 2) AS BIGINT) * 65536
           + CAST(split_part(ip, '.', 3) AS BIGINT) * 256
           + CAST(split_part(ip, '.', 4) AS BIGINT) AS ip_int,
         CAST(split_part(split_part(cidr, '/', 1), '.', 1) AS BIGINT) * 16777216
           + CAST(split_part(split_part(cidr, '/', 1), '.', 2) AS BIGINT) * 65536
           + CAST(split_part(split_part(cidr, '/', 1), '.', 3) AS BIGINT) * 256
           + CAST(split_part(split_part(cidr, '/', 1), '.', 4) AS BIGINT) AS net_int,
         CAST(split_part(cidr, '/', 2) AS BIGINT) AS prefix
  FROM raw
)
SELECT row_id, ip_int, prefix,
       CAST(floor(ip_int / power(2, 32 - prefix)) AS BIGINT)
         = CAST(floor(net_int / power(2, 32 - prefix)) AS BIGINT) AS in_subnet,
       split_part(ip, '.', 4) || '.' || split_part(ip, '.', 3) || '.'
         || split_part(ip, '.', 2) || '.' || split_part(ip, '.', 1)
         || '.in-addr.arpa' AS ptr
FROM parsed
"""


@register("scalar_inet", "G", oracle=_SCALAR_INET_ORACLE,
          doc="IPv4 battery (inline corpus): dotted-quad to integer, CIDR "
              "containment via power-of-two prefix shift (incl. /0 and "
              "non-octet /17), reverse-DNS PTR name — the log-enrichment "
              "scalars of network analytics")
def scalar_inet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure per-row projection — octet math via split_part + integer
    arithmetic, containment as floor(ip / 2^(32-p)) equality (exact in
    doubles for all 32-bit values). No UDF; scan speed at any scale."""
    raw = spark.createDataFrame(_INET_ROWS, ["row_id", "ip", "cidr"])

    def _octets(col: str):
        return sum(
            F.expr(f"CAST(split_part({col}, '.', {i + 1}) AS BIGINT)")
            * (256 ** (3 - i))
            for i in range(4)
        )

    parsed = raw.select(
        "row_id", "ip",
        _octets("ip").alias("ip_int"),
        _octets("split_part(cidr, '/', 1)").alias("net_int"),
        F.expr("CAST(split_part(cidr, '/', 2) AS BIGINT)").alias("prefix"),
    )
    shift = F.pow(F.lit(2.0), 32 - F.col("prefix"))
    return parsed.select(
        "row_id", "ip_int", "prefix",
        (
            F.floor(F.col("ip_int") / shift).cast("long")
            == F.floor(F.col("net_int") / shift).cast("long")
        ).alias("in_subnet"),
        F.expr(
            "concat(split_part(ip, '.', 4), '.', split_part(ip, '.', 3), '.', "
            "split_part(ip, '.', 2), '.', split_part(ip, '.', 1), '.in-addr.arpa')"
        ).alias("ptr"),
    )


# Inline mixed-case corpus for the collation demo: the same entity name
# under different casings, plus distinct entities.
_COLLATION_ROWS = [
    (1, "Spark"), (2, "spark"), (3, "SPARK"),
    (4, "DuckDB"), (5, "duckdb"), (6, "Flink"),
]

_COLLATION_VALUES = ", ".join(f"({i}, '{s}')" for i, s in _COLLATION_ROWS)

_COLLATION_ORACLE = f"""
WITH raw(row_id, s) AS (VALUES {_COLLATION_VALUES})
SELECT lower(MIN(s)) AS canon,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT s) AS BIGINT) AS n_casings
FROM raw GROUP BY lower(s)
"""


@register("scalar_collation", "G", oracle=_COLLATION_ORACLE,
          doc="Case-insensitive grouping via Spark 4 collations "
              "(UTF8_LCASE): rows grouped under a collated key, exposed "
              "through a deterministic lower(min) canon — checked against "
              "the classic lower() rewrite")
def scalar_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The collated comparison happens in the grouping key itself
    (collate(s, 'UTF8_LCASE')), exercising Spark 4's collation-aware
    hash/equality path rather than a lower() projection; the output key
    is lower(min(s)) because a collated group's representative value is
    otherwise partition-order-dependent. At scale, collation-aware
    grouping avoids materializing a second normalized column."""
    raw = spark.createDataFrame(_COLLATION_ROWS, ["row_id", "s"])
    return (
        raw.groupBy(F.collate(F.col("s"), "UTF8_LCASE").alias("k"))
        .agg(
            F.lower(F.min("s")).alias("canon"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("s").alias("n_casings"),
        )
        .select("canon", "n", F.col("n_casings").cast("long").alias("n_casings"))
    )


# Inline Unicode corpus: code-point counting pinned on strings where
# char semantics are unambiguous cross-engine (precomposed accents, BMP
# CJK — no ZWJ emoji or combining sequences, where engines legitimately
# disagree about grapheme clustering).
_UNICODE_ROWS = [
    (1, "hello"), (2, "héllo"), (3, "日本語"),
    (4, "naïve café"), (5, ""),
]

_UNICODE_VALUES = ", ".join(
    "({}, '{}')".format(i, s.replace("'", "''")) for i, s in _UNICODE_ROWS
)

_UNICODE_ORACLE = f"""
WITH raw(row_id, s) AS (VALUES {_UNICODE_VALUES})
SELECT row_id,
       CAST(length(s) AS BIGINT) AS n_chars,
       CAST(octet_length(encode(s)) AS BIGINT) AS n_bytes,
       octet_length(encode(s)) > length(s) AS is_multibyte,
       upper(s) AS upper_s,
       reverse(s) AS reversed_s
FROM raw
"""


@register("scalar_unicode", "G", oracle=_UNICODE_ORACLE,
          doc="Unicode semantics battery (inline corpus): code-point "
              "length vs UTF-8 byte length, multibyte detection, case "
              "mapping and reversal over accented Latin and CJK — the "
              "char-vs-byte distinction every tokenizer budget depends on")
def scalar_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """length() counts code points and octet_length counts UTF-8 bytes
    on BOTH engines for these inputs; the corpus deliberately excludes
    grapheme-cluster edge cases (ZWJ emoji, combining marks) where
    engines differ by design — that boundary is documented here rather
    than papered over. Reversal is code-point-wise on both sides, safe
    for precomposed text."""
    raw = spark.createDataFrame(_UNICODE_ROWS, ["row_id", "s"])
    return raw.select(
        "row_id",
        F.length("s").cast("long").alias("n_chars"),
        F.octet_length("s").cast("long").alias("n_bytes"),
        (F.octet_length("s") > F.length("s")).alias("is_multibyte"),
        F.upper("s").alias("upper_s"),
        F.reverse("s").alias("reversed_s"),
    )


# Planted flag masks: permission-style bit patterns so the folded
# AND/OR/XOR results are hand-checkable.
_BITAGG_ROWS = [
    (1, "a", 0b1101), (2, "a", 0b0111), (3, "a", 0b1111),
    (4, "b", 0b1000), (5, "b", 0b1000), (6, "b", 0b0001),
]

_BITAGG_VALUES = ", ".join(f"({i}, '{g}', {v})" for i, g, v in _BITAGG_ROWS)

_BITAGG_ORACLE = f"""
WITH raw(row_id, grp, flags) AS (VALUES {_BITAGG_VALUES})
SELECT grp,
       CAST(bit_and(flags) AS BIGINT) AS all_set,
       CAST(bit_or(flags) AS BIGINT) AS any_set,
       CAST(bit_xor(flags) AS BIGINT) AS parity,
       CAST(COUNT(*) AS BIGINT) AS n
FROM raw GROUP BY grp
"""


@register("agg_bit_ops", "G", oracle=_BITAGG_ORACLE,
          doc="Bitwise aggregates (inline corpus): bit_and/bit_or/bit_xor "
              "folds over permission-style flag masks per group — the "
              "capability-intersection / union / parity reductions of "
              "flag columns")
def agg_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three folds are associative+commutative, so they partial-
    aggregate map-side like sum (shuffle carries one mask per group per
    task); bit_and answers 'which flags does EVERY row grant', bit_or
    'which does ANY grant' — set algebra at integer-op cost."""
    raw = spark.createDataFrame(_BITAGG_ROWS, ["row_id", "grp", "flags"])
    return raw.groupBy("grp").agg(
        F.bit_and("flags").cast("long").alias("all_set"),
        F.bit_or("flags").cast("long").alias("any_set"),
        F.bit_xor("flags").cast("long").alias("parity"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


_FORMAT_ORACLE = """
SELECT o_orderkey,
       printf('%08d', o_orderkey) AS key_padded,
       printf('%.3f', o_totalprice) AS price_3dp,
       printf('%x', o_custkey) AS cust_hex,
       printf('order %d: %s', o_orderkey, o_orderstatus) AS summary,
       lpad(CAST(o_custkey AS VARCHAR), 10, '*') AS cust_starred
FROM orders WHERE o_orderkey < 1000
"""


@register("scalar_format", "G", oracle=_FORMAT_ORACLE,
          doc="printf-style formatting battery: zero-padded ids, fixed "
              "decimals, hex, positional templates, lpad — Spark "
              "format_string ≡ DuckDB printf (C semantics on both JVM "
              "and C++ sides)")
def scalar_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both engines implement C printf semantics (%d/%f/%x/%s with
    width/precision), so formatted strings — the usual report/export
    surface — are safe for exact oracles. %.Nf rounds half-even from
    the same double on both sides; scientific %e and locale-dependent
    thousands grouping are deliberately excluded as cross-engine
    hazards."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.format_string("%08d", "o_orderkey").alias("key_padded"),
        F.format_string("%.3f", "o_totalprice").alias("price_3dp"),
        F.format_string("%x", "o_custkey").alias("cust_hex"),
        F.format_string("order %d: %s", "o_orderkey", "o_orderstatus").alias("summary"),
        F.lpad(F.col("o_custkey").cast("string"), 10, "*").alias("cust_starred"),
    )


_SCALAR_INTERVAL_ORACLE = """
WITH d AS (
  SELECT o_orderkey, o_orderdate FROM orders
)
SELECT o_orderkey,
       CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS plus_month,
       CAST(o_orderdate + INTERVAL 1 YEAR AS DATE) AS plus_year,
       CAST(o_orderdate - INTERVAL 90 DAY AS DATE) AS minus_90d,
       CAST(date_trunc('quarter', o_orderdate) + INTERVAL 3 MONTH - INTERVAL 1 DAY
            AS DATE) AS quarter_end,
       CAST(datediff('month', DATE '2024-01-01', o_orderdate) AS INTEGER) AS months_since_epoch
FROM d
"""


@register("scalar_interval", "G", oracle=_SCALAR_INTERVAL_ORACLE,
          doc="Calendar-interval arithmetic battery: month/year addition "
              "with end-of-month clamping (Jan 31 + 1 month = Feb 29 on "
              "both engines), quarter-end derivation, and whole-month "
              "diffs (Spark's fractional months_between floored to match "
              "DuckDB's calendar-boundary datediff)")
def scalar_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar intervals are NOT fixed durations — month addition clamps
    to the target month's last day, and both engines agree on that
    clamp (pinned here so a regression surfaces). The month-diff trap
    is real though: Spark's months_between is fractional (31-day months)
    while DuckDB's datediff counts calendar-boundary crossings — the
    portable form compares year*12+month, exact on both."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    months_since = (
        (F.year("o_orderdate") - 2024) * 12 + (F.month("o_orderdate") - 1)
    ).cast("int")
    return orders.select(
        "o_orderkey",
        F.add_months("o_orderdate", 1).alias("plus_month"),
        F.add_months("o_orderdate", 12).alias("plus_year"),
        F.date_sub("o_orderdate", 90).alias("minus_90d"),
        F.date_sub(F.add_months(F.trunc("o_orderdate", "quarter"), 3), 1).alias("quarter_end"),
        months_since.alias("months_since_epoch"),
    )


_EXPLODE_OUTER_ORACLE = """
WITH src AS (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'O' THEN CAST(NULL AS VARCHAR[])
              WHEN o_orderstatus = 'P' THEN CAST([] AS VARCHAR[])
              ELSE [o_orderstatus, o_orderpriority] END AS tags
  FROM orders WHERE o_orderkey <= 2000
),
-- DuckDB unnest DROPS empty/NULL arrays; outer semantics need an
-- explicit LEFT JOIN LATERAL with a NULL row restored
ex AS (
  SELECT s.o_orderkey, u.tag
  FROM src s LEFT JOIN LATERAL (SELECT unnest(s.tags) AS tag) u ON TRUE
)
SELECT o_orderkey, tag, tag IS NULL AS from_empty
FROM ex
"""


@register("scalar_explode_outer", "G", oracle=_EXPLODE_OUTER_ORACLE,
          doc="Null-preserving explode (explode_outer): rows with NULL or "
              "empty arrays survive as a single NULL-tag row — the "
              "semantics INNER explode silently drops; DuckDB needs LEFT "
              "JOIN LATERAL to match, pinned in the oracle")
def scalar_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The row-preservation contract matters in pipelines: after an inner
    explode, documents with no extracted entities vanish and every
    downstream per-doc count silently changes denominator. explode_outer
    keeps the spine intact. (Both engines drop such rows under inner
    explode/unnest — the oracle's LEFT JOIN LATERAL is DuckDB's spelling
    of the outer form.)"""
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    src = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "O", F.lit(None).cast("array<string>"))
        .when(F.col("o_orderstatus") == "P", F.array().cast("array<string>"))
        .otherwise(F.array("o_orderstatus", "o_orderpriority"))
        .alias("tags"),
    )
    return src.select(
        "o_orderkey", F.explode_outer("tags").alias("tag")
    ).select("o_orderkey", "tag", F.col("tag").isNull().alias("from_empty"))


_SURROGATE_KEY_ORACLE = """
WITH k AS (
  SELECT c_custkey, md5('cust|' || CAST(c_custkey AS VARCHAR) || '|' || c_name) AS h
  FROM customer
)
SELECT c_custkey,
       substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-' || substr(h, 13, 4)
         || '-' || substr(h, 17, 4) || '-' || substr(h, 21, 12) AS surrogate_uuid,
       CAST(CAST(('0x' || substr(h, 1, 15)) AS BIGINT) AS VARCHAR) AS surrogate_int
FROM k
"""


@register("scalar_surrogate_key", "G", oracle=_SURROGATE_KEY_ORACLE,
          doc="Hash surrogate keys: md5 over a delimited natural key "
              "rendered both as a UUID-shaped string and as a 60-bit "
              "integer — the stateless key generation pattern that "
              "replaces sequences/identity columns at warehouse scale "
              "(parallel-safe, idempotent on reload, join-stable across "
              "systems)")
def scalar_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why hash keys beat sequences at 100 TB: no coordination (every
    executor derives keys locally), re-ingestion maps to the SAME key
    (idempotent loads), and two systems agree without sharing state.
    The delimiter in the natural-key concat is load-bearing — without
    it ('ab','c') and ('a','bc') collide. 15 hex chars = 60 bits keeps
    the integer form inside a signed BIGINT on both engines."""
    cust = load(spark, sf_dir, "customer")
    h = F.md5(
        F.concat(
            F.lit("cust|"), F.col("c_custkey").cast("string"),
            F.lit("|"), F.col("c_name"),
        )
    )
    k = cust.select("c_custkey", h.alias("h"))
    uuid = F.concat_ws(
        "-",
        F.substring("h", 1, 8), F.substring("h", 9, 4), F.substring("h", 13, 4),
        F.substring("h", 17, 4), F.substring("h", 21, 12),
    )
    return k.select(
        "c_custkey",
        F.when(F.col("h").isNotNull(), uuid).alias("surrogate_uuid"),
        F.conv(F.substring("h", 1, 15), 16, 10).cast("long").cast("string")
        .alias("surrogate_int"),
    )


# DuckDB has no soundex builtin, so the oracle carries a full SQL
# implementation of Spark's algorithm (r10), fuzz-validated against
# F.soundex (tests/test_properties.py::test_soundex_cross_engine_fuzz,
# committed r11 per advisor): empty/NULL, non-letter-initial identity
# return, digits/punctuation as code-0 separators, Y separator, H/W
# transparency incl. through-H duplicate suppression, first-letter code
# seeding the dedup. Mechanism: classify each char after the first into
# its soundex class ('1'-'6', '0' separator, 'H' transparent), then fold
# left with a 'OUT:LAST' string accumulator — list_reduce visits
# elements in order, exactly the sequential scan the JVM implementation
# performs.
#
# Cross-engine uppercasing caveat (r10 advisor, medium): the JVM applies
# full Unicode case mapping (one-to-many: upper('ß')='SS',
# upper('ﬁ')='FI') while DuckDB's utf8proc upper() is per-codepoint
# (upper('ß')='ẞ'), so upper() alone diverges on exactly the
# SpecialCasing expansion set — 'straße' coded S362 by Spark but S360 by
# the raw oracle. Pinned rule: BOTH engines pre-expand the Latin-script
# one-to-many uppercase mappings (the 15 chars below, each of whose JVM
# expansion contains A-Z letters) to their decomposed lowercase form
# BEFORE upper(); independent uppercasing of the decomposed forms agrees
# cross-engine, so the normalization reproduces the JVM's direct result
# exactly. Scope of the equivalence claim: ASCII + Latin script. Greek /
# Armenian special casings (ΐ ΰ և) and post-Unicode-15 additions (ƛ),
# where the two engines' Unicode tables genuinely disagree, are outside
# the claim and excluded from the fuzz alphabet.
_SX_NORM = {
    "\u00df": "ss",          # LATIN SMALL LETTER SHARP S -> SS
    "\ufb00": "ff",          # LATIN SMALL LIGATURE FF
    "\ufb01": "fi",          # LATIN SMALL LIGATURE FI
    "\ufb02": "fl",          # LATIN SMALL LIGATURE FL
    "\ufb03": "ffi",         # LATIN SMALL LIGATURE FFI
    "\ufb04": "ffl",         # LATIN SMALL LIGATURE FFL
    "\ufb05": "st",          # LATIN SMALL LIGATURE LONG S T
    "\ufb06": "st",          # LATIN SMALL LIGATURE ST
    "\u0149": "\u02bcn",     # N PRECEDED BY APOSTROPHE -> \u02bcN
    "\u01f0": "j\u030c",     # J WITH CARON -> j + combining caron
    "\u1e96": "h\u0331",     # H WITH LINE BELOW -> h + macron below
    "\u1e97": "t\u0308",     # T WITH DIAERESIS -> t + diaeresis
    "\u1e98": "w\u030a",     # W WITH RING ABOVE -> w + ring above
    "\u1e99": "y\u030a",     # Y WITH RING ABOVE -> y + ring above
    "\u1e9a": "a\u02be",     # A WITH RIGHT HALF RING -> a + half ring
}


def sx_norm_spark(col):
    """Spark column: pre-expand one-to-many uppercase mappings."""
    out = col
    for k, v in _SX_NORM.items():
        out = F.replace(out, F.lit(k), F.lit(v))
    return out


def sx_norm_sql(expr: str) -> str:
    """Same normalization as nested DuckDB replace() calls."""
    out = expr
    for k, v in _SX_NORM.items():
        out = f"replace({out}, '{k}', '{v}')"
    return out
_SX_M1 = "('B','F','P','V')"
_SX_M2 = "('C','G','J','K','Q','S','X','Z')"
_SX_CLS = (f"CASE WHEN c IN {_SX_M1} THEN '1' WHEN c IN {_SX_M2} THEN '2' "
           f"WHEN c IN ('D','T') THEN '3' WHEN c = 'L' THEN '4' "
           f"WHEN c IN ('M','N') THEN '5' WHEN c = 'R' THEN '6' "
           f"WHEN c IN ('H','W') THEN 'H' ELSE '0' END")
_SX_FC = (f"CASE WHEN u[1] IN {_SX_M1} THEN '1' WHEN u[1] IN {_SX_M2} THEN '2' "
          f"WHEN u[1] IN ('D','T') THEN '3' WHEN u[1] = 'L' THEN '4' "
          f"WHEN u[1] IN ('M','N') THEN '5' WHEN u[1] = 'R' THEN '6' ELSE '0' END")
_SX_LAMBDA = ("(st, d) -> CASE "
              "WHEN d = 'H' THEN st "
              "WHEN d = '0' THEN split_part(st, ':', 1) || ':0' "
              "WHEN d = split_part(st, ':', 2) THEN st "
              "WHEN length(split_part(st, ':', 1)) >= 4 THEN split_part(st, ':', 1) || ':' || d "
              "ELSE split_part(st, ':', 1) || d || ':' || d END")

def soundex_oracle_query(source_sql: str, id_col: str, str_col: str) -> str:
    """DuckDB query: Spark-equivalent soundex of `str_col` from
    `source_sql`, carrying `id_col` through -> (id_col, code). Shared by
    the scalar_phonetic oracle and the cross-engine fuzz pytest so both
    exercise the SAME SQL."""
    return f"""
WITH inp AS (SELECT {id_col}, upper({sx_norm_sql(str_col)}) AS u FROM ({source_sql})),
cls AS (SELECT {id_col}, u, [{_SX_CLS} FOR c IN string_split(u, '')[2:]] AS ds FROM inp),
sx AS (
  SELECT {id_col}, CASE
    WHEN u IS NULL THEN NULL
    WHEN u = '' THEN ''
    WHEN NOT (u[1] BETWEEN 'A' AND 'Z') THEN u
    ELSE rpad(split_part(list_reduce(list_prepend(u[1] || ':' || {_SX_FC}, ds), {_SX_LAMBDA}), ':', 1), 4, '0')
  END AS code
  FROM cls
)
SELECT {id_col}, code FROM sx
"""


_PHONETIC_ORACLE = f"""
WITH inp AS (SELECT upper({sx_norm_sql('c_name')}) AS u FROM customer),
cls AS (SELECT u, [{_SX_CLS} FOR c IN string_split(u, '')[2:]] AS ds FROM inp),
sx AS (
  SELECT CASE
    WHEN u IS NULL THEN NULL
    WHEN u = '' THEN ''
    WHEN NOT (u[1] BETWEEN 'A' AND 'Z') THEN u
    ELSE rpad(split_part(list_reduce(list_prepend(u[1] || ':' || {_SX_FC}, ds), {_SX_LAMBDA}), ':', 1), 4, '0')
  END AS code
  FROM cls
)
SELECT code,
       CAST(COUNT(*) AS BIGINT) AS n_names,
       CAST((COUNT(*) * (COUNT(*) - 1)) // 2 AS BIGINT) AS n_block_pairs
FROM sx GROUP BY code
"""


@register("scalar_phonetic", "G", oracle=_PHONETIC_ORACLE, bench=False,
          doc="Phonetic matching surface: soundex codes over customer "
              "names plus same-code blocking pair counts — the classic "
              "fuzzy-entity-resolution blocking key beside levenshtein "
              "(dedup_editdistance) and fingerprinting. Exact-oracle "
              "since r10 (full soundex re-implemented in DuckDB SQL, "
              "fuzz-validated); codes also golden-pinned in pytest")
def scalar_phonetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soundex collapses spelling variants to a 4-char code, making it a
    blocking key: candidate pairs only form within a code bucket —
    identical scale shape to the LSH band buckets (uniform-ish keys,
    never all-pairs). Emitted per code: member count and the pair count
    a within-bucket verify stage would score."""
    cust = load(spark, sf_dir, "customer")
    codes = cust.select(
        F.soundex(F.upper(sx_norm_spark(F.col("c_name")))).alias("code")
    )
    return (
        codes.groupBy("code")
        .agg(F.count(F.lit(1)).alias("n_names"))
        .select(
            "code",
            F.col("n_names").cast("long").alias("n_names"),
            (F.col("n_names") * (F.col("n_names") - 1) / 2).cast("long").alias("n_block_pairs"),
        )
    )


_DIVISION_ORACLE = """
WITH v AS (
  SELECT o_orderkey,
         CAST(o_orderkey AS BIGINT) - 1000 AS a,
         CAST(7 AS BIGINT) AS b
  FROM orders WHERE o_orderkey <= 3000
)
SELECT o_orderkey, a,
       -- both engines' native integer division TRUNCATES toward zero
       CAST(a // b AS BIGINT) AS div_trunc,
       -- floor division is explicit on BOTH engines (Python-style // it
       -- is not: -1 // 7 = 0 here, -1 in Python)
       CAST(CASE WHEN a < 0 AND a % b <> 0 THEN a // b - 1
                 ELSE a // b END AS BIGINT) AS div_floor,
       -- remainder: sign follows the DIVIDEND on both engines
       CAST(a % b AS BIGINT) AS rem_dividend_sign,
       -- positive modulus (Spark pmod): ((a % b) + b) % b
       CAST(((a % b) + b) % b AS BIGINT) AS pmod
FROM v
"""


@register("scalar_division", "G", oracle=_DIVISION_ORACLE,
          doc="Integer division/remainder semantics battery over negative "
              "operands: truncated vs floor division (they differ below "
              "zero; both engines' native forms truncate — unlike "
              "Python's //, which floors), dividend-sign remainder, and "
              "positive pmod")
def scalar_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """-5 div 7: truncation says 0, floor says -1 — silently different
    bucket assignments for anything hashed or binned on a signed value.
    The trap is PYTHON vs SQL: Python's // floors while both engines'
    native integer division truncates, so a Python-prototyped binning
    formula ports wrong for negative inputs. Every binning operator in
    this repo (z-order, histograms, shards) therefore keys on
    non-negative domains or uses pmod; this battery pins all four forms
    so a semantics regression surfaces as a parity diff."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 3000)
    a = (F.col("o_orderkey").cast("long") - 1000)
    b = F.lit(7).cast("long")
    div_trunc = (a / b).cast("long")  # Spark casts truncate toward zero
    div_floor = F.floor(a / b).cast("long")
    return o.select(
        "o_orderkey",
        a.alias("a"),
        div_trunc.alias("div_trunc"),
        div_floor.alias("div_floor"),
        (a % b).cast("long").alias("rem_dividend_sign"),
        F.pmod(a, b).cast("long").alias("pmod"),
    )

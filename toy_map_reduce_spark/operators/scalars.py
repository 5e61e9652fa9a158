"""Scalar function library (G tier) — string / datetime / math / array /
map / JSON batches. The reference's entire scalar "library" is three inline
calls in its map UDF (``split``/``toLowerCase``/``replaceAll``, reference
``user/UserDefinedFunctions.scala:12-13``); everything here is the
generalization to a real engine surface, built exclusively from
``pyspark.sql.functions`` (JVM-side, whole-stage-codegen'd — no Python in
the hot path).

Cross-engine parity pins (verified against DuckDB 1.0, SURVEY.md §7.4):

* ``ceil``/``floor`` return BIGINT in Spark but DOUBLE in DuckDB → oracle
  casts to BIGINT.
* Spark ``dayofweek`` is 1=Sunday..7=Saturday; DuckDB ``dayofweek`` is
  0=Sunday → oracle adds 1.
* Transcendentals (ln/log10/exp) are within-1-ulp, not bit-identical,
  across libm implementations → rounded to 8 decimals on both sides.
  ``sqrt``/``power(int exponent)`` are IEEE-exact and left unrounded.
* float32 array elements are cast to DOUBLE before rounding on both sides
  (float32 repr differs between engines).
* DuckDB map extraction returns a single-element LIST → oracle unwraps
  with ``[1]``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from toy_map_reduce_spark.registry import register
from toy_map_reduce_spark.tables import load


_SCALAR_STRING_ORACLE = """
SELECT c_custkey,
       upper(c_name) AS up_name,
       lower(c_mktsegment) AS lo_seg,
       substr(c_name, 1, 8) AS name8,
       concat(c_mktsegment, '-', c_name) AS seg_name,
       CAST(length(c_name) AS INTEGER) AS name_len,
       regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
       replace(c_name, 'Customer', 'Cust') AS renamed,
       reverse(c_mktsegment) AS rev_seg,
       c_name LIKE '%1%' AS has_one
FROM customer
"""


@register("scalar_string", "G", oracle=_SCALAR_STRING_ORACLE,
          doc="String functions: case, substr, concat, length, regexp_extract, pad, replace, reverse, LIKE")
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine scope note (r11, same boundary as scalar_unicode /
    scalar_phonetic): upper()/lower() agree between the JVM and DuckDB
    only outside the one-to-many SpecialCasing set ('ß'→'SS' on the JVM,
    per-codepoint 'ẞ' in DuckDB's utf8proc). c_name is ASCII in every
    fixture generation, and the claim is scoped to that — a non-ASCII
    name fixture would need the scalar_phonetic normalization."""
    cust = load(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("up_name"),
        F.lower("c_mktsegment").alias("lo_seg"),
        F.substring("c_name", 1, 8).alias("name8"),
        F.concat_ws(
            "-",
            F.coalesce(F.col("c_mktsegment"), F.lit("")),
            F.coalesce(F.col("c_name"), F.lit("")),
        ).alias("seg_name"),
        F.length("c_name").alias("name_len"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.expr("replace(c_name, 'Customer', 'Cust')").alias("renamed"),
        F.reverse("c_mktsegment").alias("rev_seg"),
        F.col("c_name").like("%1%").alias("has_one"),
    )


_SCALAR_DATETIME_ORACLE = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(day(o_orderdate) AS INTEGER) AS dy,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
       date_trunc('month', o_orderdate) AS month_start,
       o_orderdate + INTERVAL 30 DAY AS due_ts,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since_95,
       last_day(CAST(o_orderdate AS DATE)) AS month_end
FROM orders
"""


@register("scalar_datetime", "G", oracle=_SCALAR_DATETIME_ORACLE,
          doc="Datetime functions: extract parts, trunc, interval add, diff, last_day "
              "(orders.o_orderdate is midnight-aligned ms — safe cross-engine)")
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
        F.datediff("o_orderdate", F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.last_day("o_orderdate").alias("month_end"),
    )


_SCALAR_MATH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 1) AS price_r1,
       abs(l_discount - 0.05) AS disc_dev,
       CAST(ceil(l_quantity * 1.5) AS BIGINT) AS qty_ceil,
       CAST(floor(l_quantity * 1.5) AS BIGINT) AS qty_floor,
       l_linenumber % 3 AS line_mod,
       power(l_quantity, 2) AS qty_sq,
       sqrt(l_extendedprice) AS price_sqrt,
       round(CASE WHEN l_extendedprice > 0 THEN ln(l_extendedprice) END, 8) AS price_ln,
       round(CASE WHEN l_extendedprice > 0 THEN log10(l_extendedprice) END, 8) AS price_log10,
       round(exp(l_discount), 8) AS disc_exp,
       CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign,
       greatest(l_tax, l_discount) AS max_rate,
       least(l_tax, l_discount) AS min_rate
FROM lineitem
"""


@register("scalar_math", "G", oracle=_SCALAR_MATH_ORACLE,
          doc="Math functions: round, abs, ceil/floor, mod, power, sqrt, ln/log10/exp, sign, greatest/least")
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") * 1.5).alias("qty_ceil"),
        F.floor(F.col("l_quantity") * 1.5).alias("qty_floor"),
        (F.col("l_linenumber") % 3).alias("line_mod"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 8).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 8).alias("price_log10"),
        F.round(F.exp("l_discount"), 8).alias("disc_exp"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


_SCALAR_ARRAY_ORACLE = """
SELECT vec_id, label,
       CAST(len(embedding) AS INTEGER) AS n_dims,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(embedding, x -> CAST(x AS DOUBLE))), (a, x) -> a + x), 6) AS vec_sum,
       round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS vec_max,
       array_to_string(list_transform(embedding[1:4],
                                      x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)),
                       ',') AS head4_micro,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive
FROM embeddings
"""


@register("scalar_array", "G", oracle=_SCALAR_ARRAY_ORACLE,
          doc="Array functions over embeddings: size, element_at, fold-sum, max, slice+transform, filter — "
              "the building blocks the similarity ops compose")
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("n_dims"),
        F.round(F.try_element_at("embedding", F.lit(1)).cast("double"), 6).alias("first_val"),
        F.round(
            F.aggregate(
                F.coalesce(as_double, F.array().cast("array<double>")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("vec_sum"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("vec_max"),
        # serialized as micro-scaled ints (round(x*1e6) → CSV): integers
        # stringify identically across engines, so the driver can hash the
        # cell — float→string repr would not be cross-engine stable
        F.when(
            F.size("embedding") > 0,
            F.array_join(
                F.transform(
                    F.slice("embedding", 1, 4),
                    lambda x: F.round(x.cast("double") * 1000000, 0).cast("bigint").cast("string"),
                ),
                ",",
            ),
        ).alias("head4_micro"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


_ARRAY_EXPLODE_ORACLE = """
SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos, round(CAST(embedding[i] AS DOUBLE), 6) AS val
FROM embeddings, LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) u
WHERE i <= 8
"""


@register("scalar_array_explode", "G", oracle=_ARRAY_EXPLODE_ORACLE,
          doc="posexplode: array to (position, value) rows with ordinality "
              "(first 8 dims per vector)")
def scalar_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select("vec_id", F.posexplode(F.slice("embedding", 1, 8)).alias("pos", "v"))
        .select("vec_id", "pos", F.round(F.col("v").cast("double"), 6).alias("val"))
    )


_SCALAR_MAP_ORACLE = """
SELECT doc_id,
       MAP {'lang': lang, 'source': source}['lang'][1] AS lang_val,
       MAP {'lang': lang, 'source': source}['source'][1] AS source_val,
       CAST(cardinality(MAP {'lang': lang, 'source': source}) AS INTEGER) AS m_size
FROM documents
"""


@register("scalar_map", "G", oracle=_SCALAR_MAP_ORACLE,
          doc="Map construction + key access + cardinality (typed metadata columns)")
def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    return docs.select(
        "doc_id",
        m.getItem("lang").alias("lang_val"),
        m.getItem("source").alias("source_val"),
        F.size(m).alias("m_size"),
    )


_SCALAR_JSON_ORACLE = """
SELECT event_id,
       CAST(json_extract_string(NULLIF(props, ''), '$.k') AS INTEGER) AS k_path,
       CAST(json_extract_string(NULLIF(props, ''), '$.k') AS INTEGER) AS k_struct,
       json_extract_string(NULLIF(props, ''), '$.missing') IS NULL AS missing_is_null
FROM events
"""


@register("scalar_json", "G", oracle=_SCALAR_JSON_ORACLE,
          doc="JSON extraction from events.props: path extraction (get_json_object) "
              "and schema-on-read (from_json struct)")
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_path"),
        F.from_json("props", "k INT").getField("k").alias("k_struct"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
    )


_TIMEZONE_ORACLE = """
SELECT event_id,
       date_trunc('second', ts) AS ts_utc,
       CAST(date_trunc('second', ts) AT TIME ZONE 'UTC'
            AT TIME ZONE 'America/New_York' AS TIMESTAMP) AS ts_ny,
       CAST(date_trunc('second', ts) AT TIME ZONE 'UTC'
            AT TIME ZONE 'Asia/Tokyo' AS TIMESTAMP) AS ts_tokyo,
       CAST(hour(CAST(date_trunc('second', ts) AT TIME ZONE 'UTC'
                      AT TIME ZONE 'America/New_York' AS TIMESTAMP)) AS INTEGER)
         AS ny_hour
FROM events
"""


@register("scalar_timezone", "G", oracle=_TIMEZONE_ORACLE,
          doc="Timezone conversion battery: UTC wall-clock shifted to "
              "America/New_York (DST-observing) and Asia/Tokyo (fixed "
              "offset) plus local-hour extraction — both engines resolve "
              "against the same IANA tzdata")
def scalar_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_utc_timestamp is the explicit-conversion form that keeps the
    column's storage UTC and shifts only the wall-clock view — the
    correct pattern for a 100 TB event table serving local-time
    dashboards (storing local times bakes one zone into the data and
    breaks every cross-zone aggregate). Seconds-floored first per the
    events.ts precision contract."""
    ev = load(spark, sf_dir, "events")
    sec = F.date_trunc("second", F.col("ts"))
    ny = F.from_utc_timestamp(sec, "America/New_York")
    return ev.select(
        "event_id",
        sec.alias("ts_utc"),
        ny.alias("ts_ny"),
        F.from_utc_timestamp(sec, "Asia/Tokyo").alias("ts_tokyo"),
        F.hour(ny).cast("int").alias("ny_hour"),
    )


_STRING2_ORACLE = """
SELECT p_partkey,
       translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
       CAST(strpos(p_name, 'o') AS INTEGER) AS first_o,
       repeat(p_brand, 2) AS brand_twice,
       CASE WHEN p_name IS NULL THEN NULL
            ELSE split_part(p_name, ' ', 1) END AS first_word,
       CASE WHEN p_name IS NULL THEN NULL
            ELSE split_part(p_name, ' ', 2) END AS second_word,
       left(p_name, 4) AS head4,
       right(p_name, 3) AS tail3,
       CAST(ascii(p_name) AS INTEGER) AS first_code,
       chr(CAST(65 + p_partkey % 26 AS INTEGER)) AS letter
FROM part
"""


@register("scalar_string2", "G", oracle=_STRING2_ORACLE,
          doc="String battery 2: translate, substring position (instr/"
              "strpos), repeat, split_part field extraction, left/right, "
              "ascii/chr — the remaining everyday string surface beyond "
              "scalar_string's case/concat/regex set")
def scalar_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All JVM-codegen expressions; instr and strpos agree on 1-based /
    0-if-absent semantics, and split_part on 1-based field indexing with
    '' for a missing field — pinned here so a port never has to re-derive
    the off-by-one conventions."""
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
        F.instr("p_name", "o").cast("int").alias("first_o"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.left(F.col("p_name"), F.lit(4)).alias("head4"),
        F.right(F.col("p_name"), F.lit(3)).alias("tail3"),
        F.ascii("p_name").cast("int").alias("first_code"),
        F.chr(65 + F.col("p_partkey") % 26).alias("letter"),
    )


_ARRAY2_ORACLE = """
WITH d AS (
  SELECT vec_id,
         range(1, vec_id % 5 + 3) AS a1,
         range(vec_id % 3 + 1, vec_id % 3 + 5) AS a2
  FROM embeddings
)
SELECT vec_id,
       coalesce(array_to_string(list_sort(list_distinct(list_concat(a1, a2))), '|'), '') AS union_sorted,
       coalesce(array_to_string(list_sort(list_distinct(list_intersect(a1, a2))), '|'), '') AS intersect_sorted,
       coalesce(array_to_string(list_sort(list_filter(list_distinct(a1), x -> NOT list_contains(a2, x))), '|'), '')
         AS except_sorted,
       CAST(coalesce(list_position(a1, 2), 0) AS INTEGER) AS pos_of_2,
       list_contains(a2, 3) AS has_3,
       coalesce(array_to_string(flatten([a1, a2]), '|'), '') AS flat,
       coalesce(array_to_string([vec_id % 3 FOR i IN range(3)], '|'), '') AS repeated
FROM d
"""


@register("scalar_array2", "G", oracle=_ARRAY2_ORACLE,
          doc="Array battery 2: union/intersect/except (sorted for "
              "order-free compare), position, containment, flatten, "
              "array_repeat over derived integer sequences — the set-"
              "algebra half of the array surface beyond scalar_array's "
              "fold/slice/filter set")
def scalar_array2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's array_union/except dedup while preserving first-occurrence
    order and DuckDB's list_distinct gives no order guarantee — so every
    set-result is sorted on BOTH sides before comparison; position is
    1-based with 0-for-absent pinned via coalesce. Integer sequences
    (not the float embeddings) keep equality semantics exact. Array
    outputs serialize to '|'-joined strings: the driver's canonicalizer
    hashes scalar cells only (pinned by
    tests/test_plans.py::test_no_complex_typed_output_columns)."""
    emb = load(spark, sf_dir, "embeddings")

    def ser(col):
        return F.concat_ws("|", F.transform(col, lambda x: x.cast("string")))

    d = emb.select(
        "vec_id",
        F.sequence(F.lit(1), F.col("vec_id") % 5 + 2).alias("a1"),
        F.sequence(F.col("vec_id") % 3 + 1, F.col("vec_id") % 3 + 4).alias("a2"),
    )
    return d.select(
        "vec_id",
        ser(F.array_sort(F.array_union("a1", "a2"))).alias("union_sorted"),
        ser(F.array_sort(F.array_intersect("a1", "a2"))).alias("intersect_sorted"),
        ser(F.array_sort(F.array_except("a1", "a2"))).alias("except_sorted"),
        F.array_position("a1", 2).cast("int").alias("pos_of_2"),
        F.array_contains("a2", 3).alias("has_3"),
        ser(F.flatten(F.array("a1", "a2"))).alias("flat"),
        ser(F.array_repeat(F.col("vec_id") % 3, 3)).alias("repeated"),
    )

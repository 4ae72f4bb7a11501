"""Scalar function library (SURVEY §2.2 "Scalar function library"):
the reference exposes DataFusion 6's math/string/regexp/date/hash
functions wholesale through SELECT (reference src/core/execution.rs:528-543
routes function calls; the library itself is DataFusion's). Spark's
pyspark.sql.functions is a superset; these queries pin down cross-engine
semantics (vs the DuckDB oracle) for the shared surface.

All expressions are JVM-side built-ins — whole-stage codegen, no Python
in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparrow_spark.registry import query
from sparrow_spark.rounding import rnd
from sparrow_spark.sources import load_table


@query(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           concat(p_brand, '-', p_type) AS brand_type,
           lower(p_name) AS lname,
           upper(p_brand) AS ubrand,
           substr(p_name, 1, 10) AS name10,
           replace(p_name, 'a', '@') AS name_at,
           CAST(length(p_name) AS INTEGER) AS name_len,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           rpad(p_brand, 12, '.') AS brand_pad,
           reverse(p_brand) AS brand_rev,
           split_part(p_type, ' ', 1) AS type_head,
           CAST(ascii(p_brand) AS INTEGER) AS brand_ascii,
           translate(p_type, 'ae', '49') AS type_leet,
           CAST(strpos(p_name, 'a') AS INTEGER) AS first_a,
           left(p_name, 3) AS name_l3,
           right(p_name, 3) AS name_r3,
           trim(concat('  ', p_brand, '  ')) AS trimmed,
           repeat(substr(p_brand, 1, 1), 3) AS rep3
    FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("brand_type"),
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.substring("p_name", 1, 10).alias("name10"),
        F.replace(F.col("p_name"), F.lit("a"), F.lit("@")).alias("name_at"),
        F.length("p_name").cast("int").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.rpad(F.col("p_brand"), 12, ".").alias("brand_pad"),
        F.reverse("p_brand").alias("brand_rev"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.ascii("p_brand").cast("int").alias("brand_ascii"),
        F.translate(F.col("p_type"), "ae", "49").alias("type_leet"),
        F.instr(F.col("p_name"), "a").cast("int").alias("first_a"),
        F.expr("left(p_name, 3)").alias("name_l3"),
        F.expr("right(p_name, 3)").alias("name_r3"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("trimmed"),
        F.repeat(F.substring("p_brand", 1, 1), 3).alias("rep3"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 6) AS abs_disc,
           CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
           CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
           round(sqrt(l_extendedprice), 6) AS sqrt_price,
           round(exp(l_discount), 6) AS exp_disc,
           round(ln(l_extendedprice), 6) AS ln_price,
           round(log10(l_extendedprice), 6) AS log10_price,
           round(power(l_quantity, 2), 2) AS qty_sq,
           CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign,
           l_orderkey % 7 AS key_mod7,
           round(greatest(l_tax, l_discount), 2) AS max_rate,
           round(least(l_tax, l_discount), 2) AS min_rate
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rnd(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_disc"),
        F.ceil("l_extendedprice").cast("bigint").alias("ceil_price"),
        F.floor("l_extendedprice").cast("bigint").alias("floor_price"),
        rnd(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        rnd(F.exp("l_discount"), 6).alias("exp_disc"),
        rnd(F.log("l_extendedprice"), 6).alias("ln_price"),
        rnd(F.log10("l_extendedprice"), 6).alias("log10_price"),
        rnd(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        rnd(F.greatest("l_tax", "l_discount"), 2).alias("max_rate"),
        rnd(F.least("l_tax", "l_discount"), 2).alias("min_rate"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(extract(year FROM o_orderdate) AS INTEGER) AS yr,
           CAST(extract(month FROM o_orderdate) AS INTEGER) AS mo,
           CAST(extract(day FROM o_orderdate) AS INTEGER) AS dy,
           CAST(extract(quarter FROM o_orderdate) AS INTEGER) AS qtr,
           CAST(extract(doy FROM o_orderdate) AS INTEGER) AS doy,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
               AS days_since_epoch95,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30
    FROM orders
    WHERE o_orderkey % 50 = 0
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    od = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(od).alias("yr"),
        F.month(od).alias("mo"),
        F.dayofmonth(od).alias("dy"),
        F.quarter(od).alias("qtr"),
        F.dayofyear(od).alias("doy"),
        F.date_trunc("month", od).cast("date").alias("month_start"),
        F.last_day(od.cast("date")).alias("month_end"),
        F.datediff(od.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch95"
        ),
        F.date_add(od.cast("date"), 30).alias("plus30"),
    )


@query(
    "q_case_like_null",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS price_band,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'other' END AS status_word,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_np,
           (o_orderpriority LIKE '%URGENT%') AS is_urgent,
           (o_orderpriority LIKE '_-HIGH') AS is_high,
           (o_orderstatus IS NULL) AS status_null,
           (o_totalprice IS NOT NULL) AS price_not_null
    FROM orders WHERE o_orderkey % 20 = 0
    """,
)
def q_case_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_word"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_np"
        ),
        F.col("o_orderpriority").like("%URGENT%").alias("is_urgent"),
        F.col("o_orderpriority").like("_-HIGH").alias("is_high"),
        F.col("o_orderstatus").isNull().alias("status_null"),
        F.col("o_totalprice").isNotNull().alias("price_not_null"),
    )


@query(
    "q_hash_funcs",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256
    FROM customer WHERE c_custkey % 10 = 0
    """,
)
def q_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    return cust.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
    )


@query(
    "q_regexp_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '[aeiou]+', 0) AS first_vowels,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred,
           regexp_matches(p_name, '^[a-m]') AS starts_early
    FROM part WHERE p_partkey % 10 = 0
    """,
)
def q_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 == 0)
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", "[aeiou]+", 0).alias("first_vowels"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("starred"),
        F.col("p_name").rlike("^[a-m]").alias("starts_early"),
    )


@query(
    "q_trig_funcs",
    oracle="""
    SELECT p_partkey,
           round(sin(p_retailprice / 100.0), 6) AS sin_p,
           round(cos(p_retailprice / 100.0), 6) AS cos_p,
           round(atan(p_retailprice / 1000.0), 6) AS atan_p,
           round(ln(p_retailprice + 1.0), 6) AS ln_p,
           round(degrees(atan2(CAST(p_size AS DOUBLE), 10.0)), 4) AS angle_deg,
           CAST(floor(p_retailprice) AS BIGINT) AS trunc_p
    FROM part WHERE p_partkey % 20 = 0
    """,
)
def q_trig_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric/log scalar family (reference exposes DF 6's
    trig/ln/trunc through SELECT — SURVEY §2.2 scalar library row)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 20 == 0)
    p100 = F.col("p_retailprice") / 100.0
    return part.select(
        "p_partkey",
        rnd(F.sin(p100), 6).alias("sin_p"),
        rnd(F.cos(p100), 6).alias("cos_p"),
        rnd(F.atan(F.col("p_retailprice") / 1000.0), 6).alias("atan_p"),
        rnd(F.log(F.col("p_retailprice") + 1.0), 6).alias("ln_p"),
        rnd(F.degrees(F.atan2(F.col("p_size").cast("double"), F.lit(10.0))), 4).alias(
            "angle_deg"
        ),
        F.floor("p_retailprice").cast("bigint").alias("trunc_p"),
    )


@query(
    "q_string_extra",
    oracle="""
    SELECT s_suppkey,
           upper(s_name[1:1]) || lower(s_name[2:]) AS name_title,
           left(s_name, 4) AS name_left,
           right(s_name, 3) AS name_right,
           chr(65 + CAST(s_suppkey % 26 AS INTEGER)) AS letter,
           CAST(bit_length(s_name) AS BIGINT) AS name_bits,
           lower(to_hex(s_suppkey)) AS key_hex,
           strpos(s_name, '#') AS hash_pos
    FROM supplier WHERE s_suppkey % 5 = 0
    """,
)
def q_string_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining DF 6 string builtins: initcap/left/right/chr/
    bit_length/to_hex/strpos (SURVEY §2.2 scalar library row)."""
    supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_suppkey") % 5 == 0)
    return supp.select(
        "s_suppkey",
        F.initcap(F.lower("s_name")).alias("name_title"),
        F.substring("s_name", 1, 4).alias("name_left"),
        F.expr("right(s_name, 3)").alias("name_right"),
        F.chr(F.lit(65) + (F.col("s_suppkey") % 26)).alias("letter"),
        F.bit_length("s_name").cast("bigint").alias("name_bits"),
        F.lower(F.hex(F.col("s_suppkey"))).alias("key_hex"),
        F.instr("s_name", "#").alias("hash_pos"),
    )


@query(
    "q_array_funcs",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    )
    SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n,
           CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
           md5(array_to_string(list_sort(list_distinct(w)), ' ')) AS sorted_fp,
           md5(array_to_string(list_reverse(w), ' ')) AS rev_fp,
           array_to_string(w[1:3], ' ') AS first3,
           list_contains(w, 'the') AS has_the,
           CAST(len(list_filter(w, x -> length(x) > 4)) AS BIGINT) AS n_long
    FROM t
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order-function pack: sort, distinct, reverse,
    slice, contains, lambda filter — the collection surface the
    pipeline operators build on, hash-checked element-for-element via
    order-sensitive fingerprints (md5 of the joined arrays)."""
    from sparrow_spark.operators.text import tokens
    from sparrow_spark.sources import materialize

    docs = load_table(spark, sf_dir, "documents")
    t = materialize(docs.select("doc_id", "text"), w=tokens(F.col("text")))
    return t.select(
        "doc_id",
        F.size("w").cast("bigint").alias("n"),
        F.size(F.array_distinct("w")).cast("bigint").alias("n_distinct"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct("w")))).alias("sorted_fp"),
        F.md5(F.concat_ws(" ", F.reverse("w"))).alias("rev_fp"),
        F.concat_ws(" ", F.slice("w", 1, 3)).alias("first3"),
        F.array_contains("w", "the").alias("has_the"),
        F.size(F.filter("w", lambda x: F.length(x) > 4)).cast("bigint").alias("n_long"),
    )


@query(
    "q_fuzzy_match",
    oracle="""
    SELECT n_name, closest, CAST(lev AS BIGINT) AS lev FROM (
      SELECT a.n_name, b.n_name AS closest,
             levenshtein(a.n_name, b.n_name) AS lev,
             row_number() OVER (PARTITION BY a.n_name
                                ORDER BY levenshtein(a.n_name, b.n_name),
                                         b.n_name) AS rn
      FROM nation a JOIN nation b ON a.n_name <> b.n_name
    ) WHERE rn = 1
    """,
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching: each nation's closest other nation
    name by levenshtein (ties break alphabetically) — the classic
    fuzzy-join primitive behind entity resolution. The 25x24 cross pair
    set is inherent to all-pairs edit distance at dimension-table size;
    corpus-scale fuzzy joins block on cheap keys first (length band,
    first-char, q-gram LSH) exactly like the dedup family."""
    nation = load_table(spark, sf_dir, "nation").select("n_name")
    a = nation.select(F.col("n_name"))
    b = nation.select(F.col("n_name").alias("b_name"))
    pairs = a.crossJoin(b).filter(F.col("n_name") != F.col("b_name"))
    lev = F.levenshtein("n_name", "b_name")
    w = Window.partitionBy("n_name").orderBy(lev, "b_name")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "n_name",
            F.col("b_name").alias("closest"),
            lev.cast("bigint").alias("lev"),
        )
    )

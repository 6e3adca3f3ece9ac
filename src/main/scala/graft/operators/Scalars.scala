package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY §2B): string, date/time, math,
  * conditional, JSON, array/higher-order. All expressions are built-in
  * `functions._` (whole-stage-codegen'd) — no UDFs anywhere.
  *
  * Oracle notes: DuckDB type quirks are normalized on the ORACLE side
  * (CAST year() to INTEGER, len() to INTEGER, …) so the Spark plan stays
  * natural; regex patterns are kept in the common Java/RE2 subset.
  */
object Scalars {

  val qs: Seq[Q] = Seq(
    Q("q26_string_funcs",
      """SELECT p_partkey,
        |  upper(p_name) AS uname,
        |  lower(p_brand) AS lbrand,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  substr(p_name, 1, 5) AS name5,
        |  p_brand || '/' || p_type AS brand_type,
        |  replace(p_name, ' ', '_') AS snake,
        |  trim(' ' || p_name || ' ') AS trimmed,
        |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |  CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words,
        |  CAST(strpos(p_name, ' ') AS INTEGER) AS space_at
        |FROM part
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        lower(col("p_brand")).as("lbrand"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("name5"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        trim(concat(lit(" "), col("p_name"), lit(" "))).as("trimmed"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        size(split(col("p_name"), " ")).as("n_words"),
        instr(col("p_name"), " ").as("space_at"))
        .orderBy(col("p_partkey"))
    },

    Q("q27_date_funcs",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mth,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INTEGER) AS days_to_2002,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders
        |WHERE o_orderkey < 2000
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).filter(col("o_orderkey") < 2000).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mth"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).as("days_to_2002"),
        date_add(col("o_orderdate"), 30).as("plus30"),
        // o_orderdate is TIMESTAMP_NTZ; route through the session (UTC)
        // timestamp type to get epoch seconds.
        col("o_orderdate").cast("timestamp").cast("long").as("epoch_s"))
        .orderBy(col("o_orderkey"))
    },

    Q("q28_math_funcs",
      """SELECT l_orderkey, l_linenumber,
        |  round(abs(l_discount - 0.05), 2) AS abs_disc,
        |  pow(l_quantity, 2) AS qty_sq,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  round(ln(l_extendedprice), 6) AS price_ln,
        |  CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
        |  greatest(l_discount, l_tax) AS max_rate,
        |  least(l_discount, l_tax) AS min_rate
        |FROM lineitem
        |WHERE l_orderkey < 500
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).filter(col("l_orderkey") < 500).select(
        col("l_orderkey"), col("l_linenumber"),
        round(abs(col("l_discount") - 0.05), 2).as("abs_disc"),
        pow(col("l_quantity"), 2).as("qty_sq"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        round(log(col("l_extendedprice")), 6).as("price_ln"),
        (col("l_quantity").cast("long") % 7).as("qty_mod7"),
        greatest(col("l_discount"), col("l_tax")).as("max_rate"),
        least(col("l_discount"), col("l_tax")).as("min_rate"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    Q("q29_conditional",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice >= 300000 THEN 'large'
        |       WHEN o_totalprice >= 100000 THEN 'medium'
        |       ELSE 'small' END AS bucket,
        |  coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
        |  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS is_urgent
        |FROM orders
        |WHERE o_orderkey < 3000
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).filter(col("o_orderkey") < 3000).select(
        col("o_orderkey"),
        when(col("o_totalprice") >= 300000, "large")
          .when(col("o_totalprice") >= 100000, "medium")
          .otherwise("small").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("PENDING")).as("status_norm"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0).as("is_urgent"))
        .orderBy(col("o_orderkey"))
    },

    // LIKE / null-test predicate surface (the remaining §2B predicate
    // forms; IN and BETWEEN are exercised in q28/q29).
    Q("q26b_like_null_preds",
      """SELECT p_partkey, p_name,
        |  CASE WHEN p_name LIKE '%widget%' THEN 1 ELSE 0 END AS is_widget,
        |  CASE WHEN p_name LIKE 'sm_ll%' THEN 1 ELSE 0 END AS is_small,
        |  CASE WHEN nullif(p_brand, 'Brand#1') IS NULL THEN 1 ELSE 0 END AS brand1_nulled
        |FROM part
        |WHERE p_name LIKE '%e%' AND p_name NOT LIKE 'zzz%'
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_name").like("%e%") && !col("p_name").like("zzz%"))
        .select(col("p_partkey"), col("p_name"),
          when(col("p_name").like("%widget%"), 1).otherwise(0).as("is_widget"),
          when(col("p_name").like("sm_ll%"), 1).otherwise(0).as("is_small"),
          when(nullif(col("p_brand"), lit("Brand#1")).isNull, 1).otherwise(0)
            .as("brand1_nulled"))
        .orderBy(col("p_partkey"))
    },

    // JSON surface over events.props ('{"k": N}'): path extraction +
    // typed cast; from_json exercised on the Spark side (same value as
    // the path extraction, so the oracle covers it).
    Q("q30_json_funcs",
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        |  CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing
        |FROM events
        |WHERE event_id < 2000
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d).filter(col("event_id") < 2000).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType))))
          .getField("k").as("k_int"),
        get_json_object(col("props"), "$.missing").as("missing"))
        .orderBy(col("event_id"))
    },

    // Array / higher-order functions over ArrayType(FloatType): element
    // access, slice, sequential double-precision fold (deterministic
    // summation order on both engines), transform + filter.
    Q("q31_array_funcs",
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_elem,
        |  CAST(embedding[64] AS DOUBLE) AS last_elem,
        |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE), CAST(embedding AS DOUBLE[])), (acc, x) -> acc + x), 4) AS vec_sum,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_elem"),
        element_at(col("embedding"), 64).cast("double").as("last_elem"),
        round(expr(
          "aggregate(embedding, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))"), 4)
          .as("vec_sum"),
        expr("size(filter(embedding, x -> x > 0))").as("n_pos"))
        .orderBy(col("vec_id"))
    },

    // to_json: serialize a struct of long/string fields (float JSON
    // formatting differs across engines, so the oracle recomputes the
    // exact string; field order follows the struct declaration).
    Q("q30b_to_json",
      """SELECT event_id,
        |  '{"id":' || CAST(event_id AS VARCHAR) || ',"type":"' || event_type || '"}' AS j
        |FROM events
        |WHERE event_id < 1000
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d).filter(col("event_id") < 1000)
        .select(col("event_id"),
          to_json(struct(col("event_id").as("id"), col("event_type").as("type"))).as("j"))
        .orderBy(col("event_id"))
    },

    // explode/unnest: word frequencies over documents (top 50).
    Q("q32_explode_wordcount",
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |GROUP BY word
        |ORDER BY n DESC, word
        |LIMIT 50""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(50)
    }
  )
}

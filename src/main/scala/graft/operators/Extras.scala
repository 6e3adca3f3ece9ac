package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Remaining §2B surface: UDF/UDAF escape hatches, exact percentiles,
  * regex ("BPE-ish") token counting, and CSV/JSON sink round-trips.
  */
object Extras {

  val qs: Seq[Q] = Seq(

    // Scala UDF (the documented last-resort escape hatch; everything
    // else in the engine is built-in/codegen'd). Value parity with a
    // pure-SQL DuckDB formulation proves the semantics.
    Q("q55_udf_vowels",
      """SELECT p_partkey,
        |  CAST(length(lower(p_name))
        |    - length(regexp_replace(lower(p_name), '[aeiou]', '', 'g')) AS INTEGER) AS n_vowels
        |FROM part
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      val vowels = udf((str: String) => str.toLowerCase.count("aeiou".contains(_)))
      Tables.part(s, d)
        .select(col("p_partkey"), vowels(col("p_name")).as("n_vowels"))
        .orderBy(col("p_partkey"))
    },

    // Typed Aggregator UDAF (partial-aggregatable geometric mean).
    Q("q56_udaf_geomean",
      """SELECT l_returnflag,
        |  round(exp(avg(ln(l_extendedprice))), 2) AS geo_mean,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val gm = udaf(graft.functions.GeoMean)
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(gm(col("l_extendedprice")), 2).as("geo_mean"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // Exact interpolated percentiles (both engines: sort + linear
    // interpolation at rank p*(n-1)).
    Q("q57_percentile",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 2) AS p90,
        |  round(quantile_cont(l_extendedprice, 0.99), 2) AS p99
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_extendedprice, 0.5)"), 2).as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 2).as("p90"),
          round(expr("percentile(l_extendedprice, 0.99)"), 2).as("p99"))
        .orderBy(col("l_returnflag"))
    },

    // "BPE-ish" regex token counting (letter runs, digit runs, single
    // punctuation marks — the common pre-tokenizer shape), kept in the
    // regex subset Java and RE2 treat identically.
    Q("q58_token_count",
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_number_tokens,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
            .as("n_tokens"),
          size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))).as("n_number_tokens"),
          size(split(col("text"), " ")).as("n_ws_tokens"))
        .orderBy(col("doc_id"))
    },

    // CSV sink + source round-trip (integer/string columns only — CSV
    // is not a lossless float container). The oracle reads the original
    // table: the round-trip must be value-identical.
    Q("q59_csv_roundtrip",
      """SELECT o_orderkey, o_orderstatus, o_orderpriority
        |FROM orders
        |WHERE o_orderkey < 5000
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
      Tables.orders(s, d).filter(col("o_orderkey") < 5000)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
      s.read.option("header", "true")
        .schema("o_orderkey LONG, o_orderstatus STRING, o_orderpriority STRING")
        .csv(s"$tmp/csv")
        .orderBy(col("o_orderkey"))
    },

    // JSON sink + source round-trip (longs/strings exact in JSON).
    Q("q60_json_roundtrip",
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE c_custkey < 500
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_json").toString
      Tables.customer(s, d).filter(col("c_custkey") < 500)
        .select("c_custkey", "c_name", "c_mktsegment")
        .write.mode("overwrite").json(s"$tmp/json")
      s.read.schema("c_custkey LONG, c_name STRING, c_mktsegment STRING")
        .json(s"$tmp/json")
        .orderBy(col("c_custkey"))
    }
  )
}

package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Oracle-checked queries for the reference's own ETL surface (SURVEY
  * §2A): identity extraction, MIN/MAX planning, the 10 000-key stride
  * plan, and the deterministic seed generator.
  */
object EtlOps {

  val qs: Seq[Q] = Seq(
    // A2/A6 identity extraction: full scan, identity projection, stable
    // total order — the hash covers every row and column end-to-end.
    Q("q33_etl_fullscan",
      """SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber""") { (s, d) =>
      Tables.lineitem(s, d).orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // A4 MIN/MAX planning aggregate (pushed into the source by Catalyst
    // on JDBC; a 2-column footer-only read on parquet).
    Q("q34_etl_minmax",
      """SELECT min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  count(*) AS n_rows
        |FROM orders""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .agg(min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"),
          count(lit(1)).as("n_rows"))
    },

    // A5 stride plan as data: half-open [start,end) slices of 10 000
    // keys over [min,max], final end = max+1 (extractor.go:270-287).
    Q("q35_etl_strideplan",
      """WITH b AS (SELECT min(o_orderkey) AS mn, max(o_orderkey) AS mx FROM orders),
        |     e AS (SELECT mn, mx,
        |             unnest(range(0, CAST(ceil((mx - mn + 1) / 10000.0) AS BIGINT))) AS i
        |           FROM b)
        |SELECT CAST(i AS INTEGER) AS slice_id,
        |  mn + i * 10000 AS start_key,
        |  CASE WHEN mn + (i + 1) * 10000 > mx THEN mx + 1
        |       ELSE mn + (i + 1) * 10000 END AS end_key
        |FROM e
        |ORDER BY slice_id""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .agg(min(col("o_orderkey")).as("mn"), max(col("o_orderkey")).as("mx"))
        .select(col("mn"), col("mx"),
          explode(expr("sequence(0, CAST(ceil((mx - mn + 1) / 10000.0) AS BIGINT) - 1)")).as("i"))
        .select(col("i").cast("int").as("slice_id"),
          (col("mn") + col("i") * 10000).as("start_key"),
          when(col("mn") + (col("i") + 1) * 10000 > col("mx"), col("mx") + 1)
            .otherwise(col("mn") + (col("i") + 1) * 10000).as("end_key"))
        .orderBy(col("slice_id"))
    },

    // A14 seed-generator parity: deterministic replacement for the
    // reference's 20-char random payloads (tmp/data_seed.go:36-71) —
    // sha256 of the key, both engines produce identical lowercase hex.
    Q("q36_etl_seedgen",
      """SELECT i AS id, substr(sha256(CAST(i AS VARCHAR)), 1, 20) AS data
        |FROM generate_series(1, 1000) t(i)
        |ORDER BY id""".stripMargin) { (s, _) =>
      s.range(1, 1001).select(col("id"),
        substring(sha2(col("id").cast("string"), 256), 1, 20).as("data"))
        .orderBy(col("id"))
    }
  )
}

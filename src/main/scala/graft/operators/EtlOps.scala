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

    // CDC upsert merge (merge-on-read compaction): base snapshot +
    // derived change batch (updates for o_orderkey % 7 = 0, inserts as
    // fresh negative keys -k-1 for % 13 = 0 — the -1 keeps key 0's
    // insert off its own base row, so every (key, ver) pair is unique
    // and the winner is deterministic), latest version per key wins via
    // one row_number window keyed on the merge key. This is the ETL
    // step the reference's batch pipe feeds into: at 100 TB the union
    // shuffles once on the key (the same partitioning the compacted
    // table is written back in via partitionBy/bucketBy, so successive
    // merges reuse it), the window is per-key top-1 — planned as
    // WindowGroupLimit, never a global sort. Money is exact integer
    // cents; versions are distinct per key, so the winner is
    // deterministic.
    Q("q83_cdc_merge",
      """WITH base AS (
        |  SELECT o_orderkey AS key, o_orderstatus AS status,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c, 0 AS ver
        |  FROM orders
        |), upd AS (
        |  SELECT o_orderkey AS key, 'U' AS status,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) + 500 AS price_c, 1 AS ver
        |  FROM orders WHERE o_orderkey % 7 = 0
        |), ins AS (
        |  SELECT -o_orderkey - 1 AS key, 'N' AS status,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c, 1 AS ver
        |  FROM orders WHERE o_orderkey % 13 = 0
        |), merged AS (
        |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY ver DESC) AS rn
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM upd
        |        UNION ALL SELECT * FROM ins) u
        |)
        |SELECT key, status, price_c, CAST(ver AS INTEGER) AS ver
        |FROM merged WHERE rn = 1
        |ORDER BY key""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * 100).as("price_c"))
      val base = o.select(col("o_orderkey").as("key"),
        col("o_orderstatus").as("status"), col("price_c"), lit(0).as("ver"))
      val upd = o.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").as("key"), lit("U").as("status"),
          (col("price_c") + 500).as("price_c"), lit(1).as("ver"))
      val ins = o.filter(col("o_orderkey") % 13 === 0)
        .select((-col("o_orderkey") - 1).as("key"), lit("N").as("status"),
          col("price_c"), lit(1).as("ver"))
      val w = Window.partitionBy(col("key")).orderBy(col("ver").desc)
      base.unionAll(upd).unionAll(ins)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("key"), col("status"), col("price_c"), col("ver").cast("int").as("ver"))
        .orderBy(col("key"))
    },

    // Merge-on-read with DELETE tombstones — the third leg of MERGE
    // semantics (q83 covers insert/update): a delete batch at a higher
    // version wins its key via the same per-key top-1 WindowGroupLimit,
    // then tombstone winners drop out in a final filter. Keys divisible
    // by 7 AND 11 prove precedence: the ver-2 delete beats the ver-1
    // update. Same single shuffle on the merge key as q83 — deletes add
    // a filter, not a join.
    Q("q129_cdc_delete",
      """WITH base AS (
        |  SELECT o_orderkey AS key, 'B' AS op,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c, 0 AS ver
        |  FROM orders
        |), upd AS (
        |  SELECT o_orderkey AS key, 'U' AS op,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) + 500 AS price_c, 1 AS ver
        |  FROM orders WHERE o_orderkey % 7 = 0
        |), del AS (
        |  SELECT o_orderkey AS key, 'D' AS op, CAST(0 AS BIGINT) AS price_c, 2 AS ver
        |  FROM orders WHERE o_orderkey % 11 = 0
        |), merged AS (
        |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY ver DESC) AS rn
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM upd
        |        UNION ALL SELECT * FROM del) u
        |)
        |SELECT key, op, price_c, CAST(ver AS INTEGER) AS ver
        |FROM merged WHERE rn = 1 AND op <> 'D'
        |ORDER BY key""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), floor(col("o_totalprice") * 100).as("price_c"))
      val base = o.select(col("o_orderkey").as("key"), lit("B").as("op"),
        col("price_c"), lit(0).as("ver"))
      val upd = o.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").as("key"), lit("U").as("op"),
          (col("price_c") + 500).as("price_c"), lit(1).as("ver"))
      val del = o.filter(col("o_orderkey") % 11 === 0)
        .select(col("o_orderkey").as("key"), lit("D").as("op"),
          lit(0L).as("price_c"), lit(2).as("ver"))
      val w = Window.partitionBy(col("key")).orderBy(col("ver").desc)
      base.unionAll(upd).unionAll(del)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") =!= "D")
        .select(col("key"), col("op"), col("price_c"), col("ver").cast("int").as("ver"))
        .orderBy(col("key"))
    },

    // Snapshot reconciliation (data diff) — the READ side of MERGE:
    // given two snapshots of a keyed table, classify every key as
    // added / removed / changed / unchanged. The "previous" snapshot is
    // a deterministic mutation of orders (keys ≡0 mod 97 absent → they
    // surface as added; ≡0 mod 101 price-shifted → changed; phantom
    // keys +10⁹ for ≡0 mod 89 → removed). One full-outer hash join on
    // the key with a column-level compare — at warehouse scale the
    // compare side is a fingerprint (xxhash64 of the packed row), the
    // join is the same single shuffle; no sort, no window.
    Q("q140_snapshot_diff",
      """WITH cur AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents, o_orderstatus AS st
        |  FROM orders),
        |prev AS (
        |  SELECT k, cents + CASE WHEN k % 101 = 0 THEN 1 ELSE 0 END AS cents, st
        |  FROM cur WHERE k % 97 <> 0
        |  UNION ALL
        |  SELECT k + 1000000000, cents, st FROM cur WHERE k % 89 = 0
        |),
        |j AS (SELECT CASE WHEN p.k IS NULL THEN 'added'
        |        WHEN c.k IS NULL THEN 'removed'
        |        WHEN c.cents IS DISTINCT FROM p.cents
        |          OR c.st IS DISTINCT FROM p.st THEN 'changed'
        |        ELSE 'unchanged' END AS status
        |      FROM cur c FULL OUTER JOIN prev p ON c.k = p.k)
        |SELECT status, CAST(count(*) AS BIGINT) AS n_rows
        |FROM j GROUP BY status ORDER BY status""".stripMargin) { (s, d) =>
      val cur = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"),
          col("o_orderstatus").as("st"))
      val prev = cur.filter(col("k") % 97 =!= 0)
        .select(col("k"),
          (col("cents") + when(col("k") % 101 === 0, 1L).otherwise(0L)).as("cents"),
          col("st"))
        .unionAll(cur.filter(col("k") % 89 === 0)
          .select((col("k") + 1000000000L).as("k"), col("cents"), col("st")))
      val p = prev.select(col("k").as("pk"), col("cents").as("pcents"),
        col("st").as("pst"))
      cur.join(p, cur("k") === p("pk"), "full_outer")
        .select(when(col("pk").isNull, "added")
          .when(col("k").isNull, "removed")
          .when(!(col("cents") <=> col("pcents")) || !(col("st") <=> col("pst")),
            "changed")
          .otherwise("unchanged").as("status"))
        .groupBy("status").agg(count(lit(1)).as("n_rows"))
        .orderBy("status")
    },

    // SCD Type-2 dimension build: q83's version stream materialized as
    // HISTORY instead of latest-wins — one row per (key, version) with
    // [eff_from, eff_to) validity and a current flag. eff_to is simply
    // lead(eff_from) over the per-key version order: one shuffle on
    // key, bounded state (the window frame is a single row lookahead),
    // no per-key history buffering. The merge-on-read pattern's other
    // half: q83 answers "what is", q99 answers "what was when".
    Q("q99_scd2",
      """WITH base AS (
        |  SELECT o_orderkey AS key, o_orderstatus AS status,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c, 0 AS ver,
        |    o_orderdate AS eff_from
        |  FROM orders
        |), upd AS (
        |  SELECT o_orderkey AS key, 'U' AS status,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) + 500 AS price_c, 1 AS ver,
        |    CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS eff_from
        |  FROM orders WHERE o_orderkey % 7 = 0
        |)
        |SELECT key, CAST(ver AS INTEGER) AS ver, status, price_c, eff_from,
        |  lead(eff_from) OVER (PARTITION BY key ORDER BY ver) AS eff_to,
        |  (lead(eff_from) OVER (PARTITION BY key ORDER BY ver) IS NULL) AS is_current
        |FROM (SELECT * FROM base UNION ALL SELECT * FROM upd) u
        |ORDER BY key, ver""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * 100).as("price_c"), col("o_orderdate"))
      val base = o.select(col("o_orderkey").as("key"),
        col("o_orderstatus").as("status"), col("price_c"), lit(0).as("ver"),
        col("o_orderdate").as("eff_from"))
      val upd = o.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").as("key"), lit("U").as("status"),
          (col("price_c") + 500).as("price_c"), lit(1).as("ver"),
          date_add(col("o_orderdate"), 30).as("eff_from"))
      val w = Window.partitionBy(col("key")).orderBy(col("ver"))
      base.unionAll(upd)
        .withColumn("eff_to", lead(col("eff_from"), 1).over(w))
        .select(col("key"), col("ver").cast("int").as("ver"), col("status"),
          col("price_c"), col("eff_from"), col("eff_to"),
          col("eff_to").isNull.as("is_current"))
        .orderBy(col("key"), col("ver"))
    },

    // Point-in-time (temporal) join: each lineitem is joined to the
    // q99-style SCD2 order history version valid AT its ship date.
    // Because the dimension shares the fact's equi-key, the scalable
    // plan is a plain equi-join on the key followed by the interval
    // containment filter — each fact row meets only its key's few
    // versions, so the join output is O(|fact|·versions-per-key), never
    // a range cross product. This completes the temporal-join trio:
    // q68 (as-of, no equi-key, union trick), q96 (band join, bucketed),
    // q120 (equi-key + validity interval — the warehouse PIT join).
    Q("q120_pit_join",
      """WITH base AS (
        |  SELECT o_orderkey AS key, o_orderstatus AS status,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c, 0 AS ver,
        |    CAST(o_orderdate AS DATE) AS eff_from
        |  FROM orders
        |), upd AS (
        |  SELECT o_orderkey AS key, 'U' AS status,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) + 500 AS price_c, 1 AS ver,
        |    CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS eff_from
        |  FROM orders WHERE o_orderkey % 7 = 0
        |), hist AS (
        |  SELECT key, CAST(ver AS INTEGER) AS ver, status, price_c, eff_from,
        |    lead(eff_from) OVER (PARTITION BY key ORDER BY ver) AS eff_to
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM upd) u
        |), f AS (
        |  SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship
        |  FROM lineitem
        |)
        |SELECT f.l_orderkey, f.l_linenumber, f.ship, h.ver, h.status, h.price_c
        |FROM f JOIN hist h ON f.l_orderkey = h.key
        |WHERE f.ship >= h.eff_from AND (h.eff_to IS NULL OR f.ship < h.eff_to)
        |ORDER BY l_orderkey, l_linenumber, ship, ver""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * 100).as("price_c"),
          col("o_orderdate").cast("date").as("od"))
      val base = o.select(col("o_orderkey").as("key"),
        col("o_orderstatus").as("status"), col("price_c"), lit(0).as("ver"),
        col("od").as("eff_from"))
      val upd = o.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").as("key"), lit("U").as("status"),
          (col("price_c") + 500).as("price_c"), lit(1).as("ver"),
          date_add(col("od"), 30).as("eff_from"))
      val w = Window.partitionBy(col("key")).orderBy(col("ver"))
      val hist = base.unionAll(upd)
        .withColumn("eff_to", lead(col("eff_from"), 1).over(w))
        .withColumn("ver", col("ver").cast("int"))
      val f = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate").cast("date").as("ship"))
      f.join(hist, f("l_orderkey") === hist("key"))
        .filter(col("ship") >= col("eff_from") &&
          (col("eff_to").isNull || col("ship") < col("eff_to")))
        .select(col("l_orderkey"), col("l_linenumber"), col("ship"),
          col("ver"), col("status"), col("price_c"))
        // (l_orderkey, l_linenumber) repeats in the fixture — ship+ver
        // make the dump order total, which the hash compare needs.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("ship"), col("ver"))
    },

    // Incremental aggregate maintenance (materialized-view refresh):
    // the running aggregate is kept as MERGEABLE partials (count, sum) —
    // a delta batch is aggregated alone and MERGED into the base
    // partials by re-aggregation, never by rescanning the base fact
    // table. count/sum/min/max are algebraic, so partial ∪ partial →
    // re-agg equals the direct aggregate over base+delta (which is
    // exactly what the oracle computes). At 100 TB the base partials
    // are a tiny stored table (one row per group) and each refresh
    // touches only the delta — the incremental-ETL contract.
    Q("q88_incremental_agg",
      """SELECT o_orderpriority AS pri,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
        |FROM orders
        |GROUP BY pri
        |ORDER BY pri""".stripMargin) { (s, d) =>
      val f = Tables.orders(s, d).select(col("o_orderkey").as("key"),
        col("o_orderpriority").as("pri"),
        floor(col("o_totalprice") * 100).as("cents"))
      def partials(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("pri")).agg(count(lit(1)).as("n"), sum(col("cents")).as("t"))
      val basePartials = partials(f.filter(col("key") % 10 =!= 9))
      val deltaPartials = partials(f.filter(col("key") % 10 === 9))
      basePartials.unionAll(deltaPartials)
        .groupBy(col("pri"))
        .agg(sum(col("n")).as("n_orders"), sum(col("t")).as("total_c"))
        .orderBy(col("pri"))
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

package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum — the scalable replacement for a running
  * total windowed over a whole group (which drags every group into ONE
  * window partition): rows carry a `bucket` column whose order agrees
  * with the intended sort order (a range bucket, a hash prefix, …);
  * the cumulative sum runs within (part, bucket) partitions, and each
  * bucket adds the total of all preceding buckets from a broadcast
  * side table (one aggregated row per (part, bucket) — tiny by
  * construction). Exactly equal to the naive single window as long as
  * ordering by (bucket, order...) equals ordering by (order...), i.e.
  * the bucket is a monotone function of the sort key.
  */
object PrefixScan {

  /** Adds `out` = running sum of `value` over rows ordered by
    * (`bucket`, `order`...) within each `part` group. `value` must be
    * a LongType column (the offsets default to 0L).
    *
    * `totals` (r18): optionally also attach per-`part` GRAND totals —
    * each (inCol, outName) entry adds outName = sum(inCol) over the
    * whole part. They ride the offsets side table (one whole-partition
    * window over the buckets-sized frame) and the already-present
    * broadcast join, so consumers that need n = sum(value) per part —
    * every rank-target percentile/median pass — skip their separate
    * aggregate + broadcast join of the same number. */
  def cumsum(df: DataFrame, part: Seq[String], bucket: String,
      order: Seq[String], value: String, out: String,
      totals: Seq[(String, String)] = Nil): DataFrame = {
    val pb = part :+ bucket
    val offWin = Window.partitionBy(part.map(col): _*).orderBy(col(bucket))
      .rowsBetween(Window.unboundedPreceding, -1)
    // single-partition window only when `part` is empty — and then BY
    // CONSTRUCTION over the buckets-sized aggregate, never the fact
    val totWin = Window.partitionBy(part.map(col): _*)
    val offsets0 = df.groupBy(pb.map(col): _*)
      .agg(sum(col(value)).as("__bc"),
        totals.map { case (in, _) => sum(col(in)).as("__t_" + in) }: _*)
      .withColumn("__off", coalesce(sum(col("__bc")).over(offWin), lit(0L)))
    val offsets = totals
      .foldLeft(offsets0) { case (f, (in, outName)) =>
        f.withColumn(outName, sum(col("__t_" + in)).over(totWin))
      }
      .select(pb.map(col) ++ (col("__off") +: totals.map(t => col(t._2))): _*)
    val localWin = Window.partitionBy(pb.map(col): _*)
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("__lc", sum(col(value)).over(localWin))
      .join(broadcast(offsets), pb)
      .withColumn(out, col("__lc") + col("__off"))
      .drop("__lc", "__off")
  }

  /** Adds `out` = row_number() over rows ordered ASCENDING by `order`,
    * without the global single-partition window Spark plans for an
    * unpartitioned ranking: range-partition by the sort key (so the
    * shuffle partition index is a monotone bucket of the key), stamp
    * `spark_partition_id()` as that bucket, and run the two-level
    * cumsum-of-1. Each task ranks ~1/numParts of the rows; the only
    * global window left is over the numParts-row offsets table. The two
    * consumers of the range exchange (offsets + main) share one
    * ReusedExchange, so the nondeterministic partition-id projection is
    * evaluated once per row. PRECONDITION: `order` is unique per row
    * (ties may split across range boundaries, making their relative
    * numbering partitioner-dependent) — under that precondition
    * row_number == rank == dense_rank. For a descending key, pass a
    * negated column. */
  def rowNumber(df: DataFrame, order: Seq[String], out: String,
      numParts: Int = 0): DataFrame = {
    val n = if (numParts > 0) numParts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, order.map(col): _*)
      .withColumn("__pid", spark_partition_id().cast("long"))
      .withColumn("__one", lit(1L))
    cumsum(ranged, Seq.empty, "__pid", order, "__one", out)
      .drop("__pid", "__one")
  }

  /** Adds `out` = EXCLUSIVE running max of `value` over rows ordered by
    * (`bucket`, `order`...) DESCENDING within each `part` group — i.e.
    * the max of `value` among all strictly-preceding rows in descending
    * order (the skyline sweep primitive). Same two-level shape as
    * cumsum: per-(part, bucket) local window + broadcast bucket maxima,
    * so no group ever collapses into one window partition. Rows with no
    * predecessor get Long.MinValue. `bucket` must be a monotone
    * function of the sort key (both walked descending). PRECONDITION:
    * (`part`, `order`...) must be unique per row — on ties the
    * exclusive frame's row order is ambiguous and `out` becomes
    * tie-order-dependent (callers like paretoFrontier pre-aggregate to
    * unique keys for exactly this reason). */
  def suffixMaxExcl(df: DataFrame, part: Seq[String], bucket: String,
      order: Seq[String], value: String, out: String): DataFrame = {
    val floor = Long.MinValue
    val pb = part :+ bucket
    val offWin = Window.partitionBy(part.map(col): _*).orderBy(col(bucket).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = df.groupBy(pb.map(col): _*)
      .agg(max(col(value)).as("__bm"))
      .withColumn("__om", coalesce(max(col("__bm")).over(offWin), lit(floor)))
      .select(pb.map(col) :+ col("__om"): _*)
    val localWin = Window.partitionBy(pb.map(col): _*)
      .orderBy(order.map(c => col(c).desc): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__lm", coalesce(max(col(value)).over(localWin), lit(floor)))
      .join(broadcast(offsets), pb)
      .withColumn(out, greatest(col("__lm"), col("__om")))
      .drop("__lm", "__om")
  }
}

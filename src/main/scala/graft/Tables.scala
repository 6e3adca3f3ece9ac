package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (see TESTDATA.md): one parquet file per table
  * under a scale-factor directory such as /root/testdata/sf0.01.
  *
  * All scans go through here so scale-oriented read options stay in one
  * place. Parquet scans get column pruning + predicate pushdown from
  * Catalyst for free; at 100 TB the same call reads a partitioned
  * directory tree and prunes partitions — no code change needed.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS): Spark reads it as long
    * (spark.sql.legacy.parquet.nanosAsLong, set in GraftSession) and we
    * convert to a microsecond timestamp here with exact integer division
    * (the fixture has no sub-microsecond values, so this is lossless). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = load(s, d, "events")
    // NTZ keeps parquet output isAdjustedToUTC=false, matching the
    // fixture's own timestamp columns and DuckDB's naive TIMESTAMP.
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

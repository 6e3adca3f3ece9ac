package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every declared operator query (SURVEY §2 inventory) from
  * the per-area registries in graft.operators.
  */
object SparkEntry {

  val registry: Seq[Q] =
    operators.Relational.qs ++
      operators.Windows.qs ++
      operators.Scalars.qs ++
      operators.EtlOps.qs ++
      operators.EventsOps.qs ++
      operators.LlmOps.qs ++
      operators.Multimodal.qs ++
      operators.Extras.qs ++
      operators.IvfAnn.qs ++
      operators.TrainingOps.qs ++
      operators.CurationOps.qs ++
      operators.GraphOps.qs ++
      operators.AnalyticsOps.qs ++
      operators.WarehouseOps.qs ++
      operators.MiningOps.qs ++
      operators.AuditOps.qs ++
      operators.ScienceOps.qs ++
      operators.CorpusOps.qs ++
      operators.PipelineOps.qs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose hashes are
    * Spark-native (xxhash64 MinHash, seeded LSH, HLL sketches) — those
    * get rows-only checks plus ScalaTest verification. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

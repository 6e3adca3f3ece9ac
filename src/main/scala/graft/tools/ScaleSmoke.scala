package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress harness: synthesizes 10× (documents) / 5× (embeddings)
  * corpora with the fixture schemas into /tmp and times the operators
  * whose cost could grow super-linearly (candidate-pair dedup,
  * similarity search), printing 1× vs N× wall-clock so scaling exponents
  * are measured, not guessed. Results land in SCALE.md.
  *
  * Synthesis is fully expression-based (no driver-side data) and
  * deterministic (xxhash64-derived), so runs are comparable.
  */
object ScaleSmoke {

  private val vocab = Seq("key", "agg", "row", "scan", "slow", "fast", "table",
    "value", "part", "hash", "merge", "batch", "window", "spark", "order",
    "data", "column", "join", "small", "line", "customer", "query", "the",
    "a", "big", "stream", "filter", "sort", "dedup", "shard")

  def synthesize(spark: SparkSession, dir: String, nDocs: Long, nVecs: Long): Unit = {
    val vocabArr = array(vocab.map(lit): _*)
    spark.range(nDocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ", expr(
          s"""transform(sequence(1, 40 + CAST(pmod(xxhash64(id), 40) AS INT)),
             | i -> element_at(${"v"}, 1 + CAST(pmod(xxhash64(concat(CAST(id AS STRING), '_', CAST(i AS STRING))), ${vocab.size}) AS INT)))""".stripMargin
            .replace("v", s"array(${vocab.map(w => s"'$w'").mkString(",")})"))).as("text"),
        element_at(array(lit("en"), lit("de"), lit("es"), lit("fr"), lit("zh")),
          (pmod(xxhash64(col("id") + 7), lit(5)) + 1).cast("int")).as("lang"),
        concat(lit("src"), pmod(col("id"), lit(20))).as("source"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    spark.range(nVecs)
      .select(col("id").as("vec_id"),
        expr(
          """transform(sequence(1, 64),
            | i -> CAST(CAST(pmod(xxhash64(concat(CAST(id AS STRING), '#', CAST(i AS STRING))), 2000) AS DOUBLE) / 1000.0 - 1.0 AS FLOAT))""".stripMargin)
          .as("embedding"),
        pmod(col("id"), lit(3)).cast("int").as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  /** Zipfian-skew documents corpus: word ranks are log-uniform over a
    * 1000-word vocabulary (frequency ∝ 1/rank — Zipf(1)), so a handful
    * of hot shingles dominate co-occurrence. This is the regime real
    * text lives in and where the count join degrades quadratically while
    * PPJoin's prefix filter drops the hot shingles from candidate
    * generation. */
  def synthesizeZipf(spark: SparkSession, dir: String, nDocs: Long): Unit = {
    spark.range(nDocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ", expr(
          """transform(sequence(1, 40 + CAST(pmod(xxhash64(id), 40) AS INT)),
            | i -> concat('w', CAST(pow(50.0,
            |   CAST(pmod(xxhash64(concat(CAST(id AS STRING), '~', CAST(i AS STRING))), 100000) AS DOUBLE) / 100000.0)
            |   AS INT)))""".stripMargin)).as("text"),
        element_at(array(lit("en"), lit("de"), lit("es"), lit("fr"), lit("zh")),
          (pmod(xxhash64(col("id") + 7), lit(5)) + 1).cast("int")).as("lang"),
        concat(lit("src"), pmod(col("id"), lit(20))).as("source"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val base = "/root/testdata/sf0.1"
    val big = "/tmp/graft_scale"
    synthesize(spark, big, nDocs = 50000L, nVecs = 10000L)

    val ops = Seq("q41_dedup_exact_groups", "q43_ngram_jaccard", "q44_minhash_lsh",
      "q45_simhash", "q46_text_quality", "q48_fingerprint",
      "q49_cosine_topk", "q50_embedding_neardup", "q51_ann_lsh")

    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    println(f"${"op"}%-26s ${"1x(sf0.1)"}%10s ${"10x-docs/5x-vecs"}%16s ${"ratio"}%7s")
    ops.foreach { name =>
      run(name, base) // warm: whole-stage codegen compiles once, untimed
      val t1 = run(name, base)
      val t2 = run(name, big)
      println(f"SCALE $name%-26s $t1%10.2f $t2%16.2f ${t2 / t1}%7.1f")
    }

    // Skew shoot-out: count join vs PPJoin prefix filter on uniform
    // (sf0.1-shaped) vs Zipfian shingle frequencies. Same oracle
    // semantics; the winner flips with the corpus.
    val zipf = "/tmp/graft_zipf"
    synthesizeZipf(spark, zipf, nDocs = 30000L)
    Seq("q43_ngram_jaccard", "q43b_jaccard_prefix").foreach { name =>
      run(name, zipf) // warm
      val tu = run(name, base)
      val tz = run(name, zipf)
      println(f"SKEW $name%-26s uniform(sf0.1) $tu%7.2f zipf(20k docs) $tz%7.2f")
    }
    spark.stop()
  }
}

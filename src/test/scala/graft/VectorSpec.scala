package graft

import graft.functions.VectorFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Vector math + ANN verification: exact cosine values on known
  * vectors, and planted-neighbor recall for the LSH-bucketed ANN
  * (which has no DuckDB oracle). */
class VectorSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("cosine of known vectors") {
    val df = Seq(
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f), 0.0),   // orthogonal
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f), 1.0),   // identical
      (Array(1f, 0f, 0f), Array(-1f, 0f, 0f), -1.0), // opposite
      (Array(1f, 1f, 0f), Array(1f, 0f, 0f), math.sqrt(0.5)),
      (Array(0f, 0f, 0f), Array(1f, 2f, 3f), 0.0)    // zero-norm guard
    ).toDF("a", "b", "want")
    val got = df.select(VectorFns.cosine(col("a"), col("b")).as("got"), col("want"))
      .as[(Double, Double)].collect()
    got.foreach { case (g, w) => assert(math.abs(g - w) < 1e-12, s"$g != $w") }
  }

  /** Planted embedding corpus: query vectors 0..9 random; vector 100+q
    * is an exact copy of query q (guaranteed same LSH bucket in every
    * table). 200 filler vectors random. */
  lazy val plantedDir: String = {
    val rnd = new scala.util.Random(99)
    def randVec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val queries = (0L until 10L).map(i => (i, randVec(), 0))
    val copies = queries.map { case (i, v, _) => (100L + i, v.clone(), 1) }
    val filler = (200L until 400L).map(i => (i, randVec(), 2))
    val dir = java.nio.file.Files.createTempDirectory("graft_emb").toString
    (queries ++ copies ++ filler).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("brute-force cosine top-k ranks the exact copy first") {
    val topk = SparkEntry.queries("q49_cosine_topk")(spark, plantedDir)
      .as[(Long, Int, Long)].collect()
    (0L until 10L).foreach { q =>
      val rank1 = topk.find(r => r._1 == q && r._2 == 1).get._3
      assert(rank1 == 100L + q, s"query $q: rank-1 neighbor $rank1, want ${100 + q}")
    }
  }

  test("LSH ANN finds the planted exact copies (recall@1 = 1.0)") {
    val ann = SparkEntry.queries("q51_ann_lsh")(spark, plantedDir)
      .as[(Long, Int, Long)].collect()
    (0L until 10L).foreach { q =>
      val rank1 = ann.find(r => r._1 == q && r._2 == 1)
      assert(rank1.isDefined && rank1.get._3 == 100L + q,
        s"query $q: LSH rank-1 = $rank1, want ${100 + q}")
    }
  }

  test("LSH candidate set is a subset of the corpus and deterministic") {
    val r1 = SparkEntry.queries("q51_ann_lsh")(spark, plantedDir).collect().toSeq
    val r2 = SparkEntry.queries("q51_ann_lsh")(spark, plantedDir).collect().toSeq
    assert(r1 == r2)
  }

  test("IVF ANN finds the planted exact copies (recall@1 = 1.0)") {
    val ivf = SparkEntry.queries("q67_ann_ivf")(spark, plantedDir)
      .as[(Long, Int, Long)].collect()
    (0L until 10L).foreach { q =>
      val rank1 = ivf.find(r => r._1 == q && r._2 == 1)
      assert(rank1.isDefined && rank1.get._3 == 100L + q,
        s"query $q: IVF rank-1 = $rank1, want ${100 + q}")
    }
  }

  test("IVF ANN is deterministic across runs") {
    val r1 = SparkEntry.queries("q67_ann_ivf")(spark, plantedDir).collect().toSeq
    val r2 = SparkEntry.queries("q67_ann_ivf")(spark, plantedDir).collect().toSeq
    assert(r1 == r2)
  }

  test("IVF clustered layout: probes prune to the probed cells only") {
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val corpus = Tables.embeddings(spark, plantedDir)
      .withColumn("emb", org.apache.spark.sql.functions.transform(
        col("embedding"), x => x.cast("double")))
      .withColumn("nrm", sqrt(GraftFunctions.dot(col("emb"), col("emb"))))
      .drop("embedding")
    val (assigned, _) = graft.operators.IvfAnn.buildIndex(corpus)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/idx"
    graft.operators.IvfAnn.writeClustered(corpus, assigned, path)

    val probe = spark.read.parquet(path).filter(col("cell").isin(0, 1))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"probe read is not partition-pruned:\n${plan.take(1200)}")
    val total = spark.read.parquet(path).count()
    assert(probe.count() < total)
  }

  test("approx_count_distinct within rsd of exact on events fixture") {
    val d = "/root/testdata/sf0.001"
    val approx = SparkEntry.queries("q54_approx_distinct")(spark, d)
      .as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, d).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e < 0.1, s"$k: approx $a vs exact $e")
    }
  }
}

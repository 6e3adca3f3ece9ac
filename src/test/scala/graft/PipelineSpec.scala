package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture laws for the round-10 pipeline-planning batch
  * (q282–q285): each query's semantics pinned on a hand-computable
  * corpus, independent of the DuckDB oracle. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def writeEmb(rows: Seq[(Long, Array[Float], Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q282: planted near-copy of an eval vector is flagged; clean eval vector reports zero") {
    // vec 0 and 29 are the eval slice (≡ 0 mod 29). vec 1 is a
    // near-copy of vec 0 (cos ≈ 0.9999); everything else is
    // near-orthogonal. Eval 0 → best match 1, one contaminating hit;
    // eval 29 → best match is whichever corpus vector wins, but zero
    // hits above 0.35.
    val dir = writeEmb(Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.999f, 0.01f, 0.0f), 0),
      (2L, Array(0.1f, 0.99f, 0.0f), 0),
      (29L, Array(0.0f, 0.0f, 1.0f), 0)))
    val got = SparkEntry.queries("q282_embedding_decon")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.length == 2)
    assert(got.head == ((0L, 1L, 1L)), s"eval 0: $got")
    val e29 = got(1)
    assert(e29._1 == 29L && e29._3 == 0L, s"eval 29 must be clean: $e29")
  }

  test("q283: pure planted clusters give purity 1e6; a planted mislabeled vector gives 0") {
    // Labels 0 and 1 are tight clusters (each member's NN is its
    // cluster sibling). Label 2's single vector sits nearest label 0's
    // cluster → purity 0. Cluster members are closer to each other
    // (cos ≈ 1) than to the label-2 vector (cos ≈ 0.9).
    val dir = writeEmb(Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.999f, 0.0f, 0.04f), 0),
      (2L, Array(0.0f, 1.0f, 0.0f), 1),
      (3L, Array(0.0f, 0.999f, 0.04f), 1),
      (4L, Array(0.9f, 0.0f, 0.435f), 2)))
    val got = SparkEntry.queries("q283_knn_label_purity")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 2L, 1000000L),
      (1L, 2L, 2L, 1000000L),
      (2L, 1L, 0L, 0L)))
  }

  test("q283: IVF-routed purity equals the brute-force 1-NN on the real fixture") {
    // Cross-check the production route against an in-test brute force
    // (same tie-break: max cosine, then lowest neighbor id).
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label").cast("long").as("lbl"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = e.map { case (id, l, v) =>
      val (bestL, _, _) = e.filter(_._1 != id)
        .map { case (bid, bl, bv) => (bl, cos(v, bv), bid) }
        .maxBy { case (_, c, bid) => (c, -bid.toDouble) }
      (l, bestL)
    }.groupBy(_._1).map { case (l, xs) =>
      (l, xs.length.toLong, xs.count(x => x._2 == x._1).toLong)
    }.toSeq.map { case (l, n, same) => (l, n, same, 1000000L * same / n) }
      .sortBy(_._1)
    val got = SparkEntry.queries("q283_knn_label_purity")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("q284: identical vectors collapse to one bucket per table; negations split exactly in two") {
    // 3 copies of v and 2 copies of −v (64-dim — the hyperplane width).
    // Every sign bit flips under negation (no plane dot is exactly 0
    // for a random-Gaussian plane vs this v), so each table has
    // EXACTLY two occupied buckets, sizes 3 and 2 → candidate volume
    // 3·2/2 + 2·1/2 = 4, max share 600000 ppm.
    val v = Array.tabulate(64)(i => (0.3f + 0.01f * i))
    val nv = v.map(x => -x)
    val dir = writeEmb(Seq(
      (1L, v, 0), (2L, v, 0), (3L, v, 0), (4L, nv, 0), (5L, nv, 0)))
    val got = SparkEntry.queries("q284_lsh_bucket_balance")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(0L, 1L, 2L, 3L))
    got.foreach { case (t, nb, mx, cp, share) =>
      assert(nb == 2L, s"table $t buckets: $nb")
      assert(mx == 3L && cp == 4L && share == 600000L, s"table $t: $mx $cp $share")
    }
  }

  test("q286: exact-dup pairs land in the top Jaccard band, split by embedding agreement") {
    // Docs 1↔2 and 3↔4 are exact text dups (J = 1 → band 5); 1/2's
    // embeddings are parallel (cos 1 → semantic hit), 3/4's orthogonal
    // (cos 0 → miss). Doc 5 pairs with nothing.
    val dir = java.nio.file.Files.createTempDirectory("graft_agree").toString
    Seq((1L, "a b c d", "en", "s", 7L), (2L, "a b c d", "en", "s", 7L),
      (3L, "p q r t", "en", "s", 7L), (4L, "p q r t", "en", "s", 7L),
      (5L, "z z z z", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    Seq((1L, Array(1.0f, 0.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f, 0.0f), 0), (4L, Array(0.0f, 0.0f, 1.0f), 0),
      (5L, Array(1.0f, 1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("q286_lexical_semantic_agreement")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((5L, 0L, 1L), (5L, 1L, 1L)))
  }

  test("q285: docs pack greedily at the 2000-token boundary, never split") {
    // Token counts 1500/1000/600/2500 → exclusive prefix sums
    // 0/1500/2500/3100 → shards 0/0/1/1.
    val dir = java.nio.file.Files.createTempDirectory("graft_shard").toString
    def doc(n: Int): String = Seq.fill(n)("w").mkString(" ")
    Seq((1L, doc(1500), "en", "s", 0L), (2L, doc(1000), "en", "s", 0L),
      (3L, doc(600), "en", "s", 0L), (4L, doc(2500), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q285_shard_planner")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 2500L, 1L, 2L),
      (1L, 2L, 3100L, 3L, 4L)))
  }
}

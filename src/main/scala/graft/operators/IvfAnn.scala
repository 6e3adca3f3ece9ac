package graft.operators

import graft.{Q, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a coarse k-means
  * quantizer partitions the corpus into nlist cells; a query searches
  * only the nprobe nearest cells. This is the scale path the brief
  * names alongside sign-LSH (q51): at 100 TB the corpus is written
  * clustered/partitioned by cell id, so a query reads nprobe/nlist of
  * the data — partition pruning does the rest.
  *
  * Everything is deterministic and declarative: centroid init takes
  * evenly spaced vectors in vec_id order (no RNG), Lloyd iterations are
  * groupBy-average (elementwise mean via posexplode + pivot back), and
  * assignment uses the codegen'd dot product.
  */
object IvfAnn {

  private val nlist = 16
  private val nprobe = 4
  private val lloydIters = 3

  /** corpus: (vec_id, emb array<double>, nrm). Returns (vec_id, cell). */
  private def assign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    // nearest centroid by cosine (dot/norm since query norm is constant
    // per row): broadcast the tiny centroid set, rank, keep rank 1.
    val w = Window.partitionBy(col("vec_id")).orderBy(col("score").desc, col("cell"))
    corpus.join(broadcast(centroids))
      .withColumn("score",
        GraftFunctions.dot(col("emb"), col("cemb")) / (col("nrm") * col("cnrm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("vec_id"), col("cell"))
  }

  /** Elementwise mean of member vectors per cell. */
  private def recompute(corpus: DataFrame, assigned: DataFrame): DataFrame = {
    val dims = corpus.join(assigned, "vec_id")
      .select(col("cell"), posexplode(col("emb")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos")).agg(avg(col("v")).as("m"))
    dims.groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("cemb"))
      .withColumn("cnrm", sqrt(GraftFunctions.dot(col("cemb"), col("cemb"))))
  }

  /** Deterministic IVF index build: evenly-spaced init, fixed Lloyd
    * iteration count. Returns (vec_id, cell) plus the final centroids. */
  def buildIndex(corpus: DataFrame): (DataFrame, DataFrame) = {
    // evenly spaced init on the (dense) vec_id key — a plain filter, no
    // global window, so init itself scales
    val n = corpus.count()
    val step = math.max(1L, n / nlist)
    val init = corpus
      .filter(pmod(col("vec_id"), lit(step)) === 0 && col("vec_id") / step < nlist)
      .select((col("vec_id") / step).cast("int").as("cell"),
        col("emb").as("cemb"), col("nrm").as("cnrm"))
    val centroids = (1 to lloydIters).foldLeft(init) { (cents, _) =>
      recompute(corpus, assign(corpus, cents))
    }
    (assign(corpus, centroids), centroids)
  }

  /** Persist the corpus clustered by IVF cell: `partitionBy(cell)` is
    * the on-disk form of the inverted file — a probe then reads only
    * nprobe/nlist of the data via partition pruning (proved in
    * VectorSpec). */
  def writeClustered(corpus: DataFrame, assigned: DataFrame, path: String): Unit =
    corpus.join(assigned, "vec_id")
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  val qs: Seq[Q] = Seq(
    // IVF ANN top-5 for queries vec_id < 10, probing 4 of 16 cells.
    // Spark-native (iterative k-means not expressible in one DuckDB
    // statement) → rows-only driver check + planted-recall ScalaTest.
    Q.noOracle("q67_ann_ivf") { (s, d) =>
      GraftFunctions.register(s)
      val corpus = Tables.embeddings(s, d)
        .withColumn("emb", transform(col("embedding"), x => x.cast("double")))
        .withColumn("nrm", sqrt(GraftFunctions.dot(col("emb"), col("emb"))))
        .drop("embedding")
      val (assigned, centroids) = buildIndex(corpus)
      val member = corpus.join(assigned, "vec_id")

      val queries = corpus.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("emb").as("qe"), col("nrm").as("qn"))
      // nprobe nearest cells per query
      val wq = Window.partitionBy(col("query_id")).orderBy(col("cscore").desc, col("cell"))
      val probed = queries.join(broadcast(centroids))
        .withColumn("cscore",
          GraftFunctions.dot(col("qe"), col("cemb")) / (col("qn") * col("cnrm")))
        .withColumn("crnk", row_number().over(wq))
        .filter(col("crnk") <= nprobe)
        .select(col("query_id"), col("qe"), col("qn"), col("cell"))
      // exact search within probed cells only
      val wr = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
      member.select(col("vec_id").as("neighbor_id"), col("emb").as("ce"),
          col("nrm").as("cn"), col("cell"))
        .join(broadcast(probed), Seq("cell"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("sim", GraftFunctions.dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
        .withColumn("rank", row_number().over(wr))
        .filter(col("rank") <= 5)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    }
  )
}

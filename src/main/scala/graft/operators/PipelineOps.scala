package graft.operators

import graft.plans.PrefixScan
import graft.{Q, Tables}
import graft.functions.{GraftFunctions, TextFns, VectorFns}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 training-pipeline planning batch: the index-health and
  * materialization certificates a pipeline reads BEFORE committing to
  * an expensive stage — embedding-level eval decontamination (the
  * vector-space complement of q73's n-gram screen), kNN label purity
  * (is the embedding space even usable for label-propagation /
  * classification stages), sign-LSH bucket balance (the candidate-join
  * cost driver of q51/q84, measured instead of assumed), and the
  * token-budget shard planner (which contiguous doc ranges land in
  * which training shard). All-integer / id-only outputs.
  */
object PipelineOps {

  /** Embeddings as double arrays with norms (the q49/q50 convention:
    * identical summation order to every all-pairs oracle path). */
  private def embWithNorm(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    Tables.embeddings(s, d)
      .withColumn("emb", transform(col("embedding"), x => x.cast("double")))
      .withColumn("nrm", sqrt(GraftFunctions.dot(col("emb"), col("emb"))))
      .drop("embedding")
  }

  private def fastDot(a: Column, b: Column): Column = GraftFunctions.dot(a, b)

  /** Inlined hyperplane VALUES rows for the DuckDB oracle — the q51
    * convention (LlmOps.annLshOracleSql): deterministic seeded
    * constants emitted as 17-significant-digit double literals (exact
    * round-trip), Locale.ROOT so the decimal separator is always '.'. */
  private def planeValuesSql: String =
    (0 until LlmOps.lshTables).flatMap { t =>
      (0 until LlmOps.lshBits).map { b =>
        val arr = LlmOps.hyperplanes(t * LlmOps.lshBits + b)
          .map(v => String.format(java.util.Locale.ROOT, "%.17e", Double.box(v)))
          .mkString("[", ", ", "]")
        s"($t, $b, CAST($arr AS DOUBLE[]))"
      }
    }.mkString(",\n      ")

  val qs: Seq[Q] = Seq(

    // Embedding-level eval decontamination — the vector-space
    // complement of q73's n-gram screen (paraphrased or re-tokenized
    // contamination defeats n-gram matching but not embedding
    // similarity). The eval set is a deterministic held-out slice
    // (vec_id ≡ 0 mod 29 — in production: the benchmark's own
    // embeddings); for each eval vector: its best corpus match (argmax
    // cosine, ties to the lowest id) and how many corpus vectors sit
    // above the contamination threshold (0.35 — the q50 family's
    // high-similarity tail on this corpus). Plan: the eval side is
    // SMALL BY NATURE (a benchmark), so it broadcasts and the corpus
    // scan stays map-side — n·|eval| fused comparisons, partial
    // aggregation per eval id, an |eval|-row shuffle; no corpus-sized
    // shuffle, no pair materialization.
    Q("q282_embedding_decon",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |p AS (SELECT a.vec_id AS eval_id, b.vec_id AS match_id,
        |        list_cosine_similarity(a.emb, b.emb) AS c
        |      FROM e a JOIN e b ON a.vec_id % 29 = 0 AND b.vec_id % 29 <> 0),
        |g AS (SELECT eval_id,
        |        CAST(coalesce(count(*) FILTER (WHERE c > 0.35), 0) AS BIGINT)
        |          AS n_contaminating
        |      FROM p GROUP BY 1),
        |b AS (SELECT eval_id, match_id FROM (
        |        SELECT eval_id, match_id,
        |          row_number() OVER (PARTITION BY eval_id
        |            ORDER BY c DESC, match_id) AS rk
        |        FROM p) WHERE rk = 1)
        |SELECT b.eval_id, CAST(b.match_id AS BIGINT) AS match_id,
        |  g.n_contaminating
        |FROM b JOIN g USING (eval_id)
        |ORDER BY eval_id""".stripMargin) { (s, d) =>
      val e = embWithNorm(s, d)
      val ev = e.filter(pmod(col("vec_id"), lit(29L)) === 0)
        .select(col("vec_id").as("eval_id"), col("emb").as("qe"), col("nrm").as("qn"))
      val cs = e.filter(pmod(col("vec_id"), lit(29L)) =!= 0)
        .select(col("vec_id").as("match_id"), col("emb").as("ce"), col("nrm").as("cn"))
      cs.crossJoin(broadcast(ev))
        .withColumn("c", VectorFns.cosineWithNorms(
          fastDot(col("qe"), col("ce")), col("qn"), col("cn")))
        .groupBy(col("eval_id"))
        .agg(max(struct(col("c"), (-col("match_id")).as("nm"))).as("m"),
          sum(when(col("c") > 0.35, 1L).otherwise(0L)).as("n_contaminating"))
        .select(col("eval_id"), (-col("m.nm")).cast("long").as("match_id"),
          col("n_contaminating"))
        .orderBy(col("eval_id"))
    },

    // kNN label purity — the embedding-space usability certificate a
    // pipeline reads before trusting label-propagation, nearest-anchor
    // classification (q87) or SemDeDup keeper choices: per label, the
    // share of vectors whose EXACT 1-NN carries the same label (1-NN
    // leave-one-out accuracy). The NN pass is the IVF-routed bounded
    // exact search shared with q222b (triangle-bound phase-2 — argmax
    // provably equals brute force), so the certificate never pays
    // all-pairs; the label join and per-label rollup are
    // labels-×-corpus-linear.
    Q("q283_knn_label_purity",
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |p AS (SELECT a.vec_id AS a_id, a.label AS la, b.vec_id AS b_id,
        |        b.label AS lb,
        |        list_cosine_similarity(a.emb, b.emb) AS c
        |      FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        |n AS (SELECT a_id, la, lb FROM (
        |        SELECT a_id, la, lb,
        |          row_number() OVER (PARTITION BY a_id ORDER BY c DESC, b_id) AS rk
        |        FROM p) WHERE rk = 1)
        |SELECT CAST(la AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT) AS n_same,
        |  CAST((1000000 * sum(CASE WHEN la = lb THEN 1 ELSE 0 END))
        |    // count(*) AS BIGINT) AS purity_ppm
        |FROM n GROUP BY la ORDER BY label""".stripMargin) { (s, d) =>
      val nn = IvfAnn.nearestNeighbors(s, d)
      val lbl = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label").cast("long").as("lbl"))
      nn.join(lbl.select(col("vec_id").as("a_id"), col("lbl").as("la")), "a_id")
        .join(lbl.select(col("vec_id").as("nb"), col("lbl").as("lb")), "nb")
        .groupBy(col("la").as("label"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("n_same"))
        .withColumn("purity_ppm", expr("(1000000 * n_same) div n_vecs"))
        .orderBy(col("label"))
    },

    // Sign-LSH bucket balance — the index-health audit for the q51/q84
    // hyperplane family: per table, occupied buckets, the largest
    // bucket, the total candidate-join volume Σ sz·(sz−1)/2 (the exact
    // pair count the LSH candidate stage will materialize — the cost
    // driver the q43c/q216c routers measure before committing), and
    // the largest bucket's corpus share. A skewed table (one bucket
    // holding half the corpus) silently degrades the ANN candidate
    // join toward all-pairs; this is the certificate that catches it.
    // One map-side bucket computation (24 codegen'd plane dots per
    // row) → a (4 × 64)-bounded aggregate.
    Q("q284_lsh_bucket_balance",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |planes(t, bit, pl) AS (VALUES
        |      PLANE_VALUES),
        |buckets AS (
        |    SELECT e.vec_id, p.t,
        |      SUM(CASE WHEN list_dot_product(e.emb, p.pl) > 0
        |               THEN 1 << p.bit ELSE 0 END) AS bucket
        |    FROM e CROSS JOIN planes p
        |    GROUP BY e.vec_id, p.t),
        |sz AS (SELECT CAST(t AS BIGINT) AS t, bucket,
        |         CAST(count(*) AS BIGINT) AS sz
        |       FROM buckets GROUP BY 1, 2),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs FROM e)
        |SELECT sz.t, CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(max(sz.sz) AS BIGINT) AS max_sz,
        |  CAST(sum(sz.sz * (sz.sz - 1) // 2) AS BIGINT) AS candidate_pairs,
        |  CAST((1000000 * max(sz.sz)) // max(n.n_vecs) AS BIGINT)
        |    AS max_share_ppm
        |FROM sz CROSS JOIN n GROUP BY sz.t
        |ORDER BY t""".stripMargin.replace("PLANE_VALUES", planeValuesSql)) { (s, d) =>
      GraftFunctions.register(s)
      val bk = Tables.embeddings(s, d)
        .withColumn("emb", transform(col("embedding"), x => x.cast("double")))
        .select(col("vec_id"),
          posexplode(LlmOps.lshBuckets(col("emb"))).as(Seq("t", "bucket")))
      val sz = bk.groupBy(col("t").cast("long").as("t"), col("bucket"))
        .agg(count(lit(1)).as("sz"))
      val n = Tables.embeddings(s, d).agg(count(lit(1)).as("n_vecs"))
      sz.groupBy(col("t"))
        .agg(count(lit(1)).as("n_buckets"), max(col("sz")).as("max_sz"),
          // integer div — `/` on longs would plan a DOUBLE division
          sum(expr("sz * (sz - 1) div 2")).as("candidate_pairs"))
        .crossJoin(broadcast(n))
        .withColumn("max_share_ppm", expr("(1000000 * max_sz) div n_vecs"))
        .select(col("t"), col("n_buckets"), col("max_sz"),
          col("candidate_pairs"), col("max_share_ppm"))
        .orderBy(col("t"))
    },

    // Token-budget shard planner — the materialization step that turns
    // a curated corpus into training shards: docs in doc_id order are
    // packed greedily into ~2000-token shards (a doc is never split;
    // the doc whose exclusive prefix sum crosses a boundary starts the
    // next shard — so shard_id = floor(exclusive_cum / budget) is a
    // closed form, not a sequential scan). The prefix sum runs through
    // PrefixScan (doc-id range buckets — the only global window is the
    // one-row-per-bucket offsets table), the report is
    // shard-count-sized. Distinct from q136 (greedy MIXTURE packing
    // into fixed capacity by source weights) and q72 (sequence packing
    // into context windows): this is the file-layout planner.
    Q("q285_shard_planner",
      """WITH t AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (SELECT doc_id, n_tok,
        |    sum(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT CAST((cum - n_tok) // 2000 AS BIGINT) AS shard_id,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS tokens,
        |  CAST(min(doc_id) AS BIGINT) AS first_doc,
        |  CAST(max(doc_id) AS BIGINT) AS last_doc
        |FROM c GROUP BY 1 ORDER BY shard_id""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"),
          size(TextFns.tokens(col("text"))).cast("long").as("n_tok"))
        .withColumn("bkt", (col("doc_id") / lit(1000L)).cast("long"))
      val cum = PrefixScan.cumsum(t, part = Seq(), bucket = "bkt",
        order = Seq("doc_id"), value = "n_tok", out = "cum")
      cum.withColumn("shard_id", expr("(cum - n_tok) div 2000"))
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy(col("shard_id"))
    }
  )
}

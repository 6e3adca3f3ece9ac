package graft.operators

import graft.plans.Ckpt.CkptOps
import graft.plans.Spread.SpreadOps
import graft.{Q, Tables}
import graft.functions.{TextFns, VectorFns}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-data-pipeline operators (north star, SURVEY §2B): deduplication
  * (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine),
  * similarity search (brute-force top-k, LSH-bucketed ANN), and text
  * analysis (language-ID, quality scoring, token stats, fingerprints).
  *
  * Scale design:
  *  - Exact dedup = hash-groupBy on sha256(text): one shuffle keyed on
  *    the hash, no text comparison; survivor choice (min doc_id) is
  *    deterministic.
  *  - MinHash-LSH: signature computation is embarrassingly parallel
  *    (higher-order functions, no UDF); banding explodes each doc into
  *    B rows and shuffles on the band key, so candidate generation is a
  *    bucket-local self-join — never an all-pairs product.
  *  - Brute-force cosine keeps the corpus un-shuffled and broadcasts
  *    the (small) query set; norms are computed once per row.
  *  - All ratio-valued outputs are emitted as floor-scaled integers
  *    (basis points) so cross-engine float rounding cannot flip a hash.
  */
object LlmOps {

  // MinHash modulus + permutation family live with the expression
  // (functions.MinHashSig) so GraftExtensions can register graft_minhash
  // session-wide; see MinHashSig companion.
  private val P = graft.functions.MinHashSig.P

  /** Deterministic random hyperplanes for sign-LSH over 64-dim floats:
    * 4 independent tables × 6 bits each (OR-amplification — a pair is a
    * candidate if it collides in ANY table; 6 bits ≈ 64 buckets/table
    * keeps buckets populated on a near-orthogonal corpus). */
  private[graft] val lshTables = 4
  private[graft] val lshBits = 6
  private[graft] val hyperplanes: Seq[Array[Double]] = {
    val rnd = new scala.util.Random(4242)
    Seq.fill(lshTables * lshBits)(Array.fill(64)(rnd.nextGaussian()))
  }

  // ---- shared building blocks -------------------------------------------

  /** `fan = true` spreads the compact doc rows across the cores BEFORE
    * the shingle blowup — a single-row-group fixture scan otherwise
    * runs the whole tokenize+shingle+explode chain of every consumer
    * on one core (ProfileOne r17: 1-1.6 s single-task stages in
    * q89/q272). No-op on a multi-split table (Spread scaladoc).
    * OPT-IN, not the default: the interleaved A/B (r17) measured the
    * fan-out per consumer family — decisive wins where the exploded
    * frame feeds a self-join (q44 2.0→1.1 s, q89 3.4→1.6 s, q272
    * −10%), neutral-to-losing (+8..35%) where the downstream is one
    * fused aggregate/broadcast pipeline (q269) or the ckpt'd shared
    * pair-graph build (q43c/q296), where the exchange + task fan costs
    * more than the parallelism buys. */
  private def docsWithShingles(s: SparkSession, d: String, fan: Boolean = false): DataFrame = {
    val base = Tables.documents(s, d)
    (if (fan) base.spread(col("doc_id")) else base)
      .withColumn("words", TextFns.tokens(col("text")))
      .withColumn("shingles", array_distinct(TextFns.shingles(col("words"), 3)))
  }

  /** Base shingle hashes: xxhash64 mod P, computed ONCE per shingle —
    * the 32 permutations then only do cheap affine arithmetic over this
    * array instead of re-hashing the strings 32×. xxhash64 is
    * Spark-native (no DuckDB equivalent → rows-only oracle). */
  private def shingleHashes(shingles: Column): Column =
    transform(shingles, sh => pmod(xxhash64(sh), lit(P)))

  /** 32-wide MinHash signature from pre-hashed shingles, via the fused
    * codegen expression (one pass computes all 32 minima). Registered
    * session-wide by GraftExtensions; register() is a quiet no-op when
    * the function already exists. */
  private def minhashSig(s: SparkSession, hashes: Column): Column = {
    graft.functions.GraftFunctions.register(s)
    graft.functions.GraftFunctions.minhash(hashes)
  }

  /** LSH band keys: 8 bands of 4 signature slots each. */
  private def bandKeys(sig: Column): Column =
    array((0 until 8).map { j =>
      concat_ws("_", lit(j.toString) +: (0 until 4).map(r => element_at(sig, j * 4 + r + 1)): _*)
    }: _*)

  /** Banding projection shared with the STREAMING near-dup operator:
    * (band_key, doc_id, shingles) rows for a (doc_id, text) frame — the
    * identical shingle → minhash → band pipeline behind q44's batch
    * candidates, all per-row deterministic expressions, so it plans on
    * a streaming DataFrame unchanged (that identity is what the
    * StreamingSpec batch-parity law certifies). */
  private[graft] def bandedDocRows(s: SparkSession, docs: DataFrame): DataFrame = {
    val sh = docs
      .withColumn("words", TextFns.tokens(col("text")))
      .withColumn("shingles", array_distinct(TextFns.shingles(col("words"), 3)))
      .filter(size(col("shingles")) > 0)
    sh.withColumn("hx", shingleHashes(col("shingles")))
      .withColumn("sig", minhashSig(s, col("hx")))
      .select(explode(bandKeys(col("sig"))).as("band_key"),
        col("doc_id"), col("shingles"))
  }

  /** Embeddings as double arrays with precomputed norms. Norms and all
    * pairwise dots go through the codegen'd DotProduct expression —
    * identical summation order to the zip_with+aggregate baseline, but a
    * primitive loop instead of a per-pair array allocation. */
  private def embWithNorm(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.embeddings(s, d)
      .withColumn("emb", transform(col("embedding"), x => x.cast("double")))
      .withColumn("nrm", sqrt(graft.functions.GraftFunctions.dot(col("emb"), col("emb"))))
      .drop("embedding")
  }

  private def fastDot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dot(a, b)

  /** Sign-LSH bucket ids, one per table: bucket(t) packs the sign bits
    * of hyperplanes [t*bits, (t+1)*bits). Returned as an array so the
    * caller can posexplode into (table, bucket) rows. */
  private[graft] def lshBuckets(emb: Column): Column = {
    // Each plane dot runs through the codegen'd DotProduct primitive
    // (same left-to-right summation as the zip_with+aggregate form it
    // replaced, so bucket bits are bit-identical) against a constant
    // hyperplane array — 24 fused loops per row instead of 24 HOF
    // expression trees each allocating an intermediate array.
    def signBit(planeIdx: Int, weight: Long): Column = {
      val dot = graft.functions.GraftFunctions.dot(
        emb, array(hyperplanes(planeIdx).map(lit): _*))
      when(dot > 0, lit(weight)).otherwise(lit(0L))
    }
    array((0 until lshTables).map { t =>
      (0 until lshBits).map(b => signBit(t * lshBits + b, 1L << b)).reduce(_ + _)
    }: _*)
  }

  /** DuckDB re-simulation of the ENTIRE sign-LSH ANN pipeline (SURVEY
    * §5.1 "hash against a documented re-computation"): the hyperplanes
    * are deterministic seeded constants, so the oracle inlines them as
    * double literals (17 significant digits → exact round-trip) and
    * replays bucketing → candidate generation → exact cosine ranking in
    * SQL. The driver therefore checks the APPROXIMATE algorithm's exact
    * output, not a recall proxy. */
  private def annLshOracleSql: String = {
    val planeRows = (0 until lshTables).flatMap { t =>
      (0 until lshBits).map { b =>
        // Locale.ROOT: the default-locale f-interpolator would emit
        // comma decimals ("1,23e+00" — malformed SQL) under e.g. de_DE.
        val arr = hyperplanes(t * lshBits + b)
          .map(v => String.format(java.util.Locale.ROOT, "%.17e", Double.box(v)))
          .mkString("[", ", ", "]")
        s"($t, $b, CAST($arr AS DOUBLE[]))"
      }
    }.mkString(",\n      ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |  planes(t, bit, pl) AS (VALUES
       |      $planeRows),
       |  buckets AS (
       |    SELECT e.vec_id, p.t,
       |      SUM(CASE WHEN list_dot_product(e.emb, p.pl) > 0
       |               THEN 1 << p.bit ELSE 0 END) AS bucket
       |    FROM e CROSS JOIN planes p
       |    GROUP BY e.vec_id, p.t),
       |  cand AS (
       |    SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
       |    FROM buckets qb JOIN buckets cb ON qb.t = cb.t AND qb.bucket = cb.bucket
       |    WHERE qb.vec_id < 10 AND qb.vec_id <> cb.vec_id),
       |  scored AS (
       |    SELECT c.query_id, c.neighbor_id,
       |      list_cosine_similarity(q.emb, n.emb) AS sim
       |    FROM cand c
       |    JOIN e q ON q.vec_id = c.query_id
       |    JOIN e n ON n.vec_id = c.neighbor_id),
       |  r AS (
       |    SELECT query_id, neighbor_id,
       |      CAST(row_number() OVER (PARTITION BY query_id
       |        ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank
       |    FROM scored)
       |SELECT query_id, rank, neighbor_id FROM r
       |WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---- language-ID / quality shared SQL fragments -----------------------

  private def hitsCol(lang: String): Column =
    TextFns.stopwordHits(col("words"), TextFns.stopwords.find(_._1 == lang).get._2)

  private def duckHits(lang: String): String = {
    val list = TextFns.stopwords.find(_._1 == lang).get._2
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(string_split(text, ' '), w -> list_contains($list, w)))"
  }

  /** Per-doc language-ID projection (doc_id, lang, pred_lang, correct) —
    * the shared core of q47 (per-doc listing) and q223 (confusion
    * matrix). Argmax over stopword hit counts with the fixed tie-break
    * order of TextFns.stopwords. */
  private lazy val langIdPerDocSql: String = {
    val langs = TextFns.stopwords.map(_._1)
    val hitDefs = langs.map(l => s"${duckHits(l)} AS h_$l").mkString(",\n    ")
    val pred = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1).map(r => s"h_$l >= h_$r").mkString(" AND ")
      s"WHEN $rest THEN '$l'"
    }.mkString("\n      ")
    s"""WITH h AS (
       |  SELECT doc_id, lang,
       |    $hitDefs
       |  FROM documents
       |)
       |SELECT doc_id, lang,
       |  CASE $pred ELSE '${langs.last}' END AS pred_lang,
       |  CASE WHEN (CASE $pred ELSE '${langs.last}' END) = lang THEN 1 ELSE 0 END AS correct
       |FROM h""".stripMargin
  }

  private def langIdPerDoc(s: SparkSession, d: String): DataFrame = {
    val langs = TextFns.stopwords.map(_._1)
    val withHits = langs.foldLeft(
      Tables.documents(s, d).withColumn("words", TextFns.tokens(col("text")))) {
      (df, l) => df.withColumn(s"h_$l", hitsCol(l))
    }
    val pred = langs.init.zipWithIndex.foldLeft(when(lit(false), "")) { case (acc, (l, i)) =>
      val cond = langs.drop(i + 1)
        .map(r => col(s"h_$l") >= col(s"h_$r"))
        .reduce(_ && _)
      acc.when(cond, l)
    }.otherwise(langs.last)
    withHits.select(col("doc_id"), col("lang"), pred.as("pred_lang"),
      when(pred === col("lang"), 1).otherwise(0).as("correct"))
  }

  // ---- SimHash (32-bit, sha256-derived → fully oracle-able) -------------

  /** Per-bit ±1 contributions from the first 8 hex digits of
    * sha256(token); bit b lives in hex digit b/4, position b%4. */
  private def simhashAgg(tokens: DataFrame): DataFrame = {
    // tokens: (doc_id, token). Project the 8 hex-digit values then sum
    // 32 signed bit contributions per doc.
    val hexd = tokens
      .withColumn("hex", substring(sha2(col("token"), 256), 1, 8))
      .select(col("doc_id") +: (0 until 8).map(i =>
        (instr(lit("0123456789abcdef"), substring(col("hex"), i + 1, 1)) - 1).as(s"d$i")): _*)
    val sums = (0 until 32).map { b =>
      val digit = col(s"d${b / 4}")
      sum(when(shiftright(digit, b % 4).bitwiseAND(lit(1)) === 1, 1)
        .otherwise(-1)).as(s"s$b")
    }
    val grouped = hexd.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
    val assemble = (0 until 32).map { b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    grouped.select(col("doc_id"), assemble.as("simhash"))
  }

  // ---- q216c: routed 32-bit simhash neighbors (VERDICT r8 #2) ---------

  /** Memoized 32-bit signature build shared by q45/q216/q216c: the
    * per-doc signature frame, its distinct-signature projection, and
    * the distinct count (the router's planning scalar — one count on
    * the already-checkpointed distinct frame, taken once per (session,
    * dir fingerprint) like shingleSkewStat). */
  private val simhashSigCache =
    new graft.plans.DerivationCache[(DataFrame, DataFrame, java.lang.Long)]

  private[graft] def simhashSigs(
      s: SparkSession, d: String): (DataFrame, DataFrame, Long) = {
    val v = simhashSigCache.getOrCompute(s, d) {
      // NOT spread (unlike q216b): A/B r17 measured the fan-out +12%
      // on q216c and +40% on q45 — this build is consumed through the
      // cache, so its serial chain amortizes across consumers
      val tokens = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("token"))
      val sg = simhashAgg(tokens).ckpt()
      val uq = sg.select(col("simhash")).distinct().ckpt()
      (sg, uq, Long.box(uq.count()))
    }
    (v._1, v._2, v._3.longValue())
  }

  /** Expand near-SIGNATURE pairs to near-DOC pairs: join both doc-id
    * sides back, plus the same-signature groups (hamming 0 by
    * definition, every row an output row). Shared by both q216c
    * branches and q216. */
  private def simhashDocExpand(sig: DataFrame, sigPairs: DataFrame): DataFrame = {
    val mA = sig.select(col("simhash").as("sa"), col("doc_id").as("da"))
    val mB = sig.select(col("simhash").as("sb"), col("doc_id").as("db"))
    val cross = sigPairs.join(mA, "sa").join(mB, "sb")
      .select(least(col("da"), col("db")).as("a_id"),
        greatest(col("da"), col("db")).as("b_id"), col("hamming"))
    val within = sig.select(col("simhash"), col("doc_id").as("a_id"))
      .join(sig.select(col("simhash"), col("doc_id").as("b_id")), "simhash")
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), lit(0L).as("hamming"))
    cross.unionByName(within).orderBy("a_id", "b_id")
  }

  /** q216's banded branch over the shared signature build: 4 × 8-bit
    * bands on distinct signatures, recall-1 for hamming ≤ 3 by
    * pigeonhole, exact bit_count verify. Candidate volume is
    * Σ bucket², buckets = 256/band — the LOW-diversity branch (band
    * space saturates once distinct sigs ≫ 256·bands; the router caps
    * it via the [[simhashCandidateVolumes]] Σsz² probe). */
  private[graft] def simhashBandedPairs(sig: DataFrame, uniq: DataFrame): DataFrame = {
    val bb = uniq.select(col("simhash"),
        explode(array((0 to 3).map(lit): _*)).as("band"))
      .withColumn("bv", expr("shiftright(simhash, band * 8) % 256"))
    val sigPairs = bb.select(col("simhash").as("sa"), col("band"), col("bv"))
      .join(bb.select(col("simhash").as("sb"), col("band").as("bandb"),
        col("bv").as("bvb")),
        col("band") === col("bandb") && col("bv") === col("bvb")
          && col("sa") < col("sb"))
      .select(col("sa"), col("sb")).distinct()
      .withColumn("hamming", expr("CAST(bit_count(sa ^ sb) AS BIGINT)"))
      .where(col("hamming") <= 3)
    simhashDocExpand(sig, sigPairs)
  }

  /** High-diversity branch: multi-index hashing (Norouzi et al.,
    * "Fast Search in Hamming Space with Multi-Index Hashing", CVPR'12)
    * on 16-bit halves. Pigeonhole at k = 3 over two disjoint halves:
    * some half differs in ≤ ⌊3/2⌋ = 1 bit, so probing each signature's
    * two half-values PLUS their 16 single-bit flips (17 keys/half, 34
    * rows/signature — a constant) against the original half-values
    * finds every hamming ≤ 3 pair exactly — recall 1, same guarantee
    * as banding but with 2^16 buckets per half, so bucket occupancy
    * (and the candidate join) scales like n/65536 instead of n/256.
    * EXACTLY the same output as the banded branch: both generate a
    * superset of the true pair set and apply the identical bit_count
    * verify (DedupSpec proves branch identity on both regimes). */
  private[graft] def simhashExpansionPairs(sig: DataFrame, uniq: DataFrame): DataFrame = {
    val halves = uniq.select(col("simhash"), posexplode(array(
        col("simhash").bitwiseAND(lit(0xffffL)),
        shiftright(col("simhash"), 16).bitwiseAND(lit(0xffffL))))
      .as(Seq("h", "hv")))
    val flipKeys = array(
      Seq(col("hv")) ++ (0 until 16).map(j => col("hv").bitwiseXOR(lit(1L << j))): _*)
    val probe = halves.select(col("simhash").as("sa"), col("h"),
      explode(flipKeys).as("k"))
    val index = halves.select(col("simhash").as("sb"), col("h").as("hb"),
      col("hv").as("kb"))
    val sigPairs = probe.join(index,
        col("h") === col("hb") && col("k") === col("kb")
          && col("sa") < col("sb"))
      .select(col("sa"), col("sb")).distinct()
      .withColumn("hamming", expr("CAST(bit_count(sa ^ sb) AS BIGINT)"))
      .where(col("hamming") <= 3)
    simhashDocExpand(sig, sigPairs)
  }

  /** Measured candidate-volume probe for the q216c router (VERDICT r9
    * #6 — replaces the asserted 10·2⁸ distinct-signature constant with
    * the Σsz² cost model the q43c skew probe established):
    *  - banded branch cost ∝ its candidate join volume = Σ over the
    *    4×256 band buckets of sz² (every same-bucket signature pair is
    *    a candidate row);
    *  - expansion branch cost ∝ 34 probe rows per distinct signature
    *    (17 keys × 2 halves) plus its own collision volume Σ over the
    *    2×65536 half buckets of sz² (exact-key hits dominate — flipped
    *    keys are 1-bit-specific misses by construction).
    * Two aggregations over the already-checkpointed distinct-signature
    * frame, memoized per (session, dir fingerprint) like every other
    * planning scalar. The old threshold falls out as the special case
    * where buckets are uniformly ~10 deep. */
  private val simhashVolCache =
    new graft.plans.DerivationCache[(java.lang.Long, java.lang.Long)]

  private[graft] def simhashCandidateVolumes(
      s: SparkSession, d: String): (Long, Long) = {
    val v = simhashVolCache.getOrCompute(s, d) {
      val (_, uniq, n) = simhashSigs(s, d)
      def sumSq(keyed: DataFrame): Long = {
        val r = keyed.groupBy(col("h"), col("hv")).agg(count(lit(1)).as("sz"))
          .agg(sum(col("sz") * col("sz"))).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }
      val bandVol = sumSq(uniq.select(
          explode(array((0 to 3).map(lit): _*)).as("h"), col("simhash"))
        .withColumn("hv", expr("shiftright(simhash, h * 8) % 256")))
      val halfVol = sumSq(uniq.select(col("simhash"), posexplode(array(
          col("simhash").bitwiseAND(lit(0xffffL)),
          shiftright(col("simhash"), 16).bitwiseAND(lit(0xffffL))))
        .as(Seq("h", "hv"))))
      (Long.box(bandVol), Long.box(34L * n + halfVol))
    }
    (v._1.longValue(), v._2.longValue())
  }

  /** q43c-style router for the 32-bit simhash neighbor semantic: both
    * branches exact under the k = 3 pigeonhole guarantee, so the route
    * never changes the result — only whether candidate generation pays
    * 256-bucket banding (cheap while the signature space is sparse) or
    * 65536-bucket half-expansion (the scale regime). The pick is the
    * smaller MEASURED candidate volume, not an asserted constant. */
  private[graft] def adaptiveSimhashNeighbors(
      s: SparkSession, d: String): (String, DataFrame) = {
    val (sig, uniq, _) = simhashSigs(s, d)
    val (bandVol, expVol) = simhashCandidateVolumes(s, d)
    if (bandVol > expVol) ("expansion", simhashExpansionPairs(sig, uniq))
    else ("banded", simhashBandedPairs(sig, uniq))
  }

  /** q216's banding fan-out, for scale measurement (ScaleSmoke
    * SIMHASH100X): per band over DISTINCT signatures — bucket count,
    * max bucket, and Σ sz² (the band's candidate-join volume) — plus
    * the signature-diversity row the banded join's cost tracks. */
  private[graft] def simhashBandProfile(s: SparkSession, d: String): DataFrame = {
    val tokens = Tables.documents(s, d)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("token"))
    val sig = simhashAgg(tokens)
    val uniq = sig.select(col("simhash")).distinct()
    val bb = uniq.select(col("simhash"),
        explode(array((0 to 3).map(lit): _*)).as("band"))
      .withColumn("bv", expr("shiftright(simhash, band * 8) % 256"))
    bb.groupBy("band", "bv").agg(count(lit(1)).as("sz"))
      .groupBy("band").agg(count(lit(1)).as("n_buckets"),
        max(col("sz")).as("max_bucket"),
        sum(col("sz") * col("sz")).as("cand_volume"))
      .orderBy("band")
  }

  /** q216b's fan-out under the same lens: per 16-bit band over distinct
    * 64-bit signatures. */
  private[graft] def simhash64BandProfile(s: SparkSession, d: String): DataFrame = {
    val tokens = Tables.documents(s, d)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("token"))
    val uniq = simhash64Agg(tokens)
      .select("simhash", "bv0", "bv1", "bv2", "bv3").distinct()
    val bb = uniq.select(posexplode(
      array(col("bv0"), col("bv1"), col("bv2"), col("bv3"))).as(Seq("band", "bv")))
    bb.groupBy("band", "bv").agg(count(lit(1)).as("sz"))
      .groupBy("band").agg(count(lit(1)).as("n_buckets"),
        max(col("sz")).as("max_bucket"),
        sum(col("sz") * col("sz")).as("cand_volume"))
      .orderBy("band")
  }

  /** Shared q216/q216c oracle: banded candidates + exact bit_count
    * verify in DuckDB — route-agnostic (both Spark branches are exact,
    * so any route matches this). */
  private def simhashNeighborsOracleSql: String = {
    val sigSql = simhashOracleSql
    s"""WITH sig AS (
       |$sigSql
       |),
       |bb AS (SELECT doc_id, simhash, band,
       |    (simhash // CASE band WHEN 0 THEN 1 WHEN 1 THEN 256
       |                 WHEN 2 THEN 65536 ELSE 16777216 END) % 256 AS bv
       |  FROM (SELECT doc_id, simhash, unnest([0, 1, 2, 3]) AS band
       |        FROM sig)),
       |p AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |    a.simhash AS sa, b.simhash AS sb
       |  FROM bb a JOIN bb b
       |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
       |SELECT a_id, b_id,
       |  CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
       |FROM p WHERE bit_count(xor(sa, sb)) <= 3
       |ORDER BY a_id, b_id""".stripMargin
  }

  private def simhashOracleSql: String = {
    val digitDefs = (0 until 8)
      .map(i => s"strpos('0123456789abcdef', substr(hex, ${i + 1}, 1)) - 1 AS d$i")
      .mkString(",\n    ")
    val sumDefs = (0 until 32)
      .map(b => s"sum(CASE WHEN (d${b / 4} // ${1L << (b % 4)}) % 2 = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n    ")
    val assemble = (0 until 32)
      .map(b => s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
       |), hx AS (
       |  SELECT doc_id, substr(sha256(token), 1, 8) AS hex FROM tok
       |), dg AS (
       |  SELECT doc_id,
       |    $digitDefs
       |  FROM hx
       |), sm AS (
       |  SELECT doc_id,
       |    $sumDefs
       |  FROM dg GROUP BY doc_id
       |)
       |SELECT doc_id, CAST($assemble AS BIGINT) AS simhash
       |FROM sm ORDER BY doc_id""".stripMargin
  }


  // ---- 64-bit SimHash (q216's 100×-Heaps scale path) --------------------

  /** 64-bit simhash + its four 16-bit band values in one aggregation:
    * 16 hex digits of sha256(token) → 64 signed bit sums per doc. The
    * full signature (bit 63 makes it a negative long — harmless, every
    * consumer is a sign-agnostic bitwise op) feeds the hamming verify;
    * the band values bv0..bv3 are assembled INDEPENDENTLY as small
    * positive ints so no engine ever shifts a negative long (DuckDB's
    * // and % disagree with Spark on negatives). Why 64/16 exists:
    * recall-1 banding for hamming ≤ k needs k+1 disjoint bands, so
    * 32-bit sigs cap bands at 8 bits = 256 buckets — SCALE.md round 8
    * measures that saturating at 100× (Σsz² grew 92×, 6.0 per-unit).
    * Widening the signature is the production lever: 16-bit bands give
    * 65536 buckets/band and restore the linear regime at the same
    * k = 3 pigeonhole guarantee. */
  private def simhash64Agg(tokens: DataFrame): DataFrame = {
    val hexd = tokens
      .withColumn("hex", substring(sha2(col("token"), 256), 1, 16))
      .select(col("doc_id") +: (0 until 16).map(i =>
        (instr(lit("0123456789abcdef"), substring(col("hex"), i + 1, 1)) - 1).as(s"d$i")): _*)
    val sums = (0 until 64).map { b =>
      val digit = col(s"d${b / 4}")
      sum(when(shiftright(digit, b % 4).bitwiseAND(lit(1)) === 1, 1)
        .otherwise(-1)).as(s"s$b")
    }
    val grouped = hexd.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val bvs = (0 until 4).map { k =>
      (16 * k until 16 * (k + 1)).map { b =>
        when(col(s"s$b") > 0, lit(1L << (b - 16 * k))).otherwise(lit(0L))
      }.reduce(_ + _).as(s"bv$k")
    }
    grouped.select(col("doc_id") +: sig.as("simhash") +: bvs: _*)
  }

  private def simhash64OracleSql: String = {
    val digitDefs = (0 until 16)
      .map(i => s"strpos('0123456789abcdef', substr(hex, ${i + 1}, 1)) - 1 AS d$i")
      .mkString(",\n    ")
    val sumDefs = (0 until 64)
      .map(b => s"sum(CASE WHEN (d${b / 4} // ${1L << (b % 4)}) % 2 = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n    ")
    // Bit 63's weight is Long.MinValue; spell it without a bare
    // 9223372036854775808 literal (out of BIGINT range pre-negation).
    def weight(b: Int): String =
      if (b == 63) "(-9223372036854775807 - 1)" else (1L << b).toString
    val assemble = (0 until 64)
      .map(b => s"CASE WHEN s$b > 0 THEN ${weight(b)} ELSE 0 END")
      .mkString(" + ")
    val bvDefs = (0 until 4).map { k =>
      (16 * k until 16 * (k + 1))
        .map(b => s"CASE WHEN s$b > 0 THEN ${1L << (b - 16 * k)} ELSE 0 END")
        .mkString("(", " + ", s") AS bv$k")
    }.mkString(",\n    ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
       |), hx AS (
       |  SELECT doc_id, substr(sha256(token), 1, 16) AS hex FROM tok
       |), dg AS (
       |  SELECT doc_id,
       |    $digitDefs
       |  FROM hx
       |), sm AS (
       |  SELECT doc_id,
       |    $sumDefs
       |  FROM dg GROUP BY doc_id
       |), sig64 AS (
       |  SELECT doc_id, CAST($assemble AS BIGINT) AS simhash,
       |    $bvDefs
       |  FROM sm
       |)""".stripMargin
  }

  // ---- n-gram Jaccard (two exact algorithms, one oracle) ----------------

  private val jaccardThreshold10 = 3 // t = 0.3, ×10 for integer math

  /** THE production near-dup threshold (t = 0.8), shared by q44's
    * verify filter + oracle, q43b's declaration, DedupSpec's recall
    * certification, and RecallCheck — one constant so a retune cannot
    * leave the verify filter and the oracle/certificate at different
    * thresholds. Matched to the 8×4 banding S-curve: miss probability
    * (1−t⁴)⁸ ≤ 1.5% at t = 0.8. */
  private[graft] val productionThreshold10 = 8

  private def jaccardOracleSqlAt(t10: Int): String =
    s"""WITH sh AS (
      |  SELECT doc_id, lang, n_chars // 100 AS lb,
      |    list_distinct(list_transform(
      |      range(1, CASE WHEN len(string_split(text,' ')) >= 3
      |                    THEN len(string_split(text,' ')) - 1 ELSE 1 END),
      |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |           || ' ' || string_split(text,' ')[i+2])) AS sg
      |  FROM documents
      |)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  CAST(floor(10000.0 * len(list_intersect(a.sg, b.sg))
      |       / len(list_distinct(list_concat(a.sg, b.sg)))) AS BIGINT) AS jaccard_bp
      |FROM sh a JOIN sh b
      |  ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
      |WHERE len(a.sg) > 0 AND len(b.sg) > 0
      |  AND len(list_intersect(a.sg, b.sg)) * 10
      |      >= $t10 * len(list_distinct(list_concat(a.sg, b.sg)))
      |ORDER BY a_id, b_id""".stripMargin

  private val jaccardOracleSql: String = jaccardOracleSqlAt(jaccardThreshold10)

  /** t = 0.3 blocked pair predicate shared by the q70/q82 oracles — ONE
    * definition so a threshold or blocking edit cannot leave the two
    * recursive-CTE oracles at different semantics. Guarded against
    * empty shingle sets like the Spark side (shingleBlocks sz > 0). */
  private val ccPairSql =
    """SELECT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM sh a JOIN sh b
      |    ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
      |  WHERE len(a.sg) > 0 AND len(b.sg) > 0
      |    AND len(list_intersect(a.sg, b.sg)) * 10
      |        >= 3 * len(list_distinct(list_concat(a.sg, b.sg)))""".stripMargin

  /** Shared connected-component oracle scaffold (shingles → pairs →
    * symmetric edges → transitive closure → min-label clusters), used
    * by every cluster-consuming oracle (q292/q296/q299). Consumers
    * splice it via `.replace("CC_CLUSTER_CTES", ccClusterSql)` AFTER
    * their own stripMargin — interpolating it into a margin template
    * would let the outer stripMargin eat the leading `|` of the `||`
    * concatenations below (the round-9 NOTES pitfall). */
  private val ccClusterSql: String =
    s"""sh AS (
       |  SELECT doc_id, lang, n_chars // 100 AS lb,
       |    list_distinct(list_transform(
       |      range(1, CASE WHEN len(string_split(text,' ')) >= 3
       |                    THEN len(string_split(text,' ')) - 1 ELSE 1 END),
       |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
       |           || ' ' || string_split(text,' ')[i+2])) AS sg
       |  FROM documents
       |), pairs AS (
       |  $ccPairSql
       |), edges AS (
       |  SELECT a_id AS a, b_id AS b FROM pairs
       |  UNION SELECT b_id, a_id FROM pairs
       |), reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |), cl AS (
       |  SELECT a AS doc_id, min(b) AS cluster_id
       |  FROM (SELECT a, b FROM reach UNION SELECT a, a FROM edges) t
       |  GROUP BY a
       |)""".stripMargin

  /** Distinct shingle sets per doc with blocking keys and set size. */
  private[graft] def shingleBlocks(s: SparkSession, d: String, fan: Boolean = false): DataFrame =
    docsWithShingles(s, d, fan)
      .select(col("doc_id"), col("lang"), (col("n_chars") / 100).cast("long").as("lb"),
        col("shingles").as("sg"))
      .withColumn("sz", size(col("sg")))
      .filter(col("sz") > 0)

  /** Inverted-index count join: explode distinct shingles, self-join on
    * (shingle, block), count common shingles per pair, derive
    * |A∪B| = |A|+|B|−|A∩B|. No array work in the pair loop; cost scales
    * with shingle co-occurrence volume, not corpus².
    *
    * The threshold-independent pair statistics (a_id, b_id, sizes,
    * intersection, union) are computed here; thresholding is a final
    * filter (finishJaccard). */
  private def blockedPairStats(s: SparkSession, d: String): DataFrame =
    pairStatsBlockedBy(s, d, useLenBucket = true)

  /** One inverted-index pair-join shape, parameterized on the blocking
    * keys: Jaccard consumers block by (lang, length bucket); the
    * containment consumer (q89) blocks by lang only, because its whole
    * point is the asymmetric-size pairs the length bucket discards. */
  private def pairStatsBlockedBy(
      s: SparkSession, d: String, useLenBucket: Boolean): DataFrame = {
    // lang-only blocking (q89) fans the docs out before shingling: its
    // co-occurrence join explodes BOTH sides from the raw scan and the
    // serial shingle chain dominated the profile (A/B r17: 3.4→1.6 s);
    // the lb-blocked form feeds the ckpt'd shared inventory, where the
    // same fan-out measured as a small loss — keep it serial there.
    // r18 scan-once A/B (VERDICT #3), REJECTED: ckpt'ing the compact
    // shingled frame for the lang-only (q89) path so tokenize+shingle
    // runs once instead of once per join side measured 2.3-3.2 s
    // steady vs 1.6-1.7 s without (BenchOne sf0.1/32c) — the serial
    // localCheckpoint write+read barrier of the array column costs
    // more than the ~0.24 s of duplicated 32-way shingle work it
    // saves, and the spread exchange is already reused by both sides
    // (one documents scan, ReusedExchange in the plan).
    val sh = shingleBlocks(s, d, fan = !useLenBucket)
    val ex = sh.select(col("doc_id"), col("lang"), col("lb"), col("sz"),
      explode(col("sg")).as("shingle"))
    val a = ex.select(col("doc_id").as("a_id"), col("sz").as("a_sz"),
      col("lang"), col("lb"), col("shingle"))
    val b = ex.select(col("doc_id").as("b_id"), col("sz").as("b_sz"),
      col("lang").as("langb"), col("lb").as("lbb"), col("shingle").as("shingleb"))
    val base = col("shingle") === col("shingleb") && col("lang") === col("langb") &&
      col("a_id") < col("b_id")
    a.join(b, if (useLenBucket) base && col("lb") === col("lbb") else base)
      .groupBy(col("a_id"), col("b_id"), col("a_sz"), col("b_sz"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("uni", col("a_sz") + col("b_sz") - col("inter"))
  }

  /** q255/q255b shared oracle: exact t=0.8 Jaccard pairs whose larger
    * element lies in the top id decile — route-agnostic (the q43c
    * pattern), so the checkpointed-inventory and bucketed-table forms
    * verify against the same SQL. */
  private[graft] val deltaNearDupOracleSql: String =
    s"""WITH sh AS (
      |  SELECT doc_id, lang, n_chars // 100 AS lb,
      |    list_distinct(list_transform(
      |      range(1, CASE WHEN len(string_split(text,' ')) >= 3
      |                    THEN len(string_split(text,' ')) - 1 ELSE 1 END),
      |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |           || ' ' || string_split(text,' ')[i+2])) AS sg
      |  FROM documents
      |),
      |m AS (SELECT max(doc_id) AS mx FROM documents)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  CAST(floor(10000.0 * len(list_intersect(a.sg, b.sg))
      |       / len(list_distinct(list_concat(a.sg, b.sg)))) AS BIGINT) AS jaccard_bp
      |FROM sh a JOIN sh b
      |  ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
      |CROSS JOIN m
      |WHERE b.doc_id * 10 > m.mx * 9
      |  AND len(a.sg) > 0 AND len(b.sg) > 0
      |  AND len(list_intersect(a.sg, b.sg)) * 10
      |      >= $productionThreshold10 * len(list_distinct(list_concat(a.sg, b.sg)))
      |ORDER BY a_id, b_id""".stripMargin

  /** Persisted pre-exploded inverted shingle index, BUCKETED by
    * shingle — q255b's production layout: the corpus side of the daily
    * probe joins straight off the bucketed files with no exchange (the
    * write already hash-clustered it), so the only shuffle left is the
    * delta-sized one. Table name carries the dir fingerprint: a
    * changed corpus gets a fresh build, an unchanged one reuses the
    * existing table across sessions (the persisted-snapshot contract —
    * same idea as IvfAnn.writeClustered, realized as a bucketed
    * catalog table). */
  private[graft] def bucketedShingleIndex(s: SparkSession, d: String): DataFrame = {
    // Plan-audit mode (VERDICT r9 #8): building the index is a
    // CONSTRUCTION-TIME WAREHOUSE MUTATION (saveAsTable + stale-
    // generation deletion), so plan-only tooling (PlanAuditSpec,
    // PlanDump — anything running under Ckpt.auditMode) must never
    // trigger it. In audit mode return the logically-equivalent
    // UNBUCKETED exploded frame instead: same columns, same rows, full
    // pre-materialization lineage for the audit to walk — and zero
    // writes (PlanAuditSpec asserts the warehouse is untouched).
    if (graft.plans.Ckpt.auditMode)
      return shingleBlocks(s, d)
        .select(col("doc_id"), col("sz"), col("lang"), col("lb"),
          explode(col("sg")).as("shingle"))
    val fp = graft.plans.DerivationCache.dirFingerprint(d)
    // Name = <dir-hash>_<fingerprint>: the dir part identifies every
    // generation of this corpus's index, the fingerprint part the
    // current one — so stale generations are enumerable and removed
    // below instead of leaking one full pre-exploded index per corpus
    // overwrite. Reuse is per catalog lifetime: the default in-memory
    // catalog forgets managed tables at JVM exit (a production
    // deployment keeps them in a persistent metastore — bucketing
    // metadata lives in the catalog, so raw parquet files alone cannot
    // be re-read AS a bucketed table).
    val dirTag = f"${scala.util.hashing.MurmurHash3.stringHash(d) & 0xffffffffL}%x"
    // Unsigned rendering keeps all 64 fingerprint bits in the name —
    // masking the sign bit (`fp & Long.MaxValue`) would fold pairs of
    // fingerprints onto one table name, halving collision resistance.
    val name = s"graft_shidx2_${dirTag}_${java.lang.Long.toUnsignedString(fp, 16)}"
    if (!s.catalog.tableExists(name)) {
      // warehouse walk via the Hadoop FileSystem API (the round-12
      // persist-log convention): resolved from the session's hadoopConf
      // so a distributed warehouse (hdfs://, s3a://) is managed the
      // same as the local spark-warehouse dir.
      val warehouse = new org.apache.hadoop.fs.Path(
        new java.net.URI(s.conf.get("spark.sql.warehouse.dir")))
      val fs = warehouse.getFileSystem(s.sparkContext.hadoopConfiguration)
      // drop every stale generation of THIS corpus's index (other
      // fingerprints), in the catalog and on disk
      if (fs.exists(warehouse)) fs.listStatus(warehouse).foreach { st =>
        val fn = st.getPath.getName
        if (fn.startsWith(s"graft_shidx2_${dirTag}_") && fn != name) {
          s.sql(s"DROP TABLE IF EXISTS $fn")
          fs.delete(st.getPath, true)
        }
      }
      val loc = new org.apache.hadoop.fs.Path(warehouse, name)
      if (fs.exists(loc)) fs.delete(loc, true) // orphaned location from a dead catalog
      // v2: bucketed by ALL pair-join keys — with the default
      // requireAllClusterKeysForCoPartition a shingle-only bucketing is
      // rejected and the planner silently falls back to a full shuffle
      shingleBlocks(s, d)
        .select(col("doc_id"), col("sz"), col("lang"), col("lb"),
          explode(col("sg")).as("shingle"))
        .write.mode("overwrite")
        .bucketBy(16, "shingle", "lang", "lb").sortBy("shingle", "lang", "lb")
        .saveAsTable(name)
    }
    s.table(name)
  }

  /** q255b's probe body over the pre-exploded bucketed index — shared
    * with ScaleSmoke's DELTAPROBE so the smoke always times the plan
    * the declared query ships. */
  private[graft] def bucketedDeltaPairs(
      idx: DataFrame, deltaSh: DataFrame, t10: Int): DataFrame = {
    val a = idx.select(col("doc_id").as("a_id"), col("sz").as("a_sz"),
      col("lang"), col("lb"), col("shingle"))
    val b = deltaSh.select(col("doc_id").as("b_id"), col("sz").as("b_sz"),
      col("lang").as("langb"), col("lb").as("lbb"),
      explode(col("sg")).as("shingleb"))
    val stats = a.join(b,
        col("shingle") === col("shingleb") && col("lang") === col("langb") &&
          col("lb") === col("lbb") && col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("a_sz"), col("b_sz"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("uni", col("a_sz") + col("b_sz") - col("inter"))
    finishJaccard(stats, t10)
  }

  /** Delta-restricted inverted-index near-dup probe over a prepared
    * shingle inventory: exact-Jaccard pairs (a_id < b_id) at t10/10
    * whose LARGER element lies in `shDelta`. `shIndex` models the
    * persisted corpus shingle inventory (callers checkpoint/persist it
    * untimed); only the delta side is "today's" work — the per-day cost
    * shape ScaleSmoke's DELTAPROBE mode measures against a fixed-size
    * delta on a growing corpus. */
  private[graft] def deltaNearDupProbe(
      shIndex: DataFrame, shDelta: DataFrame, t10: Int): DataFrame = {
    val exAll = shIndex.select(col("doc_id").as("a_id"), col("sz").as("a_sz"),
      col("lang"), col("lb"), explode(col("sg")).as("shingle"))
    val exNew = shDelta.select(col("doc_id").as("b_id"), col("sz").as("b_sz"),
      col("lang").as("langb"), col("lb").as("lbb"), explode(col("sg")).as("shingleb"))
    val stats = exAll.join(exNew,
        col("shingle") === col("shingleb") && col("lang") === col("langb") &&
          col("lb") === col("lbb") && col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("a_sz"), col("b_sz"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("uni", col("a_sz") + col("b_sz") - col("inter"))
    finishJaccard(stats, t10)
  }

  private def finishJaccard(stats: DataFrame, t10: Int): DataFrame =
    stats
      .filter(col("inter") * 10 >= col("uni") * t10)
      .select(col("a_id"), col("b_id"),
        floor(lit(10000.0) * col("inter") / col("uni")).as("jaccard_bp"))
      .orderBy(col("a_id"), col("b_id"))

  /** Memoized pair statistics per (session, fixture dir). Production
    * near-dup pipelines compute the pair graph ONCE per corpus snapshot
    * and feed it to the pairs report (q43), cluster collapse (q70), and
    * corpus removal (q82) — this cache is that persisted intermediate
    * (same contract as IvfAnn.cachedIndex: RNG-free derivation over an
    * immutable fixture dir, so the cached frame equals a recomputation
    * bit-for-bit). Tools that MEASURE the join itself (ScaleSmoke,
    * RecallCheck) call jaccardCountJoinAt, which stays uncached. */
  private val pairStatsCache = new graft.plans.DerivationCache[DataFrame]

  /** The shared pair-graph build, promoted to the BUCKETED layout
    * (VERDICT r8 #4 — q255b's persisted inventory feeding the whole
    * family): the inverted-index self-join reads BOTH sides off the
    * bucketed shingle table already hash-clustered on
    * (shingle, lang, lb), so the corpus-sized exchange the raw count
    * join pays twice is gone entirely — the only shuffle left is the
    * pair-output-sized group-by. Same output as blockedPairStats by
    * construction (same join condition and aggregation over the same
    * exploded rows; ScienceSpec proves equality and pins the plan). */
  private[graft] def bucketedPairStats(s: SparkSession, d: String): DataFrame = {
    val idx = bucketedShingleIndex(s, d)
    val a = idx.select(col("doc_id").as("a_id"), col("sz").as("a_sz"),
      col("lang"), col("lb"), col("shingle"))
    val b = idx.select(col("doc_id").as("b_id"), col("sz").as("b_sz"),
      col("lang").as("langb"), col("lb").as("lbb"),
      col("shingle").as("shingleb"))
    a.join(b, col("shingle") === col("shingleb") && col("lang") === col("langb") &&
        col("lb") === col("lbb") && col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("a_sz"), col("b_sz"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("uni", col("a_sz") + col("b_sz") - col("inter"))
  }

  /** CONSTRUCTION-TIME SIDE EFFECTS (ADVICE r9): routing through
    * bucketedPairStats means EVERY pair-graph consumer (q43, the
    * q44c family, q70, q82, q217, q221, q226, q260, q266, …) touches
    * the warehouse on first construction per corpus snapshot —
    * bucketedShingleIndex saveAsTables the exploded inventory and
    * deletes stale generations. Plan-only tooling is exempt: under
    * Ckpt.auditMode the build is replaced by the logically-equivalent
    * unbucketed frame and nothing is written. */
  private def cachedPairStats(s: SparkSession, d: String): DataFrame =
    pairStatsCache.getOrCompute(s, d)(bucketedPairStats(s, d).ckpt())

  private def jaccardCountJoin(s: SparkSession, d: String): DataFrame =
    finishJaccard(cachedPairStats(s, d), jaccardThreshold10)

  /** Uncached, threshold-parameterized form for measurement tools and
    * tests — never reads or populates the cache. */
  private[graft] def jaccardCountJoinAt(s: SparkSession, d: String, t10: Int): DataFrame =
    finishJaccard(blockedPairStats(s, d), t10)

  /** Unblocked exact all-pairs Jaccard at threshold t10/10 — O(n²) by
    * construction, test-scale only: the anchor DedupSpec compares the
    * LSH banding candidates against to certify recall = 1.0 on a
    * fixture (which is what makes the q44 oracle deterministic). */
  private[graft] def exactJaccardPairsAt(s: SparkSession, d: String, t10: Int): DataFrame = {
    val sh = docsWithShingles(s, d)
      .select(col("doc_id"), col("shingles").as("sg"), size(col("shingles")).as("sz"))
      .filter(col("sz") > 0)
    val a = sh.select(col("doc_id").as("a_id"), col("sg").as("sga"), col("sz").as("a_sz"))
    val b = sh.select(col("doc_id").as("b_id"), col("sg").as("sgb"), col("sz").as("b_sz"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("inter", size(array_intersect(col("sga"), col("sgb"))))
      .withColumn("uni", col("a_sz") + col("b_sz") - col("inter"))
      .filter(col("inter") * 10 >= col("uni") * t10)
      .select(col("a_id"), col("b_id"),
        floor(lit(10000.0) * col("inter") / col("uni")).as("jaccard_bp"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Prefix-filtered candidate generation + exact array verification
    * (PPJoin). Correct for any corpus; pays off when shingle document
    * frequencies are skewed. Three filters shrink the candidate set
    * before the distinct/verify stages:
    *  - prefix filter: a pair with J ≥ t must share one of the first
    *    |X| − ⌈t·|X|⌉ + 1 shingles in the global rarest-first order;
    *  - length filter: J ≥ t forces t·|A| ≤ |B| ≤ |A|/t;
    *  - positional filter: a shared prefix shingle at ranks (pa, pb)
    *    caps the overlap at 1 + min(|A|−pa, |B|−pb), which must still
    *    reach α = ⌈ t/(1+t)·(|A|+|B|) ⌉ (J ≥ t ⟺ |A∩B| ≥ α). */

  private[graft] def jaccardPrefixJoinAt(s: SparkSession, d: String, t10: Int): DataFrame = {
    val sh = shingleBlocks(s, d)
    val ex = sh.select(col("doc_id"), col("lang"), col("lb"), col("sz"),
      explode(col("sg")).as("shingle"))
    val dfreq = ex.groupBy(col("lang"), col("lb"), col("shingle"))
      .agg(count(lit(1)).as("df"))
    // ONE aggregation builds the canonical view: each doc's shingles
    // sorted by the global rarest-first (df, shingle) order. Ranks are
    // just positions in this array, so no separate row_number window —
    // the prefix re-explodes from a slice of it.
    val sorted = ex.join(dfreq, Seq("lang", "lb", "shingle"))
      .groupBy(col("doc_id"), col("lang"), col("lb"), col("sz"))
      .agg(transform(array_sort(collect_list(struct(col("df"), col("shingle")))),
        x => x.getField("shingle")).as("ssg"))
    // prefix length |A| − ceil(t·|A|) + 1  (integer ceil: (sz*t10+9)/10)
    val prefLen = col("sz") - floor((col("sz") * t10 + 9) / 10).cast("int") + 1
    val prefix = sorted
      .select(col("doc_id"), col("lang"), col("lb"), col("sz"),
        posexplode(slice(col("ssg"), lit(1), greatest(prefLen, lit(0)))).as(Seq("pos", "shingle")))
      .withColumn("rnk", col("pos") + 1)
    val a = prefix.select(col("doc_id").as("a_id"), col("lang"), col("lb"),
      col("shingle"), col("sz").as("a_sz"), col("rnk").as("a_rnk"))
    val b = prefix.select(col("doc_id").as("b_id"), col("lang").as("langb"),
      col("lb").as("lbb"), col("shingle").as("shingleb"),
      col("sz").as("b_sz"), col("rnk").as("b_rnk"))
    val alpha = ceil((col("a_sz") + col("b_sz")) * t10 / lit(10.0 + t10))
    val ubound = lit(1) + least(col("a_sz") - col("a_rnk"), col("b_sz") - col("b_rnk"))
    // Candidate aggregation doubles as the first half of PPJoin's
    // verification: cnt = exact |prefix(A) ∩ prefix(B)|, (pa, pb) = the
    // two positions of the canonically-LARGEST matched prefix shingle
    // (independent maxes agree because both docs are sorted by the same
    // global (df, shingle) order), and the pair survives if any match
    // passes the positional overlap bound.
    val cand = a.join(b, col("shingle") === col("shingleb") && col("lang") === col("langb")
        && col("lb") === col("lbb") && col("a_id") < col("b_id")
        && col("b_sz") * 10 >= col("a_sz") * t10
        && col("a_sz") * 10 >= col("b_sz") * t10)
      .groupBy(col("a_id"), col("b_id"), col("a_sz"), col("b_sz"))
      .agg(count(lit(1)).as("cnt"),
        max(col("a_rnk")).as("pa"), max(col("b_rnk")).as("pb"),
        max(when(ubound >= alpha, 1).otherwise(0)).as("ok"))
      .filter(col("ok") === 1)
      .drop("ok")
    val sa = sorted.select(col("doc_id").as("a_id"), col("ssg").as("sga"))
    val sb = sorted.select(col("doc_id").as("b_id"), col("ssg").as("sgb"))
    // PPJoin suffix verification: every common shingle not already in
    // cnt is canonically larger than the last matched one, hence sits
    // strictly after position pa in A AND after pb in B — so the exact
    // overlap is cnt + |A[pa+1..] ∩ B[pb+1..]|, never a whole-array
    // re-intersection.
    cand.join(sa, "a_id").join(sb, "b_id")
      .withColumn("inter", col("cnt") + size(array_intersect(
        slice(col("sga"), col("pa") + 1, greatest(col("a_sz") - col("pa"), lit(0))),
        slice(col("sgb"), col("pb") + 1, greatest(col("b_sz") - col("pb"), lit(0))))))
      .withColumn("uni", col("a_sz") + col("b_sz") - col("inter"))
      .filter(col("inter") * 10 >= col("uni") * t10)
      .select(col("a_id"), col("b_id"),
        floor(lit(10000.0) * col("inter") / col("uni")).as("jaccard_bp"))
      .orderBy(col("a_id"), col("b_id"))
  }

  // ---- adaptive join selection (SCALE.md finding 1's missing piece) ----

  /** Docs sampled for the skew probe: deterministic content-independent
    * 1-in-20 by id hash — reproducible across runs (never rand()), and
    * the probe cost is ~5% of one shingle-explode + groupBy. */
  private[graft] val SkewSampleMod = 20L

  /** Route to PPJoin when the SAMPLED df-weighted mean document
    * frequency exceeds this. On a uniform corpus the sampled df is ~1
    * (a 1-in-20 doc sample cuts every df by ~20×, and uniform corpora
    * have small df to begin with), so the count join — whose cost is
    * the co-occurrence volume Σ df² — wins. On a Zipf corpus the hot
    * shingles dominate occurrence mass even after sampling (df_hot ≈
    * sample size), the weighted mean blows past the threshold, and the
    * prefix filter's rarest-first pruning is worth its extra passes.
    * SCALE.md's measured crossover (count join wins at t=0.3 uniform,
    * PPJoin 4-6× at t=0.8 zipf) is exactly the boundary this encodes. */
  private[graft] val SkewPickThreshold = 8.0

  /** Sampled shingle-frequency skew statistic: E_occurrence[df] =
    * Σ df² / Σ df over the sampled sub-corpus — the expected join
    * fan-out per shingle occurrence. A driver-side planning scalar
    * (same contract as Extract.keyBounds): one tiny job at plan time,
    * never a per-row action. Memoized per (session, dir fingerprint)
    * like cachedPairStats — constructing q43c/q89 is otherwise an
    * eager probe job on EVERY construction (each bench rep, each
    * harness materialization), not just the first. */
  private val skewStatCache = new graft.plans.DerivationCache[java.lang.Double]

  private[graft] def shingleSkewStat(s: SparkSession, d: String): Double =
    skewStatCache.getOrCompute(s, d)(Double.box(computeShingleSkewStat(s, d)))

  private def computeShingleSkewStat(s: SparkSession, d: String): Double = {
    val sh = shingleBlocks(s, d)
      .filter(pmod(xxhash64(col("doc_id")), lit(SkewSampleMod)) === 0)
    val dfreq = sh.select(col("lang"), col("lb"), explode(col("sg")).as("shingle"))
      .groupBy("lang", "lb", "shingle").agg(count(lit(1)).as("df"))
    val row = dfreq
      .agg(sum(col("df") * col("df")).as("s2"), sum(col("df")).as("s1")).head()
    if (row.isNullAt(1) || row.getLong(1) == 0L) 1.0
    else row.getLong(0).toDouble / row.getLong(1)
  }

  /** Adaptive exact-Jaccard join: probes the corpus' shingle-frequency
    * skew and routes to the count join (uniform df) or PPJoin (skewed
    * df). Both branches are exact at threshold t10/10 and blocked by
    * (lang, length bucket), so the choice never changes the result —
    * certified in DedupSpec (picker routes + hash-identical outputs). */
  private[graft] def adaptiveJaccardJoinAt(
      s: SparkSession, d: String, t10: Int): (String, DataFrame) = {
    if (shingleSkewStat(s, d) > SkewPickThreshold)
      ("ppjoin", jaccardPrefixJoinAt(s, d, t10))
    else
      // threshold-independent memoized pair graph (cachedPairStats) —
      // the count branch shares q43/q70/q82's persisted intermediate
      ("count", finishJaccard(cachedPairStats(s, d), t10))
  }

  /** q89's count-join shape: language-blocked pair stats + containment
    * threshold (|A∩B|/min ≥ 0.5). */
  private[graft] def containmentCountJoin(s: SparkSession, d: String): DataFrame =
    pairStatsBlockedBy(s, d, useLenBucket = false)
      .filter(col("inter") * 10 >= least(col("a_sz"), col("b_sz")) * 5)
      .select(col("a_id"), col("b_id"),
        floor(lit(10000.0) * col("inter") / least(col("a_sz"), col("b_sz")))
          .as("containment_bp"))
      .orderBy(col("a_id"), col("b_id"))

  /** Adaptive containment join — q43c's routing applied to its
    * sibling: the sampled shingle-skew probe picks the count join
    * (uniform df) or the asymmetric prefix filter (skewed df). Both
    * exact, identical output. */
  private[graft] def adaptiveContainmentJoin(
      s: SparkSession, d: String): (String, DataFrame) = {
    if (shingleSkewStat(s, d) > SkewPickThreshold)
      ("prefix", containmentPrefixJoin(s, d))
    else
      ("count", containmentCountJoin(s, d))
  }

  /** Containment-specialized prefix join (q89's scale lever, NOTES
    * backlog #4): same output as the language-blocked count join, but
    * candidates come from an ASYMMETRIC prefix filter. For containment
    * |A∩B|/min ≥ 0.5 the SMALLER doc must contribute ≥ ⌈m/2⌉
    * intersection elements, so at least one lies in its ⌊m/2⌋+1
    * RAREST shingles — the prefix. The smaller side explodes only that
    * prefix; the larger side explodes fully (containment puts no bound
    * on where matches sit in the larger doc). Hot shingles almost never
    * make a prefix (they sort last in the rarest-first canonical
    * order), so hot-shingle candidate volume collapses from df² to
    * df·(few) — the skewed-corpus regime, measured in SCALE.md.
    * Verification reuses PPJoin's suffix trick: both docs share one
    * global (df, shingle) sort, so the exact intersection is the
    * matched-prefix count plus one suffix-slice array_intersect. */
  private[graft] def containmentPrefixJoin(s: SparkSession, d: String): DataFrame = {
    val sh = shingleBlocks(s, d)
    val ex = sh.select(col("doc_id"), col("lang"), col("sz"),
      explode(col("sg")).as("shingle"))
    val dfreq = ex.groupBy(col("lang"), col("shingle")).agg(count(lit(1)).as("df"))
    val sorted = ex.join(dfreq, Seq("lang", "shingle"))
      .groupBy(col("doc_id"), col("lang"), col("sz"))
      .agg(transform(array_sort(collect_list(struct(col("df"), col("shingle")))),
        x => x.getField("shingle")).as("ssg"))
    val prefLen = (floor(col("sz") / 2) + 1).cast("int")
    val prefix = sorted
      .select(col("doc_id"), col("lang"), col("sz"),
        posexplode(slice(col("ssg"), lit(1), prefLen)).as(Seq("pos", "shingle")))
      .withColumn("rnk", col("pos") + 1)
    val full = sorted
      .select(col("doc_id"), col("lang"), col("sz"),
        posexplode(col("ssg")).as(Seq("pos", "shingle")))
      .withColumn("rnk", col("pos") + 1)
    val a = prefix.select(col("doc_id").as("s_id"), col("lang"), col("shingle"),
      col("sz").as("s_sz"), col("rnk").as("s_rnk"))
    val b = full.select(col("doc_id").as("l_id"), col("lang").as("langb"),
      col("shingle").as("shingleb"), col("sz").as("l_sz"), col("rnk").as("l_rnk"))
    // (s) is the canonically smaller doc; ties break by id so every
    // pair is generated exactly once, from its smaller side's prefix.
    val smallerFirst = col("s_sz") < col("l_sz") ||
      (col("s_sz") === col("l_sz") && col("s_id") < col("l_id"))
    val alpha = floor((col("s_sz") + 1) / 2) // ceil(m/2)
    val ubound = lit(1) + least(col("s_sz") - col("s_rnk"), col("l_sz") - col("l_rnk"))
    val cand = a.join(b, col("shingle") === col("shingleb")
        && col("lang") === col("langb") && smallerFirst)
      .groupBy(col("s_id"), col("l_id"), col("s_sz"), col("l_sz"))
      .agg(count(lit(1)).as("cnt"),
        max(col("s_rnk")).as("pa"), max(col("l_rnk")).as("pb"),
        max(when(ubound >= alpha, 1).otherwise(0)).as("ok"))
      .filter(col("ok") === 1)
      .drop("ok")
    val sa = sorted.select(col("doc_id").as("s_id"), col("ssg").as("sga"))
    val sb = sorted.select(col("doc_id").as("l_id"), col("ssg").as("sgb"))
    cand.join(sa, "s_id").join(sb, "l_id")
      .withColumn("inter", col("cnt") + size(array_intersect(
        slice(col("sga"), col("pa") + 1, greatest(col("s_sz") - col("pa"), lit(0))),
        slice(col("sgb"), col("pb") + 1, greatest(col("l_sz") - col("pb"), lit(0))))))
      .filter(col("inter") * 10 >= col("s_sz") * 5)
      .select(least(col("s_id"), col("l_id")).as("a_id"),
        greatest(col("s_id"), col("l_id")).as("b_id"),
        floor(lit(10000.0) * col("inter") / col("s_sz")).as("containment_bp"))
      .orderBy(col("a_id"), col("b_id"))
  }

  // ---- queries ----------------------------------------------------------

  val qs: Seq[Q] = Seq(

    // Exact dedup, phase 1: content-hash groups with their sizes.
    Q("q41_dedup_exact_groups",
      """SELECT sha256(text) AS content_hash, count(*) AS n_docs,
        |  min(doc_id) AS keeper
        |FROM documents
        |GROUP BY content_hash
        |ORDER BY content_hash""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(sha2(col("text"), 256).as("content_hash"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
        .orderBy(col("content_hash"))
    },

    // Exact dedup, phase 2: deterministic survivors (min doc_id per
    // content hash) — the scalable replacement for dropDuplicates(text).
    Q("q42_dedup_exact_survivors",
      """SELECT doc_id, lang, source
        |FROM (SELECT doc_id, lang, source,
        |        row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        |      FROM documents) t
        |WHERE rn = 1
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(sha2(col("text"), 256)).orderBy(col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // Incremental (daily-delta) exact dedup — the production shape
    // where yesterday's survivor set already exists and only TODAY'S
    // batch is processed: each new doc is either a duplicate of an
    // established survivor (hash anti-joins fail → 'dup_of_old'), a
    // duplicate within its own batch ('dup_in_batch', canonical = the
    // smallest new doc_id with that hash), or 'fresh'. The established
    // corpus contributes ONE hash-groupBy (in production: a read of the
    // persisted survivor table — never rescanned text), the batch one
    // window — nothing is quadratic and the old corpus is never
    // re-deduped. doc_id % 5 == 0 stands in for "today's batch".
    Q("q137_incremental_dedup",
      """WITH old AS (SELECT sha256(text) AS h, min(doc_id) AS keeper
        |  FROM documents WHERE doc_id % 5 <> 0 GROUP BY h),
        |new AS (SELECT doc_id, sha256(text) AS h FROM documents
        |  WHERE doc_id % 5 = 0),
        |nw AS (SELECT doc_id, h,
        |  CAST(row_number() OVER (PARTITION BY h ORDER BY doc_id) AS INTEGER) AS rn,
        |  min(doc_id) OVER (PARTITION BY h) AS batch_min FROM new)
        |SELECT nw.doc_id,
        |  CASE WHEN old.keeper IS NOT NULL THEN 'dup_of_old'
        |       WHEN nw.rn > 1 THEN 'dup_in_batch'
        |       ELSE 'fresh' END AS status,
        |  CASE WHEN old.keeper IS NOT NULL THEN old.keeper
        |       WHEN nw.rn > 1 THEN nw.batch_min
        |       ELSE nw.doc_id END AS canonical_id
        |FROM nw LEFT JOIN old ON nw.h = old.h
        |ORDER BY nw.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val old = docs.filter(col("doc_id") % 5 =!= 0)
        .groupBy(sha2(col("text"), 256).as("h"))
        .agg(min(col("doc_id")).as("keeper"))
      val w = Window.partitionBy("h").orderBy("doc_id")
      val nw = docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), sha2(col("text"), 256).as("h"))
        .withColumn("rn", row_number().over(w))
        .withColumn("batch_min",
          min(col("doc_id")).over(Window.partitionBy("h")))
      nw.join(old, Seq("h"), "left")
        .select(col("doc_id"),
          when(col("keeper").isNotNull, "dup_of_old")
            .when(col("rn") > 1, "dup_in_batch")
            .otherwise("fresh").as("status"),
          when(col("keeper").isNotNull, col("keeper"))
            .when(col("rn") > 1, col("batch_min"))
            .otherwise(col("doc_id")).as("canonical_id"))
        .orderBy("doc_id")
    },

    // n-gram Jaccard near-dup: word-3-gram shingle sets, candidate pairs
    // blocked by (lang, length bucket) — never all-pairs.
    Q("q43_ngram_jaccard", jaccardOracleSql)(jaccardCountJoin),

    // The PPJoin-style prefix filter, declared at t = 0.8 — its design
    // regime (the production near-dup dedup threshold): for J(A,B) ≥ t,
    // |A∩B| ≥ ceil(t·|A|), so with shingles in a global rarest-first
    // canonical order the first |A| − ⌈t·|A|⌉ + 1 shingles of each doc
    // must contain a common element; at t = 0.8 that prefix is ~27% of
    // each doc and drops every hot shingle from candidate generation
    // (3-4× over the count join under Zipfian skew — SCALE.md). At low
    // thresholds the prefix prunes little and the count join (q43)
    // wins; the engine picks by threshold. Same exact semantics, own
    // oracle at its own threshold.
    // Baseline-tagged (VERDICT r9 #3): the all-pairs-prefix form is the
    // oracle/law anchor for the routed q43c — scale callers invoke the
    // sibling; the registry tag makes the quadratic shape filterable.
    Q.baseline("q43b_jaccard_prefix", jaccardOracleSqlAt(productionThreshold10),
      sibling = "q43c_jaccard_adaptive")(
      (s, d) => jaccardPrefixJoinAt(s, d, productionThreshold10)),

    // The engine-facing entry point: probe sampled shingle-frequency
    // skew, then route to the count join or PPJoin (adaptiveJaccardJoinAt
    // — both exact, both blocked, identical output either way). On the
    // uniform synthetic corpus this resolves to the count join; the
    // Zipf regime is exercised by DedupSpec's planted hot-shingle
    // corpus. Oracle is threshold-t=0.8 exact Jaccard, route-agnostic.
    Q("q43c_jaccard_adaptive", jaccardOracleSqlAt(productionThreshold10))(
      (s, d) => adaptiveJaccardJoinAt(s, d, productionThreshold10)._2),

    // MinHash-LSH near-dup: banding generates candidate pairs (bucket-
    // local self-join, never all-pairs), then an exact-Jaccard verify
    // pass keeps true near-dups — the standard two-stage production
    // shape. The verify threshold is aligned with the 8-band × 4-row
    // S-curve: at t = 0.8 a qualifying pair is missed w.p.
    // (1−J⁴)⁸ ≤ 1.5% (vs ~94% at t = 0.3, which would make the oracle
    // unsound for any mid-similarity pair), and DedupSpec certifies
    // recall is exactly 1.0 on the shipped sf0.01 fixture by comparing
    // against the unblocked O(n²) exact pair set — so the DuckDB oracle
    // (ALL pairs with J ≥ 0.8) recomputes the output deterministically.
    // This is the documented re-computation invariant (SURVEY §5.1):
    // approximate candidate generation, exact verified output.
    Q("q44_minhash_lsh",
      s"""WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, CASE WHEN len(string_split(text,' ')) >= 3
        |                    THEN len(string_split(text,' ')) - 1 ELSE 1 END),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |           || ' ' || string_split(text,' ')[i+2])) AS sg
        |  FROM documents
        |)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(floor(10000.0 * len(list_intersect(a.sg, b.sg))
        |       / len(list_distinct(list_concat(a.sg, b.sg)))) AS BIGINT) AS jaccard_bp
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE len(a.sg) > 0 AND len(b.sg) > 0
        |  AND len(list_intersect(a.sg, b.sg)) * 10
        |      >= $productionThreshold10 * len(list_distinct(list_concat(a.sg, b.sg)))
        |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
      val docs = docsWithShingles(s, d, fan = true) // A/B r17: 2.0 -> 1.1 s
        .filter(size(col("shingles")) > 0)
        .select(col("doc_id"), col("shingles"), size(col("shingles")).as("sz"))
      val sig = docs
        .withColumn("hx", shingleHashes(col("shingles")))
        .select(col("doc_id"), minhashSig(s, col("hx")).as("sig"))
        .select(col("doc_id"), posexplode(bandKeys(col("sig"))).as(Seq("band", "key")))
      val a = sig.select(col("doc_id").as("a_id"), col("band"), col("key"))
      val b = sig.select(col("doc_id").as("b_id"), col("band").as("band_b"), col("key").as("key_b"))
      val cand = a.join(b, col("band") === col("band_b") && col("key") === col("key_b")
          && col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
      val sa = docs.select(col("doc_id").as("a_id"), col("shingles").as("sga"), col("sz").as("a_sz"))
      val sb = docs.select(col("doc_id").as("b_id"), col("shingles").as("sgb"), col("sz").as("b_sz"))
      cand.join(sa, "a_id").join(sb, "b_id")
        .withColumn("inter", size(array_intersect(col("sga"), col("sgb"))))
        .withColumn("uni", col("a_sz") + col("b_sz") - col("inter"))
        .filter(col("inter") * 10 >= col("uni") * productionThreshold10)
        .select(col("a_id"), col("b_id"),
          floor(lit(10000.0) * col("inter") / col("uni")).as("jaccard_bp"))
        .orderBy("a_id", "b_id")
    },

    // Shingle CONTAINMENT pairs: C(A,B) = |A∩B| / min(|A|,|B|) ≥ 0.5 —
    // catches near-SUBSET relations (a doc quoting or embedding a
    // smaller doc) that Jaccard structurally misses when sizes are
    // skewed (J ≤ min/max regardless of overlap). Because the
    // interesting pairs are exactly the cross-size ones, blocking is by
    // language ONLY — no length bucket (q43's lb blocking would throw
    // away every asymmetric pair). Same inverted-index count-join
    // shape: cost is shingle co-occurrence volume within a language,
    // never corpus².
    Q("q89_containment",
      """WITH sh AS (
        |  SELECT doc_id, lang,
        |    list_distinct(list_transform(
        |      range(1, CASE WHEN len(string_split(text,' ')) >= 3
        |                    THEN len(string_split(text,' ')) - 1 ELSE 1 END),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |           || ' ' || string_split(text,' ')[i+2])) AS sg
        |  FROM documents
        |)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(floor(10000.0 * len(list_intersect(a.sg, b.sg))
        |       / least(len(a.sg), len(b.sg))) AS BIGINT) AS containment_bp
        |FROM sh a JOIN sh b
        |  ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE len(a.sg) > 0 AND len(b.sg) > 0
        |  AND len(list_intersect(a.sg, b.sg)) * 10
        |      >= 5 * least(len(a.sg), len(b.sg))
        |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
      // Adaptive like q43c: the same sampled skew probe routes to the
      // asymmetric prefix filter when hot shingles dominate (where the
      // count join's co-occurrence volume explodes — SCALE.md measures
      // the crossover), else to the count join. Both paths are exact
      // and equal (DedupSpec proves it on two fixtures + the Zipf
      // routing corpus).
      adaptiveContainmentJoin(s, d)._2
    },

    // 32-bit SimHash document signatures, sha256-derived so the oracle
    // recomputes them exactly (generated SQL, see simhashOracleSql).
    Q("q45_simhash", simhashOracleSql) { (s, d) =>
      // shared memoized build — one signature aggregation feeds
      // q45/q216/q216c per corpus snapshot
      simhashSigs(s, d)._1.orderBy(col("doc_id"))
    },

    // SimHash near-neighbor pairs via 8-bit banding — the SCALE path
    // for q45's signatures (the all-pairs hamming compare a naive
    // implementation would do is quadratic). Pigeonhole guarantee: a
    // pair within hamming ≤ 3 over 32 bits differs in at most 3 of the
    // 4 bands, so at least one band matches exactly → banded-join
    // recall is 1.0, NOT probabilistic (unlike MinHash banding), and
    // the bucket join + exact bit_count verify recomputes in DuckDB.
    Q.baseline("q216_simhash_neighbors", simhashNeighborsOracleSql,
      sibling = "q216c_simhash_neighbors_routed") { (s, d) =>
      // Banding runs over DISTINCT signatures, not docs (shared
      // memoized build): the banded join's volume then tracks
      // signature diversity, and repeated-sig doc groups expand
      // afterwards. KNOWN-QUADRATIC past ~2560 distinct signatures
      // (6.0 per-unit at 100×, SCALE.md round 8) — q216c is the
      // routed production entry; this declared form is the
      // low-diversity branch kept for the q43b precedent (direct
      // branch visibility + oracle coverage).
      val (sig, uniq, _) = simhashSigs(s, d)
      simhashBandedPairs(sig, uniq)
    },

    // Routed production entry for the 32-bit simhash neighbor
    // semantic (VERDICT r8 #2, the q43c precedent): distinct-signature
    // count routes banding (sparse signature space) vs 16-bit
    // half-expansion MIH (dense). Both branches recall-1 by the k = 3
    // pigeonhole and verify with the identical exact bit_count filter,
    // so the output is route-independent — DedupSpec proves branch
    // identity on both regimes; the oracle is route-agnostic.
    Q("q216c_simhash_neighbors_routed", simhashNeighborsOracleSql)(
      (s, d) => adaptiveSimhashNeighbors(s, d)._2),

    // (q216's banding fan-out profiler lives below as
    // simhashBandProfile — measurement tool, not a declared query.)

    // q216's 100×-Heaps scale path: 64-bit simhash, 4 bands × 16 bits.
    // SCALE.md round 8 measured the 32-bit/8-bit-band form saturating
    // its 256-bucket band space at 500k docs (Σsz² up 92×, wall-clock
    // 6.0 per-unit — quadratic despite linear output). Recall-1
    // banding for hamming ≤ 3 needs 4 disjoint bands (pigeonhole), so
    // more buckets requires a WIDER signature, not more bands: 16-bit
    // bands give 65536 buckets/band — bucket occupancy stays O(n/65536)
    // and the candidate join tracks output again. Same sha256-derived
    // construction (first 16 hex digits → 64 signed bit sums), so
    // DuckDB rebuilds the identical signature AND band values — band
    // values are assembled independently as small positive ints (never
    // a shift of the negative 64-bit sig, where // and % semantics
    // diverge across engines).
    Q("q216b_simhash64_neighbors", {
      val sigSql = simhash64OracleSql
      s"""$sigSql,
         |bb AS (SELECT doc_id, simhash, band,
         |    CASE band WHEN 0 THEN bv0 WHEN 1 THEN bv1
         |              WHEN 2 THEN bv2 ELSE bv3 END AS bv
         |  FROM (SELECT doc_id, simhash, bv0, bv1, bv2, bv3,
         |        unnest([0, 1, 2, 3]) AS band FROM sig64)),
         |p AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         |    a.simhash AS sa, b.simhash AS sb
         |  FROM bb a JOIN bb b
         |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
         |SELECT a_id, b_id,
         |  CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         |FROM p WHERE bit_count(xor(sa, sb)) <= 3
         |ORDER BY a_id, b_id""".stripMargin
    }) { (s, d) =>
      // fan out before the signature build: one sha256 per token makes
      // the serial single-split chain this query's hot spot
      // (ProfileOne r17: a 740 ms single-task stage; no-op at scale)
      val tokens = Tables.documents(s, d).spread(col("doc_id"))
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("token"))
      val sig = simhash64Agg(tokens).ckpt() // members + distinct
      val uniq = sig.select("simhash", "bv0", "bv1", "bv2", "bv3")
        .distinct().ckpt()
      val bb = uniq.select(col("simhash"), posexplode(
          array(col("bv0"), col("bv1"), col("bv2"), col("bv3"))).as(Seq("band", "bv")))
      val sigPairs = bb.select(col("simhash").as("sa"), col("band"), col("bv"))
        .join(bb.select(col("simhash").as("sb"), col("band").as("bandb"),
          col("bv").as("bvb")),
          col("band") === col("bandb") && col("bv") === col("bvb")
            && col("sa") < col("sb"))
        .select(col("sa"), col("sb")).distinct()
        .withColumn("hamming", expr("CAST(bit_count(sa ^ sb) AS BIGINT)"))
        .where(col("hamming") <= 3)
      val mA = sig.select(col("simhash").as("sa"), col("doc_id").as("da"))
      val mB = sig.select(col("simhash").as("sb"), col("doc_id").as("db"))
      val cross = sigPairs.join(mA, "sa").join(mB, "sb")
        .select(least(col("da"), col("db")).as("a_id"),
          greatest(col("da"), col("db")).as("b_id"), col("hamming"))
      val within = sig.select(col("simhash"), col("doc_id").as("a_id"))
        .join(sig.select(col("simhash"), col("doc_id").as("b_id")), "simhash")
        .where(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), lit(0L).as("hamming"))
      cross.unionByName(within).orderBy("a_id", "b_id")
    },

    // Dedup threshold-sensitivity sweep: how many near-dup pairs each
    // candidate Jaccard threshold would flag — the certificate a data
    // team reads before choosing t (the pair count's elbow). ONE pass
    // over the memoized pair graph (threshold-independent stats),
    // fanned across the 7 thresholds by a broadcast cross join; never
    // re-joins the corpus per threshold.
    Q("q217_threshold_sweep",
      """WITH sh AS (
        |  SELECT doc_id, lang, n_chars // 100 AS lb,
        |    list_distinct(list_transform(
        |      range(1, CASE WHEN len(string_split(text,' ')) >= 3
        |                    THEN len(string_split(text,' ')) - 1 ELSE 1 END),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |           || ' ' || string_split(text,' ')[i+2])) AS sg
        |  FROM documents),
        |p AS (SELECT len(list_intersect(a.sg, b.sg)) AS i,
        |    len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg)) AS u
        |  FROM sh a JOIN sh b
        |    ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
        |  WHERE len(a.sg) > 0 AND len(b.sg) > 0
        |    AND len(list_intersect(a.sg, b.sg)) > 0),
        |t AS (SELECT unnest([3, 4, 5, 6, 7, 8, 9]) AS t10)
        |SELECT CAST(t.t10 AS BIGINT) AS t10,
        |  CAST(coalesce(sum(CASE WHEN p.i * 10 >= p.u * t.t10
        |    THEN 1 END), 0) AS BIGINT) AS n_pairs
        |FROM t LEFT JOIN p ON true GROUP BY t.t10 ORDER BY t10""".stripMargin) { (s, d) =>
      // Shape note: the pair-stats side must stay the STREAMED side —
      // a broadcast hint on the left of a LEFT join is unusable (the
      // left side can't be the hash-build side), and the fallback
      // nested-loop could pick the corpus-sized frame to build. So:
      // cross-join the 7-row threshold frame INTO the stream, count,
      // then left-join the thresholds onto the 7-row result to keep
      // zero-pair thresholds.
      val stats = cachedPairStats(s, d).select(col("inter"), col("uni"))
      val t = s.range(3, 10).select(col("id").as("t10"))
      val counts = stats.crossJoin(broadcast(t))
        .filter(col("inter") * 10 >= col("uni") * col("t10"))
        .groupBy("t10").agg(count(lit(1)).as("cnt"))
      t.join(counts, Seq("t10"), "left")
        .select(col("t10"), coalesce(col("cnt"), lit(0L)).as("n_pairs"))
        .orderBy("t10")
    },

    // Vocabulary growth curve (Heaps-law certificate): new distinct
    // tokens first seen in each corpus decile, with the cumulative
    // curve — how fast the vocabulary is still growing tells a
    // pipeline whether its token-frequency assumptions transfer to
    // the next 10× of data. First-occurrence is a min-aggregate per
    // token (one shuffle); deciles come from VALUE-LEVEL doc_id
    // thresholds (PrefixScan + 9-threshold broadcast, the q177
    // machinery — never a global row window); the cumulative sum runs
    // over the 10-row output frame.
    Q("q218_vocab_growth", {
      val tDefs = (1 to 9)
        .map(k => s"min(CASE WHEN cum >= (($k * n.n + 9) // 10) THEN val END) AS t$k")
        .mkString(",\n    ")
      val decile = "1 " + (1 to 9)
        .map(k => s"+ CASE WHEN fo.fd > t.t$k THEN 1 ELSE 0 END").mkString(" ")
      s"""WITH docs AS (SELECT DISTINCT doc_id FROM documents),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM docs),
         |cu AS (SELECT doc_id AS val,
         |    sum(1) OVER (ORDER BY doc_id) AS cum FROM docs),
         |t AS (SELECT
         |    $tDefs
         |  FROM cu CROSS JOIN n),
         |fo AS (SELECT token, min(doc_id) AS fd
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
         |        FROM documents) GROUP BY token),
         |g AS (SELECT ($decile) AS decile,
         |    CAST(count(*) AS BIGINT) AS new_tokens
         |  FROM fo CROSS JOIN t GROUP BY 1)
         |SELECT CAST(decile AS BIGINT) AS decile, new_tokens,
         |  CAST(sum(new_tokens) OVER (ORDER BY decile) AS BIGINT)
         |    AS cum_tokens
         |FROM g ORDER BY decile""".stripMargin
    }) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id")).distinct()
        .ckpt() // count + threshold scan
      val nRow = docs.agg(count(lit(1)).as("n"))
      val vc = docs.select(col("doc_id").as("val"))
        .withColumn("cnt", lit(1L)).withColumn("bkt", expr("val div 1024"))
      val thrAggs = (1 to 9).map(k =>
        min(when(col("cum") >= expr(s"($k * n + 9) div 10"), col("val"))).as(s"t$k"))
      val thr = graft.plans.PrefixScan.cumsum(vc, part = Seq(), bucket = "bkt",
          order = Seq("val"), value = "cnt", out = "cum")
        .crossJoin(broadcast(nRow))
        .agg(thrAggs.head, thrAggs.tail: _*)
      val fo = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("token"))
        .groupBy("token").agg(min(col("doc_id")).as("fd"))
      val decile = (1 to 9).map(k =>
        when(col("fd") > col(s"t$k"), 1L).otherwise(0L)).reduce(_ + _) + lit(1L)
      // single-partition window BY CONSTRUCTION: 10 decile rows after
      // the groupBy below, never the token frame (r18 audit).
      val w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
      fo.crossJoin(broadcast(thr))
        .groupBy(decile.as("decile"))
        .agg(count(lit(1)).as("new_tokens"))
        .withColumn("cum_tokens", sum(col("new_tokens")).over(w))
        .orderBy("decile")
    },

    // Text quality scoring: token stats + stopword/whitespace ratios as
    // floor-scaled integers (hash-exact across engines).
    Q("q46_text_quality",
      s"""SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
         |  CAST(length(text) AS INTEGER) AS n_chars_calc,
         |  CAST(floor(100.0 * (length(text) - len(string_split(text, ' ')) + 1)
         |       / len(string_split(text, ' '))) AS BIGINT) AS avg_word_len_x100,
         |  CAST(floor(10000.0 * ${duckHits("en")} / len(string_split(text, ' '))) AS BIGINT) AS stop_bp,
         |  CAST(floor(10000.0 * (length(text) - length(replace(text, '.', '')))
         |       / length(text)) AS BIGINT) AS punct_bp,
         |  CAST(floor(100.0 * ${duckHits("en")} / len(string_split(text, ' '))) AS BIGINT)
         |    + CASE WHEN n_chars BETWEEN 100 AND 400 THEN 10 ELSE 0 END AS quality
         |FROM documents
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("words", TextFns.tokens(col("text")))
        .withColumn("nw", size(col("words")))
        .withColumn("hits", hitsCol("en"))
        .select(col("doc_id"),
          col("nw").as("n_words"),
          length(col("text")).as("n_chars_calc"),
          floor(lit(100.0) * (length(col("text")) - col("nw") + 1) / col("nw"))
            .as("avg_word_len_x100"),
          floor(lit(10000.0) * col("hits") / col("nw")).as("stop_bp"),
          floor(lit(10000.0) * (length(col("text"))
            - length(regexp_replace(col("text"), "\\.", ""))) / length(col("text")))
            .as("punct_bp"),
          (floor(lit(100.0) * col("hits") / col("nw"))
            + when(col("n_chars").between(100, 400), 10).otherwise(0)).as("quality"))
        .orderBy(col("doc_id"))
    },

    // MinHash estimator audit: for EVERY co-occurring pair in the
    // memoized pair graph, compare the 32-perm signature estimate
    // (matching slots / 32) against the exact Jaccard and certify all
    // of them inside a ±0.35 envelope (Hoeffding at n=32:
    // P(|est−J| ≥ 0.35) ≤ 2e^−7.8 per pair; the signatures are
    // deterministic, so the certificate is reproducible, not a coin
    // flip). This is the accuracy side of the q44 LSH production
    // path — q44 certifies recall of the BANDS, this certifies the
    // SKETCH the bands are built from. Envelope-oracle shape (q54's
    // pattern): DuckDB recomputes the exact pair count and the
    // invariant's expected value; a single out-of-envelope pair makes
    // n_within < n_pairs and the hash compare fail.
    Q("q224_minhash_est_audit",
      """WITH sh AS (
        |  SELECT doc_id, lang, n_chars // 100 AS lb,
        |    list_distinct(list_transform(
        |      range(1, CASE WHEN len(string_split(text,' ')) >= 3
        |                    THEN len(string_split(text,' ')) - 1 ELSE 1 END),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |           || ' ' || string_split(text,' ')[i+2])) AS sg
        |  FROM documents),
        |p AS (SELECT 1 AS one
        |  FROM sh a JOIN sh b
        |    ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
        |  WHERE len(a.sg) > 0 AND len(b.sg) > 0
        |    AND len(list_intersect(a.sg, b.sg)) > 0)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(count(*) AS BIGINT) AS n_within
        |FROM p""".stripMargin) { (s, d) =>
      val sig = docsWithShingles(s, d)
        .filter(size(col("shingles")) > 0)
        .select(col("doc_id"),
          minhashSig(s, shingleHashes(col("shingles"))).as("sig"))
      cachedPairStats(s, d)
        .join(sig.select(col("doc_id").as("a_id"), col("sig").as("sa")), "a_id")
        .join(sig.select(col("doc_id").as("b_id"), col("sig").as("sb")), "b_id")
        .withColumn("matches",
          size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y), b => b)))
        .withColumn("est_bp", expr("(matches * 10000) div 32"))
        .withColumn("exact_bp",
          floor(lit(10000.0) * col("inter") / col("uni")).cast("long"))
        .agg(count(lit(1)).as("n_pairs"),
          // coalesce: sum over ZERO rows is NULL in Spark but the
          // oracle's count(*) is 0 — a legitimately pair-free corpus
          // must not hash-mismatch
          coalesce(sum(when(abs(col("est_bp") - col("exact_bp")) <= 3500, 1L)
            .otherwise(0L)), lit(0L)).as("n_within"))
    },

    // Tokenizer fertility per language: chars per token ×1000 — the
    // capacity-planning stat behind token budgeting (how many bytes of
    // corpus buy how many tokens differs by language; zh vs en fertility
    // is the canonical example). One map-side-combined aggregate into a
    // ≤n_languages frame; exact integer ratio.
    Q("q225_token_fertility",
      """SELECT lang, CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST((1000 * sum(n_chars)) // sum(len(string_split(text, ' ')))
        |    AS BIGINT) AS chars_per_token_x1000
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(sum(col("n_chars")).as("total_chars"),
          sum(size(TextFns.tokens(col("text"))).cast("long")).as("total_tokens"))
        .select(col("lang"), col("total_chars"), col("total_tokens"),
          expr("(1000 * total_chars) div total_tokens").as("chars_per_token_x1000"))
        .orderBy("lang")
    },

    // Pair-similarity histogram: co-occurring pairs bucketed by Jaccard
    // decile — the distribution a data team reads NEXT TO q217's
    // threshold sweep (the sweep gives cumulative counts at candidate
    // thresholds; this gives the full shape, where the near-dup mass
    // and the long tail separate). One pass over the memoized pair
    // graph; output ≤ 11 rows.
    Q("q226_jaccard_histogram",
      """WITH sh AS (
        |  SELECT doc_id, lang, n_chars // 100 AS lb,
        |    list_distinct(list_transform(
        |      range(1, CASE WHEN len(string_split(text,' ')) >= 3
        |                    THEN len(string_split(text,' ')) - 1 ELSE 1 END),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |           || ' ' || string_split(text,' ')[i+2])) AS sg
        |  FROM documents),
        |p AS (SELECT len(list_intersect(a.sg, b.sg)) AS i,
        |    len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg)) AS u
        |  FROM sh a JOIN sh b
        |    ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
        |  WHERE len(a.sg) > 0 AND len(b.sg) > 0
        |    AND len(list_intersect(a.sg, b.sg)) > 0)
        |SELECT CAST(CAST(floor(10000.0 * i / u) AS BIGINT) // 1000 AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_pairs
        |FROM p GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
      cachedPairStats(s, d)
        .withColumn("bucket",
          expr("CAST(floor(10000.0 * inter / uni) AS BIGINT) div 1000"))
        .groupBy("bucket").agg(count(lit(1)).as("n_pairs"))
        .orderBy("bucket")
    },

    // Heuristic language-ID: stopword hit counts per language, argmax
    // with fixed tie-break order (en, de, es, fr, zh). Shared per-doc
    // core in langIdPerDoc / langIdPerDocSql (q223 regroups it into
    // the confusion matrix).
    Q("q47_lang_id", s"$langIdPerDocSql ORDER BY doc_id") { (s, d) =>
      langIdPerDoc(s, d).orderBy(col("doc_id"))
    },

    // Language-ID confusion matrix: (labeled, predicted) doc counts —
    // the evaluation readout for q47's classifier (precision/recall
    // derive from the margins). Per-doc core collapses map-side to a
    // ≤ 25-cell frame.
    Q("q223_langid_confusion",
      s"""SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
         |FROM ($langIdPerDocSql)
         |GROUP BY lang, pred_lang
         |ORDER BY lang, pred_lang""".stripMargin) { (s, d) =>
      langIdPerDoc(s, d)
        .groupBy("lang", "pred_lang")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "pred_lang")
    },

    // Document fingerprinting: Karp-Rabin rolling hash (exact integer
    // fold, oracle via list_reduce) + sha256 prefix fingerprint.
    Q("q48_fingerprint",
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) AS rolling_hash,
        |  substr(sha256(lower(text)), 1, 16) AS sha_fp
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextFns.rollingHash(col("text")).as("rolling_hash"),
          TextFns.shaFingerprint(col("text")).as("sha_fp"))
        .orderBy(col("doc_id"))
    },

    // Brute-force cosine top-k: rank-only output (ids, no float values)
    // so cross-engine float noise cannot flip the hash; ties broken by
    // neighbor id.
    Q("q49_cosine_topk",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |     s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |             list_cosine_similarity(q.emb, c.emb) AS sim
        |           FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |     r AS (SELECT query_id, neighbor_id,
        |             CAST(row_number() OVER (PARTITION BY query_id
        |               ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank
        |           FROM s)
        |SELECT query_id, rank, neighbor_id FROM r
        |WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      val e = embWithNorm(s, d)
      val qside = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("emb").as("qe"), col("nrm").as("qn"))
      val cside = e.select(col("vec_id").as("neighbor_id"), col("emb").as("ce"), col("nrm").as("cn"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
      cside.join(broadcast(qside), col("query_id") =!= col("neighbor_id"))
        .withColumn("sim", VectorFns.cosineWithNorms(
          fastDot(col("qe"), col("ce")), col("qn"), col("cn")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    },

    // Embedding near-dup pairs above a cosine threshold (pair ids only;
    // the fixture embeddings are near-orthogonal random vectors — max
    // pairwise cosine ≈ 0.51 — so 0.35 selects a real high-similarity
    // tail rather than an always-empty set). All-pairs is the
    // oracle-spec path; the production route is
    // q50b_embedding_neardup_ivf (IvfAnn.thresholdPairsExact — the
    // threshold bound prunes cells, certified output-equal in
    // VectorSpec).
    Q.baseline("q50_embedding_neardup", sibling = "q50c_embedding_neardup_routed",
      sql = """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.emb, b.emb) > 0.35
        |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
      val e = embWithNorm(s, d)
      val a = e.select(col("vec_id").as("a_id"), col("emb").as("ea"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("b_id"), col("emb").as("eb"), col("nrm").as("nb"))
      a.join(b, col("a_id") < col("b_id"))
        .filter(VectorFns.cosineWithNorms(
          fastDot(col("ea"), col("eb")), col("na"), col("nb")) > 0.35)
        .select("a_id", "b_id")
        .orderBy("a_id", "b_id")
    },

    // Mutual nearest neighbors (reciprocal top-1 cosine): pairs where
    // each vector is the other's closest neighbor — the coupling
    // primitive under SemDeDup-style clustering, bitext mining, and
    // record linkage (a one-sided NN is a guess; a mutual NN is a
    // match). Deterministic argmax: (cosine DESC, id ASC) via struct
    // max, identical in both engines because the oracle spells the
    // cosine out as dot/(nrm_a*nrm_b) with precomputed norms — the
    // exact formula, association, and summation order Spark evaluates,
    // so a near-tie between distinct neighbors cannot flip
    // cross-engine. Exact all-pairs is the oracle-spec path (q50's
    // contract); the production route is q222b_mutual_nn_ivf
    // (IvfAnn.mutualNnExact — IVF cells + triangle bound, certified
    // output-equal in VectorSpec).
    Q.baseline("q222_mutual_nn", sibling = "q222b_mutual_nn_ivf",
      sql = """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
        |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |    CASE WHEN a.nrm = 0 OR b.nrm = 0 THEN 0.0
        |         ELSE list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) END AS c
        |  FROM n a JOIN n b ON a.vec_id <> b.vec_id),
        |nn AS (SELECT a_id, (list(b_id ORDER BY c DESC, b_id))[1] AS nb
        |  FROM p GROUP BY a_id)
        |SELECT x.a_id AS a_id, CAST(x.nb AS BIGINT) AS b_id
        |FROM nn x JOIN nn y ON x.nb = y.a_id AND y.nb = x.a_id
        |WHERE x.a_id < x.nb
        |ORDER BY a_id""".stripMargin) { (s, d) =>
      val e = embWithNorm(s, d)
      val a = e.select(col("vec_id").as("a_id"), col("emb").as("ea"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("b_id"), col("emb").as("eb"), col("nrm").as("nb"))
      val p = a.join(b, col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"),
          VectorFns.cosineWithNorms(fastDot(col("ea"), col("eb")),
            col("na"), col("nb")).as("c"))
      val nn = p.groupBy("a_id")
        .agg(max(struct(col("c"), (-col("b_id")).as("negb"))).as("m"))
        .select(col("a_id"), (-col("m.negb")).as("nb"))
        .ckpt() // both sides of the reciprocity join
      nn.join(nn.select(col("a_id").as("ya"), col("nb").as("ynb")),
          col("nb") === col("ya") && col("ynb") === col("a_id")
            && col("a_id") < col("nb"))
        .select(col("a_id"), col("nb").as("b_id"))
        .orderBy("a_id")
    },

    // INT8 symmetric quantization of embeddings — the storage/bandwidth
    // lever for ANN at 100 TB (4× smaller vectors, SIMD-friendly dot
    // products). Per-vector max-abs scale; q_i = floor(x_i·scale + 0.5)
    // (identical double ops in both engines — round() would diverge on
    // exact .5). Output is integer summaries so the hash is exact:
    // quantized sum, saturation count, and the scale in basis points.
    Q("q69_embed_quantize",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |     m AS (SELECT vec_id, emb,
        |             list_max(list_transform(emb, x -> abs(x))) AS mx FROM e),
        |     q AS (SELECT vec_id,
        |             CASE WHEN mx = 0 THEN 0.0 ELSE 127.0 / mx END AS scale, emb, mx
        |           FROM m)
        |SELECT vec_id,
        |  CAST(list_sum(list_transform(emb, x -> CAST(floor(x * scale + 0.5) AS BIGINT))) AS BIGINT) AS q_sum,
        |  CAST(len(list_filter(list_transform(emb, x -> CAST(floor(x * scale + 0.5) AS BIGINT)),
        |       v -> abs(v) = 127)) AS BIGINT) AS n_sat,
        |  CAST(floor(scale * 10000) AS BIGINT) AS scale_bp
        |FROM q
        |ORDER BY vec_id""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .withColumn("emb", transform(col("embedding"), x => x.cast("double")))
        .withColumn("mx", array_max(transform(col("emb"), x => abs(x))))
        .withColumn("scale", when(col("mx") === 0, lit(0.0)).otherwise(lit(127.0) / col("mx")))
        .withColumn("q", transform(col("emb"), x => floor(x * col("scale") + lit(0.5))))
        .select(col("vec_id"),
          aggregate(col("q"), lit(0L), (acc, v) => acc + v).as("q_sum"),
          size(filter(col("q"), v => abs(v) === 127)).cast("long").as("n_sat"),
          floor(col("scale") * 10000).as("scale_bp"))
        .orderBy(col("vec_id"))
    },

    // Near-dup CLUSTERS: connected components over the exact Jaccard
    // pair graph — production dedup keeps one doc per component, not
    // per pair. Spark side: alternating large-star/small-star with
    // convergence detection (plans.ConnectedComponents — O(log n)
    // rounds at ANY diameter; small residual graphs finish in one
    // union-find task). Oracle: DuckDB recursive-CTE transitive
    // closure, min label per node.
    Q("q70_dedup_clusters", {
      val pairSql = ccPairSql
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, lang, n_chars // 100 AS lb,
         |    list_distinct(list_transform(
         |      range(1, CASE WHEN len(string_split(text,' ')) >= 3
         |                    THEN len(string_split(text,' ')) - 1 ELSE 1 END),
         |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
         |           || ' ' || string_split(text,' ')[i+2])) AS sg
         |  FROM documents
         |), pairs AS (
         |  $pairSql
         |), edges AS (
         |  SELECT a_id AS a, b_id AS b FROM pairs
         |  UNION SELECT b_id, a_id FROM pairs
         |), reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
         |)
         |SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id,
         |  CAST(min(b) = a AS BOOLEAN) AS keeper
         |FROM (SELECT a, b FROM reach UNION SELECT a, a FROM edges) t
         |GROUP BY a
         |ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      // Cluster collapse = connected components over the near-dup pair
      // graph, via alternating large-star/small-star with convergence
      // detection (graft.plans.ConnectedComponents): O(log n) rounds at
      // any diameter, vs O(diameter) for plain min-label propagation —
      // a chain A~B~C~… of pairwise near-dups is the common adversarial
      // shape at corpus scale.
      val pairs = jaccardCountJoin(s, d).select(col("a_id"), col("b_id"))
      graft.plans.ConnectedComponents.components(pairs)
        .select(col("node").as("doc_id"), col("label").as("cluster_id"),
          (col("label") === col("node")).as("keeper"))
        .orderBy(col("doc_id"))
    },

    // Quality-based keeper selection per near-dup cluster: instead of
    // q70's keep-lowest-id policy, keep the HIGHEST-quality member
    // (q46's integer quality score; ties → lowest doc_id) — the
    // curation policy real pipelines ship, because the canonical copy
    // of a near-dup family should be the cleanest one, not the one
    // ingested first. Group-argmax is the q199 broadcast-maxima +
    // equality-join shape over cluster-sized frames; clusters come
    // from the same memoized pair graph + CC as q70.
    Q("q221_dedup_best_keeper", {
      val pairSql = ccPairSql
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, lang, n_chars // 100 AS lb,
         |    list_distinct(list_transform(
         |      range(1, CASE WHEN len(string_split(text,' ')) >= 3
         |                    THEN len(string_split(text,' ')) - 1 ELSE 1 END),
         |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
         |           || ' ' || string_split(text,' ')[i+2])) AS sg
         |  FROM documents
         |), pairs AS (
         |  $pairSql
         |), edges AS (
         |  SELECT a_id AS a, b_id AS b FROM pairs
         |  UNION SELECT b_id, a_id FROM pairs
         |), reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
         |), clusters AS (
         |  SELECT a AS doc_id, min(b) AS cluster_id
         |  FROM (SELECT a, b FROM reach UNION SELECT a, a FROM edges) t
         |  GROUP BY a
         |), q AS (
         |  SELECT doc_id,
         |    CAST(floor(100.0 * ${duckHits("en")} / len(string_split(text, ' ')))
         |      AS BIGINT)
         |    + CASE WHEN n_chars BETWEEN 100 AND 400 THEN 10 ELSE 0 END
         |      AS quality
         |  FROM documents
         |), c AS (
         |  SELECT cl.cluster_id, cl.doc_id, q.quality
         |  FROM clusters cl JOIN q ON cl.doc_id = q.doc_id
         |), g AS (
         |  SELECT cluster_id, max(quality) AS mq,
         |    CAST(count(*) AS BIGINT) AS n_docs
         |  FROM c GROUP BY cluster_id
         |)
         |SELECT CAST(g.cluster_id AS BIGINT) AS cluster_id, g.n_docs,
         |  CAST(g.mq AS BIGINT) AS best_quality,
         |  CAST(min(c.doc_id) AS BIGINT) AS keeper_id
         |FROM g JOIN c ON c.cluster_id = g.cluster_id AND c.quality = g.mq
         |GROUP BY g.cluster_id, g.n_docs, g.mq
         |ORDER BY cluster_id""".stripMargin
    }) { (s, d) =>
      val pairs = jaccardCountJoin(s, d).select(col("a_id"), col("b_id"))
      val clusters = graft.plans.ConnectedComponents.components(pairs)
        .select(col("node").as("doc_id"), col("label").as("cluster_id"))
      val q = Tables.documents(s, d)
        .withColumn("words", TextFns.tokens(col("text")))
        .withColumn("nw", size(col("words")))
        .withColumn("hits", hitsCol("en"))
        .select(col("doc_id"),
          (floor(lit(100.0) * col("hits") / col("nw")) +
            when(col("n_chars").between(100, 400), 10L).otherwise(0L))
            .as("quality"))
      val c = clusters.join(q, "doc_id")
        .ckpt() // maxima + equality join-back
      val g = c.groupBy("cluster_id")
        .agg(max(col("quality")).as("mq"), count(lit(1)).as("n_docs"))
      g.join(c, Seq("cluster_id"))
        .where(col("quality") === col("mq"))
        .groupBy("cluster_id", "n_docs", "mq")
        .agg(min(col("doc_id")).as("keeper_id"))
        .select(col("cluster_id"), col("n_docs"),
          col("mq").as("best_quality"), col("keeper_id"))
        .orderBy("cluster_id")
    },

    // End-to-end near-dup REMOVAL: exact-dup collapse + near-dup
    // cluster collapse composed into the surviving corpus — the full
    // curation step a pipeline actually ships. Survivors: the minimum
    // doc_id of each sha-identical group, minus any doc belonging to a
    // near-dup cluster it does not lead (cluster min = keeper). Both
    // collapse phases are the scale shapes proved above (hash groupBy;
    // bucketed pair join + star-contraction components).
    Q("q82_dedup_pipeline", {
      val pairSql = ccPairSql
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, lang, n_chars // 100 AS lb,
         |    list_distinct(list_transform(
         |      range(1, CASE WHEN len(string_split(text,' ')) >= 3
         |                    THEN len(string_split(text,' ')) - 1 ELSE 1 END),
         |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
         |           || ' ' || string_split(text,' ')[i+2])) AS sg
         |  FROM documents
         |), pairs AS (
         |  $pairSql
         |), edges AS (
         |  SELECT a_id AS a, b_id AS b FROM pairs
         |  UNION SELECT b_id, a_id FROM pairs
         |), reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
         |), clusters AS (
         |  SELECT a AS doc_id, min(b) AS cluster_id
         |  FROM (SELECT a, b FROM reach UNION SELECT a, a FROM edges) t
         |  GROUP BY a
         |), exact_keep AS (
         |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
         |)
         |SELECT k.doc_id, d.lang, d.source
         |FROM exact_keep k
         |JOIN documents d ON d.doc_id = k.doc_id
         |LEFT JOIN clusters c ON c.doc_id = k.doc_id
         |WHERE c.doc_id IS NULL OR c.cluster_id = k.doc_id
         |ORDER BY k.doc_id""".stripMargin
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val exactKeep = docs.groupBy(sha2(col("text"), 256))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val pairs = jaccardCountJoin(s, d).select(col("a_id"), col("b_id"))
      val clusters = graft.plans.ConnectedComponents.components(pairs)
        .select(col("node").as("doc_id"), col("label").as("cluster_id"))
      exactKeep
        .join(docs.select(col("doc_id"), col("lang"), col("source")), "doc_id")
        .join(clusters, Seq("doc_id"), "left")
        .filter(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // Deterministic train/val/test split — every training-data pipeline
    // needs one, and it must be CONTENT-derived (stable under
    // re-partitioning, re-ingestion, and doc_id reassignment), never
    // rand(). The split key is the Karp-Rabin rolling hash of the text
    // (exact integer fold, q48-proven cross-engine) mod 100 →
    // 80/10/10. Pure per-row math: embarrassingly parallel at any SF.
    Q("q71_train_split",
      """WITH h AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, c) -> (acc * 31 + c) % 1000000007) % 100 AS bucket
        |  FROM documents
        |)
        |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        |FROM h ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, d)
        .withColumn("bucket", TextFns.rollingHash(col("text")) % 100)
        .select(col("doc_id"), col("bucket"),
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val").otherwise("test").as("split"))
        .orderBy(col("doc_id"))
    },

    // Sequence packing: assign documents to fixed-budget context bins
    // (4096 whitespace tokens) by cumulative token count — the batch
    // shape LLM pretraining dataloaders consume. Packing runs per
    // (lang) partition so the cumulative window parallelizes; a 100 TB
    // job would sub-bucket each lang by hash range first (same
    // arithmetic, more partitions). Offsets are exact integers.
    Q("q72_sequence_pack",
      """WITH t AS (
        |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok FROM documents
        |), c AS (
        |  SELECT doc_id, lang, n_tok,
        |    sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tok AS cum_before
        |  FROM t
        |)
        |SELECT doc_id, lang,
        |  CAST(n_tok AS BIGINT) AS n_tok,
        |  CAST(cum_before // 4096 AS BIGINT) AS pack_id,
        |  CAST(cum_before % 4096 AS BIGINT) AS pack_offset
        |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      Tables.documents(s, d)
        .withColumn("n_tok", size(TextFns.tokens(col("text"))).cast("long"))
        .withColumn("cum_before", sum(col("n_tok")).over(w) - col("n_tok"))
        .select(col("doc_id"), col("lang"), col("n_tok"),
          floor(col("cum_before") / 4096).as("pack_id"),
          pmod(col("cum_before"), lit(4096)).as("pack_offset"))
        .orderBy(col("doc_id"))
    },

    // LSH-bucketed ANN: multi-table sign-LSH; a corpus vector is a
    // candidate when it shares a (table, bucket) cell with the query in
    // ANY table (OR-amplification), then exact cosine ranks candidates.
    // At scale the bucket join replaces the all-pairs product: corpus is
    // exploded to T rows and shuffled on (table, bucket) — linear, not
    // quadratic. The oracle replays the whole pipeline in DuckDB with
    // the hyperplane constants inlined (see annLshOracleSql), so the
    // driver hash-checks the approximate algorithm's exact output; the
    // recall-vs-brute-force quality bar stays in ScalaTest.
    Q("q51_ann_lsh", annLshOracleSql) { (s, d) =>
      val e = embWithNorm(s, d)
      // Candidate generation carries IDS ONLY: the multi-table collision
      // dedup (distinct) would otherwise shuffle ~1 KB of vector payload
      // per candidate row; payloads join back after the dedup (query
      // side broadcast, corpus side one hash join on neighbor_id).
      val bucketed = e.select(col("vec_id"),
        posexplode(lshBuckets(col("emb"))).as(Seq("tbl", "bucket")))
      val qb = bucketed.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("tbl").as("qt"), col("bucket").as("qb"))
      val cand = bucketed.select(col("vec_id").as("neighbor_id"), col("tbl"), col("bucket"))
        .join(broadcast(qb),
          col("tbl") === col("qt") && col("bucket") === col("qb")
            && col("query_id") =!= col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct() // collapse multi-table collisions (id pairs only)
      val qpay = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("emb").as("qe"), col("nrm").as("qn"))
      val cpay = e.select(col("vec_id").as("neighbor_id"), col("emb").as("ce"),
        col("nrm").as("cn"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
      cand.join(broadcast(qpay), "query_id").join(cpay, "neighbor_id")
        .withColumn("sim", VectorFns.cosineWithNorms(
          fastDot(col("qe"), col("ce")), col("qn"), col("cn")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    },

    // Dup-cluster size profile: the distribution of near-dup cluster
    // sizes plus the un-paired singleton mass — the curation audit that
    // says how much of the corpus dedup will actually remove (and flags
    // a degenerate "everything is one cluster" blocking failure before
    // a full dedup run). Reuses the memoized near-dup pair graph and
    // the star-contraction components (q70); the profile above them is
    // cluster-frame-sized. CC clusters always have size ≥ 2, so the
    // singleton row (total docs − clustered docs) never collides.
    Q("q178_dup_cluster_profile", {
      val pairSql = ccPairSql
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, lang, n_chars // 100 AS lb,
         |    list_distinct(list_transform(
         |      range(1, CASE WHEN len(string_split(text,' ')) >= 3
         |                    THEN len(string_split(text,' ')) - 1 ELSE 1 END),
         |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
         |           || ' ' || string_split(text,' ')[i+2])) AS sg
         |  FROM documents
         |), pairs AS (
         |  $pairSql
         |), edges AS (
         |  SELECT a_id AS a, b_id AS b FROM pairs
         |  UNION SELECT b_id, a_id FROM pairs
         |), reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
         |), comp AS (
         |  SELECT a AS doc_id, min(b) AS cluster_id
         |  FROM (SELECT a, b FROM reach UNION SELECT a, a FROM edges) t
         |  GROUP BY a
         |), cs AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS size
         |  FROM comp GROUP BY 1),
         |h AS (SELECT size, CAST(count(*) AS BIGINT) AS n_clusters FROM cs
         |  GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS ndocs FROM documents),
         |cl AS (SELECT CAST(count(*) AS BIGINT) AS ncl FROM comp)
         |SELECT size, n_clusters, size * n_clusters AS n_docs FROM h
         |UNION ALL
         |SELECT CAST(1 AS BIGINT), ndocs - ncl, ndocs - ncl
         |  FROM tot CROSS JOIN cl WHERE ndocs > ncl
         |ORDER BY size""".stripMargin
    }) { (s, d) =>
      val comp = graft.plans.ConnectedComponents
        .components(jaccardCountJoin(s, d).select(col("a_id"), col("b_id")))
        .ckpt() // histogram + clustered-count consumers
      val h = comp.groupBy("label").agg(count(lit(1)).as("size"))
        .groupBy("size").agg(count(lit(1)).as("n_clusters"))
        .withColumn("n_docs", col("size") * col("n_clusters"))
      val tot = Tables.documents(s, d).agg(count(lit(1)).as("ndocs"))
      val ncl = comp.agg(count(lit(1)).as("ncl"))
      val singles = tot.crossJoin(ncl).filter(col("ndocs") > col("ncl"))
        .select(lit(1L).as("size"), (col("ndocs") - col("ncl")).as("n_clusters"),
          (col("ndocs") - col("ncl")).as("n_docs"))
      h.unionAll(singles).orderBy("size")
    },

    // Embedding-distribution drift screen: per label, the exact L1
    // drift certificate between the even/odd vec_id halves of the
    // corpus — Σ_dim |sum_even·n_odd − sum_odd·n_even| over fixed-point
    // (×1000, floor) quantized components. Catches an embedding-model
    // or featurization change that shifted a class's centroid without
    // ever hashing a float: quantization is explicit double math
    // (identical IEEE on both engines) and the certificate is pure
    // integers. One posexplode (64× rows) feeding a map-side-combinable
    // (label, dim) aggregate — the frame above the scan is labels × 64.
    Q("q181_embedding_drift",
      """WITH e AS (SELECT vec_id, label,
        |    CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q
        |  FROM embeddings),
        |g AS (SELECT CAST(label AS BIGINT) AS label, dim,
        |    CAST(sum(CASE WHEN vec_id % 2 = 0 THEN q ELSE 0 END) AS BIGINT) AS se,
        |    CAST(sum(CASE WHEN vec_id % 2 = 1 THEN q ELSE 0 END) AS BIGINT) AS so,
        |    CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ne,
        |    CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS no
        |  FROM e GROUP BY 1, 2)
        |SELECT label, CAST(max(ne) AS BIGINT) AS n_even,
        |  CAST(max(no) AS BIGINT) AS n_odd,
        |  CAST(sum(abs(se * no - so * ne)) AS BIGINT) AS l1_drift_num
        |FROM g GROUP BY label ORDER BY label""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(col("vec_id"), col("label"), (col("pos") + 1).cast("long").as("dim"),
          floor(col("v").cast("double") * 1000).cast("long").as("q"))
        .groupBy("label", "dim")
        .agg(sum(when(col("vec_id") % 2 === 0, col("q")).otherwise(0L)).as("se"),
          sum(when(col("vec_id") % 2 === 1, col("q")).otherwise(0L)).as("so"),
          sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("ne"),
          sum(when(col("vec_id") % 2 === 1, 1L).otherwise(0L)).as("no"))
        .groupBy("label")
        .agg(max(col("ne")).as("n_even"), max(col("no")).as("n_odd"),
          sum(abs(col("se") * col("no") - col("so") * col("ne"))).as("l1_drift_num"))
        .orderBy("label")
    },

    // Dedup impact by source: how much of each source the near-dup
    // collapse will remove — total docs, docs in any dup cluster, docs
    // removed under the q82 survivor rule (keep the min doc_id per
    // cluster — which IS the component label, so membership alone
    // decides removal), and removal ppm. The procurement-decision
    // readout: a source whose removal ppm is high is paying for data
    // the corpus already has. Reuses the memoized pair graph and
    // star-contraction components; above them only a doc_id→source
    // join and two vocabulary-sized aggregates.
    Q("q185_dedup_impact", {
      val pairSql = ccPairSql
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, lang, n_chars // 100 AS lb,
         |    list_distinct(list_transform(
         |      range(1, CASE WHEN len(string_split(text,' ')) >= 3
         |                    THEN len(string_split(text,' ')) - 1 ELSE 1 END),
         |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
         |           || ' ' || string_split(text,' ')[i+2])) AS sg
         |  FROM documents
         |), pairs AS (
         |  $pairSql
         |), edges AS (
         |  SELECT a_id AS a, b_id AS b FROM pairs
         |  UNION SELECT b_id, a_id FROM pairs
         |), reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
         |), comp AS (
         |  SELECT a AS doc_id, min(b) AS cluster_id
         |  FROM (SELECT a, b FROM reach UNION SELECT a, a FROM edges) t
         |  GROUP BY a
         |), j AS (SELECT d.source, comp.doc_id, comp.cluster_id
         |  FROM comp JOIN documents d USING (doc_id)),
         |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_clustered,
         |    CAST(sum(CASE WHEN doc_id <> cluster_id THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_removed
         |  FROM j GROUP BY 1),
         |t2 AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM documents GROUP BY 1)
         |SELECT t2.source, t2.n_docs,
         |  CAST(COALESCE(per.n_clustered, 0) AS BIGINT) AS n_clustered,
         |  CAST(COALESCE(per.n_removed, 0) AS BIGINT) AS n_removed,
         |  (1000000 * CAST(COALESCE(per.n_removed, 0) AS BIGINT)) // t2.n_docs
         |    AS removal_ppm
         |FROM t2 LEFT JOIN per ON t2.source = per.source
         |ORDER BY t2.source""".stripMargin
    }) { (s, d) =>
      val comp = graft.plans.ConnectedComponents
        .components(jaccardCountJoin(s, d).select(col("a_id"), col("b_id")))
      val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
      val per = comp.join(src, comp("node") === src("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_clustered"),
          sum(when(col("node") =!= col("label"), 1L).otherwise(0L))
            .as("n_removed"))
      src.groupBy("source").agg(count(lit(1)).as("n_docs"))
        .join(per, Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("n_clustered"), lit(0L)).as("n_clustered"),
          coalesce(col("n_removed"), lit(0L)).as("n_removed"))
        .withColumn("removal_ppm", expr("(1000000 * n_removed) div n_docs"))
        .orderBy("source")
    },

    // Embedding norm profile: per label, the distribution of squared
    // L2 norms — the sanity screen run before cosine-similarity ops
    // (an un-normalized or zero vector poisons every dot-product
    // ranking downstream). Components floor-quantize at 1e3 (the q181
    // rule: cast float→double first, both engines floor identically),
    // so nq2 ≈ 1e6 for unit vectors and the div-1000 bucket is a
    // ~0.1%-granularity band. The whole query is one codegen'd HOF
    // per row (aggregate over the array — no explode, no shuffle
    // below the labels × bands aggregate).
    Q("q193_embedding_norms",
      """WITH q AS (SELECT CAST(label AS BIGINT) AS label,
        |    CAST(list_sum(list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)
        |         * CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)))
        |      AS BIGINT) AS nq2
        |  FROM embeddings)
        |SELECT label, CAST(nq2 // 1000 AS BIGINT) AS norm2_band,
        |  CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(sum(nq2) AS BIGINT) AS sum_nq2
        |FROM q GROUP BY 1, 2 ORDER BY label, norm2_band""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("label").cast("long").as("label"),
          expr("""aggregate(transform(embedding,
            |  x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
            |  0L, (acc, q) -> acc + q * q)""".stripMargin).as("nq2"))
        .groupBy(col("label"), expr("nq2 div 1000").as("norm2_band"))
        .agg(count(lit(1)).as("n_vecs"), sum(col("nq2")).as("sum_nq2"))
        .orderBy("label", "norm2_band")
    },

    // Embedding coverage audit: per source, how many documents have a
    // vector (doc_id ↔ vec_id) — the pipeline-completeness readout run
    // before any similarity op (q49-q51/q67 silently see only the
    // embedded subset; this measures what they're missing). One LEFT
    // join against the distinct vector keys, then a sources-sized
    // aggregate with exact ppm coverage.
    Q("q207_embedding_coverage",
      """WITH v AS (SELECT DISTINCT vec_id FROM embeddings),
        |j AS (SELECT d.source,
        |    CASE WHEN v.vec_id IS NULL THEN 0 ELSE 1 END AS hasv
        |  FROM documents d LEFT JOIN v ON d.doc_id = v.vec_id)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(hasv) AS BIGINT) AS n_with_vec,
        |  (1000000 * CAST(sum(hasv) AS BIGINT)) // CAST(count(*) AS BIGINT)
        |    AS coverage_ppm
        |FROM j GROUP BY 1 ORDER BY source""".stripMargin) { (s, d) =>
      val v = Tables.embeddings(s, d).select(col("vec_id")).distinct()
      Tables.documents(s, d).select(col("doc_id"), col("source"))
        .join(v, col("doc_id") === col("vec_id"), "left")
        .select(col("source"),
          when(col("vec_id").isNull, 0L).otherwise(1L).as("hasv"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("hasv")).as("n_with_vec"))
        .withColumn("coverage_ppm",
          expr("(1000000 * n_with_vec) div n_docs"))
        .orderBy("source")
    },

    // Per-dimension embedding distribution profile — the whitening /
    // normalization prep read before any ANN index build (a dimension
    // with near-zero variance contributes nothing to cosine and can be
    // dropped; a dominant-variance dimension argues for per-dim
    // scaling). Each element is quantized to integers FIRST
    // (floor(x·10⁶) for sums/extremes, floor(x·10³) for the squared
    // sum), then integer-summed — so cross-engine summation order
    // cannot drift the hash, and Σq² stays far from long overflow at
    // any corpus size (10⁶ per element² × rows). posexplode is a
    // per-row flat map — embarrassingly parallel, and the groupBy(dim)
    // aggregate is map-side combined to 64 rows per task.
    Q("q241_embedding_dim_profile",
      """WITH x AS (SELECT CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |e AS (SELECT i AS dim, emb[i] AS v
        |      FROM x, (SELECT unnest(range(1, 65)) AS i))
        |SELECT CAST(dim AS BIGINT) AS dim, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(floor(v * 1000000) AS BIGINT)) AS BIGINT) AS sum_q6,
        |  CAST(min(CAST(floor(v * 1000000) AS BIGINT)) AS BIGINT) AS min_q6,
        |  CAST(max(CAST(floor(v * 1000000) AS BIGINT)) AS BIGINT) AS max_q6,
        |  CAST(sum(CAST(floor(v * 1000) AS BIGINT) * CAST(floor(v * 1000) AS BIGINT)) AS BIGINT) AS sum_sq_q3
        |FROM e GROUP BY 1 ORDER BY dim""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("pos", "f")))
        .select((col("pos") + 1).cast("long").as("dim"),
          col("f").cast("double").as("v"))
        .select(col("dim"),
          floor(col("v") * 1000000).as("q6"),
          floor(col("v") * 1000).as("q3"))
        .groupBy("dim")
        .agg(count(lit(1)).as("n"), sum(col("q6")).as("sum_q6"),
          min(col("q6")).as("min_q6"), max(col("q6")).as("max_q6"),
          sum(col("q3") * col("q3")).as("sum_sq_q3"))
        .orderBy("dim")
    },

    // Retrieval-quality evaluation (recall@10, MRR): the harness every
    // embedding pipeline needs before swapping an index — run the query
    // set, mark candidates sharing the query's label as relevant, and
    // report per-query recall@10, the rank of the first relevant hit,
    // and MRR in exact micro-units (10⁶ div rank — no float
    // reciprocal). Ranking follows the q49 discipline: (cosine DESC,
    // id ASC) with the oracle spelling the cosine as dot/(nrm·nrm) —
    // the exact formula and summation order Spark evaluates. The query
    // side (5 vectors) broadcasts; the corpus never shuffles; the
    // per-query top-10 is a WindowGroupLimit.
    Q("q250_retrieval_eval",
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |n AS (SELECT vec_id, label, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
        |s AS (SELECT q.vec_id AS qid, q.label AS qlab, c.vec_id AS cid, c.label AS clab,
        |    CASE WHEN q.nrm = 0 OR c.nrm = 0 THEN 0.0
        |         ELSE list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm) END AS sim
        |  FROM n q JOIN n c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
        |r AS (SELECT qid, qlab, cid, clab,
        |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk
        |      FROM s),
        |t AS (SELECT qid,
        |        CAST(sum(CASE WHEN clab = qlab THEN 1 ELSE 0 END) AS BIGINT) AS recall10,
        |        CAST(coalesce(min(CASE WHEN clab = qlab THEN rnk END), 0) AS BIGINT) AS first_rank
        |      FROM r WHERE rnk <= 10 GROUP BY qid)
        |SELECT qid AS query_id, recall10, first_rank,
        |  CAST(CASE WHEN first_rank = 0 THEN 0 ELSE 1000000 // first_rank END AS BIGINT) AS mrr_micro
        |FROM t ORDER BY query_id""".stripMargin) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val e = Tables.embeddings(s, d)
        .withColumn("emb", transform(col("embedding"), x => x.cast("double")))
        .withColumn("nrm", sqrt(fastDot(col("emb"), col("emb"))))
      val qside = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("label").as("qlab"),
          col("emb").as("qe"), col("nrm").as("qn"))
      val cside = e.select(col("vec_id").as("cid"), col("label").as("clab"),
        col("emb").as("ce"), col("nrm").as("cn"))
      val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
      cside.join(broadcast(qside), col("qid") =!= col("cid"))
        .withColumn("sim", VectorFns.cosineWithNorms(
          fastDot(col("qe"), col("ce")), col("qn"), col("cn")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 10)
        .groupBy(col("qid").as("query_id"))
        .agg(sum(when(col("clab") === col("qlab"), 1L).otherwise(0L)).as("recall10"),
          coalesce(min(when(col("clab") === col("qlab"), col("rnk"))), lit(0))
            .cast("long").as("first_rank"))
        .select(col("query_id"), col("recall10"), col("first_rank"),
          when(col("first_rank") === 0, 0L)
            .otherwise(expr("1000000 div first_rank")).as("mrr_micro"))
        .orderBy("query_id")
    },

    // Incremental (delta) near-dup: the daily-ingest shape — q137's
    // incremental contract applied to NEAR-duplicates. Today's
    // arrivals are the top id decile (deterministic stand-in for an
    // ingest-date predicate); only pairs touching the delta are
    // produced, at the q43b production threshold t = 0.8. Because the
    // delta is the TOP of the id space, every qualifying pair has its
    // larger element in the delta — so the inverted-index count join
    // runs with the probe side pre-filtered to delta docs BEFORE the
    // shingle explode: per-day cost scales with delta × co-occurrence,
    // never corpus². (At 100 TB the index side is the persisted
    // shingle inventory — the same snapshot artifact cachedPairStats
    // models; only delta shingles are computed fresh each day.)
    // (core factored into deltaNearDupProbe so ScaleSmoke can time the
    // per-day probe against a FIXED-size delta while the corpus grows)
    Q("q255_delta_neardup", deltaNearDupOracleSql) { (s, d) =>
      val mx = Tables.documents(s, d).agg(max(col("doc_id")).as("mx"))
      // consumed by BOTH the index side and the delta probe side —
      // without the checkpoint the scan+shingle pipeline runs twice
      val sh = shingleBlocks(s, d).ckpt() // (fan-out A/B'd r17: +15%, stays serial)
      val delta = sh.crossJoin(broadcast(mx))
        .where(col("doc_id") * 10 > col("mx") * 9).drop("mx")
      deltaNearDupProbe(sh, delta, productionThreshold10)
    },

    // q255's PRODUCTION layout made a real code path (the q43c/q222b
    // precedent): the corpus shingle inventory lives as a PERSISTED
    // TABLE BUCKETED BY SHINGLE, so the probe's corpus side comes off
    // the bucketed files already hash-clustered — NO corpus-side
    // exchange (certified in ScienceSpec); the delta side is shingled
    // fresh from the raw documents with the ingest filter pushed into
    // the parquet scan, and pays the only shuffle (delta-sized). The
    // index build runs once per corpus snapshot (fingerprint-keyed
    // table), exactly like a daily dedup pipeline's persisted
    // inverted index. Same oracle as q255 — route-agnostic.
    // CONSTRUCTION-TIME SIDE EFFECTS, by design: building this query's
    // plan materializes the bucketed index (saveAsTable + stale-
    // generation cleanup, first construction per corpus snapshot) and
    // runs the A4-style cutoff scalar — the persisted-snapshot
    // contract, same as Extract.keyBounds. The same applies to EVERY
    // pair-graph consumer via cachedPairStats (see its scaladoc).
    // Plan-only tooling runs under Ckpt.auditMode, where
    // bucketedShingleIndex substitutes the logically-equivalent
    // unbucketed frame and never writes (VERDICT r9 #8).
    Q("q255b_delta_neardup_bucketed", deltaNearDupOracleSql) { (s, d) =>
      val idx = bucketedShingleIndex(s, d)
      // A4-style planning scalar: the ingest cutoff (max id decile).
      // coalesce(-1): an empty corpus must yield an empty result (the
      // q255/oracle behavior), not a null-primitive crash.
      val mxV = Tables.documents(s, d)
        .agg(coalesce(max(col("doc_id")), lit(-1L))).head.getLong(0)
      val delta = shingleBlocks(s,
        d) // fresh delta shingling — the filter prunes the doc scan
        .where(col("doc_id") * 10 > mxV * 9)
      bucketedDeltaPairs(idx, delta, productionThreshold10)
    },

    // Near-dup kNN graph: each doc's top-3 most-similar neighbors
    // AMONG its near-duplicates (J ≥ 0.3, the corpus pair-graph
    // threshold) — the dedup diagnostician's view (q43 answers "which
    // pairs exceed t"; this ranks each doc's neighborhood within that
    // graph, feeding cluster inspection and keeper selection). One
    // pass over the memoized pair graph (cachedPairStats — shared
    // with q43/q70/q82/q217, built once per corpus), thresholded,
    // symmetrized, then a per-doc WindowGroupLimit top-3. The
    // threshold is what bounds the windowed frame by near-dup density
    // — an UNthresholded kNN ranks the full co-occurrence pair graph,
    // measured 27.6× wall-clock at 10× docs on the uniform smoke
    // corpus (n²-within-block); with it the frame is the same pair
    // set every other t=0.3 consumer reads.
    Q("q260_doc_knn",
      s"""WITH sh AS (
        |  SELECT doc_id, lang, n_chars // 100 AS lb,
        |    list_distinct(list_transform(
        |      range(1, CASE WHEN len(string_split(text,' ')) >= 3
        |                    THEN len(string_split(text,' ')) - 1 ELSE 1 END),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |           || ' ' || string_split(text,' ')[i+2])) AS sg
        |  FROM documents
        |),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    CAST(floor(10000.0 * len(list_intersect(a.sg, b.sg))
        |         / len(list_distinct(list_concat(a.sg, b.sg)))) AS BIGINT) AS jb
        |  FROM sh a JOIN sh b
        |    ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
        |  WHERE len(a.sg) > 0 AND len(b.sg) > 0
        |    AND len(list_intersect(a.sg, b.sg)) * 10
        |        >= $jaccardThreshold10 * len(list_distinct(list_concat(a.sg, b.sg)))),
        |sym AS (SELECT a_id AS id, b_id AS nb, jb FROM p
        |        UNION ALL SELECT b_id AS id, a_id AS nb, jb FROM p),
        |r AS (SELECT id, nb, jb,
        |        row_number() OVER (PARTITION BY id ORDER BY jb DESC, nb) AS rk
        |      FROM sym)
        |SELECT CAST(id AS BIGINT) AS doc_id, CAST(rk AS BIGINT) AS rank,
        |  CAST(nb AS BIGINT) AS neighbor_id, jb AS jaccard_bp
        |FROM r WHERE rk <= 3
        |ORDER BY doc_id, rank""".stripMargin) { (s, d) =>
      val p = cachedPairStats(s, d)
        .filter(col("inter") * 10 >= col("uni") * jaccardThreshold10)
        .select(col("a_id"), col("b_id"),
          floor(lit(10000.0) * col("inter") / col("uni")).as("jb"))
      val sym = p.select(col("a_id").as("id"), col("b_id").as("nb"), col("jb"))
        .unionAll(p.select(col("b_id").as("id"), col("a_id").as("nb"), col("jb")))
      val w = Window.partitionBy(col("id")).orderBy(col("jb").desc, col("nb"))
      sym.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3) // WindowGroupLimit
        .select(col("id").as("doc_id"), col("rk").cast("long").as("rank"),
          col("nb").as("neighbor_id"), col("jb").as("jaccard_bp"))
        .orderBy("doc_id", "rank")
    },

    // Boilerplate share per source — the CCNet/RefinedWeb-style
    // template-text screen: a 3-gram shingle is boilerplate when it
    // appears in ≥ 5% of documents (and ≥ 2), and a source's share is
    // the fraction of its shingle occurrences that are boilerplate —
    // high share means navigation chrome / licence headers / template
    // text that a cleaning stage should strip before training. The
    // df threshold is a broadcast one-row scalar (never a driver
    // action); the boilerplate set is tiny by construction (≥5% df)
    // so the occurrence join broadcasts; everything else is two
    // shuffles (df groupBy, per-doc groupBy) + a source-sized report.
    Q("q269_boilerplate_share",
      """WITH sh AS (SELECT doc_id, source,
        |    list_distinct(list_transform(
        |      range(1, CASE WHEN len(string_split(text,' ')) >= 3
        |                    THEN len(string_split(text,' ')) - 1 ELSE 1 END),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |           || ' ' || string_split(text,' ')[i+2])) AS sg
        |  FROM documents),
        |f AS (SELECT doc_id, source, sg FROM sh WHERE len(sg) > 0),
        |n AS (SELECT count(*) AS nd FROM f),
        |e AS (SELECT doc_id, source, unnest(sg) AS shingle FROM f),
        |dfq AS (SELECT shingle, count(*) AS df FROM e GROUP BY 1),
        |b AS (SELECT shingle FROM dfq CROSS JOIN n
        |      WHERE df * 20 >= nd AND df >= 2),
        |pd AS (SELECT e.doc_id, e.source, count(*) AS n_sh,
        |         sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS n_bp
        |       FROM e LEFT JOIN b ON e.shingle = b.shingle GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_sh) AS BIGINT) AS total_shingles,
        |  CAST(sum(n_bp) AS BIGINT) AS boilerplate_shingles,
        |  CAST((1000000 * sum(n_bp)) // sum(n_sh) AS BIGINT) AS share_ppm
        |FROM pd GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val f = docsWithShingles(s, d) // A/B r17: fan-out is a +35% loss here
        .select(col("doc_id"), col("source"), col("shingles").as("sg"))
        .filter(size(col("sg")) > 0)
      val e = f.select(col("doc_id"), col("source"),
        explode(col("sg")).as("shingle")).ckpt() // df build + the bp join
      val nd = f.agg(count(lit(1)).as("nd"))
      val bp = e.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nd))
        .filter(col("df") * 20 >= col("nd") && col("df") >= 2)
        .select(col("shingle"), lit(1L).as("isbp"))
      e.join(broadcast(bp), Seq("shingle"), "left")
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_sh"),
          sum(coalesce(col("isbp"), lit(0L))).as("n_bp"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_sh")).as("total_shingles"),
          sum(col("n_bp")).as("boilerplate_shingles"))
        .withColumn("share_ppm",
          expr("(1000000 * boilerplate_shingles) div total_shingles"))
        .orderBy(col("source"))
    },

    // Context-window fit histogram — the packing-planning certificate:
    // how much of each source's DOCUMENT and TOKEN mass fits common
    // context lengths (512/1k/2k/4k/8k, else "over"). share_ppm is a
    // token-mass share, which is what a sequence-packing stage (q72/
    // q136) actually budgets against. One map-side pass into a
    // (source × 6)-bucket frame.
    Q("q270_context_fit",
      """WITH t AS (SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |x AS (SELECT source, n_tok,
        |    CASE WHEN n_tok <= 512 THEN 512 WHEN n_tok <= 1024 THEN 1024
        |         WHEN n_tok <= 2048 THEN 2048 WHEN n_tok <= 4096 THEN 4096
        |         WHEN n_tok <= 8192 THEN 8192 ELSE 0 END AS ctx
        |  FROM t),
        |s AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS src_tokens
        |      FROM t GROUP BY source)
        |SELECT x.source, CAST(x.ctx AS BIGINT) AS ctx,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(x.n_tok) AS BIGINT) AS tokens,
        |  CAST((1000000 * sum(x.n_tok)) // greatest(s.src_tokens, 1) AS BIGINT)
        |    AS share_ppm
        |FROM x JOIN s ON x.source = s.source
        |GROUP BY x.source, x.ctx, s.src_tokens
        |ORDER BY x.source, ctx""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d).select(col("source"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tok"))
      val x = t.withColumn("ctx",
        when(col("n_tok") <= 512, 512L).when(col("n_tok") <= 1024, 1024L)
          .when(col("n_tok") <= 2048, 2048L).when(col("n_tok") <= 4096, 4096L)
          .when(col("n_tok") <= 8192, 8192L).otherwise(0L))
      val srcTot = t.groupBy(col("source")).agg(sum(col("n_tok")).as("src_tokens"))
      x.join(srcTot, "source")
        .groupBy(col("source"), col("ctx"), col("src_tokens"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"))
        .withColumn("share_ppm",
          expr("(1000000 * tokens) div greatest(src_tokens, 1)"))
        .select(col("source"), col("ctx"), col("n_docs"), col("tokens"),
          col("share_ppm"))
        .orderBy(col("source"), col("ctx"))
    },

    // Shingle diversity per source — Gini–Simpson 1 − Σp² in exact
    // ppm: 10⁶ − (10⁶·Σc²) // T² over per-source shingle occurrence
    // counts (occurrence = a doc containing the shingle, q269's
    // frame). Low diversity = a few shingles carry the source's mass
    // (template/spam farms); high = evenly spread vocabulary. No
    // float probabilities — and no silent wrap (ADVICE r9): Σc² runs
    // in 128-bit on BOTH engines (DECIMAL(38,0) here, HUGEINT in
    // DuckDB), so the exact envelope is T ≲ 10¹⁶ source-occurrences
    // and anything past it fails LOUDLY (ANSI decimal overflow / a
    // HUGEINT cast error), never diverges. Two shuffles: the
    // (source, shingle) count and the source rollup.
    Q("q272_shingle_diversity",
      """WITH sh AS (SELECT doc_id, source,
        |    list_distinct(list_transform(
        |      range(1, CASE WHEN len(string_split(text,' ')) >= 3
        |                    THEN len(string_split(text,' ')) - 1 ELSE 1 END),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |           || ' ' || string_split(text,' ')[i+2])) AS sg
        |  FROM documents),
        |f AS (SELECT doc_id, source, unnest(sg) AS shingle FROM sh
        |      WHERE len(sg) > 0),
        |c AS (SELECT source, shingle, CAST(count(*) AS BIGINT) AS c
        |      FROM f GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(sum(c) AS BIGINT) AS n_occ,
        |  CAST(1000000 - (1000000 * sum(CAST(c AS HUGEINT) * c))
        |       // (CAST(sum(c) AS HUGEINT) * sum(c)) AS BIGINT)
        |    AS simpson_ppm
        |FROM c GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val f = docsWithShingles(s, d, fan = true) // A/B r17: ~-10%
        .select(col("doc_id"), col("source"), col("shingles").as("sg"))
        .filter(size(col("sg")) > 0)
        .select(col("doc_id"), col("source"), explode(col("sg")).as("shingle"))
      f.groupBy(col("source"), col("shingle"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_types"), sum(col("c")).as("n_occ"),
          sum(col("c").cast("decimal(19,0)") * col("c")).as("s2"))
        .select(col("source"), col("n_types"), col("n_occ"),
          (lit(1000000L) - expr(
            "(1000000 * s2) div (CAST(n_occ AS DECIMAL(38,0)) * n_occ)"))
            .as("simpson_ppm"))
        .orderBy(col("source"))
    },

    // PII density screen per source — the batch certificate behind the
    // streaming scrub: email and US-phone pattern hits per source,
    // with a per-million-token density (what a compliance gate
    // thresholds on). Both engines run the IDENTICAL pattern strings;
    // the constructs used (character classes, \d, alternation in a
    // non-capturing group, bounded and unbounded repetition) behave
    // the same under Java regex and RE2, and both `regexp_count`
    // (Spark) and `len(regexp_extract_all)` (DuckDB) count
    // non-overlapping matches left-to-right. The screen remains a
    // LOWER BOUND on PII density (obfuscated/spaced-out forms don't
    // match). One map-side pass, source-sized output.
    Q("q271_pii_density",
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(sum(len(regexp_extract_all(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+'))) AS BIGINT) AS emails,
        |  CAST(sum(len(regexp_extract_all(text,
        |    '(?:\(\d\d\d\) ?|\d\d\d-)\d\d\d-\d\d\d\d'))) AS BIGINT) AS phones,
        |  CAST((1000000 * (sum(len(regexp_extract_all(text,
        |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+')))
        |    + sum(len(regexp_extract_all(text,
        |      '(?:\(\d\d\d\) ?|\d\d\d-)\d\d\d-\d\d\d\d')))))
        |    // greatest(sum(len(string_split(text, ' '))), 1) AS BIGINT)
        |    AS pii_ppm
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      // Case-insensitive classes and the (ddd) ddd-dddd phone shape
      // (ADVICE r9): uppercase emails and parenthesized area codes now
      // count. Classes are spelled [a-zA-Z…] identically in both engine
      // strings (never a flag — flag syntax differs across engines);
      // the alternation group is non-capturing so DuckDB's
      // regexp_extract_all keeps returning the FULL match (group 0).
      val emailPat = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+"
      val phonePat = "(?:\\(\\d\\d\\d\\) ?|\\d\\d\\d-)\\d\\d\\d-\\d\\d\\d\\d"
      Tables.documents(s, d)
        .select(col("source"),
          size(TextFns.tokens(col("text"))).cast("long").as("n_tok"),
          regexp_count(col("text"), lit(emailPat)).cast("long").as("em"),
          regexp_count(col("text"), lit(phonePat)).cast("long").as("ph"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          sum(col("em")).as("emails"), sum(col("ph")).as("phones"))
        .withColumn("pii_ppm",
          expr("(1000000 * (emails + phones)) div greatest(n_tokens, 1)"))
        .orderBy(col("source"))
    },

    // Cross-source near-dup LEAKAGE matrix: for each unordered source
    // pair, how many near-dup pairs (J ≥ 0.3) cross it and at what
    // mean similarity — the certificate a data team reads before
    // deduplicating sources independently (off-diagonal mass means
    // per-source dedup leaves cross-source duplicates in the mix) and
    // before attributing provenance (which sources copy from which).
    // One pass over the SHARED memoized pair graph (the bucketed
    // build every t=0.3 consumer reads) + two doc_id joins to attach
    // sources; the (source, source) frame is report-sized.
    Q("q266_source_leakage", {
      val pairSql = jaccardOracleSqlAt(jaccardThreshold10)
      // Substitute AFTER stripMargin: the pair SQL contains '||'
      // string concatenation at line starts, which an outer
      // stripMargin would truncate into bitwise-or garbage.
      """WITH p AS (
         |@PAIRS@
         |),
         |m AS (SELECT doc_id, source FROM documents),
         |x AS (SELECT least(ma.source, mb.source) AS source_a,
         |        greatest(ma.source, mb.source) AS source_b,
         |        p.jaccard_bp AS jb
         |      FROM p JOIN m ma ON p.a_id = ma.doc_id
         |             JOIN m mb ON p.b_id = mb.doc_id)
         |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(jb) // count(*) AS BIGINT) AS mean_jaccard_bp
         |FROM x GROUP BY 1, 2
         |ORDER BY n_pairs DESC, source_a, source_b LIMIT 30""".stripMargin
        .replace("@PAIRS@", pairSql)
    }) { (s, d) =>
      val m = Tables.documents(s, d).select(col("doc_id"), col("source"))
      jaccardCountJoin(s, d)
        .join(m.select(col("doc_id").as("a_id"), col("source").as("sa")), "a_id")
        .join(m.select(col("doc_id").as("b_id"), col("source").as("sb")), "b_id")
        .select(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"),
          col("jaccard_bp").as("jb"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("n_pairs"),
          expr("sum(jb) div count(1)").as("mean_jaccard_bp"))
        .orderBy(col("n_pairs").desc, col("source_a"), col("source_b"))
        .limit(30)
    },

    // Exact-dedup token savings per source — the dedup ROI
    // certificate: of each source's token mass, how much survives
    // keeper selection (global min-doc_id keeper per content hash, the
    // q41 basis — so a doc dropped because ANOTHER source published
    // the same text earlier counts against THIS source's kept mass).
    // This is the number that prices a dedup stage: savings_ppm ≈ 0
    // means the stage is wasted compute for that source; large means
    // the source is mostly recycled text. One hash shuffle (groupBy
    // content hash), keeper join on the SAME key (no extra exchange),
    // then a source-sized aggregate.
    Q("q267_dedup_token_savings",
      """WITH t AS (SELECT doc_id, source, sha256(text) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |k AS (SELECT h, min(doc_id) AS keeper FROM t GROUP BY h)
        |SELECT t.source,
        |  CAST(sum(t.n_tok) AS BIGINT) AS total_tokens,
        |  CAST(sum(CASE WHEN t.doc_id = k.keeper THEN t.n_tok ELSE 0 END)
        |    AS BIGINT) AS kept_tokens,
        |  CAST(sum(CASE WHEN t.doc_id = k.keeper THEN 0 ELSE t.n_tok END)
        |    AS BIGINT) AS dropped_tokens,
        |  CAST((1000000 * sum(CASE WHEN t.doc_id = k.keeper THEN 0 ELSE t.n_tok END))
        |    // sum(t.n_tok) AS BIGINT) AS savings_ppm
        |FROM t JOIN k ON t.h = k.h
        |GROUP BY t.source ORDER BY t.source""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), sha2(col("text"), 256).as("h"),
          size(TextFns.tokens(col("text"))).cast("long").as("n_tok"))
        .ckpt() // consumed by the keeper aggregate AND the join
      val k = t.groupBy(col("h")).agg(min(col("doc_id")).as("keeper"))
      t.join(k, "h")
        .groupBy(col("source"))
        .agg(sum(col("n_tok")).as("total_tokens"),
          sum(when(col("doc_id") === col("keeper"), col("n_tok"))
            .otherwise(0L)).as("kept_tokens"),
          sum(when(col("doc_id") === col("keeper"), 0L)
            .otherwise(col("n_tok"))).as("dropped_tokens"))
        .withColumn("savings_ppm",
          expr("(1000000 * dropped_tokens) div total_tokens"))
        .orderBy(col("source"))
    },

    // INT8 quantization fidelity audit — does q69's 4×-smaller vector
    // preserve RANKING? For each query vector: top-10 by full-precision
    // cosine vs top-10 by quantized cosine (integer dot of the q69
    // int8 codes, normalized by the integer norms), reported as
    // overlap@10 and set-Jaccard basis points. Both rankings use the
    // (sim DESC, id ASC) discipline with the oracle spelling out the
    // identical arithmetic — the q49/q69 proven patterns composed. The
    // answer every ANN deployment needs before switching its index to
    // int8 storage.
    Q("q259_quant_fidelity",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |m AS (SELECT vec_id, emb, list_max(list_transform(emb, x -> abs(x))) AS mx FROM e),
        |q AS (SELECT vec_id, emb,
        |    list_transform(emb, x -> CAST(floor(x * (CASE WHEN mx = 0 THEN 0.0
        |      ELSE 127.0 / mx END) + 0.5) AS BIGINT)) AS qv
        |  FROM m),
        |n AS (SELECT vec_id, emb, qv, sqrt(list_dot_product(emb, emb)) AS nrm,
        |    sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE)) AS qn
        |  FROM q),
        |p AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
        |    CASE WHEN a.nrm = 0 OR b.nrm = 0 THEN 0.0
        |         ELSE list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) END AS fsim,
        |    CASE WHEN a.qn = 0 OR b.qn = 0 THEN 0.0
        |         ELSE CAST(list_dot_product(a.qv, b.qv) AS DOUBLE) / (a.qn * b.qn) END AS qsim
        |  FROM n a JOIN n b ON a.vec_id < 5 AND a.vec_id <> b.vec_id),
        |r AS (SELECT qid, cid,
        |    row_number() OVER (PARTITION BY qid ORDER BY fsim DESC, cid) AS rf,
        |    row_number() OVER (PARTITION BY qid ORDER BY qsim DESC, cid) AS rq
        |  FROM p),
        |t AS (SELECT qid,
        |    CAST(sum(CASE WHEN rf <= 10 AND rq <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS overlap10
        |  FROM r GROUP BY qid)
        |SELECT qid AS query_id, overlap10,
        |  CAST(overlap10 * 10000 // (20 - overlap10) AS BIGINT) AS set_jaccard_bp
        |FROM t ORDER BY query_id""".stripMargin) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val e = Tables.embeddings(s, d)
        .withColumn("emb", transform(col("embedding"), x => x.cast("double")))
        .withColumn("mx", array_max(transform(col("emb"), x => abs(x))))
        .withColumn("qv", transform(col("emb"), x =>
          floor(x * when(col("mx") === 0, lit(0.0)).otherwise(lit(127.0) / col("mx"))
            + lit(0.5)).cast("long")))
        .withColumn("nrm", sqrt(fastDot(col("emb"), col("emb"))))
        .withColumn("qn", sqrt(aggregate(
          zip_with(col("qv"), col("qv"), (x, y) => x * y),
          lit(0L), (acc, v) => acc + v).cast("double")))
        .select(col("vec_id"), col("emb"), col("qv"), col("nrm"), col("qn"))
      val qside = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("emb").as("qe"), col("qv").as("qqv"),
          col("nrm").as("qnrm"), col("qn").as("qqn"))
      val cside = e.select(col("vec_id").as("cid"), col("emb").as("ce"),
        col("qv").as("cqv"), col("nrm").as("cnrm"), col("qn").as("cqn"))
      val qdot = aggregate(zip_with(col("qqv"), col("cqv"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v)
      val joined = cside.join(broadcast(qside), col("qid") =!= col("cid"))
        .withColumn("fsim", VectorFns.cosineWithNorms(
          fastDot(col("qe"), col("ce")), col("qnrm"), col("cnrm")))
        .withColumn("qsim", when(col("qqn") === 0 || col("cqn") === 0, lit(0.0))
          .otherwise(qdot.cast("double") / (col("qqn") * col("cqn"))))
      val wf = Window.partitionBy(col("qid")).orderBy(col("fsim").desc, col("cid"))
      val wq = Window.partitionBy(col("qid")).orderBy(col("qsim").desc, col("cid"))
      joined
        .withColumn("rf", row_number().over(wf))
        .withColumn("rq", row_number().over(wq))
        .groupBy(col("qid").as("query_id"))
        .agg(sum(when(col("rf") <= 10 && col("rq") <= 10, 1L).otherwise(0L))
          .as("overlap10"))
        .select(col("query_id"), col("overlap10"),
          expr("(overlap10 * 10000) div (20 - overlap10)").as("set_jaccard_bp"))
        .orderBy("query_id")
    },

    // Lexical-vs-semantic agreement — the "can SemDeDup replace
    // MinHash here" certificate: for every lexical near-dup pair
    // (J ≥ 0.3, the memoized pair graph) whose BOTH ends carry an
    // embedding, does the embedding side agree (cosine above the
    // q50-family 0.35 high-similarity threshold)? Reported as a
    // (2000-bp Jaccard band × semantic-hit) contingency table: strong
    // diagonal mass = the embedding space sees what the shingles see
    // (semantic dedup is safe); a heavy J-high/cos-low cell = lexical
    // dups the embedding model misses (keep MinHash). Work is
    // pair-graph-bounded: the pair build is the shared memoized index
    // (amortized across the whole q43 family), the embedding joins and
    // the rollup are pair-sized.
    Q("q286_lexical_semantic_agreement",
      """WITH sh AS (
        |  SELECT doc_id, lang, n_chars // 100 AS lb,
        |    list_distinct(list_transform(
        |      range(1, CASE WHEN len(string_split(text,' ')) >= 3
        |                    THEN len(string_split(text,' ')) - 1 ELSE 1 END),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |           || ' ' || string_split(text,' ')[i+2])) AS sg
        |  FROM documents),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    CAST(floor(10000.0 * len(list_intersect(a.sg, b.sg))
        |         / len(list_distinct(list_concat(a.sg, b.sg)))) AS BIGINT)
        |      AS jaccard_bp
        |  FROM sh a JOIN sh b
        |    ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
        |  WHERE len(a.sg) > 0 AND len(b.sg) > 0
        |    AND len(list_intersect(a.sg, b.sg)) * 10
        |        >= 3 * len(list_distinct(list_concat(a.sg, b.sg)))),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |c AS (SELECT p.jaccard_bp,
        |    list_cosine_similarity(ea.emb, eb.emb) AS cos
        |  FROM p JOIN e ea ON p.a_id = ea.vec_id
        |         JOIN e eb ON p.b_id = eb.vec_id)
        |SELECT CAST(jaccard_bp // 2000 AS BIGINT) AS jaccard_band,
        |  CAST(CASE WHEN cos > 0.35 THEN 1 ELSE 0 END AS BIGINT) AS semantic_hit,
        |  CAST(count(*) AS BIGINT) AS n_pairs
        |FROM c GROUP BY 1, 2
        |ORDER BY jaccard_band, semantic_hit""".stripMargin) { (s, d) =>
      val e = embWithNorm(s, d)
      jaccardCountJoin(s, d)
        .join(e.select(col("vec_id").as("a_id"), col("emb").as("ea"),
          col("nrm").as("na")), "a_id")
        .join(e.select(col("vec_id").as("b_id"), col("emb").as("eb"),
          col("nrm").as("nb")), "b_id")
        .withColumn("cos", VectorFns.cosineWithNorms(
          fastDot(col("ea"), col("eb")), col("na"), col("nb")))
        .groupBy(expr("jaccard_bp div 2000").as("jaccard_band"),
          when(col("cos") > 0.35, 1L).otherwise(0L).as("semantic_hit"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("jaccard_band"), col("semantic_hit"))
    },

    // Head-bounded edit-distance verify over the near-dup pair graph —
    // the ORDER-SENSITIVE complement to set-based Jaccard: shingle
    // overlap is blind to token order and to dense small edits, so a
    // (Jaccard band × edit band) contingency shows whether lexical
    // near-dups are true copy-edits (low edit distance) or
    // bag-of-words coincidences (high). Cost discipline: Levenshtein is O(len²) per
    // pair, so both engines compare only the first 256 chars (the
    // truncation-dup head convention, q275) — a hard 256² cap per pair
    // — and the pair set is the memoized t=0.3 graph, never all-pairs.
    Q("q290_head_edit_verify",
      """WITH sh AS (
        |  SELECT doc_id, lang, n_chars // 100 AS lb,
        |    list_distinct(list_transform(
        |      range(1, CASE WHEN len(string_split(text,' ')) >= 3
        |                    THEN len(string_split(text,' ')) - 1 ELSE 1 END),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |           || ' ' || string_split(text,' ')[i+2])) AS sg
        |  FROM documents),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    CAST(floor(10000.0 * len(list_intersect(a.sg, b.sg))
        |         / len(list_distinct(list_concat(a.sg, b.sg)))) AS BIGINT)
        |      AS jaccard_bp
        |  FROM sh a JOIN sh b
        |    ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
        |  WHERE len(a.sg) > 0 AND len(b.sg) > 0
        |    AND len(list_intersect(a.sg, b.sg)) * 10
        |        >= 3 * len(list_distinct(list_concat(a.sg, b.sg)))),
        |h AS (SELECT doc_id, substr(text, 1, 256) AS head FROM documents),
        |c AS (SELECT p.jaccard_bp, levenshtein(ha.head, hb.head) AS ed
        |  FROM p JOIN h ha ON p.a_id = ha.doc_id
        |         JOIN h hb ON p.b_id = hb.doc_id)
        |SELECT CAST(jaccard_bp // 2000 AS BIGINT) AS jaccard_band,
        |  CAST(ed // 32 AS BIGINT) AS edit_band,
        |  CAST(count(*) AS BIGINT) AS n_pairs
        |FROM c GROUP BY 1, 2
        |ORDER BY jaccard_band, edit_band""".stripMargin) { (s, d) =>
      val h = Tables.documents(s, d)
        .select(col("doc_id"), substring(col("text"), 1, 256).as("head"))
      jaccardCountJoin(s, d)
        .join(h.select(col("doc_id").as("a_id"), col("head").as("ha")), "a_id")
        .join(h.select(col("doc_id").as("b_id"), col("head").as("hb")), "b_id")
        .withColumn("ed", levenshtein(col("ha"), col("hb")))
        .groupBy(expr("jaccard_bp div 2000").as("jaccard_band"),
          expr("CAST(ed div 32 AS BIGINT)").as("edit_band"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("jaccard_band"), col("edit_band"))
    },

    // Leakage-safe k-fold split — folds are assigned to NEAR-DUP
    // CLUSTERS, not documents, so two near-duplicates can never
    // straddle a train/validation boundary (the cross-validation
    // contamination q73/q282 screen for, prevented by construction).
    // Cluster = connected component of the memoized t=0.3 pair graph
    // (q70's collapse; singletons are their own cluster); fold =
    // cluster_id mod 5 — deterministic, engine-independent, and stable
    // under corpus growth everywhere except the clusters that actually
    // change. Report is folds-sized: docs, clusters, tokens per fold.
    Q("q292_fold_split", {
      s"""WITH RECURSIVE CC_CLUSTER_CTES, f AS (
        |  SELECT d.doc_id,
        |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
        |    coalesce(cl.cluster_id, d.doc_id) AS cluster
        |  FROM documents d LEFT JOIN cl USING (doc_id))
        |SELECT CAST(cluster % 5 AS BIGINT) AS fold,
        |  CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS tokens
        |FROM f GROUP BY 1 ORDER BY fold""".stripMargin
        .replace("CC_CLUSTER_CTES", ccClusterSql)
    }) { (s, d) =>
      val pairs = jaccardCountJoin(s, d).select(col("a_id"), col("b_id"))
      val comp = graft.plans.ConnectedComponents.components(pairs)
        .select(col("node").as("doc_id"), col("label"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(TextFns.tokens(col("text"))).cast("long").as("n_tok"))
        .join(comp, Seq("doc_id"), "left")
        .withColumn("cluster", coalesce(col("label"), col("doc_id")))
        .groupBy(expr("cluster % 5").as("fold"))
        .agg(countDistinct(col("cluster")).as("n_clusters"),
          count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"))
        .orderBy(col("fold"))
    },

    // Dedup survivorship-bias audit — does the default keep-lowest-id
    // dedup policy (q41/q70) systematically discard BETTER documents
    // than it keeps? Scoped to dup-cluster MEMBERS (singletons are not
    // a dedup decision): a (kept × quality-pass) contingency with doc
    // and token mass per cell, where quality-pass is exactly q90's
    // gate conjunction. A heavy kept=false/quality=true cell argues
    // for q221's quality-keeper policy over id-order. Work: the
    // memoized pair graph + O(log n) components (both amortized), one
    // token-explode quality pass, a 4-row report.
    Q("q296_dedup_survivorship", {
      s"""WITH RECURSIVE CC_CLUSTER_CTES, t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        |), uc AS (SELECT doc_id, w, count(*) AS c FROM t GROUP BY doc_id, w),
        |u AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nw,
        |    CAST(count(*) AS BIGINT) AS nd, CAST(max(c) AS BIGINT) AS mx
        |  FROM uc GROUP BY doc_id),
        |g AS (SELECT d.doc_id, u.nw,
        |    (u.nw >= 20 AND u.nw <= 10000
        |     AND floor(10000.0 * (u.nw - u.nd) / u.nw) <= ${TrainingOps.dupWordBpMax}
        |     AND floor(10000.0 * u.mx / u.nw) <= ${TrainingOps.topUnigramBpMax}
        |     AND floor(100.0 * (length(d.text) - u.nw + 1) / u.nw)
        |         BETWEEN 300 AND 1000) AS qpass
        |  FROM documents d JOIN u USING (doc_id))
        |SELECT (cl.cluster_id = cl.doc_id) AS kept, g.qpass AS quality_pass,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(g.nw) AS BIGINT) AS tokens
        |FROM cl JOIN g USING (doc_id)
        |GROUP BY 1, 2 ORDER BY kept, quality_pass""".stripMargin
        .replace("CC_CLUSTER_CTES", ccClusterSql)
    }) { (s, d) =>
      val pairs = jaccardCountJoin(s, d).select(col("a_id"), col("b_id"))
      val comp = graft.plans.ConnectedComponents.components(pairs)
        .select(col("node").as("doc_id"), col("label"))
      val docs = Tables.documents(s, d)
      val u = TrainingOps.unigramStats(docs)
      val g = docs.select(col("doc_id"), length(col("text")).as("len"))
        .join(u, "doc_id")
        .withColumn("qpass",
          col("nw") >= 20 && col("nw") <= 10000
            && floor(lit(10000.0) * (col("nw") - col("nd")) / col("nw"))
               <= TrainingOps.dupWordBpMax
            && floor(lit(10000.0) * col("mx") / col("nw"))
               <= TrainingOps.topUnigramBpMax
            && floor(lit(100.0) * (col("len") - col("nw") + 1) / col("nw"))
               .between(300, 1000))
      comp.join(g, "doc_id")
        .groupBy((col("label") === col("doc_id")).as("kept"),
          col("qpass").as("quality_pass"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("tokens"))
        .orderBy(col("kept"), col("quality_pass"))
    },

    // Fold × source balance audit — the release check on q292's
    // leakage-safe folds: cluster-mod-5 assignment is deterministic
    // but nothing FORCES it source-balanced, and an unbalanced fold
    // silently skews validation mixtures. Per source: total docs and
    // the worst per-fold deviation from the ideal 1/5 share, in exact
    // ppm — computed against the full 5-fold universe (a source with
    // an EMPTY fold must score that fold's full 200 000 ppm deficit,
    // so the fold frame is sources × 5 by construction, not observed
    // rows). All frames after the cluster pass are (sources × 5).
    Q("q299_fold_source_balance", {
      s"""WITH RECURSIVE CC_CLUSTER_CTES, f AS (
        |  SELECT d.source, coalesce(cl.cluster_id, d.doc_id) % 5 AS fold
        |  FROM documents d LEFT JOIN cl USING (doc_id)
        |), u AS (
        |  SELECT s.source, r.range AS fold
        |  FROM (SELECT DISTINCT source FROM documents) s CROSS JOIN range(5) r
        |), c AS (
        |  SELECT u.source, u.fold, CAST(count(f.fold) AS BIGINT) AS n
        |  FROM u LEFT JOIN f ON u.source = f.source AND u.fold = f.fold
        |  GROUP BY 1, 2
        |), t AS (SELECT source, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
        |SELECT c.source, t.tot AS n_docs,
        |  CAST(max((1000000 * abs(5 * c.n - t.tot)) // (5 * t.tot)) AS BIGINT)
        |    AS max_dev_ppm
        |FROM c JOIN t USING (source)
        |GROUP BY 1, 2 ORDER BY source""".stripMargin
        .replace("CC_CLUSTER_CTES", ccClusterSql)
    }) { (s, d) =>
      val pairs = jaccardCountJoin(s, d).select(col("a_id"), col("b_id"))
      val comp = graft.plans.ConnectedComponents.components(pairs)
        .select(col("node").as("doc_id"), col("label"))
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
      val f = docs.join(comp, Seq("doc_id"), "left")
        .select(col("source"),
          expr("coalesce(label, doc_id) % 5").as("fold"))
      val u = docs.select(col("source")).distinct()
        .crossJoin(s.range(5).select(col("id").as("fold")))
      // observed counts, then the (sources × 5) universe left-joins
      // them so an EMPTY fold scores its full deficit instead of
      // silently vanishing from the report
      val cobs = f.groupBy(col("source"), col("fold"))
        .agg(count(lit(1)).as("n0"))
      val c = u.join(cobs, Seq("source", "fold"), "left")
        .withColumn("n", coalesce(col("n0"), lit(0L))).drop("n0")
      val t = c.groupBy(col("source")).agg(sum(col("n")).as("tot"))
      c.join(t, "source")
        .groupBy(col("source"), col("tot").as("n_docs"))
        .agg(max(expr("(1000000 * abs(5 * n - tot)) div (5 * tot)"))
          .as("max_dev_ppm"))
        .orderBy(col("source"))
    }
  )
}

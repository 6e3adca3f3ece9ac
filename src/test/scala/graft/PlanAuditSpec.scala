package graft

import org.apache.spark.sql.catalyst.expressions.aggregate.{Partial, PartialMerge}
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{Exchange, ShuffleExchangeExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.scalatest.funsuite.AnyFunSuite

/** Automated scale-killer gate: every declared query's PHYSICAL plan is
  * audited for the one shape that flatly dies at 100× — funneling an
  * unbounded frame through a single partition (a partition-less Window
  * or a SinglePartition shuffle). A query may legitimately plan one,
  * but only over a frame that is BOUNDED BY CONSTRUCTION (a calendar
  * frame, a per-bucket offsets table, a ≤k-row report) — and then it
  * must be allowlisted here WITH its bound. A new query that plans a
  * global window without a conscious allowlist entry fails this spec:
  * scale regressions cannot land silently. (The final presentation
  * `orderBy` every query carries plans as a range exchange, not a
  * single partition, so it is invisible to this audit — as it should
  * be: range partitioning scales.)
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val dir = "/root/testdata/sf0.001"

  /** Queries allowed to plan partition-less windows / single-partition
    * exchanges, each with the reason its frame is bounded. */
  private val boundedGlobal: Map[String, String] = Map(
    // PrefixScan offsets windows: the two-level scan's only global
    // window runs over ONE PRE-AGGREGATED ROW PER BUCKET (value-level
    // buckets / calendar days / hash buckets) — bounded by bucket
    // count, never by rows.
    "q78_token_rarity" -> "PrefixScan offsets: one row per range bucket (numShufflePartitions)",
    "q101_price_histogram" -> "PrefixScan offsets: one row per price-value bucket",
    "q109_pps_sample" -> "PrefixScan offsets: one row per hash bucket",
    "q121_rolling_mau" -> "PrefixScan offsets over day-granular support change points",
    "q126_rolling_mau_approx" -> "PrefixScan offsets over day-granular HLL deltas",
    "q143_equidepth_hist" -> "PrefixScan offsets: one row per distinct-value bucket",
    "q145_quantile_transform" -> "PrefixScan offsets: one row per distinct-value bucket",
    "q169_ks_drift" -> "PrefixScan offsets: one row per distinct-value bucket",
    "q175_power_user_deciles" -> "PrefixScan offsets: one row per 256-way hash bucket",
    "q179_source_length_drift" -> "PrefixScan offsets: one row per distinct-length bucket",
    "q192_abc_class" -> "PrefixScan offsets: one row per revenue-value bucket",
    "q201_max_drawdown" -> "PrefixScan offsets: one row per calendar day",
    "q205_concurrency_peak" -> "PrefixScan offsets: one row per calendar day",
    "q214_seasonal_index" -> "PrefixScan offsets: one row per calendar month",
    "q218_vocab_growth" -> "PrefixScan offsets: one row per doc-id decile bucket",
    "q281_norm_outlier_screen" -> "PrefixScan offsets: one row per distinct-norm bucket (two lower-median passes)",
    "q285_shard_planner" -> "PrefixScan offsets: one row per 1000-doc-id range bucket",
    // newly visible since the audit walks PRE-checkpoint plans (Ckpt
    // audit mode): the same bounded offsets class, previously hidden
    // behind eager localCheckpoints.
    "q134_cms_freq" -> "PrefixScan offsets: one row per range bucket (numShufflePartitions)",
    // Report-frame windows: the windowed frame is an aggregate whose
    // cardinality is fixed by the calendar or the report shape, not by
    // data volume.
    "q97_bm25" -> "final ranking over the fused (n_queries × top-k) retrieval frame",
    "q162_time_to_convert" -> "cumulative share over the fixed lag-bucket frame",
    "q171_stickiness" -> "28-day rolling frame over one row per calendar day",
    "q180_region_share" -> "share-of-parent over the region×nation rollup frame (≤ 30 rows)",
    "q183_cumulative_reach" -> "cumulative sum over one first-seen count per calendar day",
    "q186_mixture_alloc" -> "largest-remainder sweep over one row per source (≤ 20)",
    "q289_temperature_mixture" -> "largest-remainder seat sweep over one row per source (≤ 20)",
    "q187_growth_accounting" -> "lag over one row per calendar week",
    "q200_rolling_median" -> "7-day rolling frame over one row per calendar day (zero-filled)",
    "q242_cusum_changepoint" -> "PrefixScan offsets + day-index window over one row per calendar day",
    "q252_km_churn" -> "suffix cumulative risk set over one row per tenure half-year (180-day buckets, calendar-bounded)",
    "q257_seasonal_decompose" -> "13-month centered + month-index windows over one row per calendar month")

  /** A SinglePartition exchange fed (within its own stage) by a
    * partial-mode aggregate is the ordinary global-scalar shape — the
    * shuffle moves one pre-combined row per map task, bounded by task
    * count, never by data volume. Anything else funneling through one
    * partition is what this audit exists to catch. */
  private def partialAggUpstream(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec
      if a.aggregateExpressions.forall(e =>
        e.mode == Partial || e.mode == PartialMerge) => true
    case _: Exchange => false // next stage — pre-shuffle combine ends here
    case other => other.children.exists(partialAggUpstream)
  }

  private def offendingNodes(plan: SparkPlan): Seq[String] = {
    val nodes = Seq.newBuilder[String]
    def walk(p: SparkPlan): Unit = {
      p match {
        case w: WindowExec if w.partitionSpec.isEmpty =>
          nodes += "global-window"
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
          nodes += "global-window-limit"
        case e: ShuffleExchangeExec
          if e.outputPartitioning == SinglePartition && !partialAggUpstream(e.child) =>
          nodes += "single-partition-exchange"
        case a: AdaptiveSparkPlanExec => walk(a.initialPlan)
        case _ => ()
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(plan)
    nodes.result()
  }

  /** Build the query with checkpoints DISABLED (graft.plans.Ckpt
    * audit mode) so the audit walks the FULL pre-checkpoint plan — an
    * eager localCheckpoint would otherwise execute its upstream stages
    * at construction and hide any funnel above it from the audit. */
  private def auditedNodes(name: String): Seq[String] =
    graft.plans.Ckpt.withAudit {
      offendingNodes(
        SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan)
    }

  test("every declared query's plan is free of unallowlisted single-partition funnels") {
    val offenders = SparkEntry.registry.flatMap { q =>
      val nodes = auditedNodes(q.name)
      if (nodes.nonEmpty && !boundedGlobal.contains(q.name))
        Some(s"${q.name}: ${nodes.distinct.mkString(", ")}")
      else None
    }
    assert(offenders.isEmpty,
      s"\nqueries planning single-partition funnels without an allowlist bound:\n  ${
        offenders.mkString("\n  ")}")
  }

  test("plan audit performs no warehouse mutations (bucketed-index family included)") {
    // VERDICT r9 #8: constructing the pair-graph family used to
    // saveAsTable the bucketed shingle inventory even under audit mode.
    // Audit the whole family against a FRESH fixture dir (so no table
    // generation can pre-exist) and assert the warehouse gained no
    // graft_shidx2_* directory and the catalog no table.
    val tmp = java.nio.file.Files.createTempDirectory("graft_auditmut").toString
    spark.read.parquet(s"$dir/documents.parquet").limit(50)
      .coalesce(1).write.parquet(s"$tmp/documents.parquet")
    def warehouseDirs(): Set[String] = {
      val u = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
      val f = new java.io.File(if (u.getScheme == "file") u.getPath else u.toString)
      Option(f.listFiles()).map(_.map(_.getName).toSet).getOrElse(Set.empty)
    }
    def catalogTables(): Set[String] =
      spark.catalog.listTables().collect().map(_.name).toSet
    val (dirsBefore, tablesBefore) = (warehouseDirs(), catalogTables())
    graft.plans.Ckpt.withAudit {
      Seq("q43_ngram_jaccard", "q43c_jaccard_adaptive", "q255b_delta_neardup_bucketed",
        "q266_source_leakage", "q260_doc_knn", "q217_threshold_sweep")
        .foreach { name =>
          SparkEntry.queries(name)(spark, tmp).queryExecution.executedPlan
        }
    }
    assert(warehouseDirs() == dirsBefore,
      s"audit wrote warehouse dirs: ${warehouseDirs() -- dirsBefore}")
    assert(catalogTables() == tablesBefore,
      s"audit registered tables: ${catalogTables() -- tablesBefore}")
  }

  test("refined threshold probe plan is funnel-free (the ivf_refined branch, audited directly)") {
    // The registry-wide audit above can never walk the ivf_refined
    // branch: under audit mode the refinement BUILD is short-circuited
    // (the per-round checkpoints it needs are disabled, and without
    // them the lineage grows exponentially), so the base adjacency
    // gives probeVolume ≈ n² and the router falls to flat/allpairs.
    // Audit the branch's PROBE plan directly instead — its join
    // structure (own ⋈ adjacency ⋈ vecs ⋈ broadcast(cmeta) →
    // candidate scoring) is identical whichever quantizer granularity
    // the build produced, so funnel-freeness of this plan is
    // funnel-freeness of the production refined probe.
    graft.plans.Ckpt.withAudit {
      val nodes = offendingNodes(
        graft.operators.IvfAnn.refinedThresholdPairs(spark, dir, 0.35)
          .queryExecution.executedPlan)
      assert(nodes.isEmpty,
        s"refined probe plans single-partition funnels: ${nodes.distinct.mkString(", ")}")
    }
  }

  test("allowlist carries no stale entries") {
    val declared = SparkEntry.registry.map(_.name).toSet
    val stale = boundedGlobal.keys.filterNot(declared.contains)
    assert(stale.isEmpty, s"allowlisted but not declared: $stale")
    val noLongerGlobal = boundedGlobal.keys.filter(auditedNodes(_).isEmpty)
    assert(noLongerGlobal.isEmpty,
      s"allowlisted but now clean (remove the entries): $noLongerGlobal")
  }
}

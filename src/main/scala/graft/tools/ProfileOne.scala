package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-stage time attribution for a declared query (dev tool, guide §1):
  * runs the query once to warm codegen/caches, then once more under a
  * listener that records every stage's wall duration, summed task time,
  * task count and name — printed slowest-first so the optimization
  * target is the first line. Usage:
  *   sbt "runMain graft.tools.ProfileOne q110_dup_ngram_fraction,q44_minhash_lsh [sfDir]"
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.create()
    names.foreach(profile(spark, dir, _))
    spark.stop()
  }

  private def profile(spark: org.apache.spark.sql.SparkSession, dir: String,
      name: String): Unit = {

    final case class StageRec(id: Int, name: String, tasks: Int,
        taskTimeMs: Long, wallMs: Long, maxTaskMs: Long)
    val stages = mutable.ArrayBuffer.empty[StageRec]
    val taskTime = mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val maxTask = mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        val ms = Option(t.taskInfo).map(_.duration).getOrElse(0L)
        taskTime(t.stageId) += ms
        if (ms > maxTask(t.stageId)) maxTask(t.stageId) = ms
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
        val i = s.stageInfo
        val wall = (for {a <- i.completionTime; b <- i.submissionTime} yield a - b).getOrElse(0L)
        stages += StageRec(i.stageId, i.name.takeWhile(_ != '\n'), i.numTasks,
          taskTime(i.stageId), wall, maxTask(i.stageId))
      }
    }

    def once(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      graft.plans.DerivationCache.dropOrphans(spark.sparkContext)
      t
    }
    val warm1 = once() // codegen + shared-derivation warm
    val warm2 = once()
    spark.sparkContext.addSparkListener(listener)
    val t = once()
    // Drain the async listener bus BEFORE detaching (ADVICE r17):
    // events still queued at removal are silently dropped and the
    // profile under-reports stages.
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(listener)
    println(f"PROFILE $name warm1=$warm1%.2f warm2=$warm2%.2f measured=$t%.2f s, ${stages.size} stages")
    val sorted = stages.sortBy(-_.wallMs)
    sorted.take(25).foreach { s =>
      println(f"PROFILE  stage=${s.id}%4d wall=${s.wallMs}%6d ms task_sum=${s.taskTimeMs}%6d ms max_task=${s.maxTaskMs}%6d ms tasks=${s.tasks}%4d  ${s.name.take(90)}")
    }
    println(f"PROFILE  total_stage_wall=${sorted.map(_.wallMs).sum}%d ms (overlaps possible)")
  }
}

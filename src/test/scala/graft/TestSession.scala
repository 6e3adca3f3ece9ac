package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (suites share the
  * JVM; Spark sessions are expensive). */
object TestSession {
  lazy val spark: SparkSession = GraftSession.create("4")
}

package graft.etl

import scala.jdk.CollectionConverters._

/** YAML job-list loader: the declarative form of the reference's
  * hard-coded `[]TableJob` slice (`extractor.go:255-258`) plus its DSN
  * map (`extractor.go:233-236`) — one file declares the whole extract
  * run. Example:
  *
  * {{{
  * jobs:
  *   - table: big_table_1
  *     output: /out/db1/big_table_1
  *     primary_key: id
  *     url: jdbc:mysql://127.0.0.1:3307/db_1
  *     format: jdbc
  *     stride: 10000
  *     max_records_per_file: 100000
  *     schema_file: schema/db.yaml        # optional declared sink schema
  * }}}
  */
object JobsYaml {

  def parse(yaml: String): Seq[TableJob] = {
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, AnyRef]](yaml)
    val jobs = root.get("jobs") match {
      case l: java.util.List[_] => l.asScala.toSeq
      case other => throw new IllegalArgumentException(s"missing 'jobs' list: $other")
    }
    jobs.map { j =>
      val m = j.asInstanceOf[java.util.Map[String, AnyRef]].asScala
      def str(k: String): String = m.getOrElse(k,
        throw new IllegalArgumentException(s"job missing '$k'")).toString
      def opt(k: String): Option[String] = m.get(k).map(_.toString)
      TableJob(
        tableName = str("table"),
        output = str("output"),
        primaryKey = str("primary_key"),
        url = str("url"),
        format = opt("format").getOrElse("jdbc"),
        stride = opt("stride").map(_.toLong).getOrElse(10000L),
        maxRecordsPerFile = opt("max_records_per_file").map(_.toLong).getOrElse(100000L),
        declaredSchema = opt("schema_file").map(SchemaYaml.load))
    }
  }

  def load(path: String): Seq[TableJob] =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}

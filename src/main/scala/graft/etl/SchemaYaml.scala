package graft.etl

import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** YAML → StructType loader: parity with the reference's sink-schema
  * loader (`/root/reference/schema/read_schema.go:20-54`, consuming
  * `schema/db.yaml`). The reference formats YAML fields into parquet-go
  * tag strings (`name=…, type=INT64, repetitiontype=REQUIRED`); here the
  * same declaration becomes a Spark `StructType` used to validate /
  * coerce a scan before a sink write.
  *
  * Accepted YAML shape (same as schema/db.yaml):
  * {{{
  * schema:
  *   - name: id
  *     type: INT64
  *     repetitiontype: REQUIRED
  *   - name: data
  *     type: BYTE_ARRAY
  *     convertedtype: UTF8
  *     repetitiontype: REQUIRED
  * }}}
  */
object SchemaYaml {

  private def sparkType(t: String, converted: Option[String]): DataType =
    (t.toUpperCase, converted.map(_.toUpperCase)) match {
      case ("BYTE_ARRAY", Some("UTF8")) => StringType
      case ("BYTE_ARRAY", _)            => BinaryType
      case ("INT64", _)                 => LongType
      case ("INT32", _)                 => IntegerType
      case ("DOUBLE", _)                => DoubleType
      case ("FLOAT", _)                 => FloatType
      case ("BOOLEAN", _)               => BooleanType
      case ("INT96", _)                 => TimestampType
      case (other, _) =>
        throw new IllegalArgumentException(s"unsupported parquet type: $other")
    }

  def parse(yaml: String): StructType = {
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, AnyRef]](yaml)
    val fields = root.get("schema") match {
      case l: java.util.List[_] => l.asScala.toSeq
      case other => throw new IllegalArgumentException(s"missing 'schema' list: $other")
    }
    StructType(fields.map { f =>
      val m = f.asInstanceOf[java.util.Map[String, AnyRef]].asScala
      val name = m("name").toString
      val t = m("type").toString
      val conv = m.get("convertedtype").map(_.toString)
      val nullable = !m.get("repetitiontype").map(_.toString.toUpperCase).contains("REQUIRED")
      StructField(name, sparkType(t, conv), nullable = nullable)
    })
  }

  def load(path: String): StructType =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}

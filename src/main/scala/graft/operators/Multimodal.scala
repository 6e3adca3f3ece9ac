package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** Multimodal-column plumbing (north star): media payloads are opaque
  * BinaryType columns with typed metadata; decode / feature-extract /
  * frame-sample run as per-partition batch functions over the binary
  * column. The decode step itself is STUBBED deterministically (no
  * image/audio libs in this container — see the builder contract); the
  * Spark-side plumbing (schema, partitioning, batch iteration, explode
  * of per-frame rows) is real and oracle-checked.
  */
object Multimodal {

  /** Typed row for the frame-sampling pipeline output. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame_sha: String)

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  val qs: Seq[Q] = Seq(
    // Binary payload + typed metadata: byte length, content hash, and a
    // deterministic stand-in for decoded media dimensions.
    Q("q52_multimodal_meta",
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  sha256(text) AS payload_sha,
        |  CAST(doc_id * 7919 % 1920 AS INTEGER) AS fake_width,
        |  CAST(doc_id * 104729 % 1080 AS INTEGER) AS fake_height
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("payload", col("text").cast("binary"))
        .select(col("doc_id"),
          length(col("payload")).as("n_bytes"),
          sha2(col("payload"), 256).as("payload_sha"),
          (col("doc_id") * 7919 % 1920).cast("int").as("fake_width"),
          (col("doc_id") * 104729 % 1080).cast("int").as("fake_height"))
        .orderBy(col("doc_id"))
    },

    // "Resize" stub: the byte-level shape of a media downscale — slice
    // the payload to a target byte budget (binary substring), emit the
    // typed metadata struct a real resizer would fill. The decode/
    // re-encode core is the deterministic stand-in (no media libs in
    // this container); the binary column plumbing is real.
    Q("q52b_multimodal_resize",
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS orig_bytes,
        |  CAST(least(octet_length(encode(text)), 64) AS INTEGER) AS resized_bytes,
        |  sha256(substr(text, 1, 64)) AS resized_sha,
        |  CAST(doc_id % 4 + 1 AS INTEGER) AS scale_factor
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("payload", col("text").cast("binary"))
        .withColumn("resized", substring(col("payload"), 1, 64))
        .select(col("doc_id"),
          length(col("payload")).as("orig_bytes"),
          length(col("resized")).as("resized_bytes"),
          sha2(col("resized"), 256).as("resized_sha"),
          (col("doc_id") % 4 + 1).cast("int").as("scale_factor"))
        .orderBy(col("doc_id"))
    },

    // Frame-sampling pipeline: typed Dataset + mapPartitions (the batch
    // shape a real decoder UDF would use — one partition = one batch of
    // payloads), exploding each document into (n_chars mod 5)+1 frame
    // rows with a per-frame content hash. The "decode" is the sha256
    // stub; everything around it (encoders, partitioning, fan-out
    // schema) is the production plumbing.
    Q("q53_multimodal_frames",
      """SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        |  substr(sha256(text || '#' || CAST(i AS VARCHAR)), 1, 16) AS frame_sha
        |FROM (SELECT doc_id, text, unnest(range(0, n_chars % 5 + 1)) AS i FROM documents) t
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      implicit val inEnc: Encoder[(Long, String, Long)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.scalaLong)
      implicit val outEnc: Encoder[Frame] = Encoders.product[Frame]
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"), col("n_chars"))
        .as[(Long, String, Long)]
        .mapPartitions { it =>
          it.flatMap { case (id, text, nChars) =>
            val nFrames = (nChars % 5).toInt + 1
            (0 until nFrames).iterator.map { i =>
              Frame(id, i, sha256Hex(s"$text#$i").substring(0, 16))
            }
          }
        }
        .toDF()
        .orderBy(col("doc_id"), col("frame_idx"))
    }
  )
}

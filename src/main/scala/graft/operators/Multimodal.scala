package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** Multimodal-column plumbing (north star): media payloads are opaque
  * BinaryType columns with typed metadata; decode / feature-extract /
  * frame-sample run as per-partition batch functions over the binary
  * column. q52/q52b/q53 use deterministic byte-level stand-ins; q52c is
  * a REAL image pipeline — PNG encode → javax.imageio decode →
  * nearest-neighbor resize → pixel hash — oracled end-to-end because
  * the synthetic pixel function is deterministic integer math DuckDB
  * can recompute (a wrong decode or resize breaks the hash).
  */
object Multimodal {

  /** Typed row for the frame-sampling pipeline output. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame_sha: String)

  /** Binary media column row (doc_id + PNG payload). */
  final case class Png(doc_id: Long, png: Array[Byte])

  /** Decoded+resized image summary row. */
  final case class Decoded(doc_id: Long, orig_w: Int, orig_h: Int, pixel_sha: String)

  /** Deterministic grayscale pixel function — the ONLY shared contract
    * between the Spark pipeline and the DuckDB oracle. */
  private def pixel(docId: Long, x: Int, y: Int): Int =
    ((docId * 31 + x * 7 + y * 13) % 256).toInt

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

    // REAL image decode: synthesize a PNG per document (stage 1 — the
    // stand-in for stored media files), then genuinely decode it with
    // javax.imageio, nearest-neighbor-resize to 4×4, and hash the
    // resized pixels (stage 2). Between the stages the payload is an
    // opaque BinaryType column, exactly the shape a media lakehouse
    // table has. The oracle recomputes the resized pixel values from
    // the deterministic pixel function — if the PNG round-trip, the
    // decode, or the resize indexing were wrong, the hash would differ.
    Q("q52c_multimodal_decode",
      """SELECT doc_id,
        |  CAST(8 + doc_id % 9 AS INTEGER) AS orig_w,
        |  CAST(8 + doc_id % 7 AS INTEGER) AS orig_h,
        |  sha256(list_aggregate(list_transform(range(0, 16),
        |    i -> CAST((doc_id*31 + ((i % 4) * (8 + doc_id % 9) // 4) * 7
        |             + ((i // 4) * (8 + doc_id % 7) // 4) * 13) % 256 AS VARCHAR)),
        |    'string_agg', ',')) AS pixel_sha
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      import javax.imageio.ImageIO
      import java.awt.image.BufferedImage
      implicit val idEnc: Encoder[Long] = Encoders.scalaLong
      implicit val pngEnc: Encoder[Png] = Encoders.product[Png]
      implicit val decEnc: Encoder[Decoded] = Encoders.product[Decoded]
      // Stage 1: binary media column (real PNG bytes, deterministic).
      val media = Tables.documents(s, d)
        .select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          // ImageIO's default ImageInputStream cache is a TEMP FILE per
          // image — pure overhead for in-memory byte arrays (~35% of
          // the decode stage); keep codec I/O on the heap.
          ImageIO.setUseCache(false)
          it.map { id =>
            val w = (8 + id % 9).toInt
            val h = (8 + id % 7).toInt
            val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = pixel(id, x, y)
                img.setRGB(x, y, (v << 16) | (v << 8) | v)
                x += 1
              }
              y += 1
            }
            val baos = new java.io.ByteArrayOutputStream()
            ImageIO.write(img, "png", baos)
            Png(id, baos.toByteArray)
          }
        }
      // Stage 2: decode the binary column and resize for real.
      media
        .mapPartitions { it =>
          ImageIO.setUseCache(false)
          it.map { p =>
            val img = ImageIO.read(new java.io.ByteArrayInputStream(p.png))
            val (w, h) = (img.getWidth, img.getHeight)
            val vals = for (y <- 0 until 4; x <- 0 until 4)
              yield img.getRGB(x * w / 4, y * h / 4) & 0xFF
            Decoded(p.doc_id, w, h, sha256Hex(vals.mkString(",")))
          }
        }
        .toDF()
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

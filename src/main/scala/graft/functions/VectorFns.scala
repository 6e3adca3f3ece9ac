package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(FloatType) embedding columns, built from
  * codegen'd higher-order functions (zip_with + aggregate) — no UDFs.
  * All arithmetic is promoted to double with a fixed left-to-right
  * summation order, so results are deterministic and engine-comparable.
  *
  * Scale note: for top-k similarity the norms are computed once per row
  * (not per pair) and the small query side is broadcast — the pair loop
  * is then a broadcast nested-loop join that scales linearly in the
  * corpus and never shuffles the corpus side.
  */
object VectorFns {

  /** Sequential-fold dot product of two float-array columns, in double. */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def normD(a: Column): Column = sqrt(dotD(a, a))

  /** Cosine similarity with precomputed norms (preferred at scale). */
  def cosineWithNorms(dot: Column, normA: Column, normB: Column): Column =
    when(normA === 0 || normB === 0, lit(0.0)).otherwise(dot / (normA * normB))

  /** Self-contained cosine similarity of two float-array columns. */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(dotD(a, b), normD(a), normD(b))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two bucketed
  * dimensions so that sorting by the z-value co-locates rows that are
  * close in BOTH dimensions. Files written from a z-sorted layout have
  * tight min/max ranges on every dimension, so parquet file/row-group
  * skipping prunes 2-D box queries — a linear sort only prunes its
  * leading column. Built from shift/and/or arithmetic on built-ins (no
  * custom expression needed; 16 bits per dimension).
  */
object ZOrder {

  /** Morton code of two non-negative int columns (low `bits` bits).
    * Bits are widened to LONG before the left shift: shiftleft on an
    * IntegerType wraps at 32 bits, so y's bit 15 (shift 31) would
    * otherwise land on the int sign bit and produce negative z-values
    * that scramble the range partitioning. */
  def zvalue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1)).cast("long"), 2 * b) +
        shiftleft(shiftright(y, b).bitwiseAND(lit(1)).cast("long"), 2 * b + 1)
    }.reduce(_ + _)

  /** Write `df` clustered by the z-order of two bucketed dimensions.
    * `repartitionByRange` on the z-value gives each output file a
    * contiguous z-range (= a small tile in (x, y) space). */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, path: String,
      nFiles: Int): Unit =
    df.withColumn("zv", zvalue(x, y))
      .repartitionByRange(nFiles, col("zv"))
      .sortWithinPartitions(col("zv"))
      .drop("zv")
      .write.mode("overwrite").parquet(path)
}

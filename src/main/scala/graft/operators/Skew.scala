package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY "salting for skew"). AQE's skew-join
  * handling covers joins at runtime; explicit salting remains the tool
  * for heavily-skewed AGGREGATIONS, where one hot key would otherwise
  * serialize into a single reducer.
  */
object Skew {

  /** Two-phase salted aggregation: group by (key, salt) first so a hot
    * key spreads over `buckets` reducers, then re-aggregate per key.
    * Works for any algebraic aggregate supplied as (partial, merge)
    * column pairs. The salt is derived from stable row content (not
    * rand()) so results stay deterministic.
    */
  def saltedSum(df: DataFrame, key: Column, saltSource: Column, value: Column,
      buckets: Int = 16): DataFrame = {
    df.groupBy(key.as("k"), pmod(xxhash64(saltSource), lit(buckets)).as("salt"))
      .agg(sum(value).as("partial_sum"), count(lit(1)).as("partial_n"))
      .groupBy(col("k"))
      .agg(sum(col("partial_sum")).as("total"), sum(col("partial_n")).as("n"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join helper: salt the (skewed) fact side
  * deterministically and explode the dimension side across the salt
  * range, so one hot key spreads over `saltFactor` reducers instead
  * of melting a single task. AQE's skew-join split handles moderate
  * skew at runtime; this is the explicit variant for known-hot keys
  * or non-AQE lanes. Result is identical to the plain join.
  */
object SkewJoin {

  /** The salt value only controls row placement — every salt
    * assignment produces the same join result, so the
    * partition-dependent id source is safe here.
    *
    * @param facts      large skewed side
    * @param dim        smaller side (replicated `saltFactor` times)
    * @param key        equi-join key present on both sides
    * @param saltFactor number of salt buckets a hot key spreads over
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String, saltFactor: Int): DataFrame = {
    val salted = facts.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val exploded = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted
      .join(exploded, Seq(key, "_salt"))
      .drop("_salt")
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Skew-handling join utilities.
  *
  * AQE's skew-join splitting (on by default in our sessions) handles most
  * runtime skew; explicit salting remains the tool when a hot key is known
  * up front and the dimension side is too large to broadcast: it turns one
  * straggler partition into `saltFactor` even ones at the cost of
  * replicating the dimension rows `saltFactor` times.
  */
object Skew {

  /** Equi-join `fact` (skewed) with `dim` on `key`, spreading each fact key
    * across `saltFactor` buckets. Fact rows take a deterministic
    * pseudo-random salt; every dim row is replicated once per salt so each
    * (key, salt) bucket joins locally. Result equals the unsalted join.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast(IntegerType))
    val dimExp = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(dimExp, Seq(key, "__salt"), joinType).drop("__salt")
  }
}

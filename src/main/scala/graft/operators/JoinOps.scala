package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join utilities for skewed keys at scale.
  *
  * `saltedJoin` is the classic skew antidote when AQE's skew-join split
  * cannot help (e.g. a single hot key in an aggregation-feeding join):
  * the skewed (large) side gets a random salt in [0, saltFactor); the
  * small side is replicated saltFactor times; the join key becomes
  * (key, salt), spreading one hot key over saltFactor reducers.
  * Semantics are identical to the unsalted inner/left join — verified by
  * the test suite.
  */
object JoinOps {

  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFactor: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salting supports inner/left joins, got $joinType")
    // deterministic pseudo-salt: hash of all large-side columns modulo
    // factor (uniform enough to spread a hot key; avoids nondeterministic
    // rand() so retried tasks salt identically)
    val salted = large.withColumn("__salt",
      pmod(hash(large.columns.map(c => col(s"`$c`")): _*), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit(_)): _*)))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}

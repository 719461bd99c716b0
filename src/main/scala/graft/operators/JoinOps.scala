package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
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

  /** Register the bloom expressions through the function-registry bridge
    * (the Spark 4 route to custom/internal Catalyst expressions as
    * Columns — same pattern as
    * [[graft.functions.VectorFunctions.register]]). Both sides hash the
    * key through XxHash64 so build and probe agree. */
  def registerBloom(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new BloomFilterAggregate(new XxHash64(Seq(exprs(0))),
        exprs(1), exprs(2)).toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains",
      exprs => BloomFilterMightContain(exprs(0), new XxHash64(Seq(exprs(1)))),
      "built-in")
  }

  /** Build a bloom filter over a key column as one partial-agg'd pass —
    * the serialized sketch (MBs for hundreds of millions of keys at 1 %
    * fpp) is the only thing that reaches the driver. */
  def buildBloom(keys: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    registerBloom(keys.sparkSession)
    val numBits =
      org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(expectedItems, fpp)
    keys.select(call_function("graft_bloom_agg", col(keyCol),
      lit(expectedItems), lit(numBits)))
      .head().getAs[Array[Byte]](0)
  }

  /** Bloom-pruned semi-join: keep `large` rows whose `largeKey` appears
    * in `keys`' `keysKey` — for the regime where the key set is too big
    * to broadcast as a hash relation but its bloom sketch is not.
    *
    * The sketch is built in one pass over the key side, shipped as a
    * literal into a map-side `might_contain` filter on the large side —
    * so the shuffle for the exact semi-join that follows carries only
    * rows that CAN match (plus the fpp sliver) instead of the whole
    * table. The trailing exact join removes false positives: the result
    * EQUALS the plain semi-join row-for-row (oracle-gated by q99), the
    * bloom only cuts exchange volume. This is the manual form of the
    * runtime-filter pushdown Spark applies inside one query, made
    * available ACROSS queries/tables (e.g. pruning a 100 TB corpus by a
    * billion-key dedup list). */
  def bloomSemiJoin(large: DataFrame, keys: DataFrame, largeKey: String,
      keysKey: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val sketch = buildBloom(keys, keysKey, expectedItems, fpp)
    val pruned = large.filter(
      call_function("graft_bloom_contains", lit(sketch), col(largeKey)))
    pruned.join(keys.select(col(keysKey).as(largeKey)).distinct(),
      Seq(largeKey), "left_semi")
  }

  /** BINNED range join: `points` ⋈ `intervals` ON point ∈ [lo, hi],
    * where no equi-key exists to hash on. Spark plans a raw inequality
    * join as BroadcastNestedLoopJoin (O(|points|·|intervals|) compares,
    * and an OOM once the interval side outgrows the driver) — the binned
    * rewrite makes it an EQUI join: every interval explodes to the
    * fixed-width bins it covers, every point maps to its one bin, and
    * the exact predicate re-filters the bin-collision candidates. Each
    * point lands in exactly one bin, so a (point, interval) pair can
    * match at most once — no dedup pass. Candidate volume is
    * |points| + Σ interval_width/binSize collisions; pick `binSize`
    * near the typical interval width (the Databricks range-join-hint
    * contract, built here from plain operators). Both columns must be
    * in the same numeric domain (e.g. `unix_micros`). Result: all
    * `points` columns + all `intervals` columns, inner semantics, hi
    * exclusive. */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binSize: Long): DataFrame = {
    require(binSize > 0, s"need binSize > 0, got $binSize")
    val binned = points.withColumn("__bin",
      floor(col(pointCol) / binSize).cast("long"))
    // degenerate intervals (hi <= lo) match nothing under hi-exclusive
    // semantics — and must be dropped BEFORE the explode: a reversed
    // sequence would otherwise generate (lo-hi)/binSize bins per row
    val expanded = intervals.filter(col(hiCol) > col(loCol))
      .withColumn("__bin",
        explode(sequence(floor(col(loCol) / binSize).cast("long"),
          floor((col(hiCol) - 1) / binSize).cast("long"))))
    binned.join(expanded, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }
}

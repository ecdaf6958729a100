package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling for hot join keys (SURVEY.md §4, §7.4).
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.*`, enabled in
  * every session here) is the first line of defense and needs no code. This
  * utility is the second line, for the pathological case AQE cannot fix: a
  * *single* key whose matching rows exceed one task's memory — e.g. the
  * value-label join where millions of claims point at "human" (Q5).
  *
  * Salting: the fact side gets a uniform random salt in [0, buckets); the
  * dimension side is replicated `buckets` times. The join key becomes
  * (key, salt), spreading one hot key over `buckets` tasks. Replication
  * multiplies the (small) dimension, so `buckets` stays modest and the dim
  * side must be the small one — exactly the label-dimension shape.
  */
object SkewJoins {

  /** Equi-join `facts ⋈ dim` on `key` with an s-way salt.
    * `dim` must be the small side (it is replicated `buckets` times).
    * The salt is deterministic per fact row (hash of all fact columns'
    * `key` + a stable row discriminator column `saltBy`).
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
                 saltBy: Column, buckets: Int, joinType: String = "inner"): DataFrame = {
    val salted = facts.withColumn("_salt", pmod(xxhash64(saltBy), lit(buckets)).cast("int"))
    val replicated = dim
      .withColumn("_salt", explode(array((0 until buckets).map(lit): _*)))
    val out = salted.join(replicated, Seq(key, "_salt"), joinType)
    out.drop("_salt")
  }
}

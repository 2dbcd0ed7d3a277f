package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join helpers for skew that AQE can't always fix (e.g. one hot key
  * dominating a shuffle join where the other side is too big to
  * broadcast).
  */
object Joins {

  /** Salted inner equi-join: the big (skewed) side gets a random salt in
    * [0, buckets); the small side is replicated once per salt value; the
    * join key becomes (keys, salt), spreading each hot key over `buckets`
    * reducers. Output is identical to `big.join(small, keys)` for any
    * salt assignment — salting only changes row placement.
    *
    * Cost model: small side shuffles `buckets`× its size; use only when
    * the hot-key partition would otherwise exceed executor memory (the
    * reference never needed this at parallelism 1; a 100TB ad-click
    * stream keyed by province — q06's shape — does).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      buckets: Int, seed: Long = 42L): DataFrame = {
    require(buckets > 0, "saltedJoin: buckets must be positive")
    val salted = big.withColumn("_salt", (rand(seed) * buckets).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(lit((0 until buckets).toArray)))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }
}

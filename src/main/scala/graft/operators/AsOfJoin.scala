package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left ("probe") row, the single most recent right
  * ("reference") row with right.ts <= left.ts on the same key. Spark has
  * no built-in; the naive formulation (equi-join on key + ts range, then
  * rank) explodes to O(|left| × |right-per-key|) pairs before pruning.
  *
  * This operator is the scalable single-sort form: union both sides
  * tagged, one hash exchange on the key, one in-partition sort by
  * (ts, tag, tieCol), then `last(_, ignoreNulls)` carries the latest
  * right payload forward onto each left row. Shuffle volume is
  * O(|left| + |right|) — no pair blowup, skew bounded by key cardinality
  * of the UNION (same as any keyed op).
  *
  * Determinism: among right rows sharing (key, ts), the one with the
  * largest `tieCol` wins (right rows sort before left rows at equal ts,
  * so an exactly-simultaneous right row IS visible to the left row).
  */
object AsOfJoin {

  /** @param rightPayload right columns to attach (renamed as given)
    * @param tieCol       right column ordering simultaneous right rows
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, tieCol: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns
      .filterNot(c => keys.contains(c) || c == tsCol).toSeq
    val lStruct = struct(leftCols.map(col): _*)
    val rStruct = struct((tieCol +: rightPayload.filterNot(_ == tieCol))
      .map(col): _*)

    val l2 = left.select(
      keys.map(col) ++ Seq(col(tsCol).as("_ts"), lit(1).as("_tag"),
        lit(null).cast("long").as("_tie"), lStruct.as("_l"),
        lit(null).cast(right.select(rStruct).schema.head.dataType).as("_r")): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(col(tsCol).as("_ts"), lit(0).as("_tag"),
        col(tieCol).cast("long").as("_tie"),
        lit(null).cast(left.select(lStruct).schema.head.dataType).as("_l"),
        rStruct.as("_r")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_tag").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried: Column = last(col("_r"), ignoreNulls = true).over(w)

    l2.unionByName(r2)
      .withColumn("_match", carried)
      .filter(col("_tag") === 1 && col("_match").isNotNull)
      .select(
        keys.map(col) ++
          Seq(col("_ts").as(tsCol)) ++
          leftCols.map(c => col(s"_l.$c").as(c)) ++
          (tieCol +: rightPayload.filterNot(_ == tieCol))
            .map(c => col(s"_match.$c").as(s"right_$c")): _*)
  }
}

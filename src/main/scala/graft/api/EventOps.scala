package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavior-analytics API over an event log — the analyses the
  * reference's domain (e-commerce user behavior, SURVEY.md §0) is
  * ultimately for: funnel conversion, cohort retention, and event-type
  * transition structure. All column names are caller-supplied; outputs
  * use fixed, documented names.
  *
  * Scale notes: every stage keys on the user column, so successive
  * aggregations/joins are co-partitioned (one logical shuffle domain);
  * final outputs are aggregates over tiny result spaces (stages,
  * cohort×offset, type×type) with map-side partial aggregation.
  */
object EventOps {

  /** Strict ordered funnel: a user reaches stage i when they have an
    * event of `stages(i)` at-or-after their stage-(i-1) reach time
    * (stage 0 = earliest occurrence). Returns one row per stage:
    * (step, stage, n_users). A later event of an earlier stage never
    * un-reaches a user — semantics are first-reach, monotone.
    *
    * Each stage is a co-partitioned join+min-agg on the user key; the
    * event scan pushes the stage's type filter down to parquet. No
    * window functions, no driver-side iteration over data — the loop
    * is over the (constant) stage list.
    */
  def funnel(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // internal names so caller columns named "u"/"t" can't collide
    val ev = df.select(col(userCol).as("_fu"), col(tsCol).as("_ft"),
      col(typeCol).as("_fk"))
    // reached(i): DataFrame(_fu, _rt = first time the user completed
    // stages 0..i in order)
    val first = ev.filter(col("_fk") === stages.head)
      .groupBy(col("_fu")).agg(min(col("_ft")).as("_rt"))
    val reached = stages.tail.scanLeft(first) { (prev, stage) =>
      ev.filter(col("_fk") === stage)
        .join(prev, "_fu")
        .filter(col("_ft") >= col("_rt"))
        .groupBy(col("_fu")).agg(min(col("_ft")).as("_rt"))
    }
    // ONE final exchange, not one per stage: tag each reach-frame and
    // count in a single grouped aggregate (map-side partials emit at
    // most |stages| rows per task)
    reached.zipWithIndex.map { case (r, i) =>
      r.select(lit(i).as("step"), lit(stages(i)).as("stage"))
    }.reduce(_.unionByName(_))
      .groupBy(col("step"), col("stage"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Cohort retention: users are cohorted by their first active day;
    * output is (cohort_day, day_offset, n_users) — how many of each
    * cohort were active `day_offset` days after their first day.
    * `dayCol` is any integral day index the caller derives (epoch
    * days, etc.).
    *
    * Two exchanges: distinct active (user, day) pairs, then the
    * per-user min — both on the user key, co-partitioned. The final
    * rollup collapses to cohort×offset cardinality with partial aggs.
    */
  def retention(df: DataFrame, userCol: String, dayCol: String): DataFrame = {
    val days = df.select(col(userCol).as("u"), col(dayCol).as("d")).distinct()
    val cohort = days.groupBy(col("u")).agg(min(col("d")).as("cohort_day"))
    days.join(cohort, "u")
      .select(col("cohort_day"), (col("d") - col("cohort_day")).as("day_offset"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order transition counts: for each user's event sequence
    * (ordered by `tsCol`, ties by `tieCol`), count consecutive
    * (prev_type, next_type) pairs across all users. The Markov-chain
    * view of behavior — which actions follow which.
    *
    * One exchange on the user key; the lag window is PARTITIONED BY
    * user (never global — the PlanSpec scale-killer), then the pair
    * count collapses to |types|² rows map-side.
    */
  def transitions(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    df.select(col(userCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n_pairs"))
  }
}

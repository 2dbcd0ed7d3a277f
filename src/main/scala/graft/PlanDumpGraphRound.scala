package graft

import java.io.PrintWriter

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Plan evidence for the ITERATIVE graph operators (round 17).
  *
  * The catalog queries' terminal plans hide every per-round join
  * behind localCheckpoint `Scan ExistingRDD` nodes (VERDICT r16
  * "what's wrong" #3 — the r16 graph dumps were vacuous), so this
  * tool dumps a SINGLE ROUND's plan instead: it reproduces one
  * HITS authority half-round and one ConnectedComponents plain round
  * exactly as the operators build them — the `_before` shapes are the
  * r16 loop bodies (PageRank.scala/ConnectedComponents.scala at
  * d4b956b), the `_after` shapes the r17 ones — over the same
  * parquet-backed host-graph fixture q159/q152 rank. Runs each shape
  * at BOTH broadcast-path (default session threshold; the local/
  * small-graph shape) and partitioned-path
  * (autoBroadcastJoinThreshold=-1; the 100 TB shape) settings.
  *
  * {{{ sbt "runMain graft.PlanDumpGraphRound <outDir> [sfDir]" }}}
  */
object PlanDumpGraphRound {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = BenchHarness.session()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    // q159's directed host edges, hashed exactly as hitsByKey does
    def edges(s: SparkSession): DataFrame = {
      val links = graft.api.TextOps.extractLinks(
        graft.queries.PipelineQueries.linkFixture(
          Tables.documents(s, sf)), "doc_id", "text")
      links.filter(col("host") =!= "")
        .select(
          graft.functions.TextHashing.hash60(
            concat(lit("ex"), (col("doc_id") % 9).cast("string"),
              lit(".org"))).as("s"),
          graft.functions.TextHashing.hash60(col("host")).as("t"))
        .filter(col("s") =!= col("t"))
    }

    def dump(name: String, df: DataFrame): Unit = {
      df.collect() // finalize AQE in place
      val pw = new PrintWriter(s"$outDir/$name.txt")
      pw.println(df.queryExecution.explainString(
        ExplainMode.fromString("formatted")))
      pw.close()
      println(s"dumped $name")
    }

    for ((mode, thr) <- Seq(("bcast", "10485760"), ("part", "-1"))) {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      val small = graft.operators.PageRank.broadcastableEdges(edges(spark))
      println(s"mode=$mode broadcastableEdges=$small")

      // ---- HITS authority half-round -----------------------------------
      val e0 = edges(spark).distinct()
      val eS = (if (small) e0 else e0.repartition(col("s"))).persist()
      val eSJ = if (small) broadcast(eS) else eS
      val v = eS.select(col("s").as("id"))
        .union(eS.select(col("t").as("id"))).distinct().persist()
      val hub = v.withColumn("h", lit(PageRankScale))
      val aRaw = eSJ.join(hub.withColumnRenamed("id", "s"), Seq("s"))
        .groupBy(col("t").as("id"))
        .agg(sum(col("h").cast("decimal(38,0)")).as("_ar"))
      val aMax = aRaw.agg(max(col("_ar")).as("_am"))
      // r16 shape: per-round v LEFT JOIN re-attaching zero rows
      val authBefore = v.join(aRaw, Seq("id"), "left")
        .crossJoin(broadcast(aMax))
        .select(col("id"),
          coalesce(expr(s"(_ar * $PageRankScale) div _am"), lit(0L)).as("a"))
      // r17 shape: positive support only, zeros re-attached once at the end
      val authAfter = aRaw.crossJoin(broadcast(aMax))
        .select(col("id"),
          coalesce(expr(s"(_ar * $PageRankScale) div _am"), lit(0L)).as("a"))
      dump(s"hits_auth_round_${mode}_before", authBefore)
      dump(s"hits_auth_round_${mode}_after", authAfter)

      // ---- ConnectedComponents plain round -----------------------------
      val sym0 = e0.select(col("s").as("src"), col("t").as("dst"))
        .union(e0.select(col("t").as("src"), col("s").as("dst")))
      val sym = (if (small) sym0 else sym0.repartition(col("src"))).persist()
      val symJ = if (small) broadcast(sym) else sym
      val labels = sym.select(col("src").as("id")).distinct()
        .withColumn("lbl", col("id")).localCheckpoint()
      // r16 shape: propagate join + separate labels ⟕ nbrMin join
      val nbrMin = symJ
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst")).agg(min(col("lbl")).as("nmin"))
        .withColumnRenamed("dst", "id")
      val ccBefore = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("lbl"),
          least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("cand"))
      // r17 shape: the self label rides the SAME aggregation (tagged
      // union branch) — one exchange, no second join
      val ccAfter = symJ
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("lbl"), lit(false).as("_self"))
        .unionByName(labels.select(col("id"), col("lbl"),
          lit(true).as("_self")))
        .groupBy(col("id"))
        .agg(min(col("lbl")).as("cand"),
          max(when(col("_self"), col("lbl"))).as("lbl"))
        .select(col("id"), col("lbl"), col("cand"))
      dump(s"cc_plain_round_${mode}_before", ccBefore)
      dump(s"cc_plain_round_${mode}_after", ccAfter)

      graft.api.Lifecycle.releaseLocalCheckpoint(labels)
      eS.unpersist(); v.unpersist(); sym.unpersist()
    }
    spark.stop()
  }

  private val PageRankScale = graft.operators.PageRank.Scale
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Substage attribution for q89 (the composed curation pipeline) —
  * the guide-§1 "measure first" tool behind the round-16 optimization
  * work. [[graft.jobs.CurationPipeline.run]] labels each keep-set cut
  * job (`curation: <stage>`); this main attaches a listener, runs the
  * q89 thunk end-to-end N times, and prints per-label job seconds so
  * the 4-second bench entry decomposes into stages instead of being
  * one opaque number. Unlabeled jobs (the terminal packed noop write)
  * report as `final_packed`.
  *
  * Run exclusively: {{{ sbt "runMain graft.CurationSubstageMeasure" }}}
  */
object CurationSubstageMeasure {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark: SparkSession = BenchHarness.session()
    val acc = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]
    val totals = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val d = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("final_packed")
        acc.put(j.jobId, (d, j.time))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(acc.remove(j.jobId)).foreach { case (d, t0) =>
          totals.synchronized {
            totals(d) = totals.getOrElse(d, 0.0) + (j.time - t0) / 1e3
          }
        }
      }
    })
    def once(d: String): Double = {
      val t0 = System.nanoTime()
      BenchHarness.exec(SparkEntry.queries("q89_curation_pipeline")(spark, d))
      (System.nanoTime() - t0) / 1e9
    }
    once("/root/testdata/sf0.001") // warmup (JIT/codegen)
    BenchHarness.drainLocalCheckpoints(spark)
    totals.synchronized(totals.clear())
    val runs = (1 to 3).map { _ =>
      val t = once(dir)
      BenchHarness.drainLocalCheckpoints(spark)
      t
    }
    Thread.sleep(2000) // let the listener bus drain the last job events
    val rows = totals.synchronized(totals.toSeq)
    import BenchHarness.num
    val js = rows.map { case (k, v) =>
      "\"" + k.replace("curation: ", "") + "\":" + num(v / runs.size)
    }.mkString("{", ",", "}")
    println(s"""{"metric":"curation_substages","dir":"$dir","runs":[${
      runs.map(num).mkString(",")}],"avg_stage_sec":$js}""")
    spark.stop()
  }
}

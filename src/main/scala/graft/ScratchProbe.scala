package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch probe (round-16 measurement aid, not part of the catalog):
  * times a named query min-of-N after warmup and reports job/stage/task
  * counts per run, so fixed scheduling overhead separates from compute.
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark: SparkSession = BenchHarness.session()
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = ()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks); ()
      }
    })
    def once(d: String): Double = {
      val t0 = System.nanoTime()
      BenchHarness.exec(SparkEntry.queries(name)(spark, d))
      (System.nanoTime() - t0) / 1e9
    }
    once("/root/testdata/sf0.001")
    once("/root/testdata/sf0.001")
    BenchHarness.drainLocalCheckpoints(spark)
    (1 to 3).foreach { i =>
      jobs.set(0); stages.set(0); tasks.set(0)
      val t = once(dir)
      Thread.sleep(300)
      println(f"RUN$i $name time=$t%.3f jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
      BenchHarness.drainLocalCheckpoints(spark)
    }
    spark.stop()
  }
}

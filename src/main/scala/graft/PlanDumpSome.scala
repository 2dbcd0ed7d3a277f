package graft

import java.io.PrintWriter

import org.apache.spark.sql.execution.ExplainMode

/** Dumps the AQE-final `.explain("formatted")` plan of NAMED catalog
  * queries, one file per query — the before/after plan evidence for
  * optimization rounds (plans/r16/<query>_<tag>.txt).
  *
  * {{{ sbt "runMain graft.PlanDumpSome <outDir> <tag> <q1,q2,...> [sfDir]" }}}
  */
object PlanDumpSome {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sf = if (args.length > 3) args(3) else "/root/testdata/sf0.001"
    val spark = BenchHarness.session()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sf)
      df.collect() // finalize AQE in place
      val pw = new PrintWriter(s"$outDir/${n}_$tag.txt")
      pw.println(df.queryExecution.explainString(
        ExplainMode.fromString("formatted")))
      pw.close()
      println(s"dumped $n -> $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

/** Dev runner: drives the multimodal decode plumbing through its public
  * API — corpus payloads plus degenerate ones (empty / 1-byte).
  */
object MediaDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    println("=== decodedTable(sf0.001) ===")
    Multimodal.decodedTable(spark, "/root/testdata/sf0.001").show(5, false)

    println("=== edge payloads ===")
    val edge = Seq(
      MediaRecord(1L, "image/fake", Array.emptyByteArray),
      MediaRecord(2L, "image/fake", Array[Byte](42)),
      MediaRecord(3L, "image/fake", Array.fill[Byte](100000)(7)))
    val decodedEdge = Multimodal.decode(spark.createDataset(edge))
    decodedEdge.show(5, false)

    println("=== resize to 32x32 (corpus + edge) ===")
    Multimodal.resize(decodedEdge, 32, 32).show(5, false)
    Multimodal.resize(
      Multimodal.decode(Multimodal.documentsAsMedia(spark, "/root/testdata/sf0.001")),
      32, 32).show(3, false)

    println("=== sampleFrames k=3 ===")
    Multimodal.sampleFrames(decodedEdge, 3).show(10, false)
    spark.stop()
  }
}

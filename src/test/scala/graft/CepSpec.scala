package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming._

/** Generic CEP matcher: parity with the specialized operators (J3 via
  * fail-fail pattern, J4 via create-pay with timeout branch) plus
  * strict-vs-relaxed contiguity semantics.
  */
class CepSpec extends SparkSpec {

  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(ms: Long) = new Timestamp(ms)

  private def runCep(events: Seq[StreamEvent], pattern: Pattern,
      flushMs: Long, name: String): Set[CepMatch] = {
    val input = MemoryStream[StreamEvent]
    val out = Cep.matchPattern(
      input.toDS().withWatermark("ts", "0 seconds"), pattern)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(events)
      q.processAllAvailable()
      input.addData(StreamEvent(-999L, -1L, "sentinel", ts(flushMs)))
      q.processAllAvailable()
      input.addData(StreamEvent(-999L, -2L, "sentinel", ts(flushMs * 2)))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).as[CepMatch].collect().toSet
      .filter(_.key != -999L)
  }

  test("fail-next-fail pattern == SequenceMatch warnings (J3 parity)") {
    val fails = Tables.events(spark, sf)
      .filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), expr("ts_ns div 1000000").as("ms"))
      .collect()
      .map(r => StreamEvent(r.getLong(0), r.getLong(1), "fail", ts(r.getLong(2))))
    val gapMs = 3600 * 1000L
    val pat = Pattern(Seq(_.eventType == "fail", _.eventType == "fail"),
      gapMs, strict = true)
    val got = runCep(fails.toSeq, pat, fails.map(_.tsMs).max + 10 * gapMs, "cep_j3")
      .filter(_.tag == "matched")
      .map(m => (m.key, m.eventIds.head, m.eventIds.last))
    val want = SparkEntry.queries("q08_login_fail_consecutive")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("first_event"),
        r.getAs[Long]("last_event"))).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("create-followedBy-pay with timeout branch (J4 shape)") {
    val within = 30 * 60 * 1000L
    // base offset: rows at event-time 0 are "late" vs the initial
    // watermark (0) and get dropped before the operator
    val b = 1000L * 1000
    val evs = Seq(
      StreamEvent(1L, 10L, "create", ts(b)),          // pays in time
      StreamEvent(1L, 11L, "other", ts(b + 60000)),   // relaxed: survives
      StreamEvent(1L, 12L, "pay", ts(b + 120000)),
      StreamEvent(2L, 20L, "create", ts(b)),          // never pays → timeout
      StreamEvent(3L, 30L, "create", ts(b)),          // pays too late → timeout
      StreamEvent(3L, 31L, "pay", ts(b + within + 1)))
    val pat = Pattern(Seq(_.eventType == "create", _.eventType == "pay"),
      within, strict = false)
    val got = runCep(evs, pat, within * 10, "cep_j4")
    assert(got.exists(m => m.key == 1L && m.tag == "matched" &&
      m.eventIds == Seq(10L, 12L)))
    assert(got.exists(m => m.key == 2L && m.tag == "timeout" && m.stepsDone == 1))
    assert(got.exists(m => m.key == 3L && m.tag == "timeout" && m.stepsDone == 1))
    assert(!got.exists(m => m.key == 3L && m.tag == "matched"))
  }

  test("strict contiguity kills partials; relaxed survives") {
    val evs = Seq(
      StreamEvent(1L, 1L, "a", ts(1000)),
      StreamEvent(1L, 2L, "x", ts(2000)), // intervening
      StreamEvent(1L, 3L, "b", ts(3000)))
    val within = 60 * 1000L
    def pat(strict: Boolean) =
      Pattern(Seq(_.eventType == "a", _.eventType == "b"), within, strict)
    val strictGot = runCep(evs, pat(strict = true), within * 100, "cep_strict")
      .filter(_.tag == "matched")
    val relaxedGot = runCep(evs, pat(strict = false), within * 100, "cep_relaxed")
      .filter(_.tag == "matched")
    assert(strictGot.isEmpty)
    assert(relaxedGot.map(_.eventIds) == Set(Seq(1L, 3L)))
  }

  test("three-step pattern matches in order within the horizon") {
    val evs = Seq(
      StreamEvent(1L, 1L, "view", ts(1000)),
      StreamEvent(1L, 2L, "cart", ts(2000)),
      StreamEvent(1L, 3L, "buy", ts(3000)),
      StreamEvent(2L, 4L, "cart", ts(1000)), // wrong order → no match
      StreamEvent(2L, 5L, "view", ts(2000)),
      StreamEvent(2L, 6L, "buy", ts(3000)))
    val pat = Pattern(Seq(_.eventType == "view", _.eventType == "cart",
      _.eventType == "buy"), 60 * 1000L, strict = false)
    val got = runCep(evs, pat, 60 * 60 * 1000L, "cep_3step")
      .filter(_.tag == "matched")
    assert(got.map(m => (m.key, m.eventIds)) == Set((1L, Seq(1L, 2L, 3L))))
  }
}

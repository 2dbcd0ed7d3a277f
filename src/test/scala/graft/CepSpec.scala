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

  private def runCepSession(events: Seq[StreamEvent],
      pattern: SessionPattern, flushMs: Long, name: String): Set[CepMatch] = {
    val input = MemoryStream[StreamEvent]
    val out = Cep.withinSession(
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

  test("session-gap pattern: slow-but-continuous funnels match, one gap kills") {
    // the shape fixed-within cannot express: u1 completes view→cart→buy
    // with every consecutive gap <= 2s but a TOTAL span (5s) beyond any
    // horizon a fixed Pattern(withinMs=2s-per-step-ish) could grant
    // without also admitting u2, whose single 3s gap must time out.
    val gap = 2000L
    val evs = Seq(
      StreamEvent(1L, 1L, "view", ts(1000)),
      StreamEvent(1L, 2L, "cart", ts(3000)),  // gap 2s: alive
      StreamEvent(1L, 3L, "buy", ts(5000)),   // gap 2s: matched, span 4s
      StreamEvent(2L, 4L, "view", ts(1000)),
      StreamEvent(2L, 5L, "cart", ts(4500)))  // gap 3.5s: dead partial
    val pat = SessionPattern(Seq(_.eventType == "view",
      _.eventType == "cart", _.eventType == "buy"), gap, strict = false)
    val got = runCepSession(evs, pat, 60 * 60 * 1000L, "cep_session")
    assert(got.filter(_.tag == "matched").map(m => (m.key, m.eventIds)) ==
      Set((1L, Seq(1L, 2L, 3L))))
    // u2's view partial timed out at 1 step (its cart arrived past the
    // gap and could not attach; CepMatch carries the steps reached)
    assert(got.exists(m => m.key == 2L && m.tag == "timeout" &&
      m.stepsDone == 1 && m.eventIds == Seq(4L)))
    // the CONTRAST that makes the session semantics non-vacuous: the
    // fixed-within matcher with withinMs = gap rejects u1 (span 4s > 2s)
    val fixedGot = runCep(evs,
      Pattern(Seq(_.eventType == "view", _.eventType == "cart",
        _.eventType == "buy"), gap, strict = false),
      60 * 60 * 1000L, "cep_session_fixed")
    assert(!fixedGot.exists(_.tag == "matched"),
      "fixed-within horizon should reject the slow-but-continuous funnel")
  }

  test("q130 batch formulation == strict Cep engine on the real event " +
      "stream (fail-success-fail is not a match)") {
    assertQ130Parity("cep_q130")
  }

  test("q130/q131 engine parity holds under the RocksDB state store") {
    // the same lane the other stateful operators carry: the
    // fMGWS-backed Cep engine must match the batch formulations with
    // keyed state living in the out-of-heap store too
    StateStoreVariants.withRocksDB(spark) {
      assertQ130Parity("cep_q130_rocks")
      assertQ131Parity("cep_q131_rocks")
    }
  }

  private def assertQ130Parity(name: String): Unit = {
    // the catalog's EventOps.strictSequence and the streaming engine
    // must agree on the FULL events table (all five types interleaved,
    // so intervening events really exercise the partial-killing leg)
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        expr("ts_ns div 1000000").as("ms"), col("event_type"))
      .collect()
      .map(r => StreamEvent(r.getLong(0), r.getLong(1), r.getString(3),
        ts(r.getLong(2))))
    val horizonMs = 24 * 3600 * 1000L
    val pat = Pattern(Seq(_.eventType == "view", _.eventType == "click",
      _.eventType == "purchase"), horizonMs, strict = true)
    val engine = runCep(evs.toSeq, pat,
      evs.map(_.tsMs).max + 10 * horizonMs, name)
      .filter(_.tag == "matched").map(_.eventIds)
    val batch = graft.api.EventOps.strictSequence(
        Tables.events(spark, sf)
          .select(col("user_id"), col("event_id"),
            expr("ts_ns div 1000000").as("ms"), col("event_type")),
        "user_id", "ms", "event_id", "event_type",
        Seq("view", "click", "purchase"), horizon = horizonMs)
      .collect()
      .map(r => Seq(r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(batch.nonEmpty, "no strict matches — parity would be vacuous")
    assert(engine == batch,
      s"engineOnly=${(engine -- batch).take(3)} " +
        s"batchOnly=${(batch -- engine).take(3)}")
  }

  test("q131 batch formulation == session-gap Cep engine on the real " +
      "event stream (greedy first-next advance)") {
    assertQ131Parity("cep_q131")
  }

  private def assertQ131Parity(name: String): Unit = {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        expr("ts_ns div 1000000").as("ms"), col("event_type"))
      .collect()
      .map(r => StreamEvent(r.getLong(0), r.getLong(1), r.getString(3),
        ts(r.getLong(2))))
    val gapMs = 24 * 3600 * 1000L
    val pat = SessionPattern(Seq(_.eventType == "view",
      _.eventType == "click", _.eventType == "purchase"), gapMs,
      strict = false)
    val engine = runCepSession(evs.toSeq, pat,
      evs.map(_.tsMs).max + 10 * gapMs, name)
      .filter(_.tag == "matched").map(_.eventIds)
    val batch = graft.api.EventOps.sessionFunnel(
        Tables.events(spark, sf)
          .select(col("user_id"), col("event_id"),
            expr("ts_ns div 1000000").as("ms"), col("event_type")),
        "user_id", "ms", "event_id", "event_type",
        Seq("view", "click", "purchase"), gap = gapMs)
      .collect()
      .map(r => Seq(r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(batch.nonEmpty, "no funnel matches — parity would be vacuous")
    assert(engine == batch,
      s"engineOnly=${(engine -- batch).take(3)} " +
        s"batchOnly=${(batch -- engine).take(3)}")
  }

  test("sessionFunnel on STRING event ids; reserved temp columns " +
      "rejected by name") {
    import spark.implicits._
    // the id-chain element type must follow the caller's idCol — a
    // hardcoded array<long> fails analysis (or miscasts) on string ids
    val df = Seq(
      (1L, "e1", 1000L, "view"),
      (1L, "e2", 2000L, "click"),
      (1L, "e3", 3000L, "purchase"),
      (2L, "e4", 1000L, "view"),
      (2L, "e5", 99999L, "click"))
      .toDF("user_id", "event_id", "ms", "event_type")
    val got = graft.api.EventOps.sessionFunnel(df, "user_id", "ms",
        "event_id", "event_type", Seq("view", "click", "purchase"),
        gap = 5000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
    assert(got.toSeq == Seq((1L, "e1", "e2", "e3")), got.mkString(","))
    // a caller column named like an internal temp is rejected, not
    // silently overwritten
    val clash = df.withColumn("_ch", lit(1))
    val e1 = intercept[IllegalArgumentException](
      graft.api.EventOps.sessionFunnel(clash, "user_id", "ms",
        "event_id", "event_type", Seq("view", "click"), gap = 5000L))
    assert(e1.getMessage.contains("_ch"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      graft.api.EventOps.strictSequence(df.withColumn("_k1", lit(1)),
        "user_id", "ms", "event_id", "event_type",
        Seq("view", "click"), horizon = 5000L))
    assert(e2.getMessage.contains("_k1"), e2.getMessage)
  }

  test("session-gap pattern: deadline advances with each accepted event") {
    // four-step chain where EVERY consecutive gap is just inside the
    // session gap — total span 3 x 1.9s; the deadline must re-arm off
    // lastTsMs at every step or step 3+ would be (wrongly) expired by
    // the watermark advancing past firstTsMs + gap
    val gap = 2000L
    val evs = Seq(
      StreamEvent(7L, 1L, "a", ts(1000)),
      StreamEvent(7L, 2L, "b", ts(2900)),
      StreamEvent(7L, 3L, "c", ts(4800)),
      StreamEvent(7L, 4L, "d", ts(6700)))
    val pat = SessionPattern(Seq(_.eventType == "a", _.eventType == "b",
      _.eventType == "c", _.eventType == "d"), gap, strict = true)
    val got = runCepSession(evs, pat, 60 * 60 * 1000L, "cep_session_adv")
    assert(got.filter(_.tag == "matched").map(_.eventIds) ==
      Set(Seq(1L, 2L, 3L, 4L)))
  }
}

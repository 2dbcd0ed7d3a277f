package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{BloomDistinct, CappedList, GroupedTopK}

/** Property-based merge laws for the custom TypedImperativeAggregates
  * (SURVEY.md §5.3): for ANY split of the input across partial buffers
  * and ANY merge order, eval must equal the single-buffer run. These are
  * the contracts Catalyst's partial aggregation and AQE re-planning
  * assume — scalacheck explores split points and value distributions the
  * example-based tests don't.
  */
class AggLawsSpec extends SparkSpec {

  /** scalacheck runner bridged by hand (no scalatestplus in the offline
    * cache): 200 cases per property, fixed seed path via default params.
    */
  private def check[T](gen: Gen[T])(f: T => Unit): Unit = {
    val prop = Prop.forAll(gen) { t => f(t); true }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val cntRef = BoundReference(0, LongType, nullable = true)
  private val keyRef = BoundReference(1, LongType, nullable = true)

  private def rows(vs: Seq[(Long, Long)]): Seq[InternalRow] =
    vs.map { case (c, k) => InternalRow(c, k) }

  private def evalSplit(
      agg: GroupedTopK, vs: Seq[(Long, Long)], splitAt: Int): Seq[(Long, Long, Long)] = {
    val (l, r) = vs.splitAt(splitAt)
    def part(xs: Seq[(Long, Long)]): ArrayBuffer[(Long, Any)] = {
      // round-trip through serialize to cover the shuffle path
      agg.deserialize(agg.serialize(
        rows(xs).foldLeft(agg.createAggregationBuffer())(agg.update)))
    }
    val merged = agg.merge(part(l), part(r))
    agg.eval(merged).asInstanceOf[ArrayData].toObjectArray(agg.dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType)
      .map { a =>
        val r = a.asInstanceOf[InternalRow]
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }.toSeq
  }

  test("GroupedTopK: any split point gives the single-pass result") {
    val agg = GroupedTopK(3, cntRef, keyRef)
    val gen = for {
      vs <- Gen.listOf(Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(0L, 50L)))
      split <- Gen.chooseNum(0, vs.length)
    } yield (vs, split)
    check(gen) { case (vs, split) =>
      assert(evalSplit(agg, vs, split) == evalSplit(agg, vs, 0))
    }
  }

  test("BloomDistinct: bitmap OR-merge is split-invariant") {
    val vref = BoundReference(0, LongType, nullable = true)
    val agg = BloomDistinct(vref, 4096)
    val gen = for {
      vs <- Gen.listOf(Gen.chooseNum(0L, 10000L))
      split <- Gen.chooseNum(0, vs.length)
    } yield (vs, split)
    check(gen) { case (vs, split) =>
      val (l, r) = vs.splitAt(split)
      def part(xs: Seq[Long]) = agg.deserialize(agg.serialize(
        xs.map(InternalRow(_)).foldLeft(agg.createAggregationBuffer())(agg.update)))
      val together = vs.map(InternalRow(_))
        .foldLeft(agg.createAggregationBuffer())(agg.update)
      assert(agg.eval(agg.merge(part(l), part(r))) == agg.eval(together))
    }
  }

  test("CappedList: overflow verdict is split-invariant") {
    val vref = BoundReference(0, LongType, nullable = true)
    val agg = CappedList(vref, 5)
    val gen = for {
      vs <- Gen.listOf(Gen.chooseNum(0L, 100L))
      split <- Gen.chooseNum(0, vs.length)
    } yield (vs, split)
    check(gen) { case (vs, split) =>
      val (l, r) = vs.splitAt(split)
      def part(xs: Seq[Long]) = agg.deserialize(agg.serialize(
        xs.map(InternalRow(_)).foldLeft(agg.createAggregationBuffer())(agg.update)))
      val merged = agg.eval(agg.merge(part(l), part(r)))
      val single = agg.eval(vs.map(InternalRow(_))
        .foldLeft(agg.createAggregationBuffer())(agg.update))
      // NULL-ness (overflow) must agree; content is a set when non-null
      assert((merged == null) == (single == null))
      if (merged != null)
        assert(merged.asInstanceOf[GenericArrayData].toLongArray().toSet ==
          single.asInstanceOf[GenericArrayData].toLongArray().toSet)
    }
  }

  test("GroupedTopK: result never exceeds k and is correctly ordered") {
    val agg = GroupedTopK(4, cntRef, keyRef)
    check(Gen.listOf(Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 9L)))) { vs =>
      val out = evalSplit(agg, vs, vs.length / 2)
      assert(out.length <= 4)
      assert(out.map(_._3) == (1L to out.length)) // rn contiguous
      out.sliding(2).foreach {
        // evalSplit tuples are (key, cnt, rn) — the eval struct field order
        case Seq((k1, c1, _), (k2, c2, _)) =>
          // duplicates of the same (cnt,key) pair rank as separate rows
          assert(c1 > c2 || (c1 == c2 && k1 <= k2))
        case _ => ()
      }
    }
  }

  test("CmsSketch: split-invariant grid, estimates one-sided and bounded") {
    val agg = graft.functions.CmsSketch(64, 4, keyRef)
    check(Gen.listOf(Gen.zip(Gen.const(0L), Gen.chooseNum(0L, 30L)))) { vs =>
      val rs = rows(vs)
      val single = rs.foldLeft(agg.createAggregationBuffer())(agg.update)
      (0 to rs.length by math.max(1, rs.length / 3)).foreach { cut =>
        val (l, r) = rs.splitAt(cut)
        val a = l.foldLeft(agg.createAggregationBuffer())(agg.update)
        val b = r.foldLeft(agg.createAggregationBuffer())(agg.update)
        val merged = agg.merge(
          agg.deserialize(agg.serialize(a)),
          agg.deserialize(agg.serialize(b)))
        assert(merged.toSeq == single.toSeq) // grid identical under any split
      }
      // one-sided error: est >= true count, and est <= N (trivial cap)
      val grid = new GenericArrayData(single.map(x => x: Any))
      vs.groupBy(_._2).foreach { case (k, group) =>
        val est = graft.functions.CmsUtil.estimate(grid, k: java.lang.Long, 64, 4)
        assert(est >= group.length && est <= vs.length)
      }
    }
  }

  test("CmsUtil.estimate rejects a grid whose length mismatches (width, depth)") {
    val grid = new GenericArrayData(new Array[Long](64 * 4).map(x => x: Any))
    intercept[IllegalArgumentException] {
      graft.functions.CmsUtil.estimate(grid, 1L: java.lang.Long, 128, 4)
    }
    // a mismatched-but-in-bounds probe must fail too, not silently read
    // wrong offsets (it would break the one-sided est >= true guarantee)
    intercept[IllegalArgumentException] {
      graft.functions.CmsUtil.estimate(grid, 1L: java.lang.Long, 32, 4)
    }
  }

  test("LatestBy: split + serialize round-trip equals single-pass argmax") {
    // payload = key column (slot 1), ord = cnt column (slot 0): the
    // aggregate must return the key of the max (cnt, then... ord here is
    // the scalar cnt, ties keep the FIRST seen — so generate unique ords)
    val agg = graft.functions.LatestBy(keyRef, cntRef)
    check(Gen.listOf(Gen.zip(Gen.chooseNum(0L, 999L), Gen.chooseNum(0L, 9L)))
      .map(_.distinctBy(_._1))) { vs =>
      val rs = rows(vs)
      val single = rs.foldLeft(agg.createAggregationBuffer())(agg.update)
      (0 to rs.length).foreach { cut =>
        val (l, r) = rs.splitAt(cut)
        val a = l.foldLeft(agg.createAggregationBuffer())(agg.update)
        val b = r.foldLeft(agg.createAggregationBuffer())(agg.update)
        // shuffle edge: both partials must survive serialization
        val merged = agg.merge(
          agg.deserialize(agg.serialize(a)),
          agg.deserialize(agg.serialize(b)))
        assert(agg.eval(merged) == agg.eval(single))
      }
      if (vs.nonEmpty) {
        val want = vs.maxBy(_._1)._2
        assert(agg.eval(single) == want)
      } else assert(agg.eval(single) == null)
    }
  }
}

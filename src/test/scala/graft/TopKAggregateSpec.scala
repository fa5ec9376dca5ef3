package graft

import org.apache.spark.sql.graftnative.{TopKBuffer, TopKByScore}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** TopKBuffer / TopKByScore kernel semantics (the DataFrame-level
  * parity test lives in SearchSpec). */
class TopKAggregateSpec extends AnyFunSuite {

  test("buffer keeps k best with (score desc, id asc) tie order") {
    val b = new TopKBuffer(3)
    Seq((0.5, 10L), (0.9, 11L), (0.7, 12L), (0.9, 5L), (0.1, 1L))
      .foreach { case (s, i) => b.add(s, i) }
    val got = (0 until b.n).map(i => (b.scores(i), b.ids(i)))
    assert(got == Seq((0.9, 5L), (0.9, 11L), (0.7, 12L)))
  }

  test("buffer handles fewer than k inputs and duplicate scores") {
    val b = new TopKBuffer(5)
    b.add(1.0, 2L); b.add(1.0, 1L)
    assert(b.n == 2)
    assert((b.scores(0), b.ids(0)) == ((1.0, 1L)))
  }

  test("merge equals bulk add") {
    val a = new TopKBuffer(4); val b = new TopKBuffer(4); val ref = new TopKBuffer(4)
    val xs = Seq((0.3, 1L), (0.8, 2L), (0.5, 3L))
    val ys = Seq((0.9, 4L), (0.1, 5L), (0.8, 0L))
    xs.foreach { case (s, i) => a.add(s, i); ref.add(s, i) }
    ys.foreach { case (s, i) => b.add(s, i); ref.add(s, i) }
    a.mergeFrom(b)
    assert((0 until a.n).map(i => (a.scores(i), a.ids(i))) ==
      (0 until ref.n).map(i => (ref.scores(i), ref.ids(i))))
  }

  test("serialize/deserialize round-trips the buffer") {
    val agg = TopKByScore(
      BoundReference(0, LongType, nullable = false),
      BoundReference(1, DoubleType, nullable = false), 3)
    val b = new TopKBuffer(3)
    b.add(0.9, 7L); b.add(0.2, 9L)
    val back = agg.deserialize(agg.serialize(b))
    assert(back.k == 3 && back.n == 2)
    assert((0 until back.n).map(i => (back.scores(i), back.ids(i))) ==
      Seq((0.9, 7L), (0.2, 9L)))
  }
}

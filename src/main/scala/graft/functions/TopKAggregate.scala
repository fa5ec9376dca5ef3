// In the org.apache.spark.sql namespace for the same reason as
// NativeExpressions: the aggregate/codegen internals are private[sql].
package org.apache.spark.sql.graftnative

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score desc, id asc) pairs.
  * A binary min-heap ordered by "worst first" would be asymptotically
  * ideal; for the k ≤ a-few-hundred regime this sorted-insert array
  * is simpler and the constant factors win. */
final class TopKBuffer(val k: Int) {
  var n: Int = 0
  val scores = new Array[Double](k + 1)
  val ids = new Array[Long](k + 1)

  /** true if (s1, i1) ranks strictly better than (s2, i2). */
  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def add(score: Double, id: Long): Unit = {
    if (k <= 0) return // defensive: TopKByScore requires k >= 1
    if (n == k && !better(score, id, scores(n - 1), ids(n - 1))) return
    // find insert position (sorted best-first), shift the tail
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (better(score, id, scores(mid), ids(mid))) hi = mid else lo = mid + 1
    }
    val insertAt = lo
    val newN = math.min(n + 1, k)
    var j = newN - 1
    while (j > insertAt) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
    scores(insertAt) = score
    ids(insertAt) = id
    n = newN
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { add(other.scores(i), other.ids(i)); i += 1 }
  }
}

/** SURVEY §4 item 2: `TopKByScore` — a TypedImperativeAggregate that
  * replaces `window row_number <= k` for per-group top-k. Each
  * partition keeps one bounded k-buffer per group (map-side partial
  * aggregation), so the exchange carries O(groups × k) heap entries
  * instead of every scored row; the window formulation shuffles and
  * sorts the full scored corpus per group. Tie order (score desc, id
  * asc) matches the engine-wide determinism rule, so results are
  * bit-identical to the sort-based plan and the DuckDB oracle.
  *
  * Output: array<struct<id, rank, score>>, best first.
  */
case class TopKByScore(
    id: Expression,
    score: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  // fail at construction (= SQL analysis via GraftExtensions), not as
  // an ArrayIndexOutOfBounds inside a running task
  require(k >= 1, s"graft_topk requires k >= 1, got $k")

  override def children: Seq[Expression] = Seq(id, score)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("rank", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val i = id.eval(input)
    val s = score.eval(input)
    if (i != null && s != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      out(i) = InternalRow(buf.ids(i), (i + 1).toLong, buf.scores(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) { out.writeDouble(buf.scores(i)); out.writeLong(buf.ids(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val s = in.readDouble(); val id = in.readLong()
      buf.scores(i) = s; buf.ids(i) = id
      i += 1
    }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(id = newChildren(0), score = newChildren(1))
}

object TopKAggregate {
  /** Column wrapper: aggregate (id, score) pairs into the top-k
    * array<struct<id, rank, score>> for the group. */
  def topK(id: Column, score: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKByScore(ExpressionUtils.expression(id),
        ExpressionUtils.expression(score), k).toAggregateExpression())
}

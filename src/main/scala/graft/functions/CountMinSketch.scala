// In the org.apache.spark.sql namespace for the same reason as
// NativeExpressions/TopKAggregate: aggregate internals are private[sql].
package org.apache.spark.sql.graftnative

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Count–min sketch parameters shared by the aggregate, the
  * estimation Column, and the SQL oracle replay: row j hashes a
  * pre-hashed 32-bit value h to bucket ((A(j)·h + B(j)) mod P) mod
  * width. h < 2^32 and A(j) < 2^21 keep every intermediate below
  * 2^53, so the arithmetic is exact in any engine with 64-bit
  * integers (no overflow divergence — the same portability rule as
  * Ingest.pseudoShuffleKey). */
object CMS {
  val P: Long = 2147483647L // 2^31 − 1
  val A: Array[Long] = Array(1299709L, 485863L, 7919L, 104729L, 611953L, 999983L)
  val B: Array[Long] = Array(104729L, 7919L, 485863L, 1299709L, 999983L, 611953L)
  val maxDepth: Int = A.length

  @inline def bucket(h: Long, j: Int, width: Int): Int =
    (((A(j) * h + B(j)) % P) % width).toInt
}

/** Dense count–min buffer: depth rows × width counters, row-major. */
final class CMSBuffer(val width: Int, val depth: Int) {
  val counts = new Array[Long](width * depth)

  def add(h: Long, w: Long): Unit = {
    var j = 0
    while (j < depth) {
      counts(j * width + CMS.bucket(h, j, width)) += w
      j += 1
    }
  }

  def mergeFrom(other: CMSBuffer): Unit = {
    var i = 0
    while (i < counts.length) { counts(i) += other.counts(i); i += 1 }
  }
}

/** Count–min sketch aggregate: the fixed-memory heavy-hitter /
  * frequency-estimation primitive of one-pass pipelines. Each task
  * folds its rows into a width×depth counter grid; partials merge by
  * elementwise addition, so the exchange carries O(width · depth)
  * longs per partition regardless of corpus or vocabulary size — the
  * property that matters at 100 TB, where a vocabulary-sized exact
  * groupBy shuffle is the bottleneck this sketch removes.
  *
  * Input is a PRE-HASHED key (32-bit non-negative long, e.g. the
  * first 8 hex chars of md5) plus a weight; estimates come from
  * [[CountMinSketch.estimate]] over the emitted grid. Estimates
  * overestimate (never under-), deterministically — the same hashes
  * replay in SQL, so a sketch query is oracle-checkable bit-for-bit.
  */
case class CountMinSketchAgg(
    hash: Expression,
    weight: Expression,
    width: Int,
    depth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CMSBuffer] with ExpectsInputTypes {

  require(width >= 2, s"graft_cms requires width >= 2, got $width")
  require(depth >= 1 && depth <= CMS.maxDepth,
    s"graft_cms requires 1 <= depth <= ${CMS.maxDepth}, got $depth")

  // analysis-time typing (an int hash column becomes an error, not an
  // executor ClassCastException), same contract style as DotProduct
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def children: Seq[Expression] = Seq(hash, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cms"

  override def createAggregationBuffer(): CMSBuffer = new CMSBuffer(width, depth)

  override def update(buf: CMSBuffer, input: InternalRow): CMSBuffer = {
    val h = hash.eval(input)
    val w = weight.eval(input)
    if (h != null && w != null) {
      val hv = h.asInstanceOf[Long]
      // the 32-bit contract keeps A(j)·h below 2^53 (exact in both
      // engines); a 64-bit hash (e.g. xxhash64) would silently wrap
      // and corrupt buckets — fail loudly instead
      if (hv < 0L || hv > 0xFFFFFFFFL)
        throw new IllegalArgumentException(
          s"graft_cms hash must be an unsigned 32-bit value (use hash32), got $hv")
      buf.add(hv, w.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: CMSBuffer, other: CMSBuffer): CMSBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: CMSBuffer): Any =
    UnsafeArrayData.fromPrimitiveArray(buf.counts)

  override def serialize(buf: CMSBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.width)
    out.writeInt(buf.depth)
    var i = 0
    while (i < buf.counts.length) { out.writeLong(buf.counts(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CMSBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new CMSBuffer(in.readInt(), in.readInt())
    var i = 0
    while (i < buf.counts.length) { buf.counts(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinSketchAgg =
    copy(hash = newChildren(0), weight = newChildren(1))
}

object CountMinSketch {
  import org.apache.spark.sql.functions._

  /** Portable 32-bit string hash: first 8 hex chars of md5 as a long —
    * identical in DuckDB as ('0x' || substr(md5(s), 1, 8))::BIGINT
    * (the engine-wide cross-engine hash, cf. TextAnalysis fingerprints). */
  def hash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Aggregate (hash32, weight) rows into the width×depth counter
    * grid (array<long>, row-major). */
  def sketch(hash: Column, weight: Column, width: Int, depth: Int): Column =
    ExpressionUtils.column(
      CountMinSketchAgg(ExpressionUtils.expression(hash),
        ExpressionUtils.expression(weight), width, depth).toAggregateExpression())

  /** Point estimate for a pre-hashed key from a sketch grid column:
    * min over rows of the key's counter (1-based element_at). The
    * 32-bit hash contract is enforced — a negative index would make
    * element_at read from the array END and silently break the
    * never-underestimate guarantee. */
  def estimate(grid: Column, hash: Column, width: Int, depth: Int): Column = {
    val est = (0 until depth).map { j =>
      element_at(grid,
        (((lit(CMS.A(j)) * hash + CMS.B(j)) % CMS.P) % width + j * width + 1)
          .cast("int"))
    }.reduce(least(_, _))
    when(hash.isNull, lit(null).cast("long"))
      .when(hash.between(0L, 0xFFFFFFFFL), est)
      .otherwise(raise_error(concat(
        lit("graft_cms estimate: hash out of unsigned 32-bit range: "),
        hash.cast("string"))))
  }
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native aggregate: a `numHashes`-component MinHash signature from a
  * column of 64-bit shingle hashes, as ARRAY<BIGINT>.
  *
  * The expression formulation (`numHashes` separate
  * `min(xxhash64(lit(i), h0))` aggregate columns) evaluates one Catalyst
  * aggregate update path PER COMPONENT per input row; this operator does
  * one update call per row and derives all components in a tight JVM
  * loop — measured ~3× faster signature build at sf0.1. Partial buffers
  * combine map-side (merge is elementwise min: associative, commutative,
  * absorbing — the ideal partial aggregate).
  *
  * Component i's hash is splitmix64(h0 + i·GOLDEN) — the standard
  * public-domain 64-bit finalizer family (Steele et al., "Fast
  * Splittable Pseudorandom Number Generators", OOPSLA'14). Seeded
  * re-mixes of a 64-bit universal shingle hash are pairwise-independent
  * enough for MinHash banding; dedup03 verifies every candidate exactly,
  * and its spec pins output equality with the exact pair set.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_agg expects BIGINT shingle hashes, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h0 = v.asInstanceOf[Long]
      var i = 0
      var x = h0
      while (i < numHashes) {
        // splitmix64: x_i = finalize(h0 + i * GOLDEN_GAMMA)
        x += 0x9E3779B97F4A7C15L
        var z = x
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^= z >>> 31
        if (z < buf(i)) buf(i) = z
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numHashes * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

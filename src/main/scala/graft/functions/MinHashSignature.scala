package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the full MinHash signature of a
  * document's shingle-hash ARRAY in one scalar pass — no aggregation,
  * no shuffle.
  *
  * The batch twin of [[MinHashAgg]] (which consumes a ROW STREAM of
  * shingle hashes — the shape an incremental/streaming pipeline
  * produces): when the per-document shingle set is already materialized
  * as `array<long>` (see [[ShingleHashes]]), the signature is pure
  * per-row work in the scan stage, so signature build costs zero
  * exchanges. Component i uses the identical splitmix64 re-mix as
  * MinHashAgg, so the two forms produce byte-identical signatures
  * (spec-pinned).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects ARRAY<BIGINT>, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.signature(input.asInstanceOf[ArrayData], numHashes)

  // NOTE: helper deliberately not named `eval` — see ShingleHashes.doGenCode:
  // a name clash with Expression.eval suppresses the static forwarder and
  // breaks Janino compilation of the generated call.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSignature.signature($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  /** Signature of one shingle-hash array. Empty input yields the
    * all-MaxValue signature (same as MinHashAgg's empty buffer). Called
    * from generated code via the static forwarder.
    */
  def signature(hashes: ArrayData, numHashes: Int): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      val h0 = hashes.getLong(j)
      var x = h0
      var i = 0
      while (i < numHashes) {
        // splitmix64: identical constants and order to MinHashAgg.update.
        x += 0x9E3779B97F4A7C15L
        var z = x
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^= z >>> 31
        if (z < sig(i)) sig(i) = z
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }
}

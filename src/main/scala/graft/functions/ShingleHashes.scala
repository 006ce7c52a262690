package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the DISTINCT 64-bit hashes of a
  * document's word n-gram shingles, in one pass — `array<long>`.
  *
  * Replaces the declarative chain
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ", ...)))`
  * + `explode` + `xxhash64(s)`: higher-order-function lambdas are
  * interpreted per element and the chain materializes every shingle
  * STRING just to hash it. Here tokenization happens directly on the
  * UTF-8 bytes (the ASCII space 0x20 can never occur inside a multibyte
  * sequence, so byte-splitting equals `split(text, " ")` — empty tokens
  * included), each token is FNV-1a-hashed once, and shingle hashes
  * combine the n token hashes positionally (polynomial accumulate +
  * splitmix64 finalizer). Tokens cannot contain the separator, so
  * token-tuple identity equals joined-string identity — the hash SET
  * stands in for the shingle set exactly, modulo 64-bit collisions.
  *
  * The hash family is internal: every consumer (dedup02/03 Jaccard
  * counts, cur03 contamination, MinHash signatures) only ever compares
  * or counts these hashes, so no cross-engine contract constrains the
  * values.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, s"shingle size must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.hash(input.asInstanceOf[UTF8String], n)

  // NOTE: the helper must NOT be named `eval` — a companion-object method
  // whose name collides with an inherited member of the case class (here
  // Expression.eval) gets no static forwarder from scalac, so the call
  // below would fail Janino compilation and silently fall back to
  // interpreted eval for the whole stage (pinned by NativeCodegenSpec).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashes.hash($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  private val Empty = UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  /** Distinct hashed word n-gram shingles of `text`, ascending. Called
    * from generated code (via the static forwarder — keep the name
    * distinct from every member inherited by the case class).
    */
  def hash(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // Token hashes: FNV-1a over each run between 0x20 delimiters,
    // empty runs included (split(text, " ") keeps empty tokens).
    var tokCap = 16
    var toks = new Array[Long](tokCap)
    var nTok = 0
    var h = FnvOffset
    var i = 0
    while (i < len) {
      val b = bytes(i)
      if (b == 0x20) {
        if (nTok == tokCap) { tokCap *= 2; toks = java.util.Arrays.copyOf(toks, tokCap) }
        toks(nTok) = h; nTok += 1
        h = FnvOffset
      } else {
        h = (h ^ (b & 0xff)) * FnvPrime
      }
      i += 1
    }
    if (nTok == tokCap) { tokCap *= 2; toks = java.util.Arrays.copyOf(toks, tokCap) }
    toks(nTok) = h; nTok += 1

    val ng = nTok - n + 1
    if (ng <= 0) return Empty
    val hs = new Array[Long](ng)
    var j = 0
    while (j < ng) {
      var z = toks(j)
      var k = 1
      while (k < n) { z = z * FnvPrime + toks(j + k); k += 1 }
      // splitmix64 finalizer: full-avalanche mix of the combined value.
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= z >>> 31
      hs(j) = z
      j += 1
    }
    java.util.Arrays.sort(hs)
    var distinct = 1
    var p = 1
    while (p < ng) { if (hs(p) != hs(p - 1)) distinct += 1; p += 1 }
    if (distinct == ng) return UnsafeArrayData.fromPrimitiveArray(hs)
    val out = new Array[Long](distinct)
    out(0) = hs(0)
    var o = 1
    p = 1
    while (p < ng) {
      if (hs(p) != hs(p - 1)) { out(o) = hs(p); o += 1 }
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

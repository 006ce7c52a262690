package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the complete winnowing (MOSS) fingerprint
  * set of a document in ONE pass — `array<long>` of the distinct
  * sliding-window minima over md5-derived k-gram hashes.
  *
  * The declarative formulation (explode every gram position → window min
  * over (doc_id, i) → distinct) is semantically identical but
  * materializes one row PER CHARACTER of the corpus and pays a full
  * shuffle+sort for the window plus another shuffle for the distinct.
  * Winnowing is a per-document computation, so this expression keeps it
  * inside the scan stage: no explode blow-up, no shuffle, per-doc dedup
  * for free — at corpus scale the only remaining exchange in text09 is
  * the final presentation sort.
  *
  * Hash contract (engine-portable, matches the DuckDB oracle exactly):
  * `conv(substring(md5(substr(text, i, k)), 1, 8), 16, 10)` — i.e. the
  * first 4 md5 bytes of the k-CHAR gram's UTF-8 encoding, read as an
  * unsigned 32-bit big-endian integer. Texts with fewer than k+w-1
  * chars have no full window and yield an empty array (explode drops
  * them, same as the row formulation's full-window filter).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k > 0, s"gram size k must be positive, got $k")
  require(w > 0, s"window size w must be positive, got $w")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprints.winnow(input.asInstanceOf[UTF8String], k, w)

  // One static call per DOCUMENT (not per gram): the surrounding stage
  // stays whole-stage-codegen'd and the heavy loop runs in the helper.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowFingerprints.winnow($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val Empty = UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

  /** Distinct winnowed fingerprints of `text`, ascending. Called from
    * generated code — must stay null-free and allocation-lean.
    *
    * Grams are counted and sliced in CODE POINTS, matching both
    * `substr` semantics the contract is defined in (Spark's UTF8String
    * and DuckDB both count code points) — a UTF-16-unit slice would
    * split surrogate pairs on supplementary-plane text (emoji) and
    * md5 replacement bytes would diverge from the oracle.
    */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val md = mdLocal.get()
    val digest = new Array[Byte](16)
    // ASCII fast path: UTF-8 byte length == UTF-16 length forces pure
    // ASCII (multibyte chars inflate bytes, surrogate pairs inflate
    // chars), so code point i IS byte i.
    val bytes = text.getBytes
    val ascii = bytes.length == s.length
    val cps: Array[Int] = if (ascii) null else s.codePoints().toArray
    val n = if (ascii) bytes.length else cps.length
    val ng = n - k + 1
    if (ng < w) return Empty
    val hs = new Array[Long](ng)
    var i = 0
    while (i < ng) {
      md.reset()
      if (ascii) md.update(bytes, i, k)
      else md.update(new String(cps, i, k)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.digest(digest, 0, 16)
      hs(i) = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
        ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
      i += 1
    }
    val m = ng - w + 1
    val mins = new Array[Long](m)
    var j = 0
    while (j < m) {
      var mn = hs(j)
      var t = 1
      while (t < w) { if (hs(j + t) < mn) mn = hs(j + t); t += 1 }
      mins(j) = mn
      j += 1
    }
    java.util.Arrays.sort(mins)
    var distinct = 1
    var p = 1
    while (p < m) { if (mins(p) != mins(p - 1)) distinct += 1; p += 1 }
    val out = new Array[Long](distinct)
    out(0) = mins(0)
    var o = 1
    p = 1
    while (p < m) {
      if (mins(p) != mins(p - 1)) { out(o) = mins(p); o += 1 }
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

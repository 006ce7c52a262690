package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: product-quantization RECONSTRUCTION of a
  * vector against a driver-known codebook. The vector's dimensions are
  * split into `m` contiguous subspaces; within each subspace the nearest
  * codeword (squared-L2, ties to the lowest codeword id) is selected and
  * its subvector copied into the output. Because subspaces are disjoint,
  * L2 against the reconstruction equals the classic PQ asymmetric
  * distance (sum of per-subspace codeword distances) — so downstream
  * scoring reuses the codegen'd [[L2Distance]] instead of a per-row
  * distance-table lookup.
  *
  * The codebook rides along as a referenced object (not a child
  * expression): it is plan-time constant, tiny (K×D doubles), and per-row
  * work must stay a pure scan-stage computation — the same no-join,
  * no-shuffle contract as sim03's literal-centroid cell argmax.
  *
  * Codegen calls the static forwarder of [[PQReconstruct.reconstruct]] —
  * deliberately NOT named `eval`: a companion helper named `eval`
  * collides with the inherited `Expression.eval` member, scalac then
  * emits no static forwarder and Janino fails, silently degrading the
  * stage to interpreted (the round-3 ShingleHashes regression, pinned by
  * NativeCodegenSpec).
  */
case class PQReconstruct(
    child: Expression,
    codebook: Array[Array[Double]],
    m: Int)
    extends UnaryExpression {

  require(m > 0, s"subspace count must be positive, got $m")
  require(codebook.nonEmpty, "codebook must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_reconstruct expects array<double>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_reconstruct"

  override def nullSafeEval(input: Any): Any =
    PQReconstruct.reconstruct(input.asInstanceOf[ArrayData], codebook, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PQReconstruct.reconstruct($v, $cb, $m);")
  }

  // Array fields compare by reference under the case-class equals, which
  // would defeat canonicalization/subexpression reuse for semantically
  // identical instances — compare the codebook by value instead.
  override def equals(other: Any): Boolean = other match {
    case PQReconstruct(c, cb, mm) =>
      c == child && mm == m &&
        java.util.Arrays.deepEquals(
          cb.asInstanceOf[Array[AnyRef]], codebook.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(m),
      Integer.valueOf(java.util.Arrays.deepHashCode(
        codebook.asInstanceOf[Array[AnyRef]])))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PQReconstruct {

  /** Shared by interpreted eval and generated code (static forwarder).
    * Dimensions beyond `(D/m)*m` (a ragged tail when m does not divide
    * D) and beyond the codeword length are copied from the input
    * verbatim — the quantizer only ever claims the dimensions it
    * covers.
    */
  def reconstruct(v: ArrayData, codebook: Array[Array[Double]], m: Int): ArrayData = {
    val d = v.numElements()
    val out = new Array[Double](d)
    var i = 0
    while (i < d) { out(i) = v.getDouble(i); i += 1 }
    val w = d / m
    var sub = 0
    while (sub < m) {
      val start = sub * w
      var best = -1
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < codebook.length) {
        val cw = codebook(j)
        if (cw.length >= start + w) {
          var acc = 0.0
          var i2 = 0
          while (i2 < w) {
            val diff = v.getDouble(start + i2) - cw(start + i2)
            acc += diff * diff
            i2 += 1
          }
          if (acc < bestD) { bestD = acc; best = j }
        }
        j += 1
      }
      if (best >= 0) {
        val cw = codebook(best)
        var i3 = 0
        while (i3 < w) { out(start + i3) = cw(start + i3); i3 += 1 }
      }
      sub += 1
    }
    new GenericArrayData(out)
  }
}

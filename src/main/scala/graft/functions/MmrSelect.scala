package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: MAXIMAL MARGINAL RELEVANCE selection —
  * greedy diversified re-ranking of a per-query candidate list
  * (Carbonell & Goldstein 1998, the standard retrieval-diversification
  * step between ANN search and a context window):
  *
  *   pick argmax over unselected c of
  *     λ·rel(c) − (1−λ)·max over selected s of sim(c, s)
  *
  * k times, ties to the smaller vec_id (empty selected set ⇒ the
  * penalty term is 0, so step 1 is the plain relevance argmax).
  *
  * GREEDY selection is inherently sequential in k — the wrong shape
  * for a join/window formulation (k chained shuffles) but exactly
  * right for a per-row expression: re-ranking sees only the k-ish
  * candidates ALREADY retrieved per query, so the whole computation
  * is a scan-stage pass over |queries| rows, zero shuffles past the
  * candidate aggregation.
  *
  * Engine-exact protocol (the DuckDB oracle replays it verbatim as k
  * unrolled argmax steps): rel is the 4-dp-rounded query cosine the
  * candidate arrived with; candidate-candidate sims are computed with
  * [[CosineSimilarity]]'s exact accumulation order and rounded to 4 dp
  * BEFORE the max; λ-arithmetic runs on those identical doubles.
  * Candidate arrival order (Spark's collect_list is nondeterministic)
  * cannot matter: every step scans all unselected candidates with the
  * (score, vec_id) tie-break.
  *
  * Input: array<struct<cos: double, vec_id: bigint, v: array<double>>>.
  * Output: array<struct<rk: int, vec_id: bigint, score: double>> —
  * selection order, score rounded to 6 dp. SIX, not four: λ·rel −
  * (1−λ)·ms over 4-dp operands is decimal-exact at FIVE decimals, so
  * every score sits precisely ON a half-way point of the 4-dp grid —
  * where JVM shortest-repr rounding and DuckDB's binary rounding
  * systematically disagree. At 6 dp those values are grid POINTS
  * (≈1e-17 from the double), so both engines round identically.
  *
  * Codegen calls the static forwarder [[MmrSelect.select]] —
  * deliberately NOT named `eval` (the ShingleHashes forwarder lesson,
  * pinned by NativeCodegenSpec).
  */
case class MmrSelect(child: Expression, k: Int, lambda: Double)
    extends UnaryExpression {

  require(k > 0, s"selection size k must be positive, got $k")
  require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.length == 3 &&
        s(0).dataType == DoubleType && s(1).dataType == LongType &&
        (s(2).dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        }) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "mmr_select expects array<struct<cos double, vec_id bigint, " +
        s"v array<double>>>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rk", IntegerType, nullable = false),
    StructField("vec_id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "mmr_select"

  override protected def nullSafeEval(input: Any): Any =
    MmrSelect.select(input.asInstanceOf[ArrayData], k, lambda)

  // One static call per QUERY row; the greedy loop runs in the helper,
  // the surrounding stage stays whole-stage-codegen'd.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MmrSelect.select($c, $k, $lambda)")

  override protected def withNewChildInternal(newChild: Expression): MmrSelect =
    copy(child = newChild)
}

object MmrSelect {

  /** [[CosineSimilarity.nullSafeEval]]'s exact accumulation order and
    * zero-norm guard, rounded to 4 dp (HALF_UP — Spark's `round`):
    * the candidate-candidate sim the penalty term maxes over.
    */
  private def cos4(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a(i); val y = b(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val c = if (na == 0.0 || nb == 0.0) 0.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    round4(c)
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Greedy MMR over the candidate array. Called from generated code. */
  def select(arr: ArrayData, k: Int, lambda: Double): ArrayData = {
    val n = arr.numElements()
    val rel = new Array[Double](n)
    val ids = new Array[Long](n)
    val vs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      rel(i) = row.getDouble(0)
      ids(i) = row.getLong(1)
      val va = row.getArray(2)
      val d = va.numElements()
      val v = new Array[Double](d)
      var j = 0
      while (j < d) { v(j) = va.getDouble(j); j += 1 }
      vs(i) = v
      i += 1
    }
    val m = math.min(k, n)
    val used = new Array[Boolean](n)
    // Max 4-dp sim of each candidate to the selected set so far. NOT
    // floored at zero: the classic formula lets an anti-similar
    // candidate's negative max turn the penalty into a bonus. While
    // the set is empty the penalty term is 0 (step-0 branch below).
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val out = new Array[Any](m)
    var step = 0
    while (step < m) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < n) {
        if (!used(c)) {
          val penalty = if (step == 0) 0.0 else maxSim(c)
          val score = lambda * rel(c) - (1.0 - lambda) * penalty
          if (score > bestScore ||
              (score == bestScore && (best < 0 || ids(c) < ids(best)))) {
            best = c; bestScore = score
          }
        }
        c += 1
      }
      used(best) = true
      out(step) = new GenericInternalRow(
        Array[Any](step + 1, ids(best),
          BigDecimal(bestScore)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      var u = 0
      while (u < n) {
        if (!used(u)) {
          val s = cos4(vs(u), vs(best))
          if (s > maxSim(u)) maxSim(u) = s
        }
        u += 1
      }
      step += 1
    }
    new GenericArrayData(out)
  }
}

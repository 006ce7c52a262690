package graft.functions

import java.lang.reflect.Modifier

import graft.SparkSpec
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pins that every native expression's generated code actually COMPILES.
  *
  * Round-3 regression class: a companion-object helper named `eval`
  * collides with the inherited `Expression.eval` member, so scalac emits
  * NO static forwarder on the case class' classfile; the `doGenCode`
  * call `graft.functions.X.eval(...)` then fails Janino compilation and
  * Spark silently falls back to interpreted evaluation for the whole
  * stage — correctness holds, performance claim is false, and nothing in
  * the suite notices. These tests make that failure mode loud:
  *
  *  1. `GenerateUnsafeProjection.generate` compiles each expression's
  *     generated code directly and THROWS on a Janino error (no
  *     interpreted fallback at this API level), then the test checks the
  *     compiled projection agrees with interpreted eval.
  *  2. Reflection asserts the static forwarder each `doGenCode` string
  *     references really exists on the case class' classfile.
  */
class NativeCodegenSpec extends SparkSpec {

  private def longArray(xs: Long*): ArrayData = ArrayData.toArrayData(xs.toArray)
  private def doubleArray(xs: Double*): ArrayData = ArrayData.toArrayData(xs.toArray)

  /** Compile expr's generated code (throws on Janino failure) and return
    * the projected value alongside the interpreted one.
    */
  private def codegenVsInterpreted(expr: Expression, input: InternalRow): (Any, Any) = {
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    val compiled = proj(input).get(0, expr.dataType)
    val interpreted = expr.eval(input)
    (compiled, interpreted)
  }

  private def assertArraysAgree(expr: Expression, input: InternalRow): Unit = {
    val (c, i) = codegenVsInterpreted(expr, input)
    val cs = c.asInstanceOf[ArrayData].toLongArray.toSeq
    val is = i.asInstanceOf[ArrayData].toLongArray.toSeq
    assert(cs == is, s"${expr.prettyName}: codegen vs interpreted mismatch")
  }

  test("ShingleHashes generated code compiles and matches interpreted eval") {
    val expr = ShingleHashes(BoundReference(0, StringType, nullable = true), 3)
    assertArraysAgree(expr,
      InternalRow(UTF8String.fromString("the quick brown fox jumps over the dog")))
    assertArraysAgree(expr, InternalRow(UTF8String.fromString("")))
  }

  test("MinHashSignature generated code compiles and matches interpreted eval") {
    val expr = MinHashSignature(
      BoundReference(0, ArrayType(LongType, containsNull = false), nullable = true), 16)
    assertArraysAgree(expr, InternalRow(longArray(3L, 17L, -42L, 9001L)))
    assertArraysAgree(expr, InternalRow(longArray()))
  }

  test("WinnowFingerprints generated code compiles and matches interpreted eval") {
    val expr = WinnowFingerprints(BoundReference(0, StringType, nullable = true), 5, 4)
    assertArraysAgree(expr,
      InternalRow(UTF8String.fromString("do run run run do run run")))
  }

  test("CosineSimilarity and L2Distance generated code compile and match") {
    val at = ArrayType(DoubleType, containsNull = false)
    val row = InternalRow(doubleArray(1.0, 2.0, 3.0), doubleArray(-1.0, 0.5, 2.0))
    for (expr <- Seq[Expression](
        CosineSimilarity(BoundReference(0, at, nullable = true),
          BoundReference(1, at, nullable = true)),
        L2Distance(BoundReference(0, at, nullable = true),
          BoundReference(1, at, nullable = true)))) {
      val (c, i) = codegenVsInterpreted(expr, row)
      assert(c.asInstanceOf[Double] == i.asInstanceOf[Double],
        s"${expr.prettyName}: codegen vs interpreted mismatch")
    }
  }

  test("PQReconstruct generated code compiles and matches interpreted eval") {
    val at = ArrayType(DoubleType, containsNull = false)
    val codebook = Array(Array(0.0, 0.0, 10.0, 10.0), Array(5.0, 5.0, -3.0, -3.0))
    val expr = PQReconstruct(BoundReference(0, at, nullable = true), codebook, 2)
    val row = InternalRow(doubleArray(4.0, 4.5, -2.0, -2.5))
    val (c, i) = codegenVsInterpreted(expr, row)
    val cs = c.asInstanceOf[ArrayData].toDoubleArray.toSeq
    val is = i.asInstanceOf[ArrayData].toDoubleArray.toSeq
    assert(cs == is, "pq_reconstruct: codegen vs interpreted mismatch")
    // Subspace 1 (dims 0-1) nearest codeword 1 = (5,5); subspace 2
    // (dims 2-3) nearest codeword 1 = (-3,-3).
    assert(cs == Seq(5.0, 5.0, -3.0, -3.0))
  }

  test("MmrSelect generated code compiles and matches interpreted eval") {
    val candType = ArrayType(StructType(Seq(
      StructField("cos", DoubleType), StructField("vec_id", LongType),
      StructField("v", ArrayType(DoubleType)))))
    val expr = MmrSelect(BoundReference(0, candType, nullable = true), 2, 0.7)
    // Two near-identical high-relevance candidates plus one diverse
    // lower-relevance one: MMR must pick (10, then 12) — never 11.
    val cands = ArrayData.toArrayData(Array(
      InternalRow(0.9, 10L, doubleArray(1.0, 0.0)),
      InternalRow(0.89, 11L, doubleArray(1.0, 0.001)),
      InternalRow(0.5, 12L, doubleArray(0.0, 1.0))))
    val row = InternalRow(cands)
    val (c, i) = codegenVsInterpreted(expr, row)
    def picks(a: Any): Seq[(Int, Long)] = {
      val ad = a.asInstanceOf[ArrayData]
      (0 until ad.numElements()).map { j =>
        val r = ad.getStruct(j, 3); (r.getInt(0), r.getLong(1))
      }
    }
    assert(picks(c) == picks(i), "mmr_select: codegen vs interpreted mismatch")
    assert(picks(c) == Seq((1, 10L), (2, 12L)),
      "greedy selection must diversify away from the near-duplicate")
  }

  test("static forwarders referenced by doGenCode exist on the classfiles") {
    // (class, method, params) exactly as the generated Java calls them.
    val calls = Seq(
      (classOf[ShingleHashes], "hash",
        Seq(classOf[UTF8String], java.lang.Integer.TYPE)),
      (classOf[MinHashSignature], "signature",
        Seq(classOf[ArrayData], java.lang.Integer.TYPE)),
      (classOf[WinnowFingerprints], "winnow",
        Seq(classOf[UTF8String], java.lang.Integer.TYPE, java.lang.Integer.TYPE)),
      (classOf[MmrSelect], "select",
        Seq(classOf[ArrayData], java.lang.Integer.TYPE, java.lang.Double.TYPE)),
      (classOf[PQReconstruct], "reconstruct",
        Seq(classOf[ArrayData], classOf[Array[Array[Double]]], java.lang.Integer.TYPE)))
    for ((cls, name, params) <- calls) {
      val m = cls.getMethod(name, params: _*)
      assert(Modifier.isStatic(m.getModifiers),
        s"${cls.getName}.$name must be a STATIC forwarder (a name clash with " +
          "an inherited member suppresses it and breaks Janino compilation)")
    }
  }

  test("full-query plans evaluate native expressions with codegen fallback disabled") {
    // End-to-end guard: with fallback off, a failed stage/projection
    // compile surfaces as an error instead of interpreted execution.
    val conf = spark.conf
    val prevFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    val prevFallback = conf.get("spark.sql.codegen.fallback", "true")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    conf.set("spark.sql.codegen.fallback", "false")
    try {
      val row = spark.sql(
        """SELECT size(shingle_hashes(t, 3)) AS s,
          |       size(minhash_signature(shingle_hashes(t, 3), 32)) AS m,
          |       size(winnow_fingerprints(t, 8, 4)) AS w
          |FROM VALUES ('the quick brown fox jumps over the lazy dog') v(t)
          |""".stripMargin).collect().head
      assert(row.getInt(0) > 0 && row.getInt(1) == 32 && row.getInt(2) > 0)
    } finally {
      conf.set("spark.sql.codegen.factoryMode", prevFactory)
      conf.set("spark.sql.codegen.fallback", prevFallback)
    }
  }
}

package graft.functions

import graft.SparkSpec
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

class MinHashAggSpec extends SparkSpec {

  /** Reference splitmix64 re-mix — mirrors MinHashAgg.update. */
  private def components(h0: Long, n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var x = h0
    var i = 0
    while (i < n) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= z >>> 31
      out(i) = z
      i += 1
    }
    out
  }

  test("signature equals elementwise min of per-shingle splitmix64 components") {
    import spark.implicits._
    val n = 16
    val rows = Seq((1L, 101L), (1L, 202L), (1L, 303L), (2L, 101L), (2L, -404L))
    val got = rows.toDF("doc_id", "h0")
      .repartition(4) // force partial buffers + a merge path
      .groupBy("doc_id")
      .agg(minhashAgg(col("h0"), n).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val expected = rows.groupBy(_._1).map { case (doc, hs) =>
      doc -> hs.map(h => components(h._2, n)).reduce { (a, b) =>
        a.zip(b).map { case (x, y) => math.min(x, y) }
      }
    }
    expected.foreach { case (doc, sig) =>
      assert(got(doc).sameElements(sig), s"doc $doc")
    }
  }

  test("single-shingle doc's signature is exactly its component vector") {
    import spark.implicits._
    val got = Seq((7L, 42L)).toDF("doc_id", "h0")
      .groupBy("doc_id").agg(minhashAgg(col("h0"), 8).as("sig"))
      .collect().head.getSeq[Long](1).toArray
    assert(got.sameElements(components(42L, 8)))
  }

  test("scalar MinHashSignature equals MinHashAgg over the exploded rows") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq(101L, 202L, 303L)),
      (2L, Seq(101L, -404L)),
      (3L, Seq.empty[Long]))
      .toDF("doc_id", "hs")
    val viaExpr = docs
      .select(col("doc_id"), minhashSignature(col("hs"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaAgg = docs
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .groupBy("doc_id").agg(minhashAgg(col("h"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // Non-empty docs must agree byte-for-byte...
    assert(viaExpr(1L) == viaAgg(1L))
    assert(viaExpr(2L) == viaAgg(2L))
    // ...and the empty doc (dropped by explode) gets the empty buffer.
    assert(viaExpr(3L) == Seq.fill(16)(Long.MaxValue))
  }

  test("shingle-less docs are excluded from signatures (no empty-sig LSH collisions)") {
    import spark.implicits._
    import graft.operators.Dedup
    val arrays = Seq(
      (1L, "src", Seq(10L, 20L, 30L)),
      (2L, "src", Seq.empty[Long]),
      (3L, "src", Seq.empty[Long]))
      .toDF("doc_id", "source", "hs")
    val sigs = Dedup.minhashSignatures(arrays)
      .collect().map(_.getLong(0)).toSet
    // Docs 2 and 3 would share the all-MaxValue signature and collide
    // in every band (m^2 candidate blowup); they must be dropped.
    assert(sigs == Set(1L))
  }

  test("identical shingle sets produce identical signatures (dedup premise)") {
    import spark.implicits._
    val rows = (1 to 40).flatMap(i => Seq((1L, i * 7919L), (2L, i * 7919L)))
    val sigs = rows.toDF("doc_id", "h0")
      .groupBy("doc_id").agg(minhashAgg(col("h0"), 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
  }
}

package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("fakeResize samples the full grid and handles edge sizes") {
    // Uniform bytes: every sample reads the same value, so the
    // checksum is exactly samples * value and the mean is value/255.
    val uniform = Array.fill(1000)(0x41.toByte) // 'A' = 65
    val (sum, mean) = MultimodalStub.fakeResize(uniform)
    val samples = MultimodalStub.OutW * MultimodalStub.OutH
    assert(sum == samples.toLong * 65)
    assert(math.abs(mean - 65.0 / 255.0) < 1e-4)
    // Media smaller than the grid: positions repeat, never out of range.
    val tiny = Array[Byte](1, 2)
    val (tinySum, _) = MultimodalStub.fakeResize(tiny)
    assert(tinySum >= samples.toLong * 1 && tinySum <= samples.toLong * 2)
    assert(MultimodalStub.fakeResize(Array.emptyByteArray) == (0L, 0.0))
  }

  test("fakeFeatures is deterministic and has the declared shape") {
    val bytes = "hello multimodal world".getBytes("UTF-8")
    val f1 = MultimodalStub.fakeFeatures(bytes)
    val f2 = MultimodalStub.fakeFeatures(bytes)
    assert(f1.length == MultimodalStub.FeatureDim)
    assert(f1.toSeq == f2.toSeq)
    assert(MultimodalStub.fakeFeatures(Array.emptyByteArray).toSeq ==
      Seq.fill(MultimodalStub.FeatureDim)(0.0))
  }

  test("mm03 emits one feature row per document, stable across runs") {
    val docs = graft.sources.Tables.documents(spark, sf).count()
    val r1 = Multimodal.mm03FeatureStub(spark, sf).collect()
    val r2 = Multimodal.mm03FeatureStub(spark, sf).collect()
    assert(r1.length == docs)
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
  }

  test("mm03 features agree with a driver-side recomputation") {
    val texts = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Multimodal.mm03FeatureStub(spark, sf).collect()
    out.take(50).foreach { r =>
      val expected = MultimodalStub.fakeFeatures(texts(r.getLong(0)).getBytes("UTF-8"))
      val got = (0 until MultimodalStub.FeatureDim).map(i => r.getDouble(2 + i))
      assert(got == expected.toSeq, s"doc ${r.getLong(0)}")
    }
  }
}

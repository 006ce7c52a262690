package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

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

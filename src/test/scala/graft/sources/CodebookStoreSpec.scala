package graft.sources

import graft.SparkSpec

/** The versioned-codebook artifact behind sim18's swap: MergeSink's OCC
  * claim + `_SUCCESS`-commit protocol applied to a model artifact. The
  * pins here are the swap-safety contracts: atomic flip (a reader never
  * resolves a torn codebook), concurrent publishers both commit at
  * distinct versions, and retained versions stay byte-stable (etl23's
  * time-travel precedent).
  */
class CodebookStoreSpec extends SparkSpec {

  private def freshBase(): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_cbstore_${System.nanoTime()}"

  private def cb(seed: Int): Array[(Long, Array[Double])] =
    (0 until 4).map(i => i.toLong -> Array.tabulate(8)(d =>
      (seed * 100 + i * 10 + d).toDouble / 7.0)).toArray

  private def same(a: Array[(Long, Array[Double])],
      b: Array[(Long, Array[Double])]): Boolean =
    a.length == b.length && a.zip(b).forall { case ((ci, cv), (di, dv)) =>
      ci == di && cv.sameElements(dv)
    }

  test("publish → read round-trips exactly; latest flips at the commit marker") {
    val base = freshBase()
    val v1 = CodebookStore.publish(spark, base, cb(1))
    assert(v1 == 1L && CodebookStore.latest(spark, base).contains(1L))
    assert(same(CodebookStore.codebookAt(spark, base, v1), cb(1)))
    val v2 = CodebookStore.publish(spark, base, cb(2))
    assert(v2 == 2L && CodebookStore.latest(spark, base).contains(2L))
    // The swap is the marker: v2 resolves the new codebook, the
    // RETAINED v1 still reads the old one byte-stable (time travel).
    assert(same(CodebookStore.codebookAt(spark, base, 2L), cb(2)))
    assert(same(CodebookStore.codebookAt(spark, base, 1L), cb(1)))
    CodebookStore.reset(spark, base)
  }

  test("a torn (claimed or half-written) version is never readable") {
    val base = freshBase()
    CodebookStore.publish(spark, base, cb(1))
    // Simulate an in-flight writer: claim + partial dir, NO _SUCCESS.
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(base, "v2.claim"), false).close()
    fs.mkdirs(new org.apache.hadoop.fs.Path(base, "v2"))
    // Readers keep resolving the committed v1; the torn v2 fails loudly.
    assert(CodebookStore.latest(spark, base).contains(1L))
    val e = intercept[NoSuchElementException](
      CodebookStore.codebookAt(spark, base, 2L))
    assert(e.getMessage.contains("not committed"))
    // A later publisher skips the burned number (lineage never forks).
    val v3 = CodebookStore.publish(spark, base, cb(3))
    assert(v3 == 3L)
    assert(same(CodebookStore.codebookAt(spark, base, 3L), cb(3)))
    CodebookStore.reset(spark, base)
  }

  test("concurrent publishers both commit, at distinct versions (OCC)") {
    import scala.concurrent.duration._
    import scala.concurrent.{Await, ExecutionContext, Future}
    implicit val ec: ExecutionContext = ExecutionContext.global
    val base = freshBase()
    val vs = Await.result(
      Future.sequence((1 to 4).map(i =>
        Future(i -> CodebookStore.publish(spark, base, cb(i))))),
      2.minutes)
    // Four publishers, four distinct committed versions — no number
    // reused, no payload lost or torn.
    assert(vs.map(_._2).toSet.size == 4)
    assert(CodebookStore.versions(spark, base).size == 4)
    vs.foreach { case (i, v) =>
      assert(same(CodebookStore.codebookAt(spark, base, v), cb(i)),
        s"publisher $i's payload corrupted at v$v")
    }
    CodebookStore.reset(spark, base)
  }
}

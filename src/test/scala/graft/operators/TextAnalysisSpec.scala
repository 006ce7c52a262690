package graft.operators

import graft.SparkSpec
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("winnowing guarantee: docs sharing a long substring share a fingerprint") {
    val fps = TextAnalysis.text09WinnowFingerprint(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // The corpus contains near-duplicate pairs (dedup02 finds them at
    // jaccard >= 0.8); every such pair must share winnowed fingerprints
    // — that's the detection guarantee the scheme exists for.
    val nearDups = Dedup.dedup02NgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(nearDups.nonEmpty)
    nearDups.foreach { case (a, b) =>
      assert((fps(a) intersect fps(b)).nonEmpty,
        s"near-dup pair ($a,$b) must share winnowed fingerprints")
    }
    // And unrelated docs should NOT be all-overlapping: spot-check that
    // fingerprints discriminate.
    val ids = fps.keys.toSeq.sorted.take(10)
    val overlaps = for (x <- ids; y <- ids if x < y)
      yield (fps(x) intersect fps(y)).size.toDouble / fps(x).size
    assert(overlaps.count(_ < 0.5) > overlaps.size / 2,
      "most unrelated doc pairs should share few fingerprints")
  }

  test("langid identifies hand-built samples per stopword profile") {
    import spark.implicits._
    val samples = Seq(
      ("en", "the cat sat on the mat and it is happy that the sun is out"),
      ("es", "el perro corre en la casa y no se detiene porque es un dia bonito"),
      ("fr", "le chien est dans la maison et il mange pour le plaisir dans ce jardin"),
      ("de", "der hund ist in dem haus und das ist ein gutes zeichen von der liebe mit"),
      ("zh", "的 是 了 在 和 有 我 他 这 中"))
    val got = samples.toDF("expected", "text")
      .select(col("expected"), langId(col("text")).getField("lang").as("lang"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    got.foreach { case (exp, act) => assert(act == exp, s"expected $exp got $act") }
  }

  test("langid score is a ratio in [0, 1]") {
    val rows = TextAnalysis.text03LangId(spark, sf).collect()
    assert(rows.nonEmpty)
    val scoreIdx = rows.head.fieldIndex("lang_score")
    assert(rows.forall { r =>
      val s = r.getDouble(scoreIdx); s >= 0.0 && s <= 1.0
    })
  }

  test("text03 emits one row per document with a known language code") {
    val docs = graft.sources.Tables.documents(spark, sf).count()
    val out = TextAnalysis.text03LangId(spark, sf)
    assert(out.count() == docs)
    val rows = out.collect()
    val langIdx = rows.head.fieldIndex("pred_lang")
    val langs = rows.map(_.getString(langIdx)).toSet
    assert(langs.subsetOf(langProfiles.keySet))
  }
}

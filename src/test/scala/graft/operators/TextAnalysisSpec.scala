package graft.operators

import graft.SparkSpec
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

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

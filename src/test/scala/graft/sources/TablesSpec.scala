package graft.sources

import graft.SparkSpec

class TablesSpec extends SparkSpec {

  test("typed Dataset surface round-trips the parquet schemas") {
    val ev = Tables.eventsDs(spark, sf).head()
    assert(ev.event_id >= 0 && ev.ts != null && ev.event_type.nonEmpty)
    val doc = Tables.documentsDs(spark, sf).head()
    assert(doc.doc_id >= 0 && doc.text.nonEmpty && doc.n_chars > 0)
    val emb = Tables.embeddingsDs(spark, sf).head()
    assert(emb.vec_id >= 0 && emb.embedding.length == 64)
  }

  test("typed and untyped views agree on row counts") {
    assert(Tables.eventsDs(spark, sf).count() == Tables.events(spark, sf).count())
    assert(Tables.documentsDs(spark, sf).count() == Tables.documents(spark, sf).count())
  }

  test("events loader refuses a session missing the nanos flag") {
    val bare = org.apache.spark.sql.SparkSession.builder()
      .master("local[1]").getOrCreate() // same JVM: returns graft session
    // The canonical session has the flag; simulate a misconfigured one
    // by checking the require path directly.
    val e = intercept[IllegalArgumentException] {
      bare.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
      try Tables.events(bare, sf)
      finally bare.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    assert(e.getMessage.contains("nanosAsLong"))
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuarantineSpec extends SparkSpec {

  private lazy val out = Etl.etl20Root(sf)

  test("etl20 rejects exactly the corrupted lines and keeps the rest") {
    val summary = Etl.etl20CorruptQuarantine(spark, sf).collect()
    val expected = graft.sources.Tables.events(spark, sf)
      .groupBy((col("event_id") % 4).cast("int").as("batch"))
      .agg(
        sum(when(col("event_id") % 97 =!= 0, 1L).otherwise(0L)).as("n_valid"),
        sum(when(col("event_id") % 97 === 0, 1L).otherwise(0L)).as("n_rejected"))
      .orderBy("batch").collect()
    assert(summary.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ==
      expected.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq)
    assert(summary.map(_.getLong(2)).sum > 0, "testdata must exercise the corrupt path")
  }

  test("quarantine side-output carries raw line + file lineage for every reject") {
    Etl.etl20CorruptQuarantine(spark, sf).collect() // ensure side-output is fresh
    val q = spark.read.json(s"$out/quarantine")
    val nRejected = graft.sources.Tables.events(spark, sf)
      .filter(col("event_id") % 97 === 0).count()
    assert(q.count() == nRejected)
    assert(q.filter(col("src_file").isNull || !col("src_file").contains("batch=")).count() == 0,
      "every quarantined row must name its source file (with its batch dir)")
    assert(q.filter(!col("line").contains("CORRUPT@@")).count() == 0,
      "quarantined lines must be exactly the corrupted ones")
  }

  test("FAILFAST is the strict twin: the corrupted landing dir fails the job") {
    Etl.etl20CorruptQuarantine(spark, sf).collect() // materialize landing dir
    val schema = "event_id LONG, value DOUBLE"
    val strict = spark.read
      .schema(schema)
      .option("mode", "FAILFAST")
      .csv(s"$out/landing")
    val e = intercept[org.apache.spark.SparkException] {
      strict.collect()
    }
    assert(e.getMessage != null)
  }
}

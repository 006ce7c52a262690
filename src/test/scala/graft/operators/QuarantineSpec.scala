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

  test("parseLines is total over adversarial lines: every row lands valid or quarantined") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val lines = Seq(
      "1,2.5",            // clean
      "2,CORRUPT@@",      // unparseable double
      "3,",               // empty value field
      ",4.0",             // empty key field
      "",                 // empty line
      "5,1.0,extra",      // extra column
      "6,\"7,7\"",        // quoted field with delimiter
      "7,NaN",            // special double spellings
      "8,Infinity",
      "not_a_long,9.9",   // unparseable key
      "9," + "x" * 10000, // pathologically long garbage
      "10,1e308")         // near-overflow scientific notation
    val df = lines.toDF("line")
      .withColumn("batch", lit(0)).withColumn("src_file", lit("mem"))
    val parsed = graft.sources.Quarantine.parseLines(df).collect()
    // Totality: no row lost, nothing thrown.
    assert(parsed.length == lines.size)
    // Every quarantined row carries its raw line for replay.
    parsed.filter(r => !r.isNullAt(5)).foreach { r =>
      assert(r.getString(5) == r.getString(1),
        s"corrupt capture must be the raw line: $r")
    }
    def rowFor(line: String) = parsed.find(_.getString(1) == line).get
    // The known-corrupt marker is quarantined; a clean line is not.
    assert(!rowFor("2,CORRUPT@@").isNullAt(5))
    assert(rowFor("1,2.5").isNullAt(5) && rowFor("1,2.5").getDouble(4) == 2.5)
    // PERMISSIVE subtlety (part of the contract): a MISSING field is
    // null-and-valid, not corrupt — only unparseable content rejects.
    assert(rowFor("3,").isNullAt(5) && rowFor("3,").isNullAt(4))
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

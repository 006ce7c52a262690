package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The ONE definition of the corrupt-record parse contract shared by the
  * batch quarantine (etl20) and its streaming twin (stream06): both
  * sides must split identical lines identically, so the schema and the
  * PERMISSIVE `from_csv` unpack live here and nowhere else.
  */
object Quarantine {

  /** Declared record shape plus the PERMISSIVE corrupt-record capture
    * column.
    */
  val ParseSchema: StructType =
    StructType.fromDDL("event_id LONG, value DOUBLE, _corrupt STRING")

  /** Parse raw landing lines: expects (batch, line, src_file) columns;
    * yields (batch, line, src_file, event_id, v, corrupt) where a
    * malformed line carries nulls + its raw text in `corrupt` instead
    * of failing the job.
    */
  def parseLines(lines: DataFrame): DataFrame =
    lines
      .select(col("batch"), col("line"), col("src_file"),
        from_csv(col("line"), ParseSchema,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt")).as("r"))
      .select(col("batch"), col("line"), col("src_file"),
        col("r.event_id").as("event_id"), col("r.value").as("v"),
        col("r._corrupt").as("corrupt"))
}

package graft.operators

import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ETL surface etl01–etl14: the reference pipeline re-expressed as
  * declarative Spark plans (SURVEY.md §2). The reference parallelizes by
  * hand — thread pools over files and 1000-row chunks
  * (reference: case_2/MultithreadETL.py:121-152); here every step is a
  * DataFrame transform, so partitioning IS the concurrency and the same
  * plan runs unchanged on a 1000-executor cluster.
  */
object Etl {

  /** etl01: projection + rename + typed cast in ONE projection node.
    * Reference: case_1/NormalETL.py:13-31 — selects `needed_column`,
    * renames to `database_column`, then casts column-by-column in a
    * Python loop. Truncating float→int semantics preserved.
    */
  def etl01SelectRenameCast(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(
        col("event_id").as("record_id"),
        col("event_type").as("activity_type"),
        col("user_id").as("user_ref"),
        col("value").cast("int").as("quantity_int"),
        round(col("value"), 2).as("quantity_raw"))
      .orderBy("record_id")

  /** etl02: string→date/time normalization with errors→null.
    * Reference: case_2/Normal.py:166-192 — pandas `to_datetime(...,
    * errors='coerce')` per column plus `str[:-3]` surgery. Here the
    * whole normalization is codegen'd expressions; malformed input
    * yields null via try_* (no job-killing ANSI faults, no UDFs).
    */
  def etl02DatetimeNormalize(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("raw", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .select(
        col("event_id"),
        to_date(substring(col("raw"), 1, 10)).as("posting_date"),
        substring(col("raw"), 12, 8).as("posting_time"),
        expr("try_to_timestamp(event_type)").as("bad_parse"),
        expr("substring(event_type, 1, greatest(length(event_type) - 3, 0))")
          .as("type_code"))
      .orderBy("event_id")

  /** etl03: master-table upsert — assign surrogate keys to unseen
    * dimension values. Reference: case_2/Normal.py:53-79
    * (`update_master_table`: read master, anti-filter new values, dedup,
    * append, re-read). Here: anti-join for novelty + dense_rank offset by
    * the current max key — one shuffle of the (tiny) dimension, and the
    * fact table is never re-scanned. The single-partition window is safe
    * because it only ever sees the dimension's distinct values — a
    * contract PlanAuditSpec pins mechanically (every global window in
    * this plan must consume the post-distinct frame), so a refactor
    * cannot silently move the sort onto the fact table.
    */
  def etl03MasterUpsert(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val wAlpha = Window.orderBy("event_type")
    val existing = ev.filter(col("event_id") < 5)
      .select("event_type").distinct()
      .withColumn("master_id", dense_rank().over(wAlpha).cast("bigint"))
      .withColumn("is_new", lit(false))
    val maxId = existing.agg(coalesce(max("master_id"), lit(0L)).as("max_id"))
    val incoming = ev.select("event_type").distinct()
    val fresh = incoming
      .join(existing.select("event_type"), Seq("event_type"), "left_anti")
      .withColumn("rk", dense_rank().over(wAlpha).cast("bigint"))
      .crossJoin(broadcast(maxId))
      .select(
        (col("max_id") + col("rk")).as("master_id"),
        col("event_type"), lit(true).as("is_new"))
    existing.select("master_id", "event_type", "is_new")
      .unionByName(fresh)
      .orderBy("master_id")
  }

  /** etl04: fact enrichment against a chain of master dimensions.
    * Reference: case_2/Normal.py:225-230 — four sequential pandas
    * merges, each materializing the whole frame. Here all dims are
    * broadcast, so the fact streams through one stage with zero fact
    * shuffles (only orders↔lineitem co-shuffle on the order key).
    */
  def etl04DimEnrich(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .join(orders(spark, dir), col("l_orderkey") === col("o_orderkey"), "left")
      .join(broadcast(customer(spark, dir)), col("o_custkey") === col("c_custkey"), "left")
      .join(broadcast(nation(spark, dir)), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(region(spark, dir)), col("n_regionkey") === col("r_regionkey"), "left")
      .select("l_orderkey", "l_linenumber", "o_custkey", "c_name", "n_name", "r_name")
      .orderBy("l_orderkey", "l_linenumber")

  /** etl05: incremental merge (upsert) = latest record per key.
    * Reference: case_2/Normal.py:265-275 — temp table + SQL MERGE.
    * Here: one window per key ordered by the monotone event id; at
    * cluster scale this is a single hash shuffle on the merge key.
    */
  def etl05IncrementalMerge(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
    events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_type"),
        round(col("value"), 2).as("last_value"))
      .orderBy("user_id")
  }

  /** etl06: validity split. The reference hard-crashes on malformed rows
    * (`astype(int)`, case_1/NormalETL.py:29-30); a 100 TB pipeline must
    * instead flag-and-quarantine in a single pass — one scan, no
    * double-read of the fact.
    */
  def etl06ValiditySplit(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("is_valid",
        col("value").between(0.0, 190.0) && col("props").startsWith("{"))
      .select(
        col("event_id"), col("is_valid"),
        when(!col("value").between(0.0, 190.0), "value_out_of_range")
          .when(!col("props").startsWith("{"), "malformed_props")
          .otherwise("ok").as("reject_reason"))
      .orderBy("event_id")

  /** etl07: multi-file ingest with lineage. Reference:
    * case_1/NormalETL.py:8-10 — `os.listdir` + per-file loop. A parquet
    * directory scan parallelizes across files/row-groups by itself;
    * `input_file_name` keeps the per-file lineage the reference tracked
    * via its result-file bookkeeping.
    */
  def etl07MultiFileIngest(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("source_file",
        regexp_extract(input_file_name(), "([^/]+)$", 1))
      .groupBy("source_file")
      .agg(
        count(lit(1)).as("n_rows"),
        min("event_id").as("min_id"),
        max("event_id").as("max_id"))
      .orderBy("source_file")

  /** etl08: SCD type-2 dimension history — each change of a user's
    * event_type becomes a version with [valid_from, valid_to] bounds.
    * The change-detection lag and the valid_to lead share one window
    * partitioning, so the whole history builds in a single shuffle on
    * user_id. The reference's master-table upsert (case_2/Normal.py:53-79)
    * only keeps latest state; SCD2 is its audit-preserving big sibling.
    */
  def etl08Scd2(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("event_id")
    events(spark, dir)
      .withColumn("prev_type", lag("event_type", 1).over(byUser))
      .filter(col("prev_type").isNull || col("event_type") =!= col("prev_type"))
      .withColumn("version", row_number().over(byUser))
      .withColumn("next_from", lead("event_id", 1).over(byUser))
      .select(
        col("user_id"), col("version").cast("long").as("version"),
        col("event_type"), col("event_id").as("valid_from"),
        coalesce(col("next_from") - 1, lit(Long.MaxValue)).as("valid_to"))
      .orderBy("user_id", "version")
  }

  /** etl09: CSV round-trip — the reference's load step appends to CSV
    * (case_1/NormalETL.py:34-37). Write a typed extract as CSV, read it
    * back with an explicit schema (never inferSchema at scale: that's a
    * full extra pass), and aggregate; equality with the direct-on-parquet
    * oracle proves the sink/source pair is lossless for these types.
    */
  def etl09CsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_etl09_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    events(spark, dir)
      .select(col("event_id"), col("event_type"), round(col("value"), 2).as("value"))
      .write.mode("overwrite").option("header", "true").csv(out)
    spark.read
      .schema("event_id LONG, event_type STRING, value DOUBLE")
      .option("header", "true").csv(out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .orderBy("event_type")
  }

  /** etl11: JSON-lines round-trip — the interchange format half the
    * upstream world emits. Same contract as etl09: write, re-read with
    * an explicit schema, aggregate; equality with the direct-on-parquet
    * oracle proves losslessness for these types.
    */
  def etl11JsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_etl11_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 2).as("value"))
      .write.mode("overwrite").json(out)
    spark.read
      .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
      .json(out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct("user_id").as("n_users"),
        round(sum("value"), 2).as("total_value"))
      .orderBy("event_type")
  }

  /** etl12: ORC round-trip — the other columnar container; writer and
    * reader exercise a fully different serde stack than parquet, same
    * aggregate-equality contract.
    */
  def etl12OrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_etl12_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("price"))
      .write.mode("overwrite").orc(out)
    spark.read.orc(out)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("price"), 2).as("total"))
      .orderBy("o_orderstatus")
  }

  /** etl13: bucketed co-located join — both fact tables are written
    * bucketed (+ sorted) on the join key, so the join needs NO exchange
    * at read time: each bucket pair joins locally. This is the
    * pre-shuffle trade every warehouse makes for its hottest join key
    * at 100 TB — pay the shuffle once at write, never again per query.
    * The bucketed-scan join plan (no Exchange below the join) is
    * asserted in PlanAuditSpec.
    */
  def etl13BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val suffix = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_etl13_$suffix"
    val ordersTable = s"g_orders_b_$suffix"
    val lineitemTable = s"g_lineitem_b_$suffix"
    // One-time layout build; see TableBuild for the concurrency contract.
    TableBuild.ensure(spark, ordersTable) {
      orders(spark, dir).select("o_orderkey", "o_orderstatus")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$base/orders").saveAsTable(ordersTable)
      lineitem(spark, dir)
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/lineitem").saveAsTable(lineitemTable)
    }
    spark.table(ordersTable)
      .join(spark.table(lineitemTable), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("o_orderstatus")
  }

  /** etl14: snapshot reconciliation — FULL OUTER join of two dataset
    * versions classified into added / removed / changed / unchanged,
    * the audit step between any two incremental loads. One co-shuffled
    * join on the key, classification is pure column logic. (Snapshots
    * are deterministically derived from `events` so the op is
    * oracle-checkable: "old" drops event_id % 7 == 0, "new" drops
    * % 5 == 0 and bumps value where % 3 == 0.)
    */
  def etl14Reconcile(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(col("event_id"), round(col("value"), 2).as("value"))
    val oldSnap = ev.filter(col("event_id") % 7 =!= 0)
      .select(col("event_id"), col("value").as("old_value"))
    val newSnap = ev.filter(col("event_id") % 5 =!= 0)
      .select(col("event_id"),
        when(col("event_id") % 3 === 0, round(col("value") + 1.5, 2))
          .otherwise(col("value")).as("new_value"))
    oldSnap.join(newSnap, Seq("event_id"), "full_outer")
      .withColumn("status",
        when(col("old_value").isNull, "added")
          .when(col("new_value").isNull, "removed")
          .when(col("old_value") =!= col("new_value"), "changed")
          .otherwise("unchanged"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"),
        round(sum(coalesce(col("new_value"), col("old_value"))), 2).as("total_value"))
      .orderBy("status")
  }

  /** etl15: declarative data-quality expectations — the dbt-test /
    * expectation-suite audit an ETL engine runs after every load:
    * uniqueness, null rate, range conformance, and referential
    * integrity, each reported as (check, violations, checked). Each
    * check is one aggregate (or one anti-join count); none re-scans
    * another check's work.
    */
  def etl15Expectations(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val uniq = ev.agg(
      lit("event_id_unique").as("check_name"),
      (count(lit(1)) - countDistinct(col("event_id"))).as("n_violations"),
      count(lit(1)).as("n_checked"))
    val nn = ev.agg(
      lit("ts_not_null").as("check_name"),
      sum(when(col("ts").isNull, 1L).otherwise(0L)).as("n_violations"),
      count(lit(1)).as("n_checked"))
    val range = ev.agg(
      lit("value_in_range").as("check_name"),
      sum(when(!col("value").between(0.0, 200.0), 1L).otherwise(0L)).as("n_violations"),
      count(lit(1)).as("n_checked"))
    val orphans = orders(spark, dir)
      .join(customer(spark, dir), col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(
        lit("orders_custkey_fk").as("check_name"),
        count(lit(1)).as("n_violations"),
        lit(null).cast("long").as("n_checked"))
      .select(col("check_name"), col("n_violations"),
        coalesce(col("n_checked"), lit(0L)).as("n_checked"))
    val total = orders(spark, dir).agg(
      lit("orders_custkey_fk").as("check2"), count(lit(1)).as("total"))
    val fk = orphans.join(total, col("check_name") === col("check2"))
      .select(col("check_name"), col("n_violations"), col("total").as("n_checked"))
    uniq.unionByName(nn).unionByName(range).unionByName(fk)
      .withColumn("passed", col("n_violations") === 0)
      .orderBy("check_name")
  }

  /** etl16: CDC change-log apply — reduce an insert/update/delete
    * operation log to final table state, the step downstream of any
    * Debezium-style capture feed. Op codes derive deterministically
    * from `events` (error→D, click→U, else I; sequence = event_id).
    * Latest-op-per-key is one window shuffle on the key (same bounded
    * shape as etl05); delete handling and per-op audit counts are pure
    * column logic on top — no second scan of the log.
    */
  /** The deterministic CDC operation log both etl16 and etl19 consume:
    * (key, seq, op, value) derived from `events`.
    */
  private[graft] def cdcLog(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(
        col("user_id").as("key"),
        col("event_id").as("seq"),
        when(col("event_type") === "error", "D")
          .when(col("event_type") === "click", "U")
          .otherwise("I").as("op"),
        round(col("value"), 2).as("value"))

  def etl16CdcApply(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("key").orderBy(col("seq").desc)
    cdcLog(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("key"), col("seq").as("last_seq"), col("op").as("last_op"),
        col("value").as("current_value"))
      .orderBy("key")
  }

  /** etl19: external-store MERGE sink — the reference's load step (temp
    * table + `MERGE INTO master_table`, case_2/Normal.py:265-275) run
    * for real against a mutable catalog table via
    * [[graft.sources.MergeSink]]: the op log lands in two incremental
    * batches (even sequences, then odd), and the second batch is then
    * REPLAYED to prove restart idempotence — the merge's
    * latest-sequence-wins contract makes the replay a no-op, which is
    * what the reference's completed-batch bookkeeping
    * (case_2/Normal.py:283-327) achieves by skipping files. The final
    * table state read back from the catalog must equal the one-shot
    * full-log reduction (etl16's oracle) — batching, the catalog
    * round-trip, and the replay all invisible in the result.
    */
  def etl19MergeSink(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.MergeSink
    val suffix = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val table = s"g_master_$suffix"
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_etl19_$suffix"
    val log = cdcLog(spark, dir)
    val batch1 = log.filter(col("seq") % 2 === 0)
    val batch2 = log.filter(col("seq") % 2 =!= 0)
    MergeSink.reset(spark, table, base) // deterministic end-to-end replay
    MergeSink.merge(spark, table, base, batch1)
    MergeSink.merge(spark, table, base, batch2)
    MergeSink.merge(spark, table, base, batch2) // restart: must be a no-op
    MergeSink.state(spark, table)
      .select("key", "last_seq", "last_op", "current_value")
      .orderBy("key")
  }

  /** etl23: SNAPSHOT TIME TRAVEL over the merge sink — the audit-read
    * half of etl19's protocol (the reference's completed-batch
    * bookkeeping, case_2/Normal.py:283-327, answers "what did the
    * master table look like before this batch?" only implicitly; a
    * versioned sink answers it as a query). Two incremental merges
    * land the CDC log; both committed snapshots are then read back via
    * [[graft.sources.MergeSink.stateAt]] (immutable parquet versions —
    * stable reads while newer merges commit) and diffed per key into
    * the added / removed / changed / unchanged audit every incremental
    * load wants. One FULL OUTER co-shuffle of two key-compact states —
    * etl14's reconcile shape applied across TIME instead of across
    * systems.
    */
  def etl23SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.MergeSink
    val suffix = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val table = s"g_master23_$suffix"
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_etl23_$suffix"
    val log = cdcLog(spark, dir)
    MergeSink.reset(spark, table, base) // deterministic end-to-end replay
    MergeSink.merge(spark, table, base, log.filter(col("seq") % 2 === 0))
    MergeSink.merge(spark, table, base, log.filter(col("seq") % 2 =!= 0))
    val vs = MergeSink.versions(spark, base)
    val old = MergeSink.stateAt(spark, base, vs.init.last)
      .select(col("key"), col("current_value").as("old_value"))
    val cur = MergeSink.stateAt(spark, base, vs.last)
      .select(col("key"), col("current_value").as("new_value"))
    old.join(cur, Seq("key"), "full_outer")
      .withColumn("status",
        when(col("old_value").isNull, "added")
          .when(col("new_value").isNull, "removed")
          .when(col("old_value") =!= col("new_value"), "changed")
          .otherwise("unchanged"))
      .select("key", "status", "old_value", "new_value")
      .orderBy("key")
  }

  /** etl27: snapshot RETENTION / VACUUM over the merge sink — the
    * maintenance sibling of etl21's compaction, closing the version
    * lifecycle etl23 opened: snapshots cost a full state copy each, so
    * a real lake expires them on a schedule instead of time-traveling
    * forever. Three incremental merges land the CDC log under a deeper
    * retention (retainLast = 3 → versions v1..v3 on disk), then an
    * explicit [[graft.sources.MergeSink.expireVersions]] VACUUM keeps
    * the last two: v1's files are deleted, v2/v3 stay byte-identical
    * (immutable snapshots — expiry never rewrites survivors), reads of
    * v1 fail loudly (spec-pinned), and the current version can never
    * be expired by contract (keepLast >= 1).
    *
    * The audit result is one row per RETAINED version — its visible
    * key count and exact last_seq sum (integer, so no float-order
    * hazard) plus how many versions the VACUUM expired; the oracle
    * replays each retained snapshot as a latest-seq-wins reduction
    * over the batches it had absorbed (v2 = batches 1–2, v3 = full
    * log).
    */
  /** etl27's protocol constants — SHARED with the generated oracle in
    * [[graft.SparkEntry]] (the text17/BpeMerges discipline, round-11
    * ADVICE): the batch count (merges landed, `seq % Batches` assigns
    * each op its batch), the per-merge retention, and the VACUUM's
    * keep-last. Changing any of them here re-generates the oracle's
    * version list, batch predicates, and expiry count in lockstep
    * instead of failing at correctness-run time with a hash mismatch.
    * Invariant the oracle generation relies on: Batches <= RetainLast
    * (every version is still on disk when the VACUUM runs, so it
    * expires exactly Batches - KeepLast versions).
    */
  val Etl27Batches = 3
  val Etl27RetainLast = 3
  val Etl27KeepLast = 2

  def etl27Retention(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.MergeSink
    val suffix = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val table = s"g_master27_$suffix"
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_etl27_$suffix"
    val log = cdcLog(spark, dir)
    MergeSink.reset(spark, table, base) // deterministic end-to-end replay
    (0 until Etl27Batches).foreach { i =>
      MergeSink.merge(spark, table, base,
        log.filter(col("seq") % Etl27Batches === i),
        retainLast = Etl27RetainLast)
    }
    val expired = MergeSink.expireVersions(spark, base, keepLast = Etl27KeepLast)
    val retained = MergeSink.versions(spark, base)
    retained.map { v =>
      MergeSink.stateAt(spark, base, v)
        .agg(count(lit(1)).as("n_keys"), sum("last_seq").as("sum_seq"))
        .select(lit(v).as("version"), col("n_keys"), col("sum_seq"),
          lit(expired.size).as("n_expired"))
    }.reduce(_ unionByName _).orderBy("version")
  }

  /** etl29's protocol constants — SHARED with the generated oracle
    * (etl27's discipline): the landed batch count and the erase-list
    * selection threshold (first two hex chars of a salted md5 —
    * ~64/256 ≈ 25% of keys, the engine-portable stand-in for the
    * erasure-request list a real deployment receives; salted so the
    * set is independent of every other hash decision).
    */
  val Etl29Batches = 3
  val Etl29EraseHexThr = "40"

  /** The erasure predicate over a key column — cur24's takedown
    * protocol on the master-table side.
    */
  private[graft] def etl29EraseFlag(key: org.apache.spark.sql.Column) =
    substring(md5(concat(lit("erase:"), key.cast("string"))), 1, 2) <
      Etl29EraseHexThr

  /** etl29: SNAPSHOT SCRUB — GDPR erasure vs the time-travel surface,
    * resolving the one place the repo's two strongest stories
    * contradicted each other (round-16 directive #2): cur24's takedown
    * reaches the packed corpus, but the merge sink's retained
    * snapshots (etl23/etl27) still SERVE removed keys at older
    * versions by design. A real erasure request must scrub retained
    * history too. Three incremental merges land the CDC log under
    * retainLast = [[Etl29Batches]] (v1..v3 all retained), then
    * [[graft.sources.MergeSink.scrubVersions]] rewrites EVERY retained
    * snapshot minus the erase-listed keys — version numbers, commit
    * markers, and the OCC protocol intact (an in-place content scrub
    * of history, not a new version), tombstone rows removed too (the
    * key itself is the personal datum).
    *
    * Audit: one row per retained version — its post-scrub visible key
    * count and exact last_seq sum, plus how many raw rows (tombstones
    * included) the scrub removed from THAT version, measured
    * before→after from the snapshot files. The oracle replays each
    * version as a latest-seq-wins reduction over its absorbed batches
    * with the erase predicate applied — so a scrub that missed a
    * version, touched a survivor, or left a tombstone moves a count.
    * The spec pins the stronger byte-level laws: survivors
    * byte-identical per version, erased keys absent from the RAW rows
    * of every version, version set unchanged.
    *
    * Scale: the erase list is request-sized (broadcast); each retained
    * version pays one streamed state copy — the irreducible price of
    * erasing history, linear in retained state, never in the log.
    */
  def etl29SnapshotScrub(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.MergeSink
    val suffix = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val table = s"g_master29_$suffix"
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_etl29_$suffix"
    val log = cdcLog(spark, dir)
    MergeSink.reset(spark, table, base) // deterministic end-to-end replay
    (0 until Etl29Batches).foreach { i =>
      MergeSink.merge(spark, table, base,
        log.filter(col("seq") % Etl29Batches === i),
        retainLast = Etl29Batches)
    }
    val versions = MergeSink.versions(spark, base)
    // Pre-scrub raw row counts (the audit's n_erased denominators) —
    // ALL retained versions counted in ONE job (a union of per-version
    // count legs instead of a count job per version; round-20
    // optimization — the cur31 all-versions-one-job pattern).
    val preRows = versions.map { v =>
        MergeSink.snapshotRows(spark, base, v)
          .agg(count(lit(1)).as("n"))
          .select(lit(v).as("version"), col("n"))
      }.reduce(_ unionByName _).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    MergeSink.scrubVersions(spark, table, base,
      log.select(col("key")).distinct().filter(etl29EraseFlag(col("key"))))
    val audit = versions.map { v =>
      MergeSink.snapshotRows(spark, base, v)
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("last_op") =!= "D", 1L).otherwise(0L)).as("n_keys"),
          sum(when(col("last_op") =!= "D", col("last_seq")).otherwise(0L))
            .as("sum_seq"))
        .select(lit(v).as("version"), col("n_keys"), col("sum_seq"),
          (lit(preRows(v)) - col("n_rows")).as("n_erased"))
    }.reduce(_ unionByName _).orderBy("version")
    // Returned EAGERLY materialized (round-17 ADVICE): preRows was
    // computed before the scrub, so a lazily-returned frame re-read
    // the snapshot files at consumption time — a same-session re-run
    // of this operator (or stream26's scrub on the same store) before
    // the caller consumed the frame would pair post-second-mutation
    // files with the first run's denominators. Collecting the
    // version-count rows (one per retained version) pins the audit to
    // the scrub it describes.
    spark.createDataFrame(
      spark.sparkContext.parallelize(audit.collect().toSeq, 1), audit.schema)
  }

  /** etl30: SUPPRESSION GATE — close the erasure loop etl29 opens
    * (round-17 directive #1). Full erasure removes even the delete
    * tombstone (the key itself is the personal datum), so the
    * tombstone's resurrection guard is gone by design: a LATE or
    * REPLAYED change batch carrying an erased key — exactly the merge
    * the reference replays on restart (case_2/Normal.py:265-275) —
    * would silently re-insert it. The scrub therefore publishes the
    * erase set to a cumulative suppression-list artifact and
    * [[graft.sources.MergeSink.merge]] drops suppressed keys at
    * ingest, which is the standard GDPR posture (suppression list,
    * not tombstone, because the tombstone is itself personal data).
    *
    * This operator drives the resurrection attempt END TO END: land
    * the CDC log in [[Etl29Batches]] merges (all versions retained),
    * scrub the erase-listed keys across history (which publishes the
    * suppression list), then merge a LATE batch that re-sends EVERY
    * key — erased ones included — at sequences above the high-water
    * mark, so absent the gate every erased key would win
    * latest-seq-wins and resurrect. The audit is one row per retained
    * version (the scrubbed history v1..v3 plus the post-late-merge
    * v4): visible key count, exact integer seq sum, and the
    * resurrection count — rows whose key is erase-listed, which the
    * oracle pins to ZERO everywhere while v4's n_keys/sum_seq prove
    * the NON-suppressed late rows did land (the gate is narrow:
    * suppression drops erased keys only, never a legitimate update).
    * Deliberate contrast pinned by v4: a key whose last op was a
    * TOMBSTONE takes the late update (tombstones only guard OLDER
    * arrivals — latest-seq-wins), while an ERASED key stays gone at
    * ANY sequence — the two guards protect different things.
    *
    * Scale: the suppression list is an erasure ledger (request-sized,
    * broadcast anti-join at each merge — one existence probe when no
    * erasure ever ran); the late merge pays a normal merge's price.
    * The audit is returned EAGERLY materialized (etl29's round-17
    * ADVICE fix applied here from birth): the version-count rows are
    * collected before returning, so the audit stays pinned to the
    * state this run produced even if the caller re-runs the operator
    * before consuming it.
    */
  def etl30SuppressionGate(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.MergeSink
    val suffix = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val table = s"g_master30_$suffix"
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_etl30_$suffix"
    val log = cdcLog(spark, dir)
    MergeSink.reset(spark, table, base) // deterministic end-to-end replay
    (0 until Etl29Batches).foreach { i =>
      MergeSink.merge(spark, table, base,
        log.filter(col("seq") % Etl29Batches === i),
        retainLast = Etl29Batches + 1)
    }
    MergeSink.scrubVersions(spark, table, base,
      log.select(col("key")).distinct().filter(etl29EraseFlag(col("key"))))
    // The late batch: every key re-sent STRICTLY above the high-water
    // mark (seq = maxSeq + key + 1 — unique per key, and > maxSeq even
    // for key 0, so every ungated late row wins latest-seq-wins),
    // value pinned to the key so the oracle replays it exactly. One
    // scalar max over the log's seq column (documented O(1) driver
    // value).
    val maxSeq = log.agg(max(col("seq"))).head().getLong(0)
    MergeSink.merge(spark, table, base,
      log.select(col("key")).distinct()
        .select(col("key"), (col("key") + lit(maxSeq + 1)).as("seq"),
          lit("U").as("op"), col("key").cast("double").as("value")),
      retainLast = Etl29Batches + 1)
    val audit = MergeSink.versions(spark, base).map { v =>
      MergeSink.snapshotRows(spark, base, v)
        .agg(
          sum(when(col("last_op") =!= "D", 1L).otherwise(0L)).as("n_keys"),
          sum(when(col("last_op") =!= "D", col("last_seq")).otherwise(0L))
            .as("sum_seq"),
          sum(when(etl29EraseFlag(col("key")), 1L).otherwise(0L))
            .as("n_resurrected"))
        .select(lit(v).as("version"), col("n_keys"), col("sum_seq"),
          col("n_resurrected"))
    }.reduce(_ unionByName _).orderBy("version")
    // Pin the audit to THIS run's state (see scaladoc).
    spark.createDataFrame(
      spark.sparkContext.parallelize(audit.collect().toSeq, 1), audit.schema)
  }

  /** etl18: XML round-trip — the remaining interchange format legacy
    * upstreams emit (Spark 4 ships the XML source built in). Same
    * contract as etl09/11/12: write, re-read with an EXPLICIT schema
    * (inference is an extra full pass at scale), aggregate; equality
    * with the direct-on-parquet oracle proves the serde pair lossless
    * for these types.
    */
  def etl18XmlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_etl18_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"),
        round(col("s_acctbal"), 2).as("bal"))
      .write.mode("overwrite").option("rowTag", "supplier")
      .format("xml").save(out)
    spark.read
      .schema("s_suppkey LONG, s_nationkey LONG, bal DOUBLE")
      .option("rowTag", "supplier").format("xml").load(out)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_suppliers"), round(sum("bal"), 2).as("total_bal"))
      .orderBy("s_nationkey")
  }

  /** etl17: schema evolution — a v1 extract (two columns) and a v2
    * extract (adds `channel`) land in the same dataset directory; the
    * merged read (`mergeSchema`) sees the union schema with nulls for
    * pre-evolution rows. This is how a 100 TB table grows columns
    * without rewriting history: each parquet footer keeps its own
    * schema, the reader unifies. The aggregate proves both halves
    * survive: v1 rows carry a null channel, v2 rows a real one.
    */
  def etl17SchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_etl17_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    // Build-once per source fingerprint (the etl22 pattern): the two
    // version directories are immutable once landed — that is the whole
    // point of schema evolution — so rewriting them per call only paid
    // double I/O and forbade self-concurrency. The marker/stamp live on
    // v=2, the LAST directory written, so a crash between the two
    // writes leaves no marker and the layout rebuilds.
    TableBuild.ensurePath(spark, s"$out/v=2",
        TableBuild.dirFingerprint(spark, s"$dir/events.parquet")) {
      val ev = events(spark, dir)
      ev.filter(col("event_id") % 2 === 0)
        .select(col("event_id"), col("event_type"))
        .write.mode("overwrite").parquet(s"$out/v=1")
      ev.filter(col("event_id") % 2 =!= 0)
        .select(col("event_id"), col("event_type"),
          concat(lit("ch_"), (col("event_id") % 3).cast("string")).as("channel"))
        .write.mode("overwrite").parquet(s"$out/v=2")
    }
    spark.read.option("mergeSchema", "true").parquet(out)
      .groupBy(coalesce(col("channel"), lit("pre_evolution")).as("channel"))
      .agg(count(lit(1)).as("n"),
        countDistinct("event_type").as("n_types"))
      .orderBy("channel")
  }

  /** etl20: corrupt-record quarantine in the batch path — the
    * reference's per-file error bookkeeping (it records each landed
    * file's success/failure and carries on; case_2/Normal.py:283-327)
    * re-expressed as PERMISSIVE parsing with a captured corrupt-record
    * column and a quarantine side-output:
    *
    *  - a landing directory of CSV batches is produced with a known
    *    deterministic corruption (every event_id % 97 == 0 line carries
    *    an unparseable value), partitioned by batch;
    *  - the read parses each line with `from_csv` in PERMISSIVE mode —
    *    a bad record yields nulls plus the raw line in `_corrupt`
    *    instead of failing the job (FAILFAST is the strict twin,
    *    spec'd) — so ONE bad byte does not poison a 100 TB load;
    *  - rejected rows are quarantined WITH LINEAGE (raw line, batch,
    *    and source file via the `_metadata.file_path` scan column) to a
    *    side directory for replay/debugging;
    *  - the returned summary counts valid/rejected rows and aggregates
    *    only the valid remainder per batch — oracle-checked against the
    *    corruption rule replayed in SQL.
    */
  /** Root of etl20's generated landing/quarantine layout for `dir` —
    * exposed so the streaming twin's spec and QuarantineSpec read the
    * SAME path instead of re-deriving the template.
    */
  def etl20Root(dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_etl20_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"

  def etl20CorruptQuarantine(spark: SparkSession, dir: String): DataFrame = {
    val out = etl20Root(dir)
    val ev = events(spark, dir)
      .select(col("event_id"), round(col("value"), 2).as("value"))
    ev.select(
        (col("event_id") % 4).cast("int").as("batch"),
        when(col("event_id") % 97 === 0,
          concat(col("event_id").cast("string"), lit(",CORRUPT@@")))
          .otherwise(concat(col("event_id").cast("string"), lit(","),
            col("value").cast("string"))).as("line"))
      .write.mode("overwrite").partitionBy("batch").text(s"$out/landing")

    // Shared parse contract with the streaming twin (stream06).
    val parsed = graft.sources.Quarantine.parseLines(
      spark.read.text(s"$out/landing")
        .select(col("batch").cast("int").as("batch"),
          col("value").as("line"),
          col("_metadata.file_path").as("src_file")))

    // Quarantine side-output: every rejected row, with full lineage.
    parsed.filter(col("corrupt").isNotNull)
      .select(col("batch"), col("src_file"), col("line"))
      .write.mode("overwrite").json(s"$out/quarantine")

    parsed.groupBy("batch")
      .agg(
        sum(when(col("corrupt").isNull, 1L).otherwise(0L)).as("n_valid"),
        sum(when(col("corrupt").isNotNull, 1L).otherwise(0L)).as("n_rejected"),
        round(sum(when(col("corrupt").isNull, col("v"))), 2).as("valid_value"))
      .orderBy("batch")
  }

  /** Target compacted file size. 128 MB = one comfortable parquet
    * row-group-aligned scan task; at 100 TB this is the knob that turns
    * "millions of 100 KB files, one task each" into right-sized scans.
    */
  val CompactionTargetBytes: Long = 128L * 1024 * 1024

  /** etl21: small-file compaction — the maintenance pass every large
    * lake runs continuously: streaming/concurrent ingest (the
    * reference's per-batch appends, case_2/Normal.py:283-327) leaves
    * a fragment per batch per writer, and readers then pay a task (and
    * an object-store request) per file. Stage a deliberately
    * fragmented copy of `events` (64 shards), size the compacted
    * layout from the MEASURED staged bytes (ceil(bytes / target) — a
    * real compactor sizes from the file listing, not a guess), and
    * rewrite with `maxRecordsPerFile` as the overflow bound. The
    * returned aggregate proves the rewrite is lossless (the oracle
    * computes it straight off the source table); the file-count
    * collapse itself is asserted in the spec, since an oracle can only
    * see content.
    */
  def etl21Compaction(spark: SparkSession, dir: String): DataFrame = {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_etl21_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val frag = s"$base/fragmented"
    val comp = s"$base/compacted"
    events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 2).as("value"))
      .repartition(64)
      .write.mode("overwrite").parquet(frag)
    // Size the target layout from the staged bytes via the path's own
    // Hadoop FileSystem (works on HDFS/object stores, not just local).
    val fragPath = new org.apache.hadoop.fs.Path(frag)
    val fs = fragPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagedBytes = fs.getContentSummary(fragPath).getLength
    val nFiles = math.max(1L,
      (stagedBytes + CompactionTargetBytes - 1) / CompactionTargetBytes).toInt
    spark.read.parquet(frag)
      .repartition(nFiles)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 4000000)
      .parquet(comp)
    spark.read.parquet(comp)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct("user_id").as("n_users"),
        round(sum("value"), 2).as("total_value"))
      .orderBy("event_type")
  }

  /** etl10: partitioned sink — write orders hive-partitioned by order
    * year (the layout that makes a 100 TB table prunable: a year
    * predicate then reads 1/Nth of the files), read back, and prove the
    * partition column round-trips. Partition pruning on the re-read is
    * visible in the scan's PartitionFilters.
    */
  def etl10PartitionedSink(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_etl10_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    orders(spark, dir)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(out)
    spark.read.parquet(out)
      .groupBy("o_year")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_year")
  }

  /** Range partition count for etl22's clustered layout. */
  val ClusterFiles = 8

  /** etl22: RANGE-CLUSTERED layout — the sort-based complement of
    * etl10's hive partitioning and etl13's hash bucketing: the table is
    * written `repartitionByRange(o_orderdate).sortWithinPartitions`, so
    * rows with nearby dates land in the same files and every file (and
    * parquet row group) covers a narrow min/max date band. A date-range
    * predicate then touches a bounded handful of files instead of
    * scattering across all of them — at 100 TB this is what makes
    * time-windowed scans proportional to the window, not the table,
    * without a partition column (the Z-order/liquid-clustering idea in
    * its one-dimensional form). The returned aggregate proves the
    * clustered copy is lossless (the oracle computes it straight off
    * the source table); the file-locality claim itself is asserted in
    * the spec via `_metadata.file_path` (an oracle can only see
    * content, same split as etl21's file-count collapse).
    */
  def etl22ClusteredLayout(spark: SparkSession, dir: String): DataFrame = {
    val out = clusteredOrdersPath(spark, dir)
    spark.read.parquet(out)
      .filter(col("o_orderdate").between("1995-01-01", "1995-12-31"))
      .groupBy(month(col("o_orderdate")).as("o_month"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_month")
  }

  /** etl24: JDBC DATABASE round-trip — the reference's external-DB leg
    * (pyodbc engine + master-table read/write, case_2/Normal.py:42-79)
    * against an EMBEDDED Derby engine: a real JDBC database running
    * in-process, so the integration is exercised end-to-end with no
    * network dependency. Spark's JDBC source is the cluster-scale
    * re-expression of the pandas `read_sql_table`/`to_sql` pair:
    *
    *  - the WRITE batches inserts from every source partition in
    *    parallel (one connection per task — where the reference's
    *    fast_executemany streams through one);
    *  - the READ BACK is PARTITIONED on the key column
    *    (partitionColumn + bounds + numPartitions), so the "master
    *    table" scan parallelizes like any other source instead of
    *    single-streaming — at warehouse scale this is the difference
    *    between a bottleneck and a source.
    *
    * Same self-overwrite caveat as etl17: the table is dropped and
    * rewritten per call, so etl24 must not race itself (documented in
    * TableBuild's concurrency contract; every other operator is safe).
    */
  def etl24JdbcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val back = jdbcMasterReadback(spark, dir)
    back.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        round(sum("c_acctbal"), 2).as("total_acctbal"))
      .orderBy("c_mktsegment")
  }

  /** Write the customer master through JDBC and read it back
    * key-partitioned — separated so the spec can assert round-trip
    * content and read parallelism on the raw frame.
    */
  private[graft] def jdbcMasterReadback(
      spark: SparkSession, dir: String): DataFrame = {
    val (url, props) = derbyConnection(dir)
    val table = "g_customer_master"
    val src = customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
    src.write.mode("overwrite").jdbc(url, table, props)
    // Key bounds for the partitioned read: one tiny source aggregate
    // (driver scalars — the cur07/sim06 threshold contract).
    val maxKey = src.agg(max("c_custkey")).collect()(0).getLong(0)
    spark.read.jdbc(url, table,
      columnName = "c_custkey", lowerBound = 0L, upperBound = maxKey + 1,
      numPartitions = 4, connectionProperties = props)
  }

  /** etl25: set-based MERGE in an external JDBC database — the
    * reference's literal master-table upsert (SQL-Server MERGE via
    * pyodbc, case_2/Normal.py:53-79,277), executed as a REAL SQL MERGE
    * inside embedded Derby. Division of labor is the warehouse
    * pattern: Spark moves the DATA in parallel (base master + staged
    * updates land via partitioned JDBC writes), and the merge itself
    * is ONE set-based statement the database executes — never a
    * row-at-a-time driver loop. etl19's MergeSink is this same
    * semantic on lake storage; here the sink is a database. Scenario:
    * the staged batch UPDATES every even-keyed customer's balance and
    * INSERTS the ones missing from the master subset.
    *
    * Same self-overwrite caveat as etl17/etl24: must not race itself.
    */
  def etl25JdbcMerge(spark: SparkSession, dir: String): DataFrame = {
    val (url, props) = derbyConnection(dir)
    val master = "g_merge_master"
    val staging = "g_merge_staging"
    val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment")
    val src = customer(spark, dir).select(cols.map(col): _*)
    // Base master: a subset, so the staged batch exercises BOTH merge
    // arms (matched update + not-matched insert).
    src.filter(col("c_custkey") % 3 =!= 0)
      .write.mode("overwrite").jdbc(url, master, props)
    src.filter(col("c_custkey") % 2 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 100.0)
      .write.mode("overwrite").jdbc(url, staging, props)
    // Control plane: one set-based statement, executed in the engine.
    // Spark's Derby dialect writes case-sensitive quoted identifiers,
    // so the statement quotes them identically.
    val q = cols.map(c => s""""$c"""")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(
        s"""MERGE INTO $master m USING $staging s
            ON m."c_custkey" = s."c_custkey"
            WHEN MATCHED THEN UPDATE SET "c_acctbal" = s."c_acctbal"
            WHEN NOT MATCHED THEN INSERT (${q.mkString(", ")})
              VALUES (${q.map(c => s"s.$c").mkString(", ")})""")
      finally st.close()
    } finally conn.close()
    val maxKey = src.agg(max("c_custkey")).collect()(0).getLong(0)
    spark.read.jdbc(url, master,
        columnName = "c_custkey", lowerBound = 0L, upperBound = maxKey + 1,
        numPartitions = 4, connectionProperties = props)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        round(sum("c_acctbal"), 2).as("total_acctbal"))
      .orderBy("c_mktsegment")
  }

  /** etl31: JDBC ERASURE + SUPPRESSION — the erasure loop closed on
    * the sink the reference ACTUALLY runs (an RDBMS master table with
    * completed-batch bookkeeping whose restart path literally REPLAYS
    * the staged MERGE, case_2/Normal.py:265-327): etl29/etl30 build
    * the story for the lake sink; a deployment with a database master
    * faces the identical pair — erase the keys from served state, and
    * gate the replayed batch so it cannot re-insert them. Scenario:
    * etl25's master+staging land via parallel JDBC writes and the
    * normal MERGE runs; then the erasure request (the salted
    * [[etl29EraseFlag]] predicate, ~25% of keys — ONE definition with
    * etl29/etl30) lands as a SUPPRESSION TABLE in the same engine, and
    * one TRANSACTION executes the whole compliance action set-based:
    * DELETE the erased keys from the master, DELETE them from the
    * staged batch (the ingest-side gate, applied in the engine), and
    * REPLAY the reference's MERGE. The transaction is the strengthening
    * the lake sink cannot give: the gate is ATOMIC with the data it
    * protects — no window where the replay sees an ungated staging.
    *
    * Audit: one row per market segment — post-erasure customer count,
    * 2-dp balance sum, and n_erased measured pre→post FROM THE
    * DATABASE (not from the predicate); the oracle replays the
    * merge→erase→gated-replay algebra directly on the source table,
    * so a DELETE that missed a key, a gate that leaked one into the
    * replay, or a replay that double-applied the update moves a
    * count or the sum. Returned eagerly materialized (etl29's
    * discipline). The spec drives the THREAT arm: the same replay
    * WITHOUT the gate resurrects every erased staged key.
    *
    * Scale: division of labor as etl25 — Spark moves data in
    * parallel; the erasure control plane is three set-based
    * statements the engine executes (the suppression list is
    * request-sized); the read-back is key-partitioned. Same
    * self-overwrite caveat as etl24/etl25: must not race itself.
    */
  def etl31JdbcErasure(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (url, props) = derbyConnection(dir)
    val master = "g_erase_master"
    val staging = "g_erase_staging"
    // The ledger name the streaming seam (GraftStreams.
    // upsertBatchToJdbc) auto-detects — resolved through the ONE
    // shared definition (round-18 directive #4): an erasure executed
    // here gates every later streamed merge into this master, and a
    // spelling drift is now a compile error, not a silent un-gating.
    val suppress = graft.sources.JdbcErasure.suppressTableFor(master)
    val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment")
    val src = customer(spark, dir).select(cols.map(col): _*)
    src.filter(col("c_custkey") % 3 =!= 0)
      .write.mode("overwrite").jdbc(url, master, props)
    src.filter(col("c_custkey") % 2 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 100.0)
      .write.mode("overwrite").jdbc(url, staging, props)
    // The erasure request, landed as a table beside the data it
    // governs (the ledger is transactional with the master).
    src.filter(etl29EraseFlag(col("c_custkey")))
      .select(col("c_custkey"))
      .write.mode("overwrite").jdbc(url, suppress, props)
    val q = cols.map(c => s""""$c"""")
    val mergeSql =
      s"""MERGE INTO $master m USING $staging s
          ON m."c_custkey" = s."c_custkey"
          WHEN MATCHED THEN UPDATE SET "c_acctbal" = s."c_acctbal"
          WHEN NOT MATCHED THEN INSERT (${q.mkString(", ")})
            VALUES (${q.map(c => s"s.$c").mkString(", ")})"""
    val maxKey = src.agg(max("c_custkey")).collect()(0).getLong(0)
    def masterBack = spark.read.jdbc(url, master,
      columnName = "c_custkey", lowerBound = 0L, upperBound = maxKey + 1,
      numPartitions = 4, connectionProperties = props)
    def segCounts: Map[String, Long] = masterBack
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val conn = java.sql.DriverManager.getConnection(url)
    val pre =
      try {
        val st = conn.createStatement()
        try {
          // The normal load (the reference's first pass), then the
          // pre-erasure per-segment counts MEASURED from the database
          // (the audit's n_erased denominators must not trust the
          // predicate — etl29's preRows discipline).
          st.executeUpdate(mergeSql)
          val p = segCounts
          conn.setAutoCommit(false)
          try {
            // The compliance action, one transaction: erase served
            // state, gate the staged batch, replay the merge (the
            // reference's restart path).
            st.executeUpdate(s"""DELETE FROM $master WHERE "c_custkey" IN
                (SELECT "c_custkey" FROM $suppress)""")
            st.executeUpdate(s"""DELETE FROM $staging WHERE "c_custkey" IN
                (SELECT "c_custkey" FROM $suppress)""")
            st.executeUpdate(mergeSql)
            conn.commit()
            conn.setAutoCommit(true)
          } catch {
            // Roll back and restore autoCommit BEFORE close: Derby
            // throws 25001 on close-with-active-transaction, masking
            // the original failure (round-18 ADVICE).
            case e: Throwable =>
              try { conn.rollback(); conn.setAutoCommit(true) }
              catch { case _: java.sql.SQLException => () }
              throw e
          }
          p
        } finally st.close()
      } finally conn.close()
    val preDf = pre.toSeq.toDF("c_mktsegment", "n_pre")
    val audit = masterBack
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        round(sum("c_acctbal"), 2).as("total_acctbal"))
      .join(broadcast(preDf), Seq("c_mktsegment"), "left")
      .select(col("c_mktsegment"), col("n_customers"), col("total_acctbal"),
        (coalesce(col("n_pre"), lit(0L)) - col("n_customers")).as("n_erased"))
      .orderBy("c_mktsegment")
    spark.createDataFrame(
      spark.sparkContext.parallelize(audit.collect().toSeq, 1), audit.schema)
  }

  /** Embedded-Derby connection contract shared by etl24/etl25: one DB
    * per (tmpdir, dir), lock/log files kept out of the working
    * directory.
    */
  private def derbyConnection(dir: String): (String, java.util.Properties) = {
    val suffix = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val home = s"${System.getProperty("java.io.tmpdir")}/graft_derby"
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home", home)
    // Spark passes the driver via properties; the raw DriverManager
    // path (etl25's MERGE statement) needs the class registered.
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    (s"jdbc:derby:$home/db_$suffix;create=true", props)
  }

  /** etl26: partition BACKFILL via DYNAMIC partition overwrite — the
    * incremental-correction pattern a partitioned warehouse table
    * lives by: a recomputed day's rows replace ONLY that day's
    * partition, while every other partition's files are untouched.
    * Spark's default (static) overwrite would TRUNCATE the whole
    * table first; `partitionOverwriteMode=dynamic` scopes the
    * overwrite to exactly the partitions present in the written
    * batch — the spec pins both sides (non-target files byte-
    * identical, target files rewritten).
    *
    * Shape: the events table lands partitioned by event_date
    * (build-once per source fingerprint), then the earliest day is
    * "corrected" (values doubled) and backfilled. The corrected batch
    * is recomputed from the SOURCE each call, so repeated backfills
    * land identical rows — idempotent, like every sink here. The
    * oracle checks the WHOLE pipeline (partitioned write → dynamic
    * overwrite → read-back → aggregate) against direct arithmetic on
    * the source. At 100 TB this is the nightly-restatement shape: the
    * backfill job writes one day's partition; a static overwrite
    * would rewrite the table. Same-dir concurrent callers race the
    * overwrite (the etl17/etl21 self-race caveat); different dirs use
    * different roots.
    */
  def etl26Backfill(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_etl26_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val ev = events(spark, dir)
      .select(to_date(col("ts")).as("event_date"), col("value"))
    TableBuild.ensurePath(spark, out,
        TableBuild.dirFingerprint(spark, s"$dir/events.parquet")) {
      ev.write.mode("overwrite").partitionBy("event_date").parquet(out)
    }
    // O(1) scalar bound (the driver-collect contract): the day being
    // restated.
    val target = ev.agg(min("event_date")).collect()(0).getDate(0)
    ev.filter(col("event_date") === lit(target))
      .withColumn("value", col("value") * 2)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_date").parquet(out)
    spark.read.parquet(out)
      .groupBy("event_date")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .orderBy("event_date")
  }

  /** etl28's protocol constant — SHARED with the generated oracle in
    * [[graft.SparkEntry]] (the etl27/text17 discipline): the maximum
    * edit distance for a candidate link. The length-band pre-filter is
    * DERIVED from it (|len(a)-len(b)| <= MaxDist is implied by
    * levenshtein(a,b) <= MaxDist, so the band is a sound cheap reject,
    * never a semantic knob of its own).
    */
  val Etl28MaxDist = 3

  /** etl28: fuzzy record linkage (MDM-style duplicate-listing
    * detection) over the part-name domain — blocked edit-distance
    * candidate pairs with occurrence counts, the human-review queue a
    * master-data pipeline feeds.
    *
    * Reference: case_2/Normal.py's reconciliation joins match on exact
    * keys only; this is the fuzzy sibling for dirty dimensions.
    *
    * Scale design — link the KEY DOMAIN, not the rows: one map-side-
    * combined aggregate collapses the fact table to its distinct-name
    * vocabulary (names <<< rows at 100 TB; here 64 names carry 20k
    * parts at sf0.1, and a real catalog behaves the same way), so the
    * quadratic step runs on the vocabulary, not the corpus. Within the
    * vocabulary, a self-join BLOCKED on the name's head noun (the
    * classic record-linkage blocking key — an equi-join, never a
    * cartesian product) plus the derived length band prunes the pair
    * space before the levenshtein kernel runs. Blocking is a RECALL
    * trade-off, not a lossless prune — cross-noun matches at the
    * distance boundary are consciously forgone (the spec measures the
    * sacrifice rather than assuming it away); the band, by contrast,
    * IS lossless (|len(a)-len(b)| <= d is implied by edit distance
    * <= d). The tiny build side is
    * explicitly broadcast so the probe never shuffles, and the
    * vocabulary frame is PINNED (GraftCache, once per session/dir) so
    * the self-join's two legs read the cached 64-row frame instead of
    * compiling two independent fact scans. If the vocabulary ever
    * outgrew broadcast range, dropping the hint yields a
    * blk-partitioned shuffle join of two vocabulary-sized frames —
    * the plan degrades gracefully, and the fact table is still
    * scanned once.
    */
  /** etl28's vocabulary frame (p_name, blk, cnt) — the ONE fact scan.
    * Pinned via GraftCache because a self-join of an uncached
    * aggregate compiles to TWO independent scan+aggregate subtrees
    * (the broadcast side's exchange differs from the probe side's, so
    * ReuseExchange never fires) — at 100 TB that is the fact table
    * scanned twice for one vocabulary. Exposed `private[graft]` so
    * the plan audit can pin its p_name-only scan separately from the
    * join plan (the etl22 clusteredOrdersPath precedent).
    */
  private[graft] def etl28Names(spark: SparkSession, dir: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"etl.fuzzyNames:$dir:${graft.GraftCache.sessionTag(spark)}") {
      nameVocabulary(part(spark, dir))
    }

  /** The key-domain collapse over any frame carrying `p_name` — ONE
    * definition of the vocabulary aggregation + blocking key, shared
    * by etl28's pinned frame and the GrowthProbe's synthetic decades.
    */
  private[graft] def nameVocabulary(parts: DataFrame): DataFrame =
    parts
      .groupBy(col("p_name"),
        element_at(split(col("p_name"), " "), -1).as("blk"))
      .agg(count(lit(1)).as("cnt"))

  def etl28FuzzyLink(spark: SparkSession, dir: String): DataFrame =
    fuzzyBlockedLinks(etl28Names(spark, dir))
      .orderBy("name_a", "name_b")

  /** The blocked candidate self-join over any (p_name, blk, cnt)
    * vocabulary frame — separable so the GrowthProbe measures etl28's
    * pair space through the operator's OWN join (never a parallel
    * reimplementation). `bandOnly` stops after the lossless length
    * band (no levenshtein), which is the candidate count the kernel
    * actually runs on — the number whose growth the blocking key must
    * keep sub-quadratic.
    */
  private[graft] def fuzzyBlockedLinks(
      names: DataFrame, bandOnly: Boolean = false): DataFrame = {
    val a = names.select(col("blk"), col("p_name").as("name_a"),
      col("cnt").as("cnt_a"))
    val b = names.select(col("blk").as("blk_b"), col("p_name").as("name_b"),
      col("cnt").as("cnt_b"))
    val banded = a.join(broadcast(b),
        col("blk") === col("blk_b") && col("name_a") < col("name_b"))
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= Etl28MaxDist)
    val linked =
      if (bandOnly) banded
      else banded.filter(
        levenshtein(col("name_a"), col("name_b")) <= Etl28MaxDist)
    linked.select(col("blk"), col("name_a"), col("name_b"),
      levenshtein(col("name_a"), col("name_b")).as("dist"),
      col("cnt_a"), col("cnt_b"))
  }

  /** stream16's decision core, separable so the spec can replay it in
    * batch: each arriving catalog record (arrival_id, p_name) is
    * decided against the PINNED name vocabulary ([[etl28Names]] — the
    * corpus index IS the state, refreshed on the batch cadence) through
    * the SAME block + band + edit-distance rule etl28 applies
    * within-corpus. Verdicts follow dedup11's exact/near/admit shape:
    * `exact` (the arrival's name already exists), `near` (one row PER
    * candidate within [[Etl28MaxDist]] edits — the full review queue,
    * not just the best match), `admit` (no candidate; match columns
    * null). Decisions depend only on the arrival's own name and the
    * pinned vocabulary ⇒ per-arrival independent ⇒ re-batching
    * invariant (spec-pinned).
    */
  private[graft] def etl28IngestCandidates(
      spark: SparkSession, dir: String, arrivals: DataFrame): DataFrame = {
    val vocab = etl28Names(spark, dir)
      .select(col("blk").as("m_blk"), col("p_name").as("match_name"),
        col("cnt").as("match_cnt"))
    arrivals
      .withColumn("blk", element_at(split(col("p_name"), " "), -1))
      .join(broadcast(vocab),
        col("blk") === col("m_blk")
          && abs(length(col("p_name")) - length(col("match_name"))) <= Etl28MaxDist
          && levenshtein(col("p_name"), col("match_name")) <= Etl28MaxDist,
        "left_outer")
      .select(
        col("arrival_id"), col("p_name"),
        when(col("match_name").isNull, lit("admit"))
          .when(col("match_name") === col("p_name"), lit("exact"))
          .otherwise(lit("near")).as("verdict"),
        col("match_name"),
        when(col("match_name").isNotNull,
          levenshtein(col("p_name"), col("match_name"))).as("dist"),
        col("match_cnt"))
  }

  /** Builds (once per (session, dir)) and returns the range-clustered
    * orders layout — separated so the spec can audit file locality on
    * the same directory etl22 reads.
    */
  private[graft] def clusteredOrdersPath(spark: SparkSession, dir: String): String = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_etl22_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    // Stamped with the SOURCE's metadata fingerprint (a regenerated
    // orders.parquet rebuilds the layout instead of serving last
    // run's) AND the layout constant (round-19 ADVICE: the tmpdir copy
    // persists across JVM runs, so a retuned ClusterFiles must rebuild
    // rather than silently serve the old file count).
    TableBuild.ensurePath(spark, out,
        s"cf=$ClusterFiles:" +
          TableBuild.dirFingerprint(spark, s"$dir/orders.parquet")) {
      orders(spark, dir)
        .repartitionByRange(ClusterFiles, col("o_orderdate"))
        .sortWithinPartitions(col("o_orderdate"))
        .write.mode("overwrite").parquet(out)
    }
    out
  }

  /** Morton (Z-order) bit spread: the low 16 bits of `c` spaced out to
    * even bit positions (bit i → bit 2i) via the classic mask ladder —
    * five codegen'd integer ops, no UDF. Interleaving two spread
    * values (one shifted left by 1) gives the Z-value whose range
    * ordering preserves LOCALITY IN BOTH dimensions: nearby (x, y)
    * points share high Z bits, so a range-clustered write on Z packs
    * 2-D rectangles into files. 16 bits per dimension covers the graft
    * corpus at every shipped SF (dates span <2¹² days, custkeys
    * <2¹⁶); a production build widens the masks (or buckets the raw
    * values first) to the dimensions' true cardinality — the ladder
    * grammar itself is scale-free.
    */
  private[graft] def zSpread16(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val masked = c.bitwiseAND(lit(0xFFFFL))
    val s8 = (masked.bitwiseOR(shiftleft(masked, 8)))
      .bitwiseAND(lit(0x00FF00FFL))
    val s4 = (s8.bitwiseOR(shiftleft(s8, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s2 = (s4.bitwiseOR(shiftleft(s4, 2))).bitwiseAND(lit(0x33333333L))
    (s2.bitwiseOR(shiftleft(s2, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Min/max scale a dimension onto the FULL 16-bit domain before
    * interleaving — exact integer arithmetic (IntegralDivide, the
    * intDiv contract, replayable digit-for-digit in any engine). This
    * is what makes the interleave MEANINGFUL regardless of the raw
    * cardinalities: without it a dimension with fewer significant
    * bits (custkey spans 8 bits at small SF, dates 12) contributes
    * nothing to the high Z bits, the range partitioner splits on the
    * wide dimension alone, and the narrow axis gets zero file
    * locality — measured, not hypothetical (the unscaled first cut of
    * this operator pruned no files on the custkey axis).
    */
  private[graft] def zScale16(c: org.apache.spark.sql.Column,
      lo: Long, hi: Long): org.apache.spark.sql.Column =
    graft.functions.GraftFunctions.intDiv(
      (c.cast("long") - lit(lo)) * lit(65535L),
      lit(math.max(1L, hi - lo)))

  /** The etl32 clustering key: o_orderdate (days since the corpus
    * epoch) and o_custkey, each min/max scaled to 16 bits, bits
    * interleaved (custkey on the odd positions).
    */
  private[graft] def zOrderKey(days: org.apache.spark.sql.Column,
      dLo: Long, dHi: Long, custkey: org.apache.spark.sql.Column,
      cLo: Long, cHi: Long): org.apache.spark.sql.Column =
    zSpread16(zScale16(days, dLo, dHi))
      .bitwiseOR(shiftleft(zSpread16(zScale16(custkey, cLo, cHi)), 1))

  /** etl32's file-count knob, deliberately above etl22's 8: the Z
    * trade spends partition-boundary bits on BOTH axes (16 files = 4
    * quantile bits ≈ 2 per dimension), so each axis prunes to a
    * subset rather than etl22's single-axis handful. At 100 TB the
    * same knob is file size (etl21's 128 MB target), not a count.
    */
  val ZOrderFiles = 16

  /** Version token of the Z-KEY ARITHMETIC itself ([[zSpread16]] /
    * [[zScale16]] / [[zOrderKey]]), folded into every stamp that
    * persists a layout built from it (etl32's orders copy AND the
    * GrowthProbe's synthetic decades). The plan fingerprint beside it
    * catches structural changes but is literal-blind BY DESIGN
    * (PlanFingerprint hashes expression class names only — round-20
    * review), so a literal-only retune (the 65535 scale constant, a
    * Morton mask value) must bump THIS token or stale layouts survive
    * across JVM runs.
    */
  val ZKeyArithVersion = 1

  /** etl32's Z-ordered orders layout (etl22's ensurePath discipline,
    * source-fingerprint stamped). The written copy carries the z_key
    * column so the spec can audit the interleave arithmetic straight
    * off the files. The per-dimension bounds are two driver scalars
    * off one tiny source aggregate (the cur07/etl24 threshold
    * contract), computed only on build.
    */
  private[graft] def zOrderedOrdersPath(spark: SparkSession, dir: String): String = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_etl32_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    // The stamp folds the source fingerprint AND the layout's plan:
    // the z_key arithmetic's structural fingerprint (literal-invariant,
    // so the build-only min/max bounds don't rotate it — placeholder
    // bounds suffice; a literal-only retune of the arithmetic bumps
    // [[ZKeyArithVersion]] instead) plus the constants the fingerprint
    // is blind to (file count, epoch). Round-19 ADVICE: the tmpdir
    // copy persists across JVM runs, so a changed layout must rebuild
    // rather than silently serve one built by an older binary
    // (payloadShardEmit's discipline).
    val keyPlanFp = graft.PlanFingerprint.of(
      orders(spark, dir)
        .withColumn("z_days",
          datediff(col("o_orderdate"), lit("1992-01-01")).cast("long"))
        .withColumn("z_key",
          zOrderKey(col("z_days"), 0L, 1L, col("o_custkey"), 0L, 1L))
        .drop("z_days"))
    TableBuild.ensurePath(spark, out,
        s"zk=$keyPlanFp:zv=$ZKeyArithVersion:zf=$ZOrderFiles:" +
          "epoch=1992-01-01:" +
          TableBuild.dirFingerprint(spark, s"$dir/orders.parquet")) {
      val src = orders(spark, dir).withColumn("z_days",
        datediff(col("o_orderdate"), lit("1992-01-01")).cast("long"))
      val b = src.agg(min("z_days"), max("z_days"),
        min("o_custkey"), max("o_custkey")).collect()(0)
      src
        .withColumn("z_key", zOrderKey(col("z_days"), b.getLong(0),
          b.getLong(1), col("o_custkey"), b.getLong(2), b.getLong(3)))
        .drop("z_days")
        .repartitionByRange(ZOrderFiles, col("z_key"))
        .sortWithinPartitions(col("z_key"))
        .write.mode("overwrite").parquet(out)
    }
    out
  }

  /** etl32: MULTI-DIMENSIONAL (Z-order) clustered layout — the 2-D
    * completion of the layout family (etl10 partitions on one column,
    * etl13 hash-buckets one key, etl22 range-clusters one axis; this
    * clusters on TWO): real lake maintenance must serve BOTH
    * `o_orderdate` range scans and `o_custkey` point/range lookups
    * from one physical copy, and a 1-D sort can only localize one of
    * them — etl22's date-clustered files scatter any custkey
    * predicate across ALL files (the spec measures that contrast).
    * The Z-value ([[zOrderKey]]: the two dimensions' bits interleaved
    * via the Morton mask ladder) linearizes the 2-D space so a range-
    * clustered write packs axis-aligned rectangles into files, and a
    * narrow predicate on EITHER axis prunes to a file subset — the
    * Z-order/liquid-clustering idea in its canonical form (Morton
    * 1966; the same layout Delta's OPTIMIZE ZORDER BY materializes).
    * At 100 TB this is the difference between "time-windowed scans
    * are cheap but per-customer audits scan the lake" and both being
    * proportional to selectivity; the trade is Z-order's: each axis
    * prunes to ~√files rather than etl22's single-axis handful.
    *
    * The returned aggregate proves the Z-ordered copy LOSSLESS under
    * a two-axis predicate (the oracle computes it straight off the
    * source table — an oracle can only see content, etl22's split);
    * the two-axis file-locality claim and the interleave arithmetic
    * are spec-asserted via `_metadata.file_path` over the emitted
    * files.
    */
  def etl32ZorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val out = zOrderedOrdersPath(spark, dir)
    spark.read.parquet(out)
      .filter(col("o_orderdate").between("1995-01-01", "1995-12-31") &&
        col("o_custkey").between(100L, 800L))
      .groupBy(month(col("o_orderdate")).as("o_month"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_month")
  }
}

package graft.operators

import graft.SparkSpec
import graft.functions.GraftFunctions.saltedJoin
import graft.sources.Tables
import org.apache.spark.sql.functions._

class ScaleToolsSpec extends SparkSpec {

  test("q30 sketches stay within error bounds of their exact twins") {
    val rows = Relational.approxStatsRaw(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approxD = r.getLong(r.fieldIndex("approx_customers")).toDouble
      val exactD = r.getLong(r.fieldIndex("exact_customers")).toDouble
      assert(math.abs(approxD - exactD) / exactD <= 0.05,
        s"HLL++ distinct off by >5%: $approxD vs $exactD")
      val approxM = r.getDouble(r.fieldIndex("approx_median"))
      val exactM = r.getDouble(r.fieldIndex("exact_median"))
      assert(math.abs(approxM - exactM) / exactM <= 0.05,
        s"quantile sketch off by >5%: $approxM vs $exactM")
    }
    // The oracled entry's banded flags must all be 1 (the literal the
    // DuckDB twin claims) — this is what makes q30 hash-checkable.
    val banded = Relational.q30ApproxStats(spark, sf).collect()
    assert(banded.nonEmpty)
    banded.foreach { r =>
      assert(r.getInt(r.fieldIndex("cust_in_band")) == 1)
      assert(r.getInt(r.fieldIndex("median_in_band")) == 1)
    }
  }

  test("q34 recursive CTE: depth and root follow the digit-derived hierarchy") {
    val rows = Relational.q34RecursiveCte(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty)
    // Construction law: parent(k) = floor(k/10), so a key's depth is
    // its digit count minus one and its root is its leading digit.
    rows.foreach { case (k, root, depth) =>
      val digits = k.toString
      assert(depth == digits.length - 1, s"key $k depth")
      assert(root == digits.head.asDigit.toLong, s"key $k root")
    }
    // Every anchored customer appears exactly once (it is a forest).
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("etl24 JDBC round-trip: lossless content, key-partitioned read") {
    val back = Etl.jdbcMasterReadback(spark, sf)
    assert(back.rdd.getNumPartitions == 4,
      "the master-table read must split on the key bounds")
    val got = back.collect().map(_.toSeq).toSet
    val src = Tables.customer(spark, sf)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .collect().map(_.toSeq).toSet
    assert(got == src, "every row must survive the JDBC write+read unchanged")
  }

  test("etl25 Derby MERGE equals the declarative upsert replay") {
    val got = Etl.etl25JdbcMerge(spark, sf).collect().map(_.toSeq).toSeq
    val src = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
    val m0 = src.filter(col("c_custkey") % 3 =!= 0)
    val u = src.filter(col("c_custkey") % 2 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 100.0)
    val merged = u.unionByName(
      m0.join(u.select("c_custkey"), Seq("c_custkey"), "left_anti"))
    val expected = merged.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        round(sum("c_acctbal"), 2).as("total_acctbal"))
      .orderBy("c_mktsegment").collect().map(_.toSeq).toSeq
    assert(got == expected,
      "the database-side MERGE must apply exactly the upsert semantics")
  }

  test("etl31 JDBC erasure: erased keys gone, gated replay a no-op, UNGATED replay resurrects (the threat is real)") {
    val rows = Etl.etl31JdbcErasure(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) > 0L),
      "the fixture's ~25% erase rate must hit every segment at spec sf")
    // Read the final master straight from Derby: zero erased keys.
    val suffix = sf.replaceAll("[^a-zA-Z0-9]", "_")
    val home = s"${System.getProperty("java.io.tmpdir")}/graft_derby"
    val url = s"jdbc:derby:$home/db_$suffix"
    def masterKeys(): Set[Long] = {
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery("""SELECT "c_custkey" FROM g_erase_master""")
          val b = Set.newBuilder[Long]
          while (rs.next()) b += rs.getLong(1)
          b.result()
        } finally st.close()
      } finally conn.close()
    }
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def erased(k: Long) = md5hex("erase:" + k).take(2) < Etl.Etl29EraseHexThr
    val post = masterKeys()
    assert(post.nonEmpty && !post.exists(erased),
      "an erased key survived the DELETE or leaked through the gated replay")
    // THREAT arm: re-stage the FULL batch (the reference's restart path
    // with no suppression gate) and replay the MERGE ungated — the
    // erased staged keys resurrect, which is exactly what the gate
    // exists to stop.
    val src = Tables.customer(spark, sf)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    src.filter(col("c_custkey") % 2 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 100.0)
      .write.mode("overwrite").jdbc(url, "g_erase_staging", props)
    val q = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment").map(c => s""""$c"""")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(
        s"""MERGE INTO g_erase_master m USING g_erase_staging s
            ON m."c_custkey" = s."c_custkey"
            WHEN MATCHED THEN UPDATE SET "c_acctbal" = s."c_acctbal"
            WHEN NOT MATCHED THEN INSERT (${q.mkString(", ")})
              VALUES (${q.map(c => s"s.$c").mkString(", ")})""")
      finally st.close()
    } finally conn.close()
    val resurrected = masterKeys().filter(erased)
    assert(resurrected.nonEmpty,
      "the ungated replay must resurrect erased staged keys — otherwise " +
        "the suppression gate guards against nothing")
    // Re-running the operator converges back to the erased state
    // (overwrite-everything entry), so later runs are unaffected.
    assert(!Etl.etl31JdbcErasure(spark, sf).collect().isEmpty)
    assert(!masterKeys().exists(erased))
  }

  test("etl22 layout rebuilds when the source data is regenerated in place") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // A private source dir we can regenerate: the _SUCCESS-marker guard
    // alone would happily serve the FIRST layout forever; the stamp
    // (source metadata fingerprint) must force the rebuild.
    val src = Files.createTempDirectory("graft_stamp_src").toString
    def install(from: String): Unit =
      Files.copy(Paths.get(s"$from/orders.parquet"),
        Paths.get(s"$src/orders.parquet"), StandardCopyOption.REPLACE_EXISTING)
    def total(): Long = Etl.etl22ClusteredLayout(spark, src)
      .agg(sum("n_orders")).collect()(0).getLong(0)
    install("/root/testdata/sf0.001")
    val n1 = total()
    install("/root/testdata/sf0.01") // "regenerated" source, same path
    val n2 = total()
    val expected = graft.sources.Tables.orders(spark, "/root/testdata/sf0.01")
      .filter(col("o_orderdate").between("1995-01-01", "1995-12-31")).count()
    assert(n1 != n2, "layout must not be served stale after the source changed")
    assert(n2 == expected, "rebuilt layout must reflect the new source")
  }

  test("etl26 backfill rewrites ONLY the target partition and corrects it") {
    def listing(root: String): Map[String, Set[String]] = {
      val d = new java.io.File(root)
      d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("event_date="))
        .map(p => p.getName ->
          p.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet)
        .toMap
    }
    val got = Etl.etl26Backfill(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2)))
    // Driver replay: per-day counts/sums off the source, earliest day
    // doubled (value*2 is exact; sum order matches Spark's own agg so
    // compare at the op's 2-dp presentation).
    val src = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("d"), col("value")).collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1)))
    val minDay = src.map(_._1).min
    val expected = src.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, rows) =>
      val mult = if (d == minDay) 2.0 else 1.0
      (d, rows.length.toLong, rows.map(_._2 * mult).sum)
    }
    assert(got.map(t => (t._1, t._2)).toSeq == expected.map(t => (t._1, t._2)),
      "per-day row counts diverge from the corrected source")
    // The op presents round(sum, 2); the replay sums in a different
    // order, so compare the rounded value to the raw replay within
    // half a cent instead of demanding bit equality (the DuckDB oracle
    // is the exact gate).
    got.zip(expected).foreach { case ((d, _, g), (_, _, e)) =>
      assert(math.abs(g - e) <= 0.006, s"day $d total $g != $e")
    }
    // Dynamic-ness: a second backfill must rewrite the target
    // partition's files and leave every other partition's files
    // byte-identical (same names — static overwrite would truncate
    // and rewrite them all).
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_etl26_${sf.replaceAll("[^a-zA-Z0-9]", "_")}"
    val before = listing(out)
    Etl.etl26Backfill(spark, sf).collect()
    val after = listing(out)
    val targetDir = s"event_date=$minDay"
    assert(before.keySet == after.keySet, "partition set must be stable")
    assert(before(targetDir) != after(targetDir),
      "the backfilled partition must be rewritten")
    (before.keySet - targetDir).foreach { p =>
      assert(before(p) == after(p), s"untouched partition $p was rewritten")
    }
  }

  test("etl21 compaction collapses the file count and preserves content") {
    import org.apache.spark.sql.functions._
    val out = Etl.etl21Compaction(spark, sf).collect().map(_.toSeq).toSeq
    val direct = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), round(col("value"), 2).as("value"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct("user_id").as("n_users"),
        round(sum("value"), 2).as("total_value"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(out == direct, "compacted aggregate must equal the source aggregate")
    // The oracle can only see content; the file-count collapse — the
    // point of the operator — is pinned here.
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_etl21_${sf.replaceAll("[^a-zA-Z0-9]", "_")}"
    def parts(p: String): Int =
      new java.io.File(p).listFiles().count(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts(s"$base/fragmented") == 64, "staging must fragment into 64 files")
    assert(parts(s"$base/compacted") <= 2,
      "compaction must collapse to ceil(bytes/target) files")
  }

  test("etl22 clustered layout: lossless content, date-local files") {
    val out = Etl.etl22ClusteredLayout(spark, sf).collect().map(_.toSeq).toSeq
    val direct = Tables.orders(spark, sf)
      .filter(col("o_orderdate").between("1995-01-01", "1995-12-31"))
      .groupBy(month(col("o_orderdate")).as("o_month"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_month").collect().map(_.toSeq).toSeq
    assert(out == direct, "clustered aggregate must equal the source aggregate")
    // The point of the layout — a year of data lives in a bounded
    // handful of files, not scattered across all of them — is only
    // visible here (the oracle sees content, not placement).
    val path = Etl.clusteredOrdersPath(spark, sf)
    def files(pred: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Long =
      pred(spark.read.parquet(path))
        .select(col("_metadata.file_path")).distinct().count()
    val all = files(identity)
    val touched = files(_.filter(
      col("o_orderdate").between("1995-01-01", "1995-12-31")))
    assert(all >= 4, s"range layout must spread across files, got $all")
    // ~7 years over ClusterFiles range partitions: one year spans at
    // most 2 boundaries even with sampling jitter.
    assert(touched <= 3 && touched < all,
      s"a one-year predicate must touch a file subset: $touched of $all")
  }

  test("etl32 Z-order layout: lossless, BOTH axes prune files, interleave arithmetic exact, 1-D contrast real") {
    val out = Etl.etl32ZorderLayout(spark, sf).collect().map(_.toSeq).toSeq
    val direct = Tables.orders(spark, sf)
      .filter(col("o_orderdate").between("1995-01-01", "1995-12-31") &&
        col("o_custkey").between(100L, 800L))
      .groupBy(month(col("o_orderdate")).as("o_month"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_month").collect().map(_.toSeq).toSeq
    assert(out == direct, "Z-ordered aggregate must equal the source aggregate")
    // Full losslessness, not just the sliced view: same rows, same
    // count, straight off the files.
    val path = Etl.zOrderedOrdersPath(spark, sf)
    val srcN = Tables.orders(spark, sf).count()
    assert(spark.read.parquet(path).count() == srcN)
    // INTERLEAVE ARITHMETIC: the emitted z_key equals a JVM Morton
    // interleave of the min/max-SCALED (days since 1992-01-01,
    // custkey) pair, row for row — scaling replayed in the same exact
    // Long arithmetic (IntegralDivide's contract).
    def spread(x: Long): Long = {
      var v = x & 0xFFFFL
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      (v | (v << 1)) & 0x55555555L
    }
    val epoch = java.time.LocalDate.parse("1992-01-01")
    def toDays(v: Any): Long = {
      // o_orderdate's physical flavor drifted across driver testdata
      // generations (DATE vs timestamp NTZ) — accept either.
      val local = v match {
        case d: java.sql.Date => d.toLocalDate
        case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
        case t: java.time.LocalDateTime => t.toLocalDate
        case x => fail(s"unexpected o_orderdate type: ${x.getClass}")
      }
      java.time.temporal.ChronoUnit.DAYS.between(epoch, local)
    }
    val sample = spark.read.parquet(path)
      .select("o_orderdate", "o_custkey", "z_key").collect()
    val allDays = sample.map(r => toDays(r.get(0)))
    val allCk = sample.map(_.getLong(1))
    def scale(x: Long, lo: Long, hi: Long): Long =
      (x - lo) * 65535L / math.max(1L, hi - lo)
    sample.foreach { r =>
      val d = scale(toDays(r.get(0)), allDays.min, allDays.max)
      val c = scale(r.getLong(1), allCk.min, allCk.max)
      val expect = spread(d) | (spread(c) << 1)
      assert(r.getLong(2) == expect,
        s"z_key mismatch at (${r.get(0)}, ${r.getLong(1)})")
    }
    // TWO-AXIS LOCALITY — the operator's whole point: a narrow slice
    // on EITHER dimension touches a strict file subset of the
    // Z-ordered copy.
    def files(path: String)(
        pred: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Long =
      pred(spark.read.parquet(path))
        .select(col("_metadata.file_path")).distinct().count()
    val all = files(path)(identity)
    assert(all >= 4, s"layout must spread across files, got $all")
    val dateSlice = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("o_orderdate").between("1995-01-01", "1995-12-31"))
    val custSlice = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("o_custkey").between(100L, 800L))
    val dateTouched = files(path)(dateSlice)
    val custTouched = files(path)(custSlice)
    assert(dateTouched < all,
      s"a one-year date slice must prune files: $dateTouched of $all")
    assert(custTouched < all,
      s"a custkey slice must prune files: $custTouched of $all")
    // THE 1-D CONTRAST (why etl22 alone is not enough): on etl22's
    // date-clustered copy the SAME custkey slice scatters across every
    // file — a second query axis gets zero locality from a 1-D sort.
    val etl22Path = Etl.clusteredOrdersPath(spark, sf)
    val etl22All = files(etl22Path)(identity)
    val etl22Cust = files(etl22Path)(custSlice)
    assert(etl22Cust == etl22All,
      s"fixture drift: the custkey slice should scatter over the 1-D " +
        s"layout ($etl22Cust of $etl22All) — the Z-order trade is then real")
  }

  test("etl23 snapshot diff equals a direct two-reduction comparison") {
    val got = Etl.etl23SnapshotDiff(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSeq
    // Direct reductions over the same CDC log, bypassing the sink.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(col("seq").desc)
    def reduce(log: org.apache.spark.sql.DataFrame): Map[Long, Double] = log
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val log = Etl.cdcLog(spark, sf)
    val s1 = reduce(log.filter(col("seq") % 2 === 0))
    val s2 = reduce(log)
    val expected = (s1.keySet ++ s2.keySet).toSeq.sorted.map { k =>
      val (o, n) = (s1.get(k), s2.get(k))
      val status =
        if (o.isEmpty) "added"
        else if (n.isEmpty) "removed"
        else if (o != n) "changed" else "unchanged"
      (k, status, o, n)
    }
    assert(got == expected)
    // The time-travel surface itself: two committed immutable versions.
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_etl23_${sf.replaceAll("[^a-zA-Z0-9]", "_")}"
    assert(graft.sources.MergeSink.versions(spark, base).size == 2)
  }

  test("growth-probe generators: near-dups are real edits inside their radius") {
    // synthText (generator v2): every injected near-dup must DIFFER
    // from its base (the round-11 ADVICE fix — a substitution drawing
    // the original token made a silent exact copy) while staying a
    // 1-2 token edit; exact-copy ids must match their base exactly.
    val vocab = (0 until 31).map(i => s"w$i").toArray
    (100L until 2000L).foreach { id =>
      val t = GrowthProbe.synthText(id, vocab)
      if (id >= 625 && id % 625 == 624)
        assert(t == GrowthProbe.synthText(id - 624, vocab), s"exact copy $id")
      else if (id % 100 >= 96) {
        val base = GrowthProbe.synthText(id - (id % 100) + (id % 4), vocab)
        assert(t != base, s"near-dup $id degenerated to an exact copy")
        val (bt, tt) = (base.split(" "), t.split(" "))
        assert(bt.length == tt.length)
        val edits = bt.zip(tt).count { case (a, b) => a != b }
        assert(edits >= 1 && edits <= 2, s"near-dup $id made $edits edits")
      }
    }
    // synthPhash: near-dup ids land within mm07's radius of their base
    // but never ON it; exact-copy ids equal it; determinism holds.
    (100L until 2000L).foreach { id =>
      val h = GrowthProbe.synthPhash(id)
      assert(h == GrowthProbe.synthPhash(id), s"non-deterministic $id")
      if (id >= 625 && id % 625 == 624)
        assert(h == GrowthProbe.synthPhash(id - 624))
      else if (id % 100 >= 96) {
        val base = GrowthProbe.synthPhash(id - (id % 100) + (id % 4))
        val d = java.lang.Long.bitCount(h ^ base)
        assert(d >= 1 && d <= 4, s"id $id: hamming $d outside (0, 4]")
      }
    }
  }

  test("etl28 fuzzy link equals an exhaustive DP-levenshtein ground truth") {
    // Independent oracle: a classic two-row DP edit distance (written
    // here, not Spark's) over ALL distinct-name pairs — no blocking,
    // no length band. The length band is a LOSSLESS prune (implied by
    // the metric); blocking is NOT — it is record linkage's standard
    // recall/cost trade-off, and this test MEASURES what it sacrifices
    // instead of hand-waving it: the expected set is the exhaustive
    // same-noun matches, and the cross-noun matches blocking forgoes
    // (e.g. "blue ring"/"blue rod" — different entity nouns, arguably
    // not duplicates at all) are counted and pinned non-exploding.
    def lev(a: String, b: String): Int = {
      var prev = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        val cur = new Array[Int](b.length + 1)
        cur(0) = i
        for (j <- 1 to b.length)
          cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
            prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
      prev(b.length)
    }
    val byName = Tables.part(spark, sf).groupBy("p_name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocab = byName.keys.toSeq.sorted
    def noun(n: String) = n.substring(n.lastIndexOf(' ') + 1)
    val allWithin = for {
      i <- vocab.indices; j <- (i + 1) until vocab.size
      (na, nb) = (vocab(i), vocab(j))
      d = lev(na, nb) if d <= Etl.Etl28MaxDist
    } yield (na, nb, d, byName(na), byName(nb))
    val (sameBlock, crossBlock) =
      allWithin.partition { case (na, nb, _, _, _) => noun(na) == noun(nb) }
    val expected = sameBlock.toSet
    // The sacrifice stays a sliver of the match space (here: boundary
    // dist-3 pairs between short nouns like ring/rod); a vocabulary
    // where this exploded would be telling us the blocking key is
    // wrong, not that blocking is.
    assert(crossBlock.size < expected.size,
      s"blocking forgoes ${crossBlock.size} of ${allWithin.size} matches")
    val got = Etl.etl28FuzzyLink(spark, sf).collect().map { r =>
      // Block agreement: both names end in the block's noun.
      val blk = r.getString(r.fieldIndex("blk"))
      val (na, nb) = (r.getString(r.fieldIndex("name_a")),
        r.getString(r.fieldIndex("name_b")))
      assert(na.endsWith(" " + blk) && nb.endsWith(" " + blk))
      (na, nb, r.getInt(r.fieldIndex("dist")),
        r.getLong(r.fieldIndex("cnt_a")), r.getLong(r.fieldIndex("cnt_b")))
    }.toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // Links are strictly fuzzy (exact dups are dedup01's job, and
    // name_a < name_b already excludes the trivial self-pair).
    got.foreach { case (_, _, d, _, _) => assert(d >= 1) }
  }

  test("saltedJoin returns exactly the plain equi-join result") {
    val fact = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val dim = Tables.customer(spark, sf).select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = fact.join(dim, Seq("o_custkey"))
      .select("o_orderkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = saltedJoin(fact, dim, key = "o_custkey",
        discriminator = "o_orderkey", salt = 8)
      .select("o_orderkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }
}

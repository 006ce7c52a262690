package graft.operators

import graft.SparkSpec
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("text14 gopher rules: values consistent, pass flag matches its parts") {
    val rows = TextAnalysis.text14GopherRules(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getInt(1); val ml = r.getDouble(2); val af = r.getDouble(3)
      val sh = r.getInt(4); val passes = r.getInt(5)
      assert(af >= 0.0 && af <= 1.0)
      assert(sh <= n)
      val expect = n >= 15 && n <= 5000 && ml >= 3.0 && ml <= 10.0 &&
        af >= 0.8 && sh >= 2
      // The flag is computed from the UNROUNDED values; at the reported
      // 4-dp precision the recomputation can only disagree within the
      // rounding slack of the two real-valued bounds.
      if (passes == 1) assert(ml >= 2.9999 && af >= 0.7999, s"row $r")
      else if (expect) assert(ml <= 3.0001 || ml >= 9.9999 || af <= 0.8001,
        s"row $r flagged fail but parts pass")
    }
    assert(rows.exists(_.getInt(5) == 1), "some docs must pass the gate")
  }

  test("text13 bigram surprisal matches a local replay on a known corpus") {
    val spark2 = spark
    import spark2.implicits._
    // "a b" appears twice after "a" (p(b|a)=2/3), "a c" once (1/3);
    // doc 4 has one token -> no bigrams -> absent; doc 5 is a distinct
    // chain of singleton transitions (every p(t|p)=1 -> surprisal 0).
    val docs = Seq(
      (1L, "a b a c"), (2L, "a b"), (3L, "x y x y"),
      (4L, "solo"), (5L, "p q r")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramSurprisalStats(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // Local replay of the model (pair counts over the whole corpus).
    val pairs = Seq(
      1L -> Seq(("a", "b"), ("b", "a"), ("a", "c")),
      2L -> Seq(("a", "b")), 3L -> Seq(("x", "y"), ("y", "x"), ("x", "y")),
      5L -> Seq(("p", "q"), ("q", "r")))
    val all = pairs.flatMap(_._2)
    val cbg = all.groupBy(identity).map { case (k, v) => k -> v.size }
    val cp = all.groupBy(_._1).map { case (k, v) => k -> v.size }
    val expected = pairs.map { case (id, ps) =>
      val micros = ps.map { pr =>
        math.round(-(math.log(cbg(pr).toDouble / cp(pr._1)) / math.log(2.0)) * 10000)
      }
      id -> (ps.size.toLong,
        BigDecimal(micros.sum.toDouble / micros.size / 10000.0)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    assert(got == expected, s"got $got\nexpected $expected")
    assert(!got.contains(4L), "a one-token doc has no bigrams")
    assert(got(5L)._2 == 0.0, "singleton transitions carry zero surprisal")
  }

  test("winnow expression equals the declarative explode+window+distinct twin") {
    val K = 8
    val W = 4
    // The declarative formulation text09 used to run: one row per gram
    // position, window min, distinct. Kept here as the semantic oracle
    // for the native expression.
    val nGrams = greatest(length(col("text")) - (K - 1), lit(0))
    val grams = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), nGrams.as("ng"))
      .filter(col("ng") > 0)
      .select(col("doc_id"), col("ng"),
        explode(sequence(lit(1), col("ng"), lit(1))).as("i"), col("text"))
      .select(col("doc_id"), col("ng"), col("i"),
        conv(substring(md5(col("text").substr(col("i"), lit(K))), 1, 8), 16, 10)
          .cast("long").as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("i").rowsBetween(0, W - 1)
    val declarative = grams
      .withColumn("fingerprint", min("h").over(w))
      .filter(col("i") <= col("ng") - (W - 1))
      .select("doc_id", "fingerprint").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val native = TextAnalysis.text09WinnowFingerprint(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == declarative)
    assert(native.nonEmpty)
  }

  test("winnow expression counts code points: supplementary plane matches substr") {
    import spark.implicits._
    // Emoji are one code point but TWO UTF-16 chars: a UTF-16-unit
    // implementation would split surrogate pairs and diverge from
    // substr (code-point) semantics on both engines.
    val text = "abc 😀 def 🚀 ghi jkl mno"
    val native = Seq((1L, text)).toDF("doc_id", "text")
      .select(explode(winnowFingerprints(col("text"), 8, 4)).as("fp"))
      .collect().map(_.getLong(0)).toSet
    val declarative = Seq((1L, text)).toDF("doc_id", "text")
      .select(col("text"), (length(col("text")) - 7).as("ng"))
      .select(col("ng"), explode(sequence(lit(1), col("ng"))).as("i"), col("text"))
      .select(col("ng"), col("i"),
        conv(substring(md5(col("text").substr(col("i"), lit(8))), 1, 8), 16, 10)
          .cast("long").as("h"))
      .withColumn("fp", min("h").over(org.apache.spark.sql.expressions.Window
        .orderBy("i").rowsBetween(0, 3)))
      .filter(col("i") <= col("ng") - 3)
      .collect().map(_.getAs[Long]("fp")).toSet
    assert(native == declarative)
    assert(native.nonEmpty)
  }

  test("winnow expression edge cases: short text empty, non-ASCII handled") {
    import spark.implicits._
    val df = Seq(
      (1L, "tiny"),                      // < K chars: no gram at all
      (2L, "exactly11ch"),               // ng = 4 = W: exactly one window
      (3L, "caffé latté with ünïcode — multibyte chars beyond ascii"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), winnowFingerprints(col("text"), 8, 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(df(1L).isEmpty)
    assert(df(2L).length == 1)
    // Non-ASCII path must agree with the md5-over-UTF8-substring contract.
    val viaSql = Seq((3L, "caffé latté with ünïcode — multibyte chars beyond ascii"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        conv(substring(md5(col("text").substr(lit(1), lit(8))), 1, 8), 16, 10)
          .cast("long").as("h1"))
      .collect().head.getLong(1)
    val first8GramMin = df(3L)
    assert(first8GramMin.nonEmpty)
    // h1 is the hash of gram 1; the fingerprint set must contain the min
    // of SOME window, all of which are gram hashes — so h1 may or may
    // not be selected, but every fingerprint must be a valid gram hash.
    val allGramHashes = Seq((3L, "caffé latté with ünïcode — multibyte chars beyond ascii"))
      .toDF("doc_id", "text")
      .select(explode(sequence(lit(1), length(col("text")) - 7)).as("i"), col("text"))
      .select(conv(substring(md5(col("text").substr(col("i"), lit(8))), 1, 8), 16, 10)
        .cast("long").as("h"))
      .collect().map(_.getLong(0)).toSet
    assert(first8GramMin.toSet.subsetOf(allGramHashes))
    assert(allGramHashes.contains(viaSql))
  }

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

  test("text11 surprisal equals a driver-side unigram-model recompute") {
    val got = TextAnalysis.text11Surprisal(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.nonEmpty)
    val toks = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).filter(_.nonEmpty))
    val freq = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong)
    val total = freq.values.sum.toDouble
    toks.filter(_._2.nonEmpty).foreach { case (id, ts) =>
      val micro = ts.map(t =>
        math.round(-(math.log(freq(t) / total) / math.log(2.0)) * 10000))
      val exp = (micro.sum.toDouble / micro.length) / 10000.0
      val (nTok, gotAvg) = got(id)
      assert(nTok == ts.length, s"doc $id token count")
      // 5e-4 tolerance: the engine may land a per-token quantization
      // boundary differently than this recompute in rare ulp cases.
      assert(math.abs(gotAvg - exp) <= 5e-4,
        s"doc $id surprisal: got $gotAvg, recomputed $exp")
    }
    // Docs made only of corpus-common words must score below the
    // corpus mean: the signal orders boilerplate under novelty.
    val avgAll = got.values.map(_._2).sum / got.size
    val commonest = freq.maxBy(_._2)._1
    val boilerplate = toks.filter(_._2.nonEmpty)
      .minBy { case (_, ts) => ts.map(t => -math.log(freq(t) / total)).sum / ts.length }
    assert(got(boilerplate._1)._2 <= avgAll)
    assert(freq(commonest) > 1)
  }

  test("text12 entropy/TTR equals a driver-side per-doc recompute") {
    val got = TextAnalysis.text12Entropy(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.nonEmpty)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).filter(_.nonEmpty))
      .filter(_._2.nonEmpty)
    assert(docs.length == got.size)
    docs.foreach { case (id, ts) =>
      val counts = ts.groupBy(identity).view.mapValues(_.length).values.toSeq
      val n = counts.sum.toDouble
      val micro = counts.map(c =>
        math.round(c * (math.log(c.toDouble) / math.log(2.0)) * 10000)).sum
      val expEntropy = math.log(n) / math.log(2.0) - (micro / 10000.0) / n
      val (nTok, nTypes, entropy, ttr) = got(id)
      assert(nTok == ts.length && nTypes == counts.length, s"doc $id counts")
      assert(math.abs(entropy - expEntropy) <= 5e-4, s"doc $id entropy")
      assert(math.abs(ttr - counts.length / n) <= 5e-5, s"doc $id ttr")
      // Entropy is bounded by the uniform distribution over the types.
      assert(entropy >= -1e-9 &&
        entropy <= math.log(counts.length.toDouble) / math.log(2.0) + 1e-4)
    }
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

  test("text16 PMI top-20 equals a driver-side collocation recompute") {
    val got = TextAnalysis.text16PmiCollocations(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.size == 20)

    val texts = graft.sources.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val words = scala.collection.mutable.Map.empty[String, Long]
    val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
    var nPairs = 0L
    texts.foreach { t =>
      val ts = t.split(" ", -1)
      ts.filter(_.nonEmpty).foreach(w => words(w) = words.getOrElse(w, 0L) + 1)
      ts.sliding(2).filter(_.length == 2).foreach { bg =>
        pairs((bg(0), bg(1))) = pairs.getOrElse((bg(0), bg(1)), 0L) + 1
        nPairs += 1
      }
    }
    val scored = pairs.toSeq
      .filter { case ((p, t), c) =>
        c >= TextAnalysis.PmiMinSupport && p.nonEmpty && t.nonEmpty }
      .map { case ((p, t), c) =>
        val pmi = math.log(c.toDouble * nPairs /
          (words(p).toDouble * words(t))) / math.log(2.0)
        (s"$p $t", c, math.round(pmi * 10000) / 10000.0)
      }
      .sortBy { case (bg, _, pmi) => (-pmi, bg) }
      .take(20)
    assert(got == scored, "PMI ranking diverges from the driver replay")
    // A collocation must beat independence by construction of the corpus.
    assert(got.head._3 > 0.0, "top collocation should have positive PMI")
  }

  test("text17 BPE merges equal an independent list-walk Sennrich replay") {
    // The operator merges via left-to-right non-overlapping string
    // `replace` over the (sym)-wrapped segmentation; this replay uses
    // the REFERENCE formulation — greedy index-walk over symbol lists —
    // so agreement pins the two formulations equivalent, independently
    // of the DuckDB oracle (which replays the string form).
    val words = scala.collection.mutable.Map[List[String], Long]()
    graft.sources.Tables.documents(spark, sf).select("text").collect()
      .foreach { r =>
        r.getString(0).toLowerCase.split(" ")
          .filter(w => w.nonEmpty && w.forall(c => c >= 'a' && c <= 'z'))
          .foreach { w =>
            val seg = w.toList.map(_.toString)
            words(seg) = words.getOrElse(seg, 0L) + 1
          }
      }
    var vocab = words.toMap
    val expected = (1 to TextAnalysis.BpeMerges).map { r =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (seg, f) =>
        seg.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      val ((a, b), cnt) = counts.toSeq
        .sortBy { case ((x, y), c) => (-c, x, y) }.head
      def mergeGreedy(seg: List[String]): List[String] = {
        val out = scala.collection.mutable.ListBuffer[String]()
        var i = 0
        while (i < seg.length) {
          if (i < seg.length - 1 && seg(i) == a && seg(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += seg(i); i += 1 }
        }
        out.toList
      }
      vocab = vocab.groupBy { case (seg, _) => mergeGreedy(seg) }
        .map { case (seg, m) => seg -> m.values.sum }
      (r, a, b, a + b, cnt)
    }
    val got = TextAnalysis.text17BpeTrain(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == expected, "merge table diverges from the list-walk replay")
    // Non-degenerate: at least one learned merge builds on an earlier
    // merged symbol (multi-character side) — the property that makes
    // BPE BPE rather than bigram counting.
    assert(got.exists { case (_, a, b, _, _) => a.length > 1 || b.length > 1 })
  }

  test("text18 encode equals applying the trained merges word by word") {
    // Independent replay: take the operator's own merge table (already
    // pinned against the list-walk trainer above), apply the merges in
    // rank order to every word with the greedy index-walk, and sum per
    // doc — the string-replace formulation must agree on the applied
    // side exactly as it does in training.
    val merges = TextAnalysis.trainedMerges(spark, sf)
      .map { case (_, a, b, _, _) => (a, b) }
    def encode(w: String): Int = {
      var seg = w.toList.map(_.toString)
      merges.foreach { case (a, b) =>
        val out = scala.collection.mutable.ListBuffer[String]()
        var i = 0
        while (i < seg.length) {
          if (i < seg.length - 1 && seg(i) == a && seg(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += seg(i); i += 1 }
        }
        seg = out.toList
      }
      seg.length
    }
    val expected = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map { r =>
        val ws = r.getString(1).toLowerCase.split(" ")
          .filter(w => w.nonEmpty && w.forall(c => c >= 'a' && c <= 'z'))
        r.getLong(0) -> ((ws.length.toLong, ws.map(encode(_).toLong).sum))
      }
      .filter(_._2._1 > 0).toMap
    val got = TextAnalysis.text18BpeEncode(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected, "per-doc encoding diverges from the word-walk replay")
    // The learned vocab must actually compress: fewer subwords than
    // characters, more than words.
    val (nw, nb) = got.values.reduce((x, y) => (x._1 + y._1, x._2 + y._2))
    assert(nb > nw, "subword count must exceed word count")
  }

  test("text20 boilerplate scrub equals a driver-side chunk replay") {
    import graft.sources.Tables
    val k = Dedup.ParagraphTokens
    // Driver replay on chunk STRINGS (the oracle's grammar): Spark's
    // split(text, " ") keeps trailing empties, so the replay must use
    // split(" ", -1), not Scala's empties-dropping default.
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def toks(text: String) = text.split(" ", -1)
    def chunkStr(t: Array[String], i: Int) = t.slice(i * k, i * k + k).mkString(" ")
    val boiler = docs.toSeq
      .flatMap { case (id, text) =>
        val t = toks(text)
        (0 until t.length / k).map(i => (chunkStr(t, i), id))
      }
      .groupBy(_._1).collect {
        case (s, occ) if occ.map(_._2).distinct.size >=
          TextAnalysis.BoilerplateMinDocs => s
      }.toSet
    val expected = docs.flatMap { case (id, text) =>
      val t = toks(text)
      val nChunks = t.length / k
      val dropIdx = (0 until nChunks).filter(i => boiler(chunkStr(t, i))).toSet
      if (dropIdx.isEmpty) None
      else {
        val kept = t.zipWithIndex.collect {
          case (tok, p) if p >= nChunks * k || !dropIdx(p / k) => tok
        }
        Some(id -> ((nChunks, dropIdx.size, t.length, kept.length,
          kept.mkString(" "))))
      }
    }
    val got = TextAnalysis.text20BoilerplateScrub(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getString(5)))).toMap
    assert(got.nonEmpty, "the corpus must exercise the scrub")
    assert(got == expected, "scrub diverges from the chunk-string replay")
    // Structural laws: each dropped chunk is exactly k tokens, the
    // sub-chunk tail is never dropped, and a doc never loses all its
    // chunks' worth of identity (n_boiler bounded by n_chunks).
    got.foreach { case (_, (nc, nb, before, after, _)) =>
      assert(after == before - nb * k)
      assert(nb >= 1 && nb <= nc)
    }
  }

  test("text21 unigram EM equals an independent JVM Viterbi replay; mass conserved; pruning real") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val T = graft.operators.TextAnalysis
    // Independent replay: word table + seed + 3 hard-EM rounds with a
    // plain ARRAY dynamic program (the reference formulation — Kudo's
    // Viterbi over positions), against the operator's HOF pipeline.
    // Cost quantization goes through the ENGINE on both sides (the
    // text11 protocol is about Spark↔DuckDB log agreement, not JVM
    // transcendentals), so agreement here pins the DP + tie-break +
    // count re-estimation, independently of the DuckDB oracle.
    val words = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val occ = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, f) =>
      for (s0 <- 0 until w.length;
           l <- 1 to math.min(T.UnigramMaxPiece, w.length - s0))
        occ.updateWith(w.substring(s0, s0 + l))(o => Some(o.getOrElse(0L) + f))
    }
    val singles = occ.filter(_._1.length == 1).toSeq
    var counts = (singles ++ occ.filter(_._1.length > 1).toSeq
      .sortBy { case (p0, c) => (-c, p0) }.take(T.UnigramSeedMulti)).sortBy(_._1)
    val vocab = counts.map(_._1)
    def engineCosts(cs: Seq[(String, Long)]): Map[String, Long] = {
      val total = cs.map(_._2).sum; val v = cs.size.toLong
      cs.toDF("piece", "cnt")
        .select(col("piece"),
          round(-log2((col("cnt") + 1) / lit((total + v).toDouble)) * 10000)
            .cast("long").as("cost"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    for (_ <- 1 to T.UnigramIters) {
      val cm = engineCosts(counts)
      val got = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (w, f) =>
        val n = w.length
        val dp = Array.fill(n + 1)(T.UnigramHugeCost); dp(0) = 0L
        val prev = Array.fill(n + 1)(-1)
        for (j <- 1 to n) {
          var best = T.UnigramHugeCost; var bi = -1
          // Ascending scan, strict < — ties keep the smallest start
          // (longest piece), the operator's documented tie-break.
          for (i <- math.max(0, j - T.UnigramMaxPiece) until j) {
            val c = dp(i) + cm.getOrElse(w.substring(i, j), T.UnigramHugeCost)
            if (c < best) { best = c; bi = i }
          }
          dp(j) = best; prev(j) = bi
        }
        var pos = n
        while (pos > 0) {
          val i = prev(pos)
          got.updateWith(w.substring(i, pos))(o => Some(o.getOrElse(0L) + f))
          pos = i
        }
      }
      counts = vocab.map(p0 => p0 -> got.getOrElse(p0, 0L))
    }
    val model = T.unigramModel(spark, sf)
    assert(model.sortBy(_._1) == counts.sortBy(_._1),
      "HOF training diverges from the array-DP replay")
    // MASS CONSERVATION: segmentations tile every word exactly, so the
    // length-weighted final counts equal the corpus character mass of
    // the word table — a dropped or double-counted piece breaks it.
    val charMass = words.map { case (w, f) => w.length * f }.sum
    assert(model.map { case (p0, c) => p0.length * c }.sum == charMass,
      "piece mass must tile the corpus exactly")
    // Coverage: every character that occurs is in the vocab (what makes
    // every word segmentable at finite cost).
    assert(singles.map(_._1).toSet.subsetOf(model.map(_._1).toSet))
    // The EM pruning signal is REAL at this sf: some seed pieces end
    // at count 0 (abandoned by every best segmentation) while others
    // gained mass vs the raw substring count — re-estimation did
    // something, the operator is not a frequency table.
    assert(model.exists(_._2 == 0L), "no abandoned piece — EM arm vacuous")
    val raw = occ.toMap
    assert(model.exists { case (p0, c) => c > 0 && c != raw(p0) },
      "every count equals its raw substring count — EM arm vacuous")
    // Rendered frame matches the model and ranks deterministically.
    val out = T.text21UnigramTrain(spark, sf).collect()
    assert(out.length == model.size)
    assert(out.map(r => r.getAs[String]("piece") -> r.getAs[Long]("cnt")).toMap
      == model.toMap)
    assert(out.map(_.getAs[Int]("rank")).toSeq == (1 to model.size))
  }

  test("text22 unigram encode equals a JVM Viterbi replay under the shipped model; word grammar shared with text18") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val T = graft.operators.TextAnalysis
    // The SHIPPED model: text21's final counts, re-quantized through
    // the engine (the operator's own definition of cost_micro).
    val model = T.unigramModel(spark, sf)
    val total = model.map(_._2).sum; val v = model.size.toLong
    val cm = model.toDF("piece", "cnt")
      .select(col("piece"),
        round(-log2((col("cnt") + 1) / lit((total + v).toDouble)) * 10000)
          .cast("long").as("cost"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // JVM per-word Viterbi under the shipped costs (the array-DP
    // reference formulation, same tie-break).
    def encode(w: String): (Long, Long) = {
      val n = w.length
      val dp = Array.fill(n + 1)(T.UnigramHugeCost); dp(0) = 0L
      val prev = Array.fill(n + 1)(-1)
      for (j <- 1 to n) {
        var best = T.UnigramHugeCost; var bi = -1
        for (i <- math.max(0, j - T.UnigramMaxPiece) until j) {
          val c = dp(i) + cm.getOrElse(w.substring(i, j), T.UnigramHugeCost)
          if (c < best) { best = c; bi = i }
        }
        dp(j) = best; prev(j) = bi
      }
      var pos = n; var pieces = 0L
      while (pos > 0) { pieces += 1; pos = prev(pos) }
      (pieces, dp(n))
    }
    val expected = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        r.getString(1).toLowerCase.split(" ")
          .filter(w => w.nonEmpty && w.forall(c => c >= 'a' && c <= 'z'))
          .map(w => r.getLong(0) -> encode(w))
      }
      .groupBy(_._1).map { case (d, ws) =>
        d -> ((ws.length.toLong, ws.map(_._2._1).sum, ws.map(_._2._2).sum))
      }
    val got = T.text22UnigramEncode(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_words"),
        r.getAs[Long]("n_unigram_tokens"),
        r.getAs[Long]("cost_micro_sum")))).toMap
    assert(got == expected, "encode diverges from the JVM replay")
    // Bounds: at least one piece per word, at most one per character;
    // every path cost positive and finite (never the HUGE sentinel —
    // single-char coverage guarantees real segmentability).
    got.values.foreach { case (nw, np, cs) =>
      assert(np >= nw && cs > 0 && cs < T.UnigramHugeCost)
    }
    // The word grammar is text18's, verbatim: per-doc word counts
    // agree between the two tokenizer families' encodes.
    val bpe = T.text18BpeEncode(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_words")).toMap
    assert(got.view.mapValues(_._1).toMap == bpe,
      "the two encodes must meter the same word stream")
  }
}

package graft.functions

import graft.SparkSpec
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

class ShingleHashesSpec extends SparkSpec {

  private val samples = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox jumps over the lazy dog", // exact dup of 1
    3L -> "the quick brown fox leaps over the lazy dog", // near dup of 1
    4L -> "a a a a a a a a",                             // heavy repeats
    5L -> "double  space   runs keep empty tokens intact here",
    6L -> "tiny",                                        // fewer tokens than n
    7L -> "",                                            // empty text
    8L -> "caffé latté with ünïcode tokens — beyond ascii chars")

  /** The declarative shingle set text09 & dedup used to build. */
  private def declarativeSets(n: Int): Map[Long, Set[String]] = {
    import spark.implicits._
    samples.toDF("doc_id", "text")
      .select(col("doc_id"),
        shinglesFromTokens(tokens(col("text")), n).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
  }

  private def nativeSets(n: Int): Map[Long, Set[Long]] = {
    import spark.implicits._
    samples.toDF("doc_id", "text")
      .select(col("doc_id"), shingleHashes(col("text"), n).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
  }

  test("hash sets are bijective images of the declarative shingle sets") {
    for (n <- Seq(2, 3)) {
      val dec = declarativeSets(n)
      val nat = nativeSets(n)
      // Same cardinality per doc (dedup agrees)...
      dec.foreach { case (id, s) =>
        assert(nat(id).size == s.size, s"doc $id n=$n cardinality")
      }
      // ...and same pairwise intersection sizes (Jaccard counts agree):
      // together these pin a bijection between shingles and hashes.
      for ((a, sa) <- dec; (b, sb) <- dec if a < b) {
        assert((nat(a) intersect nat(b)).size == (sa intersect sb).size,
          s"pair ($a,$b) n=$n intersection")
      }
    }
  }

  test("native text expressions registered as SQL functions via GraftExtensions") {
    val row = spark.sql(
      """SELECT size(shingle_hashes('a b c d', 3)) AS n,
        |       size(winnow_fingerprints('abcdefghijklmnop', 8, 4)) AS w,
        |       size(minhash_signature(array(1L, 2L), 8)) AS m""".stripMargin)
      .collect().head
    assert(row.getInt(0) == 2) // 4 tokens -> 2 distinct 3-gram shingles
    assert(row.getInt(1) >= 1) // 16 chars -> 9 grams -> 6 windows -> >=1 fp
    assert(row.getInt(2) == 8)
  }

  test("empty and sub-n texts yield empty shingle sets") {
    val nat = nativeSets(3)
    assert(nat(6L).isEmpty) // 1 token < 3
    assert(nat(7L).isEmpty) // "" splits to one empty token < 3
  }

  test("exact duplicates share the full hash set; near-dups share most") {
    val nat = nativeSets(3)
    assert(nat(1L) == nat(2L))
    val inter = (nat(1L) intersect nat(3L)).size.toDouble
    assert(inter > 0 && inter < nat(1L).size)
  }
}

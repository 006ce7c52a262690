package graft.props

import graft.functions.{CosineSimilarity, L2Distance, SimHashAgg}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property suite for the native Catalyst pieces — the math
  * must hold for arbitrary inputs, not just the fixtures the example
  * specs use. Expressions are evaluated through their interpreted path
  * (`eval`), which the CosineSimilaritySpec separately pins equal to
  * the codegen path.
  */
object GraftProps extends Properties("graft") {

  private val dimGen = Gen.choose(1, 64)
  private def vecGen(dim: Int): Gen[Array[Double]] =
    Gen.containerOfN[Array, Double](dim, Gen.choose(-10.0, 10.0))

  private def arrLit(a: Array[Double]) =
    Literal.create(a, ArrayType(DoubleType))

  property("cosine_sim matches a reference implementation") =
    Prop.forAll(dimGen.flatMap(d => Gen.zip(vecGen(d), vecGen(d)))) {
      case (a, b) =>
        val got = CosineSimilarity(arrLit(a), arrLit(b)).eval(null)
          .asInstanceOf[Double]
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        val na = math.sqrt(a.map(x => x * x).sum)
        val nb = math.sqrt(b.map(x => x * x).sum)
        val expected = if (na == 0.0 || nb == 0.0) 0.0 else dot / (na * nb)
        math.abs(got - expected) <= 1e-9
    }

  property("cosine_sim is symmetric and bounded to [-1, 1]") =
    Prop.forAll(dimGen.flatMap(d => Gen.zip(vecGen(d), vecGen(d)))) {
      case (a, b) =>
        val ab = CosineSimilarity(arrLit(a), arrLit(b)).eval(null).asInstanceOf[Double]
        val ba = CosineSimilarity(arrLit(b), arrLit(a)).eval(null).asInstanceOf[Double]
        ab == ba && ab >= -1.0 - 1e-12 && ab <= 1.0 + 1e-12
    }

  property("l2_distance matches a reference implementation and the metric axioms") =
    Prop.forAll(dimGen.flatMap(d => Gen.zip(vecGen(d), vecGen(d)))) {
      case (a, b) =>
        val got = L2Distance(arrLit(a), arrLit(b)).eval(null).asInstanceOf[Double]
        val expected = math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
        val self = L2Distance(arrLit(a), arrLit(a)).eval(null).asInstanceOf[Double]
        math.abs(got - expected) <= 1e-9 && got >= 0.0 && self == 0.0
    }

  private val hashesGen = Gen.nonEmptyListOf(Gen.long)

  /** SimHashAgg must be order- and partitioning-invariant: any split of
    * the input into partial buffers merged in any order gives the same
    * hash as one sequential pass — this is exactly what map-side
    * partial aggregation assumes.
    */
  property("simhash_agg is partition- and order-invariant") =
    Prop.forAll(hashesGen, Gen.choose(1, 5)) { (hashes, nSplits) =>
      val agg = SimHashAgg(BoundReference(0, LongType, nullable = false))
      def run(groups: Seq[Seq[Long]]): Long = {
        val bufs = groups.map { g =>
          g.foldLeft(agg.createAggregationBuffer()) { (buf, h) =>
            agg.update(buf, InternalRow(h))
          }
        }
        agg.eval(bufs.reduce(agg.merge)).asInstanceOf[Long]
      }
      val single = run(Seq(hashes))
      val splits = hashes.grouped(
        math.max(1, hashes.size / nSplits)).toSeq
      val shuffled = run(scala.util.Random.shuffle(splits))
      single == shuffled
    }
}

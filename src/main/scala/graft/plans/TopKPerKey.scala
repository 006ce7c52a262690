package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Custom whole-operator: per-key top-k with dense 1-based ranks.
  *
  * Spark expresses "top k per key" as a window `row_number` + filter,
  * which SORTS every key's full partition — O(n log n) per partition
  * and the sort materializes all rows. This operator keeps a bounded
  * heap of k rows per key: O(n log k) time, O(keys·k) memory, a single
  * pass, no sort buffer. Same output contract as
  * `row_number().over(partitionBy(keys).orderBy(order)) <= k`.
  *
  * The full (c)-tier extension shape: logical node ([[TopKPerKeyPlan]])
  * → planner strategy ([[GraftStrategy]], registered through
  * `graft.GraftExtensions`) → physical operator ([[TopKPerKeyExec]]),
  * which declares `ClusteredDistribution(keys)` so the planner inserts
  * (and AQE tunes) the one required shuffle.
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan)
    extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Physical per-key top-k. Runs in two stages, mirroring partial
  * aggregation: a PARTIAL instance (no distribution requirement) prunes
  * each input partition to at most `keys·k` rows map-side, then the
  * FINAL instance (which declares `ClusteredDistribution(keys)`, so the
  * planner inserts — and AQE tunes — one shuffle) computes exact ranks.
  * Without the partial stage the shuffle moves the ENTIRE scored
  * stream; with few keys (a handful of ANN query vectors) that is both
  * a full-corpus shuffle and structural skew — every row of one key on
  * one reducer. After the partial stage the shuffle carries at most
  * `partitions·keys·k` rows.
  *
  * The partial stage caps its heap table at [[TopKPerKeyExec.MaxPartialRows]]
  * buffered rows: beyond the cap (very high key cardinality) new keys
  * pass through unfiltered — the stage emits a SUPERSET and stays
  * memory-bounded, while the final stage enforces exact semantics.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: SparkPlan,
    partial: Boolean = false,
    maxPartialRows: Int = TopKPerKeyExec.MaxPartialRows)
    extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    if (partial) org.apache.spark.sql.catalyst.expressions.AttributeSet.empty
    else org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val outAttrs = output
    val isPartial = partial
    val maxKeys = math.max(1, maxPartialRows / limit)
    child.execute().mapPartitions({ iter =>
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // Max-heap under `ord`: head is the WORST retained row, so a new
      // row only displaces it when strictly better.
      val heaps = scala.collection.mutable.AnyRefMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      def offer(row: InternalRow, heap: scala.collection.mutable.PriorityQueue[InternalRow]): Unit =
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      if (isPartial) {
        // Interleaving iterator: heap-buffered rows flush at input end;
        // past the key cap, rows of UNSEEN keys stream through directly
        // (no copy — consumed before the next input row is fetched).
        new Iterator[InternalRow] {
          private var passThrough: InternalRow = _
          private var flush: Iterator[InternalRow] = _
          private def advance(): Unit =
            while (passThrough == null && flush == null) {
              if (!iter.hasNext) {
                flush = heaps.valuesIterator.flatMap(_.iterator)
                return
              }
              val row = iter.next()
              // Probe with the REUSED projected row first; copy the key
              // only when inserting a new heap — a per-row UnsafeRow
              // copy here would undo part of the bounded-heap win.
              val key = keyProj(row)
              var heap = heaps.getOrNull(key)
              if (heap == null && heaps.size < maxKeys) {
                heap = new scala.collection.mutable.PriorityQueue[InternalRow]()(ord)
                heaps.update(key.copy(), heap)
              }
              if (heap != null) offer(row, heap)
              else passThrough = row
            }
          override def hasNext: Boolean = {
            advance()
            passThrough != null || flush.hasNext
          }
          override def next(): InternalRow = {
            advance()
            if (passThrough != null) {
              val r = passThrough; passThrough = null; r
            } else flush.next()
          }
        }
      } else {
        iter.foreach { row =>
          val key = keyProj(row)
          var heap = heaps.getOrNull(key)
          if (heap == null) {
            heap = new scala.collection.mutable.PriorityQueue[InternalRow]()(ord)
            heaps.update(key.copy(), heap)
          }
          offer(row, heap)
        }
        val joined = new JoinedRow
        val outProj = UnsafeProjection.create(outAttrs, outAttrs)
        heaps.valuesIterator.flatMap { heap =>
          // dequeueAll yields worst-first; reverse for rank 1 = best.
          val best = heap.dequeueAll.reverse
          best.iterator.zipWithIndex.map { case (r, i) =>
            outProj(joined(r, new GenericInternalRow(Array[Any](i + 1))))
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** Map-side heap budget of the partial stage, in buffered ROWS
    * (keys × k). Beyond it, new keys pass through unfiltered — the
    * same "bounded memory, superset output" posture as a partial
    * aggregation falling back to pass-through on hash-table pressure.
    * Tunable per session via [[GraftStrategy.MaxPartialRowsKey]]
    * (primarily so the degraded path is testable at spec scale).
    */
  val MaxPartialRows: Int = 1 << 20
}

/** Planner strategy mapping the logical node to partial + final execs. */
object GraftStrategy extends SparkStrategy {
  val MaxPartialRowsKey = "spark.graft.topk.maxPartialRows"

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, rankAttr, child) =>
      val cap = org.apache.spark.sql.internal.SQLConf.get
        .getConfString(MaxPartialRowsKey, TopKPerKeyExec.MaxPartialRows.toString)
        .toInt
      TopKPerKeyExec(keys, order, k, rankAttr,
        TopKPerKeyExec(keys, order, k, rankAttr, planLater(child),
          partial = true, maxPartialRows = cap)) :: Nil
    case _ => Nil
  }
}

/** User-facing constructor. */
object TopKPerKey {
  import org.apache.spark.sql.{DataFrame, GraftShim}

  /** Top `k` rows per `keyCols` group under `orderCols`
    * ((name, descending) pairs — include tiebreaker columns for a
    * deterministic result), with a 1-based `rankCol` appended.
    * Equivalent to `row_number` over the same window, minus the sort.
    */
  def apply(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[(String, Boolean)],
      k: Int,
      rankCol: String = "rk"): DataFrame = {
    val analyzed = GraftShim.logicalPlan(df)
    def resolve(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${analyzed.output.map(_.name).mkString(", ")}"))
    val keys = keyCols.map(resolve)
    val order = orderCols.map { case (name, desc) =>
      val a = resolve(name)
      if (desc) SortOrder(a, org.apache.spark.sql.catalyst.expressions.Descending)
      else SortOrder(a, org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    val rankAttr = AttributeReference(rankCol, IntegerType, nullable = false)()
    GraftShim.ofRows(df.sparkSession,
      TopKPerKeyPlan(keys, order, k, rankAttr, analyzed))
  }
}

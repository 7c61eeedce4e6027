package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** The engine's whole-operator Catalyst path (the SURVEY §2b "custom
  * operator" option (c)): grouped top-k as a FIRST-CLASS physical
  * operator — logical node + planner strategy + two-phase physical
  * execution — instead of the `row_number() OVER (...) <= k` window
  * plan.
  *
  * Why a custom operator at 100 TB: the window plan must SORT every
  * group's every row (full shuffle of the input, then a per-partition
  * sort over ALL rows) just to throw away all but k of them. This
  * operator keeps a bounded heap of k rows per key in the PARTIAL
  * stage: it runs on raw scan partitions and forwards AT MOST k rows
  * per (key, input partition) into the exchange — the shuffle carries
  * the k-bounded survivors, not the data. The FINAL stage declares a
  * required ordering on (keys, order) over those survivors and
  * streams the first k rows of each key run in O(k) memory; the sort
  * EnsureRequirements inserts to satisfy it is Spark's spillable
  * external sort over the SURVIVORS (k * #keys * #input-partitions
  * rows), never the input. No sort of the input exists anywhere in
  * the plan, and the output inherits hash-partitioning on the keys,
  * so a downstream per-key aggregate plans zero additional exchange.
  *
  * Memory honesty (r12 ADVICE): the partial stage's heap map is
  * (distinct keys per partition) x k rows — DATA-dependent, not
  * operator-bounded. It is therefore capped by
  * `spark.graft.topk.partialRowBudget` (default 1M retained rows,
  * ~100 MB at 100 B/row): once the budget is reached, NO heap grows —
  * rows of new keys AND rows that would grow an existing key's
  * under-k heap PASS THROUGH to the exchange unfiltered (r13 ADVICE:
  * gating only new-key inserts let retention reach k x budget) —
  * correct (the partial contract is "any superset of the per-key
  * top-k"), degrading shuffle volume instead of OOMing the executor.
  * Past the budget the operator converges toward the window plan's
  * shuffle volume while keeping the sort survivor-sized; at or under
  * it, the shuffle carries k-bounded survivors only. The FINAL stage
  * is O(k) regardless of cardinality (streaming over sorted runs,
  * with the spillable sort absorbing whatever the partial stage
  * forwarded).
  *
  * Determinism contract (same as [[graft.Graft.topKPerGroup]]): the
  * sort order must be TOTAL per key (include a unique tie-break
  * column) or boundary ties make the retained set partition-order
  * dependent. */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k out of range: $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): TopKPerKeyNode = copy(child = newChild)
}

/** Plans [[TopKPerKeyNode]] as partial-then-final [[TopKPerKeyExec]]
  * (the hash-aggregate two-phase shape): the final stage declares
  * `ClusteredDistribution(keys)` plus an ordering requirement, so
  * EnsureRequirements inserts the one exchange — which by
  * construction carries only the partial stage's
  * k-per-key-per-partition survivors — and a survivor-sized sort. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      val partialExec = TopKPerKeyExec(keys, order, k, partial = true,
        planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partialExec) :: Nil
    case _ => Nil
  }
}

/** Two-phase grouped top-k (see [[TopKPerKeyNode]] for the plan
  * shape and the memory contract).
  *
  * `partial = true`: per input partition, a hash map key -> bounded
  * heap of the k best rows under `order` (heap root = worst retained
  * row, so a non-qualifying row costs one comparison). Retained rows
  * are capped by `spark.graft.topk.partialRowBudget`; at the cap,
  * NEW keys bypass the map and stream through unfiltered (existing
  * keys keep heap-filtering — their heaps are already allocated and
  * cannot exceed k each). The union of outputs is a superset of the
  * true per-key top-k — the only contract the final stage needs.
  *
  * `partial = false`: requires clustering on `keys` AND ordering on
  * (keys, order); rows of each key run arrive best-first, so the
  * exact answer is the first k rows of each run — one streaming
  * pass, O(1) state beyond the current key. */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil else finalOrdering
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil) else Seq(finalOrdering)

  private def finalOrdering: Seq[SortOrder] =
    keys.map(SortOrder(_, Ascending)) ++ order

  override protected def doExecute(): RDD[InternalRow] =
    if (partial) doExecutePartial() else doExecuteFinal()

  private def doExecutePartial(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    val rowBudget =
      conf.getConfString("spark.graft.topk.partialRowBudget", "1048576").toLong
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd = GenerateOrdering.generate(sortOrder, childOutput)
      // heap root = WORST retained row => reverse of the sort order
      val heapCmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          rowOrd.compare(b, a)
      }
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]
      var held = 0L
      val filtered = iter.flatMap { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (held >= rowBudget) {
            // budget reached: don't grow the map — forward the row
            // unfiltered (superset-correct; the final stage resolves)
            Iterator.single(row)
          } else {
            heap = new java.util.PriorityQueue[InternalRow](limit, heapCmp)
            heaps.put(key.copy(), heap)
            heap.add(row.copy()); held += 1
            Iterator.empty
          }
        } else if (heap.size() < limit) {
          // budget applies to EXISTING keys' heap growth too (r13
          // ADVICE: gating only new-key inserts let retention reach
          // k*budget); pass-through stays superset-correct — the rows
          // already heaped for this key are a superset candidate set
          // and this row reaches the final stage via the exchange
          if (held >= rowBudget) Iterator.single(row)
          else {
            heap.add(row.copy()); held += 1
            Iterator.empty
          }
        } else {
          if (rowOrd.compare(row, heap.peek()) < 0) {
            heap.poll()
            heap.add(row.copy())
          }
          Iterator.empty
        }
      }
      import scala.jdk.CollectionConverters._
      // Iterator.++'s right operand is by-name: the heap drain only
      // materializes after the input (and every pass-through) is done
      filtered ++ heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  private def doExecuteFinal(): RDD[InternalRow] = {
    val keyExprs = keys
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      var currentKey: UnsafeRow = null
      var emitted = 0
      iter.filter { row =>
        val key = keyProj(row)
        if (currentKey == null || currentKey != key) {
          currentKey = key.copy()
          emitted = 1
          true
        } else if (emitted < limit) {
          emitted += 1
          true
        } else false
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerKeyExec = copy(child = newChild)
}

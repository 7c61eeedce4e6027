package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
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
  * operator keeps a bounded heap of k rows per key: the partial stage
  * runs on raw scan partitions and forwards AT MOST k rows per (key,
  * input partition) into the exchange — the shuffle carries the
  * k-bounded survivors, not the data — and the final stage runs the
  * same heaps on the co-located survivors. No sort of the input
  * exists anywhere in the plan (O(n log k) heap pushes vs O(n log n)
  * sort), and the output inherits hash-partitioning on the keys, so
  * a downstream per-key aggregate plans zero additional exchange.
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
  * `ClusteredDistribution(keys)`, so EnsureRequirements inserts the
  * one exchange — which by construction carries only the partial
  * stage's k-per-key-per-partition survivors. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      val partialExec = TopKPerKeyExec(keys, order, k, partial = true,
        planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partialExec) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap grouped top-k: per partition, a hash map key -> heap
  * of the k best rows under `order` (heap root = worst retained row,
  * so a new row costs one comparison against the root and at most one
  * replace). Memory is (#distinct keys in the partition) * k rows —
  * bounded by the OPERATOR, not the data, which is the whole point.
  * `partial = true` runs on arbitrary input partitions (its union is
  * a superset of the true per-key top-k, since the global top-k per
  * key is contained in the union of per-partition top-ks);
  * `partial = false` requires clustering on `keys` and emits the
  * exact answer. */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
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
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit, heapCmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) {
          heap.add(row.copy())
        } else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerKeyExec = copy(child = newChild)
}

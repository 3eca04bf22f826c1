package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Cast, Expression, Literal, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, UnresolvedHint}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DoubleType, NumericType}

/** Whole-operator Catalyst extension: exact top-k rows per key.
  *
  * The built-in formulation (`row_number().over(partitionBy(key)
  * .orderBy(v.desc)) <= k`) shuffles every row and fully sorts each key
  * partition. This operator keeps a bounded k-element heap per key —
  * O(n log k) with no per-key sort and k·|keys| memory.
  *
  * Like partial aggregation (and like TakeOrderedAndProject for the
  * global case), the operator runs in TWO passes: a map-side partial
  * pass heaps each *input* partition and emits at most k rows per key
  * per partition BEFORE the exchange, then the final pass heaps the
  * survivors after the key shuffle. With hot (or few) keys the final
  * task for a key therefore receives ≤ k·|input partitions| rows, not
  * the key's full row count — the property that survives a 100 TB fact
  * table whose top-k keys would otherwise funnel into ≤|keys| tasks.
  *
  * Rows are kept by `order` descending; `tiebreak` (ascending, numeric)
  * resolves equal order values deterministically — the same (v DESC,
  * tb ASC) contract as the window formulation's orderBy, which is what
  * makes the operator's output oracle-checkable. Both columns must be
  * numeric (validated at entry); comparison is on the value cast to
  * double, so integral tiebreaks above 2^53 would lose tie-resolution
  * precision — acceptable for id-like tiebreaks, documented here.
  *
  * Full (c)-tier stack per the extension preference order:
  * a public-API entry point (`df.hint("topk_per_key", key, order, k)`
  * on an extensions-enabled session, or `TopKPerKey(df, ...)` on any
  * session via experimental strategies), a resolution Rule rewriting
  * the hint to a logical node, a planner Strategy, and a physical exec
  * pair (partial + final) whose final node declares
  * ClusteredDistribution so the planner inserts the single required
  * exchange between the passes. Registered through GraftExtensions.
  */
case class TopKPerKeyNode(key: Expression, order: Expression,
                          tiebreak: Expression, k: Int,
                          child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

private[plans] object TopKResolve {
  /** Resolves a named column and validates it is numeric (the heap
    * compares doubles; a silently-null cast would turn the ordering
    * into a no-op — reject instead). */
  def numericAttr(child: LogicalPlan, n: String, role: String): Expression = {
    val a = child.output
      .find(_.name.equalsIgnoreCase(n))
      .getOrElse(throw new IllegalArgumentException(
        s"topk_per_key: column '$n' not found in ${child.output.map(_.name)}"))
    a.dataType match {
      case _: NumericType => a
      case other => throw new IllegalArgumentException(
        s"topk_per_key: $role column '$n' must be numeric, got $other")
    }
  }

  def node(child: LogicalPlan, key: String, order: String,
           k: Int, tiebreak: Option[String]): TopKPerKeyNode = {
    val keyAttr = child.output
      .find(_.name.equalsIgnoreCase(key))
      .getOrElse(throw new IllegalArgumentException(
        s"topk_per_key: column '$key' not found in ${child.output.map(_.name)}"))
    TopKPerKeyNode(
      keyAttr,
      Cast(numericAttr(child, order, "order"), DoubleType),
      tiebreak.map(n => Cast(numericAttr(child, n, "tiebreak"), DoubleType))
        .getOrElse(Literal(0.0)),
      k, child)
  }
}

/** Library-facing entry that needs no session extensions: registers the
  * planner strategy in `spark.experimental` (runtime-mutable) and builds
  * the logical node directly on the analyzed child. */
object TopKPerKey {
  def apply(df: DataFrame, key: String, order: String, k: Int,
            tiebreak: Option[String] = None): DataFrame = {
    val spark: SparkSession = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val child = df.queryExecution.analyzed
    GraftShim.ofRows(spark, TopKResolve.node(child, key, order, k, tiebreak))
  }
}

/** Rewrites df.hint("topk_per_key", "<key>", "<order>", k[, "<tiebreak>"]).
  * Hint parameters may arrive raw or as foldable Literals depending on
  * the entry API, so both forms are accepted. */
object ResolveTopKPerKeyHint extends Rule[LogicalPlan] {
  private def asString(a: Any): Option[String] = a match {
    case s: String => Some(s)
    case Literal(v, _) if v != null => Some(v.toString)
    case _ => None
  }
  private def asInt(a: Any): Option[Int] = a match {
    case i: Int => Some(i)
    case l: Long => Some(l.toInt)
    case Literal(v: Int, _) => Some(v)
    case Literal(v: Long, _) => Some(v.toInt)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case UnresolvedHint(name, Seq(p1, p2, p3), child)
        if name.equalsIgnoreCase("topk_per_key") && child.resolved &&
           asString(p1).isDefined && asString(p2).isDefined &&
           asInt(p3).isDefined =>
      TopKResolve.node(child, asString(p1).get, asString(p2).get,
                       asInt(p3).get, None)
    case UnresolvedHint(name, Seq(p1, p2, p3, p4), child)
        if name.equalsIgnoreCase("topk_per_key") && child.resolved &&
           asString(p1).isDefined && asString(p2).isDefined &&
           asInt(p3).isDefined && asString(p4).isDefined =>
      TopKResolve.node(child, asString(p1).get, asString(p2).get,
                       asInt(p3).get, asString(p4))
  }
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(key, order, tiebreak, k, child) =>
      // partial (pre-exchange) + final (post-exchange), like partial
      // aggregation: the planner inserts the hash exchange between them
      // because the partial's output partitioning doesn't satisfy the
      // final's ClusteredDistribution.
      TopKPerKeyExec(key, order, tiebreak, k,
        TopKPerKeyPartialExec(key, order, tiebreak, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

private[plans] object TopKHeap {
  /** Streams a partition through per-key bounded heaps and emits each
    * key's (at most) k best rows — shared by the partial and final
    * passes; the algebra is idempotent (topk ∘ topk = topk), which is
    * what makes the two-pass split correct. */
  def heapPartition(it: Iterator[InternalRow],
                    keyExpr: Expression, orderExpr: Expression,
                    tbExpr: Expression, k: Int,
                    childOutput: Seq[Attribute]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(Seq(keyExpr), childOutput)
    val orderBound = BindReferences.bindReference(orderExpr, childOutput)
    val tbBound = BindReferences.bindReference(tbExpr, childOutput)
    // per key: bounded heap with the WORST element (smallest order,
    // then largest tiebreak) at the head, so eviction is O(log k)
    type Entry = (Double, Double, UnsafeRow)
    implicit val worstFirst: Ordering[Entry] = new Ordering[Entry] {
      override def compare(a: Entry, b: Entry): Int = {
        val c = java.lang.Double.compare(b._1, a._1) // smaller v = worse
        if (c != 0) c else java.lang.Double.compare(a._2, b._2) // larger tb = worse
      }
    }
    val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[Entry]]
    it.foreach { row =>
      val v = orderBound.eval(row)
      if (v != null) {
        val d = v.asInstanceOf[Double]
        val tbv = tbBound.eval(row)
        val tb = if (tbv == null) 0.0 else tbv.asInstanceOf[Double]
        val kRow = keyProj(row)
        val heap = heaps.get(kRow) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[Entry]
            heaps.put(kRow.copy(), h)
            h
        }
        if (heap.size < k) {
          heap.enqueue((d, tb, row.asInstanceOf[UnsafeRow].copy()))
        } else {
          val (hv, htb, _) = heap.head
          if (d > hv || (d == hv && tb < htb)) {
            heap.dequeue()
            heap.enqueue((d, tb, row.asInstanceOf[UnsafeRow].copy()))
          }
        }
      }
    }
    heaps.iterator.flatMap { case (_, heap) =>
      val sorted: Seq[Entry] = heap.dequeueAll
      sorted.reverseIterator.map(p => p._3: InternalRow)
    }
  }
}

/** Map-side partial pass: heaps every INPUT partition in place (no
  * required distribution → no exchange below it) and emits ≤ k rows per
  * key per partition, so only candidate survivors cross the wire. */
case class TopKPerKeyPartialExec(key: Expression, order: Expression,
                                 tiebreak: Expression, k: Int,
                                 child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override protected def doExecute(): RDD[InternalRow] = {
    val (keyExpr, orderExpr, tbExpr, kk, childOutput) =
      (key, order, tiebreak, k, child.output)
    child.execute().mapPartitions(
      TopKHeap.heapPartition(_, keyExpr, orderExpr, tbExpr, kk, childOutput))
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Final pass: all partial survivors of a key must be co-located; the
  * planner inserts the hash exchange (no sort required — the heap
  * replaces it). */
case class TopKPerKeyExec(key: Expression, order: Expression,
                          tiebreak: Expression, k: Int,
                          child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(key)) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val (keyExpr, orderExpr, tbExpr, kk, childOutput) =
      (key, order, tiebreak, k, child.output)
    child.execute().mapPartitions(
      TopKHeap.heapPartition(_, keyExpr, orderExpr, tbExpr, kk, childOutput))
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

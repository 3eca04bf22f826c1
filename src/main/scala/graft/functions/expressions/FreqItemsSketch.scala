package graft.functions.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a native aggregate.
  *
  * `graft_freq_items(item, k)` keeps at most k−1 counters and returns the
  * surviving items as a lexicographically sorted array<string>. The
  * classic guarantee holds under arbitrary partitioning and merge order
  * (Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
  * Summaries", PODS'12): EVERY item with true frequency > N/k is in the
  * output, and each counter undercounts by at most N/k.
  *
  * Why it matters at 100 TB: exact "terms with frequency > N/k" via
  * groupBy(term) shuffles the whole vocabulary — billions of n-grams.
  * This aggregate is one buffer per partition with explicit partial
  * merge (the TypedImperativeAggregate contract), so the map side sends
  * ≤ k−1 counters per partition — O(partitions × k) bytes on the wire,
  * independent of vocabulary size. A second pass counts only the ≤ k−1
  * candidates exactly (map-side filter before the shuffle), turning the
  * sketch into an EXACT, deterministic heavy-hitters answer — see
  * operators.TextOps.heavyHitters.
  *
  * Merge subtracts the (k)-th largest combined count from every counter
  * and drops the non-positives — the summed error of the two halves, so
  * the N/k bound is preserved (not doubled) after merging.
  */
object FreqItemsSketch {
  def build(exprs: Seq[Expression]): FreqItemsSketch = {
    if (exprs.length != 2) throw new IllegalArgumentException(
      s"graft_freq_items expects exactly 2 arguments (item, k literal), " +
      s"got ${exprs.length}")
    def intArg(e: Expression, role: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
      case other => throw new IllegalArgumentException(
        s"graft_freq_items: $role must be an integer literal, got $other")
    }
    FreqItemsSketch(exprs(0), intArg(exprs(1), "k"))
  }
}

case class FreqItemsSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  private def cap: Int = k - 1

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"graft_freq_items expects a string item, got ${child.dataType.catalogString}")
    else if (k < 2) TypeCheckResult.TypeCheckFailure(
      s"graft_freq_items: k must be >= 2, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1)
        case None if buf.size < cap =>
          // eval() hands back memory Spark may reuse — copy the key.
          buf.update(s.clone(), 1L)
        case None =>
          // Full and unseen: decrement every counter (the new item's
          // single occurrence cancels against one of each).
          val dead = buf.collect { case (key, 1L) => key }.toArray
          buf.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      b1: mutable.HashMap[UTF8String, Long],
      b2: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (key, c) =>
      b1.update(key, b1.getOrElse(key, 0L) + c)
    }
    if (b1.size > cap) {
      // Subtract the k-th largest combined count from everything.
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - cap - 1)
      val dead = b1.collect { case (key, c) if c <= d => key }.toArray
      b1.mapValuesInPlace((_, c) => c - d)
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val items = buf.keys.toArray
    java.util.Arrays.sort(items, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    new GenericArrayData(items.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val bytes = entries.map(_._1.getBytes)
    val bb = ByteBuffer.allocate(4 + bytes.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(b: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(b)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[UTF8String, Long]
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val dst = new Array[Byte](len)
      bb.get(dst)
      buf.update(UTF8String.fromBytes(dst), bb.getLong)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsSketch =
    copy(child = newChildren.head)
}

package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Shared deterministic affine MinHash family over a 31-bit prime.
  * Fixed constants → signatures are stable across runs, partitions and
  * engines (a resumable-pipeline requirement). */
object MinHashFamily {
  val P = 2147483647L
  val Params: Array[(Long, Long)] = Array(
    (2654435761L, 104729L), (2246822519L, 130043L), (3266489917L, 2038074743L),
    (668265263L, 999983L), (374761393L, 31337L), (2166136261L, 8191L),
    (16777619L, 524287L), (1099511628211L % P, 6700417L),
    (40503L, 2147483629L), (65599L, 179424673L), (131071L, 15485863L),
    (524287L, 982451653L), (2654435769L, 57885161L), (97L, 32452843L),
    (8527L, 49979687L), (279470273L, 67867967L))
  val NumHashes: Int = Params.length

  /** i-th hash of an already-reduced base hash (0 <= h < P). */
  @inline def hash(i: Int, h: Long): Long = {
    val (a, b) = Params(i)
    val v = ((a % P) * h + b) % P
    if (v < 0) v + P else v
  }
}

/** Single-pass MinHash signature aggregate.
  *
  * Input: one pre-reduced shingle hash per row (long in [0, P));
  * output: array<long> of 16 component-wise minima. A
  * TypedImperativeAggregate keeps the whole signature in one mutable
  * buffer — one buffer update per row instead of 16 separate min-agg
  * expressions — and merges partial buffers element-wise, so the
  * map-side combine property that makes minhash scale is explicit.
  */
case class MinHashSignature(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig expects bigint, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(MinHashFamily.NumHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < buf.length) {
        val hv = MinHashFamily.hash(i, h)
        if (hv < buf(i)) buf(i) = hv
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSignature =
    copy(child = newChildren.head)
}

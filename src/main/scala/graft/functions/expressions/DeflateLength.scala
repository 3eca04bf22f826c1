package graft.functions.expressions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JVM-side deflate kernel. A `ThreadLocal` Deflater is reset per call —
  * zlib stream setup is the expensive part, and task threads are
  * long-lived, so the hot path is pure compression. (Scala objects emit
  * static forwarders, so generated Java calls this directly.) */
object DeflateUtil {
  private val local = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(Deflater.DEFAULT_COMPRESSION, true)
  }

  def deflatedLength(bytes: Array[Byte]): Long = {
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val scratch = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(scratch)
    total
  }
}

/** `graft_deflate_len(text|binary)` → deflated byte length.
  *
  * The compression-ratio quality signal LLM corpus pipelines use
  * alongside the statistical gates: natural prose deflates to a
  * mid-range fraction of its size, while degenerate boilerplate
  * (repeated spans, template spam) collapses toward zero and
  * already-compressed/random payloads stay near one. Exposing the raw
  * deflated LENGTH (not a ratio) keeps the expression orthogonal — the
  * caller divides by `octet_length` — and meaningful for binary columns
  * too (multimodal payload entropy probe).
  *
  * Codegen calls the static kernel directly, so consumers stay inside
  * whole-stage codegen; per-row cost is the deflate itself (~30 MB/s/core
  * worst case), which at 100 TB argues for running it once per document
  * in the same scan as the other map-only quality metrics — exactly how
  * operators.TextOps.compressRatio uses it.
  */
case class DeflateLength(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_len expects string or binary, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val bytes = child.dataType match {
      case StringType => v.asInstanceOf[UTF8String].getBytes
      case _          => v.asInstanceOf[Array[Byte]]
    }
    DeflateUtil.deflatedLength(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val toBytes = child.dataType match {
      case StringType => ".getBytes()"
      case _          => ""
    }
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.DeflateUtil.deflatedLength($c$toBytes)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

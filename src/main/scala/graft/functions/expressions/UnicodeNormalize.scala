package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JVM-side Unicode normalization kernel.
  *
  * `isNormalized` is checked first: real corpora are overwhelmingly
  * already-NFC (all-ASCII text trivially so), and the check is a scan
  * without allocation — the normalize path with its String round-trip
  * only runs on the rows that actually need rewriting. */
object NormalizeUtil {
  private val forms = Normalizer.Form.values()

  def normalize(s: UTF8String, formOrdinal: Int): UTF8String = {
    val form = forms(formOrdinal)
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}

/** `graft_normalize(text[, 'NFC'|'NFD'|'NFKC'|'NFKD'])` → normalized text.
  *
  * Unicode normalization is step zero of any multilingual corpus
  * pipeline — the same visible string has many codepoint spellings
  * (é as U+00E9 vs e+U+0301), and every downstream exact-dedup hash,
  * shingle, and token count silently fractures across them unless the
  * corpus is canonicalized first. The reference normalizes free-text
  * fields at ingest (etl_service.py's clean/normalize pass is the
  * ASCII-era analogue); at 100 TB the operation must be a map-only
  * codegen'd kernel in the same scan as the other per-document
  * transforms — which is what a native Expression gives and a Scala UDF
  * (ser/deser per row, codegen barrier) does not.
  *
  * Spark itself ships no normalization function; this fills that gap.
  * Form defaults to NFC (the interchange canonical form); NFKC is the
  * usual choice before tokenization (folds width/compatibility
  * variants).
  */
case class UnicodeNormalize(child: Expression, formName: String = "NFC")
    extends UnaryExpression {

  private val formOrdinal: Int =
    try Normalizer.Form.valueOf(formName).ordinal
    catch { case _: IllegalArgumentException => -1 }

  override def checkInputDataTypes(): TypeCheckResult =
    if (formOrdinal < 0)
      TypeCheckResult.TypeCheckFailure(
        s"graft_normalize form must be one of NFC/NFD/NFKC/NFKD, got $formName")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_normalize expects string, got ${other.catalogString}")
    }

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    NormalizeUtil.normalize(v.asInstanceOf[UTF8String], formOrdinal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.NormalizeUtil.normalize($c, $formOrdinal)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

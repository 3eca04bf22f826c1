package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Deterministic random-hyperplane family shared by every LSH consumer
  * (Knn.lshBuckets, Dedup.embedCosineLsh) so blockers agree across
  * operators and across runs — the property a resumable pipeline needs.
  * Fixed LCG; each plane draws `Dims` ±1 components in sequence, so the
  * first k planes are identical no matter how many a consumer asks for.
  */
object HyperplaneFamily {
  val Dims = 64
  val MaxPlanes = 1024
  lazy val planes: Array[Array[Double]] = {
    var state = 0x9E3779B97F4A7C15L
    def next(): Long = {
      state = state * 6364136223846793005L + 1442695040888963407L
      state
    }
    Array.fill(MaxPlanes)(
      Array.fill(Dims)(if ((next() >>> 32) % 2 == 0) 1.0 else -1.0))
  }
}

/** Native codegen'd LSH signature: `numBands` band hashes of
  * `planesPerBand` sign bits each over the shared hyperplane family,
  * returned as array<long> (band b uses planes [b·r, (b+1)·r)).
  *
  * Why an expression and not plane-literal column math: a wide signature
  * (16 bands × 16 planes = 256 planes × 64 dims) as per-plane
  * DotProduct(col, array-literal) calls puts ~16k literal doubles into
  * the plan — megabytes of codegen source that falls out of whole-stage
  * compilation. Here the family sits in `ctx.references` once and the
  * generated kernel is three tight loops.
  */
object HyperplaneBands {
  /** Shared SQL-registration builder (Registry + GraftExtensions):
    * validates that the band/plane arguments are integer literals and
    * raises a typed, named error instead of an opaque NPE/cast
    * failure. */
  def build(exprs: Seq[Expression]): HyperplaneBands = {
    def intArg(e: Expression, role: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
      case other => throw new IllegalArgumentException(
        s"graft_hplane_bands: $role must be an integer literal, got $other")
    }
    HyperplaneBands(exprs(0), intArg(exprs(1), "numBands"),
                    intArg(exprs(2), "planesPerBand"))
  }
}

case class HyperplaneBands(child: Expression, numBands: Int,
                           planesPerBand: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      if (numBands < 1 || planesPerBand < 1 || planesPerBand > 63)
        TypeCheckResult.TypeCheckFailure(
          s"graft_hplane_bands: need 1<=planesPerBand<=63 and numBands>=1, " +
            s"got bands=$numBands planes=$planesPerBand")
      else if (numBands * planesPerBand > HyperplaneFamily.MaxPlanes)
        TypeCheckResult.TypeCheckFailure(
          s"graft_hplane_bands: ${numBands * planesPerBand} planes exceed " +
            s"the family size ${HyperplaneFamily.MaxPlanes}")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hplane_bands expects array<float|double>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val planes = HyperplaneFamily.planes
    val n = math.min(v.numElements(), HyperplaneFamily.Dims)
    val sigs = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var sig = 0L
      var i = 0
      while (i < planesPerBand) {
        val p = planes(b * planesPerBand + i)
        var s = 0.0
        var j = 0
        while (j < n) {
          s += (if (isF) v.getFloat(j).toDouble else v.getDouble(j)) * p(j)
          j += 1
        }
        if (s >= 0) sig |= (1L << i)
        i += 1
      }
      sigs(b) = sig
      b += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val planesRef = ctx.addReferenceObj("hplanes", HyperplaneFamily.planes,
      "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val sigs = ctx.freshName("sigs"); val n = ctx.freshName("n")
      val b = ctx.freshName("b"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val s = ctx.freshName("s")
      val p = ctx.freshName("p"); val sig = ctx.freshName("sig")
      s"""
        long[] $sigs = new long[$numBands];
        int $n = java.lang.Math.min($v.numElements(), ${HyperplaneFamily.Dims});
        for (int $b = 0; $b < $numBands; $b++) {
          long $sig = 0L;
          for (int $i = 0; $i < $planesPerBand; $i++) {
            double[] $p = $planesRef[$b * $planesPerBand + $i];
            double $s = 0.0;
            for (int $j = 0; $j < $n; $j++) {
              $s += ((double) $v.$get($j)) * $p[$j];
            }
            if ($s >= 0) $sig |= (1L << $i);
          }
          $sigs[$b] = $sig;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);"""
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

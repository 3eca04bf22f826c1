package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math as pure Column composition (higher-order
  * functions over `array<float>` columns — no UDFs, stays codegen'd).
  *
  * Floats are widened to double *before* any arithmetic so results are
  * bit-identical to the DuckDB oracle (which computes list math in
  * double); both engines then fold left-to-right over the array.
  */
object VectorFunctions {

  /** array<float> → array<double>. */
  def widen(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product of two equal-length double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
}

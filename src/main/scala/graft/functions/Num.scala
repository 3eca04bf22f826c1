package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Cross-engine-stable rounding.
  *
  * Spark's `round()` converts the double through `Double.toString` and
  * half-up rounds the decimal string; DuckDB rounds the binary value.
  * For boundary values (e.g. 189/40 = 4.725) they disagree by one ulp of
  * the last digit. `rnd` instead computes floor(x*10^k + 0.5)/10^k in
  * plain double arithmetic — bit-identical in any IEEE-754 engine, so
  * Spark results hash-match the DuckDB oracle for every input. The
  * oracles use the same floor formulation (SURVEY §5).
  */
object Num {
  def rnd(c: Column, digits: Int): Column = {
    val f = math.pow(10, digits)
    floor(c * f + lit(0.5)) / f
  }
}

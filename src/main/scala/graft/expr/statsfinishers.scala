package graft.expr

import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Catalyst-level builders for the summary_stats finishers, used by the SQL
  * function registry (the Column DSL variants in graft.api.functions compile
  * to the same arithmetic). Field extraction is left unresolved so the
  * analyzer resolves + type-coerces it against the actual struct, and the
  * repeated aggregate child dedups in the Aggregate operator. */
object StatsFinishers {
  private def fld(st: Expression, n: String): Expression =
    UnresolvedExtractValue(st, Literal(n))
  private def d(x: Double): Expression = Literal(x)
  private val nan: Expression = Literal(Double.NaN)

  private def emptyGuard(st: Expression, res: Expression): Expression =
    If(EqualTo(fld(st, "count"), Literal(0L)), nan, res)

  def mean(st: Expression): Expression =
    emptyGuard(st, Divide(fld(st, "sum"), Cast(fld(st, "count"), DoubleType)))

  // IEEE division via pow(denom, -1): count == ddof → ±Inf/NaN (the
  // reference's C semantics) instead of an ANSI-mode DIVIDE_BY_ZERO error
  def variance(st: Expression, ddof: Int): Expression =
    emptyGuard(st, Multiply(fld(st, "m2"),
      Pow(Cast(Subtract(fld(st, "count"), Literal(ddof.toLong)), DoubleType),
        Literal(-1.0))))

  def std(st: Expression, ddof: Int): Expression = Sqrt(variance(st, ddof))

  /** g1 = m3/m2^1.5 (0 when m2==0); bias=false applies the sample correction
    * sqrt(n(n−1))/(n−2); NaN when the stream was homogeneous
    * (stats_stubs.c:113-123). */
  def skew(st: Expression, bias: Boolean): Expression = {
    val n = Cast(fld(st, "count"), DoubleType)
    val m2 = Divide(fld(st, "m2"), n)
    val m3 = Divide(fld(st, "m3"), n)
    val g1 = If(EqualTo(m2, d(0.0)), d(0.0), Divide(m3, Multiply(Sqrt(m2), m2)))
    val res =
      if (bias) g1
      else If(And(GreaterThan(n, d(2.0)), GreaterThan(m2, d(0.0))),
        Multiply(Divide(Sqrt(Multiply(Subtract(n, d(1.0)), n)), Subtract(n, d(2.0))), g1),
        g1)
    If(fld(st, "homogeneous"), nan, res)
  }

  /** g2 = m4/m2² (0 when m2==0); bias=false correction
    * ((n²−1)g2 − 9n + 15)/((n−2)(n−3)); fisher subtracts 3
    * (stats_stubs.c:126-136). */
  def kurt(st: Expression, fisher: Boolean, bias: Boolean): Expression = {
    val n = Cast(fld(st, "count"), DoubleType)
    val m2 = Divide(fld(st, "m2"), n)
    val m4 = Divide(fld(st, "m4"), n)
    val g2 = If(EqualTo(m2, d(0.0)), d(0.0), Divide(m4, Multiply(m2, m2)))
    val corrected =
      if (bias) g2
      else If(And(GreaterThan(n, d(3.0)), GreaterThan(m2, d(0.0))),
        Divide(
          Add(Subtract(Multiply(Subtract(Multiply(n, n), d(1.0)), g2),
            Multiply(d(9.0), n)), d(15.0)),
          Multiply(Subtract(n, d(2.0)), Subtract(n, d(3.0)))),
        g2)
    val res = if (fisher) Subtract(corrected, d(3.0)) else corrected
    If(fld(st, "homogeneous"), nan, res)
  }
}

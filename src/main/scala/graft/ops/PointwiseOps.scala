package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pointwise scalar transforms (SURVEY §2.2). All pure `Column → Column`
  * so they stay inside whole-stage codegen — no UDFs, no shuffles.
  *
  * Reference semantics: views_2.py:26-80 (thresholds), :279-293 (decay),
  * :308-319 (ln), multi_column.py:5-46 (two-column arithmetic),
  * identity.py:3-7.
  */
object PointwiseOps {

  /** `(s >= v).astype(int)` — views_2.py:26-42. */
  def greaterOrEqual(c: Column, v: Double): Column =
    when(c >= v, 1).otherwise(0)

  /** `(s <= v).astype(int)` — views_2.py:44-60. */
  def smallerOrEqual(c: Column, v: Double): Column =
    when(c <= v, 1).otherwise(0)

  /** 1 iff low <= s <= high — views_2.py:62-80. */
  def inRange(c: Column, low: Double, high: Double): Column =
    when(c.between(low, high), 1).otherwise(0)

  /** log(1 + s) — views_2.py:308-319 (named `ln` but computes log1p). */
  def ln(c: Column): Column = log1p(c)

  /** 2^(−s/halflife) exponential decay — views_2.py:279-293. */
  def decay(c: Column, halflife: Double): Column =
    pow(lit(2.0), (c * -1.0) / halflife)

  /** Two-column arithmetic — multi_column.py:5-46. */
  def addColumn(a: Column, b: Column): Column = a + b
  def subtractColumn(a: Column, b: Column): Column = a - b
  def multiplyColumn(a: Column, b: Column): Column = a * b

  /** Division with NumPy's zero semantics (±inf, 0/0 → NaN): the
    * reference has no zero guard (multi_column.py:38-46) and Spark 4's
    * default ANSI mode would otherwise throw on a zero divisor. The
    * `when` guard keeps the engine division on the non-zero branch only.
    */
  def divideColumn(a: Column, b: Column): Column =
    when(b === 0.0,
      when(a > 0.0, Double.PositiveInfinity)
        .when(a < 0.0, Double.NegativeInfinity)
        .otherwise(Double.NaN))
      .otherwise(a / b)
}

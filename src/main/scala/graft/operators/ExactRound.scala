package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Engine-portable fixed-point rounding of exact rationals.
 *
 * `round(x, 6)` on a double is NOT portable across engines when x is an
 * exact rational quotient: a value like 105/128 = 0.8203125 sits exactly
 * on the 6-dp half boundary, and Spark (BigDecimal HALF_UP over the
 * shortest-decimal repr) and a given DuckDB build (binary-double scaling)
 * may break the tie differently. Three gate regressions over two rounds
 * (q200/q204 round 9, q260 round 10) were exactly this class;
 * `tools/portability_audit.py` detects it by ±2-ulp perturbation.
 *
 * The portable form keeps the rounding in integer arithmetic: for an
 * exact integer numerator `num` (any sign) and positive integer
 * denominator `den`, the half-away-from-zero rounding of num/den at
 * scale 0 is
 *
 *   sign(num) · ⌊(2·|num| + den) / (2·den)⌋
 *
 * — every operation exact in DECIMAL(38,0), bit-identical in any engine.
 * Callers pre-scale the numerator by 10^s to round at s decimal places
 * (the `_micro` convention: s = 6). The DuckDB oracle mirror is
 * `sign · ((2*abs(num) + den) // (2*den))` on BIGINT/HUGEINT.
 */
object ExactRound {

  private val big = DecimalType(38, 0)

  /** Half-away-from-zero rounding of the exact rational num/den as a
    * LongType column. `num` may be negative; `den` must be positive.
    * Operands are cast to DECIMAL(38,0) — pass pre-scaled integers. */
  def halfAwayDiv(num: Column, den: Column): Column = {
    val n = num.cast(big)
    val d = den.cast(big)
    val mag = call_function("div",
      (abs(n) * lit(2).cast(big) + d).cast(big),
      (d * lit(2).cast(big)).cast(big))
    when(n < 0, -mag).otherwise(mag).cast(LongType)
  }

  /** `_micro` convenience: half-away rounding of (num/den) at 6 decimal
    * places where `num` is an UNSCALED exact value (e.g. a DECIMAL(38,6)
    * sum) and `den` a positive integer: the numerator is scaled by 10^6
    * first, exactly in decimal arithmetic. */
  def microOfRatio(num: Column, den: Column): Column =
    halfAwayDiv(
      (num.cast(DecimalType(38, 6)) * lit(1000000L).cast(big)).cast(big),
      den)
}

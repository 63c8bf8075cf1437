package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Jaro–Winkler similarity kernel (Winkler 1990): the record-linkage
 * string metric that rewards shared prefixes — the standard scorer for
 * short-field entity resolution (names, titles, keys) where Levenshtein
 * over-penalizes transpositions.
 *
 * Definition matched here (and by DuckDB's `jaro_winkler_similarity`,
 * which the q165 oracle verifies bit-for-bit after 6-dp rounding):
 * match window = max(0, ⌊max(|a|,|b|)/2⌋ − 1); transpositions = half the
 * out-of-order matched pairs; jaro = (m/|a| + m/|b| + (m−t)/m)/3; the
 * Winkler boost jaro + ℓ·0.1·(1−jaro) applies when jaro > 0.7 with ℓ =
 * common prefix capped at 4. Window 0 (short strings) admits only
 * same-position matches — 'ab' vs 'ba' scores 0, matching DuckDB.
 *
 * O(|a|·window) time, two boolean scratch arrays — callers bound the
 * input (prefix slice) and candidate volume (blocked pairs), exactly as
 * with Levenshtein verification.
 *
 * Unit of comparison: Unicode CODE POINTS, not UTF-16 code units — a
 * non-BMP character (emoji, rare CJK) counts as ONE symbol for lengths,
 * the match window, and the prefix bonus, so the score is independent of
 * the string's in-memory encoding. (Engines differ here: a byte- or
 * code-unit-based implementation splits astral characters in two. The
 * q165 bit-for-bit DuckDB parity contract is stated — and gate-verified —
 * over ASCII keys, where every convention coincides.)
 */
object JaroWinkler {
  /** Static entry point shared by interpreted eval and generated code. */
  def compute(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString.codePoints().toArray
    val s2 = b.toString.codePoints().toArray
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0 && n2 == 0) return 1.0
    if (n1 == 0 || n2 == 0) return 0.0
    val window = math.max(0, math.max(n1, n2) / 2 - 1)
    val m1 = new Array[Boolean](n1)
    val m2 = new Array[Boolean](n2)
    var m = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true
          m2(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / n1 + md / n2 + (md - t / 2) / md) / 3.0
    if (jaro > 0.7) {
      val cap = math.min(4, math.min(n1, n2))
      var p = 0
      while (p < cap && s1(p) == s2(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

/** jaro_winkler(a, b): Jaro–Winkler similarity of two strings in [0, 1]. */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "jaro_winkler"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def foldable: Boolean = children.forall(_.foldable)

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

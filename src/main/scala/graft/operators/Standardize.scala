package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/**
 * Per-stratum z-score standardization and outlier flagging — the feature
 * normalization / anomaly-gate step: each value is re-expressed in
 * standard deviations from its stratum's mean, and |z| ≥ σ flags the
 * rows a quality pipeline quarantines.
 *
 * Determinism: the stratum moments come from 6-dp-decimal sums of the
 * value and its square (order-independent, engine-portable — the
 * project's float-sum rule), population variance = E[x²] − E[x]², and
 * the final z is rounded to 6 dp. Every arithmetic step is written
 * identically in the DuckDB oracle.
 *
 * Shape: one metadata-scale per-stratum moments aggregate broadcast back
 * onto the scan, then a narrow codegen'd projection. The corpus is never
 * shuffled.
 */
object Standardize {

  /** Appends `mean`, `std` (population), `z` (6 dp) and `is_outlier`
    * (|z| ≥ sigma) per row, computed within `strataCol`. */
  def zScores(df: DataFrame, valueCol: String, strataCol: String,
              sigma: Double = 3.0): DataFrame = {
    require(sigma > 0, s"sigma must be positive: $sigma")
    val v = col(valueCol).cast(DoubleType)
    val stats = df.groupBy(col(strataCol)).agg(
      count(lit(1)).as("graft_n"),
      sum(round(v, 6).cast(DecimalType(18, 6))).as("graft_s1"),
      sum(round(v * v, 6).cast(DecimalType(28, 6))).as("graft_s2"))
    val mean = col("graft_s1").cast(DoubleType) / col("graft_n")
    // clamp at zero: the 6-dp-rounded square sums can push E[x²]−E[x]²
    // marginally negative for near-constant small-magnitude strata, and
    // sqrt of a negative is NaN here but an ERROR in DuckDB — the clamp
    // keeps both engines on the zero-variance path (z = NULL, from
    // double division by zero) instead
    val variance = greatest(
      col("graft_s2").cast(DoubleType) / col("graft_n") - mean * mean,
      lit(0.0))
    df.join(broadcast(stats), Seq(strataCol))
      .withColumn("mean", round(mean, 6))
      .withColumn("std", round(sqrt(variance), 6))
      .withColumn("z", round((v - mean) / sqrt(variance), 6))
      .withColumn("is_outlier", abs(col("z")) >= sigma)
      .drop("graft_n", "graft_s1", "graft_s2")
  }

  /**
   * Per-stratum simple linear regression (OLS): slope and intercept of
   * y on x within each stratum — the per-group trend line ("does quality
   * fall with length, per language?"). The sufficient statistics
   * (n, Σx, Σy, Σxy, Σx²) are 6-dp-decimal sums — order-independent,
   * engine-portable, and mergeable across batches like every semigroup
   * aggregate here — and the closed forms are evaluated in one fixed
   * association. The intercept is derived from the ROUNDED slope so both
   * engines agree bit-for-bit. A degenerate stratum (zero x-variance)
   * yields NULL slope/intercept via double division by zero, same in
   * both engines.
   *
   * Shape: ONE map-side-combinable hash-agg over the corpus; the closed
   * forms run on strata rows (metadata scale).
   */
  def groupOls(df: DataFrame, xCol: String, yCol: String,
               strataCol: String): DataFrame = {
    val x = col(xCol).cast(DoubleType)
    val y = col(yCol).cast(DoubleType)
    val stats = df.groupBy(col(strataCol)).agg(
      count(lit(1)).as("n"),
      sum(round(x, 6).cast(DecimalType(28, 6))).as("graft_sx"),
      sum(round(y, 6).cast(DecimalType(28, 6))).as("graft_sy"),
      sum(round(x * y, 6).cast(DecimalType(28, 6))).as("graft_sxy"),
      sum(round(x * x, 6).cast(DecimalType(28, 6))).as("graft_sxx"))
    val n = col("n").cast(DoubleType)
    val sx = col("graft_sx").cast(DoubleType)
    val sy = col("graft_sy").cast(DoubleType)
    val sxy = col("graft_sxy").cast(DoubleType)
    val sxx = col("graft_sxx").cast(DoubleType)
    stats
      .withColumn("slope",
        round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6))
      .withColumn("intercept", round((sy - col("slope") * sx) / n, 6))
      .select(col(strataCol), col("n"), col("slope"), col("intercept"))
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Column-level table profiling — the ANALYZE / data-card step every corpus
 * ingest runs before anything else: row/null/distinct counts and min/max
 * per column, rendered canonically so the profile itself is
 * engine-portable and diffable across snapshots.
 *
 * Scale shape: the naive implementation scans the table once PER COLUMN
 * (k aggregate jobs unioned); at 100 TB each extra pass is the whole cost.
 * Here the table is melted ONCE — each input row explodes into one
 * (col_name, repr, numeric) row per profiled column via a single `inline`
 * projection — and everything aggregates in one pass. Partial (map-side)
 * aggregation applies, and the distinct count shuffles on
 * (col_name, repr), so no single column's values concentrate in one task.
 *
 * Canonical rendering (shared with the DuckDB oracle): integers verbatim,
 * floating-point as 6-dp DECIMAL(18,6) strings (the project-wide float
 * determinism rule), strings as-is. Numeric min/max come from typed
 * carrier columns, not the rendered string (lexicographic "10" < "9"
 * would corrupt them); distinct counts are over the canonical repr and
 * exclude NULLs (documented, matches `COUNT(DISTINCT)`).
 */
object Profiling {

  /** One output row per profiled column:
    * (col_name, n_rows, n_null, n_distinct, min_repr, max_repr). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val byName = df.schema.fields.map(f => f.name -> f).toMap
    val missing = cols.filterNot(byName.contains)
    require(missing.isEmpty, s"profile: columns not in schema: $missing")
    val fields = cols.map(byName)

    def repr(f: StructField): Column = f.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        col(f.name).cast(StringType)
      case DoubleType | FloatType | _: DecimalType =>
        round(col(f.name).cast(DoubleType), 6)
          .cast(DecimalType(18, 6)).cast(StringType)
      case StringType => col(f.name)
      case _ => col(f.name).cast(StringType)
    }
    // typed carriers for numeric min/max: int64 stays exact past 2^53;
    // decimals ride the double carrier (lexicographic "10" < "9" on the
    // string repr is exactly what the carriers exist to prevent)
    def longOrNull(f: StructField): Column = f.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        col(f.name).cast(LongType)
      case _ => lit(null).cast(LongType)
    }
    def dblOrNull(f: StructField): Column = f.dataType match {
      case DoubleType | FloatType | _: DecimalType =>
        col(f.name).cast(DoubleType)
      case _ => lit(null).cast(DoubleType)
    }
    def kind(f: StructField): Int = f.dataType match {
      case ByteType | ShortType | IntegerType | LongType => 1
      case DoubleType | FloatType | _: DecimalType => 2
      case _ => 0
    }

    val melted = df.select(inline(array(fields.map { f =>
      struct(
        lit(f.name).as("col_name"),
        repr(f).as("graft_repr"),
        longOrNull(f).as("graft_l"),
        dblOrNull(f).as("graft_d"),
        lit(kind(f)).as("graft_kind"))
    }: _*)))

    def render(l: Column, d: Column, s: Column): Column =
      when(col("graft_kind") === 1, l.cast(StringType))
        .when(col("graft_kind") === 2,
          round(d, 6).cast(DecimalType(18, 6)).cast(StringType))
        .otherwise(s)

    melted.groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("graft_repr").isNull, 1L).otherwise(0L)).as("n_null"),
        count_distinct(col("graft_repr")).as("n_distinct"),
        min(col("graft_l")).as("graft_lmn"), max(col("graft_l")).as("graft_lmx"),
        min(col("graft_d")).as("graft_dmn"), max(col("graft_d")).as("graft_dmx"),
        min(col("graft_repr")).as("graft_smn"),
        max(col("graft_repr")).as("graft_smx"),
        first(col("graft_kind")).as("graft_kind"))
      .select(col("col_name"), col("n_rows"), col("n_null"), col("n_distinct"),
        render(col("graft_lmn"), col("graft_dmn"), col("graft_smn"))
          .as("min_repr"),
        render(col("graft_lmx"), col("graft_dmx"), col("graft_smx"))
          .as("max_repr"))
  }

  /**
   * Functional-dependency audit: groups violating the rule "`lhsCols`
   * determines `rhsCol`" — the data-quality constraint check behind
   * "every order has one status" / "a document's source implies its
   * language". Output one row per violating LHS group with its row
   * count, the number of distinct RHS values observed (> 1 = violation),
   * and the min/max RHS as witnesses of the conflict.
   *
   * Scale shape: ONE hash aggregation keyed on the LHS; the distinct
   * count shuffles two-phase on (lhs, rhs) with map-side partials, so a
   * hot LHS group never concentrates its raw rows in one task. NULL RHS
   * values are excluded from the distinct (COUNT DISTINCT semantics);
   * an all-NULL group therefore never reports as a violation.
   */
  /**
   * Profile drift between two snapshots of the same table: the old and
   * new [[profile]]s full-outer-joined per column with integer deltas —
   * the schema/data-drift alarm an incremental pipeline checks before
   * trusting a refresh ("did null-ness spike? did a column collapse to
   * one value?"). Each side costs its one melted pass; the join is
   * |cols| rows, metadata-scale. Integer-exact throughout (deltas of
   * counts); min/max reprs ride along for eyeballing.
   */
  def profileDiff(oldDf: DataFrame, newDf: DataFrame,
                  cols: Seq[String]): DataFrame = {
    val o = profile(oldDf, cols).select(col("col_name"),
      col("n_rows").as("old_rows"), col("n_null").as("old_null"),
      col("n_distinct").as("old_distinct"))
    val n = profile(newDf, cols).select(col("col_name"),
      col("n_rows").as("new_rows"), col("n_null").as("new_null"),
      col("n_distinct").as("new_distinct"))
    o.join(n, Seq("col_name"), "full_outer")
      .select(col("col_name"),
        col("old_rows"), col("new_rows"),
        (col("new_rows") - col("old_rows")).as("d_rows"),
        col("old_null"), col("new_null"),
        (col("new_null") - col("old_null")).as("d_null"),
        col("old_distinct"), col("new_distinct"),
        (col("new_distinct") - col("old_distinct")).as("d_distinct"))
  }

  /**
   * Mutual information of two categorical columns, reported per X value:
   * the conditional entropy H(Y|X=x) and the MI contribution
   * Σ_y p(x,y)·ln(p(x,y)/(p(x)p(y))) — "how much does knowing the source
   * tell you about the language?", the feature-relevance measure behind
   * leakage hunts (a feature with MI ≈ H(Y) IS the label) and
   * stratification choices. Σ over x of mi_contrib = I(X;Y).
   *
   * Determinism: every term is a round-6 double of integer-count ratios
   * (libm ln — the [[TextAnalysis.wordEntropy]] idiom, gate-proven) and
   * sums as DECIMAL(18,6), order-independent. Shape: ONE corpus
   * hash-agg to the (x, y) contingency table; everything after runs on
   * |X|·|Y| rows — metadata scale, where the single-partition totals
   * window is free.
   */
  def mutualInformation(df: DataFrame, xCol: String,
                        yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = df.groupBy(col(xCol), col(yCol)).agg(count(lit(1)).as("graft_nxy"))
    val nxy = col("graft_nxy").cast(DoubleType)
    val nx = col("graft_nx").cast(DoubleType)
    val ny = col("graft_ny").cast(DoubleType)
    val n = col("graft_n").cast(DoubleType)
    c.withColumn("graft_nx", sum(col("graft_nxy")).over(
        Window.partitionBy(col(xCol))))
      .withColumn("graft_ny", sum(col("graft_nxy")).over(
        Window.partitionBy(col(yCol))))
      .withColumn("graft_n", sum(col("graft_nxy")).over(
        Window.partitionBy()))
      .withColumn("graft_h",
        round((nxy / nx) * log(nx / nxy), 6).cast(DecimalType(18, 6)))
      .withColumn("graft_mi",
        round((nxy / n) * log((nxy * n) / (nx * ny)), 6)
          .cast(DecimalType(18, 6)))
      .groupBy(col(xCol))
      .agg(max(col("graft_nx")).as("n"),
        count(lit(1)).as("n_y_values"),
        sum(col("graft_h")).cast(DoubleType).as("h_y_given_x"),
        sum(col("graft_mi")).cast(DoubleType).as("mi_contrib"))
  }

  def fdViolations(df: DataFrame, lhsCols: Seq[String],
                   rhsCol: String): DataFrame = {
    require(lhsCols.nonEmpty, "fdViolations: empty LHS")
    df.groupBy(lhsCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col(rhsCol)).as("n_distinct_rhs"),
        min(col(rhsCol)).as("rhs_min"),
        max(col(rhsCol)).as("rhs_max"))
      .filter(col("n_distinct_rhs") > 1)
  }

  /** Poisson(1) inverse-CDF thresholds for the bootstrap's multinomial
    * approximation — cumulative P(X ≤ k), k = 0..5; draws past the last
    * threshold clamp to weight 6. The literals are written identically
    * in the oracle SQL. */
  val poissonCdf1: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183)

  /**
   * Deterministic bootstrap confidence interval for the per-stratum mean
   * of an INTEGER column (Efron 1979, Poissonized resampling): replica
   * `b` re-weights each row by a Poisson(1) draw — the standard
   * approximation to multinomial resampling that needs NO global
   * coordination, which is what makes the bootstrap distributable —
   * and the CI is an exact rank selection over the `nReplicas` replica
   * means (2nd smallest / 2nd largest: a ~95% percentile interval at
   * 40 replicas).
   *
   * Determinism: draws come from salted md5 (u dyadic, thresholds
   * literal doubles, identical in the oracle); w·x products and their
   * sums stay int64 (integer contract like [[giniConcentration]]);
   * replica means are int/int double divisions; the rank selection
   * orders by (mean, replica) — total. Shape: a ×nReplicas narrow
   * fan-out, one (stratum, replica) agg, one metadata-scale window over
   * nReplicas rows per stratum.
   */
  def bootstrapMeanCI(df: DataFrame, valueCol: String, idCol: String,
                      strataCol: String, salt: String,
                      nReplicas: Int = 40): DataFrame = {
    require(nReplicas >= 4, s"nReplicas must be >= 4: $nReplicas")
    val u = (conv(substring(md5(concat_ws("_",
      concat(lit(salt), col("graft_b")), col(idCol))), 1, 12), 16, 10)
      .cast(LongType) + 1L).cast(DoubleType) / lit(281474976710656.0)
    val w = poissonCdf1.zipWithIndex.foldRight(lit(6L): Column) {
      case ((t, k), acc) => when(u < t, k.toLong).otherwise(acc)
    }
    val replicas = df
      .select(col(strataCol), col(idCol),
        col(valueCol).cast(LongType).as("graft_x"))
      .withColumn("graft_b",
        explode(sequence(lit(0), lit(nReplicas - 1))))
      .withColumn("graft_w", w)
      .groupBy(col(strataCol), col("graft_b"))
      .agg(sum(col("graft_w") * col("graft_x")).cast(LongType).as("graft_swx"),
        sum(col("graft_w")).cast(LongType).as("graft_sw"))
      // a replica can draw weight 0 for EVERY row of a tiny stratum
      // (probability e^{−n}); its mean would be NULL, and NULL sorts
      // FIRST in Spark's asc order but LAST in DuckDB's — drop such
      // replicas on both sides so the rank selection stays aligned
      .filter(col("graft_sw") > 0)
      .withColumn("graft_mean",
        col("graft_swx").cast(DoubleType) / col("graft_sw"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col("graft_mean"), col("graft_b"))
    val point = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(LongType)).cast(LongType).as("graft_sx"))
    replicas
      .withColumn("graft_rn", row_number().over(wRank))
      .groupBy(col(strataCol))
      .agg(min(when(col("graft_rn") === 2, col("graft_mean"))).as("graft_lo"),
        min(when(col("graft_rn") === nReplicas - 1, col("graft_mean")))
          .as("graft_hi"))
      .join(point, Seq(strataCol))
      .select(col(strataCol), col("n"),
        round(col("graft_sx").cast(DoubleType) / col("n"), 6).as("mean"),
        round(col("graft_lo"), 6).as("ci_lo"),
        round(col("graft_hi"), 6).as("ci_hi"))
  }

  /**
   * Benford first-digit audit per stratum (Newcomb 1881; Benford 1938):
   * observed vs expected counts of the leading significant digit, with
   * per-digit χ² contributions — the classic fabricated-numbers /
   * broken-ingestion tripwire for positive, scale-spanning amounts.
   *
   * The digit comes from the value's integer CENT representation
   * (round(100·v) → int64 → first character), sidestepping any
   * float-formatting differences between engines; expected counts are
   * n·log10(1+1/d) — the 9 log literals agree across engines and the
   * 6-dp output rounding absorbs the last-ulp — and a digit spine
   * (strata × 1..9) keeps zero-observation digits in the report, where
   * they are the loudest signal. One hash-agg + metadata-scale joins.
   */
  def benfordAudit(df: DataFrame, valueCol: String,
                   strataCol: String): DataFrame = {
    // Benford's law is defined for nonzero magnitudes: take |v| and
    // drop sub-cent/zero values BEFORE counting, so the digit-1..9
    // spine and the per-stratum total n cover the SAME population
    // (counting zeros into n but not the spine would bias every
    // expected count upward; a negative cent string would crash the
    // oracle's digit cast outright)
    val cents = round(abs(col(valueCol).cast(DoubleType)) * 100.0, 0)
      .cast(LongType)
    val obs = df
      .select(col(strataCol), cents.as("graft_cents"))
      .filter(col("graft_cents") >= 1L)
      .select(col(strataCol),
        substring(col("graft_cents").cast(StringType), 1, 1)
          .cast(LongType).as("digit"))
      .groupBy(col(strataCol), col("digit"))
      .agg(count(lit(1)).as("graft_o"))
    val totals = obs.groupBy(col(strataCol))
      .agg(sum(col("graft_o")).cast(LongType).as("n"))
    val spine = totals
      .withColumn("digit", explode(sequence(lit(1L), lit(9L))))
    val e = col("n").cast(DoubleType) *
      log10(lit(1.0) + lit(1.0) / col("digit").cast(DoubleType))
    spine.join(obs, Seq(strataCol, "digit"), "left")
      .withColumn("n_obs", coalesce(col("graft_o"), lit(0L)))
      .select(col(strataCol), col("digit"), col("n"), col("n_obs"),
        round(e, 6).as("n_expected"),
        round((col("n_obs").cast(DoubleType) - e) *
          (col("n_obs").cast(DoubleType) - e) / e, 6).as("chi2_term"))
  }

  /**
   * χ² test of homogeneity per stratum (Pearson 1900): does the
   * stratum's CATEGORICAL distribution match the corpus-wide one —
   * the categorical counterpart of `Standardize.ksDrift`'s numeric
   * two-sample test, for "did src7 suddenly stop sending German".
   * Expected cell counts are n_s·n_c/n; the statistic sums 6-dp-rounded
   * per-cell terms as decimals (order-free); zero-observation cells
   * enter via the category spine (they carry e, the evidence). All
   * counts int64; joins are metadata-scale.
   */
  def chiSquareDrift(df: DataFrame, strataCol: String,
                     catCol: String): DataFrame = {
    val cells = df.groupBy(col(strataCol), col(catCol))
      .agg(count(lit(1)).as("graft_o"))
    val strata = cells.groupBy(col(strataCol))
      .agg(sum(col("graft_o")).cast(LongType).as("graft_ns"))
    val cats = cells.groupBy(col(catCol))
      .agg(sum(col("graft_o")).cast(LongType).as("graft_nc"))
    val total = cells.agg(sum(col("graft_o")).cast(LongType).as("graft_n"))
    val e = col("graft_ns").cast(DoubleType) * col("graft_nc") /
      col("graft_n")
    val o = coalesce(col("graft_o"), lit(0L)).cast(DoubleType)
    strata.join(broadcast(cats)).join(broadcast(total))
      .join(cells, Seq(strataCol, catCol), "left")
      .withColumn("graft_term",
        round((o - e) * (o - e) / e, 6).cast(DecimalType(18, 6)))
      .groupBy(col(strataCol))
      .agg(max(col("graft_ns")).as("n"),
        (count(lit(1)) - 1).cast(LongType).as("dof"),
        round(sum(col("graft_term")).cast(DoubleType), 6).as("chi2"))
  }

  /**
   * k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala et
   * al. 2007): equivalence classes of the quasi-identifier columns with
   * FEWER than `k` members — the re-identification risk report a corpus
   * release runs before publishing — each with its l-diversity (distinct
   * sensitive values; a small class with l = 1 also leaks the sensitive
   * attribute outright). One hash-agg over the QI key; int64 counts.
   */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String],
                      sensitiveCol: String, k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2: $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("l_diversity"))
      .filter(col("n") < k)
  }

  /**
   * Gini concentration per stratum over an integer-valued column: 0 =
   * perfectly even, → 1 = one row holds everything — the inequality
   * audit for "is one source/day/producer dominating the corpus", the
   * scalar complement of [[Selection]]'s Pareto views.
   *
   * Uses the rank form Σ(2i − n − 1)·x_i / (n·Σx) over the ascending
   * (x, id) order, decomposed as 2·Σ(i·x) − (n+1)·Σx so the aggregate
   * needs no second pass for n — both sums are int64-exact for integer
   * x (i·x ≤ rows·max(x): bound documented, far under 2^63 here), and
   * the single closing division is one double ratio rounded to 6 dp.
   * Shape: one stratum rank window + one map-side-combinable agg.
   */
  def giniConcentration(df: DataFrame, valueCol: String, idCol: String,
                        strataCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col("graft_x"), col(idCol))
    val n = col("n")
    val sx = col("graft_sx")
    val six = col("graft_six")
    df.select(col(strataCol), col(idCol),
        col(valueCol).cast(LongType).as("graft_x"))
      .withColumn("graft_i", row_number().over(w))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n"),
        sum(col("graft_x")).cast(LongType).as("graft_sx"),
        sum(col("graft_i") * col("graft_x")).cast(LongType).as("graft_six"))
      .select(col(strataCol), n, sx.as("total"),
        when(sx > 0, round(
          (lit(2L) * six - (n + 1) * sx).cast(DoubleType) /
            (n * sx).cast(DoubleType), 6)).as("gini"))
  }

  /**
   * Join/shuffle-key skew audit: the top-`k` hottest values of a key
   * column with their row share and cumulative share, plus the global
   * key stats as constant columns — the measurement behind every
   * salting / broadcast / AQE-threshold decision ([[SkewJoin]]'s input:
   * a key owning >1/shuffle-partitions of the rows WILL bottleneck one
   * task). Cumulative share reads directly as "the 3 hottest keys carry
   * 40% of the table".
   *
   * Scale shape: one key-count hash-agg (map-side combinable), a 1-row
   * totals broadcast, and a TakeOrderedAndProject top-k — the cumulative
   * window then runs on k rows (metadata). Deterministic: ties rank by
   * key value.
   */
  def keySkewAudit(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, s"k=$k must be positive")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum(col("n")).as("graft_rows"),
      count(lit(1)).as("n_keys"))
    val topk = counts
      .orderBy(col("n").desc, col(keyCol).asc)
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col(keyCol).asc)
    topk
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_n", sum(col("n")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .crossJoin(broadcast(totals))
      .select(col("rank"), col(keyCol), col("n"),
        round(col("n").cast(DoubleType) /
          col("graft_rows").cast(DoubleType), 6).as("share"),
        round(col("cum_n").cast(DoubleType) /
          col("graft_rows").cast(DoubleType), 6).as("cum_share"),
        col("n_keys"), col("graft_rows").as("n_rows"))
  }

  /**
   * Dedup-policy audit — the census→configuration prescription of the
   * r16–r18 scale rounds encoded as a first-class operator (r18 verdict
   * item 3), so choosing between the lossless salt-split and the
   * bounded drop-cap is a GATED decision row, not prose a user must
   * find in operator docs. Input is any bucket census (one row per
   * occupied bucket with its member count — `TextDedup` band censuses,
   * `hammingSliceRows` slice censuses, `Similarity.lshBucketSizes`);
   * output is ONE row:
   *
   *   (n_buckets, n_rows, space_size, max_bucket, p50_bucket,
   *    p99_bucket, multiplicity_est, rec_cap, policy)
   *
   * Decision rule (the measured r17/r18 evidence, mechanized):
   *  - `max_bucket <= capTarget` → '''uncapped''' (rec_cap 0): no
   *    bucket exceeds the volume target; the plain collision join is
   *    already bounded.
   *  - space SATURATED (`spaceSize` given and n_rows >= spaceSize,
   *    i.e. expected occupancy >= 1 per possible bucket value — chance
   *    collisions dominate, q363's measured negative) →
   *    '''widen+drop-cap''': widen the signature to de-saturate
   *    (q371), then cap BELOW the duplication multiplicity so
   *    replicated piles drop outright instead of paying their
   *    (≤ cap)² pair output (the q376 rule; measured ×2.35 vs ×4.46
   *    at 5× densification). rec_cap = multiplicity_est − 1.
   *  - dominant-pile quadratic guard: max_bucket² > n_rows (the biggest
   *    pile's pairwise OUTPUT exceeds corpus-linear work) →
   *    '''exact-dedup+salt-split''' (rec_cap = capTarget): a lossless
   *    pairwise stage on that pile is output-quadratic no matter how
   *    the plan is shaped, so collapse identical content with exact
   *    dedup FIRST (O(pile)) and salt-split the residual. This branch
   *    is the r19 10× measurement mechanized: the text salt-split held
   *    ×2.91 at 10× (band pile max ~40, 40² ≪ 200k rows) while the
   *    embedding salt-split read ×19.04 (pile ~1770, 1770² ≫ 400k) —
   *    same operator, the pile size is what flips the regime.
   *  - otherwise (hot buckets in a roomy space — density comes from
   *    modest content replication, not hash saturation) →
   *    '''salt-split''' (rec_cap = capTarget): the lossless ⌈B/cap⌉
   *    sub-bucket split (q350/q358/q361/q362) bounds per-task fan-out
   *    with zero recall loss. Pass `spaceSize = None` for hash-valued
   *    buckets (md5 band hashes — effectively unbounded space,
   *    reported as 0).
   *
   * `multiplicity_est` is the lower-median bucket size among buckets
   * holding ≥ 2 members — the typical identical-signature pile; on the
   * 32-bit slice census at sf0.1 this reads 9, mechanically
   * reproducing q376's hand-chosen cap 8. p50/p99/max are published so
   * the skew ratio is readable; every emitted measure is an exact
   * integer (no ratio columns — the hashed surface stays trivially
   * engine-portable).
   *
   * Scale shape: the corpus-scale census collapses to a SIZE HISTOGRAM
   * in one map-side-combinable hash-agg (≤ max_bucket rows — metadata);
   * the exact rank picks (smallest size with 2·cum ≥ n, etc.) run as
   * cumulative windows over that metadata table, and the final row
   * assembles from 1-row broadcasts (the q285 shape).
   */
  def dedupPolicyAudit(census: DataFrame, sizeCol: String,
                       capTarget: Long,
                       spaceSize: Option[Long] = None): DataFrame = {
    require(capTarget >= 1, s"capTarget=$capTarget must be >= 1")
    spaceSize.foreach(s => require(s >= 1, s"spaceSize=$s must be >= 1"))
    val hist = census
      .groupBy(col(sizeCol).cast(LongType).as("graft_sz"))
      .agg(count(lit(1)).as("graft_nb"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("graft_sz"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val cum = hist.withColumn("graft_cum", sum(col("graft_nb")).over(w))
    val tot = hist.agg(
      coalesce(sum(col("graft_nb")), lit(0L)).as("n_buckets"),
      coalesce(sum(col("graft_sz") * col("graft_nb")), lit(0L))
        .as("n_rows"),
      coalesce(max(col("graft_sz")), lit(0L)).as("max_bucket"))
    val nOnly = tot.select(col("n_buckets").as("graft_n"))
    val p50 = cum.crossJoin(broadcast(nOnly))
      .filter(col("graft_cum") * 2 >= col("graft_n"))
      .agg(coalesce(min(col("graft_sz")), lit(0L)).as("p50_bucket"))
    val p99 = cum.crossJoin(broadcast(nOnly))
      .filter(col("graft_cum") * 100 >= col("graft_n") * 99)
      .agg(coalesce(min(col("graft_sz")), lit(0L)).as("p99_bucket"))
    val dhist = hist.filter(col("graft_sz") >= 2)
    val dcum = dhist.withColumn("graft_cum", sum(col("graft_nb")).over(w))
    val dtot = dhist.agg(
      coalesce(sum(col("graft_nb")), lit(0L)).as("graft_dn"))
    val mult = dcum.crossJoin(broadcast(dtot))
      .filter(col("graft_cum") * 2 >= col("graft_dn"))
      .agg(coalesce(min(col("graft_sz")), lit(0L))
        .as("multiplicity_est"))
    val saturated = spaceSize
      .map(s => col("n_rows") >= lit(s)).getOrElse(lit(false))
    tot.crossJoin(broadcast(p50)).crossJoin(broadcast(p99))
      .crossJoin(broadcast(mult))
      .select(
        col("n_buckets"), col("n_rows"),
        lit(spaceSize.getOrElse(0L)).as("space_size"),
        col("max_bucket"), col("p50_bucket"), col("p99_bucket"),
        col("multiplicity_est"),
        when(col("max_bucket") <= capTarget, lit(0L))
          .when(saturated, col("multiplicity_est") - 1)
          .otherwise(lit(capTarget)).as("rec_cap"),
        when(col("max_bucket") <= capTarget, lit("uncapped"))
          .when(saturated, lit("widen+drop-cap"))
          .when(col("max_bucket") * col("max_bucket") > col("n_rows"),
            lit("exact-dedup+salt-split"))
          .otherwise(lit("salt-split")).as("policy"))
  }

  /**
   * Per-source data card — the datasheet row a corpus release publishes
   * for every source (Datasheets for Datasets, Gebru et al. 2021, §composition;
   * the per-dump tables of the Pile / RefinedWeb / Dolma reports): doc
   * and token counts, language spread, exact-duplicate rate inside the
   * source, and the token-length distribution (median via exact
   * interpolated percentile — engine-portable on integer inputs since
   * rank arithmetic is rational and the interpolated value is at worst
   * a .5, exact in a double).
   *
   * Scale shape: ONE hash-agg keyed by source for everything except the
   * median, which rides Spark's `percentile` (two-phase, map-side
   * partials of per-source sorted sketches → exact merge). Distinct
   * counts shuffle on (source, value) with partial aggregation — no
   * hot-source concentration.
   */
  def sourceDataCard(docs: DataFrame, sourceCol: String, langCol: String,
                     textCol: String): DataFrame = {
    val nTok = size(split(col(textCol), " ")).cast(LongType)
    docs
      .select(col(sourceCol), col(langCol), col(textCol),
        nTok.as("graft_ntok"), md5(col(textCol)).as("graft_h"))
      .groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("graft_ntok")).as("n_tokens"),
        count_distinct(col(langCol)).as("n_langs"),
        sum(when(col(langCol) === "en", 1L).otherwise(0L)).as("n_en"),
        count_distinct(col("graft_h")).as("n_distinct_texts"),
        min(col("graft_ntok")).as("min_tokens"),
        expr("percentile(graft_ntok, 0.5)").as("graft_med"),
        max(col("graft_ntok")).as("max_tokens"))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        col("n_langs"),
        round(col("n_en").cast(DoubleType) /
          col("n_docs").cast(DoubleType), 6).as("en_frac"),
        col("n_distinct_texts"),
        round(lit(1.0) - col("n_distinct_texts").cast(DoubleType) /
          col("n_docs").cast(DoubleType), 6).as("exact_dup_frac"),
        col("min_tokens"),
        round(col("graft_med"), 6).as("median_tokens"),
        col("max_tokens"))
  }

  /**
   * Classifier reliability audit (the calibration / reliability-diagram
   * table, Niculescu-Mizil & Caruana ICML'05): bucket rows by score and
   * report each bucket's exact positive rate — a well-calibrated score
   * has positive rate rising monotonically with the bucket. Bucketing is
   * floor(score / width): the division is exact at the integer bucket
   * boundaries (the only places a ulp could flip the floor), so buckets
   * are engine-portable without any modulo-sign pitfalls. Output one row
   * per non-empty bucket: (bucket, n, n_pos, pos_ppm) — exact integers.
   *
   * Scale shape: ONE |buckets|-key hash agg (map-side combinable), a
   * narrow bucket projection — the corpus is never re-shuffled per
   * bucket.
   */
  def reliabilityBuckets(df: DataFrame, scoreCol: String, posCol: Column,
                         bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth=$bucketWidth out of range")
    df.select(
        floor(col(scoreCol).cast(DoubleType) / bucketWidth.toDouble)
          .cast(LongType).as("bucket"),
        when(posCol, 1L).otherwise(0L).as("graft_pos"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("graft_pos")).as("n_pos"))
      .select(col("bucket"), col("n"), col("n_pos"),
        expr("cast(n_pos * 1000000 as decimal(38,0)) div " +
          "cast(n as decimal(38,0))").cast(LongType).as("pos_ppm"))
  }

  /**
   * Leave-one-source-out corpus impact — the cheap data-ablation audit
   * run before committing to a mixture: for every source, what the
   * corpus would look like WITHOUT it, from per-source sufficient
   * statistics alone (no per-source recompute pass). Reports each
   * source's token share, the corpus mean document length with and
   * without the source (counterfactual mean from the complement sums),
   * and its vocabulary contribution — words NO other source supplies
   * (`vocab_excl`), the lexical diversity the corpus loses with the
   * source (Gururangan et al. 2020's domain-vocabulary argument, turned
   * into an exact audit).
   *
   * All ratios are ppm via DECIMAL(38,0) integral division of exact
   * counts — numerators/denominators are strictly positive, so floor
   * and truncation agree and the surface is engine-portable.
   *
   * Scale shape: ONE corpus pass for per-source (docs, tokens); one
   * exploded (source, word) DISTINCT pass collapsing to a word-keyed
   * agg (map-side combinable; cardinality = vocabulary, not corpus);
   * 1-row totals broadcast to the |sources|-row result. A source with
   * the whole corpus yields NULL counterfactual columns rather than a
   * division by zero.
   */
  def leaveOneOutImpact(docs: DataFrame, idCol: String, textCol: String,
                        sourceCol: String): DataFrame = {
    val big = "decimal(38,0)"
    val per = docs
      .select(col(sourceCol),
        size(split(col(textCol), " ")).cast(LongType).as("graft_nw"))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("graft_nw")).as("n_tokens"))
    val srcWords = docs
      .select(col(sourceCol),
        explode(split(col(textCol), " ")).as("graft_w"))
      .distinct()
    val wordSpread = srcWords.groupBy(col("graft_w"))
      .agg(count(lit(1)).as("graft_nsrc"), min(col(sourceCol)).as("graft_solo"))
    val excl = wordSpread.filter(col("graft_nsrc") === 1)
      .groupBy(col("graft_solo").as(sourceCol))
      .agg(count(lit(1)).as("vocab_excl"))
    val totals = per.agg(sum(col("n_docs")).as("graft_nn"),
        sum(col("n_tokens")).as("graft_tt"))
      .crossJoin(wordSpread.agg(count(lit(1)).as("graft_vv")))
    per
      .join(excl, Seq(sourceCol), "left")
      .na.fill(0L, Seq("vocab_excl"))
      .crossJoin(broadcast(totals))
      .withColumn("token_share_ppm",
        expr(s"cast(n_tokens * 1000000 as $big) div cast(graft_tt as $big)")
          .cast(LongType))
      .withColumn("mean_with_ppm",
        expr(s"cast(graft_tt * 1000000 as $big) div cast(graft_nn as $big)")
          .cast(LongType))
      .withColumn("mean_wo_ppm",
        when(col("graft_nn") > col("n_docs"),
          expr(s"cast((graft_tt - n_tokens) * 1000000 as $big) div " +
            s"cast(graft_nn - n_docs as $big)").cast(LongType)))
      .withColumn("delta_mean_ppm", col("mean_wo_ppm") - col("mean_with_ppm"))
      .withColumn("vocab_without", col("graft_vv") - col("vocab_excl"))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        col("token_share_ppm"), col("mean_with_ppm"), col("mean_wo_ppm"),
        col("delta_mean_ppm"), col("vocab_excl"), col("vocab_without"))
  }

  /**
   * Order-independent per-stratum content digest — the dataset-identity
   * fingerprint for snapshot reconciliation: two copies of a corpus
   * (different partitioning, different file layout, different row
   * order) carry the same digest iff they hold the same multiset of
   * rows. Each row hashes to a 64-bit value (md5 of the '|'-joined
   * column reprs, split into two exact 32-bit halves — no 64-bit double
   * parse, which would lose bits); the stratum digest is the SUM mod
   * 2⁶⁴, a commutative monoid, so accumulation order and partitioning
   * are irrelevant by construction — the property file checksums lack.
   *
   * Scale shape: one narrow hash projection + one stratum-keyed
   * map-side-combinable sum. Nothing else.
   */
  /** The per-row 64-bit digest value behind [[contentDigest]], exposed
    * so the streaming maintainer folds the IDENTICAL hash. */
  private[graft] def rowDigest64(cols: Seq[String]): Column = {
    require(cols.nonEmpty, "digest needs >= 1 column")
    val big = DecimalType(38, 0)
    val repr = concat_ws("|",
      cols.map(c => coalesce(col(c).cast(StringType), lit(" "))): _*)
    val h = md5(repr)
    val hi = conv(substring(h, 1, 8), 16, 10).cast(LongType)
    val lo = conv(substring(h, 9, 8), 16, 10).cast(LongType)
    hi.cast(big) * lit(4294967296L).cast(big) + lo.cast(big)
  }

  /**
   * Snapshot diff audit — the row-level companion to [[contentDigest]]:
   * [[contentDigest]] says WHETHER two snapshot copies differ; this
   * says HOW — per key, was the row added, removed, changed, or
   * unchanged between the old and new snapshot, rolled up to the four
   * counts. The reconciliation report every history/current dual-write
   * ([[graft.sources.Sinks]]) owes its consumers before a "current"
   * overwrite is trusted.
   *
   * Rows compare by the md5 of the same null-safe column repr the
   * digest uses, so diff and digest can never disagree about equality.
   * A duplicate-key snapshot is a CONTRACT VIOLATION and throws
   * (silently joining dup keys would miscount every class). So is a
   * NULL key: NULL ids never match in the full_outer join but DO count
   * in count(*) while countDistinct excludes them — one NULL-keyed row
   * would spuriously trip the dup guard and two would miscount as
   * added+removed — so NULL keys throw their own explicit error at
   * scan time instead of masquerading as either.
   *
   * Scale shape: two narrow (key, hash) projections, ONE full outer
   * join keyed by id, one 1-row aggregate. The dup guard rides the same
   * aggregate — no extra pass.
   */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "diff needs >= 1 compared column")
    def hashed(df: DataFrame, side: String) = {
      val sideName = if (side == "o") "old" else "new"
      df.select(
        coalesce(col(idCol), raise_error(lit(
          s"snapshotDiff: NULL key in the $sideName snapshot — the key " +
            "column must be non-null (NULL keys never join and would " +
            "corrupt every diff class)"))).as(idCol),
        md5(concat_ws("|",
          cols.map(c => coalesce(col(c).cast(StringType), lit(" "))): _*))
          .as(s"graft_h$side"))
    }
    val joined = hashed(oldDf, "o")
      .join(hashed(newDf, "n"), Seq(idCol), "full_outer")
    val agg = joined.agg(
      count(lit(1)).as("graft_rows"),
      countDistinct(col(idCol)).as("graft_keys"),
      sum(when(col("graft_ho").isNull, 1L).otherwise(0L)).as("n_added"),
      sum(when(col("graft_hn").isNull, 1L).otherwise(0L)).as("n_removed"),
      sum(when(col("graft_ho").isNotNull && col("graft_hn").isNotNull &&
        col("graft_ho") =!= col("graft_hn"), 1L).otherwise(0L))
        .as("n_changed"),
      sum(when(col("graft_ho") === col("graft_hn"), 1L).otherwise(0L))
        .as("n_unchanged"))
    agg.select(
      when(col("graft_rows") === col("graft_keys"),
        col("graft_rows")).as("n_keys"),
      col("n_added"), col("n_removed"), col("n_changed"),
      col("n_unchanged"))
      .withColumn("n_keys", coalesce(col("n_keys"),
        raise_error(lit("snapshotDiff: duplicate keys in a snapshot " +
          "side — key column must be unique per snapshot"))))
      .select(col("n_keys"), col("n_added"), col("n_removed"),
        col("n_changed"), col("n_unchanged"))
  }

  def contentDigest(df: DataFrame, strataCol: String,
                    cols: Seq[String]): DataFrame = {
    val big = DecimalType(38, 0)
    df.select(col(strataCol), rowDigest64(cols).as("graft_h"))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_rows"),
        pmod(sum(col("graft_h")),
          lit(new java.math.BigDecimal("18446744073709551616")).cast(big))
          .cast(big).as("digest"))
  }

  /**
   * Combined k-anonymity / l-diversity privacy audit (Sweeney 2002;
   * Machanavajjhala et al., ICDE 2006): EVERY quasi-identifier group
   * with its population, sensitive-attribute diversity, and both
   * verdicts. [[kAnonymityAudit]] reports only the k-violating groups;
   * release decisions need the full table — a group can be k-anonymous
   * yet leak through homogeneity (all 50 members share one sensitive
   * value: anyone matching the QIs learns it), which is exactly the
   * attack l-diversity closes.
   *
   * Scale shape: ONE QI-keyed agg; the distinct count shuffles
   * two-phase on (QI, sensitive) with map-side partials, so a hot
   * group never concentrates raw rows in one task.
   */
  /**
   * Gini–Simpson diversity index per stratum (Simpson 1949, the
   * unbiased finite-sample form): 1 − Σ nᵢ(nᵢ−1)/(N(N−1)) — the
   * probability that two documents drawn WITHOUT replacement from the
   * stratum differ on the category (language, domain, topic tag). The
   * single-number "is this source a monoculture" read a mixture report
   * compresses to: 0 = all one category, →1 = evenly spread over many.
   * Complements entropy-style diversity with an exactly-computable
   * rational (no logs anywhere).
   *
   * Hashed surface: N, the category count, and
   * `gini_simpson_micro = half-away(10⁶·(N(N−1) − Σnᵢ(nᵢ−1)) / N(N−1))`
   * — exact integers end to end; N < 2 reports NULL, never 0/0.
   *
   * Scale shape: ONE (stratum, category) count agg (map-side
   * combinable) + one |strata|-key reduce. The corpus shuffles once.
   */
  def giniSimpson(df: DataFrame, strataCol: String,
                  catCol: String): DataFrame = {
    val big = DecimalType(38, 0)
    val cc = df.groupBy(col(strataCol), col(catCol))
      .agg(count(lit(1)).as("graft_n"))
    cc.groupBy(col(strataCol))
      .agg(sum(col("graft_n")).as("n_rows"),
        count(lit(1)).as("n_categories"),
        sum(col("graft_n").cast(big) * (col("graft_n").cast(big) - 1))
          .cast(big).as("graft_same"))
      .select(col(strataCol), col("n_rows"), col("n_categories"),
        when(col("n_rows") >= 2, ExactRound.halfAwayDiv(
          ((col("n_rows").cast(big) * (col("n_rows").cast(big) - 1) -
            col("graft_same")) * lit(1000000L).cast(big)).cast(big),
          (col("n_rows").cast(big) * (col("n_rows").cast(big) - 1))
            .cast(big))).as("gini_simpson_micro"))
  }

  def privacyAudit(df: DataFrame, qiCols: Seq[String],
                   sensitiveCol: String, k: Long, l: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2 && l >= 2, s"thresholds k=$k l=$l out of range")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("l_distinct"))
      .withColumn("k_anonymous", col("n") >= k)
      .withColumn("l_diverse", col("l_distinct") >= l)
  }

  /**
   * Per-stratum Pearson correlation between two paired metrics — the
   * linear-association companion to q239's Spearman rank agreement
   * (Spearman sees monotone relationships; Pearson sees proportional
   * ones, and their disagreement is itself a diagnostic). The pipeline
   * use: sanity-correlating a cheap metadata signal against an expensive
   * derived one (token count vs embedding norm, quality score vs
   * classifier logit) per source before trusting the cheap one as a
   * proxy.
   *
   * Determinism: x is exact integer, y is pre-rounded 6-dp DECIMAL, so
   * every sufficient statistic (Σx, Σy, Σxy, Σx², Σy²) accumulates as
   * exact DECIMAL — order-independent; r is ONE fixed-shape double
   * expression over those exact sums (sqrt/divide — exactly-rounded
   * IEEE, no libm), rounded to 6 dp. Degenerate strata (n < 2 or zero
   * variance in either metric) report NULL, never a 0/0.
   *
   * Scale shape: ONE map-side-combinable agg keyed by stratum; nothing
   * else touches the corpus.
   */
  def pearsonByStrata(df: DataFrame, xCol: String, yCol: String,
                      strataCol: String): DataFrame = {
    // 18,6 operands keep products at DECIMAL(36,12) — inside the 38-digit
    // cap on BOTH engines (38,6 operands would overflow DuckDB's width)
    val x = col(xCol).cast(DecimalType(18, 6))
    val y = round(col(yCol).cast(DoubleType), 6).cast(DecimalType(18, 6))
    val agg = df
      .select(col(strataCol), x.as("graft_x"), y.as("graft_y"))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n"),
        sum(col("graft_x")).as("graft_sx"),
        sum(col("graft_y")).as("graft_sy"),
        sum(col("graft_x") * col("graft_y")).as("graft_sxy"),
        sum(col("graft_x") * col("graft_x")).as("graft_sxx"),
        sum(col("graft_y") * col("graft_y")).as("graft_syy"))
    val nD = col("n").cast(DoubleType)
    val num = nD * col("graft_sxy").cast(DoubleType) -
      col("graft_sx").cast(DoubleType) * col("graft_sy").cast(DoubleType)
    val vx = nD * col("graft_sxx").cast(DoubleType) -
      col("graft_sx").cast(DoubleType) * col("graft_sx").cast(DoubleType)
    val vy = nD * col("graft_syy").cast(DoubleType) -
      col("graft_sy").cast(DoubleType) * col("graft_sy").cast(DoubleType)
    agg.select(col(strataCol), col("n"),
      when(col("n") >= 2 && vx > 0.0 && vy > 0.0,
        round(num / (sqrt(vx) * sqrt(vy)), 6)).as("r_pearson"))
  }

  /**
   * One-dimensional Wasserstein-1 (earth-mover) drift of an integer
   * metric between each stratum and the REST of the corpus — the
   * integral-of-CDF-gap distance (W₁ = ∫|F_s − F_rest|, Ramdas et al.
   * 2017) that distribution-shift audits use where the KS statistic
   * ([[chiSquareDrift]]'s companion q146) only sees the single worst
   * point. Computed EXACTLY: on the merged integer support,
   * |F_s − F_rest| at level ℓ is |cum_s·n_r − cum_r·n_s| / (n_s·n_r),
   * so Σ gap·|cross-difference| is integer arithmetic and only the final
   * ppm scaling divides (DECIMAL(38,0) integral division; everything
   * positive, so floor = truncate and the surface is engine-portable).
   * `w1_ppm` is the distance in metric units × 10⁻⁶.
   *
   * Scale shape: the corpus collapses to a (stratum, value) count table
   * in ONE map-side-combinable agg — every later step (support
   * crossJoin, cumulative windows, per-stratum reduce) runs on that
   * metadata-scale table (|strata| × |distinct values|), never on rows.
   * A stratum covering the whole corpus reports NULL rather than
   * dividing by an empty rest-side.
   */
  def w1StrataDrift(df: DataFrame, valueCol: String,
                    strataCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sl = df.groupBy(col(strataCol),
        col(valueCol).cast(LongType).as("graft_v"))
      .agg(count(lit(1)).as("graft_c"))
    val support = sl.groupBy(col("graft_v")).agg(sum(col("graft_c")).as("graft_call"))
    val strata = sl.groupBy(col(strataCol)).agg(sum(col("graft_c")).as("graft_ns"))
    val totals = support.agg(sum(col("graft_call")).as("graft_n"))
    val w = Window.partitionBy(col(strataCol)).orderBy(col("graft_v"))
    val grid = strata.crossJoin(support)
      .join(sl, Seq(strataCol, "graft_v"), "left")
      .na.fill(0L, Seq("graft_c"))
      .withColumn("graft_cums", sum(col("graft_c")).over(w))
      .withColumn("graft_cumall", sum(col("graft_call")).over(w))
      .withColumn("graft_gap",
        coalesce(lead(col("graft_v"), 1).over(w) - col("graft_v"), lit(0L)))
    val big = "decimal(38,0)"
    grid.crossJoin(broadcast(totals))
      .withColumn("graft_nr", col("graft_n") - col("graft_ns"))
      .withColumn("graft_cumr", col("graft_cumall") - col("graft_cums"))
      .withColumn("graft_contrib",
        expr(s"cast(graft_gap as $big) * " +
          s"abs(cast(graft_cums as $big) * cast(graft_nr as $big) - " +
          s"cast(graft_cumr as $big) * cast(graft_ns as $big))"))
      .groupBy(col(strataCol))
      .agg(max(col("graft_ns")).as("n_docs"), max(col("graft_nr")).as("n_rest"),
        sum(col("graft_contrib")).as("graft_w1raw"))
      .withColumn("w1_ppm",
        when(col("n_rest") > 0,
          expr(s"cast(graft_w1raw * 1000000 as $big) div " +
            s"(cast(n_docs as $big) * cast(n_rest as $big))").cast(LongType)))
      .select(col(strataCol), col("n_docs"), col("n_rest"), col("w1_ppm"))
  }
}

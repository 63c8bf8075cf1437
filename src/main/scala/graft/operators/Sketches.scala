package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * K-minimum-values (KMV) distinct-count sketch — the DETERMINISTIC,
 * engine-portable alternative to HLL (q33's `approx_count_distinct` is
 * engine-specific, so its estimate can never be oracle-checked; KMV's
 * estimate is a pure function of md5, so the gate hashes it directly).
 *
 * Keep the k smallest 32-bit md5-derived hash values of the distinct
 * keys; if the k-th smallest normalized hash is u_k, the Bar-Yossef et
 * al. estimator is (k−1)/u_k — here written integer-first as
 * (k−1)·2³² / h_k with one final double division, bit-identical across
 * engines.
 *
 * Mergeability is structural: the k smallest of a union equal the k
 * smallest of the per-part minima's union, so per-source sketches
 * (k rows each) union and re-cut to a global sketch WITHOUT touching
 * the corpus again — [[kmvMerge]]; q135's gate verifies the merged
 * global estimate against the oracle's direct computation.
 *
 * Shape: one distinct (strata, hash) agg, then WindowGroupLimit keeps
 * ≤ k rows per stratum before the shuffle — sketch state is k·strata
 * rows, metadata scale.
 */
object Sketches {

  /** 32-bit integer hash of a key: first 8 hex chars of md5 — the
    * project-wide md5-derived randomness source. */
  def hash32(key: Column): Column =
    conv(substring(md5(key), 1, 8), 16, 10).cast(LongType)

  /** Per-stratum KMV sketch: the ≤ k smallest distinct hashes, as rows
    * (strataCol, h). This is the mergeable state. */
  def kmvSketch(df: DataFrame, keyCol: String, strataCol: String,
                k: Int): DataFrame = {
    require(k >= 2, s"k=$k: the estimator needs k >= 2")
    val hashes = df.select(col(strataCol), hash32(col(keyCol)).as("h"))
      .distinct()
    LatestSnapshot.topK(hashes, Seq(strataCol), col("h").asc, Nil, k)
  }

  /** Merge per-part sketches (same k): union + re-cut to the k smallest
    * per stratum. Exact by the structural argument above. */
  def kmvMerge(parts: Seq[DataFrame], strataCol: String, k: Int): DataFrame = {
    require(parts.nonEmpty, "kmvMerge: no sketches")
    LatestSnapshot.topK(parts.reduce(_ unionByName _).distinct(),
      Seq(strataCol), col("h").asc, Nil, k)
  }

  /** Estimate from a sketch: one row per stratum with the k-th smallest
    * hash and est = round((k−1)·2³² / h_k, 6). Strata holding fewer than
    * k distinct hashes report their EXACT count (n_kept) and a NULL
    * estimate — the sketch saw everything, no estimation needed. */
  def kmvEstimate(sketch: DataFrame, strataCol: String, k: Int): DataFrame =
    sketch.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("h_k"))
      .select(col(strataCol), col("n_kept"),
        when(col("n_kept") === k, col("h_k")).as("h_k"),
        when(col("n_kept") === k,
          round(lit((k - 1).toDouble * 4294967296.0) /
            col("h_k").cast(DoubleType), 6)).as("est_distinct"))

  /**
   * Pairwise set-INTERSECTION estimates between strata from their KMV
   * sketches (the θ-sketch intersection of Beyer et al. SIGMOD'07 /
   * the Theta-Sketch framework): for strata a < b, cut both sketches at
   * θ = min of their k-th hashes (a stratum holding < k distinct hashes
   * is EXACT — its cut is the full 2³² space), count hash matches below
   * the cut, and scale: est_inter = n_common·2³² / θ. Also reports the
   * sketch-Jaccard n_common / (n_a′ + n_b′ − n_common). This answers
   * "how much verbatim content do every two sources share?" from k·|strata|
   * rows of state — no cross-source distinct over the corpus, THE
   * sketch use-case at 100 TB where the exact pairwise intersection is
   * a corpus-squared non-starter (the exact audit, [[TextDedup
   * .crossSourceOverlap]], pays per-pair joins instead).
   *
   * Everything below the final two divisions is md5-derived integer
   * arithmetic — estimates are engine-exact and oracle-checkable.
   *
   * Scale shape: all inputs are sketch rows (metadata). The hash
   * equi-join between sketch sides and the |strata|² pair frame never
   * touch the corpus.
   */
  def kmvIntersectPairs(sketch: DataFrame, strataCol: String,
                        k: Int): DataFrame = {
    val full = lit(4294967296L)
    val stats = sketch.groupBy(col(strataCol))
      .agg(count(lit(1)).as("graft_n"), max(col("h")).as("graft_hk"))
      .withColumn("graft_cut0",
        when(col("graft_n") === k, col("graft_hk")).otherwise(full))
    val pairs = stats
      .select(col(strataCol).as("src_a"), col("graft_cut0").as("graft_ca"))
      .join(stats.select(col(strataCol).as("src_b"),
        col("graft_cut0").as("graft_cb")), col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        least(col("graft_ca"), col("graft_cb")).as("graft_cut"))
    def side(as: String): DataFrame =
      sketch.select(col(strataCol).as(as), col("h"))
    def cutCount(as: String, outCol: String): DataFrame =
      pairs.join(side(as), as)
        .filter(col("h") <= col("graft_cut"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as(outCol))
    val common = side("src_a")
      .join(side("src_b"), Seq("h"))
      .filter(col("src_a") < col("src_b"))
      .join(pairs, Seq("src_a", "src_b"))
      .filter(col("h") <= col("graft_cut"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(cutCount("src_a", "graft_na"), Seq("src_a", "src_b"), "left")
      .join(cutCount("src_b", "graft_nb"), Seq("src_a", "src_b"), "left")
      .join(common, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        when(col("graft_cut") > 0, round(
          (coalesce(col("n_common"), lit(0L)).cast(DoubleType) *
            full.cast(DoubleType)) / col("graft_cut").cast(DoubleType), 6))
          .as("est_intersection"),
        when(coalesce(col("graft_na"), lit(0L)) +
            coalesce(col("graft_nb"), lit(0L)) -
            coalesce(col("n_common"), lit(0L)) > 0, round(
          coalesce(col("n_common"), lit(0L)).cast(DoubleType) /
            (coalesce(col("graft_na"), lit(0L)) +
              coalesce(col("graft_nb"), lit(0L)) -
              coalesce(col("n_common"), lit(0L))).cast(DoubleType), 6))
          .as("est_jaccard"))
  }

  // ── Count-Min sketch ─────────────────────────────────────────────────

  /** Row-r CMS bucket of a key: md5("cms{r}_" ‖ key) as a 32-bit value,
    * mod `width` — d independent hash rows from the one md5 source. */
  private def cmsBucket(key: Column, r: Column, width: Int): Column =
    pmod(hash32(concat(lit("cms"), r.cast(org.apache.spark.sql.types
        .StringType), lit("_"),
      // explicit cast, same as bloomPos: implicit concat coercion would
      // hash Spark's rendering of non-string keys, which an oracle
      // can't reproduce
      key.cast(org.apache.spark.sql.types.StringType))),
      lit(width.toLong))

  /**
   * Count-Min sketch (Cormode & Muthukrishnan 2005) of a key column's
   * frequency distribution: state is d·width counters — row r counts
   * keys by bucket h_r(key) — answering "how often does key x occur?"
   * in O(d) with one-sided error (estimate ≥ truth, over by at most
   * n/width w.h.p.). The fixed-size frequency summary that heavy-hitter
   * monitoring ships around instead of a full count table.
   *
   * Mergeable by construction: same (d, width) sketches add per-cell
   * ([[cmsMerge]] — counters are a semigroup, so per-partition /
   * per-batch / per-day partials combine in any order). Everything is
   * md5-derived and integer, so estimates are engine-exact and
   * oracle-checkable — unlike an opaque native sketch.
   *
   * Scale shape: one explode(d) + one hash agg with map-side combine;
   * state is d·width rows, metadata-scale, independent of corpus size.
   */
  def cmsSketch(df: DataFrame, keyCol: String, d: Int, width: Int): DataFrame = {
    require(d >= 1 && d <= 16, s"d=$d out of range")
    require(width >= 2, s"width=$width out of range")
    df.select(col(keyCol).as("graft_k"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .select(col("r"), cmsBucket(col("graft_k"), col("r"), width).as("bucket"))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge same-shape CMS sketches: per-(row, bucket) counter addition —
    * associative and commutative. */
  def cmsMerge(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "cmsMerge: no sketches")
    parts.reduce(_ unionByName _)
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Point-query the sketch for each row of `probes`: est_n = min over
    * the d rows of the probed counter (absent counter = 0). Estimates
    * never undercount; `probes` is a bounded query set (broadcast side). */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
                  d: Int, width: Int): DataFrame =
    probes.select(col(keyCol),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .select(col(keyCol), col("r"),
        cmsBucket(col(keyCol), col("r"), width).as("bucket"))
      .join(sketch, Seq("r", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))

  // ── Bloom-filter join pruning ────────────────────────────────────────

  /** Bloom hash r of a key: md5("bf{r}_" ‖ key) as a 32-bit value mod
    * `mBits` — the k independent bit positions, engine-portable. */
  private def bloomPos(key: Column, r: Column, mBits: Int): Column =
    pmod(hash32(concat(lit("bf"), r.cast(org.apache.spark.sql.types
        .StringType), lit("_"),
      key.cast(org.apache.spark.sql.types.StringType))), lit(mBits.toLong))

  /** The SET bit positions of a Bloom filter over `df`'s keys: ≤ mBits
    * rows (metadata scale, whatever the key count) — the shippable
    * filter state. */
  def bloomBits(df: DataFrame, keyCol: String, k: Int, mBits: Int): DataFrame = {
    require(k >= 1 && k <= 8, s"k=$k out of range")
    require(mBits >= 64 && mBits % 64 == 0 && mBits <= (1 << 24),
      s"mBits=$mBits: need a multiple of 64 in [64, 2^24]")
    df.select(col(keyCol).as("graft_k"),
        explode(sequence(lit(0), lit(k - 1))).as("r"))
      .select(bloomPos(col("graft_k"), col("r"), mBits).as("pos"))
      .distinct()
  }

  /**
   * Bloom-prune a fact table: keep only rows whose key tests positive in
   * the filter built by [[bloomBits]] — the scan-side pruning that makes
   * a selective join cheap at 100 TB: instead of shuffling every fact
   * row to discover most have no match, a fixed-size bitmap rides to
   * every task and kills non-matches IN THE SCAN PROJECTION.
   *
   * The bit set (≤ mBits bits — metadata scale BY CONSTRUCTION, the
   * whole point of a Bloom filter) is collected and inlined as an
   * array-of-longs literal, so the membership test is a NARROW
   * codegen'd filter: k shift/mask probes per row, zero shuffle, no
   * join operator at all. No false negatives ever (true matches always
   * pass); false positives are fine because callers re-join the
   * survivors against the real dimension anyway.
   */
  def bloomPrune(fact: DataFrame, keyCol: String, bits: DataFrame,
                 k: Int, mBits: Int): DataFrame = {
    require(k >= 1 && k <= 8, s"k=$k out of range")
    val words = new Array[Long](mBits / 64)
    bits.collect().foreach { row =>
      val pos = row.getLong(0)
      require(pos >= 0 && pos < mBits, s"bloom position $pos outside $mBits")
      words(pos.toInt / 64) |= 1L << (pos.toInt % 64)
    }
    val bitmap = typedLit(words.toSeq)
    val test = (0 until k).map { r =>
      val pos = bloomPos(col(keyCol), lit(r), mBits)
      // (word >> (pos%64)) & 1 — the sign-fill of an arithmetic shift
      // only touches bits ABOVE the probed one, so the &1 is exact
      call_function("shiftright",
          element_at(bitmap, (call_function("div", pos, lit(64L)) + 1)
            .cast(org.apache.spark.sql.types.IntegerType)),
          pmod(pos, lit(64L)).cast(org.apache.spark.sql.types.IntegerType))
        .bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)
    fact.filter(test)
  }

  // ── HyperLogLog registers ────────────────────────────────────────────

  /**
   * HyperLogLog register table (Flajolet, Fusy, Gandouet & Meunier,
   * AofA 2007): bucket j = the top `p` bits of the 32-bit md5-derived
   * hash, register M_j = max over the bucket's keys of ρ(rest) — the
   * 1-based position of the leftmost set bit in the remaining
   * w = 32−p bits (all-zero rest ⇒ w+1). Unlike q33's opaque
   * `approx_count_distinct` (engine-specific HLL++ whose registers
   * can't be inspected or oracle-checked), the registers HERE are a
   * plain DataFrame of exact integers — a pure function of md5 — so
   * the sketch state itself, its merge, and its estimate are all
   * engine-portable and gate-checkable.
   *
   * ρ needs floor(log₂) of an integer, which is NOT computed with libm:
   * ρ = w + 1 − length(bin(rest)) — `bin` is the minimal binary string
   * (Long.toBinaryString; DuckDB's bin agrees for non-negatives), so
   * the whole register pipeline is integer/string ops only.
   *
   * Scale shape: one narrow codegen'd projection (hash, shift, mask,
   * bin-length) then ONE hash-agg keyed by (stratum, bucket) — map-side
   * combinable (max is a semigroup), state ≤ 2^p rows per stratum
   * regardless of corpus size. Duplicate keys need no pre-distinct:
   * max makes registers insertion-idempotent, which is exactly why HLL
   * merges across shards/days for free where exact count-distinct
   * re-shuffles everything.
   */
  def hllRegisters(df: DataFrame, keyCol: String, strataCol: String,
                   p: Int = 8): DataFrame =
    hllRows(df, keyCol, strataCol, p)
      .groupBy(col(strataCol), col("bucket"))
      .agg(max(col("r")).as("r"))

  /** Per-ROW (stratum, bucket, r) projection — the stateless half of
    * [[hllRegisters]], shared with the streaming register maintainer
    * ([[graft.streaming.Streaming.hllRegisterStream]]) so batch and
    * online registers are identical by construction. */
  def hllRows(df: DataFrame, keyCol: String, strataCol: String,
              p: Int): DataFrame = {
    require(p >= 4 && p <= 12, s"p=$p out of range [4, 12]")
    val w = 32 - p
    val h = hash32(col(keyCol))
    val rest = h.bitwiseAND(lit((1L << w) - 1))
    val rho = when(rest === 0, lit(w + 1))
      .otherwise(lit(w + 1) - length(bin(rest)))
    df.select(col(strataCol), shiftright(h, w).as("bucket"),
      rho.cast(LongType).as("r"))
  }

  /** Merge same-p register tables: per-(stratum, bucket) max —
    * associative, commutative, idempotent, so per-source / per-day /
    * per-shard partials combine in any order and any grouping. */
  def hllMerge(parts: Seq[DataFrame], strataCol: String): DataFrame = {
    require(parts.nonEmpty, "hllMerge: no sketches")
    parts.reduce(_ unionByName _)
      .groupBy(col(strataCol), col("bucket"))
      .agg(max(col("r")).as("r"))
  }

  /**
   * Estimate from a register table, integer-first: the raw HLL
   * estimator E = α_m·m² / Σ_j 2^(−M_j) is rewritten over the common
   * denominator 2^R (R = w+1, the max register value), making the
   * harmonic sum the exact integer
   * `harm_num` = Σ_set 2^(R−M_j) + (m − n_set)·2^R (absent buckets have
   * M_j = 0). For m ≥ 128, α_m = 0.7213/(1 + 1.079/m) =
   * 7213·m/(10000·m + 10790) is an exact rational, so
   * `est_floor` = ⌊7213·m³·2^R / ((10000·m + 10790)·harm_num)⌋ is
   * computed wholly in DECIMAL(38,0) integral division — zero libm,
   * bit-identical on any engine (the q200 lesson applied to a sketch).
   * `est_raw` (one double division) and `est_corrected` (Flajolet's
   * linear-counting small-range correction, m·ln(m/V) when E ≤ 5m/2 and
   * empty buckets remain — ln is libm) ride along as API-only columns
   * that must stay OFF any cross-engine hash.
   *
   * Scale shape: one hash-agg over ≤ 2^p rows per stratum — metadata.
   */
  def hllEstimate(sketch: DataFrame, strataCol: String,
                  p: Int = 8): DataFrame = {
    require(p >= 7 && p <= 12,
      s"p=$p: the rational alpha form needs m >= 128 (p >= 7)")
    val w = 32 - p
    val m = 1L << p
    val rBits = w + 1
    val estNum = BigInt(7213) * BigInt(m).pow(3) * BigInt(2).pow(rBits)
    val alphaDen = 10000L * m + 10790L
    val mDouble = m.toDouble
    sketch.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_buckets_set"),
        sum(col("r")).cast(LongType).as("sum_rho"),
        sum(expr(s"shiftleft(1L, cast($rBits - r as int))"))
          .cast(LongType).as("graft_hp"))
      .withColumn("harm_num", col("graft_hp") +
        (lit(m) - col("n_buckets_set")) * lit(1L << rBits))
      .withColumn("est_floor",
        expr(s"cast('$estNum' as decimal(38,0)) div " +
          s"(cast($alphaDen as decimal(38,0)) * " +
          "cast(harm_num as decimal(38,0)))").cast(LongType))
      .withColumn("est_raw",
        round(lit(estNum.toDouble) /
          (lit(alphaDen.toDouble) * col("harm_num").cast(DoubleType)), 6))
      .withColumn("est_corrected",
        when(col("est_raw") <= lit(2.5 * mDouble) &&
            col("n_buckets_set") < m,
          round(lit(mDouble) * org.apache.spark.sql.functions.log(lit(mDouble) /
            (lit(m) - col("n_buckets_set")).cast(DoubleType)), 6))
          .otherwise(col("est_raw")))
      .select(col(strataCol), col("n_buckets_set"), col("sum_rho"),
        col("harm_num"), col("est_floor"), col("est_raw"),
        col("est_corrected"))
  }

  /**
   * AMS / tug-of-war second-moment (F₂) sketch (Alon, Matias & Szegedy,
   * STOC 1996 — the Gödel-prize sketch): k independent estimators
   * Z_j = Σ_t s_j(t)·c_t with seedless ±1 signs from md5; each Z_j² is
   * an unbiased F₂ estimate. F₂ = Σ c_t² is the SELF-JOIN SIZE — the
   * quantity a join planner wants without materializing the join, and
   * the skew summary (F₂/n²) of any key column.
   *
   * Everything is exact integer arithmetic: Z_j is an int64 sum, Z_j²
   * exact, and the k-estimator mean is carried as the rational
   * (est_sum, k) plus its half-away micro. The exact F₂ from the
   * counts rides along, so the gate also PINS the estimator's observed
   * relative error on this data.
   *
   * Scale shape: one (stratum, key) count agg, a ×k sign fan-out of
   * the VOCABULARY rows (never the corpus), one (stratum, j) sum, one
   * stratum rollup — all map-side combinable; sketches from disjoint
   * shards merge by adding Z_j (the linear-sketch property).
   */
  def amsF2(df: DataFrame, strataCol: String, keyCol: String,
            k: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"k=$k out of range (1..64)")
    val big = DecimalType(38, 0)
    val counts = df.groupBy(col(strataCol), col(keyCol).as("graft_k"))
      .agg(count(lit(1)).as("graft_c"))
    val exact = counts.groupBy(col(strataCol))
      .agg(sum(col("graft_c").cast(big) * col("graft_c").cast(big))
        .cast(big).as("f2_exact"),
        sum(col("graft_c")).as("n_rows"))
    val signed = counts
      .select(col(strataCol), col("graft_k"), col("graft_c"),
        explode(expr(s"sequence(0, ${k - 1})")).as("graft_j"))
      .withColumn("graft_s",
        when(conv(substring(md5(concat_ws("_", lit("ams"), col("graft_j"),
          col("graft_k"))), 1, 1), 16, 10).cast("int") % 2 === 0,
          lit(1L)).otherwise(lit(-1L)))
    val z = signed.groupBy(col(strataCol), col("graft_j"))
      .agg(sum(col("graft_s") * col("graft_c")).as("graft_z"))
    val est = z.groupBy(col(strataCol))
      .agg(sum(col("graft_z").cast(big) * col("graft_z").cast(big))
        .cast(big).as("est_sum"),
        count(lit(1)).as("n_sketches"))
    // sums accumulate in DECIMAL(38,0) but REPORT as BIGINT (the r11
    // gate rule: no hashed output wider than DECIMAL(18)); F₂ ≈ n²
    // per stratum fits int64 through ~3·10⁹ rows, past which the cast
    // nulls (non-ANSI) rather than wrapping
    exact.join(est, Seq(strataCol))
      .select(col(strataCol), col("n_rows"),
        col("f2_exact").cast(LongType).as("f2_exact"),
        col("est_sum").cast(LongType).as("est_sum"), col("n_sketches"),
        ExactRound.halfAwayDiv(col("est_sum") * lit(1000000L).cast(big),
          col("n_sketches")).as("f2_est_micro"))
      .orderBy(col(strataCol))
  }
}

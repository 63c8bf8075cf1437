package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Z-order (Morton-curve) clustering for data-skipping layouts.
 *
 * At 100 TB the dominant cost of most queries is the scan, and parquet
 * row-group min/max statistics let the reader skip row groups whose
 * [min, max] doesn't intersect the predicate — but only if the WRITER
 * clustered rows so each row group covers a small rectangle of the filter
 * dimensions. A lexicographic sort by (a, b) bounds a tightly but leaves
 * every file's b-range as wide as the whole domain; interleaving the bits
 * of a and b (the Z-order curve — Morton, 1966; the layout behind
 * Delta/Iceberg `ZORDER BY`) bounds BOTH dimensions at once, so filters
 * on a, on b, or on both skip most files.
 *
 * Everything here is integer-exact and codegen'd: ranks are int64
 * quantizations against global min/max (one metadata-scale aggregate,
 * broadcast back), and the interleave is 2·bits shift/mask terms fused
 * into one projection. No UDFs, no shuffle beyond the final range
 * repartition that the layout exists to produce.
 */
object Layout {

  /** `bits`-bit rank of `v` within [mn, mx]: ((v−mn)·(2^bits−1)) div
    * (mx−mn), integer division — exact and engine-portable. Degenerate
    * domains (mx = mn) rank as 0. Domain bound: (mx−mn)·(2^bits−1) must
    * fit int64 — at bits=16 that is spans up to 2^47 (≈1.4·10¹⁴, ~4.5
    * years of epoch-micros); pre-scale wider domains (epoch-millis
    * covers millennia). */
  def rank(v: Column, mn: Column, mx: Column, bits: Int): Column = {
    val top = lit((1L << bits) - 1)
    // `div` = IntegralDivide: exact int64 division (a double-rounding
    // floor(/) would corrupt ranks once the numerator passes 2^53)
    when(mx === mn, lit(0L))
      .otherwise(call_function("div", (v.cast(LongType) - mn) * top, mx - mn))
  }

  /** Morton interleave of two already-quantized `bits`-bit ranks: bit i of
    * `a` lands at position 2i, bit i of `b` at 2i+1. The terms occupy
    * disjoint bits, so the reduce is a plain sum — one whole-stage-codegen
    * expression, no hashing, no loop at runtime. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Adds `zv` = the z-value of (`aCol`, `bCol`) ranked against their
    * global min/max. The min/max aggregate is one metadata-scale row,
    * collected eagerly so [[rank]]'s int64 domain bound can be verified
    * AGAINST THE DATA before the projection is built — with ANSI off a
    * domain wider than 2^(63−bits) would silently wrap the rank multiply
    * and corrupt every z-value (DuckDB errors on the same overflow), so
    * the guard throws instead. The min/max then inline as literals; the
    * z-value itself stays a narrow codegen'd projection. */
  def withZValue(df: DataFrame, aCol: String, bCol: String,
                 bits: Int = 16): DataFrame = {
    val row = df.agg(
      min(col(aCol).cast(LongType)), max(col(aCol).cast(LongType)),
      min(col(bCol).cast(LongType)), max(col(bCol).cast(LongType))).head()
    val top = (1L << bits) - 1
    def checked(name: String, i: Int): (Long, Long) = {
      if (row.isNullAt(i)) return (0L, 0L) // empty input: nothing to rank
      val (mn, mx) = (row.getLong(i), row.getLong(i + 1))
      val worst = (BigInt(mx) - BigInt(mn)) * top
      require(worst <= Long.MaxValue,
        s"withZValue rank overflows int64 on $name: ($mx - $mn) * $top = " +
          s"$worst; pre-scale the column (e.g. micros -> millis) or lower bits")
      (mn, mx)
    }
    val (amn, amx) = checked(aCol, 0)
    val (bmn, bmx) = checked(bCol, 2)
    df.withColumn("zv", zValue(
      rank(col(aCol), lit(amn), lit(amx), bits),
      rank(col(bCol), lit(bmn), lit(bmx), bits), bits))
  }

  /**
   * [[withZValue]] + range-partition + in-partition sort by `zv` — the
   * write-side layout pass. Files written from the result have tight
   * min/max rectangles in BOTH dimensions, which is what parquet
   * row-group skipping (and any min/max-indexed reader) needs. The only
   * data movement is the range exchange the clustering IS.
   */
  def clusterByZOrder(df: DataFrame, aCol: String, bCol: String,
                      bits: Int = 16, numPartitions: Int = 0): DataFrame = {
    val withZ = withZValue(df, aCol, bCol, bits)
    val parted =
      if (numPartitions > 0) withZ.repartitionByRange(numPartitions, col("zv"))
      else withZ.repartitionByRange(col("zv"))
    parted.sortWithinPartitions(col("zv"))
  }

  /**
   * Hilbert-curve index of two already-quantized `bits`-bit ranks
   * (Hilbert 1891; the xy2d bit transform of Warren's Hacker's Delight
   * formulation): the space-filling curve with strictly better locality
   * than [[zValue]]'s Morton order — consecutive Hilbert cells are
   * always grid-adjacent (no Z-shaped jumps), so range scans over the
   * layout touch tighter rectangles and parquet min/max skipping prunes
   * more files on BOTH dimensions.
   *
   * The rotation recurrence is a RUNTIME fold (one `aggregate` HOF over
   * the literal level sequence, struct accumulator): unrolling it into
   * nested column expressions instead would nest x/y twice per level —
   * an EXPONENTIAL expression tree that stalls codegen at 8 levels.
   * The fold keeps the plan constant-size and evaluates the 8 levels
   * per row in one pass; the oracle replays the identical recurrence as
   * a recursive CTE (per-level materialization — same no-blowup
   * property). All values stay < 4^bits — int64-exact.
   */
  def hilbertValue(a: Column, b: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 16, s"bits=$bits out of range")
    val levels = sequence(lit(bits - 1), lit(0), lit(-1))
    val zero = struct(a.cast(LongType).as("x"), b.cast(LongType).as("y"),
      lit(0L).as("d"))
    val folded = aggregate(levels, zero, (acc, i) => {
      val s = call_function("shiftleft", lit(1L), i)
      val x = acc.getField("x")
      val y = acc.getField("y")
      val d = acc.getField("d")
      val rx = when(x.bitwiseAND(s) > 0, 1L).otherwise(0L)
      val ry = when(y.bitwiseAND(s) > 0, 1L).otherwise(0L)
      struct(
        // rotate the quadrant: flip both axes when rx=1, then swap
        when(ry === 0L, when(rx === 1L, s - 1 - y).otherwise(y))
          .otherwise(x).as("x"),
        when(ry === 0L, when(rx === 1L, s - 1 - x).otherwise(x))
          .otherwise(y).as("y"),
        (d + s * s * (lit(3L) * rx).bitwiseXOR(ry)).as("d"))
    })
    folded.getField("d")
  }

  /** Adds `hv` = the Hilbert index of (`aCol`, `bCol`) ranked against
    * their global min/max — [[withZValue]]'s eager-collect + domain
    * guard, with the Hilbert transform in place of the interleave. */
  def withHilbertValue(df: DataFrame, aCol: String, bCol: String,
                       bits: Int = 8): DataFrame = {
    val row = df.agg(
      min(col(aCol).cast(LongType)), max(col(aCol).cast(LongType)),
      min(col(bCol).cast(LongType)), max(col(bCol).cast(LongType))).head()
    val top = (1L << bits) - 1
    def checked(name: String, i: Int): (Long, Long) = {
      if (row.isNullAt(i)) return (0L, 0L)
      val (mn, mx) = (row.getLong(i), row.getLong(i + 1))
      val worst = (BigInt(mx) - BigInt(mn)) * top
      require(worst.isValidLong,
        s"hilbert rank domain for $name too wide: ($mx - $mn) * $top " +
          "exceeds int64 — pre-scale the column")
      (mn, mx)
    }
    val (amn, amx) = checked(aCol, 0)
    val (bmn, bmx) = checked(bCol, 2)
    df.withColumn("hv", hilbertValue(
      rank(col(aCol), lit(amn), lit(amx), bits),
      rank(col(bCol), lit(bmn), lit(bmx), bits), bits))
  }

  /**
   * Rendezvous (highest-random-weight) shard assignment — Thaler &
   * Ravishankar 1998, the consistent-placement scheme behind cache and
   * serving-shard routing: each key independently hashes once PER SHARD
   * and lands on the shard with the highest hash, so adding/removing a
   * shard reassigns only ~1/n of the keys (no ring, no virtual nodes,
   * deterministic everywhere — every worker computes the same placement
   * with no coordination, which is the point at 1000 executors).
   *
   * Weight = first 48 bits of md5("rv<shard>_<key>") — the library's
   * standard salted-md5 determinism scheme (engine-portable, oracle
   * reproduces it digit-by-digit); argmax per key via one bounded
   * n-shard fan-out + one row_number window keyed on the source row.
   * The fan-out is n·rows but 3 narrow columns wide; at scale prefer
   * `shardOf`'s single-projection form when n is a compile-time
   * constant (greatest over n codegen'd terms — no fan-out, no window).
   */
  def rendezvousShards(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1 && nShards <= 256,
      s"nShards must be in [1, 256]: $nShards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col("graft_h").desc, col("graft_shard"))
    df.withColumn("graft_shard",
        explode(sequence(lit(0), lit(nShards - 1))))
      .withColumn("graft_h",
        conv(substring(md5(concat(lit("rv"),
          col("graft_shard").cast(org.apache.spark.sql.types.StringType),
          lit("_"),
          col(keyCol).cast(org.apache.spark.sql.types.StringType))), 1, 12),
          16, 10).cast(LongType))
      .withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1)
      .withColumnRenamed("graft_shard", "shard")
      .drop("graft_h", "graft_rn")
  }

  /** Single-projection rendezvous shard for a compile-time shard count:
    * greatest over n (hash·n + shard) int64 encodes, decoded with pmod —
    * no fan-out, no window, pure codegen. 48-bit hash · n ≤ 2^56 keeps
    * the encode exact. */
  /**
   * Small-file compaction planning — the Delta/Iceberg OPTIMIZE
   * bin-packing decision as a deterministic, distributed plan: files
   * under `targetBytes` are packed into rewrite groups of ~target
   * total size (ordered by (bytes, path), exclusive prefix sum,
   * group = ⌊cum/target⌋ — the q77 concat-and-chunk rule applied to
   * file metadata), files at/above target are left alone
   * (`compacted = false`, NULL group). Compaction is THE lakehouse
   * maintenance op at 100 TB: a million-file table read-amplifies
   * every scan until someone plans exactly this rewrite.
   *
   * Scale shape: the input is the FILE LISTING (metadata — one row per
   * file, not per record); the prefix sum still uses the range-shuffled
   * GlobalRank construction (repartitionByRange + per-partition window
   * + broadcast offsets) rather than a single-partition window, because
   * at 10⁸ files metadata itself is data. Exact integer arithmetic
   * throughout.
   */
  def compactionPlan(files: DataFrame, pathCol: String, sizeCol: String,
                     targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, s"targetBytes=$targetBytes must be positive")
    val bytes = col(sizeCol).cast("long")
    val small = files.filter(bytes < targetBytes)
    val large = files.filter(bytes >= targetBytes)
    val orderCols = Seq(bytes.asc, col(pathCol).asc)
    val parted = small.repartitionByRange(orderCols: _*)
      .withColumn("graft_pid", spark_partition_id())
    val w = Window.partitionBy(col("graft_pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted.withColumn("graft_lpre",
      coalesce(sum(bytes).over(w), lit(0L)))
    val counts = local.groupBy(col("graft_pid"))
      .agg(max(col("graft_lpre") + bytes).as("graft_n"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.graft_pid") < col("a.graft_pid"), "left")
      .groupBy(col("a.graft_pid").as("graft_pid"))
      .agg(coalesce(sum(col("b.graft_n")), lit(0L)).as("graft_off"))
    local.join(broadcast(offsets), "graft_pid")
      .select(col(pathCol), bytes.as("bytes"), lit(true).as("compacted"),
        call_function("div", col("graft_lpre") + col("graft_off"),
          lit(targetBytes)).as("group_id"))
      .unionByName(large.select(col(pathCol), bytes.as("bytes"),
        lit(false).as("compacted"),
        lit(null).cast("long").as("group_id")))
  }

  def shardOf(key: Column, nShards: Int): Column = {
    require(nShards >= 1 && nShards <= 256,
      s"nShards must be in [1, 256]: $nShards")
    // ties (equal 48-bit hashes) break to the SMALLER shard, matching
    // rendezvousShards' (h desc, shard asc) order: encode the shard
    // complement so the max picks it, then decode back
    val encodes = (0 until nShards).map { sh =>
      conv(substring(md5(concat(lit(s"rv$sh" + "_"),
        key.cast(org.apache.spark.sql.types.StringType))), 1, 12),
        16, 10).cast(LongType) * nShards + (nShards - 1 - sh)
    }
    lit(nShards - 1) - pmod(greatest(encodes: _*), lit(nShards))
  }

  /**
   * Column encoding-size planner — the ANALYZE pass a columnar writer
   * (Parquet/ORC-style) runs to pick per-column encodings before laying
   * out 100 TB: for every requested column, the EXACT encoded size under
   * plain, LEB128 varint (integers, zigzag-mapped so negatives stay
   * small), and dictionary encoding, plus the winner and its savings.
   * Storage planning from statistics, not guesswork — the pick decides
   * real scan cost downstream.
   *
   * All sizes are exact integer arithmetic: zigzag is the branch form
   * `2v / −2v−1` (no engine-ambiguous shifts), bit lengths come from
   * `length(bin(x))` (a string op, no libm log2), varint bytes are
   * `⌈bits/7⌉`, dictionary indices `⌈bits(distinct−1)/8⌉` bytes. Plain
   * is 8 B/value for integers and length-prefixed (4 + len) for strings;
   * dictionary entries are 8 B (int) or 4 + len (string).
   *
   * Scale shape: the table is melted ONCE (the [[Profiling.profile]]
   * inline pattern — one pass for every column, not one scan per
   * column); per-value sizes aggregate map-side; the distinct pass
   * shuffles (col, repr) keys. Final per-column math runs on |cols|
   * rows.
   */
  def encodingPlan(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, StringType}
    val fields = cols.map(c => df.schema.fields.find(_.name == c)
      .getOrElse(throw new IllegalArgumentException(s"no column $c")))
    fields.foreach(f => require(
      f.dataType == LongType || f.dataType == IntegerType ||
        f.dataType == StringType,
      s"${f.name}: only integer/string columns, got ${f.dataType}"))
    val melted = df.select(inline(array(fields.map { f =>
      f.dataType match {
        case StringType => struct(lit(f.name).as("col_name"),
          lit("str").as("kind"), lit(null).cast("bigint").as("ival"),
          col(f.name).as("sval"))
        case _ => struct(lit(f.name).as("col_name"),
          lit("int").as("kind"), col(f.name).cast("bigint").as("ival"),
          lit(null).cast("string").as("sval"))
      }
    }: _*)))
    val varintLen = expr(s"cast((length(bin(CASE WHEN ival >= 0 " +
      "THEN ival * 2 ELSE -ival * 2 - 1 END)) + 6) div 7 as bigint)")
    val per = melted.groupBy(col("col_name"), col("kind"))
      .agg(count(lit(1)).as("n_values"),
        sum(varintLen).as("graft_vb"),
        sum(length(col("sval")).cast(LongType)).as("graft_sb"))
    val dv = melted
      .select(col("col_name"), col("kind"),
        coalesce(col("sval"), col("ival").cast("string")).as("graft_repr"))
      .distinct()
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_distinct"),
        sum(length(col("graft_repr")).cast(LongType)).as("graft_dlen"))
    per.join(dv, "col_name")
      .withColumn("plain_bytes",
        when(col("kind") === "int", col("n_values") * 8L)
          .otherwise(col("graft_sb") + col("n_values") * 4L))
      .withColumn("varint_bytes",
        when(col("kind") === "int", col("graft_vb")))
      .withColumn("graft_ib",
        expr("cast((length(bin(n_distinct - 1)) + 7) div 8 as bigint)"))
      .withColumn("dict_bytes",
        col("n_values") * col("graft_ib") +
          when(col("kind") === "int", col("n_distinct") * 8L)
            .otherwise(col("graft_dlen") + col("n_distinct") * 4L))
      .withColumn("best_encoding",
        when(col("varint_bytes").isNotNull &&
          col("varint_bytes") <= col("dict_bytes") &&
          col("varint_bytes") <= col("plain_bytes"), "varint")
          .when(col("dict_bytes") <= col("plain_bytes"), "dict")
          .otherwise("plain"))
      .withColumn("best_bytes",
        least(col("plain_bytes"), col("dict_bytes"),
          coalesce(col("varint_bytes"), col("plain_bytes"))))
      .withColumn("savings_ppm",
        expr("cast((plain_bytes - best_bytes) * 1000000 as decimal(38,0)) " +
          "div cast(plain_bytes as decimal(38,0))").cast(LongType))
      .select(col("col_name"), col("kind"), col("n_values"),
        col("n_distinct"), col("plain_bytes"), col("varint_bytes"),
        col("dict_bytes"), col("best_encoding"), col("savings_ppm"))
  }
}

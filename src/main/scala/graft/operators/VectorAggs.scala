package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}
import graft.functions.VectorFunctions

/**
 * Distributed vector aggregation + IVF-style approximate nearest neighbor.
 *
 * Determinism contract (shared with the DuckDB oracle): every float
 * component is widened to double, rounded to 6 dp, and summed as
 * DECIMAL(38,6) — an exact, order-independent accumulation, so the mean is
 * bit-identical regardless of partitioning. (A raw double sum would be
 * partition-order dependent; a raw float→decimal cast diverges across
 * engines in the 18th digit.) All cosine scores are rounded to 6 dp before
 * any ranking, with id tiebreaks — the project-wide rule that makes top-k
 * cuts reproducible.
 *
 * Scale shape:
 *  - `centroids`: posexplode → groupBy(label, dim). One shuffle keyed on
 *    (label, dim) — at 100 TB the fan-out is rows×dims but each post-shuffle
 *    group is tiny and partial aggregation (map-side combine) reduces
 *    traffic to n_labels×dims×n_partitions records.
 *  - `ivfTopK`: the centroid table is n_list rows → broadcast everywhere;
 *    assignment is a narrow map over the corpus (no shuffle of vectors);
 *    probing touches only nprobe/n_list of the corpus — the IVF trade that
 *    makes billion-vector search tractable. Here the coarse quantizer is
 *    the label column (deterministic stand-in for trained k-means
 *    centroids); swapping in trained centroids changes only the `cent`
 *    input, not the dataflow.
 */
object VectorAggs {

  /** Exact 6-dp component rounding → DECIMAL(38,6): the portable unit of
    * order-independent vector accumulation. */
  private def dec6(c: Column): Column =
    round(c.cast(DoubleType), 6).cast(DecimalType(38, 6))

  /** Per-(label, dim) mean component — long format (label, dim, centroid),
    * dim 0-based, centroid rounded to 6 dp. */
  def centroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col(labelCol), col("dim"))
      .agg(round(sum(dec6(col("x"))).cast(DoubleType) / count(lit(1)), 6)
        .as("centroid"))

  /** [[centroids]] with an engine-portable hashed surface: the mean
    * component in exact micro-units (half-away integer rounding of
    * 10⁶·Σx/n — [[ExactRound]]). The decimal sum is exact, so the
    * quotient is an exact rational: `round(double, 6)` of it can land on
    * a half-boundary tie that engines break differently; the integer
    * form cannot. */
  def centroidsMicro(df: DataFrame, labelCol: String,
                     vecCol: String): DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col(labelCol), col("dim"))
      .agg(ExactRound.microOfRatio(sum(dec6(col("x"))), count(lit(1)))
        .as("centroid_micro"))

  /**
   * Embedding drift per label: the cosine between the centroids of two
   * halves of the data (`splitCol` = 0/1 — old/new snapshot, train/eval
   * shard) — the cheap "did the representation move?" alarm run before
   * an index rebuild or a re-embedding job is paid for. Cosine near 1:
   * stable; drops signal drift for that label.
   *
   * Shape: ONE posexplode pass aggregated on (label, split, dim) with
   * the exact-decimal centroid rule, then metadata-scale joins (labels ×
   * dims rows); every product re-rounds to 6 dp and sums as decimal, so
   * the final cosine is engine-exact.
   */
  def centroidDrift(df: DataFrame, labelCol: String, vecCol: String,
                    splitCol: String): DataFrame = {
    val c = df
      .select(concat(col(labelCol).cast(StringType), lit("|"),
        col(splitCol).cast(StringType)).as("graft_ls"),
        col(vecCol))
    val cents = centroids(c, "graft_ls", vecCol)
      .select(split(col("graft_ls"), "\\|").getItem(0).as(labelCol),
        split(col("graft_ls"), "\\|").getItem(1).as("graft_half"),
        col("dim"), col("centroid"))
    val a = cents.filter(col("graft_half") === "0")
      .select(col(labelCol), col("dim"), col("centroid").as("graft_ca"))
    val b = cents.filter(col("graft_half") === "1")
      .select(col(labelCol), col("dim"), col("centroid").as("graft_cb"))
    val ca = col("graft_ca")
    val cb = col("graft_cb")
    a.join(b, Seq(labelCol, "dim"))
      .groupBy(col(labelCol))
      .agg(count(lit(1)).as("n_dims"),
        sum(round(ca * cb, 6).cast(DecimalType(28, 6))).as("graft_sab"),
        sum(round(ca * ca, 6).cast(DecimalType(28, 6))).as("graft_saa"),
        sum(round(cb * cb, 6).cast(DecimalType(28, 6))).as("graft_sbb"))
      .select(col(labelCol), col("n_dims"),
        round(col("graft_sab").cast(DoubleType) /
          (sqrt(col("graft_saa").cast(DoubleType)) *
            sqrt(col("graft_sbb").cast(DoubleType))), 6)
          .as("centroid_cos"))
  }

  /** Centroid as an array column: (label, centroid_vec) — dims reassembled
    * in order via sort of (dim, value) structs. */
  def centroidVectors(df: DataFrame, labelCol: String,
                      vecCol: String): DataFrame =
    centroids(df, labelCol, vecCol)
      .groupBy(col(labelCol))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("centroid")))),
        s => s.getField("centroid")).as("centroid_vec"))

  /** Nearest centroid per vector (max 6-dp cosine, label-asc tiebreak).
    * `cent` must be (labelCol, centroid_vec); it is broadcast. The centroid
    * key is renamed to `cent_label` first — `df` typically carries the same
    * label column (it fed `centroids`), and an unrenamed crossJoin would
    * make every downstream col(labelCol) ambiguous. */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                cent: DataFrame, labelCol: String): DataFrame = {
    val c = cent.select(col(labelCol).as("cent_label"), col("centroid_vec"))
    val scored = df.crossJoin(broadcast(c))
      .withColumn("ccos",
        round(Similarity.cosine(col(vecCol), col("centroid_vec")), 6))
    LatestSnapshot.topK(scored, Seq(idCol),
        col("ccos").desc, Seq(col("cent_label").asc), 1)
      .select(col(idCol), col("cent_label").as("cluster"), col(vecCol))
  }

  /**
   * Deterministic distributed spherical k-means: seeds are the k
   * smallest-id vectors (no RNG — reproducible and oracle-checkable),
   * then `iters` Lloyd rounds of assign-to-max-cosine-centroid (6-dp
   * rounding, cluster-asc tiebreak) with exact-decimal mean updates
   * between rounds. Cluster labels are the seed ids.
   *
   * Scale shape per round: centroids are k rows → broadcast; assignment
   * is a narrow map over the corpus (k cosines/row, no vector shuffle);
   * the mean update is the `centroids` aggregation (posexplode +
   * map-side combine). Work is O(iters · n · k · dims) flops and
   * O(iters) corpus scans — the standard distributed-k-means layout; a
   * cluster emptied in round j simply drops out of round j+1 (both
   * engines agree because the update only groups over assigned rows).
   *
   * Returns the final assignment: (idCol, cluster, vecCol).
   */
  def kMeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
             iters: Int): DataFrame = {
    require(k >= 1 && iters >= 1, "k and iters must be >= 1")
    val seeds = df.orderBy(col(idCol).asc).limit(k)
      .select(col(idCol).as("cluster"), col(vecCol).as("centroid_vec"))
    var cent = seeds
    var assigned = ivfAssign(df, idCol, vecCol, cent, "cluster")
    for (_ <- 1 until iters) {
      cent = centroidVectors(assigned, "cluster", vecCol)
      assigned = ivfAssign(df, idCol, vecCol, cent, "cluster")
    }
    assigned
  }

  /**
   * Geometric median per label via Weiszfeld iterations (Weiszfeld 1937;
   * the robust-centroid estimator Cohen et al. 2016 made near-linear) —
   * the L1-in-distance center that a few poisoned or outlier embeddings
   * CANNOT drag the way they drag the mean ([[centroidVectors]]); the
   * robust prototype for cluster cards, drift baselines, and
   * contamination-resistant class centers. Starts from the component
   * mean and applies `iters` rounds of
   * `y ← Σ(xᵢ/dᵢ) / Σ(1/dᵢ)`, `dᵢ = ‖xᵢ − y‖`, with dᵢ floored at 1e-9
   * (the standard singularity guard when a point coincides with the
   * estimate — deterministic on both engines).
   *
   * Determinism: distances are the sequential-fold shape (zip_with diff
   * + strict double fold, the q252-proven oracle match); every summed
   * term is 6-dp DECIMAL so accumulation is order-independent; the
   * per-round division is one exactly-rounded double op. Both engines
   * replay the identical fixed number of rounds.
   *
   * Scale shape per round: estimates are |labels| rows → broadcast; the
   * corpus is scanned twice (Σ1/d reduce + the posexploded Σx/d reduce,
   * both map-side combinable, keyed by label / (label, dim)). No vector
   * ever shuffles; work is O(iters · n · dims) flops.
   */
  def geometricMedian(df: DataFrame, labelCol: String, vecCol: String,
                      iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    var est = centroidVectors(df, labelCol, vecCol)
    for (_ <- 1 to iters) {
      val joined = df.join(broadcast(
        est.select(col(labelCol), col("centroid_vec"))), labelCol)
      val diff = zip_with(col(vecCol).cast("array<double>"),
        col("centroid_vec"), (a, b) => a - b)
      val wd = greatest(sqrt(Similarity.dotHof(diff, diff)), lit(1e-9))
      val invw = joined.withColumn("graft_wd", wd)
        .groupBy(col(labelCol))
        .agg(sum(round(lit(1.0) / col("graft_wd"), 6)
          .cast(DecimalType(38, 6))).as("graft_sw"))
      val sums = joined.withColumn("graft_wd", wd)
        .select(col(labelCol), col("graft_wd"),
          posexplode(col(vecCol).cast("array<double>"))
            .as(Seq("dim", "graft_x")))
        .groupBy(col(labelCol), col("dim"))
        .agg(sum(round(col("graft_x") / col("graft_wd"), 6)
          .cast(DecimalType(38, 6))).as("graft_sx"))
      est = sums.join(invw, labelCol)
        .select(col(labelCol), col("dim"),
          round(col("graft_sx").cast(DoubleType) /
            col("graft_sw").cast(DoubleType), 6).as("graft_c"))
        .groupBy(col(labelCol))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("graft_c")))),
          s => s.getField("graft_c")).as("centroid_vec"))
    }
    est
      .select(col(labelCol),
        posexplode(col("centroid_vec")).as(Seq("dim", "gmedian")))
      .join(df.groupBy(col(labelCol)).agg(count(lit(1)).as("n_members")),
        labelCol)
      .select(col(labelCol), col("n_members"),
        col("dim").cast(LongType).as("dim"), col("gmedian"))
  }

  /**
   * Lightweight coreset sampling (Bachem, Lucic & Krause, KDD 2018):
   * an importance-weighted subset that provably approximates k-means
   * objectives on the full corpus — THE principled way to hand a
   * clustering/summarization job 10⁵ points instead of 10¹⁰. Each
   * point's sensitivity is `q(x) = ½·1/n + ½·d²(x, μ)/Σd²` (uniform
   * mass + distance-to-mean mass, so both dense cores and far outliers
   * are represented); `t` points are drawn ∝ q via deterministic A-ES
   * keys (the [[Sampling.weightedTopKPerStratum]] machinery, md5-seeded
   * — reproducible and oracle-replayable) and carry the unbiasing
   * weight 1/(t·q).
   *
   * Hashed surface: ids, 6-dp d², and floor-ppm sensitivity/weight —
   * divisions and floors of deterministic doubles only; the `ln` inside
   * the selection KEY never lands in a hashed column (the q104/q195
   * selection-only precedent). A zero-spread corpus (Σd² = 0) falls
   * back to uniform sensitivities instead of dividing by zero.
   *
   * Scale shape: the 1-row (μ, Σd², n) statistics broadcast; scoring is
   * a narrow projection; the t-cut rides WindowGroupLimit. Two corpus
   * passes (mean + score), zero vector shuffles.
   */
  def lightweightCoreset(df: DataFrame, idCol: String, vecCol: String,
                         t: Int, salt: String): DataFrame = {
    require(t >= 1, s"t=$t out of range")
    val base = df.select(col(idCol),
      col(vecCol).cast("array<double>").as("graft_x"))
    val meanVec = base
      .select(posexplode(col("graft_x")).as(Seq("dim", "graft_v")))
      .groupBy(col("dim"))
      .agg(round(sum(dec6(col("graft_v"))).cast(DoubleType) /
        count(lit(1)), 6).as("graft_c"))
      .groupBy()
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("graft_c")))),
        s => s.getField("graft_c")).as("graft_mu"))
    val diff = zip_with(col("graft_x"), col("graft_mu"), (a, b) => a - b)
    val scored = base.crossJoin(broadcast(meanVec))
      .withColumn("graft_d2",
        round(Similarity.dotHof(diff, diff), 6)
          .cast(DecimalType(18, 6)))
    val tot = scored.agg(sum(col("graft_d2")).as("graft_s"),
      count(lit(1)).as("graft_n"))
    val q = when(col("graft_s").cast(DoubleType) > 0.0,
      lit(0.5) / col("graft_n").cast(DoubleType) +
        col("graft_d2").cast(DoubleType) /
          (lit(2.0) * col("graft_s").cast(DoubleType)))
      .otherwise(lit(1.0) / col("graft_n").cast(DoubleType))
    val sens = scored.crossJoin(broadcast(tot))
      .withColumn("graft_q", q)
      .withColumn("graft_all", lit(1))
    Sampling.weightedTopKPerStratum(sens, idCol, "graft_q", "graft_all",
        salt, t)
      .select(col(idCol),
        col("graft_d2").cast(DoubleType).as("d2_mean"),
        floor(col("graft_q") * 1000000.0).cast(LongType).as("sens_ppm"),
        floor(lit(1000000.0) / (lit(t.toDouble) * col("graft_q")))
          .cast(LongType).as("weight_ppm"))
  }

  /**
   * SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup: Data-
   * efficient learning at web-scale through semantic deduplication",
   * 2023): given a clustered corpus (`assigned` = idCol, clusterCol,
   * vecCol — typically [[kMeans]] output), mark as duplicate every vector
   * with a smaller-id same-cluster neighbor at 6-dp cosine ≥ `threshold`.
   * Returns every input row as (idCol, clusterCol, dup_of): dup_of is the
   * smallest such neighbor id, NULL for survivors — the min-id survivor
   * rule shared with TextDedup.exactDedup.
   *
   * Scale shape: the pairwise test is an equi-join on the cluster id,
   * never a corpus-wide cross join. SemDeDup's own contract is that k
   * grows with n (per-cluster population n/k stays bounded), so the
   * pairwise volume Σ|c|² ≈ n·(n/k); a skewed cluster splits under AQE
   * skew-join because both sides are shuffle-hash partitioned on the same
   * key. Callers should persist/checkpoint the assignment first — it is
   * consumed three times (both join sides + the final restitch).
   */
  def semDedup(assigned: DataFrame, idCol: String, clusterCol: String,
               vecCol: String, threshold: Double): DataFrame = {
    val a = assigned.select(col(clusterCol), col(idCol).as("d1"),
      col(vecCol).as("v1"))
    val b = assigned.select(col(clusterCol), col(idCol).as("d2"),
      col(vecCol).as("v2"))
    val dups = a.join(b.hint("shuffle_hash"), Seq(clusterCol))
      .filter(col("d2") < col("d1"))
      .filter(round(Similarity.cosine(col("v1"), col("v2")), 6)
        >= threshold)
      .groupBy(col("d1"))
      .agg(min(col("d2")).as("dup_of"))
    assigned.select(col(idCol), col(clusterCol))
      .join(dups.withColumnRenamed("d1", idCol), Seq(idCol), "left")
  }

  /**
   * Per-dimension whitening (z-score normalization): each component is
   * rescaled by its dimension's corpus mean and standard deviation — the
   * preprocessing that equalizes dimension scales before quantization or
   * distance computations (the full-covariance cousin is PCA whitening;
   * per-dim is the standard cheap variant). Constant dimensions (sd = 0)
   * map to 0.
   *
   * Determinism contract: mean and mean-square are exact-decimal sums of
   * 6-dp-rounded components (the [[centroids]] rule), sd =
   * round(√max(msq − mean², 0), 6) — so the stats row is bit-identical
   * across partitionings and engines. Scale shape: one posexplode +
   * map-side-combined groupBy(dim), rolled into a single stats row that
   * rides a broadcast crossJoin; whitening itself is a narrow codegen'd
   * HOF — the corpus is scanned twice (train, apply), never shuffled.
   */
  def whiten(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val x = col("x").cast(DoubleType)
    val stats = df.select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(
        round(sum(dec6(x)).cast(DoubleType) / count(lit(1)), 6).as("mean"),
        round(sum(dec6(x * x)).cast(DoubleType) / count(lit(1)), 6).as("msq"))
      .withColumn("sd",
        round(sqrt(greatest(col("msq") - col("mean") * col("mean"),
          lit(0.0))), 6))
      .agg(
        transform(array_sort(collect_list(struct(col("dim"), col("mean")))),
          s => s.getField("mean")).as("graft_means"),
        transform(array_sort(collect_list(struct(col("dim"), col("sd")))),
          s => s.getField("sd")).as("graft_sds"))
    df.crossJoin(broadcast(stats))
      .withColumn("whitened", transform(col(vecCol), (v, i) => {
        val m = element_at(col("graft_means"), i + 1)
        val s = element_at(col("graft_sds"), i + 1)
        when(s === 0.0, lit(0.0)).otherwise((v.cast(DoubleType) - m) / s)
      }))
      .drop("graft_means", "graft_sds")
  }

  /** Per-dimension corpus (min, max) as ONE row of two aligned arrays —
    * the training pass of scalar quantization. posexplode + map-side
    * combined min/max per dim, then a k-dims-row rollup: nothing driver-
    * side, and the result is broadcastable metadata (2·dims doubles). */
  def dimStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(min(col("x").cast(DoubleType)).as("mn"),
        max(col("x").cast(DoubleType)).as("mx"))
      .agg(
        transform(array_sort(collect_list(struct(col("dim"), col("mn")))),
          s => s.getField("mn")).as("mins"),
        transform(array_sort(collect_list(struct(col("dim"), col("mx")))),
          s => s.getField("mx")).as("maxs"))

  /**
   * SQ8 scalar quantization: each component mapped to an int code in
   * 0..255 by its dimension's corpus (min, max) range — the 4×-8×
   * index-compression preprocessing of FAISS-style `SQ8` storage. The
   * stats row rides a 1-row broadcast crossJoin; quantization itself is a
   * narrow codegen'd HOF over the vector, so the corpus is scanned twice
   * (train, encode) and never shuffled. Constant dimensions (mx = mn)
   * encode as 0.
   */
  def sq8Codes(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val mn = (i: Column) => element_at(col("mins"), i + 1)
    val mx = (i: Column) => element_at(col("maxs"), i + 1)
    df.crossJoin(broadcast(dimStats(df, vecCol)))
      .withColumn("codes", transform(col(vecCol), (x, i) =>
        when(mx(i) === mn(i), lit(0L)).otherwise(
          floor((x.cast(DoubleType) - mn(i)) / (mx(i) - mn(i)) * lit(255.0))
            .cast(LongType))))
      .select(col(idCol), col("codes"))
  }

  /**
   * kNN label propagation: rows matching `queryPred` get a predicted
   * label by majority vote of their `k` nearest (cosine) neighbors among
   * the REMAINING (labeled) rows — the semi-supervised labeling /
   * weak-supervision step of dataset construction, and (run on held-out
   * rows whose true label is known, as q131 does) the standard
   * label-quality audit.
   *
   * Shape: the bounded query set is broadcast; the labeled corpus is
   * scanned ONCE for all queries; top-k rides WindowGroupLimit on the
   * 6-dp cosine (deterministic at ties via the neighbor id); the vote
   * and the argmax are per-query aggregations over ≤ k rows. Majority
   * ties break by smaller label.
   */
  def knnPredict(df: DataFrame, idCol: String, vecCol: String,
                 labelCol: String, queryPred: Column, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be positive")
    val queries = df.filter(queryPred)
      .select(col(idCol).as("q_id"), col(vecCol).as("graft_qv"),
        col(labelCol).as("true_label"))
    val scored = df.filter(!queryPred)
      .crossJoin(broadcast(queries))
      .select(col("q_id"), col("true_label"), col(idCol).as("graft_nid"),
        col(labelCol).as("graft_nlabel"),
        round(Similarity.cosine(col(vecCol), col("graft_qv")), 6)
          .as("graft_cos"))
    val nearest = LatestSnapshot.topK(scored, Seq("q_id"),
      col("graft_cos").desc, Seq(col("graft_nid").asc), k)
    val votes = nearest.groupBy(col("q_id"), col("true_label"),
        col("graft_nlabel"))
      .agg(count(lit(1)).as("n_votes"))
    LatestSnapshot.topK(votes, Seq("q_id"),
        col("n_votes").desc, Seq(col("graft_nlabel").asc), 1)
      .select(col("q_id").as(idCol),
        col("graft_nlabel").as("predicted_label"),
        col("n_votes"), col("true_label"))
  }

  /**
   * Binary (sign-bit) vector quantization: bit i of the code is set iff
   * dimension i is positive — 64 dims collapse into ONE int64, a 256×
   * compression of a float64[64] that still preserves enough angular
   * structure for Hamming-distance candidate generation (pair it with
   * [[TextDedup.hammingPairs]]'s pigeonhole bands for exact-recall
   * search over the codes). A narrow codegen'd HOF projection — no
   * shuffle, no stats pass (unlike [[sq8Codes]], the sign threshold
   * needs no training).
   *
   * Dimension 63 lands on the int64 sign bit (Java `1L << 63` =
   * Long.MinValue) — the oracle reproduces that two's-complement wrap
   * explicitly.
   */
  def signCodes(df: DataFrame, idCol: String, vecCol: String,
                dims: Int): DataFrame = {
    require(dims >= 1 && dims <= 64, s"dims=$dims must fit one int64")
    // slice to dims: extra dimensions must not set extra bits (a 64+-dim
    // vector would otherwise alias bits via Java's shift-count mod 64)
    val terms = transform(slice(col(vecCol), 1, dims), (x, i) =>
      when(x > lit(0.0f), call_function("shiftleft", lit(1L), i))
        .otherwise(lit(0L)))
    df.select(col(idCol),
      aggregate(terms, lit(0L), (acc, t) => acc + t).as("code"))
  }

  /**
   * IVF ANN top-k: queries (rows matching `queryPred`) probe their
   * `nprobe` nearest centroid buckets and are re-ranked by exact cosine
   * against only the vectors assigned to those buckets.
   */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, labelCol: String,
              queryPred: Column, k: Int, nprobe: Int): DataFrame = {
    val cent = centroidVectors(df, labelCol, vecCol)
    val assign = ivfAssign(df, idCol, vecCol, cent, labelCol)
      .select(col(idCol).as("c_id"), col("cluster"),
        col(vecCol).as("c_vec"))
    val qScored = df.filter(queryPred)
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .crossJoin(broadcast(
        cent.select(col(labelCol).as("cent_label"), col("centroid_vec"))))
      .withColumn("ccos",
        round(Similarity.cosine(col("q_vec"), col("centroid_vec")), 6))
    val probes = LatestSnapshot.topK(qScored, Seq("q_id"),
        col("ccos").desc, Seq(col("cent_label").asc), nprobe)
      .select(col("q_id"), col("q_vec"), col("cent_label").as("cluster"))
    val cands = probes.join(assign, "cluster")
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine",
        round(Similarity.cosine(col("q_vec"), col("c_vec")), 6))
    LatestSnapshot.topK(cands, Seq("q_id"),
        col("cosine").desc, Seq(col("c_id").asc), k)
      .select(col("q_id"), col("c_id"), col("cosine"))
  }

  /**
   * Product-quantization encode (Jégou et al. TPAMI 2011): split each
   * `dims`-dim vector into `m` contiguous subspaces of dims/m and assign
   * every subvector to its nearest codeword (squared L2, ties → smallest
   * code). The codebook here is the PQ SEEDING step — the first `k`
   * vectors by id, exactly [[kMeans]]'s seed rule; refining each
   * subspace's codebook with per-subspace k-means iterations composes
   * from [[kMeans]] the same way q61 does. Output one row per
   * (vector, subspace): the code and its quantization error — summing
   * `l2_sq` over a vector's m rows gives the reconstruction error, and
   * m × log₂k bits replace dims × 32.
   *
   * Scale shape: the codebook is k rows (metadata) — ONE broadcast
   * against a single corpus pass; per row the work is k·dims
   * multiply-adds through the codegen'd `l2_sq` kernel on array slices
   * (no per-dim explode of the corpus). The subspace fan-out (×m) and
   * candidate fan-out (×k) happen AFTER the broadcast join, inside the
   * same stage, and collapse immediately in a (vec, subspace)-keyed
   * min — map-side combinable, never more than m rows per vector leave
   * the stage.
   */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               dims: Int, m: Int, k: Int): DataFrame = {
    require(m >= 1 && dims % m == 0, s"m=$m must divide dims=$dims")
    require(k >= 1, s"k=$k codewords required")
    val sub = dims / m
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(idCol))
    // k-row table: window renumber is metadata-scale by construction
    val codebook = df.orderBy(col(idCol)).limit(k)
      .select((row_number().over(w) - 1).as("graft_code"),
        col(vecCol).as("graft_cv"))
    val perSub = (0 until m).map { j =>
      struct(lit(j).as("subspace"),
        round(VectorFunctions.l2Sq(
          slice(col(vecCol), j * sub + 1, sub),
          slice(col("graft_cv"), j * sub + 1, sub)), 6).as("dist"))
    }
    df.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(codebook))
      .select(col(idCol), col("graft_code"),
        explode(array(perSub: _*)).as("graft_sd"))
      .groupBy(col(idCol), col("graft_sd.subspace").as("subspace"))
      .agg(min(struct(col("graft_sd.dist").as("dist"),
        col("graft_code").as("code"))).as("graft_best"))
      .select(col(idCol), col("subspace"),
        col("graft_best.code").as("code"),
        col("graft_best.dist").as("l2_sq"))
  }

  /**
   * PQ asymmetric-distance top-k + recall audit — the query half of the
   * [[pqEncode]] index and the measurement that decides whether the
   * compressed index is USABLE: ADC (Jégou et al. 2011 §IV.A) scores a
   * query against codes via an m×k lookup table of subspace distances,
   * and recall@k against the exact scan is THE quality metric quoted
   * for a billion-scale ANN deployment (the IVF/PQ configuration knob).
   *
   * Determinism: every LUT entry is the 6-dp-rounded subspace ℓ²
   * (DECIMAL(18,6)); the ADC distance is their DECIMAL SUM —
   * order-independent and engine-exact, so the (dist asc, id asc)
   * top-k is reproducible anywhere. The exact side rounds its ℓ² once
   * at 6 dp with the same sequential-fold semantics the oracle's
   * list_sum uses. The audit output (`n_overlap`, `recall_ppm`) is
   * exact-integer.
   *
   * Scale shape: queries are benchmark-sized by contract — the LUT
   * (|Q|·m·k rows, metadata scale) broadcasts; the code table joins it
   * WITHOUT touching raw vectors (m longs per corpus vector — the whole
   * point of PQ), and the per-(query, vector) sum is a map-side-
   * combinable hash-agg. Per-query cuts ride [[LatestSnapshot.topK]]'s
   * WindowGroupLimit. The exact scan is ONE corpus pass against the
   * broadcast queries — it exists to GRADE the index; production
   * serving would run ADC alone (plus the IVF prefilter at 100 TB).
   */
  def pqAdcRecall(df: DataFrame, idCol: String, vecCol: String,
                  queries: DataFrame, qidCol: String,
                  dims: Int, m: Int, k: Int, topK: Int): DataFrame = {
    require(topK >= 1, s"topK=$topK must be positive")
    val sub = dims / m
    val codes = pqEncode(df, idCol, vecCol, dims, m, k)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(idCol))
    val codebook = df.orderBy(col(idCol)).limit(k)
      .select((row_number().over(w) - 1).as("code"),
        col(vecCol).as("graft_cv"))
    // LUT: per (query, subspace, code) the 6-dp subspace distance —
    // |Q|·m·k rows, built by a metadata-scale cross of two broadcasts
    val lutSub = (0 until m).map { j =>
      struct(lit(j).as("subspace"),
        round(VectorFunctions.l2Sq(
          slice(col("graft_qv"), j * sub + 1, sub),
          slice(col("graft_cv"), j * sub + 1, sub)), 6)
          .cast(DecimalType(18, 6)).as("d"))
    }
    val lut = queries
      .select(col(qidCol).as("qid"), col(vecCol).as("graft_qv"))
      .crossJoin(broadcast(codebook))
      .select(col("qid"), col("code"),
        explode(array(lutSub: _*)).as("graft_sd"))
      .select(col("qid"), col("graft_sd.subspace").as("subspace"),
        col("code"), col("graft_sd.d").as("graft_d"))
    val adc = codes
      .join(broadcast(lut), Seq("subspace", "code"))
      .groupBy(col("qid"), col(idCol))
      .agg(sum(col("graft_d")).as("graft_adc"))
    val approx = LatestSnapshot.topK(adc, Seq("qid"),
        col("graft_adc").asc, Seq(col(idCol).asc), topK)
      .select(col("qid"), col(idCol))
    val exact = LatestSnapshot.topK(
        df.select(col(idCol), col(vecCol))
          .crossJoin(broadcast(queries.select(col(qidCol).as("qid"),
            col(vecCol).as("graft_qv"))))
          .select(col("qid"), col(idCol),
            round(VectorFunctions.l2Sq(col(vecCol), col("graft_qv")), 6)
              .as("graft_ed")),
        Seq("qid"), col("graft_ed").asc, Seq(col(idCol).asc), topK)
      .select(col("qid"), col(idCol))
    exact.join(approx.withColumn("graft_hit", lit(1L)),
        Seq("qid", idCol), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(col("graft_hit")), lit(0L)).as("n_overlap"))
      .withColumn("recall_ppm",
        expr("(1000000 * n_overlap) div n_exact"))
  }

  /** Corpus rows exploded to per-subspace subvectors: (idCol, subspace,
    * graft_sv) — the unit both PQ training and encoding operate on. */
  private def subvectors(df: DataFrame, idCol: String, vecCol: String,
                         sub: Int, m: Int): DataFrame =
    df.select(col(idCol), explode(array((0 until m).map { j =>
        struct(lit(j).as("subspace"),
          slice(col(vecCol), j * sub + 1, sub).as("graft_sv"))
      }: _*)).as("graft_s"))
      .select(col(idCol), col("graft_s.subspace").as("subspace"),
        col("graft_s.graft_sv").as("graft_sv"))

  /** Seeded PQ codebook in SUBVECTOR form: (subspace, code, graft_cv) —
    * the k smallest-id vectors' slices, the same deterministic seeding
    * [[pqEncode]] uses (and the Lloyd start of [[pqTrain]]). */
  def pqCodebookSeeded(df: DataFrame, idCol: String, vecCol: String,
                       dims: Int, m: Int, k: Int): DataFrame = {
    require(m >= 1 && dims % m == 0, s"m=$m must divide dims=$dims")
    val sub = dims / m
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(idCol))
    subvectors(
        df.orderBy(col(idCol)).limit(k)
          .select((row_number().over(w) - 1).as("graft_code"), col(vecCol)),
        "graft_code", vecCol, sub, m)
      .select(col("subspace"), col("graft_code").as("code"), col("graft_sv")
        .as("graft_cv"))
  }

  /** PQ encode against an EXPLICIT subvector codebook (trained or
    * seeded): per (vector, subspace) the nearest codeword by 6-dp ℓ²,
    * code-asc tiebreak — identical tie semantics to [[pqEncode]].
    * Codebook is m·k rows → broadcast; the corpus never shuffles raw
    * vectors (the per-(id, subspace) min is a map-side-combinable agg). */
  def pqEncodeWith(df: DataFrame, idCol: String, vecCol: String,
                   codebook: DataFrame, dims: Int, m: Int): DataFrame = {
    val sub = dims / m
    subvectors(df, idCol, vecCol, sub, m)
      .join(broadcast(codebook), Seq("subspace"))
      .withColumn("graft_d",
        round(VectorFunctions.l2Sq(col("graft_sv"), col("graft_cv")), 6))
      .groupBy(col(idCol), col("subspace"))
      .agg(min(struct(col("graft_d").as("dist"), col("code").as("code")))
        .as("graft_best"))
      .select(col(idCol), col("subspace"),
        col("graft_best.code").as("code"),
        col("graft_best.dist").as("l2_sq"))
  }

  /**
   * TRAIN the PQ codebook — per-subspace Lloyd k-means on the subvector
   * slices (the actual Jégou 2011 §III recipe; [[pqEncode]]'s seeded
   * codebook is the zero-iteration special case). All m subspaces train
   * in ONE pass per round: assignment is the broadcast codebook join
   * keyed by subspace, the update is the exact-decimal centroid rule
   * ([[centroids]] — 6-dp component rounding into DECIMAL(38,6), so the
   * means are order-independent and engine-portable), and codewords
   * keep their identity across rounds (an emptied cell drops out, the
   * q61 k-means contract). Returns (subspace, code, graft_cv).
   *
   * Scale shape per round: one corpus pass (broadcast join + min
   * struct agg keyed (id, subspace)) + one metadata-scale centroid agg
   * keyed (subspace, code, dim) — m·k·sub rows. Raw vectors never
   * cross a shuffle; the per-round frames are localCheckpointed so the
   * iterated lineage stays flat.
   */
  def pqTrain(df: DataFrame, idCol: String, vecCol: String,
              dims: Int, m: Int, k: Int, iters: Int): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    val sub = dims / m
    val sv = subvectors(df, idCol, vecCol, sub, m).localCheckpoint()
    var cb = pqCodebookSeeded(df, idCol, vecCol, dims, m, k)
    for (_ <- 1 to iters) {
      val assigned = sv
        .join(broadcast(cb), Seq("subspace"))
        .withColumn("graft_d",
          round(VectorFunctions.l2Sq(col("graft_sv"), col("graft_cv")), 6))
        .groupBy(col(idCol), col("subspace"))
        .agg(min(struct(col("graft_d").as("dist"), col("code").as("code")))
          .as("graft_best"),
          // every fanned-out row of the (id, subspace) group carries the
          // SAME subvector, so first() is value-deterministic here
          first(col("graft_sv")).as("graft_sv"))
        .select(col("subspace"), col("graft_best.code").as("code"),
          col("graft_sv"))
      cb = centroidVectors(
          assigned.select(
            concat(col("subspace").cast(StringType), lit("|"),
              col("code").cast(StringType)).as("graft_sc"),
            col("graft_sv")),
          "graft_sc", "graft_sv")
        .select(
          split(col("graft_sc"), "\\|").getItem(0).cast("int")
            .as("subspace"),
          split(col("graft_sc"), "\\|").getItem(1).cast("int").as("code"),
          col("centroid_vec").as("graft_cv"))
        .localCheckpoint()
    }
    cb
  }

  /** [[pqAdcRecall]] against an EXPLICIT (trained) subvector codebook:
    * same LUT/ADC/exact-grading machinery, same engine-portable decimal
    * distances and exact-integer recall columns. */
  def pqAdcRecallWith(df: DataFrame, idCol: String, vecCol: String,
                      queries: DataFrame, qidCol: String,
                      codebook: DataFrame, dims: Int, m: Int,
                      topK: Int): DataFrame = {
    require(topK >= 1, s"topK=$topK must be positive")
    val sub = dims / m
    val codes = pqEncodeWith(df, idCol, vecCol, codebook, dims, m)
    val lut = subvectors(
        queries.select(col(qidCol).as("qid"), col(vecCol)),
        "qid", vecCol, sub, m)
      .join(broadcast(codebook), Seq("subspace"))
      .select(col("qid"), col("subspace"), col("code"),
        round(VectorFunctions.l2Sq(col("graft_sv"), col("graft_cv")), 6)
          .cast(DecimalType(18, 6)).as("graft_d"))
    val adc = codes
      .join(broadcast(lut), Seq("subspace", "code"))
      .groupBy(col("qid"), col(idCol))
      .agg(sum(col("graft_d")).as("graft_adc"))
    val approx = LatestSnapshot.topK(adc, Seq("qid"),
        col("graft_adc").asc, Seq(col(idCol).asc), topK)
      .select(col("qid"), col(idCol))
    val exact = LatestSnapshot.topK(
        df.select(col(idCol), col(vecCol))
          .crossJoin(broadcast(queries.select(col(qidCol).as("qid"),
            col(vecCol).as("graft_qv"))))
          .select(col("qid"), col(idCol),
            round(VectorFunctions.l2Sq(col(vecCol), col("graft_qv")), 6)
              .as("graft_ed")),
        Seq("qid"), col("graft_ed").asc, Seq(col(idCol).asc), topK)
      .select(col("qid"), col(idCol))
    exact.join(approx.withColumn("graft_hit", lit(1L)),
        Seq("qid", idCol), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(col("graft_hit")), lit(0L)).as("n_overlap"))
      .withColumn("recall_ppm",
        expr("(1000000 * n_overlap) div n_exact"))
  }

  /**
   * IVF+PQ combined query path with recall audit — the full
   * billion-scale ANN serving layout (Jégou 2011 §V: a coarse inverted
   * file prunes WHICH vectors are scored, PQ compresses HOW they are
   * scored): queries probe their `nprobe` nearest coarse cells (the
   * [[kMeans]] clustering, ranked by 6-dp cosine to the final-assignment
   * centroids — the q61-gated surface), and ADC runs ONLY over the
   * vectors living in probed cells, against the [[pqTrain]]-trained
   * codebook. The audit grades the whole stack: recall@k vs the exact
   * scan now reflects BOTH losses (cell pruning + quantization) — the
   * two knobs (nprobe, k·m) a deployment tunes against each other.
   *
   * Scale shape: the corpus is touched by the coarse assignment
   * (broadcast centroids, narrow), the PQ encode (broadcast codebook),
   * and ONE candidate join keyed by cluster — expected candidate volume
   * |Q|·n·nprobe/coarseK, the IVF point; the ADC sum shuffles only
   * (qid, id, decimal) rows. Determinism: every ranking is 6-dp-rounded
   * with id/cluster tiebreaks; ADC distances are order-independent
   * DECIMAL sums; the audit columns are exact integers.
   */
  def ivfPqRecall(df: DataFrame, idCol: String, vecCol: String,
                  queries: DataFrame, qidCol: String,
                  dims: Int, m: Int, k: Int,
                  coarseK: Int, coarseIters: Int, nprobe: Int,
                  topK: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= coarseK,
      s"nprobe=$nprobe must be in [1, coarseK=$coarseK]")
    val assigned = kMeans(df, idCol, vecCol, coarseK, coarseIters)
      .localCheckpoint()
    val probeCents = centroidVectors(assigned, "cluster", vecCol)
    val probes = LatestSnapshot.topK(
        queries.select(col(qidCol).as("qid"), col(vecCol).as("graft_qv"))
          .crossJoin(broadcast(probeCents))
          .withColumn("graft_pc",
            round(Similarity.cosine(col("graft_qv"), col("centroid_vec")),
              6)),
        Seq("qid"), col("graft_pc").desc, Seq(col("cluster").asc), nprobe)
      .select(col("qid"), col("cluster"))
    val cb = pqTrain(df, idCol, vecCol, dims, m, k, iters = 1)
    val codes = pqEncodeWith(df, idCol, vecCol, cb, dims, m)
      .localCheckpoint()
    val sub = dims / m
    val lut = subvectors(
        queries.select(col(qidCol).as("qid"), col(vecCol)),
        "qid", vecCol, sub, m)
      .join(broadcast(cb), Seq("subspace"))
      .select(col("qid"), col("subspace"), col("code"),
        round(VectorFunctions.l2Sq(col("graft_sv"), col("graft_cv")), 6)
          .cast(DecimalType(18, 6)).as("graft_d"))
    // candidates: vectors in the probed cells — the cluster-keyed join
    // that replaces the full scan
    val cand = assigned.select(col(idCol), col("cluster"))
      .join(probes, Seq("cluster"))
      .select(col("qid"), col(idCol))
    val adc = cand
      .join(codes, Seq(idCol))
      .join(broadcast(lut), Seq("qid", "subspace", "code"))
      .groupBy(col("qid"), col(idCol))
      .agg(sum(col("graft_d")).as("graft_adc"))
    val approx = LatestSnapshot.topK(adc, Seq("qid"),
        col("graft_adc").asc, Seq(col(idCol).asc), topK)
      .select(col("qid"), col(idCol))
    val exact = LatestSnapshot.topK(
        df.select(col(idCol), col(vecCol))
          .crossJoin(broadcast(queries.select(col(qidCol).as("qid"),
            col(vecCol).as("graft_qv"))))
          .select(col("qid"), col(idCol),
            round(VectorFunctions.l2Sq(col(vecCol), col("graft_qv")), 6)
              .as("graft_ed")),
        Seq("qid"), col("graft_ed").asc, Seq(col(idCol).asc), topK)
      .select(col("qid"), col(idCol))
    exact.join(approx.withColumn("graft_hit", lit(1L)),
        Seq("qid", idCol), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(col("graft_hit")), lit(0L)).as("n_overlap"))
      .withColumn("recall_ppm",
        expr("(1000000 * n_overlap) div n_exact"))
  }

  /**
   * IVFADC with RESIDUAL encoding — the exact Jégou 2011 §V layout:
   * [[ivfPqRecall]] PQ-encodes raw vectors, but the paper quantizes the
   * residual x − c(cell(x)), because residuals concentrate near the
   * origin where a small codebook spends its codewords far better than
   * on the full-space spread (the reason production IVFADC indexes are
   * residual-based). The query side mirrors it: for each PROBED cell
   * the query's residual against that cell's centroid drives the LUT,
   * so the LUT key grows to (qid, cell, subspace, code) —
   * |Q|·nprobe·m·k rows, still broadcast-scale.
   *
   * Scale shape: identical to [[ivfPqRecall]] plus one broadcast
   * centroid join to form residuals (narrow zip_with projection; raw
   * vectors still never cross a shuffle). ADC remains an
   * order-independent DECIMAL sum; the audit columns stay
   * exact-integer. With a lossless codebook and full probing, residual
   * ADC is EXACT (‖(q−c) − (x−c)‖ = ‖q−x‖) — spec-asserted, the
   * property raw-vector encoding shares only trivially.
   */
  def ivfPqResidualRecall(df: DataFrame, idCol: String, vecCol: String,
                          queries: DataFrame, qidCol: String,
                          dims: Int, m: Int, k: Int,
                          coarseK: Int, coarseIters: Int, nprobe: Int,
                          topK: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= coarseK,
      s"nprobe=$nprobe must be in [1, coarseK=$coarseK]")
    val sub = dims / m
    val assigned = kMeans(df, idCol, vecCol, coarseK, coarseIters)
      .localCheckpoint()
    val cents = centroidVectors(assigned, "cluster", vecCol)
    val resid = assigned.join(broadcast(cents), Seq("cluster"))
      .select(col(idCol), col("cluster"),
        zip_with(col(vecCol), col("centroid_vec"),
          (a, b) => a.cast(DoubleType) - b).as("graft_rv"))
      .localCheckpoint()
    val cb = pqTrain(resid, idCol, "graft_rv", dims, m, k, iters = 1)
    val codes = pqEncodeWith(resid, idCol, "graft_rv", cb, dims, m)
      .localCheckpoint()
    // cut to (qid, cluster) BEFORE the per-query window so the probe
    // exchange carries no vector columns; the query/centroid arrays are
    // re-attached afterwards via broadcasts (both metadata-scale)
    val probes = LatestSnapshot.topK(
        queries.select(col(qidCol).as("qid"), col(vecCol).as("graft_qv"))
          .crossJoin(broadcast(cents))
          .select(col("qid"), col("cluster"),
            round(Similarity.cosine(col("graft_qv"), col("centroid_vec")),
              6).as("graft_pc")),
        Seq("qid"), col("graft_pc").desc, Seq(col("cluster").asc), nprobe)
      .select(col("qid"), col("cluster"))
    val qres = probes
      .join(broadcast(queries.select(col(qidCol).as("qid"),
        col(vecCol).as("graft_qv"))), Seq("qid"))
      .join(broadcast(cents), Seq("cluster"))
      .select(col("qid"), col("cluster"),
        zip_with(col("graft_qv"), col("centroid_vec"),
          (a, b) => a.cast(DoubleType) - b).as("graft_qr"))
    val lut = qres
      .select(col("qid"), col("cluster"),
        explode(array((0 until m).map { j =>
          struct(lit(j).as("subspace"),
            slice(col("graft_qr"), j * sub + 1, sub).as("graft_sv"))
        }: _*)).as("graft_s"))
      .select(col("qid"), col("cluster"),
        col("graft_s.subspace").as("subspace"),
        col("graft_s.graft_sv").as("graft_sv"))
      .join(broadcast(cb), Seq("subspace"))
      .select(col("qid"), col("cluster"), col("subspace"), col("code"),
        round(VectorFunctions.l2Sq(col("graft_sv"), col("graft_cv")), 6)
          .cast(DecimalType(18, 6)).as("graft_d"))
    val cand = assigned.select(col(idCol), col("cluster"))
      .join(probes.select(col("qid"), col("cluster")), Seq("cluster"))
    val adc = cand
      .join(codes.select(col(idCol), col("subspace"), col("code")),
        Seq(idCol))
      .join(broadcast(lut), Seq("qid", "cluster", "subspace", "code"))
      .groupBy(col("qid"), col(idCol))
      .agg(sum(col("graft_d")).as("graft_adc"))
    val approx = LatestSnapshot.topK(adc, Seq("qid"),
        col("graft_adc").asc, Seq(col(idCol).asc), topK)
      .select(col("qid"), col(idCol))
    val exact = LatestSnapshot.topK(
        df.select(col(idCol), col(vecCol))
          .crossJoin(broadcast(queries.select(col(qidCol).as("qid"),
            col(vecCol).as("graft_qv"))))
          .select(col("qid"), col(idCol),
            round(VectorFunctions.l2Sq(col(vecCol), col("graft_qv")), 6)
              .as("graft_ed")),
        Seq("qid"), col("graft_ed").asc, Seq(col(idCol).asc), topK)
      .select(col("qid"), col(idCol))
    exact.join(approx.withColumn("graft_hit", lit(1L)),
        Seq("qid", idCol), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(col("graft_hit")), lit(0L)).as("n_overlap"))
      .withColumn("recall_ppm",
        expr("(1000000 * n_overlap) div n_exact"))
  }

  /**
   * Prototypicality-based data pruning (Sorscher et al. 2022, "Beyond
   * neural scaling laws" — the SSL-prototypes metric; the second half
   * of D4 after [[semDedup]]): a vector's difficulty is its cosine to
   * its cluster's centroid — the MOST prototypical (highest-cosine)
   * examples carry the least training signal, so inside each cluster
   * the top `pruneNum/pruneDen` fraction by prototypicality is marked
   * pruned and the hard tail kept.
   *
   * Takes a clustered corpus (`assigned` = idCol, clusterCol, vecCol —
   * typically [[kMeans]] output). The prune rule is integer-exact:
   * rank r (1 = most prototypical, 6-dp cosine desc, id-asc tiebreak)
   * is pruned iff r·pruneDen ≤ pruneNum·n_cluster — exactly
   * r ≤ ⌊pruneNum·n/pruneDen⌋ without float thresholds.
   *
   * Scale shape: centroids are k rows → broadcast join, the cosine is
   * one codegen'd pass per row; the rank is a per-cluster window under
   * SemDeDup's own contract that k grows with n (per-cluster population
   * n/k bounded, so no partition outgrows a task; a pathological
   * mega-cluster is the caller's clustering problem, not the prune's).
   *
   * Returns (idCol, clusterCol, n_cluster, proto_rank, proto_cos,
   * pruned).
   */
  def prototypePrune(assigned: DataFrame, idCol: String, clusterCol: String,
                     vecCol: String, pruneNum: Int, pruneDen: Int): DataFrame = {
    require(pruneDen >= 1 && pruneNum >= 0 && pruneNum <= pruneDen,
      s"prune fraction $pruneNum/$pruneDen outside [0, 1]")
    // micro-exact centroid components (r13 sf0.1-audit fix): the former
    // round(Σx̂/n, 6) centroid is an exact rational through round() —
    // PORTABILITY rule 1's forbidden shape — and at sf0.1 one survivor
    // centroid coordinate landed on a half-micro tie, flipping ranks
    // under 1-ulp drift. micro/10⁶ back to double is correctly rounded
    // identically in every engine, so the scored cosine's inputs are
    // bit-identical by construction.
    val cent = centroidsMicro(assigned, clusterCol, vecCol)
      .groupBy(col(clusterCol))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("centroid_micro")))),
        s => s.getField("centroid_micro").cast(DoubleType) / lit(1000000.0))
        .as("centroid_vec"))
      .select(col(clusterCol), col("centroid_vec"))
    val scored = assigned.join(broadcast(cent), Seq(clusterCol))
      .withColumn("proto_cos",
        round(Similarity.cosine(col(vecCol), col("centroid_vec")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(clusterCol))
    scored
      .withColumn("proto_rank", row_number().over(
        w.orderBy(col("proto_cos").desc, col(idCol).asc)))
      .withColumn("n_cluster", count(lit(1)).over(w))
      .select(col(idCol), col(clusterCol), col("n_cluster"),
        col("proto_rank").cast(LongType).as("proto_rank"), col("proto_cos"),
        (col("proto_rank") * pruneDen <= lit(pruneNum) * col("n_cluster"))
          .as("pruned"))
  }

  /**
   * Facility-location greedy subset selection (Lin & Bilmes, ACL 2011 —
   * THE submodular objective for training-data subset selection):
   * greedily pick k candidates maximizing F(S) = Σ_v max_{s∈S} sim(v,s),
   * i.e. each pick adds the candidate with the largest total coverage
   * GAIN over the whole ground set. The classic lazy-greedy guarantee
   * (1 − 1/e) holds for plain greedy too.
   *
   * Determinism/portability: similarities are 6-dp decimals (the q41
   * cosine rule), cover and gains stay DECIMAL — the argmax compares
   * exact decimals with an id tiebreak, and the hashed `gain` is exact.
   *
   * Scale shape: ONE corpus×candidate similarity table (bounded by the
   * candidate pool, never corpus²), then k rounds of one hash-agg
   * (gain per candidate), a 1-row broadcast argmax — no driver
   * collect — and one cover update keyed on the ground-set id; cover
   * is checkpointed per round.
   */
  def facilityLocationGreedy(df: DataFrame, idCol: String, vecCol: String,
                             candPred: Column, k: Int): DataFrame = {
    require(k >= 1 && k <= 16, s"k=$k out of range (1..16)")
    val corpus = df.select(col(idCol).as("graft_v"),
      col(vecCol).as("graft_vv"))
    val cands = df.filter(candPred).select(col(idCol).as("graft_c"),
      col(vecCol).as("graft_cv"))
    val sims = corpus.crossJoin(broadcast(cands))
      .select(col("graft_v"), col("graft_c"),
        round(Similarity.cosine(col("graft_vv"), col("graft_cv")), 6)
          .cast(DecimalType(18, 6)).as("graft_sim"))
      .localCheckpoint(eager = false)
    var cover = corpus.select(col("graft_v"),
      lit(BigDecimal(0).setScale(6)).cast(DecimalType(18, 6))
        .as("graft_cov"))
    var picked = df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("sel_rank",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("graft_c",
          cands.schema("graft_c").dataType),
        org.apache.spark.sql.types.StructField("gain",
          DecimalType(38, 6)))))
    for (r <- 1 to k) {
      val gains = sims
        .join(picked.select(col("graft_c")), Seq("graft_c"), "left_anti")
        .join(cover, Seq("graft_v"))
        .groupBy(col("graft_c"))
        .agg(sum(greatest(col("graft_sim") - col("graft_cov"),
          lit(BigDecimal(0).setScale(6)).cast(DecimalType(18, 6))))
          .cast(DecimalType(38, 6)).as("gain"))
      val chosen = gains.orderBy(col("gain").desc, col("graft_c").asc)
        .limit(1)
        .select(lit(r.toLong).as("sel_rank"), col("graft_c"), col("gain"))
        .localCheckpoint()
      picked = picked.union(chosen).localCheckpoint(eager = false)
      cover = cover
        .join(sims.join(broadcast(chosen.select(col("graft_c"))),
          Seq("graft_c")).select(col("graft_v"),
          col("graft_sim").as("graft_new")), Seq("graft_v"), "left")
        .select(col("graft_v"),
          greatest(col("graft_cov"), coalesce(col("graft_new"),
            lit(BigDecimal(0).setScale(6)).cast(DecimalType(18, 6))))
            .as("graft_cov"))
        .localCheckpoint()
    }
    // each round's gain is a sum of 6-dp decimals, so it is an exact
    // multiple of 10⁻⁶ — reported ×10⁶ as BIGINT (the r11 gate rule:
    // no hashed output wider than DECIMAL(18); internals stay decimal)
    picked.select(col("sel_rank"), col("graft_c").as(idCol),
      (col("gain") * lit(1000000L))
        .cast(org.apache.spark.sql.types.LongType).as("gain_micro"))
  }
}

package graft
/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds. Each query is forced
  * with .count() (full plan execution, no result materialization cost). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Repetitions per query (args[0] or SPARK_GRAFT_BENCH_REPS, default
    // 2): single-shot timings on a shared-JVM sequential run moved
    // ±15-40% round-over-round with zero code changes (r7's phantom
    // q145/q147/q181 "regressions") — min-of-N is the standard stable
    // estimator (GC pauses and JIT races only ever ADD time). The first
    // rep's time is still reported for continuity with earlier rounds.
    // An EXPLICIT reps value must be a positive integer — a typo'd arg or
    // an explicit 0 erroring loudly beats silently benchmarking at a
    // different rep count than the caller believes.
    val reps = args.headOption.orElse(sys.env.get("SPARK_GRAFT_BENCH_REPS"))
      .map { s =>
        val n = scala.util.Try(s.trim.toInt).getOrElse(
          sys.error(s"bench reps must be an integer, got: '$s'"))
        require(n >= 1, s"bench reps must be >= 1, got: $n")
        n
      }.getOrElse(2)
    val spark = GraftSession.local()
    // dev iteration aid: SPARK_GRAFT_BENCH_ONLY=q1,q2 restricts the run
    // (the driver never sets it — full surface by default)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // one warmup to amortize JVM/codegen startup out of per-query numbers
    SparkEntry.queries.get("q13_count").foreach(f => f(spark, sfDir).count())
    // r19 verdict item 4: residual JVM/codegen warm-up still lands in
    // whichever gates run FIRST — q01/q02/q05/q100 crossed the nominal
    // regression bar in both r18 and r19 and re-measured faster in
    // isolation every time (the q13_count warmup does not touch their
    // join/window/agg codegen paths). The first `warmupPrimed` queries
    // of the run therefore get ONE untimed priming execution each, so
    // their timed reps measure the query, not the JVM. Priming errors
    // are swallowed — the timed rep surfaces them loudly.
    val warmupPrimed = 6
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .zipWithIndex
      .map { case ((name, fn), idx) =>
      if (idx < warmupPrimed) {
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
      def runOnce(): (Double, Option[String]) = {
        // measure each query from a quiesced heap: accumulated broadcast /
        // shuffle state from earlier queries otherwise taxes the later
        // ones with GC pauses that aren't part of the query's own cost
        System.gc()
        val t0 = System.nanoTime()
        // a failing query must surface as an explicit error, never as a
        // plausible-looking (tiny) timing — that is how a broken query
        // shipped invisibly in round 2
        val err = try { fn(spark, sfDir).count(); None } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            Some(Option(e.getMessage).getOrElse(e.getClass.getName))
        }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      val base = (1 to reps).map(_ => runOnce())
      // adaptive extra rep: at the default reps=2 the min still moved
      // ±15% median round-over-round (r11's 129-query tail, r12's q89) —
      // take ONE more sample when (a) the two base reps of a non-trivial
      // query disagree by >10%, or (b) the query is HEAVY (>1 s): heavy
      // rows are exactly where a ±15% wobble reads as a real regression,
      // so they get min-of-3 unconditionally (r12 verdict item 3) while
      // the sub-second tail keeps the cheap 2-rep path. Sub-200ms rows
      // never re-run: their absolute noise can't masquerade as a
      // regression.
      val baseOk = base.collect { case (t, None) => t }
      val times = base ++ (
        if (reps == 2 && baseOk.size == 2 &&
            (baseOk.min > 1.0 ||
              (baseOk.min > 0.2 &&
                baseOk.max - baseOk.min > 0.10 * baseOk.min))) Seq(runOnce())
        else Nil)
      // headline continuity: first-rep seconds (what r≤7 measured);
      // stability: min across SUCCESSFUL reps — a fast-failing rep's
      // tiny latency must not pose as the query's stable time. Only
      // when every rep failed does the raw min (plus the error) stand.
      val okTimes = times.collect { case (t, None) => t }
      (name, times.head._1,
        if (okTimes.nonEmpty) okTimes.min else times.map(_._1).min,
        times.flatMap(_._2).headOption, times.size)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    // 3 decimal places: millisecond resolution is plenty, and the shorter
    // line matters — the driver captures a bounded (~2000 char) tail of
    // stdout, and a full-precision 64-query line overflowed it in round 3
    // (parsed:null). Keys are the qNN prefix (the contract's own example
    // shape, {"q1":sec,...}): full names would blow the window again as
    // the surface grows.
    // Locale.ROOT: f"" uses the JVM default locale — a comma-decimal
    // locale (de_DE) would print 1,640 and break the JSON.
    def sec(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def short(k: String): String = k.takeWhile(_ != '_')
    // truncated keys must stay unique or a timing silently vanishes into
    // a duplicate JSON key
    require(results.map(r => short(r._1)).distinct.size == results.size,
      "bench query keys collide after qNN truncation")
    val qs = results.map { case (k, v, _, _, _) =>
      "\"" + short(k) + "\":" + sec(v) }
      .mkString("{", ",", "}")
    val qsMin = results.map { case (k, _, m, _, _) =>
      "\"" + short(k) + "\":" + sec(m) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(m), _) =>
      "\"" + short(k) + "\":" + jstr(m.take(200)) }.mkString("{", ",", "}")
    // per-query rep-count provenance (r13 verdict item 6): the adaptive
    // third rep means "reps":2 in the headline is only the BASE count —
    // min-of-N triage needs to know which N each min came from
    val repsUsed = results.map { case (k, _, _, _, n) =>
      "\"" + short(k) + "\":" + n }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val totalMin = if (results.nonEmpty) results.map(_._3).sum else 0.0
    // The driver captures a BOUNDED tail of stdout; at 191 queries the
    // per-query detail line alone outgrows that window (r6's
    // parsed:null). So the headline is a COMPACT line that always fits,
    // printed both FIRST (head-readers) and LAST (tail-readers — the
    // final line of the stream is complete in any tail window bigger
    // than itself); the full per-query map rides in between for humans
    // and wide-window captures. BOTH copies keep "metric":"total" —
    // tail-window readers were parsing that key on the final line long
    // before the second copy existed, so renaming the tail copy would
    // silently break them; a consumer that aggregates every line
    // dedups on the extra "copy" discriminator instead.
    val nErr = results.count(_._4.isDefined)
    val totalReps = results.map(_._5).sum
    // machine-state fields: round-over-round totals drift ±16% with zero
    // code changes on a shared host; recording the 1-min load average and
    // heap ceiling in the SAME line lets the next reader attribute drift
    // to ambient load instead of re-deriving it from plan diffs
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val env =
      s""""load_avg":${sec(osBean.getSystemLoadAverage)},""" +
      s""""n_cpus":${osBean.getAvailableProcessors},""" +
      s""""heap_max_mb":${Runtime.getRuntime.maxMemory / (1024 * 1024)}"""
    def compact(copy: String) =
      s"""{"metric":"total","copy":"$copy","value":${sec(total)},""" +
      s""""unit":"sec","value_min":${sec(totalMin)},"reps":$reps,""" +
      s""""n_queries":${results.size},"n_errors":$nErr,$env,"sf":"$sfDir"}"""
    println(compact("head"))
    println(s"""{"metric":"detail","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    // rep provenance (same bounded-stdout discipline): "reps" in the
    // other lines is the BASE rep count; this map is the ACTUAL per-query
    // count after the adaptive third rep. Printed BEFORE detail_min: the
    // driver keeps only a bounded stdout TAIL, and in r14/r15 this ~4 KB
    // line displaced the per-query mins from the capture — detail_min is
    // the line drift triage needs, so it must be the penultimate line.
    println(s"""{"metric":"reps_used","reps_base":$reps,"reps_total":$totalReps,"queries":$repsUsed,"sf":"$sfDir"}""")
    // min-of-reps per query on its own line (reps >= 2 is the default):
    // the stable number regressions are judged against
    println(s"""{"metric":"detail_min","reps":$reps,"queries":$qsMin,"sf":"$sfDir"}""")
    println(compact("tail"))
    spark.stop()
  }
}

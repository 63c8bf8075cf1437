package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.TextDedup
import graft.sources.Sources

/** Dev profiling entry point (not library surface). One parameterized main:
  *
  * {{{
  * runMain graft.tools.Profile <mode> [sfDir] [queryName]
  *   query <dir> <name>  time a SparkEntry query (twice) + Exchange census
  *   audit <dir>         flag plans with BNL/cartesian/single-partition
  *   dedup <dir>         stage-by-stage timing of the MinHash/LSH path
  * }}}
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("audit")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    mode match {
      case "query" =>
        val name = args.lift(2).getOrElse(sys.error("query mode needs a name"))
        val fn = graft.SparkEntry.queries(name)
        val df = fn(spark, dir)
        t(s"$name run 1")(df.count())
        t(s"$name run 2")(fn(spark, dir).count())
        val plan = df.queryExecution.executedPlan.toString
        for (tok <- Seq("Exchange", "ReusedExchange", "BroadcastNestedLoopJoin"))
          println(s"[plan] $name $tok: ${tok.r.findAllIn(plan).size}")
        println(plan.take(6000))
      case "audit" =>
        graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
          try {
            val plan = fn(spark, dir).queryExecution.sparkPlan.toString
            val flags = Seq(
              "BNL" -> plan.contains("BroadcastNestedLoopJoin"),
              "CART" -> plan.contains("CartesianProduct"),
              "SINGLEPART" -> plan.contains("SinglePartition"))
              .collect { case (f, true) => f }
            if (flags.nonEmpty) println(s"[audit] $name: ${flags.mkString(",")}")
          } catch {
            case e: Throwable => println(s"[audit] $name ERR ${e.getMessage}")
          }
        }
      case "dedup" =>
        val docs = Sources.documents(spark, dir)
        t("docs.count")(docs.count())
        val sh = TextDedup.shingles(docs, "doc_id", "text")
        t("shingles.count")(sh.count())
        val wide = TextDedup.minHashSignaturesWide(sh, "doc_id", 16)
        t("wide sigs.count")(wide.count())
        val bands = TextDedup.lshBandsFromWide(wide, "doc_id", 16, 4)
        t("bands.count")(bands.count())
        val cand = TextDedup.lshCandidates(bands, "doc_id")
        t("candidates.count")(cand.count())
        t("jaccard-verify.count")(
          TextDedup.jaccard(sh, "doc_id", cand)
            .filter(col("jaccard") >= 0.5).count())
        t("q19 full")(
          TextDedup.minHashLshPairs(docs, "doc_id", "text", 16, 4, 3, 0.5).count())
      case other => sys.error(s"unknown mode: $other (query|audit|dedup)")
    }
    spark.stop()
  }
}

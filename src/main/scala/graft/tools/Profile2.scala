package graft.tools

import graft.GraftSession
import graft.operators.TextDedup
import graft.sources.Sources

/** Dev tool: minimal repro of the slow pairIntersections, with plan dump. */
object Profile2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val docs = Sources.documents(spark, dir)
    val sh = TextDedup.shingles(docs, "doc_id", "text")
    val pi = TextDedup.pairIntersections(sh, "doc_id")
    val t0 = System.nanoTime()
    val n = pi.count()
    println(f"[profile2] pairIntersections.count = $n in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    println(pi.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}

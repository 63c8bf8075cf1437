package graft.tools

import graft.GraftSession

/** Dev tool: plan inspection scratchpad (not library surface). */
object Profile3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local()
    val q19 = graft.queries.PipelineQueries.q19MinHashLsh(spark, dir)
    q19.count()
    val plan = q19.queryExecution.executedPlan.toString
    println(s"[plan] q19 ReusedExchange: ${"ReusedExchange".r.findAllIn(plan).size}")
    println(s"[plan] q19 Exchange: ${"Exchange".r.findAllIn(plan).size}")
    println(s"[plan] q19 scans of documents: ${"documents".r.findAllIn(plan).size}")
    "(ShuffleQueryStage [0-9]+)".r.findAllIn(plan).toSeq.groupBy(identity)
      .foreach { case (k, v) => println(s"[plan] q19 $k x${v.size}") }
    val q38 = graft.queries.ExtrasQueries.q38Curation(spark, dir)
    q38.count()
    val p38 = q38.queryExecution.executedPlan.toString
    println(s"[plan] q38 ReusedExchange: ${"ReusedExchange".r.findAllIn(p38).size}")
    println(s"[plan] q38 Exchange: ${"Exchange".r.findAllIn(p38).size}")
    spark.stop()
  }
}

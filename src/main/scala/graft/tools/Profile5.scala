package graft.tools

import graft.GraftSession

/** Dev tool: list queries whose plans contain nested-loop/cartesian joins
  * or partition-less windows (not library surface). */
object Profile5 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.sparkPlan.toString
        val flags = Seq(
          "BNL" -> plan.contains("BroadcastNestedLoopJoin"),
          "CART" -> plan.contains("CartesianProduct"),
          "SINGLEPART" -> plan.contains("SinglePartition"))
          .collect { case (f, true) => f }
        if (flags.nonEmpty) println(s"[audit] $name: ${flags.mkString(",")}")
      } catch { case e: Throwable => println(s"[audit] $name ERR ${e.getMessage}") }
    }
    spark.stop()
  }
}

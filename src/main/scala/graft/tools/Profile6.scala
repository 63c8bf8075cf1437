package graft.tools

/** Dev profiling: q72 end-to-end at an arbitrary SF (default sf0.1). */
object Profile6 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[prof] $name%-22s ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    t("q72 run 1")(graft.queries.ScaleQueries.q72CurationPipeline(spark, dir).count())
    t("q72 run 2")(graft.queries.ScaleQueries.q72CurationPipeline(spark, dir).count())
    t("q19 reference")(graft.queries.PipelineQueries.q19MinHashLsh(spark, dir).count())
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.TextDedup
import graft.sources.Sources

/** Dev tool: stage-by-stage timing of the dedup pipelines (not part of the
  * library surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = Sources.documents(spark, dir)
    t("docs.count")(docs.count())
    val sh = TextDedup.shingles(docs, "doc_id", "text")
    t("shingles.count")(sh.count())
    t("shingles.count(2nd)")(sh.count())
    val sigs = TextDedup.minHashSignatures(sh, "doc_id", 16)
    t("minhash sigs.count")(sigs.count())
    val bands = TextDedup.lshBands(sigs, "doc_id", 4)
    t("bands.count")(bands.count())
    val cand = TextDedup.lshCandidates(bands, "doc_id")
    t("candidates.count")(cand.count())
    t("jaccard-verify.count")(
      TextDedup.jaccard(sh, "doc_id", cand).filter(col("jaccard") >= 0.5).count())
    t("pairIntersections.count")(TextDedup.pairIntersections(sh, "doc_id").count())
    t("q20 full")(graft.queries.PipelineQueries.q20NgramJaccard(spark, dir).count())
    t("q19 full")(graft.queries.PipelineQueries.q19MinHashLsh(spark, dir).count())
    spark.stop()
  }
}

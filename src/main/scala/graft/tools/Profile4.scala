package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.TextDedup
import graft.sources.Sources

/** Dev tool: fine-grained timing of the wide MinHash+LSH path. */
object Profile4 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    def t[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p4] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s -> $r")
    }
    val docs = Sources.documents(spark, dir)
    docs.count()
    for (round <- 1 to 2) {
      val sh = TextDedup.shingles(docs, "doc_id", "text", 3)
      t(s"r$round shingles")(sh.count())
      val wide = TextDedup.minHashSignaturesWide(sh, "doc_id", 16)
      t(s"r$round wide sigs")(wide.count())
      val bands = TextDedup.lshBandsFromWide(wide, "doc_id", 16, 4)
      t(s"r$round bands")(bands.count())
      val cand = TextDedup.lshCandidates(bands, "doc_id")
      t(s"r$round candidates")(cand.count())
      t(s"r$round verify")(
        TextDedup.jaccard(sh, "doc_id", cand)
          .filter(col("jaccard") >= 0.5).count())
      t(s"r$round q19 full")(TextDedup.minHashLshPairs(
        docs, "doc_id", "text", 16, 4, 3, 0.5).count())
    }
    spark.stop()
  }
}

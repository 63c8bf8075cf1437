package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.GraftSession
import graft.sources.Sources

/** Dev tool: A/B variants of the shingle expression (not library surface). */
object Profile3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    def t[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s -> $r")
    }
    val docs = Sources.documents(spark, dir)
    docs.count()
    val w = 3

    // v1: current — split() inlined into the lambda
    {
      val ws = split(col("text"), " ")
      val df = docs.repartition(col("doc_id")).select(
        col("doc_id"),
        explode(array_distinct(
          when(size(ws) >= w,
            transform(sequence(lit(0), size(ws) - w),
              i => concat_ws(" ", (0 until w).map(o => element_at(ws, i + o + 1)): _*)))
            .otherwise(array().cast(ArrayType(StringType))))).as("s"))
      t("v1 inline split")(df.count())
    }

    // v2: materialize ws first, element_at on bound column
    {
      val df = docs.repartition(col("doc_id"))
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(
          col("doc_id"),
          explode(array_distinct(
            when(size(col("ws")) >= w,
              transform(sequence(lit(0), size(col("ws")) - w),
                i => concat_ws(" ",
                  (0 until w).map(o => element_at(col("ws"), i + o + 1)): _*)))
              .otherwise(array().cast(ArrayType(StringType))))).as("s"))
      t("v2 materialized ws")(df.count())
    }

    // v3: materialized ws + slice/array_join
    {
      val df = docs.repartition(col("doc_id"))
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(
          col("doc_id"),
          explode(array_distinct(
            when(size(col("ws")) >= w,
              transform(sequence(lit(0), size(col("ws")) - w),
                i => array_join(slice(col("ws"), i + 1, lit(w)), " ")))
              .otherwise(array().cast(ArrayType(StringType))))).as("s"))
      t("v3 slice+array_join")(df.count())
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, "u1", 100L, "l-a"),
    (2L, "u1", 200L, "l-b"),
    (3L, "u1", 50L, "l-early"),   // before any right row
    (4L, "u2", 100L, "l-other")
  ).toDF("event_id", "k", "t", "lv")

  private val right = Seq(
    ("u1", 90L, 10L, "r-90"),
    ("u1", 150L, 11L, "r-150"),
    ("u1", 200L, 12L, "r-200"),   // equal to left t=200 → inclusive match
    ("u2", 100L, 13L, "r-other")
  ).toDF("k", "t", "rid", "rv")

  private def run(inner: Boolean) =
    AsOfJoin(left, right, Seq("k"), "t", Seq("rid", "rv"),
      rightOrder = col("rid"), inner = inner)
      .collect().map(r => r.getAs[Long]("event_id") ->
        (r.getAs[java.lang.Long]("rid"), r.getAs[String]("rv"))).toMap

  test("picks the latest right row at or before each left time") {
    val m = run(inner = true)
    assert(m(1L) === (10L, "r-90"))    // 90 ≤ 100 < 150
    assert(m(2L) === (12L, "r-200"))   // inclusive: t' == t matches
    assert(m(4L) === (13L, "r-other")) // keys partition correctly
    assert(!m.contains(3L))            // inner drops unmatched
  }

  test("left mode keeps unmatched rows with null payload") {
    val m = run(inner = false)
    assert(m(3L) === (null, null))
    assert(m.size === 4)
  }

  test("ties on right time resolve to greatest rightOrder") {
    val l = Seq((1L, "u", 100L)).toDF("event_id", "k", "t")
    val r = Seq(("u", 100L, 5L, "first"), ("u", 100L, 9L, "last"))
      .toDF("k", "t", "rid", "rv")
    val out = AsOfJoin(l, r, Seq("k"), "t", Seq("rid", "rv"), col("rid"))
    assert(out.head.getAs[String]("rv") === "last")
  }
}

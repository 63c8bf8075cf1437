package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * Salted equi-join for skewed keys — the manual complement to AQE's
 * skew-join splitting (GraftSession enables AQE; salting is for the cases
 * AQE can't fix, e.g. a single hot key inside one shuffle block, or
 * deterministic pre-partitioning needs).
 *
 * Mechanics: the fact side gets a deterministic salt in [0, n) derived by
 * hashing the whole row (xxhash64 of all columns — reproducible, unlike
 * rand()); the dimension side is exploded n× so every (key, salt) bucket
 * finds its match. The hot key's rows now spread over n shuffle partitions
 * instead of one. Result set is provably identical to the unsalted join
 * (SkewJoinSpec + q35's oracle, which IS the plain join).
 */
object SkewJoin {

  /** Inner equi-join on `key`, with the left (large/skewed) side salted
    * n ways. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
                      n: Int): DataFrame = {
    val salted = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(n)))
    val exploded = right
      .withColumn("_salt", explode(sequence(lit(0L), lit(n - 1L))))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }
}

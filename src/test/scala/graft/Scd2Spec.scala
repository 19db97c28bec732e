package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Scd2

/** Behavioral pins for SCD-2 interval compaction (q140). */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("runs collapse; open interval has null valid_to; reverts reopen") {
    val obs = Seq(
      (1L, "on", ts(0), 1L), (1L, "on", ts(1), 2L), (1L, "off", ts(2), 3L),
      (1L, "on", ts(3), 4L), // revert: a NEW island, not merged with the first
      (2L, "off", ts(5), 5L)
    ).toDF("user_id", "state", "t", "id")
    val got = Scd2.intervals(obs, col("user_id"), col("state"), col("t"), col("id"))
      .orderBy("k", "valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp], Long)].collect().toList
    assert(got == List(
      (1L, "on", ts(0), Some(ts(2)), 2L),
      (1L, "off", ts(2), Some(ts(3)), 1L),
      (1L, "on", ts(3), None, 1L),
      (2L, "off", ts(5), None, 1L)))
  }

  test("same-ts observations order by the tiebreak deterministically") {
    val obs = Seq(
      (1L, "a", ts(0), 2L), (1L, "b", ts(0), 1L) // b first by tie
    ).toDF("user_id", "state", "t", "id")
    val got = Scd2.intervals(obs, col("user_id"), col("state"), col("t"), col("id"))
      .orderBy("valid_from", "state")
      .as[(Long, String, Timestamp, Option[Timestamp], Long)].collect().toList
    assert(got == List(
      (1L, "a", ts(0), None, 1L),
      (1L, "b", ts(0), Some(ts(0)), 1L)))
  }

  test("deterministic across partition counts") {
    val obs = (1L to 300L).map(i => (i % 5, if ((i / 7) % 2 == 0) "x" else "y",
      ts((i % 60).toInt), i)).toDF("user_id", "state", "t", "id")
    def run(p: Int) = Scd2.intervals(obs.repartition(p), col("user_id"),
      col("state"), col("t"), col("id"))
      .orderBy("k", "valid_from", "state", "n_obs")
      .as[(Long, String, Timestamp, Option[Timestamp], Long)].collect().toList
    assert(run(1) == run(11))
  }
}

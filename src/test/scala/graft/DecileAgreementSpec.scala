package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Agreement of the scalable cutpoint deciles (q72,
  * [[TextAnalysis.qualityDecilesApprox]]) with the exact global-ntile
  * deciles (q71) — the same exact-twin pattern as brute-force ANN vs LSH.
  *
  * The two SEMANTICS differ only on ties: ntile forces equal bucket sizes
  * (splitting runs of equal scores across deciles by doc_id), while
  * value-based cutpoints give every row of a score the same decile. So
  * agreement < 1.0 exactly where the corpus has tied scores, and any
  * bucketing/off-by-one regression in the cutpoint path drops it sharply.
  */
class DecileAgreementSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  test("cutpoint deciles agree with exact ntile deciles above the measured floor") {
    val docs = Tables.documents(spark, SfDir)
    val w = Window.orderBy(col("quality_score").desc, col("doc_id"))
    val exact = TextAnalysis.qualityScore(docs)
      .select("doc_id", "quality_score")
      .withColumn("exact_decile", ntile(10).over(w))
    val approx = TextAnalysis.qualityDecilesApprox(docs)
      .withColumnRenamed("decile", "approx_decile")
    val joined = exact.join(approx, Seq("doc_id")).cache()
    try {
      val n = joined.count().toDouble
      val agree = joined
        .filter(col("exact_decile") === col("approx_decile")).count() / n
      val offByOne = joined
        .filter(abs(col("exact_decile") - col("approx_decile")) <= 1).count() / n
      info(f"decile agreement: exact=$agree%.3f within-one=$offByOne%.3f (n=${n.toLong})")
      assert(agree >= 0.80, s"cutpoint deciles diverged from exact ntile: $agree")
      assert(offByOne == 1.0, s"some decile differs by more than one bucket: $offByOne")
      // every decile 1..10 must be populated — an off-by-one in the
      // cutpoint rank or the strict-> comparison would empty a bucket
      assert(approx.select("approx_decile").distinct().count() == 10)
    } finally joined.unpersist()
  }
}

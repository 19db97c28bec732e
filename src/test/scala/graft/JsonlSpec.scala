package graft

import graft.sources.Jsonl

/** JSONL write→read on hand fixtures: the permissive-with-accounting
  * contract (corrupt lines counted, never dropped, never fatal) and
  * exact field round-trips including JSON-hostile text.
  */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "en", "srcA", 12L, "plain words here"),
    (50L, "de", "srcB", 30L, "quote \" backslash \\ newline-free"),
    (7L, "en", "srcA", 5L, "tab\tand unicode é 你"))
    .toDF("doc_id", "lang", "source", "n_chars", "text")

  test("good rows round-trip exactly, including JSON-hostile characters") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-spec").toString
    Jsonl.write(docs, dir, corruptEvery = 1000) // no corrupt lines
    val back = Jsonl.read(spark, dir)
      .select("doc_id", "lang", "source", "n_chars", "text")
      .as[(Long, String, String, Long, String)].collect().sortBy(_._1).toSeq
    assert(back === Seq(
      (1L, "en", "srcA", 12L, "plain words here"),
      (7L, "en", "srcA", 5L, "tab\tand unicode é 你"),
      (50L, "de", "srcB", 30L, "quote \" backslash \\ newline-free")))
  }

  test("corrupt lines are counted under NULL lang, not dropped and not fatal") {
    val out = Jsonl.roundTrip(docs, corruptEvery = 50) // doc 50 also corrupts
      .orderBy("lang")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(out === Seq(
      (None, 1L, 1L, 0L),
      (Some("de"), 1L, 0L, 30L),
      (Some("en"), 2L, 0L, 17L)))
  }

  test("a corrupt row carries its raw line for quarantine") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-spec2").toString
    Jsonl.write(docs, dir, corruptEvery = 50)
    // Spark forbids corrupt-column-ONLY queries straight off raw files
    // (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
    // documented contract is cache-then-query, which is what a
    // quarantine job does anyway
    val parsed = Jsonl.read(spark, dir).cache()
    try {
      val raw = parsed
        .filter($"_corrupt_record".isNotNull)
        .select("_corrupt_record").as[String].collect().toSeq
      assert(raw === Seq("{\"doc_id\": 50, \"lang\": \""))
    } finally parsed.unpersist()
  }
}

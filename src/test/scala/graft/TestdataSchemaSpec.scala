package graft

import org.apache.spark.sql.types._

/** Schema contract for the driver-generated testdata (TESTDATA.md).
  *
  * The driver regenerated `/root/testdata` mid-round-5 and changed
  * `events.ts` from parquet TIMESTAMP(NANOS) to `timestamp[us]`, which
  * broke every events-lineage query (30 of them) with one opaque
  * AnalysisException each. This spec pins the types `Tables` is written
  * to accept, so the NEXT regeneration fails in one obvious test instead.
  */
class TestdataSchemaSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  private def fieldType(table: String, field: String): DataType =
    spark.read.parquet(s"$SfDir/$table.parquet").schema(field).dataType

  test("events.ts is a type Tables.events handles (long-nanos or timestamp)") {
    val t = fieldType("events", "ts")
    assert(
      t == LongType || t == TimestampNTZType || t == TimestampType,
      s"events.ts is $t — Tables.events handles LongType (legacy nanos), " +
        "TIMESTAMP_NTZ and TIMESTAMP only; update Tables.events for the new shape")
  }

  test("events has the columns the measures view maps") {
    val s = spark.read.parquet(s"$SfDir/events.parquet").schema
    for (c <- Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
      assert(s.fieldNames.contains(c), s"events.$c missing")
    assert(fieldType("events", "user_id") == LongType)
    assert(fieldType("events", "event_type") == StringType)
    assert(fieldType("events", "value") == DoubleType)
    assert(fieldType("events", "props") == StringType)
  }

  test("Tables.events normalizes ts to session-TZ TimestampType") {
    assert(Tables.events(spark, SfDir).schema("ts").dataType == TimestampType)
  }

  test("documents/embeddings have the LLM-pipeline columns") {
    val docs = spark.read.parquet(s"$SfDir/documents.parquet").schema
    for (c <- Seq("doc_id", "text", "lang", "source", "n_chars"))
      assert(docs.fieldNames.contains(c), s"documents.$c missing")
    assert(fieldType("documents", "text") == StringType)
    val embT = fieldType("embeddings", "embedding")
    assert(embT.isInstanceOf[ArrayType] &&
      embT.asInstanceOf[ArrayType].elementType == FloatType,
      s"embeddings.embedding is $embT, expected array<float>")
  }

  test("TPC-H date columns are timestamp-or-ntz (Tables.load casts NTZ)") {
    for ((t, c) <- Seq("lineitem" -> "l_shipdate", "orders" -> "o_orderdate")) {
      val dt = fieldType(t, c)
      assert(dt == TimestampType || dt == TimestampNTZType || dt == DateType,
        s"$t.$c is $dt")
    }
  }
}

package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.sources.Storage

/** The 100 TB layout properties, asserted on the actual plans: partition
  * pruning on date-partitioned history, no Exchange when joining
  * co-bucketed tables.
  */
class StorageSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("measure history: day-partitioned write, filters prune partitions") {
    val dir = Files.createTempDirectory("graft-history").toString
    val events = Seq(
      ("d1", "temp", 1.0, ts("2024-01-01 10:00:00"), true),
      ("d1", "temp", 2.0, ts("2024-01-02 10:00:00"), true),
      ("d2", "temp", 3.0, ts("2024-01-03 10:00:00"), true))
      .toDF("device", "measure_name", "raw_value", "source_ts", "status_ok")
    Storage.writeMeasureHistory(events, dir)

    val read = Storage.readMeasureHistory(spark, dir)
    val pruned = read.filter(col("day") === "2024-01-02")
    assert(pruned.count() == 1)
    assert(pruned.select("raw_value").as[Double].head() == 2.0)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-02"))
    // pruning happened: the executed scan touched exactly one partition dir
    val filesRead = pruned.select(input_file_name()).distinct().as[String].collect()
    assert(filesRead.length == 1 && filesRead.head.contains("day=2024-01-02"))
  }

  test("co-bucketed device tables join with no shuffle exchange") {
    val base = Files.createTempDirectory("graft-buckets")
    val modvalues = (1 to 100)
      .map(i => (s"dev-${i % 20}", s"m$i", i.toDouble))
      .toDF("device", "measure_name", "tag_value")
    val devices = (0 until 20).map(i => (s"dev-$i", s"site-${i % 3}"))
      .toDF("device", "site")
    Storage.writeDeviceBucketed(modvalues, "modvalues_b", s"$base/modvalues", buckets = 4)
    Storage.writeDeviceBucketed(devices, "devices_b", s"$base/devices", buckets = 4)
    try {
      // disable auto-broadcast so the join would otherwise need a shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("modvalues_b").join(spark.table("devices_b"), "device")
      assert(joined.count() == 100)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected exchange-free co-bucketed join, got:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS modvalues_b")
      spark.sql("DROP TABLE IF EXISTS devices_b")
    }
  }

  test("IVF cells persist as a cell-bucketed table; per-cell work runs exchange-free") {
    val base = Files.createTempDirectory("graft-ivf")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cells = graft.operators.Similarity.ivfCells(emb, step = 100L)
    Storage.writeIvfBucketed(emb, cells, "ivf_b", s"$base/ivf", buckets = 4)
    try {
      // lossless: every vector lands exactly once with its assignment
      assert(spark.table("ivf_b").count() == emb.count())
      // the probe-side shape: per-cell aggregation (and any cell-keyed
      // join against a co-bucketed table) needs NO shuffle of the corpus
      val perCell = spark.table("ivf_b").groupBy("cell").count()
      val plan = perCell.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected exchange-free bucketed aggregation, got:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS ivf_b")
  }

  test("compactDay merges the small-file tail into sorted files, preserving the data") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val events = (1 to 400).map(i =>
      (s"dev-${i % 7}", "temp", i.toDouble,
        java.sql.Timestamp.valueOf(f"2024-03-01 10:${i % 60}%02d:00")))
      .toDF("device", "measure_name", "raw_value", "source_ts")
    // simulate the streaming small-file tail: 8 files in the partition
    Storage.writeMeasureHistory(events.repartition(8), path)
    def dayFiles = new java.io.File(s"$path/day=2024-03-01")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(dayFiles.length == 8)
    val before = Storage.readMeasureHistory(spark, path)
      .orderBy("device", "source_ts", "raw_value").collect().toSeq

    Storage.compactDay(spark, path, "2024-03-01", targetFiles = 1)
    assert(dayFiles.length == 1)
    val after = Storage.readMeasureHistory(spark, path)
      .orderBy("device", "source_ts", "raw_value").collect().toSeq
    assert(after == before) // lossless rewrite
    // rows inside the compacted file are device-sorted (stats-selective)
    val devices = spark.read.parquet(s"$path/day=2024-03-01")
      .select("device").collect().map(_.getString(0)).toSeq
    assert(devices == devices.sorted)
    assert(!new java.io.File(path).listFiles().exists(_.getName.contains("compacting")))
  }

  test("training-shard export: deterministic assignment, shard dirs, reproducible order") {
    val dir = Files.createTempDirectory("graft-shards").toString
    val docs = (0L until 400L).map(i => (i, s"doc-$i text", i % 7))
      .toDF("doc_id", "text", "lang")
    Storage.exportTrainingShards(docs, s"$dir/run1", nShards = 8)
    Storage.exportTrainingShards(docs, s"$dir/run2", nShards = 8)
    // every shard directory exists and holds exactly one data file
    for (k <- 0 until 8) {
      val files = new java.io.File(s"$dir/run1/shard=$k")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $k: ${files.length} files")
    }
    // lossless: all docs come back, each in the shard its hash names
    val back = spark.read.parquet(s"$dir/run1")
      .select("doc_id", "shard", "shard_hash").collect()
    assert(back.length == 400)
    back.foreach { r =>
      assert(r.getLong(2) % 8 == r.getAs[Number](1).longValue, s"doc ${r.getLong(0)} misplaced")
    }
    // re-running reproduces byte-identical shard contents IN ORDER
    for (k <- 0 until 8) {
      def rows(run: String) = spark.read
        .parquet(s"$dir/$run/shard=$k").select("doc_id").collect().map(_.getLong(0)).toSeq
      val (a, b) = (rows("run1"), rows("run2"))
      assert(a == b, s"shard $k order differs between identical runs")
      // and the order is the documented (hash, doc_id) sequence
      val hashes = spark.read.parquet(s"$dir/run1/shard=$k")
        .select("shard_hash", "doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(hashes == hashes.sorted, s"shard $k not in (hash, doc_id) order")
    }
  }

  test("model persistence: classifier weights and k-means centroids round-trip bit-exactly") {
    import graft.operators.{KMeans, QualityClassifier}
    val dir = Files.createTempDirectory("graft-models").toString

    // classifier: train → save → load → identical scores on new docs
    val labeled = (0 until 80).map { i =>
      val y = i % 2
      val t = if (y == 1) s"good${i % 3} fine text" else s"bad${i % 3} poor text"
      (i.toLong, t, y)
    }.toDF("doc_id", "text", "label")
    val m = QualityClassifier.train(labeled, iters = 5, lr = 5.0)
    Storage.writeModel(m.toFrame(spark), s"$dir/clf", "token")
    val m2 = QualityClassifier.Model.fromFrame(Storage.readModel(spark, s"$dir/clf"))
    assert(m2.bias == m.bias)
    assert(m2.weights == m.weights)
    val docs = labeled.select("doc_id", "text")
    val a = m.transform(docs).collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val b = m2.transform(docs).collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(a.toSeq == b.toSeq, "reloaded model scores diverge")
    // single-file artifact, deterministic order
    val files = new java.io.File(s"$dir/clf").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 1)

    // k-means centroids: save → load → identical assignment
    val emb = (0 until 120).map { i =>
      val e = Array.fill(8)(0.05f); e((i % 3) * 2) = 5f
      (i.toLong, e.toSeq)
    }.toDF("vec_id", "embedding")
    val cents = KMeans.fitCentroids(emb, k = 3, iters = 2)
    Storage.writeModel(cents, s"$dir/centroids", "cluster")
    val cents2 = Storage.readModel(spark, s"$dir/centroids")
    val asn1 = KMeans.assign(emb, cents).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    val asn2 = KMeans.assign(emb, cents2).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(asn1 == asn2, "reloaded centroids assign differently")
  }

  test("rendezvousShard: growth moves keys ONLY to the new shard, ~1/n of them") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val keys = (1L to 4000L).toDF("k")
    val moved = keys.select(
        Storage.rendezvousShard(col("k"), 8).as("old8"),
        Storage.rendezvousShard(col("k"), 9).as("new9"))
      .filter(col("old8") =!= col("new9"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every moved key lands in the ADDED shard — the HRW property that
    // makes a rebalance touch 1/n of the corpus instead of all of it
    assert(moved.forall(_._2 == 8L), s"moves not confined to the new shard")
    val frac = moved.length.toDouble / 4000
    assert(math.abs(frac - 1.0 / 9) < 0.02, s"moved fraction $frac, expected ~1/9")
    // assignment is balanced-ish and total
    val counts = keys.select(Storage.rendezvousShard(col("k"), 8).as("s"))
      .groupBy("s").count().as[(Long, Long)].collect().toMap
    assert(counts.keySet === (0L to 7L).toSet)
    assert(counts.values.forall(c => c > 300 && c < 700), counts.toString)
  }

  test("schema evolution: widened shards merge, old shards read null for new columns") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    // generation 1: (doc_id, text); generation 2 adds quality — the
    // standard corpus-lake evolution (a new scorer starts annotating)
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(s"$base/gen=1")
    Seq((3L, "gamma", 0.9), (4L, "delta", 0.2)).toDF("doc_id", "text", "quality")
      .write.parquet(s"$base/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert(merged.columns.toSet === Set("doc_id", "text", "quality", "gen"))
    val rows = merged.orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.isNullAt(merged.columns.indexOf("quality"))))
    assert(rows.toSeq === Seq((1L, true), (2L, true), (3L, false), (4L, false)))
    // pushdown on the common column survives the merged footer set
    val plan = merged.filter(col("doc_id") === 3L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"),
      s"expected doc_id pushdown in:\n$plan")
  }

  test("inverted index persists term-bucketed; probing it reproduces direct BM25 exactly") {
    import org.apache.spark.sql.functions.{col, explode}
    val base = java.nio.file.Files.createTempDirectory("graft-bm25")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    Storage.writeInvertedIndex(docs, "bm25_idx", s"$base/idx", buckets = 4)
    try {
      val qTerms = docs.filter(col("doc_id") < 5)
        .select(col("doc_id").as("q_id"),
          explode(graft.functions.TextOps.words(col("text"))).as("term"))
        .distinct()
      val fromIndex = graft.operators.Retrieval.bm25TopKFromIndex(
        Storage.readInvertedIndex(spark, "bm25_idx"),
        Storage.readIndexStats(spark, s"$base/idx"), qTerms, k = 10)
        .orderBy("q_id", "rk")
        .collect().map(_.toSeq).toSeq
      val direct = graft.operators.Retrieval.bm25TopK(docs, 5L, 10)
        .orderBy("q_id", "rk")
        .collect().map(_.toSeq).toSeq
      assert(fromIndex == direct, "stored-index probe diverged from direct BM25")
      // per-term work against the bucketed postings runs exchange-free
      val perTerm = spark.table("bm25_idx").groupBy("term").count()
      val plan = perTerm.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected exchange-free bucketed aggregation, got:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS bm25_idx")
  }
}

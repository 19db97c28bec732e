package graft

import org.apache.spark.SparkException
import graft.operators.DtoMapping
import graft.operators.DtoMapping.{BrowseExclusionFolder, ConnectionDto, ConnectionEntity}

/** K6 — entity ⇄ REST DTO mapping (reference
  * `Helpers/AutoMapperProfiles.cs:12-44`): round-trip identity including
  * the UTF-8 + AES-256-CBC password leg, deterministic collision-free
  * child ids, and the stride bound failing loudly.
  */
class DtoMappingSpec extends SparkSpec {
  import spark.implicits._

  private val key = "0123456789abcdef0123456789abcdef" // AES-256, as reference

  private val dtos = Seq(
    ConnectionDto(1, "opc.tcp://a:4840", "alice", "s3cr3t-pä55", 5000, 100,
      Seq("Views", "Types")),
    ConnectionDto(2, "opc.tcp://b:4840", "bob", "", 2000, 50, Seq.empty),
    ConnectionDto(3, "opc.tcp://c:4840", "carol", "p", 1000, 10, Seq("Server")))

  test("toEntities then toDto is the identity, including the AES password leg (K6)") {
    val (entities, folders) = DtoMapping.toEntities(dtos.toDS(), key)
    // password never stored in the clear on the entity side
    assert(entities.collect().forall(e =>
      !new String(e.encryptedPassword, "UTF-8").contains("s3cr3t")))
    val back = DtoMapping.toDto(entities, folders, key)
      .collect().sortBy(_.id).toSeq
      .map(d => d.copy(browseExclusionFolders = d.browseExclusionFolders.sorted))
    val expected = dtos.map(d => d.copy(browseExclusionFolders = d.browseExclusionFolders.sorted))
    assert(back == expected)
  }

  test("child ids are deterministic and collision-free across connections") {
    val (_, folders) = DtoMapping.toEntities(dtos.toDS(), key)
    val rows = folders.collect().toSeq
    assert(rows.map(_.id).distinct.size == rows.size)
    // id encodes (connection, position): recoverable, stable across runs
    assert(rows.forall(f => f.id / DtoMapping.ChildIdStride == f.opcClientConnectionId))
    val (_, again) = DtoMapping.toEntities(dtos.toDS(), key)
    assert(again.collect().toSeq.sortBy(_.id) == rows.sortBy(_.id))
  }

  test("a DTO with >= stride folders raises instead of silently colliding") {
    val wide = Seq(ConnectionDto(7, "u", "n", "p", 1, 1,
      (0L to DtoMapping.ChildIdStride).map(i => s"f$i")))
    val (_, folders) = DtoMapping.toEntities(wide.toDS(), key)
    // count() would prune the id column and skip the guard — force ids
    val e = intercept[Exception](
      folders.toDF().agg(org.apache.spark.sql.functions.max("id")).collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("exclusion folders")))
  }

  test("dtoProjection flattens 1:N to a sorted join-stable string (oracle shape)") {
    val entities = Seq((1, "u1", "n1"), (2, "u2", "n2")).toDF("id", "url", "username")
    val folders = Seq((1, "b"), (1, "a")).toDF("opcClientConnectionId", "exclusionFolder")
    val out = DtoMapping.dtoProjection(entities, folders)
      .orderBy("id").collect().map(r =>
        (r.getInt(0), r.getString(3), r.getLong(4))).toSeq
    assert(out == Seq((1, "a,b", 2L), (2, "", 0L)))
  }
}

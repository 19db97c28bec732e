package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** K6 — REST DTO mapping (reference `Helpers/AutoMapperProfiles.cs:12-44`,
  * used by `Controllers/ClientController.cs:70-87`).
  *
  * The reference maps client-connection entities to/from REST DTOs with
  * AutoMapper: the 1:N `BrowseExclusionFolder` child rows flatten to a
  * `List[String]` on the DTO, and the plaintext DTO password round-trips
  * through UTF-8 bytes + AES-256-CBC to the entity's `EncryptedPassword`.
  *
  * Spark-first re-expression: entities and DTOs are `Dataset`s, the 1:N
  * flatten is a keyed join + `collect_list` (AQE picks broadcast when the
  * folder side is small — no unconditional hint, so a huge folder table
  * cannot OOM the driver), the reverse mapping is a `posexplode`, and the
  * password leg is the codegen'd `aes_encrypt`/`aes_decrypt` built-ins
  * called through the typed functions API with `lit(key)` — never
  * string-interpolated into SQL, so a key containing quotes cannot break
  * parsing and plan redaction (`spark.sql.redaction.string.regex`) can
  * scrub it from explain output.
  *
  * Ciphertext compatibility note: Spark's CBC `aes_encrypt` prepends a
  * random IV to the ciphertext, while the reference
  * (`Services/OpcuaHelperService.cs:195-248`) uses a fixed stored IV with
  * no prefix. The round-trip here is therefore internal (encrypt and
  * decrypt both on the Spark side); reference-written blobs would need a
  * one-time re-encryption migration, not byte-level reads.
  */
object DtoMapping {

  /** Entity row: `OpcClientConnections` (reference
    * `Migrations/ApplicationDbContextModelSnapshot.cs:24-60`).
    */
  final case class ConnectionEntity(
      id: Int,
      url: String,
      username: String,
      encryptedPassword: Array[Byte],
      timeoutMs: Int,
      maxSearch: Int)

  /** Child entity row: `BrowseExclusionFolders` (1:N, FK cascade,
    * `Migrations/ApplicationDbContextModelSnapshot.cs:62-93`). Id is Long:
    * synthetic keys are derived, not sequenced (see [[ChildIdStride]]).
    */
  final case class BrowseExclusionFolder(
      id: Long,
      opcClientConnectionId: Int,
      exclusionFolder: String)

  /** REST DTO: exclusion folders flattened to strings, password plaintext
    * (reference `Helpers/AutoMapperProfiles.cs:16-30`).
    */
  final case class ConnectionDto(
      id: Int,
      url: String,
      username: String,
      password: String,
      timeoutMs: Int,
      maxSearch: Int,
      browseExclusionFolders: Seq[String])

  /** Child id = connectionId * stride + position. Collision-free for any
    * Int connectionId as long as a connection has fewer than one million
    * exclusion folders ([[toEntities]] fails loudly past the bound rather
    * than silently colliding).
    */
  val ChildIdStride = 1000000L

  private def aesKeyCol(aesKey: String): Column = lit(aesKey)

  /** entity ⋈ children → DTO. Folder lists are sorted so the DTO is a
    * deterministic function of the entity set (the reference preserves DB
    * order, which is insertion order in its tests — sorting is the
    * order-free equivalent).
    */
  def toDto(
      entities: Dataset[ConnectionEntity],
      folders: Dataset[BrowseExclusionFolder],
      aesKey: String): Dataset[ConnectionDto] = {
    val spark = entities.sparkSession
    import spark.implicits._
    val folderLists = folders
      .groupBy(col("opcClientConnectionId").as("id"))
      .agg(sort_array(collect_list(col("exclusionFolder"))).as("browseExclusionFolders"))
    entities.toDF()
      .join(folderLists, Seq("id"), "left_outer")
      .select(
        col("id"), col("url"), col("username"),
        decode(aes_decrypt(col("encryptedPassword"), aesKeyCol(aesKey), lit("CBC")), "UTF-8")
          .as("password"),
        col("timeoutMs"), col("maxSearch"),
        coalesce(col("browseExclusionFolders"), array().cast("array<string>"))
          .as("browseExclusionFolders"))
      .as[ConnectionDto]
  }

  /** DTO → (entity, child rows). Child ids are deterministic
    * (connectionId * [[ChildIdStride]] + position) and the stride bound is
    * enforced: a DTO carrying ≥ stride folders raises rather than
    * producing colliding FKs.
    */
  def toEntities(
      dtos: Dataset[ConnectionDto],
      aesKey: String): (Dataset[ConnectionEntity], Dataset[BrowseExclusionFolder]) = {
    val spark = dtos.sparkSession
    import spark.implicits._
    val entities = dtos.toDF()
      .select(
        col("id"), col("url"), col("username"),
        aes_encrypt(encode(col("password"), "UTF-8"), aesKeyCol(aesKey), lit("CBC"))
          .as("encryptedPassword"),
        col("timeoutMs"), col("maxSearch"))
      .as[ConnectionEntity]
    val folders = dtos.toDF()
      .select(col("id").as("opcClientConnectionId"),
        posexplode(col("browseExclusionFolders")).as(Seq("pos", "exclusionFolder")))
      .select(
        when(col("pos") >= ChildIdStride,
          raise_error(lit(s"connection exceeds $ChildIdStride exclusion folders")))
          .otherwise(col("opcClientConnectionId").cast("long") * ChildIdStride + col("pos"))
          .as("id"),
        col("opcClientConnectionId"), col("exclusionFolder"))
      .as[BrowseExclusionFolder]
    (entities, folders)
  }

  /** DataFrame-level DTO projection used by the oracle query: the same
    * join + flatten with the list rendered as a join-stable string (the
    * driver's hash compare needs scalar columns).
    */
  def dtoProjection(entities: DataFrame, folders: DataFrame): DataFrame =
    entities
      .join(
        folders.groupBy("opcClientConnectionId")
          .agg(concat_ws(",", sort_array(collect_list(col("exclusionFolder"))))
            .as("folders"),
            count(lit(1)).as("n_folders")),
        entities("id") === col("opcClientConnectionId"), "left_outer")
      .select(entities("id"), col("url"), col("username"),
        coalesce(col("folders"), lit("")).as("folders"),
        coalesce(col("n_folders"), lit(0L)).as("n_folders"))
}

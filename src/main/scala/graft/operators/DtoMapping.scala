package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
  * flatten is a broadcast-join + `collect_list`, the reverse mapping is a
  * `posexplode`, and the password leg is the codegen'd `aes_encrypt` /
  * `aes_decrypt` + `encode`/`decode` built-ins — column ops end to end, so
  * the mapping distributes and survives 100 TB of config rows (it is also
  * exactly the shape used at any scale for entity⇄API-shape projection).
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
    * `Migrations/ApplicationDbContextModelSnapshot.cs:62-93`).
    */
  final case class BrowseExclusionFolder(
      id: Int,
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
      .join(broadcast(folderLists), Seq("id"), "left_outer")
      .select(
        col("id"), col("url"), col("username"),
        expr(s"decode(aes_decrypt(encryptedPassword, '$aesKey', 'CBC'), 'UTF-8')")
          .as("password"),
        col("timeoutMs"), col("maxSearch"),
        coalesce(col("browseExclusionFolders"), array().cast("array<string>"))
          .as("browseExclusionFolders"))
      .as[ConnectionDto]
  }

  /** DTO → (entity, child rows). Child ids are deterministic
    * (connectionId * 1000 + position), mirroring the reference's identity
    * column only in shape — at scale synthetic keys must be derivable, not
    * sequenced.
    */
  def toEntities(
      dtos: Dataset[ConnectionDto],
      aesKey: String): (Dataset[ConnectionEntity], Dataset[BrowseExclusionFolder]) = {
    val spark = dtos.sparkSession
    import spark.implicits._
    val entities = dtos.toDF()
      .select(
        col("id"), col("url"), col("username"),
        expr(s"aes_encrypt(encode(password, 'UTF-8'), '$aesKey', 'CBC')")
          .as("encryptedPassword"),
        col("timeoutMs"), col("maxSearch"))
      .as[ConnectionEntity]
    val folders = dtos.toDF()
      .select(col("id").as("opcClientConnectionId"),
        posexplode(col("browseExclusionFolders")).as(Seq("pos", "exclusionFolder")))
      .select((col("opcClientConnectionId") * 1000 + col("pos")).cast("int").as("id"),
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
      .join(broadcast(
        folders.groupBy("opcClientConnectionId")
          .agg(concat_ws(",", sort_array(collect_list(col("exclusionFolder"))))
            .as("folders"),
            count(lit(1)).as("n_folders"))),
        entities("id") === col("opcClientConnectionId"), "left_outer")
      .select(entities("id"), col("url"), col("username"),
        encode(col("username"), "UTF-8").as("username_utf8"),
        coalesce(col("folders"), lit("")).as("folders"),
        coalesce(col("n_folders"), lit(0L)).as("n_folders"))
}

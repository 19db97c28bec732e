package graft.control

import java.io.File
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{BrowseJobRegistry, DtoMapping}
import graft.operators.DtoMapping.{BrowseExclusionFolder, ConnectionDto, ConnectionEntity}

/** The reference's client-config control plane
  * (`Controllers/ClientController.cs:22-87`) as a thin service over the
  * already-verified parts: [[DtoMapping]] (K6) maps DTOs ⇄ entity rows
  * incl. the AES-256-CBC password leg, the entity/folder tables persist
  * through a pluggable [[ConfigStore]] — JSON files in the sos-config
  * directory ([[FileConfigStore]]) or a live database matching the
  * reference's EF store ([[JdbcConfigStore]],
  * `Data/ApplicationDbContext.cs:12-13`). Either way every successful
  * mutation IS the reference's `ReloadPolling()`: the file write (or the
  * JDBC store's post-commit marker touch) trips a
  * [[graft.streaming.ConfigReload]] watcher, which stops and relaunches
  * the subscription from freshly-read config
  * (`Services/OpcSubscribeService.cs:79-98`).
  *
  * Driver-side by design, like the K5 browse sink: client-connection sets
  * are control-plane sized (tens of rows), while the mapping itself runs
  * through Spark so the AES/flatten semantics are exactly the oracled
  * q57 path.
  */
final class ControlPlane(spark: SparkSession, store: ConfigStore, aesKey: String,
                         registry: BrowseJobRegistry,
                         browseJob: String => Unit) {

  import ControlPlane._

  /** Original file-backed signature (kept for callers/specs). */
  def this(spark: SparkSession, configDir: File, aesKey: String,
           registry: BrowseJobRegistry, browseJob: String => Unit = _ => ()) =
    this(spark, new FileConfigStore(spark, configDir), aesKey, registry, browseJob)

  private def persist(dtos: Seq[ConnectionDto]): Unit = {
    import spark.implicits._
    val (ents, flds) = DtoMapping.toEntities(spark.createDataset(dtos), aesKey)
    store.replaceAll(ents.collect().toSeq.sortBy(_.id),
      flds.collect().toSeq.sortBy(_.id))
  }

  // ---- ClientController surface ----

  /** GET config/get: entity rows joined + flattened back to DTOs with the
    * password decrypted (`ClientController.cs:70-87`). Synchronized with
    * the mutations: a replace touches TWO tables, and an unsynchronized
    * read between the writes would pair new connections with old folder
    * rows (the JDBC store is transactional on its own, but the service
    * stays correct over any store).
    */
  def list(): Seq[ConnectionDto] = synchronized {
    import spark.implicits._
    val (ents, flds) = store.load()
    DtoMapping.toDto(spark.createDataset(ents), spark.createDataset(flds), aesKey)
      .collect().toSeq.sortBy(_.id)
  }

  /** POST config/add: false (→ 400) when the id is already taken.
    * Mutations serialize on the service instance: each is a read-modify-
    * write over the shared store, so concurrent unsynchronized calls
    * could both pass the duplicate check and lose one write (the JDK
    * HttpServer's default executor is single-threaded, but the service
    * must not depend on its caller's threading).
    */
  def add(dto: ConnectionDto): Boolean = synchronized {
    val current = list()
    if (current.exists(_.id == dto.id)) false
    else { persist(current :+ dto); true }
  }

  /** PATCH config/update: false (→ 400) when the id does not exist. */
  def update(dto: ConnectionDto): Boolean = synchronized {
    val current = list()
    if (!current.exists(_.id == dto.id)) false
    else { persist(current.map(c => if (c.id == dto.id) dto else c)); true }
  }

  /** DELETE config/delete/{connectionName}: the reference keys deletion on
    * the connection name; the K6 entity's handles are its numeric id and
    * its url, so either is accepted (an all-digits name is an id — urls
    * contain `://` and can never be all digits). False (→ 400) when
    * nothing matched.
    */
  def delete(connectionName: String): Boolean = synchronized {
    val current = list()
    // the id branch is gated on ALL-DIGITS (not toIntOption alone, which
    // would also parse signed forms like '+5'/'-5' and silently widen the
    // contract); within it, toIntOption guards overflow — an all-digit
    // name past Int range matches no id (→ 400), it does not throw (→ 500)
    val remaining =
      if (connectionName.nonEmpty && connectionName.forall(_.isDigit))
        connectionName.toIntOption match {
          case Some(id) => current.filterNot(_.id == id)
          case None => current
        }
      else current.filterNot(_.url == connectionName)
    if (remaining.size == current.size) false
    else { persist(remaining); true }
  }

  // ---- BrowseController surface ----

  /** GET startBrowseJob/{connectionId}: launch the browse as a background
    * job behind the G2 registry (`BrowseController.cs:18-25` +
    * `Services/BrowseService.cs:14-41`). Returns whether THIS call was
    * admitted (the reference always returns Ok; surfacing the dedup is
    * strictly more informative and the registry still records status).
    */
  def startBrowseJob(connectionId: String): Boolean =
    if (!registry.tryStart(connectionId)) false
    else {
      val t = new Thread(() => {
        try { browseJob(connectionId); registry.complete(connectionId) }
        catch { case e: Throwable =>
          registry.fail(connectionId, Option(e.getMessage).getOrElse(e.toString)) }
      }, s"browse-job-$connectionId")
      t.setDaemon(true)
      t.start()
      true
    }

  def browseStatus(connectionId: String): Option[BrowseJobRegistry.JobStatus] =
    registry.status(connectionId)

  // ---- DTO JSON codec (via Spark, FAILFAST like the S3 loaders) ----

  /** Parse one request body; None → malformed (→ 400). */
  def parseDto(body: String): Option[ConnectionDto] = {
    import spark.implicits._
    try {
      val ds = spark.read.schema(DtoSchema).option("mode", "FAILFAST")
        .json(spark.createDataset(Seq(body)))
        .withColumn("browseExclusionFolders",
          coalesce(col("browseExclusionFolders"), array().cast("array<string>")))
        .as[ConnectionDto]
      ds.collect().headOption.filter(d => d.url != null && d.username != null)
    } catch { case _: Exception => None }
  }

  def renderDtos(dtos: Seq[ConnectionDto]): String = {
    import spark.implicits._
    spark.createDataset(dtos).orderBy("id").toJSON.collect()
      .mkString("[", ",", "]")
  }
}

object ControlPlane {

  private val DtoSchema = StructType(Seq(
    StructField("id", IntegerType), StructField("url", StringType),
    StructField("username", StringType), StructField("password", StringType),
    StructField("timeoutMs", IntegerType), StructField("maxSearch", IntegerType),
    StructField("browseExclusionFolders", ArrayType(StringType))))
}

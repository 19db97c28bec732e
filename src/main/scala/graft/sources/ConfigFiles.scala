package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S3 — the JSON config plane (reference
  * `Services/OpcSubscribeService.cs:449-497`): `sos_templates_opcua.json`
  * (deviceType → daqTemplate → point list) and `site_devices.json`
  * (deviceType → device list), joined per device into the point
  * subscriptions (`:195-245`).
  *
  * Both files are MAP-rooted JSON (dynamic keys), so the Spark-first read
  * is `wholetext` + `from_json` with an explicit `MapType` schema and
  * `mode=FAILFAST` — a malformed config fails the job loudly (the
  * reference retries 5× then throws, `:449-459`; in Spark the scheduler
  * owns retries, so the parse itself must be strict, never
  * silently-null). Map entries then `explode` to the relational dim the
  * rest of the engine joins against — config stays a first-class
  * DataFrame, broadcastable to 1000 executors.
  *
  * Numeric scaling fields mirror the reference defaults (slope=1,
  * offset=0, bounds 0 — `Models/OpcTemplates.cs:36-57`) via coalesce, so
  * sparse configs load identically.
  */
object ConfigFiles {

  /** `Models/OpcTemplates.cs:20-57` — one template point. */
  val pointSchema: StructType = StructType(Seq(
    StructField("unit", StringType),
    StructField("name", StringType),
    StructField("measure", StringType),
    StructField("autoScaling", StructType(Seq(
      StructField("scale_mode", StringType),
      StructField("slope", DoubleType),
      StructField("offset", DoubleType),
      StructField("value_min", DoubleType),
      StructField("value_max", DoubleType),
      StructField("target_min", DoubleType),
      StructField("target_max", DoubleType))))))

  /** deviceType → daqTemplate → [point] (`LoadOpcTemplates`, `:472-475`). */
  val templatesType: MapType =
    MapType(StringType, MapType(StringType, ArrayType(pointSchema)))

  /** `Models/OpcDevice.cs:7-38` — one site device. */
  val deviceSchema: StructType = StructType(Seq(
    StructField("daq_name", StringType),
    StructField("daq_template", StringType),
    StructField("device_type", StringType),
    StructField("monitored", BooleanType),
    StructField("network", StructType(Seq(
      StructField("params", StructType(Seq(
        StructField("protocol", StringType),
        StructField("prefix", StringType),
        StructField("server", StringType),
        StructField("point_node", StringType)))))))))

  /** deviceType → [device] (`LoadSiteDevices`, `:477-480`). */
  val siteDevicesType: MapType = MapType(StringType, ArrayType(deviceSchema))

  private def wholeJson(spark: SparkSession, path: String, dt: DataType): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .select(from_json(col("value"), dt, Map("mode" -> "FAILFAST")).as("root"))

  /** Templates file → one row per (device_type, daq_template, point),
    * scaling defaults applied.
    */
  def loadTemplates(spark: SparkSession, path: String): DataFrame =
    wholeJson(spark, path, templatesType)
      .select(explode(col("root")).as(Seq("device_type", "by_template")))
      .select(col("device_type"),
        explode(col("by_template")).as(Seq("daq_template", "points")))
      .select(col("device_type"), col("daq_template"),
        explode(col("points")).as("p"))
      .select(
        col("device_type"), col("daq_template"),
        col("p.unit").as("unit"),
        col("p.name").as("tag_name"),
        col("p.measure").as("measure_name"),
        coalesce(col("p.autoScaling.scale_mode"), lit("slope_intercept")).as("scale_mode"),
        coalesce(col("p.autoScaling.slope"), lit(1.0)).as("slope"),
        coalesce(col("p.autoScaling.offset"), lit(0.0)).as("offset"),
        coalesce(col("p.autoScaling.value_min"), lit(0.0)).as("value_min"),
        coalesce(col("p.autoScaling.value_max"), lit(0.0)).as("value_max"),
        coalesce(col("p.autoScaling.target_min"), lit(0.0)).as("target_min"),
        coalesce(col("p.autoScaling.target_max"), lit(0.0)).as("target_max"))

  /** Site-devices file → one row per device with network params flattened. */
  def loadSiteDevices(spark: SparkSession, path: String): DataFrame =
    wholeJson(spark, path, siteDevicesType)
      .select(explode(col("root")).as(Seq("config_type", "devices")))
      .select(col("config_type"), explode(col("devices")).as("d"))
      .select(
        col("d.daq_name").as("daq_name"),
        col("d.daq_template").as("daq_template"),
        col("d.device_type").as("device_type"),
        col("d.monitored").as("monitored"),
        col("d.network.params.protocol").as("protocol"),
        col("d.network.params.prefix").as("prefix"),
        col("d.network.params.server").as("server"),
        col("d.network.params.point_node").as("point_node"))

  /** The reference's subscription build (`OpcSubscribeService.cs:195-245`):
    * monitored OPCUA devices × their template's points, with the
    * monitored-item node id `{point_node}/{prefix}{tag_name}` (`:232`).
    * An equi-join on (device_type, daq_template); the template dim is
    * small → AQE broadcasts it.
    */
  def devicePoints(devices: DataFrame, templates: DataFrame): DataFrame =
    devices
      .filter(col("monitored") && col("protocol") === "OPCUA")
      .join(templates, Seq("device_type", "daq_template"))
      .select(
        col("daq_name"), col("device_type"), col("daq_template"),
        col("server"), col("measure_name"), col("tag_name"), col("unit"),
        col("scale_mode"), col("slope"), col("offset"),
        col("value_min"), col("value_max"), col("target_min"), col("target_max"),
        concat(col("point_node"), lit("/"), col("prefix"), col("tag_name"))
          .as("node_id"))

  /** C9 key material from env-pointed files (reference
    * `Services/OpcuaHelperService.cs:22-54`: env var names a key file,
    * both key and IV must load or encryption is off). Spark's aes
    * functions generate the IV, so only the key file is required here;
    * unset/unreadable → None, and the caller decides the fallback —
    * exactly the reference's `UserConfig(out key, out iv)` contract.
    */
  def aesKeyFromEnv(
      keyEnvVar: String = "GRAFT_AES_KEY_FILE",
      env: String => Option[String] = sys.env.get): Option[String] =
    env(keyEnvVar).flatMap { fp =>
      try Some(new String(Files.readAllBytes(Paths.get(fp)), StandardCharsets.UTF_8).trim)
      catch {
        case e: Exception =>
          System.err.println(s"Exception occurred when parsing keyfile: ${e.getMessage}")
          None
      }
    }
}

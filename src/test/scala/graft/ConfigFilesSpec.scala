package graft

import java.nio.file.Files
import graft.sources.ConfigFiles

/** S3 — the JSON config plane (reference
  * `Services/OpcSubscribeService.cs:449-497`): schema'd map-rooted loads,
  * the device × template-points join, loud malformed-config failure, and
  * env-pointed AES key files (`Services/OpcuaHelperService.cs:22-54`).
  */
class ConfigFilesSpec extends SparkSpec {

  private lazy val dir = graft.queries.ControlPlaneQueries.configFixtureDir

  test("templates load with scaling defaults applied (S3)") {
    val t = ConfigFiles.loadTemplates(spark, s"$dir/sos_templates_opcua.json")
    assert(t.count() == 3)
    val energy = t.filter(org.apache.spark.sql.functions.col("measure_name") === "energy")
      .collect().head
    // sparse autoScaling → reference defaults slope=1, offset=0
    assert(energy.getAs[Double]("slope") == 1.0)
    assert(energy.getAs[Double]("offset") == 0.0)
    assert(energy.getAs[String]("scale_mode") == "slope_intercept")
  }

  test("device points: monitored OPCUA devices x template points, reference node ids") {
    val t = ConfigFiles.loadTemplates(spark, s"$dir/sos_templates_opcua.json")
    val d = ConfigFiles.loadSiteDevices(spark, s"$dir/site_devices.json")
    assert(d.count() == 4)
    val points = ConfigFiles.devicePoints(d, t).collect()
    // inv-2 is unmonitored, met-2 is MODBUS → both excluded
    assert(points.map(_.getAs[String]("daq_name")).toSet == Set("inv-1", "met-1"))
    assert(points.length == 3)
    // StartNodeId = {point_node}/{prefix}{tag_name} (OpcSubscribeService.cs:232)
    assert(points.map(_.getAs[String]("node_id")).toSet ==
      Set("ns=2;s=PV/INV1.AC Power", "ns=2;s=PV/INV1.DC Volts", "ns=2;s=GRID/MET1.Energy"))
  }

  test("malformed config fails loudly, not silently-null (FAILFAST)") {
    val bad = Files.createTempFile("bad_config", ".json")
    Files.writeString(bad, """{"inverter": {"templA": [ {"unit": }""")
    val e = intercept[Exception] {
      ConfigFiles.loadTemplates(spark, bad.toString).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m =>
      m.contains("Malformed") || m.contains("FAILFAST") || m.contains("parse")))
  }

  test("AES key comes from an env-pointed file; unset or unreadable -> None") {
    val keyFile = Files.createTempFile("aes_key", ".txt")
    Files.writeString(keyFile, "0123456789abcdef0123456789abcdef\n")
    val env = Map("GRAFT_AES_KEY_FILE" -> keyFile.toString)
    assert(ConfigFiles.aesKeyFromEnv(env = env.get)
      .contains("0123456789abcdef0123456789abcdef"))
    assert(ConfigFiles.aesKeyFromEnv(env = Map.empty[String, String].get).isEmpty)
    assert(ConfigFiles.aesKeyFromEnv(
      env = Map("GRAFT_AES_KEY_FILE" -> "/nonexistent/key").get).isEmpty)
  }
}

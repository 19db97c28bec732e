package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.{QueryDef, Tables}
import graft.operators.{DtoMapping, NodeTree}

/** Control-plane / browse-path coverage (SURVEY.md §2.1 S5, §2.2 K5-K6,
  * §2.3 F7-F8, §2.7 C9/C11, §2.9 G1): the client-config include join, the
  * AES password roundtrip, exclusion-folder pruning, and the address-space
  * tree walk — each re-expressed over the testdata star schema.
  */
object ControlPlaneQueries {

  // AES-256 key: env-pointed key file in production (reference
  // `Services/OpcuaHelperService.cs:22-54`), literal fallback for tests
  private val AesKey = graft.sources.ConfigFiles.aesKeyFromEnv()
    .getOrElse("0123456789abcdef0123456789abcdef")

  /** Deterministic config fixture (the reference's
    * `sos_templates_opcua.json` / `site_devices.json` shapes,
    * `Services/OpcSubscribeService.cs:472-480`) so q58 exercises the REAL
    * file loader; the oracle is the equivalent VALUES list. Written ONCE
    * per JVM into a process-private temp dir — a fixed shared path would
    * race concurrent graft processes (truncate-then-write is not atomic,
    * and FAILFAST would abort the reader), and rewriting per call would
    * put driver file IO inside the timed bench pass.
    */
  private[graft] lazy val configFixtureDir: String = writeConfigFixture()

  private def writeConfigFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_config_fixture")
    // per-JVM dir: remove it on exit so repeated runs don't accumulate
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }))
    val templates =
      """{
        |  "inverter": {
        |    "templA": [
        |      {"unit": "kW", "name": "AC Power", "measure": "ac_power",
        |       "autoScaling": {"scale_mode": "slope_intercept", "slope": 2.5, "offset": 1.5}},
        |      {"unit": "V", "name": "DC Volts", "measure": "dc_volts",
        |       "autoScaling": {"scale_mode": "point_slope", "value_min": 0, "value_max": 10,
        |                        "target_min": 0, "target_max": 100}}
        |    ]
        |  },
        |  "meter": {
        |    "templB": [
        |      {"unit": "kWh", "name": "Energy", "measure": "energy",
        |       "autoScaling": {"scale_mode": "slope_intercept"}}
        |    ]
        |  }
        |}""".stripMargin
    val devices =
      """{
        |  "inverter": [
        |    {"daq_name": "inv-1", "daq_template": "templA", "device_type": "inverter",
        |     "monitored": true,
        |     "network": {"params": {"protocol": "OPCUA", "prefix": "INV1.",
        |                             "server": "opc.tcp://a:4840", "point_node": "ns=2;s=PV"}}},
        |    {"daq_name": "inv-2", "daq_template": "templA", "device_type": "inverter",
        |     "monitored": false,
        |     "network": {"params": {"protocol": "OPCUA", "prefix": "INV2.",
        |                             "server": "opc.tcp://a:4840", "point_node": "ns=2;s=PV"}}}
        |  ],
        |  "meter": [
        |    {"daq_name": "met-1", "daq_template": "templB", "device_type": "meter",
        |     "monitored": true,
        |     "network": {"params": {"protocol": "OPCUA", "prefix": "MET1.",
        |                             "server": "opc.tcp://b:4840", "point_node": "ns=2;s=GRID"}}},
        |    {"daq_name": "met-2", "daq_template": "templB", "device_type": "meter",
        |     "monitored": true,
        |     "network": {"params": {"protocol": "MODBUS", "prefix": "MET2.",
        |                             "server": "tcp://c:502", "point_node": ""}}}
        |  ]
        |}""".stripMargin
    java.nio.file.Files.writeString(dir.resolve("sos_templates_opcua.json"), templates)
    java.nio.file.Files.writeString(dir.resolve("site_devices.json"), devices)
    dir.toString
  }

  val defs: Seq[QueryDef] = Seq(

    // C9 + C11 — AES-256-CBC encrypt/decrypt roundtrip (reference
    // `Services/OpcuaHelperService.cs:195-248`): UTF-8 encode → encrypt →
    // decrypt → decode must be the identity. The oracle checks exactly
    // that (ciphertext itself is IV-random and never compared).
    QueryDef("q16_aes_roundtrip",
      """SELECT s_suppkey, s_name AS roundtrip FROM supplier
        |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      // typed functions API with lit(key), never string-built expr(): the
      // key is env-file-sourced (arbitrary content), so interpolation
      // could break parsing or inject SQL — and lit keeps it redactable
      Tables.supplier(s, dir)
        .select(col("s_suppkey"),
          decode(aes_decrypt(
            aes_encrypt(encode(col("s_name"), "UTF-8"), lit(AesKey), lit("CBC")),
            lit(AesKey), lit("CBC")), "UTF-8").as("roundtrip"))
        .orderBy("s_suppkey")
    },

    // J5 — client-config 1:N include (`OpcClientConnections ⋈
    // BrowseExclusionFolders` + collect_list, reference
    // `Services/OpcuaHelperService.cs:68-70`): broadcast dim join, sorted
    // list aggregation rendered as a join-stable string.
    QueryDef("q17_config_include",
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS members,
        |       COUNT(*) AS n_members
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin) { (s, dir) =>
      Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("members"),
          count(lit(1)).as("n_members"))
        .orderBy("r_name")
    },

    // F7 + F8 — browse exclusion filter and node→row projection
    // (reference `Helpers/OpcuaBrowse.cs:78-94`): broadcast anti-join
    // against the exclusion list, then the jsTree rename projection.
    QueryDef("q18_browse_exclusion",
      """SELECT p_name AS text, p_partkey AS id, p_type AS type
        |FROM part WHERE p_brand NOT IN ('Brand#13', 'Brand#42')
        |ORDER BY id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val exclusions = Seq("Brand#13", "Brand#42").toDF("p_brand")
      Tables.part(s, dir)
        .join(broadcast(exclusions), Seq("p_brand"), "left_anti")
        .select(col("p_name").as("text"), col("p_partkey").as("id"),
          col("p_type").as("type"))
        .orderBy("id")
    },

    // G1 — address-space tree walk: region → nation → customer as a node
    // table, excluded subtrees pruned, iterative BFS depth/path, jsTree
    // opened flag. Oracle = recursive CTE.
    QueryDef("q19_node_tree",
      """WITH RECURSIVE nodes AS (
        |  SELECT 'R' || CAST(r_regionkey AS VARCHAR) AS id,
        |         CAST(NULL AS VARCHAR) AS parent_id, r_name AS text FROM region
        |  UNION ALL
        |  SELECT 'N' || CAST(n_nationkey AS VARCHAR),
        |         'R' || CAST(n_regionkey AS VARCHAR), n_name FROM nation
        |  UNION ALL
        |  SELECT 'C' || CAST(c_custkey AS VARCHAR),
        |         'N' || CAST(c_nationkey AS VARCHAR), c_name FROM customer),
        |pruned AS (SELECT * FROM nodes WHERE text NOT IN ('AFRICA', 'JAPAN')),
        |t AS (
        |  SELECT id, parent_id, text, 0 AS depth, text AS path
        |  FROM pruned WHERE parent_id IS NULL
        |  UNION ALL
        |  SELECT n.id, n.parent_id, n.text, t.depth + 1, t.path || '/' || n.text
        |  FROM pruned n JOIN t ON n.parent_id = t.id)
        |SELECT id, parent_id, text, CAST(depth AS INT) AS depth, path,
        |       CAST(depth < 3 AS INT) AS opened
        |FROM t ORDER BY id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val region = Tables.region(s, dir).select(
        concat(lit("R"), col("r_regionkey").cast(StringType)).as("id"),
        lit(null).cast(StringType).as("parent_id"), col("r_name").as("text"))
      val nation = Tables.nation(s, dir).select(
        concat(lit("N"), col("n_nationkey").cast(StringType)).as("id"),
        concat(lit("R"), col("n_regionkey").cast(StringType)).as("parent_id"),
        col("n_name").as("text"))
      val customer = Tables.customer(s, dir).select(
        concat(lit("C"), col("c_custkey").cast(StringType)).as("id"),
        concat(lit("N"), col("c_nationkey").cast(StringType)).as("parent_id"),
        col("c_name").as("text"))
      val nodes = region.unionByName(nation).unionByName(customer)
      val pruned = NodeTree.pruneExclusions(nodes, Seq("AFRICA", "JAPAN").toDF("text"))
      NodeTree.bfs(pruned)
        .select("id", "parent_id", "text", "depth", "path", "opened")
        .orderBy("id")
    },

    // K6 — the REST DTO projection (`Helpers/AutoMapperProfiles.cs:12-44`):
    // connection entities joined to their 1:N exclusion-folder children,
    // folder list flattened to a sorted join-stable string. nation plays
    // OpcClientConnections, customer plays BrowseExclusionFolders.
    QueryDef("q57_dto_mapping",
      """SELECT n_nationkey AS id,
        |       'opc.tcp://' || n_name AS url,
        |       n_name AS username,
        |       coalesce(string_agg(c_name, ',' ORDER BY c_name), '') AS folders,
        |       COUNT(c_custkey) AS n_folders
        |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY n_nationkey, n_name
        |ORDER BY id""".stripMargin) { (s, dir) =>
      val entities = Tables.nation(s, dir).select(
        col("n_nationkey").as("id"),
        concat(lit("opc.tcp://"), col("n_name")).as("url"),
        col("n_name").as("username"))
      val folders = Tables.customer(s, dir).select(
        col("c_nationkey").as("opcClientConnectionId"),
        col("c_name").as("exclusionFolder"))
      DtoMapping.dtoProjection(entities, folders).orderBy("id")
    },

    // S3 — the real JSON config plane: templates + site-devices files
    // loaded with explicit schemas (FAILFAST), exploded and joined into
    // the device-point subscription dim with the reference's
    // `{point_node}/{prefix}{tag_name}` node ids
    // (`Services/OpcSubscribeService.cs:195-245,472-480`). Fixture is a
    // deterministic literal, so the oracle is the equivalent VALUES list.
    QueryDef("q58_config_explode",
      """SELECT * FROM (VALUES
        |  ('inv-1','inverter','templA','opc.tcp://a:4840','ac_power','AC Power','kW',
        |   'slope_intercept', CAST(2.5 AS DOUBLE), CAST(1.5 AS DOUBLE), CAST(0 AS DOUBLE),
        |   CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), 'ns=2;s=PV/INV1.AC Power'),
        |  ('inv-1','inverter','templA','opc.tcp://a:4840','dc_volts','DC Volts','V',
        |   'point_slope', CAST(1 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
        |   CAST(10 AS DOUBLE), CAST(0 AS DOUBLE), CAST(100 AS DOUBLE), 'ns=2;s=PV/INV1.DC Volts'),
        |  ('met-1','meter','templB','opc.tcp://b:4840','energy','Energy','kWh',
        |   'slope_intercept', CAST(1 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
        |   CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), 'ns=2;s=GRID/MET1.Energy'))
        |AS t(daq_name, device_type, daq_template, server, measure_name, tag_name, unit,
        |     scale_mode, slope, "offset", value_min, value_max, target_min, target_max, node_id)
        |ORDER BY daq_name, measure_name""".stripMargin) { (s, _) =>
      import graft.sources.ConfigFiles
      val dir = configFixtureDir
      val templates = ConfigFiles.loadTemplates(s, s"$dir/sos_templates_opcua.json")
      val devices = ConfigFiles.loadSiteDevices(s, s"$dir/site_devices.json")
      ConfigFiles.devicePoints(devices, templates)
        .orderBy("daq_name", "measure_name")
    }
  )
}

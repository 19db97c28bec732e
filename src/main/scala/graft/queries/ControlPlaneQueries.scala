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

  private val AesKey = "0123456789abcdef0123456789abcdef" // AES-256, as reference

  val defs: Seq[QueryDef] = Seq(

    // C9 + C11 — AES-256-CBC encrypt/decrypt roundtrip (reference
    // `Services/OpcuaHelperService.cs:195-248`): UTF-8 encode → encrypt →
    // decrypt → decode must be the identity. The oracle checks exactly
    // that (ciphertext itself is IV-random and never compared).
    QueryDef("q16_aes_roundtrip",
      """SELECT s_suppkey, s_name AS roundtrip FROM supplier
        |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      Tables.supplier(s, dir)
        .select(col("s_suppkey"),
          expr(s"decode(aes_decrypt(aes_encrypt(encode(s_name, 'UTF-8'), " +
            s"'$AesKey', 'CBC'), '$AesKey', 'CBC'), 'UTF-8')").as("roundtrip"))
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
    }
  )
}

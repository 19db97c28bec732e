package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** G1 — the OPC UA address-space browse relationalized (SURVEY.md §2.9;
  * reference `Helpers/OpcuaBrowse.cs:20-144` DFS-walks the node tree with
  * exclusion-folder pruning and a depth-based default-collapse rule).
  *
  * The tree is modeled as a node table (id, parent_id, text); the walk is
  * an iterative BFS of per-level self-joins — each level is one distributed
  * equi-join on parent_id, so a 10⁹-node tree walks level-parallel instead
  * of the reference's 600-thread DFS. Exclusion pruning composes as a
  * broadcast anti-join on `text` BEFORE the walk: removing an excluded
  * node unroots its whole subtree, which is exactly the reference's
  * prune-at-every-level semantics.
  */
object NodeTree {

  /** BFS from the roots (parent_id IS NULL): emits every reachable node
    * with its depth and root-to-node path, plus the jsTree `opened` flag
    * (nodes deeper than `openDepth` default-collapsed — reference
    * `Helpers/OpcuaBrowse.cs:50-53`).
    *
    * Scale note: each level references the previous level's plan, so for
    * deep trees (maxDepth ≫ 10) insert `localCheckpoint()` on the frontier
    * every few levels to keep lineage bounded; testdata trees are 3 deep.
    */
  def bfs(nodes: DataFrame, maxDepth: Int = 20, openDepth: Int = 3): DataFrame = {
    var frontier = nodes.filter(col("parent_id").isNull)
      .select(col("id"), col("parent_id"), col("text"),
        lit(0).as("depth"), col("text").as("path"))
    var acc = frontier
    var depth = 0
    var exhausted = false
    while (!exhausted && depth < maxDepth) {
      // localCheckpoint: materialize the level ONCE — the emptiness probe,
      // the union lineage, and the next level's join all reuse it (and
      // lineage stays bounded on deep trees instead of nesting one join
      // plan per level)
      val next = nodes
        .join(frontier.select(col("id").as("__pid"),
          col("depth").as("__pdepth"), col("path").as("__ppath")),
          col("parent_id") === col("__pid"))
        .select(col("id"), col("parent_id"), col("text"),
          (col("__pdepth") + 1).as("depth"),
          concat(col("__ppath"), lit("/"), col("text")).as("path"))
        .localCheckpoint()
      if (next.isEmpty) exhausted = true
      else {
        acc = acc.unionByName(next)
        frontier = next
        depth += 1
      }
    }
    acc.withColumn("opened", (col("depth") < openDepth).cast(IntegerType))
  }

  /** F7 — exclusion-folder pruning as a broadcast anti-join on display
    * text (reference `Helpers/OpcuaBrowse.cs:78-87`).
    */
  def pruneExclusions(nodes: DataFrame, exclusions: DataFrame): DataFrame =
    nodes.join(broadcast(exclusions), Seq("text"), "left_anti")

  /** K5 — jsTree JSON export (reference `Helpers/OpcuaBrowse.cs:256-264`,
    * `Models/JsTreeExport.cs:36-46`): lowercase property names, per-node
    * `state.opened`, children nested recursively. Serialization is
    * driver-side, as in the reference — address-space trees are small
    * relative to the data plane (the reference writes one file per
    * connection); the distributed part is the BFS that produced `walked`.
    * Children and roots are ordered by id for a deterministic document.
    */
  def toJsTreeJson(walked: DataFrame): String = {
    val rows = walked.select("id", "parent_id", "text", "opened").collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getString(2), r.getInt(3) == 1))
    val children = rows.filter(_._2.isDefined)
      .groupBy(_._2.get).map { case (p, cs) => p -> cs.sortBy(_._1) }
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def render(node: (String, Option[String], String, Boolean)): String = {
      val kids = children.getOrElse(node._1, Array.empty[(String, Option[String], String, Boolean)])
      s"""{"text":"${esc(node._3)}","id":"${esc(node._1)}",""" +
        s""""state":{"opened":${node._4}},""" +
        s""""children":[${kids.map(render).mkString(",")}]}"""
    }
    rows.filter(_._2.isEmpty).sortBy(_._1).map(render).mkString("[", ",", "]")
  }
}

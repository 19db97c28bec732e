package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.NodeTree
import graft.sources.{FeedTransport, SimulatedFeed}
import graft.sources.OpcuaSession._

/** The Part 4 Browse / BrowseNext services end-to-end over a real socket —
  * the wire half of the reference's browse job
  * (`Helpers/OpcuaBrowse.cs:20-144`: Forward, HierarchicalReferences with
  * subtypes, Object|Variable, exclusion pruning, jsTree export). The
  * served address space is the feed log: Objects → device Objects →
  * measure Variables.
  */
class OpcuaBrowseSpec extends AnyFunSuite {

  private def withClient(f: (SessionClient, SimulatedFeed) => Unit): Unit = {
    val feed = new SimulatedFeed(nDevices = 3, nMeasures = 2,
      startMicros = 1704067200000000L, intervalMicros = 5000000L, clockTicks = 2L)
    val server = new FeedTransport.FeedServer(feed)
    try {
      val c = new SessionClient("127.0.0.1", server.boundPort)
      try { c.createSession("browse"); c.activateSession(); f(c, feed) }
      finally c.close()
    } finally server.close()
  }

  test("hierarchy: Root organizes Objects; Objects organizes devices; devices hold Variables") {
    withClient { (c, _) =>
      val root = c.browse(Seq(NodeIdT(0, RootFolderId))).head
      assert(root.status == graft.sources.OpcuaFraming.GoodStatus)
      assert(root.refs.map(_.displayName) == Vector("Objects"))
      assert(root.refs.head.refTypeId.numeric == OrganizesId)

      val objects = c.browse(Seq(NodeIdT(0, ObjectsFolderId))).head
      assert(objects.refs.map(_.displayName) == Vector("dev-0", "dev-1", "dev-2"))
      assert(objects.refs.forall(_.nodeClass == NodeClassObject))
      assert(objects.refs.forall(_.refTypeId.numeric == OrganizesId))
      assert(objects.refs.forall(_.isForward))

      val dev = c.browse(Seq(NodeIdT(2, string = "dev-1"))).head
      assert(dev.refs.map(_.displayName) == Vector("m0", "m1"))
      assert(dev.refs.forall(_.nodeClass == NodeClassVariable))
      assert(dev.refs.forall(_.refTypeId.numeric == HasComponentId))
      assert(dev.refs.map(r => nodeIdString(r.nodeId)) ==
        Vector("ns=2;s=dev-1/m0", "ns=2;s=dev-1/m1"))

      val leaf = c.browse(Seq(NodeIdT(2, string = "dev-1/m0"))).head
      assert(leaf.status == graft.sources.OpcuaFraming.GoodStatus)
      assert(leaf.refs.isEmpty, "a Variable is a leaf")

      val unknown = c.browse(Seq(NodeIdT(2, string = "no-such-node"))).head
      assert(unknown.status == BadNodeIdUnknown)
      assert(unknown.refs.isEmpty)
    }
  }

  test("RequestedMaxReferencesPerNode slices through continuation points; release invalidates") {
    withClient { (c, _) =>
      val first = c.browse(Seq(NodeIdT(0, ObjectsFolderId)), maxRefsPerNode = 1L).head
      assert(first.refs.size == 1)
      assert(first.continuation != null, "a capped browse must hand back a continuation point")

      var refs = first.refs
      var cp = first.continuation
      while (cp != null) {
        val cont = c.browseNext(Seq(cp)).head
        assert(cont.refs.size <= 1, "BrowseNext keeps the original slice cap")
        refs ++= cont.refs
        cp = cont.continuation
      }
      assert(refs.map(_.displayName) == Vector("dev-0", "dev-1", "dev-2"),
        "continuation chain must drain every reference exactly once, in order")

      // release: the point dies without delivering, and a second use faults
      val again = c.browse(Seq(NodeIdT(0, ObjectsFolderId)), maxRefsPerNode = 2L).head
      assert(again.continuation != null)
      val released = c.browseNext(Seq(again.continuation), release = true).head
      assert(released.status == graft.sources.OpcuaFraming.GoodStatus)
      assert(released.continuation == null && released.refs.isEmpty)
      val reused = c.browseNext(Seq(again.continuation)).head
      assert(reused.status == BadContinuationPointInvalid)
    }
  }

  test("NodeClassMask and ReferenceTypeId filter; Inverse direction is refused") {
    withClient { (c, _) =>
      val objectsOnly = c.browse(Seq(NodeIdT(2, string = "dev-0")),
        nodeClassMask = NodeClassObject).head
      assert(objectsOnly.refs.isEmpty, "device children are Variables, mask=Object hides them")
      val varsOnly = c.browse(Seq(NodeIdT(2, string = "dev-0")),
        nodeClassMask = NodeClassVariable).head
      assert(varsOnly.refs.size == 2)

      // exact (non-subtype) reference-type matches
      val organizes = c.browse(Seq(NodeIdT(2, string = "dev-0")),
        referenceTypeId = OrganizesId, includeSubtypes = false).head
      assert(organizes.refs.isEmpty, "device → measure is HasComponent, not Organizes")
      val hasComponent = c.browse(Seq(NodeIdT(2, string = "dev-0")),
        referenceTypeId = HasComponentId, includeSubtypes = false).head
      assert(hasComponent.refs.size == 2)
      // HierarchicalReferences is abstract: exact match (no subtypes) is empty
      val exactAbstract = c.browse(Seq(NodeIdT(0, ObjectsFolderId)),
        includeSubtypes = false).head
      assert(exactAbstract.refs.isEmpty)

      val inverse = c.browse(Seq(NodeIdT(0, ObjectsFolderId)), direction = 1L).head
      assert(inverse.status == BadBrowseDirectionInvalid)
    }
  }

  test("browseTree walks the address space level-parallel and matches a capped, continuation-heavy walk") {
    withClient { (c, feed) =>
      val full = c.browseTree()
      val viaCp = c.browseTree(maxRefsPerNode = 1L)
      assert(full == viaCp,
        "a walk forced through 1-ref slices + BrowseNext must see the identical tree")
      val ids = full.map(_._1)
      assert(ids.distinct == ids, "every node exactly once")
      assert(full.size == 1 + 3 + 3 * 2, "Objects + 3 devices + 6 measures")
      assert(full.count(_._4 == "Variable") == 6)
      // parent linkage: every measure hangs off its device node
      val parents = full.map(r => r._1 -> r._2).toMap
      assert(parents("ns=2;s=dev-2/m1") == "ns=2;s=dev-2")
      assert(parents("ns=2;s=dev-2") == "i=85")
    }
  }

  test("e2e: wire browse + NodeTree + jsTree export, exclusions pruning whole subtrees") {
    withClient { (c, _) =>
      import SparkSpec.spark.implicits._
      val walked = c.browseTree(exclusions = Set("dev-1"))
      assert(!walked.exists(_._3 == "dev-1"), "excluded device pruned at the wire walk")
      assert(!walked.exists(_._1.contains("dev-1/")), "…and its whole subtree with it")

      val nodes = walked.map(r => (r._1, Option(r._2), r._3))
        .toDF("id", "parent_id", "text")
      val tree = NodeTree.bfs(nodes, openDepth = 2)
      val depths = tree.select("text", "depth").as[(String, Int)].collect().toMap
      assert(depths("Objects") == 0 && depths("dev-0") == 1 && depths("m1") == 2)

      val json = NodeTree.toJsTreeJson(tree)
      // one deterministic document: root opened, devices opened, leaves collapsed
      assert(json.contains(""""text":"dev-0","id":"ns=2;s=dev-0""""))
      assert(!json.contains("dev-1"))
      // depth-2 leaves are below openDepth → "opened":false
      assert(json.contains(""""text":"m0","id":"ns=2;s=dev-0/m0","state":{"opened":false}"""))
    }
  }
}

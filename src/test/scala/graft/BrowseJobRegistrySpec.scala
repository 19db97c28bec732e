package graft

import java.io.File
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BrowseJobRegistry
import graft.operators.BrowseJobRegistry._

/** G2 — browse-job dedup registry (reference `Services/BrowseService.cs:14-41`
  * ConcurrentDictionary + `Helpers/OpcuaBrowse.cs:162-173` temp-file
  * marker): in-process race, cross-process marker dedup, release on
  * throw, stale-marker reclaim, and long-URL filename safety.
  */
class BrowseJobRegistrySpec extends AnyFunSuite {

  private def tmpDir(): File =
    Files.createTempDirectory("browse_reg").toFile

  test("in-process race: exactly one of N concurrent claims wins (G2)") {
    val reg = new BrowseJobRegistry(tmpDir())
    val n = 16
    val ready = new CountDownLatch(n)
    val go = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    val wins = (0 until n).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean = {
          ready.countDown(); go.await()
          reg.tryStart("opc.tcp://s1:4840")
        }
      })
    }
    ready.await(); go.countDown()
    val results = wins.map(_.get(10, TimeUnit.SECONDS))
    pool.shutdown()
    assert(results.count(identity) == 1)
    assert(reg.status("opc.tcp://s1:4840").contains(Running))
  }

  test("marker file dedups across independent registries (cross-process)") {
    val dir = tmpDir()
    val a = new BrowseJobRegistry(dir)
    val b = new BrowseJobRegistry(dir) // second driver process, same share
    assert(a.tryStart("opc.tcp://s1:4840"))
    assert(!b.tryStart("opc.tcp://s1:4840")) // marker held by a
    a.complete("opc.tcp://s1:4840")
    assert(b.tryStart("opc.tcp://s1:4840")) // released with the marker
  }

  test("run: dedups while in flight, records status, releases on throw") {
    val reg = new BrowseJobRegistry(tmpDir())
    val url = "opc.tcp://s2:4840"
    val started = new CountDownLatch(1)
    val finish = new CountDownLatch(1)
    val pool = Executors.newSingleThreadExecutor()
    val first = pool.submit(new java.util.concurrent.Callable[Option[Int]] {
      def call(): Option[Int] = reg.run(url) { started.countDown(); finish.await(); 42 }
    })
    started.await()
    assert(reg.run(url)(99).isEmpty) // deduped away while in flight
    finish.countDown()
    assert(first.get(10, TimeUnit.SECONDS).contains(42))
    assert(reg.status(url).contains(Completed))
    pool.shutdown()

    // failure: marker released, error queryable, next run admitted
    val boom = intercept[RuntimeException](reg.run(url)(throw new RuntimeException("bad node")))
    assert(boom.getMessage == "bad node")
    assert(reg.status(url) == Some(Failed("bad node")))
    assert(reg.run(url)(7).contains(7))
  }

  test("stale marker from a dead process is reclaimed; fresh one is not") {
    val dir = tmpDir()
    val crashed = new BrowseJobRegistry(dir)
    assert(crashed.tryStart("opc.tcp://dead:4840")) // then the JVM "dies"

    val fresh = new BrowseJobRegistry(dir, staleAfterMillis = 60 * 1000L)
    assert(!fresh.tryStart("opc.tcp://dead:4840")) // fresh marker: still held

    // age the marker past the staleness bound → reclaimable
    val marker = dir.listFiles().find(_.getName.endsWith(".inprogress")).get
    assert(marker.setLastModified(System.currentTimeMillis() - 2 * 60 * 1000L))
    assert(fresh.tryStart("opc.tcp://dead:4840"))
    fresh.complete("opc.tcp://dead:4840")
    assert(!dir.listFiles().exists(_.getName.endsWith(".inprogress")))
  }

  test("a stalled owner's release cannot delete the reclaiming claimant's marker") {
    val dir = tmpDir()
    val url = "opc.tcp://slow:4840"
    val slow = new BrowseJobRegistry(dir, staleAfterMillis = 60 * 1000L)
    assert(slow.tryStart(url)) // then overruns staleAfterMillis...

    val marker = dir.listFiles().find(_.getName.endsWith(".inprogress")).get
    assert(marker.setLastModified(System.currentTimeMillis() - 2 * 60 * 1000L))
    val reclaimer = new BrowseJobRegistry(dir, staleAfterMillis = 60 * 1000L)
    assert(reclaimer.tryStart(url)) // reclaims the "leaked" marker

    // ...and finally finishes: its owner token no longer matches, so the
    // reclaimer's marker must survive and keep excluding other claimants
    slow.complete(url)
    assert(dir.listFiles().exists(_.getName.endsWith(".inprogress")))
    val third = new BrowseJobRegistry(dir, staleAfterMillis = 60 * 1000L)
    assert(!third.tryStart(url))
    reclaimer.complete(url) // the true owner's release does delete it
    assert(!dir.listFiles().exists(_.getName.endsWith(".inprogress")))
    assert(third.tryStart(url))
  }

  test("very long connection URLs produce filesystem-safe marker names") {
    val dir = tmpDir()
    val reg = new BrowseJobRegistry(dir)
    val longUrl = "opc.tcp://" + ("x" * 400) + ":4840/path"
    assert(reg.tryStart(longUrl))
    val names = dir.listFiles().map(_.getName).toSeq
    assert(names.size == 1)
    assert(names.head.length < 128)
    // distinct long URLs sharing a truncated prefix still get distinct markers
    val longUrl2 = "opc.tcp://" + ("x" * 400) + ":4841/other"
    assert(reg.tryStart(longUrl2))
    assert(dir.listFiles().length == 2)
    reg.complete(longUrl); reg.complete(longUrl2)
  }
}

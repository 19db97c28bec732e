package graft.operators

import java.io.File
import java.util.concurrent.ConcurrentHashMap

/** G2 — browse-job dedup + status registry (reference
  * `Services/BrowseService.cs:14-41` ConcurrentDictionary registry;
  * `Helpers/OpcuaBrowse.cs:162-173` temp-file marker preventing two
  * concurrent browses of the same connection).
  *
  * In the rebuild a "browse job" is the driver-side G1 BFS walk
  * ([[NodeTree.bfs]]) over one connection's address space; this registry is
  * the admission control in front of it. Two layers, as in the reference:
  * an in-process map for status queries, and an atomically-created marker
  * file so independent driver processes sharing the output directory also
  * dedup (the reference's reason for the temp file).
  */
final class BrowseJobRegistry(markerDir: File,
                              staleAfterMillis: Long = 10 * 60 * 1000L) {

  import BrowseJobRegistry._

  markerDir.mkdirs()

  private val jobs = new ConcurrentHashMap[String, JobStatus]()

  // Owner token per in-flight claim: the marker FILE carries the claimant's
  // UUID, and release/reclaim verify it before deleting — so a process that
  // stalls past staleAfterMillis (its marker reclaimed and re-created by
  // another claimant) cannot delete the NEW owner's marker on its way out.
  // Mutual exclusion across processes remains BEST-EFFORT after a crash:
  // the age check and the token write are not atomic with marker creation,
  // so a reclaim racing a fresh claim can still double-admit for one window
  // — size staleAfterMillis well above the worst-case browse duration (the
  // reference's temp-file marker has the same contract,
  // `Helpers/OpcuaBrowse.cs:162-173`).
  private val ownerTokens = new ConcurrentHashMap[String, String]()

  private def writeToken(f: File, token: String): Unit =
    java.nio.file.Files.write(f.toPath,
      token.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def readToken(f: File): Option[String] =
    try Some(new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: java.io.IOException => None }

  private def markerFor(connectionUrl: String): File = {
    // filename-safe key, same intent as the reference's sanitized temp
    // name; the readable URL part is truncated so a long connection URL
    // can't exceed filesystem name limits — a FULL-WIDTH md5 of the url
    // keeps the name collision-free (32-bit hashCode would let two
    // distinct connections alias to one marker and block each other)
    val sanitized = connectionUrl.replaceAll("[^A-Za-z0-9._-]", "_").take(48)
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(connectionUrl.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    new File(markerDir, "browse_" + digest + "_" + sanitized + ".inprogress")
  }

  /** Atomically claim the job. Returns false if a browse of this
    * connection is already running (in this process or, via the marker
    * file, any other). A marker older than `staleAfterMillis` is treated
    * as leaked by a crashed process (it can never be released by its
    * owner) and is reclaimed — without this, one kill -9 would block the
    * connection's browses forever.
    */
  def tryStart(connectionUrl: String): Boolean = {
    val prior = jobs.put(connectionUrl, Running)
    if (prior == Running) false // lost the in-process race / already running
    else {
      def rollback(): Unit =
        if (prior == null) jobs.remove(connectionUrl)
        else jobs.put(connectionUrl, prior)
      val marker = markerFor(connectionUrl)
      val token = java.util.UUID.randomUUID().toString
      def claimed(): Boolean = { // marker created by us — stamp ownership
        try writeToken(marker, token)
        catch {
          // a failed stamp (disk full, permissions) must not leave an
          // ownerless fresh marker blocking the connection until the
          // staleness bound — remove our own creation before propagating
          case e: Throwable => marker.delete(); throw e
        }
        ownerTokens.put(connectionUrl, token)
        true
      }
      try {
        if (marker.createNewFile()) claimed()
        else {
          val age = System.currentTimeMillis() - marker.lastModified()
          // Stale leak from a dead JVM: reclaim by renaming the stale
          // marker to a name unique to this claimant — the rename is
          // exclusive (the source vanishes), so of the processes racing
          // a reclaim only one wins the FILE. The age check is not atomic
          // with the rename, though: a slow loser can rename the winner's
          // FRESH replacement marker — so after winning the rename, check
          // the claimed file's own mtime and hand it back if it turns out
          // fresh. staleAfterMillis must exceed the worst-case browse
          // duration, as the owner does not refresh the marker (reference
          // temp-file semantics: browses are short).
          sweepLeakedClaims()
          val claim = new File(marker.getPath + "." +
            java.util.UUID.randomUUID().toString + ".reclaim")
          if (age > staleAfterMillis && marker.renameTo(claim)) {
            val claimedAge = System.currentTimeMillis() - claim.lastModified()
            if (claimedAge <= staleAfterMillis) {
              // we stole a live owner's marker in the race window above —
              // restore it (or drop our copy if a newer one already exists)
              if (!claim.renameTo(marker)) claim.delete()
              rollback(); false
            } else {
              claim.delete()
              if (marker.createNewFile()) claimed() else { rollback(); false }
            }
          } else { rollback(); false }
        }
      } catch {
        // e.g. IOException from the filesystem — don't leak the
        // in-process Running claim
        case e: Throwable => rollback(); throw e
      }
    }
  }

  /** A claimant that dies between rename and delete leaves its .reclaim
    * file behind forever (nothing else generates that name) — sweep ones
    * old enough that their owner is certainly gone.
    */
  private def sweepLeakedClaims(): Unit =
    Option(markerDir.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.getName.endsWith(".reclaim") &&
        System.currentTimeMillis() - f.lastModified() > staleAfterMillis)
        f.delete()
    }

  /** Delete the marker only if this registry's claim still owns it — a
    * reclaimed-and-recreated marker (we overran staleAfterMillis) belongs
    * to the new claimant and must survive our release. The read-then-
    * delete is NOT atomic (plain-filesystem files have no compare-and-
    * delete), so a reclaim landing exactly between the two can still lose
    * its marker — the token check narrows the window from the whole
    * overrun to microseconds; eliminating it outright needs a lock
    * service. Best-effort after a crash, per the class contract.
    */
  private def releaseMarker(connectionUrl: String): Unit = {
    val marker = markerFor(connectionUrl)
    val ours = Option(ownerTokens.remove(connectionUrl))
    if (ours.isDefined && readToken(marker) == ours) marker.delete()
  }

  /** Mark success and release the marker (if still ours). */
  def complete(connectionUrl: String): Unit = {
    releaseMarker(connectionUrl)
    jobs.put(connectionUrl, Completed)
  }

  /** Mark failure (kept queryable, as the reference surfaces job errors to
    * the REST caller) and release the marker (if still ours).
    */
  def fail(connectionUrl: String, error: String): Unit = {
    releaseMarker(connectionUrl)
    jobs.put(connectionUrl, Failed(error))
  }

  def status(connectionUrl: String): Option[JobStatus] =
    Option(jobs.get(connectionUrl))

  /** Run `body` as the connection's browse job if no job is in flight;
    * returns None when deduped away. Marker and status are always
    * released/recorded, including on throw.
    */
  def run[T](connectionUrl: String)(body: => T): Option[T] =
    if (!tryStart(connectionUrl)) None
    else try {
      val out = body
      complete(connectionUrl)
      Some(out)
    } catch {
      case e: Throwable =>
        fail(connectionUrl, e.getMessage)
        throw e
    }
}

object BrowseJobRegistry {
  sealed trait JobStatus
  case object Running extends JobStatus
  case object Completed extends JobStatus
  final case class Failed(error: String) extends JobStatus
}

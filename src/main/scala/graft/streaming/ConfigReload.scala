package graft.streaming

import java.io.File
import java.util.concurrent.atomic.{AtomicBoolean, AtomicReference}
import org.apache.spark.sql.streaming.StreamingQuery

/** S4 — config hot-reload (SURVEY.md §2.1; reference
  * `Services/OpcSubscribeService.cs:79-98,499-518` arms a FileSystemWatcher
  * on the sos-config dir's `*.json` and cancels + fully resubscribes on any
  * change). Spark semantics: stop the running StreamingQuery and relaunch
  * it from freshly-loaded config — a full re-subscribe, matching the
  * reference's restart at `:419-424`.
  *
  * Watching is an mtime poll on a daemon thread (portable, no inotify
  * dependency); the reference's watcher granularity is file-level too.
  */
object ConfigReload {

  final class Handle(thread: Thread, stopFlag: AtomicBoolean,
                     query: AtomicReference[StreamingQuery]) extends AutoCloseable {
    def currentQuery: StreamingQuery = query.get()
    override def close(): Unit = {
      stopFlag.set(true)
      thread.join(10000)
      Option(query.get()).foreach(_.stop())
    }
  }

  /** Launch the query and restart it whenever any `.json` under `dir`
    * changes (create/modify/delete). `launch` must start a NEW query from
    * re-read config each call.
    */
  def watch(dir: File, pollMs: Long = 500L)(launch: () => StreamingQuery): Handle = {
    def snapshot(): Map[String, Long] =
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".json"))
        .map(f => f.getName -> f.lastModified()).toMap

    val stopFlag = new AtomicBoolean(false)
    val queryRef = new AtomicReference[StreamingQuery](launch())
    val thread = new Thread(() => {
      var last = snapshot()
      var pendingRelaunch = false
      while (!stopFlag.get()) {
        Thread.sleep(pollMs)
        val now = snapshot()
        if (now != last || pendingRelaunch) {
          last = now
          Option(queryRef.get()).foreach(_.stop()) // cancel …
          // … and fully resubscribe; a failed launch (e.g. config mid-write,
          // matching the reference's JSON-read retry) retries next poll
          try {
            queryRef.set(launch())
            pendingRelaunch = false
          } catch {
            case _: Exception =>
              queryRef.set(null)
              pendingRelaunch = true
          }
        }
      }
    }, "graft-config-reload")
    thread.setDaemon(true)
    thread.start()
    new Handle(thread, stopFlag, queryRef)
  }
}

package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** Single-writer enforcement for gvdb table mutations.
  *
  * The format is single-writer by contract (SURVEY §7.4): two
  * concurrent inserts can both pass the dedup anti-join and commit
  * duplicate ids, and a rewrite racing a reader has a documented crash
  * window. This lock makes the contract FAIL-FAST instead of silently
  * corrupting: every mutation point (insert append, tombstone write,
  * CoW swap, vacuum, index build, bulk load) runs under
  * [[WriterLock.withLock]], which CAS-creates a `<root>.lock` marker —
  * `FileSystem.create(path, overwrite = false)` is the atomic
  * existence test every Hadoop FS provides — so the second concurrent
  * writer throws [[WriterLock.ConcurrentWriteException]] with the
  * holder's identity, and the table state is exactly the winner's.
  *
  * Reentrant WITHIN a thread (the merge path nests: rewrite → insert →
  * tombstone fold), keyed per table root; distinct threads or JVMs
  * contend through the marker file. A crashed holder leaves a stale
  * marker: takeover is allowed once the marker is older than
  * [[WriterLock.staleAfterMs]] (default 15 min, tunable via the
  * `spark.graft.writer.lock.staleMs` system property) — the same
  * heartbeat-free recovery rule single-writer formats use for
  * best-effort locks. Release deletes the marker in a `finally`.
  */
object WriterLock {

  final class ConcurrentWriteException(msg: String)
      extends RuntimeException(msg)

  /** How old a marker must be before a new writer may break it. */
  def staleAfterMs: Long =
    sys.props.get("spark.graft.writer.lock.staleMs").map(_.toLong)
      .getOrElse(15L * 60L * 1000L)

  private val held = new ThreadLocal[scala.collection.mutable.Map[String, Int]] {
    override def initialValue() = scala.collection.mutable.Map.empty
  }

  private def lockPath(key: String) = new Path(key + ".lock")

  /** Run `body` holding the writer lock for `root`. Reentrant within
    * the thread; throws [[ConcurrentWriteException]] when another
    * writer holds a fresh marker. The key is the QUALIFIED path
    * (scheme + authority), so nested calls that spell the same root
    * differently ("/t" vs "file:/t") still reenter instead of
    * self-conflicting. */
  def withLock[T](fs: FileSystem, root: String)(body: => T): T = {
    val key = fs.makeQualified(new Path(root)).toString
    val m = held.get()
    if (m.getOrElse(key, 0) > 0) {
      m(key) = m(key) + 1
      try body finally m(key) = m(key) - 1
    } else {
      acquire(fs, key)
      m(key) = 1
      try body finally {
        m(key) = 0
        fs.delete(lockPath(key), false)
        ()
      }
    }
  }

  private def acquire(fs: FileSystem, key: String): Unit = {
    val p = lockPath(key)
    def tryCreate(): Boolean =
      try {
        val parent = p.getParent
        if (parent != null && !fs.exists(parent)) fs.mkdirs(parent)
        val out = fs.create(p, false) // atomic: fails if the marker exists
        try out.write(
          s"""{"ts": ${System.currentTimeMillis()}, "writer": "${
            java.lang.ProcessHandle.current().pid()}@${
            java.net.InetAddress.getLocalHost.getHostName}"}"""
            .getBytes("UTF-8"))
        finally out.close()
        true
      } catch {
        case _: java.io.IOException => false // exists (or raced): contend below
      }
    if (tryCreate()) return
    // marker present: stale-break once, else fail fast with the holder
    val st = try Some(fs.getFileStatus(p)) catch {
      case _: java.io.FileNotFoundException => None // holder just released
    }
    val stale = st.exists(s =>
      System.currentTimeMillis() - s.getModificationTime > staleAfterMs)
    if (stale) {
      fs.delete(p, false) // best-effort takeover of a crashed writer
      if (tryCreate()) return
    } else if (st.isEmpty && tryCreate()) return
    val holder = try {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in).mkString finally in.close()
    } catch { case _: java.io.IOException => "<unreadable>" }
    throw new ConcurrentWriteException(
      s"gvdb: concurrent writer detected on $key — the table is " +
        s"single-writer; lock $p held by $holder (stale takeover after " +
        s"${staleAfterMs / 1000} s)")
  }
}

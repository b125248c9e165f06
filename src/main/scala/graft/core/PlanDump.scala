package graft.core

/** Conf-gated physical-plan dumper for plans that never surface as a
  * registry entry's RETURNED DataFrame — the row-level command
  * machinery (MERGE/UPDATE/upsert) runs its joins inside
  * `LeafRunnableCommand.run`, so the entry's own `.explain` shows only
  * the final census `LocalTableScan`. With
  * `spark.graft.plandump.dir=<dir>` set, each hooked command writes its
  * internal frames' `explain("formatted")` to
  * `<dir>/NNN_<tag>.txt` (NNN = a per-JVM sequence number, so the
  * order of dumps inside one entry is preserved). Unset (the default,
  * and every production/bench path) the hook is a no-op. */
object PlanDump {
  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  def dump(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
    val dir = df.sparkSession.conf.get("spark.graft.plandump.dir", "")
    if (dir.isEmpty) return
    val n = counter.incrementAndGet()
    val txt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, f"$n%03d" + "_" + tag + ".txt"), txt)
    ()
  }
}

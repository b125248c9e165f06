package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.functions.{RoundPortableExpr, VectorFunctions}

/** Table-valued functions over the `gvdb` warehouse — the SQL-native
  * query surface of the reference ("run SQL against the open database
  * file", duckvdb.py:101-116) on Spark's TVF machinery:
  *
  *  - `gvdb_scan(path)` — the merge-on-read view as a table;
  *  - `gvdb_knn(path, qvec, k)` — exact top-k cosine neighbors:
  *    distance rounded to 4 decimals (the facade's portable-rounding
  *    contract) and ordered (distance, id) so ties are deterministic.
  *
  * Builders return the LOGICAL plan of the equivalent DataFrame, so
  * SQL users get the identical physical plan as the host-language API
  * (pruned MoR scan, broadcast tombstone anti-join, TakeOrdered top-k)
  * — nothing is re-implemented for the SQL path.
  *
  * Two activation paths: session-build time via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`), or at runtime
  * on a live session via [[register]].
  */
object GvdbTableFunctions {

  def scanBuilder(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 1 || exprs.size == 2,
      s"gvdb_scan(path[, versionAsOf]) takes 1-2 arguments, got ${exprs.size}")
    var rdr = active.read.format("gvdb")
    if (exprs.size == 2) // time travel: pin the manifest snapshot
      rdr = rdr.option("versionAsOf", intArg(exprs(1), "gvdb_scan", "versionAsOf"))
    logical(rdr.load(rootArg(exprs.head, "gvdb_scan")))
  }

  def knnBuilder(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 3, s"gvdb_knn(path, qvec, k) takes 3 arguments, got ${exprs.size}")
    val path = rootArg(exprs(0), "gvdb_knn")
    val k = intArg(exprs(2), "gvdb_knn", "k")
    // the query vector stays an EXPRESSION (it may be any array-typed
    // SQL expression, not just a literal); the cast makes double
    // literals land as the table's float vectors
    val qv = GraftBridge.column(exprs(1)).cast(ArrayType(FloatType))
    logical(active.read.format("gvdb").load(path)
      .select(col("id"), col("metadata"),
        RoundPortableExpr.r(
          VectorFunctions.cosineDistance(col("embedding"), qv), 4).as("distance"))
      .orderBy(col("distance").asc, col("id").asc)
      .limit(k))
  }

  /** `gvdb_changes(path, fromVersion, toVersion)` — snapshot CDC (the
    * `table_changes` analogue): (id, change) rows with change ∈
    * {'added','deleted'}, two id-only anti-joins between the pinned
    * manifests ([[graft.table.VectorTable.diffSnapshots]]). */
  def changesBuilder(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 3,
      s"gvdb_changes(path, fromVersion, toVersion) takes 3 arguments, got ${exprs.size}")
    val path = rootArg(exprs(0), "gvdb_changes")
    val from = intArg(exprs(1), "gvdb_changes", "fromVersion")
    val to = intArg(exprs(2), "gvdb_changes", "toVersion")
    logical(new graft.table.VectorTable(active, path, 1).diffSnapshots(from, to))
  }

  /** Runtime registration on a live session (temp-function scope) —
    * the path a notebook or the Verify harness uses; the extension
    * injects the same builders at session build. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.tableFunctionRegistry
    reg.createOrReplaceTempFunction("gvdb_scan", scanBuilder, "built-in")
    reg.createOrReplaceTempFunction("gvdb_knn", knnBuilder, "built-in")
    reg.createOrReplaceTempFunction("gvdb_changes", changesBuilder, "built-in")
  }

  /** TVF builders run during analysis of a live query — the active
    * session is the one analyzing. */
  private def active: SparkSession = SparkSession.active

  private def logical(df: DataFrame): LogicalPlan = df.queryExecution.logical

  /** The table argument: a filesystem path, or — when it carries no
    * path separator and its first dot-part names a registered catalog
    * — a catalog table name (`cat.ns.table`), resolved to the gvdb
    * data root the name points at. Catalog users get the TVFs on the
    * same names their DDL created (GvdbCatalogSpec). */
  private def rootArg(e: Expression, fn: String): String = {
    val raw = stringArg(e, fn, "path")
    if (raw.contains("/") || raw.contains(java.io.File.separator)) raw
    else {
      val parts = raw.split("\\.").toSeq
      if (parts.length < 2) raw
      else scala.util.Try {
        val cat = active.sessionState.catalogManager.catalog(parts.head)
        cat.asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
          .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
            parts.tail.init.toArray, parts.last))
          .asInstanceOf[graft.sources.GvdbTable].dataRoot
      }.getOrElse(raw) // not a known catalog name: treat as a path
    }
  }

  private def stringArg(e: Expression, fn: String, name: String): String = {
    require(e.foldable, s"$fn: '$name' must be a literal string")
    String.valueOf(e.eval(null))
  }

  private def intArg(e: Expression, fn: String, name: String): Int = {
    require(e.foldable, s"$fn: '$name' must be a literal integer")
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"$fn: '$name' = $other is not an integer")
    }
  }
}

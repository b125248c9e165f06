package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Materialized JSON-path extract columns — the storage-layout answer
  * to the format's one 100 TB read gap: `metadata` is an opaque string
  * (the reference contract), so a JSON-path predicate can never prune
  * parquet storage by itself. Opting a table in with the write option
  * `extractPaths=$.lang,$.source` materializes each path as a REAL
  * string column (`__x_lang`, ...) in every part file, recomputed by
  * every write/rewrite site from `get_json_object(metadata, path)` —
  * the columns are derived state, so they can never drift from the
  * metadata they index. The read side
  * ([[graft.plans.GvdbJsonFilterRule]]) maps `get_json_object`
  * predicates onto them: footer min/max prunes FILES at plan time, the
  * inner parquet scan's pushed filter prunes row groups, and the
  * contract schema (`id, metadata, embedding`) never changes — the
  * extract columns are as invisible to readers as the ANN bucket
  * column.
  *
  * `clusterByExtracts=true` additionally hash-repartitions each insert
  * batch by the extract columns before writing, so a part file carries
  * few distinct values and the footer ranges actually PRUNE (an
  * id-shuffled layout spreads every value across every file). That is
  * the layout choice a 100 TB corpus filtered by `lang='fr'` wants —
  * the same reasoning as Delta/Iceberg partitioning or Z-ordering on
  * the filter column.
  *
  * Sidecar `<root>.extracts` (JSON): `{"cluster": bool, "paths":
  * [...]}` — path order defines column names; written before the first
  * insert under the option, honored by every later write. Opting IN an
  * existing non-empty table is rejected (old files would read the
  * column as NULL and a mapped filter would silently drop their rows);
  * re-create or overwrite to adopt. */
object GvdbExtracts {

  case class Spec(paths: Seq[String], cluster: Boolean) {
    def colNames: Seq[String] = paths.map(colName)
    def isEmpty: Boolean = paths.isEmpty
  }

  val Empty: Spec = Spec(Seq.empty, cluster = false)

  /** `$.a.b` → `__x_a_b` (stable, readable, collision-safe enough for
    * human-chosen paths; a collision is rejected at set time). */
  def colName(path: String): String =
    "__x_" + path.stripPrefix("$").stripPrefix(".")
      .replaceAll("[^A-Za-z0-9]+", "_").stripSuffix("_")

  private def sidecar(root: String) = new Path(root + ".extracts")

  def spec(fs: FileSystem, root: String): Spec = {
    val p = sidecar(root)
    if (!fs.exists(p)) Empty
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
      val cluster = """"cluster"\s*:\s*true""".r.findFirstIn(txt).isDefined
      Spec(graft.core.JsonFileList.parse(txt), cluster)
    }
  }

  def write(fs: FileSystem, root: String, s: Spec): Unit = {
    require(s.paths.nonEmpty, "extractPaths: at least one JSON path")
    require(s.colNames.distinct.size == s.paths.size,
      s"extractPaths collide after name-mangling: ${s.paths.mkString(", ")}")
    val out = fs.create(sidecar(root), true)
    val files = graft.core.JsonFileList.render(s.paths)
    try out.write(
      s"""{"cluster": ${s.cluster}, ${files.stripPrefix("{")}""".getBytes("UTF-8"))
    finally out.close()
  }

  def drop(fs: FileSystem, root: String): Unit = {
    fs.delete(sidecar(root), false)
    ()
  }

  /** The pinned read schema extended with the extract columns. */
  def extendSchema(base: StructType, s: Spec): StructType =
    if (s.isEmpty) base
    else StructType(base.fields ++ s.colNames.map(StructField(_, StringType, nullable = true)))

  /** Recompute the extract columns onto a frame about to be written
    * (idempotent: pre-existing extract columns are replaced). With
    * `cluster`, hash-repartition by them so files hold few values. */
  def withColumns(df: DataFrame, s: Spec): DataFrame =
    if (s.isEmpty) df
    else {
      val added = s.paths.zip(s.colNames).foldLeft(df) { case (d, (path, c)) =>
        d.withColumn(c, get_json_object(col(graft.core.VectorSchema.METADATA), path))
      }
      // RANGE partitioning, not hash: each output file covers a
      // CONTIGUOUS value range, which is exactly what footer min/max
      // pruning wants (hash also collides low-cardinality values into
      // one partition), and within-file row groups stay value-runs.
      // The partition count is pinned EXPLICITLY: an unnumbered
      // repartition is fair game for AQE coalescing, which at small
      // batch sizes folds the clustering back into one file.
      if (s.cluster)
        added.repartitionByRange(
          df.sparkSession.sessionState.conf.numShufflePartitions,
          s.colNames.map(col(_).asc_nulls_first): _*)
      else added
    }
}

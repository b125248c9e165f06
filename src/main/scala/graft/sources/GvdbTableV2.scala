package graft.sources

import java.util.OptionalLong

import org.apache.spark.{Partition, TaskContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{Filter, InsertableRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.VectorSchema
import graft.table.VectorTable

/** DataSource V2 surface of the `gvdb` format (the batch half; streaming
  * read/write stay on the V1 `Source`/`Sink` in [[DefaultSource]] — the
  * engine falls back to them because this table deliberately does not
  * advertise `MICRO_BATCH_READ`/`STREAMING_WRITE`).
  *
  * Why V2 for batch: the V1 `PrunedFilteredScan.buildScan → .rdd` path
  * converted every row to external types (`Row` with Scala strings and
  * Seqs) and back — a per-row tax on every `format("gvdb")` consumer —
  * and its conservative `unhandledFilters = filters` contract made
  * Spark re-evaluate every pushed predicate above the scan. Here:
  *
  *  - [[GvdbBatchScan]] reports pushed filters as HANDLED (they are
  *    genuinely evaluated, by codegen, inside the scan) and streams
  *    `InternalRow`s straight through — zero conversions;
  *  - column pruning and predicate pushdown reach the parquet reader
  *    exactly as before (the scan plans a native parquet read
  *    underneath), and the plan shows as `BatchScan` with
  *    `PushedFilters`/`ReadSchema` in `description()`;
  *  - writes go through [[GvdbWriteBuilder]] → [[V1Write]], so SQL
  *    `INSERT INTO` (temp views, catalog tables) routes into the same
  *    dedup anti-join as the host-language facade. The table
  *    advertises `V1_BATCH_WRITE` but NOT `BATCH_WRITE`: the analyzer
  *    accepts either for `AppendData`, while `DataFrameWriter.save`
  *    checks `BATCH_WRITE` strictly and therefore keeps routing
  *    path-based writes through the V1 `CreatableRelationProvider` —
  *    preserving all four `SaveMode` semantics (V2 save() supports
  *    only Append/Overwrite and throws on ErrorIfExists/Ignore).
  *
  * Semantics (merge-on-read tombstones, `versionAsOf` time travel,
  * dedup-on-insert) are identical to the V1 relation — both delegate
  * to [[VectorTable]].
  */
class GvdbTable(spark: SparkSession, root: String, dimOpt: Option[Int],
    versionAsOf: Option[Int]) extends Table with SupportsRead with SupportsWrite {

  /** The table root, exposed for the ANN planner rewrite
    * ([[graft.plans.AnnRewriteRule]]): a bare scan of a LIVE gvdb table
    * is index-consultable like a bare parquet scan of the same root; a
    * version-pinned snapshot is not (the persisted index tracks the
    * live table, not the snapshot). */
  private[graft] def indexableRoot: Option[String] =
    if (versionAsOf.isEmpty) Some(root) else None

  override def name(): String =
    versionAsOf.fold(s"gvdb:$root")(v => s"gvdb:$root@v$v")

  /** The LOGICAL schema — internal sidecar columns (the persisted LSH
    * bucket column) never leak through the format surface. */
  override def schema(): StructType = VectorSchema.schema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE,
      // writes shape/validate the incoming columns themselves
      // (GvdbWrite.shape: match by name, cast to contract types), so
      // the analyzer's by-name output resolution is skipped
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    if (!new VectorTable(spark, root, 1).exists)
      throw new AnalysisException(
        errorClass = "PATH_NOT_FOUND", messageParameters = Map("path" -> root))
    new GvdbScanBuilder(spark, root, dimOpt, versionAsOf)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(versionAsOf.isEmpty,
      s"gvdb: cannot write to a versionAsOf=$versionAsOf snapshot (read-only history)")
    new GvdbWriteBuilder(spark, root, dimOpt)
  }
}

/** Pushdown negotiation: accepts every filter [[GvdbFilters]] can
  * translate (reported handled — the scan evaluates them), leaves the
  * rest (JSON-path probes, UDF predicates) to Spark above the scan. */
class GvdbScanBuilder(spark: SparkSession, root: String, dimOpt: Option[Int],
    versionAsOf: Option[Int]) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = VectorSchema.schema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(f => GvdbFilters.toColumn(f).isDefined)
    pushed = ok
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GvdbBatchScan(spark, root, dimOpt, versionAsOf, required, pushed)
}

/** The merge-on-read view as a V2 batch scan.
  *
  * Execution: the scan plans the MoR view as an internal Spark plan —
  * vectorized parquet scan of exactly the pruned columns, the handled
  * filters compiled into whole-stage codegen, the broadcast tombstone
  * anti-join (or the pinned `versionAsOf` manifest) — and exposes that
  * plan's partitions as [[InputPartition]]s. Each reader streams the
  * inner partition's `InternalRow`s straight through: no external-row
  * conversion anywhere (the V1 tax this migration removes), one
  * evaluation per pushed predicate, and the inner parquet scan keeps
  * its min/max row-group skipping. The inner plan is shuffle-free by
  * construction (scan → filter → project → broadcast anti-join), so
  * its partitions compute independently inside the host task — the
  * broadcast build side is materialized once, driver-side, when the
  * partitions are planned.
  */
class GvdbBatchScan(spark: SparkSession, root: String, dimOpt: Option[Int],
    versionAsOf: Option[Int], required: StructType, pushed: Array[Filter])
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required

  override def description(): String =
    s"gvdb $root${versionAsOf.fold("")(v => s"@v$v")} " +
      s"PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  override def toBatch: Batch = this

  // row-based passthrough; answered WITHOUT building the reader factory
  // so a plain .explain never plans (or runs broadcast jobs for) the
  // inner view
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    Scan.ColumnarSupportMode.UNSUPPORTED

  /** The inner MoR plan's RDD — built once, lazily, at execution time. */
  @transient private lazy val innerRdd: RDD[InternalRow] = {
    val table = new VectorTable(spark, root, dimOpt.getOrElse(1))
    val view = versionAsOf.map(table.asOf).getOrElse(table.df)
    val base = view.select(VectorSchema.schema.fieldNames.map(col).toIndexedSeq: _*)
    val filtered = pushed.foldLeft(base) { (d, f) => d.where(GvdbFilters.toColumn(f).get) }
    // empty required set (count(*) plans) is a valid zero-column Project
    filtered.select(required.fieldNames.map(col).toIndexedSeq: _*)
      .queryExecution.toRdd
  }

  override def planInputPartitions(): Array[InputPartition] =
    innerRdd.partitions.map(p =>
      GvdbInputPartition(p, innerRdd.preferredLocations(p).toArray))

  override def createReaderFactory(): PartitionReaderFactory =
    new GvdbReaderFactory(innerRdd)

  /** Real size statistics (summed part-file lengths) instead of the
    * "never broadcast" default — lets Catalyst broadcast a small
    * warehouse in the dim-enrichment join shape. One FS listing at
    * plan time; tombstones only shrink the live set, so this is a safe
    * over-estimate. */
  override def estimateStatistics(): Statistics = new Statistics {
    override val sizeInBytes: OptionalLong = {
      val p = new org.apache.hadoop.fs.Path(root)
      val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!hfs.exists(p)) OptionalLong.of(0L)
      else OptionalLong.of(
        hfs.listStatus(p).filter(_.getPath.getName.startsWith("part-")).map(_.getLen).sum)
    }
    override val numRows: OptionalLong = OptionalLong.empty()
  }
}

/** One inner-plan partition plus its locality hints (computed on the
  * driver at planning time — `preferredLocations` needs the driver's
  * block/file metadata). */
case class GvdbInputPartition(split: Partition, locations: Array[String])
    extends InputPartition {
  override def preferredLocations(): Array[String] = locations
}

/** Executor-side bridge: iterates the wrapped inner-plan partition
  * under the host task's context (so memory accounting, interruption
  * and metrics attribute to the consuming task). The rows are the
  * inner codegen's output buffers — the standard reused-row scan
  * contract every Spark source follows (buffering consumers copy). */
class GvdbReaderFactory(rdd: RDD[InternalRow]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val it = rdd.iterator(
      partition.asInstanceOf[GvdbInputPartition].split, TaskContext.get())
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { row = it.next(); true } else false
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

/** SQL write path (`INSERT INTO` a `USING gvdb` temp view or a
  * gvdb-catalog table): `AppendData` → [[V1Write]] → the dedup insert,
  * `OverwriteByExpression(true)` (SaveMode.Overwrite / INSERT
  * OVERWRITE) → truncate-and-insert — the same two shapes as the V1
  * batch writer, so every write surface keeps the reference's
  * ON-CONFLICT-DO-NOTHING contract (duckvdb.py:56-61). */
class GvdbWriteBuilder(spark: SparkSession, root: String, dimOpt: Option[Int])
    extends WriteBuilder with SupportsTruncate {

  private var overwrite = false

  override def truncate(): WriteBuilder = { overwrite = true; this }

  override def build(): V1Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwriteIgnored: Boolean): Unit =
          GvdbWrite.insert(spark, root, data, overwrite, dimOpt)
      }
  }
}

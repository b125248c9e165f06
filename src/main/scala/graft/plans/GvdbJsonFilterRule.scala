package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.core.VectorSchema
import graft.sources.{GvdbBatchScan, GvdbExtracts, GvdbPruneConstraint}

/** File-skipping for JSON-path predicates over gvdb scans — the read
  * half of the materialized-extract-column design
  * ([[graft.sources.GvdbExtracts]]).
  *
  * `metadata` is an opaque string by contract, so
  * `get_json_object(metadata, '$.lang') = 'fr'` is untranslatable to
  * the source-filter algebra and evaluates ABOVE the scan — at 100 TB
  * the flagship filtered query reads the whole corpus. When the table
  * carries materialized extract columns, this rule rewrites each
  * conjunct that probes an extracted path to reference the STORED
  * column instead, and moves the whole conjunct INTO the scan. It
  * runs as a PHYSICAL rule in the columnar pre-transition slot
  * (`injectColumnar` — part of every plan's preparations AND of AQE's
  * stage preparation; the postPlannerStrategy slot only fires under
  * AQE): the logical optimizer offers no slot after
  * `V2ScanRelationPushDown` (the "Pre CBO" batch runs BEFORE early
  * scan pushdown in this Spark), while in the physical plan the
  * residual `FilterExec` sits directly on the `BatchScanExec`, and
  * whole-stage codegen collapse runs after the columnar rules — the
  * rewritten scan is prepared like any other:
  *
  *  - plan time: per-file footer min/max on the extract column prunes
  *    the FILE LIST ([[graft.sources.GvdbFooters.pruneFiles]] — simple
  *    `=`/`in`/range shapes);
  *  - execution: the mapped conjunct lands as a plain column predicate
  *    on the inner parquet scan, so parquet row-group stats and page
  *    indexes skip within the surviving files;
  *  - semantics: the stored column is recomputed from `metadata` by
  *    every write site, so substitution is an identity — the moved
  *    conjunct is evaluated EXACTLY (not merely implied) inside the
  *    scan and dropped from the outer Filter.
  *
  * Conjuncts with subqueries, non-deterministic parts, or paths the
  * table did not extract stay above the scan untouched. Version-pinned
  * scans, the change feed, and pushed COUNT(*) are never mapped
  * ([[GvdbBatchScan.canMapJsonFilters]]). */
class GvdbJsonFilterRule(spark: SparkSession) extends Rule[SparkPlan]
    with PredicateHelper {

  override def apply(plan: SparkPlan): SparkPlan = plan.transformUp {
    case f @ FilterExec(cond, b: BatchScanExec)
        if b.scan.isInstanceOf[GvdbBatchScan] &&
          b.scan.asInstanceOf[GvdbBatchScan].canMapJsonFilters =>
      val scan = b.scan.asInstanceOf[GvdbBatchScan]
      val spec = specOf(scan)
      val (mapped, kept) = splitConjunctivePredicates(cond)
        .partitionMap(c => mapConjunct(c, spec).toLeft(c))
      if (mapped.isEmpty) f
      else {
        val newScan = scan.withJsonFilters(mapped.map(_._1), mapped.flatMap(_._2))
        val newChild = b.copy(scan = newScan)
        kept.reduceOption(And).map(FilterExec(_, newChild)).getOrElse(newChild)
      }
  }

  private def specOf(scan: GvdbBatchScan): GvdbExtracts.Spec = {
    val root = scan.tableRoot
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    GvdbExtracts.spec(fs, root)
  }

  /** Map one conjunct: substitute every `get_json_object(metadata,
    * <extracted path>)` with the stored column, rewrite all attribute
    * references to plain names (the scan resolves them against its own
    * inner plan), and derive file-prune constraints from the simple
    * comparison shapes. None when the conjunct probes no extracted
    * path or cannot move (subquery / non-deterministic). */
  private def mapConjunct(c: Expression, spec: GvdbExtracts.Spec)
      : Option[(Expression, Seq[GvdbPruneConstraint])] = {
    if (!c.deterministic || c.exists(_.isInstanceOf[PlanExpression[_]])) return None
    var hit = false
    val substituted = c.transformUp {
      case GetJsonObject(a: AttributeReference, Literal(p: UTF8String, StringType))
          if a.name == VectorSchema.METADATA && spec.paths.contains(p.toString) =>
        hit = true
        UnresolvedAttribute(GvdbExtracts.colName(p.toString))
    }
    if (!hit) None
    else {
      val named = substituted.transformUp {
        case a: AttributeReference => UnresolvedAttribute(a.name)
      }
      Some((named, constraintsOf(named, spec)))
    }
  }

  /** Simple footer-prunable shapes inside a mapped conjunct. Only a
    * conjunct that IS one of these shapes prunes files (a disjunction
    * or surrounding cast must not — its truth is not implied by the
    * extract column's range alone); everything else still row-filters
    * exactly inside the scan. */
  private def constraintsOf(e: Expression, spec: GvdbExtracts.Spec)
      : Seq[GvdbPruneConstraint] = {
    def xcol(x: Expression): Option[String] = x match {
      case u: UnresolvedAttribute if spec.colNames.contains(u.name) => Some(u.name)
      case _ => None
    }
    def lit(x: Expression): Option[String] = x match {
      case Literal(v: UTF8String, StringType) => Some(v.toString)
      case _ => None
    }
    def flip(op: String): String = op match {
      case "<" => ">"; case "<=" => ">="; case ">" => "<"; case ">=" => "<="
      case other => other
    }
    def cmp(op: String, l: Expression, r: Expression): Seq[GvdbPruneConstraint] =
      (xcol(l), lit(r), xcol(r), lit(l)) match {
        case (Some(cn), Some(v), _, _) => Seq(GvdbPruneConstraint(cn, op, Seq(v)))
        case (_, _, Some(cn), Some(v)) => Seq(GvdbPruneConstraint(cn, flip(op), Seq(v)))
        case _ => Seq.empty
      }
    e match {
      case EqualTo(l, r) => cmp("=", l, r)
      case LessThan(l, r) => cmp("<", l, r)
      case LessThanOrEqual(l, r) => cmp("<=", l, r)
      case GreaterThan(l, r) => cmp(">", l, r)
      case GreaterThanOrEqual(l, r) => cmp(">=", l, r)
      case In(x, vs) if xcol(x).isDefined && vs.forall(lit(_).isDefined) =>
        Seq(GvdbPruneConstraint(xcol(x).get, "in", vs.flatMap(lit)))
      case _ => Seq.empty
    }
  }
}

package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}

import graft.functions.{CosineDistance, LshBucketsExpr}

/** Opt-in optimizer rule (SURVEY.md §4 stretch goal): rewrites a
  * brute-force cosine top-k plan —
  *
  * {{{ Limit(k, Sort(distance ASC, ..., Project(..., cosine_distance(emb, <literal qvec>) AS distance, child))) }}}
  *
  * — into the same plan with an LSH bucket prefilter pushed below the
  * distance projection: only rows whose sign-random-projection buckets
  * collide with the query vector's buckets (in any hash table) are
  * scored. This is the index-probe analogue of the reference's HNSW
  * path (duckvdb.py:37-45): approximate (recall < 1 possible), so it is
  * OFF by default and enabled per session:
  *
  *   - `spark.graft.ann.autoRewrite=true` to enable,
  *   - `spark.graft.ann.tables` / `spark.graft.ann.bits` /
  *     `spark.graft.ann.seed` to tune the index.
  *
  * At scale the win is the scored-row count: with B bits per table the
  * prefilter keeps ~tables/2^B of the corpus, turning a full-scan
  * distance pass into a bucket-selective one while the Parquet scan
  * stays partition-parallel.
  */
class AnnRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def conf(key: String, default: String): String =
    spark.sessionState.conf.getConfString(key, default)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf("spark.graft.ann.autoRewrite", "false").toBoolean) return plan
    plan.transformDown {
      case limit @ GlobalLimit(_, LocalLimit(_,
          sort @ Sort(SortOrder(distAttr: Attribute, Ascending, _, _) +: _, true, sortChild, _))) =>
        var done = false
        val newChild = sortChild.transformDown {
          case p @ Project(projList, pchild) if !done && definesCosineDistance(projList, distAttr).isDefined =>
            val (embAttr, qvec) = definesCosineDistance(projList, distAttr).get
            done = true
            pchild match {
              // idempotence: the optimizer batch runs rules to fixpoint —
              // if the bucket prefilter is already in place, leave the
              // plan unchanged instead of stacking another copy per
              // iteration (100 redundant overlap tests/row + a spurious
              // max-iterations warning)
              case Filter(cond, _) if cond.exists(_.isInstanceOf[ArraysOverlap]) => p
              case _ => Project(projList, Filter(bucketPredicate(embAttr, qvec, pchild), pchild))
            }
        }
        if (done) GlobalLimit(limit.limitExpr,
          LocalLimit(limit.limitExpr, sort.copy(child = newChild)))
        else limit
    }
  }

  /** projList entry `Alias(CosineDistance(attr, Literal), name)` whose
    * exprId matches the sort attribute. A monotonic rounding wrapper
    * (`round_portable`, used by every oracle-compared query) is looked
    * through: rank order under round(d) is compatible with rank order
    * under d, so the bucket prefilter stays valid. */
  private def definesCosineDistance(
      projList: Seq[NamedExpression], distAttr: Attribute): Option[(Attribute, ArrayData)] =
    projList.collectFirst {
      case a @ Alias(CosineDistance(emb: Attribute, Literal(q: ArrayData, ArrayType(FloatType, _))), _)
          if a.exprId == distAttr.exprId => (emb, q)
      case a @ Alias(graft.functions.RoundPortableExpr(
            CosineDistance(emb: Attribute, Literal(q: ArrayData, ArrayType(FloatType, _))), _), _)
          if a.exprId == distAttr.exprId => (emb, q)
    }

  private def bucketPredicate(embAttr: Attribute, qvec: ArrayData, pchild: LogicalPlan): Expression = {
    val dim = qvec.numElements()
    val tables = conf("spark.graft.ann.tables", "8").toInt
    val bits = conf("spark.graft.ann.bits", "12").toInt
    val seed = conf("spark.graft.ann.seed", "42").toLong
    // Prefer the PERSISTED index column (VectorTable.buildAnnIndex, the
    // reference's index-on-bulk-load): filtering on stored buckets costs
    // one array-overlap per row; recomputing lsh_buckets inline costs
    // tables × bits projections per row — more than the distance it
    // avoids. Inline compute remains the un-indexed fallback.
    val stored = pchild.output.find(a =>
      a.name == graft.core.VectorSchema.ANN_BUCKETS &&
        a.dataType.isInstanceOf[ArrayType] &&
        a.dataType.asInstanceOf[ArrayType].elementType == LongType)
    val bucketsExpr = stored.getOrElse(LshBucketsExpr(embAttr, dim, tables, bits, seed))
    // query buckets computed once here on the driver, shipped as a literal
    val qBuckets = LshBucketsExpr(Literal(qvec, ArrayType(FloatType)), dim, tables, bits, seed)
      .eval(null).asInstanceOf[ArrayData]
    ArraysOverlap(bucketsExpr, Literal(qBuckets.copy(), ArrayType(LongType, containsNull = false)))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.RoundPortableExpr

/** Approximate containment-similarity join over KMV sketches
  * (cf. GB-KMV, ICDE 2019): find candidate sets S with
  * |Q ∩ S| / |Q| ≳ threshold for each query set Q, touching only the
  * k-long sketches — never the full sets.
  *
  * Why this matters at 100 TB: the exact containment join must move
  * full shingle sets (unbounded rows); here the corpus is sketched
  * ONCE (bounded k longs + one exact size per document), the sketch
  * table is tiny enough to broadcast or co-partition, and the pair
  * computation is pure integer array math inside codegen.
  *
  * Estimator (Beyer et al. / GB-KMV): with k-min sketches K(A), K(B),
  * let U = k smallest of K(A) ∪ K(B). U is a k-min sketch of A ∪ B, so
  *   |A∪B| ≈ (k−1)·2^60 / max(U)      (exact = |U| when |U| < k)
  *   J(A,B) ≈ |U ∩ K(A) ∩ K(B)| / |U|
  *   |A∩B| ≈ J · |A∪B|,  containment = |A∩B| / |A|.
  * Everything is integer until the final divisions — deterministic and
  * engine-portable.
  */
object Containment {

  /** Containment estimate column from two sketch arrays + the exact
    * distinct-size of the left (query) set. `k` must match the sketch
    * build parameter. */
  def containmentEst(aSketch: Column, bSketch: Column, aSize: Column, k: Int): Column = {
    val u = slice(array_sort(array_union(aSketch, bSketch)), 1, k)
    val m = size(u)
    val interK = size(array_intersect(array_intersect(u, aSketch), bSketch))
    val unionEst = when(m < k, m.cast("double"))
      .otherwise(lit((k - 1).toDouble * graft.functions.KmvSketch.HashSpace) /
        element_at(u, m).cast("double"))
    val jac = interK.cast("double") / m.cast("double")
    jac * unionEst / aSize.cast("double")
  }

  /** Sketch+join: queries × candidates (queries broadcast), estimated
    * containment of each query's shingle set in nothing — rather, of
    * the query set WITHIN each candidate pairing: C(Q→S) = |Q∩S|/|Q|.
    * Input frames carry (idCol, sketchCol array<long>, sizeCol). */
  def containmentJoin(queries: DataFrame, candidates: DataFrame, k: Int,
      threshold: Double, idCol: String = "doc_id"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col("sketch").as("q_sk"),
      col("set_size").as("q_sz"))
    val c = candidates.select(col(idCol).as("cand_id"), col("sketch").as("c_sk"))
    c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        RoundPortableExpr.r(containmentEst(col("q_sk"), col("c_sk"), col("q_sz"), k), 4)
          .as("containment"))
      .where(col("containment") >= threshold)
  }

  /** Per-document KMV sketch + exact distinct size of the word-n-gram
    * shingle set, via explode + the KmvSketch Aggregator (kernel
    * shingling, builtin md5 hashing — no interpreted lambdas). */
  def sketchDocs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    val sh = docs.select(col(idCol),
      graft.functions.TextExprs.shingles(col(textCol), n).as("sh"))
      .where(size(col("sh")) > 0)
    sh.select(col(idCol), size(col("sh")).as("set_size"), explode(col("sh")).as("s"))
      .select(col(idCol), col("set_size"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("h"))
      .groupBy(col(idCol), col("set_size"))
      .agg(graft.functions.KmvSketch.sketch(col("h"), k).as("sketch"))
  }
}

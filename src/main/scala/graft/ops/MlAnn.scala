package graft.ops

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, MinHashLSH}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MLlib-backed batch ANN and near-dup — the "MLlib for batch embedding
  * + approximate nearest neighbor" path from BASELINE.json / SURVEY.md
  * §2.9 X1, complementing the hand-rolled LSH in [[Similarity]] and
  * [[Dedup]] (which are oracle-checkable; these use MLlib's fitted
  * models: seeded → deterministic per Spark version, rows-only checks).
  *
  * Cosine ∝ Euclidean on the unit sphere, so BucketedRandomProjectionLSH
  * over L2-normalized vectors is a cosine ANN index: `fit` = batch index
  * build (the analogue of the reference's HNSW build on bulk load,
  * duckvdb.py:37-45), `approxSimilarityJoin` = index probe.
  */
object MlAnn {

  private def toMlVec = udf { (arr: Seq[Float]) =>
    val n = math.sqrt(arr.map(x => x.toDouble * x).sum)
    val inv = if (n == 0.0) 0.0 else 1.0 / n
    Vectors.dense(arr.map(_.toDouble * inv).toArray)
  }

  /** Normalized MLlib feature column from an Array[Float] embedding. */
  def withNormalizedFeatures(df: DataFrame, embCol: String = "embedding"): DataFrame =
    df.withColumn("features", toMlVec(col(embCol)))

  /** Approximate cosine top-k via BucketedRandomProjectionLSH:
    * index-build on candidates, similarity join, per-query rank. */
  def brpTopK(
      queries: DataFrame, candidates: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      bucketLength: Double = 0.5, numHashTables: Int = 4, seed: Long = 42L): DataFrame = {
    val cand = withNormalizedFeatures(candidates, embCol)
    val qs = withNormalizedFeatures(queries, embCol)
    val model = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(seed)
      .fit(cand)
    // Threshold 1.4 ≈ cosine distance 0.98: on the unit sphere the max
    // euclidean distance is 2.0, so 2.0 would keep EVERY bucket-collided
    // pair; 1.4 prunes the far pairs before the per-query ranking while
    // keeping anything that could plausibly be a neighbor.
    val joined = model.approxSimilarityJoin(qs, cand, 1.4, "euclid_dist")
      .select(col(s"datasetA.$idCol").as("query_id"),
        col(s"datasetB.$idCol").as("neighbor_id"),
        // ||a-b||² = 2(1-cos) on unit vectors → cosine distance = d²/2
        graft.functions.RoundPortableExpr.r(col("euclid_dist") * col("euclid_dist") / 2.0, 4).as("distance"))
      .where(col("query_id") =!= col("neighbor_id"))
    val w = Window.partitionBy("query_id").orderBy(col("distance").asc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w)).where(col("rank") <= k).drop("rank")
  }

  /** IVF-Flat approximate cosine top-k: an MLlib KMeans coarse
    * quantizer partitions the corpus into `nCells` Voronoi cells
    * (= the inverted-file index build); each query probes only its
    * `nProbe` nearest centroids and brute-forces within those cells.
    *
    * Scale shape: the centroid set (nCells × dim doubles) broadcasts to
    * every executor, cell assignment is a map-side pass, and the
    * probe is an equi-join on `cell` — candidates shuffle once, keyed
    * by cell, so a 1000-executor cluster searches nProbe/nCells of the
    * corpus per query instead of all of it. Recall is tunable via
    * nProbe (nProbe = nCells degenerates to exact brute force). */
  def ivfTopK(
      queries: DataFrame, candidates: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      nCells: Int = 16, nProbe: Int = 2, seed: Long = 42L): DataFrame =
    ivfProbe(ivfBuild(candidates, idCol, embCol, nCells, seed), queries, k, nProbe)

  /** A built inverted-file index: the fitted coarse quantizer plus the
    * cell-assigned corpus (neighbor_id, c_emb, cell). `idCol`/`embCol`
    * name the columns new batches must carry. */
  case class IvfIndex(
      model: org.apache.spark.ml.clustering.KMeansModel,
      indexed: DataFrame, idCol: String, embCol: String,
      keepCols: Seq[String] = Nil)

  /** IVF index build: fit the KMeans coarse quantizer and cell-assign
    * the corpus. Quantizer fit reads the features column only
    * (column-pruned scan) with few iterations — IVF recall depends on
    * nProbe, not a fully converged codebook; at cluster scale you'd fit
    * on a sample. */
  def ivfBuild(
      candidates: DataFrame, idCol: String = "vec_id", embCol: String = "embedding",
      nCells: Int = 16, seed: Long = 42L, keepCols: Seq[String] = Nil): IvfIndex = {
    val cand = withNormalizedFeatures(candidates, embCol)
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(nCells).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(cand.select("features"))
    IvfIndex(model, assign(model, cand, idCol, embCol, keepCols), idCol, embCol, keepCols)
  }

  /** Incremental index maintenance: cell-assign a delta batch against
    * the EXISTING quantizer — a map-side transform over broadcast
    * centroids, no refit, no shuffle of the already-indexed corpus —
    * and union it in. Appending a batch to a 100 TB index costs
    * O(|delta|); the trade is quantizer staleness (centroids drift from
    * the true distribution as deltas accumulate — rebuild on a cadence,
    * exactly like IVF segment merges in production vector stores). */
  def ivfAppend(index: IvfIndex, delta: DataFrame): IvfIndex =
    index.copy(indexed = index.indexed.unionByName(
      assign(index.model, withNormalizedFeatures(delta, index.embCol),
        index.idCol, index.embCol, index.keepCols)))

  private def assign(model: org.apache.spark.ml.clustering.KMeansModel,
      featured: DataFrame, idCol: String, embCol: String,
      keepCols: Seq[String] = Nil): DataFrame =
    model.transform(featured)
      .select(col(idCol).as("neighbor_id") +: col(embCol).as("c_emb") +: col("cell") +:
        keepCols.map(col): _*)

  /** FILTERED index probe — metadata-constrained vector search, the
    * production feature every vector store exposes ("WHERE label = …
    * ORDER BY distance LIMIT k"): the predicate is applied to the
    * cell-assigned corpus BEFORE the probe join, so it prunes rows at
    * the index scan (pre-filtering, in vector-store terms), not after
    * the top-k (post-filtering, which silently returns < k rows at low
    * selectivity). Candidates per query stay ≤ (nProbe/nCells) ·
    * selectivity · corpus; recall is gated against the FILTERED exact
    * ground truth. The predicate can reference any `keepCols` column
    * carried into the index at build time. */
  def ivfProbeFiltered(index: IvfIndex, queries: DataFrame, k: Int, nProbe: Int,
      pred: Column): DataFrame =
    ivfProbe(index.copy(indexed = index.indexed.where(pred)), queries, k, nProbe)

  /** [[ivfProbeFiltered]] with the nProbe COMPENSATION DERIVED from the
    * index's own cell-level stats instead of hand-tuned per predicate.
    * Two signals, both from one tiny per-cell count on the filtered
    * assignment table (O(matched), map-side aggregated, shared with the
    * probe join via persist):
    *
    *   - DENSITY: holding the expected candidate count at
    *     `oversample · k` needs ceil(oversample · k / (matched/nCells))
    *     probed cells — the thinner the filter, the wider the probe.
    *   - CONCENTRATION: when the matches live in only c* of the nCells
    *     (a predicate correlated with the embedding clusters — the
    *     common case for label-like metadata), a query's nearest cells
    *     are mostly matchless, so the probe widens by nCells/c* to keep
    *     the expected number of MATCHING cells probed at `baseNProbe`.
    *
    * The result is floored at `baseNProbe` (a loose predicate must not
    * make search smaller than the unfiltered-tuned width) and capped at
    * nCells — a very selective predicate degenerates to exact search
    * over the few survivors, which is both correct and cheap (the scan
    * is the filtered table, already selectivity-sized). */
  def ivfProbeFilteredAdaptive(index: IvfIndex, queries: DataFrame, k: Int,
      baseNProbe: Int, pred: Column, oversample: Int = 4): DataFrame = {
    val filtered = graft.core.PlanCache.persist(index.indexed.where(pred))
    val nCells = index.model.clusterCenters.length
    val cellStats = filtered.groupBy(col("cell")).agg(count(lit(1)).as("n")).collect()
    val matched = cellStats.map(_.getLong(1)).sum
    val matchingCells = math.max(cellStats.length, 1)
    val nProbe =
      if (matched == 0L) nCells
      else math.min(nCells, Seq(
        baseNProbe,
        math.ceil(oversample.toDouble * k * nCells / matched).toInt,
        math.ceil(baseNProbe.toDouble * nCells / matchingCells).toInt).max)
    ivfProbe(index.copy(indexed = filtered), queries, k, nProbe)
  }

  /** Probe width derived from the indexed corpus size instead of
    * hand-tuned (pure decision function, unit-testable):
    *
    *   - below `exactFloor` rows the probe widens to ALL cells. IVF
    *     cell routing is noise-bound on small corpora — when per-cell
    *     occupancy is within an order of magnitude of k, the true
    *     top-k scatters across cells and a partial probe caps recall
    *     (measured 0.64 at nProbe 8/16 on a 500-vector corpus) —
    *     which is why production stores brute-force small segments.
    *   - above it, a DENSITY floor keeps expected candidates at
    *     oversample·k: ceil(oversample·k·nCells/n) cells.
    *
    * Result floored at `baseNProbe`, capped at nCells. */
  def adaptiveNProbe(n: Long, nCells: Int, k: Int, baseNProbe: Int,
      exactFloor: Long = 10000L, oversample: Int = 4): Int =
    if (n < exactFloor) nCells
    else math.min(nCells, math.max(baseNProbe,
      math.ceil(oversample.toDouble * k * nCells / n).toInt))

  /** [[ivfProbe]] with [[adaptiveNProbe]] probe sizing. The corpus
    * size comes from one count over the assignment table (persisted,
    * so the probe join reuses the scan — at cluster scale the index
    * lives in parquet and the count is statistics-cheap). */
  def ivfProbeAdaptive(index: IvfIndex, queries: DataFrame, k: Int,
      baseNProbe: Int, exactFloor: Long = 10000L, oversample: Int = 4): DataFrame = {
    val indexed = graft.core.PlanCache.persist(index.indexed)
    val nProbe = adaptiveNProbe(indexed.count(), index.model.clusterCenters.length,
      k, baseNProbe, exactFloor, oversample)
    ivfProbe(index.copy(indexed = indexed), queries, k, nProbe)
  }

  /** Index probe: each query expands to its nProbe nearest centroids
    * (centroid set broadcasts) and brute-forces only those cells via an
    * equi-join on `cell` — nProbe/nCells of the corpus per query. */
  def ivfProbe(index: IvfIndex, queries: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val centers = index.model.clusterCenters.map(_.toArray)
    val probeCells = udf { (v: Vector) =>
      centers.zipWithIndex
        .map { case (c, i) =>
          var dot = 0.0; var na = 0.0; var nb = 0.0
          var j = 0
          while (j < c.length) { val a = v(j); val b = c(j); dot += a * b; na += a * a; nb += b * b; j += 1 }
          val denom = math.sqrt(na) * math.sqrt(nb)
          (if (denom == 0.0) 1.0 else 1.0 - dot / denom, i)
        }
        .sortBy(_._1).take(nProbe).map(_._2)
    }
    val qs = withNormalizedFeatures(queries, index.embCol)
      .select(col(index.idCol).as("query_id"), col(index.embCol).as("q_emb"),
        explode(probeCells(col("features"))).as("cell"))
    val w = Window.partitionBy("query_id").orderBy(col("distance").asc, col("neighbor_id").asc)
    qs.join(index.indexed, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.RoundPortableExpr.r(
          graft.functions.VectorFunctions.cosineDistance(col("c_emb"), col("q_emb")), 4).as("distance"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k).drop("rank")
  }

  /** MinHashLSH near-dup join over shingle sets (sparse binary vectors
    * indexed by shingle hash). */
  def minhashLshJoin(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, jaccardDistThreshold: Double = 0.2,
      numHashTables: Int = 4, dim: Int = 1 << 20, seed: Long = 42L): DataFrame = {
    val shingled = docs
      .select(col(idCol), graft.functions.TextExprs.shingles(col(textCol), n).as("sh"))
      .where(size(col("sh")) > 0)
    val toSparse = udf { (sh: Seq[String]) =>
      val idx = sh.map(s => math.floorMod(s.hashCode, dim)).distinct.sorted.toArray
      Vectors.sparse(dim, idx, Array.fill(idx.length)(1.0))
    }
    val feat = shingled.withColumn("features", toSparse(col("sh")))
    val model = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(seed)
      .fit(feat)
    model.approxSimilarityJoin(feat, feat, jaccardDistThreshold, "jaccard_dist")
      .select(col(s"datasetA.$idCol").as("id_a"), col(s"datasetB.$idCol").as("id_b"),
        graft.functions.RoundPortableExpr.r(lit(1.0) - col("jaccard_dist"), 4).as("jaccard"))
      .where(col("id_a") < col("id_b"))
  }
}

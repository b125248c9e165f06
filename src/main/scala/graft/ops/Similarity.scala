package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{RoundPortableExpr, VectorFunctions}

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths, per SURVEY.md §2.9 X1:
  *  - [[bruteTopK]] — exact k-NN: distance to every candidate, then
  *    per-query top-k via window rank. Embarrassingly parallel (the
  *    query set broadcasts; candidates never shuffle), the correctness
  *    baseline — and the reference's own live path (its HNSW index is
  *    only built on bulk load, duckvdb.py:45).
  *  - [[lshBucketTopK]] — approximate scale path: sign-random-projection
  *    buckets (cosine LSH). Queries only compare against candidates
  *    sharing a bucket in any of `tables` hash tables, turning the
  *    global cross product into a bucket-local join. Deterministic
  *    hyperplanes derived from a seed, so results are reproducible.
  */
object Similarity {

  /** Per-GROUP exact top-k for one query vector: the k nearest
    * neighbors within each value of `groupCol` (e.g. per language, per
    * source shard). One window shuffle keyed by the group — the
    * per-group generalization of the reference's global top-k, and the
    * shape a diversity-constrained retrieval ("k per category") needs.
    * `WindowGroupLimit` pushes the rank bound into per-partition
    * heaps before the shuffle. */
  def groupedTopK(
      candidates: DataFrame, queryVec: Array[Float], k: Int, groupCol: String,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col("distance").asc, col(idCol).asc)
    candidates.select(col(groupCol), col(idCol),
        RoundPortableExpr.r(
          VectorFunctions.cosineDistance(col(embCol), typedlit(queryVec)), 4).as("distance"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .drop("rank")
  }

  /** Maximal-marginal-relevance diversity rerank (Carbonell & Goldstein
    * 1998) of a k-NN shortlist: greedily pick the doc maximizing
    * λ·relevance − (1−λ)·max-similarity-to-already-picked, so the final
    * k trades redundancy for coverage (near-duplicate hits stop crowding
    * out distinct-but-relevant ones).
    *
    * Scale shape: the greedy loop is inherently sequential, so — like
    * every production reranker — it runs on a BOUNDED shortlist, never
    * the corpus: Spark computes the `shortlist`-row top-N
    * (TakeOrderedAndProject) and the shortlist's pairwise kernel
    * distances (shortlist² tiny rows), both distributed; only those
    * O(shortlist²) scalars are collected for the O(k·shortlist) driver
    * loop. Scores are derived from portably-rounded distances and
    * re-rounded at 6 decimals each step, so the selection is
    * reproducible across engines bit-for-bit.
    *
    * `scored` must carry (idCol: Long, embCol, distCol: rounded double).
    * Returns (idCol, rank, mmr) for the k picks in selection order. */
  def mmrRerank(
      scored: DataFrame, k: Int, lambda: Double = 0.7, shortlist: Int = 50,
      idCol: String = "vec_id", embCol: String = "embedding",
      distCol: String = "distance"): DataFrame = {
    val spark = scored.sparkSession
    val short = scored.select(col(idCol), col(embCol), col(distCol))
      .orderBy(col(distCol).asc, col(idCol).asc).limit(shortlist)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rel = short.select(col(idCol), col(distCol)).collect()
      .map(r => r.getLong(0) -> (1.0 - r.getDouble(1))).toMap
    // pairwise distances through the SAME codegen kernel + portable
    // rounding as the relevance leg — no driver-side re-implementation
    // of the float arithmetic to drift from the oracle
    val a = short.select(col(idCol).as("ia"), col(embCol).as("emb_a"))
    val b = short.select(col(idCol).as("ib"), col(embCol).as("emb_b"))
    val sim = a.crossJoin(b).where(col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"),
        RoundPortableExpr.r(VectorFunctions.cosineDistance(col("emb_a"), col("emb_b")), 4)
          .as("pdist"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (1.0 - r.getDouble(2))).toMap
    short.unpersist()
    val picked = scala.collection.mutable.ArrayBuffer[(Long, Int, Double)]()
    val remaining = scala.collection.mutable.SortedSet[Long]() ++ rel.keys
    while (picked.size < k && remaining.nonEmpty) {
      val best = remaining.map { d =>
        val maxSim = if (picked.isEmpty) 0.0
          else picked.map(p => sim((d, p._1))).max
        val score = graft.functions.PortableRounding.round(
          lambda * rel(d) - (1.0 - lambda) * maxSim, 6)
        (d, score)
      }.maxBy { case (d, s) => (s, -d) } // highest score, lowest id on ties
      picked += ((best._1, picked.size + 1, best._2))
      remaining -= best._1
    }
    import spark.implicits._
    picked.toSeq.toDF(idCol, "rank", "mmr")
  }

  /** Scalar-quantized (SQ8) approximate top-k with exact rerank: the
    * corpus is scanned as one-byte-per-dimension codes (4× smaller than
    * float32 — the memory tier every production vector store offers
    * below full precision), queries compute the ASYMMETRIC cosine
    * (float query vs dequantized bytes, one kernel pass), the
    * k·rerankFactor shortlist per query is re-scored exactly by joining
    * the raw embeddings back BY ID — the code scan never needs the
    * floats resident, the rerank join touches only O(q·k·factor) rows.
    * WindowGroupLimit bounds both rank passes with per-partition heaps. */
  def sq8TopK(
      queries: DataFrame, candidates: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      rerankFactor: Int = 4): DataFrame = {
    val enc = candidates.select(col(idCol).as("neighbor_id"),
        graft.functions.Sq8EncodeExpr.col(col(embCol)).as("q8"))
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
    val wa = Window.partitionBy("query_id").orderBy(col("adist").asc, col("neighbor_id").asc)
    val shortlist = enc.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("q_emb"),
        graft.functions.Sq8CosineDistance.col(
          col("q_emb"), col("q8.code"), col("q8.mn"), col("q8.sc")).as("adist"))
      .withColumn("rk", row_number().over(wa)).where(col("rk") <= k * rerankFactor)
      .drop("rk", "adist")
    val we = Window.partitionBy("query_id").orderBy(col("distance").asc, col("neighbor_id").asc)
    shortlist
      .join(candidates.select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb")),
        Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        RoundPortableExpr.r(VectorFunctions.cosineDistance(col("c_emb"), col("q_emb")), 4)
          .as("distance"))
      .withColumn("rank", row_number().over(we)).where(col("rank") <= k).drop("rank")
  }

  /** Binary-quantized (BQ) approximate top-k: candidates are scanned as
    * packed sign-bit codes (32× smaller than float32 — the cheapest
    * memory tier, see [[graft.functions.BqKernels]]) through a
    * three-stage cascade, each stage touching only the previous
    * shortlist: (1) symmetric Hamming over packed codes (XOR+popcount,
    * k·coarseFactor survivors); (2) asymmetric float-query-vs-±1-sign
    * distance (k·fineFactor survivors); (3) exact rerank joining the
    * raw embeddings back BY ID — floats are only resident for
    * O(q·k·fineFactor) rows. All shortlists are per-query
    * WindowGroupLimit heaps; shortlist size is O(k), independent of
    * corpus size, so the cascade's reduction RATIO grows with the
    * corpus. 64-dim fixture recall (mean@10): 0.92 at sf0.01, 0.91 at
    * sf0.1 with the defaults — sign bits at 64 dims are a coarse
    * signal, which is exactly why the cascade reranks through two
    * progressively-exact tiers. */
  def bqTopK(
      queries: DataFrame, candidates: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      coarseFactor: Int = 64, fineFactor: Int = 16): DataFrame =
    bqTopKFromCodes(
      candidates.select(col(idCol).as("neighbor_id"),
        graft.functions.BqEncodeExpr.col(col(embCol)).as("code")),
      queries, candidates, k, idCol, embCol, coarseFactor, fineFactor)

  /** BQ cascade over a PERSISTED code table (neighbor_id, code) — the
    * storage-tier shape: codes are written once at ingest (32× smaller
    * than the float column) and the coarse+fine stages scan ONLY them;
    * `rerank` (id, embedding) is touched by the final exact stage alone,
    * joined BY ID for O(q·k·fineFactor) rows. At 100 TB of raw
    * embeddings the resident scan set is the ~3 TB code table.
    *
    * `center`: when the code table was built MEAN-CENTERED (codes =
    * sign(x − μ), the persisted tier's high-dimension mode — see
    * [[graft.table.VectorTable.buildBqIndex]]), the query side must
    * center with the SAME μ before encoding and before the asymmetric
    * fine stage; the final exact stage always ranks raw floats. The
    * centering runs on the broadcast-small query panel only. */
  def bqTopKFromCodes(
      codes: DataFrame, queries: DataFrame, rerank: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      coarseFactor: Int = 64, fineFactor: Int = 16,
      excludeSelf: Boolean = true, center: Option[Seq[Float]] = None): DataFrame = {
    val enc = codes.select(col("neighbor_id"), col("code"))
    val centered: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => center match {
        case Some(mu) => zip_with(c, typedlit(mu), (a, b) => a - b)
        case None => c
      }
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"),
      graft.functions.BqEncodeExpr.col(centered(col(embCol))).as("q_code"),
      centered(col(embCol)).as("q_cemb"))
    val wc = Window.partitionBy("query_id").orderBy(col("hd").asc, col("neighbor_id").asc)
    val coarse = enc.crossJoin(broadcast(q))
      // excludeSelf = false when the query-id space is DISJOINT from
      // the candidate ids (the facade's bulk path: user query_ids vs
      // xxhash64 surrogates) — there an equality is a different row
      // that happens to share a key, not "self"
      .where(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"), col("q_emb"), col("q_cemb"), col("code"),
        graft.functions.BqHammingDistance.col(col("q_code"), col("code")).as("hd"))
      .withColumn("rk", row_number().over(wc)).where(col("rk") <= k * coarseFactor)
      .drop("rk", "hd")
    val wf = Window.partitionBy("query_id").orderBy(col("adist").asc, col("neighbor_id").asc)
    val fine = coarse
      .withColumn("adist",
        graft.functions.BqSignCosineDistance.col(col("q_cemb"), col("code")))
      .withColumn("rk", row_number().over(wf)).where(col("rk") <= k * fineFactor)
      .drop("rk", "adist", "code", "q_cemb")
    val we = Window.partitionBy("query_id").orderBy(col("distance").asc, col("neighbor_id").asc)
    fine
      .join(rerank.select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb")),
        Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        RoundPortableExpr.r(VectorFunctions.cosineDistance(col("c_emb"), col("q_emb")), 4)
          .as("distance"))
      .withColumn("rank", row_number().over(we)).where(col("rank") <= k).drop("rank")
  }

  /** Exact top-k neighbors for each query row.
    * `queries`/`candidates`: (id, embedding).
    *
    * `excludeSelf` (default true) drops candidates whose id equals the
    * query id — correct whenever queries ⊆ candidates (kNN within one
    * corpus, the recall-gate baselines). Pass `excludeSelf = false`
    * when query and candidate CORPORA are distinct (cross-lingual kNN,
    * bitext legs): there an id collision is two different vectors that
    * happen to share a key, and silently dropping the pair — while a
    * SQL oracle with no such filter keeps it — is a latent divergence
    * (r6 advice). */
  def bruteTopK(
      queries: DataFrame, candidates: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb"))
    val w = Window.partitionBy("query_id").orderBy(col("distance").asc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .where(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        RoundPortableExpr.r(VectorFunctions.cosineDistance(col("c_emb"), col("q_emb")), 4).as("distance"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .drop("rank")
  }

  /** Exact max-inner-product top-k (the recommender-serving ranking:
    * user·item score, not angular distance — unnormalized embeddings
    * make MIPS ≠ cosine). Same broadcast-panel shape as [[bruteTopK]]:
    * the query panel broadcasts, candidates never shuffle, the rank
    * window bounds with per-partition heaps; the score is the codegen
    * dot-product kernel, rounded before ranking so cross-engine
    * last-ulp sums can't flip a tie (ties → smaller neighbor_id). */
  def mipsTopK(
      queries: DataFrame, candidates: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb"))
    val w = Window.partitionBy("query_id").orderBy(col("ip").desc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .where(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        RoundPortableExpr.r(VectorFunctions.dotProduct(col("c_emb"), col("q_emb")), 4).as("ip"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .drop("rank")
  }

  /** MIPS→cosine reduction (Bachrach et al. 2014): append
    * sqrt(maxNorm² − ‖x‖²) to every corpus vector so all augmented
    * vectors have norm maxNorm; a query augmented with 0 then has
    * cos(aug(x), aug(q)) = x·q / (maxNorm·‖q‖) — MONOTONE in the
    * inner product, so any cosine-ANN index (HNSW / IVF / BQ) serves
    * MIPS unchanged. `maxNorm` must be ≥ every corpus norm (the global
    * max, one cheap agg at index-build time). Map-only. */
  def mipsAugmentCorpus(df: DataFrame, embCol: String, maxNorm: Double): DataFrame = {
    val sq = VectorFunctions.dotProduct(col(embCol), col(embCol))
    df.withColumn(embCol, concat(col(embCol),
      array(sqrt(greatest(lit(maxNorm * maxNorm) - sq, lit(0.0))).cast("float"))))
  }

  /** Query-side twin of [[mipsAugmentCorpus]]: append a literal 0. */
  def mipsAugmentQueries(df: DataFrame, embCol: String): DataFrame =
    df.withColumn(embCol, concat(col(embCol), array(lit(0.0f))))

  /** Margin-based parallel-pair mining (Artetxe & Schwenk 2019, the
    * LASER/CCMatrix bitext-mining criterion): for each query vector in
    * corpus side A, score its k nearest neighbors in side B by
    * margin(x, y) = sim(x, y) / ((avgSim_k(x→B) + avgSim_k(y→A)) / 2)
    * — raw cosine is incomparable across queries (hubness), the ratio
    * to both points' local neighborhood density is. Keeps each query's
    * best-margin candidate when margin > 1 (closer than its
    * neighborhood average on BOTH sides).
    *
    * Scale shape: the two kNN legs are the pluggable part — here exact
    * [[bruteTopK]] (query panel broadcast, candidates never shuffle);
    * at corpus scale both legs substitute any shortlist operator with
    * the same (query_id, neighbor_id, distance) contract (LSH / IVF /
    * PQ — this is how CCMatrix runs it, FAISS shards per side). The
    * backward leg only ever scores the ≤ q·k DISTINCT forward
    * candidates (semi-join prune), not all of side B; the margin join
    * itself is shortlist-sized: q·k rows joined to two avg tables of
    * ≤ q and ≤ q·k rows (both broadcastable). Forward shortlist is
    * persisted once for its three consumers (PlanCache; the
    * materializing caller releases).
    *
    * `queries` ⊆ `src` is the mined panel (at 100 TB: a shard of side
    * A per job). Returns (src_id, tgt_id, sim, margin). */
  def bitextMarginPairs(
      queries: DataFrame, src: DataFrame, tgt: DataFrame, k: Int = 4,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    // src and tgt are DISTINCT corpora: a src id equal to a tgt id is
    // two different vectors, not a self-match — keep it (excludeSelf
    // off on both kNN legs; the DuckDB twin has no <> filter either)
    val fwd = graft.core.PlanCache.persist(
      bruteTopK(queries, tgt, k, idCol, embCol, excludeSelf = false)
        .withColumn("sim", lit(1.0) - col("distance")))
    val fwdAvg = fwd.groupBy(col("query_id"))
      .agg(RoundPortableExpr.r(avg(col("sim")), 6).as("fwd_avg"))
    val cands = fwd.select(col("neighbor_id").as(idCol)).distinct()
    val bwdQueries = tgt.join(cands, Seq(idCol), "left_semi")
    val bwdAvg = bruteTopK(bwdQueries, src, k, idCol, embCol, excludeSelf = false)
      .withColumn("sim", lit(1.0) - col("distance"))
      .groupBy(col("query_id"))
      .agg(RoundPortableExpr.r(avg(col("sim")), 6).as("bwd_avg"))
      .withColumnRenamed("query_id", "neighbor_id")
    val w = Window.partitionBy("src_id").orderBy(col("margin").desc, col("tgt_id").asc)
    fwd.join(broadcast(fwdAvg), "query_id")
      .join(broadcast(bwdAvg), "neighbor_id")
      .select(col("query_id").as("src_id"), col("neighbor_id").as("tgt_id"),
        col("sim"),
        RoundPortableExpr.r(
          col("sim") / ((col("fwd_avg") + col("bwd_avg")) / lit(2.0)), 6).as("margin"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("margin") > 1.0)
      .drop("rn")
  }

  /** ε-radius search (the range query of the vector-search literature —
    * "all neighbors within distance ε", the other half of the top-k
    * surface): exact, one map-side pass. The query panel broadcasts;
    * every candidate row is scored and filtered in place — no window
    * state, no top-k heaps, output size is data-dependent. At 100 TB
    * this is a full scan per panel by design (exact semantics); the
    * approximate path for large ε workloads is the LSH-bucketed
    * variant, same trade as [[lshBucketTopK]] vs [[bruteTopK]]. */
  def rangeSearch(
      queries: DataFrame, candidates: DataFrame, eps: Double,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb"))
    c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        RoundPortableExpr.r(VectorFunctions.cosineDistance(col("c_emb"), col("q_emb")), 4)
          .as("distance"))
      .where(col("distance") <= eps)
  }

  /** Bucket ids per hash table: `buckets` array<long>, index = table.
    * Hyperplanes are derived deterministically from `seed` inside
    * [[graft.functions.LshBucketsExpr]] (a native codegen expression),
    * so executors recompute them identically — nothing to broadcast. */
  def lshBuckets(
      df: DataFrame, dim: Int, tables: Int, bits: Int, seed: Long,
      embCol: String = "embedding"): DataFrame =
    df.withColumn("buckets",
      graft.functions.LshBucketsExpr(col(embCol), dim, tables, bits, seed))

  /** Quality gate for approximate-ANN results: per query, the fraction
    * of the EXACT top-k recovered by the approximate result. Emits
    * (query_id, recall_ok ∈ {0,1}) — 1 iff recall@k ≥ floor — so an
    * oracle can assert the quality contract (`SELECT id, 1 AS recall_ok`)
    * and any recall regression flips the hash match red.
    *
    * Scale shape: both inputs are ≤ queries×k rows; the join/agg here is
    * negligible next to the searches that produced them. */
  def recallGate(approx: DataFrame, exact: DataFrame, k: Int, floor: Double): DataFrame = {
    val hits = approx.select(col("query_id"), col("neighbor_id"))
      .join(exact.select(col("query_id"), col("neighbor_id")), Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    exact.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        when(coalesce(col("hits"), lit(0L)).cast("double") / k >= floor, 1).otherwise(0)
          .as("recall_ok"))
  }

  /** Numeric recall@k per query (for specs / diagnostics). */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val hits = approx.select(col("query_id"), col("neighbor_id"))
      .join(exact.select(col("query_id"), col("neighbor_id")), Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    exact.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), (coalesce(col("hits"), lit(0L)).cast("double") / k).as("recall"))
  }

  /** Mean-recall@k gate: one row (n_queries, recall_ok) — 1 iff the MEAN
    * recall across queries clears the floor. For ANN families whose
    * per-query recall is high-variance by design (e.g. IVF on weakly
    * clustered data), the mean is the stable, meaningful contract. */
  def meanRecallGate(approx: DataFrame, exact: DataFrame, k: Int, floor: Double): DataFrame =
    recallAtK(approx, exact, k)
      .agg(count(lit(1)).as("n_queries"), avg(col("recall")).as("mean_recall"))
      .select(col("n_queries"),
        when(col("mean_recall") >= floor, 1).otherwise(0).as("recall_ok"))

  /** Multi-variant pair-set recall gate: one row
    * (gate, n_expected, recall_ok) per named expected set, all checked
    * against the SAME approximate join (computed once — the expected
    * sets union with a label before the single membership join).
    * Used to pin that an approximate dedup recovers both the exact
    * banded pairs AND a guarded (e.g. hot-bucket-capped) subset. */
  def pairRecallGates(approx: DataFrame, expected: Seq[(String, DataFrame)],
      floor: Double): DataFrame = {
    val e = expected.map { case (g, df) =>
      df.select(col("id_a"), col("id_b"), lit(g).as("gate"))
    }.reduce(_ unionByName _)
    val found = approx.select(col("id_a"), col("id_b")).join(e, Seq("id_a", "id_b"))
    e.groupBy(col("gate")).agg(count(lit(1)).as("n_expected"))
      .join(found.groupBy(col("gate")).agg(count(lit(1)).as("n_found")), Seq("gate"), "left")
      .select(col("gate"), col("n_expected"),
        when(coalesce(col("n_found"), lit(0L)).cast("double") / col("n_expected") >= floor, 1)
          .otherwise(0).as("recall_ok"))
  }

  /** Pair-set recall gate for near-dup joins: one row
    * (n_expected, recall_ok) — 1 iff the approximate join recovered at
    * least `floor` of the expected (id_a, id_b) pairs. */
  def pairRecallGate(approx: DataFrame, expected: DataFrame, floor: Double): DataFrame = {
    val e = expected.select(col("id_a"), col("id_b"))
    val found = approx.select(col("id_a"), col("id_b")).join(e, Seq("id_a", "id_b"))
    e.agg(count(lit(1)).as("n_expected"))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
      .select(col("n_expected"),
        when(col("n_found").cast("double") / col("n_expected") >= floor, 1).otherwise(0)
          .as("recall_ok"))
  }

  /** Approximate top-k: compare each query only to candidates sharing
    * an LSH bucket, then rank. Multi-probe recall comes from `tables`
    * independent hash tables. */
  def lshBucketTopK(
      queries: DataFrame, candidates: DataFrame, k: Int, dim: Int,
      tables: Int = 8, bits: Int = 12, seed: Long = 42L,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    def explodeBuckets(df: DataFrame, idAs: String, embAs: String) =
      lshBuckets(df, dim, tables, bits, seed, embCol)
        .select(col(idCol).as(idAs), col(embCol).as(embAs),
          posexplode(col("buckets")).as(Seq("t", "bk")))
    val q = explodeBuckets(queries, "query_id", "q_emb")
    val c = explodeBuckets(candidates, "neighbor_id", "c_emb")
    val w = Window.partitionBy("query_id").orderBy(col("distance").asc, col("neighbor_id").asc)
    q.join(c, Seq("t", "bk"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        RoundPortableExpr.r(VectorFunctions.cosineDistance(col("c_emb"), col("q_emb")), 4).as("distance"))
      .distinct() // a pair can collide in several tables
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .drop("rank")
  }

  /** Embedding outlier audit: per group (label/source shard), the count
    * of vectors whose cosine distance to the GROUP CENTROID clears the
    * Tukey upper fence q3 + 1.5·IQR (exact per-group percentiles,
    * rounded portably at 6 dp like the adaptive quality threshold).
    * The embedding-space twin of the text quality screens — mislabeled
    * or degenerate vectors surface as distance-tail mass before they
    * poison ANN indexes or semantic dedup.
    *
    * Scale shape: centroids come from a posexplode + (group, dim)
    * partial-aggregable average — never a collect; the #groups-row
    * centroid and fence tables broadcast back, and the distance pass is
    * one codegen'd kernel scan. The per-vector distance table is
    * persisted via [[graft.core.PlanCache]] (it feeds both the fence
    * aggregate and the final audit).
    *
    * Returns (groupCol, n_vecs, hi_fence, n_outliers, max_dist). */
  /** Matryoshka-truncation agreement audit (Kusupati et al. 2022, MRL):
    * per query, the size of the overlap between the cosine top-k under
    * the FULL embedding and under its first `prefixDim` dimensions —
    * the measurement that decides whether retrieval can serve from
    * truncated vectors (prefixDim/dim of the memory and bandwidth)
    * without re-embedding the corpus. MRL-trained embedders front-load
    * information, so high overlap at small prefixes is the expected
    * signature; a low overlap says this embedder's dims aren't
    * prefix-ordered and truncation would silently degrade recall.
    *
    * Scale shape: `queries` is a serving-sized set and broadcasts; the
    * candidate side computes BOTH distances in the same map-side pass
    * over one scan (the prefix slice is free — no second read), and the
    * two ranks share ONE shuffle keyed by query id. Only rows ranked
    * ≤ k under either metric survive to the (tiny) overlap aggregate.
    * Distances are portably rounded with id tie-breaks, so ranks are
    * engine-reproducible.
    *
    * Returns one row per query: (qidCol, n_overlap, overlap_at_k). */
  def matryoshkaAgreement(candidates: DataFrame, queries: DataFrame, k: Int,
      prefixDim: Int, idCol: String = "vec_id", embCol: String = "embedding",
      qidCol: String = "qid", qvecCol: String = "qe"): DataFrame = {
    val d = candidates.crossJoin(broadcast(queries))
      .select(col(qidCol), col(idCol),
        RoundPortableExpr.r(
          VectorFunctions.cosineDistance(col(embCol), col(qvecCol)), 6).as("fd"),
        RoundPortableExpr.r(VectorFunctions.cosineDistance(
          slice(col(embCol), 1, prefixDim), slice(col(qvecCol), 1, prefixDim)), 6).as("pd"))
    val wf = Window.partitionBy(col(qidCol)).orderBy(col("fd").asc, col(idCol).asc)
    val wp = Window.partitionBy(col(qidCol)).orderBy(col("pd").asc, col(idCol).asc)
    d.withColumn("rf", row_number().over(wf))
      .withColumn("rp", row_number().over(wp))
      .where(col("rf") <= k || col("rp") <= k)
      .groupBy(col(qidCol))
      .agg(sum(when(col("rf") <= k && col("rp") <= k, 1L).otherwise(0L)).as("n_overlap"))
      .select(col(qidCol), col("n_overlap"),
        RoundPortableExpr.r(col("n_overlap").cast("double") / k, 4).as("overlap_at_k"))
  }

  def centroidDistOutliers(df: DataFrame, groupCol: String, idCol: String,
      embCol: String): DataFrame = {
    val comp = df.select(col(groupCol), posexplode(col(embCol)).as(Seq("i", "x")))
      .groupBy(col(groupCol), col("i")).agg(avg(col("x").cast("double")).as("v"))
    val cent = comp.groupBy(col(groupCol))
      .agg(array_sort(collect_list(struct(col("i"), col("v")))).as("sv"))
      .select(col(groupCol), expr("transform(sv, s -> cast(s.v as float))").as("c"))
    val d = graft.core.PlanCache.persist(
      df.join(broadcast(cent), groupCol)
        .select(col(groupCol), col(idCol),
          RoundPortableExpr.r(
            VectorFunctions.cosineDistance(col(embCol), col("c")), 4).as("dist")))
    val fen = d.groupBy(col(groupCol))
      .agg(RoundPortableExpr.r(expr("percentile(dist, 0.25)"), 6).as("q1"),
        RoundPortableExpr.r(expr("percentile(dist, 0.75)"), 6).as("q3"))
      .select(col(groupCol),
        RoundPortableExpr.r(col("q3") + (col("q3") - col("q1")) * 1.5, 6).as("hi"))
    d.join(broadcast(fen), groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_vecs"),
        first(col("hi")).as("hi_fence"),
        sum(when(col("dist") > col("hi"), 1L).otherwise(0L)).as("n_outliers"),
        RoundPortableExpr.r(max(col("dist")), 4).as("max_dist"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{RoundPortableExpr, TextExprs, VectorFunctions}
import graft.ops.TextPrimitives.jaccard

/** Deduplication operators for large-scale document pipelines —
  * the scale extensions mandated by BASELINE.json on top of the
  * reference's exact dedup-on-insert (duckvdb.py:56-61).
  *
  * Scale design notes (100 TB):
  *  - exact: one hash-shuffle on the 32-byte digest, not the document.
  *  - minhashLsh: candidate generation shuffles (band, key) pairs —
  *    O(docs × bands) small rows — instead of O(n²) pairs; exact
  *    Jaccard verification only on bucket collisions. This is the
  *    standard shingle→minhash→band→bucket-join pipeline.
  *  - simhash: 60-bit signature per doc; near-dup pairs via band-join
  *    on signature quarters (any pair within hamming ≤ 3 must share at
  *    least one of 4 quarters by pigeonhole).
  *  - embedding near-dup: blocked self-join (caller supplies the
  *    blocking column, e.g. an LSH bucket or cluster label) so the
  *    cross product never materializes globally.
  */
object Dedup {

  /** Default hot-bucket cap for [[minhashLshPairs]]. A bucket of b docs
    * emits b² candidate pairs on ONE reducer, so the skew guard is on
    * by default: any (band, key) bucket holding more than this many
    * docs is a degenerate boilerplate key, not a near-dup signal, and
    * is excluded from candidate generation. 100 is far above every
    * bucket the realistic fixtures produce (max 3 at sf0.01, linear
    * under the 100× transliterated stress) while bounding per-reducer
    * join work at 10⁴ pairs regardless of corpus skew. Exact banded
    * semantics (no guard) remain available via
    * `maxBucket = Int.MaxValue` — see the registry's
    * `dedup_minhash_exact` baseline and its documented envelope. */
  val DefaultMaxBucket: Int = 100

  /** Exact dedup: keep the first (min orderCol) row per content hash.
    * Survivor list with duplicate counts. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(md5(col(textCol)).as("content_hash"), col(idCol))
      .groupBy("content_hash")
      .agg(min(idCol).as(idCol), count(lit(1)).as("dup_count"))

  /** Exact threshold-Jaccard self-join via PREFIX FILTERING (Chaudhuri,
    * Ganti & Kaushik, ICDE 2006 "A primitive operator for similarity
    * joins"; Bayardo, Ma & Srikant, WWW 2007 "Scaling up all pairs
    * similarity search"): order every document's shingle set by
    * ascending global document frequency (rarest first, shingle string
    * as the tie-break), and join only on each set's PREFIX — the first
    * |d| − ceil(t·|d|) + 1 shingles. Any pair with Jaccard ≥ t must
    * share at least one prefix token under a common total order, so
    * the join is EXACT (no LSH misses, no blocking misses) while the
    * shared-token join volume collapses: the ubiquitous boilerplate
    * shingles that make the naive shared-token join quadratic sit at
    * the END of the frequency order and never enter a prefix unless a
    * document has almost nothing rarer. A length prefilter
    * (min ≥ t·max, both directions) prunes candidates before the
    * verify join against the full sets.
    *
    * The threshold is applied to the ROUND-4 Jaccard (the oracle
    * convention), so candidate generation uses t − 5e-5: a raw 0.59995
    * rounds up to the 0.6 gate and must not be pruned.
    *
    * Scale shape: two shuffles keyed by shingle (census + prefix join)
    * + one pair-keyed verify join; per-reducer work tracks PREFIX
    * token frequency, which the frequency order itself minimizes. */
  def prefixFilterPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold < 1, "prefix filtering requires 0 < t < 1")
    val tEff = threshold - 5e-5
    val sh = df.select(col(idCol).as("id"), TextExprs.shingles(col(textCol), n).as("sh"))
      .where(size(col("sh")) > 0)
    val ex = sh.select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("s"))
    val dfreq = ex.groupBy("s").agg(count(lit(1)).as("df"))
    // prefix extraction as a doc-keyed window, NOT a collect_list +
    // sort_array agg: the full per-doc token array never materializes
    // in an aggregation buffer (measured: the agg spilled 3.2 GB at
    // 100×). The external window sort spills linearly and sequentially
    // at worst — never the hash-buffer blowup the agg risks.
    val wRank = Window.partitionBy(col("id")).orderBy(col("df"), col("s"))
    val px = ex.join(dfreq, "s")
      .withColumn("rk", row_number().over(wRank))
      .withColumn("plen", (col("sz") - ceil(lit(tEff) * col("sz")).cast("int") + 1).cast("int"))
      .where(col("rk") <= col("plen"))
      .select(col("id"), col("sz"), col("s"), col("rk"))
    // Candidate generation with PPJoin's join-time filters (Xiao, Wang,
    // Lin & Yu, WWW 2008 "Efficient similarity joins for near duplicate
    // detection"), against the Jaccard-equivalent overlap floor
    // α = t/(1+t)·(|a|+|b|):
    //   1. length:     min ≥ t·max
    //   2. positional: a match at prefix positions (rk_a, rk_b) bounds
    //      the achievable overlap by 1 + min(remaining suffixes) ≥ α
    // (measured at 100×: 19.8M raw prefix matches → 7.0M after 1+2).
    // Two asymmetric/count variants were measured and rejected: the
    // All-Pairs full×prefix probe (tight sound count filter, but the
    // probe stream exploded to 12 GB of agg spill on this
    // template-dense corpus), and a prefix×prefix count filter (UNSOUND
    // — a shared token can hide in one side's prefix and the other's
    // suffix, uncounted; the equivalence spec caught it).
    val cand = px.as("a").join(px.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
          least(col("a.sz"), col("b.sz")).cast("double") >=
            lit(tEff) * greatest(col("a.sz"), col("b.sz")) &&
          (lit(1) + least(col("a.sz") - col("a.rk"), col("b.sz") - col("b.rk"))).cast("double") >=
            lit(tEff / (1 + tEff)) * (col("a.sz") + col("b.sz")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // verify with the codegen'd bounded two-pointer merge over SORTED
    // shingle arrays (set content is order-independent; sorting
    // restores the total order the merge needs), re-read map-side from
    // the source scan; the early-exit bound caps the per-pair merge
    // cost for whatever near-misses survive the count filter
    val setsA = sh.select(col("id").as("id_a"),
      sort_array(col("sh")).as("sh_a"), size(col("sh")).as("sz_a"))
    val setsB = sh.select(col("id").as("id_b"),
      sort_array(col("sh")).as("sh_b"), size(col("sh")).as("sz_b"))
    cand.join(setsA, "id_a").join(setsB, "id_b")
      .withColumn("inter",
        graft.functions.BoundedIntersectExpr.col(col("sh_a"), col("sh_b"), tEff))
      .where(col("inter") >= 0)
      .select(col("id_a"), col("id_b"),
        RoundPortableExpr.r(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 4).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Exact n-gram Jaccard near-dup pairs within optional blocks, as a
    * set-similarity join: explode shingles, equi-join on
    * (block, shingle), count shared shingles per pair, then
    * J = shared / (|A| + |B| − shared). Bit-identical to all-pairs
    * Jaccard for any threshold > 0 (pairs sharing no shingle can never
    * pass), but the join only materializes pairs that actually share a
    * shingle — at 100 TB that's the difference between a cross product
    * and a key-partitioned shuffle on (block, shingle). */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, blockCol: Option[String]): DataFrame = {
    require(threshold > 0, "set-similarity join requires a positive threshold")
    val sh = df.select(col(idCol), TextExprs.shingles(col(textCol), n).as("sh"),
      blockCol.map(col).getOrElse(lit(0)).as("blk"))
    val ex = sh.select(col(idCol), col("blk"), size(col("sh")).as("sz"),
      explode(col("sh")).as("s"))
    val a = ex.select(col(idCol).as("id_a"), col("sz").as("sz_a"), col("blk"), col("s"))
    val b = ex.select(col(idCol).as("id_b"), col("sz").as("sz_b"), col("blk"), col("s"))
    a.join(b, Seq("blk", "s"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("shared"))
      .select(col("id_a"), col("id_b"),
        RoundPortableExpr.r(col("shared").cast("double") / (col("sz_a") + col("sz_b") - col("shared")), 4)
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Dedup threshold-sensitivity census: the decile histogram of exact
    * n-gram Jaccard over the blocked candidate pairs — the one-pass
    * audit run BEFORE committing to a dedup threshold (how many pairs
    * would each threshold merge?). Same shuffle shape as
    * [[jaccardPairs]] (equi-join on (block, shingle), never all-pairs);
    * the histogram aggregation adds one tiny 10-key groupBy. The decile
    * floor is computed from the SAME rounded double both engines
    * produce, so bucket edges agree bit-for-bit. */
  def jaccardHistogram(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, blockCol: Option[String]): DataFrame =
    jaccardPairs(df, idCol, textCol, n, threshold = 1e-4, blockCol)
      .groupBy(floor(least(col("jaccard"), lit(0.9999)) * 10).cast("int").as("decile"))
      .agg(count(lit(1)).as("n_pairs"))

  /** MinHash signatures (k salted-md5 minima over n-gram shingles). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String, n: Int, k: Int): DataFrame =
    df.select(col(idCol), TextExprs.shingles(col(textCol), n).as("sh"))
      .select(col(idCol), col("sh"), TextExprs.minhashSig(col("sh"), k).as("sig"))

  /** Shingle → MinHash → band → bucket-join near-dup pairs, verified by
    * exact Jaccard ≥ threshold. Deterministic (salted-md5 hash family),
    * so results are reproducible across runs and engines.
    *
    * `maxBucket` is the hot-bucket skew guard: a bucket of b docs emits
    * b² candidate pairs, so ONE degenerate key (boilerplate, templated
    * or near-empty docs all sharing a band signature) turns the
    * key-partitioned join quadratic and pins a single reducer. Buckets
    * larger than `maxBucket` are excluded from candidate generation —
    * the standard trade in production minhash dedup: an over-full bucket
    * is a low-information key, and any true near-dup pair it contains
    * still collides in one of the other bands with overwhelming
    * probability. The cap makes per-reducer work ≤ maxBucket² REGARDLESS
    * of corpus skew, and is ON by default ([[DefaultMaxBucket]]): the
    * uncapped run at 100× needs a 48 GiB heap where the capped plan
    * runs in the harness default 8 GiB (BENCHNOTES r5 memory-envelope
    * finding). Pass `maxBucket = Int.MaxValue` only for the exact
    * banded baseline, and only inside that measured envelope. */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, threshold: Double,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    // Docs with no shingles (shorter than n words) are excluded: their
    // all-identical "empty" signatures would otherwise bucket every
    // short doc into one giant candidate clique.
    // Persisted: the signature subtree feeds the bucket self-join AND
    // both sides of the exact-verify join — without persist Spark
    // recomputes the shingle+minhash kernels up to 5×. At cluster scale
    // this is the "write the signature table once, reuse it" pattern.
    // Registered with PlanCache so the materializing caller releases it.
    val sigs = graft.core.PlanCache.persist(
      minhashSigTable(df, idCol, textCol, n, bands, rowsPerBand))
    minhashLshPairsFromSigs(sigs, idCol, threshold, maxBucket)
  }

  /** The banded-minhash signature table (id, sh, sig, bk) the LSH pair
    * join consumes — exposed so callers can persist it ONCE and derive
    * several pair variants via [[minhashLshPairsFromSigs]]. */
  def minhashSigTable(df: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int): DataFrame =
    minhashSignatures(df, idCol, textCol, n, bands * rowsPerBand)
      .where(size(col("sh")) > 0)
      .withColumn("bk", TextExprs.bandKeys(col("sig"), bands, rowsPerBand))

  /** [[minhashLshPairs]] over a PRECOMPUTED (persisted) signature table
    * (id, sh, sig, bk) — lets a caller derive several pair variants
    * (different bucket caps) from ONE shingle+minhash pass instead of
    * re-running the kernels per variant (r12: ml_minhash_dedup computes
    * the uncapped and capped expected sets from one signature table). */
  def minhashLshPairsFromSigs(sigs: DataFrame, idCol: String,
      threshold: Double, maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val allBuckets = sigs.select(col(idCol), posexplode(col("bk")).as(Seq("band", "key")))
    // Hot-bucket guard: the size count partitions on the SAME (band, key)
    // the self-join shuffles on, so the filter adds no extra shuffle key.
    val buckets =
      if (maxBucket == Int.MaxValue) allBuckets
      else allBuckets
        .withColumn("__bsz", count(lit(1)).over(
          Window.partitionBy(col("band"), col("key"))))
        .where(col("__bsz") <= maxBucket)
        .drop("__bsz")
    val cand = buckets.alias("x").join(buckets.alias("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
    val sh = sigs.select(col(idCol), col("sh"))
    cand
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        RoundPortableExpr.r(jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Incremental near-dup maintenance: pairs touching a NEW batch —
    * batch×corpus plus batch×batch — WITHOUT re-enumerating
    * corpus×corpus pairs. This is the ingest-time shape of minhash
    * dedup: the corpus's signature/bucket table is the stored index
    * (built once, appended per batch — cf. the persisted ANN index),
    * and per-batch work is proportional to the batch's bucket matches,
    * never corpus². The pair set equals [[minhashLshPairs]] over
    * corpus ∪ batch restricted to pairs with a batch member
    * (DedupSpec pins that equivalence). Complements
    * [[crossShardNearDups]]: that op answers "which incoming docs have
    * a twin anywhere" (per-doc census, corpus side only); this one
    * yields the actual pair table — including batch-internal pairs —
    * that downstream component-building consumes.
    *
    * Returns (id_a, id_b, jaccard, pair_src) with pair_src ∈
    * {corpus, batch}; for corpus×batch pairs id_a is the corpus doc. */
  def minhashIncrementalPairs(
      existing: DataFrame, batch: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, threshold: Double): DataFrame = {
    def sigs(df: DataFrame) = graft.core.PlanCache.persist(
      minhashSignatures(df, idCol, textCol, n, bands * rowsPerBand)
        .where(size(col("sh")) > 0)
        .withColumn("bk", TextExprs.bandKeys(col("sig"), bands, rowsPerBand)))
    def buckets(s: DataFrame) =
      s.select(col(idCol), posexplode(col("bk")).as(Seq("band", "key")))
    val (eSigs, bSigs) = (sigs(existing), sigs(batch))
    val (eB, bB) = (buckets(eSigs), buckets(bSigs))
    val candCross = bB.alias("x").join(eB.alias("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key"))
      .select(col(s"y.$idCol").as("id_a"), col(s"x.$idCol").as("id_b"),
        lit("corpus").as("pair_src"))
    val candNew = bB.alias("x").join(bB.alias("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        lit("batch").as("pair_src"))
    val sh = eSigs.select(col(idCol), col("sh"))
      .unionByName(bSigs.select(col(idCol), col("sh")))
    candCross.unionByName(candNew).distinct()
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        RoundPortableExpr.r(jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"),
        col("pair_src"))
      .where(col("jaccard") >= threshold)
  }

  /** 60-bit SimHash fingerprint per document. */
  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextExprs.simhash(col(textCol)).as("simhash"))

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming, using
    * signature-quarter banding: a pair within hamming ≤ 3 of a 60-bit
    * signature shares at least one exact 15-bit quarter (pigeonhole),
    * so the join is on (quarter index, quarter value), never all-pairs. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int): DataFrame = {
    val sh = simhashes(df, idCol, textCol)
    val quarters = sh.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(q =>
        shiftright(col("simhash"), q * 15).bitwiseAND(0x7fff)): _*)).as(Seq("q", "qv")))
    quarters.alias("x").join(quarters.alias("y"),
        col("x.q") === col("y.q") && col("x.qv") === col("y.qv") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup pairs within blocks.
    *
    * A blocking column is REQUIRED unless `lshDim` is set: joining every
    * row against every row on a constant key is an O(n²) cross product —
    * unusable at any real scale. With `blockCol=None` and `lshDim > 0`
    * the pairs are pre-bucketed by sign-random-projection LSH
    * ([[graft.functions.LshBucketsExpr]]): only rows colliding in at
    * least one of `lshTables` hash tables are scored. That path is
    * APPROXIMATE (a near-dup pair can miss every bucket), which is the
    * honest trade at scale — exact all-pairs cosine does not exist at
    * 100 TB. */
  def embeddingNearDups(
      df: DataFrame, idCol: String, embCol: String,
      threshold: Double, blockCol: Option[String],
      lshDim: Int = 0, lshTables: Int = 8, lshBits: Int = 8, lshSeed: Long = 42L): DataFrame = {
    require(blockCol.nonEmpty || lshDim > 0,
      "embeddingNearDups without a blocking column degenerates to an all-pairs cross " +
        "product; pass blockCol or set lshDim (> 0) to enable LSH pre-bucketing")
    val (base, joinKeys) = blockCol match {
      case Some(bc) =>
        (df.select(col(idCol), col(embCol), col(bc).as("blk")), Seq("blk"))
      case None =>
        val bucketed = df
          .withColumn("__bks",
            graft.functions.LshBucketsExpr(col(embCol), lshDim, lshTables, lshBits, lshSeed))
          .select(col(idCol), col(embCol), posexplode(col("__bks")).as(Seq("t", "bk")))
        (bucketed, Seq("t", "bk"))
    }
    val a = base.select(col(idCol).as("id_a") +: col(embCol).as("emb_a") +: joinKeys.map(col): _*)
    val b = base.select(col(idCol).as("id_b") +: col(embCol).as("emb_b") +: joinKeys.map(col): _*)
    val pairs = a.join(b, joinKeys)
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        RoundPortableExpr.r(VectorFunctions.cosineDistance(col("emb_a"), col("emb_b")), 4).as("distance"))
      .where(col("distance") <= threshold)
    // LSH path: the same pair can collide in several tables
    if (blockCol.isEmpty) pairs.distinct() else pairs
  }

  /** Exact duplicated-substring spans (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): find every token span
    * that appears verbatim in ≥ 2 documents, merged per doc into maximal
    * intervals — the span-level signal whole-document minhash misses
    * (boilerplate, licenses, quoted passages inside otherwise-unique
    * docs).
    *
    * Suffix arrays don't distribute; the standard scalable analogue is
    * fixed-width windows on a stride: every `w`-token window at offsets
    * 0, stride, 2·stride… is content-hashed, a window hash seen in ≥ 2
    * distinct docs marks its window duplicated, and per-doc overlapping
    * duplicated windows merge into spans. Any duplicated run of
    * ≥ w + stride − 1 tokens is guaranteed to contain an aligned window
    * on both sides, so detection is exact above that length.
    *
    * Scale shape: one explode of O(tokens/stride) window hashes, one
    * hash-keyed aggregation for the ≥2-docs test, one equi-join back,
    * and the interval merge is a per-doc window function (partitioned by
    * doc — thousands of tiny partitions, never a global sort).
    *
    * Returns (idCol, n_dup_spans, dup_tokens): merged span count and
    * total tokens covered, for docs with at least one duplicated window.
    */
  def duplicatedSpans(
      df: DataFrame, idCol: String, textCol: String,
      w: Int = 20, stride: Int = 10): DataFrame = {
    require(w > 0 && stride > 0 && stride <= w, "need 0 < stride <= w")
    // Persisted: the window-hash table feeds BOTH the duplicated-hash
    // aggregate and the join back — without it the tokenize+explode+md5
    // subtree runs twice (two corpus passes). Same pattern as the
    // minhash signature table above; released by the caller via PlanCache.
    val wins = graft.core.PlanCache.persist(df
      .select(col(idCol), TextPrimitives.words(col(textCol)).as("ws"))
      .where(size(col("ws")) >= w)
      .select(col(idCol),
        explode(sequence(lit(0), size(col("ws")) - w, lit(stride))).as("off"),
        col("ws"))
      .select(col(idCol), col("off"),
        md5(array_join(slice(col("ws"), col("off") + 1, lit(w)), " ")).as("h")))
    val dup = wins.groupBy(col("h"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .where(col("nd") >= 2)
      .select(col("h"))
    val marked = wins.join(dup, "h")
      .withColumn("prev_end",
        max(col("off") + w).over(Window.partitionBy(col(idCol)).orderBy(col("off"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("is_new",
        when(col("prev_end").isNull || col("off") > col("prev_end"), 1).otherwise(0))
      .withColumn("span_id",
        sum(col("is_new")).over(Window.partitionBy(col(idCol)).orderBy(col("off"))))
    marked.groupBy(col(idCol), col("span_id"))
      .agg((max(col("off")) + w - min(col("off"))).as("span_len"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dup_spans"), sum(col("span_len")).as("dup_tokens"))
  }

  /** Cross-shard near-dup detection — the continual-pretraining shape:
    * which INCOMING documents are near-duplicates of the EXISTING
    * corpus? Same shingle→MinHash→band→bucket pipeline as
    * [[minhashLshPairs]], but the bucket join is strictly
    * existing × incoming — never existing × existing, so appending a
    * shard to a 100 TB corpus costs O(|incoming| × bands) join rows
    * plus one pass over the existing side's signatures (which a real
    * deployment would have materialized at ingest; see
    * VectorTable's persisted-index pattern). Candidates are verified by
    * exact Jaccard ≥ `threshold`.
    *
    * Returns one row per flagged incoming doc: (idCol, n_matches,
    * best_jaccard). */
  def crossShardNearDups(
      existing: DataFrame, incoming: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, threshold: Double): DataFrame = {
    def sigs(df: DataFrame) = graft.core.PlanCache.persist(
      minhashSignatures(df, idCol, textCol, n, bands * rowsPerBand)
        .where(size(col("sh")) > 0)
        .withColumn("bk", TextExprs.bandKeys(col("sig"), bands, rowsPerBand)))
    val ex = sigs(existing)
    val in = sigs(incoming)
    def buckets(s: DataFrame, as: String) = s
      .select(col(idCol).as(as), posexplode(col("bk")).as(Seq("band", "key")))
    val cand = buckets(ex, "id_ex").join(buckets(in, "id_new"), Seq("band", "key"))
      .select(col("id_ex"), col("id_new"))
      .distinct()
    cand
      .join(ex.select(col(idCol).as("id_ex"), col("sh").as("sh_ex")), Seq("id_ex"))
      .join(in.select(col(idCol).as("id_new"), col("sh").as("sh_new")), Seq("id_new"))
      .select(col("id_new"), col("id_ex"),
        RoundPortableExpr.r(jaccard(col("sh_ex"), col("sh_new")), 4).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .groupBy(col("id_new"))
      .agg(count(lit(1)).as("n_matches"), max(col("jaccard")).as("best_jaccard"))
  }

  /** Deterministic centroid seeds for [[semanticDedup]]: the k rows with
    * the smallest ids, as (cluster = id, centroid = embedding). A
    * TakeOrderedAndProject, so only k rows ever leave the executors. The
    * oracle-portable stand-in for fitted k-means centroids — at scale
    * you'd pass MLlib KMeans centers (any small (cluster, centroid)
    * DataFrame works; see SemanticDedupSpec's fitted-KMeans path). */
  def seedCentroids(df: DataFrame, idCol: String, embCol: String, k: Int): DataFrame =
    df.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("cluster"), col(embCol).as("centroid"))

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication — cluster embeddings, then inside each cluster drop
    * members that have a near-duplicate (cosine distance ≤
    * `pairThreshold`) which the keep rule prefers. Per the paper, the
    * survivor of a near-dup relation is the member with the LOWEST
    * similarity to its centroid (largest distance — keeps the less
    * typical, more informative example); ties break to the smaller id.
    * The paper's per-group rule is applied as pairwise dominance (a
    * member is dropped iff SOME preferred near-dup neighbor exists) —
    * deterministic and closure-free, so both engines can express it.
    *
    * Scale shape (100 TB): `centroids` is small (k rows) and broadcast —
    * assignment is a map-side cross join + one row_number window keyed
    * by the row id (linear shuffle). The within-cluster self-join is the
    * SemDeDup design point: k scales with the corpus (k ≈ n/E[cluster
    * size]), so per-reducer pair work is bounded by cluster², never
    * global n². Assignment distances are rounded to 6 dp before ranking
    * so the argmin is engine-portable.
    *
    * Returns per-cluster audit rows: (cluster, n_members, n_dropped,
    * mean_cdist). */
  def semanticDedup(
      df: DataFrame, idCol: String, embCol: String,
      centroids: DataFrame, pairThreshold: Double): DataFrame = {
    val asn = df.select(col(idCol), col(embCol))
      .crossJoin(broadcast(centroids))
      .select(col(idCol), col(embCol), col("cluster"),
        RoundPortableExpr.r(
          VectorFunctions.cosineDistance(col(embCol), col("centroid")), 6).as("cdist"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("cdist"), col("cluster"))))
      .where(col("rn") === 1)
      .drop("rn", "centroid")
    // Persisted: the assignment table feeds both sides of the
    // within-cluster join AND the final stats scan; released by the
    // materializing caller via PlanCache.
    val asnP = graft.core.PlanCache.persist(asn)
    val a = asnP.select(col(idCol).as("id_a"), col(embCol).as("emb_a"),
      col("cluster"), col("cdist").as("cdist_a"))
    val b = asnP.select(col(idCol).as("id_b"), col(embCol).as("emb_b"),
      col("cluster"), col("cdist").as("cdist_b"))
    val dropped = a.join(b, Seq("cluster"))
      .where(col("id_a") =!= col("id_b") &&
        RoundPortableExpr.r(
          VectorFunctions.cosineDistance(col("emb_a"), col("emb_b")), 4) <= pairThreshold &&
        (col("cdist_b") > col("cdist_a") ||
          (col("cdist_b") === col("cdist_a") && col("id_b") < col("id_a"))))
      .select(col("cluster"), col("id_a").as(idCol))
      .distinct()
    asnP.join(dropped.withColumn("__d", lit(1)), Seq("cluster", idCol), "left")
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        count(col("__d")).as("n_dropped"),
        RoundPortableExpr.r(avg(col("cdist")), 4).as("mean_cdist"))
  }
}

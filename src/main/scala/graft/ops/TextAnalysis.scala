package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TextPrimitives._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All are
  * pure column expressions (whole-stage codegen, no UDFs), each with a
  * DuckDB-SQL twin for the differential oracle. */
object TextAnalysis {

  /** Default document-frequency cap for [[decontaminate]]'s
    * boilerplate guard. A winnowing fingerprint occurring in more than
    * this many DISTINCT documents is template boilerplate, not
    * benchmark leakage, and is the fingerprint join's quadratic head
    * (T train × B bench rows per shared fp). On by default — the
    * uncapped join at 100× shuffled 245×-of-linear and spilled 9.5 GB
    * (BENCHNOTES r5); exact-overlap semantics remain available via
    * `maxDf = None` (registry baseline `sim_decontaminate_exact`). */
  val DefaultMaxDf: Int = 200

  /** Tiny per-language stopword lexicons for the n-gram/stopword
    * language-ID heuristic. Deterministic and oracle-expressible; a
    * production system would swap in larger lexicons — the operator
    * shape (array-overlap scoring over tokenized text) is the point. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "un", "une", "pour", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "un", "una", "para", "en"))

  val langs = Seq("en", "de", "fr", "es") // fixed order = deterministic ties

  /** Language ID oracle twin: hit-count of each language's stopword list
    * over the token multiset; highest count wins (first in `langs` order
    * on tie), "und" (undetermined) when nothing hits. */
  def langIdSqlCase(wsSql: String): String = {
    def hit(l: String) =
      s"len(list_filter($wsSql, w -> w IN (${stopwords(l).map(s => s"'$s'").mkString(", ")})))"
    val best = s"greatest(${langs.map(hit).mkString(", ")})"
    val arms = langs.map(l => s"WHEN ${hit(l)} = $best AND $best > 0 THEN '$l'").mkString(" ")
    s"CASE $arms ELSE 'und' END"
  }

  /** Heuristic quality score in [0,1] (oracle twin): blend of length
    * band, mean word length band, alphanumeric ratio and stopword ratio.
    * The exact blend is arbitrary (as in any production quality filter);
    * what matters is that it's deterministic and engine-portable. */
  def qualitySqlSelect(textSql: String, wsSql: String): String = {
    val nChars = s"length($textSql)"
    val nWords = s"len($wsSql)"
    val meanWordLen = s"($nChars - $nWords + 1)::DOUBLE / $nWords"
    val alnumRatio = s"CASE WHEN $nChars = 0 THEN CAST(0.0 AS DOUBLE) " +
      s"ELSE length(regexp_replace($textSql, '[^a-z0-9]', '', 'g'))::DOUBLE / $nChars END"
    val stopRatio =
      s"len(list_filter($wsSql, w -> w IN (${stopwords("en").map(s => s"'$s'").mkString(", ")})))::DOUBLE / $nWords"
    s"""$nWords AS n_words,
       |round($meanWordLen, 4) AS mean_word_len,
       |round($alnumRatio, 4) AS alnum_ratio,
       |round($stopRatio, 4) AS stop_ratio,
       |${qualityExprSql(textSql, wsSql)} AS quality""".stripMargin
  }

  /** Just the rounded quality blend (the `quality` column of
    * [[qualitySqlSelect]]) as a standalone expression, for twins that
    * aggregate over the score rather than projecting the full profile. */
  def qualityExprSql(textSql: String, wsSql: String): String = {
    val nChars = s"length($textSql)"
    val nWords = s"len($wsSql)"
    val meanWordLen = s"($nChars - $nWords + 1)::DOUBLE / $nWords"
    val alnumRatio = s"CASE WHEN $nChars = 0 THEN CAST(0.0 AS DOUBLE) " +
      s"ELSE length(regexp_replace($textSql, '[^a-z0-9]', '', 'g'))::DOUBLE / $nChars END"
    val stopRatio =
      s"len(list_filter($wsSql, w -> w IN (${stopwords("en").map(s => s"'$s'").mkString(", ")})))::DOUBLE / $nWords"
    // CAST(... AS DOUBLE) everywhere: DuckDB parses bare 0.3 as DECIMAL,
    // Spark as double — the arithmetic must match bit-for-bit.
    val lenScore = s"CASE WHEN $nChars BETWEEN 100 AND 2000 THEN CAST(1.0 AS DOUBLE) WHEN $nChars BETWEEN 30 AND 99 THEN CAST(0.5 AS DOUBLE) ELSE CAST(0.2 AS DOUBLE) END"
    val wordScore = s"CASE WHEN $meanWordLen BETWEEN 3.0 AND 10.0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.4 AS DOUBLE) END"
    s"round($lenScore * CAST(0.3 AS DOUBLE) + $wordScore * CAST(0.2 AS DOUBLE) + " +
      s"$alnumRatio * CAST(0.3 AS DOUBLE) + $stopRatio * CAST(0.2 AS DOUBLE), 4)"
  }

  /** Token counts (oracle twin): whitespace words plus a BPE-ish subword
    * estimate (letter runs, digits, and punctuation as separate tokens). */
  def tokenSqlSelect(textSql: String, wsSql: String): String =
    s"""len($wsSql) AS ws_tokens,
       |len(regexp_extract_all(lower($textSql), '[a-z]+|[0-9]|[^a-z0-9\\s]')) AS bpe_tokens""".stripMargin

  /** Content fingerprint oracle twin: md5 over the sorted distinct token
    * set — invariant to word order and duplication (a canonical
    * bag-of-words fingerprint for clustering/exact-bag dedup). */
  def fingerprintSql(wsSql: String): String =
    s"md5(array_to_string(list_sort(list_distinct($wsSql)), ' '))"

  /** TRAINED language ID (Cavnar & Trenkle 1994, the textcat n-gram
    * rank-profile method — the n-gram upgrade of the fixed stopword
    * lexicon in [[langIdSqlCase]]): per-language profiles are the
    * `topM` character n-grams of the training split ranked by
    * frequency (weight = topM + 1 − rank); a test document scores each
    * language as Σ tf(tri) · weight(lang, tri) and predicts the argmax
    * (ties → lexicographically smaller language; zero overlap →
    * "und"). Returns the confusion census (lang, pred_lang, n).
    *
    * Scale shape: one corpus explode feeding two partial aggregations
    * ((lang, tri) for the profile, (doc, tri) for the tf), the profile
    * is langs · topM rows BROADCAST into the scoring join, and the
    * argmax is a per-doc WindowGroupLimit — all linear in corpus
    * tokens, nothing all-pairs. */
  def langIdNgram(docs: DataFrame, idCol: String, langCol: String,
      textCol: String, isTrain: Column, n: Int = 3, topM: Int = 100): DataFrame = {
    val base = graft.core.PlanCache.persist(
      docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        isTrain.as("tr"),
        graft.functions.TextExprs.charNgrams(col(textCol), n).as("tris")))
    val exploded = base
      .select(col("doc_id"), col("lang"), col("tr"), explode(col("tris")).as("tri"))
    val wr = Window.partitionBy("lang").orderBy(col("cnt").desc, col("tri").asc)
    val profile = exploded.where(col("tr"))
      .groupBy(col("lang"), col("tri")).agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(wr)).where(col("rank") <= topM)
      .select(col("lang").as("cand"), col("tri"),
        (lit(topM + 1) - col("rank")).cast("long").as("wt"))
    val tf = exploded.where(!col("tr"))
      .groupBy(col("doc_id"), col("tri")).agg(count(lit(1)).as("tf"))
    val wp = Window.partitionBy("doc_id").orderBy(col("score").desc, col("cand").asc)
    val pred = tf.join(broadcast(profile), Seq("tri"))
      .groupBy(col("doc_id"), col("cand")).agg(sum(col("tf") * col("wt")).as("score"))
      .withColumn("rk", row_number().over(wp)).where(col("rk") === 1)
      .select(col("doc_id"), col("cand").as("pred"))
    base.where(!col("tr")).select(col("doc_id"), col("lang"))
      .join(pred, Seq("doc_id"), "left")
      .select(col("lang"), coalesce(col("pred"), lit("und")).as("pred_lang"))
      .groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("n"))
  }

  /** DuckDB twin of [[langIdNgram]]. `trainSql` is the boolean train
    * predicate over `documents` columns. */
  def langIdNgramSql(trainSql: String, n: Int = 3, topM: Int = 100): String =
    s"""WITH base AS (
       |  SELECT doc_id, lang, $trainSql AS tr,
       |         unnest(list_transform(range(1, len(lower(text)) - ${n - 2}),
       |                i -> substr(lower(text), CAST(i AS INTEGER), $n))) AS tri
       |  FROM documents),
       |prof AS (
       |  SELECT lang AS cand, tri, CAST($topM + 1 - rank AS BIGINT) AS wt FROM (
       |    SELECT lang, tri, row_number() OVER (
       |             PARTITION BY lang ORDER BY count(*) DESC, tri) AS rank
       |    FROM base WHERE tr GROUP BY lang, tri)
       |  WHERE rank <= $topM),
       |tf AS (SELECT doc_id, tri, count(*) AS tf FROM base WHERE NOT tr GROUP BY 1, 2),
       |pred AS (
       |  SELECT doc_id, cand AS pred FROM (
       |    SELECT doc_id, cand, row_number() OVER (
       |             PARTITION BY doc_id ORDER BY sum(tf * wt) DESC, cand) AS rk
       |    FROM tf JOIN prof USING (tri) GROUP BY doc_id, cand)
       |  WHERE rk = 1),
       |test AS (SELECT DISTINCT doc_id, lang FROM documents WHERE NOT ($trainSql))
       |SELECT lang, coalesce(pred, 'und') AS pred_lang, CAST(count(*) AS BIGINT) AS n
       |FROM test LEFT JOIN pred USING (doc_id)
       |GROUP BY 1, 2""".stripMargin

  /** Full document profile in one kernel pass per row
    * ([[graft.functions.TextProfileExpr]]). */
  def profile(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        graft.functions.TextProfileExpr.col(col(textCol), stopwords, langs).as("p"))
      .select(col(idCol), col("p.*"))

  /** Winnowing fingerprints per document: rolling char-k-gram hashes →
    * sliding-window minima (MOSS). Any shared substring of length ≥
    * k + w − 1 shares a fingerprint, so exploding these and grouping by
    * fingerprint finds COPIED PASSAGES across documents that
    * whole-document MinHash misses. Shuffle shape at scale: (fingerprint,
    * doc) pairs — same key-partitioned join pattern as the LSH buckets,
    * never all-pairs. */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame =
    df.select(col(idCol),
      graft.functions.TextExprs.winnow(col(textCol), k, w).as("fingerprints"))

  /** Benchmark decontamination: training docs sharing ≥ `minShared`
    * winnowing fingerprints with any benchmark doc — the
    * substring-level leak detector whole-doc minhash misses. `isBench`
    * (boolean Column over `docs`) splits the corpus; the candidate
    * generation is an equi-join on fingerprint, never all-pairs, with
    * the (small at production scale) bench side broadcast.
    *
    * `maxDf`: drop fingerprints occurring in more than maxDf DISTINCT
    * docs before joining. Such fingerprints are template boilerplate,
    * not leakage — and they are the join's quadratic heads: a fp in T
    * train × B bench docs emits T×B rows (the 100× stress measured
    * 245×-of-linear shuffle + spill uncapped vs exactly linear capped,
    * BENCHNOTES r5). The guard is ON by default ([[DefaultMaxDf]]);
    * pass `maxDf = None` only for the exact-overlap baseline, and only
    * inside that measured envelope — at 100× the uncapped join
    * shuffled 245×-of-linear (5.2 GB) and spilled 9.5 GB to disk.
    * The keep-set is persisted via [[graft.core.PlanCache]]
    * (it feeds both join branches; without it Catalyst duplicates the
    * whole winnow+aggregate subtree into each).
    *
    * Returns (idCol, n_bench_hits, n_shared_fp) for flagged train docs;
    * n_shared_fp counts occurrence pairs (a fp appearing twice in both
    * sides contributes 4), matching the winnowing-overlap literature. */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String, isBench: Column,
      k: Int = 8, w: Int = 4, minShared: Int = 4,
      maxDf: Option[Int] = Some(DefaultMaxDf)): DataFrame = {
    val fps = docs.select(col(idCol), isBench.as("__is_bench"),
      explode(graft.functions.TextExprs.winnow(col(textCol), k, w)).as("fp"))
    val pruned = maxDf match {
      case None => fps
      case Some(cap) =>
        val keep = graft.core.PlanCache.persist(
          fps.groupBy(col("fp")).agg(countDistinct(col(idCol)).as("fp_df"))
            .where(col("fp_df") <= cap).select(col("fp")))
        fps.join(keep, "fp")
    }
    val train = pruned.where(!col("__is_bench")).select(col(idCol), col("fp"))
    val bench = pruned.where(col("__is_bench"))
      .select(col(idCol).as("__bench_id"), col("fp"))
    train.join(broadcast(bench), "fp")
      .groupBy(col(idCol))
      .agg(countDistinct(col("__bench_id")).as("n_bench_hits"),
        count(lit(1)).as("n_shared_fp"))
      .where(col("n_shared_fp") >= minShared)
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169): score every document by its importance weight
    * under hashed bag-of-words unigram models of a TARGET domain vs the
    * RAW corpus, then keep the top-k. `log w(x) = Σ_tokens [ln p̂_t(b) −
    * ln p̂_s(b)]` over hashed token buckets `b = H(w) mod buckets`, with
    * add-1 smoothing on both models. Deterministic (no Gumbel noise —
    * the paper's resampling becomes top-k so both engines agree).
    *
    * Scale shape (100 TB): one tokenize+explode pass feeds (a) the two
    * bucket-count aggregates — `buckets` rows each, essentially free —
    * and (b) per-(doc, bucket) counts; the log-weight table is tiny and
    * broadcast back, so scoring is one linear groupBy(doc). The top-k is
    * a TakeOrderedAndProject. Ranking uses 6-dp-rounded scores (ties →
    * smaller id) so the cut is engine-portable.
    *
    * Returns the k selected rows as (idCol, dsir_score). */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int, topK: Int): DataFrame = {
    val bt = graft.core.PlanCache.persist(
      docs.select(col(idCol), isTarget.as("__t"),
          explode(words(col(textCol))).as("w"))
        .select(col(idCol), col("__t"),
          (hexLong(col("w")) % buckets).as("b")))
    val src = bt.groupBy(col("b")).agg(count(lit(1)).as("cs"))
    val tgt = bt.where(col("__t")).groupBy(col("b")).agg(count(lit(1)).as("ct"))
    // totals over the tiny bucket tables (≤ `buckets` rows), not the corpus
    val tot = Window.partitionBy()
    val lw = src.join(tgt, Seq("b"), "left")
      .na.fill(0L, Seq("ct"))
      .withColumn("ns", sum(col("cs")).over(tot))
      .withColumn("nt", sum(col("ct")).over(tot))
      .select(col("b"),
        (log((col("ct") + 1).cast("double") / (col("nt") + buckets)) -
          log((col("cs") + 1).cast("double") / (col("ns") + buckets))).as("lw"))
    bt.groupBy(col(idCol), col("b")).agg(count(lit(1)).as("n"))
      .join(broadcast(lw), "b")
      .groupBy(col(idCol))
      .agg(sum(col("n") * col("lw")).as("s"))
      .orderBy(graft.functions.RoundPortableExpr.r(col("s"), 6).desc, col(idCol))
      .limit(topK)
      .select(col(idCol), graft.functions.RoundPortableExpr.r(col("s"), 4).as("dsir_score"))
  }

  /** Vocabulary induction + out-of-vocabulary audit: fit a top-V token
    * vocabulary on the corpus (count-ranked, ties to the
    * lexicographically smaller token — deterministic cut), then measure
    * each document's OOV rate against it, aggregated per `groupCol`.
    * The tokenizer-fitting shape: V is the budget a subword tokenizer
    * would get, and the OOV tail tells you which slices of the corpus
    * the vocabulary underserves.
    *
    * Scale shape (100 TB): one tokenize+explode pass feeds both the
    * vocabulary aggregate (token-keyed shuffle, then a top-V
    * TakeOrderedAndProject — only V rows reach the driver side) and the
    * per-doc scoring join, where the vocabulary is broadcast. Everything
    * else is linear groupBys.
    *
    * Returns (groupCol, n_docs, avg_oov, max_oov). */
  def vocabOov(docs: DataFrame, idCol: String, groupCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val toks = graft.core.PlanCache.persist(
      docs.select(col(idCol), col(groupCol), explode(words(col(textCol))).as("w")))
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(vocabSize)
      .select(col("w"), lit(1).as("__v"))
    val perDoc = toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col(idCol), col(groupCol))
      .agg(((count(lit(1)) - count(col("__v"))).cast("double") / count(lit(1))).as("oov"))
    perDoc.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        graft.functions.RoundPortableExpr.r(avg(col("oov")), 4).as("avg_oov"),
        graft.functions.RoundPortableExpr.r(max(col("oov")), 4).as("max_oov"))
  }

  /** Gopher quality rules (Rae et al. 2021 Appendix A) as per-doc
    * booleans over one [[graft.functions.GopherStatsExpr]] kernel pass:
    * word count in [minWords, maxWords], mean word length in [3, 10],
    * symbol-to-word ratio ≤ 0.1, ≥ 80% of words alphabetic, ≥ 2 distinct
    * canonical stop words. Keeps every input row (flags, not a filter)
    * so callers can audit rejection reasons before dropping. */
  def gopherQuality(df: DataFrame, idCol: String, textCol: String,
      minWords: Long = 50, maxWords: Long = 100000): DataFrame =
    df.withColumn("g", graft.functions.GopherStatsExpr.col(col(textCol)))
      .withColumn("r_words", col("g.n_words").between(minWords, maxWords))
      .withColumn("r_wlen", col("g.mean_word_len").between(3.0, 10.0))
      .withColumn("r_symbol", col("g.symbol_ratio") <= 0.1)
      .withColumn("r_alpha", col("g.alpha_frac") >= 0.8)
      .withColumn("r_stop", col("g.stop_hits") >= 2)
      .drop("g")

  /** Eval-set contamination report — the REVERSE direction of
    * [[decontaminate]]: instead of flagging training docs to drop, audit
    * each benchmark doc for how dirty it already is (the GPT-3 Appendix
    * C / PaLM protocol: an eval example is "dirty" if it shares at least
    * one exact word n-gram with any training document). Overlap here is
    * EXACT n-grams (every gram, not winnowing's subsample) because the
    * point is a per-eval-doc audit, not a cheap corpus-wide screen.
    *
    * Scale shape (100 TB train corpus, fixed-size eval set): grams are
    * hashed to 60-bit longs map-side before the join so the shuffle
    * carries 8-byte keys, the bench side is broadcast (eval sets are
    * thousands of docs, never corpus-scale), and the train side never
    * aggregates globally — the only groupBy is per bench doc, bounded by
    * the eval-set size. `maxDf` drops grams present in more than maxDf
    * distinct docs before joining — exactly [[decontaminate]]'s
    * boilerplate/quadratic-head guard (an n-gram in T train × B bench
    * docs emits T×B join rows); the keep-set is persisted via
    * [[graft.core.PlanCache]] because it feeds both join branches.
    *
    * Returns one row per DIRTY bench doc: (bench_id, n_dirty_train =
    * distinct training docs sharing ≥1 gram, n_shared_grams = distinct
    * shared grams). Clean bench docs are absent — the consumer treats
    * the report as a blocklist/discount list (the GPT-3 "clean subset"
    * is the complement). */
  def evalContamination(docs: DataFrame, idCol: String, textCol: String,
      isBench: Column, n: Int = 8, maxDf: Option[Int] = None): DataFrame = {
    val grams = docs.select(col(idCol), isBench.as("__is_bench"),
      explode(graft.functions.TextExprs.shingles(col(textCol), n)).as("gs"))
      .select(col(idCol), col("__is_bench"), hexLong(col("gs")).as("g"))
    val pruned = maxDf match {
      case None => grams
      case Some(cap) =>
        val keep = graft.core.PlanCache.persist(
          grams.groupBy(col("g")).agg(countDistinct(col(idCol)).as("g_df"))
            .where(col("g_df") <= cap).select(col("g")))
        grams.join(keep, "g")
    }
    val train = pruned.where(!col("__is_bench"))
      .select(col(idCol).as("__train_id"), col("g"))
    val bench = pruned.where(col("__is_bench"))
      .select(col(idCol).as("bench_id"), col("g"))
    train.join(broadcast(bench), "g")
      .groupBy(col("bench_id"))
      .agg(countDistinct(col("__train_id")).as("n_dirty_train"),
        countDistinct(col("g")).as("n_shared_grams"))
  }
}

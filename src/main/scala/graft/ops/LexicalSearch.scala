package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Okapi BM25 lexical ranking and reciprocal-rank fusion — the keyword
  * half of hybrid (lexical + vector) retrieval, the search mode the
  * reference's vector-only `query` (/root/reference/duckvdb.py:110-116)
  * cannot express but every production vector store pairs with ANN.
  *
  * Scale shape (the whole point at 100 TB):
  *   - Corpus stats (N, avgdl) are ONE aggregate row, broadcast into the
  *     scoring join — a shuffle-free full scan, never a wide shuffle.
  *   - Docs containing no query term are pre-filtered with
  *     `arrays_overlap` BEFORE the token explode, so the exploded
  *     relation is proportional to MATCHING docs, not the corpus.
  *   - Document frequencies are a ≤|query-terms|-row aggregate,
  *     broadcast back into the per-(doc,term) scores.
  *   - Final top-k is orderBy+limit → TakeOrderedAndProject (per-partition
  *     heaps, no global sort).
  * BM25 parameters follow Robertson & Walker (k1 tf saturation, b length
  * normalization); idf = ln(1 + (N - df + 0.5)/(df + 0.5)) is the
  * Lucene-style non-negative variant.
  */
object LexicalSearch {

  /** Per-document BM25 relevance of `terms`: (idCol, score) for every doc
    * containing at least one query term; `score` is an unrounded double
    * (callers round portably before comparing/ordering). */
  def bm25(docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = docs.select(col(idCol), TextPrimitives.words(col(textCol)).as("ws"))
      .withColumn("dl", size(col("ws")).cast("double"))
    // one row: corpus size + average doc length, broadcast everywhere
    val stats = toks.agg(count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl"))
    val termArray = array(terms.map(lit): _*)
    // persisted: tf feeds BOTH the document-frequency aggregate and
    // the scoring join — without it Spark re-runs the scan+explode
    // subtree for each, i.e. two corpus passes instead of one.
    // Registered with PlanCache so the materializing caller releases it.
    val tf = graft.core.PlanCache.persist(toks
      .where(arrays_overlap(col("ws"), termArray)) // prune before explode
      .select(col(idCol), col("dl"), explode(col("ws")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf")))
    val dfreq = tf.groupBy(col("term"))
      .agg(countDistinct(col(idCol)).cast("double").as("df"))
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col(idCol), (idf * col("tf") * lit(k1 + 1.0) / norm).as("term_score"))
      .groupBy(col(idCol))
      .agg(sum(col("term_score")).as("score"))
  }

  /** Top-k shortlist with dense 1-based ranks: orderBy+limit first
    * (TakeOrderedAndProject — per-partition heaps over the full input),
    * THEN row_number over the k-row shortlist. The unpartitioned window
    * is deliberate and safe: it sees exactly k rows, never the corpus. */
  def rankedTopK(scored: DataFrame, idCol: String, order: Seq[Column], k: Int): DataFrame = {
    scored.orderBy(order: _*).limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)))
      .select(col(idCol), col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack et al.): full-outer join two ranked
    * shortlists on `idCol`, rrf = Σ 1/(c + rank) over the lists the doc
    * appears in. Both inputs are k-row shortlists, so the join is
    * trivially broadcastable. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, c: Int = 60): DataFrame = {
    val leg = (r: Column) =>
      when(r.isNotNull, lit(1.0) / (lit(c.toDouble) + r.cast("double"))).otherwise(lit(0.0))
    a.withColumnRenamed("rank", "rank_a")
      .join(b.withColumnRenamed("rank", "rank_b"), Seq(idCol), "full_outer")
      .select(col(idCol), (leg(col("rank_a")) + leg(col("rank_b"))).as("rrf"))
  }

  // ---- DuckDB oracle twins (same algorithm, same hash-free arithmetic) ----

  /** CTE body computing (doc_id, score) BM25 over `documents.text` for
    * literal `terms` — the differential twin of [[bm25]]. */
  def bm25Sql(terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): String = {
    // single quotes doubled so a term can't break out of (or inject
    // into) the oracle's string literal
    val inList = terms.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    s"""toks AS (SELECT doc_id, ${TextPrimitives.wordsSql("text")} AS ws FROM documents),
       |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(len(ws)) AS avgdl FROM toks),
       |tok AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl, unnest(ws) AS term FROM toks),
       |tf AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf FROM tok
       |       WHERE term IN ($inList) GROUP BY 1, 2, 3),
       |dfreq AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY 1),
       |bm25 AS (SELECT tf.doc_id,
       |       sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
       |           * tf.tf * ${k1 + 1.0} / (tf.tf + $k1 * (1.0 - $b + $b * tf.dl / s.avgdl))) AS score
       |FROM tf JOIN dfreq d USING (term), stats s
       |GROUP BY 1)""".stripMargin
  }

  /** Materialized inverted index: one row per distinct term with its
    * document frequency and the first `prefixLen` posting ids (the
    * dictionary+postings layout BM25/phrase search would serve from, and
    * the vocabulary census a tokenizer-training pass reads).
    *
    * Scale shape: term presence (doc, term) comes from a map-side
    * `array_distinct` before the explode, so the shuffle carries each
    * (doc, term) once, not per occurrence. df is a map-side-combinable
    * count — NEVER a `collect_list` of the full posting list, which at
    * corpus scale is gigabytes for a stopword term; the stored prefix is
    * bounded by `prefixLen` via a rank window (WindowGroupLimit pushes
    * per-partition heaps), and both aggregates share the one exploded
    * shuffle. Postings serialize as a comma-joined string (driver-side
    * checker can't hash ARRAY columns).
    *
    * Returns (term, df, postings). */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      prefixLen: Int = 10): DataFrame = {
    val toks = graft.core.PlanCache.persist(
      docs.select(col(idCol),
          explode(array_distinct(TextPrimitives.words(col(textCol)))).as("term"))
        .where(col("term") =!= ""))
    val dfreq = toks.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("term").orderBy(col(idCol).asc)
    val prefix = toks.withColumn("rn", row_number().over(w))
      .where(col("rn") <= prefixLen)
      .groupBy("term")
      .agg(array_join(transform(array_sort(collect_list(col(idCol))),
        x => x.cast("string")), ",").as("postings"))
    dfreq.join(prefix, "term")
  }

  /** Positional phrase search: documents containing the exact
    * consecutive phrase, scored by occurrence count — the positional-
    * inverted-index query (Manning IR §2.4) that term-presence search
    * (BM25, [[invertedIndex]]) cannot express: "vector query" must NOT
    * match a doc with the two words far apart.
    *
    * Scale shape: the (doc, pos, term) postings are pruned to the
    * phrase's own terms with an `isin` BEFORE anything shuffles, so
    * each join leg is one term's posting list — O(df(term)), never the
    * corpus token stream. Adjacency is chained as equi-joins on
    * (doc, pos − offset): leg i matches term i at start+i, exactly the
    * intersect-by-(docId, position) merge a serving-time positional
    * index performs. The pruned postings are persisted once and shared
    * by every leg (registered with PlanCache; the materializing caller
    * releases). Returns (idCol, n_hits) for matching docs. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "phraseSearch needs a multi-word phrase")
    val pos = graft.core.PlanCache.persist(
      docs.select(col(idCol),
          posexplode(TextPrimitives.words(col(textCol))).as(Seq("pos", "term")))
        .where(col("term").isin(phrase: _*)))
    val legs = phrase.zipWithIndex.map { case (t, i) =>
      pos.where(col("term") === t).select(col(idCol), (col("pos") - i).as("start"))
    }
    legs.reduce(_.join(_, Seq(idCol, "start")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** DuckDB twin of [[phraseSearch]] over `documents`, as a CTE block
    * ending in `ph(doc_id, n_hits)`. */
  def phraseSearchSql(phrase: Seq[String]): String = {
    val legs = phrase.zipWithIndex.map { case (t, i) =>
      val lit = t.replace("'", "''")
      s"pl$i AS (SELECT doc_id, pos - $i AS start FROM ppos WHERE term = '$lit')"
    }
    val joined = (1 until phrase.size)
      .foldLeft("pl0") { (acc, i) => s"$acc JOIN pl$i USING (doc_id, start)" }
    s"""pw AS (SELECT doc_id, ${TextPrimitives.wordsSql("text")} AS ws FROM documents),
       |ppos AS (SELECT doc_id, t.i AS pos, ws[t.i + 1] AS term
       |         FROM pw, unnest(range(len(ws))) t(i)
       |         WHERE ws[t.i + 1] IN (${phrase.map(t => s"'${t.replace("'", "''")}'").mkString(", ")})),
       |${legs.mkString(",\n")},
       |ph AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
       |       FROM $joined GROUP BY 1)""".stripMargin
  }

  /** DuckDB twin of [[invertedIndex]] over `documents`, as a CTE block
    * ending in `inv(term, df, postings)`. */
  def invertedIndexSql(prefixLen: Int = 10): String =
    s"""itoks AS (SELECT doc_id, unnest(list_distinct(${TextPrimitives.wordsSql("text")})) AS term
       |          FROM documents),
       |it AS (SELECT doc_id, term FROM itoks WHERE term <> ''),
       |idf AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM it GROUP BY 1),
       |ipre AS (SELECT term, doc_id FROM (
       |           SELECT term, doc_id,
       |                  row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
       |           FROM it) WHERE rn <= $prefixLen),
       |ip AS (SELECT term,
       |              array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY doc_id), ',') AS postings
       |       FROM ipre GROUP BY 1),
       |inv AS (SELECT idf.term, idf.df, ip.postings FROM idf JOIN ip USING (term))""".stripMargin
}

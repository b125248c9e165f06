package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level corpus curation — the two standard web-corpus cleaning
  * passes that operate BELOW document granularity:
  *
  *  1. [[c4LineFilter]] — C4-style per-line rule filtering (Raffel et
  *     al. 2020 §2.2: drop lines failing terminal-punctuation / length /
  *     blocklist rules, then drop documents with too few surviving
  *     lines). Pure map-side: one projection of builtin higher-order
  *     functions per document, no shuffle, fully codegen'd.
  *
  *  2. [[boilerplateLineDedup]] — RefinedWeb/CCNet-style removal of
  *     lines repeated across many documents (Penedo et al. 2023 §3.3:
  *     navigation chrome, cookie banners, licence footers). Corpus-wide:
  *     a per-line document-frequency aggregate finds the boilerplate
  *     set, which is SMALL by construction (boilerplate = the head of
  *     the line-frequency distribution), so the removal join broadcasts.
  *
  * The fixture's documents are single-line, so "lines" are synthesized
  * as fixed `lw`-word groups via [[TextPrimitives.lineGroups]] — the
  * rule MACHINERY (line split → per-line predicate / corpus df → filter
  * → reassemble in order) is the operator; the line delimiter is a
  * parameter.
  *
  * Scale shape at 100 TB: the C4 pass is embarrassingly parallel. The
  * boilerplate pass shuffles (line-hash → partial-agg count) once —
  * map-side combine collapses each partition's repeats before the wire —
  * then the frequent set (≪ distinct lines; bounded by docs/threshold)
  * broadcasts back for a map-side removal flag, and the per-document
  * reassembly groups on the SAME doc-id partitioning the explode
  * started from. Nothing is ever all-pairs and no stage holds more than
  * one document's lines in a comparator.
  *
  * Reference scope: the reference engine has no sub-document curation
  * (documents are opaque rows — /root/reference/duckvdb.py); these are
  * §7-class scale extensions for the training-data pipeline.
  */
object LineCuration {

  /** C4 rule filter. A line survives iff it has ≥ `minWords` words,
    * contains at least one of `required` (C4's "terminal punctuation"
    * analogue for the punctuation-free fixture: a stopword), and none
    * of `blocked` (C4's bad-word / "javascript" line drop). A document
    * passes iff ≥ `minKeptLines` lines survive (C4 drops docs with < 3
    * sentences). Output: per-doc line census + md5 of the reassembled
    * cleaned text (kept lines joined by '\n', in order). */
  def c4LineFilter(docs: DataFrame, idCol: String, textCol: String,
      lw: Int, minWords: Int, required: Seq[String], blocked: Seq[String],
      minKeptLines: Int): DataFrame = {
    val lg = TextPrimitives.lineGroups(TextPrimitives.words(col(textCol)), lw)
    val req = array(required.map(lit): _*)
    val kept = filter(lg, l =>
      (size(l) >= minWords) && arrays_overlap(l, req) &&
        !blocked.map(b => array_contains(l, b)).reduce(_ || _))
    docs.select(col(idCol),
      size(lg).as("n_lines"),
      size(kept).as("n_kept"),
      (size(kept) >= minKeptLines).cast("int").as("doc_pass"),
      md5(array_join(transform(kept, l => array_join(l, " ")), "\n"))
        .as("cleaned_md5"))
  }

  /** Boilerplate line removal: lines whose document frequency exceeds
    * `pctDocs` percent of the corpus are dropped from EVERY document.
    * The threshold compare is kept in integer arithmetic
    * (`df * 100 > n_docs * pctDocs`) so both engines decide identically
    * at the boundary. Output: per-doc line census + md5 of the
    * surviving text (kept lines joined by '\n', original order).
    *
    * Plan shape: the exploded line table is computed ONCE and persisted
    * via [[graft.core.PlanCache]] — it feeds both the
    * document-frequency aggregate and the removal join, and without the
    * persist Catalyst duplicates the whole split+join kernel pass into
    * each branch (this was the single most expensive query in the r5
    * bench). The df aggregate and the removal join key on
    * `xxhash64(line)` — an 8-byte shuffle/broadcast key instead of the
    * full line text (a 64-bit collision would need ~2³² distinct lines
    * to become likely; at that scale switch the key to a 128-bit
    * digest). Line TEXT leaves the executors only inside the per-doc
    * md5 reassembly, partitioned by doc id. */
  def boilerplateLineDedup(docs: DataFrame, idCol: String, textCol: String,
      lw: Int, pctDocs: Int): DataFrame = {
    val lined = graft.core.PlanCache.persist(docs
      .select(col(idCol), posexplode(
        TextPrimitives.lineGroups(TextPrimitives.words(col(textCol)), lw))
        .as(Seq("pos", "lww")))
      .select(col(idCol), col("pos"), array_join(col("lww"), " ").as("line"))
      .withColumn("lh", xxhash64(col("line"))))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    // Boilerplate set: small by construction — broadcast it back.
    val frequent = lined.groupBy(col("lh"))
      .agg(countDistinct(col(idCol)).as("df"))
      .crossJoin(broadcast(total))
      .where(col("df") * 100 > col("n_docs") * pctDocs)
      .select(col("lh"), lit(1).as("boiler"))
    lined.join(broadcast(frequent), Seq("lh"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_lines"),
        sum(when(col("boiler").isNull, 1).otherwise(0)).cast("int").as("n_kept"),
        md5(array_join(
          transform(
            array_sort(collect_list(when(col("boiler").isNull,
              struct(col("pos"), col("line"))))),
            s => s.getField("line")),
          "\n")).as("kept_md5"))
  }
}

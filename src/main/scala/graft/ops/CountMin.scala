package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) over a token stream —
  * the bounded-memory point-frequency estimator that complements the
  * Misra-Gries heavy-hitter list (`functions.HeavyHitters`): MG answers
  * "which keys are frequent", CMS answers "how frequent is THIS key"
  * for any key, with a one-sided error (never under-counts,
  * over-counts by ≤ εN with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).
  *
  * Scale shape: the sketch is a d×w counter matrix expressed as a
  * `groupBy(i, bucket).count` — partial aggregation bounds the shuffle
  * to at most d·w rows PER MAP PARTITION regardless of corpus size, and
  * the final table is d·w rows total (the same mergeability argument as
  * every sketch in this engine: the shuffled state is the sketch, not
  * the data). Point queries join a keys×d literal frame against the
  * d·w-row sketch — broadcast, constant cost.
  *
  * Hashing: row i's bucket for token t is `H("cm" + i + ":" + t) mod w`
  * with the shared 60-bit md5 base hash ([[TextPrimitives.hexLong]]) —
  * d independent-enough hash functions with an exact DuckDB twin, so
  * the WHOLE sketch (not just its guarantees) is oracle-reproducible. */
object CountMin {

  /** The d×w sketch of the whitespace-token stream of `textCol`:
    * (i, bucket, c) with one row per non-empty counter. */
  def sketch(docs: DataFrame, textCol: String, d: Int, w: Int): DataFrame =
    docs.select(explode(TextPrimitives.words(col(textCol))).as("term"))
      .where(col("term") =!= "")
      .select(explode(sequence(lit(0), lit(d - 1))).as("i"), col("term"))
      .select(col("i"), (TextPrimitives.hexLong(
        concat(lit("cm"), col("i").cast("string"), lit(":"), col("term"))) % w).as("bucket"))
      .groupBy(col("i"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Point-frequency estimates for `keys`: (term, est) with
    * est = min over the d rows of the key's counter (0 if a counter is
    * empty — only possible when the key never occurred). */
  def estimates(sk: DataFrame, keys: Seq[String], d: Int, w: Int): DataFrame = {
    val spark = sk.sparkSession
    import spark.implicits._
    val q = keys.toDF("term")
      .select(col("term"), explode(sequence(lit(0), lit(d - 1))).as("i"))
      .select(col("term"), col("i"), (TextPrimitives.hexLong(
        concat(lit("cm"), col("i").cast("string"), lit(":"), col("term"))) % w).as("bucket"))
    // the d·w-row sketch broadcasts (the LEFT of a left-outer can't be
    // the build side); the keys frame is driver-literal anyway
    q.join(broadcast(sk), Seq("i", "bucket"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** DuckDB twin of the (i, bucket) hash for a term expression. */
  def bucketSql(term: String, i: String, w: Int): String =
    s"${TextPrimitives.hexLongSql(s"'cm' || CAST($i AS VARCHAR) || ':' || $term")} % $w"
}

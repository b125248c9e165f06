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
  * Hashing: the token is md5-hashed ONCE to the shared 60-bit base
  * hash h ([[TextPrimitives.hexLong]]); row i's bucket is the textbook
  * pairwise-independent derivation `((2i+1)·h + 97i + 31) mod p mod w`
  * with p = 2⁶¹−1 (Cormode & Muthukrishnan §2.1's `(a_i·x + b_i) mod p`
  * family with fixed odd multipliers, so the fixture is
  * deterministic). One string hash per token instead of d — the string
  * kernel is the map-side hot path at corpus scale, and the d-fold
  * expansion now carries an 8-byte long, not the token text. All
  * arithmetic stays inside signed 64-bit ((2d−1)·2⁶⁰ < 2⁶³ for d ≤ 4)
  * and has an exact DuckDB twin, so the WHOLE sketch (not just its
  * guarantees) is oracle-reproducible. */
object CountMin {

  /** p = 2⁶¹ − 1, the Mersenne prime of the hash family. */
  val P: Long = 2305843009213693951L

  private def bucketCol(h: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column,
      w: Int): org.apache.spark.sql.Column =
    (((lit(2L) * i + 1L) * h + lit(97L) * i + 31L) % P) % w

  /** The d×w sketch of the whitespace-token stream of `textCol`:
    * (i, bucket, c) with one row per non-empty counter. */
  def sketch(docs: DataFrame, textCol: String, d: Int, w: Int): DataFrame =
    docs.select(explode(TextPrimitives.words(col(textCol))).as("term"))
      .where(col("term") =!= "")
      .select(TextPrimitives.hexLong(col("term")).as("h"))
      .select(explode(sequence(lit(0L), lit(d - 1L))).as("i"), col("h"))
      .select(col("i"), bucketCol(col("h"), col("i"), w).as("bucket"))
      .groupBy(col("i"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Point-frequency estimates for `keys`: (term, est) with
    * est = min over the d rows of the key's counter (0 if a counter is
    * empty — only possible when the key never occurred). */
  def estimates(sk: DataFrame, keys: Seq[String], d: Int, w: Int): DataFrame = {
    val spark = sk.sparkSession
    import spark.implicits._
    val q = keys.toDF("term")
      .select(col("term"), TextPrimitives.hexLong(col("term")).as("h"))
      .select(col("term"), explode(sequence(lit(0L), lit(d - 1L))).as("i"), col("h"))
      .select(col("term"), col("i"), bucketCol(col("h"), col("i"), w).as("bucket"))
    // the d·w-row sketch broadcasts (the LEFT of a left-outer can't be
    // the build side); the keys frame is driver-literal anyway
    q.join(broadcast(sk), Seq("i", "bucket"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** DuckDB twin of the (i, bucket) hash. `h` is the SQL of the 60-bit
    * base hash of the term (hash the token ONCE, mirror of the Spark
    * side), `i` the row index expression. */
  def bucketSql(h: String, i: String, w: Int): String =
    s"(((2 * $i + 1) * $h + 97 * $i + 31) % ${P}) % $w"
}

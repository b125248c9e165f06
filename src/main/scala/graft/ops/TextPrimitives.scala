package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Shared text/hash primitives used by the dedup + text-analysis
  * operators, defined ONCE with both a Spark `Column` form and an
  * equivalent DuckDB SQL fragment (for `SparkEntry.oracleSql`) so the
  * engine and the differential oracle can't drift apart.
  *
  * All hashing is md5-derived (both engines implement identical md5),
  * mapped to a 60-bit non-negative int via the first 15 hex chars —
  * `H(s) = int(md5(s)[0:15], 16)`. The MinHash family is affine over one
  * base hash, `h_i(s) = (a_i·H(s) + b_i) mod (2^61−1)` with
  * `a_i = H("a:"+i) | 1`, `b_i = H("b:"+i)` — one md5 per shingle
  * instead of k. Modular arithmetic is exact on both engines (Scala:
  * 128-bit Mersenne fold via `Math.multiplyHigh`; DuckDB: HUGEINT).
  */
object TextPrimitives {

  // ---------- Spark Column forms ----------
  // (The heavy kernels — shingles, minhash, band keys, simhash — live in
  // graft.functions.TextKernels as native codegen expressions; only
  // builtin-composable helpers remain as Columns.)

  /** Lowercased whitespace tokenization. */
  def words(text: Column): Column = split(lower(text), "\\s+")

  /** The shared 60-bit md5 base hash, Column form (twin of
    * [[hexLongSql]]): `int(md5(s)[0:15], 16)` — non-negative, so `% n`
    * is safe on both engines. */
  def hexLong(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Fixed-width word-group "lines": the fixture's documents are
    * single-line, so line structure (for line-level curation ops — C4
    * rule filters, RefinedWeb boilerplate removal) is synthesized
    * deterministically as groups of `lw` consecutive words, identically
    * on both engines. Returns array&lt;array&lt;string&gt;&gt;; the
    * trailing group may be short. Pure per-row builtin higher-order
    * functions — map-side, codegen'd, no shuffle. */
  def lineGroups(ws: Column, lw: Int): Column =
    when(size(ws) === 0, array().cast("array<array<string>>"))
      .otherwise(transform(
        sequence(lit(0), ceil(size(ws).cast("double") / lw).cast("int") - 1),
        i => slice(ws, i * lw + 1, lit(lw))))

  /** Jaccard similarity of two distinct-element arrays (builtin set ops,
    * fully codegen'd). Total function: two empty sets → 0.0 (not a
    * divide-by-zero — ANSI mode would throw on short/empty docs). */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast("double") / size(array_union(a, b)))

  // ---------- DuckDB SQL fragment forms (oracle twins) ----------

  def wordsSql(text: String): String = s"regexp_split_to_array(lower($text), '\\s+')"

  def hexLongSql(s: String): String = s"CAST(('0x' || substr(md5($s), 1, 15)) AS BIGINT)"

  /** DuckDB twin of [[lineGroups]] (DuckDB list slices are 1-based and
    * end-inclusive, truncating past the end — same as Spark's
    * `slice(arr, start, length)`). */
  def lineGroupsSql(ws: String, lw: Int): String =
    s"list_transform(range(CAST(ceil(len($ws) / $lw.0) AS BIGINT)), " +
      s"i -> $ws[CAST(i * $lw + 1 AS INTEGER):CAST(i * $lw + $lw AS INTEGER)])"

  def shinglesSql(ws: String, n: Int): String = {
    val gram = (0 until n).map(o => s"$ws[i + ${o + 1}]").mkString(" || ' ' || ")
    s"CASE WHEN len($ws) >= $n THEN list_distinct(list_transform(range(len($ws) - ${n - 1}), i -> $gram)) ELSE [] END"
  }

  def jaccardSql(a: String, b: String): String =
    s"CASE WHEN len(list_distinct($a || $b)) = 0 THEN CAST(0.0 AS DOUBLE) " +
      s"ELSE len(list_intersect($a, $b))::DOUBLE / len(list_distinct($a || $b)) END"

  def minhashSigSql(sh: String, k: Int): String = {
    val aI = s"CAST((${hexLongSql("'a:' || CAST(i AS VARCHAR)")} | 1) AS HUGEINT)"
    val bI = s"CAST(${hexLongSql("'b:' || CAST(i AS VARCHAR)")} AS HUGEINT)"
    val hS = s"CAST(${hexLongSql("s")} AS HUGEINT)"
    s"list_transform(range($k), i -> list_aggregate(list_transform($sh, s -> " +
      s"CAST(($aI * $hS + $bI) % 2305843009213693951 AS BIGINT)), 'min'))"
  }

  def bandKeysSql(sig: String, bands: Int, rowsPerBand: Int): String = {
    val slice = (0 until rowsPerBand)
      .map(r => s"CAST($sig[j * $rowsPerBand + ${r + 1}] AS VARCHAR)").mkString(" || ',' || ")
    s"list_transform(range($bands), j -> md5($slice))"
  }

  /** DuckDB twin of [[graft.embed.HashingEmbedder]], in two CTE-stage
    * fragments (DuckDB can't correlate a scalar subquery over a nested
    * derived table): the unnormalized signed-count accumulator over a
    * text expression, then L2 normalization over the accumulator. */
  def hashingEmbedAccSql(text: String, dim: Int): String = {
    val hs = s"list_transform(regexp_extract_all(lower($text), '[a-z0-9]+'), t -> ${hexLongSql("t")})"
    s"list_transform(range($dim), i -> coalesce(list_sum(list_transform(" +
      s"list_filter($hs, h -> (h >> 1) % $dim = i), " +
      s"h -> CASE WHEN h & 1 = 1 THEN -1.0 ELSE 1.0 END)), 0.0))"
  }

  def hashingEmbedNormSql(a: String): String = {
    val nrm = s"sqrt(list_sum(list_transform($a, x2 -> x2 * x2)))"
    s"CASE WHEN $nrm = 0.0 THEN list_transform($a, x -> CAST(0.0 AS FLOAT)) " +
      s"ELSE list_transform($a, x -> CAST(x / $nrm AS FLOAT)) END"
  }

  /** DuckDB twin of [[graft.embed.NgramHashingEmbedder]] (U6 second
    * embedder slot): char-n-gram hashes (spaces/punct included, exactly
    * as the Scala kernel) feature-hashed into `dim` signed counts. */
  def ngramEmbedAccSql(text: String, dim: Int, n: Int): String = {
    val hs = s"list_transform(range(greatest(length(lower($text)) - ${n - 1}, 0)), " +
      s"i -> ${hexLongSql(s"substr(lower($text), CAST(i + 1 AS INTEGER), $n)")})"
    s"list_transform(range($dim), i -> coalesce(list_sum(list_transform(" +
      s"list_filter($hs, h -> (h >> 1) % $dim = i), " +
      s"h -> CASE WHEN h & 1 = 1 THEN -1.0 ELSE 1.0 END)), 0.0))"
  }

  /** DuckDB twin of winnowing, staged: k-gram hash list over a text
    * expression, then window-min selection over the hash list. */
  def winnowHashesSql(text: String, k: Int): String =
    s"CASE WHEN length(lower($text)) - ${k - 1} <= 0 THEN CAST([] AS BIGINT[]) " +
      s"ELSE list_transform(range(length(lower($text)) - ${k - 1}), " +
      s"i -> ${hexLongSql(s"substr(lower($text), CAST(i + 1 AS INTEGER), $k)")}) END"

  def winnowFromHashesSql(hs: String, w: Int): String =
    s"CASE WHEN len($hs) = 0 THEN CAST([] AS BIGINT[]) " +
      s"WHEN len($hs) - ${w - 1} <= 0 THEN [list_aggregate($hs, 'min')] " +
      s"ELSE list_sort(list_distinct(list_transform(range(len($hs) - ${w - 1}), " +
      s"j -> list_aggregate($hs[CAST(j + 1 AS INTEGER):CAST(j + $w AS INTEGER)], 'min')))) END"

  def simhashSql(hw: String, bits: Int = 60): String =
    (0 until bits).map { j =>
      s"CASE WHEN len(list_filter($hw, h -> (h >> $j) & 1 = 1)) * 2 > len($hw) THEN ${1L << j} ELSE 0 END"
    }.mkString("(", " + ", ")")
}

package graft.embed

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}

/** Pluggable text-embedder fabric (SURVEY.md §2.8).
  *
  * Mirrors the reference's embedder surface — abstract
  * `embed(text) -> vector` + dimensions + name-based registry lookup
  * (embedders.py:18-32, vdb.py:21-27) — with Modal's container fan-out
  * replaced by Spark partition parallelism: one embedder instance per
  * partition (the reference's one-model-per-container `@modal.enter`
  * pattern, embedders.py:83-87).
  */
trait Embedder extends Serializable {
  def name: String
  def dim: Int
  def embed(text: String): Array[Float]
  /** Bulk form (reference `.map(list[str])`, vdb.py:57). */
  def embedBatch(texts: Iterator[String]): Iterator[Array[Float]] = texts.map(embed)
}

/** Deterministic, dependency-free embedder: tokenize → signed feature
  * hashing → L2 normalize. Stands in for SentenceTransformers
  * (embedders.py:74-91) in this offline environment — preserves the
  * pipeline contract (fixed dim, determinism, unit-norm) though not
  * model semantics (SURVEY.md §7.4).
  *
  * The token hash is the project-wide md5-derived `H(s)` (TextKernels
  * .hexLong): bit 0 is the sign, the rest picks the dimension. Being
  * md5-based makes the embedder expressible in DuckDB SQL
  * (TextPrimitives.hashingEmbedSql), so the FULL reference lifecycle —
  * embed text, then k-NN over the embeddings — is differentially
  * oracle-checked, not just the search half.
  */
case class HashingEmbedder(override val dim: Int = 64) extends Embedder {
  override def name: String = "hashing"

  private val tokenRe = "[a-z0-9]+".r

  override def embed(text: String): Array[Float] = {
    val acc = new Array[Double](dim)
    for (tok <- tokenRe.findAllIn(text.toLowerCase)) {
      val h = graft.functions.TextKernels.hexLong(tok)
      val idx = ((h >> 1) % dim).toInt
      val sign = if ((h & 1L) == 1L) -1.0 else 1.0
      acc(idx) += sign
    }
    var norm = 0.0
    var i = 0
    while (i < dim) { norm += acc(i) * acc(i); i += 1 }
    val nrm = math.sqrt(norm)
    val out = new Array[Float](dim)
    i = 0
    // divide (not multiply-by-reciprocal): bit-identical to the SQL
    // twin's x / nrm in the last ulp
    while (i < dim) { out(i) = (if (nrm == 0.0) 0.0f else (acc(i) / nrm).toFloat); i += 1 }
    out
  }
}

/** Second registered embedder — char-n-gram feature hashing (robust to
  * tokenization/misspellings where the word-level one is not). Proves
  * the registry is pluggable (the reference keeps two embedder classes
  * for the same reason, embedders.py:35-91 — SURVEY.md §2.8 U6). */
case class NgramHashingEmbedder(override val dim: Int = 64, n: Int = 3) extends Embedder {
  override def name: String = "ngram_hashing"

  override def embed(text: String): Array[Float] = {
    val t = text.toLowerCase
    val acc = new Array[Double](dim)
    var i = 0
    while (i <= t.length - n) {
      val h = graft.functions.TextKernels.hexLong(t.substring(i, i + n))
      val idx = ((h >> 1) % dim).toInt
      acc(idx) += (if ((h & 1L) == 1L) -1.0 else 1.0)
      i += 1
    }
    var norm = 0.0
    i = 0
    while (i < dim) { norm += acc(i) * acc(i); i += 1 }
    val nrm = math.sqrt(norm)
    val out = new Array[Float](dim)
    i = 0
    while (i < dim) { out(i) = (if (nrm == 0.0) 0.0f else (acc(i) / nrm).toFloat); i += 1 }
    out
  }
}

/** Third registry slot: an MLlib-Transformer-backed embedder
  * (Tokenizer → HashingTF → IDF → L2 normalize) — proves the registry
  * generalizes beyond hand-rolled hash variants, the way the reference
  * keeps two genuinely different MODEL families (embedders.py:35-91).
  *
  * IDF weights are corpus statistics, so this embedder is FITTED
  * ([[TfIdfEmbedder.fitOn]], which runs the real MLlib stages) and the
  * weights travel in the registry params (`idf` = comma-joined
  * doubles; Double.toString round-trips exactly). `embed` replicates
  * the fitted pipeline bit-for-bit per row: Tokenizer semantics
  * (lowercase, split on \s, empties kept), HashingTF's murmur3 term
  * indexing via `HashingTF.indexOf`, IDF multiply, then the same
  * divide-normalize as the other embedders. */
case class TfIdfEmbedder(override val dim: Int, idf: Array[Double]) extends Embedder {
  require(idf.length == dim, s"idf length ${idf.length} != dim $dim")
  override def name: String = "tfidf"

  @transient private lazy val hasher =
    new org.apache.spark.ml.feature.HashingTF().setNumFeatures(dim)

  override def embed(text: String): Array[Float] = {
    val acc = new Array[Double](dim)
    for (tok <- text.toLowerCase.split("\\s")) acc(hasher.indexOf(tok)) += 1.0
    var i = 0
    while (i < dim) { acc(i) *= idf(i); i += 1 }
    var norm = 0.0
    i = 0
    while (i < dim) { norm += acc(i) * acc(i); i += 1 }
    val nrm = math.sqrt(norm)
    val out = new Array[Float](dim)
    i = 0
    while (i < dim) { out(i) = (if (nrm == 0.0) 0.0f else (acc(i) / nrm).toFloat); i += 1 }
    out
  }
}

object TfIdfEmbedder {
  /** Fits IDF weights over `df(textCol)` with the actual MLlib stages
    * (Tokenizer → HashingTF → IDF.fit) and returns the embedder
    * carrying them. One pass over the corpus; at scale, fit on a
    * sample. */
  def fitOn(df: DataFrame, textCol: String, dim: Int): TfIdfEmbedder = {
    val tok = new org.apache.spark.ml.feature.Tokenizer()
      .setInputCol(textCol).setOutputCol("__toks")
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("__toks").setOutputCol("__tf").setNumFeatures(dim)
    val model = new org.apache.spark.ml.feature.IDF()
      .setInputCol("__tf").setOutputCol("__tfidf")
      .fit(tf.transform(tok.transform(df.select(textCol))))
    TfIdfEmbedder(dim, model.idf.toArray)
  }

  /** The Transformer-pipeline form of the same embedding: transforms
    * the whole corpus through Tokenizer → HashingTF → IDF(fit) and
    * appends an L2-normalized `Array[Float]` column `outCol` — the
    * MLlib-native bulk path the per-row [[TfIdfEmbedder.embed]] must
    * agree with (asserted in VectorDBSpec / the vdb_embed_tfidf gate). */
  def transformMl(df: DataFrame, textCol: String, dim: Int,
      outCol: String = "embedding"): DataFrame = {
    val tok = new org.apache.spark.ml.feature.Tokenizer()
      .setInputCol(textCol).setOutputCol("__toks")
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("__toks").setOutputCol("__tf").setNumFeatures(dim)
    val tfd = tf.transform(tok.transform(df))
    val model = new org.apache.spark.ml.feature.IDF()
      .setInputCol("__tf").setOutputCol("__tfidf").fit(tfd)
    val toUnitArr = org.apache.spark.sql.functions.udf {
      (v: org.apache.spark.ml.linalg.Vector) =>
        val a = v.toArray
        var n = 0.0
        var i = 0
        while (i < a.length) { n += a(i) * a(i); i += 1 }
        val nrm = math.sqrt(n)
        val out = new Array[Float](a.length)
        i = 0
        while (i < a.length) { out(i) = (if (nrm == 0.0) 0.0f else (a(i) / nrm).toFloat); i += 1 }
        out
    }
    model.transform(tfd)
      .withColumn(outCol, toUnitArr(org.apache.spark.sql.functions.col("__tfidf")))
      .drop("__toks", "__tf", "__tfidf")
  }
}

/** Name → embedder registry (reference `modal.Cls.from_name`, vdb.py:23;
  * unknown name raises, vdb.py:24-27). */
object Embedders {
  def forName(name: String, params: Map[String, String] = Map.empty): Embedder =
    name match {
      case "hashing" | "HashingEmbedder" =>
        HashingEmbedder(params.getOrElse("dim", "64").toInt)
      case "ngram_hashing" | "NgramHashingEmbedder" =>
        NgramHashingEmbedder(params.getOrElse("dim", "64").toInt,
          params.getOrElse("n", "3").toInt)
      case "tfidf" | "TfIdfEmbedder" =>
        val dim = params.getOrElse("dim", "64").toInt
        val idf = params.get("idf")
          .map(_.split(",").map(_.toDouble))
          .getOrElse(Array.fill(dim)(1.0)) // unfitted: plain hashing TF
        TfIdfEmbedder(dim, idf)
      case other =>
        throw new IllegalArgumentException(s"unknown embedder: $other")
    }
}

object EmbedOps {
  /** Adds an embedding column by running the named embedder once per
    * partition over `textCol` — the Spark-native analogue of the
    * reference's distributed embedding map (U3, vdb.py:57). Instantiating
    * inside `mapPartitions` (not per row, not on the driver) mirrors the
    * one-model-per-container pattern and is what survives a 1000-executor
    * scale-out: no driver round-trips, no shared state.
    */
  def withEmbedding(
      df: DataFrame,
      textCol: String,
      embedderName: String,
      params: Map[String, String] = Map.empty,
      outCol: String = "embedding"): DataFrame = {
    val outSchema = StructType(
      df.schema.fields :+ StructField(outCol, ArrayType(FloatType, containsNull = false), nullable = false))
    val enc = RowEncoder.encoderFor(outSchema)
    val textIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      val embedder = Embedders.forName(embedderName, params) // once per partition
      rows.map { row =>
        val text = if (row.isNullAt(textIdx)) "" else row.getString(textIdx)
        Row.fromSeq(row.toSeq :+ embedder.embed(text))
      }
    }(enc)
  }
}

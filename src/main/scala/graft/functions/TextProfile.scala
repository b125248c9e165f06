package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextKernels.{md5Hex, words}
import graft.functions.PortableRounding.{round => pround}

/** One-pass document profile: language ID, content fingerprint, quality
  * metrics, token counts — a single kernel expression so the whole
  * profile costs one tokenization per row (the composed-column version
  * re-split the text per derived column, interpreted). Semantics are the
  * oracle twins in [[graft.ops.TextAnalysis]]'s SQL builders. */
case class TextProfileExpr(child: Expression, stopwords: Map[String, Seq[String]], langs: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[GraftBridge.AbstractDT] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "text_profile"

  override def dataType: DataType = StructType(Seq(
    StructField("pred_lang", StringType, nullable = false),
    StructField("fingerprint", StringType, nullable = false),
    StructField("n_words", LongType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("alnum_ratio", DoubleType, nullable = false),
    StructField("stop_ratio", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false),
    StructField("ws_tokens", LongType, nullable = false),
    StructField("bpe_tokens", LongType, nullable = false)))

  @transient private lazy val stopSets: Seq[(String, Set[String])] =
    langs.map(l => l -> stopwords(l).toSet)
  @transient private lazy val enStops: Set[String] = stopwords("en").toSet
  @transient private lazy val bpePattern: Pattern =
    Pattern.compile("[a-z]+|[0-9]|[^a-z0-9\\s]")

  def compute(textU: UTF8String): GenericInternalRow = {
    val ltext = textU.toString.toLowerCase
    val w = words(ltext)
    val nWords = w.length
    val nChars = ltext.length

    // language id: most stopword hits, first lang wins ties, und if none
    var bestLang = "und"
    var bestHits = 0
    stopSets.foreach { case (lang, set) =>
      var hits = 0
      var i = 0
      while (i < nWords) { if (set.contains(w(i))) hits += 1; i += 1 }
      if (hits > bestHits) { bestHits = hits; bestLang = lang }
    }

    // fingerprint: md5 of sorted distinct words
    val fingerprint = md5Hex(w.distinct.sorted.mkString(" "))

    // quality metrics
    val meanWordLen = (nChars - nWords + 1).toDouble / nWords
    var alnum = 0
    var i = 0
    while (i < nChars) {
      val c = ltext.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) alnum += 1
      i += 1
    }
    val alnumRatio = if (nChars == 0) 0.0 else alnum.toDouble / nChars
    var stopHits = 0
    i = 0
    while (i < nWords) { if (enStops.contains(w(i))) stopHits += 1; i += 1 }
    val stopRatio = stopHits.toDouble / nWords
    val lenScore = if (nChars >= 100 && nChars <= 2000) 1.0 else if (nChars >= 30 && nChars <= 99) 0.5 else 0.2
    val wordScore = if (meanWordLen >= 3.0 && meanWordLen <= 10.0) 1.0 else 0.4
    val quality = pround(lenScore * 0.3 + wordScore * 0.2 + alnumRatio * 0.3 + stopRatio * 0.2, 4)

    // token counts
    val m = bpePattern.matcher(ltext)
    var bpe = 0L
    while (m.find()) bpe += 1

    new GenericInternalRow(Array[Any](
      UTF8String.fromString(bestLang), UTF8String.fromString(fingerprint),
      nWords.toLong, pround(meanWordLen, 4), pround(alnumRatio, 4),
      pround(stopRatio, 4), quality, nWords.toLong, bpe))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("profileExpr", this, classOf[TextProfileExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextProfileExpr {
  def col(c: Column, stopwords: Map[String, Seq[String]], langs: Seq[String]): Column =
    GraftBridge.column(TextProfileExpr(GraftBridge.expression(c), stopwords, langs))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.PortableRounding.{round => pround}

/** Shannon-entropy quality signals, one codegen kernel pass per row:
  * `h_char` over the Unicode code points of the Locale.ROOT-lowercased
  * text, `h_token` over its whitespace tokens (natural log, 4-dp
  * portable rounding). Low character entropy flags repetition/garbage
  * (aaaa…, base64 blobs score HIGH char entropy but LOW token entropy);
  * the pair is the standard cheap complement to model-based quality
  * filters. DuckDB twin: per-char/per-token unnest + count + −Σ p ln p
  * (term order differs between engines; both sides round to 4 dp). */
case class TextEntropyExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[GraftBridge.AbstractDT] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "text_entropy"

  override def dataType: DataType = StructType(Seq(
    StructField("h_char", DoubleType, nullable = false),
    StructField("h_token", DoubleType, nullable = false)))

  private def entropy[K](counts: java.util.HashMap[K, Integer], total: Long): Double = {
    if (total == 0L) return 0.0
    val n = total.toDouble
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().doubleValue() / n
      h -= p * math.log(p)
    }
    pround(h, 4)
  }

  def compute(textU: UTF8String): GenericInternalRow = {
    val ltext = textU.toString.toLowerCase(java.util.Locale.ROOT)
    val charCounts = new java.util.HashMap[Int, Integer]()
    var nCp = 0L
    var i = 0
    while (i < ltext.length) {
      val cp = ltext.codePointAt(i)
      val prev = charCounts.get(cp)
      charCounts.put(cp, if (prev == null) 1 else prev + 1)
      nCp += 1
      i += Character.charCount(cp)
    }
    val w = TextKernels.words(ltext)
    val tokCounts = new java.util.HashMap[String, Integer]()
    var j = 0
    while (j < w.length) {
      val prevT = tokCounts.get(w(j))
      tokCounts.put(w(j), if (prevT == null) 1 else prevT + 1)
      j += 1
    }
    new GenericInternalRow(Array[Any](
      entropy(charCounts, nCp), entropy(tokCounts, w.length.toLong)))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("entropyExpr", this, classOf[TextEntropyExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextEntropyExpr {
  def col(c: Column): Column = GraftBridge.column(TextEntropyExpr(GraftBridge.expression(c)))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.RoundPortableExpr
import graft.ops.TextPrimitives

/** Multinomial Naive Bayes over bag-of-words counts — the other classic
  * model-based corpus filter next to the LBFGS logistic classifier
  * ([[TextClassifier]]): NB is closed-form from exact count statistics,
  * which makes it the one supervised model whose training AND scoring
  * are bit-reproducible and therefore ORACLE-CHECKABLE end to end (the
  * LR entry can only gate held-out accuracy).
  *
  * Scale shape: training is two keyed aggs over the exploded token
  * table ((class, token) and (class) counts — map-side combined,
  * shuffle linear in tokens); the model is never collected — scoring
  * joins the test term-frequency table against the (token, class)
  * likelihood table keyed ON TOKEN, so the per-class log-likelihood sum
  * is one more keyed agg. Nothing driver-side, no iterations.
  *
  * Determinism: priors and likelihoods are ratios of exact integer
  * counts (identical doubles cross-engine); per-document score sums
  * drift ~1e-13 with summation order and are ROUNDED to 6 before the
  * argmax (ties broken by class ascending).
  */
object NaiveBayes {

  /** Held-out confusion matrix (actual, predicted, n) for add-one
    * multinomial NB: train on rows where `idCol % testMod != 0`, score
    * the rest. Classes = the labels observed in training. */
  def confusion(docs: DataFrame, idCol: String, textCol: String, labelCol: String,
      testMod: Int = 5): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), col(labelCol).as("label"),
        explode(TextPrimitives.words(col(textCol))).as("tok"))
      .where(length(col("tok")) > 0)
    val isTest = pmod(col("doc_id"), lit(testMod)) === 0
    val trainToks = toks.where(!isTest)

    // model statistics — all exact integers
    val tokCls = trainToks.groupBy(col("label"), col("tok"))
      .agg(count(lit(1)).as("ctc"))
    val clsTot = trainToks.groupBy(col("label")).agg(count(lit(1)).as("nc"))
    val vocab = trainToks.agg(countDistinct(col("tok")).as("v"))
    val trainDocs = docs.where(!isTest)
      .groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("dc"))
    val totDocs = docs.where(!isTest).agg(count(lit(1)).as("td"))
    val priors = trainDocs.crossJoin(broadcast(totDocs))
      .join(broadcast(clsTot), "label").crossJoin(broadcast(vocab))
      .select(col("label"), log(col("dc").cast("double") / col("td")).as("prior"),
        col("nc"), col("v"))

    // test term frequencies × classes, token-keyed likelihood join
    val tf = toks.where(isTest)
      .groupBy(col("doc_id"), col("label").as("actual"), col("tok"))
      .agg(count(lit(1)).as("tfreq"))
    val scored = tf
      .crossJoin(broadcast(priors.select(col("label"), col("nc"), col("v"))))
      .join(tokCls, Seq("label", "tok"), "left")
      .select(col("doc_id"), col("actual"), col("label"), col("tfreq"),
        (col("tfreq") * log((coalesce(col("ctc"), lit(0L)) + 1).cast("double") /
          (col("nc") + col("v")))).as("ll"))
      .groupBy(col("doc_id"), col("actual"), col("label"))
      .agg(sum(col("ll")).as("llsum"))
      .join(broadcast(priors.select(col("label"), col("prior"))), "label")
      .select(col("doc_id"), col("actual"), col("label"),
        RoundPortableExpr.r(col("prior") + col("llsum"), 6).as("score"))

    // argmax with class-ascending tiebreak, then the confusion census
    val best = scored
      .groupBy(col("doc_id"), col("actual"))
      .agg(min(struct((-col("score")).as("ns"), col("label").as("l"))).as("b"))
      .select(col("actual"), col("b").getField("l").as("predicted"))
    best.groupBy(col("actual"), col("predicted")).agg(count(lit(1)).as("n"))
  }
}

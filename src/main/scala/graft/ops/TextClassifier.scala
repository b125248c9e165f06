package graft.ops

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, RegexTokenizer}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised text classification over hashed bag-of-words features —
  * the fastText-style model-based filter step of LLM data pipelines
  * (GPT-3's quality classifier, CCNet's language filter) as an MLlib
  * Pipeline: RegexTokenizer → HashingTF → multinomial logistic
  * regression. Complements the HEURISTIC language-ID/quality kernels
  * (TextProfile): those are fixed rules, this is fitted on labels.
  *
  * Scale shape: featurization is map-side (feature hashing — no
  * vocabulary shuffle and no driver-side dictionary, the same trick as
  * the embedder registry); LBFGS training aggregates gradients
  * tree-wise per iteration (O(iters) passes, each a treeAggregate of a
  * `numFeatures × classes` dense vector — bounded by the hash width,
  * NOT the corpus); scoring is one map-side pass. Nothing corpus-sized
  * ever reaches the driver.
  *
  * Determinism note: LBFGS convergence from a fixed zero init on
  * identical data is reproducible, but float reduction order may vary
  * with partitioning — so the ORACLE-facing surface is a threshold
  * gate (held-out accuracy ≥ floor), the same contract as the
  * recall-gated ANN entries, never raw coefficients. */
object TextClassifier {

  /** (n_train, n_test, n_correct) — one row. `classes` fixes the label
    * indexing (values outside it map to one extra bucket —
    * deterministic, no StringIndexer frequency ordering to drift with
    * the data). */
  def heldOutCounts(docs: DataFrame, textCol: String, classCol: String,
      isTest: Column, classes: Seq[String], numFeatures: Int = 4096): DataFrame = {
    val label = classes.zipWithIndex.foldLeft(lit(classes.size.toDouble)) {
      case (acc, (c, i)) => when(col(classCol) === c, lit(i.toDouble)).otherwise(acc)
    }
    val base = docs.select(col(textCol).as("__text"), label.as("label"),
      isTest.as("__test"))
    val pipe = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol("__text").setOutputCol("__toks")
        .setPattern("\\s+").setToLowercase(true),
      new HashingTF().setInputCol("__toks").setOutputCol("features")
        .setNumFeatures(numFeatures),
      new LogisticRegression().setMaxIter(25).setRegParam(0.01)))
    val train = base.where(!col("__test"))
    val model = pipe.fit(train)
    val nTrain = train.count()
    model.transform(base.where(col("__test")))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("prediction") === col("label"), 1L).otherwise(0L)).as("n_correct"))
      .select(lit(nTrain).as("n_train"), col("n_test"), col("n_correct"))
  }

  /** Oracle-facing gate: fits on the non-test rows, scores the test
    * rows, returns ONE row (n_train, n_test, acc_ok) with acc_ok =
    * held-out accuracy ≥ `floor` — the recall-gate contract. */
  def classifierGate(docs: DataFrame, textCol: String, classCol: String,
      isTest: Column, classes: Seq[String], floor: Double,
      numFeatures: Int = 4096): DataFrame =
    heldOutCounts(docs, textCol, classCol, isTest, classes, numFeatures)
      .select(col("n_train"), col("n_test"),
        (col("n_correct").cast("double") / col("n_test") >= floor)
          .cast("int").as("acc_ok"))
}

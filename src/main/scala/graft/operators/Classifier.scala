package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Learned quality classifier — the "logistic regression over document
  * features" gate the GPT-3 data pipeline popularized: train a small
  * linear model on labeled examples, score the whole corpus, keep what
  * clears the decision boundary.
  *
  * Scale shape, same discipline as the ANN codebooks: TRAINING is
  * full-batch gradient descent on a bounded, deterministically-ordered
  * driver sample (zero init, fixed iterations and learning rate, no RNG —
  * the weights are a pure function of the sample). SCORING is fully
  * distributed and codegen'd: the weight vector is inlined as an array
  * literal into the [[graft.expressions.DotProduct]] fold, so the corpus
  * pass is a narrow map with no shuffle and no UDF.
  *
  * The decision boundary is evaluated on the LOGIT (w·x + b >= 0), which
  * is pure multiply-add and therefore bit-identical in any IEEE engine;
  * the sigmoid only feeds the reported probability, never the keep flag.
  */
object Classifier {

  /** Trained weights + intercept. */
  final case class Model(w: Array[Double], b: Double)

  def train(df: DataFrame, idCol: String, vecCol: String, labelCol: String,
            iters: Int = 50, lr: Double = 0.5, maxTrain: Int = 100000): Model = {
    val rows = df.select(col(labelCol).cast("double"), col(vecCol))
      .orderBy(col(idCol)).limit(maxTrain).collect()
      .map(r => (r.getDouble(0), r.getSeq[Number](1).map(_.doubleValue()).toArray))
    require(rows.nonEmpty, "cannot train a classifier on an empty sample")
    val dim = rows.head._2.length
    val n = rows.length
    val w = new Array[Double](dim)
    var b = 0.0
    var it = 0
    while (it < iters) {
      val gw = new Array[Double](dim)
      var gb = 0.0
      rows.foreach { case (y, x) =>
        var z = b
        var i = 0
        while (i < dim) { z += w(i) * x(i); i += 1 }
        val d = 1.0 / (1.0 + math.exp(-z)) - y
        i = 0
        while (i < dim) { gw(i) += d * x(i); i += 1 }
        gb += d
      }
      var i = 0
      while (i < dim) { w(i) -= lr * gw(i) / n; i += 1 }
      b -= lr * gb / n
      it += 1
    }
    Model(w, b)
  }

  /** Adds `logit`, `score` (sigmoid), and `keep` (logit >= 0) columns —
    * one codegen'd narrow pass over the corpus.
    */
  def score(df: DataFrame, vecCol: String, model: Model): DataFrame = {
    val wCol: Column = array(model.w.map(lit(_)): _*)
    df.withColumn("logit", VectorFns.dot(col(vecCol), wCol) + lit(model.b))
      .withColumn("score", lit(1.0) / (lit(1.0) + exp(-col("logit"))))
      .withColumn("keep", col("logit") >= 0)
  }
}

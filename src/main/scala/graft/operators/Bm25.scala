package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** BM25 keyword retrieval — the lexical complement of the embedding-ANN
  * family (Similarity): at training-corpus scale you reach for BM25 when the
  * query is terms, ANN when it is a vector.
  *
  *   score(q, d) = sum over t in q∩d of
  *     idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  *   idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))   (Robertson-Sparck Jones)
  *
  * Distribution shape: one explode builds the postings; (doc, term) tf and
  * per-doc lengths are partial-aggregated shuffles on the natural keys;
  * document frequencies reuse the postings; the (tiny) query-term set
  * broadcasts into the postings join, so the corpus never shuffles for the
  * query — exactly how you'd serve ad-hoc keyword search over 100 TB of
  * postings, with the tf/df/dl tables precomputed once and reused.
  *
  * Determinism: the only transcendental (ln) is quantized to 6 dp so scores
  * replay bit-identically on any engine whose libm may differ in the last
  * ulp, and the per-document score folds contributions in TERM ORDER
  * (sorted collect_list) — double addition is not associative, so an
  * unordered SUM would not be reproducible even across two Spark runs.
  */
object Bm25 {

  def search(docs: DataFrame, idCol: String, textCol: String,
             queries: DataFrame, qIdCol: String, qTextCol: String,
             k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // The isNotNull is semantically a no-op (explode never yields null
    // tokens) but it equalizes the canonical plans of tf's two consumers:
    // the query join pushes isnotnull(__t) into ITS tf branch only, which
    // otherwise blocks ReuseExchange from sharing the postings shuffle with
    // the dl branch — and exchange reuse is what makes this a single
    // tokenize pass.
    val toks = docs.select(col(idCol).as("__id"),
      explode(TextFns.tokens(lower(col(textCol)))).as("__t"))
      .filter(col("__t").isNotNull)
    val tf = toks.groupBy(col("__id"), col("__t")).agg(count(lit(1)).as("tf"))
    // doc length derives from tf (sum of term frequencies), NOT from a second
    // aggregation over the exploded tokens: dl's plan then contains tf's
    // exchange as a subplan, Spark's ReuseExchange materializes the postings
    // shuffle once, and the corpus is tokenized in a single pass — at corpus
    // scale the tokenize/explode is the dominant cost of the postings build.
    val dl = tf.groupBy(col("__id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(avg(col("dl")).as("avgdl"), count(lit(1)).as("nd"))
    val df = tf.groupBy(col("__t")).agg(count(lit(1)).as("df"))

    // repeated query terms count once (the standard bag-of-terms query)
    val qterms = queries.select(col(qIdCol).as("__qid"),
        explode(TextFns.tokens(lower(col(qTextCol)))).as("__t"))
      .distinct()

    val idf = round(log(lit(1.0) + (col("nd") - col("df") + lit(0.5)) / (col("df") + lit(0.5))), 6)
    val tfPart = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))

    val contribs = broadcast(qterms)
      .join(tf, "__t")
      .join(dl, "__id")
      .join(broadcast(df), "__t")
      .crossJoin(broadcast(stats))
      .select(col("__qid"), col("__id"), col("__t"), (idf * tfPart).as("contrib"))

    val scored = contribs
      .groupBy(col("__qid"), col("__id"))
      .agg(sort_array(collect_list(struct(col("__t"), col("contrib")))).as("cs"))
      .select(col("__qid"), col("__id"),
        aggregate(col("cs"), lit(0.0), (acc, x) => acc + x.getField("contrib")).as("score"))

    val w = Window.partitionBy(col("__qid")).orderBy(col("score").desc, col("__id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("__qid").as(qIdCol), col("__id").as(idCol), col("score"), col("rn"))
  }
}

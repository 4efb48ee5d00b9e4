package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Corpus-trained bigram language-model scoring — the CCNet/Gopher-style
  * perplexity quality filter: documents whose token transitions are
  * improbable under a model trained on the corpus itself score a high
  * negative log-likelihood and get routed out of the training set.
  *
  *   nll(d) = -(1/n) * sum_i ln P(w_{i+1} | w_i)
  *   P(w2|w1) = (c(w1,w2) + a) / (c(w1) + a*V)     (add-alpha smoothing)
  *
  * Distribution shape: training IS the scoring pass's side input — bigram
  * and context counts are two partial-aggregated shuffles over the exploded
  * postings, the vocabulary size rides a broadcast 1-row aggregate, and
  * scoring joins each document's bigrams back to the count tables. Nothing
  * ever collects to the driver; at 100 TB the count tables are themselves
  * distributed (the c2 join shuffles on the bigram key).
  *
  * Determinism: ln is quantized to 6 dp (cross-libm replay, same convention
  * as Bm25), and each document folds its bigram log-probs in POSITION order
  * (sorted collect_list — bounded by document length — because double
  * addition is not associative and an unordered SUM is not reproducible).
  */
object LmScore {

  def bigramNll(docs: DataFrame, idCol: String, textCol: String,
                alpha: Double = 0.5): DataFrame = {
    val toks = docs
      .select(col(idCol).as("__id"), TextFns.tokens(lower(col(textCol))).as("__toks"))
      .filter(size(col("__toks")) >= 2)

    val bg = toks.select(col("__id"), posexplode(arrays_zip(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1))))
      .select(col("__id"), col("pos"),
        col("col").getField("0").as("w1"), col("col").getField("1").as("w2"))

    val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val c2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    // every token of a >=2-token doc occurs as some bigram's w1 or w2, so the
    // vocabulary is exactly distinct(w1 union w2) over the DISTINCT-bigram
    // table c2 — far smaller than re-exploding the corpus, and c2's exchange
    // is shared with the scoring join below (ReuseExchange), so the corpus
    // is tokenized one time fewer per scoring run.
    val vocab = c2.select(col("w1").as("w")).union(c2.select(col("w2").as("w")))
      .agg(countDistinct(col("w")).as("v"))

    val lp = round(
      log((col("c2") + lit(alpha)) / (col("c1") + lit(alpha) * col("v"))), 6)

    bg.join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("__id"), col("pos"), lp.as("lp"))
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("lp")))).as("ls"),
        count(lit(1)).as("n"))
      .select(col("__id").as(idCol),
        (-aggregate(col("ls"), lit(0.0), (acc, x) => acc + x.getField("lp")) / col("n"))
          .as("nll"))
  }
}

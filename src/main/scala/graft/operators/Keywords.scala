package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RAKE-style keyword extraction (Rose et al.'s Rapid Automatic Keyword
  * Extraction, simplified to a relational, engine-replayable core):
  * candidate phrases are maximal stopword-free token runs; each word
  * scores `deg/freq` (deg = summed length of the phrases it appears in,
  * freq = its occurrence count — words that live in long multi-word
  * phrases outrank ubiquitous singletons), and a phrase scores the sum
  * of its words' scores. Scores are exact integer ppm (`deg·10⁶ div
  * freq`), so ranking replays bit-for-bit in SQL.
  *
  * Simplifications, part of the contract: tokens are lowercase
  * `[a-z0-9]+` runs (punctuation does NOT break phrases — only
  * stopwords do), phrases longer than `maxPhraseLen` are dropped (the
  * scale guard: a stopword-free wall of text would otherwise become one
  * giant phrase), and word statistics are CORPUS-global (the classic
  * per-document RAKE restricted to a document is this with one doc).
  *
  * Scale shape: one tokenize pass, one per-doc window for the segment
  * ids (the [[Sequences]] discipline — never a self-join), two hash
  * aggregates for phrases and word stats, one broadcast-sized word-stat
  * join back (vocabulary-sized), one per-doc top-k window. Shuffle ∝
  * tokens, then ∝ phrases.
  */
object Keywords {

  /** The default stopword set — deliberately tiny and FROZEN (part of
    * the operator's determinism contract; callers pass their own list
    * for real corpora).
    */
  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "in", "and", "or", "is", "are", "was",
    "were", "for", "on", "with", "as", "by", "at", "be", "this", "that",
    "it", "from", "their", "its")

  /** Returns per document the top-`topK` phrases:
    * `(id, phrase, n_occ, score_ppm, rnk)` — rank by (score desc,
    * phrase) per document, deterministic.
    */
  def rake(docs: DataFrame, idCol: String, textCol: String,
           stopwords: Seq[String] = defaultStopwords,
           maxPhraseLen: Int = 4, topK: Int = 3): DataFrame = {
    require(maxPhraseLen >= 1, s"maxPhraseLen must be positive")
    require(topK >= 1, s"topK must be positive")
    require(stopwords.nonEmpty, "empty stopword set makes whole docs one phrase")
    val toks = docs
      .select(col(idCol).as("id"),
        posexplode(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
          t => t =!= "")).as(Seq("pos", "tok")))
      .withColumn("is_stop",
        col("tok").isInCollection(stopwords).cast("long"))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seg = toks
      .withColumn("seg", sum(col("is_stop")).over(w))
      .filter(col("is_stop") === 0L)
    val phrases = seg.groupBy(col("id"), col("seg"))
      .agg(sort_array(collect_list(struct(col("pos"), col("tok"))))
        .as("__st"))
      .select(col("id"), col("seg"),
        expr("transform(__st, s -> s.tok)").as("__toks"))
      .withColumn("plen", size(col("__toks")).cast("long"))
      .filter(col("plen") <= maxPhraseLen)
      .select(col("id"), col("seg"),
        array_join(col("__toks"), " ").as("phrase"),
        col("__toks"), col("plen"))
    val words = phrases
      .select(col("id"), col("seg"), col("plen"),
        explode(col("__toks")).as("word"))
    val wstats = words.groupBy(col("word"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .select(col("word"), expr("(deg * 1000000) div freq").as("wscore"))
    val scored = words.join(wstats, "word")
      .groupBy(col("id"), col("seg"))
      .agg(sum(col("wscore")).as("score_ppm"))
      .join(phrases.select(col("id"), col("seg"), col("phrase")),
        Seq("id", "seg"))
      .groupBy(col("id"), col("phrase"))
      .agg(count(lit(1)).as("n_occ"), max(col("score_ppm")).as("score_ppm"))
    val wr = Window.partitionBy(col("id"))
      .orderBy(col("score_ppm").desc, col("phrase"))
    scored.withColumn("rnk", row_number().over(wr).cast("long"))
      .filter(col("rnk") <= topK)
      .select(col("id").as(idCol), col("phrase"), col("n_occ"),
        col("score_ppm"), col("rnk"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Positional phrase matching — the query-side consumer of the q171
  * inverted index family: count exact n-word phrase occurrences per
  * document. Instead of self-joining postings n−1 times on
  * (doc, pos + i) — n−1 shuffles of the whole postings table — the match
  * is a lead-chain: one tokenize pass, a window PARTITIONED BY document
  * (state bounded by document length, never corpus-wide), and the phrase
  * predicate over term + its n−1 leads. One shuffle total, any phrase
  * length.
  */
object Phrase {

  def phraseMatches(docs: DataFrame, idCol: String, textCol: String,
                    phrase: String): DataFrame = {
    val words = phrase.trim.toLowerCase.split("\\s+")
    require(words.length >= 2, "phrase must have at least two words")
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val toks = docs.select(col(idCol),
      posexplode(TextFns.tokens(lower(col(textCol)))).as(Seq("pos", "term")))
    val withLeads = toks.select(col(idCol) +: col("pos") +: col("term") +:
      (1 until words.length).map(i => lead(col("term"), i).over(w).as(s"__t$i")): _*)
    val pred = words.zipWithIndex.map {
      case (wd, 0) => col("term") === wd
      case (wd, i) => col(s"__t$i") === wd
    }.reduce(_ && _)
    withLeads.filter(pred)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matches"),
        (min(col("pos")) + 1).cast("long").as("first_pos"))
  }
}

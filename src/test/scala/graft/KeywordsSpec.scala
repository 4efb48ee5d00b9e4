package graft

import graft.operators.Keywords

/** Pins RAKE keyword extraction (q265) against a hand-computed corpus:
  * stopword segmentation, corpus-global deg/freq word scores, phrase
  * ranking, and the maxPhraseLen drop (which must exclude the dropped
  * phrase's words from the statistics too).
  */
class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  test("rake: hand-computed scores, segmentation, and the long-phrase drop") {
    // word stats over the two kept docs:
    //   quick freq2 deg5 -> 2.5e6 ; brown freq1 deg3 -> 3e6
    //   fox   freq2 deg5 -> 2.5e6 ; lazy  freq2 deg5 -> 2.5e6
    //   dog   freq2 deg5 -> 2.5e6 ; runs  freq1 deg3 -> 3e6
    val docs = Seq(
      (1L, "The quick brown fox, of the lazy dog."),
      (2L, "Quick fox and lazy dog runs!"),
      (3L, "one two three four five")) // 5-token run: dropped entirely
      .toDF("doc_id", "text").repartition(3)
    val got = Keywords.rake(docs, "doc_id", "text",
        maxPhraseLen = 4, topK = 3)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, "quick brown fox", 1L, 8000000L, 1L),
      (1L, "lazy dog", 1L, 5000000L, 2L),
      (2L, "lazy dog runs", 1L, 8000000L, 1L),
      (2L, "quick fox", 1L, 5000000L, 2L)), s"got $got")
    assert(!got.exists(_._1 == 3L),
      "a phrase past maxPhraseLen must vanish, words and all")
  }

  test("rake: repeated phrase counts occurrences once in the ranking") {
    val docs = Seq((1L, "red car of red car")).toDF("doc_id", "text")
    val got = Keywords.rake(docs, "doc_id", "text", topK = 3)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    // red/car each: freq 2, deg 4 -> 2e6; phrase score 4e6, two segs
    assert(got == Set((1L, "red car", 2L, 4000000L, 1L)), s"got $got")
  }
}

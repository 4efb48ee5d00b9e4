package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Byte-pair-encoding subword tokenization — deterministic BPE merge-rule
  * training plus distributed corpus encoding. This is the "learn the
  * tokenizer, then integerize the corpus with it" step a real LLM training
  * pipeline runs between text hygiene and sequence packing; the reference
  * only tokenizes implicitly (DocETL `split` by `token_count`,
  * paper_extraction.yaml:22-23), so this follows the published algorithm
  * (Sennrich et al. 2016; the HuggingFace-tokenizers training shape) rather
  * than any reference code.
  *
  * Scale shape, deliberately mirroring the FAISS-codebook precedent in
  * [[Similarity]]: TRAINING runs on the word-frequency table, not the raw
  * corpus — one partial-aggregated `groupBy(word)` shuffle (cost ∝ distinct
  * words), capped at the top-`maxWords` rows before a bounded driver
  * collect. This is exactly how production BPE trainers work: merge rules
  * are learned from word counts, so the driver-side step is
  * O(maxWords · alphabet), never O(corpus). ENCODING is fully distributed
  * and also ∝ distinct words, not corpus tokens: the distinct-word set is
  * encoded once (broadcast merge table, greedy lowest-rank merge loop per
  * word), then joined back into the position-exploded token stream — at
  * 100 TB the dictionary join shuffles the (bounded) word set while the
  * corpus-side explode stays a narrow map.
  *
  * Determinism contract (same everywhere in this repo): the winning pair at
  * each merge step is max-frequency with ties broken lexicographically on
  * (left, right); the vocabulary assigns ids 0..k-1 to the sorted base
  * alphabet (end-of-word marker included) and base+i to merge product i.
  */
object Bpe {

  /** End-of-word marker appended to every word's symbol sequence, so merges
    * can distinguish word-final from word-internal contexts (Sennrich §3.2).
    */
  val Eow = "</w>"

  /** A trained model: ordered merge rules, symbol→id vocabulary, unk id. */
  final case class Model(merges: IndexedSeq[(String, String)],
                         vocab: Map[String, Long],
                         unkId: Long = -1L) {
    /** Merge priority: position in the learned sequence (lower wins). */
    lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
  }

  /** Train merge rules on the corpus' word-frequency table. One shuffle
    * (groupBy word), one bounded collect (top-`maxWords` by freq, ties
    * lexicographic — same cap discipline as Similarity's `maxTrain`).
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 50000): Model = {
    val wordFreq = docs
      .select(explode(TextFns.tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toIndexedSeq
    trainOnCounts(wordFreq, numMerges)
  }

  /** Pure driver-side trainer over (word, freq) pairs — split out so specs
    * can pin the classic textbook examples without a session. Stops early
    * when no pair occurs at least twice (a merge seen once compresses
    * nothing and would make the rule order data-layout-dependent).
    */
  def trainOnCounts(wordFreq: IndexedSeq[(String, Long)], numMerges: Int): Model = {
    var seqs: Array[(Array[String], Long)] =
      wordFreq.map { case (w, f) => (w.map(_.toString).toArray :+ Eow, f) }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      val pairFreq = mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- seqs; j <- 0 until syms.length - 1)
        pairFreq.updateWith((syms(j), syms(j + 1)))(c => Some(c.getOrElse(0L) + f))
      // a merge whose product string equals the end-of-word marker would
      // alias real content ("</w>" appearing literally in a scraped
      // corpus) with the out-of-band boundary symbol — ban it, so the
      // marker string stays uniquely the marker (subword-nmt escapes the
      // marker for the same reason)
      val best = pairFreq
        .filter(_._2 >= 2L)
        .filterNot { case ((a, b), _) => a + b == Eow }
      if (best.isEmpty) done = true
      else {
        val ((a, b), _) = best.minBy { case ((x, y), f) => (-f, x, y) }
        merges += ((a, b))
        seqs = seqs.map { case (syms, f) => (mergePair(syms, a, b), f) }
      }
    }
    val alphabet = (wordFreq.flatMap(_._1.map(_.toString)) :+ Eow).distinct.sorted
    val vocab = mutable.LinkedHashMap.empty[String, Long]
    alphabet.zipWithIndex.foreach { case (s, i) => vocab(s) = i.toLong }
    // two merge rules can yield the same product string (("a","bc") and
    // ("ab","c") both make "abc") — first id wins, the rule keeps its rank
    merges.foreach { case (a, b) =>
      if (!vocab.contains(a + b)) vocab(a + b) = vocab.size.toLong
    }
    Model(merges.toIndexedSeq, vocab.toMap)
  }

  private def mergePair(syms: Array[String], a: String, b: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
        out += a + b; j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toArray
  }

  /** Greedy encode of one word: split to chars + Eow, repeatedly apply the
    * lowest-rank applicable merge (leftmost occurrence first — standard BPE
    * application order), then map symbols to ids; symbols outside the
    * vocabulary (characters never seen in training) become `unkId`.
    */
  def encodeWord(word: String, model: Model): Array[Long] = {
    var syms = word.map(_.toString).toArray :+ Eow
    var merging = syms.length >= 2
    while (merging) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var j = 0
      while (j < syms.length - 1) {
        model.ranks.get((syms(j), syms(j + 1))) match {
          case Some(r) if r < bestRank => bestRank = r; bestIdx = j
          case _ =>
        }
        j += 1
      }
      if (bestIdx < 0) merging = false
      else {
        syms = mergePair(syms, syms(bestIdx), syms(bestIdx + 1))
        merging = syms.length >= 2
      }
    }
    syms.map(s => model.vocab.getOrElse(s, model.unkId))
  }

  /** Persist a trained model as parquet tables (ordered merges, vocab,
    * meta) — the tokenizer trains ONCE and every later job (batch encode,
    * streaming encode, serving) loads the identical artifact, which is how
    * a production pipeline guarantees train/serve token parity.
    */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
    model.vocab.toSeq.toDF("symbol", "id")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/vocab")
    Seq(model.unkId).toDF("unk_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Inverse of [[save]]: reconstructs the identical model (merge order,
    * vocabulary, unk id) from the persisted artifact.
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val merges = spark.read.parquet(s"$path/merges")
      .orderBy(col("rank")).collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toIndexedSeq
    val vocab = spark.read.parquet(s"$path/vocab").collect()
      .map(r => r.getAs[String]("symbol") -> r.getAs[Long]("id")).toMap
    val unk = spark.read.parquet(s"$path/meta").collect().head.getAs[Long]("unk_id")
    Model(merges, vocab, unk)
  }

  /** Inverse of [[encodeWord]] over known ids (diagnostic / spec use).
    * Per-symbol mapping: the marker symbol becomes a space, and a merged
    * symbol's trailing marker (word-final merges like "est</w>") is
    * stripped. Single characters are never markers, so literal "</w>"
    * TEXT in the corpus — whose chars stay unmerged because the trainer
    * bans any product equal to the marker string — survives decoding.
    */
  def decode(ids: Seq[Long], model: Model): String = {
    val inv = model.vocab.map(_.swap)
    ids.flatMap(inv.get).map {
      case Eow => " "
      case s if s.length > Eow.length && s.endsWith(Eow) =>
        s.dropRight(Eow.length) + " "
      case s => s
    }.mkString.trim
  }

  /** DISTRIBUTED decode — the inspection/debugging inverse of [[encode]]
    * (what did sequence X actually say?): the per-symbol piece mapping of
    * [[decode]] is precomputed driver-side into a vocab-sized broadcast
    * dim, each id row joins its piece, and documents reassemble in token
    * order. Unknown ids drop exactly as [[decode]]'s flatMap does; a doc
    * whose every id is unknown (or whose id array is empty) is absent.
    * Output: `(idCol, text_decoded)`.
    *
    * Scale shape: posexplode + broadcast join + one doc-keyed regroup —
    * ONE token-scale shuffle, the price of order-preserving reassembly
    * (unlike [[encode]]'s zero-shuffle narrow map, which never needs to
    * regroup because it transforms arrays in place). Decode is the
    * diagnostic path — typically run on a sample, not the corpus.
    */
  def decodeDf(df: DataFrame, idCol: String, idsCol: String,
               model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pieces = model.vocab.toSeq.map { case (s, i) =>
      val out = s match {
        case Eow => " "
        case x if x.length > Eow.length && x.endsWith(Eow) =>
          x.dropRight(Eow.length) + " "
        case x => x
      }
      (i, out)
    }.toDF("__tid", "__piece")
    df.select(col(idCol), posexplode(col(idsCol).cast("array<long>"))
        .as(Seq("__pos", "__tid")))
      .join(broadcast(pieces), Seq("__tid"))
      .groupBy(col(idCol))
      .agg(trim(array_join(transform(
        array_sort(collect_list(struct(col("__pos").as("p"),
          col("__piece").as("s")))),
        x => x.getField("s")), "")).as("text_decoded"))
  }

  /** Per-executor memo cache for [[encodeWord]]: the greedy merge loop
    * runs once per distinct word PER EXECUTOR instead of once per token
    * occurrence. Bounded so a pathological vocabulary can't OOM an
    * executor; at the cap the whole map is cleared and re-warmed (so
    * memoization never silently dies, and stale models' entries can't pin
    * the cap forever) — eviction only costs re-encoding, never results.
    */
  private val memoCap = 1 << 20
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Array[Long]]()

  private def encodeWordMemo(word: String, model: Model, modelKey: String): Array[Long] = {
    val k = (modelKey, word)
    val hit = memo.get(k)
    if (hit != null) hit
    else {
      val ids = encodeWord(word, model)
      if (memo.size >= memoCap) memo.clear()
      memo.put(k, ids)
      ids
    }
  }

  /** Distributed corpus encoding as a ZERO-SHUFFLE narrow map: the model
    * is broadcast, each document's token array is encoded in place (the
    * per-word merge loop memoized per executor, so cost still scales with
    * distinct words, not token occurrences), and no corpus row ever moves.
    * The earlier alternative — encode a distinct-word dictionary and join
    * it back — costs TWO corpus-token-scale shuffles (join on word,
    * regroup by doc); at 100 TB that's the whole job, so the narrow map
    * wins outright. Token-free documents drop (same contract as
    * [[Vocab.encode]]). Output per doc: `ids` (subword ids in token
    * order), `n_words`, `n_toks` (subword count), `n_unk`.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String, model: Model): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    // merges+vocab identify the model; the memo is keyed by an md5 of them
    // (not a 32-bit hashCode, whose collisions would silently serve another
    // model's ids) so two models in one JVM can never cross-contaminate
    val modelKey = {
      val md = java.security.MessageDigest.getInstance("MD5")
      model.merges.foreach { case (a, b) =>
        md.update(a.getBytes("UTF-8")); md.update(0.toByte)
        md.update(b.getBytes("UTF-8")); md.update(1.toByte)
      }
      model.vocab.toSeq.sorted.foreach { case (sym, id) =>
        md.update(sym.getBytes("UTF-8")); md.update(s"=$id;".getBytes("UTF-8"))
      }
      md.update(s"${model.unkId}".getBytes("UTF-8"))
      md.digest().map("%02x".format(_)).mkString
    }
    val enc = udf((ws: Seq[String]) =>
      ws.flatMap(w => encodeWordMemo(w, bc.value, modelKey)))
    docs
      .select(col(idCol), TextFns.tokens(lower(col(textCol))).as("ws"))
      .filter(size(col("ws")) > 0)
      .select(col(idCol), enc(col("ws")).as("ids"),
        size(col("ws")).cast("long").as("n_words"))
      .withColumn("n_toks", size(col("ids")).cast("long"))
      .withColumn("n_unk",
        size(expr(s"filter(ids, x -> x = ${model.unkId}L)")).cast("long"))
  }
}

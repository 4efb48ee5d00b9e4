package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable Bloom filter for semi-join reduction — the runtime-filter
  * shape that makes a selective fact⋈dim join viable at 100 TB: the dim
  * side's join keys are folded into an m-bit filter ONCE, the filter
  * broadcasts as a literal bit-word array, and the fact side is pruned by
  * a PURE Column predicate — no shuffle, no join, no UDF; the membership
  * test rides inside the scan's WholeStageCodegen filter, and rows that
  * cannot join never reach the exchange. Reference analog: the manifest
  * anti-join's "don't move what you'll drop" discipline
  * (`arxiv_hook.py:184-215`), applied to join input instead of re-fetch.
  *
  * Hashing is the q107-proven portable md5 family (hash row i hashes
  * "i:value"), so the set bit positions — and therefore every keep/drop
  * decision and every false positive — replay bit-identically in any
  * engine with md5. No false negatives by construction: the reduced join
  * EQUALS the unreduced join, which is exactly what the q149 oracle
  * checks, alongside replayed per-stage survival counts that pin the
  * false-positive behavior itself.
  *
  * Scale shape: `positions` is one distinct-key scan + a k-way explode,
  * partially aggregated to at most m rows regardless of dim size;
  * `bitWords` collects ≤ m/64 longs (m = 65536 → 1 KiB) — a bounded
  * driver artifact like the ANN codebooks. Standard sizing: for n keys,
  * m ≈ 1.44·k·n bits gives FP rate ≈ 2^-k.
  */
object Bloom {

  /** Position of value `v` under hash row `i`, in [0, m). */
  private[operators] def pos(i: Int, v: Column, m: Int): Column =
    conv(substring(md5(concat(lit(s"$i:"), v.cast("string")).cast("binary")),
      1, 8), 16, 10).cast("long") % m

  /** Driver-side twin of [[pos]] — the SAME position, computed without a
    * Spark job (the planner's bloom-prune path, [[ZoneMapMeta]]): md5 of
    * the identical `"i:<value>"` UTF-8 bytes, first 8 hex digits of the
    * digest as a base-16 long, mod m. `v` must be the value's
    * cast-to-string rendering (decimal for integrals, the raw string
    * for strings) — exactly what the aggregated side hashed.
    * `BloomSpec` pins position-for-position parity.
    */
  def posLocal(i: Int, v: String, m: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:$v".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % m
  }

  /** Driver-side membership test over packed words ([[bitWords]] layout:
    * word j holds positions [64j, 64j+64), LSB-first). */
  def mightContainLocal(words: Array[Long], v: String, m: Int,
                        k: Int): Boolean =
    (0 until k).forall { i =>
      val p = posLocal(i, v, m)
      ((words((p / 64).toInt) >>> (p % 64)) & 1L) == 1L
    }

  /** The filter as a TABLE of distinct set bit positions (≤ m rows) —
    * the mergeable form: filters over different dim shards union-distinct
    * into the filter of the union, same as the CMS merge law.
    */
  def positions(dim: DataFrame, keyCol: String, m: Int, k: Int): DataFrame =
    dim.select(col(keyCol).as("__k")).distinct()
      .select(explode(array((0 until k).map(i => pos(i, col("__k"), m)): _*))
        .as("pos"))
      .distinct()

  /** The filter packed into m/64 bit-words, collected to the driver.
    * Word j holds positions [64j, 64j+64); bit order is LSB-first.
    */
  def bitWords(positions: DataFrame, m: Int): Array[Long] = {
    require(m % 64 == 0, s"m must be a multiple of 64, got $m")
    val words = new Array[Long](m / 64)
    positions.select(col("pos")).collect().foreach { r =>
      val p = r.getLong(0)
      words((p / 64).toInt) |= (1L << (p % 64))
    }
    words
  }

  /** Membership predicate over the packed words: true iff ALL k hash
    * positions of `keyCol` are set. Pure expression — variable-distance
    * shifts go through SQL `shiftright`, which (unlike the Scala
    * `shiftright(Column, Int)` helper) accepts a Column distance.
    */
  def mightContain(words: Array[Long], keyCol: Column, m: Int, k: Int): Column =
    (0 until k).map { i =>
      val p = pos(i, keyCol, m)
      val word = element_at(array(words.map(lit): _*), (p / 64).cast("int") + 1)
      shiftRightExpr(word, (p % 64).cast("int")).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)

  /** `a >> b` with a Column shift distance (Scala functions only expose a
    * literal-Int shift).
    */
  private def shiftRightExpr(a: Column, b: Column): Column =
    call_function("shiftright", a, b)

  /** End-to-end reduction: build the filter from `dim(keyCol)`, prune
    * `fact` to rows whose `keyCol` might be in it. The returned frame is
    * fact-shaped — compose the real join downstream; no false negatives
    * means the composed join equals the unreduced one.
    */
  def reduce(fact: DataFrame, dim: DataFrame, keyCol: String,
             m: Int = 8192, k: Int = 3): DataFrame = {
    val words = bitWords(positions(dim, keyCol, m, k), m)
    fact.filter(mightContain(words, col(keyCol), m, k))
  }
}

package graft.operators

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** SINGLE-md5 bloom probe for the INJECTED runtime-filter predicate
  * ([[graft.plans.RuntimeFilterJoin]]) — Kirsch–Mitzenmacher double
  * hashing: ONE md5 of the key's UTF-8 rendering yields two 64-bit
  * halves, and position i = (h1 + i·h2) mod m, so k probes cost one
  * digest instead of k.
  *
  * WHY not the portable [[Bloom]] md5-family expression here: the
  * injected predicate reproduced `mightContain` node for node — five
  * full md5 calls per fact row — and measured as the dominant cost of
  * the bloom path (q356). The obvious fix, deriving the positions from
  * one md5 with built-in expressions, measures WORSE: `FilterExec`
  * splits the conjunction into independent predicates and does no
  * common-subexpression elimination across them, so each of the five
  * bit tests would re-evaluate BOTH halves — ten md5 calls per row
  * (verified against the generated code). A `StaticInvoke` of this
  * object is the shape that actually shares the digest: one md5 + k
  * bit tests per row, still inside WholeStageCodegen, still
  * deterministic, null-propagating like the expression it replaces.
  *
  * PORTABILITY is deliberately NOT a goal of this family: the injected
  * filter is ephemeral plan machinery whose equality law is "reduced
  * join ≡ plain join" (the oracle replays the plain join, not the
  * filter). The PERSISTED zone-map bloom format stays the portable
  * [[Bloom]] md5 family, untouched — a manifest must replay in any
  * engine; a plan-time predicate must only be fast and sound.
  *
  * PARITY by construction, not by pinned twins: the driver-side fold
  * ([[setBits]]) and the executor-side probe ([[probe]]) call the SAME
  * `hashes`/`posOf` — there is one code path, so a build/probe
  * disagreement (the failure mode the [[Bloom.posLocal]] twins guard
  * with spec pins) is structurally impossible. False-positive-only
  * follows: every key folded into the words sets exactly the bits the
  * probe tests.
  *
  * m MUST be a power of two (callers size it by doubling): the
  * position arithmetic masks with `m − 1`, which also makes the
  * wrap-around of the long addition exact mod-m, and h2 is forced ODD
  * so the probe step cycles the full table instead of a sub-cycle.
  */
object BloomKm {

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** (h1, h2 | 1) — the md5 digest's first and second 8 bytes,
    * big-endian. */
  private def hashes(bytes: Array[Byte]): (Long, Long) = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < 8) { h1 = (h1 << 8) | (h(i) & 0xffL); i += 1 }
    while (i < 16) { h2 = (h2 << 8) | (h(i) & 0xffL); i += 1 }
    (h1, h2 | 1L)
  }

  private def posOf(h1: Long, h2: Long, i: Int, m: Int): Int =
    ((h1 + i.toLong * h2) & (m - 1L)).toInt

  /** Executor-side probe (reached via `StaticInvoke`): ONE md5 + k bit
    * tests over the broadcast words (word j holds positions
    * [64j, 64j+64), LSB-first — the [[Bloom.bitWords]] layout). */
  def probe(key: UTF8String, words: ArrayData, m: Int, k: Int): Boolean = {
    val (h1, h2) = hashes(key.getBytes)
    var i = 0
    while (i < k) {
      val p = posOf(h1, h2, i, m)
      if (((words.getLong(p >> 6) >>> (p & 63)) & 1L) == 0L) return false
      i += 1
    }
    true
  }

  /** Driver-side fold — the same `hashes`/`posOf` as [[probe]]. `key`
    * must be the value's cast-to-string rendering (decimal integrals,
    * raw strings, [[graft.plans.ZoneMapRender]] ISO forms for date and
    * UTC timestamp) — exactly what the probe's `cast(key as string)`
    * produces executor-side. */
  def setBits(words: Array[Long], key: String, m: Int, k: Int): Unit = {
    require(m > 0 && (m & (m - 1)) == 0 && m % 64 == 0,
      s"BloomKm m must be a power of two multiple of 64, got $m")
    val (h1, h2) = hashes(key.getBytes("UTF-8"))
    var i = 0
    while (i < k) {
      val p = posOf(h1, h2, i, m)
      words(p >> 6) |= 1L << (p & 63)
      i += 1
    }
  }

  /** Driver-side membership twin over a plain long array (tests and
    * any plan-time consumers). */
  def mightContain(words: Array[Long], key: String, m: Int,
                   k: Int): Boolean = {
    val (h1, h2) = hashes(key.getBytes("UTF-8"))
    var i = 0
    while (i < k) {
      val p = posOf(h1, h2, i, m)
      if (((words(p >> 6) >>> (p & 63)) & 1L) == 0L) return false
      i += 1
    }
    true
  }
}

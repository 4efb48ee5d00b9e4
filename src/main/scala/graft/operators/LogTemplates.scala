package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Drain-lite log template mining: cluster log lines into templates by
  * keeping the tokens that are STABLE at their slot and wildcarding the
  * volatile ones.
  *
  * Lines are grouped by the classic Drain heuristic `(token count, first
  * token)`; within a group, slot `(pos, token)` is stable when its
  * occurrence count clears `minSharePermille` of the group's lines
  * (integer cross-multiplied comparison — no floats). Every line then
  * renders as its template (stable literals, `<*>` elsewhere) and
  * identical templates aggregate.
  *
  * The whole pipeline is deterministic relational algebra — token
  * explode, two grouped counts, one slot join, one per-line regroup — so
  * a SQL oracle replays it end to end. No driver state, no iteration.
  *
  * Scale shape: work ∝ total tokens. Shuffles land on slot keys
  * `(len, t1, pos, tok)` (high cardinality, skew-free even when one
  * template dominates the corpus — a hot GROUP spreads across its
  * positions × tokens), the per-line regroup on the line id, and the
  * final template count. The template alphabet is tiny next to the
  * corpus, so the result is a summary, not a copy.
  */
object LogTemplates {

  def mine(logs: DataFrame, idCol: String, textCol: String,
           minSharePermille: Long): DataFrame = {
    require(minSharePermille >= 1 && minSharePermille <= 1000,
      s"minSharePermille must be in [1, 1000], got $minSharePermille")
    val lines = logs.select(col(idCol).cast("long").as("__id"),
      split(col(textCol), " ").as("__a"))
    val withKey = lines.select(col("__id"), col("__a"),
      size(col("__a")).cast("long").as("__len"),
      element_at(col("__a"), 1).as("__t1"))
    val nd = withKey.groupBy(col("__len"), col("__t1"))
      .agg(count(lit(1)).as("__nd"))
    val toks = withKey.select(col("__id"), col("__len"), col("__t1"),
      posexplode(col("__a")).as(Seq("__pos0", "__tok")))
      .select(col("__id"), col("__len"), col("__t1"),
        (col("__pos0") + 1L).as("__pos"), col("__tok"))
    val slots = toks.groupBy(col("__len"), col("__t1"), col("__pos"), col("__tok"))
      .agg(count(lit(1)).as("__c"))
      .join(nd, Seq("__len", "__t1"))
      .select(col("__len"), col("__t1"), col("__pos"), col("__tok"),
        (col("__c") * 1000L >= lit(minSharePermille) * col("__nd"))
          .as("__stable"))
    val rendered = toks
      .join(slots, Seq("__len", "__t1", "__pos", "__tok"))
      .select(col("__id"),
        struct(col("__pos"),
          when(col("__stable"), col("__tok")).otherwise(lit("<*>"))
            .as("__out")).as("__s"))
      .groupBy(col("__id"))
      .agg(array_join(
        transform(array_sort(collect_list(col("__s"))), x => x("__out")),
        " ").as("template"))
    rendered.groupBy(col("template"))
      .agg(count(lit(1)).as("n_lines"), min(col("__id")).as("example_id"))
  }
}

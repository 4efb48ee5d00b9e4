package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution — char-level fuzzy matching of names/identifiers,
  * the "same real-world entity, slightly different string" problem that
  * MinHash (token-level) and SemDeDup (embedding-level) don't address.
  *
  * Blocking is the deletion neighborhood (the FastSS / SymSpell shape):
  * two strings within Levenshtein distance 1 (substitution, insertion,
  * or deletion) always share at least one single-character-deletion
  * variant, so candidates come from a self-join on the variant key —
  * O(n · len) variant rows and bounded groups instead of the O(n²)
  * all-pairs scan. Candidates are verified with the exact integer
  * Levenshtein distance (identical in any engine — the DP has no
  * floating point), so the oracle replays the whole pipeline.
  *
  * Scale shape: the variant explode is a narrow map; the self-join
  * shuffles on the variant key; a shared-prefix corpus can make some
  * variants hot, which AQE's skew-join handles (groups are bounded by
  * the alphabet-at-one-position, not the corpus).
  */
object Entities {

  /** Pairs of ids whose names are within Levenshtein distance 1
    * (id_a < id_b, deduplicated across blocking variants).
    */
  def fuzzyPairs(df: DataFrame, idCol: String, nameCol: String): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(nameCol).as("__nm"))
    // the delete-0 variant (the string itself) is REQUIRED: an
    // insertion/deletion pair shares no delete-1 variant — the shorter
    // string IS the longer one's delete-1 variant (FastSS's 0..k set)
    val vars = base.select(col("__id"), col("__nm"),
      explode(array_distinct(expr(
        """concat(array(__nm),
          |  transform(sequence(1, length(__nm)),
          |    i -> concat(substring(__nm, 1, i - 1),
          |                substring(__nm, i + 1, length(__nm)))))""".stripMargin)))
        .as("__v"))
    vars.alias("a")
      .join(vars.alias("b"),
        col("a.__v") === col("b.__v") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.__nm").as("na"), col("b.__nm").as("nb"))
      .distinct()
      .withColumn("dist", levenshtein(col("na"), col("nb")).cast("long"))
      .filter(col("dist") <= 1)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}

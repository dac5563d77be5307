package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Typo-tolerant entity resolution — the middle ground between the
  * reference's exact normalized name match and its KNN embedding fallback
  * (retrieval/ner.py): find string pairs within Levenshtein distance 1
  * WITHOUT an all-pairs comparison.
  *
  * Blocking is symmetric deletion (the SymSpell scheme): every string
  * emits itself plus its |s| single-character deletions; any two strings
  * within edit distance 1 share at least one variant, so candidate pairs
  * come from an equi-join on the variant key. A shared variant only bounds
  * the distance at 2 (two different deletions can collide), so candidates
  * are verified with an exact `levenshtein` before emission — the classic
  * block-then-verify shape whose cost is O(collisions), not O(n²).
  *
  * Scale: the variant explosion factor is |s|+1 (strings this matters for
  * are short names); the join key is the variant string, so co-location is
  * a plain shuffle on it. A pathological hot variant behaves like a hot
  * LSH bucket — cap it upstream the same way (Dedup.ngramJaccardPairs'
  * maxPostings pattern) if the name universe is adversarial.
  */
object Fuzzy {

  /** Single-deletion neighborhood of `col` (includes the string itself). */
  private val del1 =
    "array_union(array(name), transform(sequence(1, length(name)), " +
      "i -> concat(substring(name, 1, i - 1), substring(name, i + 1, length(name)))))"

  /** Distinct unordered pairs (name_a < name_b) of `names`'s `name` column
    * within Levenshtein distance `maxDist` (only 1 is supported — the
    * deletion blocking is complete exactly up to distance 1). */
  def nearNamePairs(names: DataFrame): DataFrame = {
    val variants = names.select(col("name"))
      .distinct()
      .select(col("name"), explode(expr(del1)).as("variant"))
    val candidates = variants.select(col("variant"), col("name").as("name_a"))
      .join(variants.select(col("variant"), col("name").as("name_b")),
        Seq("variant"))
      .where(col("name_a") < col("name_b"))
      .select("name_a", "name_b")
      .distinct()
    candidates
      .where(levenshtein(col("name_a"), col("name_b")) <= 1)
  }
}

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

  /** Textbook American Soundex (Russell 1918) as a pure column
    * expression both engines evaluate identically: letters map to digit
    * classes via ONE `translate`, adjacent duplicate digits collapse
    * (three replace passes per digit — handles runs up to 8, far beyond
    * any real word), vowel zeros drop, and the code is the uppercased
    * first letter plus the first three surviving digits zero-padded.
    * Collapsing BEFORE dropping the first position implements the
    * "first letter and adjacent same-code letters count once" rule
    * (pfister → P236); the h/w-transparency refinement of full Soundex
    * is deliberately omitted — blocking needs ONE deterministic rule,
    * not archival fidelity, and the simplification is mirrored
    * verbatim in the oracle. Expects a lowercase-letters-only word. */
  def soundexCode(word: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val codes = translate(word, "abcdefghijklmnopqrstuvwxyz",
      "01230120022455012623010202")
    val collapsed = (1 to 6).foldLeft(codes) { (c, d) =>
      (1 to 3).foldLeft(c)((cc, _) =>
        call_function("replace", cc, lit(s"$d$d"), lit(d.toString)))
    }
    val tail = call_function("replace",
      substring(collapsed, 2, 100), lit("0"), lit(""))
    concat(upper(substring(word, 1, 1)),
      rpad(substring(tail, 1, 3), 3, "0"))
  }

  /** Soundex blocking table: per phonetic code, the distinct-name count,
    * row count, and lexicographic representative — the blocking-key
    * histogram an ER pipeline inspects before pairing within blocks
    * (block sizes bound the pair explosion exactly like LSH buckets). */
  def soundexBlocks(names: DataFrame): DataFrame =
    names.withColumn("code", soundexCode(col("name")))
      .groupBy("code")
      .agg(count_distinct(col("name")).as("n_names"),
        count(lit(1)).as("n_rows"),
        min("name").as("first_name"))
}

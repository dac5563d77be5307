package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted two-phase aggregation: exactness under a synthetic hot key,
  * plus SQL access to the injected functions. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedCountDistinct is exact on a hot key") {
    // hot group "h" has 10k values (some repeated), cold groups small
    val rows = (1 to 10000).map(i => ("h", (i % 3000).toLong)) ++
      (1 to 10).map(i => ("c", i.toLong))
    val df = rows.toDF("k", "v")
    val got = Skew.saltedCountDistinct(df, "k", "v").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("h" -> 3000L, "c" -> 10L))
  }

  test("saltedSum is exact") {
    val df = (1 to 1000).map(i => ("h", i.toLong)).toDF("k", "v")
    val got = Skew.saltedSum(df, "k", col("v")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("h" -> 500500L))
  }

  test("injected SQL functions: graft_cosine and graft_nfc from spark.sql") {
    graft.functions.registerAll(spark)
    val r = spark.sql(
      """SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
        |       graft_nfc('Café') AS n""".stripMargin).collect().head
    assert(r.getDouble(0) === 1.0)
    assert(r.getString(1) === "Café")
  }

  test("saltedJoin: result-identical to the plain join under a hot key") {
    import spark.implicits._
    // 1000 rows on one hot key + a cold tail; dim has extra keys (inner
    // join must drop big rows without a match) and a duplicate key row
    // (fan-out must replicate, not dedup)
    val big = ((0 until 1000).map(i => (1L, i.toLong)) ++
      Seq((2L, -1L), (3L, -2L), (9L, -3L))).toDF("k", "v")
    val dim = Seq((1L, "hot"), (2L, "cold"), (2L, "cold2"), (7L, "unused"))
      .toDF("k", "name")
    val plain = big.join(dim, Seq("k"))
      .groupBy("k", "name").count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val salted = graft.operators.Skew.saltedJoin(big, dim, "k", salts = 8)
      .groupBy("k", "name").count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(salted === plain)
    assert(salted((1L, "hot")) === 1000L)
    assert(salted.contains((2L, "cold2")) && !salted.exists(_._1._1 == 9L))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions._

/** Column-function unit tests: tokenizer, token estimate, shingles, NFC. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).head().getAs[T]("v")

  test("words splits on whitespace and drops empties") {
    val w = Seq(("  a  b\tc\nd  ")).toDF("t")
      .select(words(col("t"))).head().getSeq[String](0)
    assert(w === Seq("a", "b", "c", "d"))
    assert(Seq(("")).toDF("t").select(words(col("t"))).head().getSeq[String](0).isEmpty)
  }

  test("tokenCountEstimate: word + len/4 surcharge") {
    // "hi" → 1+0; "abcdefgh" → 1+2; "abcd" → 1+1 ⇒ total 6
    val n = Seq(("hi abcdefgh abcd")).toDF("t")
      .select(tokenCountEstimate(col("t"))).head().getLong(0)
    assert(n === 6L)
    assert(Seq(("")).toDF("t").select(tokenCountEstimate(col("t"))).head().getLong(0) === 0L)
  }

  test("wordShingles n=3 edge cases: 0,1,2,3,4 words") {
    val cases = Seq((0L, ""), (1L, "a"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d"))
      .toDF("id", "t")
      .select(col("id"), wordShingles(col("t"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(cases(0L).isEmpty && cases(1L).isEmpty && cases(2L).isEmpty)
    assert(cases(3L) === Seq("a b c"))
    assert(cases(4L) === Seq("a b c", "b c d"))
  }

  test("wordShingles n=2") {
    val s = Seq(("x y z")).toDF("t").select(wordShingles(col("t"), 2))
      .head().getSeq[String](0)
    assert(s === Seq("x y", "y z"))
  }

  test("loader name mangling: CamelCase labels, UPPER_SNAKE rel types") {
    val r = Seq(("field_of_study", "author___writes___paper"))
      .toDF("t", "e")
      .select(camelLabel(col("t")).as("l"), upperSnakeRelType(col("e")).as("r"))
      .collect().head
    assert(r.getString(0) === "FieldOfStudy")
    assert(r.getString(1) === "WRITES")
    val slash = Seq(("exposure/phenotype")).toDF("t")
      .select(camelLabel(col("t"))).collect().head.getString(0)
    assert(slash === "ExposureOrPhenotype")
  }

  test("normName equates NFC/NFD forms case-insensitively") {
    val eq = Seq(("Café", "CAFÉ")).toDF("a", "b")
      .select((normName(col("a")) === normName(col("b"))).as("eq"))
      .head().getBoolean(0)
    assert(eq)
  }

  test("CountIn/TokenEstimate match their HOF reference forms on random input") {
    // the codegen'd expressions replaced interpreted lambdas; pin them to
    // the original higher-order formulations on 300 random word soups
    // (multi-byte chars, empties, long words, stopwords)
    val rnd = new scala.util.Random(42)
    val alphabet = Seq("the", "a", "of", "und", "der", "xyzzy", "café",
      "longerword", "a-b", "12345678", "ü", "it", "is")
    val texts = (1 to 300).map(_ =>
      (0 to rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(alphabet.size)))
        .mkString(" "))
    val needles = graft.operators.TextOps.stopwords("en")
    val mismatches = texts.toDF("t")
      .select(col("t"), words(col("t")).as("w"))
      .select(
        (countIn(col("w"), needles) ===
          size(filter(col("w"), x => x.isin(needles: _*)))).as("c_ok"),
        (tokenCountEstimate(col("t")) ===
          aggregate(words(col("t")), lit(0L),
            (acc, x) => acc + lit(1L) + floor(length(x) / lit(4)))).as("t_ok"))
      .where(!col("c_ok") || !col("t_ok"))
      .count()
    assert(mismatches === 0L)
    // SQL surface: graft_token_estimate (GraftExtensions + registerAll)
    graft.functions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT graft_token_estimate(array('hi', 'abcdefgh', 'abcd'))").head().getLong(0)
    assert(viaSql === 6L)
  }

  test("cosineSim of zero vector is null (non-ANSI 0/0; caller guards)") {
    val r = Seq((Seq(0.0, 0.0), Seq(1.0, 0.0))).toDF("a", "b")
      .select(cosineSim(col("a"), col("b")).as("s")).head()
    assert(r.isNullAt(0))
  }

  test("GraftOptimizations collapses nested NFC calls, result unchanged") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.bridge
    def nfc(c: org.apache.spark.sql.Column) =
      bridge.column(graft.expr.NormalizeNFC(bridge.expression(c)))
    val df = Seq("Café", "Café").toDF("s")
      .select(nfc(nfc(nfc(col("s")))).as("n"))
    val before = df.queryExecution.analyzed
    def countNfc(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.expressions.map(_.collect {
        case e: graft.expr.NormalizeNFC => e
      }.size).sum
    assert(countNfc(before) === 3)
    // the rule reaches a fixpoint in the optimizer's batch loop; applied
    // standalone it must strictly shrink and converge to one call
    val once = GraftOptimizations(before)
    val fixed = GraftOptimizations(once)
    assert(countNfc(fixed) === 1)
    // semantics: both inputs normalize to the composed form either way
    assert(df.as[String].collect().toSet === Set("Café"))
  }
}

package graft

import graft.operators.QuantileSketch
import graft.operators.QuantileSketch.MrlSketch
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  /** exact rank helpers on a plain Seq */
  private def countLe(xs: Seq[Long], v: Long): Long = xs.count(_ <= v).toLong
  private def countLt(xs: Seq[Long], v: Long): Long = xs.count(_ < v).toLong

  private def assertWindow(xs: Seq[Long], s: MrlSketch, pct: Int): Unit = {
    val r = math.max(1L, (pct * s.n + 99L) / 100L)
    val est = s.query(r)
    assert(countLe(xs, est) >= r - s.err,
      s"p$pct: #{x<=est}=${countLe(xs, est)} < r-err=${r - s.err}")
    assert(countLt(xs, est) <= r - 1 + s.err,
      s"p$pct: #{x<est}=${countLt(xs, est)} > r-1+err=${r - 1 + s.err}")
  }

  test("small input (n <= k): err 0, every quantile exact") {
    val xs = Seq(5L, 1L, 9L, 3L, 7L, 7L, 2L)
    val s = new MrlSketch(16)
    xs.foreach(s.insert)
    assert(s.err === 0L)
    assert(s.n === xs.length.toLong)
    val sorted = xs.sorted
    for (pct <- Seq(1, 25, 50, 75, 100)) {
      val r = math.max(1L, (pct * s.n + 99L) / 100L)
      assert(s.query(r) === sorted((r - 1).toInt), s"p$pct must be exact")
    }
  }

  test("err ledger bounds the TRUE rank error on uniform and skewed data") {
    val uni = (0 until 20000).map(i => ((i * 2654435761L) % 9973).abs)
    // heavy skew: zipf-ish powers — half the mass at one value
    val skew = (0 until 20000).map { i =>
      if (i % 2 == 0) 42L else (1L << (i % 16)) + i % 7
    }
    for (xs <- Seq(uni, skew); k <- Seq(64, 256)) {
      val s = new MrlSketch(k)
      xs.foreach(s.insert)
      assert(s.err > 0, "20k inserts at k<=256 must compact")
      // the ledger must stay useful, not just valid: O(n log(n/k) / k)
      assert(s.err < xs.length / 4, s"ledger blew up: ${s.err}")
      for (pct <- Seq(1, 10, 50, 90, 99)) assertWindow(xs, s, pct)
    }
  }

  test("mergeFrom: ledgers add, windows hold on the union, n exact") {
    val a = (0 until 7000).map(i => (i * 31L) % 1009)
    val b = (0 until 5000).map(i => 100000L + (i * 17L) % 503) // disjoint range
    val sa = new MrlSketch(128); a.foreach(sa.insert)
    val sb = new MrlSketch(128); b.foreach(sb.insert)
    val errBefore = sa.err + sb.err
    sa.mergeFrom(sb)
    assert(sa.n === 12000L)
    assert(sa.err >= errBefore, "merge may only grow the ledger")
    for (pct <- Seq(5, 50, 95)) assertWindow(a ++ b, sa, pct)
  }

  test("row codec round-trips n, err, and the full weighted multiset") {
    val s = new MrlSketch(32)
    (0 until 1234).foreach(i => s.insert((i * 7L) % 97))
    val rows = s.toRows("g", 3).toArray
    val back = QuantileSketch.rebuild(rows, 32)
    assert(back.n === s.n)
    assert(back.err === s.err)
    assert(back.weighted().toSeq === s.weighted().toSeq)
  }

  test("distributed states: bounds hold per group and for the rollup; " +
    "deterministic across identical runs") {
    val rnd = new scala.util.Random(11)
    val data = (0 until 30000).map { i =>
      val g = s"g${i % 3}"
      val v = if (i % 3 == 0) rnd.nextInt(100).toLong
              else (1L << rnd.nextInt(20)) + rnd.nextInt(5) // skewed group
      (g, v)
    }
    val df = data.toDF("grp", "v").repartition(8, col("v"))
    val rep = QuantileSketch.mrlQuantileReport(df, "grp", "v", 256,
      Seq("p50" -> 50, "p90" -> 90, "p99" -> 99))
    val rows = rep.collect()
    assert(rows.length === 12, "3 groups + __all__, 3 quantiles each")
    assert(rows.forall(_.getBoolean(3)), s"rank window violated: ${rows.toSeq}")
    val byGrp = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byGrp("__all__") === 30000L)
    assert(byGrp("g0") === 10000L)
    // same input partitioning → bit-identical report
    val again = QuantileSketch.mrlQuantileReport(df, "grp", "v", 256,
      Seq("p50" -> 50, "p90" -> 90, "p99" -> 99)).collect()
    assert(again.map(_.toSeq).toSeq === rows.map(_.toSeq).toSeq)
  }

  test("a rebuilt sketch works as an insert target and merge DESTINATION " +
    "(parity extends with levels)") {
    // rebuild() grows `levels` without touching the private parity buffer;
    // the first carry into a pre-existing level of a rebuilt sketch used
    // as a destination then indexed past parity's end (ADVICE r9)
    val src = new MrlSketch(4)
    (1 to 64).foreach(i => src.insert(i.toLong))    // several levels
    val dest = QuantileSketch.rebuild(src.toRows("g", 0).toArray, 4)
    (1 to 64).foreach(i => dest.insert(100L + i))   // carries into old levels
    val other = new MrlSketch(4)
    (1 to 16).foreach(i => other.insert(1000L + i))
    dest.mergeFrom(other)                           // merge INTO the rebuild
    assert(dest.n === 64L + 64L + 16L)
    val all = (1 to 64).map(_.toLong) ++ (1 to 64).map(100L + _) ++
      (1 to 16).map(1000L + _)
    for (pct <- Seq(10, 50, 90)) assertWindow(all, dest, pct)
  }

  test("mrlQuantileReport rejects a corpus group named '__all__' " +
    "(rollup-sentinel collision)") {
    val df = Seq(("__all__", 1L), ("__all__", 5L), ("g1", 2L))
      .toDF("grp", "v")
    val ex = intercept[Throwable] {
      QuantileSketch.mrlQuantileReport(df, "grp", "v", 8, Seq("p50" -> 50))
        .collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("__all__")),
      s"expected a sentinel-collision error, got: $ex")
  }

  test("state stays sub-linear: rows per state <= k * (levels + 2)") {
    val s = new MrlSketch(64)
    (0 until 100000).foreach(i => s.insert(i.toLong))
    val rows = s.toRows("g", 0).size
    val maxLevels = 64 - java.lang.Long.numberOfLeadingZeros(100000L / 64) + 2
    assert(rows <= 64 * maxLevels,
      s"$rows state rows for 100k inserts at k=64 — state is not compacting")
  }
}

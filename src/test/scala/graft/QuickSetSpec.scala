package graft

import org.scalatest.funsuite.AnyFunSuite

/** The `--quick` gate tier must stay pinned to the catalog: a renamed or
  * dropped entry would silently shrink the inner-loop gate. */
class QuickSetSpec extends AnyFunSuite {

  test("every quick-tier name is a catalog entry with an oracle") {
    val missing = Queries.quick -- Queries.all.keySet
    assert(missing.isEmpty, s"quick names not in the catalog: $missing")
    val unoracled = Queries.quick -- OracleSqls.all.keySet
    assert(unoracled.isEmpty, s"quick names without an oracle: $unoracled")
  }

  test("the quick tier stays a genuine subset at a useful size") {
    assert(Queries.quick.size >= 50 && Queries.quick.size <= 100,
      s"quick tier drifted to ${Queries.quick.size} entries")
    assert(Queries.quick.size < Queries.all.size / 2,
      "quick tier must stay a fraction of the full catalog")
  }
}

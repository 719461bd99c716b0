package graft

import org.scalatest.funsuite.AnyFunSuite

/** Meta-guards over the driver contract: the Registry is the single
  * source of truth for the correctness gate, so malformed entries fail CI
  * before they fail the round. */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique and well-formed") {
    val names = Registry.defs.map(_.name)
    assert(names.distinct.size === names.size,
      s"duplicate registrations: ${names.diff(names.distinct)}")
    names.foreach(n => assert(n.matches("q\\d+[a-z0-9_]*"),
      s"driver keys are q<N>_snake_case: '$n'"))
  }

  test("every oracle is non-empty single-statement SQL") {
    Registry.defs.flatMap(d => d.oracle.map(d.name -> _)).foreach {
      case (name, sql) =>
        assert(sql.trim.nonEmpty, s"$name: empty oracle")
        assert(sql.trim.toUpperCase.startsWith("WITH") ||
          sql.trim.toUpperCase.startsWith("SELECT"),
          s"$name: oracle must be a query, got: ${sql.take(40)}")
    }
  }

  test("rows-only entries stay an explicit, bounded set") {
    val rowsOnly = Registry.defs.filter(_.oracle.isEmpty).map(_.name).sorted
    // adding a rows-only entry is a deliberate decision, not a shortcut;
    // update this list (and the README) when one is genuinely necessary.
    // r6 moved q27/q32/q56/q80 to hash-gated contract formulations; r7
    // closed the last two: q29 via pigeonhole banded==brute equality,
    // q77 via planted-copy catch + per-flag global-witness re-verify —
    // every registered query is now oracle-gated
    assert(rowsOnly === Seq.empty,
      s"unexpected rows-only set: $rowsOnly")
  }
}

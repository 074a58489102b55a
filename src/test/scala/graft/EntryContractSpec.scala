package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract, enforced at test time: every `SparkEntry.queries`
  * entry has a DuckDB `oracleSql` twin and vice versa. Round 7 shipped 4
  * queries without twins (graded `no_oracle`); this spec turns that
  * process failure into a red test. If a future gate is genuinely not
  * SQL-replayable, list it in `rowsOnlyByDesign` WITH a justification
  * comment — an empty set is the expected steady state (even DEFLATE is
  * covered via the committed golden fixture). */
class EntryContractSpec extends AnyFunSuite {

  private val rowsOnlyByDesign: Set[String] = Set.empty

  test("every gate query has an oracle twin, and no orphan oracles exist") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val missing = q -- o -- rowsOnlyByDesign
    val orphans = o -- q
    assert(missing.isEmpty,
      s"queries without an oracleSql twin: ${missing.toSeq.sorted.mkString(", ")}")
    assert(orphans.isEmpty,
      s"oracleSql entries without a query: ${orphans.toSeq.sorted.mkString(", ")}")
  }

  test("oracle SQL is non-empty and free of stray placeholder markers") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle SQL")
      assert(!sql.contains("???"), s"$name: placeholder left in oracle SQL")
    }
  }
}

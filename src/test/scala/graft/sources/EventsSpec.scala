package graft.sources

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class EventsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("readNanos normalizes the testdata ts unit to nanoseconds") {
    val dir = "/root/testdata/sf0.001"
    // whatever unit the generator shipped (it has shipped ns AND µs
    // across rounds), the multiplier must land values in the ns band:
    // epoch-2000..2100 nanos are (0.95e18, 4.2e18) — three orders of
    // magnitude away from the neighboring units, so the assertion can't
    // pass on a mis-scaled read.
    val row = Events.readNanos(spark, dir)
      .agg(org.apache.spark.sql.functions.min("ts"),
        org.apache.spark.sql.functions.max("ts")).head()
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    assert(lo > 9.5e17.toLong && hi < 4.2e18.toLong,
      s"ts not in the nanosecond band: [$lo, $hi]")
    // multiplier is footer-derived and cached; consistent with the data
    val mult = Events.nanosMultiplier(spark, s"$dir/events.parquet")
    assert(Set(1L, 1000L, 1000000L).contains(mult))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Calendar densification: give every key a row for EVERY date between
  * its first and last observation — the regular-grid repair in front of
  * window indicators, whose row frames silently treat a 3-day gap as one
  * tick. Compose with [[Rolling.ffill]] to carry values across the
  * injected gap rows.
  *
  * Scale shape: one map-side-combinable min/max agg per key (a tiny spans
  * frame), one `sequence` + `explode` to generate the spine (spine size =
  * Σ key spans in DAYS — bounded by keys × calendar, independent of tick
  * count), and one left equi-join of spine to data on (key, date). The
  * join shuffles both sides on the same key — at 100 TB the spine side is
  * the small one; AQE picks the strategy. Dates only by design:
  * a second-granular spine would explode the row count, and sub-day grids
  * belong to the streaming window path.
  */
object Resample {

  /** Left-join a per-key daily date spine onto `df`. Every column of a
    * missing day's row is NULL except the keys and `dateCol`. */
  def densify(df: DataFrame, keyCols: Seq[String], dateCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    Guards.requireNoReserved(df.columns, Seq("__lo", "__hi"), "Resample.densify")
    val spans = df.groupBy(keyCols.map(col): _*)
      .agg(min(col(dateCol)).as("__lo"), max(col(dateCol)).as("__hi"))
    val spine = spans.select(
      keyCols.map(col) :+
        explode(sequence(col("__lo"), col("__hi"))).as(dateCol): _*)
    spine.join(df, keyCols :+ dateCol, "left")
  }

  /** Day-of-week seasonal profile + deseasonalization — the STL-lite
    * weekday-effect correction every daily operational series needs
    * before drift/anomaly screens (a Sunday dip is seasonality, not an
    * incident): per (key, dow) the mean of `valueCol`, and per row the
    * additive residual `x − dow_mean` as `<valueCol>_deseason`.
    *
    * One map-side-combinable (key, dow) aggregation (≤ 7 rows per key)
    * broadcast back onto the scan — the [[graft.operators.Anomaly]]
    * stats shape, no window anywhere. On integer-valued metrics the
    * (n, Σx) sums are exact in any order and the mean/residual are
    * fixed IEEE trees — bit-replayable. `dow` uses Spark `dayofweek`
    * (1=Sunday…7=Saturday; the NOTES.md cross-engine mapping). */
  def dowProfile(df: DataFrame, valueCol: String, dateCol: String,
                 keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "dowProfile needs at least one key column")
    val out = s"${valueCol}_deseason"
    Guards.requireNoReserved(df.columns,
      Seq("dow", "dow_mean", out, "__n", "__s"), "Resample.dowProfile")
    val x = col(valueCol).cast("double")
    val withDow = df.withColumn("dow", dayofweek(col(dateCol)))
    val stats = withDow.groupBy((keyCols :+ "dow").map(col): _*)
      .agg(count(x).as("__n"), sum(x).as("__s"))
      .select((keyCols :+ "dow").map(col) :+
        (col("__s") / col("__n").cast("double")).as("dow_mean"): _*)
    withDow.join(broadcast(stats), keyCols :+ "dow")
      .withColumn(out, x - col("dow_mean"))
  }
}

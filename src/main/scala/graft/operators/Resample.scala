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

  /** Per-key linear time interpolation of NULL gaps — the proportional
    * repair between [[Rolling.ffill]] (step-carry, biased on trends) and
    * dropping the row: a NULL at time t between surrounding non-null
    * observations (t₀, v₀) and (t₁, v₁) becomes
    * `v₀ + (v₁ − v₀) · (t − t₀)/(t₁ − t₀)`, time-weighted so an
    * off-center gap row lands proportionally, not halfway. Leading and
    * trailing NULLs (no surrounding pair) stay NULL — interior repair
    * only, by design; compose with [[Rolling.ffill]] for edge carry.
    *
    * Exactness: `ordCol` must be integral (epoch micros/nanos, or the
    * [[densify]] date cast to days) so the time deltas are exact longs;
    * the interpolation is then ONE fixed IEEE tree per row (one exact-
    * rounded division, multiply, add) — engine-replayable with no
    * rounding step. Requires a TOTAL order: `ordCol` must be distinct
    * per key (densified grids are), or a tied frame boundary is
    * layout-dependent.
    *
    * Plan: one keyed exchange, two frame passes on the same sort
    * (backward last-non-null, forward first-non-null) carrying (t, v)
    * structs so the timestamp and value always come from the SAME
    * anchor row. Appends `<valueCol>_interp`. */
  def interpolate(df: DataFrame, keyCols: Seq[String], ordCol: String,
                  valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "interpolate needs at least one key column")
    val out = s"${valueCol}_interp"
    Guards.requireNoReserved(df.columns,
      Seq(out, "__prev", "__next"), "Resample.interpolate")
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol)
    val anchor = when(v.isNotNull,
      struct(col(ordCol).cast("long").as("t"), v.cast("double").as("v")))
    val back = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val fwd = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ordCol))
      .rowsBetween(1, Window.unboundedFollowing)
    val withAnchors = df
      .withColumn("__prev", last(anchor, ignoreNulls = true).over(back))
      .withColumn("__next", first(anchor, ignoreNulls = true).over(fwd))
    val t = col(ordCol).cast("long")
    val p = col("__prev")
    val nx = col("__next")
    val interp = p.getField("v") +
      (nx.getField("v") - p.getField("v")) *
        ((t - p.getField("t")).cast("double") /
          (nx.getField("t") - p.getField("t")).cast("double"))
    withAnchors
      .withColumn(out,
        when(v.isNotNull, v.cast("double"))
          .otherwise(when(p.isNotNull && nx.isNotNull, interp)))
      .drop("__prev", "__next")
  }
}

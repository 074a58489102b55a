package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact cumulative sums without a global sort: the bucketed
  * two-level prefix-sum kernel shared by [[Divergence.ksTest]] (ECDF) and
  * [[Feature.quantileNormalize]] (pooled position segments).
  *
  * A plain `sum(...) OVER (ORDER BY ord)` is a 1-partition sort — the
  * classic scale-killer. Instead: `nBuckets` monotone clamped value ranges
  * partition the sort (ordering by (bucket, ord) IS ordering by ord), the
  * per-bucket totals form an `nBuckets`-row frame whose own tiny window
  * yields cross-bucket offsets, and each bucket's local window adds its
  * offset — integer sums decompose exactly, so the result is bit-identical
  * to the global cumsum on any layout.
  */
private[operators] object Prefix {

  /** Append `cum_<c>` (the inclusive running sum of column `c` in
    * ascending `ordCol` order) for every `c` in `sumCols`. `ordCol` must
    * be non-null numeric with DISTINCT values per row (aggregate first —
    * both call sites run on distinct-value frames); sum columns must be
    * integral (exact decomposition). */
  def bucketedCumsum(df: DataFrame, ordCol: String, sumCols: Seq[String],
                     nBuckets: Int): DataFrame =
    bucketedCumsumImpl(df, ordCol, sumCols, nBuckets, withLead = false)

  /** [[bucketedCumsum]] plus `lead_<ordCol>` — the NEXT distinct ord value
    * in global order (null on the overall last row), still without any
    * global sort: within a bucket it is the local `lead`; on a bucket's
    * last row it is the next non-empty bucket's min ord, carried on the
    * same tiny broadcast offsets frame. [[Divergence.wasserstein1]] uses
    * it for the ECDF step widths. */
  def bucketedCumsumWithLead(df: DataFrame, ordCol: String,
                             sumCols: Seq[String], nBuckets: Int): DataFrame =
    bucketedCumsumImpl(df, ordCol, sumCols, nBuckets, withLead = true)

  private def bucketedCumsumImpl(df: DataFrame, ordCol: String,
                                 sumCols: Seq[String], nBuckets: Int,
                                 withLead: Boolean): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    require(sumCols.nonEmpty, "need at least one sum column")
    val mm = df.agg(min(col(ordCol)).as("__plo"), max(col(ordCol)).as("__phi"))
    val span = col("__phi") - col("__plo")
    val bucketed = df.crossJoin(broadcast(mm))
      .withColumn("__pbk",
        when(span === 0.0, lit(0)).otherwise(
          least(lit(nBuckets - 1), greatest(lit(0),
            floor((col(ordCol) - col("__plo")) * lit(nBuckets.toDouble) / span)
              .cast("int")))))
      .drop("__plo", "__phi")
    val aggs = sumCols.map(c => sum(col(c)).as(s"__bt_$c")) ++
      (if (withLead) Seq(min(col(ordCol)).as("__bmin")) else Nil)
    val offCols = sumCols.map { c =>
      coalesce(sum(col(s"__bt_$c")).over(Window.orderBy(col("__pbk"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
        .as(s"__off_$c")
    } ++ (if (withLead)
      Seq(lead(col("__bmin"), 1).over(Window.orderBy(col("__pbk")))
        .as("__nxtmin"))
    else Nil)
    val offsets = bucketed.groupBy(col("__pbk"))
      .agg(aggs.head, aggs.drop(1): _*)
      .select(col("__pbk") +: offCols: _*)
    val w = Window.partitionBy(col("__pbk")).orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cummed = sumCols
      .foldLeft(bucketed.join(broadcast(offsets), Seq("__pbk"))) { (acc, c) =>
        acc.withColumn(s"cum_$c", col(s"__off_$c") + sum(col(c)).over(w))
      }
    val led = if (withLead)
      cummed.withColumn(s"lead_$ordCol",
        coalesce(
          lead(col(ordCol), 1)
            .over(Window.partitionBy(col("__pbk")).orderBy(col(ordCol))),
          col("__nxtmin")))
        .drop("__nxtmin")
    else cummed
    led.drop("__pbk" +: sumCols.map(c => s"__off_$c"): _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 1000-executor regime.
  *
  * Spark's AQE rebalances skewed *shuffle partitions* automatically, but two
  * shapes still need explicit salting: a single hot key inside one
  * aggregation group, and a hot join key against a non-broadcastable build
  * side. Both helpers keep results exactly equal to their unsalted
  * equivalents (only algebraic aggregates are offered, and the join salt is
  * derived deterministically from the probe row).
  */
object Skew {

  /** Two-stage aggregation over possibly-skewed keys: rows first aggregate
    * on (keys, salt) — spreading a hot key over `salts` reducers — then the
    * partials combine on the keys alone. Only algebraic aggregates (sum,
    * count, min, max) are supported, because stage 2 must be able to merge
    * stage-1 partials; avg must be expressed as sum/count by the caller.
    *
    * The salt is derived from a caller-named unique column (a row id), so
    * the plan stays deterministic under task retries. */
  def twoStageAgg(df: DataFrame, keys: Seq[String], saltSource: String,
                  aggs: Seq[(String, String)], salts: Int = 32): DataFrame = {
    require(salts > 0)
    val supported = Set("sum", "count", "min", "max")
    aggs.foreach { case (_, fn) =>
      require(supported(fn), s"unsupported algebraic aggregate: $fn")
    }
    val salted = df.withColumn("__salt", pmod(xxhash64(col(saltSource)), lit(salts)))
    def stage1(colName: String, fn: String): Column = fn match {
      case "sum"   => sum(col(colName))
      case "count" => count(col(colName))
      case "min"   => min(col(colName))
      case "max"   => max(col(colName))
    }
    val partials = aggs.zipWithIndex.map { case ((c, fn), i) =>
      stage1(c, fn).as(s"__p$i")
    }
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    // merge partials: count partials combine with sum
    val finals = aggs.zipWithIndex.map { case ((c, fn), i) =>
      val merged = fn match {
        case "sum" | "count" => sum(col(s"__p$i"))
        case "min"           => min(col(s"__p$i"))
        case "max"           => max(col(s"__p$i"))
      }
      merged.as(s"${fn}_$c")
    }
    partial.groupBy(keys.map(col): _*).agg(finals.head, finals.tail: _*)
  }

  /** Skewed equi-join: the (non-broadcastable) build side is replicated
    * `salts`× and the probe side picks one deterministic salt per row, so a
    * hot join key spreads over `salts` tasks instead of one straggler.
    * Result equals `probe.join(build, keys)` exactly: every probe row meets
    * the full build row set for its key exactly once.
    *
    * `saltSource` must name a probe-side column (ideally unique, e.g. a row
    * id) — using row content keeps the salt stable under task retries,
    * unlike `rand()`. */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 saltSource: String, salts: Int = 8): DataFrame = {
    require(salts > 0)
    val p = probe.withColumn("__salt", pmod(xxhash64(col(saltSource)), lit(salts)))
    val b = build.withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    p.join(b, keys :+ "__salt").drop("__salt")
  }

  /** The diagnostic that tells you whether [[twoStageAgg]]/[[saltedJoin]]
    * are needed at all: top-`topK` keys by row count with each key's
    * corpus share and its `skew` ratio vs a uniform spread
    * (`cnt · n_keys / total`; 1.0 = perfectly uniform, `heavy` flags
    * keys ≥ `heavyFactor`× the uniform mean — straggler candidates).
    *
    * Scale shape: ONE hash aggregate over the corpus (map-side partial);
    * everything after runs on the counts frame (key cardinality, never
    * rows) — the one-row totals broadcast back, and the ranking window's
    * global sort is over that same counts frame with the rank≤topK
    * filter pushed into it (WindowGroupLimit). Integer arithmetic until
    * the two final divisions. */
  def keyReport(df: DataFrame, keyCols: Seq[String], topK: Int = 20,
                heavyFactor: Double = 4.0): DataFrame = {
    require(keyCols.nonEmpty, "keyReport needs at least one key column")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(heavyFactor > 0, s"heavyFactor must be positive, got $heavyFactor")
    Guards.requireNoReserved(df.columns,
      Seq("cnt", "rank", "share", "skew", "heavy", "__total", "__n_keys"),
      "Skew.keyReport")
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("__total"),
      count(lit(1)).as("__n_keys"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc +: keyCols.map(col): _*)
    counts.join(broadcast(totals))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .withColumn("share",
        col("cnt").cast("double") / col("__total").cast("double"))
      .withColumn("skew",
        (col("cnt") * col("__n_keys")).cast("double") /
          col("__total").cast("double"))
      .withColumn("heavy", col("skew") >= heavyFactor)
      .drop("__total", "__n_keys")
  }
}

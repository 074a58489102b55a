package graft

import org.apache.spark.sql.SparkSession

/** r15 optimization-round measurement probe (guide §1: measure first).
  *
  * Two modes, no timing-contract impact (never run by the driver):
  *
  *  - default: a PLAN CENSUS over every SparkEntry query — counts physical
  *    Exchange / Sort / Window / Generate / Join nodes from the analyzed
  *    plan (no execution), so the expensive shapes can be ranked and
  *    cross-referenced against bench seconds before touching anything.
  *
  *  - GRAFT_PROBE_PHASES=q_a,q_b: per-query PHASE breakdown — table
  *    registration (the per-call `load`), DataFrame construction
  *    (analysis), first noop action (codegen + execution), second noop
  *    action (steady state) — separating fixed per-gate overhead from
  *    real computation. Sweeps between queries exactly like Bench.
  *
  * Output: one JSON line per query on stdout (prefix `CENSUS` / `PHASES`).
  */
object PlanCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.buffer.pageSize", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def sweep(): Unit = {
      CacheScope.release(blocking = true)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }

    val phases = sys.env.get("GRAFT_PROBE_PHASES")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])

    if (phases.nonEmpty) {
      // warm the session the way Bench does
      force(SparkEntry.queries("q_indicators_combined")(spark, sfDir))
      sweep()
      // pseudo-queries: the shared prefix stages of the dailyBars gate
      // family, so the fixed overhead can be attributed stage by stage
      import org.apache.spark.sql.functions.{col, expr}
      def bars(s: SparkSession) = operators.Bars.ohlc(
        s.read.parquet(s"$sfDir/lineitem.parquet").withColumn("l_tick",
          expr("l_orderkey * 8 + l_linenumber")),
        "l_quantity", "l_extendedprice", Seq("l_suppkey"), "l_shipdate",
        Seq("l_tick"), volScale = 2)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(-4, 0)
      def li(s: SparkSession) = s.read.parquet(s"$sfDir/lineitem.parquet")
      import org.apache.spark.sql.functions.avg
      val bw = Window.partitionBy(col("l_suppkey")).orderBy(col("l_shipdate"))
        .rowsBetween(-4, 0)
      val pseudo: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
        "_scan" -> ((s, _) => s.read.parquet(s"$sfDir/lineitem.parquet")),
        "_bars" -> ((s, _) => bars(s)),
        "_bars_sorted" -> ((s, _) =>
          bars(s).orderBy(col("l_suppkey"), col("l_shipdate"))),
        // window-over-raw-lineitem gate shape: hash exchange for the window
        // + range exchange for the final global sort (current), vs ONE
        // range exchange below the window (candidate)
        "_win_raw" -> ((s, _) => li(s)
          .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
            col("l_linenumber"), avg(col("l_quantity")).over(w).as("m"))
          .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
            col("l_linenumber"))),
        "_win_raw_range" -> ((s, _) => li(s)
          .repartitionByRange(col("l_suppkey"))
          .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
            col("l_linenumber"), avg(col("l_quantity")).over(w).as("m"))
          .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
            col("l_linenumber"))),
        // the REAL raw-window gate presentation order (q_sma etc. end in
        // ORDER BY l_orderkey, l_linenumber — NOT a window-key prefix), so
        // the final range exchange re-keys regardless and the range-below-
        // window candidate can only swap the window's hash exchange for a
        // range exchange plus its sampling job. _win_raw/_win_raw_range
        // above measure the suppkey-prefixed order that the BAR gates use;
        // these two measure what the raw SQL gates would actually see.
        "_win_raw_pres" -> ((s, _) => li(s)
          .select(col("l_orderkey"), col("l_linenumber"),
            avg(col("l_quantity")).over(w).as("m"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))),
        "_win_raw_pres_range" -> ((s, _) => li(s)
          .repartitionByRange(col("l_suppkey"))
          .select(col("l_orderkey"), col("l_linenumber"),
            avg(col("l_quantity")).over(w).as("m"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))),
        // bars-then-window gate shape: agg exchange + window hash exchange
        // + final range exchange (current), vs agg exchange + ONE range
        // exchange (candidate)
        "_bars_win" -> ((s, _) => bars(s)
          .select(col("l_suppkey"), col("l_shipdate"),
            avg(col("close")).over(bw).as("m"))
          .orderBy(col("l_suppkey"), col("l_shipdate"))),
        "_bars_win_range" -> ((s, _) => bars(s)
          .repartitionByRange(col("l_suppkey"))
          .select(col("l_suppkey"), col("l_shipdate"),
            avg(col("close")).over(bw).as("m"))
          .orderBy(col("l_suppkey"), col("l_shipdate"))))
      (SparkEntry.queries.toSeq ++ pseudo).sortBy(_._1)
        .filter { case (n, _) => phases(n) }
        .foreach { case (name, fn) =>
          def t[A](body: => A): (A, Double) = {
            val t0 = System.nanoTime(); val a = body
            (a, (System.nanoTime() - t0) / 1e9)
          }
          // phase 1: plan construction (includes the gate's internal load())
          val (df, tPlan) = t(fn(spark, sfDir))
          // phase 2: first action (codegen compile + execute)
          val (_, tRun1) = t(force(df))
          sweep()
          // phase 3: rebuild + second action (codegen cache warm)
          val (df2, tPlan2) = t(fn(spark, sfDir))
          val (_, tRun2) = t(force(df2))
          sweep()
          println(f"""PHASES {"query":"$name","plan1":$tPlan%.3f,"run1":$tRun1%.3f,"plan2":$tPlan2%.3f,"run2":$tRun2%.3f}""")
        }
    } else {
      val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          // formatted explain descends into the AQE wrapper's initial plan;
          // node counts come from the numbered operator list ("(3) Sort")
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          val ops = """\(\d+\) ([A-Za-z]+)""".r
            .findAllMatchIn(txt).map(_.group(1)).toSeq
          def c(p: String) = ops.count(_.contains(p))
          val ex = c("Exchange"); val sort = c("Sort") - c("SortAggregate") -
            c("SortMergeJoin")
          val win = c("Window"); val gen = c("Generate")
          val smj = c("SortMergeJoin"); val bhj = c("BroadcastHashJoin")
          val bnl = c("BroadcastNestedLoop"); val agg = c("Aggregate")
          f"""CENSUS {"query":"$name","exchange":$ex,"sort":$sort,"window":$win,"generate":$gen,"smj":$smj,"bhj":$bhj,"bnlj":$bnl,"agg":$agg}"""
        } catch {
          case e: Throwable =>
            s"""CENSUS {"query":"$name","error":"${e.getClass.getSimpleName}"}"""
        } finally {
          CacheScope.release()
        }
      }
      rows.foreach(println)
    }
    spark.stop()
  }
}

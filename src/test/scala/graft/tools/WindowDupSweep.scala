package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot audit: for EVERY SparkEntry gate query, list window
  * expressions that appear more than once (canonicalized) inside a single
  * logical Window node of the optimized plan. Each duplicate is a per-row
  * re-fold of its frame at execution time (sliding min/max/sum are
  * non-invertible in Spark), so any hit is a staging candidate — the same
  * audit PlanSpec pins for the 26 already-staged operators, swept across
  * the whole gate surface.
  *
  * Output: one line per offending query — `DUP <query> <n>x <expr.take(120)>`
  * and a final `SWEPT <total> OFFENDERS <count>` summary.
  */
object WindowDupSweep {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.FinancialFunctions.registerAll(spark)

    var offenders = 0
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try {
        val dups = WindowDups.audit(graft.SparkEntry.queries(name)(spark, sf)
          .queryExecution.optimizedPlan)
        if (dups.exists(!_._3)) offenders += 1
        dups.foreach { case (n, expr, allCheap) =>
          // CHEAP = allowlisted O(1)-per-row residual (lag/lead,
          // unbounded-preceding frame); DUP = per-row frame re-fold
          println(s"${if (allCheap) "CHEAP" else "DUP"} $name ${n}x $expr")
        }
      } catch {
        case e: Throwable =>
          println(s"SKIP $name ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).take(100))
      }
    }
    println(s"SWEPT ${names.size} OFFENDERS $offenders")
    spark.stop()
  }
}

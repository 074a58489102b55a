package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Times sma at several window sizes over one partitioned pass of sf0.1
  * lineitem — the measurement behind the Sma buffer design (ring vs
  * Concat/Slice). */
object SmaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.FinancialFunctions.registerAll(spark)
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    li.createOrReplaceTempView("li")
    val n = li.count()
    for (w <- Seq(5, 20, 50, 200)) {
      val q = spark.sql(
        s"""SELECT sma(l_extendedprice, $w) OVER (
           |  PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber) AS s
           |FROM li""".stripMargin)
      force(q) // warm
      val t0 = System.nanoTime()
      force(q)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"sma($w%3d): $sec%6.2f s  ${n / sec / 1000}%.0fK rows/s")
    }
    spark.stop()
  }
}

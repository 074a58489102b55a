package graft.tools

import org.apache.spark.sql.SparkSession

/** Drives the spark.sql.extensions registration path end-to-end in a fresh
  * JVM (the shared test session cannot exercise it). */
object ExtensionsDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = spark.sql("""
      SELECT i, sma(x, 2) OVER (ORDER BY i) AS s, macd(x) OVER (ORDER BY i) AS m
      FROM VALUES (1, 10.0), (2, 20.0), (3, 30.0) t(i, x) ORDER BY i""").collect()
    println("EXT_SMA=" + rows.map(r => Option(r.get(1)).orNull).mkString(","))
    println("EXT_VECDOT=" + spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))").head().getDouble(0))
    try spark.sql("SELECT sma(1.0) OVER (ORDER BY 1)").collect()
    catch { case e: Exception => println("EXT_ARITY_ERR=" + e.getMessage.linesIterator.next()) }
    try spark.sql("SELECT ema(x, 3) OVER () FROM VALUES (1.0) t(x)").collect()
    catch { case e: Exception => println("EXT_UNORDERED_ERR=" + e.getMessage.linesIterator.next()) }
    println("EXT_ORDERED_OK=" + spark.sql(
      "SELECT ema(x, 3) OVER (ORDER BY x) FROM VALUES (1.0), (2.0) t(x)").count())
    // the aggregate extensions resolve through the same injected registry
    println("EXT_TOPK=" + spark.sql(
      """SELECT topk_by(o, i, 0L, 2) FROM
        |VALUES (3.0D, 1L), (1.0D, 2L), (2.0D, 3L) t(o, i)""".stripMargin)
      .head().getSeq[Any](0).length)
    println("EXT_ARGMIN=" + spark.sql(
      """SELECT argmin_by(o, i, array(CAST(7.0 AS FLOAT))).id FROM
        |VALUES (3.0D, 1L), (1.0D, 2L) t(o, i)""".stripMargin).head().getLong(0))
    spark.stop()
    println("DONE")
  }
}

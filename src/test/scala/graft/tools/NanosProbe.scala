package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Probe: can events.parquet (TIMESTAMP(NANOS) ts) be read without the
  * session-wide legacy conf — via a user-specified LongType schema, or via
  * set-then-restore scoping? */
object NanosProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val key = "spark.sql.legacy.parquet.nanosAsLong"

    // approach A: explicit schema, no conf
    try {
      val df = spark.read
        .schema(StructType(Seq(
          StructField("event_id", LongType), StructField("user_id", LongType),
          StructField("event_type", StringType), StructField("ts", LongType),
          StructField("value", DoubleType))))
        .parquet(s"$sfDir/events.parquet")
      println("A_SCHEMA_OK " + df.selectExpr("min(ts)").head().get(0))
    } catch { case e: Throwable => println("A_SCHEMA_FAIL " + e.getMessage.take(300)) }

    // approach B: set conf, read, restore BEFORE the action
    try {
      spark.conf.set(key, "true")
      val df = spark.read.parquet(s"$sfDir/events.parquet")
      spark.conf.unset(key)
      println("B_RESTORE_OK " + df.selectExpr("min(ts)").head().get(0))
      println("B_CONF_NOW " + spark.conf.getOption(key))
    } catch { case e: Throwable => println("B_RESTORE_FAIL " + e.getMessage.take(300)) }
    spark.stop()
  }
}

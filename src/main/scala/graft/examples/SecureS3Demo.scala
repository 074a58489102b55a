package graft.examples

import org.apache.spark.sql.SparkSession
import graft.sources.{Polygon, PolygonClient}

/** Analog of the reference's `examples/secure_polygon_integration.rs`
  * (`/root/reference/examples/secure_polygon_integration.rs:1-100`):
  * credentials come from the environment (POLYGON_ACCESS_KEY_ID /
  * POLYGON_SECRET_ACCESS_KEY, never hardcoded), then the client walks the bucket
  * structure. Without credentials it degrades gracefully to the
  * instructions, exactly like the reference's `from_env()` error arm.
  *
  * Run: `sbt "runMain graft.examples.SecureS3Demo"` */
object SecureS3Demo {
  def main(args: Array[String]): Unit = {
    Polygon.PolygonConfig.fromEnv() match {
      case Some(config) =>
        println("Loaded Polygon S3 credentials from environment")
        val spark = SparkSession.builder()
          .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
          .config("spark.sql.shuffle.partitions", "4")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false")
          .appName("graft-secure-s3-demo")
          .getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        val client = new PolygonClient(spark, Polygon.S3(config))

        println("\nRoot files/directories:")
        client.listAvailableFiles("").take(10).foreach(f => println(s"  $f"))
        println("\nAsset classes:")
        client.discoverAssetClasses().take(10).foreach { ac =>
          println(s"  $ac")
          client.discoverDataTypes(ac).take(3).foreach(dt => println(s"    - $dt"))
        }
        spark.stop()

      case None =>
        println("No Polygon credentials in the environment.")
        println("Set POLYGON_ACCESS_KEY_ID and POLYGON_SECRET_ACCESS_KEY " +
          "(see Polygon.PolygonConfig.fromEnv) and re-run; " +
          "credentials are read from the environment only — never hardcoded.")
    }
  }
}

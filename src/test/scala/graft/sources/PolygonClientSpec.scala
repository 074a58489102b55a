package graft.sources

import java.nio.file.{Files, Paths}
import java.time.LocalDate
import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class PolygonClientSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // FIXTURES.md §1 — the reference's own 5-row crypto sample
  private val sampleCsv =
    """ticker,date,open,high,low,close,volume,vwap,transactions
      |BTC,2023-01-15,21000.50,21500.75,20800.25,21350.00,1500000,21300.25,12500
      |ETH,2023-01-15,1550.25,1580.50,1540.00,1575.75,800000,1565.50,8500
      |LTC,2023-01-15,85.50,87.25,84.75,86.50,150000,86.00,2500
      |ADA,2023-01-15,0.35,0.37,0.34,0.36,2000000,0.355,15000
      |DOT,2023-01-15,6.25,6.45,6.15,6.35,300000,6.30,3500""".stripMargin

  private lazy val root: String = {
    val dir = Files.createTempDirectory("polygon_test").toString
    val sub = Paths.get(dir, "global_crypto", "day_aggs_v1", "2023")
    Files.createDirectories(sub)
    Files.writeString(sub.resolve("2023-01-15.csv"), sampleCsv)
    dir
  }

  private lazy val client = new PolygonClient(spark, Polygon.Local(root))

  test("filePath builds the dated layout for local and s3") {
    val d = LocalDate.of(2023, 1, 15)
    assert(Polygon.filePath(Polygon.Local("/data"), Polygon.AssetClass.Crypto,
      Polygon.DataType.DayAggs, d) === "/data/global_crypto/day_aggs_v1/2023/2023-01-15.csv")
    val s3 = Polygon.filePath(Polygon.S3(Polygon.PolygonConfig("ak", "sk")),
      Polygon.AssetClass.Stocks, Polygon.DataType.MinuteAggs, d)
    assert(s3 === "s3a://flatfiles/us_stocks_sip/minute_aggs_v1/2023/2023-01-15.csv.gz")
  }

  test("loadData reads the dated file with explicit schema") {
    val df = client.loadData(Polygon.AssetClass.Crypto, Polygon.DataType.DayAggs,
      LocalDate.of(2023, 1, 15))
    assert(df.count() === 5)
    assert(df.schema === Polygon.dayAggsSchema)
  }

  test("symbol filter restricts to one ticker and reaches the scan") {
    val df = client.loadData(Polygon.AssetClass.Crypto, Polygon.DataType.DayAggs,
      LocalDate.of(2023, 1, 15), Some("BTC"))
    assert(df.count() === 1)
    assert(df.head().getAs[String]("ticker") === "BTC")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("Filter"))
  }

  test("registerTableWithIndicators enables the local_demo query") {
    client.registerTableWithIndicators("crypto_sample",
      client.loadData(Polygon.AssetClass.Crypto, Polygon.DataType.DayAggs,
        LocalDate.of(2023, 1, 15)))
    val out = spark.sql(
      """SELECT ticker, close,
        |  sma(close, 3) OVER (PARTITION BY ticker ORDER BY date) AS sma_3
        |FROM crypto_sample ORDER BY ticker""".stripMargin).collect()
    assert(out.length === 5)
  }

  test("listAvailableFiles honors the 20-file cap and discovery splits paths") {
    val files = client.listAvailableFiles("global_crypto", limit = 20)
    assert(files.length === 1 && files.head.endsWith("2023-01-15.csv"))
    assert(client.discoverAssetClasses() === Seq("global_crypto"))
    assert(client.discoverDataTypes("global_crypto") === Seq("day_aggs_v1"))
  }

  test("gzip-compressed CSV decompresses by extension (the S3 flat-file format)") {
    val gzDir = java.nio.file.Files.createTempDirectory("polygon_gz")
    val gzPath = gzDir.resolve("2023-01-15.csv.gz")
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(gzPath))
    out.write(("ticker,date,open,high,low,close,volume,vwap,transactions\n" +
      "X:BTCUSD,2023-01-15,16500.0,16600.0,16400.0,16550.0,1200,16520.0,300\n").getBytes)
    out.close()
    val df = client.loadCsv(gzPath.toString, Polygon.dayAggsSchema, Some("X:BTCUSD"))
    val row = df.head()
    assert(df.count() === 1 && row.getAs[Double]("close") === 16550.0)
  }

  test("missing file / prefix behaves gracefully") {
    assert(client.listAvailableFiles("nonexistent") === Seq.empty)
    intercept[Exception] {
      client.loadData(Polygon.AssetClass.Forex, Polygon.DataType.DayAggs,
        LocalDate.of(2023, 1, 15)).count()
    }
  }

  test("object-store branch end-to-end via the s3a stub filesystem") {
    // lay out a bucket-shaped local store: flatfiles/us_stocks_sip/
    //   day_aggs_v1/2024/2024-01-02.csv.gz (the S3 flat-file format)
    val store = Files.createTempDirectory("s3astub").toString
    val key = Paths.get(store, "flatfiles", "us_stocks_sip",
      "day_aggs_v1", "2024")
    Files.createDirectories(key)
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(key.resolve("2024-01-02.csv.gz")))
    gz.write(("ticker,date,open,high,low,close,volume,vwap,transactions\n" +
      "AAPL,2024-01-02,187.15,188.44,183.89,185.64,82488700,185.9465,1008871\n" +
      "MSFT,2024-01-02,373.86,375.90,366.50,370.87,25258600,370.60,540476\n")
      .getBytes)
    gz.close()

    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.impl", classOf[S3AStubFileSystem].getName)
    hc.set("fs.s3a.impl.disable.cache", "true")
    hc.set("graft.s3astub.root", store)
    try {
      // same env-var names as the reference (config.rs:8-51) drive the
      // client's S3 conf; endpoint/credentials land in hadoopConfiguration
      val cfg = Polygon.PolygonConfig("test-ak", "test-sk",
        endpoint = "http://stub.local:9999", bucket = "flatfiles")
      val s3Client = new PolygonClient(spark, Polygon.S3(cfg))
      assert(hc.get("fs.s3a.endpoint") === "http://stub.local:9999")

      // loadData resolves s3a://flatfiles/.../2024-01-02.csv.gz through the
      // stub: scheme registration, gz decompress, schema, pushed filter
      val df = s3Client.loadData(Polygon.AssetClass.Stocks,
        Polygon.DataType.DayAggs, LocalDate.of(2024, 1, 2), Some("AAPL"))
      assert(df.count() === 1)
      assert(df.head().getAs[Double]("close") === 185.64)
      assert(df.schema === Polygon.dayAggsSchema)

      // listing and discovery walk the bucket through Hadoop FS and
      // report s3a:// paths, not the stub's local backing store
      val files = s3Client.listAvailableFiles("us_stocks_sip")
      assert(files === Seq(
        "s3a://flatfiles/us_stocks_sip/day_aggs_v1/2024/2024-01-02.csv.gz"))
      assert(s3Client.discoverAssetClasses() === Seq("us_stocks_sip"))
      assert(s3Client.discoverDataTypes("us_stocks_sip") === Seq("day_aggs_v1"))
      assert(s3Client.listAvailableFiles("nonexistent") === Seq.empty)
    } finally {
      hc.unset("fs.s3a.impl")
      hc.unset("fs.s3a.impl.disable.cache")
      hc.unset("graft.s3astub.root")
      // the PolygonClient constructor wrote these four into the SHARED
      // session's hadoopConfiguration — unset them too, or the stub
      // endpoint/credentials leak into every later test in this JVM
      hc.unset("fs.s3a.endpoint")
      hc.unset("fs.s3a.access.key")
      hc.unset("fs.s3a.secret.key")
      hc.unset("fs.s3a.path.style.access")
    }
  }
}

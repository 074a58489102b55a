package graft.sources

import java.time.LocalDate
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Polygon.io-style flat-file layer (reference `src/polygon/`):
  * path construction with per-date manual partition pruning
  * (`client.rs:243-285`), CSV loading with explicit schemas and optional
  * symbol filter (`client.rs:98-134`), S3/Local source selection
  * (`config.rs:55-61`), file listing and discovery (`client.rs:152-232`).
  *
  * Spark-first notes: the ticker filter is applied directly on the scan so
  * Catalyst pushes it into the CSV reader; explicit `StructType`s avoid the
  * schema-inference extra pass; `.csv.gz` decompresses by extension.
  */
object Polygon {

  /** Asset classes and their bucket prefixes (reference `types.rs:26-38`). */
  sealed abstract class AssetClass(val prefix: String)
  object AssetClass {
    case object Stocks extends AssetClass("us_stocks_sip")
    case object Options extends AssetClass("us_options_opra")
    case object Futures extends AssetClass("futures")
    case object Indices extends AssetClass("indices")
    case object Forex extends AssetClass("forex")
    case object Crypto extends AssetClass("global_crypto")
    val all: Seq[AssetClass] = Seq(Stocks, Options, Futures, Indices, Forex, Crypto)
  }

  /** Data types and their directory names (reference `client.rs:250-256`). */
  sealed abstract class DataType(val dir: String)
  object DataType {
    case object MinuteAggs extends DataType("minute_aggs_v1")
    case object DayAggs extends DataType("day_aggs_v1")
    case object Trades extends DataType("trades_v1")
    case object Quotes extends DataType("quotes_v1")
    case object GroupedDaily extends DataType("grouped_daily_v1")
  }

  /** S3 flat-files credentials/endpoint (reference `config.rs:8-51`). */
  final case class PolygonConfig(
      accessKey: String,
      secretKey: String,
      endpoint: String = "https://files.polygon.io",
      bucket: String = "flatfiles")

  object PolygonConfig {
    /** Environment-variable loading, same variable names as the reference. */
    def fromEnv(): Option[PolygonConfig] = for {
      ak <- sys.env.get("POLYGON_ACCESS_KEY_ID")
      sk <- sys.env.get("POLYGON_SECRET_ACCESS_KEY")
    } yield PolygonConfig(ak, sk,
      sys.env.getOrElse("POLYGON_S3_ENDPOINT", "https://files.polygon.io"),
      sys.env.getOrElse("POLYGON_S3_BUCKET", "flatfiles"))
  }

  sealed trait DataSource
  final case class S3(config: PolygonConfig) extends DataSource
  final case class Local(root: String) extends DataSource

  /** Day-aggregates schema (reference `examples/local_demo.rs:99-105`). */
  val dayAggsSchema: StructType = StructType(Seq(
    StructField("ticker", StringType),
    StructField("date", DateType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", LongType),
    StructField("vwap", DoubleType),
    StructField("transactions", LongType)))

  /** Minute-aggregates schema: keyed by `window_start` timestamp instead of
    * date (reference `validator.rs:89-97`, `README.md:88`). */
  val minuteAggsSchema: StructType = StructType(Seq(
    StructField("ticker", StringType),
    StructField("window_start", TimestampType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", LongType),
    StructField("vwap", DoubleType),
    StructField("transactions", LongType)))

  def schemaFor(dataType: DataType): StructType = dataType match {
    case DataType.DayAggs | DataType.GroupedDaily => dayAggsSchema
    case _ => minuteAggsSchema
  }

  /** Dated file path — the by-date selection IS the partition pruning:
    * `<root>/<asset_prefix>/<type>_v1/<YYYY>/<YYYY-MM-DD>.csv[.gz]`
    * (reference `client.rs:258-282`). */
  def filePath(source: DataSource, asset: AssetClass, dt: DataType,
               date: LocalDate): String = {
    val rel = f"${asset.prefix}/${dt.dir}/${date.getYear}%04d/" +
      f"${date.getYear}%04d-${date.getMonthValue}%02d-${date.getDayOfMonth}%02d"
    source match {
      case S3(cfg)     => s"s3a://${cfg.bucket}/$rel.csv.gz"
      case Local(root) => s"$root/$rel.csv" // local files are uncompressed (client.rs:119-124)
    }
  }
}

/** Session-scoped client — the analog of the reference's `PolygonClient`
  * (`client.rs:14-291`): owns source config, loads dated CSVs lazily,
  * registers indicator-enabled views, lists/discovers available data. */
class PolygonClient(spark: SparkSession, source: Polygon.DataSource) {
  import Polygon._

  // S3 object-store registration (reference client.rs:48-68) → Hadoop S3A
  source match {
    case S3(cfg) =>
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.s3a.endpoint", cfg.endpoint)
      hc.set("fs.s3a.access.key", cfg.accessKey)
      hc.set("fs.s3a.secret.key", cfg.secretKey)
      hc.set("fs.s3a.path.style.access", "true")
    case _ => ()
  }

  private def rootPrefix: String = source match {
    case S3(cfg)     => s"s3a://${cfg.bucket}"
    case Local(root) => root
  }

  /** Load one dated file for an asset class and data type, optionally
    * filtered to a single ticker (filter pushed into the scan). */
  def loadData(asset: AssetClass, dt: DataType, date: LocalDate,
               symbol: Option[String] = None): DataFrame =
    loadCsv(filePath(source, asset, dt, date), schemaFor(dt), symbol)

  def loadCsv(path: String, schema: StructType,
              symbol: Option[String] = None): DataFrame = {
    val df = spark.read.option("header", "true").schema(schema).csv(path)
    symbol.fold(df)(s => df.filter(col("ticker") === s))
  }

  /** Register a view with the 4 indicator functions available
    * (reference `client.rs:137-149`). */
  def registerTableWithIndicators(name: String, df: DataFrame): Unit = {
    graft.functions.FinancialFunctions.registerAll(spark)
    df.createOrReplaceTempView(name)
  }

  /** List up to `limit` files under a prefix (reference caps at 20,
    * `client.rs:174`). Works for both file:// and s3a:// via Hadoop FS. */
  def listAvailableFiles(prefix: String, limit: Int = 20): Seq[String] = {
    val p = new Path(s"$rootPrefix/$prefix")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      val it = fs.listFiles(p, true)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext && out.size < limit) out += it.next().getPath.toString
      out.toSeq
    }
  }

  /** First path segment under the root (reference `client.rs:205-218`). */
  def discoverAssetClasses(): Seq[String] = listChildren("")

  /** Second-level segments under an asset class (reference `client.rs:220-232`). */
  def discoverDataTypes(assetClass: String): Seq[String] = listChildren(assetClass)

  private def listChildren(rel: String): Seq[String] = {
    val p = new Path(if (rel.isEmpty) rootPrefix else s"$rootPrefix/$rel")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated parquet star schema (TESTDATA.md).
  *
  * Stands in for the reference's lakehouse catalog scans
  * (`useCatalog`/`useDatabase` + SQL over Iceberg tables, reference
  * offlineanls/ProcessUserPoints.scala:30-41 — SURVEY §2.1 S4): one
  * parquet directory per scale factor, one file per table. Column
  * pruning and predicate pushdown reach the parquet scan because
  * everything downstream is a declarative DataFrame plan.
  */
final case class Tables(spark: SparkSession, dir: String) {
  /** Schema inference is a Spark job per `spark.read.parquet` — a fixed
    * tax every catalog query pays once per table it touches. A real
    * lakehouse catalog serves schemas from metadata instead; stand in
    * for that here: infer once per (path, mtime, length) and supply the
    * schema explicitly thereafter. The key carries the file status, so
    * a rewritten fixture re-infers; it also carries the nanos-as-long
    * conf, because that conf changes what schema the SAME events file
    * infers to. Caches metadata only — never data or results. */
  private def t(name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    val nanosConf = spark.conf
      .getOption("spark.sql.legacy.parquet.nanosAsLong").getOrElse("false")
    val key = s"$path@${st.getModificationTime}:${st.getLen}:$nanosConf"
    val schema = Tables.schemaCache.computeIfAbsent(key,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.ts is TIMESTAMP(NANOS) parquet: read as long ns (legacy
    * conf set in GraftSession.tuning) and floor-convert to µs — the
    * identical truncation DuckDB applies, so formatted/derived values
    * hash-match the oracle. */
  def events: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  /** (path, mtime, len, conf) → inferred schema; see [[Tables.t]]. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()
}

package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    Queries.q01(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * training-data extensions). Each tunes the session first so the
    * engine's semantics (non-ANSI eval, UTC, AQE) hold regardless of the
    * caller's builder. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map { case (name, fn) =>
      name -> ((s: SparkSession, dir: String) => { GraftSession.tune(s); fn(s, dir) })
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for hash-seeded ops (minhash,
    * simhash, LSH) → driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] = Queries.oracle
}

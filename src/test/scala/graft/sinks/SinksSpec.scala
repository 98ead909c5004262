package graft.sinks

import graft.SparkTestBase
import java.nio.file.Files

class SinksSpec extends SparkTestBase {
  import spark.implicits._

  test("K6: upsert keeps latest version per key across batches") {
    val dir = Files.createTempDirectory("graft_dim_").toString + "/dim"
    val b1 = Seq(("u1", "lvl1", 100L), ("u2", "lvl2", 200L))
      .toDF("user_id", "level", "ver")
    Sinks.upsertParquet(spark, b1, dir, key = "user_id", versionCol = "ver")
    // update u1 (higher version), insert u3, stale u2 (lower version)
    val b2 = Seq(("u1", "lvl9", 300L), ("u3", "lvl3", 150L), ("u2", "stale", 50L))
      .toDF("user_id", "level", "ver")
    Sinks.upsertParquet(spark, b2, dir, key = "user_id", versionCol = "ver")
    val out = spark.read.parquet(dir).orderBy("user_id")
      .as[(String, String, Long)].collect()
    assert(out.toSeq == Seq(
      ("u1", "lvl9", 300L), ("u2", "lvl2", 200L), ("u3", "lvl3", 150L)))
  }
}

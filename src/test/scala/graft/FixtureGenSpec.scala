package graft

import org.apache.spark.sql.functions._

/** The scale fixture must be schema-FAITHFUL to the source corpus:
  * a re-typed column (round 14 found n_chars recomputed as int32
  * against an int64 source) surfaces only at 10×/100× — as parquet
  * physical-type mismatches inside the write doors — and silently
  * invalidates the scale artifacts. */
class FixtureGenSpec extends SparkTestBase {

  test("replicate preserves every table's exact schema") {
    for (t <- FixtureGen.tables) {
      val src = spark.read.parquet(s"$sf/$t.parquet")
      val rep = FixtureGen.replicate(src, t, replicas = 3)
      assert(rep.schema == src.schema,
        s"$t: replicate re-typed the schema\n src: ${src.schema}\n rep: ${rep.schema}")
    }
  }

  test("replicate preserves per-replica structure: counts scale, keys " +
    "disjoint, replica-0 text untouched") {
    val src = spark.read.parquet(s"$sf/documents.parquet")
    val rep = FixtureGen.replicate(src, "documents", replicas = 3)
      .localCheckpoint()
    assert(rep.count() == 3 * src.count())
    // key offset keeps replicas disjoint
    assert(rep.select("doc_id").distinct().count() == rep.count())
    // replica 0 is the original corpus byte-for-byte
    val r0 = rep.filter(col("doc_id") < 100000000L)
    assert(r0.exceptAll(src).isEmpty && src.exceptAll(r0).isEmpty)
    // salted replicas share no 8-gram with the original (the
    // constant-duplication-rate design: within-replica structure only)
    assert(rep.filter(col("doc_id") >= 100000000L)
      .filter(col("text") === src.select("text").limit(1)
        .collect().head.getString(0)).isEmpty)
  }
}

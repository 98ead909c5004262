package graft.expressions

import graft.SparkTestBase
import graft.functions.{Text, TextStats}
import org.apache.spark.sql.functions._

/** The one-pass MarkerCounts scan must be value-identical to the
  * replace-arithmetic forms in Text — the oracles are written against
  * the latter. Edge cases: overlap suppression, adjacent shared-space
  * markers, multi-byte (CJK) markers, empty/null text. */
class MarkerCountsSpec extends SparkTestBase {
  import spark.implicits._

  private val tricky = Seq(
    "the cat and the dog of the house, in a bag; to go!",
    " a a a aaa .. ,, 的的是了 the and of ",
    "",
    "no-markers-here",
    "der und die el los y le la et 的是",
    "... the the the and and of of of ...")

  test("one-pass counts equal per-marker replace arithmetic") {
    val df = tricky.toDF("t").withColumn("_mc", TextStats.counts($"t"))
    TextStats.allMarkers.zipWithIndex.foreach { case (m, i) =>
      val got = df.select(element_at($"_mc", i + 1)).as[Long].collect().toSeq
      val want = df.select(Text.markerCount($"t", m)).as[Long].collect().toSeq
      assert(got == want, s"marker '$m'")
    }
  }

  test("derived metrics equal the Text forms on real documents") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
      .withColumn("_mc", TextStats.counts(col("text")))
    val both = docs.select(
      TextStats.wordCount(col("text"), col("_mc")).as("w2"),
      Text.wordCount(col("text")).as("w1"),
      TextStats.punctCount(col("_mc")).as("p2"),
      Text.punctCount(col("text")).as("p1"),
      TextStats.stopwordCount(col("_mc")).as("s2"),
      Text.stopwordCount(col("text")).as("s1"),
      TextStats.langId(col("_mc")).as("l2"),
      Text.langId(col("text")).as("l1"),
      TextStats.qualityScore(col("text"), col("_mc")).as("q2"),
      Text.qualityScore(col("text")).as("q1"))
    val bad = both.filter(
      col("w1") =!= col("w2") || col("p1") =!= col("p2") ||
        col("s1") =!= col("s2") || col("l1") =!= col("l2") ||
        col("q1") =!= col("q2")).count()
    assert(bad == 0)
  }

  test("null text yields null counts (UnaryExpression null propagation)") {
    val n = Seq[Option[String]](None, Some("x the y")).toDF("t")
      .select(TextStats.counts($"t").as("mc"))
      .filter(col("mc").isNull).count()
    assert(n == 1)
  }
}

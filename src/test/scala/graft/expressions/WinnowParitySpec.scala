package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The native winnowing kernel must be BIT-IDENTICAL to the Column
  * tree it replaced (and to q63's DuckDB oracle, which replays that
  * tree): same grams, same md5 hex, same window minima, same distinct
  * order-insensitive fingerprint set per document. */
class WinnowParitySpec extends SparkTestBase {
  import spark.implicits._

  /** The ORIGINAL five-operator formulation, kept here as the parity
    * reference. */
  private def treeForm(w: Int) =
    array_sort(array_distinct(transform(
      sequence(lit(0), greatest(size(col("_hs")) - w, lit(0))),
      i => array_min(slice(col("_hs"), i + lit(1), lit(w))))))

  test("native winnow_fingerprints == the md5/slice/array_min tree, " +
    "corpus-wide and on edge shapes") {
    val edge = Seq(
      (9000001L, ""),                       // empty text: one md5("") gram
      (9000002L, "   "),                    // spaces only
      (9000003L, "one"),                    // fewer words than k
      (9000004L, "a b c d e f g h"),        // exactly k words
      (9000005L, "a b c d e f g h i j k"),  // m < w windows
      (9000006L, "x x x x x x x x x x x x x x x x x x x x")) // all-equal grams
      .toDF("doc_id", "text")
    val docs = graft.Tables(spark, sf).documents
      .select(col("doc_id"), col("text")).unionByName(edge)
    for ((k, w) <- Seq((8, 4), (3, 2), (5, 9))) {
      val native = docs.select(col("doc_id"),
        array_sort(TextSignatures.winnowFingerprints(col("text"), k, w))
          .as("fps"))
      val tree = docs
        .select(col("doc_id"), transform(
          TextSignatures.shingles(col("text"), k), s => md5(s)).as("_hs"))
        .select(col("doc_id"), treeForm(w).as("fps"))
      val diff = native.exceptAll(tree).union(tree.exceptAll(native))
      assert(diff.isEmpty,
        s"(k=$k, w=$w) kernel diverged:\n${diff.limit(5).collect().toSeq}")
    }
  }
}

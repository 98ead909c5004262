package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass multi-marker substring counter.
  *
  * The text-quality family (language-ID, stopword/punctuation ratios,
  * quality score — builder-brief text analysis) needs the occurrence
  * count of ~28 literal markers per document. The `Column` formulation
  * (`length(c) - length(replace(c, m, ''))` per marker,
  * graft.functions.Text.markerCount) re-scans and re-allocates the
  * document once per marker — 28 full passes over the corpus, which at
  * 100 TB is 28× the string bandwidth of the scan itself.
  *
  * This expression returns all counts as one `array<long>` from ONE
  * scan of the document's UTF-8 bytes: markers are grouped by first
  * byte, so each text position tests only the (usually zero) markers
  * that could start there. Counting is left-to-right non-overlapping
  * per marker, independently — exactly the arithmetic of the
  * replace-based form, so oracles keep using that ANSI shape.
  * `CodegenFallback` wraps only the per-row call; the surrounding
  * projection stays in whole-stage codegen (same pattern as
  * MinHashSig, SCALING debt #3).
  */
case class MarkerCounts(child: Expression, markers: Seq[String])
    extends UnaryExpression with CodegenFallback {
  require(markers.nonEmpty, "marker_counts needs at least one marker")
  require(markers.forall(_.nonEmpty),
    "marker_counts markers must be non-empty strings")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // per-marker UTF-8 bytes, and marker indices bucketed by first byte
  @transient private lazy val markerBytes: Array[Array[Byte]] =
    markers.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  @transient private lazy val byFirstByte: Array[Array[Int]] = {
    val buckets = Array.fill(256)(List.empty[Int])
    markerBytes.zipWithIndex.foreach { case (mb, i) =>
      val b = mb(0) & 0xff
      buckets(b) = i :: buckets(b)
    }
    buckets.map(_.reverse.toArray)
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].getBytes
    val n = s.length
    val counts = new Array[Long](markerBytes.length)
    // next position at which marker i may match again (non-overlap)
    val nextOk = new Array[Int](markerBytes.length)
    var pos = 0
    while (pos < n) {
      val cand = byFirstByte(s(pos) & 0xff)
      var ci = 0
      while (ci < cand.length) {
        val mi = cand(ci)
        if (pos >= nextOk(mi)) {
          val mb = markerBytes(mi)
          val ml = mb.length
          if (pos + ml <= n) {
            var j = 1 // first byte already matched via the bucket
            while (j < ml && s(pos + j) == mb(j)) j += 1
            if (j == ml) {
              counts(mi) += 1
              nextOk(mi) = pos + ml
            }
          }
        }
        ci += 1
      }
      pos += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(c: Expression): MarkerCounts =
    copy(child = c)
  override def prettyName: String = "marker_counts"
}

object MarkerCounts {
  def apply(c: Column, markers: Seq[String]): Column =
    ColumnBridge.column(new MarkerCounts(ColumnBridge.expression(c), markers))
}

package graft.expressions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter build + probe for set-membership at scales where the
  * set no longer broadcasts as data (SURVEY §2.11's custom-aggregate
  * slot, same family as `Sampling.BottomK`).
  *
  * The motivating consumer is benchmark decontamination (q54 joins
  * corpus shingles against a BROADCAST eval-shingle table — correct
  * until the eval corpus outgrows the broadcast threshold): a bloom
  * filter compresses the eval-shingle SET into a fixed `m`-bit array
  * that rides the plan as a literal model parameter, like IVF
  * centroids. Membership answers are one-sided — a contained item is
  * ALWAYS flagged, so decontamination never misses a truly
  * contaminated doc; false positives over-flag at a tunable rate ε,
  * which for hygiene filtering errs in the safe direction.
  *
  * Determinism contract: bits are an OR-fold of per-item hashes —
  * order- and partition-independent — and the hash is double-hashed
  * MurmurHash3 over UTF-8 bytes with fixed seeds, computed by THE SAME
  * code in the builder (Aggregator) and the prober (Expression), so
  * build → probe round-trips are bit-stable across runs, partitionings
  * and plans.
  */
object BloomOps {

  /** Bits for `n` expected items at false-positive rate `eps`,
    * rounded up to a power of two (cheap masking), floored at 1024.
    * Long arithmetic throughout, and an EXPLICIT failure past 2³⁰ bits
    * (128 MB — far beyond what should ride a plan as a literal):
    * silent Int overflow here would floor the size instead, saturate
    * the filter, and flag the whole corpus — precisely in the
    * large-eval-set regime this operator exists for. Callers above the
    * cap should raise `eps` or ship the bits as a broadcast variable. */
  def sizeFor(n: Long, eps: Double): Int = {
    require(n > 0 && eps > 0 && eps < 1, s"need n>0, 0<eps<1; got $n, $eps")
    val ideal = math.ceil(-n.toDouble * math.log(eps) /
      (math.log(2) * math.log(2))).toLong
    require(ideal <= (1L << 30),
      s"bloom would need $ideal bits (> 2^30) for n=$n at eps=$eps — " +
        "raise eps or use a broadcast-side filter")
    math.max(1024L, java.lang.Long.highestOneBit(ideal - 1) * 2).toInt
  }

  /** Optimal hash count for the n/m ratio, clamped to [[BloomAgg]]'s
    * supported 1..16 (tiny n against the 1024-bit floor would
    * otherwise ask for k > 16 and crash the build). */
  def hashesFor(n: Long, mBits: Int): Int =
    math.min(16L, math.max(1L,
      math.round(mBits.toDouble / n * math.log(2)))).toInt

  /** Double hashing (Kirsch–Mitzenmacher): index_i = h1 + i·h2 mod m.
    * Shared by builder and prober — THE parity-critical kernel. */
  private[expressions] def setBits(bytes: Array[Byte], k: Int, mBits: Int,
                                   f: Int => Unit): Unit = {
    val h1 = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x85ebca6b) | 1
    var i = 0
    while (i < k) {
      // mask to non-negative before the mod (mBits is a power of two)
      f(((h1 + i * h2) & Int.MaxValue) & (mBits - 1))
      i += 1
    }
  }

  /** Aggregation buffer = the raw bit words. An OR-merge is
    * associative and commutative, so Spark runs the build with
    * map-side partial aggregation: the shuffle carries one m-bit
    * array per map task, never the items. */
  class BloomAgg(mBits: Int, k: Int) extends Aggregator[String, Array[Long], Array[Long]] {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0, s"mBits power of two >= 64, got $mBits")
    require(k >= 1 && k <= 16, s"1 <= k <= 16, got $k")
    override def zero: Array[Long] = new Array[Long](mBits / 64)
    override def reduce(b: Array[Long], s: String): Array[Long] = {
      if (s != null) setBits(s.getBytes("UTF-8"), k, mBits,
        bit => b(bit >>> 6) |= 1L << (bit & 63))
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Column aggregate: bloom bit words over a string column. */
  def bloomAgg(item: Column, mBits: Int, k: Int): Column =
    udaf(new BloomAgg(mBits, k)).apply(item)

  /** Driver-side probe over a plain string — the same kernel and the
    * same UTF-8 byte form as [[BloomAgg]]'s build, for planners that
    * hold the bits as data rather than in an expression (the shard
    * manifest's `zbloom_*` stats: one probe per SHARD at planning
    * time, not per row). */
  def containsMaybe(bits: Array[Long], k: Int, s: String): Boolean = {
    val bytes = s.getBytes("UTF-8")
    val mBits = bits.length * 64
    var hit = true
    setBits(bytes, k, mBits, { bit =>
      if ((bits(bit >>> 6) & (1L << (bit & 63))) == 0L) hit = false
    })
    hit
  }

  /** THE probe kernel shared by the literal and broadcast expressions
    * — one definition so the two can never drift. */
  private[expressions] def probe(v: Any, bits: Array[Long], k: Int): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val mBits = bits.length * 64
    var hit = true
    setBits(bytes, k, mBits, { bit =>
      if ((bits(bit >>> 6) & (1L << (bit & 63))) == 0L) hit = false
    })
    hit
  }

  /** Shared string-input analysis check for both probe expressions. */
  private[expressions] def checkStringInput(dt: DataType): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (dt == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain needs a string item, got ${dt.sql}")

  /** Probe: true iff `child` MIGHT be in the set whose bits were built
    * by [[BloomAgg]] with the same (mBits, k). Bits are a model
    * parameter carried in the expression (like `NearestCentroids`'
    * centroids) — no join side, no shuffle, one primitive loop/row.
    * Declares its string input type so a SQL caller probing a
    * non-string column fails at ANALYSIS, not as a per-task
    * ClassCastException on the executors. */
  case class BloomMightContain(child: Expression, bits: Array[Long], k: Int)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      checkStringInput(child.dataType)
    override def dataType: DataType = BooleanType
    override def nullSafeEval(v: Any): Any = probe(v, bits, k)
    override protected def withNewChildInternal(c: Expression): BloomMightContain =
      copy(child = c)
    override def prettyName: String = "bloom_might_contain"
  }

  def mightContain(item: Column, bits: Array[Long], k: Int): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(item), bits, k))

  /** Probe variant for bit arrays too large to ride the plan as a
    * literal: the words live in a `Broadcast` variable, so the plan
    * carries a HANDLE and each executor fetches the array once
    * (torrent, off the driver's plan-serialization path) instead of
    * deserializing ~m/8 bytes with every task closure. Same kernel,
    * same one-sided contract, same single-scan shape — this is the
    * "ship the bits as a broadcast variable" escape hatch
    * [[sizeFor]]'s 2³⁰ cap points at (the cap still bounds the BUILD
    * aggregate's buffer; past it, partition the eval set and AND the
    * verdicts of several filters). */
  case class BloomMightContainBroadcast(
      child: Expression,
      bcast: org.apache.spark.broadcast.Broadcast[Array[Long]],
      k: Int)
      extends UnaryExpression with CodegenFallback {
    @transient private lazy val bits = bcast.value
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      checkStringInput(child.dataType)
    override def dataType: DataType = BooleanType
    override def nullSafeEval(v: Any): Any = probe(v, bits, k)
    override protected def withNewChildInternal(c: Expression): BloomMightContainBroadcast =
      copy(child = c)
    override def prettyName: String = "bloom_might_contain_bcast"
  }

  def mightContainBroadcast(item: Column,
                            bits: org.apache.spark.broadcast.Broadcast[Array[Long]],
                            k: Int): Column =
    ColumnBridge.column(
      BloomMightContainBroadcast(ColumnBridge.expression(item), bits, k))
}

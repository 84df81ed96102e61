package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key: per-column equal-width bucket ids,
  * bit-interleaved so that sorting by the key places rows close in
  * EVERY clustered dimension near each other — after compaction each
  * file covers a small hyper-rectangle and per-file min/max bounds
  * prune point/range predicates on ANY of the clustered columns, where
  * a lexicographic sort only ever prunes the leading one.
  *
  * The key is a fold of shift/and/or column expressions — whole-stage
  * codegen fuses it; no UDF, no custom expression needed at ≤16 bits
  * per dimension.
  */
object ZOrder {

  /** Bits per dimension for k dimensions in a 63-bit key (capped at 16:
    * 65k buckets per dimension is beyond any per-file resolution).
    */
  def bitsFor(k: Int): Int = math.min(63 / k, 16)

  /** Equal-width bucket id in [0, 2^bits): `(v - lo) / width`. Equal
    * width keeps the expression codegen-friendly and stats-free beyond
    * one global min/max; heavily skewed dimensions cluster less
    * sharply (Delta/Iceberg's rank-based variant trades a per-column
    * sample pass for skew resistance — same pruning contract).
    * Nulls land in bucket 0 (they sort together, as a sort would).
    */
  def bucket(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val n = 1L << bits
    val width = math.max((hi - lo) / n, Double.MinPositiveValue)
    val b = floor((coalesce(c.cast("double"), lit(lo)) - lit(lo)) / lit(width))
    least(greatest(b, lit(0.0)), lit((n - 1).toDouble)).cast("long")
  }

  /** Rank bucket id: the count of sampled boundaries <= v — an
    * ordered boundary-comparison fold that works for any ORDERABLE
    * type (string, date) where equal-width arithmetic can't. This is
    * the Iceberg/Delta rank-variant trade: one bounded sample pass
    * buys skew resistance and lifts the numeric-only restriction.
    * Chain length = boundaries.size (≤255 at 8 bits), all CaseWhen
    * adds — whole-stage codegen fuses it. Nulls land in bucket 0
    * (null >= b is null → otherwise(0)), matching [[bucket]].
    */
  def rankBucket(c: Column, boundaries: Seq[Any]): Column =
    boundaries.foldLeft(lit(0L)) { (acc, b) =>
      acc + when(c >= lit(b), lit(1L)).otherwise(lit(0L))
    }

  /** Driver-side ordering for sampled boundary values. */
  def cmpSampled(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String)               => x.compareTo(y)
    case (x: java.sql.Date, y: java.sql.Date) => x.compareTo(y)
    // timestamp_ntz rows surface as LocalDateTime (no java8API flag)
    case (x: java.time.LocalDateTime, y: java.time.LocalDateTime) =>
      x.compareTo(y)
    case _ => sys.error(s"unorderable z-order sample ${a.getClass}")
  }

  /** Interleave bit i of bucket column c into position k*i + c. */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    val k = buckets.size
    buckets.zipWithIndex.foldLeft(lit(0L)) { case (acc, (b, c)) =>
      (0 until bits).foldLeft(acc) { (a, i) =>
        a.bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), k * i + c))
      }
    }
  }
}

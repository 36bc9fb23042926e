package graft.sources

import org.apache.spark.sql.types._

/** Iceberg NON-IDENTITY partition transforms (iceberg.apache.org/spec/
  * § Partition Transforms + Appendix B) — the pruning arithmetic for
  * `bucket[N]`, `truncate[W]`, `year`/`month`/`day`/`hour` partition
  * fields. Production Iceberg tables are overwhelmingly partitioned by
  * these, not identity; without them a partitioned tree reads
  * correctly but scans every live file.
  *
  * Everything here is a PER-FILE SATISFIABILITY test under the
  * conservative-superset contract: a file is dropped only when the
  * partition value PROVES no row can match the conjunct —
  * - bucket: equality conjuncts only (`hash(lit) mod N` must equal the
  *   file's bucket; ranges keep everything — bucketing destroys
  *   order),
  * - truncate / temporal: these transforms are MONOTONIC
  *   non-decreasing, so `col < lit` can only hold in files with
  *   `t(col) <= t(lit)`, `col > lit` only with `t(col) >= t(lit)`,
  *   equality only with `t(col) = t(lit)`.
  * Unsupported shapes, type mismatches, or decode failures keep the
  * file, and callers re-apply the row filter regardless.
  *
  * The bucket hash is the spec's murmur3_x86_32 (seed 0) over the
  * value's single-value binary form: integral types WIDEN TO LONG
  * (8-byte little-endian), strings hash their UTF-8 bytes, dates hash
  * days-from-epoch as long, timestamps micros-from-epoch as long —
  * pinned against the spec's Appendix B test vectors in
  * IcebergTransformSpec.
  */
private[sources] object IcebergTransforms {

  // ---- murmur3_x86_32, seed 0 (public algorithm) ---------------------------

  private def rotl(x: Int, r: Int): Int = (x << r) | (x >>> (32 - r))

  def murmur3(bytes: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = 0
    val n4 = (bytes.length / 4) * 4
    var i = 0
    while (i < n4) {
      var k = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
      k *= c1; k = rotl(k, 15); k *= c2
      h ^= k; h = rotl(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    var j = bytes.length - 1
    while (j >= n4) {
      k = (k << 8) | (bytes(j) & 0xff)
      j -= 1
    }
    if (bytes.length > n4) {
      k *= c1; k = rotl(k, 15); k *= c2; h ^= k
    }
    h ^= bytes.length
    h ^= (h >>> 16); h *= 0x85ebca6b
    h ^= (h >>> 13); h *= 0xc2b2ae35
    h ^= (h >>> 16)
    h
  }

  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    murmur3(b)
  }

  def hashString(s: String): Int =
    murmur3(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** `(hash & Integer.MAX_VALUE) % n` per the spec. */
  def bucketIndex(hash: Int, n: Int): Int =
    (hash & Integer.MAX_VALUE) % n

  // ---- transform values of a LITERAL ---------------------------------------

  /** Catalyst literal → exact long, integral types only. */
  private def litLong(l: org.apache.spark.sql.catalyst.expressions
      .Literal): Option[Long] = l.value match {
    case i: java.lang.Integer => Some(i.longValue())
    case j: java.lang.Long => Some(j.longValue())
    case s: java.lang.Short => Some(s.longValue())
    case b: java.lang.Byte => Some(b.longValue())
    case _ => None
  }

  private def litString(l: org.apache.spark.sql.catalyst.expressions
      .Literal): Option[String] = l.value match {
    case u: org.apache.spark.unsafe.types.UTF8String =>
      Some(u.toString)
    case _ => None
  }

  /** Bucket index of the literal under the SOURCE column's type, or
    * None when the (literal, source) pair is not hashable — integral
    * types widen to long per the spec; dates are epoch days,
    * timestamps epoch micros (both as long).
    */
  def bucketOfLiteral(source: DataType,
      l: org.apache.spark.sql.catalyst.expressions.Literal,
      n: Int): Option[Int] = {
    val hash: Option[Int] = (source, l.dataType) match {
      case (IntegerType | LongType | ShortType | ByteType,
          IntegerType | LongType | ShortType | ByteType) =>
        litLong(l).map(hashLong)
      case (DateType, DateType) => litLong(l).map(hashLong)
      case (TimestampType, TimestampType) => litLong(l).map(hashLong)
      case (StringType, StringType) => litString(l).map(hashString)
      case _ => None
    }
    hash.map(bucketIndex(_, n))
  }

  // ---- monotonic transform values -------------------------------------------

  /** truncate[W] of an integral value: `v - floorMod(v, W)`. */
  def truncLong(v: Long, w: Int): Long = v - java.lang.Math.floorMod(v, w.toLong)

  /** truncate[W] of a string: at most W CODE POINTS (spec). */
  def truncString(s: String, w: Int): String = {
    var i = 0
    var cps = 0
    while (i < s.length && cps < w) {
      i += Character.charCount(s.codePointAt(i))
      cps += 1
    }
    s.substring(0, i)
  }

  private val MicrosPerHour = 3600L * 1000000L
  private val MicrosPerDay = 24L * MicrosPerHour

  private def utcDateTime(micros: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(
      java.lang.Math.floorDiv(micros, 1000000L),
      (java.lang.Math.floorMod(micros, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)

  /** year/month/day/hour ordinal (from epoch) of a literal under the
    * source type: date literals carry epoch DAYS, timestamp literals
    * epoch MICROS. None = not derivable (type mismatch, hour-of-date).
    */
  def temporalOrdinal(transform: String, source: DataType,
      l: org.apache.spark.sql.catalyst.expressions.Literal)
      : Option[Long] = (source, l.dataType) match {
    case (DateType, DateType) => litLong(l).flatMap { days =>
      val d = java.time.LocalDate.ofEpochDay(days)
      transform match {
        case "day" => Some(days)
        case "month" => Some((d.getYear - 1970).toLong * 12L +
          (d.getMonthValue - 1))
        case "year" => Some((d.getYear - 1970).toLong)
        case _ => None // hour of a date column is not in the spec
      }
    }
    case (TimestampType, TimestampType) => litLong(l).flatMap { us =>
      transform match {
        case "hour" => Some(java.lang.Math.floorDiv(us, MicrosPerHour))
        case "day" => Some(java.lang.Math.floorDiv(us, MicrosPerDay))
        case "month" =>
          val d = utcDateTime(us)
          Some((d.getYear - 1970).toLong * 12L + (d.getMonthValue - 1))
        case "year" =>
          val d = utcDateTime(us)
          Some((d.getYear - 1970).toLong)
        case _ => None
      }
    }
    case _ => None
  }

  /** Can any source value with monotonic-transform value `part`
    * satisfy `source OP lit` when the literal's transform value is
    * `tLit`? Monotonic non-decreasing: strictness is NOT preserved
    * through the transform, so < and <= collapse (conservative).
    */
  def monotonicSatisfiable(op: String, part: Long, tLit: Long)
      : Boolean = op match {
    case "=" => part == tLit
    case "<" | "<=" => part <= tLit
    case ">" | ">=" => part >= tLit
    case _ => true
  }
}

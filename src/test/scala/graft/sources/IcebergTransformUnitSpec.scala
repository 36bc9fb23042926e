package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types._

/** [[IcebergTransforms]] unit pins: the murmur3_x86_32 test vectors
  * the Iceberg spec PUBLISHES (Appendix B, "Hash requirements" —
  * ints/longs/dates/timestamps hash their 8-byte little-endian long
  * form, strings their UTF-8 bytes), plus the monotonic-transform
  * satisfiability algebra.
  */
class IcebergTransformUnitSpec extends AnyFunSuite {
  import IcebergTransforms._

  test("murmur3 matches the spec's published Appendix B vectors") {
    assert(hashLong(34L) == 2017239379)         // int 34 / long 34
    assert(hashString("iceberg") == 1210000089) // string
    assert(hashLong(java.time.LocalDate.of(2017, 11, 16).toEpochDay)
      == -653330422)                            // date 2017-11-16
    assert(hashLong(java.time.LocalDateTime.of(2017, 11, 16, 22, 31, 8)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L)
      == -2047944441)                           // ts 2017-11-16T22:31:08
    assert(bucketIndex(hashLong(34L), 16) ==
      java.lang.Math.floorMod(2017239379 & Integer.MAX_VALUE, 16))
  }

  test("truncate: integral floor semantics (negatives included) and " +
      "string CODE-POINT truncation") {
    assert(truncLong(29L, 10) == 20L)
    assert(truncLong(30L, 10) == 30L)
    assert(truncLong(-1L, 10) == -10L) // floorMod, not %
    assert(truncString("abcdef", 2) == "ab")
    assert(truncString("a", 2) == "a")
    // code points, not UTF-16 units: one emoji = one code point
    assert(truncString("😀😀x", 2) == "😀😀")
  }

  test("temporal ordinals: date literals as epoch days, timestamp " +
      "literals as epoch micros; hour undefined for dates") {
    val d = Literal(
      java.time.LocalDate.of(2024, 3, 5).toEpochDay.toInt, DateType)
    assert(temporalOrdinal("day", DateType, d)
      .contains(java.time.LocalDate.of(2024, 3, 5).toEpochDay))
    assert(temporalOrdinal("month", DateType, d)
      .contains((2024 - 1970).toLong * 12 + 2))
    assert(temporalOrdinal("year", DateType, d).contains(54L))
    assert(temporalOrdinal("hour", DateType, d).isEmpty)
    val us = java.time.LocalDateTime.of(2024, 3, 5, 7, 30)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    val ts = Literal(us, TimestampType)
    assert(temporalOrdinal("hour", TimestampType, ts)
      .contains(us / 3600000000L))
    assert(temporalOrdinal("day", TimestampType, ts)
      .contains(java.time.LocalDate.of(2024, 3, 5).toEpochDay))
    assert(temporalOrdinal("year", TimestampType, ts).contains(54L))
    // type mismatch is not derivable
    assert(temporalOrdinal("day", DateType, ts).isEmpty)
  }

  test("monotonic satisfiability: equality exact, ranges collapse " +
      "strictness (conservative superset)") {
    assert(monotonicSatisfiable("=", 5L, 5L))
    assert(!monotonicSatisfiable("=", 4L, 5L))
    assert(monotonicSatisfiable("<", 5L, 5L))  // boundary kept
    assert(!monotonicSatisfiable("<", 6L, 5L))
    assert(monotonicSatisfiable(">", 5L, 5L))
    assert(!monotonicSatisfiable(">", 4L, 5L))
    assert(monotonicSatisfiable("unknown-op", 1L, 99L))
  }
}

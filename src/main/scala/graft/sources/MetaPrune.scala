package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Shared metadata-level pruning logic for the interop readers: a
  * `where` predicate's top-level conjuncts of shape
  * `col OP literal` (OP in =, <, <=, >, >=) or `col IS [NOT] NULL`
  * are tested for SATISFIABILITY against per-file value intervals
  * (Delta add-action stats / partition values, Iceberg manifest
  * lower/upper bounds). Everything is CONSERVATIVE: unsupported
  * shapes, incomparable types, or missing bounds keep the file — the
  * kept set is always a superset of the matching files, and callers
  * re-apply the predicate as a row filter, so pruning can only cut
  * scan cost, never change results.
  *
  * Comparison domains: numerics (and booleans) as exact BigDecimal,
  * strings and ISO dates as UNSIGNED UTF-8 BYTE sequences (code-point
  * order — what Delta stats and Iceberg bounds are collected under;
  * Java's UTF-16 code-unit order disagrees for supplementary
  * characters, and strings carrying unpaired surrogates answer
  * "maybe"). Timestamps are NOT prunable (writer format variance
  * would make lexicographic comparison unsound).
  */
private[sources] object MetaPrune {

  sealed trait Test
  case class Cmp(colName: String, op: String,
      lit: org.apache.spark.sql.catalyst.expressions.Literal)
    extends Test
  case class NullTest(colName: String, isNull: Boolean) extends Test
  /** `col IN (lit, ...)` — satisfiable iff ANY member is (a
    * disjunction of equalities; non-null literals only).
    */
  case class InList(colName: String,
      lits: Seq[org.apache.spark.sql.catalyst.expressions.Literal])
    extends Test

  /** Parse `whereSql` and extract the prunable top-level conjunct
    * shapes; a parse failure or no usable conjunct yields empty
    * (callers then keep every file).
    */
  def conjunctTests(spark: SparkSession, whereSql: String): Seq[Test] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    val parsed = scala.util.Try(
      spark.sessionState.sqlParser.parseExpression(whereSql))
    if (parsed.isFailure) return Seq.empty
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(parsed.get).flatMap {
      case EqualTo(UnresolvedAttribute(Seq(n)), l: Literal) =>
        Some(Cmp(n, "=", l))
      case EqualTo(l: Literal, UnresolvedAttribute(Seq(n))) =>
        Some(Cmp(n, "=", l))
      case LessThan(UnresolvedAttribute(Seq(n)), l: Literal) =>
        Some(Cmp(n, "<", l))
      case LessThan(l: Literal, UnresolvedAttribute(Seq(n))) =>
        Some(Cmp(n, ">", l))
      case LessThanOrEqual(UnresolvedAttribute(Seq(n)), l: Literal) =>
        Some(Cmp(n, "<=", l))
      case LessThanOrEqual(l: Literal, UnresolvedAttribute(Seq(n))) =>
        Some(Cmp(n, ">=", l))
      case GreaterThan(UnresolvedAttribute(Seq(n)), l: Literal) =>
        Some(Cmp(n, ">", l))
      case GreaterThan(l: Literal, UnresolvedAttribute(Seq(n))) =>
        Some(Cmp(n, "<", l))
      case GreaterThanOrEqual(UnresolvedAttribute(Seq(n)), l: Literal) =>
        Some(Cmp(n, ">=", l))
      case GreaterThanOrEqual(l: Literal, UnresolvedAttribute(Seq(n))) =>
        Some(Cmp(n, "<=", l))
      case In(UnresolvedAttribute(Seq(n)), es)
          if es.nonEmpty && es.forall {
            case l: Literal => l.value != null
            case _ => false
          } =>
        Some(InList(n, es.map(_.asInstanceOf[Literal])))
      case org.apache.spark.sql.catalyst.expressions
          .IsNull(UnresolvedAttribute(Seq(n))) =>
        Some(NullTest(n, isNull = true))
      case org.apache.spark.sql.catalyst.expressions
          .IsNotNull(UnresolvedAttribute(Seq(n))) =>
        Some(NullTest(n, isNull = false))
      case _ => None
    }
  }

  /** A comparable bound from a STRING rendering of the value. */
  def boundKey(dt: DataType, raw: String)
      : Option[Either[BigDecimal, String]] = dt match {
    case ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | _: DecimalType =>
      scala.util.Try(BigDecimal(raw)).toOption.map(Left(_))
    case StringType => Some(Right(raw))
    case DateType => Some(Right(raw))
    case BooleanType => raw match {
      case "true" => Some(Left(BigDecimal(1)))
      case "false" => Some(Left(BigDecimal(0)))
      case _ => None
    }
    case _ => None
  }

  def litKey(dt: DataType,
      l: org.apache.spark.sql.catalyst.expressions.Literal)
      : Option[Either[BigDecimal, String]] =
    if (l.value == null) None
    else l.dataType match {
      case DateType =>
        // only against a date column: internal value = epoch days
        if (dt == DateType)
          Some(Right(java.time.LocalDate
            .ofEpochDay(l.value.asInstanceOf[Int].toLong).toString))
        else None
      case _ => boundKey(dt, l.value.toString)
    }

  /** True when every surrogate in `s` is part of a valid pair — a
    * string UTF-8 can faithfully encode. Unpaired surrogates make the
    * two orders incomparable, so callers answer "maybe" (keep).
    */
  private def wellFormed(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c)) {
        if (i + 1 >= s.length || !Character.isLowSurrogate(s.charAt(i + 1)))
          return false
        i += 2
      } else if (Character.isLowSurrogate(c)) return false
      else i += 1
    }
    true
  }

  /** Compare as UNSIGNED UTF-8 byte sequences (= code-point order) —
    * the order Delta stats and Iceberg bounds are collected under.
    * Java String's natural `<` compares UTF-16 CODE UNITS, which
    * disagrees for supplementary characters (surrogate pairs sort
    * below U+E000..U+FFFF): pruning on it could drop a file whose
    * rows match, which the caller's row filter cannot repair.
    */
  private def utf8Cmp(a: String, b: String): Int = {
    val xa = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val xb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(xa.length, xb.length)
    while (i < n) {
      val d = (xa(i) & 0xff) - (xb(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    xa.length - xb.length
  }

  private[sources] def strCmp(x: String, y: String): Option[Int] =
    if (wellFormed(x) && wellFormed(y)) Some(utf8Cmp(x, y)) else None

  private def leq(a: Either[BigDecimal, String],
      b: Either[BigDecimal, String]): Option[Boolean] = (a, b) match {
    case (Left(x), Left(y)) => Some(x <= y)
    case (Right(x), Right(y)) => strCmp(x, y).map(_ <= 0)
    case _ => None
  }

  private def lt(a: Either[BigDecimal, String],
      b: Either[BigDecimal, String]): Option[Boolean] = (a, b) match {
    case (Left(x), Left(y)) => Some(x < y)
    case (Right(x), Right(y)) => strCmp(x, y).map(_ < 0)
    case _ => None
  }

  /** Can any x in [lo, hi] pass `x OP lit`? Missing sides are
    * unbounded; incomparable sides answer "maybe" (true).
    */
  def satisfiable(op: String,
      lo: Option[Either[BigDecimal, String]],
      hi: Option[Either[BigDecimal, String]],
      lit: Either[BigDecimal, String]): Boolean = op match {
    case "=" => lo.flatMap(leq(_, lit)).getOrElse(true) &&
      hi.flatMap(leq(lit, _)).getOrElse(true)
    case "<" => lo.flatMap(lt(_, lit)).getOrElse(true)
    case "<=" => lo.flatMap(leq(_, lit)).getOrElse(true)
    case ">" => hi.flatMap(lt(lit, _)).getOrElse(true)
    case ">=" => hi.flatMap(leq(lit, _)).getOrElse(true)
    case _ => true
  }

  /** Any-member equality satisfiability of an IN list against
    * [lo, hi] (a point interval for partition values): an
    * unconvertible member answers "maybe" (keep the file).
    */
  def anySatisfiable(dt: DataType,
      lits: Seq[org.apache.spark.sql.catalyst.expressions.Literal],
      lo: Option[Either[BigDecimal, String]],
      hi: Option[Either[BigDecimal, String]]): Boolean =
    lits.exists(l => litKey(dt, l).fold(true)(k =>
      satisfiable("=", lo, hi, k)))

  /** Iceberg single-value serialization of a column bound → string
    * rendering in [[boundKey]]'s domain (spec: little-endian
    * numerics, UTF-8 strings, date = int days). Timestamps and
    * unknown types are not prunable.
    */
  def icebergBound(dt: DataType, bytes: Array[Byte]): Option[String] = {
    def leInt: Option[Int] =
      if (bytes.length == 4)
        Some((bytes(0) & 0xff) | ((bytes(1) & 0xff) << 8) |
          ((bytes(2) & 0xff) << 16) | ((bytes(3) & 0xff) << 24))
      else None
    def leLong: Option[Long] =
      if (bytes.length == 8) {
        var v = 0L
        var i = 7
        while (i >= 0) { v = (v << 8) | (bytes(i) & 0xffL); i -= 1 }
        Some(v)
      } else None
    dt match {
      case IntegerType => leInt.map(_.toString)
      case LongType => leLong.map(_.toString)
      case FloatType => leInt.map(b =>
        java.lang.Float.intBitsToFloat(b).toString)
      case DoubleType => leLong.map(b =>
        java.lang.Double.longBitsToDouble(b).toString)
      case StringType =>
        Some(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      case DateType => leInt.map(d =>
        java.time.LocalDate.ofEpochDay(d.toLong).toString)
      case BooleanType =>
        if (bytes.length == 1) Some(if (bytes(0) != 0) "true" else "false")
        else None
      case _ => None
    }
  }
}

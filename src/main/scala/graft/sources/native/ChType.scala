package graft.sources.native

import org.apache.spark.sql.types._

/**
 * Structural model of ClickHouse type names as they appear in Native
 * format column headers (e.g. "UInt64", "Nullable(String)",
 * "Enum8('a' = 1, 'b' = 2)", "Array(Float32)").
 *
 * The reference parses these with an ad-hoc split-at-'(' scheme
 * (reference src/lib.rs:106-141) and a hand-rolled Enum8 parameter
 * parser (src/lib.rs:78-104); anything it does not know degrades to an
 * `<unsupported:T>` string sentinel per cell (src/lib.rs:137,168-170).
 * We keep the same graceful-degradation floor but decode a much wider
 * family natively (the reference only handles String, UInt8, UInt64,
 * Int32 and Enum8 — README.md:128-140).
 */
sealed trait ChType {
  /** Spark logical type this ClickHouse type maps to. */
  def sparkType: DataType
  /** Canonical ClickHouse name (round-trips through our writer). */
  def name: String
}

object ChType {
  case object ChString extends ChType { val sparkType = StringType; val name = "String" }
  final case class ChFixedString(n: Int) extends ChType {
    val sparkType = StringType; def name = s"FixedString($n)"
  }
  case object ChUInt8  extends ChType { val sparkType = IntegerType; val name = "UInt8" }
  case object ChUInt16 extends ChType { val sparkType = IntegerType; val name = "UInt16" }
  case object ChUInt32 extends ChType { val sparkType = LongType;    val name = "UInt32" }
  // Spark has no unsigned 64-bit: widen to signed Long. Values >= 2^63
  // wrap negative — documented overflow choice (SURVEY §1.3); the
  // reference is worse (truncates u64 to i32, src/lib.rs:336-344).
  case object ChUInt64 extends ChType { val sparkType = LongType; val name = "UInt64" }
  case object ChInt8   extends ChType { val sparkType = IntegerType; val name = "Int8" }
  case object ChInt16  extends ChType { val sparkType = IntegerType; val name = "Int16" }
  case object ChInt32  extends ChType { val sparkType = IntegerType; val name = "Int32" }
  case object ChInt64  extends ChType { val sparkType = LongType;    val name = "Int64" }
  case object ChFloat32 extends ChType { val sparkType = FloatType;  val name = "Float32" }
  case object ChFloat64 extends ChType { val sparkType = DoubleType; val name = "Float64" }
  case object ChBool   extends ChType { val sparkType = BooleanType; val name = "Bool" }
  /** UInt16 days since unix epoch. */
  case object ChDate extends ChType { val sparkType = DateType; val name = "Date" }
  /** Int32 days since unix epoch (signed — pre-1970 dates). */
  case object ChDate32 extends ChType { val sparkType = DateType; val name = "Date32" }
  /**
   * Decimal(P,S) with P <= 38: stored as a little-endian two's-
   * complement scaled integer of 4 (P<=9), 8 (P<=18) or 16 (P<=38)
   * bytes — the Decimal32/64/128 storage tiers. Decoded to a real
   * DecimalType (Spark's precision cap is exactly 38, so the whole
   * Decimal128 range maps losslessly) — the reference degrades every
   * decimal to an `<unsupported>` string. P > 38 (Decimal256, 32-byte
   * storage) exceeds Spark's DecimalType and stays on the
   * opaque-sentinel path.
   */
  final case class ChDecimal(precision: Int, scale: Int) extends ChType {
    val sparkType = DecimalType(precision, scale)
    def name = s"Decimal($precision, $scale)"
    def byteWidth: Int = if (precision <= 9) 4 else if (precision <= 18) 8 else 16
  }
  /** UInt32 seconds since unix epoch (optional tz parameter ignored for storage). */
  final case class ChDateTime(tz: Option[String]) extends ChType {
    val sparkType = TimestampType
    def name = tz.fold("DateTime")(z => s"DateTime('$z')")
  }
  /**
   * Int64 ticks at 10^-precision seconds since epoch. With an explicit
   * timezone parameter → instant semantics (`TimestampType`); without →
   * wall-clock (`TimestampNTZType`), which is also what the writer emits
   * for Spark NTZ columns so they roundtrip type-faithfully. The
   * in-memory value is Catalyst micros (Long) either way.
   */
  final case class ChDateTime64(precision: Int, tz: Option[String]) extends ChType {
    def sparkType: DataType = if (tz.isDefined) TimestampType else TimestampNTZType
    def name = tz.fold(s"DateTime64($precision)")(z => s"DateTime64($precision, '$z')")
  }
  /** Int8 code decoded to its label (reference src/lib.rs:157-166). */
  final case class ChEnum8(values: Seq[(String, Byte)]) extends ChType {
    val sparkType = StringType
    def name = values.map { case (k, v) => s"'$k' = $v" }.mkString("Enum8(", ", ", ")")
    lazy val byCode: Map[Byte, String] = values.map(_.swap).toMap
    lazy val byLabel: Map[String, Byte] = values.toMap
  }
  /** Int16 code decoded to its label — same shape as [[ChEnum8]] with a
    * 2-byte code (the reference degrades Enum16 to the sentinel). */
  final case class ChEnum16(values: Seq[(String, Short)]) extends ChType {
    val sparkType = StringType
    def name = values.map { case (k, v) => s"'$k' = $v" }.mkString("Enum16(", ", ", ")")
    lazy val byCode: Map[Short, String] = values.map(_.swap).toMap
    lazy val byLabel: Map[String, Short] = values.toMap
  }
  final case class ChNullable(inner: ChType) extends ChType {
    def sparkType = inner.sparkType
    def name = s"Nullable(${inner.name})"
  }
  final case class ChArray(inner: ChType) extends ChType {
    def sparkType = ArrayType(inner.sparkType, containsNull = inner.isInstanceOf[ChNullable])
    def name = s"Array(${inner.name})"
  }
  /** Dictionary-encoded column; wire layout differs from plain columns. */
  final case class ChLowCardinality(inner: ChType) extends ChType {
    def sparkType = inner.sparkType
    def name = s"LowCardinality(${inner.name})"
  }
  /**
   * Map(K, V) — wire layout is Array(Tuple(K, V)): cumulative UInt64
   * end-offsets, then ALL keys flat, then ALL values flat. Decoded to a
   * real `MapType` (the reference degrades it to the sentinel string).
   */
  final case class ChMap(key: ChType, value: ChType) extends ChType {
    def sparkType = MapType(key.sparkType, value.sparkType,
      valueContainsNull = isNullable(value))
    def name = s"Map(${key.name}, ${value.name})"
  }
  /**
   * Tuple(T1, T2, …) / Tuple(a T1, b T2) — elements serialized
   * column-by-column (element 1 for all rows, then element 2, …).
   * Decoded to a `StructType`; unnamed elements get `_1`, `_2`, …
   */
  final case class ChTuple(fields: Seq[(Option[String], ChType)]) extends ChType {
    def sparkType = StructType(fields.zipWithIndex.map { case ((n, t), i) =>
      StructField(n.getOrElse(s"_${i + 1}"), t.sparkType, nullable = isNullable(t))
    })
    def name = fields.map {
      case (Some(n), t) => s"$n ${t.name}"
      case (None, t) => t.name
    }.mkString("Tuple(", ", ", ")")
  }
  /**
   * 16-byte UUID, decoded to the canonical lowercase 8-4-4-4-12
   * string (round 10 — previously the opaque sentinel). Wire layout
   * is ClickHouse's UInt128 spelling: the LITTLE-ENDIAN bytes of the
   * most-significant 64 bits first, then the little-endian bytes of
   * the least-significant 64 bits (the `<2Q` layout every public CH
   * client implements; the reference degrades the type, lib.rs:137).
   */
  case object ChUuid extends ChType {
    val sparkType = StringType; val name = "UUID"
  }
  /** UInt32 numeric IPv4 (`a.b.c.d` = a·2²⁴+b·2¹⁶+c·2⁸+d), stored LE
    * like any UInt32; decoded to the dotted-quad string. */
  case object ChIPv4 extends ChType {
    val sparkType = StringType; val name = "IPv4"
  }
  /** 16 network-order bytes (the FixedString(16) layout CH uses);
    * decoded to the EXPANDED lowercase hex-groups form
    * (`2001:db8:0:0:0:0:0:1` — no `::` compression, rendered by pure
    * arithmetic so v4-mapped addresses never flip to dotted-quad the
    * way java.net.InetAddress would render them). The encoder accepts
    * any RFC literal form, including compressed. */
  case object ChIPv6 extends ChType {
    val sparkType = StringType; val name = "IPv6"
  }
  /**
   * 128/256-bit integer, decoded to its EXACT decimal-string value
   * (round 10 — previously an `<unsupported:T>` sentinel, the
   * reference's floor, src/lib.rs:137): Spark has no 128/256-bit
   * integral type, so the faithful representation is the full decimal
   * rendering as a string (UInt128 hash columns are the common real-
   * world case). Wire layout: `width` little-endian bytes, two's
   * complement when signed. Read-only — the writer has no Spark source
   * type for these.
   */
  final case class ChBigInt(raw: String, width: Int, signed: Boolean) extends ChType {
    val sparkType = StringType
    def name = raw
  }
  /**
   * Decimal wider than Spark's 38-digit DecimalType cap (Decimal256 /
   * Decimal(P>38, S)): decoded to the exact plain decimal string at
   * the declared scale (round 10 — previously the sentinel). Wire
   * layout: 32 little-endian two's-complement bytes of the unscaled
   * value. Read-only, like [[ChBigInt]].
   */
  final case class ChWideDecimal(raw: String, width: Int, scale: Int) extends ChType {
    val sparkType = StringType
    def name = raw
  }

  /**
   * Truly unknown type: schema inference still succeeds (StringType),
   * but data decode raises — we cannot know the byte width, and
   * silently misparsing subsequent columns (what the reference does,
   * src/lib.rs:168-170) is worse than failing loudly.
   */
  final case class ChUnsupported(raw: String) extends ChType {
    val sparkType = StringType
    def name = raw
  }

  /**
   * Recursive-descent parser for type names. Reference equivalent:
   * src/lib.rs:106-141 (split at '(') + src/lib.rs:78-104 (Enum8
   * params). Ours nests (Array(Nullable(String)) etc.).
   */
  def parse(s: String): ChType = {
    val t = s.trim
    val (base, params) = t.indexOf('(') match {
      case -1 => (t, "")
      case i if t.endsWith(")") => (t.substring(0, i), t.substring(i + 1, t.length - 1))
      case _ => return ChUnsupported(t)
    }
    base match {
      case "String"   => ChString
      case "UInt8"    => ChUInt8
      case "UInt16"   => ChUInt16
      case "UInt32"   => ChUInt32
      case "UInt64"   => ChUInt64
      case "Int8"     => ChInt8
      case "Int16"    => ChInt16
      case "Int32" | "Int" => ChInt32
      case "Int64"    => ChInt64
      case "Float32"  => ChFloat32
      case "Float64"  => ChFloat64
      case "Bool"     => ChBool
      case "Date"     => ChDate
      case "Date32"   => ChDate32
      case "DateTime" =>
        ChDateTime(if (params.isEmpty) None else Some(stripQuotes(params)))
      case "DateTime64" =>
        val parts = splitTopLevel(params)
        val prec = parts.headOption.flatMap(p => p.trim.toIntOption).getOrElse(3)
        ChDateTime64(prec, parts.drop(1).headOption.map(stripQuotes))
      case "FixedString" =>
        params.trim.toIntOption.map(ChFixedString).getOrElse(ChUnsupported(t))
      case "Enum8" =>
        parseEnumParams(params).map(ChEnum8).getOrElse(ChUnsupported(t))
      case "Enum16" =>
        parseEnum16Params(params).map(ChEnum16).getOrElse(ChUnsupported(t))
      case "Nullable" => ChNullable(parse(params))
      case "Array"    => ChArray(parse(params))
      case "LowCardinality" => ChLowCardinality(parse(params))
      case "Map" =>
        splitTopLevel(params) match {
          case Seq(k, v) => ChMap(parse(k), parse(v))
          case _ => ChUnsupported(t)
        }
      case "Tuple" =>
        val parts = splitTopLevel(params)
        if (parts.isEmpty) ChUnsupported(t)
        else ChTuple(parts.map(parseTupleElement))
      case "UUID"               => ChUuid
      case "IPv4"               => ChIPv4
      case "IPv6"               => ChIPv6
      case "Int128"  => ChBigInt(t, 16, signed = true)
      case "UInt128" => ChBigInt(t, 16, signed = false)
      case "Int256"  => ChBigInt(t, 32, signed = true)
      case "UInt256" => ChBigInt(t, 32, signed = false)
      // SimpleAggregateFunction(f, T) stores PLAIN T values on the wire
      // (unlike AggregateFunction's opaque state bytes) — decode as T
      case "SimpleAggregateFunction" =>
        splitTopLevel(params) match {
          case Seq(_, inner) => parse(inner)
          case _ => ChUnsupported(t)
        }
      // Geo types are structural aliases (ClickHouse serializes them
      // exactly as the underlying Tuple/Array nesting): Point =
      // Tuple(Float64, Float64), Ring = Array(Point), Polygon =
      // Array(Ring), MultiPolygon = Array(Polygon)
      case "Point"        => ChTuple(Seq(None -> ChFloat64, None -> ChFloat64))
      case "Ring"         => ChArray(parse("Point"))
      case "Polygon"      => ChArray(parse("Ring"))
      case "MultiPolygon" => ChArray(parse("Polygon"))
      case "Decimal32" =>
        // Decimal32(S) = Decimal(9, S)
        params.trim.toIntOption.map(s => ChDecimal(9, s)).getOrElse(ChUnsupported(t))
      case "Decimal64" =>
        params.trim.toIntOption.map(s => ChDecimal(18, s)).getOrElse(ChUnsupported(t))
      case "Decimal128" =>
        // Decimal128(S) = Decimal(38, S) — Spark's exact precision cap
        params.trim.toIntOption.map(s => ChDecimal(38, s)).getOrElse(ChUnsupported(t))
      case "Decimal256" =>
        params.trim.toIntOption.map(s => ChWideDecimal(t, 32, s)).getOrElse(ChUnsupported(t))
      case "Decimal" =>
        // P<=38 decodes to a real DecimalType (Spark's cap); wider
        // decodes to the exact decimal string
        val parts = splitTopLevel(params)
        (parts.headOption.flatMap(_.trim.toIntOption),
          parts.drop(1).headOption.flatMap(_.trim.toIntOption)) match {
          case (Some(p), Some(s)) if p <= 38 => ChDecimal(p, s)
          case (Some(_), Some(s))            => ChWideDecimal(t, 32, s)
          case _                             => ChUnsupported(t)
        }
      case _ => ChUnsupported(t)
    }
  }

  /** "a String" → (Some(a), String); "Nullable(Int64)" → (None, …). */
  private def parseTupleElement(p: String): (Option[String], ChType) = {
    val t = p.trim
    val sp = t.indexOf(' ')
    if (sp > 0) {
      val prefix = t.substring(0, sp)
      // a bare identifier before the first space is an element name;
      // "Decimal(18, 4)" has '(' before any top-level space candidate
      if (prefix.forall(c => c.isLetterOrDigit || c == '_') && prefix.headOption.exists(c => c.isLetter || c == '_'))
        (Some(prefix), parse(t.substring(sp + 1)))
      else (None, parse(t))
    } else (None, parse(t))
  }

  private def stripQuotes(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.startsWith("'") && t.endsWith("'")) t.substring(1, t.length - 1)
    else t
  }

  /** Split "a, b, c" at top-level commas (not inside quotes/parens). */
  private[native] def splitTopLevel(s: String): Seq[String] = {
    if (s.isEmpty) return Seq.empty
    val out = Seq.newBuilder[String]
    var depth = 0; var inQuote = false; var start = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) {
        if (c == '\\') i += 1
        else if (c == '\'') inQuote = false
      } else c match {
        case '\'' => inQuote = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }

  /**
   * Parse "'a' = 1, 'b' = 2" → [(a,1),(b,2)]. Malformed pairs are
   * skipped, an empty list yields None — both mirroring the reference
   * (src/lib.rs:87-97 skip, :81-83 empty).
   */
  private[native] def parseEnumParams(params: String): Option[Seq[(String, Byte)]] = {
    val pairs = splitTopLevel(params).flatMap { p =>
      p.split("=", 2) match {
        case Array(k, v) =>
          val key = stripQuotes(k)
          v.trim.toByteOption.map(key -> _)
        case _ => None
      }
    }
    if (pairs.isEmpty) None else Some(pairs)
  }

  /** [[parseEnumParams]] with Enum16's Int16 code range. */
  private[native] def parseEnum16Params(params: String): Option[Seq[(String, Short)]] = {
    val pairs = splitTopLevel(params).flatMap { p =>
      p.split("=", 2) match {
        case Array(k, v) =>
          val key = stripQuotes(k)
          v.trim.toShortOption.map(key -> _)
        case _ => None
      }
    }
    if (pairs.isEmpty) None else Some(pairs)
  }

  /** Whether values of this type can be null in the Spark schema. */
  def isNullable(t: ChType): Boolean = t match {
    case _: ChNullable => true
    case ChLowCardinality(inner) => isNullable(inner)
    case _ => false
  }

  /** Spark type → ClickHouse type for the writer (fixtures, sinks). */
  def forSpark(dt: DataType, nullable: Boolean): ChType = {
    val base = dt match {
      case StringType    => ChString
      case BooleanType   => ChBool
      case ByteType      => ChInt8
      case ShortType     => ChInt16
      case IntegerType   => ChInt32
      case LongType      => ChInt64
      case FloatType     => ChFloat32
      case DoubleType    => ChFloat64
      case DateType      => ChDate32 // signed days roundtrip pre-1970 dates
      case TimestampType    => ChDateTime64(6, Some("UTC")) // instant semantics
      case TimestampNTZType => ChDateTime64(6, None)        // wall-clock
      case d: DecimalType if d.precision <= 38 => ChDecimal(d.precision, d.scale)
      case ArrayType(et, cn) => ChArray(forSpark(et, cn))
      case MapType(kt, vt, vcn) => ChMap(forSpark(kt, nullable = false), forSpark(vt, vcn))
      case st: StructType =>
        ChTuple(st.fields.toSeq.map(f => (Some(f.name), forSpark(f.dataType, f.nullable))))
      case other =>
        throw new IllegalArgumentException(
          s"clickhouse_native writer: unsupported Spark type $other")
    }
    // ClickHouse has no Nullable(Array/Map/Tuple) — containers are
    // non-nullable there; only wrap scalars.
    val container = base.isInstanceOf[ChArray] || base.isInstanceOf[ChMap] || base.isInstanceOf[ChTuple]
    if (nullable && !container) ChNullable(base) else base
  }
}

package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.types._

/**
 * ClickHouse SQL dialect compatibility layer.
 *
 * A user of the reference stack writes ClickHouse-flavoured SQL — either
 * around `clickhouse_native(...)` scans or shipped verbatim through
 * `clickhouse_scan` (reference `src/clickhouse_scan.rs:78` sends the query
 * string unmodified, so the reachable function surface IS ClickHouse's).
 * This object registers the commonly-used ClickHouse function names as
 * Spark SQL functions so that such queries run unchanged on this engine.
 *
 * Every entry builds a tree of SPARK'S OWN Catalyst expressions — no UDFs,
 * no eval overrides — so the aliases cost nothing: they inline into
 * whole-stage codegen, constant-fold, and push down exactly like the
 * native spellings. Registration is name-level sugar, not an engine.
 *
 * Documented divergences (Spark has no unsigned / UInt8-boolean types):
 *  - predicates return BOOLEAN, not UInt8 0/1 (`empty`, `has`, `JSONHas`);
 *  - `toUInt8/16/32` widen into the next signed type; `toUInt64` is not
 *    offered (2^63..2^64-1 cannot round-trip — SURVEY §1.3);
 *  - parameterized-aggregate syntax `quantile(0.9)(x)` is spelled
 *    `quantile(x, 0.9)`;
 *  - `splitByChar` requires a literal separator (it compiles to a regex
 *    split with the separator quoted).
 */
object ChDialect {

  private type B = Seq[Expression] => Expression

  private def one(name: String)(f: Expression => Expression): (String, B) =
    name -> { args: Seq[Expression] =>
      require(args.length == 1, s"$name takes exactly 1 argument")
      f(args.head)
    }

  private def two(name: String)(f: (Expression, Expression) => Expression): (String, B) =
    name -> { args: Seq[Expression] =>
      require(args.length == 2, s"$name takes exactly 2 arguments")
      f(args(0), args(1))
    }

  private def date(e: Expression): Expression = Cast(e, DateType)
  private def ts(e: Expression): Expression = Cast(e, TimestampType)

  /** `cond ? value : NULL` without naming the value's type (CaseWhen's
   *  type coercion supplies it) — the core of the *If combinators. */
  private def whenOrNull(cond: Expression, value: Expression): Expression =
    CaseWhen(Seq((cond, value)), None)

  val builders: Seq[(String, B)] = Seq(
    // ----- type conversions ---------------------------------------------
    one("toInt8")(Cast(_, ByteType)),
    one("toInt16")(Cast(_, ShortType)),
    one("toInt32")(Cast(_, IntegerType)),
    one("toInt64")(Cast(_, LongType)),
    one("toUInt8")(Cast(_, ShortType)),
    one("toUInt16")(Cast(_, IntegerType)),
    one("toUInt32")(Cast(_, LongType)),
    one("toFloat32")(Cast(_, FloatType)),
    one("toFloat64")(Cast(_, DoubleType)),
    one("toString")(Cast(_, StringType)),
    one("toDate")(date),
    one("toDateTime")(ts),
    // toDateTime64(x, precision): Catalyst timestamps are fixed at
    // micros, so the declared precision only matters on the native
    // WIRE (ChDateTime64) — in a query it is a plain timestamp cast
    "toDateTime64" -> { args: Seq[Expression] =>
      require(args.length == 2, "toDateTime64 takes (value, precision)")
      ts(args.head)
    },
    // the Decimal storage tiers: toDecimalN(x, scale) with a literal
    // scale, mirroring ChType's Decimal32/64/128 precisions.
    // CH TRUNCATES excess fractional digits (round toward zero:
    // toDecimal32('12.345', 2) = 12.34) while Spark's Cast rounds
    // HALF_UP — so parse at a wider scale first, then floor (x ≥ 0)
    // or ceil (x < 0) at the target scale before the final cast.
    two("toDecimal32")((x, s) => truncDecimal(x, 9, litScale(s, "toDecimal32", 9))),
    two("toDecimal64")((x, s) => truncDecimal(x, 18, litScale(s, "toDecimal64", 18))),
    two("toDecimal128")((x, s) => truncDecimal(x, 38, litScale(s, "toDecimal128", 38))),

    // ----- date / time ---------------------------------------------------
    one("toYear")(Year(_)),
    one("toMonth")(Month(_)),
    one("toDayOfMonth")(DayOfMonth(_)),
    // CH: Monday = 1 … Sunday = 7; Spark WeekDay: Monday = 0 … Sunday = 6
    one("toDayOfWeek")(e => Add(WeekDay(e), Literal(1))),
    one("toHour")(Hour(_)),
    one("toMinute")(Minute(_)),
    one("toSecond")(Second(_)),
    one("toStartOfYear")(e => TruncDate(date(e), Literal("year"))),
    one("toStartOfMonth")(e => TruncDate(date(e), Literal("month"))),
    one("toStartOfDay")(e => TruncTimestamp(Literal("day"), ts(e))),
    one("toStartOfHour")(e => TruncTimestamp(Literal("hour"), ts(e))),
    one("toYYYYMM")(e => Add(Multiply(Year(e), Literal(100)), Month(e))),
    one("toYYYYMMDD")(e => Add(
      Multiply(Year(e), Literal(10000)),
      Add(Multiply(Month(e), Literal(100)), DayOfMonth(e)))),
    one("toUnixTimestamp")(e => UnixTimestamp(ts(e), Literal("yyyy-MM-dd HH:mm:ss"))),
    one("toQuarter")(Quarter(_)),
    one("toISOWeek")(WeekOfYear(_)),
    one("toDayOfYear")(DayOfYear(_)),
    two("addDays")((d, n) => DateAdd(date(d), n)),
    two("subtractDays")((d, n) => DateSub(date(d), n)),
    two("addMonths")((d, n) => AddMonths(date(d), n)),

    // ----- strings -------------------------------------------------------
    one("lowerUTF8")(Lower(_)),
    one("upperUTF8")(Upper(_)),
    one("lengthUTF8")(Length(_)),
    one("empty")(e => EqualTo(Length(e), Literal(0))),
    one("notEmpty")(e => GreaterThan(Length(e), Literal(0))),
    // CH arg order: splitByChar(separator, s); separator must be literal
    two("splitByChar")((sep, s) => sep match {
      case l: Literal if l.dataType == StringType && l.value != null =>
        StringSplit(s, Literal(java.util.regex.Pattern.quote(l.value.toString)), Literal(-1))
      case other =>
        throw new IllegalArgumentException(
          s"splitByChar separator must be a string literal, got $other")
    }),
    "replaceAll" -> { args: Seq[Expression] =>
      require(args.length == 3, "replaceAll takes (s, pattern, replacement)")
      StringReplace(args(0), args(1), args(2))
    },
    "replaceRegexpAll" -> { args: Seq[Expression] =>
      require(args.length == 3, "replaceRegexpAll takes (s, regexp, replacement)")
      new RegExpReplace(args(0), args(1), args(2))
    },
    "leftPad" -> { args: Seq[Expression] =>
      require(args.length == 3, "leftPad takes (s, length, pad)")
      StringLPad(args(0), args(1), args(2))
    },
    "rightPad" -> { args: Seq[Expression] =>
      require(args.length == 3, "rightPad takes (s, length, pad)")
      StringRPad(args(0), args(1), args(2))
    },

    one("trimLeft")(e => StringTrimLeft(e)),
    one("trimRight")(e => StringTrimRight(e)),
    // formatDateTime with CH %-specifiers, translated to a Java pattern
    // at plan time (format must be a literal, as in CH almost always)
    two("formatDateTime")((t, f) => f match {
      case l: Literal if l.dataType == StringType && l.value != null =>
        DateFormatClass(ts(t), Literal(translateChFormat(l.value.toString)))
      case other => throw new IllegalArgumentException(
        s"formatDateTime format must be a string literal, got $other")
    }),

    // ----- conditionals --------------------------------------------------
    "multiIf" -> { args: Seq[Expression] =>
      require(args.length >= 3 && args.length % 2 == 1,
        "multiIf takes (cond1, val1, …, condN, valN, else)")
      val branches = args.dropRight(1).grouped(2).map(p => (p(0), p(1))).toSeq
      CaseWhen(branches, Some(args.last))
    },

    // ----- arrays --------------------------------------------------------
    two("has")((arr, x) => ArrayContains(arr, x)),
    two("hasAny")((a, b) => ArraysOverlap(a, b)),
    two("indexOf")((arr, x) => ArrayPosition(arr, x)),
    one("arrayDistinct")(ArrayDistinct(_)),
    one("arrayUniq")(e => Size(ArrayDistinct(e))),
    one("arraySort")(e => SortArray(e, Literal(true))),
    one("arrayReverseSort")(e => SortArray(e, Literal(false))),
    one("arrayReverse")(Reverse(_)),
    "arrayConcat" -> { args: Seq[Expression] => Concat(args) },
    "arraySlice" -> { args: Seq[Expression] =>
      require(args.length == 3, "arraySlice takes (arr, offset, length)")
      Slice(args(0), args(1), args(2))
    },
    two("arrayStringConcat")((arr, sep) => ArrayJoin(arr, sep, None)),
    // CH arg order: arrayMap(x -> f(x), arr) — lambda first
    two("arrayMap")((fn, arr) => ArrayTransform(arr, fn)),
    two("arrayFilter")((fn, arr) => ArrayFilter(arr, fn)),
    // (the 2-arg lambda arrayCount(fn, arr) cannot be registered —
    // see the 1-arg arrayCount registration below for why; spell it
    // size(arrayFilter(fn, arr)))
    two("arrayExists")((fn, arr) => ArrayExists(arr, fn)),
    two("arrayAll")((fn, arr) => ArrayForAll(arr, fn)),
    // arrayJoin(arr): ClickHouse's row-expanding function ⇄ a Generator
    one("arrayJoin")(Explode(_)),

    // ----- math / bit ----------------------------------------------------
    two("intDiv")((a, b) => new IntegralDivide(a, b)),
    two("modulo")((a, b) => new Remainder(a, b)),
    two("plus")((a, b) => new Add(a, b)),
    two("minus")((a, b) => new Subtract(a, b)),
    two("multiply")((a, b) => new Multiply(a, b)),
    two("divide")((a, b) => new Divide(a, b)),
    two("bitAnd")(BitwiseAnd(_, _)),
    two("bitOr")(BitwiseOr(_, _)),
    two("bitXor")(BitwiseXor(_, _)),
    one("bitNot")(BitwiseNot(_)),
    two("bitShiftLeft")(ShiftLeft(_, _)),
    two("bitShiftRight")(ShiftRight(_, _)),
    one("bitCount")(BitwiseCount(_)),

    // ----- JSON (top-level keys) ----------------------------------------
    two("JSONExtractString")((j, k) => GetJsonObject(j, jsonPath(k))),
    two("JSONExtractInt")((j, k) => Cast(GetJsonObject(j, jsonPath(k)), LongType)),
    // false for both absent keys and JSON nulls (GetJsonObject conflates them)
    two("JSONHas")((j, k) => IsNotNull(GetJsonObject(j, jsonPath(k)))),

    // ----- URLs ----------------------------------------------------------
    one("domain")(u => new ParseUrl(Seq(u, Literal("HOST")))),
    one("path")(u => new ParseUrl(Seq(u, Literal("PATH")))),
    one("protocol")(u => new ParseUrl(Seq(u, Literal("PROTOCOL")))),
    one("queryString")(u => new ParseUrl(Seq(u, Literal("QUERY")))),
    two("extractURLParameter")((u, p) => new ParseUrl(Seq(u, Literal("QUERY"), p))),

    // ----- aggregates ----------------------------------------------------
    one("uniq")(HyperLogLogPlusPlus(_)),
    one("groupArray")(CollectList(_)),
    one("groupUniqArray")(CollectSet(_)),
    two("argMax")((v, o) => MaxBy(v, o)),
    two("argMin")((v, o) => MinBy(v, o)),
    one("countIf")(c => Count(whenOrNull(c, Literal(1)))),
    two("sumIf")((x, c) => Sum(whenOrNull(c, x))),
    two("avgIf")((x, c) => Average(whenOrNull(c, x))),
    two("maxIf")((x, c) => Max(whenOrNull(c, x))),
    two("minIf")((x, c) => Min(whenOrNull(c, x))),
    two("quantile")((x, p) => new ApproximatePercentile(x, p)),
    two("quantileExact")((x, p) => new Percentile(x, p)),
    one("uniqCombined")(HyperLogLogPlusPlus(_)),
    one("stddevSamp")(StddevSamp(_)),
    one("stddevPop")(StddevPop(_)),
    one("varSamp")(VarianceSamp(_)),
    one("varPop")(VariancePop(_)),
    two("covarSamp")(CovSample(_, _)),
    two("covarPop")(CovPopulation(_, _)),

    // ----- round-3 widening ---------------------------------------------
    // (no `position`: Spark's ANSI builtin position(substr, str) has the
    // OPPOSITE argument order to CH position(haystack, needle) —
    // shadowing the builtin would silently flip standard queries. Use
    // locate/instr. Same for `now`: Spark's builtin is already
    // identical, so it is not overridden.)
    one("toStartOfQuarter")(e => TruncDate(date(e), Literal("QUARTER"))),
    // CH toStartOfWeek(d, 1) (ISO, Monday). Mode-0 (Sunday) weeks are not
    // offered — Spark's trunc is Monday-based.
    one("toStartOfWeek")(e => TruncDate(date(e), Literal("WEEK"))),
    one("toStartOfMinute")(e => TruncTimestamp(Literal("minute"), ts(e))),
    two("addYears")((d, n) => AddMonths(date(d), Multiply(n, Literal(12)))),
    two("subtractMonths")((d, n) => AddMonths(date(d), UnaryMinus(n))),
    two("addHours")((t, n) => TimestampAdd("HOUR", n, ts(t))),
    two("addMinutes")((t, n) => TimestampAdd("MINUTE", n, ts(t))),
    two("addSeconds")((t, n) => TimestampAdd("SECOND", n, ts(t))),
    // (no dateDiff: Spark's parser intercepts dateDiff(unit, …) with an
    // UNQUOTED unit before function resolution, so the CH quoted-unit
    // spelling cannot be registered — use datediff(end, start) or
    // timestampdiff(DAY, …))
    one("arrayMin")(ArrayMin(_)),
    one("arrayMax")(ArrayMax(_)),
    one("arrayFlatten")(Flatten(_)),
    two("arrayIntersect")((a, b) => ArrayIntersect(a, b)),
    // CH arg order like splitByChar: (regexp, s)
    two("splitByRegexp")((re, s) => StringSplit(s, re, Literal(-1))),
    // arrayCount(arr): CH's 1-arg form — elements with x != 0. (The
    // 2-arg lambda form cannot be registered: the analyzer requires a
    // user lambda to sit DIRECTLY under a higher-order root, and the
    // root here is Size — spell it size(arrayFilter(f, arr)) instead.)
    one("arrayCount")(arr => {
      val x = lv("x")
      Size(ArrayFilter(arr, LambdaFunction(Not(EqualTo(x, Literal(0))), Seq(x))))
    }),
    "arrayZip" -> { args: Seq[Expression] =>
      require(args.nonEmpty, "arrayZip takes at least one array")
      ArraysZip(args)
    },
    two("arrayPushBack")((arr, x) => Concat(Seq(arr, CreateArray(Seq(x))))),
    two("arrayPushFront")((arr, x) => Concat(Seq(CreateArray(Seq(x)), arr))),
    one("arrayPopBack")(arr => Slice(arr, Literal(1),
      Greatest(Seq(Subtract(Size(arr), Literal(1)), Literal(0))))),
    one("arrayPopFront")(arr => Slice(arr, Literal(2),
      Greatest(Seq(Subtract(Size(arr), Literal(1)), Literal(0))))),
    one("mapKeys")(MapKeys(_)),
    one("mapValues")(MapValues(_)),
    two("mapContains")((m, k) => ArrayContains(MapKeys(m), k)),
    // CH tupleElement(t, index|name): companion to the native Tuple
    // decode (ChType maps unnamed elements to _1, _2, …). A 1-based
    // integer index resolves by that _N convention — so it addresses
    // unnamed tuples positionally, exactly the shape the scan
    // produces; named tuples are addressed by name. (Positional access
    // INTO a named tuple would need the resolved schema, which a
    // name-level alias doesn't see — spell the field name instead.)
    two("tupleElement")((t, k) => k match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
        UnresolvedExtractValue(t, Literal(s.toString))
      case Literal(i: Int, IntegerType) =>
        require(i >= 1, s"tupleElement index is 1-based, got $i")
        UnresolvedExtractValue(t, Literal("_" + i))
      case other => throw new IllegalArgumentException(
        s"tupleElement takes a literal index or name, got $other")
    }),
    one("assumeNotNull")(KnownNotNull(_)),
    // CH arg order: splitByString(separator, s); literal separator
    two("splitByString")((sep, s) => sep match {
      case l: Literal if l.dataType == StringType && l.value != null =>
        StringSplit(s, Literal(java.util.regex.Pattern.quote(l.value.toString)), Literal(-1))
      case other => throw new IllegalArgumentException(
        s"splitByString separator must be a string literal, got $other")
    }),
    two("JSONExtractFloat")((j, k) => Cast(GetJsonObject(j, jsonPath(k)), DoubleType)),
    two("JSONExtractBool")((j, k) => Cast(GetJsonObject(j, jsonPath(k)), BooleanType)),
    one("uniqExact")(e => Count(e).toAggregateExpression(isDistinct = true)),
    // CH uniqUpTo(N)(x) ⇄ uniqUpTo(x, N): exact distinct count while
    // <= N, else N+1 — precisely least(count(distinct x), N+1)
    two("uniqUpTo")((x, n) => Least(Seq(
      Count(x).toAggregateExpression(isDistinct = true),
      Cast(Add(n, Literal(1)), LongType)))),
    one("anyLast")(Last(_, true)),
    one("toYYYYMMDDhhmmss")(e => Cast(
      DateFormatClass(ts(e), Literal("yyyyMMddHHmmss")), LongType)),
    "today" -> { args: Seq[Expression] =>
      require(args.isEmpty, "today() takes no arguments"); CurrentDate()
    },

    // ----- round-5 widening ---------------------------------------------
    // (name-clash refusals, same policy as `position`/`now`: CH `any(x)`
    // returns an arbitrary value while Spark's builtin any(bool) is a
    // boolean OR — overriding would silently break standard queries, so
    // it is not offered; use any_value. CH `length` spans strings AND
    // arrays while Spark's is string-only — use size for arrays.
    // `startsWith`/`endsWith`/`ifNull`/`median`/`log2`/`log10` need no
    // entry: Spark's case-insensitive registry already resolves them
    // with identical semantics.)
    two("match")((s, p) => RLike(s, p)),
    // CH extract(haystack, pattern): first subgroup if the pattern has
    // one, else the whole match — decidable only for literal patterns
    two("extract")((s, p) => p match {
      case l: Literal if l.dataType == StringType && l.value != null =>
        val groups = java.util.regex.Pattern.compile(l.value.toString).matcher("").groupCount()
        RegExpExtract(s, p, Literal(if (groups > 0) 1 else 0))
      case other => throw new IllegalArgumentException(
        s"extract pattern must be a string literal, got $other")
    }),
    one("base64Encode")(e => Base64(Cast(e, BinaryType))),
    one("base64Decode")(e => Cast(new UnBase64(e), StringType)),
    "yesterday" -> { args: Seq[Expression] =>
      require(args.isEmpty, "yesterday() takes no arguments")
      DateSub(CurrentDate(), Literal(1))
    },
    one("toMonday")(e => TruncDate(date(e), Literal("WEEK"))),
    one("toLastDayOfMonth")(e => LastDay(date(e))),
    // (no dateDiff/date_diff: Spark's PARSER owns both spellings — it
    // rewrites the 3-arg form to timestampdiff at parse time and
    // rejects CH's quoted unit strings before function resolution can
    // reach a registered alias, so the CH boundary-crossing semantics
    // cannot be offered under the CH name; spell it
    // timestampdiff(unit, date_trunc('unit', a), date_trunc('unit', b))
    // — the truncation reproduces CH's boundary count exactly.)
    one("fromUnixTimestamp")(SecondsToTimestamp(_)),
    two("addWeeks")((d, n) => DateAdd(date(d), Multiply(n, Literal(7)))),
    two("subtractWeeks")((d, n) => DateSub(date(d), Multiply(n, Literal(7)))),
    two("subtractYears")((d, n) => AddMonths(date(d), Multiply(UnaryMinus(n), Literal(12)))),
    two("subtractHours")((t, n) => TimestampAdd("HOUR", UnaryMinus(n), ts(t))),
    two("subtractMinutes")((t, n) => TimestampAdd("MINUTE", UnaryMinus(n), ts(t))),
    two("subtractSeconds")((t, n) => TimestampAdd("SECOND", UnaryMinus(n), ts(t))),
    "roundBankers" -> { args: Seq[Expression] =>
      require(args.length == 1 || args.length == 2,
        "roundBankers takes (x) or (x, places)")
      BRound(args(0), if (args.length == 2) args(1) else Literal(0))
    },
    two("hasAll")((arr, sub) => EqualTo(Size(ArrayExcept(sub, arr)), Literal(0))),
    // count of elements equal to x: ArrayRemove drops ALL occurrences
    two("countEqual")((arr, x) => Subtract(Size(arr), Size(ArrayRemove(arr, x)))),
    two("arrayElement")((arr, i) => ElementAt(arr, i)),
    two("quantilesExact")((x, ps) => new Percentile(x, ps)),

    // ----- round-5b widening: array arithmetic, position, time buckets --
    // (further refusals under the same policy: `xxHash64` is NOT aliased
    // to Spark's xxhash64 — Spark seeds with 42 and hashes SQL values,
    // CH seeds 0 over raw bytes, so the alias would silently return
    // different hashes; `cityHash64` would carry the same unanchored-
    // vector risk COVERAGE.md §2.1 documents for CityHash128 and is not
    // offered either.)
    one("arraySum") { arr =>
      val (acc, x) = (lv("acc"), lv("x"))
      // the fold's zero must already HAVE the result type (the analyzer
      // checks merge-vs-zero, it doesn't coerce zero up), and that type
      // depends on the element: Int64 for integer arrays, Float64 for
      // fractional (CH widening). first − first is an element-typed 0;
      // the out-of-bounds-safe ElementAt keeps the empty array null →
      // coalesce; the BIGINT literal makes int arrays fold widened.
      val el = ElementAt(arr, Literal(1), None, failOnError = false)
      val zero = Coalesce(Seq(new Subtract(el, el), Literal(0L)))
      ArrayAggregate(arr, zero,
        LambdaFunction(new Add(acc, x), Seq(acc, x)), LambdaFunction.identity)
    },
    one("arrayProduct") { arr =>
      val (acc, x) = (lv("acc"), lv("x"))
      // CH arrayProduct always returns Float64 — the zero is a double
      ArrayAggregate(arr, Literal(1.0d),
        LambdaFunction(new Multiply(acc, x), Seq(acc, x)), LambdaFunction.identity)
    },
    one("arrayAvg") { arr =>
      val (acc, x) = (lv("acc"), lv("x"))
      val sum = ArrayAggregate(arr, Literal(0.0d),
        LambdaFunction(new Add(acc, x), Seq(acc, x)), LambdaFunction.identity)
      // CH arrayAvg([]) = 0; under ANSI the ÷0 would THROW, so the
      // empty edge is its own branch, not a coalesce
      CaseWhen(Seq((EqualTo(Size(arr), Literal(0)), Literal(0.0d))),
        Some(new Divide(sum, Cast(Size(arr), DoubleType))))
    },
    one("arrayDifference") { arr =>
      // [a0, a1-a0, a2-a1, …]: element-wise subtract of the 0-fronted
      // shift; zip_with pads the SHORTER side with null, so the empty
      // array (shift = [0], zip → [null]) needs its own branch
      val (x, y) = (lv("x"), lv("y"))
      val shifted = Concat(Seq(CreateArray(Seq(Literal(0))),
        Slice(arr, Literal(1), Greatest(Seq(Subtract(Size(arr), Literal(1)), Literal(0))))))
      CaseWhen(Seq((EqualTo(Size(arr), Literal(0)), arr)),
        Some(ZipWith(arr, shifted, LambdaFunction(new Subtract(x, y), Seq(x, y)))))
    },
    one("arrayEnumerate") { arr =>
      // [1, 2, …, n]; sequence(1, 0) would DESCEND, so empty is its own
      // branch
      CaseWhen(Seq((EqualTo(Size(arr), Literal(0)),
        Cast(Literal.create(Array.empty[Int], ArrayType(IntegerType)), ArrayType(IntegerType)))),
        Some(new Sequence(Literal(1), Size(arr))))
    },
    // CH position(haystack, needle) clashes with the ANSI builtin (see
    // the round-3 note) but the CaseInsensitive spelling has no builtin
    // to clash with
    two("positionCaseInsensitive")((h, n) => new StringLocate(Lower(n), Lower(h))),
    "substringUTF8" -> { args: Seq[Expression] =>
      require(args.length == 2 || args.length == 3,
        "substringUTF8 takes (s, offset[, length])")
      Substring(args(0), args(1),
        if (args.length == 3) args(2) else Literal(Int.MaxValue))
    },
    one("toStartOfFiveMinutes")(e => secondsBucket(e, 300L)),
    one("toStartOfTenMinutes")(e => secondsBucket(e, 600L)),
    one("toStartOfFifteenMinutes")(e => secondsBucket(e, 900L)),
    // CH range(end) = [0 … end-1], range(start, end) = [start … end-1];
    // empty when the interval is — sequence(0, -1) would descend, so
    // the guard branch returns the empty array. The 3-arg stepped form
    // is refused (sequence TO-inclusive vs range TO-exclusive cannot be
    // reconciled without evaluating the step).
    "range" -> { args: Seq[Expression] =>
      require(args.length == 1 || args.length == 2,
        "range takes (end) or (start, end); the stepped form is not offered")
      val (start, end) = if (args.length == 1) (Literal(0L), args(0))
        else (args(0), args(1))
      CaseWhen(Seq((LessThanOrEqual(end, start),
        Cast(Literal.create(Array.empty[Long], ArrayType(LongType)), ArrayType(LongType)))),
        Some(new Sequence(start, new Subtract(end, Literal(1)))))
    },

    // ----- IPv4 ----------------------------------------------------------
    // CH stores IPv4 as UInt32; Spark's signed LongType holds the full
    // 0..2^32-1 range, so the dotted-quad round-trip is lossless.
    one("IPv4NumToString") { n =>
      def octet(shift: Int): Expression =
        Cast(BitwiseAnd(ShiftRightUnsigned(Cast(n, LongType), Literal(shift)),
          Literal(255L)), StringType)
      Concat(Seq(octet(24), Literal("."), octet(16), Literal("."),
        octet(8), Literal("."), octet(0)))
    },
    one("IPv4StringToNum") { s =>
      val parts = StringSplit(s, Literal("\\."), Literal(-1))
      def part(i: Int): Expression =
        Cast(GetArrayItem(parts, Literal(i)), LongType)
      Add(Multiply(part(0), Literal(16777216L)),
        Add(Multiply(part(1), Literal(65536L)),
          Add(Multiply(part(2), Literal(256L)), part(3))))
    },

    // ----- round-6 widening: statistical moments, geo --------------------
    // CH skewPop = m3/m2^1.5 over population central moments — exactly
    // Spark's Skewness; CH kurtPop = m4/m2^2 while Spark's Kurtosis is
    // the EXCESS form m4/m2^2 − 3, hence the +3. The Samp variants use
    // (n−1)-denominator moments; algebra against the Pop forms gives
    // skewSamp = skewPop·sqrt((n−1)/n) and kurtSamp = kurtPop·(n−1)/n
    // (each occurrence of a nested aggregate needs its own explicit
    // AggregateExpression wrap — the analyzer only auto-wraps a BARE
    // top-level AggregateFunction).
    one("skewPop")(Skewness(_)),
    one("kurtPop")(x => Add(Kurtosis(x).toAggregateExpression(), Literal(3.0d))),
    one("skewSamp") { x =>
      val n = Cast(Count(x).toAggregateExpression(), DoubleType)
      Multiply(Skewness(x).toAggregateExpression(),
        Sqrt(new Divide(Subtract(n, Literal(1.0d)), n)))
    },
    one("kurtSamp") { x =>
      val n = Cast(Count(x).toAggregateExpression(), DoubleType)
      Multiply(Add(Kurtosis(x).toAggregateExpression(), Literal(3.0d)),
        new Divide(Subtract(n, Literal(1.0d)), n))
    },
    // Haversine great-circle distance in meters on the mean-radius
    // sphere (R = 6 371 000 m). Divergence note: ClickHouse's own
    // greatCircleDistance evaluates a lookup-table/polynomial
    // approximation of the same metric (documented as accurate to
    // fractions of a percent); this is the closed form it approximates.
    // The Least guard clamps h against >1 from floating-point rounding
    // on antipodal points (asin would return NaN).
    "greatCircleDistance" -> { args: Seq[Expression] =>
      require(args.length == 4, "greatCircleDistance takes (lon1, lat1, lon2, lat2)")
      val rad = args.map(a => ToRadians(Cast(a, DoubleType)))
      val (lon1, lat1, lon2, lat2) = (rad(0), rad(1), rad(2), rad(3))
      def sin2half(d: Expression): Expression = {
        val s = Sin(Multiply(d, Literal(0.5d))); Multiply(s, s)
      }
      val h = Add(sin2half(Subtract(lat2, lat1)),
        Multiply(Multiply(Cos(lat1), Cos(lat2)), sin2half(Subtract(lon2, lon1))))
      Multiply(Literal(2.0d * 6371000.0d), Asin(Sqrt(Least(Seq(h, Literal(1.0d))))))
    },

    // ----- round-10 widening: morton keys, vector distances, rendering --
    // CH mortonEncode(x, y): 32-bit Morton interleave of the low 16
    // bits of each input (x even positions) — the magic-mask spread
    // ladder as pure bit expressions (same layout as
    // graft.functions.ZOrder, usable as a cluster key from SQL).
    two("mortonEncode") { (x, y) =>
      def spread(v: Expression): Expression =
        Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
          .foldLeft(BitwiseAnd(Cast(v, LongType), Literal(0xFFFFL)): Expression) {
            case (acc, (sh, m)) =>
              BitwiseAnd(BitwiseOr(acc, ShiftLeft(acc, Literal(sh))), Literal(m))
          }
      BitwiseOr(spread(x), ShiftLeft(spread(y), Literal(1)))
    },
    // CH mortonDecode(2, code) → (x, y); the dimension count is fixed
    // at 2 here so the spelling is mortonDecode(code)
    one("mortonDecode") { z =>
      def collapse(v: Expression): Expression =
        Seq((1, 0x33333333L), (2, 0x0F0F0F0FL), (4, 0x00FF00FFL), (8, 0x0000FFFFL))
          .foldLeft(BitwiseAnd(v, Literal(0x55555555L)): Expression) {
            case (acc, (sh, m)) =>
              BitwiseAnd(BitwiseOr(acc, ShiftRight(acc, Literal(sh))), Literal(m))
          }
      CreateStruct(Seq(collapse(Cast(z, LongType)),
        collapse(ShiftRight(Cast(z, LongType), Literal(1)))))
    },
    // CH vector distances over Array columns — ZipWith/ArrayAggregate
    // folds of SPARK'S OWN expressions (codegen'd, sequential
    // accumulation in array order on every engine)
    two("L1Distance") { (a, b) =>
      sumDouble(absDiffs(a, b))
    },
    two("L2Distance") { (a, b) =>
      val (x, y) = (lv("l2x"), lv("l2y"))
      Sqrt(sumDouble(ZipWith(toDoubleArr(a), toDoubleArr(b),
        LambdaFunction(Multiply(Subtract(x, y), Subtract(x, y)), Seq(x, y)))))
    },
    two("LinfDistance") { (a, b) => ArrayMax(absDiffs(a, b)) },
    two("cosineDistance") { (a, b) =>
      def dot(u: Expression, v: Expression) =
        sumDouble(ZipWith(toDoubleArr(u), toDoubleArr(v),
          LambdaFunction(Multiply(lv("cdx"), lv("cdy")), Seq(lv("cdx"), lv("cdy")))))
      Subtract(Literal(1.0d),
        new Divide(dot(a, b), Multiply(Sqrt(dot(a, a)), Sqrt(dot(b, b)))))
    },
    // CH formatReadableSize / formatReadableQuantity: two-decimal unit
    // rendering via PURE-INTEGER scaled div/mod + lpad (no float
    // formatting — engines can't diverge on rounding mode)
    one("formatReadableSize") { v0 =>
      readableCase(v0, 1024L,
        Seq(" B", " KiB", " MiB", " GiB", " TiB", " PiB"))
    },
    one("formatReadableQuantity") { v0 =>
      readableCase(v0, 1000L,
        Seq("", " thousand", " million", " billion", " trillion"))
    }
  )

  /** Element-wise |a-b| as a double array. */
  private def absDiffs(a: Expression, b: Expression): Expression = {
    val (x, y) = (lv("adx"), lv("ady"))
    ZipWith(toDoubleArr(a), toDoubleArr(b),
      LambdaFunction(Abs(Subtract(x, y)), Seq(x, y)))
  }

  private def toDoubleArr(arr: Expression): Expression = {
    val e = lv("tde")
    ArrayTransform(arr, LambdaFunction(Cast(e, DoubleType), Seq(e)))
  }

  private def sumDouble(arr: Expression): Expression = {
    val (acc, x) = (lv("sdacc"), lv("sdx"))
    ArrayAggregate(arr, Literal(0.0d),
      LambdaFunction(Add(acc, x), Seq(acc, x)), LambdaFunction.identity)
  }

  /** `whole.frac2 <unit>` ladder over powers of `base`: scaled =
    * v·100 div base^k rendered as integer div/mod — deterministic to
    * the digit on any engine. */
  private def readableCase(v0: Expression, base: Long, units: Seq[String]): Expression = {
    val v = Cast(v0, DoubleType)
    def render(unit: Double, suffix: String): Expression = {
      val scaled = Cast(new Divide(Multiply(v, Literal(100.0d)), Literal(unit)), LongType)
      Concat(Seq(
        Cast(new IntegralDivide(scaled, Literal(100L)), StringType), Literal("."),
        StringLPad(Cast(Remainder(scaled, Literal(100L)), StringType),
          Literal(2), Literal("0")),
        Literal(suffix)))
    }
    val branches = units.zipWithIndex.init.map { case (u, i) =>
      val unit = math.pow(base.toDouble, i)
      (LessThan(v, Literal(unit * base)), render(unit, u))
    }
    CaseWhen(branches,
      Some(render(math.pow(base.toDouble, units.length - 1), units.last)))
  }

  private def lv(name: String) = UnresolvedNamedLambdaVariable(Seq(name))

  /** Literal integer scale for the toDecimalN conversions, bounded by
    * the tier's precision. */
  private def litScale(e: Expression, fn: String, precision: Int): Int = e match {
    case Literal(v: Int, IntegerType) if v >= 0 && v <= precision => v
    case other => throw new IllegalArgumentException(
      s"$fn scale must be an integer literal in 0..$precision, got $other")
  }

  /** CH-semantics decimal conversion: TRUNCATE excess fractional
    * digits (round toward zero) instead of Cast's HALF_UP. The value
    * is first parsed at the target scale plus up to 10 guard digits
    * (within Decimal's 38-digit budget), then floored (x ≥ 0) or
    * ceiled (x < 0) at the target scale — RoundFloor/RoundCeil are
    * codegen'd Catalyst expressions, so this stays in whole-stage
    * codegen like the plain cast did. Documented edge: the guard
    * digits reduce the wide parse's INTEGRAL capacity to 38-(s+10)
    * digits, so toDecimal128 of values with more than 28-s integral
    * digits nulls here where CH still accepts them (up to 38-s);
    * fractional digits beyond s+10 round HALF_UP into the guard
    * before truncation (CH reads them exactly) — both edges are far
    * outside any value the tier is used for. */
  private def truncDecimal(x: Expression, precision: Int, scale: Int): Expression = {
    val wide = Cast(x, DecimalType(38, math.min(38, scale + 10)))
    val sLit = Literal(scale)
    Cast(If(GreaterThanOrEqual(wide, Literal(0)),
      RoundFloor(wide, sLit), RoundCeil(wide, sLit)),
      DecimalType(precision, scale))
  }

  /** Timestamp floored to a fixed bucket of epoch seconds (the
    * toStartOfNMinutes family). Matches CH for epochs >= 0; pre-1970
    * timestamps round toward zero rather than down (documented edge —
    * IntegralDivide truncates). */
  private def secondsBucket(e: Expression, seconds: Long): Expression =
    SecondsToTimestamp(Multiply(
      new IntegralDivide(UnixSeconds(Cast(e, TimestampType)), Literal(seconds)),
      Literal(seconds)))

  /** CH formatDateTime %-specifiers → Java SimpleDateFormat pattern. */
  private def translateChFormat(f: String): String = {
    val sb = new StringBuilder
    var i = 0
    var literalRun = new StringBuilder
    def flushLiteral(): Unit = if (literalRun.nonEmpty) {
      sb.append("'").append(literalRun.toString.replace("'", "''")).append("'")
      literalRun = new StringBuilder
    }
    while (i < f.length) {
      if (f.charAt(i) == '%' && i + 1 < f.length) {
        flushLiteral()
        f.charAt(i + 1) match {
          case 'Y' => sb.append("yyyy")
          case 'y' => sb.append("yy")
          case 'm' => sb.append("MM")
          case 'd' => sb.append("dd")
          case 'H' => sb.append("HH")
          case 'M' => sb.append("mm")
          case 'S' => sb.append("ss")
          case 'e' => sb.append("d")
          case 'F' => sb.append("yyyy-MM-dd")
          case 'T' => sb.append("HH:mm:ss")
          case '%' => literalRun.append('%')
          case c => throw new IllegalArgumentException(
            s"formatDateTime: unsupported specifier %$c")
        }
        i += 2
      } else {
        literalRun.append(f.charAt(i))
        i += 1
      }
    }
    flushLiteral()
    sb.toString
  }

  private def jsonPath(key: Expression): Expression =
    Concat(Seq(Literal("$."), key))

  /** Register every dialect name into the session's function registry. */
  def register(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(ChDialect.getClass.getName, name),
        builder))
    }
}

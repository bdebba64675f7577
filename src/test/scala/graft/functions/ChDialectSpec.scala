package graft.functions

import graft.SparkTestBase

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/**
 * The ClickHouse dialect layer (functions/ChDialect.scala): every family
 * is exercised through `spark.sql` with its CH spelling and checked
 * against hand-computed values, so a registration or arg-order slip
 * (several CH functions flip Spark's argument order) fails loudly here
 * rather than in a user's migrated query.
 */
class ChDialectSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def q1(sql: String): Any = spark.sql(s"SELECT $sql AS v").collect()(0).get(0)

  test("round-11 widening: tupleElement; dateDiff spelling is parser-owned") {
    // tupleElement: a 1-based index addresses the _N fields the native
    // scan produces for unnamed CH Tuples (ChType: Tuple(String, Int64)
    // → _1, _2); any struct is addressable by field name
    assert(q1("tupleElement(named_struct('_1', 'a', '_2', 42), 1)") == "a")
    assert(q1("tupleElement(named_struct('_1', 'a', '_2', 42), 2)") == 42)
    assert(q1("tupleElement(named_struct('x', 7, 'y', 'b'), 'y')") == "b")
    intercept[Exception] { q1("tupleElement(named_struct('_1', 1), 0)") } // 1-based

    // dateDiff cannot be aliased (Spark's parser rewrites the 3-arg
    // spelling before resolution — see the ChDialect comment); pin the
    // documented CH-equivalent spelling so the workaround stays valid:
    // boundary crossings = timestampdiff over date_trunc'd endpoints
    assert(q1("timestampdiff(DAY, date_trunc('day', TIMESTAMP '2024-03-15 23:00:00'), date_trunc('day', TIMESTAMP '2024-03-16 01:00:00'))") == 1L)
    assert(q1("timestampdiff(DAY, date_trunc('day', TIMESTAMP '2024-03-15 00:30:00'), date_trunc('day', TIMESTAMP '2024-03-15 23:30:00'))") == 0L)
  }

  test("type conversions") {
    assert(q1("toInt32('42')") == 42)
    assert(q1("toInt64(7.9)") == 7L)
    assert(q1("toUInt8(200)") == 200.toShort) // widened: no unsigned in Spark
    assert(q1("toFloat64('2.5')") == 2.5)
    assert(q1("toString(123)") == "123")
    assert(q1("toDate('2024-03-15')") == java.sql.Date.valueOf("2024-03-15"))
  }

  test("date/time functions") {
    assert(q1("toYear(DATE '2024-03-15')") == 2024)
    assert(q1("toMonth(DATE '2024-03-15')") == 3)
    assert(q1("toDayOfMonth(DATE '2024-03-15')") == 15)
    // 2024-03-15 is a Friday → CH numbering Monday=1 … Friday=5
    assert(q1("toDayOfWeek(DATE '2024-03-15')") == 5)
    assert(q1("toStartOfMonth(DATE '2024-03-15')") == java.sql.Date.valueOf("2024-03-01"))
    assert(q1("toStartOfYear(DATE '2024-03-15')") == java.sql.Date.valueOf("2024-01-01"))
    assert(q1("toYYYYMM(DATE '2024-03-15')") == 202403)
    assert(q1("toYYYYMMDD(DATE '2024-03-15')") == 20240315)
    assert(q1("toHour(TIMESTAMP '2024-03-15 13:45:56')") == 13)
    assert(q1("toStartOfHour(TIMESTAMP '2024-03-15 13:45:56')") ==
      java.sql.Timestamp.valueOf("2024-03-15 13:00:00"))
    // session timezone is UTC, so the epoch seconds are unambiguous
    assert(q1("toUnixTimestamp(TIMESTAMP '1970-01-01 00:01:40')") == 100L)
    assert(q1("addDays(DATE '2024-03-15', 20)") == java.sql.Date.valueOf("2024-04-04"))
    assert(q1("subtractDays(DATE '2024-03-15', 15)") == java.sql.Date.valueOf("2024-02-29"))
    assert(q1("addMonths(DATE '2024-03-15', 2)") == java.sql.Date.valueOf("2024-05-15"))
  }

  test("round-3 widening: dates") {
    assert(q1("toStartOfQuarter(DATE '2024-05-20')") == java.sql.Date.valueOf("2024-04-01"))
    // 2024-03-15 is a Friday; ISO week starts Monday 2024-03-11
    assert(q1("toStartOfWeek(DATE '2024-03-15')") == java.sql.Date.valueOf("2024-03-11"))
    assert(q1("toStartOfMinute(TIMESTAMP '2024-03-15 13:45:56')") ==
      java.sql.Timestamp.valueOf("2024-03-15 13:45:00"))
    assert(q1("addYears(DATE '2024-02-29', 1)") == java.sql.Date.valueOf("2025-02-28"))
    assert(q1("subtractMonths(DATE '2024-03-31', 1)") == java.sql.Date.valueOf("2024-02-29"))
    assert(q1("addHours(TIMESTAMP '2024-03-15 23:30:00', 2)") ==
      java.sql.Timestamp.valueOf("2024-03-16 01:30:00"))
    assert(q1("addMinutes(TIMESTAMP '2024-03-15 23:59:00', 2)") ==
      java.sql.Timestamp.valueOf("2024-03-16 00:01:00"))
    assert(q1("addSeconds(TIMESTAMP '2024-03-15 23:59:59', 2)") ==
      java.sql.Timestamp.valueOf("2024-03-16 00:00:01"))
    assert(q1("toYYYYMMDDhhmmss(TIMESTAMP '2024-03-15 13:45:56')") == 20240315134556L)
    assert(q1("today()").isInstanceOf[java.sql.Date])
    // Spark's ANSI position(substr IN str) builtin must stay intact
    // (CH's arg-flipped position is deliberately NOT registered)
    assert(q1("position('house', 'clickhouse')") == 6)
  }

  test("round-3 widening: arrays, maps, strings, json, aggregates") {
    assert(q1("arrayMin(array(3, 1, 2))") == 1)
    assert(q1("arrayMax(array(3, 1, 2))") == 3)
    assert(q1("arrayFlatten(array(array(1, 2), array(3)))") == Seq(1, 2, 3))
    assert(q1("arrayZip(array(1, 2), array('a', 'b'))") ==
      Seq(Row(1, "a"), Row(2, "b")))
    assert(q1("arrayPushBack(array(1, 2), 3)") == Seq(1, 2, 3))
    assert(q1("arrayPushFront(array(1, 2), 0)") == Seq(0, 1, 2))
    assert(q1("arrayPopBack(array(1, 2, 3))") == Seq(1, 2))
    assert(q1("arrayPopFront(array(1, 2, 3))") == Seq(2, 3))
    assert(q1("arrayPopBack(array(1))") == Seq())
    assert(q1("mapKeys(map('a', 1, 'b', 2))") == Seq("a", "b"))
    assert(q1("mapValues(map('a', 1, 'b', 2))") == Seq(1, 2))
    assert(q1("mapContains(map('a', 1), 'a')") == true)
    assert(q1("mapContains(map('a', 1), 'z')") == false)
    assert(q1("assumeNotNull(5)") == 5)
    assert(q1("splitByString('::', 'a::b::c')") == Seq("a", "b", "c"))
    assert(q1("""JSONExtractFloat('{"x": 2.5}', 'x')""") == 2.5)
    assert(q1("""JSONExtractBool('{"x": true}', 'x')""") == true)
    assert(spark.sql(
      "SELECT uniqExact(x) AS v FROM VALUES (1), (2), (2), (3) AS t(x)")
      .collect()(0).get(0) == 3L)
    assert(spark.sql(
      "SELECT anyLast(x) AS v FROM (SELECT x FROM VALUES (1), (2), (7) AS t(x) ORDER BY x)")
      .collect()(0).get(0) == 7)
    // uniqUpTo: exact below the cap, cap+1 above it
    assert(spark.sql(
      "SELECT uniqUpTo(x, 5) AS v FROM VALUES (1), (2), (2), (3) AS t(x)")
      .collect()(0).get(0) == 3L)
    assert(spark.sql(
      "SELECT uniqUpTo(x, 2) AS v FROM VALUES (1), (2), (3), (4) AS t(x)")
      .collect()(0).get(0) == 3L)
  }

  test("string functions") {
    assert(q1("lowerUTF8('AbC')") == "abc")
    assert(q1("upperUTF8('AbC')") == "ABC")
    assert(q1("lengthUTF8('abcd')") == 4)
    assert(q1("empty('')") == true)
    assert(q1("notEmpty('x')") == true)
    // CH arg order (separator first); empties preserved like CH
    assert(q1("splitByChar(',', 'a,b,,c')").asInstanceOf[collection.Seq[_]] ==
      Seq("a", "b", "", "c"))
    // the separator is regex-quoted: '.' splits on the literal dot
    assert(q1("splitByChar('.', 'a.b.c')").asInstanceOf[collection.Seq[_]] ==
      Seq("a", "b", "c"))
    assert(q1("replaceAll('a.b.c', '.', '-')") == "a-b-c") // literal, not regex
    assert(q1("replaceRegexpAll('a1b22c', '[0-9]+', '#')") == "a#b#c")
    assert(q1("leftPad('7', 3, '0')") == "007")
    assert(q1("rightPad('7', 3, '*')") == "7**")
  }

  test("second-tranche functions") {
    assert(q1("toQuarter(DATE '2024-08-15')") == 3)
    assert(q1("toDayOfYear(DATE '2024-02-01')") == 32)
    assert(q1("trimLeft('  x ')") == "x ")
    assert(q1("trimRight('  x ')") == "  x")
    assert(q1("formatDateTime(TIMESTAMP '2024-03-05 07:08:09', '%Y-%m-%d %H:%M:%S')") ==
      "2024-03-05 07:08:09")
    assert(q1("formatDateTime(TIMESTAMP '2024-03-05 07:08:09', '%d/%m/%y at %H')") ==
      "05/03/24 at 07")
    assert(q1("bitCount(255)") == 8)
    assert(q1("arrayExists(x -> x > 2, array(1, 2, 3))") == true)
    assert(q1("arrayAll(x -> x > 0, array(1, 2, 3))") == true)
    assert(q1("size(arrayFilter(x -> x % 2 = 0, array(1, 2, 3, 4)))") == 2)
    assert(q1("(SELECT round(stddevSamp(c), 6) FROM (SELECT explode(array(1.0D, 2.0D, 3.0D)) AS c))") == 1.0)
    assert(q1("(SELECT varPop(c) FROM (SELECT explode(array(2.0D, 4.0D)) AS c))") == 1.0)
    assert(q1("(SELECT covarPop(a, b) FROM VALUES (1.0D, 2.0D), (2.0D, 4.0D) AS t(a, b))") == 0.5)
  }

  test("multiIf") {
    assert(q1("multiIf(1 > 2, 'a', 3 > 2, 'b', 'c')") == "b")
    assert(q1("multiIf(1 > 2, 'a', 2 > 3, 'b', 'c')") == "c")
    intercept[Exception](spark.sql("SELECT multiIf(true, 1)").collect())
  }

  test("array functions") {
    assert(q1("has(array(1, 2, 3), 2)") == true)
    assert(q1("hasAny(array(1, 2), array(2, 9))") == true)
    assert(q1("indexOf(array(10, 20, 30), 30)") == 3L)
    assert(q1("arraySort(array(3, 1, 2))").asInstanceOf[collection.Seq[_]] == Seq(1, 2, 3))
    assert(q1("arrayReverseSort(array(3, 1, 2))").asInstanceOf[collection.Seq[_]] == Seq(3, 2, 1))
    assert(q1("arrayDistinct(array(1, 2, 1))").asInstanceOf[collection.Seq[_]] == Seq(1, 2))
    assert(q1("arrayUniq(array(1, 2, 1, 2))") == 2)
    assert(q1("arrayReverse(array(1, 2, 3))").asInstanceOf[collection.Seq[_]] == Seq(3, 2, 1))
    assert(q1("arrayConcat(array(1), array(2, 3))").asInstanceOf[collection.Seq[_]] == Seq(1, 2, 3))
    assert(q1("arraySlice(array(1, 2, 3, 4), 2, 2)").asInstanceOf[collection.Seq[_]] == Seq(2, 3))
    assert(q1("arrayStringConcat(array('a', 'b'), '-')") == "a-b")
    // CH lambda-first argument order
    assert(q1("arrayMap(x -> x * 2, array(1, 2, 3))").asInstanceOf[collection.Seq[_]] ==
      Seq(2, 4, 6))
    assert(q1("arrayFilter(x -> x > 1, array(1, 2, 3))").asInstanceOf[collection.Seq[_]] ==
      Seq(2, 3))
  }

  test("arrayJoin expands rows like a generator") {
    val rows = spark.sql("SELECT arrayJoin(array(1, 2, 3)) AS x").collect().map(_.getInt(0))
    assert(rows.sorted.toSeq == Seq(1, 2, 3))
  }

  test("math and bit functions") {
    assert(q1("intDiv(7, 2)") == 3L)
    assert(q1("modulo(7, 3)") == 1)
    assert(q1("plus(2, 3)") == 5)
    assert(q1("minus(2, 3)") == -1)
    assert(q1("multiply(4, 3)") == 12)
    assert(q1("divide(7, 2)") == 3.5)
    assert(q1("bitAnd(12, 10)") == 8)
    assert(q1("bitOr(12, 10)") == 14)
    assert(q1("bitXor(12, 10)") == 6)
    assert(q1("bitNot(0)") == -1)
    assert(q1("bitShiftLeft(1, 4)") == 16)
    assert(q1("bitShiftRight(16, 2)") == 4)
  }

  test("JSON functions") {
    val j = """'{"k": "42", "s": "hi"}'"""
    assert(q1(s"JSONExtractString($j, 's')") == "hi")
    assert(q1(s"JSONExtractInt($j, 'k')") == 42L)
    assert(q1(s"JSONHas($j, 'k')") == true)
    assert(q1(s"JSONHas($j, 'zz')") == false)
  }

  test("URL functions") {
    val u = "'https://spark.apache.org/docs/latest/api.html?lang=scala&v=4'"
    assert(q1(s"domain($u)") == "spark.apache.org")
    assert(q1(s"path($u)") == "/docs/latest/api.html")
    assert(q1(s"protocol($u)") == "https")
    assert(q1(s"queryString($u)") == "lang=scala&v=4")
    assert(q1(s"extractURLParameter($u, 'lang')") == "scala")
  }

  test("aggregate combinators over grouped data") {
    spark.sql(
      """SELECT * FROM VALUES ('a', 1, 10.0D), ('a', 5, 20.0D), ('a', 3, 30.0D),
        |('b', 7, 5.0D), ('b', 2, 15.0D) AS t(g, k, x)""".stripMargin)
      .createOrReplaceTempView("chd_agg")
    val rows = spark.sql(
      """SELECT g, countIf(k > 2) AS c, sumIf(x, k > 2) AS s,
        |       avgIf(x, k >= 5) AS a, maxIf(k, x < 25.0) AS mx, minIf(k, x > 5.0) AS mn,
        |       argMax(k, x) AS am, argMin(k, x) AS an,
        |       arraySort(groupArray(k)) AS ga
        |FROM chd_agg GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(rows(0) == Row("a", 2L, 50.0, 20.0, 5, 1, 3, 1, Seq(1, 3, 5)))
    assert(rows(1) == Row("b", 1L, 5.0, 5.0, 7, 2, 2, 7, Seq(2, 7)))
    // uniq is approximate in CH too — bound the HLL estimate, don't pin it
    val u = q1("(SELECT uniq(c) FROM (SELECT explode(sequence(1, 50)) AS c))")
      .asInstanceOf[Long]
    assert(u >= 45L && u <= 55L, s"uniq estimate $u outside ±10% of 50")
    // quantileExact interpolates like DuckDB quantile_cont
    assert(q1("(SELECT quantileExact(c, 0.5) FROM (SELECT explode(array(1, 2, 3, 4)) AS c))") == 2.5)
    assert(q1("(SELECT quantile(c, 0.5) FROM (SELECT explode(sequence(1, 101)) AS c))") == 51)
  }

  test("round-5 widening: strings, regex, encodings") {
    assert(q1("match('hello42', '[a-z]+[0-9]+')") == true)
    assert(q1("match('hello', '^[0-9]+$')") == false)
    // pattern with a subgroup → first subgroup; without → whole match
    assert(q1("extract('key=value', 'key=([a-z]+)')") == "value")
    assert(q1("extract('abc123', '[0-9]+')") == "123")
    assert(q1("base64Encode('spark')") == "c3Bhcms=")
    assert(q1("base64Decode('c3Bhcms=')") == "spark")
  }

  test("round-5 widening: dates") {
    assert(q1("toMonday(DATE '2024-03-15')") == java.sql.Date.valueOf("2024-03-11"))
    assert(q1("toLastDayOfMonth(DATE '2024-02-10')") == java.sql.Date.valueOf("2024-02-29"))
    assert(q1("fromUnixTimestamp(100)") == java.sql.Timestamp.valueOf("1970-01-01 00:01:40"))
    assert(q1("addWeeks(DATE '2024-03-15', 2)") == java.sql.Date.valueOf("2024-03-29"))
    assert(q1("subtractWeeks(DATE '2024-03-15', 2)") == java.sql.Date.valueOf("2024-03-01"))
    assert(q1("subtractYears(DATE '2024-02-29', 1)") == java.sql.Date.valueOf("2023-02-28"))
    assert(q1("subtractHours(TIMESTAMP '2024-03-15 01:30:00', 2)") ==
      java.sql.Timestamp.valueOf("2024-03-14 23:30:00"))
    assert(q1("subtractMinutes(TIMESTAMP '2024-03-15 00:01:00', 2)") ==
      java.sql.Timestamp.valueOf("2024-03-14 23:59:00"))
    assert(q1("subtractSeconds(TIMESTAMP '2024-03-15 00:00:01', 2)") ==
      java.sql.Timestamp.valueOf("2024-03-14 23:59:59"))
    assert(q1("yesterday()") == java.sql.Date.valueOf(
      java.time.LocalDate.now(java.time.ZoneOffset.UTC).minusDays(1).toString))
  }

  test("round-5 widening: arrays, math, aggregates") {
    assert(q1("roundBankers(2.5D)") == 2.0) // half-even, vs round's half-up 3
    assert(q1("roundBankers(2.345D, 2)") == 2.34)
    assert(q1("hasAll(array(1, 2, 3, 4), array(2, 4))") == true)
    assert(q1("hasAll(array(1, 2), array(2, 5))") == false)
    assert(q1("countEqual(array(1, 2, 1, 1), 1)") == 3)
    assert(q1("arrayElement(array(10, 20, 30), 2)") == 20)
    assert(q1("arrayElement(array(10, 20, 30), -1)") == 30) // CH negative = from end
    assert(q1("(SELECT quantilesExact(c, array(0.25, 0.5, 0.75)) " +
      "FROM (SELECT explode(array(1, 2, 3, 4)) AS c))") == Seq(1.75, 2.5, 3.25))
  }

  test("round-5b widening: array arithmetic, position, time buckets, range") {
    assert(q1("arraySum(array(1, 2, 3))") == 6L)           // Int → Int64, CH-style
    assert(q1("arraySum(array(1.5D, 2.5D))") == 4.0)
    assert(q1("arraySum(CAST(array() AS ARRAY<INT>))") == 0L)
    assert(q1("arrayProduct(array(2, 3, 4))") == 24.0)     // always Float64, CH-style
    assert(q1("arrayAvg(array(1, 2, 3, 4))") == 2.5)
    assert(q1("arrayAvg(CAST(array() AS ARRAY<INT>))") == 0.0) // CH pins the empty edge
    assert(q1("arrayDifference(array(1, 4, 9, 16))") == Seq(1, 3, 5, 7))
    assert(q1("arrayDifference(CAST(array() AS ARRAY<INT>))") == Seq())
    assert(q1("arrayEnumerate(array('a', 'b', 'c'))") == Seq(1, 2, 3))
    assert(q1("arrayEnumerate(CAST(array() AS ARRAY<STRING>))") == Seq())
    assert(q1("positionCaseInsensitive('Hello World', 'WORLD')") == 7)
    assert(q1("positionCaseInsensitive('abc', 'z')") == 0)  // CH: 0 = not found
    assert(q1("substringUTF8('clickhouse', 6)") == "house")
    assert(q1("substringUTF8('clickhouse', 1, 5)") == "click")
    assert(q1("toStartOfFiveMinutes(TIMESTAMP '2024-03-15 13:47:56')") ==
      java.sql.Timestamp.valueOf("2024-03-15 13:45:00"))
    assert(q1("toStartOfTenMinutes(TIMESTAMP '2024-03-15 13:47:56')") ==
      java.sql.Timestamp.valueOf("2024-03-15 13:40:00"))
    assert(q1("toStartOfFifteenMinutes(TIMESTAMP '2024-03-15 13:47:56')") ==
      java.sql.Timestamp.valueOf("2024-03-15 13:45:00"))
    assert(q1("range(4)") == Seq(0L, 1L, 2L, 3L))           // TO-exclusive, CH-style
    assert(q1("range(2, 5)") == Seq(2L, 3L, 4L))
    assert(q1("range(0)") == Seq())
    assert(q1("range(5, 2)") == Seq())
  }

  test("IPv4 functions") {
    assert(q1("IPv4NumToString(3232235777)") == "192.168.1.1")
    assert(q1("IPv4NumToString(0)") == "0.0.0.0")
    assert(q1("IPv4NumToString(4294967295)") == "255.255.255.255") // full UInt32 range
    assert(q1("IPv4StringToNum('192.168.1.1')") == 3232235777L)
    assert(q1("IPv4StringToNum('255.255.255.255')") == 4294967295L)
    assert(q1("IPv4StringToNum(IPv4NumToString(167772161))") == 167772161L) // round-trip
  }

  test("round-10 widening: morton keys, vector distances, readable rendering") {
    // published Morton bit pattern: (x=0b11, y=0b01) interleaves to 0b0111
    assert(q1("mortonEncode(3, 1)") == 7L)
    assert(q1("mortonEncode(65535, 0)") == 0x55555555L)
    assert(q1("mortonEncode(0, 65535)") == 0xAAAAAAAAL)
    // matches the ZOrder Column implementation bit-for-bit
    assert(q1("mortonEncode(12345, 54321)") ==
      graft.functions.ZOrder.interleave16Ref(12345L, 54321L))
    val dec = q1("mortonDecode(mortonEncode(123, 456))")
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(dec.getLong(0) == 123L && dec.getLong(1) == 456L)

    assert(q1("L1Distance(array(1, 2, 3), array(4, 0, 3))") == 5.0d)
    assert(q1("L2Distance(array(3, 0), array(0, 4))") == 5.0d)
    assert(q1("LinfDistance(array(1, 2, 3), array(4, 0, 3))") == 3.0d)
    // parallel vectors → distance 0; orthogonal → 1
    assert(math.abs(q1("cosineDistance(array(1, 2), array(2, 4))")
      .asInstanceOf[Double]) < 1e-12)
    assert(math.abs(q1("cosineDistance(array(1, 0), array(0, 1))")
      .asInstanceOf[Double] - 1.0d) < 1e-12)

    assert(q1("formatReadableSize(123)") == "123.00 B")
    assert(q1("formatReadableSize(1536)") == "1.50 KiB")
    assert(q1("formatReadableSize(1073741824)") == "1.00 GiB")
    assert(q1("formatReadableQuantity(1234000)") == "1.23 million")
    assert(q1("formatReadableQuantity(10)") == "10.00")
  }

  test("round-10b widening: decimal tiers, regexp split, array count/intersect, sipHash64") {
    // toDecimalN(x, scale): the three storage-tier precisions.
    // CH TRUNCATES excess fractional digits (round toward zero), it
    // does not round — toDecimal32('12.345', 2) = 12.34 on a real
    // server; 12.35 (Spark Cast's HALF_UP) would be a divergence.
    assert(q1("toString(toDecimal32('12.345', 2))") == "12.34")
    assert(q1("toString(toDecimal32('-12.345', 2))") == "-12.34")
    assert(q1("toString(toDecimal32('12.999', 0))") == "12")
    assert(q1("toString(toDecimal64('12.345', 4))") == "12.3450")
    assert(q1("toString(toDecimal64(1.0060, 2))") == "1.00")
    assert(q1("toString(toDecimal128('12345678901234567890.5', 1))") ==
      "12345678901234567890.5")
    assert(q1("toString(toDecimal128('12345678901234567890.59', 1))") ==
      "12345678901234567890.5")
    // seeded fuzz: truncation must equal BigDecimal ROUND_DOWN (toward
    // zero) for every sign/magnitude/scale combination — one query per
    // scale, 120 values each, so a rounding-mode regression in
    // truncDecimal cannot hide behind the pinned examples above
    locally {
      val rnd = new scala.util.Random(11)
      val vals = (1 to 120).map { _ =>
        val sign = if (rnd.nextBoolean()) "-" else ""
        // floorMod, not .abs % n: Long.MinValue.abs is negative and
        // would emit a malformed "--…" literal if the seed ever hits it
        val ip = math.floorMod(rnd.nextLong(), 10000000000L) // <= 10 integral digits
        val fd = 1 + rnd.nextInt(8)                // 1..8 fractional digits
        val fp = (1 to fd).map(_ => rnd.nextInt(10)).mkString
        s"$sign$ip.$fp"
      }
      for (sc <- Seq(0, 2, 4)) {
        val rows = spark.sql(
          s"SELECT toString(toDecimal64(v, $sc)) AS r FROM VALUES " +
            vals.map(v => s"('$v')").mkString(",") + " AS t(v)")
          .collect().map(_.getString(0))
        vals.zip(rows).foreach { case (v, got) =>
          val want = new java.math.BigDecimal(v)
            .setScale(sc, java.math.RoundingMode.DOWN).toPlainString
          assert(got == want, s"toDecimal64('$v', $sc): got $got want $want")
        }
      }
    }
    assert(q1("toString(toDateTime64('2024-03-15 13:45:56', 3))").toString
      .startsWith("2024-03-15 13:45:56"))
    intercept[Exception] { q1("toDecimal32('1', 99)") } // scale > precision

    assert(q1("arrayIntersect(array(1, 2, 3), array(2, 3, 4))")
      .asInstanceOf[scala.collection.Seq[_]].toSet == Set(2, 3))
    // CH arg order (regexp, s), like splitByChar
    assert(q1("splitByRegexp('[,;]', 'a,b;c')")
      .asInstanceOf[scala.collection.Seq[_]] == Seq("a", "b", "c"))
    assert(q1("arrayCount(array(1, 0, 3, 0))") == 2)

    // sipHash64: ClickHouse's zero-key SipHash-2-4 instance — value
    // parity with the library core that SipHashSpec pins against the
    // specification paper's own vectors
    assert(q1("sipHash64('abc')") ==
      SipHash.hash64Zero("abc".getBytes("UTF-8")))
    // CH camel-case spelling resolves case-insensitively
    assert(q1("SIPHASH64('abc')") == q1("sipHash64('abc')"))
    assert(q1("sipHash64('')") == SipHash.hash64Zero(Array.emptyByteArray))
  }
}

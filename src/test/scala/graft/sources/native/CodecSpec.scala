package graft.sources.native

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.scalatest.funsuite.AnyFunSuite

class CodecSpec extends AnyFunSuite {

  private def roundTripVarUInt(v: Long): Long = {
    val bos = new ByteArrayOutputStream()
    new NativeCodec.Output(bos).writeVarUInt(v)
    new NativeCodec.Input(new ByteArrayInputStream(bos.toByteArray)).readVarUInt()
  }

  test("VarUInt single-byte values") {
    for (v <- Seq(0L, 1L, 127L)) assert(roundTripVarUInt(v) === v)
  }

  test("VarUInt multi-byte boundaries") {
    for (v <- Seq(128L, 16383L, 16384L, Int.MaxValue.toLong, Long.MaxValue, -1L))
      assert(roundTripVarUInt(v) === v) // -1 = max u64
  }

  test("VarUInt property round-trip (seeded)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val v = rnd.nextLong() >>> rnd.nextInt(64)
      assert(roundTripVarUInt(v) === v)
    }
  }

  test("VarUInt rejects >10 bytes (reference src/lib.rs:190-193)") {
    val bytes = Array.fill[Byte](11)(0x80.toByte)
    intercept[java.io.IOException] {
      new NativeCodec.Input(new ByteArrayInputStream(bytes)).readVarUInt()
    }
  }

  test("string sanitize strips NUL and U+FFFD (reference src/lib.rs:73-74)") {
    assert(NativeCodec.sanitize("a\u0000b\uFFFDc") === "abc")
    assert(NativeCodec.sanitize("plain") === "plain")
  }

  test("type parser: scalars") {
    import ChType._
    assert(ChType.parse("String") === ChString)
    assert(ChType.parse("UInt8") === ChUInt8)
    assert(ChType.parse("UInt64") === ChUInt64)
    assert(ChType.parse("Int32") === ChInt32)
    assert(ChType.parse("Int") === ChInt32) // reference alias src/lib.rs:130
    assert(ChType.parse("Float64") === ChFloat64)
    assert(ChType.parse("Date") === ChDate)
    assert(ChType.parse("DateTime") === ChDateTime(None))
    assert(ChType.parse("DateTime('UTC')") === ChDateTime(Some("UTC")))
    assert(ChType.parse("DateTime64(3)") === ChDateTime64(3, None))
    assert(ChType.parse("FixedString(4)") === ChFixedString(4))
  }

  test("type parser: nested") {
    import ChType._
    assert(ChType.parse("Nullable(String)") === ChNullable(ChString))
    assert(ChType.parse("Array(Float32)") === ChArray(ChFloat32))
    assert(ChType.parse("Array(Nullable(Int64))") === ChArray(ChNullable(ChInt64)))
    assert(ChType.parse("LowCardinality(String)") === ChLowCardinality(ChString))
  }

  test("type parser: Enum8 params (reference src/lib.rs:78-104)") {
    import ChType._
    ChType.parse("Enum8('a' = 1, 'b' = 2)") match {
      case e: ChEnum8 =>
        assert(e.byCode(1.toByte) === "a")
        assert(e.byCode(2.toByte) === "b")
      case other => fail(s"expected ChEnum8, got $other")
    }
    // malformed pairs skipped, valid ones kept (src/lib.rs:87-97)
    ChType.parse("Enum8('a' = 1, garbage, 'c' = 3)") match {
      case e: ChEnum8 => assert(e.values.map(_._1) === Seq("a", "c"))
      case other => fail(s"$other")
    }
    // empty param list → unsupported (src/lib.rs:81-83)
    assert(ChType.parse("Enum8()").isInstanceOf[ChUnsupported])
  }

  test("type parser: opaque fixed-width degrade") {
    import ChType._
    // UUID graduated to a native decode in round 10 (NetworkTypesSpec)
    assert(ChType.parse("UUID") === ChUuid)
    assert(ChType.parse("IPv4") === ChIPv4)
    assert(ChType.parse("IPv6") === ChIPv6)
    assert(ChType.parse("Int128") === ChOpaqueFixed("Int128", 16))
    assert(ChType.parse("Decimal(22, 2)") === ChOpaqueFixed("Decimal(22, 2)", 16))
    assert(ChType.parse("AggregateFunction(sum, UInt64)").isInstanceOf[ChUnsupported])
  }

  test("type parser: Map and Tuple decode natively (incl. named elements)") {
    import ChType._
    assert(ChType.parse("Map(String, Int64)") === ChMap(ChString, ChInt64))
    assert(ChType.parse("Map(String, Nullable(String))") ===
      ChMap(ChString, ChNullable(ChString)))
    assert(ChType.parse("Tuple(String, Int64)") ===
      ChTuple(Seq(None -> ChString, None -> ChInt64)))
    assert(ChType.parse("Tuple(a String, b Decimal(18, 4))") ===
      ChTuple(Seq(Some("a") -> ChString, Some("b") -> ChDecimal(18, 4))))
    // sparkType mapping: unnamed elements become _1, _2
    val st = ChType.parse("Tuple(String, Int64)").sparkType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(st.fieldNames.toSeq === Seq("_1", "_2"))
  }

  test("type parser: decimals P<=18 and Date32 decode natively") {
    import ChType._
    assert(ChType.parse("Decimal(10, 2)") === ChDecimal(10, 2))
    assert(ChType.parse("Decimal32(4)") === ChDecimal(9, 4))
    assert(ChType.parse("Decimal64(6)") === ChDecimal(18, 6))
    assert(ChType.parse("Date32") === ChDate32)
  }
}

package graft

import graft.types.TypeMap
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TypeMapSpec extends AnyFunSuite {

  test("integer widening follows the reference map") {
    assert(TypeMap.toSpark("TINYINT") === ByteType)
    assert(TypeMap.toSpark("UTINYINT") === ShortType)
    assert(TypeMap.toSpark("SMALLINT") === ShortType)
    assert(TypeMap.toSpark("USMALLINT") === IntegerType)
    assert(TypeMap.toSpark("INTEGER") === IntegerType)
    assert(TypeMap.toSpark("UINTEGER") === LongType)
    assert(TypeMap.toSpark("BIGINT") === LongType)
    assert(TypeMap.toSpark("UBIGINT") === DecimalType(20, 0))
    assert(TypeMap.toSpark("HUGEINT") === DecimalType(38, 0))
    assert(TypeMap.toSpark("UHUGEINT") === DecimalType(38, 0))
  }

  test("decimal, float, text, binary") {
    assert(TypeMap.toSpark("DECIMAL(12,4)") === DecimalType(12, 4))
    assert(TypeMap.toSpark("FLOAT") === FloatType)
    assert(TypeMap.toSpark("DOUBLE") === DoubleType)
    assert(TypeMap.toSpark("VARCHAR") === StringType)
    assert(TypeMap.toSpark("BLOB") === BinaryType)
    assert(TypeMap.toSpark("UUID") === StringType)
  }

  test("datetime family (TIME loses its zone, like the reference)") {
    assert(TypeMap.toSpark("DATE") === DateType)
    assert(TypeMap.toSpark("TIMESTAMP") === TimestampNTZType)
    assert(TypeMap.toSpark("TIMESTAMP_NS") === TimestampNTZType)
    assert(TypeMap.toSpark("TIMESTAMPTZ") === TimestampType)
    assert(TypeMap.toSpark("TIME WITH TIME ZONE") === TimestampNTZType)
    assert(TypeMap.toSpark("INTERVAL") === DayTimeIntervalType())
  }

  test("lists and structs") {
    assert(TypeMap.toSpark("INTEGER[]") === ArrayType(IntegerType))
    assert(TypeMap.toSpark("VARCHAR[]") === ArrayType(StringType))
    // reference renders STRUCT as JSONB
    assert(TypeMap.toSpark("STRUCT(a VARCHAR, b VARCHAR)") === StringType)
  }

  test("MAP/ENUM/UNION/BIT rejected like the reference") {
    Seq("MAP(INTEGER, VARCHAR)", "ENUM('a','b')", "UNION(n INTEGER)", "BIT").foreach { t =>
      intercept[TypeMap.UnsupportedTypeException] { TypeMap.toSpark(t) }
    }
  }

  test("engine-visible names for describe parity") {
    assert(TypeMap.toEngineName(LongType) === "bigint")
    assert(TypeMap.toEngineName(DoubleType) === "double precision")
    assert(TypeMap.toEngineName(DecimalType(20, 0)) === "numeric(20,0)")
    assert(TypeMap.toEngineName(ArrayType(FloatType)) === "real[]")
    assert(TypeMap.toEngineName(TimestampType) === "timestamp with time zone")
  }
}

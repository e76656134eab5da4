package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class CanonicalTypesSpec extends AnyFunSuite {
  import CanonicalTypes._

  test("the 6-type canonical mapping (sqldb.go:254-281)") {
    assert(canonicalize(IntegerType) == LongType)     // INT* → BIGINT
    assert(canonicalize(ShortType) == LongType)
    assert(canonicalize(FloatType) == DoubleType)     // FLOAT*/NUMERIC → DECIMAL class
    assert(canonicalize(DecimalType(10, 2)) == DoubleType)
    assert(canonicalize(TimestampType) == TimestampType)
    assert(canonicalize(DateType) == DateType)
    assert(canonicalize(BooleanType) == BooleanType)
    assert(canonicalize(StringType) == StringType)    // VARCHAR/TEXT/JSON passthrough
    assert(canonicalize(ArrayType(IntegerType)) == ArrayType(LongType)) // PG _INT4
    assert(canonicalize(ArrayType(StringType)) == ArrayType(StringType)) // PG _TEXT
  }

  test("canonicalization is total and idempotent over nested types") {
    val inputs: Seq[DataType] = Seq(ByteType, ShortType, IntegerType, LongType,
      FloatType, DoubleType, DecimalType(38, 18), TimestampType, DateType,
      BooleanType, StringType, BinaryType, NullType,
      ArrayType(FloatType), MapType(IntegerType, FloatType),
      StructType(Seq(StructField("a", IntegerType), StructField("b", ArrayType(DecimalType(5, 2))))))
    inputs.foreach { dt =>
      val c = canonicalize(dt)
      assert(canonicalize(c) == c, s"not idempotent for $dt")
    }
  }

  test("castToCanonical preserves nullability and values") {
    val spark = TestSpark.spark
    val df = Tables.load(spark, TestSpark.sf0001, "nation") // n_nationkey int32
    val out = castToCanonical(df)
    assert(out.schema("n_nationkey").dataType == LongType)
    assert(out.count() == df.count())
  }

  test("materialized result schema matches the reference's assertion " +
       "(server_test.go.bak:261-286: total NUMERIC, entry_date DATE)") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val events = Tables.load(spark, TestSpark.sf0001, "events")
    val res = castToCanonical(
      events.filter(col("user_id") === 1)
        .groupBy(col("ts").cast(DateType).as("entry_date"))
        .agg(sum("value").as("total")))
    assert(res.schema("total").dataType == DoubleType)
    assert(res.schema("entry_date").dataType == DateType)
  }
}

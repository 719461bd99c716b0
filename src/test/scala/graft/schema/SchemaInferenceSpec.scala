package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaInferenceSpec extends AnyFunSuite {
  import SchemaInference._

  private def infer(json: String): StructType = inferFromJson(json).get

  test("primitives map to int/long/double/bool/string") {
    val s = infer("""{"i":1,"l":12345678901,"d":1.5,"b":true,"s":"x"}""")
    assert(s("i").dataType === IntegerType)
    assert(s("l").dataType === LongType)
    assert(s("d").dataType === DoubleType)
    assert(s("b").dataType === BooleanType)
    assert(s("s").dataType === StringType)
  }

  test("null values contribute no field") {
    val s = infer("""{"a":1,"b":null}""")
    assert(s.fieldNames.toSeq === Seq("a"))
  }

  test("nested maps become structs; collections become arrays") {
    val s = infer("""{"user":{"name":"alice","age":30},"tags":["x","y"]}""")
    val user = s("user").dataType.asInstanceOf[StructType]
    assert(user("name").dataType === StringType)
    assert(user("age").dataType === IntegerType)
    assert(s("tags").dataType === ArrayType(StringType, containsNull = true))
  }

  test("array element type comes from first non-null element") {
    val s = infer("""{"xs":[null,2,"three"]}""")
    assert(s("xs").dataType === ArrayType(IntegerType, containsNull = true))
  }

  test("all-null array contributes no field") {
    assert(infer("""{"a":1,"xs":[null,null]}""").fieldNames.toSeq === Seq("a"))
  }

  test("empty struct values are dropped entirely") {
    assert(infer("""{"a":1,"o":{}}""").fieldNames.toSeq === Seq("a"))
    assert(infer("""{"a":1,"o":{"inner":null}}""").fieldNames.toSeq === Seq("a"))
  }

  test("ISO-8601 strings sniff to timestamp") {
    val s = infer("""{"created_at":"2024-03-01T12:00:00Z","note":"2024 was a year"}""")
    assert(s("created_at").dataType === TimestampType)
    assert(s("note").dataType === StringType)
  }

  test("ID-suffix guard: *_id/id/uuid/key fields stay strings") {
    for (name <- Seq("distinct_id", "userid", "session_key", "key", "trace_uuid", "uuid", "id"))
      assert(
        infer(s"""{"$name":"2024-03-01T12:00:00Z"}""")(name).dataType === StringType,
        s"field $name should not sniff to timestamp")
  }

  test("non-object JSON yields no schema") {
    assert(inferFromJson("42").isEmpty)
    assert(inferFromJson("[1,2]").isEmpty)
    assert(inferFromJson("not json").isEmpty)
    assert(inferFromJson(null).isEmpty)
    assert(inferFromJson("").isEmpty)
  }

  test("timestamp zone formats: Z, +HH:MM, +HHMM, naive-as-UTC") {
    for (ts <- Seq(
        "2024-03-01T12:00:00Z", "2024-03-01T12:00:00+03:00",
        "2024-03-01T12:00:00+0300", "2024-03-01T12:00:00",
        "2024-03-01T12:00:00.123456789Z"))
      assert(TimestampDetect.isTimestamp(ts), s"$ts should be a timestamp")
    for (bad <- Seq(
        "2024-03-01", "12:00:00", "2024-03-01 12:00:00",
        "2024-13-01T12:00:00Z", "2024-03-99T12:00:00", "abc", ""))
      assert(!TimestampDetect.isTimestamp(bad), s"$bad should NOT be a timestamp")
  }

  test("epoch-millis parsing: +HHMM normalizes, naive is UTC") {
    assert(TimestampDetect.parseToEpochMillis("2024-03-01T12:00:00Z").get ===
      TimestampDetect.parseToEpochMillis("2024-03-01T12:00:00").get)
    assert(TimestampDetect.parseToEpochMillis("2024-03-01T15:00:00+0300").get ===
      TimestampDetect.parseToEpochMillis("2024-03-01T12:00:00Z").get)
    assert(TimestampDetect.parseToEpochMillis("2024-03-01T15:00:00+03:00").get ===
      TimestampDetect.parseToEpochMillis("2024-03-01T12:00:00Z").get)
  }

  test("property: random instants round-trip through every zone format") {
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      val millis = math.abs(rnd.nextLong()) % 4102444800000L // < year 2100
      val inst = java.time.Instant.ofEpochMilli(millis)
      val base = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS")
        .withZone(java.time.ZoneOffset.UTC).format(inst)
      val offsetHr = rnd.nextInt(28) - 14
      val shifted = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS")
        .withZone(java.time.ZoneOffset.ofHours(offsetHr)).format(inst)
      val sign = if (offsetHr < 0) "-" else "+"
      val hh = f"${math.abs(offsetHr)}%02d"
      for (repr <- Seq(s"${base}Z", base, s"$shifted$sign$hh:00", s"$shifted$sign${hh}00"))
        assert(TimestampDetect.parseToEpochMillis(repr).contains(millis),
          s"$repr should parse to $millis")
    }
  }

  test("distributed inference unifies heterogeneous records") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val ds = Seq(
      """{"id":1,"amount":10}""",
      """{"id":2,"amount":10.5,"note":"hi"}""",
      """{"id":3,"created_at":"2024-01-01T00:00:00Z"}""").toDS()
    val s = inferSchemaDistributed(ds).get
    assert(s.fieldNames.toSeq === Seq("amount", "created_at", "id", "note"))
    assert(s("amount").dataType === DoubleType)
    assert(s("created_at").dataType === TimestampType)
    assert(s("id").dataType === IntegerType)
  }
}

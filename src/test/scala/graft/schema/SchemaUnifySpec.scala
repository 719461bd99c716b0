package graft.schema

import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

class SchemaUnifySpec extends AnyFunSuite {
  import SchemaUnify._

  /** Deterministic sample-based property driver (scalatestplus bridge is not
    * on the allowed dependency list). */
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to 300).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- gb.apply(Gen.Parameters.default, Seed(i.toLong + 1000))
      } f(a, b)
    }
  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit =
    (1 to 300).foreach { i =>
      ga.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }
  private def forAll3[A](ga: Gen[A])(f: (A, A, A) => Unit): Unit =
    (1 to 300).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- ga.apply(Gen.Parameters.default, Seed(i.toLong + 1000))
        c <- ga.apply(Gen.Parameters.default, Seed(i.toLong + 2000))
      } f(a, b, c)
    }

  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = true) })

  // --- golden cases mirroring the reference lattice ---

  test("int32 + int64 promotes to int64") {
    assert(unify2(st("a" -> IntegerType), st("a" -> LongType))("a").dataType === LongType)
  }

  test("byte + short promotes to int32 (small-int default)") {
    assert(unify2(st("a" -> ByteType), st("a" -> ShortType))("a").dataType === IntegerType)
  }

  test("bool + int16 promotes to int32") {
    assert(unify2(st("a" -> BooleanType), st("a" -> ShortType))("a").dataType === IntegerType)
  }

  test("float beats int64; double beats float") {
    assert(unify2(st("a" -> LongType), st("a" -> FloatType))("a").dataType === FloatType)
    assert(unify2(st("a" -> FloatType), st("a" -> DoubleType))("a").dataType === DoubleType)
    assert(unify2(st("a" -> IntegerType), st("a" -> DoubleType))("a").dataType === DoubleType)
  }

  test("timestamp + date promotes to timestamp") {
    assert(unify2(st("a" -> DateType), st("a" -> TimestampType))("a").dataType === TimestampType)
  }

  test("string + timestamp is an ERROR, not a coercion") {
    val e = intercept[GraftSchemaException] {
      unify2(st("a" -> StringType), st("a" -> TimestampType))
    }
    assert(e.getMessage.contains("Cannot unify incompatible types"))
    assert(e.getMessage.contains("'a'"))
  }

  test("string + int is an error") {
    intercept[GraftSchemaException] {
      unify2(st("a" -> StringType), st("a" -> IntegerType))
    }
  }

  test("result fields are sorted alphabetically") {
    val u = unify2(st("z" -> IntegerType, "m" -> StringType), st("a" -> LongType))
    assert(u.fieldNames.toSeq === Seq("a", "m", "z"))
  }

  test("disjoint fields union; nullable if any nullable") {
    val a = StructType(Seq(StructField("x", IntegerType, nullable = false)))
    val b = StructType(Seq(StructField("x", IntegerType, nullable = true)))
    assert(unify2(a, b)("x").nullable)
    val c = StructType(Seq(StructField("x", IntegerType, nullable = false)))
    assert(!unify2(c, c)("x").nullable)
  }

  test("nested structs merge recursively with promoted leaves") {
    val a = st("user" -> st("age" -> IntegerType, "name" -> StringType))
    val b = st("user" -> st("age" -> DoubleType, "city" -> StringType))
    val merged = unify2(a, b)("user").dataType.asInstanceOf[StructType]
    assert(merged.fieldNames.toSeq === Seq("age", "city", "name"))
    assert(merged("age").dataType === DoubleType)
  }

  test("arrays merge element types; maps merge keys and values") {
    val a = st("tags" -> ArrayType(IntegerType), "attrs" -> MapType(StringType, IntegerType))
    val b = st("tags" -> ArrayType(LongType), "attrs" -> MapType(StringType, DoubleType))
    val u = unify2(a, b)
    assert(u("tags").dataType === ArrayType(LongType, containsNull = true))
    assert(u("attrs").dataType.asInstanceOf[MapType].valueType === DoubleType)
  }

  test("array element conflict (int vs string) errors with field path") {
    val e = intercept[GraftSchemaException] {
      unify2(st("tags" -> ArrayType(IntegerType)), st("tags" -> ArrayType(StringType)))
    }
    assert(e.getMessage.contains("tags.element"))
  }

  // --- ScalaCheck lattice properties ---

  private val leafGen: Gen[DataType] = Gen.oneOf(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    BooleanType, StringType, BinaryType, TimestampType, DateType)

  private def typeGen(depth: Int): Gen[DataType] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      6 -> leafGen,
      1 -> Gen.lzy(typeGen(depth - 1).map(ArrayType(_, true))),
      1 -> Gen.lzy(structGen(depth - 1)))

  private def structGen(depth: Int): Gen[StructType] = for {
    n <- Gen.choose(1, 4)
    names <- Gen.pick(n, Seq("a", "b", "c", "d", "e", "f"))
    types <- Gen.listOfN(n, typeGen(depth))
  } yield StructType(names.zip(types).map { case (nm, t) => StructField(nm, t, nullable = true) }.toSeq)

  private def tryUnify(ss: StructType*): Option[StructType] =
    try Some(unify(ss)) catch { case _: GraftSchemaException => None }

  test("property: unify is commutative (incl. failure)") {
    forAll(structGen(2), structGen(2)) { (a, b) =>
      assert(tryUnify(a, b) === tryUnify(b, a))
    }
  }

  test("property: unify is idempotent on its own output") {
    forAll(structGen(2), structGen(2)) { (a, b) =>
      tryUnify(a, b).foreach { u => assert(unify(Seq(u, u)) === u) }
    }
  }

  test("property: unify(a, a) is a field-sorted permutation of a") {
    forAll(structGen(2)) { a =>
      val u = unify(Seq(a, a))
      assert(u.fieldNames.sorted.toSeq === a.fieldNames.sorted.toSeq)
    }
  }

  test("property: pairwise-then-merge equals flat merge (associative shape)") {
    forAll3(structGen(1)) { (a, b, c) =>
      val flat = tryUnify(a, b, c)
      val paired = tryUnify(a, b).flatMap(ab => tryUnify(ab, c))
      // When both succeed they must agree; flat may fail where paired fails.
      (flat, paired) match {
        case (Some(f), Some(p)) => assert(f === p)
        case _ => succeed
      }
    }
  }
}

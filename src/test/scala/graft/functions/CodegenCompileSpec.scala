package graft.functions

import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The custom expressions claim codegen — this spec makes a compile
  * failure LOUD. `GenerateUnsafeProjection.generate` throws on invalid
  * generated Java, whereas the production path silently falls back to
  * interpreted eval (which is exactly how a Janino mis-parse and missing
  * `nullable` overrides hid for a round). Non-nullable inputs are the
  * regression case: the expressions return null on empty/degenerate
  * inputs, so without `nullable = true` the generated projection has no
  * isNull slot to assign. */
class CodegenCompileSpec extends AnyFunSuite {

  test("all custom expressions compile under codegen with non-nullable inputs") {
    val strArr = BoundReference(0, ArrayType(StringType, containsNull = false),
      nullable = false)
    val dblArr = BoundReference(1, ArrayType(DoubleType, containsNull = false),
      nullable = false)
    val str = BoundReference(2, StringType, nullable = false)
    GenerateUnsafeProjection.generate(Seq(
      SketchExpressions.SimHash64(strArr),
      SketchExpressions.MinHashSignature(strArr, 64),
      ShingleExpression.WordShingles(strArr, 3),
      ShingleExpression.TopShingleCount(strArr, 2),
      VectorFunctions.CosineSimilarity(dblArr, dblArr),
      TextExpressions.RollingHash(str),
      TextExpressions.NormalizeNfc(str)))
  }

  test("all custom expressions compile under codegen with nullable inputs") {
    val strArr = BoundReference(0, ArrayType(StringType, containsNull = true),
      nullable = true)
    val fltArr = BoundReference(1, ArrayType(FloatType, containsNull = true),
      nullable = true)
    val str = BoundReference(2, StringType, nullable = true)
    GenerateUnsafeProjection.generate(Seq(
      SketchExpressions.SimHash64(strArr),
      SketchExpressions.MinHashSignature(strArr, 64),
      ShingleExpression.WordShingles(strArr, 3),
      ShingleExpression.TopShingleCount(strArr, 2),
      VectorFunctions.CosineSimilarity(fltArr, fltArr),
      TextExpressions.RollingHash(str),
      TextExpressions.NormalizeNfc(str)))
  }

  test("NormalizeNfc: decomposed folds to composed; normalized input returns unchanged") {
    import org.apache.spark.unsafe.types.UTF8String
    val decomposed = UTF8String.fromString("caf\u0065\u0301") // 'cafe' + combining acute
    val composed = TextExpressions.nfc(decomposed)
    assert(composed.toString === "caf\u00e9")
    assert(composed.numChars() === 4 && decomposed.numChars() === 5)
    // identity fast path: already-NFC (and pure ASCII) input comes back
    // as the SAME object - zero copies on the overwhelming hot path
    val ascii = UTF8String.fromString("plain ascii")
    assert(TextExpressions.nfc(ascii) eq ascii)
    assert(TextExpressions.nfc(composed) eq composed)
  }

  test("NormalizeNfkc: compatibility folds NFC lacks; CaseFold: full folding beyond lower()") {
    import org.apache.spark.unsafe.types.UTF8String
    def u(s: String) = UTF8String.fromString(s)
    // ligature + fullwidth: NFC keeps them, NFKC folds to plain forms
    assert(TextExpressions.nfc(u("ﬁle")).toString === "ﬁle")
    assert(TextExpressions.nfkc(u("ﬁle")).toString === "file")
    assert(TextExpressions.nfkc(u("ＡＢ")).toString === "AB") // ＡＢ
    // canonical composition still applies under NFKC
    assert(TextExpressions.nfkc(u("é")).toString === "é")
    // identity fast paths: ASCII and already-normalized return SAME object
    val ascii = u("plain ascii")
    assert(TextExpressions.nfkc(ascii) eq ascii)
    // full case folding: 'ß' -> 'ss' (plain lower() keeps 'ß'), ASCII
    // takes the UTF8String lowercase fast path
    assert(TextExpressions.casefold(u("STRAßE")).toString === "strasse")
    assert(TextExpressions.casefold(u("MiXeD Ascii")).toString === "mixed ascii")
    // the dedup-key composition collapses byte-variant spellings
    val a = TextExpressions.casefold(TextExpressions.nfkc(u("ＦﬁLE"))) // ＦﬁLE
    val b = TextExpressions.casefold(TextExpressions.nfkc(u("ffile")))
    assert(a.toString === b.toString)
  }
}

package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact piece boundaries of the BPE pre-tokenizer (TextOps.bpeTokens). */
class TextOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pieces(s: String): Seq[String] =
    Seq(s).toDF("text")
      .select(TextOps.bpeTokens(col("text")).as("p"))
      .as[Seq[String]].collect().head

  test("contractions split into word + suffix piece") {
    assert(pieces("don't stop") === Seq("don", "'t", " stop"))
    assert(pieces("we're they'll it's I'd you've I'm") ===
      Seq("we", "'re", " they", "'ll", " it", "'s", " I", "'d",
        " you", "'ve", " I", "'m"))
  }

  test("letters, digits and punctuation are separate runs; space binds forward") {
    assert(pieces("re-use 12,340 items (always)!") ===
      Seq("re", "-", "use", " 12", ",", "340", " items", " (", "always", ")!"))
  }

  test("plain whitespace words match the whitespace count; empty text is empty") {
    assert(pieces("alpha beta gamma") === Seq("alpha", " beta", " gamma"))
    assert(pieces("") === Seq.empty)
  }

  test("BPE count exceeds word count exactly on punctuated text") {
    val df = Seq("plain words here", "punct: yes, it's here!").toDF("text")
      .select(TextOps.tokenCount(col("text")).as("ws"),
        TextOps.bpeTokenCount(col("text")).as("bpe"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(df(0) === ((3L, 3L)))
    assert(df(1)._2 > df(1)._1)
  }
}

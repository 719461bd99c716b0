package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Totality fuzz for the binary container parsers: [[MultimodalOps
  * .decodeHeader]] consumes UNTRUSTED payload bytes inside executor
  * tasks — ANY exception there fails the whole Spark stage, so the
  * parsers must be total: every input, however malformed, yields SOME
  * MediaMeta (a real parse or the deterministic stub), never a throw.
  * Random bytes, truncations of valid containers, and bit-flipped valid
  * containers are the three classic parser-crash classes. */
class MultimodalFuzzSpec extends AnyFunSuite {

  private def forAll[A](ga: Gen[A], n: Int = 400)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      ga.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private val bytesGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 256).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))

  private def total(id: Long, b: Array[Byte]): Unit = {
    val m = MultimodalOps.decodeHeader(id, b)
    assert(m.doc_id == id && m.n_bytes == b.length.toLong)
  }

  test("decodeHeader is total on random bytes") {
    forAll(bytesGen)(b => total(1L, b))
  }

  test("decodeHeader is total on truncations of valid containers") {
    val valids = Seq(
      MultimodalOps.synthPng(640, 480, 2),
      MultimodalOps.synthWav(2, 44100, 16, 100),
      MultimodalOps.synthMp4(1280, 720, 2, 600, 9000L))
    valids.foreach { v =>
      (0 to v.length).foreach(n => total(2L, v.take(n)))
    }
  }

  test("decodeHeader is total on adversarially DEEP box nesting (no stack overflow)") {
    // 50k nested 'trak' boxes after a valid ftyp: each 8-byte header's
    // size spans the remainder, so an unbounded walk would recurse one
    // frame per level — the depth bound must cut it off, not the stack
    val n = 50000
    val out = new java.io.ByteArrayOutputStream()
    def be(i: Int): Array[Byte] =
      Array((i >>> 24).toByte, (i >>> 16).toByte, (i >>> 8).toByte, i.toByte)
    out.write(be(16)); out.write("ftyp".getBytes("US-ASCII"))
    out.write("isom".getBytes("US-ASCII")); out.write(be(0))
    (0 until n).foreach { i =>
      out.write(be(8 * (n - i))); out.write("trak".getBytes("US-ASCII"))
    }
    total(4L, out.toByteArray)
  }

  test("decodeHeader is total on bit-flipped valid containers") {
    val valids = Seq(
      MultimodalOps.synthPng(64, 64, 6),
      MultimodalOps.synthWav(1, 8000, 8, 10),
      MultimodalOps.synthMp4(320, 240, 3, 30, 300L))
    val flip = for {
      vi <- Gen.chooseNum(0, valids.size - 1)
      pos <- Gen.chooseNum(0, valids(vi).length - 1)
      bit <- Gen.chooseNum(0, 7)
    } yield {
      val c = valids(vi).clone()
      c(pos) = (c(pos) ^ (1 << bit)).toByte
      c
    }
    forAll(flip, n = 800)(b => total(3L, b))
  }
}

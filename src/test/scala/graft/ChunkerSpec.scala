package graft

import graft.functions.Chunker
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** O1/O3 parity tests against the reference algorithms
  * (document_processor.py:78-92 fixed; :248-292 marked/sliding),
  * including seeded randomized property checks (SURVEY.md §5.2 #2). */
class ChunkerSpec extends AnyFunSuite {

  test("fixed windows: exact boundaries, strip, empty-drop, ordinal gaps") {
    // 10-char windows over 25 chars -> windows [0,10),[10,20),[20,25)
    val text = "0123456789" + "          " + "abcde"
    val out = Chunker.chunkFixed(text, 10)
    // middle window is all spaces -> stripped empty -> dropped, ordinal skipped
    assert(out.map(c => (c.ordinal, c.text)) == Seq((0, "0123456789"), (2, "abcde")))
  }

  test("fixed windows ignore overlap entirely (reference parity)") {
    val out = Chunker.chunkFixed("abcdefghij", 4)
    assert(out.map(_.text) == Seq("abcd", "efgh", "ij"))
  }

  test("marked: page assignment = last marker at-or-before chunk start") {
    val text = "[[page1]]aaaaa[[page2]]bbbbb[[page3]]ccccc"
    // clean text: aaaaabbbbbccccc, markers at 0, 5, 10
    val out = Chunker.chunkMarked(text, 4, 0)
    assert(out.map(c => (c.text, c.page_number.get)) ==
      Seq(("aaaa", 1), ("abbb", 1), ("bbcc", 2), ("ccc", 3)))
  }

  test("marked: text before first marker is dropped (page None)") {
    val out = Chunker.chunkMarked("xxxx[[page1]]yyyy", 4, 0)
    assert(out.map(_.text) == Seq("yyyy"))
    assert(out.head.page_number.contains(1))
  }

  test("marked: sliding stride = size - overlap re-covers text") {
    val out = Chunker.chunkMarked("[[page1]]abcdefghij", 4, 2)
    assert(out.map(_.text) == Seq("abcd", "cdef", "efgh", "ghij", "ij"))
  }

  test("marked: overlap >= size rejected (config.py:34-39 invariant)") {
    intercept[IllegalArgumentException](Chunker.chunkMarked("[[page1]]abc", 4, 4))
  }

  test("pagesToMarkedText skips blank pages, 1-based numbering") {
    assert(Chunker.pagesToMarkedText(Seq("a", " ", "", "b")) == "[[page1]]a[[page4]]b")
  }

  test("property: fixed chunks are <= size, non-empty, match their windows") {
    val rnd = new Random(42)
    for (_ <- 1 to 200) {
      val text = Seq.fill(rnd.nextInt(60))("ab \n".charAt(rnd.nextInt(4))).mkString
      val size = 1 + rnd.nextInt(12)
      val chunks = Chunker.chunkFixed(text, size)
      assert(chunks.forall(c => c.text.nonEmpty && c.text.length <= size))
      chunks.foreach { c =>
        val w = text.substring(c.start, math.min(c.start + size, text.length))
        assert(w.strip() == c.text)
      }
      // ordinal encodes the window index: start = ordinal * size
      chunks.foreach(c => assert(c.start == c.ordinal * size))
    }
  }

  test("property: marked stride covers every char position exactly") {
    val rnd = new Random(7)
    for (_ <- 1 to 200) {
      val body = Seq.fill(1 + rnd.nextInt(50))("xyz".charAt(rnd.nextInt(3))).mkString
      val size = 2 + rnd.nextInt(9)
      val ov = rnd.nextInt(math.min(2, size - 1) + 1)
      val chunks = Chunker.chunkMarked(s"[[page1]]$body", size, ov)
      // no whitespace in body => strip is identity => full coverage
      val covered = chunks.flatMap(c => c.start until (c.start + c.text.length)).toSet
      assert(covered == body.indices.toSet)
      assert(chunks.forall(_.page_number.contains(1)))
    }
  }
}

package graft.functions

import java.io.StringReader

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.UnloadRecordIteratorTestAccess

/** Property tests for the unload dialect kernels: for ANY cell values —
  * including embedded delimiters, backslashes, newlines and CRs — escape +
  * record-join must invert through the escape-aware record iterator + the
  * UnloadSplit kernel. (The one lossy rule is '' -> NULL, the dialect's
  * universal empty-as-null contract, reference convert.py:140-144.)
  */
class UnloadDialectPropertySpec extends AnyFunSuite {

  // generator biased toward the dialect's special characters
  private val cellChar: Gen[Char] = Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('|', '\\', '\n', '\r', ' ', '\t', 'é', 'ニ'),
    1 -> Gen.asciiPrintableChar)
  private val cell: Gen[String] = Gen.stringOf(cellChar)
  private val row: Gen[List[String]] =
    Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, cell))
  private val doc: Gen[List[List[String]]] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, row))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def escapeJoin(cells: Seq[String]): String =
    cells.map(c =>
      UnloadEscapeImpl.escape(UTF8String.fromString(c), '|').toString).mkString("|")

  test("escape -> record-split -> field-split inverts for arbitrary rows") {
    samples(doc, 300).foreach { rows =>
      val text = rows.map(escapeJoin).mkString("", "\n", "\n")
      val records = UnloadRecordIteratorTestAccess.readAll(new StringReader(text))
      assert(records.length == rows.length, s"record count for $rows")
      records.zip(rows).foreach { case (rec, cells) =>
        val parsed = UnloadDialectImpl.split(UTF8String.fromString(rec), '|', cells.length)
        cells.indices.foreach { i =>
          val got = parsed.get(i, org.apache.spark.sql.types.StringType)
          val want = if (cells(i).isEmpty) null else UTF8String.fromString(cells(i))
          assert(got == want, s"cell $i of $cells")
        }
      }
    }
  }

  test("escape output never contains an unescaped delimiter or terminator") {
    samples(cell, 1000).foreach { s =>
      val esc = UnloadEscapeImpl.escape(UTF8String.fromString(s), '|').toString
      var i = 0
      while (i < esc.length) {
        val c = esc.charAt(i)
        if (c == '\\') i += 2 // escaped pair — skip the protected char
        else {
          assert(c != '|' && c != '\n' && c != '\r', s"unescaped '$c' in $esc")
          i += 1
        }
      }
      assert(i == esc.length, s"trailing lone backslash in $esc") // no overrun
    }
  }
}

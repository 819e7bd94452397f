package graft.sources

import java.io.Reader

/** Test access to the package-private escape-aware record iterator. */
object UnloadRecordIteratorTestAccess {
  def readAll(in: Reader): List[String] = new UnloadRecordIterator(in).toList
}

package graft.queries

import java.nio.file.Files

/** Shared scratch-table scaffolding for query modules: a temp dir per
  * table build, memoized per (query, sfDir) so the bench's repeated
  * invocations measure the operator under test, not the setup (the
  * build runs once, in the warmup pass). One definition — the
  * memoization contract must not drift between modules.
  */
private[queries] object Scratch {

  def dir(prefix: String): String =
    Files.createTempDirectory(s"graft-$prefix").toString

  private val built =
    new scala.collection.concurrent.TrieMap[(String, String), AnyRef]

  def setupOnce[T <: AnyRef](name: String, d: String)(f: => T): T =
    built.getOrElseUpdate((name, d), f).asInstanceOf[T]
}

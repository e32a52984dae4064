package graft

import org.scalatest.funsuite.AnyFunSuite

/** The committed QUERIES.md must equal what Docgen would generate from
  * the CURRENT registry — a registry change without `sbt "runMain
  * graft.Docgen"` fails here instead of shipping a stale catalog.
  */
class DocsSpec extends AnyFunSuite {
  test("QUERIES.md is in sync with the registered query specs") {
    val committed = java.nio.file.Files.readString(
      java.nio.file.Paths.get("QUERIES.md"))
    assert(committed == Docgen.render,
      "QUERIES.md is stale — run `sbt \"runMain graft.Docgen\"` and commit")
  }
}

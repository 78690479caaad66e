package graft.analytics

import graft.SparkSpec

/** [[IndexLayout.familyOf]] — the deterministic catalog-name prefix
  * every bucketed artifact's table registrations key on. Pinned: one
  * family per physical directory (symlink aliases collapse), and
  * canonicalization failures DEGRADE to the absolute path instead of
  * failing the read (java.io canonicalization throws IOException on
  * paths the filesystem rejects, e.g. embedded NUL).
  */
class IndexLayoutSpec extends SparkSpec {

  test("symlinked aliases of one artifact dir resolve to one family") {
    val real = java.nio.file.Files.createTempDirectory("graft-fam-real")
    val link = new java.io.File(real.getParent.toFile,
      s"graft-fam-link-${System.nanoTime()}").toPath
    java.nio.file.Files.createSymbolicLink(link, real)
    try assert(IndexLayout.familyOf(link.toString) ===
      IndexLayout.familyOf(real.toString),
      "a symlinked alias produced a second family — duplicate catalog " +
        "registrations over identical files")
    finally {
      java.nio.file.Files.deleteIfExists(link)
      java.nio.file.Files.deleteIfExists(real)
    }
  }

  test("pathological paths fall back to the absolute path instead of " +
      "throwing") {
    // embedded NUL: UnixFileSystem.canonicalize rejects it with
    // IOException where getAbsolutePath does not
    val fam = IndexLayout.familyOf("/tmp/graft\u0000bad")
    assert(fam.startsWith("graft_idx_") && fam.length === "graft_idx_".length + 12,
      s"fallback family malformed: $fam")
  }

  test("family is stable across relative and absolute spellings") {
    val real = java.nio.file.Files.createTempDirectory("graft-fam-rel")
    try {
      val abs = real.toString
      val viaDot = new java.io.File(real.getParent.toFile,
        s"./${real.getFileName}").toString
      assert(IndexLayout.familyOf(abs) === IndexLayout.familyOf(viaDot),
        "equivalent path spellings produced different families")
    } finally java.nio.file.Files.deleteIfExists(real)
  }
}

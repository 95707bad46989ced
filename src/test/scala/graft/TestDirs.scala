package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Temp-dir helper for specs that write real files: runs the body
  * against a fresh directory and deletes it recursively afterwards, so
  * repeated test runs don't leak parquet layouts into /tmp. */
object TestDirs {
  def withTempDir[A](prefix: String)(body: String => A): A = {
    val dir: Path = Files.createTempDirectory(prefix)
    try body(dir.toString)
    finally {
      Files.walk(dir)
        .sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }
}

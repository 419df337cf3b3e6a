package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Source hygiene: no control bytes that flip git's text/binary detection.
  * A single NUL in a .scala file makes git treat it as binary, excluding it
  * from every textual diff — an un-reviewable source file.
  */
class RepoHygieneSpec extends AnyFunSuite {

  private def scalaSources(root: String): Seq[Path] = {
    val p = Paths.get(root)
    // Fail loudly rather than pass vacuously if the test cwd ever changes.
    assert(Files.exists(p), s"source root $p not found — test must run from the repo root")
    val stream = Files.walk(p)
    try
      stream
        .iterator()
        .asScala
        .filter(f => f.toString.endsWith(".scala") && Files.isRegularFile(f))
        .toSeq
    finally stream.close()
  }

  test("no NUL or control bytes in any Scala source") {
    val sources = scalaSources("src")
    assert(sources.nonEmpty, "no Scala sources found — scan is vacuous")
    // Forbid all C0 controls except \t \n \r: NUL flips git to binary
    // mode; the rest are invisible in editors and diffs.
    val allowed = Set(9.toByte, 10.toByte, 13.toByte)
    val offenders = sources.filter { f =>
      Files.readAllBytes(f).exists(b => b >= 0 && b < 32 && !allowed(b))
    }
    assert(
      offenders.isEmpty,
      s"control byte(s) found in: ${offenders.mkString(", ")}"
    )
  }
}

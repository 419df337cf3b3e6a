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
    if (!Files.exists(p)) Seq.empty
    else
      Files
        .walk(p)
        .iterator()
        .asScala
        .filter(f => f.toString.endsWith(".scala") && Files.isRegularFile(f))
        .toSeq
  }

  test("no NUL bytes in any Scala source") {
    val offenders = scalaSources("src").filter { f =>
      Files.readAllBytes(f).contains(0.toByte)
    }
    assert(
      offenders.isEmpty,
      s"NUL byte(s) found in: ${offenders.mkString(", ")} — git will treat these as binary"
    )
  }
}

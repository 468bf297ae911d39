package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session keeps the
  * suite fast; tests must not depend on session-global mutable state). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.engine.Engine.session("local[4]")
  lazy val sf: String = "/root/testdata/sf0.001"

  def tempDir(prefix: String): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d
  }

  def writeText(dir: java.io.File, name: String, content: String): String = {
    val f = new java.io.File(dir, name)
    java.nio.file.Files.writeString(f.toPath, content)
    f.getAbsolutePath
  }
}

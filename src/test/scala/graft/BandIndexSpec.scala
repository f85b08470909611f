package graft

import org.scalatest.funsuite.AnyFunSuite

/** Loud-failure contract for persisted deletion-band indexes
  * (`graft.operators.BandIndex`): parameter or version mismatch —
  * including r8's prefix-cap change vs an older index — must RAISE,
  * never silently return a thinner candidate set.
  */
class BandIndexSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._
  import graft.operators.BandIndex

  private def freshIndex(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-bidx")
      .toString
    val ref = Seq((1L, "katherine smith"), (2L, "jonathan brown"),
        (3L, "completely different"))
      .toDF("id", "name")
    BandIndex.write(ref, dir, "id", "name")
    dir
  }

  test("matching parameters probe finds lev<=2 neighbors") {
    val dir = freshIndex()
    val probe = Seq((101L, "katherin smith"), // one deletion away from id 1
        (102L, "zzzz")).toDF("pid", "name")
    val cand = BandIndex
      .probeCandidates(spark, dir, probe, "pid", "name")
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((101L, 1L)),
      "a one-deletion neighbor must surface as a candidate")
    assert(!cand.exists(_._1 == 102L), "unrelated probe matches nothing")
  }

  test("probing with a different prefix raises instead of silently " +
      "missing candidates") {
    val dir = freshIndex()
    val probe = Seq((101L, "katherin smith")).toDF("pid", "name")
    val e = intercept[IllegalStateException] {
      BandIndex.probeCandidates(spark, dir, probe, "pid", "name",
        prefix = 15)
    }
    assert(e.getMessage.contains("prefix=15"))
    assert(e.getMessage.toLowerCase.contains("silently missed"))
  }

  test("an index without the sidecar (pre-versioning format) raises") {
    val dir = freshIndex()
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(dir, BandIndex.MetaFile))
    val e = intercept[IllegalStateException] {
      BandIndex.open(spark, dir)
    }
    assert(e.getMessage.contains("predates"))
  }

  test("a future/older format version raises") {
    val dir = freshIndex()
    val p = java.nio.file.Paths.get(dir, BandIndex.MetaFile)
    // drop the local-FS checksum sidecar: we are hand-forging an older
    // index's descriptor, not corrupting this one's bytes
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, "." + BandIndex.MetaFile + ".crc"))
    java.nio.file.Files.write(p,
      """{"format":"graft-deletion-band","version":1,"prefix":20,"fromEnd":false}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val e = intercept[IllegalStateException] {
      BandIndex.open(spark, dir)
    }
    assert(e.getMessage.contains("version=1"))
  }
}

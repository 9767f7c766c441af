package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** finish()'s temp-scrub tripwire: a leftover attempt temp is only
  * housekeeping when its shard WAS committed by a retry — a temp with no
  * committed counterpart means a writer died with no retry landing, and
  * deleting it would erase the only evidence of a failed job. */
class ShardCommitSpec extends AnyFunSuite {
  private def tmp(): String =
    Files.createTempDirectory("shardcommit").toString

  test("finish scrubs a superseded attempt temp once its shard committed") {
    val dir = tmp(); val ext = ".bin"
    ShardCommit.prepare(dir, ext)
    Files.write(ShardCommit.tmpPath(dir, 0, ext, 7L), Array[Byte](1))
    Files.write(Paths.get(dir, ShardCommit.shardName(0, ext)), Array[Byte](2))
    ShardCommit.finish(dir, 2, ext, "spec", Array.empty[Byte])
    assert(!Files.exists(ShardCommit.tmpPath(dir, 0, ext, 7L)))
    assert(Files.exists(Paths.get(dir, ShardCommit.shardName(1, ext))),
      "hash-empty shard 1 filled")
    assert(Files.exists(Paths.get(dir, ShardCommit.SuccessMarker)))
  }

  test("finish FAILS on an orphan temp whose shard was never committed") {
    val dir = tmp(); val ext = ".bin"
    ShardCommit.prepare(dir, ext)
    Files.write(ShardCommit.tmpPath(dir, 0, ext, 3L), Array[Byte](1))
    val e = intercept[IllegalArgumentException] {
      ShardCommit.finish(dir, 1, ext, "spec", Array.empty[Byte])
    }
    assert(e.getMessage.contains("never committed"))
    assert(Files.exists(ShardCommit.tmpPath(dir, 0, ext, 3L)),
      "the evidence temp must survive the failure")
  }
}

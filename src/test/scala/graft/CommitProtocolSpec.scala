package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Region, VoxelType}
import graft.engine.IdReservation
import graft.storage.{CommitProtocol, CuboidCodec, LocalFsCommitProtocol,
  ObjectStoreCommitProtocol, VersionedStore, VoxelRow}

/** The commit/lock control plane, parameterized over BOTH protocol
  * implementations — POSIX rename-based and the rename-less object-store
  * emulation (put-if-absent only) — so the S3 design note on
  * [[graft.storage.CommitProtocol]] is tested behavior, not a comment.
  * Every battery (pointer atomicity, mutex exclusivity, conditional
  * stale-break, racing store committers, concurrent id reservations) runs
  * once per impl.
  */
class CommitProtocolSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-protocol-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import Region.CuboidDims
  private val dims = CuboidDims(8, 8, 4)

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val impls: Seq[(String, CommitProtocol)] = Seq(
    "local-fs" -> LocalFsCommitProtocol,
    "object-store" -> ObjectStoreCommitProtocol)

  /** Run `body` with the engine-wide protocol swapped (restored after);
    * serialized against every other swapper via [[ProtocolSwap]].
    */
  private def withProtocol[A](p: CommitProtocol)(body: => A): A =
    ProtocolSwap.withProtocol(p)(body)

  for ((name, p) <- impls) {

    test(s"[$name] publish/readSmall: pointer replace is atomic and last-write-wins") {
      val dir = Paths.get(tmp(s"ptr-$name"))
      val target = dir.resolve("_CURRENT")
      assert(p.readSmall(target).isEmpty)
      p.publish(target, "0".getBytes)
      assert(p.readSmall(target).map(new String(_)).contains("0"))
      // many sequential replacements: reader always sees the latest
      (1 to 12).foreach { i =>
        p.publish(target, i.toString.getBytes)
        assert(p.readSmall(target).map(new String(_)).contains(i.toString))
      }
      // concurrent publishers: the final pointer is SOME published value
      // and every concurrent read observes a complete published value
      // (never a torn body / dangling generation)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val vals = (100 to 131).map(_.toString)
      val reads = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val writers = vals.map(v => Future(p.publish(target, v.getBytes)))
      val readers = (1 to 16).map(_ => Future {
        (1 to 20).foreach { _ =>
          p.readSmall(target).foreach(b => reads.add(new String(b)))
        }
      })
      Await.result(Future.sequence(writers ++ readers), 60.seconds)
      val finalVal = new String(p.readSmall(target).get)
      assert(vals.contains(finalVal))
      val legal = (vals ++ (0 to 12).map(_.toString)).toSet
      reads.forEach(r => assert(legal.contains(r), s"torn/unknown read: $r"))
    }

    test(s"[$name] tryCreateExclusive: exactly one winner among racers") {
      val dir = Paths.get(tmp(s"excl-$name"))
      val marker = dir.resolve("_COMMIT")
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val wins = Await.result(
        Future.sequence(List.fill(16)(Future(p.tryCreateExclusive(marker)))),
        30.seconds)
      assert(wins.count(identity) == 1)
      p.delete(marker)
      assert(p.tryCreateExclusive(marker)) // reusable after release
    }

    test(s"[$name] acquireMutex: stale holder broken, live marker honored, conditional break") {
      val dir = Paths.get(tmp(s"mutex-$name"))
      val marker = dir.resolve("_COMMIT")
      // live holder: acquire times out without breaking the fresh marker
      assert(p.tryCreateExclusive(marker))
      assert(!p.acquireMutex(marker, staleMs = 60000, deadlineMs = 150, pollMs = 10))
      assert(p.stampMs(marker).isDefined, "fresh marker must not be broken")
      // crashed holder: age the marker past staleMs and acquisition succeeds
      Files.setLastModifiedTime(marker,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 120000))
      assert(p.acquireMutex(marker, staleMs = 60000, deadlineMs = 5000, pollMs = 10))
      // conditional break: deleteIfStamp with a stale observation is a no-op
      val cur = p.stampMs(marker).get
      p.deleteIfStamp(marker, cur - 12345)
      assert(p.stampMs(marker).isDefined, "mismatched stamp must not delete")
      p.deleteIfStamp(marker, cur)
      assert(p.stampMs(marker).isEmpty, "matching stamp deletes")
    }

    test(s"[$name] racing committers serialize: distinct versions, intact final snapshot") {
      withProtocol(p) {
        import spark.implicits._
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration._
        import scala.concurrent.ExecutionContext.Implicits.global
        val store = tmp(s"race-$name")
        def cuboids(x: Long) = CuboidCodec.fromVoxels(
          Seq(VoxelRow("k", 0, 0, x, 0, 0, 1L)).toDS(), VoxelType.UInt64, dims)
        val versions = Await.result(
          Future.sequence((1L to 4L).toList.map(x =>
            Future(VersionedStore.commit(cuboids(x), store)))),
          120.seconds)
        assert(versions.sorted == List(0, 1, 2, 3))
        assert(VersionedStore.currentVersion(store).contains(3))
        assert(VersionedStore.read(spark, store).count() == 1)
      }
    }

    test(s"[$name] concurrent id reservations: monotone, non-overlapping") {
      withProtocol(p) {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration._
        import scala.concurrent.ExecutionContext.Implicits.global
        val dir = tmp(s"ids-$name")
        val ranges = Await.result(
          Future.sequence(List.fill(8)(Future(IdReservation.reserve(dir, "c", 0, 100)))),
          30.seconds)
        val sorted = ranges.sortBy(_._1)
        assert(sorted.head._1 == 1L)
        sorted.sliding(2).foreach {
          case List((_, e), (s, _)) => assert(s >= e, s"overlap: $sorted")
          case _                    =>
        }
      }
    }
  }

  test("object-store publish prunes old generations (chain stays O(1))") {
    val dir = Paths.get(tmp("prune"))
    val target = dir.resolve("_CURRENT")
    (1 to 50).foreach(i => ObjectStoreCommitProtocol.publish(target, i.toString.getBytes))
    val gens = Files.list(dir).toArray.length
    assert(gens <= 6, s"generation chain not pruned: $gens files")
    assert(ObjectStoreCommitProtocol.readSmall(target).map(new String(_)).contains("50"))
  }
}

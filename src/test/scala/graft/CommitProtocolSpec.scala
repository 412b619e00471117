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

    test(s"[$name] compaction racing delta writers loses no write") {
      // compact resolves the chain INSIDE the commit lock; were it
      // resolved first, a delta landing in between would be masked
      // wholesale by the full snapshot (lost update). Interleave real
      // compactions with real delta commits and require every written
      // cuboid to survive.
      withProtocol(p) {
        import spark.implicits._
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration._
        import scala.concurrent.ExecutionContext.Implicits.global
        val store = tmp(s"compactrace-$name")
        def cuboidAt(m: Long) = CuboidCodec.fromVoxels(
          Seq(VoxelRow("k", 0, 0, m * dims.x, 0, 0, m + 1)).toDS(), VoxelType.UInt64, dims)
        VersionedStore.commit(cuboidAt(0L), store)
        val writers = (1L to 5L).map(m => Future {
          Thread.sleep(m * 7); VersionedStore.commitDelta(cuboidAt(m), store)
        })
        val compactor = Future {
          (1 to 3).foreach { _ => VersionedStore.compact(spark, store); Thread.sleep(11) }
        }
        Await.result(Future.sequence(writers :+ compactor.map(_ => 0)), 300.seconds)
        val mortons = VersionedStore.read(spark, store)
          .select($"morton").as[Long].collect().toSet
        assert(mortons.size == 6, s"lost a write under racing compaction: $mortons")
      }
    }

    test(s"[$name] randomized N-writer soak: no lost commit, no torn read, O(1) chains") {
      // moto-style torture of the control plane (the reference's
      // test_state.py analog): 6 mutexed writers × 25 increments of one
      // pointer, 4 readers polling it continuously, 4 id-reservers
      // hammering the same directory — all concurrently, with random
      // jitter. Asserts the three contracts the engine's commit path
      // rests on: every increment lands (no lost commit), no reader ever
      // observes the pointer move backwards or a value never published
      // (no torn/stale read), and the generation chain stays O(1) files.
      withProtocol(p) {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration._
        import scala.concurrent.ExecutionContext.Implicits.global
        val dir = Paths.get(tmp(s"soak-$name"))
        val target = dir.resolve("_PTR")
        val marker = dir.resolve("_MTX")
        val writers = 6; val ops = 25
        p.publish(target, "0".getBytes)
        val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
        val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        val readers = (1 to 4).map(r => Future {
          val rnd = new scala.util.Random(1000 + r)
          var last = -1L
          while (!stop.get()) {
            p.readSmall(target).foreach { b =>
              val v = new String(b).toLong
              if (v < last) violations.add(s"pointer went backwards: $last -> $v")
              if (v < 0 || v > writers.toLong * ops) violations.add(s"unpublished value: $v")
              last = math.max(last, v)
            }
            if (rnd.nextInt(4) == 0) Thread.sleep(1)
          }
        })
        val writerFs = (1 to writers).map(w => Future {
          val rnd = new scala.util.Random(w)
          (1 to ops).foreach { _ =>
            assert(p.acquireMutex(marker, staleMs = 60000, deadlineMs = 60000, pollMs = 1),
              "soak writer failed to acquire mutex")
            try {
              val cur = new String(p.readSmall(target).get).toLong
              if (rnd.nextInt(3) == 0) Thread.sleep(rnd.nextInt(3).toLong)
              p.publish(target, (cur + 1).toString.getBytes)
            } finally p.delete(marker)
          }
        })
        val reservers = (1 to 4).map(r => Future {
          val rnd = new scala.util.Random(2000 + r)
          (1 to 10).map { _ =>
            if (rnd.nextInt(3) == 0) Thread.sleep(rnd.nextInt(2).toLong)
            IdReservation.reserve(dir.toString, "c", 0, 50)
          }
        })
        Await.result(Future.sequence(writerFs), 120.seconds)
        val ranges = Await.result(Future.sequence(reservers), 120.seconds).flatten
        stop.set(true)
        Await.result(Future.sequence(readers), 30.seconds)
        assert(violations.isEmpty, s"soak violations: ${violations.toArray.mkString("; ")}")
        // no lost commit: all 150 mutexed increments survived the race
        assert(new String(p.readSmall(target).get).toLong == writers.toLong * ops)
        // reservations: non-overlapping, gapless coverage of 40×50 ids
        val sorted = ranges.sortBy(_._1)
        assert(sorted.head._1 == 1L)
        assert(sorted.last._2 == 1L + 40L * 50L)
        sorted.sliding(2).foreach {
          case Seq((_, e), (s2, _)) => assert(s2 == e, s"gap/overlap at $e -> $s2")
          case _                    =>
        }
        // generation-chain pruning: the directory holds O(1) control
        // files, not one per publish (150 pointer gens + 40 counter gens)
        val files = Files.list(dir).toArray.length
        assert(files <= 16, s"control-file chain not pruned: $files files in $dir")
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

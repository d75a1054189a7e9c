package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized N-writer × M-table stress over one shared snapshot root
  * plus a governing commit log — the Nessie-shaped multi-writer
  * deployment (round-14 ask #8). The pairwise CAS/fencing paths are
  * spec-covered elsewhere; this drives them MIXED and interleaved:
  * appends, merge-on-read upserts/deletes, delta compaction,
  * materialization and snapshot expiry racing across threads, with a
  * concurrent reader hammering resolution the whole time.
  *
  * The workload is seeded and writer-local-deterministic: each writer
  * only ever touches its own key range, so whatever the interleaving,
  * the expected final content is computable (chain order preserves
  * each writer's sequential op order). Asserted invariants:
  *  1. no lost or torn writes — final content of every table is
  *     exactly the union of the writers' applied op sequences;
  *  2. no torn reads — the concurrent reader never throws and never
  *     observes a key owned by nobody;
  *  3. the governed log's head resolves both tables to the final
  *     content (both-or-neither, post-race);
  *  4. no orphan leaks — after `removeOrphans(grace = 0)` content and
  *     every retained version still read, and a second sweep finds
  *     nothing left to delete (the first sweep converged).
  */
class CatalogStressSpec extends SparkSpec {
  import spark.implicits._

  // this fuzz caught a REAL lost write on its second-ever CI run: a
  // concurrent `materialize` committed a stale full snapshot over a
  // just-landed append (content-preserving rewrites used to commit
  // without pinning their slot — fixed by threading expectedNext
  // through overwriteImpl for materialize/compact/optimize). Keep the
  // writer/op counts high enough that maintenance ops overlap appends.
  private val Writers = 6
  private val OpsPerWriter = 8
  private val Tables = Seq("ta", "tb")

  test("seeded N-writer x M-table fuzz: mixed append/MOR/compact/expire, no torn state, no orphans") {
    val root = java.nio.file.Files.createTempDirectory("graft-stress").toString
    val logRoot = java.nio.file.Files.createTempDirectory("graft-stress-log").toString
    val init = new SnapshotTables(spark, root)
    Tables.foreach { t =>
      init.overwriteTable(Seq((-1L, "seed")).toDF("id", "v"), t)
    }

    // expected final value per (table, id): None = deleted. Guarded by
    // its own lock; written only after an op SUCCEEDS, in writer-local
    // order (each writer is sequential, and chain order preserves it).
    val expected = scala.collection.mutable.Map.empty[(String, Long), Option[String]]
    val readerFailures = new java.util.concurrent.atomic.AtomicReference[String](null)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)

    def retrying[A](body: => A): A = {
      var attempts = 0
      while (true) {
        try return body
        catch {
          case _: SnapshotTables.ConcurrentCommitException if attempts < 20 =>
            attempts += 1; Thread.sleep(10L * attempts)
        }
      }
      sys.error("unreachable")
    }

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global

    // a concurrent reader: resolution must never throw or surface a
    // key no writer owns, whatever commit it lands on
    val reader = Future {
      val r = new SnapshotTables(spark, root)
      while (!stop.get()) {
        Tables.foreach { t =>
          try {
            val ids = r.read(t).select("id").as[Long].collect()
            val alien = ids.filter(id => id != -1L && (id < 1000000L || id >= (Writers + 1) * 1000000L))
            if (alien.nonEmpty) readerFailures.compareAndSet(null, s"alien ids in $t: ${alien.take(5).mkString(",")}")
          } catch {
            case e: Exception => readerFailures.compareAndSet(null, s"read of $t threw: $e")
          }
        }
      }
    }

    val writers = (1 to Writers).map { w =>
      Future {
        val st = new SnapshotTables(spark, root)
        val rng = new scala.util.Random(1000 + w)
        val owned = scala.collection.mutable.Map.empty[String, scala.collection.mutable.ArrayBuffer[Long]]
        for (op <- 1 to OpsPerWriter) {
          val t = Tables(rng.nextInt(Tables.length))
          val mine = owned.getOrElseUpdate(t, scala.collection.mutable.ArrayBuffer.empty)
          rng.nextInt(6) match {
            case 0 | 1 => // append a fresh batch of this writer's keys
              val ids = (0 until 5).map(i => w * 1000000L + op * 1000L + i)
              val rows = ids.map(id => (id, s"w$w-o$op")).toDF("id", "v")
              retrying(st.append(rows, t))
              expected.synchronized(ids.foreach(id => expected((t, id)) = Some(s"w$w-o$op")))
              mine ++= ids
            case 2 => // MOR upsert: rewrite some owned keys (or append)
              if (mine.isEmpty) {
                val ids = (0 until 5).map(i => w * 1000000L + op * 1000L + i)
                retrying(st.append(ids.map(id => (id, s"w$w-o$op")).toDF("id", "v"), t))
                expected.synchronized(ids.foreach(id => expected((t, id)) = Some(s"w$w-o$op")))
                mine ++= ids
              } else {
                val ids = rng.shuffle(mine.toSeq).take(3)
                val rows = ids.map(id => (id, s"w$w-u$op")).toDF("id", "v")
                retrying(st.upsertMor(t, rows, keyCols = Seq("id")))
                expected.synchronized(ids.foreach(id => expected((t, id)) = Some(s"w$w-u$op")))
              }
            case 3 => // MOR delete of some owned keys
              if (mine.nonEmpty) {
                val ids = rng.shuffle(mine.toSeq).take(2)
                retrying(st.deleteKeysMor(t, ids.toDF("id")))
                expected.synchronized(ids.foreach(id => expected((t, id)) = None))
                mine --= ids
              }
            case 4 => // maintenance: fold the delta chain / materialize
              retrying { if (rng.nextBoolean()) st.compactDeltas(t) else st.materialize(t) }
            case 5 => // maintenance: expire old snapshots (keep plenty)
              retrying(st.expireSnapshots(t, olderThanMillis = 0L, retainLast = 5))
          }
        }
        "done"
      }
    }
    assert(Await.result(Future.sequence(writers), 600.seconds).forall(_ == "done"))
    stop.set(true)
    Await.result(reader, 120.seconds)
    assert(readerFailures.get() == null, String.valueOf(readerFailures.get()))

    // 1. no lost/torn writes: final content is exactly the expected map
    val t = new SnapshotTables(spark, root)
    Tables.foreach { tab =>
      val got = t.read(tab).as[(Long, String)].collect().toMap
      val want = expected.synchronized {
        expected.collect { case ((`tab`, id), Some(v)) => id -> v }.toMap
      } + (-1L -> "seed")
      assert(got == want,
        s"$tab: ${got.size} rows vs ${want.size} expected; " +
          s"missing=${(want.keySet -- got.keySet).take(5)} extra=${(got.keySet -- want.keySet).take(5)}")
    }

    // 3. governed head resolves the final state atomically
    val lake = new LakeCommits(spark, logRoot)
    lake.publish(Tables.map(tab => (t, tab)))
    Tables.foreach { tab =>
      assert(lake.read(t, tab).count() == t.read(tab).count())
    }

    // 4. orphan sweep converges and loses nothing
    Tables.foreach { tab =>
      val before = t.read(tab).count()
      val retained = t.history(tab).map(v => v -> t.readVersion(tab, v).count())
      t.removeOrphans(tab, graceMs = 0L)
      assert(t.read(tab).count() == before, s"$tab content changed after orphan sweep")
      retained.foreach { case (v, n) =>
        assert(t.readVersion(tab, v).count() == n, s"$tab v$v broken after sweep")
      }
      val (files2, dirs2) = t.removeOrphans(tab, graceMs = 0L)
      assert(files2 == 0 && dirs2 == 0, s"$tab second sweep still found debris: $files2/$dirs2")
    }
  }
}

package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev profiler (round-20 optimization): per-query Spark job timeline.
  *
  * For each named corpus query: one untimed warm pass, then a profiled
  * pass that records every Spark job (start offset, wall duration, call
  * site, executor task time) plus the driver-side gap between jobs —
  * the number that separates "executor-bound" from "driver/commit-bound"
  * queries before touching any code.
  *
  * {{{ sbt "Test/runMain graft.DriveProfile /root/testdata/sf0.1 q176_v3_dv_dml" }}}
  */
object DriveProfile {
  final case class J(id: Int, site: String, t0: Long) {
    @volatile var t1: Long = 0L
    @volatile var taskTime: Long = 0L // executorRunTime ms summed over stages
    @volatile var tasks: Int = 0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.find(_.startsWith("passes=")).map(_.stripPrefix("passes=").toInt).getOrElse(1)
    val names = args.drop(1).filterNot(_.startsWith("passes="))
    val spark = graft.core.GraftSession.local("graft-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val jobs = mutable.ArrayBuffer.empty[J]
    val live = mutable.Map.empty[Int, J]
    val stageToJob = mutable.Map.empty[Int, J]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        val j = J(e.jobId, site, e.time)
        live(e.jobId) = j
        jobs += j
        e.stageIds.foreach(sid => stageToJob(sid) = j)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        live.get(e.jobId).foreach(_.t1 = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = jobs.synchronized {
        stageToJob.get(e.stageInfo.stageId).foreach { j =>
          j.taskTime += e.stageInfo.taskMetrics.executorRunTime
          j.tasks += e.stageInfo.numTasks
        }
      }
    }

    // planning-phase accounting: every tracked QueryExecution reports its
    // parsing/analysis/optimization/planning phase spans; summed per query
    // run they explain how much of the driver gap is plan-compile.
    val phaseTotals = mutable.Map.empty[String, Long].withDefaultValue(0L)
    var nExec = 0
    val qel = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = phaseTotals.synchronized {
        nExec += 1
        qe.tracker.phases.foreach { case (ph, summary) =>
          phaseTotals(ph) += (summary.endTimeMs - summary.startTimeMs)
        }
      }
      override def onFailure(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }

    // poor man's async-profiler for the DRIVER: sample the main thread
    // every 10 ms, attribute each sample to its deepest graft.* frame
    // (falling back to the top spark/java frame), so the driver gap
    // decomposes into named code paths.
    val mainThread = Thread.currentThread()
    val samples = mutable.Map.empty[String, Int].withDefaultValue(0)
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          import scala.jdk.CollectionConverters._
          val all = Thread.getAllStackTraces.asScala
          all.foreach { case (t, st) =>
            val isMain = t eq mainThread
            // non-main threads only count when they're in graft code
            // (stream-execution / commit threads); main always counts
            val graftFrame = st.find { f =>
              f.getClassName.startsWith("graft.") &&
                !f.getClassName.contains("DriveProfile")
            }
            if (st.nonEmpty && (isMain || graftFrame.nonEmpty)) {
              val frame = graftFrame.orElse(st.headOption).map { f =>
                s"${f.getClassName.split('.').takeRight(2).mkString(".")}.${f.getMethodName}:${f.getLineNumber}"
              }.getOrElse("?")
              val inAction = st.exists(f => f.getClassName.contains("SparkPlan") ||
                f.getClassName.contains("DAGScheduler") || f.getMethodName == "awaitResult")
              val tag = if (isMain) (if (inAction) "JOB " else "DRV ") else "AUX "
              samples.synchronized { samples(s"$tag$frame") += 1 }
            }
          }
        }
        Thread.sleep(10)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    val byName = graft.queries.Corpus.all.map(q => q.name -> q).toMap
    names.foreach { n =>
      val q = byName.getOrElse(n, sys.error(s"unknown query $n"))
      q.run(spark, sfDir).count() // warm (plan-compile + JIT out of the profile)
      (1 to passes).foreach { p =>
        jobs.synchronized { jobs.clear(); live.clear(); stageToJob.clear() }
        phaseTotals.synchronized { phaseTotals.clear(); nExec = 0 }
        samples.synchronized { samples.clear() }
        spark.sparkContext.addSparkListener(listener)
        spark.listenerManager.register(qel)
        sampling = true
        val w0 = System.nanoTime()
        q.run(spark, sfDir).count()
        val wall = (System.nanoTime() - w0) / 1e9
        sampling = false
        spark.sparkContext.removeSparkListener(listener)
        spark.listenerManager.unregister(qel)
        Thread.sleep(300) // let listener events drain
        val js = jobs.synchronized { jobs.toVector }
        val base = js.headOption.map(_.t0).getOrElse(0L)
        val jobWall = js.map(j => math.max(0L, j.t1 - j.t0)).sum / 1e3
        println(f"PROFILE $n pass$p wall=$wall%.3f njobs=${js.size} jobwall=$jobWall%.3f gap=${wall - jobWall}%.3f")
        phaseTotals.synchronized {
          val ph = phaseTotals.toSeq.sortBy(-_._2).map { case (k, v) => f"$k=${v / 1e3}%.3f" }.mkString(" ")
          println(f"  PHASES nexec=$nExec $ph")
        }
        samples.synchronized {
          val tot = samples.values.sum.max(1)
          samples.toSeq.sortBy(-_._2).take(30).foreach { case (f, c) =>
            println(f"  STK $c%4d (${c * 100.0 / tot}%5.1f%%) $f")
          }
        }
        // aggregate by call site
        val bySite = js.groupBy(_.site).map { case (s, g) =>
          (s, g.size, g.map(j => math.max(0L, j.t1 - j.t0)).sum / 1e3,
            g.map(_.taskTime).sum / 1e3, g.map(_.tasks).sum)
        }.toSeq.sortBy(-_._3)
        bySite.take(30).foreach { case (s, cnt, wal, tt, nt) =>
          println(f"  SITE $s%-55s n=$cnt%3d wall=$wal%7.3f taskTime=$tt%8.3f tasks=$nt%5d")
        }
        // timeline of the 25 longest jobs
        js.sortBy(j => -(j.t1 - j.t0)).take(25).foreach { j =>
          println(f"  JOB ${j.id}%4d +${(j.t0 - base) / 1e3}%7.3f dur=${math.max(0L, j.t1 - j.t0) / 1e3}%7.3f tt=${j.taskTime / 1e3}%7.3f tasks=${j.tasks}%4d ${j.site}")
        }
      }
    }
    spark.stop()
  }
}

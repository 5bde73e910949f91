package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-job wall/stage/task breakdown for ONE named gate query —
  * the measure-first microscope for iterative operators whose cost is
  * job-count-bound (guide §1/§7): run the query once for warmup, then
  * once under a listener, and print every job's duration, stage count,
  * task count and shuffle bytes. Usage:
  *   runMain graft.tools.ProfileQuery <sfDir> <queryName> [cpus]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = if (args.length > 1) args(1) else "q1_agg"
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = graft.SparkTuning.scaleDefaults(SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master(s"local[$cpus]"), cpus.toInt, graft.SparkTuning.dirBytes(sfDir))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    // warmup pass: codegen/JIT/listing paid outside the profile
    fn(spark, sfDir).foreach(_ => ())

    case class Job(id: Int, t0: Long, var t1: Long = 0L, var stages: Int = 0,
        var tasks: Int = 0, var shuffleRead: Long = 0L, var shuffleWrite: Long = 0L)
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, Job]
    val stageToJob = scala.collection.mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs(e.jobId) = Job(e.jobId, e.time)
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.t1 = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
          j.stages += 1
          j.tasks += si.numTasks
          j.shuffleRead += si.taskMetrics.shuffleReadMetrics.totalBytesRead
          j.shuffleWrite += si.taskMetrics.shuffleWriteMetrics.bytesWritten
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).foreach(_ => ())
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // let the listener bus drain
    println(f"%n=== $name: wall ${wall}%.3f s, ${jobs.size} jobs ===")
    var acc = 0L
    jobs.values.foreach { j =>
      val d = j.t1 - j.t0
      acc += d
      println(f"job ${j.id}%4d  ${d}%6d ms  stages=${j.stages}%2d tasks=${j.tasks}%4d " +
        f"shufR=${j.shuffleRead / 1024}%8d KB shufW=${j.shuffleWrite / 1024}%8d KB")
    }
    println(f"sum of job durations: ${acc}%d ms (gaps = driver/planning time)")
    spark.stop()
  }
}

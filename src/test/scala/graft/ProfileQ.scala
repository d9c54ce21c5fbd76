package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-job/stage wall-clock profile of one SparkEntry query — the
  * measurement harness behind the r14 optimization round (§1 of the
  * optimization guide: find WHERE the time goes before touching
  * anything). Usage:
  *   runMain graft.ProfileQ q268_theil_sen [sfDir]
  * Prints one line per job (duration, #stages, per-stage task counts
  * and summed task time) after running the query against the noop
  * sink exactly like Bench does.
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    spark.range(1000000).selectExpr("sum(id)").collect()

    case class Stage(tasks: Int, taskTimeMs: Long, name: String)
    val jobStart = scala.collection.concurrent.TrieMap[Int, (Long, String)]()
    val jobs = scala.collection.mutable.ArrayBuffer[(Int, Long, String)]()
    val stages = scala.collection.concurrent.TrieMap[Int, Stage]()
    val jobStages = scala.collection.concurrent.TrieMap[Int, Seq[Int]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobStart(j.jobId) = (j.time,
          Option(j.properties.getProperty("spark.job.description")).getOrElse(""))
        jobStages(j.jobId) = j.stageIds
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobStart.remove(j.jobId).foreach { case (t0, d) =>
          jobs.synchronized { jobs += ((j.jobId, j.time - t0, d)) }
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        stages(i.stageId) = Stage(i.numTasks,
          i.taskMetrics.executorRunTime, i.name)
      }
    })

    for (name <- names) {
      jobs.clear()
      val t0 = System.nanoTime()
      val run: Unit => Unit = _ =>
        SparkEntry.queries.get(name) match {
          case Some(fn) =>
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          case None => // artifact entry
            SparkEntry.artifacts.find(_._1 == name).get._2(spark, sfDir)
        }
      try run(())
      catch { case e: Throwable =>
        println(s"== $name FAILED ${e.getClass.getSimpleName}: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let listener events drain
      println(f"== $name total ${dt}%.2f s, ${jobs.size} jobs")
      jobs.sortBy(-_._2).take(12).foreach { case (id, ms, desc) =>
        val st = jobStages.getOrElse(id, Nil).flatMap(stages.get)
        val stStr = st.map(s =>
          s"${s.tasks}t/${s.taskTimeMs}ms ${s.name.take(45)}").mkString(" + ")
        println(f"job $id%4d ${ms / 1000.0}%8.2f s  [$stStr]  ${desc.take(60)}")
      }
      operators.Retained.releaseAll(spark)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

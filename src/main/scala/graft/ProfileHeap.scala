package graft

/** Heap diagnosis for the 100×-catalog OOM (round-14 verdict #4):
  * `runMain graft.ProfileHeap <sfDir> [histEvery]` — runs the catalog
  * in the bench's sorted order with the bench's noop-write forcing,
  * and after every query logs post-GC heap occupancy; every
  * `histEvery` queries (and right before an OOM would land) dumps the
  * top of a `jcmd GC.class_histogram` so the RETAINED structure has a
  * name, not a guess. Run with SPARK_DRIVER_MEM=8g to reproduce the
  * round-14 failure envelope. */
object ProfileHeap {
  private def heapUsedMb(): Long = {
    System.gc()
    Thread.sleep(200)
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
  }

  private def histogram(top: Int): String = {
    val pid = ProcessHandle.current().pid()
    try {
      val p = new ProcessBuilder("jcmd", pid.toString,
        "GC.class_histogram").redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes())
      p.waitFor()
      out.linesIterator.take(top + 3).mkString("\n")
    } catch { case e: Exception => s"(jcmd unavailable: $e)" }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val histEvery = if (args.length > 1) args(1).toInt else 25
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt)
    val entries = Queries.all.toSeq.sortBy(_._1)
    println(s"[heap] start: ${heapUsedMb()} MB, maxHeap ${
      Runtime.getRuntime.maxMemory() / (1024 * 1024)} MB")
    var i = 0
    entries.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      i += 1
      println(f"[heap] $i%3d $name%-28s ${heapUsedMb()}%5d MB after-GC  ($sec%.1f s)")
      if (i % histEvery == 0) println(s"[heap] histogram after $name:\n${histogram(15)}")
    }
    println(s"[heap] end histogram:\n${histogram(20)}")
    spark.stop()
  }
}

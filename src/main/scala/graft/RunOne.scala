package graft

/** Single-query probe: `runMain graft.RunOne <queryName> <sfDir> [reps]`
  * — executes one catalog query with the bench's noop-write forcing and
  * prints per-rep seconds. For scale probes against the 10×/100×
  * fixtures without paying a full catalog pass. */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt)
    val fn = Queries.all.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown query '$name'; known: ${Queries.all.keys.toSeq.sorted.mkString(", ")}"))
    var best = Double.MaxValue
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      if (dt < best) best = dt
      println(f"""{"query":"$name","rep":$r,"sec":$dt%.3f}""")
    }
    println(f"""{"query":"$name","best_sec":$best%.3f,"sf":"$sfDir"}""")
    spark.stop()
  }
}

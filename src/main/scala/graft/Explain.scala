package graft

/** Dev tool: print the formatted physical plan of catalog queries.
  * Usage: runMain graft.Explain [queryName ...] (default: all). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val names = if (args.nonEmpty) args.toSeq else Queries.all.keys.toSeq.sorted
    names.foreach { n =>
      println(s"#### $n")
      Queries.all(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}

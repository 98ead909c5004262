package graft

/** Dev tool: print the formatted physical plan of catalog queries.
  * Usage: runMain graft.Explain [queryName ...] (default: all).
  * SPARK_GRAFT_SF_DIR picks the data (default sf0.001 — note broadcast
  * decisions differ at sf0.1; explain against the bench SF when tuning
  * join strategies). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else Queries.all.keys.toSeq.sorted
    names.foreach { n =>
      println(s"#### $n")
      Queries.all(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}

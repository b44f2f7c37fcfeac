package graft

/** Plan-inspection utility: prints the formatted physical plan of one or
  * more gate queries. Usage: runMain graft.Explain <sfDir> <query> [...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local("graft-explain")
    for (name <- names) {
      println(s"==== $name ====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

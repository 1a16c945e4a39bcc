package graft.tools

import graft.{GraftSession, SparkEntry}

/** Print formatted physical plans for selected queries (plan review). */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val names = if (args.isEmpty) Seq("q02_filter_project") else args(0).split(",").toSeq
    for (n <- names) {
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}

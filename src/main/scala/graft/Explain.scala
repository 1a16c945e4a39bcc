package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(SparkSession.builder().master("local[4]"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      println(s"##### $name")
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      val ex = plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Scan ") || l.contains("Broadcast")).toSeq
      println(ex.map(_.trim.take(120)).mkString("\n"))
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan inspection for corpus queries: prints the formatted physical plan
  * of each named query (all of them with no args) against
  * SPARK_GRAFT_SF_DIR — the `.explain("formatted")` iteration loop the
  * build brief calls for, as a one-command tool. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false") // show full static plans
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"== $name: no such query ==")
        case Some(fn) =>
          println(s"\n==================== $name ====================")
          try println(fn(spark, sfDir).queryExecution
            .explainString(ExplainMode.fromString("formatted")))
          catch { case e: Throwable => println(s"(failed: ${e.getMessage})") }
      }
    }
    spark.stop()
  }
}

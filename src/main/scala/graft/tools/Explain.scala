package graft.tools

import graft.GraftSession
import graft.SparkEntry

/** Plan-audit helper: prints the formatted physical plan for one query
  * (`runMain graft.tools.Explain <queryName> [sfDir]`). Keeping plans
  * honest is a standing task — see the scale notes in SURVEY.md §7.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.local()
    val df = SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    spark.stop()
  }
}

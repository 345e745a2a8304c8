package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: dump `.explain("formatted")` for the named queries into
  * plans/<tag>/<query>_<suffix>.txt at bench-like settings (local[32],
  * 32 shuffle partitions) — the round's plan-evidence capture
  * (plans/r15/<query>_before.txt / _after.txt).
  *
  * Usage: runMain graft.PlanDump <tag> <suffix> <sfDir> <query...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val sfDir = args(2)
    val names = args.drop(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = new java.io.File(s"plans/$tag")
    dir.mkdirs()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val w = new java.io.PrintWriter(
        new java.io.File(dir, s"${name}_$suffix.txt"), "UTF-8")
      try w.println(plan) finally w.close()
      println(s"[plandump] wrote ${name}_$suffix.txt (${plan.length} chars)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

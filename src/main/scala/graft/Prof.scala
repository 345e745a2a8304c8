package graft
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(name: String): Unit = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    t("q_watermark")
    for (_ <- 1 to 3) { t("q_minhash_lsh_pairs"); t("q_ngram_jaccard_pairs") }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s  (rows=$n)")
    }
    val e = Tables.events(spark, dir)
    val expiry = date_add(to_date(col("ts")), (col("user_id") % 30 + 1).cast("int"))
    val viaFmt = concat(
      date_format(expiry, "d"), upper(date_format(expiry, "MMM")), date_format(expiry, "yy"))
    val monNames = Seq("JAN","FEB","MAR","APR","MAY","JUN","JUL","AUG","SEP","OCT","NOV","DEC")
    val monCase = monNames.zipWithIndex.foldLeft(lit("")) { case (acc,(m,i)) =>
      when(month(expiry) === i+1, m).otherwise(acc) }
    val viaArith = concat(
      dayofmonth(expiry).cast("string"), monCase,
      lpad((year(expiry) % 100).cast("string"), 2, "0"))
    t("warm")(e.count())
    t("date_format x3")(e.select(viaFmt.as("x")).filter(col("x").isNotNull).count())
    t("date_format x3 again")(e.select(viaFmt.as("x")).filter(col("x").isNotNull).count())
    t("arith fmt")(e.select(viaArith.as("x")).filter(col("x").isNotNull).count())
    t("arith fmt again")(e.select(viaArith.as("x")).filter(col("x").isNotNull).count())
    // equality check
    val diff = e.select(viaFmt.as("a"), viaArith.as("b")).filter(col("a") =!= col("b")).count()
    println(s"mismatches: $diff")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Explicit schema registry (SURVEY.md §1.2: the reference's schemas are
  * implicit in handwritten SQL and can drift between writer and reader —
  * here every dataset has one declared StructType and loads are validated
  * against it).
  *
  * Testdata schemas per FIXTURES.md §A; `events.ts` is declared as
  * TimestampType — the physical TIMESTAMP(NANOS) file is normalized on load
  * by [[Tables.events]].
  */
object Schemas {

  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val all: Map[String, StructType] = Map(
    "events" -> events, "lineitem" -> lineitem, "orders" -> orders,
    "customer" -> customer, "supplier" -> supplier, "part" -> part,
    "nation" -> nation, "region" -> region,
    "documents" -> documents, "embeddings" -> embeddings)

  /** Validate a loaded frame against the registry (names + types, ignoring
    * nullability). Throws with a drift report on mismatch.
    */
  def validate(name: String, df: DataFrame): DataFrame = {
    // TIMESTAMP and TIMESTAMP_NTZ are one family here: the driver testdata's
    // tz-naive parquet timestamps infer as NTZ depending on session conf,
    // and every engine comparison treats them identically (UTC session).
    def norm(dt: DataType): String =
      dt.simpleString.replace("timestamp_ntz", "timestamp")
    all.get(name).foreach { expected =>
      val got = df.schema.fields.map(f => f.name -> norm(f.dataType)).toMap
      val want = expected.fields.map(f => f.name -> norm(f.dataType)).toMap
      val drift = (want.keySet ++ got.keySet).flatMap { c =>
        (want.get(c), got.get(c)) match {
          case (Some(w), Some(g)) if w == g => None
          case (w, g) => Some(s"$c: expected ${w.getOrElse("<absent>")}, got ${g.getOrElse("<absent>")}")
        }
      }
      require(drift.isEmpty, s"schema drift in '$name': ${drift.mkString("; ")}")
    }
    df
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.TimeExprs
import graft.operators.Ohlc

/** Property-style invariants (SURVEY §5 item 3) checked over randomized data
  * (fixed seed) in single Spark passes.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  // 2000 random timestamps across 3 years, second precision, seed 42
  private lazy val randomTs = {
    val rnd = new scala.util.Random(42)
    val base = sqlTs("2023-01-01 00:00:00").getTime
    (1 to 2000).map { i =>
      (i.toLong, new java.sql.Timestamp(base + math.abs(rnd.nextLong() % (3L * 365 * 86400 * 1000))))
    }.toDF("id", "ts")
  }

  test("every ts falls in exactly one session: start <= ts < end, aligned boundaries") {
    val checked = randomTs.select(
      col("ts"),
      TimeExprs.dailySessionStart(col("ts")).as("d"),
      TimeExprs.weeklySessionStart(col("ts")).as("w"),
      TimeExprs.monthlySessionStart(col("ts")).as("m"))
      .withColumn("m_end", TimeExprs.monthlySessionEnd(col("m")))
    val bad = checked.filter(
      // containment (half-open)
      col("d") > col("ts") || col("ts") >= col("d") + expr("INTERVAL 24 HOURS") ||
        col("w") > col("ts") || col("ts") >= col("w") + expr("INTERVAL 7 DAYS") ||
        col("m") > col("ts") || col("ts") >= col("m_end") ||
        // boundary alignment: all sessions start 08:00; weekly+monthly on Friday
        hour(col("d")) =!= 8 || hour(col("w")) =!= 8 || hour(col("m")) =!= 8 ||
        dayofweek(col("w")) =!= 6 || dayofweek(col("m")) =!= 6 ||
        // monthly end is also a Friday 08:00 and strictly after start
        dayofweek(col("m_end")) =!= 6 || col("m_end") <= col("m"))
    assert(bad.count() == 0)
  }

  test("monthly session start is the last Friday of ITS month") {
    // a Friday 7 days later would land in the next month
    val bad = randomTs
      .select(TimeExprs.monthlySessionStart(col("ts")).as("m"))
      .filter(month(date_add(to_date(col("m")), 7)) === month(col("m")))
    assert(bad.count() == 0)
  }

  test("OHLC re-aggregation associativity: weekly-from-daily == weekly-from-hourly") {
    val bars = Ohlc.hourlyBars(Tables.trades(spark, "/root/testdata/sf0.001"))
    val daily = Ohlc.sessionRollup(bars, TimeExprs.dailySessionStart, minRows = 1)
      .select(col("session_start").as("t"), col("instrument"),
        col("open"), col("high"), col("low"), col("close"))
    val weeklyFromDaily = Ohlc.sessionRollup(daily, TimeExprs.weeklySessionStart, minRows = 1)
      .select(col("instrument"), col("session_start"),
        col("open"), col("high"), col("low"), col("close"))
    val weeklyFromHourly = Ohlc.sessionRollup(bars, TimeExprs.weeklySessionStart, minRows = 1)
      .select(col("instrument"), col("session_start"),
        col("open"), col("high"), col("low"), col("close"))
    assert(weeklyFromDaily.exceptAll(weeklyFromHourly).isEmpty)
    assert(weeklyFromHourly.exceptAll(weeklyFromDaily).isEmpty)
    assert(weeklyFromDaily.count() > 0)
  }

  test("gap detection finds exactly randomly excised minutes") {
    val rnd = new scala.util.Random(7)
    val all = (0 until 600).map(i => i -> f"2024-01-01 ${10 + i / 60}%02d:${i % 60}%02d:00")
    val excised = rnd.shuffle(all.map(_._1).toList).take(60).toSet
    val df = all.filterNot { case (i, _) => excised.contains(i) }
      .map { case (i, ts) => (i.toLong, sqlTs(ts), 1L, "x", 1.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val found = operators.Maintenance.missingTimeline(df)
      .select(col("missing_minute").cast("string")).as[String].collect()
      .map(_.substring(0, 16)).toSet
    // exactly the excised minutes inside the surviving [min, max] range are
    // reported (excisions at the edges clip the range instead)
    val survivingIdx = all.map(_._1).filterNot(excised.contains)
    val (lo, hi) = (survivingIdx.min, survivingIdx.max)
    val expectedInRange = all
      .filter { case (i, _) => excised.contains(i) && i > lo && i < hi }
      .map(_._2.substring(0, 16)).toSet
    assert(found == expectedInRange)
  }

  test("sessionization partitions events; consecutive sessions separated by >= gap") {
    val rnd = new scala.util.Random(11)
    val base = sqlTs("2024-03-01 00:00:00").getTime
    // bursty arrivals: mostly short gaps with occasional long ones, 40 users
    val events = (1 to 3000).scanLeft((0L, base)) { case ((_, t), i) =>
      val gapMs = if (rnd.nextDouble() < 0.15) (30L + rnd.nextInt(600)) * 60000L
                  else rnd.nextInt(10 * 60000).toLong
      (rnd.nextInt(40).toLong, t + gapMs)
    }.drop(1).map { case (u, t) => (u, new java.sql.Timestamp(t), 1.0) }
      .toDF("user_id", "ts", "value")
    val gapMin = 30
    val sessions = operators.Relational.sessionize(events, gapMin)

    // total conservation: every event counted exactly once
    assert(sessions.agg(sum("n_events")).as[Long].head() == 3000L)
    // each event lands in exactly ONE of its user's sessions
    val placed = events.as("e").join(sessions.as("s"),
      col("e.user_id") === col("s.user_id") &&
        col("e.ts").between(col("s.session_start"), col("s.session_end")))
    assert(placed.count() == 3000L)
    // bounds are real event times and ordered
    assert(sessions.filter(col("session_start") > col("session_end")).count() == 0)
    // consecutive sessions of one user are >= gap apart (else they'd merge)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_start")
    val tooClose = sessions
      .withColumn("prev_end", lag(col("session_end"), 1).over(w))
      .filter(col("prev_end").isNotNull &&
        unix_millis(col("session_start")) - unix_millis(col("prev_end")) < gapMin * 60000L)
    assert(tooClose.count() == 0)
  }

  test("trailing range window equals the self-join count/sum on random data") {
    val rnd = new scala.util.Random(13)
    val base = sqlTs("2024-03-01 00:00:00").getTime
    val rows = (1 to 500).map { i =>
      (i.toLong, s"t${rnd.nextInt(3)}",
        new java.sql.Timestamp(base + rnd.nextInt(6 * 3600 * 1000).toLong),
        (rnd.nextInt(1000) + 1).toDouble)
    }.toDF("event_id", "event_type", "ts", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(unix_millis(col("ts")))
      .rangeBetween(-3600000L, 0)
    val windowed = rows.select(col("event_id"),
      count(lit(1)).over(w).as("trailing_n"),
      sum(col("value").cast("decimal(38,6)")).over(w).cast("double").as("trailing_value"))
    // independent oracle: quadratic self-join (fine at n=500)
    val expected = rows.as("a").join(rows.as("b"),
      col("a.event_type") === col("b.event_type") &&
        col("b.ts") <= col("a.ts") &&
        col("b.ts") >= col("a.ts") - expr("INTERVAL 1 HOUR"))
      .groupBy(col("a.event_id").as("event_id"))
      .agg(count(lit(1)).as("trailing_n"),
        sum(col("b.value").cast("decimal(38,6)")).cast("double").as("trailing_value"))
    assert(windowed.exceptAll(expected).isEmpty && expected.exceptAll(windowed).isEmpty)
  }

  test("no tokenizer expression is captured by a shingle lambda (tokens() evaluation contract)") {
    // a HOF lambda re-evaluates captured subexpressions per element, so a
    // split passed directly into the shingle builder re-tokenizes per
    // shingle — quadratic per document (measured 23-84x on 2000-token
    // docs; SCALE.md round 8). Source-level guard: the builder must always
    // receive a staged column reference.
    import scala.jdk.CollectionConverters._
    // resolve the source root by walking UP from the working directory
    // until src/main/scala/graft appears — robust to the test JVM being
    // launched from a subdirectory (plain cwd-relative resolution errors)
    val srcRoot = Iterator.iterate(
        java.nio.file.Paths.get("").toAbsolutePath)(p =>
        Option(p.getParent).getOrElse(p))
      .take(8)
      .map(_.resolve("src/main/scala/graft"))
      .find(java.nio.file.Files.isDirectory(_))
      .getOrElse(fail("src/main/scala/graft not found above cwd"))
    val files = java.nio.file.Files.walk(srcRoot)
      .iterator().asScala.filter(_.toString.endsWith(".scala")).toSeq
    assert(files.nonEmpty, s"no Scala sources under $srcRoot")
    // regex over whitespace-normalized source: any shingle/bigram builder
    // whose first argument is an INLINE tokenizer call (tokens(/split()
    // rather than a staged column reference, in any HOF spelling
    // (shingles, transform, slice, element_at chains) and any alias
    val banned = Seq(
      // Shingles.shingles(tokens(...)) / shingles(TextOps.tokens(...)
      "(?:Shingles\\s*\\.\\s*)?shingles\\s*\\(\\s*(?:TextOps\\s*\\.\\s*)?(?:tokens|split)\\s*\\(",
      // transform/slice/element_at with an inline tokenizer as the array
      "(?:transform|slice|element_at|zip_with)\\s*\\(\\s*(?:TextOps\\s*\\.\\s*)?(?:tokens|split)\\s*\\(").map(_.r)
    val offenders = files.flatMap { p =>
      val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .replaceAll("\\s+", " ")
      banned.filter(_.findFirstIn(text).nonEmpty)
        .map(b => s"$p matches `${b.pattern}`")
    }
    assert(offenders.isEmpty,
      s"tokenizer captured inside a HOF lambda:\n${offenders.mkString("\n")}")
  }
}

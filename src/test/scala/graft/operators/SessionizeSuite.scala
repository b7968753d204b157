package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession

/** Sessionize: inactivity-gap splitting, strict-gap boundary, tie-order
  * determinism, per-session rollup.
  */
class SessionizeSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-sessionize")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("splits at gap > threshold; gap == threshold stays in-session") {
    val sql = spark
    import sql.implicits._
    // u1: {0, 50, 150} one session (both gaps ≤ 100; 150−50 == gap stays,
    // strict >), then 300 splits (300−150 = 150 > 100). u2: singleton.
    val ev = Seq(
      ("u1", 0L, 1L), ("u1", 50L, 2L), ("u1", 150L, 3L), // 150-50=100 == gap → same
      ("u1", 300L, 4L),                                  // 150 → new session
      ("u2", 0L, 5L))
      .toDF("user", "t", "eid")
    val got = Sessionize.sessionize(ev, "user", "t", "eid", 100L)
      .select("user", "eid", "session_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      ("u1", 1L, 1L), ("u1", 2L, 1L), ("u1", 3L, 1L),
      ("u1", 4L, 2L),
      ("u2", 5L, 1L)))
  }

  test("equal timestamps order by the tie column — session ids deterministic") {
    val sql = spark
    import sql.implicits._
    // two events at t=500; the tie column decides which is 'first', but
    // with zero gap between them they must land in the SAME session
    val ev = Seq(("u", 0L, 1L), ("u", 500L, 3L), ("u", 500L, 2L))
      .toDF("user", "t", "eid")
    val got = Sessionize.sessionize(ev, "user", "t", "eid", 100L)
      .select("eid", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  test("batch sessionize agrees with streaming session_window on session counts") {
    // the same inactivity-gap semantics exist twice in the engine: this
    // batch operator and Structured Streaming's session_window. Replaying
    // one fixture through both must yield identical (user, session-count,
    // per-session event counts) — fixture avoids exact-boundary gaps,
    // where the two definitions differ by design (batch keeps diff == gap
    // in-session; session_window's half-open [start, last+gap) does not).
    val sql = spark
    import sql.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext

    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // (user, offset-seconds): u1 → sessions {0,5,8}, {120,121}; u2 → {0}, {300}
    val fixture = Seq((1, 0L), (1, 5L), (1, 8L), (1, 120L), (1, 121L),
      (2, 0L), (2, 300L))

    // batch: seconds as the integer time axis, 30 s gap
    val batchDf = fixture.zipWithIndex
      .map { case ((u, off), i) => (u, off, i.toLong) }
      .toDF("user", "t", "eid")
    val batch = Sessionize.sessions(batchDf, "user", "t", "eid", 30L)
      .groupBy($"user").agg(count(lit(1)).as("n_sessions"),
        sort_array(collect_list($"n_ev")).as("sizes"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2))).toSet

    // streaming: same events as timestamps through session_window(30 s)
    val input = MemoryStream[(Int, java.sql.Timestamp)]
    val query = input.toDF().toDF("user", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "30 seconds"), $"user")
      .agg(count(lit(1)).as("n_ev"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sessionize_xcheck")
      .start()
    input.addData(fixture.map { case (u, off) =>
      (u, new java.sql.Timestamp(base + off * 1000)) }: _*)
    query.processAllAvailable()
    query.stop()
    val streaming = spark.table("sessionize_xcheck")
      .groupBy($"user").agg(count(lit(1)).as("n_sessions"),
        sort_array(collect_list($"n_ev")).as("sizes"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2))).toSet

    assert(batch === streaming)
    assert(batch.map(_._1) === Set(1, 2))
  }

  test("funnel: strictly-after semantics, broken chains null out") {
    val sql = spark
    import sql.implicits._
    val ev = Seq(
      // u1 completes: view(1) < click(3) < purchase(5); click(0) BEFORE
      // the first view must not count as step_1 (strictness)
      ("u1", 0L, "click"), ("u1", 1L, "view"), ("u1", 3L, "click"),
      ("u1", 5L, "purchase"),
      // u2 breaks after view: purchase precedes the first click
      ("u2", 1L, "view"), ("u2", 2L, "purchase"),
      // u3 never views → absent entirely (no step_0 anchor)
      ("u3", 1L, "click"), ("u3", 2L, "purchase"))
      .toDF("user_id", "event_id", "event_type")
    val got = Sessionize.funnel(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(0) ->
        (r.get(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got === Map(
      "u1" -> ((1L, Some(3L), Some(5L))),
      "u2" -> ((1L, None, None))))
    intercept[IllegalArgumentException] {
      Sessionize.funnel(ev, Seq("view", "view"))
    }
  }

  test("retentionCohorts: cohort is first bucket; offsets dedup within a bucket") {
    val sql = spark
    import sql.implicits._
    // bucket size 10: u1 active in buckets {0, 0, 2} (the duplicate-0
    // event must not double-count), u2 in {1, 2}, u3 in {0}
    val ev = Seq(
      ("u1", 1L), ("u1", 9L), ("u1", 25L),
      ("u2", 12L), ("u2", 27L),
      ("u3", 5L))
      .toDF("user", "t")
    val got = Sessionize.retentionCohorts(ev, "user", "t", 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (0L, 0L, 2L),  // u1, u3 in cohort 0 at offset 0
      (0L, 2L, 1L),  // u1 returns 2 buckets later
      (1L, 0L, 1L),  // u2's cohort is bucket 1
      (1L, 1L, 1L))) // u2 returns 1 bucket later
    intercept[IllegalArgumentException] {
      Sessionize.retentionCohorts(ev, "user", "t", 0L)
    }
  }

  test("lastTouch: latest strictly-preceding source; same-slot source invisible") {
    val sql = spark
    import sql.implicits._
    val ev = Seq(
      // u1: click(1) < click(3) < purchase(4) → credit click 3, not 1
      ("u1", 1L, 1L, "click"), ("u1", 3L, 3L, "click"),
      ("u1", 4L, 4L, "purchase"),
      // u1 second purchase(6) after click(5) → credit 5
      ("u1", 5L, 5L, "click"), ("u1", 6L, 6L, "purchase"),
      // u2: purchase with NO preceding click → null; the click AT the
      // same (t, tie) slot or later must not be credited
      ("u2", 7L, 7L, "purchase"), ("u2", 7L, 8L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessionize.lastTouch(ev, "purchase", "click")
      .collect().map(r => (r.getLong(0), Option(r.get(2)))).toMap
    assert(got === Map(
      4L -> Some(3L), 6L -> Some(5L), 7L -> None))
    intercept[IllegalArgumentException] {
      Sessionize.lastTouch(ev, "purchase", "purchase")
    }
  }

  test("sessionPaths: entry/exit pseudo-edges; session boundary severs the edge") {
    val sql = spark
    import sql.implicits._
    // u1 session 1: view → click → buy; gap splits; session 2: view (solo)
    // u2 session 1: view → view
    val ev = Seq(
      ("u1", 0L, 1L, "view"), ("u1", 10L, 2L, "click"), ("u1", 20L, 3L, "buy"),
      ("u1", 500L, 4L, "view"),
      ("u2", 0L, 5L, "view"), ("u2", 10L, 6L, "view"))
      .toDF("user", "t", "eid", "ty")
    val got = Sessionize.sessionPaths(ev, "user", "t", "eid", "ty", 100L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === Map(
      ("_entry_", "view") -> (3L, 3L),   // all three sessions start at view
      ("view", "click") -> (1L, 1L),
      ("click", "buy") -> (1L, 1L),
      ("buy", "_exit_") -> (1L, 1L),     // boundary severed buy→view
      ("view", "view") -> (1L, 1L),
      ("view", "_exit_") -> (2L, 2L)))   // u1 solo session + u2's session
  }

  test("sessionPaths plan: one entity exchange feeds both windows; no join") {
    val sql = spark
    import sql.implicits._
    val ev = Seq(("u", 0L, 1L, "a"), ("u", 10L, 2L, "b"))
      .toDF("user", "t", "eid", "ty")
    val plan = Sessionize.sessionPaths(ev, "user", "t", "eid", "ty", 100L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // 1 window exchange (user) — the (user, session) window reuses it via
    // the clustering-subset rule — + the distinct/final agg pair on the
    // tiny edge rows.
    assert(exchanges <= 3, s"unexpected exchange count $exchanges in:\n$plan")
    assert(!plan.contains("Join"), s"no join expected:\n$plan")
    val windowExchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .count(l => l.contains("user#") && !l.contains("from_type"))
    assert(windowExchanges <= 1,
      s"the per-session window must not re-exchange:\n$plan")
  }

  test("valueOutliers: exact k-sigma flag; singleton types never flag") {
    val sql = spark
    import sql.implicits._
    // type A: nine 10.0s and one 110.0 → mean 20, var 900, sd 30;
    // |110−20| = 90 = 3·sd → NOT flagged at k=3 (strict >), flagged at k=2.
    // type B: a singleton — zero variance, dev 0 → never flagged.
    val ev = (1L to 9L).map(i => (i, "A", 10.0)) ++
      Seq((10L, "A", 110.0), (11L, "B", 42.0))
    val df = ev.toDF("event_id", "event_type", "value")
    val k3 = Sessionize.valueOutliers(df, k = 3)
      .collect().map(_.getLong(0)).toSet
    assert(k3 === Set.empty, s"boundary 3-sigma must not flag (strict >): $k3")
    val k2 = Sessionize.valueOutliers(df, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(k2 === Set((10L, 110000000L)), s"k=2 flags the spike: $k2")
    intercept[IllegalArgumentException] { Sessionize.valueOutliers(df, k = 0) }
  }

  test("flagOutliers: serve ≡ batch valueOutliers; unseen types pass through") {
    val sql = spark
    import sql.implicits._
    val ev = ((1L to 9L).map(i => (i, "A", 10.0)) ++
      Seq((10L, "A", 110.0), (11L, "B", 42.0)))
      .toDF("event_id", "event_type", "value")
    val model = Sessionize.fitOutlierModel(ev, k = 2)
    val served = Sessionize.flagOutliers(ev, model)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val batch = Sessionize.valueOutliers(ev, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(served === batch && served === Set((10L, 110000000L)),
      s"serve $served must equal batch $batch")

    // a type the fit never saw is a schema alert, not an outlier verdict
    val drifted = Seq((20L, "C", 1e9)).toDF("event_id", "event_type", "value")
    assert(Sessionize.flagOutliers(drifted, model).count() === 0L)
  }

  test("flagOutliers: constant expression depth — one folded map literal, " +
      "no CASE chain, regardless of |types|") {
    import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Literal}
    import org.apache.spark.sql.types.MapType
    val sql = spark
    import sql.implicits._
    // 500 types: the old foldLeft CASE chain would nest 500 deep here.
    // Built over range(), not a LocalRelation — ConvertToLocalRelation
    // would otherwise eagerly evaluate the whole plan away and leave
    // nothing to inspect.
    val ev = sql.range(1, 1001).select(
      $"id".as("event_id"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("t"), $"id" % 500).as("event_type"),
      ($"id" % 7).cast("double").as("value"))
    val model = Sessionize.fitOutlierModel(ev, k = 2)
    assert(model.stats.size === 500)
    val served = Sessionize.flagOutliers(ev, model)
    val opt = served.queryExecution.optimizedPlan
    val allExprs = opt.collect { case p => p.expressions }.flatten
    val caseWhens = allExprs.flatMap(_.collect { case c: CaseWhen => c })
    assert(caseWhens.isEmpty,
      s"serve plan must not dispatch through a CASE chain: $caseWhens")
    val mapLits = allExprs.flatMap(_.collect {
      case l: Literal if l.dataType.isInstanceOf[MapType] => l
    })
    assert(mapLits.nonEmpty,
      "the fitted stats must ride the plan as ONE folded map literal")
    // and it still agrees with the batch aggregate on the same frame
    val batch = Sessionize.valueOutliers(ev, k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(served.collect().map(_.getLong(0)).toSet === batch)
  }

  test("decimal envelope: overflow fails loudly in fit AND batch, " +
      "never silently unflags") {
    val sql = spark
    import sql.implicits._
    // |v| = 1e12 → v_micro = 1e18; four rows → n·max|m| = 4e18, past the
    // k=3 limit min(5e18, 1e19/3) ≈ 3.33e18
    val hot = (1L to 4L).map(i => (i, "A", 1.0e12))
      .toDF("event_id", "event_type", "value")
    val eFit = intercept[IllegalArgumentException] {
      Sessionize.fitOutlierModel(hot, k = 3)
    }
    assert(eFit.getMessage.contains("envelope"))
    val eBatch = intercept[Exception] {
      Sessionize.valueOutliers(hot, k = 3).collect()
    }
    val msgs = Iterator.iterate[Throwable](eBatch)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("envelope")),
      s"batch overflow must raise the envelope assert, got: $msgs")
    // the same magnitudes under k=2 with one row stay inside and work
    val ok = Seq((1L, "A", 1.0e12), (2L, "A", 1.0e12))
      .toDF("event_id", "event_type", "value")
    assert(Sessionize.valueOutliers(ok, k = 2).count() === 0L)

    // SERVE-time overflow: a clean fit, then a unit-mix-up row at serve
    // (the fit's require cannot see it) — must raise, never null-unflag
    val clean = ((1L to 10L).map(i => (i, "A", 10.0)))
      .toDF("event_id", "event_type", "value")
    val model = Sessionize.fitOutlierModel(clean, k = 3)
    val mixup = Seq((99L, "A", 1.0e12)).toDF("event_id", "event_type", "value")
    val eServe = intercept[Exception] {
      Sessionize.flagOutliers(mixup, model).collect()
    }
    val serveMsgs = Iterator.iterate[Throwable](eServe)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(serveMsgs.exists(_.contains("envelope")),
      s"serve overflow must raise the envelope assert, got: $serveMsgs")
    // an unseen type at any magnitude still passes through unflagged
    val unseenHuge = Seq((7L, "Z", 1.0e12)).toDF("event_id", "event_type", "value")
    assert(Sessionize.flagOutliers(unseenHuge, model).count() === 0L)
  }

  test("sessions rollup: counts and time bounds per session") {
    val sql = spark
    import sql.implicits._
    val ev = Seq(("u", 0L, 1L), ("u", 10L, 2L), ("u", 500L, 3L))
      .toDF("user", "t", "eid")
    val got = Sessionize.sessions(ev, "user", "t", "eid", 100L)
      .select("session_id", "n_ev", "t_start", "t_end")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === Set((1L, 2L, 0L, 10L), (2L, 1L, 500L, 500L)))
  }
  test("rateAnomalies: a planted traffic spike flags; steady types never flag") {
    val sql = spark
    import sql.implicits._
    import org.apache.spark.sql.functions._
    val H = 3600L * 1000000000L
    // type "steady": 20 hours x 10 events; type "spiky": 19 hours x 10
    // events + ONE hour with 200 (the replay storm)
    val steady = for (h <- 0 until 20; i <- 0 until 10)
      yield (s"e$h$i".hashCode.toLong, h * H + i, "steady")
    val spiky = (for (h <- 0 until 19; i <- 0 until 10)
      yield (1000000L + h * 100 + i, h * H + i, "spiky")) ++
      (0 until 200).map(i => (2000000L + i, 19 * H + i, "spiky"))
    val events = (steady ++ spiky).toDF("event_id", "ts", "event_type")
    val got = Sessionize.rateAnomalies(events)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(("spiky", 19L, 200L)),
      s"exactly the planted spike hour must flag: $got")

    // a singleton bucket (one active hour) has zero variance and a zero
    // deviation: strict > never flags it
    val single = (0 until 5).map(i => (9000L + i, i.toLong, "once"))
      .toDF("event_id", "ts", "event_type")
    assert(Sessionize.rateAnomalies(single).count() === 0L)
  }
}

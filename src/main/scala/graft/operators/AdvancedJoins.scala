package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.queries.QuerySpec

/** Joins Spark lacks as first-class operators, composed from built-ins
  * (SURVEY.md §2.C "range & as-of"): preference (a) of the custom-operator
  * ladder — no planner surgery needed, Catalyst still optimizes the parts.
  *
  * Scale notes:
  *  - As-of join: the naive formulation is an inequality join (quadratic per
  *    key). The composition below instead unions both sides, sorts once per
  *    key by the time axis (one shuffle on user_id), and carries the last
  *    build-side row forward with `last(..., ignoreNulls)` — O(n log n) per
  *    key, the same trick a dedicated as-of operator would run.
  *  - Range join: the band table is tiny → broadcast nested-loop is the
  *    right physical plan, and it is what Catalyst picks.
  */
object AdvancedJoins {

  /** For each probe-side row, attach the most recent build-side row's
    * `buildVal` of the same key with ordKey ≤ probe's ordKey, returned
    * under the name `asof_<buildVal>`. Sort-based, one shuffle.
    *
    * Semantics notes:
    *  - the carried value is wrapped in a struct before `last(...,
    *    ignoreNulls)`: the struct is non-null for every BUILD row even
    *    when its inner value is null, so a most-recent build row whose
    *    value is NULL yields NULL (the correct as-of answer) instead of
    *    silently falling back to an older row's value;
    *  - build rows tied on (key, ord) break deterministically to the
    *    LARGEST buildVal (documented, value-based — not shuffle order);
    *  - `tolerance`: a match older than `tolerance` ord units (strict:
    *    probe.ord − build.ord > tolerance) is discarded — pandas
    *    `merge_asof(tolerance=...)` / kdb `wj` semantics, the standard
    *    guard against attributing to a stale quote. `None` = unbounded.
    *    Same one-shuffle plan: the carried struct just also carries the
    *    matched ord, and the bound is a map-side filter on it.
    */
  def asOfJoin(probe: DataFrame, build: DataFrame, key: String, ord: String,
               buildVal: String, tolerance: Option[Long] = None): DataFrame = {
    tolerance.foreach(t => require(t >= 0,
      s"asOfJoin: tolerance must be >= 0, got $t"))
    Seq("__is_probe", "__asof", "__asof_s", buildVal, s"asof_$buildVal")
      .foreach { c =>
      require(!probe.columns.contains(c),
        s"asOfJoin: probe already has a column named '$c' — it would be " +
          "silently overwritten; rename it first")
    }
    val p = probe
      .withColumn("__is_probe", lit(1))
      .withColumn(buildVal, lit(null).cast(build.schema(buildVal).dataType))
    val b = build.select(col(key), col(ord), col(buildVal))
      .withColumn("__is_probe", lit(0))
    val all = p.unionByName(b, allowMissingColumns = true)
    // probe rows sort after build rows at equal ord (as-of ≤ semantics);
    // buildVal is the deterministic tie-break among equal-ord build rows
    val w = Window.partitionBy(col(key))
      .orderBy(col(ord), col("__is_probe"), col(buildVal))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = all
      .withColumn("__asof_s",
        last(when(col("__is_probe") === 0,
            struct(col(ord).as("__ord"), col(buildVal))),
          ignoreNulls = true).over(w))
    val withinBound = tolerance.fold(lit(true))(t =>
      col(ord) - col("__asof_s").getField("__ord") <= t)
    carried
      .withColumn("__asof",
        when(withinBound, col("__asof_s").getField(buildVal)))
      .filter(col("__is_probe") === 1)
      .drop("__is_probe", "__asof_s", buildVal)
      .withColumnRenamed("__asof", s"asof_$buildVal")
  }

  /** Equi-join with explicit key salting — the manual skew lever for when
    * AQE's runtime skew split can't help (skewed side feeding an
    * aggregation in the same stage, streaming micro-batches where AQE is
    * off, or a key so hot a single split still overflows one task). The
    * skewed side scatters each row to one of `saltFactor` sub-keys by a
    * deterministic row-content hash; the other side replicates each row to
    * ALL `saltFactor` sub-keys; joining on (keys, salt) then spreads a hot
    * key over `saltFactor` reducers instead of one.
    *
    * Result-identical to `skewed.join(other, keys, joinType)`: every
    * skewed row meets the full set of its key's other-side rows exactly
    * once (the other side carries every salt). Cost: the other side is
    * shuffled ×saltFactor — use when `other` is the smaller-but-too-big-
    * to-broadcast side. Join types where the OTHER side would need its
    * own unmatched rows (right/full outer) are rejected: replicas would
    * surface `saltFactor` times.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "saltedJoin: empty key list")
    require(saltFactor >= 1, s"saltedJoin: saltFactor must be ≥ 1, got $saltFactor")
    val okTypes = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")
    require(okTypes.contains(joinType.toLowerCase),
      s"saltedJoin: join type '$joinType' would duplicate unmatched replicas " +
        "of the other side; use a plain join for right/full outer")
    Seq(skewed, other).foreach(df => require(!df.columns.contains("__salt"),
      "saltedJoin: input already has a __salt column"))
    // Salting exists to spread a hot key across shuffle reducers — but a
    // join whose other side fits the broadcast threshold never shuffles
    // the skewed side at all, so its replicas are pure overhead (the ×N
    // explode inflates the broadcast build N-fold and the probe pays N
    // candidate rows per key) while fixing a skew that cannot occur.
    // Gate the salt on the other side's planned size (r19): at or under
    // the session's own broadcast threshold the plain join is emitted —
    // result-identical by this operator's contract — and above it the
    // salt applies exactly as before. `spark.graft.saltedJoin.minOtherBytes`
    // overrides the cutoff (set 0 to force salting, e.g. when broadcast
    // is disabled session-wide). At 100 TB both TPC-H sides exceed any
    // broadcast threshold, so the production plan keeps the salt.
    val sessionConf = skewed.sparkSession.sessionState.conf
    val cutoff = skewed.sparkSession.conf
      .getOption("spark.graft.saltedJoin.minOtherBytes").map(_.toLong)
      .getOrElse(sessionConf.autoBroadcastJoinThreshold)
    val otherBytes = other.queryExecution.optimizedPlan.stats.sizeInBytes
    if (cutoff > 0 && otherBytes <= cutoff)
      skewed.join(other, keys, joinType)
    else {
      val salted = skewed.withColumn("__salt",
        pmod(xxhash64(struct(skewed.columns.map(col): _*)), lit(saltFactor)).cast("int"))
      val replicated = other.withColumn("__salt",
        explode(array((0 until saltFactor).map(i => lit(i)): _*)))
      salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
    }
  }

  val specs: Seq[QuerySpec] = Seq(

    // ---- as-of join: latest click (by event_id order) at or before each purchase
    QuerySpec(
      "q60_asof_join",
      (s, d) => {
        import s.implicits._
        val e = Tables.events(s, d)
        val purchases = e.filter($"event_type" === "purchase")
          .select($"user_id", $"event_id", $"value")
        val clicks = e.filter($"event_type" === "click")
          .select($"user_id", $"event_id", $"event_id".as("click_event_id"))
        asOfJoin(purchases, clicks, "user_id", "event_id", "click_event_id")
          .select($"user_id", $"event_id", $"value",
            col("asof_click_event_id").as("last_click_event_id"))
          .orderBy($"user_id", $"event_id")
      },
      Some("""
        SELECT p.user_id, p.event_id, p.value,
               (SELECT MAX(c.event_id) FROM events c
                WHERE c.event_type = 'click' AND c.user_id = p.user_id
                  AND c.event_id <= p.event_id) AS last_click_event_id
        FROM events p
        WHERE p.event_type = 'purchase'
        ORDER BY p.user_id, p.event_id""")),

    // Bounded as-of: same join under a tolerance window — a click more
    // than 500 event-ids older than the purchase no longer matches
    // (nulls ~half the matches on this corpus, so the bound is load-bearing)
    // (pandas merge_asof(tolerance)/kdb wj semantics). The oracle adds
    // the same bound to the correlated-subquery formulation.
    QuerySpec(
      "q127_asof_tolerance",
      (s, d) => {
        import s.implicits._
        val e = Tables.events(s, d)
        val purchases = e.filter($"event_type" === "purchase")
          .select($"user_id", $"event_id", $"value")
        val clicks = e.filter($"event_type" === "click")
          .select($"user_id", $"event_id", $"event_id".as("click_event_id"))
        asOfJoin(purchases, clicks, "user_id", "event_id", "click_event_id",
            tolerance = Some(500L))
          .select($"user_id", $"event_id", $"value",
            col("asof_click_event_id").as("last_click_event_id"))
          .orderBy($"user_id", $"event_id")
      },
      Some("""
        SELECT p.user_id, p.event_id, p.value,
               (SELECT MAX(c.event_id) FROM events c
                WHERE c.event_type = 'click' AND c.user_id = p.user_id
                  AND c.event_id <= p.event_id
                  AND p.event_id - c.event_id <= 500) AS last_click_event_id
        FROM events p
        WHERE p.event_type = 'purchase'
        ORDER BY p.user_id, p.event_id""")),

    // ---- range (band) join: quantity bands × lineitem
    QuerySpec(
      "q61_range_join",
      (s, d) => {
        import s.implicits._
        val bands = s.createDataFrame(Seq(
          ("small", 0.0, 10.0), ("medium", 10.0, 25.0), ("large", 25.0, 51.0)))
          .toDF("band", "lo", "hi")
        Tables.lineitem(s, d)
          .join(broadcast(bands), $"l_quantity" >= $"lo" && $"l_quantity" < $"hi")
          .groupBy($"band")
          .agg(count(lit(1)).as("n_items"),
               sum($"l_quantity".cast("decimal(18,4)")).cast("double").as("sum_qty"))
          .orderBy($"band")
      },
      Some("""
        SELECT band, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM lineitem
        JOIN (VALUES ('small', 0.0, 10.0), ('medium', 10.0, 25.0), ('large', 25.0, 51.0))
             AS bands(band, lo, hi)
          ON l_quantity >= lo AND l_quantity < hi
        GROUP BY band
        ORDER BY band""")),

    // ---- salted fact-fact join: result must be IDENTICAL to the plain
    // join (salting is a physical rewrite), which is exactly what the
    // plain-SQL oracle checks. Sum routed through DECIMAL for cross-
    // engine determinism.
    QuerySpec(
      "q83_salted_join",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).select($"l_orderkey", $"l_extendedprice")
        val ord = Tables.orders(s, d).select($"o_orderkey", $"o_orderpriority")
        saltedJoin(li, ord.withColumnRenamed("o_orderkey", "l_orderkey"),
            Seq("l_orderkey"), saltFactor = 8)
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            sum($"l_extendedprice".cast("decimal(18,4)")).cast("double").as("sum_price"))
          .orderBy($"o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority"""))
  )
}

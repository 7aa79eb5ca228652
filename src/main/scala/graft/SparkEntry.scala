package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Relational, Similarity}
import graft.functions.{Cleansing, TextAnalysis}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ the training-data-pipeline operators), each with a
  * DuckDB-equivalent `oracleSql` where SQL-expressible.
  *
  * Numeric-determinism discipline for the oracle compare: floating-point
  * aggregates are computed as exact integer sums of per-row-rounded cents
  * (`sum(cast(round(x*100) as bigint))`), because per-row IEEE ops are
  * identical across engines while reduction order is not.
  */
object SparkEntry {

  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Exact money aggregate: per-row round to cents, then integer sum. */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** Flagship: full CDC epoch replay on sf0.001 — WAL-style events table
    * tailed, latest-wins merge per user key, enrichment rollup. */
  def entry(spark: SparkSession): DataFrame =
    queries("cdc_latest_state")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- §2.1 scans / §2.2 filters ------------------------------------
    "s1_lookback_scan" -> ((s, dir) => {
      // S1: lookback-window incremental scan — predicate pushes to parquet
      t(s, dir, "events")
        .filter(col("ts") >= lit("2024-01-25 00:00:00").cast("timestamp_ntz"))
        .select("event_id", "user_id", "event_type", "value")
    }),

    "p3_inlist_filter" -> ((s, dir) => {
      // P2 + P3: PK-not-null guard, IN / NOT-IN whitelists
      t(s, dir, "events")
        .filter(col("event_id").isNotNull &&
          col("event_type").isin("click", "view") &&
          !col("user_id").isin(1L, 2L, 3L))
        .select("event_id", "user_id", "event_type")
    }),

    "p4_like_patterns" -> ((s, dir) => {
      // P4: LIKE pattern filters
      t(s, dir, "documents")
        .filter(col("text").like("%spark%") && col("source").like("src1%"))
        .select("doc_id", "source", "n_chars")
    }),

    "p8_hash_sample" -> ((s, dir) => {
      // P8: deterministic 10% mod-sampling
      Relational.hashSample(t(s, dir, "events"), "event_id", 10)
        .select("event_id", "event_type")
    }),

    // ---- §2.3 joins ----------------------------------------------------
    "j1_fk_chain" -> ((s, dir) => {
      // J1: inner equi-join FK chain customer⋈nation⋈region + rollup
      t(s, dir, "customer")
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"),
          sum(cents(col("c_acctbal"))).as("acctbal_cents"))
    }),

    "j2_left_enrich" -> ((s, dir) => {
      // J2: left-outer enrichment join, dim side broadcast
      Relational.dimLookup(t(s, dir, "orders"), t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"),
          coalesce(col("c_name"), lit("UNKNOWN")).as("cust_name"),
          coalesce(col("c_mktsegment"), lit("NONE")).as("segment"))
    }),

    "j4_range_join" -> ((s, dir) => {
      // J4: equi + BETWEEN interval join (shipped within 90 days of order)
      t(s, dir, "orders").join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate").between(col("o_orderdate"),
            col("o_orderdate") + expr("INTERVAL 90 DAY")))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"))
    }),

    "j5_semi_join" -> ((s, dir) => {
      // J5 / P9: IN-subquery as left-semi join
      Relational.subsetFilter(t(s, dir, "orders"),
          t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
            .select(col("c_custkey").as("o_custkey")),
          Seq("o_custkey"))
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    }),

    "j7_self_join" -> ((s, dir) => {
      // J7: parent/child self-join — consecutive events of the same user
      val e = t(s, dir, "events")
      val a = e.select(col("event_id").as("eid"), col("user_id").as("uid"),
        col("event_type").as("etype"))
      val b = e.select(col("event_id").as("next_eid"), col("user_id").as("nuid"),
        col("event_type").as("next_etype"))
      a.join(b, col("next_eid") === col("eid") + 1 && col("nuid") === col("uid"))
        .select(col("eid"), col("uid"), col("etype"), col("next_etype"))
    }),

    "j10_broadcast_dim" -> ((s, dir) => {
      // J10: dimension lookup join (concept-vocabulary analogue), broadcast
      Relational.dimLookup(t(s, dir, "lineitem"), t(s, dir, "part"),
          col("l_partkey") === col("p_partkey"), "inner")
        .groupBy("p_brand")
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_cents"))
    }),

    "anti_join_deletes" -> ((s, dir) => {
      // engine-internal left_anti (delete detection): customers w/o orders
      Relational.missingKeys(t(s, dir, "customer"),
          t(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"))
        .select("c_custkey", "c_name")
    }),

    // ---- §2.4 aggregations ----------------------------------------------
    "q1_agg" -> ((s, dir) => {
      // A1: grouped min/max/sum rollup (TPC-H Q1 shape)
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("price_cents"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue_cents"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty",
          round(col("sum_qty").cast("double") / col("count_order"), 6))
    }),

    "a2_preagg_join" -> ((s, dir) => {
      // A2: pre-aggregate below join (explicit — Catalyst won't push aggs)
      val lastOrder = t(s, dir, "orders").groupBy("o_custkey")
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("n_orders"))
      t(s, dir, "customer")
        .join(lastOrder, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("last_order"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
    }),

    "a3_count_distinct" -> ((s, dir) => {
      // A3: COUNT(DISTINCT) per group
      t(s, dir, "events").groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("users"),
          count(lit(1)).as("n_events"))
    }),

    "a4_mode_argmax" -> ((s, dir) => {
      // A4: mode-by-frequency via window argmax
      Relational.modeBy(t(s, dir, "events"), Seq("user_id"), "event_type")
    }),

    "a6_distinct" -> ((s, dir) => {
      // A6: DISTINCT dedupe
      t(s, dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()
    }),

    // ---- §2.5 windows -----------------------------------------------------
    "w1_latest_wins" -> ((s, dir) => {
      // W1: latest-wins dedupe — the engine's core merge-apply operator
      Relational.latestWins(t(s, dir, "events"), Seq("user_id"),
          Seq(col("ts"), col("event_id")))
        .select("user_id", "event_id", "event_type", "value")
    }),

    "w2_first_wins" -> ((s, dir) => {
      // W2: first-wins pick (earliest purchase per user)
      Relational.firstWins(
          t(s, dir, "events").filter(col("event_type") === "purchase"),
          Seq("user_id"), Seq(col("ts"), col("event_id")))
        .select("user_id", "event_id", "value")
    }),

    "w4_lag_chain" -> ((s, dir) => {
      // W4: LAG(1) preceding-event chain
      Relational.precedingChain(t(s, dir, "events"), Seq("user_id"),
          Seq(col("ts"), col("event_id")), "event_id", "prev_event_id")
        .select("user_id", "event_id", "prev_event_id")
    }),

    // ---- §2.6 sorts / top-k ------------------------------------------------
    "o1_global_topk" -> ((s, dir) => {
      // O1/O2: global total-order sort + top-k with full tie-break
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    }),

    // ---- §2.7 set operations -------------------------------------------------
    "u1_union_dedupe" -> ((s, dir) => {
      // U1: union of heterogeneous sub-sources, dedupe
      val a = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val b = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      Relational.unionDrifted(Seq(a, b), dedupe = true)
    }),

    "u2_union_all" -> ((s, dir) => {
      // U2: UNION ALL keeping duplicates, tagged per branch
      val a = t(s, dir, "customer")
        .select(col("c_nationkey").as("nationkey"), lit("cust").as("src"))
      val b = t(s, dir, "supplier")
        .select(col("s_nationkey").as("nationkey"), lit("supp").as("src"))
      a.unionByName(b).groupBy("nationkey", "src").agg(count(lit(1)).as("n"))
    }),

    // ---- §2.8 scalar functions ----------------------------------------------
    "f6_date_functions" -> ((s, dir) => {
      // F6: date arithmetic / formatting / extraction
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        datediff(lit("2026-01-01").cast("date"), col("o_orderdate").cast("date"))
          .as("age_days"))
    }),

    "f7_conditional" -> ((s, dir) => {
      // F7: CASE / COALESCE / NULLIF chains
      t(s, dir, "events").select(
        col("event_id"),
        when(col("value") > 100, "high").when(col("value") > 50, "mid")
          .otherwise("low").as("band"),
        coalesce(nullif(col("event_type"), lit("error")), lit("unknown"))
          .as("etype"))
    }),

    "f10_concat_keys" -> ((s, dir) => {
      // F10 / §1.2 composite keys: concat_ws lineage key assembly
      t(s, dir, "lineitem").select(
        concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("line_pk"),
        concat(lit("160@"), col("l_returnflag")).as("prefixed_code"))
    }),

    // ---- §2.9 CDC-shaped -------------------------------------------------------
    "cdc_latest_state" -> ((s, dir) => {
      // the engine's merge-apply shape on the driver's WAL-ish events table:
      // latest-wins state per key + enrichment rollup columns
      val ev = t(s, dir, "events")
      val latest = Relational.latestWins(ev, Seq("user_id"),
        Seq(col("ts"), col("event_id")))
      val rollup = ev.groupBy(col("user_id").as("r_uid"))
        .agg(count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("value_cents"),
          max(col("ts")).as("last_ts"))
      latest.join(rollup, col("user_id") === col("r_uid"))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"), col("n_events"),
          col("value_cents"), col("last_ts"))
    }),

    "cdc_watermark_probe" -> ((s, dir) => {
      // S11/A5: min-over-max watermark probe
      Relational.watermarkProbe(t(s, dir, "events"), "event_type", "ts")
    }),

    // ---- training-data ops -----------------------------------------------------
    "dedup_exact" -> ((s, dir) => {
      // exact dedupe: canonical doc per content digest
      t(s, dir, "documents")
        .groupBy(md5(col("text").cast("binary")).as("content_md5"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_count"))
    }),

    "text_tokens" -> ((s, dir) => {
      // token counting (whitespace tokenizer)
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("n_chars_calc"))
    }),

    "text_quality" -> ((s, dir) => {
      // quality scoring: word stats + stopword ratio
      val d = t(s, dir, "documents")
      d.select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        round(TextAnalysis.avgWordLen(col("text")), 6).as("avg_word_len"),
        TextAnalysis.stopwordHits(col("text"), "the").as("the_hits"))
    }),

    "lang_distribution" -> ((s, dir) => {
      // corpus language profile (heuristic lang-id validated vs label col)
      t(s, dir, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "s1_lookback_scan" ->
      """SELECT event_id, user_id, event_type, value FROM events
         WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'""",

    "p3_inlist_filter" ->
      """SELECT event_id, user_id, event_type FROM events
         WHERE event_id IS NOT NULL AND event_type IN ('click','view')
           AND user_id NOT IN (1,2,3)""",

    "p4_like_patterns" ->
      """SELECT doc_id, source, n_chars FROM documents
         WHERE text LIKE '%spark%' AND source LIKE 'src1%'""",

    "p8_hash_sample" ->
      "SELECT event_id, event_type FROM events WHERE event_id % 10 = 0",

    "j1_fk_chain" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
                CAST(sum(CAST(round(c_acctbal*100,0) AS BIGINT)) AS BIGINT) AS acctbal_cents
         FROM customer JOIN nation ON c_nationkey=n_nationkey
                       JOIN region ON n_regionkey=r_regionkey
         GROUP BY r_name, n_name""",

    "j2_left_enrich" ->
      """SELECT o_orderkey, coalesce(c_name,'UNKNOWN') AS cust_name,
                coalesce(c_mktsegment,'NONE') AS segment
         FROM orders LEFT JOIN customer ON o_custkey=c_custkey""",

    "j4_range_join" ->
      """SELECT o_orderpriority, count(*) AS n_lines
         FROM orders JOIN lineitem
           ON o_orderkey=l_orderkey
          AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAY
         GROUP BY o_orderpriority""",

    "j5_semi_join" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
         WHERE o_custkey IN
           (SELECT c_custkey FROM customer WHERE c_mktsegment='BUILDING')""",

    "j7_self_join" ->
      """SELECT a.event_id AS eid, a.user_id AS uid, a.event_type AS etype,
                b.event_type AS next_etype
         FROM events a JOIN events b
           ON b.event_id = a.event_id + 1 AND b.user_id = a.user_id""",

    "j10_broadcast_dim" ->
      """SELECT p_brand,
                CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents
         FROM lineitem JOIN part ON l_partkey=p_partkey
         GROUP BY p_brand""",

    "anti_join_deletes" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey)""",

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS price_cents,
                CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents,
                count(*) AS count_order,
                round(CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)/count(*), 6) AS avg_qty
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",

    "a2_preagg_join" ->
      """SELECT c_custkey, lo.last_order,
                coalesce(lo.n_orders, 0) AS n_orders
         FROM customer LEFT JOIN
           (SELECT o_custkey, max(o_orderdate) AS last_order,
                   count(*) AS n_orders
            FROM orders GROUP BY o_custkey) lo
           ON c_custkey = lo.o_custkey""",

    "a3_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS users,
                count(*) AS n_events
         FROM events GROUP BY event_type""",

    "a4_mode_argmax" ->
      """SELECT user_id, event_type FROM (
           SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY count(*) DESC, event_type ASC) AS rn
           FROM events GROUP BY user_id, event_type) x
         WHERE rn = 1""",

    "a6_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "w1_latest_wins" ->
      """SELECT user_id, event_id, event_type, value FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id
             ORDER BY ts DESC, event_id DESC) AS rn FROM events) x
         WHERE rn = 1""",

    "w2_first_wins" ->
      """SELECT user_id, event_id, value FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id
             ORDER BY ts ASC, event_id ASC) AS rn
           FROM events WHERE event_type='purchase') x
         WHERE rn = 1""",

    "w4_lag_chain" ->
      """SELECT user_id, event_id,
                lag(event_id,1) OVER (PARTITION BY user_id
                  ORDER BY ts ASC, event_id ASC) AS prev_event_id
         FROM events""",

    "o1_global_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""",

    "u1_union_dedupe" ->
      """SELECT DISTINCT nationkey FROM (
           SELECT c_nationkey AS nationkey FROM customer
           UNION ALL SELECT s_nationkey FROM supplier)""",

    "u2_union_all" ->
      """SELECT nationkey, src, count(*) AS n FROM (
           SELECT c_nationkey AS nationkey, 'cust' AS src FROM customer
           UNION ALL SELECT s_nationkey, 'supp' FROM supplier)
         GROUP BY nationkey, src""",

    "f6_date_functions" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS yr,
                CAST(month(o_orderdate) AS INT) AS mo,
                strftime(o_orderdate, '%Y-%m') AS ym,
                CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2026-01-01') AS INT) AS age_days
         FROM orders""",

    "f7_conditional" ->
      """SELECT event_id,
                CASE WHEN value > 100 THEN 'high'
                     WHEN value > 50 THEN 'mid' ELSE 'low' END AS band,
                coalesce(nullif(event_type,'error'),'unknown') AS etype
         FROM events""",

    "f10_concat_keys" ->
      """SELECT l_orderkey || '-' || l_linenumber AS line_pk,
                '160@' || l_returnflag AS prefixed_code
         FROM lineitem""",

    "cdc_latest_state" ->
      """WITH latest AS (
           SELECT user_id, event_id, event_type FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn FROM events) x
           WHERE rn = 1),
         rollup AS (
           SELECT user_id, count(*) AS n_events,
                  CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS value_cents,
                  max(ts) AS last_ts
           FROM events GROUP BY user_id)
         SELECT l.user_id, l.event_id AS last_event_id,
                l.event_type AS last_event_type, r.n_events, r.value_cents,
                r.last_ts
         FROM latest l JOIN rollup r ON l.user_id = r.user_id""",

    "cdc_watermark_probe" ->
      """SELECT min(mx) AS watermark FROM
           (SELECT max(ts) AS mx FROM events GROUP BY event_type)""",

    "dedup_exact" ->
      """SELECT md5(text) AS content_md5, min(doc_id) AS doc_id,
                count(*) AS dup_count
         FROM documents GROUP BY md5(text)""",

    "text_tokens" ->
      """SELECT doc_id,
                CAST(CASE WHEN length(trim(text))=0 THEN 0
                     ELSE len(string_split_regex(trim(text),'\s+')) END AS INT) AS n_tokens,
                CAST(length(text) AS INT) AS n_chars_calc
         FROM documents""",

    "text_quality" ->
      """SELECT doc_id,
                CAST(CASE WHEN length(trim(text))=0 THEN 0
                     ELSE len(string_split_regex(trim(text),'\s+')) END AS INT) AS n_tokens,
                round(CASE WHEN length(trim(text))=0 THEN 0.0
                      ELSE CAST(length(regexp_replace(trim(text),'\s+','','g')) AS DOUBLE)
                           / len(string_split_regex(trim(text),'\s+')) END, 6) AS avg_word_len,
                CAST(len(string_split_regex(' ' || text || ' ', '\sthe\s')) - 1 AS INT) AS the_hits
         FROM documents""",

    "lang_distribution" ->
      """SELECT lang, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM documents GROUP BY lang"""
  )
}

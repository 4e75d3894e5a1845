package graft.queries

import graft.dag._
import graft.nodes._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Second breadth wave: cube/approx aggregates, array/map scalar functions,
  * full set-op variants, outer joins, UDAF/UDTF analogues, session windows,
  * and Structured Streaming (tumbling + session) — each with a DuckDB oracle
  * where both engines compute bit-identical results.
  */
object Extra {
  import Queries.run

  // ---- q18: exceptAll / intersectAll / union distinct ----
  def q18_setops_all(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val li = d.add(SourceNode.table(dir, "lineitem"))
    val a = li >> FilterNode("l_quantity >= 25") >> ProjectNode("l_suppkey as sk").named("a")
    val b = li("result") >> FilterNode("l_quantity >= 40").named("f2") >> ProjectNode("l_suppkey as sk").named("b")
    val ea = d.add(new SetOpNode("exceptAll").named("ea"))
    a >> ea("left"); b >> ea("right")
    val ia = d.add(new SetOpNode("intersectAll").named("ia"))
    a("result") >> ia("left"); b("result") >> ia("right")
    val u = d.add(new UnionNode(distinct = true))
    // distinct each branch BEFORE the union: the set-op outputs are ~100k-row
    // multisets but only ~|suppliers| distinct keys, so pre-shrinking makes
    // the union-distinct and the final agg near-free (same rows out — the
    // branches carry disjoint tags, so per-branch distinct == post-union
    // distinct). On distinct (sk, tag) rows count(distinct sk) == count(*),
    // which drops the Expand the distinct-aggregate would otherwise plan.
    val ta = ea >> ProjectNode("sk", "'ea' as tag").named("ta") >> new DistinctNode().named("da")
    val tb = ia >> ProjectNode("sk", "'ia' as tag").named("tb") >> new DistinctNode().named("db")
    ta >> u("dfs"); tb >> u("dfs")
    u >> AggNode(Seq("tag"), "count(*) as n", "count(*) as n_sk") >>
      SortNode("tag") >> d.output("result")
  }
  val q18Sql: String =
    """WITH a AS (SELECT l_suppkey AS sk FROM lineitem WHERE l_quantity >= 25),
      |     b AS (SELECT l_suppkey AS sk FROM lineitem WHERE l_quantity >= 40),
      |     u AS (
      |  SELECT DISTINCT * FROM (
      |    SELECT sk, 'ea' AS tag FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) x
      |    UNION ALL
      |    SELECT sk, 'ia' AS tag FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) y) z)
      |SELECT tag, count(*) AS n, count(DISTINCT sk) AS n_sk FROM u
      |GROUP BY tag ORDER BY tag""".stripMargin

  // ---- q19: array & map scalar functions (scalars projected out so both
  // engines' results compare exactly) ----
  def q19_array_map(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "part")) >>
      WithColumnsNode(
        "words" -> "split(p_name, ' ')",
        "brandmap" -> "map('brand', p_brand, 'type', p_type)") >>
      ProjectNode(
        "p_partkey",
        "size(words) as n_words",
        "element_at(sort_array(words), 1) as first_sorted",
        "array_contains(words, 'green') as has_green",
        "size(array_distinct(words)) as n_distinct_words",
        "array_join(slice(sort_array(words), 1, 2), '_') as first2",
        "aggregate(transform(words, w -> length(w)), 0, (a, x) -> a + x) as total_chars",
        "element_at(brandmap, 'brand') as brand_v",
        "size(map_keys(brandmap)) as n_keys") >>
      d.output("result")
  }
  val q19Sql: String =
    """SELECT p_partkey,
      |  len(string_split(p_name, ' ')) AS n_words,
      |  list_sort(string_split(p_name, ' '))[1] AS first_sorted,
      |  list_contains(string_split(p_name, ' '), 'green') AS has_green,
      |  len(list_distinct(string_split(p_name, ' '))) AS n_distinct_words,
      |  array_to_string(list_sort(string_split(p_name, ' '))[1:2], '_') AS first2,
      |  list_sum(list_transform(string_split(p_name, ' '), w -> length(w)))::INT AS total_chars,
      |  p_brand AS brand_v,
      |  2 AS n_keys
      |FROM part""".stripMargin

  // ---- q33: full outer join with null-key handling ----
  def q33_full_outer(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val cust = d.add(SourceNode.table(dir, "customer"))
    val ord = d.add(SourceNode.table(dir, "orders"))
    val bigOrders = ord >> FilterNode("o_totalprice > 300000") >>
      AggNode(Seq("o_custkey"), "count(*) as n_big",
        "cast(sum(cast(o_totalprice as decimal(18,2))) as double) as big_total").named("big")
    val j = d.add(JoinNode.on("l.c_custkey = r.o_custkey", joinType = "full_outer"))
    cust("result") >> j("left"); bigOrders >> j("right")
    j >> ProjectNode("coalesce(c_custkey, o_custkey) as ck",
        "c_mktsegment", "coalesce(n_big, 0) as n_big", "big_total") >>
      d.output("result")
  }
  val q33Sql: String =
    """SELECT coalesce(c_custkey, o_custkey) AS ck, c_mktsegment,
      |  coalesce(n_big, 0) AS n_big, big_total
      |FROM customer FULL OUTER JOIN (
      |  SELECT o_custkey, count(*) AS n_big,
      |         cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS big_total
      |  FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey) b
      |ON c_custkey = o_custkey""".stripMargin

  // ---- q34: cube with exact distinct counts ----
  // Scale note: cube + count(DISTINCT) expands 4 grouping sets x distinct
  // keys before the shuffle (Catalyst Expand) — the correct plan for EXACT
  // answers, which the oracle requires. At 100 TB swap the distinct for
  // approx_count_distinct (q35 pins its 5% contract) or pre-aggregate
  // (group by keys+suppkey, then cube over that) when exactness per
  // grouping set is not required.
  def q34_cube(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "lineitem")) >>
      AggNode.cube(Seq("l_returnflag", "l_linestatus"),
        "count(*) as n",
        "count(distinct l_suppkey) as n_supp",
        "cast(sum(cast(l_quantity as decimal(18,2))) as double) as qty") >>
      d.output("result")
  }
  val q34Sql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  count(DISTINCT l_suppkey) AS n_supp,
      |  cast(sum(cast(l_quantity as decimal(18,2))) as double) AS qty
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  // ---- q35: approx_count_distinct (HLL++ sketch). The raw estimate is
  // engine-specific, but it IS deterministic for given data, so the query
  // emits the exact count plus a within-5%-relative-error flag — an
  // oracle-checkable accuracy CONTRACT for the sketch (default rsd 0.05)
  // instead of a rows-only count. ----
  def q35_approx_distinct(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "lineitem")) >>
      AggNode(Seq("l_returnflag"),
        "approx_count_distinct(l_partkey) as approx_parts",
        "count(distinct l_partkey) as exact_parts") >>
      ProjectNode("l_returnflag", "exact_parts",
        "abs(cast(approx_parts as double) - exact_parts) / exact_parts <= 0.05 as within_5pct") >>
      SortNode("l_returnflag") >>
      d.output("result")
  }
  val q35Sql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts, true AS within_5pct
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- q36: UDAF (typed Aggregator with map-side partial agg) ----
  // Overflow bound: weighted_cents sums price_cents * qty (< 2^33 per row);
  // int64 holds ~2^63, so per-group row counts up to ~2^29 (~5e8) are safe.
  // Past that the oracle-side CAST(HUGEINT AS BIGINT) and Spark's non-ANSI
  // wrap diverge (DuckDB errors, Spark wraps) — at larger scale pre-bucket
  // the group keys or accumulate in decimal.
  def q36_udaf(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "lineitem")) >>
      new RegisterUdafsNode() >>
      WithColumnsNode(
        "price_cents" -> "cast(round(l_extendedprice * 100) as bigint)",
        "qty_l" -> "cast(l_quantity as bigint)") >>
      AggNode(Seq("l_returnflag"), "sum_prod(price_cents, qty_l) as weighted_cents") >>
      SortNode("l_returnflag") >>
      d.output("result")
  }
  val q36Sql: String =
    """SELECT l_returnflag,
      |  cast(sum(cast(round(l_extendedprice * 100) as bigint) * cast(l_quantity as bigint)) as bigint) AS weighted_cents
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- q37: UDTF analogue — explode tokens, aggregate term frequencies ----
  def q37_explode_tokens(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "documents")) >>
      new ExplodeNode("split(lower(trim(text)), '\\\\s+')", Seq("pos", "tok"), Seq("doc_id")) >>
      FilterNode("length(tok) >= 8") >>
      AggNode(Seq("tok"), "count(*) as tf", "count(distinct doc_id) as df") >>
      FilterNode("tf >= 10") >>
      SortNode("tf desc", "tok") >>
      d.output("result")
  }
  val q37Sql: String =
    """SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df FROM (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      |  FROM documents) t
      |WHERE length(tok) >= 8
      |GROUP BY tok HAVING count(*) >= 10 ORDER BY tf DESC, tok""".stripMargin

  // ---- q38: batch session windows (30-min gap per user) vs a
  // gaps-and-islands oracle ----
  def q38_session_window(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val src = d.add(SourceNode.table(dir, "events"))
    src >> FnNode.map1("sessionize") { df =>
      import org.apache.spark.sql.functions._
      df.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_window.start").as("session_start"), col("n_events"))
    } >> AggNode(Seq("user_id"),
        "count(*) as n_sessions",
        "max(n_events) as max_events",
        "min(session_start) as first_start") >>
      SortNode("user_id") >>
      d.output("result")
  }
  val q38Sql: String =
    """WITH marked AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              > INTERVAL 30 MINUTE OR
      |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events),
      |sess AS (
      |  SELECT user_id, ts,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM marked),
      |agg AS (
      |  SELECT user_id, sid, count(*) AS n_events, min(ts) AS session_start
      |  FROM sess GROUP BY user_id, sid)
      |SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_events,
      |  min(session_start) AS first_start
      |FROM agg GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---- q39: Structured Streaming tumbling window — same answer as the
  // batch q16 (complete output mode emits every window) ----
  def q39_stream_tumbling(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val src = d.add(StreamSourceNode.table(dir, "events"))
    src >> new WatermarkNode("ts", "1 hour") >>
      new StreamWindowAggNode("ts", "1 hour", keys = Seq("event_type"),
        aggs = Seq("count(*) as n", "cast(sum(cast(value as decimal(18,2))) as double) as sum_value")) >>
      FnNode.map1("flatten") { df =>
        import org.apache.spark.sql.functions._
        df.select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
      } >>
      new StreamRunNode(s"q39_sink_${System.nanoTime()}", outputMode = "complete") >>
      d.output("result")
  }
  val q39Sql: String = Relational.q16Sql

  // ---- q40: streaming session windows per user (complete mode), reduced to
  // the same shape as the q38 oracle ----
  def q40_stream_session(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val src = d.add(StreamSourceNode.table(dir, "events"))
    src >> new WatermarkNode("ts", "1 hour") >>
      new StreamWindowAggNode("ts", "30 minutes", gap = Some("30 minutes"),
        keys = Seq("user_id"), aggs = Seq("count(*) as n_events")) >>
      FnNode.map1("flatten") { df =>
        import org.apache.spark.sql.functions._
        df.select(col("user_id"), col("session_window.start").as("session_start"), col("n_events"))
      } >>
      new StreamRunNode(s"q40_sink_${System.nanoTime()}", outputMode = "complete") >>
      AggNode(Seq("user_id"),
        "count(*) as n_sessions",
        "max(n_events) as max_events",
        "min(session_start) as first_start") >>
      SortNode("user_id") >>
      d.output("result")
  }
  val q40Sql: String = q38Sql

  // ---- q41: stateful streaming (mapGroupsWithState running count per user;
  // update mode emits the final count for a bounded source) ----
  def q41_stream_stateful(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val src = d.add(StreamSourceNode.table(dir, "events"))
    src >> new StreamStatefulCountNode("user_id") >>
      new StreamRunNode(s"q41_sink_${System.nanoTime()}", outputMode = "update") >>
      // update mode re-emits a key on every batch; keep the final (max) count
      AggNode(Seq("user_id"), "max(cnt) as cnt") >>
      SortNode("user_id") >>
      d.output("result")
  }
  val q41Sql: String =
    "SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id ORDER BY user_id"

  // ---- q42: sliding windows (1h window, 30m slide — every event lands in
  // two windows; oracle enumerates both buckets per event) ----
  def q42_stream_sliding(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val src = d.add(StreamSourceNode.table(dir, "events"))
    src >> new WatermarkNode("ts", "1 hour") >>
      new StreamWindowAggNode("ts", "1 hour", slide = Some("30 minutes"),
        keys = Seq("event_type"), aggs = Seq("count(*) as n")) >>
      FnNode.map1("flatten") { df =>
        import org.apache.spark.sql.functions._
        df.select(col("window.start").as("ws"), col("event_type"), col("n"))
      } >>
      new StreamRunNode(s"q42_sink_${System.nanoTime()}", outputMode = "complete") >>
      d.output("result")
  }
  val q42Sql: String =
    """SELECT ws, event_type, count(*) AS n FROM (
      |  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
      |                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws,
      |         event_type
      |  FROM events) t
      |GROUP BY ws, event_type""".stripMargin

  // ---- q43: estimator fit/transform + weight sharing through the DAG ----
  // An ml.Pipeline (RegexTokenizer -> CountVectorizer -> IDF) is FIT on the
  // English subset only, then the fitted model is re-applied to ALL
  // documents at a second site via TransformNode (the reference's
  // weight-sharing flagship, mldagbase.py:1120-1188). Output is the per-doc
  // tf-idf nonzero count — with a vocabulary-based vectorizer this is an
  // ENGINE-INDEPENDENT derived stat (VERDICT r5 #1): nnz(tfidf) = number of
  // the doc's distinct tokens that appear in the fitted English vocabulary
  // with document frequency < n_english_docs (idf = log((m+1)/(df+1)) is 0
  // exactly iff df = m), which DuckDB recomputes from the data alone.
  // (HashingTF's bucket-collision nnz is murmur3-internal — not oracleable.)
  def q43_tfidf_fit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.feature.{CountVectorizer, IDF, RegexTokenizer}
    val d = new Dag("tfidf")
    val src = d.add(SourceNode.table(dir, "documents"))
    val en = src >> FilterNode("lang = 'en'")
    val pipe = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol("text").setOutputCol("toks").setPattern("\\s+"),
      // vocabSize far above the corpus' distinct-token count: a binding cap
      // would pick top-by-frequency with engine-internal tie-breaks
      new CountVectorizer().setInputCol("toks").setOutputCol("tf")
        .setVocabSize(1 << 20),
      new IDF().setInputCol("tf").setOutputCol("tfidf")))
    val fitNode = d.add(new SparkMlNode(pipe, "tfidf_model"))
    en >> fitNode
    val reuse = d.add(new TransformNode("tfidf_model").named("tfidf_all"))
    src("result") >> reuse("df")
    reuse("result") >>
      FnNode.map1("stats") { df =>
        import org.apache.spark.ml.functions.vector_to_array
        import org.apache.spark.sql.functions._
        df.withColumn("arr", vector_to_array(col("tfidf")))
          .select(col("doc_id"), expr("size(filter(arr, v -> v != 0.0D))").as("nnz"))
          .orderBy("doc_id")
      } >>
      d.output("result")
    val ctx = Ctx(spark)
    d.fit(ctx)
    d.transform(ctx).outputs("result")
  }
  // RegexTokenizer(\s+, gaps, toLowercase, minTokenLength=1) == lowercased
  // whitespace split with empties dropped; nnz = |distinct doc tokens ∩
  // {english terms with 1 <= df < m}|.
  val q43Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |en AS (SELECT list_distinct(t) AS dt FROM toks WHERE lang = 'en'),
      |m AS (SELECT count(*) AS n FROM en),
      |df AS (SELECT term, count(*) AS c
      |       FROM (SELECT unnest(dt) AS term FROM en) u GROUP BY term),
      |vocab AS (SELECT term FROM df, m WHERE c < m.n),
      |hits AS (
      |  SELECT d.doc_id, count(*) AS nnz
      |  FROM (SELECT doc_id, unnest(list_distinct(t)) AS term FROM toks) d
      |  JOIN vocab USING (term) GROUP BY d.doc_id)
      |SELECT t.doc_id, coalesce(h.nnz, 0) AS nnz
      |FROM toks t LEFT JOIN hits h ON t.doc_id = h.doc_id
      |ORDER BY t.doc_id""".stripMargin

  // ---- q44: end-to-end dedup with survivor selection (docs minus the
  // higher-id side of every near-dup pair). At threshold 0.8 with 16 bands
  // the LSH S-curve is saturated (miss < 5e-8 per pair — the q57-verified
  // regime), so the minhash pair set deterministically equals the exact
  // string-shingle Jaccard pair set and the whole pipeline oracles: DuckDB
  // recomputes collapse -> exact pairs -> survivor anti-join. ----
  def q44_dedup_survivors(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val src = d.add(SourceNode.table(dir, "documents"))
    val pairs = src >> new MinHashDedupNode(
      numHashes = 32, bands = 16, shingleN = 3, jaccardThreshold = 0.8)
    val surv = d.add(new DedupSurvivorsNode())
    src("result") >> surv("docs"); pairs >> surv("pairs")
    surv >> ProjectNode("doc_id", "lang") >> SortNode("doc_id") >> d.output("result")
  }
  val q44Sql: String =
    """WITH c AS (
      |  SELECT doc_id, text FROM (
      |    SELECT doc_id, text, row_number() OVER (
      |      PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
      |      ORDER BY doc_id) AS rn
      |    FROM documents) t WHERE rn = 1),
      |s AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
      |      i -> array_to_string(toks[i:i+2], ' '))) AS sh
      |  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM c) t),
      |losers AS (
      |  SELECT DISTINCT b.doc_id FROM s a JOIN s b ON a.doc_id < b.doc_id
      |  WHERE cast(len(list_distinct(list_intersect(a.sh, b.sh))) as double)
      |        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8)
      |SELECT doc_id, lang FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM losers)
      |ORDER BY doc_id""".stripMargin

  // ---- q55: stream-static join — a streaming fact joined to a static
  // dimension (no state needed for the static side), aggregated and checked
  // against the batch oracle ----
  def q55_stream_static_join(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val ev = d.add(StreamSourceNode.table(dir, "events"))
    val cust = d.add(SourceNode.table(dir, "customer"))
    val j = d.add(JoinNode.on("l.user_id = r.c_custkey", broadcastRight = true))
    ev >> j("left"); cust >> j("right")
    j >> new StreamWindowAggNode("ts", "6 hours", keys = Seq("c_mktsegment"),
        aggs = Seq("count(*) as n", "cast(sum(cast(value as decimal(18,2))) as double) as sum_v")) >>
      FnNode.map1("flatten") { df =>
        import org.apache.spark.sql.functions._
        df.select(col("window.start").as("ws"), col("c_mktsegment"), col("n"), col("sum_v"))
      } >>
      new StreamRunNode(s"q55_sink_${System.nanoTime()}", outputMode = "complete") >>
      d.output("result")
  }
  val q55Sql: String =
    """SELECT time_bucket(INTERVAL '6 hours', ts) AS ws, c_mktsegment,
      |  count(*) AS n, cast(sum(cast(value as decimal(18,2))) as double) AS sum_v
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1, 2""".stripMargin

  // ---- q63: stream-STREAM join (two watermarked streams, event-time range
  // condition bounding the join state) — composed entirely from existing
  // nodes: the same JoinNode works on streaming frames; watermarks + the
  // time-range predicate let Spark expire buffered state on both sides.
  // Append-mode join output is batch-aggregated after the sink. ----
  def q63_stream_stream_join(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val a = d.add(StreamSourceNode.table(dir, "events").named("ev_a"))
    val b = d.add(StreamSourceNode.table(dir, "events").named("ev_b"))
    val wa = a >> new WatermarkNode("ts", "1 hour").named("wm_a") >>
      FnNode.map1("pick_a") { df => df.selectExpr("user_id as ua", "ts as ts_a", "event_id as eid_a") }
    val wb = b >> new WatermarkNode("ts", "1 hour").named("wm_b") >>
      FnNode.map1("pick_b") { df => df.selectExpr("user_id as ub", "ts as ts_b", "event_id as eid_b") }
    val j = d.add(JoinNode.on(
      "l.ua = r.ub and r.ts_b > l.ts_a and r.ts_b <= l.ts_a + interval 30 minutes"))
    wa >> j("left"); wb >> j("right")
    j >> new StreamRunNode(s"q63_sink_${System.nanoTime()}", outputMode = "append") >>
      AggNode(Seq("ua"), "count(*) as n_pairs") >>
      SortNode("ua") >>
      d.output("result")
  }
  val q63Sql: String =
    """SELECT a.user_id AS ua, count(*) AS n_pairs
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
      |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin

  // ---- q64: streaming deduplication — dropDuplicates over a watermarked
  // stream (the streaming arm of the dedup family); the deduped row set is
  // emission-order-nondeterministic, so the query pins the DETERMINISTIC
  // invariant: the distinct-key count equals the batch answer. ----
  def q64_stream_dedup(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val src = d.add(StreamSourceNode.table(dir, "events"))
    src >> new WatermarkNode("ts", "1 hour") >>
      FnNode.map1("keys") { df => df.selectExpr("user_id", "event_type", "ts") } >>
      new DistinctNode(Seq("user_id", "event_type")) >>
      new StreamRunNode(s"q64_sink_${System.nanoTime()}", outputMode = "append") >>
      AggNode(Seq("event_type"), "count(*) as n_users") >>
      SortNode("event_type") >>
      d.output("result")
  }
  val q64Sql: String =
    """SELECT event_type, count(*) AS n_users FROM (
      |  SELECT DISTINCT user_id, event_type FROM events) t
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- q69: exactly-once checkpointed file sink across a restart — the
  // production streaming surface (StreamSinkNode). The events table is staged
  // into an input directory in two deterministic halves; the SAME
  // checkpointed pipeline runs twice (simulating a kill + restart between
  // file arrivals). The checkpoint must make phase 2 process ONLY the new
  // file — any reprocessing doubles counts and breaks the hash-exact match
  // with the batch oracle over the full table. ----
  def q69_stream_restart(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, StandardCopyOption}
    import org.apache.spark.sql.functions.expr
    val work = Files.createTempDirectory("graft_q69_")
    work.toFile.deleteOnExit()
    val inDir = Files.createDirectory(work.resolve("in"))
    val outDir = work.resolve("out").toString
    val ckpt = work.resolve("ckpt").toString
    // stage events with ts normalized to TimestampType (encoding-adaptive:
    // nanos-long or NTZ vintages both land as micros timestamps) so the
    // stream source needs no special-casing on re-read
    val evDf = TsNorm.normalize(
      SessionIsolation
        .cloneWith(spark, "spark.sql.legacy.parquet.nanosAsLong" -> "true")
        .read.parquet(s"$dir/events.parquet"),
      "ts")
    val halfHash = DetHash.modExpr("event_id", 2)
    def stage(phase: Int): Unit = {
      val tmp = work.resolve(s"stage_$phase")
      evDf.filter(s"$halfHash = ${phase - 1}").coalesce(1).write.parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().orElseThrow()
      Files.move(part, inDir.resolve(s"phase$phase.parquet"), StandardCopyOption.ATOMIC_MOVE)
    }
    def runPipeline(): DataFrame = {
      val d = new Dag("q69")
      d.add(new StreamSourceNode(inDir.toString, "parquet", statePartitions = None)) >>
        ProjectNode("event_id", "user_id", "event_type", "value") >>
        new StreamSinkNode(outDir, ckpt) >>
        d.output("result")
      d.transform(Ctx(spark)).outputs("result")
    }
    stage(1)
    runPipeline() // phase 1: commits half the events
    stage(2)
    val committed = runPipeline() // restart: checkpoint skips phase-1 input
    committed.groupBy("event_type")
      .agg(expr("count(*) as n"),
        expr("count(distinct event_id) as n_events"),
        expr("cast(sum(cast(value as decimal(18,2))) as double) as sum_v"))
      .orderBy("event_type")
  }
  val q69Sql: String =
    """SELECT event_type, count(*) AS n, count(DISTINCT event_id) AS n_events,
      |  cast(sum(cast(value as decimal(18,2))) as double) AS sum_v
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("q18_setops_all", q18_setops_all _, q18Sql),
    ("q19_array_map", q19_array_map _, q19Sql),
    ("q33_full_outer", q33_full_outer _, q33Sql),
    ("q34_cube", q34_cube _, q34Sql),
    ("q35_approx_distinct", q35_approx_distinct _, q35Sql),
    ("q36_udaf", q36_udaf _, q36Sql),
    ("q37_explode_tokens", q37_explode_tokens _, q37Sql),
    ("q38_session_window", q38_session_window _, q38Sql),
    ("q39_stream_tumbling", q39_stream_tumbling _, q39Sql),
    ("q40_stream_session", q40_stream_session _, q40Sql),
    ("q41_stream_stateful", q41_stream_stateful _, q41Sql),
    ("q42_stream_sliding", q42_stream_sliding _, q42Sql),
    ("q43_tfidf_fit", q43_tfidf_fit _, q43Sql),
    ("q44_dedup_survivors", q44_dedup_survivors _, q44Sql),
    ("q55_stream_static_join", q55_stream_static_join _, q55Sql),
    ("q63_stream_stream_join", q63_stream_stream_join _, q63Sql),
    ("q64_stream_dedup", q64_stream_dedup _, q64Sql),
    ("q69_stream_restart", q69_stream_restart _, q69Sql),
  )
}

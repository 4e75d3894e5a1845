package graft.queries

import graft.dag._
import graft.nodes._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Relational operator corpus (SURVEY.md §2.2): each query exercises one
  * operator family through the DAG API and carries a DuckDB oracle with
  * IDENTICAL column aliases (driver sorts columns by name before hashing).
  * Float discipline: sums/avgs go through decimal casts BEFORE aggregation so
  * Spark and DuckDB agree bit-for-bit regardless of summation order.
  */
object Relational {
  import Queries.run

  // ---- q2: star-schema join chain, dims broadcast (TPC-H Q5 shape) ----
  def q2_join_star(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val li = d.add(SourceNode.table(dir, "lineitem"))
    val ord = d.add(SourceNode.table(dir, "orders"))
    val cust = d.add(SourceNode.table(dir, "customer"))
    val nat = d.add(SourceNode.table(dir, "nation"))
    val reg = d.add(SourceNode.table(dir, "region"))

    val j1 = d.add(JoinNode.on("l.l_orderkey = r.o_orderkey").named("li_ord"))
    li >> j1("left"); ord >> j1("right")
    val j2 = d.add(JoinNode.on("l.o_custkey = r.c_custkey", broadcastRight = true).named("j_cust"))
    j1 >> j2("left"); cust >> j2("right")
    val j3 = d.add(JoinNode.on("l.c_nationkey = r.n_nationkey", broadcastRight = true).named("j_nat"))
    j2 >> j3("left"); nat >> j3("right")
    val j4 = d.add(JoinNode.on("l.n_regionkey = r.r_regionkey", broadcastRight = true).named("j_reg"))
    j3 >> j4("left"); reg >> j4("right")

    j4 >> FilterNode("r_name = 'ASIA' and o_orderdate >= date'1996-01-01' and o_orderdate < date'1998-01-01'") >>
      new AggNode(Seq("n_name"), Seq(
        "cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,4))) as double) as revenue",
        "count(*) as n_items")) >>
      SortNode("revenue desc", "n_name") >>
      d.output("result")
  }
  val q2Sql: String =
    """SELECT n_name,
      |  cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,4))) as double) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA' AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
      |GROUP BY n_name""".stripMargin

  // ---- q3: top-k (TakeOrderedAndProject — no global sort) ----
  def q3_topk(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val ord = d.add(SourceNode.table(dir, "orders"))
    val cust = d.add(SourceNode.table(dir, "customer"))
    val j = d.add(JoinNode.on("l.o_custkey = r.c_custkey", broadcastRight = true))
    ord >> j("left"); cust >> j("right")
    j >> ProjectNode("o_orderkey", "c_name", "o_totalprice") >>
      TopKNode(10, "o_totalprice desc", "o_orderkey asc") >>
      d.output("result")
  }
  val q3Sql: String =
    """SELECT o_orderkey, c_name, o_totalprice
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  // ---- q4: left semi join ----
  def q4_semi_join(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val ord = d.add(SourceNode.table(dir, "orders"))
    val li = d.add(SourceNode.table(dir, "lineitem"))
    val hot = li >> FilterNode("l_quantity > 45")
    val j = d.add(JoinNode.on("l.o_orderkey = r.l_orderkey", joinType = "left_semi"))
    ord >> j("left"); hot >> j("right")
    j >> ProjectNode("o_orderkey", "o_totalprice", "o_orderpriority") >> d.output("result")
  }
  val q4Sql: String =
    """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)""".stripMargin

  // ---- q5: left anti join ----
  def q5_anti_join(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val cust = d.add(SourceNode.table(dir, "customer"))
    val ord = d.add(SourceNode.table(dir, "orders"))
    val j = d.add(JoinNode.on("l.c_custkey = r.o_custkey", joinType = "left_anti"))
    cust >> j("left"); ord >> j("right")
    j >> ProjectNode("c_custkey", "c_name", "c_mktsegment") >> d.output("result")
  }
  val q5Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""".stripMargin

  // ---- q6: ranking window (top 3 orders per customer) ----
  def q6_window_rank(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "orders")) >>
      WindowNode(Seq("o_custkey"), Seq("o_totalprice desc", "o_orderkey asc"),
        "rn" -> "row_number()") >>
      FilterNode("rn <= 3") >>
      ProjectNode("o_custkey", "o_orderkey", "o_totalprice", "rn") >>
      d.output("result")
  }
  val q6Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders) t WHERE rn <= 3""".stripMargin

  // ---- q7: analytic window (lag + explicit-ROWS running sum) ----
  def q7_window_analytic(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "orders")) >>
      new WindowNode(Seq("o_custkey"), Seq("o_orderdate asc", "o_orderkey asc"), Seq(
        "prev_price" -> "lag(o_totalprice, 1)",
        "run_spend" -> "sum(cast(o_totalprice as decimal(18,2)))"),
        frame = Some((Long.MinValue, 0L))) >>
      WithColumnsNode("run_spend" -> "cast(run_spend as double)") >>
      ProjectNode("o_custkey", "o_orderkey", "prev_price", "run_spend") >>
      d.output("result")
  }
  val q7Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  lag(o_totalprice, 1) OVER w AS prev_price,
      |  cast(sum(cast(o_totalprice as decimal(18,2))) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS run_spend
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin

  // ---- q8: rollup with grouping-null flags ----
  def q8_rollup(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "lineitem")) >>
      AggNode.rollup(Seq("l_returnflag", "l_linestatus"),
        "cast(sum(cast(l_quantity as decimal(18,2))) as double) as sum_qty",
        "count(*) as n") >>
      d.output("result")
  }
  val q8Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty, count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  // ---- q9: distinct aggregates ----
  def q9_distinct_agg(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "lineitem")) >>
      AggNode(Seq("l_returnflag"),
        "count(distinct l_partkey) as n_parts",
        "count(distinct l_suppkey) as n_supps",
        "count(*) as n_rows") >>
      d.output("result")
  }
  val q9Sql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // ---- q10: set ops (intersect + except, tagged, unioned) ----
  def q10_setops(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val ord = d.add(SourceNode.table(dir, "orders"))
    val cust = d.add(SourceNode.table(dir, "customer"))
    val big = ord >> FilterNode("o_totalprice > 100000") >> ProjectNode("o_custkey as ck").named("big")
    val rich = cust >> FilterNode("c_acctbal > 5000") >> ProjectNode("c_custkey as ck").named("rich")
    val inter = d.add(new SetOpNode("intersect").named("inter"))
    big >> inter("left"); rich >> inter("right")
    val exc = d.add(new SetOpNode("except").named("exc"))
    big("result") >> exc("left"); rich("result") >> exc("right")
    val ti = inter >> ProjectNode("ck", "'both' as tag").named("tag_i")
    val te = exc >> ProjectNode("ck", "'big_only' as tag").named("tag_e")
    val u = d.add(new UnionNode())
    ti >> u("dfs"); te >> u("dfs")
    u >> d.output("result")
  }
  val q10Sql: String =
    """SELECT ck, 'both' AS tag FROM
      |  (SELECT o_custkey AS ck FROM orders WHERE o_totalprice > 100000
      |   INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 5000) a
      |UNION ALL
      |SELECT ck, 'big_only' AS tag FROM
      |  (SELECT o_custkey AS ck FROM orders WHERE o_totalprice > 100000
      |   EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal > 5000) b""".stripMargin

  // ---- q11: string scalar functions ----
  def q11_string_funcs(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "part")) >>
      ProjectNode(
        "p_partkey",
        "upper(substring(p_name, 1, 6)) as name6",
        "length(p_name) as name_len",
        "regexp_extract(p_type, '^([A-Z]+)', 1) as type_head",
        "replace(p_brand, 'Brand#', 'B') as brand_s",
        "concat_ws('|', p_brand, p_type) as brand_type",
        "lpad(cast(p_size as string), 4, '0') as size4",
        "reverse(p_name) as name_rev",
        "split_part(p_name, ' ', 1) as first_word") >>
      d.output("result")
  }
  val q11Sql: String =
    """SELECT p_partkey,
      |  upper(substring(p_name, 1, 6)) AS name6,
      |  length(p_name) AS name_len,
      |  regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
      |  replace(p_brand, 'Brand#', 'B') AS brand_s,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  lpad(cast(p_size as varchar), 4, '0') AS size4,
      |  reverse(p_name) AS name_rev,
      |  split_part(p_name, ' ', 1) AS first_word
      |FROM part""".stripMargin

  // ---- q12: date/math scalar functions + monthly aggregate ----
  def q12_date_math(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "orders")) >>
      WithColumnsNode(
        "o_year" -> "year(o_orderdate)",
        "o_month" -> "month(o_orderdate)",
        // decimal*decimal is exact → no per-row rounding-mode divergence
        // between Spark (HALF_UP) and DuckDB (HALF_EVEN) on the double cast
        "price2" -> "cast(cast(o_totalprice as decimal(18,2)) * cast(o_totalprice as decimal(18,2)) as decimal(28,4))") >>
      AggNode(Seq("o_year", "o_month"),
        "count(*) as n_orders",
        "cast(sum(cast(o_totalprice as decimal(18,2))) as double) as sum_price",
        // sum_price2 is INTENTIONALLY a string: the squared-price sum's
        // unscaled value exceeds 2^53, so a double cast is no longer a
        // single correct rounding and the engines could diverge; the
        // stringified decimal is the only bit-exact cross-engine form.
        // Numeric consumers should aggregate price2 upstream instead.
        "cast(sum(price2) as string) as sum_price2",
        "min(cast(o_orderdate as date)) as first_day") >>
      SortNode("o_year", "o_month") >>
      d.output("result")
  }
  val q12Sql: String =
    """SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
      |  count(*) AS n_orders,
      |  cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS sum_price,
      |  cast(cast(sum(cast(cast(o_totalprice as decimal(18,2)) * cast(o_totalprice as decimal(18,2)) as decimal(28,4))) as decimal(38,4)) as varchar) AS sum_price2,
      |  min(cast(o_orderdate as date)) AS first_day
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- q13: JSON extraction over events.props ----
  def q13_json(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "events")) >>
      WithColumnsNode("k" -> "cast(get_json_object(props, '$.k') as bigint)") >>
      AggNode(Seq("event_type"),
        "count(*) as n",
        "sum(k) as sum_k",
        "min(k) as min_k",
        "max(k) as max_k") >>
      SortNode("event_type") >>
      d.output("result")
  }
  val q13Sql: String =
    """SELECT event_type, count(*) AS n,
      |  cast(sum(cast(json_extract_string(props, '$.k') as bigint)) as bigint) AS sum_k,
      |  min(cast(json_extract_string(props, '$.k') as bigint)) AS min_k,
      |  max(cast(json_extract_string(props, '$.k') as bigint)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- q14: range (interval) join: lineitems shipped within 30 days of order ----
  def q14_range_join(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val ord = d.add(SourceNode.table(dir, "orders"))
    val li = d.add(SourceNode.table(dir, "lineitem"))
    val j = d.add(JoinNode.on(
      "l.o_orderkey = r.l_orderkey and r.l_shipdate >= l.o_orderdate and r.l_shipdate <= l.o_orderdate + interval 30 days"))
    ord >> j("left"); li >> j("right")
    j >> AggNode(Seq("o_orderpriority"),
        "count(*) as n_fast_items",
        "cast(sum(cast(l_quantity as decimal(18,2))) as double) as qty") >>
      SortNode("o_orderpriority") >>
      d.output("result")
  }
  val q14Sql: String =
    """SELECT o_orderpriority, count(*) AS n_fast_items,
      |  cast(sum(cast(l_quantity as decimal(18,2))) as double) AS qty
      |FROM orders JOIN lineitem
      |  ON o_orderkey = l_orderkey
      | AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---- q15: as-of join (latest order per user at event time) ----
  def q15_asof_join(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val ev = d.add(SourceNode.table(dir, "events"))
    val ord = d.add(SourceNode.table(dir, "orders"))
    val asof = d.add(new AsofJoinNode(
      leftKeys = Seq("user_id"), rightKeys = Seq("o_custkey"),
      leftTime = "ts", rightTime = "o_orderdate",
      leftIdCols = Seq("event_id"), rightTieBreak = "o_orderkey"))
    ev >> asof("left"); ord >> asof("right")
    asof >> ProjectNode("event_id", "user_id", "o_orderkey as last_orderkey", "o_totalprice as last_price") >>
      d.output("result")
  }
  val q15Sql: String =
    """SELECT event_id, user_id, o_orderkey AS last_orderkey, o_totalprice AS last_price FROM (
      |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
      |    row_number() OVER (PARTITION BY e.event_id
      |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e JOIN orders o
      |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts) t
      |WHERE rn = 1""".stripMargin

  // ---- q16: tumbling time window over events (batch analogue of streaming) ----
  def q16_tumbling_window(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "events")) >>
      FnNode.map1("tumble") { df =>
        import org.apache.spark.sql.functions._
        df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            expr("cast(sum(cast(value as decimal(18,2))) as double)").as("sum_value"))
          .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
      } >>
      d.output("result")
  }
  val q16Sql: String =
    """SELECT date_trunc('hour', ts) AS ws, event_type, count(*) AS n,
      |  cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  // ---- q17: SqlNode (GROUPING SETS through raw SQL) ----
  def q17_grouping_sets(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val src = d.add(SourceNode.table(dir, "orders"))
    val sql = d.add(SqlNode(
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n, cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS total
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
      "orders_v"))
    src >> sql("orders_v")
    sql >> d.output("result")
  }
  val q17Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  count(*) AS n, cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS total
      |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin

  // ---- q58: sink round-trip — write partitioned parquet through SinkNode,
  // read it back through a scan, aggregate with partition pruning. The sink
  // write happens eagerly inside SinkNode.transform, and the readback node
  // consumes the sink's passthrough port, so topo order guarantees
  // write-before-read (the one place order-only dependencies matter under
  // lazy evaluation — SURVEY.md §1.2). Oracle = the same rows straight from
  // the source table, so the driver verifies the write+read cycle preserves
  // data and partition-column values exactly.
  def q58_sink_roundtrip(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val sinkPath = s"${sys.props("java.io.tmpdir")}/graft_q58_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
    val src = d.add(SourceNode.table(dir, "orders"))
    val sink = d.add(new SinkNode(sinkPath, partitionBy = Seq("o_orderpriority")))
    // write-sizing: coalesce bounds files-per-partition before the write
    src >> FilterNode("o_totalprice > 200000") >>
      new RepartitionNode(4, coalesce = true) >> sink("df")
    val readback = d.add(new FnNode(Seq(Port("df")), Seq(Port("result")),
      (ctx, _) => Map("result" -> ctx.spark.read.parquet(sinkPath)), "readback"))
    sink >> readback("df") // order-only dependency: read after write
    readback >>
      FilterNode("o_orderpriority in ('1-URGENT', '2-HIGH')") >> // partition pruning
      AggNode(Seq("o_orderpriority"),
        "count(*) as n",
        "cast(sum(cast(o_totalprice as decimal(18,2))) as double) as total") >>
      SortNode("o_orderpriority") >>
      d.output("result")
  }
  val q58Sql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS total
      |FROM orders
      |WHERE o_totalprice > 200000 AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---- q71: bucketed-table sink + co-located join — both sides written
  // through BucketedSinkNode on their join key with equal bucket counts, so
  // the downstream equi-join reads co-located buckets and needs NO Exchange
  // on either side (property pinned in PlanSpec through the same node; the
  // driver gate here verifies the write -> catalog -> read -> join cycle
  // preserves values exactly). The bucketed layout amortizes across every
  // later join/agg on the key — the cross-job RepartitionNode. ----
  def q71_bucketed_join(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
    val li = d.add(SourceNode.table(dir, "lineitem", "l_orderkey", "l_extendedprice"))
    val ord = d.add(SourceNode.table(dir, "orders", "o_orderkey", "o_orderpriority"))
    val bl = li >> new BucketedSinkNode(s"graft_q71_li_$sfx", Seq("l_orderkey"), 8,
      sortCols = Seq("l_orderkey")).named("bucket_li")
    val bo = ord("result") >> new BucketedSinkNode(s"graft_q71_ord_$sfx", Seq("o_orderkey"), 8,
      sortCols = Seq("o_orderkey")).named("bucket_ord")
    val j = d.add(JoinNode.on("l.l_orderkey = r.o_orderkey"))
    bl >> j("left"); bo >> j("right")
    j >> AggNode(Seq("o_orderpriority"), "count(*) as n",
        "cast(sum(cast(l_extendedprice as decimal(18,2))) as double) as sum_price") >>
      SortNode("o_orderpriority") >> d.output("result")
  }
  val q71Sql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---- q59: keyed variadic fan-in (**kwargs analogue) — two source nodes
  // merge through TaggedUnionNode, each row tagged with its upstream node's
  // name; the tag keys come from the DAG wiring, not the data ----
  def q59_tagged_union(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val ord = d.add(SourceNode.table(dir, "orders"))
    val big = ord >> FilterNode("o_totalprice > 300000") >>
      ProjectNode("o_orderkey", "o_totalprice").named("big_spend")
    val urgent = ord("result") >> FilterNode("o_orderpriority = '1-URGENT'").named("f_urgent") >>
      ProjectNode("o_orderkey", "o_totalprice").named("urgent")
    val u = d.add(new TaggedUnionNode())
    big >> u("dfs"); urgent >> u("dfs")
    u >> AggNode(Seq("source"),
        "count(*) as n",
        "cast(sum(cast(o_totalprice as decimal(18,2))) as double) as total") >>
      SortNode("source") >>
      d.output("result")
  }
  val q59Sql: String =
    """SELECT source, count(*) AS n,
      |  cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS total
      |FROM (
      |  SELECT 'big_spend' AS source, o_totalprice FROM orders WHERE o_totalprice > 300000
      |  UNION ALL
      |  SELECT 'urgent' AS source, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT')
      |GROUP BY source ORDER BY source""".stripMargin

  // ---- q65: multi-format source/sink round-trip — the same rows written as
  // CSV (header) and JSON, read back through SourceNode's text-format path
  // (explicit DDL schema + options), merged via TaggedUnionNode and
  // aggregated. Doubles round-trip text formats exactly (shortest-repr
  // printing + exact parse), and the decimal cast happens after readback so
  // both format arms and the oracle share the same arithmetic. ----
  def q65_format_roundtrip(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_q65_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
    val ddl = "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE"
    val src = d.add(SourceNode.table(dir, "orders"))
    val slim = src >> FilterNode("o_totalprice > 250000") >>
      ProjectNode("o_orderkey", "o_orderstatus", "o_totalprice").named("slim")
    val csvSink = d.add(new SinkNode(s"$tmp/csv", "csv", options = Map("header" -> "true")).named("csv_sink"))
    val jsonSink = d.add(new SinkNode(s"$tmp/json", "json").named("json_sink"))
    slim >> csvSink("df"); slim("result") >> jsonSink("df")
    // order-only dependency through the sinks' passthrough ports
    val csvBack = d.add(new FnNode(Seq(Port("df")), Seq(Port("result")),
      (ctx, _) => Map("result" -> ctx.spark.read.schema(ddl)
        .option("header", "true").csv(s"$tmp/csv")), "csv_rb"))
    val jsonBack = d.add(new FnNode(Seq(Port("df")), Seq(Port("result")),
      (ctx, _) => Map("result" -> ctx.spark.read.schema(ddl).json(s"$tmp/json")), "json_rb"))
    csvSink >> csvBack("df"); jsonSink >> jsonBack("df")
    val u = d.add(new TaggedUnionNode())
    csvBack >> u("dfs"); jsonBack >> u("dfs")
    u >> AggNode(Seq("source", "o_orderstatus"),
        "count(*) as n",
        "cast(sum(cast(o_totalprice as decimal(18,2))) as double) as total") >>
      SortNode("source", "o_orderstatus") >>
      d.output("result")
  }
  val q65Sql: String =
    """SELECT source, o_orderstatus, count(*) AS n,
      |  cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS total
      |FROM (
      |  SELECT 'csv_rb' AS source, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 250000
      |  UNION ALL
      |  SELECT 'json_rb' AS source, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 250000)
      |GROUP BY source, o_orderstatus ORDER BY source, o_orderstatus""".stripMargin

  // ---- q67: RANGE window frame — event-time interval frames (30-day
  // trailing spend per customer), the frame kind ROWS cannot express; SUM
  // over RANGE includes order-key peers symmetrically, so ties are
  // deterministic ----
  def q67_range_window(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val src = d.add(SourceNode.table(dir, "orders"))
    val sql = d.add(SqlNode(
      """SELECT o_custkey, o_orderkey,
        |  cast(sum(cast(o_totalprice as decimal(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) as double) AS spend30
        |FROM orders_v""".stripMargin,
      "orders_v"))
    src >> sql("orders_v")
    sql >> SortNode("o_custkey", "o_orderkey") >> d.output("result")
  }
  val q67Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  cast(sum(cast(o_totalprice as decimal(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate
      |    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) as double) AS spend30
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---- q66: salted skew join — the explicit skew-mitigation path (hot fact
  // keys spread over `buckets` tasks); salting must be semantically
  // invisible, which the plain-join oracle pins ----
  def q66_salted_join(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val li = d.add(SourceNode.table(dir, "lineitem"))
    val supp = d.add(SourceNode.table(dir, "supplier"))
    val j = d.add(new SaltedJoinNode(Seq("l_suppkey"), Seq("s_suppkey"), buckets = 8))
    li >> j("left"); supp >> j("right")
    j >> AggNode(Seq("s_nationkey"),
        "count(*) as n",
        "cast(sum(cast(l_quantity as decimal(18,2))) as double) as qty") >>
      SortNode("s_nationkey") >>
      d.output("result")
  }
  val q66Sql: String =
    """SELECT s_nationkey, count(*) AS n,
      |  cast(sum(cast(l_quantity as decimal(18,2))) as double) AS qty
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("q2_join_star", q2_join_star _, q2Sql),
    ("q3_topk", q3_topk _, q3Sql),
    ("q4_semi_join", q4_semi_join _, q4Sql),
    ("q5_anti_join", q5_anti_join _, q5Sql),
    ("q6_window_rank", q6_window_rank _, q6Sql),
    ("q7_window_analytic", q7_window_analytic _, q7Sql),
    ("q8_rollup", q8_rollup _, q8Sql),
    ("q9_distinct_agg", q9_distinct_agg _, q9Sql),
    ("q10_setops", q10_setops _, q10Sql),
    ("q11_string_funcs", q11_string_funcs _, q11Sql),
    ("q12_date_math", q12_date_math _, q12Sql),
    ("q13_json", q13_json _, q13Sql),
    ("q14_range_join", q14_range_join _, q14Sql),
    ("q15_asof_join", q15_asof_join _, q15Sql),
    ("q16_tumbling_window", q16_tumbling_window _, q16Sql),
    ("q17_grouping_sets", q17_grouping_sets _, q17Sql),
    ("q58_sink_roundtrip", q58_sink_roundtrip _, q58Sql),
    ("q71_bucketed_join", q71_bucketed_join _, q71Sql),
    ("q59_tagged_union", q59_tagged_union _, q59Sql),
    ("q65_format_roundtrip", q65_format_roundtrip _, q65Sql),
    ("q66_salted_join", q66_salted_join _, q66Sql),
    ("q67_range_window", q67_range_window _, q67Sql),
  )
}

package graft.queries

import graft.dag._
import graft.nodes._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Third breadth wave: pivot/unpivot, percentiles, time-series resample with
  * gap-fill, vector centroids, and IVF approximate nearest neighbors.
  */
object Analytics {
  import Queries.run

  private val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  // ---- q45: pivot (explicit values → single-pass plan) ----
  def q45_pivot(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "orders")) >>
      new PivotNode(Seq("o_orderstatus"), "o_orderpriority", priorities,
        "cast(sum(cast(o_totalprice as decimal(18,2))) as double)") >>
      SortNode("o_orderstatus") >>
      d.output("result")
  }
  val q45Sql: String = {
    val cases = priorities.map(p =>
      s"""cast(sum(CASE WHEN o_orderpriority = '$p' THEN cast(o_totalprice as decimal(18,2)) END) as double) AS "$p"""")
      .mkString(",\n  ")
    s"""SELECT o_orderstatus,\n  $cases\nFROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""
  }

  // ---- q46: unpivot/melt (wide → long) ----
  def q46_unpivot(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "part")) >>
      WithColumnsNode(
        "size_d" -> "cast(p_size as double)",
        "price_d" -> "cast(p_retailprice as double)") >>
      new UnpivotNode(Seq("p_partkey"), Seq("size_d", "price_d"), "metric", "v") >>
      d.output("result")
  }
  val q46Sql: String =
    """SELECT p_partkey, 'size_d' AS metric, cast(p_size as double) AS v FROM part
      |UNION ALL
      |SELECT p_partkey, 'price_d' AS metric, cast(p_retailprice as double) AS v FROM part""".stripMargin

  // ---- q47: exact + interpolated percentiles per group ----
  def q47_percentile(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "lineitem")) >>
      AggNode(Seq("l_returnflag"),
        "percentile(l_quantity, 0.5D) as med_qty",
        "percentile(l_quantity, 0.9D) as p90_qty",
        "count(*) as n") >>
      SortNode("l_returnflag") >>
      d.output("result")
  }
  val q47Sql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS med_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- q48: resample events to daily grain per type, zero-filled gaps ----
  def q48_resample(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "events")) >>
      new ResampleNode("event_type", "ts", "day",
        aggs = Seq("count(*) as n", "cast(sum(cast(value as decimal(18,2))) as double) as sum_v"),
        fillZero = Seq("n")) >>
      SortNode("event_type", "bucket") >>
      d.output("result")
  }
  val q48Sql: String =
    """WITH b AS (SELECT min(date_trunc('day', ts)) AS lo, max(date_trunc('day', ts)) AS hi FROM events),
      |grid AS (
      |  SELECT et.event_type, gs.bucket
      |  FROM (SELECT DISTINCT event_type FROM events) et,
      |       (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bucket FROM b) gs),
      |agg AS (
      |  SELECT event_type, date_trunc('day', ts) AS bucket, count(*) AS n,
      |         cast(sum(cast(value as decimal(18,2))) as double) AS sum_v
      |  FROM events GROUP BY 1, 2)
      |SELECT g.event_type, g.bucket, coalesce(a.n, 0) AS n, a.sum_v
      |FROM grid g LEFT JOIN agg a USING (event_type, bucket)
      |ORDER BY g.event_type, g.bucket""".stripMargin

  // ---- q49: per-group embedding centroid (element-wise decimal sums) ----
  def q49_centroid(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "embeddings")) >>
      WithColumnsNode("grp" -> "cast(vec_id % 4 as bigint)") >>
      new ExplodeNode("embedding", Seq("pos", "v"), Seq("grp")) >>
      AggNode(Seq("grp", "pos"),
        // Exact cross-engine arithmetic: float -> double widening is exact,
        // *2^24 and floor are exact IEEE ops, and bigint sums are
        // order-independent. (A decimal(20,9) cast instead ties at the 9th
        // decimal and Spark rounds HALF_UP vs DuckDB HALF_EVEN.)
        // Overflow bound: |v| <= 1 so each scaled term is < 2^24; int64
        // holds ~2^39 (~5e11) rows per (grp, pos) group before the oracle's
        // CAST(HUGEINT AS BIGINT) and Spark's wrapping sum could diverge.
        "sum(cast(floor(cast(v as double) * 16777216.0D) as bigint)) as sum_scaled",
        "count(*) as n") >>
      SortNode("grp", "pos") >>
      d.output("result")
  }
  val q49Sql: String =
    """SELECT vec_id % 4 AS grp, r.range AS pos,
      |  cast(sum(cast(floor(cast(embedding[r.range + 1] as double) * 16777216.0) as bigint)) as bigint) AS sum_scaled,
      |  count(*) AS n
      |FROM embeddings, range(64) r
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- q50: IVF kNN with nProbe = nClusters (probe-all): every corpus
  // vector is scored for every query exactly once regardless of what the
  // quantizer learned, so IVF top-k PROVABLY equals brute-force top-k
  // (identical score expression + (score desc, id asc) tie-break) and the
  // oracle is the exact-kNN SQL (q28's). Unlike q68 (sampled corpus, forced
  // sampled fit, recall integers) this runs the FULL corpus and the full
  // unsampled quantizer-fit path and pins the top-k lists themselves; the
  // production nProbe < nClusters config is covered by NodesSpec. ----
  def q50_ivf_knn(spark: SparkSession, dir: String): DataFrame = {
    val d = new Dag("ivf")
    val emb = d.add(SourceNode.table(dir, "embeddings"))
    val queries = emb >> FilterNode("vec_id < 5") >>
      ProjectNode("vec_id as query_id", "embedding").named("queryset")
    val ivf = d.add(new IvfKnnNode(k = 10, nClusters = 8, nProbe = 8))
    emb("result") >> ivf("corpus"); queries >> ivf("queries")
    ivf >> ProjectNode("query_id", "vec_id", "rank") >> d.output("result")
    val ctx = Ctx(spark)
    d.fit(ctx)
    d.transform(ctx).outputs("result")
  }
  val q50Sql: String = NorthStar.q28Sql

  // ---- q125: IVF-over-int8 at the nothing-truncated parameterization
  // (probe-all + rerank >= corpus): the int8 coarse pass selects ALL
  // candidates, so the exact float re-rank provably reduces to brute-force
  // kNN and the oracle is q28's exact SQL — pinning the full composed path
  // (quantize -> cluster assign -> int8 vec_dot_int coarse scoring -> float
  // re-rank) end to end. The production rerank < corpus config trades
  // recall like any IVF and is covered by NodesSpec. ----
  def q125_ivf_int8(spark: SparkSession, dir: String): DataFrame = {
    val d = new Dag("ivfq")
    val emb = d.add(SourceNode.table(dir, "embeddings"))
    val queries = emb >> FilterNode("vec_id < 5") >>
      ProjectNode("vec_id as query_id", "embedding").named("queryset")
    val ivf = d.add(new IvfQuantizedKnnNode(k = 10, nClusters = 8, nProbe = 8,
      rerank = 10000000))
    emb("result") >> ivf("corpus"); queries >> ivf("queries")
    ivf >> ProjectNode("query_id", "vec_id", "rank") >> d.output("result")
    val ctx = Ctx(spark)
    d.fit(ctx)
    d.transform(ctx).outputs("result")
  }
  val q125Sql: String = NorthStar.q28Sql

  // ---- q51: end-to-end training-data pipeline, fully oracle-checkable:
  // quality gate -> language gate -> exact dedup survivor join -> per-lang
  // token budget. The near-dup variant (minhash -> components) is q52. ----
  def q51_pipeline(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val src = d.add(SourceNode.table(dir, "documents"))
    val scored = src >> new QualityScoreNode("text") >>
      FilterNode("n_tokens >= 20 and punct_ratio < 0.2 and digit_ratio < 0.3")
    val keyed = scored >> WithColumnsNode(
      "norm_key" -> "md5(cast(regexp_replace(lower(trim(text)), '\\\\s+', ' ') as binary))")
    // deterministic survivor: min doc_id per normalized-text key
    val survivors = keyed >> FnNode.map1("keep_min") { df =>
      import org.apache.spark.sql.functions._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("norm_key").orderBy(col("doc_id").asc)
      df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
    }
    survivors >> new TokenCountNode("text") >>
      AggNode(Seq("lang"),
        "count(*) as n_docs",
        "sum(cast(ws_tokens as bigint)) as total_tokens",
        "sum(cast(bpe_tokens as bigint)) as total_bpe") >>
      SortNode("lang") >>
      d.output("result")
  }
  val q51Sql: String = {
    val toks = "regexp_split_to_array(lower(trim(text)), '\\s+')"
    s"""WITH q AS (
       |  SELECT *,
       |    len($toks) AS n_tokens,
       |    cast(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) as double) / greatest(length(text), 1) AS punct_ratio,
       |    cast(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) as double) / greatest(length(text), 1) AS digit_ratio
       |  FROM documents),
       |f AS (SELECT * FROM q WHERE n_tokens >= 20 AND punct_ratio < 0.2 AND digit_ratio < 0.3),
       |s AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
       |      ORDER BY doc_id) AS rn
       |    FROM f) WHERE rn = 1)
       |SELECT lang, count(*) AS n_docs,
       |  cast(sum(cast(len($toks) as bigint)) as bigint) AS total_tokens,
       |  cast(sum(cast(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) as bigint)) as bigint) AS total_bpe
       |FROM s GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---- q52: near-dup clustering — minhash pairs -> connected components ->
  // cluster size histogram. Saturated regime (0.8 / 16 bands, q57-verified):
  // the pair set equals the exact-Jaccard pair set, so DuckDB can recompute
  // the FULL graph pipeline — exact pairs, transitive closure by recursive
  // CTE, min-label components, size histogram — and the distributed
  // min-label-propagation result is oracle-checked end to end. ----
  def q52_dedup_clusters(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val src = d.add(SourceNode.table(dir, "documents"))
    val pairs = src >> new MinHashDedupNode(
      numHashes = 32, bands = 16, shingleN = 3, jaccardThreshold = 0.8)
    val cc = d.add(new ConnectedComponentsNode())
    pairs >> cc("pairs")
    cc >> AggNode(Seq("cluster_id"), "count(*) as cluster_size") >>
      AggNode(Seq("cluster_size"), "count(*) as n_clusters").named("hist") >>
      SortNode("cluster_size") >>
      d.output("result")
  }
  val q52Sql: String =
    """WITH RECURSIVE
      |c AS (
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
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM s a JOIN s b ON a.doc_id < b.doc_id
      |  WHERE cast(len(list_distinct(list_intersect(a.sh, b.sh))) as double)
      |        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
      |edges AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs),
      |reach(id, label) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.id),
      |labels AS (SELECT id, min(label) AS cluster_id FROM reach GROUP BY id),
      |sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY cluster_id)
      |SELECT cluster_size, count(*) AS n_clusters FROM sizes
      |GROUP BY cluster_size ORDER BY cluster_size""".stripMargin

  // ---- q75: int8 embedding quantization — per-vector scale (exact double
  // arithmetic: max/127 division of identical doubles) and the quantized
  // integer sum; floor(x + 0.5) instead of round() makes the integers
  // engine-independent (no rounding-mode convention involved). The oracle
  // coalesces list_sum to 0: DuckDB's list_sum of an EMPTY list is NULL
  // while Spark's aggregate seed yields 0 — moot on the fixed 64-dim
  // fixture, but a ragged future fixture must not flip the hash gate. ----
  def q75_quantize(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "embeddings")) >>
      new QuantizeEmbeddingNode() >>
      ProjectNode("vec_id", "q_scale",
        "cast(aggregate(q_embedding, 0L, (a, x) -> a + x) as bigint) as q_sum") >>
      SortNode("vec_id") >> d.output("result")
  }
  val q75Sql: String =
    """SELECT vec_id, s AS q_scale,
      |  coalesce(cast(list_sum(list_transform(embedding,
      |    x -> cast(floor(cast(x as double) / s + 0.5) as bigint))) as bigint), 0) AS q_sum
      |FROM (
      |  SELECT vec_id, embedding,
      |    greatest(list_max(list_transform(embedding, x -> abs(cast(x as double)))), 1e-30) / 127.0 AS s
      |  FROM embeddings) t
      |ORDER BY vec_id""".stripMargin

  // ---- q76: kNN label propagation — auto-label 50 query vectors by the
  // majority label of their brute-force top-10 (deterministic tie-break:
  // most votes, then smallest label). The oracle replays the exact-double
  // cosine ranking (q28's proven formulation) plus the vote. ----
  def q76_knn_label(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val emb = d.add(SourceNode.table(dir, "embeddings"))
    val queries = emb >> FilterNode("vec_id < 50") >>
      ProjectNode("vec_id as query_id", "embedding").named("queryset")
    val knn = d.add(new BruteForceKnnNode(k = 10).named("knn"))
    emb("result") >> knn("corpus"); queries >> knn("queries")
    val maj = d.add(new MajorityLabelNode())
    knn >> maj("neighbors"); emb("result") >> maj("labels")
    maj >> SortNode("query_id") >> d.output("result")
  }
  val q76Sql: String =
    """WITH nn AS (
      |  SELECT query_id, vec_id FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id,
      |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |        (list_sum(list_transform(range(1, 65), i -> c.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE))
      |         / (sqrt(list_sum(list_transform(range(1, 65), i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))
      |          * sqrt(list_sum(list_transform(range(1, 65), i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE))))) DESC,
      |        c.vec_id ASC) AS rank
      |    FROM embeddings c, (SELECT * FROM embeddings WHERE vec_id < 50) q) t
      |  WHERE rank <= 10),
      |v AS (
      |  SELECT nn.query_id, e.label, count(*) AS votes
      |  FROM nn JOIN embeddings e ON nn.vec_id = e.vec_id GROUP BY 1, 2)
      |SELECT query_id, label AS pred_label, votes FROM (
      |  SELECT query_id, label, votes,
      |    row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label ASC) AS rn
      |  FROM v) w
      |WHERE rn = 1 ORDER BY query_id""".stripMargin

  // ---- q129: matryoshka-truncated retrieval — the MRL storage/compute
  // lever at 100 TB (score on the first 16 of 64 dims: 4x less scan, IO
  // and dot-product work; re-rank on full dims only if needed): pure node
  // COMPOSITION — a narrow slice() projection feeds the existing
  // brute-force kNN — with a REAL oracle: DuckDB recomputes cosine top-k
  // over the same truncated prefixes (q28's contract at range 16). ----
  def q129_matryoshka_knn(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val emb = d.add(SourceNode.table(dir, "embeddings"))
    val trunc = emb >> ProjectNode("vec_id", "slice(embedding, 1, 16) as embedding")
      .named("trunc16")
    val queries = trunc >> FilterNode("vec_id < 5") >>
      ProjectNode("vec_id as query_id", "embedding").named("queryset")
    val knn = d.add(new BruteForceKnnNode(k = 10))
    trunc("result") >> knn("corpus"); queries >> knn("queries")
    knn >> ProjectNode("query_id", "vec_id", "rank") >> d.output("result")
  }
  val q129Sql: String =
    """SELECT query_id, vec_id, rank FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id,
      |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |      (list_sum(list_transform(range(1, 17), i -> c.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE))
      |       / (sqrt(list_sum(list_transform(range(1, 17), i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))
      |        * sqrt(list_sum(list_transform(range(1, 17), i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE))))) DESC,
      |      c.vec_id ASC) AS rank
      |  FROM embeddings c, (SELECT * FROM embeddings WHERE vec_id < 5) q) t
      |WHERE rank <= 10""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("q45_pivot", q45_pivot _, q45Sql),
    ("q129_matryoshka_knn", q129_matryoshka_knn _, q129Sql),
    ("q75_quantize", q75_quantize _, q75Sql),
    ("q76_knn_label", q76_knn_label _, q76Sql),
    ("q46_unpivot", q46_unpivot _, q46Sql),
    ("q47_percentile", q47_percentile _, q47Sql),
    ("q48_resample", q48_resample _, q48Sql),
    ("q49_centroid", q49_centroid _, q49Sql),
    ("q50_ivf_knn", q50_ivf_knn _, q50Sql),
    ("q125_ivf_int8", q125_ivf_int8 _, q125Sql),
    ("q51_pipeline", q51_pipeline _, q51Sql),
    ("q52_dedup_clusters", q52_dedup_clusters _, q52Sql),
    ("q53_misc_funcs", q53_misc_funcs _, q53Sql),
  )

  // ---- q53: bitwise / conditional / string-distance scalar functions ----
  def q53_misc_funcs(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "supplier")) >>
      ProjectNode(
        "s_suppkey",
        "s_suppkey & 255 as band",
        "s_suppkey | 4096 as orred",
        "cast(s_suppkey as bigint) ^ 21 as xored",
        "shiftleft(cast(s_suppkey as bigint), 3) as shifted",
        "repeat(substring(s_name, 1, 2), 2) as name_rep",
        "translate(s_name, '#', '-') as name_t",
        "levenshtein(s_name, reverse(s_name)) as lev",
        "greatest(s_acctbal, 0.0D) as bal_pos",
        "nullif(s_nationkey, 0) as nk_nullable",
        "ifnull(nullif(s_nationkey, 0), -1) as nk_filled") >>
      SortNode("s_suppkey") >>
      d.output("result")
  }
  def q53Sql: String =
    """SELECT s_suppkey,
      |  s_suppkey & 255 AS band,
      |  s_suppkey | 4096 AS orred,
      |  xor(cast(s_suppkey as bigint), 21) AS xored,
      |  cast(s_suppkey as bigint) << 3 AS shifted,
      |  repeat(substring(s_name, 1, 2), 2) AS name_rep,
      |  translate(s_name, '#', '-') AS name_t,
      |  levenshtein(s_name, reverse(s_name)) AS lev,
      |  greatest(s_acctbal, 0.0) AS bal_pos,
      |  nullif(s_nationkey, 0) AS nk_nullable,
      |  ifnull(nullif(s_nationkey, 0), -1) AS nk_filled
      |FROM supplier ORDER BY s_suppkey""".stripMargin
}

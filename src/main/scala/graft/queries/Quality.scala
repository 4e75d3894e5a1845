package graft.queries

import graft.dag._
import graft.nodes._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-5 curation-quality corpus: the heuristic rule battery (q83),
  * semantic dedup (q84), the corpus-vocabulary OOV estimator (q85), the ORC
  * storage round-trip (q86), and per-domain quota capping (q87). q83/q85/
  * q86/q87 are integer/ratio arithmetic → full DuckDB oracles; q84 follows
  * the q56/q68 recall-identity construction (single-cluster SemDeDup
  * provably equals the brute-force pair set, so the oracle derives both
  * counts from the data alone).
  */
object Quality {
  import Queries.run

  /** Delegates to the ONE DuckDB mirror of the engine hash (DetHash). */
  private def duckHash(col: String, mod: Long): String = DetHash.duckExpr(col, mod)

  // ---- q83: Gopher/C4 heuristic quality battery. Thresholds are tuned so
  // the synthetic corpus splits on word count and stopword hits (the other
  // rules pass but are still computed and asserted through `keep`). Ratios
  // are int/int double divisions — engine-exact; keep is cast to int for a
  // representation-stable hash. ----
  def q83_heuristic_filter(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "documents")) >>
      new HeuristicFilterNode(minWords = 40, maxWords = 100000,
        minMeanWordLen = 2.0, maxMeanWordLen = 10.0,
        minAlphaWordFrac = 0.8, minStopwordHits = 1) >>
      ProjectNode("doc_id", "n_words", "mean_word_len", "symbol_ratio",
        "alpha_word_frac", "stop_hits", "cast(keep as int) as keep") >>
      d.output("result")
  }
  val q83Sql: String =
    """WITH t AS (
      |  SELECT doc_id, text,
      |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks,
      |    string_split(text, chr(10)) AS lines,
      |    length(regexp_replace(text, '\s+', '', 'g')) AS nchar_ns
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    len(toks) AS n_words,
      |    cast(nchar_ns as double) / greatest(len(toks), 1) AS mean_word_len,
      |    cast(len(regexp_extract_all(text, '#|\.\.\.|…')) as double)
      |      / greatest(len(toks), 1) AS symbol_ratio,
      |    cast(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]'))) as double)
      |      / greatest(len(lines), 1) AS bullet_frac,
      |    cast(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) as double)
      |      / greatest(len(lines), 1) AS ellipsis_frac,
      |    cast(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) as double)
      |      / greatest(len(toks), 1) AS alpha_word_frac,
      |    len(list_intersect(list_distinct(toks),
      |        ['the','be','to','of','and','that','have','with'])) AS stop_hits
      |  FROM t)
      |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_frac, stop_hits,
      |  cast(n_words >= 40 AND n_words <= 100000
      |   AND mean_word_len >= 2.0 AND mean_word_len <= 10.0
      |   AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3
      |   AND alpha_word_frac >= 0.8 AND stop_hits >= 1 as int) AS keep
      |FROM m""".stripMargin

  // ---- q84: SemDeDup pair recall vs brute force — single-block identity.
  // With nClusters = 1 (and maxCluster above the sample size so the
  // sub-splitter stays out) every pair lands in the same block, so the
  // SemDeDup pair set PROVABLY equals the brute-force cosine pair set —
  // identical score expression, identical threshold. That pins the block
  // self-join, pair dedup, scoring, and thresholding; the k-means quantizer
  // path shares QuantizerFit with IvfKnnNode, whose full fit+assign
  // mechanism q68 already pins. The audit corpus is a 10% hash-sample
  // (audit cost must not track corpus size). ----
  def q84_semdedup(spark: SparkSession, dir: String): DataFrame = {
    val d = new Dag("semdedup_recall")
    val emb = d.add(SourceNode.table(dir, "embeddings"))
    val sample = emb >> FilterNode(s"${DetHash.modExpr("vec_id", 10)} = 0")
      .named("corpus_sample")
    val brute = sample >> new EmbeddingNearDupNode(threshold = 0.3, bruteForce = true)
      .named("brute")
    // collapseExact off: the brute baseline scores RAW vectors, so the
    // identity must compare like against like (the testdata has no
    // bit-identical embeddings anyway — collapse is the 10x-clone guard)
    val sem = d.add(new SemDedupNode(threshold = 0.3, nClusters = 1,
      maxCluster = Int.MaxValue, collapseExact = false).named("sem"))
    sample("result") >> sem("df")
    val cmp = d.add(new FnNode(Seq(Port("brute"), Port("sem")), Seq(Port("result")),
      (_, in) => {
        import org.apache.spark.sql.functions._
        val t = in("brute").select(col("id_a"), col("id_b"))
        val f = in("sem").select(col("id_a"), col("id_b"))
        Map("result" -> t.agg(count(lit(1)).as("n_true"))
          .crossJoin(t.join(f, Seq("id_a", "id_b")).agg(count(lit(1)).as("n_found"))))
      }, "pair_recall"))
    brute >> cmp("brute"); sem >> cmp("sem")
    cmp >> d.output("result")
    val ctx = Ctx(spark)
    d.fit(ctx)
    d.transform(ctx).outputs("result")
  }
  val q84Sql: String =
    s"""WITH s AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE ${duckHash("cast(vec_id as varchar)", 10)} = 0),
       |p AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM s a JOIN s b ON a.vec_id < b.vec_id
       |  WHERE (list_sum(list_transform(range(1, 65), i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
       |     / (sqrt(list_sum(list_transform(range(1, 65), i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
       |      * sqrt(list_sum(list_transform(range(1, 65), i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))))) >= 0.3)
       |SELECT count(*) AS n_true, count(*) AS n_found FROM p""".stripMargin

  // ---- q85: corpus-vocabulary OOV scoring. The vocabulary is the top-20
  // tokens by document frequency with df >= 5, ties broken by token — a
  // total order, so the fitted vocab (and hence every OOV count) is a
  // deterministic function of the corpus both engines derive identically. ----
  def q85_vocab_oov(spark: SparkSession, dir: String): DataFrame = {
    val d = new Dag("vocab_oov")
    val src = d.add(SourceNode.table(dir, "documents"))
    val vf = d.add(new VocabFilterNode(minDf = 5L, maxVocab = 20))
    src >> vf("df")
    vf >> ProjectNode("doc_id", "n_tokens", "n_oov", "oov_frac") >> d.output("result")
    val ctx = Ctx(spark)
    d.fit(ctx)
    d.transform(ctx).outputs("result")
  }
  val q85Sql: String =
    """WITH occ AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      |  FROM documents),
      |df AS (SELECT tok, count(DISTINCT doc_id) AS d FROM occ GROUP BY tok),
      |vocab AS (SELECT tok FROM df WHERE d >= 5 ORDER BY d DESC, tok ASC LIMIT 20)
      |SELECT o.doc_id,
      |  count(*) AS n_tokens,
      |  count(*) FILTER (WHERE v.tok IS NULL) AS n_oov,
      |  cast(count(*) FILTER (WHERE v.tok IS NULL) as double)
      |    / greatest(count(*), 1) AS oov_frac
      |FROM occ o LEFT JOIN vocab v USING (tok)
      |GROUP BY o.doc_id""".stripMargin

  // ---- q86: ORC storage round-trip — write a filtered projection as ORC
  // through the sink barrier, read it back, aggregate; the oracle aggregates
  // the original parquet, so any loss/coercion in the ORC path breaks the
  // hash (the q65 construction, third format family). ----
  def q86_orc_roundtrip(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_q86_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
    val src = d.add(SourceNode.table(dir, "orders"))
    val slim = src >> FilterNode("o_totalprice > 250000") >>
      ProjectNode("o_orderkey", "o_orderstatus", "o_totalprice").named("slim")
    val orcSink = d.add(new SinkNode(s"$tmp/orc", "orc").named("orc_sink"))
    slim >> orcSink("df")
    val orcBack = d.add(new FnNode(Seq(Port("df")), Seq(Port("result")),
      (ctx, _) => Map("result" -> ctx.spark.read.format("orc").load(s"$tmp/orc")), "orc_rb"))
    orcSink >> orcBack("df")
    orcBack >> AggNode(Seq("o_orderstatus"),
        "count(*) as n",
        "cast(sum(cast(o_totalprice as decimal(18,2))) as double) as total") >>
      SortNode("o_orderstatus") >>
      d.output("result")
  }
  val q86Sql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS total
      |FROM orders WHERE o_totalprice > 250000
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---- q87: per-domain quota — best 5 documents per source by length,
  // id tie-break. (rank under a total order → hash-exact.) ----
  def q87_domain_quota(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "documents")) >>
      new DomainQuotaNode(strataCol = "source", quota = 5,
        orderBy = Seq("n_chars desc")) >>
      ProjectNode("doc_id", "source", "n_chars", "q_rank") >>
      d.output("result")
  }
  val q87Sql: String =
    """SELECT doc_id, source, n_chars, q_rank FROM (
      |  SELECT doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS q_rank
      |  FROM documents) t
      |WHERE q_rank <= 5""".stripMargin

  // ---- q88: trained BPE tokenizer round-trip. The merge table is learned
  // from a bounded deterministic sample (how every real tokenizer trains),
  // applied corpus-wide by the compiled bpe_encode kernel, and pinned by the
  // construction identity: BPE merging never creates or destroys characters,
  // so concatenating each document's subword tokens MUST reproduce the
  // document with its whitespace removed. Any slicing/rank/UTF-8 bug in fit
  // or apply breaks roundtrip_ok somewhere in the corpus → hash mismatch.
  // n_words rides along so the row payload is data-derived, not constant. ----
  def q88_bpe_roundtrip(spark: SparkSession, dir: String): DataFrame = {
    val d = new Dag("bpe_roundtrip")
    val src = d.add(SourceNode.table(dir, "documents"))
    val bpe = d.add(new BpeTokenizerNode(numMerges = 100, maxFitRows = 200L))
    src >> bpe("df")
    bpe >> ProjectNode("doc_id",
      s"size(${TextExprs.tokensExpr("text")}) as n_words",
      "cast(array_join(bpe_tokens, '') = regexp_replace(lower(text), '\\\\s+', '') as int) as roundtrip_ok") >>
      d.output("result")
    val ctx = Ctx(spark)
    d.fit(ctx)
    d.transform(ctx).outputs("result")
  }
  val q88Sql: String =
    """SELECT doc_id,
      |  len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_words,
      |  1 AS roundtrip_ok
      |FROM documents""".stripMargin

  // ---- q89: the round-5 stages composed end to end — heuristic quality
  // gate (keepOnly) → per-domain quota → trained BPE tokenization →
  // sequence packing (ws-token counts, so the pack arithmetic stays
  // DuckDB-derivable) → per-shard stream stats. The BPE stage participates
  // through the aggregated round-trip identity (n_roundtrip_ok must equal
  // n_docs per shard), so a regression in ANY stage — a rule, the quota
  // cut, a merge rule, the shard cumsum — moves some integer in the output
  // and breaks the hash. ----
  def q89_pretrain_pipeline(spark: SparkSession, dir: String): DataFrame = {
    val d = new Dag("pretrain_pipeline")
    val src = d.add(SourceNode.table(dir, "documents"))
    val gated = src >>
      new HeuristicFilterNode(minWords = 40, maxWords = 100000,
        minMeanWordLen = 2.0, maxMeanWordLen = 10.0,
        minAlphaWordFrac = 0.8, minStopwordHits = 1, keepOnly = true) >>
      new DomainQuotaNode(strataCol = "source", quota = 20,
        orderBy = Seq("n_chars desc"))
    val bpe = d.add(new BpeTokenizerNode(numMerges = 100, maxFitRows = 200L))
    gated >> bpe("df")
    bpe >> new SequencePackNode(seqLen = 256, shards = 8) >>
      new WithColumnsNode(Seq("rt_ok" ->
        "cast(array_join(bpe_tokens, '') = regexp_replace(lower(text), '\\\\s+', '') as bigint)")) >>
      new AggNode(Seq("shard"), Seq(
        "count(*) as n_docs",
        "sum(n_tokens) as total_tokens",
        "max(seq_last) + 1 as n_seqs",
        "sum(rt_ok) as n_roundtrip_ok")) >>
      SortNode("shard") >>
      d.output("result")
    val ctx = Ctx(spark)
    d.fit(ctx)
    d.transform(ctx).outputs("result")
  }
  val q89Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, source, n_chars,
       |    regexp_split_to_array(lower(trim(text)), '\\s+') AS toks,
       |    string_split(text, chr(10)) AS lines,
       |    length(regexp_replace(text, '\\s+', '', 'g')) AS nchar_ns, text
       |  FROM documents),
       |gated AS (
       |  SELECT doc_id, source, n_chars, len(toks) AS n_tokens FROM t
       |  WHERE len(toks) >= 40 AND len(toks) <= 100000
       |    AND cast(nchar_ns as double) / greatest(len(toks), 1) BETWEEN 2.0 AND 10.0
       |    AND cast(len(regexp_extract_all(text, '#|\\.\\.\\.|…')) as double)
       |        / greatest(len(toks), 1) <= 0.1
       |    AND cast(len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*•]'))) as double)
       |        / greatest(len(lines), 1) <= 0.9
       |    AND cast(len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$$'))) as double)
       |        / greatest(len(lines), 1) <= 0.3
       |    AND cast(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) as double)
       |        / greatest(len(toks), 1) >= 0.8
       |    AND len(list_intersect(list_distinct(toks),
       |        ['the','be','to','of','and','that','have','with'])) >= 1),
       |quota AS (
       |  SELECT doc_id, n_tokens FROM (
       |    SELECT doc_id, n_tokens, row_number() OVER (
       |      PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS rk
       |    FROM gated) q WHERE rk <= 20),
       |packed AS (
       |  SELECT shard, n_tokens,
       |    cast(coalesce(sum(n_tokens) OVER (
       |      PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint) AS start_tok
       |  FROM (SELECT doc_id, n_tokens,
       |          ${duckHash("cast(doc_id as varchar)", 8)} AS shard
       |        FROM quota) s)
       |SELECT shard, count(*) AS n_docs, cast(sum(n_tokens) as bigint) AS total_tokens,
       |  max((start_tok + greatest(n_tokens, 1) - 1) // 256) + 1 AS n_seqs,
       |  count(*) AS n_roundtrip_ok
       |FROM packed GROUP BY shard ORDER BY shard""".stripMargin

  // ---- q90: the quality gate in STREAMING mode — the same
  // HeuristicFilterNode instance drops into a readStream pipeline unchanged
  // (stateless narrow map), and the per-source keep counts match the batch
  // oracle exactly. This is the deployment mode where a curation gate runs
  // on arriving crawl data instead of a full-corpus pass. ----
  def q90_stream_quality(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val src = d.add(StreamSourceNode.table(dir, "documents"))
    src >> new HeuristicFilterNode(minWords = 40, maxWords = 100000,
        minMeanWordLen = 2.0, maxMeanWordLen = 10.0,
        minAlphaWordFrac = 0.8, minStopwordHits = 1) >>
      ProjectNode("source", "cast(keep as int) as keep") >>
      new StreamRunNode(s"q90_sink_${System.nanoTime()}", outputMode = "append") >>
      new AggNode(Seq("source"), Seq(
        "count(*) as n_docs",
        "cast(sum(keep) as bigint) as n_keep")) >>
      SortNode("source") >>
      d.output("result")
  }
  val q90Sql: String =
    """WITH t AS (
      |  SELECT source, text,
      |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks,
      |    string_split(text, chr(10)) AS lines,
      |    length(regexp_replace(text, '\s+', '', 'g')) AS nchar_ns
      |  FROM documents)
      |SELECT source, count(*) AS n_docs,
      |  cast(sum(cast(
      |    len(toks) >= 40 AND len(toks) <= 100000
      |    AND cast(nchar_ns as double) / greatest(len(toks), 1) BETWEEN 2.0 AND 10.0
      |    AND cast(len(regexp_extract_all(text, '#|\.\.\.|…')) as double)
      |        / greatest(len(toks), 1) <= 0.1
      |    AND cast(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]'))) as double)
      |        / greatest(len(lines), 1) <= 0.9
      |    AND cast(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) as double)
      |        / greatest(len(lines), 1) <= 0.3
      |    AND cast(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) as double)
      |        / greatest(len(toks), 1) >= 0.8
      |    AND len(list_intersect(list_distinct(toks),
      |        ['the','be','to','of','and','that','have','with'])) >= 1 as int)) as bigint) AS n_keep
      |FROM t GROUP BY source ORDER BY source""".stripMargin

  // ---- q91: cross-document duplicated-span scoring. Hashed 8-gram spans
  // are set-identical to string spans absent xxhash64 collisions (the q57
  // equivalence), so DuckDB recomputes the same per-doc shared-span counts
  // from string spans exactly — including the exact-duplicate families the
  // generator plants, whose every span is shared. ----
  def q91_span_dup(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "documents")) >>
      new SpanDupScoreNode(shingleN = 8) >>
      ProjectNode("doc_id", "n_spans", "n_shared", "shared_frac") >>
      d.output("result")
  }
  val q91Sql: String =
    """WITH s AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, greatest(len(toks) - 7, 1) + 1),
      |    i -> array_to_string(toks[i:i+7], ' ')))) AS sp
      |  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |        FROM documents) t
      |  WHERE len(toks) > 0),
      |f AS (SELECT sp, count(*) AS d FROM s GROUP BY sp)
      |SELECT doc_id,
      |  count(*) AS n_spans,
      |  cast(count(*) FILTER (WHERE d > 1) as bigint) AS n_shared,
      |  cast(count(*) FILTER (WHERE d > 1) as double) / count(*) AS shared_frac
      |FROM s JOIN f USING (sp)
      |GROUP BY doc_id""".stripMargin

  // ---- q92: one-pass column profiling over orders (bigint/string columns —
  // engine-stable stringification; see the ProfileNode float caveat). ----
  def q92_profile(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "orders")) >>
      new ProfileNode(Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")) >>
      SortNode("column_name") >>
      d.output("result")
  }
  val q92Sql: String =
    """SELECT 'o_orderkey' AS column_name, count(*) AS n_rows, count(o_orderkey) AS n_nonnull,
      |  count(DISTINCT o_orderkey) AS n_distinct,
      |  cast(min(o_orderkey) as varchar) AS min_val, cast(max(o_orderkey) as varchar) AS max_val
      |FROM orders
      |UNION ALL
      |SELECT 'o_custkey', count(*), count(o_custkey), count(DISTINCT o_custkey),
      |  cast(min(o_custkey) as varchar), cast(max(o_custkey) as varchar) FROM orders
      |UNION ALL
      |SELECT 'o_orderstatus', count(*), count(o_orderstatus), count(DISTINCT o_orderstatus),
      |  cast(min(o_orderstatus) as varchar), cast(max(o_orderstatus) as varchar) FROM orders
      |UNION ALL
      |SELECT 'o_orderpriority', count(*), count(o_orderpriority), count(DISTINCT o_orderpriority),
      |  cast(min(o_orderpriority) as varchar), cast(max(o_orderpriority) as varchar) FROM orders
      |ORDER BY column_name""".stripMargin

  // ---- q93: corpus heavy-hitters by pure composition — explode tokens →
  // count → TakeOrderedAndProject, no new node code. Ties at the k-boundary
  // break by token, so the 25-row cut is a total order both engines share. ----
  def q93_top_tokens(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "documents")) >>
      new ExplodeNode(TextExprs.tokensExpr("text"), Seq("pos", "tok"), keep = Nil) >>
      new AggNode(Seq("tok"), Seq("count(*) as n")) >>
      new TopKNode(25, Seq("n desc", "tok")) >>
      d.output("result")
  }
  val q93Sql: String =
    """SELECT tok, count(*) AS n
      |FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      |      FROM documents) t
      |GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 25""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("q83_heuristic_filter", q83_heuristic_filter _, q83Sql),
    ("q84_semdedup", q84_semdedup _, q84Sql),
    ("q85_vocab_oov", q85_vocab_oov _, q85Sql),
    ("q86_orc_roundtrip", q86_orc_roundtrip _, q86Sql),
    ("q87_domain_quota", q87_domain_quota _, q87Sql),
    ("q88_bpe_roundtrip", q88_bpe_roundtrip _, q88Sql),
    ("q89_pretrain_pipeline", q89_pretrain_pipeline _, q89Sql),
    ("q90_stream_quality", q90_stream_quality _, q90Sql),
    ("q91_span_dup", q91_span_dup _, q91Sql),
    ("q92_profile", q92_profile _, q92Sql),
    ("q93_top_tokens", q93_top_tokens _, q93Sql),
  )
}

package graft.queries

import graft.dag._
import graft.nodes._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-set assembly corpus (round 5): sequence packing, domain-weighted
  * mixing, boilerplate line removal, Unicode normalization, deterministic
  * interleaving. All five are hash-exact against DuckDB because every
  * decision (shard, copy count, bucket, rank) is a pure md5-mod /
  * integer-arithmetic function of the data — the library's determinism
  * contract (see [[graft.nodes.DetHash]]).
  */
object Curation {
  import Queries.run

  /** Delegates to the ONE DuckDB mirror of the engine hash (DetHash). */
  private def duckHash(col: String, mod: Long): String = DetHash.duckExpr(col, mod)

  // ---- q78: concat-and-split sequence packing — per-doc shard, stream
  // offset, and first/last sequence index. Window cumsum over id-hash
  // shards; all outputs are integer arithmetic → hash-exact. ----
  def q78_sequence_pack(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "documents")) >>
      new SequencePackNode(seqLen = 256, shards = 8) >>
      ProjectNode("doc_id", "shard", "n_tokens", "start_tok", "seq_first", "seq_last", "n_seqs") >>
      d.output("result")
  }
  val q78Sql: String =
    s"""SELECT doc_id, shard, n_tokens, start_tok,
       |  start_tok // 256 AS seq_first,
       |  (start_tok + greatest(n_tokens, 1) - 1) // 256 AS seq_last,
       |  (start_tok + greatest(n_tokens, 1) - 1) // 256 - start_tok // 256 + 1 AS n_seqs
       |FROM (
       |  SELECT doc_id, shard, n_tokens,
       |    cast(coalesce(sum(n_tokens) OVER (
       |      PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint) AS start_tok
       |  FROM (
       |    SELECT doc_id,
       |      ${duckHash("cast(doc_id as varchar)", 8)} AS shard,
       |      cast(len(regexp_split_to_array(lower(trim(text)), '\\s+')) as bigint) AS n_tokens
       |    FROM documents) t) s""".stripMargin

  // ---- q79: domain-weighted mixture — src0 upsampled 2.5x, src1 kept at
  // 0.25, src2 dropped, everything else passes through. Copy counts are a
  // pure function of md5(source|id) on both engines. ----
  def q79_domain_mix(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "documents")) >>
      new DomainMixNode(Seq("src0" -> 2.5, "src1" -> 0.25, "src2" -> 0.0)) >>
      ProjectNode("doc_id", "source", "copy") >>
      d.output("result")
  }
  val q79Sql: String =
    s"""SELECT doc_id, source, unnest(generate_series(1, copies)) AS copy FROM (
       |  SELECT doc_id, source,
       |    (CASE WHEN source = 'src0' THEN 2 WHEN source = 'src1' THEN 0
       |          WHEN source = 'src2' THEN 0 ELSE 1 END)
       |    + (CASE WHEN h < (CASE WHEN source = 'src0' THEN 500000
       |                           WHEN source = 'src1' THEN 250000
       |                           WHEN source = 'src2' THEN 0 ELSE 0 END)
       |       THEN 1 ELSE 0 END) AS copies
       |  FROM (SELECT doc_id, source,
       |          ${duckHash("coalesce(source, '') || '|' || coalesce(cast(doc_id as varchar), '')", 1000000L)} AS h
       |        FROM documents) t) s
       |WHERE copies >= 1""".stripMargin

  // ---- q80: corpus-frequent line removal. The synthetic docs are single-
  // line, so the query first folds every 8 tokens into a pseudo-line (same
  // regex both engines); exact-duplicate doc families then share ALL their
  // lines, which the doc-frequency filter drops. ----
  def q80_line_dedup(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "documents")) >>
      // Spark SQL literal parsing: '\\S' -> \S, '\n' -> newline; $1 backref
      new WithColumnsNode(Seq("ltext" ->
        "regexp_replace(text, '((\\\\S+\\\\s+){7}\\\\S+)\\\\s+', '$1\\n')")) >>
      new LineDedupNode(textCol = "ltext", maxDocFreq = 1) >>
      ProjectNode("doc_id", "clean_text", "n_kept", "n_dropped") >>
      d.output("result")
  }
  val q80Sql: String =
    """WITH pre AS (
      |  SELECT doc_id,
      |    regexp_replace(text, '((\S+\s+){7}\S+)\s+', '\1' || chr(10), 'g') AS ltext
      |  FROM documents
      |), lines AS (
      |  SELECT doc_id, x.line AS line, x.pos AS pos
      |  FROM (SELECT doc_id, unnest(list_transform(string_split(ltext, chr(10)),
      |                (l, i) -> struct_pack(line := l, pos := i))) AS x
      |        FROM pre) u
      |), freq AS (
      |  SELECT line, count(DISTINCT doc_id) AS line_df FROM lines GROUP BY line
      |), j AS (
      |  SELECT l.doc_id, l.pos, l.line, f.line_df FROM lines l JOIN freq f USING (line)
      |)
      |SELECT doc_id,
      |  coalesce(string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE line_df <= 1), '') AS clean_text,
      |  count(*) FILTER (WHERE line_df <= 1) AS n_kept,
      |  count(*) FILTER (WHERE line_df > 1) AS n_dropped
      |FROM j GROUP BY doc_id""".stripMargin

  // ---- q81: Unicode NFC + control-strip + whitespace collapse through the
  // codegen'd unicode_norm expression; DuckDB's nfc_normalize computes the
  // identical Unicode mapping. ----
  def q81_normalize(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    d.add(SourceNode.table(dir, "documents")) >>
      new NormalizeTextNode() >>
      ProjectNode("doc_id", "norm_text") >>
      d.output("result")
  }
  val q81Sql: String =
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(nfc_normalize(text),
      |    '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'), '[ \t]+', ' ', 'g')) AS norm_text
      |FROM documents""".stripMargin

  // ---- q82: deterministic two-source interleave — English docs vs the
  // rest, round-robin within 16 hash-buckets. (bucket, rnk, src_idx) is the
  // reproducible global stream order. ----
  def q82_interleave(spark: SparkSession, dir: String): DataFrame = run(spark) { d =>
    val src = d.add(SourceNode.table(dir, "documents"))
    val en = src >> FilterNode("lang = 'en'").named("en")
    val rest = src("result") >> FilterNode("lang <> 'en'").named("rest")
    val mix = d.add(new InterleaveNode(buckets = 16))
    en >> mix("dfs"); rest >> mix("dfs")
    mix >> ProjectNode("bucket", "rnk", "src_idx", "mix_src", "doc_id") >>
      d.output("result")
  }
  val q82Sql: String =
    s"""SELECT ${duckHash("mix_src || '|' || cast(doc_id as varchar)", 16)} AS bucket,
       |  row_number() OVER (
       |    PARTITION BY ${duckHash("mix_src || '|' || cast(doc_id as varchar)", 16)}, src_idx
       |    ORDER BY doc_id) AS rnk,
       |  src_idx, mix_src, doc_id
       |FROM (
       |  SELECT 'en' AS mix_src, 0 AS src_idx, doc_id FROM documents WHERE lang = 'en'
       |  UNION ALL
       |  SELECT 'rest' AS mix_src, 1 AS src_idx, doc_id FROM documents WHERE lang <> 'en') u""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("q78_sequence_pack", q78_sequence_pack _, q78Sql),
    ("q79_domain_mix", q79_domain_mix _, q79Sql),
    ("q80_line_dedup", q80_line_dedup _, q80Sql),
    ("q81_normalize", q81_normalize _, q81Sql),
    ("q82_interleave", q82_interleave _, q82Sql),
  )
}

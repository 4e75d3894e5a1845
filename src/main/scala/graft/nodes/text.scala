package graft.nodes

import graft.dag._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Text-analysis nodes for LLM-data pipelines (north-star scope, SURVEY.md
  * §2.2). Everything is built from codegen'd `org.apache.spark.sql.functions`
  * expressions — no UDFs — so whole-stage codegen spans the full pipeline and
  * the work distributes embarrassingly (narrow, per-row transforms; zero
  * shuffles at 100 TB).
  */
object TextExprs {
  /** Lowercased whitespace tokens of `c`. */
  def tokensExpr(c: String): String = s"split(lower(trim($c)), '\\\\s+')"
  /** Word n-gram shingles over a token array column. slice() is 1-based. */
  def shinglesExpr(tokens: String, n: Int): String =
    s"transform(sequence(0, greatest(size($tokens) - $n, 0)), i -> concat_ws(' ', slice($tokens, i + 1, $n)))"
}

/** Tokenize + count tokens two ways: whitespace tokens and a BPE-ish regex
  * (word pieces + standalone punctuation), the standard proxy for LLM token
  * budgeting. Pure narrow map — no shuffle.
  */
class TokenCountNode(val textCol: String = "text") extends Node {
  override protected def defaultName: String = "token_count"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("token_count")
  override def jsonParams: Map[String, Any] = Map("textCol" -> textCol)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] =
    Map("result" -> in("df")
      .withColumn("ws_tokens", expr(s"size(${TextExprs.tokensExpr(textCol)})"))
      .withColumn("bpe_tokens", expr(s"size(regexp_extract_all($textCol, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\\\s]', 0))")))
}

/** Heuristic quality scoring: length, punctuation/digit/whitespace ratios,
  * mean word length, stopword ratio — the cheap filters applied before
  * expensive dedup/model scoring in a training-data pipeline. Narrow map.
  */
class QualityScoreNode(val textCol: String = "text", val stopwords: Seq[String] = QualityScoreNode.enStop)
  extends Node {
  override protected def defaultName: String = "quality_score"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("quality_score")
  override def jsonParams: Map[String, Any] = Map("textCol" -> textCol, "stopwords" -> stopwords)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val toks = TextExprs.tokensExpr(textCol)
    val stopArr = stopwords.map(s => s"'$s'").mkString("array(", ", ", ")")
    Map("result" -> in("df")
      .withColumn("n_chars_m", expr(s"length($textCol)"))
      .withColumn("n_tokens", expr(s"size($toks)"))
      .withColumn("mean_word_len", expr(
        s"cast(length(regexp_replace($textCol, '\\\\s+', '')) as double) / greatest(size($toks), 1)"))
      .withColumn("punct_ratio", expr(
        s"cast(length($textCol) - length(regexp_replace($textCol, '[^a-zA-Z0-9\\\\s]', '')) as double) / greatest(length($textCol), 1)"))
      .withColumn("digit_ratio", expr(
        s"cast(length($textCol) - length(regexp_replace($textCol, '[0-9]', '')) as double) / greatest(length($textCol), 1)"))
      .withColumn("stopword_ratio", expr(
        s"cast(size(filter($toks, t -> array_contains($stopArr, t))) as double) / greatest(size($toks), 1)")))
  }
}
object QualityScoreNode {
  val enStop = Seq("the", "a", "an", "of", "to", "in", "and", "is", "for", "on", "with", "as", "by", "at")
}

/** Language identification by stopword-hit scoring: count tokens that appear
  * in each language's marker list, predict the argmax (first-listed language
  * wins ties). A real system would use char n-gram profiles; the structure —
  * narrow map over tokens with a broadcast-size marker table baked into the
  * expression — is identical at any scale.
  */
class LangIdNode(val textCol: String = "text", val markers: Seq[(String, Seq[String])] = LangIdNode.defaultMarkers)
  extends Node {
  override protected def defaultName: String = "lang_id"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("lang_id")
  override def jsonParams: Map[String, Any] =
    Map("textCol" -> textCol, "markers" -> markers.map { case (l, ws) => Seq[Any](l, ws) })
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val toks = TextExprs.tokensExpr(textCol)
    val scored = markers.foldLeft(in("df").withColumn("__toks", expr(toks))) {
      case (d, (lang, words)) =>
        val arr = words.map(w => s"'$w'").mkString("array(", ", ", ")")
        d.withColumn(s"__score_$lang", expr(s"size(filter(__toks, t -> array_contains($arr, t)))"))
    }
    // argmax via greatest + case-when chain (ties resolve in declaration order)
    val best = markers.map { case (lang, _) => s"__score_$lang" }.mkString("greatest(", ", ", ")")
    val pick = markers.map { case (lang, _) => s"when __score_$lang = __best then '$lang'" }
      .mkString("case ", " ", " end")
    Map("result" -> scored
      .withColumn("__best", expr(best))
      .withColumn("pred_lang", expr(s"case when __best = 0 then 'und' else $pick end"))
      .drop((markers.map { case (l, _) => s"__score_$l" } :+ "__best" :+ "__toks"): _*))
  }
}
object LangIdNode {
  /** Marker stopwords per language (public common function words). */
  val defaultMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "for", "with", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "mit", "für", "von", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "pour", "avec", "dans"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "para", "con"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "他", "这", "中"),
  )
}

/** Document fingerprinting: whole-document md5 over normalized text (exact
  * dedup key) plus a winnowing rolling fingerprint — min rolling k-gram hash
  * per window (Schleimer et al.), computed by the compiled `winnow_fp`
  * kernel; the pure-SQL formulation re-evaluated the normalization per
  * k-gram (interpreted HOF inlining — see graft.functions.Sketches).
  */
class FingerprintNode(val textCol: String = "text", val k: Int = 8, val window: Int = 16) extends Node {
  override protected def defaultName: String = "fingerprint"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def jsonKind: Option[String] = Some("fingerprint")
  override def jsonParams: Map[String, Any] = Map("textCol" -> textCol, "k" -> k, "window" -> window)
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    graft.functions.VecFunctions.register(ctx.spark)
    val norm = s"regexp_replace(lower(trim($textCol)), '\\\\s+', ' ')"
    Map("result" -> in("df")
      .withColumn("doc_md5", expr(s"md5(cast($norm as binary))"))
      .withColumn("winnow_fp", expr(s"winnow_fp($textCol, $k, $window)")))
  }
}

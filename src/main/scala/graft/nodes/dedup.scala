package graft.nodes

import graft.dag._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

/** Deduplication node family for LLM-data pipelines (north-star scope).
  * Design for 100 TB: every variant reduces to (1) a narrow per-row signature
  * computed with codegen'd builtins, (2) ONE shuffle on the signature/bucket
  * key, (3) per-bucket candidate verification. No driver-side state, no
  * collect, no UDFs.
  */

/** Exact dedup keyed on arbitrary expressions. Deterministic survivor: the
  * min `idCol` row per key (plain `dropDuplicates` keeps an arbitrary first
  * row, which is not oracle-checkable). One hash shuffle on the key —
  * map-side partial aggregation halves the shuffle volume automatically.
  */
class ExactDedupNode(keyExprs: Seq[String], idCol: String) extends Node {
  override protected def defaultName: String = "exact_dedup"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val keyed = in("df").withColumn("__key", expr(keyExprs.mkString("concat_ws('\\u0001', ", ", ", ")")))
    val survivors = keyed.groupBy(col("__key"))
      .agg(expr(s"min($idCol) as $idCol"), expr("count(*) as dup_count"))
    Map("result" -> survivors.drop("__key"))
  }
}

/** MinHash + LSH near-duplicate pairs: tokens → word-`shingleN`-gram shingles
  * → `numHashes` minhash signature (seeded xxhash64, all builtin) → `bands`
  * bands hashed and exploded → bucket self-join → exact Jaccard verify.
  *
  * Scale analysis: signature computation is a narrow map; the only wide ops
  * are the bucket groupBy-self-join (shuffle keyed on (band, bandHash) — fine
  * at 1000 executors) and the verify join. Skewed buckets (boilerplate docs)
  * are the classic hazard: bound bucket blowup by tuning bands/rows, and AQE
  * skew-join handles residual hot buckets. Candidate pairs are deduped
  * BEFORE the verify join so each pair's Jaccard is computed once.
  */
class MinHashDedupNode(
    idCol: String = "doc_id",
    textCol: String = "text",
    numHashes: Int = 32,
    bands: Int = 8,
    shingleN: Int = 3,
    jaccardThreshold: Double = 0.8)
  extends Node {
  require(numHashes % bands == 0, "numHashes must divide into bands")
  private val rowsPerBand = numHashes / bands
  override protected def defaultName: String = "minhash_dedup"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val toks = TextExprs.tokensExpr(textCol)
    val shingles = s"array_distinct(${TextExprs.shinglesExpr("__toks", shingleN)})"
    // CRITICAL expression-shape point: Catalyst's CollapseProject inlines
    // upstream aliases into higher-order-function lambdas, and interpreted
    // HOF evaluation has no subexpression elimination — an inlined split()
    // re-tokenizes per lambda element, turning O(tokens) into O(tokens^2)
    // per hash. So (1) shingles are materialized behind a cache boundary
    // before the minhash expressions reference them, and (2) each band hash
    // computes only its OWN rowsPerBand minhashes (no shared __sig alias to
    // inline repeatedly): total work stays numHashes * |shingles| per doc.
    val sh = in("df")
      .withColumn("__toks", expr(toks))
      .withColumn("__shingles", expr(shingles))
      .filter("size(__shingles) > 0")
      .select(col(idCol), col("__shingles"))
      .persist()
    val bandHashes =
      s"""transform(sequence(0, ${bands - 1}), b ->
         |  xxhash64(b, transform(sequence(b * $rowsPerBand, b * $rowsPerBand + ${rowsPerBand - 1}),
         |    i -> array_min(transform(__shingles, s -> xxhash64(s, i))))))""".stripMargin
    // Candidate generation is SKINNY — ids and band key only. Shingle arrays
    // never enter the self-join shuffle; they are joined back per unique pair.
    val signed = sh.select(col(idCol), expr(bandHashes).as("__bands")).persist()
    val buckets = signed.selectExpr(idCol, "posexplode(__bands) as (band, band_hash)")
    val a = buckets.select(col(idCol).as("id_a"), col("band"), col("band_hash"))
    val b = buckets.select(col(idCol).as("id_b"), col("band"), col("band_hash"))
    val candidates = a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    val verified = candidates
      .join(sh.select(col(idCol).as("id_a"), col("__shingles").as("sh_a")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("__shingles").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        expr("cast(size(array_intersect(sh_a, sh_b)) as double) / size(array_union(sh_a, sh_b))"))
      .filter(col("jaccard") >= jaccardThreshold)
      .select("id_a", "id_b", "jaccard")
    Map("result" -> verified)
  }
}

/** SimHash near-duplicate pairs: 64-bit simhash from token xxhash64s (each
  * bit = sign of the token-vote sum), candidate pairs share at least one of
  * `chunks` 16-bit chunks (pigeonhole: hamming <= chunks-1 guarantees a
  * shared chunk), verified with `bit_count(xor) <= maxHamming`. Same
  * shuffle shape as MinHash; signature is one narrow map.
  */
class SimHashDedupNode(
    idCol: String = "doc_id",
    textCol: String = "text",
    maxHamming: Int = 3,
    chunks: Int = 4)
  extends Node {
  override protected def defaultName: String = "simhash_dedup"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val toks = TextExprs.tokensExpr(textCol)
    val simhash =
      """aggregate(sequence(0, 63), 0L, (acc, i) ->
        |  acc + if(aggregate(__hashes, 0L, (a, h) -> a + if(((h >> i) & 1) = 1, 1L, -1L)) > 0,
        |           shiftleft(1L, i), 0L))""".stripMargin
    val chunkBits = 64 / chunks
    val chunkArr =
      s"transform(sequence(0, ${chunks - 1}), c -> (__simhash >> (c * $chunkBits)) & ${(1L << chunkBits) - 1}L)"
    // Same shape as MinHash: token hashes are materialized behind a cache
    // boundary BEFORE the 64-bit fold references them (CollapseProject would
    // otherwise inline split() per bit per token — see MinHashDedupNode).
    // The simhash long is cheap to carry, so no verify-side join is needed.
    val hashed = in("df")
      .withColumn("__hashes", expr(s"transform($toks, t -> xxhash64(t))"))
      .filter("size(__hashes) > 0")
      .select(col(idCol), col("__hashes"))
      .persist()
    val signed = hashed
      .withColumn("__simhash", expr(simhash))
      .select(col(idCol), col("__simhash"), expr(chunkArr).as("__chunks"))
      .persist()
    val buckets = signed.selectExpr(idCol, "__simhash", "posexplode(__chunks) as (chunk_idx, chunk_val)")
    val a = buckets.select(col(idCol).as("id_a"), col("__simhash").as("sh_a"), col("chunk_idx"), col("chunk_val"))
    val b = buckets.select(col(idCol).as("id_b"), col("__simhash").as("sh_b"), col("chunk_idx"), col("chunk_val"))
    val verified = a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
    Map("result" -> verified)
  }
}

/** N-gram Jaccard similarity for candidate pairs from a cheap blocking key
  * (default: shared rare shingle). Exact Jaccard on distinct word n-grams.
  * Blocking bounds the pair space; without it a similarity self-join is
  * quadratic and unusable at scale.
  */
class NgramJaccardNode(
    idCol: String = "doc_id",
    textCol: String = "text",
    shingleN: Int = 2,
    threshold: Double = 0.3,
    maxDocFreq: Int = 20) // only block on shingles rarer than this (skew guard)
  extends Node {
  override protected def defaultName: String = "ngram_jaccard"
  val inputs = Seq(Port("df"))
  val outputs = Seq(Port("result"))
  override def transform(ctx: Ctx, in: In): Map[String, DataFrame] = {
    val toks = TextExprs.tokensExpr(textCol)
    // persist: consumed three times (inverted index + both verify joins);
    // also a cache boundary so collapsed projections don't re-tokenize per
    // shingle element inside the transform() lambda
    val docs = in("df")
      .withColumn("__toks", expr(toks))
      .withColumn("__shingles", expr(s"array_distinct(${TextExprs.shinglesExpr("__toks", shingleN)})"))
      .filter("size(__shingles) > 0")
      .select(col(idCol), col("__shingles"))
      .persist()
    val inverted = docs.select(col(idCol), expr("explode(__shingles) as shingle"))
    // document-frequency filter: frequent shingles create quadratic hot
    // buckets and carry no signal — the standard prefix/df filter
    val rare = inverted.groupBy("shingle").count().filter(col("count") <= maxDocFreq).select("shingle")
    val blocked = inverted.join(rare, Seq("shingle"))
    val pairs = blocked.as("a").join(blocked.as("b"), Seq("shingle"))
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val withSets = pairs
      .join(docs.select(col(idCol).as("id_a"), col("__shingles").as("sh_a")), Seq("id_a"))
      .join(docs.select(col(idCol).as("id_b"), col("__shingles").as("sh_b")), Seq("id_b"))
    val verified = withSets.withColumn("jaccard",
        expr("cast(size(array_intersect(sh_a, sh_b)) as double) / size(array_union(sh_a, sh_b))"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
    Map("result" -> verified)
  }
}

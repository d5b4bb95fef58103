package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline: token
  * counting, quality scoring, language identification, and document
  * fingerprinting. All column-expression based (whole-stage codegen; no
  * UDFs) except the Rabin rolling hash, which is a typed map.
  */
object TextStats {

  def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"), col("lang"))

  /** Whitespace token counts + char stats — the BPE-ish proxy for token
    * budgeting. Pure integer outputs so any engine reproduces them.
    */
  def tokenCounts(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
      size(split(col("text"), " ")).cast("bigint").as("n_tokens"),
      length(col("text")).cast("bigint").as("n_chars"),
      size(array_distinct(split(col("text"), " "))).cast("bigint").as("n_distinct_tokens"))
      .orderBy("doc_id")

  /** Quality components: stopword hits, mean token length, distinct-token
    * ratio. Ratios are single double divisions of exact integers —
    * bit-reproducible across engines.
    */
  def quality(d: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    val stop = array(Seq("the", "a", "an", "and", "of", "to", "in").map(lit): _*)
    d.select(col("doc_id"),
      size(filter(words, w => array_contains(stop, w))).cast("bigint").as("n_stopwords"),
      size(words).cast("bigint").as("n_tokens"),
      length(col("text")).cast("bigint").as("n_chars"))
      .withColumn("stopword_ratio",
        col("n_stopwords").cast("double") / col("n_tokens").cast("double"))
      .withColumn("mean_token_len",
        (col("n_chars") - col("n_tokens") + lit(1)).cast("double") / col("n_tokens").cast("double"))
      .orderBy("doc_id")
  }

  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " das "),
    "es" -> Seq(" el ", " los ", " una "),
    "fr" -> Seq(" le ", " les ", " une "))

  /** N-gram-heuristic language ID: count language marker tokens, argmax
    * with deterministic tie order (en > de > es > fr), 'und' (undefined)
    * when no marker hits. Implemented as pure column arithmetic
    * (occurrence counts via length-difference), so an independent SQL
    * engine states the same result.
    */
  def langId(d: DataFrame): DataFrame = {
    val padded = concat(lit(" "), col("text"), lit(" "))
    def hits(ms: Seq[String]) = ms.map { m =>
      (length(padded) - length(regexp_replace(padded, java.util.regex.Pattern.quote(m), ""))) / m.length
    }.reduce(_ + _)
    val scored = markers.foldLeft(
      d.select(col("doc_id"), col("lang"), col("text"))) {
      case (df, (code, ms)) => df.withColumn(s"s_$code", hits(ms).cast("bigint"))
    }
    // argmax with fixed priority order on ties (foldRight: earlier
    // markers win)
    val cols = markers.map { case (c, _) => col(s"s_$c") }
    val maxScore = greatest(cols: _*)
    val pred = when(maxScore === 0, lit("und"))
      .otherwise(markers.map(_._1).foldRight(lit("und")) { case (code, acc) =>
        when(col(s"s_$code") === maxScore, lit(code)).otherwise(acc)
      })
    // foldRight gives earlier markers precedence on ties
    scored.select(col("doc_id"), col("lang"), pred.as("pred_lang"),
      cols.head.as("s_en"))
      .orderBy("doc_id")
  }

  /** Normalized-content fingerprint (md5 of lowercased
    * whitespace-collapsed text) — the cheap cross-engine-checkable
    * fingerprint used for near-exact dedup bucketing.
    */
  def fingerprintMd5(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
      md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))
      .orderBy("doc_id")

  /** 61-bit Rabin–Karp rolling polynomial hash over the char stream —
    * the streaming fingerprint used at scale (content-defined chunking
    * base). Pure Scala, deterministic.
    */
  def rabin(text: String): Long = {
    val M = (1L << 61) - 1
    val B = 257L
    var h = 0L
    var i = 0
    while (i < text.length) {
      // (h*B + c) mod M with 128-bit-safe mulmod via Math.multiplyHigh
      val lo = h * B
      val hi = Math.multiplyHigh(h, B)
      // fold 2^64 ≡ 8 (mod 2^61-1): x = hi*2^64 + lo
      var v = (lo & M) + ((lo >>> 61) | (hi << 3)) * 1L
      v = (v & M) + (v >>> 61)
      h = (v + text.charAt(i).toLong) % M
      i += 1
    }
    h
  }

  def rabinFingerprints(spark: SparkSession, d: DataFrame): DataFrame = {
    import spark.implicits._
    d.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, rabin(t)) }
      .toDF("doc_id", "rabin_fp")
      .orderBy("doc_id")
  }
}

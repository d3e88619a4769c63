package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic document LANGUAGE IDENTIFICATION — the gate every
  * multilingual mix pipeline runs before per-language sampling
  * ([[CorpusOps.temperatureSample]] is keyed on exactly this label):
  * Cavnar & Trenkle 1994 ("N-Gram-Based Text Categorization") rank-order
  * profiles, chosen over a Naive-Bayes scorer because the OUT-OF-PLACE
  * distance is pure integer arithmetic — no `log`-likelihoods, no float
  * products — so predictions hash-gate bit-identically across engines
  * (the repo's log-free discipline, see [[CorpusOps.vocabRichness]]).
  *
  *  - TRAIN ([[profiles]]): per language, count character `gramLen`-grams
  *    over a labeled slice, rank by (count DESC, gram ASC), keep the top
  *    `topK` — the language's rank profile (1 = most frequent).
  *  - CLASSIFY ([[classify]]): build each document's own top-`topK` gram
  *    ranks the same way, then score every candidate language by the
  *    out-of-place measure Σ |rank_doc − rank_lang| with a `topK` penalty
  *    for grams absent from the language profile; predict the minimum
  *    (ties to the lexicographically smaller language).
  *
  * All ranks/distances are exact longs; row_number tie-breaks are total
  * orders on (count, gram) so both sides of an oracle agree.
  *
  * Scale posture: profiles are |langs|·topK rows — broadcast everywhere
  * they appear; the language list is broadcast too, so the per-doc
  * candidate fanout is a bounded topK·|langs| map-side expansion. The
  * only shuffles are doc-keyed: the (doc, gram) count aggregate, the
  * per-doc rank window, the (doc, lang) distance aggregate and the final
  * per-doc argmin window — every one partitions on the high-cardinality
  * document key, so the plan holds at 100 TB of probe text. Training
  * cost is one (lang, gram) aggregate over the labeled slice plus a
  * per-language window over VOCABULARY rows (never data rows).
  */
object LangId {

  /** Character n-grams of `text` (all positions, duplicates kept);
    * shorter-than-`n` texts yield the empty array (guarded — Spark's
    * `sequence(1, 0)` counts DOWN, the [[TextOps.charCodes]] trap).
    */
  def charGrams(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))

  /** Train rank-order profiles from a labeled corpus slice.
    * Output: (lang, gram, rank 1..topK) — |langs|·topK rows, small by
    * construction (ship it through `broadcast` at use sites).
    */
  def profiles(docs: DataFrame, textCol: String, labelCol: String,
      gramLen: Int = 3, topK: Int = 100): DataFrame = {
    require(gramLen >= 1, s"gramLen must be >= 1, got $gramLen")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = docs
      .select(col(labelCol).as("lang"),
        explode(charGrams(col(textCol), gramLen)).as("gram"))
      .groupBy(col("lang"), col("gram")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("c").desc, col("gram").asc)
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK.toLong)
      .select(col("lang"), col("gram"), col("rank"))
  }

  /** ONLINE classification — the deploy shape: profiles train offline
    * ([[profiles]]), collect to the driver (|langs|·topK rows, bounded by
    * construction), and every incoming document classifies ROW-LOCALLY
    * inside one compiled fold — zero stream state, zero shuffle, works
    * identically on a batch frame and a streaming micro-batch (the
    * stateless [[graft.operators.MinHashLsh.lshProbeEmissions]] tier;
    * the per-row count/sort/score is genuine imperative logic no window
    * expresses without a doc-keyed shuffle, the compiled-fold
    * convention). Emissions are bit-identical to [[classify]] — the same
    * oracle gates both. Docs with NULL text or no grams emit nothing.
    *
    * Grams are extracted by CODE POINT (via `offsetByCodePoints`), not
    * UTF-16 code unit, matching [[charGrams]]'s Spark `substr`/`length`
    * semantics exactly — supplementary-plane text (emoji, rare CJK)
    * yields the same gram multiset on both paths (r17 ADVICE; a
    * code-UNIT loop would split surrogate pairs and diverge).
    *
    * Tie-order caveat: rank ties break by gram string order, which here
    * is Java String order (UTF-16 code units) vs the batch window's
    * UTF8String byte order — identical on ASCII (and on any text where
    * tied grams don't straddle the orders' divergence), the fixture's
    * domain; normalize exotic scripts upstream before relying on
    * emissions ≡ batch at the tie boundary.
    */
  def classifyEmissions(docs: DataFrame, idCol: String, textCol: String,
      profs: DataFrame, gramLen: Int = 3, topK: Int = 100): DataFrame = {
    require(gramLen >= 1 && topK >= 1, s"bad gramLen=$gramLen topK=$topK")
    val spark = docs.sparkSession
    import spark.implicits._
    // Driver-bounded collect (the RankOps range-bounds convention): the
    // profile table is |langs|·topK by construction.
    val langProfiles: Array[(String, Map[String, Long])] = profs
      .select(col("lang"), col("gram"), col("rank").cast("long"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).toMap)
      .toArray.sortBy(_._1)
    val k = topK.toLong
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val nCp = if (text == null) 0 else text.codePointCount(0, text.length)
        if (nCp < gramLen) Iterator.empty
        else {
          // Char offset of every code-point boundary, so gram i is the
          // UTF-16 slice [offs(i), offs(i + gramLen)) — the code-POINT
          // window the batch substr takes (see scaladoc).
          val offs = new Array[Int](nCp + 1)
          var o = 0
          var j = 0
          while (j < nCp) {
            offs(j) = o
            o += Character.charCount(text.codePointAt(o))
            j += 1
          }
          offs(nCp) = text.length
          val counts = new scala.collection.mutable.HashMap[String, Long]
          var i = 0
          while (i <= nCp - gramLen) {
            val g = text.substring(offs(i), offs(i + gramLen))
            counts.update(g, counts.getOrElse(g, 0L) + 1L)
            i += 1
          }
          val top = counts.toArray
            .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
            .take(topK)
          var bestLang: String = null
          var bestDist = Long.MaxValue
          langProfiles.foreach { case (lang, prof) =>
            var dist = 0L
            var r = 0
            while (r < top.length) {
              val g = top(r)._1
              dist += prof.get(g).map(rl => math.abs((r + 1L) - rl)).getOrElse(k)
              r += 1
            }
            // strict < keeps the FIRST minimum in sorted-lang order = the
            // lexicographically smaller tied language (the batch window's
            // tie-break)
            if (dist < bestDist) { bestDist = dist; bestLang = lang }
          }
          if (bestLang == null) Iterator.empty
          else Iterator.single((id, bestLang, bestDist))
        }
      }
      .toDF("doc_id", "lang_pred", "dist")
  }

  /** Classify documents against trained [[profiles]]. `topK` must match
    * the training call (it is both the doc-profile depth and the
    * missing-gram penalty). Documents with no grams (text shorter than
    * the training gram length) are absent from the output — screen them
    * with a length rule upstream.
    *
    * Output: (doc_id, lang_pred, dist), one row per classifiable doc.
    */
  def classify(docs: DataFrame, idCol: String, textCol: String,
      profs: DataFrame, gramLen: Int = 3, topK: Int = 100): DataFrame = {
    require(gramLen >= 1 && topK >= 1, s"bad gramLen=$gramLen topK=$topK")
    val dg = docs
      .select(col(idCol).as("doc_id"),
        explode(charGrams(col(textCol), gramLen)).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
    val wd = Window.partitionBy(col("doc_id"))
      .orderBy(col("c").desc, col("gram").asc)
    val docTop = dg.withColumn("rank_doc", row_number().over(wd).cast("long"))
      .filter(col("rank_doc") <= topK.toLong)
      .select(col("doc_id"), col("gram"), col("rank_doc"))
    val langs = profs.select(col("lang")).distinct()
    val cand = docTop
      .crossJoin(broadcast(langs))
      .join(broadcast(profs.withColumnRenamed("rank", "rank_lang")),
        Seq("lang", "gram"), "left")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(coalesce(abs(col("rank_doc") - col("rank_lang")),
        lit(topK.toLong))).as("dist"))
    val wb = Window.partitionBy(col("doc_id"))
      .orderBy(col("dist").asc, col("lang").asc)
    cand.withColumn("rn", row_number().over(wb))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("lang_pred"), col("dist"))
  }
}

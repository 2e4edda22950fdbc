package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{CleanFns, TextFns}

/** Document-level text analysis for training-data curation: token
  * counting, quality scoring, language ID, fingerprinting. All
  * expression-only (whole-stage codegen) — embarrassingly parallel,
  * no shuffle, scales linearly with corpus size.
  */
object TextAnalysis {

  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "is", "in", "it", "that")

  /** Marker vocabularies for the n-gram/stopword language heuristic.
    * Order = tie-break priority. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "los", "de", "y", "es", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que"))

  /** Token counts: whitespace and BPE-ish (subword pre-tokenization). */
  def tokenCounts(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      TextFns.tokenCount(col(textCol)).as("n_tokens_ws"),
      TextFns.bpeishTokenCount(col(textCol)).as("n_tokens_bpe"))

  /** Quality metrics + composite score: length, punctuation/digit
    * density, stopword ratio, mean token length. */
  def qualityScore(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    val nTok = TextFns.tokenCount(t)
    val nChars = length(t)
    val punct = size(regexp_extract_all(t, lit("[.,!?;:]"), lit(0)))
    val digits = size(regexp_extract_all(t, lit("[0-9]"), lit(0)))
    val stops = TextFns.tokenHits(lower(t), Stopwords)
    val safeTok = greatest(nTok, lit(1)).cast("double")
    val safeChars = greatest(nChars, lit(1)).cast("double")
    df.select(col(idCol),
        nChars.as("n_chars"),
        nTok.as("n_tokens"),
        punct.as("n_punct"),
        digits.as("n_digits"),
        stops.as("n_stopwords"),
        CleanFns.roundRepro(punct / safeChars, 4).as("punct_ratio"),
        CleanFns.roundRepro(digits / safeChars, 4).as("digit_ratio"),
        CleanFns.roundRepro(stops / safeTok, 4).as("stopword_ratio"),
        CleanFns.roundRepro(nChars / safeTok, 4).as("avg_token_len"))
      .withColumn("quality_score",
        CleanFns.roundRepro(
          least(col("n_tokens") / lit(100.0), lit(1.0)) * 0.4 +
            least(col("stopword_ratio") * 5.0, lit(1.0)) * 0.3 +
            (lit(1.0) - least(col("digit_ratio") * 10.0, lit(1.0))) * 0.3,
          4))
  }

  /** Heuristic language ID: score marker-vocabulary hits per language,
    * argmax with deterministic tie-break (LangMarkers order), "und"
    * when nothing matches. */
  def langId(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = lower(col(textCol))
    val scored = LangMarkers.foldLeft(
      df.select(col(idCol), col(textCol))) { case (acc, (lang, vocab)) =>
      acc.withColumn(s"score_$lang", TextFns.tokenHits(toks, vocab))
    }
    val langs = LangMarkers.map(_._1)
    val allZero = langs.map(l => col(s"score_$l") === 0).reduce(_ && _)
    val pred = langs.zipWithIndex.foldRight(lit(langs.last)) {
      case ((lang, i), els) =>
        val geRest = langs.drop(i + 1)
          .map(o => col(s"score_$lang") >= col(s"score_$o"))
          .foldLeft(lit(true))(_ && _)
        when(geRest, lit(lang)).otherwise(els)
    }
    scored
      .withColumn("pred_lang", when(allZero, lit("und")).otherwise(pred))
      .drop(textCol)
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text
    * plus a 8-hex prefix usable as a shard/bucket key. */
  def fingerprints(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      TextFns.fingerprint(col(textCol)).as("fp"),
      substring(TextFns.fingerprint(col(textCol)), 1, 8).as("fp_prefix"))

  /** Within-document repetition metrics (the Gopher-style repetition
    * filter): fraction of duplicated word 3-grams inside each
    * document. Boilerplate/template text repeats its own n-grams;
    * clean prose rarely does. Documents with < 3 tokens have no
    * 3-grams and report a 0 ratio.
    *
    * Shape: explode the n-grams once, then a codegen'd count /
    * countDistinct aggregate — NOT array_distinct over a projected
    * array column: CollapseProject re-inlines the (interpreted)
    * n-gram lambda into every reference, evaluating it per output
    * column (measured 8.7s -> ~1s at sf0.1). The pre-explode
    * repartition by id means the gram rows themselves never shuffle
    * (Generate preserves partitioning; the aggregate reuses it). */
  def repetition(df: DataFrame, textCol: String, idCol: String,
                 n: Int = 3): DataFrame = {
    val src = df.select(col(idCol),
      TextFns.tokens(TextFns.normalizeText(col(textCol))).as("__t"))
    val grams = src
      .transform(Dedup.spread(_, idCol))
      .select(col(idCol), explode_outer(
        when(size(col("__t")) < n, array(lit(null).cast("string")))
          .otherwise(TextFns.wordNgramsFromToks(col("__t"), n))).as("__g"))
    grams.groupBy(col(idCol))
      .agg(
        count(col("__g")).cast("int").as("n_ngrams"),
        countDistinct(col("__g")).cast("int").as("n_distinct"))
      .select(col(idCol), col("n_ngrams"), col("n_distinct"),
        CleanFns.roundRepro(
          when(col("n_ngrams") === 0, lit(0.0))
            .otherwise(lit(1.0) -
              col("n_distinct").cast("double") / col("n_ngrams")), 4)
          .as("dup_ratio"))
  }

  /** Bigram cross-entropy quality score: counts every bigram over the
    * corpus and scores each document by the mean log-probability of
    * its bigrams under the corpus bigram distribution (C(bg)/N) — the
    * n-gram frequency filter for training data. Text made of corpus-
    * typical word sequences scores high; one-off garbage scores very
    * low. (A CONDITIONAL self-trained MLE is the wrong metric here:
    * a singleton bigram with a singleton prefix gets ln(1/1) = 0, so
    * unique garbage would score as perfectly-predicted text.)
    * One vocabulary-sized shuffle + one doc-keyed aggregate; the
    * corpus text is scanned once. Documents with < 2 tokens carry no
    * bigram evidence and are excluded. */
  def lmScore(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // ">= 2 tokens" as a RAW-text predicate (trimmed text contains
    // whitespace): pushes to the scan; filtering on size(__t) would
    // re-run the tokenization inside the Filter (CollapseProject)
    val toks = df.where(trim(col(textCol)).rlike("\\s"))
      .select(col(idCol),
        TextFns.tokens(TextFns.normalizeText(col(textCol))).as("__t"))
    val bg = toks
      .select(col(idCol),
        explode(TextFns.wordNgramsFromToks(col("__t"), 2)).as("bigram"))
    val cBg = bg.groupBy(col("bigram")).agg(count(lit(1)).as("c_bg"))
    // total bigram count folded from the vocabulary-sized count table,
    // NOT a third scan of the corpus (its subplan is identical to
    // cBg's, so the shuffle is exchange-reused as well)
    val nTotal = cBg.agg(sum(col("c_bg")).as("n_total"))
    bg.join(cBg, "bigram").crossJoin(broadcast(nTotal))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        CleanFns.roundRepro(
          avg(log(col("c_bg").cast("double") / col("n_total"))), 4)
          .as("avg_logprob"))
  }

  /** Held-out conditional bigram LM scoring — the CCNet-style quality
    * filter: train add-one-smoothed bigram probabilities on a
    * REFERENCE corpus, score every document by its average conditional
    * negative log-likelihood (low = reference-like, high = perplexing
    * garbage). Complements [[lmScore]], which is the self-trained
    * MARGINAL variant — here the model is conditional p(b|a) and the
    * training set is a separate reference, so the score means "does
    * this look like the reference distribution", the question a
    * pretraining quality gate actually asks.
    *
    * Laplace smoothing: p(b|a) = (c(a,b)+1)/(c(a)+V) with c over the
    * reference, c(a) the count of `a` in bigram-context (non-final)
    * position, and V = |reference vocabulary|+1; any unseen context
    * scores 1/V. Per-bigram NLL contributions floor to micro-units
    * and integer-sum, so the score is order-independent and
    * re-derivable exactly by an ANSI oracle.
    *
    * Scale shape: the corpus text is scanned once into bigram rows;
    * the bigram-count model shuffle-joins on the bigram key (the
    * dispersed key — "the cat", not "the"), while the two
    * vocabulary-sized tables (context counts, V) BROADCAST, so the
    * hot-context skew ("the" as first token) never shuffles; counts
    * partial-aggregate map-side. Documents with < 2 tokens carry no
    * bigram evidence and are excluded.
    * Returns (idCol, n_bigrams, nll_micro, avg_nll_micro). */
  def perplexityScore(corpus: DataFrame, reference: DataFrame,
                      textCol: String, idCol: String): DataFrame = {
    // raw-text >= 2-token filter (trimmed text contains whitespace):
    // pushes to the scan and keeps the tokenization OUT of the Filter
    // (a size(tokens()) filter re-runs the regex per row)
    def bigrams(df: DataFrame) = df
      .where(trim(col(textCol)).rlike("\\s"))
      .select(col(idCol),
        TextFns.tokens(TextFns.normalizeText(col(textCol))).as("__t"))
    val refToks = bigrams(reference)
    val refBg = refToks.select(
      explode(TextFns.wordNgramsFromToks(col("__t"), 2)).as("bigram"))
    val cBg = refBg.groupBy(col("bigram")).agg(count(lit(1)).as("c_bg"))
    val cCtx = refToks
      .select(explode(
        slice(col("__t"), lit(1), size(col("__t")) - 1)).as("a"))
      .groupBy(col("a")).agg(count(lit(1)).as("c_ctx"))
    val stats = refToks.select(explode(col("__t")).as("tok"))
      .agg((countDistinct(col("tok")) + 1).cast("double").as("v"))
    val docBg = bigrams(corpus).select(col(idCol),
        explode(TextFns.wordNgramsFromToks(col("__t"), 2)).as("bigram"))
      .withColumn("a", substring_index(col("bigram"), " ", 1))
    val p = (coalesce(col("c_bg"), lit(0L)) + lit(1)).cast("double") /
      (coalesce(col("c_ctx"), lit(0L)).cast("double") + col("v"))
    docBg
      .join(cBg, Seq("bigram"), "left")
      .join(broadcast(cCtx), Seq("a"), "left")
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        floor(-log(p) * lit(1000000.0) + lit(0.5)).cast("long").as("micro"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("micro")).as("nll_micro"))
      .withColumn("avg_nll_micro", expr("nll_micro div n_bigrams"))
  }

  /** Corpus vocabulary head: the `k` most frequent tokens with total
    * occurrences and document frequency, ties broken alphabetically.
    *
    * No salting despite the guaranteed heavy hitters ("the" at corpus
    * scale): counts are algebraic, so map-side partial aggregation
    * already collapses each mapper's copy of a hot term to ONE row
    * before the shuffle — the reduce side sees ≤ #mappers rows per
    * term. doc-frequency needs (term, doc) pairs distinct, keyed on
    * the same shuffle. The global top-k plans as
    * TakeOrderedAndProject (per-partition top-k, no global sort). */
  def topTerms(df: DataFrame, textCol: String, idCol: String,
               k: Int): DataFrame =
    df.select(col(idCol),
        explode(TextFns.tokens(TextFns.normalizeText(col(textCol))))
          .as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), countDistinct(col(idCol)).as("df_docs"))
      .orderBy(col("tf").desc, col("term").asc)
      .limit(k)

  /** One-row corpus profile: document/token counts, token-length
    * percentiles, mean char length, vocabulary size — the numbers a
    * curation run reports before and after every filter stage. Two
    * cheap aggregations (doc-grain stats; distinct terms map-side
    * partial-aggregated before the vocab count), crossJoined into one
    * row. */
  def corpusStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val src = df.select(col(idCol),
      length(col(textCol)).as("__nc"),
      TextFns.tokens(TextFns.normalizeText(col(textCol))).as("__t"))
      .withColumn("__nt", size(col("__t")))
    val docStats = src.agg(
      count(lit(1)).as("n_docs"),
      sum(col("__nt")).cast("bigint").as("n_tokens"),
      CleanFns.roundRepro(percentile(col("__nt"), lit(0.5)), 2)
        .as("p50_tokens"),
      CleanFns.roundRepro(percentile(col("__nt"), lit(0.9)), 2)
        .as("p90_tokens"),
      CleanFns.roundRepro(avg(col("__nc")), 2).as("avg_chars"))
    val vocab = src.select(explode(col("__t")).as("term"))
      .agg(countDistinct(col("term")).as("vocab"))
    docStats.crossJoin(vocab)
  }

  /** Incremental corpus stats over a snapshot table's version history:
    * one row per version with the docs/tokens ADDED and REMOVED by
    * that commit and the cumulative totals — WITHOUT re-scanning
    * history. Each data file is attributed to the one commit that
    * introduced it (and, if an overwrite dropped it, the one that
    * removed it), so every file is text-scanned at most twice total
    * across the whole history — a daily append reads one day's files,
    * not the 100 TB corpus. Works over flat (`commitSnapshot`) AND
    * hive-partitioned (`commitSnapshotDynamic`) snapshots: delta
    * files are read directly (no partition discovery), which drops
    * the partition COLUMNS — irrelevant here, since the text and id
    * columns live in the data files.
    *
    * Per-version work is a map-side-combinable agg over that
    * version's delta files only; the cumulative pass runs over the
    * version-count-sized summary (a window over ~10^3 rows, driver
    * scale, not data scale). */
  def corpusStatsDelta(spark: org.apache.spark.sql.SparkSession,
                       table: String, textCol: String,
                       idCol: String): DataFrame = {
    import graft.sources.LakeWriter
    val versions = LakeWriter.snapshotVersions(spark, table)
    require(versions.nonEmpty, s"no snapshots at $table")
    val filesOf = versions.map(v =>
      v -> LakeWriter.snapshotFiles(spark, table, v).toSet).toMap
    // delta attribution: files added by v (absent in v-1), removed by
    // v (present in v-1, absent in v)
    val deltas = versions.map { v =>
      val prev = filesOf.getOrElse(v - 1, Set.empty[String])
      val cur = filesOf(v)
      (v, (cur -- prev).toSeq.sorted, (prev -- cur).toSeq.sorted)
    }
    def statsFrame(files: Seq[String], v: Long, sign: Int): Option[DataFrame] =
      if (files.isEmpty) None
      else Some(spark.read.parquet(files: _*)
        .select(lit(v).as("version"), lit(sign).as("__sign"),
          TextFns.tokenCount(col(textCol)).as("__nt")))
    val parts = deltas.flatMap { case (v, added, removed) =>
      statsFrame(added, v, 1) ++ statsFrame(removed, v, -1)
    }
    val perVersion = parts.reduce(_ union _)
      .groupBy(col("version"))
      .agg(
        sum(when(col("__sign") === 1, 1L).otherwise(0L)).as("n_docs_added"),
        sum(when(col("__sign") === -1, 1L).otherwise(0L)).as("n_docs_removed"),
        sum(when(col("__sign") === 1, col("__nt")).otherwise(0L))
          .cast("bigint").as("n_tokens_added"),
        sum(when(col("__sign") === -1, col("__nt")).otherwise(0L))
          .cast("bigint").as("n_tokens_removed"))
    // versions whose commit touched nothing (empty append) still get a
    // row: outer-join the version spine so history length is honest
    val spine = spark.createDataFrame(
      spark.sparkContext.parallelize(versions.map(Tuple1(_)), 1)
        .map(t => org.apache.spark.sql.Row(t._1)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("version",
          org.apache.spark.sql.types.LongType))))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("version"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    spine.join(perVersion, Seq("version"), "left")
      .na.fill(0L)
      .withColumn("n_docs",
        sum(col("n_docs_added") - col("n_docs_removed")).over(w))
      .withColumn("n_tokens",
        sum(col("n_tokens_added") - col("n_tokens_removed")).over(w))
  }

  /** TF-IDF keyword extraction: the top `k` terms of each document by
    * tf · ln((N+1)/(df+1)), ties broken alphabetically. The classic
    * corpus-statistics feature for clustering/near-dup triage and
    * search-side keyword indexing.
    *
    * Shape: one repartition by doc id BEFORE the token explode —
    * Generate preserves partitioning, so the (id, term) term-frequency
    * aggregate AND the final per-doc top-k window both reuse that one
    * exchange of compact parent rows; no token-level row ever crosses
    * the wire. Document frequency aggregates the (vocabulary-sized)
    * tf table and is broadcast back — by Heaps' law the distinct-term
    * table grows ~√corpus, so the broadcast holds far past the point
    * where token-level shuffles would have died. */
  def tfidf(df: DataFrame, textCol: String, idCol: String,
            k: Int = 3, materialize: Boolean = true): DataFrame = {
    val src = df.select(col(idCol),
      TextFns.tokens(TextFns.normalizeText(col(textCol))).as("__t"))
    val toks = src
      .transform(Dedup.spread(_, idCol))
      .select(col(idCol), explode(col("__t")).as("term"))
    val tfPlan = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // materialize=true: the tf table feeds BOTH the per-doc score and
    // the document-frequency aggregate — caching it halves the corpus
    // scans (same lifecycle as Dedup.minhashPairs: eager small output,
    // cache dropped before returning). false = one lazy composable
    // plan, for audits and single-consumer composition.
    val tf =
      if (materialize)
        tfPlan.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else tfPlan
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val nDocs = df.select(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term").asc)
    val scored = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", CleanFns.roundRepro(
        col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)), 4))
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf").cast("int").as("tf"),
        col("df").cast("int").as("df"), col("tfidf"), col("rank"))
    if (!materialize) scored
    else {
      val out = scored.localCheckpoint(true)
      tf.unpersist(blocking = false)
      out
    }
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken's rolling-hash
    * document sketch): hash every k-gram, slide a window of `w`
    * consecutive hashes, keep each window's minimum (rightmost on
    * ties). Any substring shared between two documents of length
    * >= w + k - 1 is GUARANTEED to contribute a shared fingerprint —
    * the local similarity sketch that md5-of-the-whole-doc cannot give.
    *
    * Shape: posexplode k-grams → one ordered window pass per document
    * (partitioned by doc id — no global sort) → distinct selected
    * (hash, position) pairs. Documents shorter than w grams keep their
    * single final-window minimum. Returns (idCol, fp, fp_pos). */
  def winnowingFingerprints(df: DataFrame, textCol: String, idCol: String,
                            k: Int = 5, w: Int = 4): DataFrame = {
    // ONE scalar kernel per document (graft.plans.WinnowFingerprints):
    // gram hashing, the sliding rightmost-min, and selection dedup all
    // run in-register inside the scan's codegen span — the composed
    // formulation pushed one row PER CHARACTER through a repartition
    // and three window passes (the heaviest map query of the text
    // family). Bit-identical (kept below as
    // [[winnowingFingerprintsComposed]]; property-spec'd equal); rows
    // with NULL text drop, matching the composed explode.
    val src = df.select(col(idCol),
      TextFns.normalizeText(col(textCol)).as("__norm"))
    Dedup.spread(src, idCol)
      .where(col("__norm").isNotNull)
      .select(col(idCol), explode(
        org.apache.spark.sql.GraftColumnBridge.column(
          graft.plans.WinnowFingerprints(
            org.apache.spark.sql.GraftColumnBridge.expression(col("__norm")),
            k, w))).as("__s"))
      .select(col(idCol), col("__s.fp").as("fp"),
        col("__s.fp_pos").as("fp_pos"))
  }

  /** The posexplode + window-function formulation of
    * [[winnowingFingerprints]] — SEMANTIC REFERENCE ONLY
    * (property-spec'd equal to the fused kernel). */
  private[graft] def winnowingFingerprintsComposed(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    val src = df.select(col(idCol),
      TextFns.normalizeText(col(textCol)).as("__norm"))
    val grams = src
      .transform(Dedup.spread(_, idCol))
      .select(col(idCol), posexplode(
        TextFns.shinglesFromNorm(col("__norm"), k)).as(Seq("pos", "__g")))
      .withColumn("__h", xxhash64(col("__g")))
    grams
      // rightmost-minimum of the window [pos-w+1, pos]: min over the
      // (hash, -pos) struct = smallest hash, largest pos on ties
      .withColumn("__sel", min(struct(col("__h").as("h"),
        (-col("pos")).as("negpos"))).over(win.rowsBetween(-(w - 1), 0)))
      .withColumn("__n", row_number().over(win))
      .withColumn("__cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))))
      // complete windows only — except docs shorter than w grams,
      // which keep their one (partial) final window
      .where(col("__n") >= w || col("__n") === col("__cnt"))
      .select(col(idCol), col("__sel.h").as("fp"),
        (-col("__sel.negpos")).as("fp_pos"))
      .distinct()
  }

  /** Collocation mining via pointwise mutual information — the
    * word2phrase step that joins "new york" into one token before
    * embedding/BPE training. PMI(a,b) = ln( p(ab) / (p(a)p(b)) ) with
    * p(ab) over adjacent-bigram positions and p(a) over token
    * positions; bigrams below `minCount` are noise and dropped.
    * Scores floor to micro-nats through one fixed parenthesization,
    * so the oracle re-derives them exactly. Only documents with ≥ 2
    * tokens participate (they define both universes).
    *
    * Scale shape: ONE token scan feeds both count tables (bigrams and
    * unigrams partial-aggregate map-side; "the" collapses per mapper).
    * The bigram→unigram joins key on the dispersed token columns and
    * the unigram side is vocabulary-sized — AQE broadcasts it when
    * small, shuffle-joins when not; the two scalar totals BROADCAST.
    * minCount prunes the candidate set BEFORE both joins.
    * Returns (bigram, c_ab, c_a, c_b, pmi_micro). */
  def collocations(df: DataFrame, textCol: String, idCol: String,
                   minCount: Long = 10L): DataFrame = {
    // "has >= 2 tokens" == "trimmed text contains whitespace" — a
    // RAW-text filter that pushes to the scan; a size(tokens(...))
    // filter would re-run the regex tokenization per row inside the
    // Filter (CollapseProject substitutes the alias)
    val toks = df.where(trim(col(textCol)).rlike("\\s"))
      .select(TextFns.tokens(TextFns.normalizeText(col(textCol))).as("__t"))
    val uni = toks.select(explode(col("__t")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c_uni"))
    val bgAll = toks
      .select(explode(TextFns.wordNgramsFromToks(col("__t"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c_ab"))
    // totals derive from the two count tables — N = Σ unigram counts,
    // M = Σ bigram counts — so the corpus is scanned exactly twice
    // (token grain, bigram grain), never a third time
    val totals = uni.agg(sum(col("c_uni")).cast("double").as("nn"))
      .crossJoin(bgAll.agg(sum(col("c_ab")).cast("double").as("m")))
    val bg = bgAll
      .where(col("c_ab") >= minCount)
      .withColumn("a", substring_index(col("bigram"), " ", 1))
      .withColumn("b", substring_index(col("bigram"), " ", -1))
    bg
      .join(uni.select(col("tok").as("a"), col("c_uni").as("c_a")), Seq("a"))
      .join(uni.select(col("tok").as("b"), col("c_uni").as("c_b")), Seq("b"))
      .crossJoin(broadcast(totals))
      .select(col("bigram"), col("c_ab"), col("c_a"), col("c_b"),
        floor(log(col("c_ab").cast("double") * col("nn") * col("nn") /
            (col("m") * col("c_a").cast("double") * col("c_b")))
          * lit(1000000.0) + lit(0.5)).cast("long").as("pmi_micro"))
  }

  /** In-engine trained multinomial Naive Bayes text classifier — the
    * fastText/CCNet-shaped domain-or-language classifier every
    * curation pipeline runs as a cheap gate before the expensive
    * stages. Trains Laplace-smoothed per-label token models on
    * `train` and scores every `corpus` document against every label;
    * the prediction is the label minimizing total NLL (ties break to
    * the alphabetically-first label).
    *
    * Model: p(tok|label) = (c(label,tok)+1) / (tot(label)+V) with V =
    * |train vocabulary|; prior p(label) = train-doc share. Each
    * per-token-TYPE NLL contribution floors to micro-units BEFORE
    * multiplying by its in-doc frequency and integer-summing, so the
    * score is order-free and an ANSI oracle re-derives every bit.
    *
    * Scale shape: the corpus is scanned once into (doc, token, tf)
    * rows — the tf pre-aggregation shrinks repeated tokens before any
    * join. Label stats (L rows) and the vocab scalar BROADCAST; the
    * (token,label)-keyed count model joins on the DISPERSED composite
    * key (never on the hot label alone), so a skewed label never
    * concentrates a partition. The per-(doc,label) sum partial-
    * aggregates map-side; the final argmax is a min(struct) aggregate
    * per doc — no window, no extra sort. L is the label-set size, so
    * the fan-out is ×L, the same factor the math requires.
    * Returns (idCol, label, pred_label, nll_micro). */
  def nbClassify(corpus: DataFrame, train: DataFrame, textCol: String,
                 idCol: String, labelCol: String): DataFrame = {
    // "has >= 1 token" == "trimmed text nonempty" — a RAW-text filter
    // that pushes to the scan; a size(tokens(...)) filter would make
    // CollapseProject re-run the whole regex tokenization inside the
    // Filter (measured 3x the scan CPU at sf1)
    def nonBlank(df: DataFrame) = df.where(length(trim(col(textCol))) > 0)
    def tokRows(df: DataFrame, tag: String) = nonBlank(df)
      .select(col(idCol), col(labelCol).as(tag),
        explode(TextFns.tokens(TextFns.normalizeText(col(textCol))))
          .as("tok"))
    // ONE tokenize pass per side; every model table below derives
    // from the (cand, tok) counts, not from corpus re-scans
    val cnt = tokRows(train, "cand")
      .groupBy(col("cand"), col("tok")).agg(count(lit(1)).as("c_lt"))
    // label stats: token totals from cnt (tiny), doc counts from a
    // split-free raw scan (no tokenization at all)
    val tots = cnt.groupBy(col("cand"))
      .agg(sum(col("c_lt")).cast("double").as("tot"))
    val docsPerLabel = nonBlank(train)
      .groupBy(col(labelCol).as("cand")).agg(count(lit(1)).as("n_docs"))
    val vocab = cnt.select(col("tok")).distinct()
      .agg(count(lit(1)).cast("double").as("v"))
    // label inventory is class-cardinality-sized — the same driver-
    // tiny collect as the ANN centroid tables. Collecting it lets the
    // scorer fan out per-label COLUMNS instead of per-label ROWS: the
    // doc-term frame joins the micro model 1:1 (no L x row blowup, no
    // transcendentals on data-scaled rows).
    case class Lab(cand: String, tot: Double, prior: Long, unseen: Long)
    val nTrain = docsPerLabel.agg(sum(col("n_docs"))).collect()(0)
      .getLong(0).toDouble
    val v = vocab.collect()(0).getDouble(0)
    val labs: Seq[Lab] = docsPerLabel.join(tots, Seq("cand"))
      .collect().map { r =>
        val tot = r.getDouble(2)
        Lab(r.getString(0), tot,
          math.floor(-math.log(r.getLong(1) / nTrain) * 1000000.0 + 0.5)
            .toLong,
          math.floor(-math.log(1.0 / (tot + v)) * 1000000.0 + 0.5).toLong)
      }.sortBy(_.cand).toIndexedSeq
    if (labs.isEmpty)
      // no usable training docs: no candidates, empty classification
      return corpus.sparkSession.emptyDataFrame
        .select(lit(0L).as(idCol), lit("").as("label"),
          lit("").as("pred_label"), lit(0L).as("nll_micro")).limit(0)
    // per-token micro-NLL columns, one per label: floor(-ln((c+1)/
    // (tot+V))·1e6+0.5) — the SAME scalar the row-fanout design
    // computed per fanned row, now computed once per (tok, label) on
    // the vocabulary-sized model and pivoted to columns
    val micro = (c: Column, tot: Double) =>
      floor(-log((coalesce(c, lit(0L)) + lit(1)).cast("double") /
        lit(tot + v)) * lit(1000000.0) + lit(0.5)).cast("long")
    val tokModel = cnt
      .groupBy(col("tok"))
      .pivot("cand", labs.map(_.cand))
      .agg(first(col("c_lt")))
      .select(col("tok") +: labs.zipWithIndex.map { case (l, i) =>
        micro(col(l.cand), l.tot).as(s"__m$i") }: _*)
    // doc-term frequencies (tf collapses repeats before the join)
    val docToks = tokRows(corpus, "label")
      .groupBy(col(idCol), col("label"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    // 1:1 left join on the dispersed token key; unseen tokens fall
    // back to the per-label unseen constant
    val aggs = labs.zipWithIndex.map { case (l, i) =>
      (sum(col("tf") * coalesce(col(s"__m$i"), lit(l.unseen))) +
        lit(l.prior)).as(s"__t$i")
    }
    val scored = docToks.join(tokModel, Seq("tok"), "left")
      .groupBy(col(idCol), col("label"))
      .agg(aggs.head, aggs.tail: _*)
    // argmax across the label columns: min over (total, label)
    // structs — same tie-break (smaller NLL, then smaller label) as
    // the row-design's min(struct)
    val best = array_min(array(labs.zipWithIndex.map { case (l, i) =>
      struct(col(s"__t$i").as("t"), lit(l.cand).as("c")) }: _*))
    scored.select(col(idCol), col("label"),
      best.getField("c").as("pred_label"),
      best.getField("t").as("nll_micro"))
  }
}

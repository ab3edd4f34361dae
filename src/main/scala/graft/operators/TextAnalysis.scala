package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: tokenization, document
  * fingerprinting, quality scoring, language identification.
  *
  * All pure column expressions (codegen'd, no UDFs, no shuffles) so
  * they stream through a 100 TB scan at full width. Formulas are
  * deliberately reproducible in ANSI SQL for the differential oracle.
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** The "dataset card" summary a training-corpus release ships with:
    * one row per (lang, source) cell with document and token counts,
    * exact median length, and each cell's share of the corpus — the
    * mix table that decides sampling weights and flags imbalance
    * before training, produced in two aggregation passes (the corpus
    * total broadcasts as one row; shares are a single IEEE division
    * over exact BIGINTs). At 100 TB this is one scan + one
    * (lang, source)-keyed shuffle of counted rows. */
  def datasetCard(docs: org.apache.spark.sql.DataFrame,
      langCol: String = "lang", sourceCol: String = "source",
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val cells = docs.groupBy(langCol, sourceCol).agg(
      count(lit(1)).as("n_docs"),
      sum(tokenCount(col(textCol)).cast("long")).as("n_tokens"),
      sum(length(col(textCol)).cast("long")).as("n_chars"),
      expr(s"percentile(CAST(length($textCol) AS DOUBLE), 0.5)").as("p50_chars"))
    val total = docs.agg(count(lit(1)).as("_total"))
    cells.crossJoin(broadcast(total))
      .withColumn("doc_share",
        col("n_docs").cast("double") / col("_total").cast("double"))
      .drop("_total")
  }

  /** BPE-ish subword count approximation: word-piece boundaries at
    * case/digit transitions plus punctuation — a cheap deterministic
    * stand-in for a tokenizer vocab (≈ tokens for prose). */
  def subwordCount(text: Column): Column =
    size(filter(
      split(regexp_replace(trim(text), "([a-z])([A-Z])|([A-Za-z])([0-9])", "$1$3 $2$4"), "[\\s\\p{Punct}]+"),
      t => t =!= ""))

  /** Document fingerprint: md5 of case-folded, whitespace-collapsed
    * text (exact-dup key; the rolling-hash shingle variant lives in
    * [[Dedup]]). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03 — the MOSS
    * scheme): hash every character k-gram of the normalized text, then
    * keep the minimum hash of each sliding window of `w` consecutive
    * k-grams (rightmost minimum on ties, via (hash, pos) ordering).
    * Guarantees: any match of length ≥ w+k-1 between two documents
    * shares at least one selected fingerprint, and selection density
    * is ~2/(w+1) regardless of document size.
    *
    * Output: (idCol, fp) distinct rows. Scale shape: ZERO shuffle —
    * the whole selection (k-gram hashes, sliding-window minima,
    * per-document dedup) happens inside one codegen'd kernel
    * ([[graft.functions.WinnowFps]]), because every window is
    * document-local. The earlier explode + WindowExec form shuffled
    * text-length × |docs| rows on _id and re-sorted them just to
    * compute a per-row neighborhood min; rows never needed to leave
    * their document. The k-gram hash is a truncated md5 so the whole
    * derivation is reproducible in ANSI SQL for the oracle. */
  def winnowFingerprints(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 8, w: Int = 4): org.apache.spark.sql.DataFrame = {
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    // spread documents across cores first (same reason as Dedup
    // .shingles): a small input file otherwise plans one scan task and
    // the whole kernel runs single-threaded
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("_id"), norm.as("_t"))
      // complete windows only: at least w k-grams = length >= w+k-1
      .filter(length(col("_t")) >= w + k - 1)
      .select(col("_id").as(idCol),
        explode(graft.functions.VectorKernels.winnowCol(col("_t"), k, w)).as("fp"))
  }

  /** Ratio of non-alphanumeric, non-space chars. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("double") /
        length(text).cast("double"))

  val Stopwords: Seq[String] = Seq("the", "and", "is", "of", "to", "a", "in")

  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(size(filter(t, x => lower(x).isin(Stopwords.map(lit): _*))).cast("double") /
        size(t).cast("double"))
  }

  def meanWordLen(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(aggregate(t, lit(0), (acc, x) => acc + length(x)).cast("double") /
        size(t).cast("double"))
  }

  /** Composite quality score in [0,1]: length, stopword density,
    * punctuation penalty, word-length plausibility — the standard
    * cheap-heuristic battery run before expensive filtering. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val punctPen = greatest(lit(1.0) - punctRatio(text) * 10.0, lit(0.0))
    val wl = meanWordLen(text)
    val wlScore = lit(1.0) - least(abs(wl - 5.0) / 5.0, lit(1.0))
    (lenScore + stopScore + punctPen + wlScore) * 0.25
  }

  /** Gopher quality-filter battery (Rae et al. 2021, "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher",
    * appendix A1.1 — the published heuristic rules):
    * 50 ≤ words ≤ 100k · mean word length in [3,10] · symbol-to-word
    * ratio (# and ...) < 0.1 · <90% bullet-initial lines · <30%
    * ellipsis-terminated lines · >80% words with an alphabetic char ·
    * ≥2 distinct required stopwords (the/be/to/of/and/that/have/with).
    *
    * Every ratio threshold is applied by INTEGER cross-multiplication
    * (e.g. `10*symbols < words` for "< 0.1") so the verdict is exact —
    * no IEEE division anywhere — which keeps the whole battery
    * hash-gateable. Raw counts are emitted alongside the verdicts so
    * the gate pins the arithmetic even where this corpus makes a rule
    * degenerate (single-line synthetic docs: the line rules trivially
    * pass and are additionally spec-pinned on multi-line fixtures).
    * Scale shape: pure codegen'd per-row expressions, zero shuffle. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def gopherQuality(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val lines = filter(split(text, "\n"), l => trim(l) =!= "")
    def occurrences(needle: String): Column =
      ((length(text) - length(replace(text, lit(needle), lit("")))) /
        lit(needle.length)).cast("int")
    df.select(
        col(idCol),
        size(toks).as("n_words"),
        aggregate(toks, lit(0L), (acc, x) => acc + length(x)).as("n_chars"),
        (occurrences("#") + occurrences("...")).as("n_sym"),
        size(lines).as("n_lines"),
        size(filter(lines, l =>
          l.startsWith("- ") || l.startsWith("* ") || l.startsWith("•")))
          .as("n_bullet"),
        size(filter(lines, l =>
          l.endsWith("...") || l.endsWith("…"))).as("n_ellipsis"),
        size(filter(toks, t => t.rlike("[A-Za-z]"))).as("n_alpha"),
        GopherStopwords.map(w =>
          when(exists(toks, t => lower(t) === w), 1).otherwise(0))
          .reduce(_ + _).as("stop_hits"))
      .withColumn("r_word_count", col("n_words") >= 50 && col("n_words") <= 100000)
      .withColumn("r_mean_word_len",
        lit(3) * col("n_words") <= col("n_chars") &&
          col("n_chars") <= lit(10) * col("n_words"))
      .withColumn("r_symbol_ratio", lit(10) * col("n_sym") < col("n_words"))
      .withColumn("r_bullet", lit(10) * col("n_bullet") < lit(9) * col("n_lines"))
      .withColumn("r_ellipsis", lit(10) * col("n_ellipsis") < lit(3) * col("n_lines"))
      .withColumn("r_alpha", lit(5) * col("n_alpha") > lit(4) * col("n_words"))
      .withColumn("r_stopwords", col("stop_hits") >= 2)
      .withColumn("keep",
        col("r_word_count") && col("r_mean_word_len") && col("r_symbol_ratio") &&
          col("r_bullet") && col("r_ellipsis") && col("r_alpha") && col("r_stopwords"))
  }

  /** Language marker words; counted with the replace-length trick so
    * the oracle reproduces counts exactly. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " is "),
    "es" -> Seq(" el ", " la ", " de "),
    "fr" -> Seq(" le ", " et ", " les "),
    "de" -> Seq(" der ", " und ", " die "))

  /** Non-overlapping occurrence count of `needle` in lower-cased,
    * space-padded text. */
  def markerCount(text: Column, needle: String): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    ((length(padded) - length(replace(padded, lit(needle), lit("")))) /
      lit(needle.length)).cast("int")
  }

  def langScore(text: Column, lang: String): Column =
    LangMarkers.toMap.apply(lang).map(markerCount(text, _)).reduce(_ + _)

  /** n-gram/stopword heuristic language ID: argmax of marker counts,
    * first language wins ties, 'unknown' when nothing matches. */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (l, _) => l -> langScore(text, l) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best <= 0, lit("unknown"))) { case (acc, (l, s)) =>
      acc.when(s === best, lit(l))
    }.otherwise(lit("unknown"))
  }

  /** PII patterns — RE2-compatible (no lookaround, no backrefs) so the
    * same pattern string runs in Spark (java.util.regex) and any
    * RE2-based SQL engine. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** PII redaction: emails then phone numbers replaced by typed
    * placeholder tokens. Pure codegen'd expression — streams through
    * the scan, the mandatory pre-training scrub at 100 TB. */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  /** Occurrences of a pattern (group 0 matches). */
  def patternCount(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  /** Hashing-trick linear quality model — the fastText-style
    * classifier plumbing of model-based corpus filtering (DCLM /
    * FineWeb-edu shape): every token hashes into one of `nBuckets`
    * weight slots (56-bit md5 word mod buckets — the classic feature
    * hashing trick, no vocabulary to build or broadcast), each slot
    * carries an integer weight in [-2^19, 2^19) derived from md5 of
    * the slot index, and the document logit is the exact BIGINT sum of
    * its tokens' slot weights. The md5-derived weights are a SEEDED,
    * DETERMINISTIC STAND-IN for trained coefficients (this container
    * has no labeled quality data): swapping in a trained weight table
    * turns the weight expression into a broadcast join on bucket id —
    * same plan, same cost shape.
    *
    * All arithmetic until the final scale is exact integers (|logit| ≤
    * n_tokens·2^19 — overflow-free for any real document), then ONE
    * IEEE division to [-1, 1] — bit-reproducible across engines, no
    * sum-of-doubles ordering hazard.
    *
    * Scale: pure per-row scan expression — tokenize, hash, fold; ZERO
    * shuffle, no model state. */
  def hashedModelLogit(text: Column, nBuckets: Int = 1024): Column =
    aggregate(
      transform(tokens(text), t => {
        val bucket =
          conv(substr(md5(t), lit(1), lit(14)), 16, 10).cast("long") % nBuckets
        conv(substr(md5(concat(lit("w:"), bucket.cast("string"))),
          lit(1), lit(14)), 16, 10).cast("long") % lit(1L << 20) - lit(1L << 19)
      }),
      lit(0L), (acc, x) => acc + x)

  /** Mean slot weight of the document's tokens, scaled to [-1, 1];
    * 0.0 for the empty document. */
  def hashedModelScore(text: Column, nBuckets: Int = 1024): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0))
      .otherwise(hashedModelLogit(text, nBuckets).cast("double")
        / (n.cast("double") * lit((1L << 19).toDouble)))
  }

  /** Within-document repetition: fraction of word n-grams that are
    * repeats (1 - distinct/total) — the Gopher/C4-style repetition
    * filter. Zero-shuffle column expression; the distinct count reuses
    * the codegen'd shingle-set kernel. */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val t = tokens(text)
    val total = size(t) - (n - 1)
    val dist = size(graft.functions.VectorKernels.wordShinglesCol(t, n))
    when(total <= 0, lit(0.0))
      .otherwise(lit(1.0) - dist.cast("double") / total.cast("double"))
  }

  /** The composed corpus-curation pass a training pipeline actually
    * runs (C4/Gopher-style): exact-dedup first-wins → token-length
    * gate → quality-score gate → repetition gate → language gate, in
    * ONE plan. All metric columns are zero-shuffle scan expressions;
    * the only shuffle is the dedup window on the 128-bit fingerprint
    * (16 bytes/doc, never the text). At 100 TB this is a single
    * scan + one narrow shuffle end to end. */
  def curate(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minTokens: Int = 5, maxTokens: Int = 10000,
      minQuality: Double = 0.5, maxRepetition: Double = 0.5,
      lang: String = "en"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = col(textCol)
    val w = Window.partitionBy(fingerprint(t)).orderBy(col(idCol))
    docs.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("rep_ratio", repetitionRatio(t, 3))
      .withColumn("lang_id", langId(t))
      .filter(col("n_tokens").between(minTokens, maxTokens) &&
        col("quality") >= minQuality && col("rep_ratio") <= maxRepetition &&
        col("lang_id") === lang)
      .select(col(idCol), col("n_tokens"), col("quality"), col("rep_ratio"))
  }

  /** Fixed-size token-window chunking with overlap — the context-
    * window prep step of a RAG / pretraining pipeline (split every
    * document into `chunkTokens`-token windows advancing by
    * `chunkTokens - overlap`, keeping provenance).
    *
    * Chunk count per doc is `1 + max(0, ceil((n - chunkTokens) /
    * stride))` — the final window is allowed to be short rather than
    * re-reading earlier tokens, so chunks tile the document exactly
    * once plus the configured overlap.
    *
    * Scale: ZERO shuffle — tokenize, a per-row `sequence` explode
    * (output rows ≈ input tokens / stride, each carrying only its own
    * slice), and `slice`/`array_join` are all codegen'd scan
    * expressions; provenance (doc id, chunk index, token count)
    * travels with each row. Output order is whatever the scan gives —
    * sort downstream if needed. */
  def chunkDocuments(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, chunkTokens: Int, overlap: Int): org.apache.spark.sql.DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens): got overlap=$overlap chunkTokens=$chunkTokens")
    val stride = chunkTokens - overlap
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_t"))
      .withColumn("_n", size(col("_t")))
      .filter(col("_n") > 0)
      // integer ceil((n - C) / S) via floor((n - C + S - 1) / S); the
      // double division is exact at token-count magnitudes (< 2^53)
      .withColumn("_nc", lit(1) + greatest(lit(0),
        floor((col("_n") - chunkTokens + stride - 1).cast("double") / stride).cast("int")))
      .select(col("doc_id"), col("_t"), col("_n"),
        explode(sequence(lit(0), col("_nc") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        least(lit(chunkTokens), col("_n") - col("chunk_idx") * stride)
          .cast("int").as("chunk_tokens"),
        array_join(slice(col("_t"), col("chunk_idx") * stride + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
  }

  /** Corpus-level sequence packing — the GPT-style concat-and-split
    * step of a pretraining pipeline: documents are laid end to end in
    * `idCol` order and the token stream is cut into fixed
    * `seqTokens`-sized training sequences, so a document may span a
    * sequence boundary and a sequence may hold many short documents
    * (zero padding waste, unlike per-doc [[chunkDocuments]]).
    *
    * The layout is a GLOBAL prefix sum of token counts, computed
    * scalably in two phases instead of one single-partition window:
    * coarse order-preserving buckets (`floor(doc_id / bucketWidth)`)
    * aggregate to per-bucket totals, the tiny bucket table takes the
    * only serial cumsum (rows = #buckets, thousands at 100 TB, never
    * rows of data), and the offsets broadcast-join back so the
    * per-doc window runs PARTITIONED by bucket. A doc starting at
    * global offset o with n tokens spans sequences
    * floor(o/L)..floor((o+n-1)/L), exploded with exact per-sequence
    * token counts — all int64 arithmetic, reproducible in ANSI SQL.
    *
    * Output: one row per (seq_id, doc_id) span with `span_tokens`,
    * plus each sequence's totals — every sequence holds exactly
    * `seqTokens` tokens except the last. Empty docs are dropped
    * (they contribute no tokens to any sequence). */
  def packSequences(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, seqTokens: Int,
      bucketWidth: Long = 1 << 20): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(seqTokens > 0 && bucketWidth > 0, s"bad L=$seqTokens/W=$bucketWidth")
    val sized = docs
      .select(col(idCol).cast("long").as("doc_id"),
        tokenCount(col(textCol)).cast("long").as("dl"))
      .filter(col("dl") > 0)
      .withColumn("_b", floor(col("doc_id").cast("double") / bucketWidth).cast("long"))
    val bucketTotals = sized.groupBy("_b").agg(sum("dl").as("_btot"))
    // the ONLY serial window: #buckets rows, not #docs
    val offsets = bucketTotals.withColumn("_boff",
      coalesce(sum("_btot").over(Window.orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_b", "_boff")
    val local = Window.partitionBy("_b").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val placed = sized.join(broadcast(offsets), "_b")
      .withColumn("_start", col("_boff") + coalesce(sum("dl").over(local), lit(0L)))
    val L = lit(seqTokens.toLong)
    val spans = placed
      .withColumn("seq_id", explode(sequence(
        floor(col("_start").cast("double") / seqTokens).cast("long"),
        floor((col("_start") + col("dl") - 1).cast("double") / seqTokens).cast("long"))))
      .withColumn("span_tokens",
        least(col("_start") + col("dl"), (col("seq_id") + 1) * L) -
          greatest(col("_start"), col("seq_id") * L))
    // per-sequence totals as a window over the one seq_id shuffle —
    // not a groupBy + self-join (two shuffles of the same rows)
    val wSeq = Window.partitionBy("seq_id")
    spans.select(col("seq_id"), col("doc_id"), col("span_tokens"),
      count(lit(1)).over(wSeq).cast("int").as("seq_docs"),
      sum("span_tokens").over(wSeq).as("seq_tokens"))
  }

  /** Corpus-level repeated-span removal — the exact-substring dedup
    * step (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better") in its scalable k-gram form: any word k-gram
    * occurring in at least `minDocs` distinct documents marks its k
    * token positions as duplicated in EVERY document that contains
    * it, and the cleaned text is the surviving tokens in order.
    *
    * Scale shape (all keys are ids/hashes, never text on the wire):
    * grams ≈ tokens rows but each reduced to a 16-hex-char md5 key
    * before any shuffle; the duplicated-gram table is posting-list
    * bounded (HAVING count ≥ minDocs); covered positions ≤ k × dup
    * occurrences; the anti-join and the per-doc rebuild shuffle
    * (doc, pos) pairs. The md5 key keeps the whole derivation
    * reproducible in ANSI SQL.
    *
    * Output: doc_id, n_tokens, n_dup (positions covered), clean_text
    * ('' when everything was duplicated). Every input doc appears. */
  def dropRepeatedSpans(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 5, minDocs: Int = 2): org.apache.spark.sql.DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_t"))
      .withColumn("_n", size(col("_t")))
    val pos = base.select(col("doc_id"), posexplode(col("_t")))
      .withColumnRenamed("pos", "_pos").withColumnRenamed("col", "_tok")
    val grams = base.filter(col("_n") >= k)
      .select(col("doc_id"), col("_n"),
        posexplode(transform(sequence(lit(1), col("_n") - (k - 1)),
          i => substring(md5(array_join(slice(col("_t"), i, lit(k)), " ")), 1, 16))))
      .select(col("doc_id"), col("pos").as("_gpos"), col("col").as("_gh"))
    val dup = grams.select("doc_id", "_gh").distinct()
      .groupBy("_gh").agg(count(lit(1)).as("_docs"))
      .filter(col("_docs") >= minDocs)
      .select("_gh")
    val covered = grams.join(dup, "_gh")
      .select(col("doc_id"),
        explode(sequence(col("_gpos"), col("_gpos") + (k - 1))).as("_pos"))
      .distinct()
    val kept = pos.join(covered, Seq("doc_id", "_pos"), "left_anti")
    val clean = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("_kept"),
        array_join(transform(array_sort(collect_list(struct(col("_pos"), col("_tok")))),
          s => s.getField("_tok")), " ").as("clean_text"))
    base.select("doc_id", "_n").join(clean, Seq("doc_id"), "left")
      .select(col("doc_id"), col("_n").cast("int").as("n_tokens"),
        (col("_n") - coalesce(col("_kept"), lit(0L))).cast("int").as("n_dup"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Top-k most-distinctive terms per document by inverse-document-
    * frequency weighting (keyword extraction / doc signatures over a
    * corpus).
    *
    * Scoring is the LINEAR idf `tf · N / df`, not `tf · ln(N/df)`:
    * `ln` is not correctly rounded and differs at the ULP level across
    * math libraries (breaking differential bit-equality), while the
    * linear form is an exact int64 product and one correctly-rounded
    * IEEE division — and it induces the same per-document ranking for
    * any fixed N whenever df ties break identically (rank is monotone
    * in tf/df either way).
    *
    * Scale: one shuffle keyed (doc, term) for tf, one keyed term for
    * df (posting-list bounded), the corpus-size scalar joins as a
    * broadcast one-row aggregate (the W1 pattern — never `OVER ()`),
    * and the final top-k is a per-doc window over the tf table, not
    * the corpus. */
  def tfidfTopTerms(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        (col("tf") * col("n_docs")).cast("double") / col("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select("doc_id", "term", "tf", "df", "score")
  }

  /** Okapi-BM25 document ranking for a fixed term query — the lexical
    * retrieval half of corpus search (the dense half is
    * [[SimilaritySearch]]); also the standard relevance filter when
    * mining a corpus for topic-specific training data.
    *
    * Bit-portability (differential-oracle contract): the idf is the
    * LINEAR Robertson form `(N - df + 0.5) / (df + 0.5)` without the
    * usual `ln(1 + ·)` wrapper — `ln` differs at the ULP across math
    * libraries, while this form is two exactly-representable sums and
    * one correctly-rounded division, and it is monotone in df exactly
    * like the logged form, so per-query rankings agree. The per-doc
    * score sums term scores by a FIXED-ORDER left fold over the
    * term-name-sorted score list (`aggregate` over `array_sort`),
    * because a plain SUM over doubles is reduction-order-dependent;
    * an oracle reproduces the fold as explicitly-parenthesized
    * pivoted addition in term order (adding 0.0 for an absent term is
    * the IEEE identity on the positive scores, so both sides compute
    * the identical bits).
    *
    * Scale: term filtering happens BEFORE the tf groupBy, so every
    * shuffle is bounded by docs-containing-query-terms, never corpus
    * size; corpus stats (N, total length) and per-term dfs ride
    * broadcast one-row/`|Q|`-row aggregates; the final top-k is a
    * TakeOrdered (per-partition heaps + driver merge of k), not a
    * global sort. Only docs matching at least one query term appear —
    * the score of every other doc is identically zero. */
  def bm25(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val toks = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), size(col("_toks")).cast("long").as("dl"),
        explode(col("_toks")).as("term"))
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum(tokenCount(col(textCol)).cast("long")).as("tot"))
    bm25Rank(tf, dfreq, stats, k, k1, b)
  }

  /** The BM25 ranking core over prepared frames — `tf(doc_id, dl,
    * term, tf)`, `dfreq(term, df)`, `stats(n_docs, tot)` — shared by
    * the corpus-scan path ([[bm25]]) and the persisted-index path
    * ([[LexicalIndex.searchBm25Index]]) so the two can never diverge
    * arithmetically: identical idf/saturation expressions, identical
    * term-sorted left fold of the per-term scores. */
  private[operators] def bm25Rank(tf: org.apache.spark.sql.DataFrame,
      dfreq: org.apache.spark.sql.DataFrame,
      stats: org.apache.spark.sql.DataFrame,
      k: Int, k1: Double, b: Double): org.apache.spark.sql.DataFrame = {
    val avgdl = col("tot").cast("double") / col("n_docs")
    val idf = ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    // (k1 + 1) is COMPUTED, not a merged literal: 1.2 + 1.0 lands on a
    // round-to-even tie, and both engines must take the same side
    val sat = (col("tf").cast("double") * (lit(k1) + lit(1.0))) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))
    val scored = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("s_t", idf * sat)
    scored.groupBy("doc_id").agg(
        aggregate(array_sort(collect_list(struct(col("term"), col("s_t")))),
          lit(0.0), (acc, x) => acc + x.getField("s_t")).as("score"),
        count(lit(1)).cast("int").as("n_terms"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  /** Tokenizer-vocabulary induction: the top-`topN` corpus tokens by
    * occurrence count with document frequency and CUMULATIVE corpus
    * coverage — the "how big must the vocab be" curve every tokenizer
    * build starts from (the word-level analogue of a BPE vocab pass).
    *
    * Exactness: counts and the running total are BIGINT; coverage is
    * one IEEE division per row. Scale: one (term, doc) shuffle, one
    * term shuffle (both map-side combining), corpus total as a
    * broadcast one-row aggregate (the W1 pattern); the global
    * rank/cumsum window runs AFTER the top-N cut, on a frame bounded
    * by `topN`, never on the full Zipf tail. */
  def buildVocab(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, topN: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("term", "doc_id").agg(count(lit(1)).as("c"))
    val counts = tf.groupBy("term").agg(
      sum("c").as("n_occurrences"), count(lit(1)).as("n_docs"))
    val total = counts.agg(sum("n_occurrences").as("_tot"))
    val top = counts.orderBy(col("n_occurrences").desc, col("term")).limit(topN)
    val w = Window.orderBy(col("n_occurrences").desc, col("term"))
    top.withColumn("rank", row_number().over(w))
      .withColumn("_cum", sum("n_occurrences").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("term"), col("n_occurrences"), col("n_docs"),
        (col("_cum").cast("double") / col("_tot").cast("double")).as("coverage"))
  }

  /** Apply a BPE merge list to every token — Sennrich et al.'s
    * `apply_bpe`: each word becomes its character-symbol sequence,
    * then every merge `(a, b) → ab` is applied in rank order as a
    * global replacement over the symbol string. Matching is SYMBOL-
    * boundary-aware AND chains across consecutive occurrences (the
    * reference uses the zero-width-boundary regex
    * `(?<!\S)a\s+b(?!\S)`, so `banana` under merge `(a,n)` becomes
    * `b an an a`): symbols are separated by TWO spaces, the pattern
    * ` a  b ` consumes exactly one space of each boundary, and the
    * replacement ` ab ` restores it — so a shared boundary between
    * back-to-back matches still satisfies both, exactly like the
    * zero-width lookarounds, while staying a literal (non-regex)
    * replace that DuckDB can replay verbatim. The merge list is a
    * plan-time constant chain of `replace` calls: zero shuffle,
    * whole-stage codegen, no per-row tokenizer state. Returns the
    * array of BPE-segmented tokens (symbols single-space-joined). */
  def applyBpe(text: Column, merges: Seq[(String, String)]): Column =
    transform(tokens(text), w => {
      val symbols = concat(lit("  "), regexp_replace(w, "(.)", "$1  "))
      val merged = merges.foldLeft(symbols) { case (s, (a, b)) =>
        replace(s, lit(s" $a  $b "), lit(s" $a$b "))
      }
      replace(trim(merged), lit("  "), lit(" "))
    })

  /** Total BPE units across the document under the merge list — the
    * REAL token-budget count once a tokenizer exists (subwordCount is
    * the heuristic stand-in). Exact integer arithmetic. */
  def bpeUnitCount(text: Column, merges: Seq[(String, String)]): Column =
    aggregate(transform(applyBpe(text, merges), s => size(split(s, " "))),
      lit(0), (acc, x) => acc + x)

  /** LEARN `k` BPE merges from the corpus — Sennrich training: the
    * word-FREQUENCY table is the training set (each distinct word
    * weighted by its count — never one row per occurrence), and each
    * round counts adjacent symbol pairs, takes the (count DESC, pair)
    * argmax, and applies the merge boundary-aware.
    *
    * Distributed shape per round: one map-side-combining aggregation
    * over the pair stream keyed (a, b), a ONE-ROW argmax collect, and
    * a per-row replace over the vocabulary frame — the standard
    * distributed BPE trainer loop (the vocabulary table is Zipf-
    * bounded, orders of magnitude below the corpus; the corpus itself
    * is touched once, by the initial word count). The vocabulary
    * frame is checkpointed each round so lineage stays flat. `k` here
    * is small; a production tokenizer runs the same loop tens of
    * thousands of times against the same-shaped vocab table.
    *
    * Returns (a, b, weighted pair count) in merge order. */
  def learnBpeMerges(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int): Seq[(String, String, Long)] = {
    // Double-space symbol separators — same chaining contract as
    // applyBpe (back-to-back occurrences of a merge pair all merge
    // in one pass, matching Sennrich's zero-width-boundary regex).
    var words = docs.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .select(col("wc"),
        concat(lit("  "), regexp_replace(col("w"), "(.)", "$1  ")).as("s"))
      .localCheckpoint(false)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to k) {
      val arr = split(trim(col("s")), "  ")
      val pairs = words.select(col("wc"), explode(zip_with(
          slice(arr, lit(1), greatest(size(arr) - 1, lit(0))),
          slice(arr, lit(2), greatest(size(arr) - 1, lit(0))),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("wc").as("c"))
      val best = pairs.orderBy(col("c").desc, col("a"), col("b")).limit(1)
        .collect() // exactly one row: the argmax merge of this round
      if (best.isEmpty) return out.toSeq
      val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      out += ((a, b, c))
      words = words.withColumn("s",
          replace(col("s"), lit(s" $a  $b "), lit(s" $a$b ")))
        .localCheckpoint(false)
    }
    out.toSeq
  }

  /** Corpus-trained bigram language-model scoring — the KenLM-style
    * perplexity filter restructured for exact differential arithmetic:
    * rather than summing per-token log-probs (`ln` differs at the ULP
    * across math libraries), each document reports order-independent
    * exact statistics of its transition probabilities
    * `p(b|a) = c(a,b) / c(a,·)` under the corpus's own bigram counts:
    *
    *  - `min_prob` — the document's weakest transition (MIN over
    *    bit-identical IEEE quotients; sentinel 2.0 for < 2 tokens);
    *  - `rare_count` — transitions with `p < tau` (exact integer);
    *  - `kept` — `rare_count / n_bigrams ≤ 1/rareDen`, evaluated as
    *    the integer cross-product `rare_count · rareDen ≤ n_bigrams`
    *    (no division at all).
    *
    * A noisy / incoherent / wrong-language document trips many
    * low-probability transitions against the corpus LM; this is the
    * CCNet/KenLM quality gate with the log-sum swapped for robust
    * order statistics.
    *
    * Scale: bigram extraction is a zero-shuffle scan expression
    * (`zip_with` over adjacent slices — no self-join); counting is two
    * keyed shuffles (bigram, context) that partial-aggregate
    * map-side; the count lookup re-shuffles the occurrence stream on
    * the same keys (vocabulary tables are Zipf-bounded — far smaller
    * than the corpus — and broadcastable when they fit); the per-doc
    * rollup keys on doc id. Token strings can be md5-reduced before
    * the shuffle at extreme scale, exactly like the shingle pipeline. */
  def bigramLmStats(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, tau: Double = 0.05, rareDen: Int = 20)
      : org.apache.spark.sql.DataFrame = {
    val t = tokens(col(textCol))
    val bi = docs.select(col(idCol).as("doc_id"),
        explode(zip_with(
          slice(t, lit(1), greatest(size(t) - 1, lit(0))),
          slice(t, lit(2), greatest(size(t) - 1, lit(0))),
          (a, b) => struct(a.as("a"), b.as("b")))).as("_bg"))
      .select(col("doc_id"), col("_bg.a").as("a"), col("_bg.b").as("b"))
    val ctx = bi.groupBy("a").agg(count(lit(1)).as("ca"))
    val big = bi.groupBy("a", "b").agg(count(lit(1)).as("cab"))
    val scored = bi.join(big, Seq("a", "b")).join(ctx, Seq("a"))
      .withColumn("p", col("cab").cast("double") / col("ca").cast("double"))
    val agg = scored.groupBy("doc_id").agg(
      count(lit(1)).cast("int").as("n_bigrams"),
      min(col("p")).as("min_prob"),
      sum(when(col("p") < tau, 1L).otherwise(0L)).as("rare_count"))
    docs.select(col(idCol).as("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0)).as("n_bigrams"),
        coalesce(col("min_prob"), lit(2.0)).as("min_prob"),
        coalesce(col("rare_count"), lit(0L)).as("rare_count"),
        (coalesce(col("rare_count"), lit(0L)) * rareDen <=
          coalesce(col("n_bigrams"), lit(0))).as("kept"))
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All are narrow
  * per-row transformations (no shuffle) built from codegen'd built-ins —
  * at 100 TB these run at scan speed.
  */
object TextOps {

  /** Generic stopword probes (the fallback profile for languages without a
    * dedicated list).
    */
  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "in")

  /** Per-language stopword profiles — the classic function-word lists of
    * each language (high-frequency closed-class words; the standard
    * stopword-probe language-ID signal). Overlaps between Romance
    * languages ('de', 'en', 'la', 'un' …) are linguistic reality — the
    * argmax in [[langGuess]] resolves them by evidence count. Logographic
    * scripts (zh) are not space-tokenized, so they get a charset branch,
    * not a profile.
    */
  val StopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "in", "to", "is", "it", "that",
      "for"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "en", "un", "une",
      "est"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "nicht",
      "mit", "von"),
    "es" -> Seq("el", "los", "las", "de", "y", "en", "un", "una", "es",
      "que")
  )

  /** Profile lookup order for tie-breaking in [[langGuess]] (first wins). */
  val ProfileOrder: Seq[String] = Seq("en", "fr", "de", "es")

  private def words(textCol: Column): Column = split(textCol, " ")

  private def isStop(w: Column): Column =
    TextOps.StopWords.map(s => w === lit(s)).reduce(_ || _)

  /** Per-document stats: token count, stopword count/ratio, average word
    * length (derived arithmetically from char count to stay exact:
    * single-space-joined text ⇒ wordChars = len - (n-1)).
    *
    * With `langCol` set, stopwords are counted against the DOCUMENT'S OWN
    * language profile ([[StopwordProfiles]]; fallback [[StopWords]] for
    * unprofiled languages) — an English stopword ratio is meaningless for
    * a French document. Occurrence counts, not distinct types (ratios feed
    * quality thresholds).
    */
  def stats(docs: DataFrame, idCol: String, textCol: String,
      langCol: Option[String] = None): DataFrame = {
    val ws = words(col(textCol))
    val nTok = size(ws).cast("long")
    def countIn(profile: Seq[String]) =
      size(filter(ws, w => w.isin(profile: _*)))
    val nStop = (langCol match {
      case None => size(filter(ws, isStop _))
      case Some(lc) =>
        ProfileOrder.foldRight(countIn(StopWords)) { (lang, els) =>
          when(col(lc) === lang, countIn(StopwordProfiles(lang))).otherwise(els)
        }
    }).cast("long")
    docs.select(
      col(idCol),
      nTok.as("n_tokens"),
      nStop.as("n_stop"),
      (nStop.cast("double") / nTok.cast("double")).as("stop_ratio"),
      ((length(col(textCol)).cast("double") - (nTok.cast("double") - 1)) /
        nTok.cast("double")).as("avg_word_len")
    )
  }

  /** Stopword-profile language ID: score each language by how many of its
    * profile words occur in the document (distinct-type evidence via
    * `array_intersect` — codegen'd, no interpreted lambda), take the
    * argmax; ties break in [[ProfileOrder]] order, zero evidence → "xx".
    * CJK codepoints short-circuit to "zh" first — logographic text is not
    * space-tokenized, so stopword probes are structurally blind there
    * (charset detection is the standard first tier).
    *
    * Scan-speed per-row classification; the whole cascade is one codegen'd
    * projection. Accuracy per language is measured in TextOpsSpec on real
    * sample sentences.
    */
  def langGuess(textCol: Column): Column = {
    val ws = words(textCol)
    val score = ProfileOrder.map(l =>
      l -> size(array_intersect(ws, lit(StopwordProfiles(l).toArray)))).toMap
    // first-wins argmax as a cascade: a language matches when its score is
    // positive and no LATER language strictly beats it (earlier ones
    // already failed, hence were strictly smaller)
    val cascade = ProfileOrder.zipWithIndex.foldRight(lit("xx")) {
      case ((lang, i), els) =>
        val laters = ProfileOrder.drop(i + 1)
        val wins = laters.foldLeft(score(lang) > 0) { (c, other) =>
          c && score(lang) >= score(other)
        }
        when(wins, lit(lang)).otherwise(els)
    }
    when(textCol.rlike("[\\u4e00-\\u9fff]"), lit("zh")).otherwise(cascade)
  }

  /** Token counts three ways: whitespace split, BPE-ish regex token classes,
    * and the chars/4 estimator used for LLM budget planning.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      size(split(col(textCol), "\\s+")).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col(textCol),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("re_tokens"),
      ceil(length(col(textCol)) / 4.0).cast("long").as("est_tokens")
    )

  /** Contiguous sequence packing — the "concatenate in corpus order and cut
    * every `budget` tokens" step that turns documents into fixed-length
    * training contexts. Per document: the pack its first token lands in,
    * the offset inside that pack, and whether the document straddles a cut
    * (real pipelines split those at the boundary).
    *
    * Scale shape: packing is inherently order-dependent, so the running
    * sum is computed per `shardCol` partition (language, source shard, …) —
    * each shard packs independently, exactly how multi-shard training
    * corpora are prepared, and no task ever sees more than one shard. A
    * single global pack order would be the 100 TB anti-pattern (one
    * worldwide sort partition).
    *
    * Arithmetic is integral end-to-end (IntegralDivide + pmod, the
    * [[graft.ops.EventOps.cohortRetention]] discipline), so any engine
    * reproduces the assignment exactly.
    *
    * @return input columns + (pack_id, pack_offset, spans_cut 0/1)
    */
  def packContiguous(docs: DataFrame, idCol: String, tokensCol: String,
      shardCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graftbridge.Bridge
    def intDiv(a: Column, b: Column): Column =
      Bridge.column(new IntegralDivide(
        Bridge.expression(a), Bridge.expression(b)))
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
    val endSum = sum(col(tokensCol)).over(w) // inclusive running total
    val start = endSum - col(tokensCol)      // this doc's first-token offset
    docs.select(col("*"),
      intDiv(start, lit(budget)).as("pack_id"),
      pmod(start, lit(budget)).as("pack_offset"),
      when(col(tokensCol) > 0 &&
          intDiv(endSum - 1, lit(budget)) > intDiv(start, lit(budget)),
        lit(1L)).otherwise(lit(0L)).as("spans_cut"))
  }

  /** Best-fit-decreasing sequence packing (the BFD family of Krell et al.
    * 2021, "Efficient Sequence Packing without Cross-contamination"):
    * within each shard, documents are placed longest-first into the open
    * pack with the LEAST remaining capacity that still fits; no fit opens
    * a new pack. Unlike [[packContiguous]] no document is ever split
    * across a context boundary (no cross-document attention
    * contamination), and pad waste is near-optimal — BFD uses at most
    * 11/9·OPT+1 bins (classic bin-packing bound). Documents longer than
    * the budget get a singleton pack, flagged `oversize` (real pipelines
    * pre-chunk those).
    *
    * Scale shape: packing is sequential only WITHIN a shard — the corpus
    * repartitions on the shard key and sorts (shard, len desc, id) within
    * partitions, then one mapPartitions pass walks each shard's docs with
    * a TreeMap of open-pack remainders (per-partition imperative state
    * with data-dependent eviction — the documented mapPartitions
    * exception). State is O(open packs of one shard); no task sees more
    * than its shards, and a single global pack order — one worldwide sort
    * partition — never exists.
    *
    * Determinism: the within-shard order (n desc, id) is total, each
    * shard lives in exactly one partition, and the best-fit tie-break at
    * equal remainders is the least-recently-enqueued pack at that
    * remainder value (the TreeMap queues are FIFO by when a pack last
    * ARRIVED at the remainder, not by pack open order) — so the
    * assignment is a pure function of the data, independent of cluster
    * layout (PackSpec's partitioning-invariance pins this).
    *
    * @return (idCol, shard, pack_id, pack_pos, pack_offset, oversize):
    *         pack ids are per-shard 0-based in open order; pack_pos is
    *         the doc's placement index inside its pack; pack_offset its
    *         first-token offset.
    */
  def packBestFit(docs: DataFrame, idCol: String, tokensCol: String,
      shardCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    import docs.sparkSession.implicits._
    val prepped = docs.select(
        col(idCol).cast("long").as("id"),
        col(tokensCol).cast("long").as("nt"),
        col(shardCol).cast("string").as("shard"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("nt").desc, col("id"))
      .as[(Long, Long, String)]
    prepped.mapPartitions { it =>
      var shard: String = null
      // remaining capacity → open packs at that remainder (FIFO = oldest
      // first, the deterministic tie-break)
      val byRem = new java.util.TreeMap[Long, scala.collection.mutable.Queue[Long]]()
      val fill = scala.collection.mutable.LongMap.empty[Long]
      val npos = scala.collection.mutable.LongMap.empty[Long]
      var nextPack = 0L
      it.map { case (id, nt0, sh) =>
        if (sh != shard) {
          shard = sh; byRem.clear(); fill.clear(); npos.clear(); nextPack = 0L
        }
        val nt = math.max(nt0, 0L)
        val oversize = nt > budget
        val fit = if (oversize) null else byRem.ceilingEntry(nt)
        val pack =
          if (fit == null) { val p = nextPack; nextPack += 1L; p }
          else {
            val q = fit.getValue
            val p = q.dequeue()
            if (q.isEmpty) byRem.remove(fit.getKey)
            p
          }
        val off = fill.getOrElse(pack, 0L)
        val pos = npos.getOrElse(pack, 0L)
        fill(pack) = off + nt
        npos(pack) = pos + 1L
        if (!oversize) {
          val rem = budget - (off + nt)
          if (rem > 0L)
            byRem.computeIfAbsent(rem, _ => scala.collection.mutable.Queue.empty)
              .enqueue(pack)
        }
        (id, sh, pack, pos, off, if (oversize) 1L else 0L)
      }
    }.toDF(idCol, shardCol, "pack_id", "pack_pos", "pack_offset", "oversize")
  }

  /** Rolling polynomial fingerprint over words, mod 1e9+7 — a deterministic
    * content signature cheap enough to compute at scan speed; collision
    * probability ~n²/2p. Left fold, so the DuckDB `list_reduce` oracle
    * matches exactly.
    */
  def fingerprint(textCol: Column): Column = {
    val perWord = transform(words(textCol),
      w => (length(w).cast("long") * 256 + ascii(w).cast("long")))
    aggregate(perWord, lit(0L), (h, v) => (h * 31 + v) % 1000000007L)
  }

  /** URL canonicalization for source-level dedup (the RefinedWeb /
    * CCNet-style "same page fetched under many URLs" pass that runs BEFORE
    * any content hashing): strip the scheme (case-insensitively), lowercase
    * the HOST only, strip a leading `www.`, the query/fragment, and a
    * trailing slash. The path keeps its case — URL paths are
    * case-sensitive per RFC 3986 §6.2.2.1 (only scheme and host are
    * case-insensitive), so folding the path would over-merge genuinely
    * distinct pages. Pure codegen'd `regexp` chain — canonicalization
    * happens at scan speed and the dedup itself is one groupBy on the
    * canonical key (the cheapest tier of the dedup ladder: no shingles, no
    * hashes, no pairs).
    */
  def normalizeUrl(url: Column): Column = {
    val noScheme = regexp_replace(url, "(?i)^https?://", "")
    // host = everything before the first path/query/fragment delimiter;
    // the anchored [^/?#]* always matches, so extract never returns null
    val host = regexp_replace(
      lower(regexp_extract(noScheme, "^[^/?#]*", 0)), "^www\\.", "")
    val rest = regexp_replace(
      regexp_replace(
        regexp_extract(noScheme, "^[^/?#]*(.*)$", 1), "[?#].*$", ""),
      "/$", "")
    concat(host, rest)
  }

  /** Full text-cleanup pipeline for hash-based dedup and downstream
    * tokenization: Unicode NFC composition (via the custom codegen
    * expression [[graft.functions.NfcNormalize]] — canonically-equal,
    * byte-different strings must collide in `dedup_exact`), C0/DEL
    * control characters to spaces, whitespace runs collapsed, ends
    * trimmed. Everything stays inside whole-stage codegen (the NFC step
    * emits a static Normalizer call; the rest is built-in regexps) and
    * evaluates at scan speed — no shuffle, no UDF.
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(graft.functions.TextNorm.nfc(c),
        "[\\x00-\\x1F\\x7F]", " "),
      "\\s+", " "))

  /** Boilerplate detection (C4-style, adapted to shingles since this corpus
    * has no line structure): a shingle is boilerplate when it appears in
    * ≥ `minDf` distinct documents; per doc, report how much of its content
    * is boilerplate. Downstream, `boiler_ratio` feeds a filter threshold
    * exactly like [[qualityScore]].
    *
    * Shape at scale: one distinct-shingle pass, a self-aggregated document
    * frequency (small — vocabulary-sized), one join back. The df side is
    * orders of magnitude smaller than the corpus and broadcast-friendly.
    */
  def boilerplateStats(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, minDf: Long = 5L): DataFrame = {
    // document frequency as a separate aggregate, broadcast back onto the
    // shingle rows: the df table is vocabulary-sized (tiny next to the
    // corpus) and the aggregate combines map-side. The earlier window-
    // over-partitionBy(s) form put EVERY row of a hot shingle on one task
    // with no partial aggregation — and boilerplate shingles are by
    // definition the hottest ones, a guaranteed straggler at corpus scale.
    val sh = Dedup.shingleRows(docs, idCol, textCol, shingleN)
    val df = sh.groupBy("s").agg(count(lit(1)).as("df"))
    sh.join(broadcast(df), "s")
      .groupBy(col("doc").as(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("n_boiler"))
      .withColumn("boiler_ratio",
        col("n_boiler").cast("double") / col("n_shingles").cast("double"))
  }

  /** Intra-document repetition signals (the Gopher/MassiveText corpus-
    * cleaning family): duplicate-word ratio, most-frequent-word fraction,
    * duplicate-bigram ratio. High values flag templated/spammy documents
    * for the quality filter.
    *
    * Shape at scale: explode → (doc, term) counts → per-doc roll-up — two
    * map-side-combinable aggregations, shuffling (doc, term) keys once; no
    * interpreted per-row lambdas. Docs with fewer than two words have no
    * bigrams; their `dup_bigram_ratio` is 0 (left join + coalesce).
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = docs.select(col(idCol),
      explode(split(col(textCol), " ")).as("w"))
    val wc = ws.groupBy(col(idCol), col("w")).agg(count(lit(1)).as("c"))
    val wordAgg = wc.groupBy(col(idCol)).agg(
      sum(col("c")).as("n_words"),
      count(lit(1)).as("n_distinct"),
      max(col("c")).as("top_c"))
    val bg = Dedup.shingleRows(docs, idCol, textCol, n = 2, distinct = false)
      .groupBy(col("doc").as(idCol), col("s")).agg(count(lit(1)).as("c"))
      .groupBy(idCol).agg(
        sum(col("c")).as("n_bi"),
        count(lit(1)).as("n_bi_distinct"))
    wordAgg.join(bg, Seq(idCol), "left")
      .select(col(idCol),
        col("n_words").cast("long").as("n_words"),
        ((col("n_words") - col("n_distinct")).cast("double") /
          col("n_words").cast("double")).as("dup_word_ratio"),
        (col("top_c").cast("double") / col("n_words").cast("double"))
          .as("top_word_frac"),
        coalesce((col("n_bi") - col("n_bi_distinct")).cast("double") /
          col("n_bi").cast("double"), lit(0.0)).as("dup_bigram_ratio"))
  }

  /** Pattern-occurrence counts per document — the extraction face of PII /
    * boilerplate screening (emails, URLs, digit runs). Pure per-row
    * regexp_extract_all counts at scan speed; patterns are kept to the
    * regex subset whose semantics agree across engines (the DuckDB oracle
    * runs RE2, Spark runs java.util.regex).
    */
  def patternStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def n(pat: String) =
      size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long")
    docs.select(col(idCol),
      n("[a-z0-9]+@[a-z0-9]+\\.[a-z]+").as("n_emails"),
      n("https?://[a-zA-Z0-9./]+").as("n_urls"),
      n("[0-9]+").as("n_numbers"))
  }

  /** Composite quality score in [0,1]: penalize extreme lengths, extreme
    * stopword ratios and single-char word floods. Weights are heuristic but
    * fixed — the operator shape (cheap per-row scoring feeding a filter
    * threshold) is what matters for pipeline use.
    */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), qualityExpr(col(textCol)).as("quality"))

  /** The score of [[qualityScore]] as a composable Column — lets pipeline
    * stages (CorpusPipeline) filter on quality without a join back.
    */
  def qualityExpr(textCol: Column): Column = {
    val ws = words(textCol)
    val nTok = size(ws).cast("double")
    val nStop = size(filter(ws, isStop _)).cast("double")
    val nShort = size(filter(ws, w => length(w) <= 1)).cast("double")
    val lenScore = when(nTok.between(5, 1000), lit(1.0)).otherwise(lit(0.2))
    val stopScore = when((nStop / nTok).between(0.01, 0.6), lit(1.0))
      .otherwise(lit(0.5))
    val shortScore = when(nShort / nTok <= 0.3, lit(1.0)).otherwise(lit(0.4))
    (lenScore * 0.4) + (stopScore * 0.3) + (shortScore * 0.3)
  }

  /** BM25 retrieval scoring of every document against a fixed term set
    * (Robertson–Spärck Jones; k1/b are the classic defaults in the
    * declared query). The idf uses the raw `(N−df+0.5)/(df+0.5)` ratio
    * rather than its ln — ln is not guaranteed bit-identical across math
    * libraries and the ratio preserves the ranking (ln is monotone), which
    * is what lets the DuckDB oracle hash-match scores exactly.
    *
    * Scale shape: per-document term counts are narrow expressions over the
    * token array (no explode, no shuffle); the corpus statistics (N, Σdl,
    * per-term df) reduce to ONE map-side-combinable aggregate row that
    * crosses the plan as a broadcast — the fact side never shuffles. The
    * corpus stats are integral-valued doubles, so their sums are exact in
    * any accumulation order; per-term scores add in fixed term order.
    *
    * @return one row per doc: (idCol, tf_<term>..., score)
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val ws = words(col(textCol))
    val base = docs.select(
      col(idCol) +: size(ws).cast("double").as("dl") +:
        terms.map(t =>
          size(filter(ws, w => w === t)).cast("double").as(s"tf_$t")): _*)
    val stats = base.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("dl")).as("sumdl") +:
        terms.map(t =>
          sum(when(col(s"tf_$t") > 0.0, 1.0).otherwise(0.0))
            .as(s"df_$t")): _*)
    def termScore(t: String) = {
      val idf = (col("n") - col(s"df_$t") + lit(0.5)) /
        (col(s"df_$t") + lit(0.5))
      // tf = 0 scores 0 by definition; guarding (rather than relying on a
      // zero numerator) keeps k1 = 0 ANSI-safe, where the denominator
      // degenerates to tf itself
      when(col(s"tf_$t") > 0.0,
        idf * (col(s"tf_$t") * lit(k1 + 1.0)) /
          (col(s"tf_$t") + lit(k1) *
            (lit(1.0 - b) + lit(b) * (col("dl") / (col("sumdl") / col("n"))))))
        .otherwise(lit(0.0))
    }
    base.crossJoin(broadcast(stats))
      .select(col(idCol) +:
        terms.map(t => col(s"tf_$t").cast("long").as(s"tf_$t")) :+
        terms.map(termScore).reduce(_ + _).as("score"): _*)
  }

  /** C4/Gopher-style keep/drop verdict: the FIRST failing rule as a string
    * (`keep` when none fails) — too_short (< 25 tokens), low_stopword
    * (stopword ratio < 2%), repetitive (duplicate-word ratio > 65%).
    * Shared by the `quality_filter` query and the streaming curation
    * ingest ([[graft.stream.CurationStream]]) so the two cannot drift.
    * All signals are narrow single-pass expressions; the comparisons are
    * divisions of small exact integers vs literals, bit-stable anywhere.
    */
  def qualityVerdict(textCol: Column): Column = {
    val ws = words(textCol)
    val nTok = size(ws)
    val stopRatio = size(filter(ws, w =>
      w.isin("the", "a", "of", "and", "in"))).cast("double") /
      nTok.cast("double")
    val dupRatio = (nTok - size(array_distinct(ws))).cast("double") /
      nTok.cast("double")
    when(nTok < 25, "too_short")
      .when(stopRatio < 0.02, "low_stopword")
      .when(dupRatio > 0.65, "repetitive")
      .otherwise("keep")
  }

  /** Fixed-size sliding-window chunking: split each document into
    * `size`-char chunks starting every `stride` chars (overlap =
    * size - stride) — the context-window preparation step of an LLM
    * training pipeline (tokenizer-based splitting composes the same plan
    * with a token-offset array in place of char offsets).
    *
    * Narrow per-row explode — no shuffle; output size is
    * ceil(len/stride) rows per doc. Empty documents yield no chunks.
    *
    * @return (idCol, chunk_idx, chunk) — chunk_idx = 0-based window index
    */
  def chunkFixed(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive, got $stride")
    require(size >= stride, s"size ($size) < stride ($stride) drops text")
    docs
      .where(length(col(textCol)) > 0)
      .select(col(idCol), col(textCol),
        posexplode(sequence(lit(0), length(col(textCol)) - 1, lit(stride)))
          .as(Seq("chunk_idx", "off")))
      .select(col(idCol), col("chunk_idx").cast("long"),
        col(textCol).substr(col("off") + 1, lit(size)).as("chunk"))
  }

  /** PII scrubbing: redact email addresses and long digit runs (ids, phone
    * numbers) with typed placeholder tokens — the redaction counterpart of
    * [[patternStats]] (same engine-portable regex subset). Emails are
    * replaced first so their digit-bearing local parts don't leak into the
    * digit pass. Pure per-row regexp_replace at scan speed.
    *
    * @return (idCol, scrubbed, n_redacted) — n_redacted counts replaced
    *         spans, for an audit/quality gate downstream
    */
  def piiScrub(docs: DataFrame, idCol: String, textCol: String,
      minDigitRun: Int = 6): DataFrame = {
    require(minDigitRun >= 1, s"minDigitRun must be >= 1, got $minDigitRun")
    val email = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
    val digits = s"[0-9]{$minDigitRun,}"
    // digit runs are counted on the email-scrubbed text: a run inside an
    // email's local part is consumed by the email pass, not the digit pass
    val deEmailed = regexp_replace(col(textCol), email, "<EMAIL>")
    docs.select(col(idCol),
      regexp_replace(deEmailed, digits, "<NUM>").as("scrubbed"),
      (size(regexp_extract_all(col(textCol), lit(email), lit(0))) +
        size(regexp_extract_all(deEmailed, lit(digits), lit(0))))
        .cast("long").as("n_redacted"))
  }
}

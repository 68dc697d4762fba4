package graft

import org.apache.spark.sql.functions._

import graft.ext.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("stats: hand-checked example") {
    val df = Seq((1L, "the cat sat on a mat")).toDF("doc_id", "text")
    val r = TextOps.stats(df, "doc_id", "text").collect().head
    assert(r.getAs[Long]("n_tokens") == 6)
    assert(r.getAs[Long]("n_stop") == 2)          // "the", "a"
    assert(math.abs(r.getAs[Double]("stop_ratio") - 2.0 / 6) < 1e-12)
    // chars = 20, word chars = 20 - 5 = 15, avg = 2.5
    assert(math.abs(r.getAs[Double]("avg_word_len") - 2.5) < 1e-12)
  }

  test("fingerprint: deterministic, order-sensitive, content-sensitive") {
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "gamma beta alpha"), (4L, "alpha beta delta")
    ).toDF("doc_id", "text")
    val fp = df.select(col("doc_id"),
      TextOps.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    assert(fp(1L) != fp(4L))
    assert(fp.values.forall(v => v >= 0 && v < 1000000007L))
  }

  test("token counts: whitespace vs regex vs estimator") {
    val df = Seq((1L, "ab cd12 ef!")).toDF("doc_id", "text")
    val r = TextOps.tokenCounts(df, "doc_id", "text").collect().head
    assert(r.getAs[Long]("ws_tokens") == 3)
    // regex classes: [ab][cd][12][ef][!]
    assert(r.getAs[Long]("re_tokens") == 5)
    assert(r.getAs[Long]("est_tokens") == math.ceil(11 / 4.0).toLong)
  }

  test("langGuess: per-language accuracy on real sample sentences") {
    // 4 real sentences per profiled language + zh (CJK branch) + one with
    // no evidence; accuracy is asserted PER LANGUAGE, not just overall
    val samples = Seq(
      // en
      ("en", "the quick brown fox jumps over the lazy dog in a field"),
      ("en", "it is a truth universally acknowledged that a man wants a wife"),
      ("en", "to be or not to be that is the question for all of us"),
      ("en", "the report and the appendix are in the folder for review"),
      // fr
      ("fr", "le chat est sur la table et les livres sont dans un coin"),
      ("fr", "la vie est belle et le temps des cerises reviendra un jour"),
      ("fr", "les enfants de la patrie chantent une chanson et des refrains"),
      ("fr", "un homme est entre dans le jardin avec une lanterne et des cles"),
      // de
      ("de", "der hund und die katze sind nicht mit dem kind im garten"),
      ("de", "das ist ein gutes buch und der autor ist nicht bekannt"),
      ("de", "die sonne scheint und ein vogel singt mit einem lied von oben"),
      ("de", "der zug ist nicht mit der zeit von einem gleis gefahren"),
      // es
      ("es", "el perro y el gato estan en la casa de los abuelos que viven alli"),
      ("es", "una cancion que las ninas cantan en el patio de la escuela"),
      ("es", "los libros de historia son un tesoro que el tiempo guarda"),
      ("es", "es un dia de sol y las calles estan llenas de gente que pasea"),
      // zh (CJK charset branch — logographic, not space-tokenized)
      ("zh", "今天天气很好我们去公园散步"),
      ("zh", "机器学习是人工智能的一个分支"),
      // no stopword evidence at all
      ("xx", "spark engine motor turbine")
    ).zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) }
      .toDF("doc_id", "lang", "text")
    val got = samples.select(col("lang"),
        TextOps.langGuess(col("text")).as("g"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val perLang = got.groupBy(_._1).map { case (l, xs) =>
      l -> xs.count(x => x._2 == x._1).toDouble / xs.length
    }
    // every language must classify ALL its samples correctly
    perLang.foreach { case (l, acc) =>
      assert(acc == 1.0, s"lang $l accuracy $acc: ${got.filter(_._1 == l).toSeq}")
    }
  }

  test("stats with langCol counts each document's own profile") {
    val df = Seq(
      (1L, "en", "the cat sat on a mat"),       // the, a → 2
      (2L, "fr", "le chat est sur la table"),   // le, est, la → 3
      (3L, "zh", "the a spark engine"),         // fallback generic: the, a → 2
      (4L, "de", "der hund und die katze")      // der, und, die → 3
    ).toDF("doc_id", "lang", "text")
    val r = TextOps.stats(df, "doc_id", "text", langCol = Some("lang"))
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("n_stop"))
      .toMap
    assert(r == Map(1L -> 2L, 2L -> 3L, 3L -> 2L, 4L -> 3L))
  }

  test("repetition stats: hand-checked duplicate/top/bigram fractions") {
    // doc 1 "a a a b": 4 words, 2 distinct → dup_word_ratio 0.5; top "a"
    // 3/4; bigrams [a a, a a, a b]: 3 total, 2 distinct → dup 1/3
    // doc 2 "x y": no repetition anywhere
    // doc 3 one word: no bigrams → dup_bigram_ratio 0 by contract
    val df = Seq((1L, "a a a b"), (2L, "x y"), (3L, "solo"))
      .toDF("doc_id", "text")
    val r = TextOps.repetitionStats(df, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_words"), x.getAs[Double]("dup_word_ratio"),
          x.getAs[Double]("top_word_frac"),
          x.getAs[Double]("dup_bigram_ratio"))).toMap
    assert(r(1L) == ((4L, 0.5, 0.75, 1.0 / 3)))
    assert(r(2L) == ((2L, 0.0, 0.5, 0.0)))
    assert(r(3L) == ((1L, 0.0, 1.0, 0.0)))
  }

  test("pattern stats count emails, urls and digit runs") {
    val df = Seq(
      (1L, "contact bob@example.com or visit https://example.com/page 42 times in 2024"),
      (2L, "no patterns here at all")
    ).toDF("doc_id", "text")
    val r = TextOps.patternStats(df, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        (x.getAs[Long]("n_emails"), x.getAs[Long]("n_urls"),
          x.getAs[Long]("n_numbers"))).toMap
    assert(r(1L) == ((1L, 1L, 2L)))
    assert(r(2L) == ((0L, 0L, 0L)))
  }

  test("boilerplate stats flag shingles shared across enough docs") {
    // the 4-word prefix "spark shuffles data fast" yields 2 shared 3-gram
    // shingles present in all 3 docs; each doc's tail shingles are unique
    val df = Seq(
      (1L, "spark shuffles data fast alpha beta gamma"),
      (2L, "spark shuffles data fast delta epsilon zeta"),
      (3L, "spark shuffles data fast eta theta iota")
    ).toDF("doc_id", "text")
    val r = TextOps.boilerplateStats(df, "doc_id", "text",
        shingleN = 3, minDf = 3L)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_shingles"), x.getAs[Long]("n_boiler")))).toMap
    // 7 words ⇒ 5 shingles/doc; 2 boilerplate (the shared prefix ones)
    assert(r == Map(1L -> ((5L, 2L)), 2L -> ((5L, 2L)), 3L -> ((5L, 2L))))
  }

  test("quality score components") {
    val good = Seq((1L, "the quick brown fox jumps over a lazy dog today"))
      .toDF("doc_id", "text")
    val tiny = Seq((2L, "hi there")).toDF("doc_id", "text")
    val q1 = TextOps.qualityScore(good, "doc_id", "text")
      .collect().head.getAs[Double]("quality")
    val q2 = TextOps.qualityScore(tiny, "doc_id", "text")
      .collect().head.getAs[Double]("quality")
    assert(q1 > q2)
    assert(math.abs(q1 - 1.0) < 1e-9)
  }

  test("chunkFixed: windows tile the text with the declared overlap") {
    val text = "abcdefghijklmnopqrstuvwxyz" // 26 chars
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = TextOps.chunkFixed(df, "doc_id", "text", size = 10, stride = 6)
      .orderBy("chunk_idx").collect()
    // offsets 0,6,12,18,24 — the final windows are short, never dropped
    assert(r.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(r.map(_.getString(2)).toSeq == Seq(
      "abcdefghij", "ghijklmnop", "mnopqrstuv", "stuvwxyz", "yz"))
    // stride = size ⇒ an exact partition that reassembles the text
    val parts = TextOps.chunkFixed(df, "doc_id", "text", size = 6, stride = 6)
      .orderBy("chunk_idx").collect().map(_.getString(2))
    assert(parts.mkString == text)
    // empty docs yield no chunks
    val e = TextOps.chunkFixed(Seq((2L, "")).toDF("doc_id", "text"),
      "doc_id", "text", size = 10, stride = 6)
    assert(e.count() == 0)
  }

  test("piiScrub: emails and long digit runs are redacted and counted") {
    val df = Seq(
      (1L, "contact bob123@mail.com or 123456789 ok 42"),
      (2L, "no pii here 123")
    ).toDF("id", "text")
    val r = TextOps.piiScrub(df, "id", "text").orderBy("id").collect()
    // the email's embedded digits are consumed by the email pass; the
    // 9-digit run by the digit pass; "42" is below the default threshold
    assert(r(0).getString(1) == "contact <EMAIL> or <NUM> ok 42")
    assert(r(0).getLong(2) == 2)
    assert(r(1).getString(1) == "no pii here 123")
    assert(r(1).getLong(2) == 0)
    // minDigitRun = 1 scrubs every number (the telemetry-scrub setting)
    val all = TextOps.piiScrub(df, "id", "text", minDigitRun = 1)
      .orderBy("id").collect()
    assert(all(1).getString(1) == "no pii here <NUM>")
    assert(all(1).getLong(2) == 1)
  }

  test("contiguous packing assigns packs, offsets and cut flags per shard") {
    // shard a: 300 + 300 + 500 + 0 tokens; shard b: 600 — budget 512
    val docs = Seq(
      (1L, "a", 300L), (2L, "a", 300L), (3L, "a", 500L),
      (4L, "b", 600L), (5L, "a", 0L)
    ).toDF("doc_id", "lang", "n_tokens")
    val r = TextOps.packContiguous(docs, "doc_id", "n_tokens", "lang",
        budget = 512L).collect()
      .map(x => x.getLong(0) ->
        ((x.getAs[Long]("pack_id"), x.getAs[Long]("pack_offset"),
          x.getAs[Long]("spans_cut")))).toMap
    assert(r(1L) == ((0L, 0L, 0L)))   // fits pack 0 whole
    assert(r(2L) == ((0L, 300L, 1L))) // starts at 300, crosses the 512 cut
    assert(r(3L) == ((1L, 88L, 1L)))  // starts at 600 = pack 1 offset 88
    assert(r(5L) == ((2L, 76L, 0L)))  // zero-token doc: placed, never cut
    assert(r(4L) == ((0L, 0L, 1L)))   // shard b packs independently
  }

  test("bm25: parameter semantics — k1=0 is set-membership, b=0 drops length norm") {
    // doc 1: one 'cat'; doc 2: many 'cat's, longer; doc 3: same tf vector
    // as doc 1 but much longer; doc 4: no query terms
    val df = Seq(
      (1L, "cat sits here quietly today"),
      (2L, "cat cat cat cat sits sits here here now then"),
      (3L, "cat sits here quietly today with lots of extra trailing words" +
        " padding the document far beyond the first one"),
      (4L, "nothing relevant at all appears inside this one")
    ).toDF("doc_id", "text")
    def scores(k1: Double, b: Double): Map[Long, Double] =
      TextOps.bm25(df, "doc_id", "text", Seq("cat", "sits"), k1, b)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score"))
        .toMap

    // k1 = 0: tf and length cancel — any doc containing both terms scores
    // exactly the same; a doc with neither scores 0
    val s0 = scores(k1 = 0.0, b = 0.75)
    assert(s0(1L) == s0(2L) && s0(2L) == s0(3L))
    assert(s0(4L) == 0.0)

    // b = 0: no length normalization — docs 1 and 3 (identical tf, very
    // different lengths) tie exactly; doc 2's higher tf wins
    val sb = scores(k1 = 1.2, b = 0.0)
    assert(sb(1L) == sb(3L))
    assert(sb(2L) > sb(1L))

    // defaults: length normalization separates 1 from 3 (3 is longer, so
    // its per-term score deflates)
    val sd = scores(k1 = 1.2, b = 0.75)
    assert(sd(1L) > sd(3L))
  }

  test("normalizeUrl strips each noise dimension and only those") {
    val cases = Seq(
      // scheme (any case), HOST case, www., query, fragment, trailing
      // slash — removed; the PATH keeps its case (RFC 3986: only scheme
      // and host are case-insensitive)
      "HTTPS://WWW.Example.COM/Page/37/?utm_source=feed#frag" ->
        "example.com/Page/37",
      "http://example.com/page/37" -> "example.com/page/37",
      // host folds, path does not: /A and /a are DIFFERENT pages
      "https://Example.com/A" -> "example.com/A",
      "https://example.com/a" -> "example.com/a",
      // www only as a leading label; an inner "www." survives
      "https://sub.www.example.com/a" -> "sub.www.example.com/a",
      // ? or # alone each cut the tail
      "example.com/a#frag" -> "example.com/a",
      "example.com/a?x=1" -> "example.com/a",
      // query with no path: host only
      "EXAMPLE.com?x=1" -> "example.com",
      // only ONE trailing slash is a fetch artifact; a path is untouched
      "example.com/a/b/" -> "example.com/a/b",
      // no noise at all: identity
      "example.com" -> "example.com")
    val got = cases.map(_._1).toDF("url")
      .select(TextOps.normalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0))
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"normalizeUrl($in)")
    }
  }

  test("urlDedup collapses fetch variants to one keeper per page") {
    import graft.ext.Dedup
    val df = Seq(
      (10L, "HTTP://www.site.org/doc/1/"),
      (11L, "https://site.org/doc/1?sess=9"),
      (12L, "https://site.org/doc/1#top"),
      (20L, "https://site.org/doc/2"),
      (21L, "http://SITE.ORG/doc/2/")
    ).toDF("doc_id", "url")
    val r = Dedup.urlDedup(df, "doc_id", "url")
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r == Map(
      "site.org/doc/1" -> (3L, 10L),
      "site.org/doc/2" -> (2L, 20L)))
  }

  test("NfcNormalize composes canonically-equal strings (codegen + interpreted)") {
    import graft.functions.{NfcNormalize, TextNorm}
    // codegen path (through a DataFrame projection)
    val decomposed = "caf" + "e\u0301" // e + combining acute
    val composed = "caf\u00e9"
    val got = Seq(decomposed, composed, "plain").toDF("s")
      .select(TextNorm.nfc(col("s")).as("n"))
      .collect().map(_.getString(0))
    assert(got(0) == composed && got(1) == composed && got(2) == "plain")
    // interpreted path (eval, no codegen) must agree — including the
    // already-normalized fast path returning the input value
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = NfcNormalize(Literal(decomposed))
    assert(e.eval(null).toString == composed)
    assert(NfcNormalize(Literal(composed)).eval(null).toString == composed)
    assert(NfcNormalize(Literal.create(null,
      org.apache.spark.sql.types.StringType)).eval(null) == null)
  }

  test("normalizeText: NFC + control strip + whitespace collapse + trim") {
    val raw = "a\tb c  caf" + "e\u0301 \r\n d "
    val got = Seq(raw).toDF("s")
      .select(TextOps.normalizeText(col("s")).as("n")).head().getString(0)
    assert(got == "a b c caf\u00e9 d")
  }

  test("urlDedup filters null/empty URLs instead of cross-merging them") {
    import graft.ext.Dedup
    val df = Seq(
      (1L, Option("https://site.org/x")),
      (2L, None),             // url-less docs must NOT become
      (3L, None),             // mutual duplicates of each other
      (4L, Option("")),
      (5L, Option("https://site.org/x/"))
    ).toDF("doc_id", "url")
    val r = Dedup.urlDedup(df, "doc_id", "url")
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r == Map("site.org/x" -> (2L, 1L)))
  }
}

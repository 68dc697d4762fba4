package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drift guard for the hand-maintained counts in README/SURVEY/ARCHITECTURE
  * (they drifted twice in round 3): every count-bearing token in the docs is
  * derived here from the code itself and the build fails on mismatch.
  *
  * Canonical token formats the docs must use for CURRENT counts (historical
  * narrative must phrase numbers differently or it will be checked too):
  *   - `N-query inventory`   — SparkEntry.queries.size
  *   - `N oracle-checked`    — SparkEntry.oracleSql.size
  *   - `N ScalaTest`         — total registered test cases across suites
  */
class CountsSpec extends AnyFunSuite {

  private val docs = Seq("README.md", "SURVEY.md", "ARCHITECTURE.md")

  private def tokens(re: scala.util.matching.Regex): Seq[(String, Int)] =
    docs.flatMap { d =>
      val src = scala.io.Source.fromFile(d, "UTF-8")
      val text = try src.mkString finally src.close()
      re.findAllMatchIn(text).map(m => d -> m.group(1).toInt).toSeq
    }

  test("every 'N-query inventory' doc token matches SparkEntry.queries") {
    val want = SparkEntry.queries.size
    val got = tokens("(\\d+)-query inventory".r)
    assert(got.nonEmpty, "no '-query inventory' token found in any doc")
    got.foreach { case (d, n) =>
      assert(n == want, s"$d says $n-query inventory; code declares $want")
    }
  }

  test("every 'N oracle-checked' doc token matches SparkEntry.oracleSql") {
    val want = SparkEntry.oracleSql.size
    val got = tokens("(\\d+) oracle-checked".r)
    assert(got.nonEmpty, "no 'oracle-checked' token found in any doc")
    got.foreach { case (d, n) =>
      assert(n == want, s"$d says $n oracle-checked; code declares $want")
    }
  }

  // ---- "oracle-exact" claim guard (round-4 postmortem: SURVEY §8 called
  // doc_pack oracle-exact while the driver's CORRECTNESS file had it red) ----

  /** hash_match per query from the newest CORRECTNESS_r*.json:
    * Some(true)=green, Some(false)=red, None=no_oracle. Empty if the driver
    * has not produced one yet.
    */
  private def latestCorrectness(): Map[String, Option[Boolean]] = {
    val files = new java.io.File(".").listFiles()
      .filter(f => f.getName.matches("CORRECTNESS_r\\d+\\.json")).sortBy(_.getName)
    if (files.isEmpty) return Map.empty
    val src = scala.io.Source.fromFile(files.last, "UTF-8")
    val text = try src.mkString finally src.close()
    "\"(\\w+)\":\\s*\\{([^{}]*)\\}".r.findAllMatchIn(text).map { m =>
      val hm = "\"hash_match\":\\s*(true|false|null)".r
        .findFirstMatchIn(m.group(2)).map(_.group(1))
      m.group(1) -> (hm match {
        case Some("true") => Some(true)
        case Some("false") => Some(false)
        case _ => None
      })
    }.toMap
  }

  /** Names claimed oracle-exact by `text` that the correctness map
    * contradicts. A claim span is introduced by an "oracle-exact …:" list
    * header (e.g. "additions (all oracle-exact at sf0.01 unless noted):")
    * and runs to the first sentence period at parenthesis depth 0 — so
    * incidental mentions of a query elsewhere in a paragraph are not
    * claims. A name inside a span is exempt when its immediately-following
    * parenthetical notes a non-oracle verification (no-oracle / rows-only /
    * value-checked / error-gated / a Spec / an acknowledged driver-red).
    */
  private[graft] def oracleClaimViolations(
      text: String,
      correctness: Map[String, Option[Boolean]]): Seq[String] = {
    val queryNames = SparkEntry.queries.keySet
    val marker =
      "(?i)(no[- ]?(sql )?oracle|rows-only|value-check|error-gated|scalatest|spec|driver-red|hash-red)".r
    // header: "oracle-exact" then a colon within 80 chars; a gap containing
    // a backtick or table pipe is prose/table noise, not a list header
    // A span never crosses a paragraph break, never exceeds maxSpan chars,
    // and close-parens can't drive depth negative (round-6 postmortem: an
    // unbalanced ')' in historical prose made one span swallow 11.8k chars
    // of later paragraphs and flag their rows-only queries).
    val maxSpan = 1500
    def atBlankLine(text: String, i: Int): Boolean = {
      if (text(i) != '\n') return false
      var j = i + 1
      while (j < text.length && (text(j) == ' ' || text(j) == '\t')) j += 1
      j >= text.length || text(j) == '\n'
    }
    val spans = "(?s)oracle-exact(.{0,80}?):".r.findAllMatchIn(text).flatMap { h =>
      if (h.group(1).exists(c => c == '`' || c == '|')) None
      else {
        var i = h.end; var depth = 0
        while (i < text.length && i - h.end < maxSpan &&
            !atBlankLine(text, i) &&
            !(depth == 0 && text(i) == '.' &&
            (i + 1 >= text.length || text(i + 1).isWhitespace))) {
          if (text(i) == '(') depth += 1
          else if (text(i) == ')') depth = math.max(0, depth - 1)
          i += 1
        }
        Some(text.substring(h.end, math.min(i + 1, text.length)))
      }
    }.toSeq
    def trailingParen(span: String, from: Int): String = {
      val open = span.indexOf('(', from)
      // only a note directly attached to the name counts (allow "`x`/`y` (")
      if (open < 0 ||
          span.slice(from, open).exists(c => !" `/,\n".contains(c)))
        return ""
      var depth = 0; var i = open
      while (i < span.length && (depth > 0 || i == open)) {
        if (span(i) == '(') depth += 1
        else if (span(i) == ')') depth -= 1
        i += 1
      }
      span.substring(open, math.min(i, span.length))
    }
    for {
      span <- spans
      m <- "`(\\w+)`".r.findAllMatchIn(span)
      name = m.group(1)
      if queryNames.contains(name)
      if !marker.findFirstIn(trailingParen(span, m.end)).isDefined
      verdict <- correctness.get(name) // unknown to the driver yet: skip
      if verdict != Some(true)
    } yield s"'$name' claimed oracle-exact but latest CORRECTNESS says " +
      (if (verdict.isEmpty) "no_oracle" else "hash_match=false")
  }

  test("docs never call a red or no-oracle query oracle-exact") {
    val correctness = latestCorrectness()
    assume(correctness.nonEmpty, "no CORRECTNESS_r*.json yet")
    val bad = docs.flatMap { d =>
      val src = scala.io.Source.fromFile(d, "UTF-8")
      val text = try src.mkString finally src.close()
      oracleClaimViolations(text, correctness).map(v => s"$d: $v")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("the claim guard catches a planted false claim") {
    // real query ids (the name filter requires them), planted verdicts:
    // doc_pack red and unnoted -> must be reported; agg_approx_distinct
    // no-oracle but carries a note -> exempt
    val planted =
      "Round-N additions (all oracle-exact at sf0.01): `doc_pack` (a packing\n" +
        "operator), `agg_approx_distinct` (sketch tier; no SQL oracle, error-gated).\n"
    val real = oracleClaimViolations(planted,
      Map("doc_pack" -> Some(false), "agg_approx_distinct" -> None))
    assert(real.size == 1 && real.head.contains("doc_pack"),
      s"planted red claim not caught: $real")
  }

  test("claim spans stop at unbalanced parens and paragraph breaks") {
    // an unbalanced ')' inside the span must not let it swallow the next
    // paragraph's rows-only queries (the round-6 runaway)
    val planted =
      "new oracle-exact queries: `doc_pack` (per step)) done here.\n" +
        "\n" +
        "Later paragraph: `agg_approx_distinct` is rows-only.\n"
    val real = oracleClaimViolations(planted,
      Map("doc_pack" -> Some(true), "agg_approx_distinct" -> None))
    assert(real.isEmpty, s"span ran past the paragraph break: $real")
  }

  test("every 'N ScalaTest' doc token matches the registered test count") {
    // instantiate each suite and count its REGISTERED tests — QueriesSpec
    // et al. generate tests from SparkEntry.queries at construction, so a
    // source-level `test(` grep would undercount
    def specs(dir: java.io.File, pkg: String): Seq[String] =
      dir.listFiles().toSeq.flatMap { f =>
        if (f.isDirectory) specs(f, s"$pkg${f.getName}.")
        else if (f.getName.endsWith("Spec.scala"))
          Seq(pkg + f.getName.stripSuffix(".scala"))
        else Seq.empty
      }
    val total = specs(new java.io.File("src/test/scala/graft"), "graft.")
      .sorted
      .map { cn =>
        Class.forName(cn).getDeclaredConstructor().newInstance()
          .asInstanceOf[AnyFunSuite].testNames.size
      }.sum
    val got = tokens("(\\d+) ScalaTest".r)
    assert(got.nonEmpty, "no 'ScalaTest' token found in any doc")
    got.foreach { case (d, n) =>
      assert(n == total, s"$d says $n ScalaTest cases; suites register $total")
    }
  }
}

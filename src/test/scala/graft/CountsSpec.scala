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

  test("every 'N ScalaTest' doc token matches the registered test count") {
    // instantiate each suite and count its REGISTERED tests — QueriesSpec
    // et al. generate tests from SparkEntry.queries at construction, so a
    // source-level `test(` grep would undercount
    val specDir = new java.io.File("src/test/scala/graft")
    val total = specDir.listFiles().map(_.getName)
      .filter(_.endsWith("Spec.scala")).sorted
      .map { f =>
        Class.forName("graft." + f.stripSuffix(".scala"))
          .getDeclaredConstructor().newInstance()
          .asInstanceOf[AnyFunSuite].testNames.size
      }.sum
    val got = tokens("(\\d+) ScalaTest".r)
    assert(got.nonEmpty, "no 'ScalaTest' token found in any doc")
    got.foreach { case (d, n) =>
      assert(n == total, s"$d says $n ScalaTest cases; suites register $total")
    }
  }
}

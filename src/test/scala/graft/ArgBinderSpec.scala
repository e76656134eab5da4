package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Prop, Test => SCTest}

class ArgBinderSpec extends AnyFunSuite {

  test("sniffs literal types long → double → timestamp → date → string") {
    assert(ArgBinder.literal("42") == "42")
    assert(ArgBinder.literal("-7") == "-7")
    assert(ArgBinder.literal("3.14") == "3.14")
    assert(ArgBinder.literal("1e6") == "1e6")
    assert(ArgBinder.literal("2024-01-02 03:04:05") == "TIMESTAMP '2024-01-02 03:04:05'")
    assert(ArgBinder.literal("2024-01-02") == "DATE '2024-01-02'")
    assert(ArgBinder.literal("abc") == "'abc'")
  }

  test("binds $N positionally and repeatably (PG style, test.postgres.sql:12)") {
    val sql = "SELECT * FROM t WHERE a = $1 AND b > $2 AND c = $1"
    assert(ArgBinder.bind(sql, Seq("u1", "5")) ==
      "SELECT * FROM t WHERE a = 'u1' AND b > 5 AND c = 'u1'")
  }

  test("binds ? in order of appearance (MySQL style, test.sql.sample)") {
    assert(ArgBinder.bind("SELECT ? + ?", Seq("1", "x")) == "SELECT 1 + 'x'")
  }

  test("leaves placeholders inside quotes and comments untouched") {
    assert(ArgBinder.bind("SELECT '$1?', a FROM t WHERE b = $1", Seq("9")) ==
      "SELECT '$1?', a FROM t WHERE b = 9")
    assert(ArgBinder.bind("SELECT 1 -- what about $1?\n , $1", Seq("2")) ==
      "SELECT 1 -- what about $1?\n , 2")
    assert(ArgBinder.bind("SELECT ? AS a /* why? $2 */ FROM t", Seq("1")) ==
      "SELECT 1 AS a /* why? $2 */ FROM t")
  }

  test("backslash-escaped quotes inside strings don't desync the scanner") {
    assert(ArgBinder.bind("""SELECT 'it\'s ?', ? FROM t""", Seq("5")) ==
      """SELECT 'it\'s ?', 5 FROM t""")
  }

  test("missing args are an error (driver would reject too)") {
    intercept[IllegalArgumentException](ArgBinder.bind("SELECT $2", Seq("a")))
    intercept[IllegalArgumentException](ArgBinder.bind("SELECT ?, ?", Seq("a")))
  }

  test("string args can never escape their quotes (injection guard)") {
    val prop = Prop.forAll { (s: String) =>
      val lit = ArgBinder.literal(s)
      // a quoted literal's interior must contain no lone quote and no odd
      // backslash run (a trailing `\` would escape the closing quote)
      !lit.startsWith("'") || {
        val interior = lit.substring(1, lit.length - 1)
        val residue = interior.replace("\\\\", "").replace("''", "")
        !residue.contains("'") && !residue.contains("\\")
      }
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("quoted literals round-trip through the real Spark parser (injection guard)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val parser = TestSpark.spark.sessionState.sqlParser
    val prop = Prop.forAll { (s: String) =>
      ArgBinder.literal(s) match {
        case lit if lit.startsWith("'") =>
          // literal() trims args before sniffing, so the round-trip target is s.trim
          parser.parseExpression(lit) match {
            case Literal(v, _) => (if (v == null) "" else v.toString) == s.trim
            case other         => false
          }
        case _ => true // numeric/date sniffed args are not quote-delimited
      }
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("backslash-tail args cannot swallow the closing quote (ADVICE r1)") {
    // before the fix, arg1 ending in '\' escaped its closing quote and arg2's
    // content executed as raw SQL
    import org.apache.spark.sql.catalyst.expressions.Literal
    val args = Seq("x\\", "', 1); DROP TABLE t; --")
    val bound = ArgBinder.bind("SELECT ? AS a, ? AS b", args)
    assert(bound.contains("'x\\\\'"))
    val plan = TestSpark.spark.sessionState.sqlParser.parsePlan(bound)
    // both args must survive as literal VALUES — nothing leaked into the plan
    val lits = plan.expressions.flatMap(_.collect { case Literal(v, _) if v != null => v.toString })
    assert(lits == args)
  }

  test("validationForm yields parse-able SQL for both placeholder styles") {
    val spark = TestSpark.spark
    spark.sessionState.sqlParser.parsePlan(
      ArgBinder.validationForm("SELECT * FROM t WHERE a = $1 AND b < ?"))
  }
}

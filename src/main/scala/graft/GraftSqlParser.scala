package graft

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** The reference corpus's JSON access operators as SQL surface:
  * `payload->'key'` (JSON value, chains) and `payload->>'key'` (text) —
  * datafusion-functions-json's operators, registered wholesale by the
  * reference (/root/reference/src/udfs.rs:13-16) and used throughout its
  * test corpus (tests/bin/tests.sql:56-58,219-224). Spark's grammar has
  * no operator extension point, but it HAS a parser injection point —
  * this rewriter maps the operators onto the already-shipped
  * `json_get`/`json_as_text` aliases before delegation, so corpus SQL
  * runs verbatim.
  *
  * Grammar collision, resolved by form: Spark SQL spells LAMBDAS with
  * `->` (`transform(a, x -> x + 1)`). The rewrite therefore fires ONLY
  * on the TIGHT form with a string-literal key — `expr->'key'` /
  * `expr->>'key'`, no whitespace around the operator — which is how the
  * corpus writes it and how a lambda never is (a tight constant-string
  * lambda body `x->'a'` would be taken as JSON access; write lambdas
  * with conventional spacing, which is left untouched). String literals,
  * quoted identifiers, and comments are never rewritten; the left
  * operand may be an identifier chain or a trailing function call /
  * parenthesized expression (so chains like `payload->'a'->'b'` fold
  * left-to-right into nested `json_get` calls).
  */
object ArrowSql {

  def rewrite(sql: String): String = {
    var s = sql
    var next = rewriteOnce(s)
    while (next != null) { s = next; next = rewriteOnce(s) }
    s
  }

  /** One leftmost rewrite, or null when no tight arrow remains. */
  private def rewriteOnce(s: String): String = {
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\'') i = skipString(s, i, '\'')
      else if (c == '"') i = skipString(s, i, '"')
      else if (c == '`') i = skipString(s, i, '`')
      else if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-')
        i = skipLineComment(s, i)
      else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*')
        i = skipBlockComment(s, i)
      else if (c == '-' && i + 1 < n && s.charAt(i + 1) == '>') {
        val opLen = if (i + 2 < n && s.charAt(i + 2) == '>') 3 else 2
        val j = i + opLen
        if (i > 0 && isLeftEnd(s.charAt(i - 1)) && j < n && s.charAt(j) == '\'') {
          val litEnd = skipString(s, j, '\'')
          val leftStart = scanLeft(s, i - 1)
          if (leftStart >= 0 && leftStart < i) {
            val f = if (opLen == 3) "json_as_text" else "json_get"
            return s.substring(0, leftStart) + f + "(" +
              s.substring(leftStart, i) + ", " + s.substring(j, litEnd) +
              ")" + s.substring(litEnd)
          }
        }
        i = j
      } else i += 1
    }
    null
  }

  private def isLeftEnd(c: Char): Boolean =
    c.isLetterOrDigit || c == '_' || c == '$' || c == ')' || c == '`'

  /** Start index of the left operand ending at `last` (inclusive): a
    * trailing balanced paren group (its args' string literals skipped)
    * plus any identifier chain before it.
    */
  private def scanLeft(s: String, last: Int): Int = {
    var i = last
    if (s.charAt(i) == ')') {
      var depth = 0
      var done = false
      while (i >= 0 && !done) {
        val ch = s.charAt(i)
        if (ch == '\'') {
          i -= 1
          while (i >= 0 && s.charAt(i) != '\'') i -= 1
          i -= 1
        } else {
          if (ch == ')') depth += 1
          else if (ch == '(') { depth -= 1; if (depth == 0) done = true }
          i -= 1
        }
      }
      if (!done) return -1
    }
    while (i >= 0 && (s.charAt(i).isLetterOrDigit ||
        s.charAt(i) == '_' || s.charAt(i) == '$' || s.charAt(i) == '.' ||
        s.charAt(i) == '`')) {
      if (s.charAt(i) == '`') {
        i -= 1
        while (i >= 0 && s.charAt(i) != '`') i -= 1
        i -= 1
      } else i -= 1
    }
    i + 1
  }

  /** Index just past the closing quote (doubled-quote and backslash
    * escapes honored; backtick identifiers have no backslash escapes).
    */
  private def skipString(s: String, start: Int, q: Char): Int = {
    var i = start + 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && q != '`') i += 2
      else if (c == q) {
        if (i + 1 < s.length && s.charAt(i + 1) == q) i += 2
        else return i + 1
      } else i += 1
    }
    i
  }

  private def skipLineComment(s: String, start: Int): Int = {
    var i = start + 2
    while (i < s.length && s.charAt(i) != '\n') i += 1
    i
  }

  private def skipBlockComment(s: String, start: Int): Int = {
    var i = start + 2
    while (i + 1 < s.length &&
      !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
    math.min(i + 2, s.length)
  }
}

/** Delegating parser injected via [[GraftExtensions]]: plan/query/
  * expression texts pass through [[ArrowSql.rewrite]] first; identifier
  * and type parsing delegate untouched.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(ArrowSql.rewrite(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(ArrowSql.rewrite(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(ArrowSql.rewrite(sqlText))
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Registry

/** Pins the oracle-SQL playbook rule that escaped twice in round 9
  * (the repo's 217th and 218th queries): DuckDB widens `sum(BIGINT)`
  * to HUGEINT (Arrow decimal128), and the driver's correctness hash
  * is TYPE-sensitive, so any integer sum that reaches an output
  * column uncast hash-mismatches even when every value is identical.
  *
  * The lint flags each `sum(` occurrence (excluding `list_sum(`,
  * which DuckDB evaluates element-wise without widening) unless one
  * of these textual safety patterns holds:
  *   1. immediately wrapped: `CAST(sum(...)`;
  *   2. the argument contains a float literal → DOUBLE sum, no
  *      widening;
  *   3. the first use after the call (past an optional OVER group)
  *      is a comparison or division → boolean/DOUBLE result;
  *   4. a paren group ENCLOSING the sum is a `CAST(... AS BIGINT)` /
  *      `CAST(... AS DOUBLE)` (e.g. `CAST(COALESCE(sum(..), 0) AS
  *      BIGINT)`) — checked structurally, so an unrelated cast on an
  *      adjacent select-list column cannot satisfy it (r10 advisory).
  * The residue — intermediate CTE sums whose every downstream use is
  * cast or compared — is whitelisted BY ALIAS below with the reason;
  * the whitelist is asserted exact (no stale entries), so adding a
  * new uncast integer sum fails this spec until the author either
  * casts it (the playbook default) or consciously whitelists it.
  *
  * The authoritative empirical gate is tools/check_oracle.py, which
  * fails any oracle whose Arrow result schema contains decimal128;
  * this spec is the compile-time-adjacent early warning.
  */
class OracleStyleSpec extends AnyFunSuite {

  /** (query, alias-or-context) pairs allowed to stay uncast: every
    * one is an intermediate consumed only by a comparison, a double
    * division, an ORDER BY rank, or a cast at the final SELECT.
    */
  private val whitelist: Map[String, Set[String]] = Map(
    // ADC distance used only for ORDER BY ... LIMIT shortlisting
    "ann_pq" -> Set("adist"),
    "ann_pq_indexed" -> Set("adist"),
    // shares annPqSql verbatim (refreshed index == one-shot index)
    "ann_pq_refreshed" -> Set("adist"),
    // image mean*64 compared against cell values only
    "multimodal_phash" -> Set("sv"),
    "multimodal_phash_near" -> Set("sv"),
    // running char sum feeds floor(../4096.0) double division
    "pipe_pack" -> Set("cum"),
    // same chain wrapped by the utilization histogram
    "pipe_pack_eval" -> Set("cum"),
    // running token sum: `cum <= 20000` filter + CAST(max(cum)..)
    "pipe_token_budget" -> Set("cum"),
    // cumulative/total counts compared in the CASE, outputs cast
    "q_quantile_sketch" -> Set("cum", "tot"),
    // session id is a GROUP BY key, never an output column
    "q_session_window" -> Set("sess"),
    // same lag+cumsum sessionizer, same group-key-only use
    "ts_session_funnel" -> Set("sess"),
    // corpus totals feed CAST(c AS DOUBLE)/tot double divisions
    "text_kl_divergence" -> Set("tot_s", "c_c", "tot_c"),
    // sweep-line counter output via CAST(max(conc) AS BIGINT)
    "ts_concurrency" -> Set("conc"))

  private val sumRe = "(?i)(?<![A-Za-z_])sum\\s*\\(".r
  private val floatLit = ".*\\d\\.\\d.*".r

  /** End index (exclusive) of the group opened at `open` (a '('). */
  private def balancedEnd(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    s.length
  }

  /** Aliases (or context snippets) of unsafe uncast sums in `sql`. */
  def uncastSums(sql: String): Seq[String] =
    sumRe.findAllMatchIn(sql).flatMap { m =>
      val before = sql.substring(math.max(0, m.start - 24), m.start)
      val castWrapped =
        before.replaceAll("\\s", "").toUpperCase.endsWith("CAST(")
      val openParen = sql.indexOf('(', m.start)
      val close = balancedEnd(sql, openParen)
      val arg = sql.substring(openParen + 1, close - 1)
      val doubleArg = floatLit.pattern.matcher(
        arg.replace('\n', ' ')).matches()
      // skip an OVER (...) group to find the first real use
      var after = sql.substring(close)
      val overM = "(?is)^\\s*OVER\\s*\\(".r.findFirstMatchIn(after)
      overM.foreach { om =>
        val oEnd = balancedEnd(after, after.indexOf('(', om.start))
        after = after.substring(oEnd)
      }
      val trimmed = after.dropWhile(_.isWhitespace)
      val comparedOrDivided =
        trimmed.headOption.exists("<>=/".contains(_))
      // STRUCTURAL outer-cast check (r10 advisory tightened the old
      // any-'AS BIGINT)'-within-60-chars window, which an unrelated
      // cast on an adjacent column could satisfy): safe iff some
      // paren group ENCLOSING this sum is a CAST whose type keyword
      // closes that same group — i.e. the cast provably applies to
      // the expression containing the sum.
      val enclosingCast = {
        var found = false
        var o = sql.indexOf('(')
        while (o >= 0 && o < m.start && !found) {
          if (balancedEnd(sql, o) >= close) {
            // token boundary required: BROADCAST(...) or a UDF named
            // `recast` must not count as an enclosing CAST (ADVICE
            // r11) — checked on the RAW prefix (stripping whitespace
            // first would glue 'SELECT CAST' into SELECTCAST and
            // reject the legitimate form too)
            if ("(?is)(?:^|[^A-Za-z0-9_])CAST\\s*$".r
                .findFirstIn(sql.substring(0, o)).isDefined) {
              val inner = sql
                .substring(o + 1, balancedEnd(sql, o) - 1)
                .replaceAll("\\s+", " ").trim.toUpperCase
              found = inner.endsWith("AS BIGINT") ||
                inner.endsWith("AS DOUBLE")
            }
          }
          o = sql.indexOf('(', o + 1)
        }
        found
      }
      if (castWrapped || doubleArg || comparedOrDivided ||
          enclosingCast) None
      else {
        val aliasM =
          "(?is)^\\s*AS\\s+([A-Za-z_][A-Za-z0-9_]*)".r
            .findFirstMatchIn(trimmed)
        Some(aliasM.map(_.group(1)).getOrElse(
          sql.substring(m.start,
            math.min(sql.length, m.start + 50)).replaceAll("\\s+", " ")))
      }
    }.toSeq

  test("no oracle lets an integer sum reach output uncast") {
    val offenders = Registry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val bad =
          uncastSums(sql).filterNot(whitelist.getOrElse(name, Set.empty))
        if (bad.isEmpty) None
        else Some(s"$name: ${bad.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      "uncast sum( in oracle SQL — DuckDB widens sum(BIGINT) to " +
        "HUGEINT/decimal128 and the driver hash is type-sensitive; " +
        "CAST(... AS BIGINT/DOUBLE) per the determinism playbook, or " +
        "whitelist the alias here with a downstream-use justification:\n" +
        offenders.mkString("\n"))
  }

  test("whitelist is exact — no stale entries") {
    whitelist.foreach { case (name, aliases) =>
      val sql = Registry.oracleSql.getOrElse(name,
        fail(s"whitelisted query $name not in registry"))
      val found = uncastSums(sql).toSet
      val stale = aliases -- found
      assert(stale.isEmpty,
        s"$name whitelists ${stale.mkString(", ")} but the lint no " +
          "longer flags them — remove the stale entries")
    }
  }

  test("the lint is red on both round-9 escaped oracles") {
    // the exact pre-fix fragments from Graph.pagerankSql and the
    // q_cumulative_distinct oracle (CORRECTNESS_r09's only two fails)
    val pagerankR9 =
      """SELECT e.dst, sum(p.r // o.outdeg) AS s
        |FROM e JOIN o ON e.src = o.src JOIN r0 p ON e.src = p.node
        |GROUP BY e.dst""".stripMargin
    val cumulativeR9 =
      """SELECT event_type, day, n_new_users,
        |  sum(n_new_users) OVER (PARTITION BY event_type ORDER BY day)
        |    AS cum_users
        |FROM d ORDER BY event_type, day""".stripMargin
    assert(uncastSums(pagerankR9) == Seq("s"))
    assert(uncastSums(cumulativeR9) == Seq("cum_users"))
    // and green on the fixed forms
    assert(uncastSums(pagerankR9.replace("sum(p.r // o.outdeg) AS s",
      "CAST(sum(p.r // o.outdeg) AS BIGINT) AS s")).isEmpty)
  }

  test("an unrelated adjacent cast no longer satisfies the lint") {
    // the r10-advisory false pass: the old 60-char window accepted
    // any 'AS BIGINT)' nearby, even one casting a DIFFERENT column
    val adjacent = "SELECT sum(a) AS s, CAST(b AS BIGINT) AS t FROM x"
    assert(uncastSums(adjacent) == Seq("s"))
    // while a cast genuinely enclosing the sum (through COALESCE, on
    // a later line, etc.) stays safe
    val enclosing =
      """SELECT CAST(COALESCE(sum(a), 0)
        |  AS BIGINT) AS s, b FROM x""".stripMargin
    assert(uncastSums(enclosing).isEmpty)
    val enclosingDouble =
      "SELECT CAST(sum(a) * 3 AS DOUBLE) AS s FROM x"
    assert(uncastSums(enclosingDouble).isEmpty)
  }
}

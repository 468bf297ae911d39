package graft.sqlapi

/** Conservative Postgres-dialect → Spark SQL normalizer, for running the
  * reference's PG-flavored queries unchanged (SURVEY §7 "Dialect" risk:
  * the reference accepts `expr::type` casts and `'\xAB'` bytea literals,
  * e.g. tests/tests/scan.rs:453). Token-aware: single-quoted strings pass
  * through untouched; only clearly-shaped constructs rewrite, anything
  * ambiguous is left as-is (Spark then reports the original text, never a
  * silently different query).
  *
  * Rewrites:
  *   - `X::type` → `CAST(X AS type)` where X is an identifier, a number, a
  *     quoted literal, or a flat parenthesized group; chains left-to-right
  *     (`a::int::text` → CAST(CAST(a AS INT) AS STRING)).
  *   - PG type names → Spark (int2/int4/int8, float4/float8, text, bytea,
  *     timestamptz, bool).
  *   - `E'\xAB'` / `'\xAB'` hex bytea literals → `X'AB'`.
  *   - `"Ident"` double-quoted identifiers → backtick-quoted. In PG a
  *     double-quoted token is ALWAYS an identifier; passing it through
  *     would make Spark (ANSI double-quoted-identifiers off) read it as a
  *     STRING LITERAL — `WHERE "VendorID" = 1` silently comparing a
  *     constant, the exact wrongness a dialect layer exists to prevent
  *     (reference usage: tests/tests/scan.rs:577).
  *   - `ROW(a, b)` constructors → `struct(a, b)` (the reference's
  *     duckdb_types fixture uses ROW for struct values,
  *     tests/tests/fixtures/tables/duckdb_types.rs:143).
  */
object PgDialect {

  private val typeMap = Map(
    "int2" -> "SMALLINT", "int4" -> "INT", "int8" -> "BIGINT",
    "float4" -> "FLOAT", "float8" -> "DOUBLE",
    "text" -> "STRING", "varchar" -> "STRING", "bytea" -> "BINARY",
    "bool" -> "BOOLEAN", "timestamptz" -> "TIMESTAMP",
    "numeric" -> "DECIMAL(38,18)",
    // PG json/jsonb values are TEXT on the wire; Spark's analogue of a
    // json-typed expression is the json string itself (extraction below
    // maps the `->>` operator). reference: tests/tests/json.rs:295-305.
    "json" -> "STRING", "jsonb" -> "STRING")

  private[sqlapi] def mapType(t: String): String =
    typeMap.getOrElse(t.toLowerCase, t.toUpperCase)

  /** Split into alternating unquoted/quoted segments (quoted kept verbatim,
    * including '' escapes and double-quoted identifiers). Shared with the
    * PREPARE $n scanner so parameter markers inside string literals stay
    * literal text (PG semantics). */
  private[sqlapi] def segments(sql: String): Seq[(String, Boolean)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, Boolean)]()
    val cur = new StringBuilder
    var i = 0
    var quote: Char = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (quote == 0 && (c == '\'' || c == '"')) {
        if (cur.nonEmpty) { out += ((cur.toString, false)); cur.clear() }
        quote = c; cur.append(c)
      } else if (quote != 0 && c == quote) {
        // '' (and "" in identifiers) is an escaped quote, not a terminator
        if (i + 1 < sql.length && sql.charAt(i + 1) == c) {
          cur.append(c).append(c); i += 1
        } else {
          cur.append(c); out += ((cur.toString, true)); cur.clear(); quote = 0
        }
      } else cur.append(c)
      i += 1
    }
    if (cur.nonEmpty) out += ((cur.toString, quote != 0))
    out.toSeq
  }

  // castee alternatives, most specific first: flat function call (so chained
  // casts re-match the CAST(..) emitted by the previous pass), identifier,
  // number, flat parenthesized group
  private val castee =
    """([A-Za-z_][A-Za-z_0-9.]*\((?:[^()])*\)|[A-Za-z_][A-Za-z_0-9.]*|\d+(?:\.\d+)?|\((?:[^()])*\))"""
  // single-word type names only (multiword `double precision` style is not
  // used with `::` in the reference's tests; greedy spaces would over-match)
  private val typename = """([A-Za-z_][A-Za-z_0-9]*(?:\(\d+(?:,\s*\d+)?\))?)"""
  private val castRe = (castee + """\s*::\s*""" + typename).r

  // bytea hex literal: '\xAB..' (standard) or '\\xAB..' (inside an E''
  // escape string, where PG collapses the doubled backslash first)
  private val hexLit = "'(?:\\\\){1,2}x([0-9A-Fa-f]*)'".r
  private val leadingCast = ("""^\s*::\s*""" + typename).r

  // PG encode(bytea,'hex') / decode(text,'hex') → Spark lower(hex(..)) /
  // unhex(..). Inner expression may nest parens two levels deep (enough for
  // the reference's decode(encode('hello','hex'),'hex') shape,
  // tests/tests/scan.rs:368); anything deeper passes through untouched and
  // Spark reports the original text.
  private val innerExpr = """(?:[^()]|\((?:[^()]|\([^()]*\))*\))*"""
  private val encodeHexRe = ("""(?i)\bencode\s*\((""" + innerExpr + """?),\s*'hex'\s*\)""").r
  private val decodeHexRe = ("""(?i)\bdecode\s*\((""" + innerExpr + """?),\s*'hex'\s*\)""").r

  // PG `expr ->> 'key'` (json field as text) → get_json_object(expr,
  // '$.key'). Runs after cast rewriting, so the LHS is either a CAST(..)
  // produced from `col::json` or a bare identifier. `->` (field as JSON,
  // result KEEPS json quoting — get_json_object would strip it) maps to
  // the native pg_json_get expression instead; text keys select object
  // fields, integer keys select array elements, PG-faithful NULLs.
  // reference: tests/tests/json.rs:295-305 and the PG operator family.
  // PG input has no lambda syntax, but a SPARK-dialect lambda with a bare
  // integer body (`transform(a, x -> 0)`) could be fed through executePg;
  // isLambdaParam detects the higher-order-function context and leaves the
  // arrow alone rather than silently turning it into a json access.
  // LHS forms an arrow can hang off: a CAST(..) from `col::json`, a
  // pg_json_get(..) emitted by a previous arrow pass (chains), or a bare
  // identifier. SEGMENT-AWARE: a text key is the NEXT quoted segment, so
  // the stitch happens across the boundary and a string literal that
  // merely CONTAINS arrow text stays data (same discipline as the
  // table-function swap in SqlApi).
  private val arrowLhs =
    """(CAST\((?:[^()]|\([^()]*\))*\)|pg_json_get\((?:[^()]|\([^()]*\))*\)|[A-Za-z_][A-Za-z_0-9.]*)"""
  private val arrowTailRe = (arrowLhs + """\s*(->>|->)\s*$""").r
  private val arrowIntRe = (arrowLhs + """\s*->(?!>)\s*(-?\d+)""").r
  private val bareIdentRe = """[A-Za-z_][A-Za-z_0-9.]*""".r

  // Spark's higher-order functions, whose last arguments are lambdas
  private val hofNames = Set("transform", "filter", "exists", "forall",
    "aggregate", "reduce", "zip_with", "map_filter", "map_zip_with",
    "transform_keys", "transform_values", "array_sort")

  /** True when the bare identifier starting at `identStart` is a lambda
    * parameter of a Spark higher-order function — directly after `(` or `,`
    * of a call whose callee is in [[hofNames]]. Such an `x -> 0` must NOT
    * be rewritten to a json access. Conservative: when the enclosing open
    * paren is outside this segment the answer is false (rewrite proceeds,
    * the pre-existing behavior).
    */
  private def isLambdaParam(seg: String, identStart: Int): Boolean = {
    var j = identStart - 1
    while (j >= 0 && seg(j).isWhitespace) j -= 1
    if (j < 0 || (seg(j) != '(' && seg(j) != ',')) return false
    if (seg(j) == ',') {
      // walk back to the unmatched '(' that opens this argument list
      var depth = 0
      var k = j - 1
      var open = -1
      while (k >= 0 && open < 0) {
        seg(k) match {
          case ')' => depth += 1
          case '(' => if (depth == 0) open = k else depth -= 1
          case _ =>
        }
        k -= 1
      }
      if (open < 0) return false
      j = open
    }
    var e = j - 1
    while (e >= 0 && seg(e).isWhitespace) e -= 1
    var s = e
    while (s >= 0 && (seg(s).isLetterOrDigit || seg(s) == '_')) s -= 1
    s < e && hofNames.contains(seg.substring(s + 1, e + 1).toLowerCase)
  }

  // DuckDB table functions in their BARE single-path form map to Spark's
  // path-table syntax: read_parquet('p') → parquet.`p` (likewise csv/json).
  // Optioned forms (read_csv('p', header=true, ...)) do NOT rewrite — the
  // options belong to Catalog.attach, and a silent partial mapping would be
  // wrong; Spark then errors on the original text, loudly.
  private val readFnRe =
    """(?i)\bread_(parquet|csv|json)\s*\(\s*'([^']+)'\s*\)""".r

  private val rowCtorRe = """(?i)(?<![A-Za-z_0-9.])ROW\s*\(""".r

  def rewrite(sql: String): String = {
    val segs = segments(sql)
    // build output as a segment list so "the previous segment" is exact
    val out = scala.collection.mutable.ArrayBuffer[(String, Boolean)]()
    segs.foreach { case (seg, quoted) =>
      if (quoted) {
        seg match {
          case hexLit(h) =>
            // bytea hex literal '\xAB..' → X'AB..'; eat a bare E prefix
            // (PG escape-string syntax) left at the end of the previous
            // unquoted segment
            if (out.nonEmpty && !out.last._2) {
              val (p, _) = out.last
              if (p.matches("""(?s).*(?<![A-Za-z_0-9])[Ee]$"""))
                out(out.length - 1) = (p.dropRight(1), false)
            }
            out += ((s"X'$h'", true))
          case _ if seg.startsWith("\"") =>
            // PG double-quoted identifier → Spark backticks ("" unescapes
            // to ", backticks in the name escape as ``)
            val inner = seg.substring(1, seg.length - 1)
              .replace("\"\"", "\"").replace("`", "``")
            out += ((s"`$inner`", true))
          case _ =>
            // PG escape-string E'...' with no backslash escapes is a plain
            // string — drop the bare E prefix (e.g. the reference's E''
            // empty-bytea literal, tests/tests/scan.rs:370)
            if (!seg.contains("\\") && out.nonEmpty && !out.last._2) {
              val (p, _) = out.last
              if (p.matches("""(?s).*(?<![A-Za-z_0-9])[Ee]$"""))
                out(out.length - 1) = (p.dropRight(1), false)
            }
            out += ((seg, true))
        }
      } else {
        // rewrite casts repeatedly until no plain `X::type` remains
        var s = seg
        var prev: String = null
        while (prev != s) {
          prev = s
          s = castRe.replaceAllIn(s, m =>
            java.util.regex.Matcher.quoteReplacement(
              s"CAST(${m.group(1)} AS ${mapType(m.group(2).trim)})"))
        }
        // PG ROW(...) constructor → struct(...). Guarded by the immediate
        // open paren: ROW_NUMBER()/ROWS BETWEEN never match.
        s = rowCtorRe.replaceAllIn(s, "struct(")
        // PG CREATE VIEW over foreign tables lands in the session namespace,
        // exactly as the reference pushes CREATE VIEW into its engine
        // (src/hooks/utility/view.rs:31-98): attached tables ARE session temp
        // views here, and a permanent Spark view cannot reference them. An
        // explicit TEMP/TEMPORARY/MATERIALIZED keyword is left untouched.
        // Per-SEGMENT so a string literal mentioning CREATE VIEW stays data.
        s = createViewRe.replaceAllIn(s, "$1TEMP VIEW")
        // a quoted literal directly before `::type` spans two segments:
        // stitch `'lit'` + leading `::type` here
        leadingCast.findFirstMatchIn(s) match {
          case Some(m) if out.nonEmpty && out.last._2 =>
            val (lit, _) = out.last
            out(out.length - 1) = (s"CAST($lit AS ${mapType(m.group(1).trim)})", false)
            s = s.substring(m.matched.length)
          case _ => ()
        }
        out += ((s, false))
      }
    }
    // --- json arrows, SEGMENT-AWARE, to fixpoint for chains: the stitch
    // joins an unquoted tail `lhs ->(>)` with its quoted-literal key, so
    // `a -> 'b' ->> 'c'` nests left-to-right and literals containing arrow
    // text are never rewritten
    def coalesceUnquoted(): Unit = {
      var i = 0
      while (i + 1 < out.length) {
        if (!out(i)._2 && !out(i + 1)._2) {
          out(i) = ((out(i)._1 + out(i + 1)._1, false)); out.remove(i + 1)
        } else i += 1
      }
    }
    var changed = true
    while (changed) {
      changed = false
      coalesceUnquoted()
      // integer-key arrows live entirely inside one unquoted segment
      var i = 0
      while (i < out.length) {
        val (seg, q) = out(i)
        if (!q) {
          val r2 = arrowIntRe.replaceAllIn(seg, m => {
            val lhsIsBareIdent = bareIdentRe.pattern.matcher(m.group(1)).matches()
            if (lhsIsBareIdent && isLambdaParam(seg, m.start(1)))
              java.util.regex.Matcher.quoteReplacement(m.matched)
            else
              java.util.regex.Matcher.quoteReplacement(
                s"pg_json_get(${m.group(1)}, ${m.group(2)})")
          })
          if (r2 != seg) { out(i) = ((r2, false)); changed = true }
        }
        i += 1
      }
      // text-key arrows: unquoted tail + quoted key segment
      i = 1
      while (i < out.length) {
        val (lit, q) = out(i)
        if (q && lit.startsWith("'") && !out(i - 1)._2) {
          arrowTailRe.findFirstMatchIn(out(i - 1)._1) match {
            case Some(m) =>
              val rawInner = lit.substring(1, lit.length - 1)
              val callOpt =
                if (m.group(2) == "->")
                  // SQL escaping ('' pairs) passes through verbatim
                  Some(s"pg_json_get(${m.group(1)}, '$rawInner')")
                else if (!rawInner.contains("'"))
                  // ->> builds a json-path literal: plain keys only
                  Some(s"get_json_object(${m.group(1)}, '$$.$rawInner')")
                else None
              callOpt match {
                case Some(call) =>
                  out(i - 1) = ((out(i - 1)._1.substring(0, m.start) + call, false))
                  out.remove(i)
                  changed = true
                case None => i += 1
              }
            case None => i += 1
          }
        } else i += 1
      }
    }

    // whole-string post-pass: hex-codec function mapping spans quoted and
    // unquoted segments (the arguments are string literals), so it runs on
    // the reassembled text, to fixpoint for nested calls
    var res = out.map(_._1).mkString
    var prevRes: String = null
    while (prevRes != res) {
      prevRes = res
      res = encodeHexRe.replaceAllIn(res, m =>
        java.util.regex.Matcher.quoteReplacement(s"lower(hex(${m.group(1).trim}))"))
      res = decodeHexRe.replaceAllIn(res, m =>
        java.util.regex.Matcher.quoteReplacement(s"unhex(${m.group(1).trim})"))
    }
    res = readFnRe.replaceAllIn(res, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"${m.group(1).toLowerCase}.`${m.group(2)}`"))
    res
  }

  private val createViewRe =
    """(?i)\b(CREATE\s+(?:OR\s+REPLACE\s+)?)VIEW\b""".r
}

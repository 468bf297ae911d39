package graft.sqlapi

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import scala.collection.mutable

/** The Postgres foreign-data-wrapper DDL lifecycle, runnable verbatim.
  *
  * The reference IS an FDW: its tests stand tables up with
  * `CREATE FOREIGN DATA WRAPPER parquet_wrapper HANDLER parquet_fdw_handler
  * VALIDATOR parquet_fdw_validator` → `CREATE SERVER` → `CREATE USER
  * MAPPING ... OPTIONS (type 'S3', ...)` → `CREATE FOREIGN TABLE t (cols)
  * SERVER s OPTIONS (files '...')` (reference:
  * tests/tests/fixtures/arrow.rs:287-330, nyc_trips.rs:62-113). This module
  * accepts those statements through `SqlApi.executePg` and maps them onto
  * the session catalog:
  *
  *   - handler proc name → format, by the `*_fdw_handler` convention
  *     (reference: src/fdw/handler.rs:33-44);
  *   - USER MAPPING OPTIONS → `Secrets` (the reference turns the mapping
  *     into an engine secret at connection, src/fdw/base.rs:96-134);
  *   - FOREIGN TABLE → `Catalog.attach` (or `Schemas.attachIn` when the
  *     name is schema-qualified), with declared PG column types mapped to a
  *     Spark read schema — `()` means infer, the reference's auto schema
  *     creation (src/fdw/base.rs:60-92).
  *
  * Registries are driver-side metadata, per session, and die with it —
  * nothing here touches the data path.
  */
object FdwDdl {

  final case class FdwError(msg: String) extends IllegalArgumentException(msg)

  /** Handler proc name → attach format (reference src/fdw/handler.rs:33-44).
    * Anything else is FdwHandler::Other — usable only by some other FDW, so
    * CREATE FOREIGN TABLE against it fails with the reference's error shape
    * ("got unexpected fdw_handler", src/fdw/base.rs:254). */
  val handlerFormats: Map[String, String] = Map(
    "csv_fdw_handler" -> "csv",
    "json_fdw_handler" -> "json",
    "parquet_fdw_handler" -> "parquet",
    "delta_fdw_handler" -> "delta",
    "iceberg_fdw_handler" -> "iceberg",
    "spatial_fdw_handler" -> "spatial")

  final case class Wrapper(handler: Option[String], validator: Option[String])
  final case class Server(wrapper: String, options: Map[String, String])

  final class State {
    val wrappers = mutable.LinkedHashMap[String, Wrapper]()
    val servers = mutable.LinkedHashMap[String, Server]()
    // (user, server) → credential options; lookup by server (any user)
    val mappings = mutable.LinkedHashMap[(String, String), Map[String, String]]()
    // attached table key ("schema.table" or "table", lowercased) → server
    val tables = mutable.LinkedHashMap[String, String]()
  }

  private val states = new java.util.WeakHashMap[SparkSession, State]()
  def stateFor(spark: SparkSession): State = states.synchronized {
    var s = states.get(spark)
    if (s == null) { s = new State; states.put(spark, s) }
    s
  }

  private val ddlHeadRe =
    """(?is)^\s*(?:CREATE|DROP)\s+(?:FOREIGN\s+DATA\s+WRAPPER|FOREIGN\s+TABLE|SERVER|USER\s+MAPPING)\b.*""".r

  /** Cheap router probe: is this statement FDW DDL this module owns? */
  def isDdl(sql: String): Boolean = ddlHeadRe.pattern.matcher(sql).matches()

  // ------------------------------------------------------------- lexer
  private sealed trait Tok
  private final case class Word(text: String) extends Tok // bare ident/keyword/number
  private final case class QIdent(name: String) extends Tok // "..." (case-preserved)
  private final case class Lit(value: String) extends Tok // '...' (unescaped)
  private final case class Punct(c: Char) extends Tok

  private def lex(sql: String): Vector[Tok] = {
    val toks = Vector.newBuilder[Tok]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val d = sql.charAt(i)
          if (d == '\'' && i + 1 < n && sql.charAt(i + 1) == '\'') { sb.append('\''); i += 2 }
          else if (d == '\'') { closed = true; i += 1 }
          else { sb.append(d); i += 1 }
        }
        if (!closed) throw FdwError("unterminated string literal in FDW DDL")
        toks += Lit(sb.toString)
      } else if (c == '"') {
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val d = sql.charAt(i)
          if (d == '"' && i + 1 < n && sql.charAt(i + 1) == '"') { sb.append('"'); i += 2 }
          else if (d == '"') { closed = true; i += 1 }
          else { sb.append(d); i += 1 }
        }
        if (!closed) throw FdwError("unterminated quoted identifier in FDW DDL")
        toks += QIdent(sb.toString)
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') i += 1
      } else if ("(),.;".indexOf(c) >= 0) { toks += Punct(c); i += 1 }
      else if (c.isLetterOrDigit || c == '_' || c == '$') {
        val start = i
        while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_' || sql.charAt(i) == '$')) i += 1
        toks += Word(sql.substring(start, i))
      } else throw FdwError(s"unexpected character `$c` in FDW DDL")
    }
    toks.result()
  }

  // ------------------------------------------------------------ parser
  private final class Cursor(toks: Vector[Tok]) {
    private var pos = 0
    def atEnd: Boolean = pos >= toks.length ||
      (toks(pos) == Punct(';') && pos == toks.length - 1)
    def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    def next(): Tok =
      if (pos < toks.length) { val t = toks(pos); pos += 1; t }
      else throw FdwError("unexpected end of FDW DDL statement")
    /** Consume `kw` (case-insensitive bare word) if present. */
    def accept(kw: String): Boolean = peek match {
      case Some(Word(w)) if w.equalsIgnoreCase(kw) => pos += 1; true
      case _ => false
    }
    def expect(kw: String): Unit =
      if (!accept(kw)) throw FdwError(
        s"expected `$kw` in FDW DDL, found ${peek.getOrElse("end of statement")}")
    def acceptPunct(c: Char): Boolean = peek match {
      case Some(Punct(p)) if p == c => pos += 1; true
      case _ => false
    }
    def expectPunct(c: Char): Unit =
      if (!acceptPunct(c)) throw FdwError(
        s"expected `$c` in FDW DDL, found ${peek.getOrElse("end of statement")}")
    /** An identifier part: bare word (PG would case-fold; Spark views are
      * case-insensitive so the text is kept) or quoted (case-preserved). */
    def ident(): String = next() match {
      case Word(w) => w
      case QIdent(q) => q
      case other => throw FdwError(s"expected identifier, found $other")
    }
    /** `name` or `schema.name`. */
    def qualifiedName(): (Option[String], String) = {
      val first = ident()
      if (acceptPunct('.')) (Some(first), ident()) else (None, first)
    }
    /** OPTIONS `(k 'v', ...)` — keys lowercase, values verbatim. */
    def optionsList(): Map[String, String] = {
      expectPunct('(')
      val m = mutable.LinkedHashMap[String, String]()
      if (!acceptPunct(')')) {
        var more = true
        while (more) {
          val k = ident().toLowerCase
          next() match {
            case Lit(v) => m(k) = v
            case other => throw FdwError(
              s"option `$k` needs a quoted value, found $other")
          }
          more = acceptPunct(',')
        }
        expectPunct(')')
      }
      m.toMap
    }
  }

  // ----------------------------------------------------- PG column types
  private val numericRe = """numeric\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)""".r
  private val charRe = """(?:character\s+varying|varchar|character|char)\s*(?:\(\s*\d+\s*\))?""".r
  private val tsRe = """timestamp(?:\s*\(\d\))?(\s+(with|without)\s+time\s+zone)?""".r

  /** One PG column type → Spark SQL type text. Parameterized forms resolve
    * here; bare names delegate to the dialect's shared map (so `text`,
    * `bytea`, `int4`… stay consistent with `::type` casts). */
  def pgColumnType(t: String): String = {
    val norm = t.trim.toLowerCase.replaceAll("\\s+", " ")
    norm match {
      case numericRe(p, s) => s"DECIMAL($p,${Option(s).getOrElse("0")})"
      case _ if charRe.pattern.matcher(norm).matches() => "STRING"
      case "double precision" => "DOUBLE"
      case "real" => "FLOAT"
      case "serial" | "bigserial" => throw FdwError(
        s"column type `$t` is a sequence pseudo-type; foreign tables are read-only here")
      case tsRe(_, zone) =>
        if (zone == "without") "TIMESTAMP_NTZ" else "TIMESTAMP"
      case _ => PgDialect.mapType(norm)
    }
  }

  /** `(col type, ...)` after the table name → declared read schema; an
    * empty `()` means auto schema creation (reference src/fdw/base.rs:60-92). */
  private def columnDefs(cur: Cursor): Option[StructType] = {
    cur.expectPunct('(')
    if (cur.acceptPunct(')')) return None
    val cols = mutable.ArrayBuffer[(String, String)]()
    var more = true
    while (more) {
      val name = cur.ident()
      // type = everything to the next top-level ',' or ')'; parens nest
      // (numeric(20,2)), punctuation joins tightly so the text re-forms
      val sb = new StringBuilder
      var depth = 0
      var done = false
      while (!done) {
        cur.peek match {
          case Some(Punct(',')) if depth == 0 => done = true; more = true; cur.next()
          case Some(Punct(')')) if depth == 0 => done = true; more = false; cur.next()
          case Some(Punct('(')) => depth += 1; cur.next(); sb.append('(')
          case Some(Punct(')')) => depth -= 1; cur.next()
            sb.append(')')
          case Some(Punct(',')) => cur.next(); sb.append(',')
          case Some(Word(w)) => cur.next()
            if (sb.nonEmpty && sb.last != '(' && sb.last != ',') sb.append(' ')
            sb.append(w)
          case Some(other) => throw FdwError(s"unexpected $other in column definition")
          case None => throw FdwError("unterminated column list in CREATE FOREIGN TABLE")
        }
      }
      if (sb.isEmpty) throw FdwError(s"column `$name` has no type")
      cols += ((name, sb.toString))
    }
    val ddl = cols.map { case (name, t) =>
      s"`${name.replace("`", "``")}` ${pgColumnType(t)}"
    }.mkString(", ")
    Some(StructType.fromDDL(ddl))
  }

  // ---------------------------------------------------------- execution
  /** Execute one FDW DDL statement. `schemas` hosts schema-qualified
    * attaches so `SET search_path` resolution sees them. */
  def execute(spark: SparkSession, sql: String,
      schemas: graft.catalog.Schemas): DataFrame = {
    val st = stateFor(spark)
    val cur = new Cursor(lex(sql))
    if (cur.accept("CREATE")) {
      if (cur.accept("FOREIGN")) {
        if (cur.accept("DATA")) { cur.expect("WRAPPER"); createWrapper(spark, cur, st) }
        else { cur.expect("TABLE"); createTable(spark, cur, st, schemas) }
      } else if (cur.accept("SERVER")) createServer(spark, cur, st)
      else if (cur.accept("USER")) { cur.expect("MAPPING"); createMapping(spark, cur, st) }
      else throw FdwError(s"unrecognized CREATE statement in FDW DDL: $sql")
    } else {
      cur.expect("DROP")
      if (cur.accept("FOREIGN")) {
        if (cur.accept("DATA")) { cur.expect("WRAPPER"); dropWrapper(spark, cur, st, schemas) }
        else { cur.expect("TABLE"); dropTable(spark, cur, st, schemas) }
      } else if (cur.accept("SERVER")) dropServer(spark, cur, st, schemas)
      else if (cur.accept("USER")) { cur.expect("MAPPING"); dropMapping(spark, cur, st) }
      else throw FdwError(s"unrecognized DROP statement in FDW DDL: $sql")
    }
  }

  private def ok(spark: SparkSession): DataFrame = SqlApi.commandOk(spark)

  private def createWrapper(spark: SparkSession, cur: Cursor, st: State): DataFrame = {
    val name = cur.ident().toLowerCase
    if (st.wrappers.contains(name))
      throw FdwError(s"foreign-data wrapper \"$name\" already exists")
    var handler: Option[String] = None
    var validator: Option[String] = None
    var going = true
    while (going) {
      if (cur.accept("HANDLER")) handler = Some(cur.ident().toLowerCase)
      else if (cur.accept("VALIDATOR")) validator = Some(cur.ident().toLowerCase)
      else if (cur.accept("NO")) {
        if (!cur.accept("HANDLER") && !cur.accept("VALIDATOR"))
          throw FdwError("expected HANDLER or VALIDATOR after NO")
      } else going = false
    }
    st.wrappers(name) = Wrapper(handler, validator)
    ok(spark)
  }

  private def createServer(spark: SparkSession, cur: Cursor, st: State): DataFrame = {
    val ifNotExists = acceptIfNotExists(cur)
    val name = cur.ident().toLowerCase
    if (st.servers.contains(name)) {
      if (ifNotExists) return ok(spark)
      throw FdwError(s"server \"$name\" already exists")
    }
    // optional TYPE '...' / VERSION '...' decorations (PG grammar) — parsed,
    // unused: the wrapper's handler name is what picks the format
    if (cur.accept("TYPE")) cur.next()
    if (cur.accept("VERSION")) cur.next()
    cur.expect("FOREIGN"); cur.expect("DATA"); cur.expect("WRAPPER")
    val wrapper = cur.ident().toLowerCase
    if (!st.wrappers.contains(wrapper))
      throw FdwError(s"foreign-data wrapper \"$wrapper\" does not exist")
    val opts = if (cur.accept("OPTIONS")) cur.optionsList() else Map.empty[String, String]
    st.servers(name) = Server(wrapper, opts)
    ok(spark)
  }

  private def createMapping(spark: SparkSession, cur: Cursor, st: State): DataFrame = {
    val ifNotExists = acceptIfNotExists(cur)
    cur.expect("FOR")
    val user = cur.ident().toLowerCase // public / CURRENT_USER / a role name
    cur.expect("SERVER")
    val server = cur.ident().toLowerCase
    if (!st.servers.contains(server))
      throw FdwError(s"server \"$server\" does not exist")
    if (st.mappings.contains((user, server)) && !ifNotExists)
      throw FdwError(s"user mapping for \"$user\" on server \"$server\" already exists")
    val opts = if (cur.accept("OPTIONS")) cur.optionsList() else Map.empty[String, String]
    st.mappings((user, server)) = opts
    // the reference materializes the mapping as an engine secret at
    // connection time (src/fdw/base.rs:96-134); here the session IS the
    // connection, so credentials land in the Hadoop conf immediately
    if (opts.nonEmpty) graft.secrets.Secrets(spark, opts)
    ok(spark)
  }

  private def createTable(spark: SparkSession, cur: Cursor, st: State,
      schemas: graft.catalog.Schemas): DataFrame = {
    val ifNotExists = acceptIfNotExists(cur)
    val (schemaName, table) = cur.qualifiedName()
    val key = (schemaName.toSeq :+ table).mkString(".").toLowerCase
    if (st.tables.contains(key)) {
      if (ifNotExists) return ok(spark)
      throw FdwError(s"foreign table \"$key\" already exists")
    }
    val declared = columnDefs(cur)
    cur.expect("SERVER")
    val serverName = cur.ident().toLowerCase
    val server = st.servers.getOrElse(serverName,
      throw FdwError(s"server \"$serverName\" does not exist"))
    val wrapper = st.wrappers(server.wrapper)
    val format = wrapper.handler.flatMap(handlerFormats.get).getOrElse(
      // reference error shape for a non-analytics FDW (src/fdw/base.rs:254)
      throw FdwError("got unexpected fdw_handler" +
        wrapper.handler.fold("")(h => s" `$h`") +
        s"; known handlers: ${handlerFormats.keys.toSeq.sorted.mkString(", ")}"))
    val tableOpts = if (cur.accept("OPTIONS")) cur.optionsList() else Map.empty[String, String]
    val opts = server.options ++ tableOpts
    val userMapping = st.mappings.collectFirst {
      case ((_, s), m) if s == serverName && m.nonEmpty => m
    }.getOrElse(Map.empty)
    schemaName match {
      case Some(sc) => schemas.attachIn(sc, table, format, opts, userMapping, declared)
      case None => graft.catalog.Catalog.attach(spark, table, format, opts,
        userMapping, declared)
    }
    st.tables(key) = serverName
    ok(spark)
  }

  private def acceptIfNotExists(cur: Cursor): Boolean =
    if (cur.accept("IF")) { cur.expect("NOT"); cur.expect("EXISTS"); true } else false

  private def acceptIfExists(cur: Cursor): Boolean =
    if (cur.accept("IF")) { cur.expect("EXISTS"); true } else false

  private def dropTable(spark: SparkSession, cur: Cursor, st: State,
      schemas: graft.catalog.Schemas): DataFrame = {
    val ifExists = acceptIfExists(cur)
    var more = true
    while (more) {
      val (schemaName, table) = cur.qualifiedName()
      val key = (schemaName.toSeq :+ table).mkString(".").toLowerCase
      if (st.tables.remove(key).isEmpty && !ifExists)
        throw FdwError(s"foreign table \"$key\" does not exist")
      schemaName match {
        case Some(sc) => schemas.detach(sc, table)
        case None => graft.catalog.Catalog.detach(spark, table)
      }
      more = cur.acceptPunct(',')
    }
    cur.accept("CASCADE"); cur.accept("RESTRICT")
    ok(spark)
  }

  private def dropServer(spark: SparkSession, cur: Cursor, st: State,
      schemas: graft.catalog.Schemas): DataFrame = {
    val ifExists = acceptIfExists(cur)
    val name = cur.ident().toLowerCase
    if (!st.servers.contains(name)) {
      if (ifExists) return ok(spark)
      throw FdwError(s"server \"$name\" does not exist")
    }
    val cascade = cur.accept("CASCADE")
    val dependents = st.tables.collect { case (t, s) if s == name => t }.toSeq
    if (dependents.nonEmpty && !cascade)
      throw FdwError(s"cannot drop server \"$name\" because other objects " +
        s"depend on it: foreign table(s) ${dependents.sorted.mkString(", ")}")
    dependents.foreach { key =>
      st.tables.remove(key)
      key.split('.') match {
        case Array(sc, t) => schemas.detach(sc, t)
        case Array(t) => graft.catalog.Catalog.detach(spark, t)
        case _ => ()
      }
    }
    st.mappings.filterInPlace { case ((_, s), _) => s != name }
    st.servers.remove(name)
    ok(spark)
  }

  private def dropMapping(spark: SparkSession, cur: Cursor, st: State): DataFrame = {
    val ifExists = acceptIfExists(cur)
    cur.expect("FOR")
    val user = cur.ident().toLowerCase
    cur.expect("SERVER")
    val server = cur.ident().toLowerCase
    if (st.mappings.remove((user, server)).isEmpty && !ifExists)
      throw FdwError(s"user mapping for \"$user\" on server \"$server\" does not exist")
    ok(spark)
  }

  private def dropWrapper(spark: SparkSession, cur: Cursor, st: State,
      schemas: graft.catalog.Schemas): DataFrame = {
    val ifExists = acceptIfExists(cur)
    val name = cur.ident().toLowerCase
    if (!st.wrappers.contains(name)) {
      if (ifExists) return ok(spark)
      throw FdwError(s"foreign-data wrapper \"$name\" does not exist")
    }
    val cascade = cur.accept("CASCADE")
    val depServers = st.servers.collect { case (s, v) if v.wrapper == name => s }.toSeq
    if (depServers.nonEmpty && !cascade)
      throw FdwError(s"cannot drop foreign-data wrapper \"$name\" because other " +
        s"objects depend on it: server(s) ${depServers.sorted.mkString(", ")}")
    depServers.foreach { s =>
      // reuse the server-drop path (cascades to its tables and mappings)
      execute(spark, s"DROP SERVER $s CASCADE", schemas)
    }
    st.wrappers.remove(name)
    ok(spark)
  }
}

package graft.serve

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets

import scala.util.control.NonFatal

import graft.exec.ModelExecutor

/** MySQL wire-protocol face of the SQL proxy (SURVEY §2A A45) — the
  * transport the reference actually speaks (`sql/proxy.py:174-179`
  * serves a mysql-mimic `MysqlServer`, so any stock MySQL client can
  * connect). This implements the protocol subset that serves a query
  * tool, from scratch on a loopback socket — no dependencies:
  *
  *  - Connection phase: HandshakeV10 greeting (per-connection random
  *    nonce) → client response → OK/ERR. With no user map configured
  *    credentials are accepted unconditionally, matching the
  *    reference's default "no auth" posture (`sql/proxy.py:2`); with
  *    a user map the client's `mysql_native_password` scramble is
  *    verified (challenge-response — the password never rides the
  *    wire) and everything else gets the real server's
  *    ER_ACCESS_DENIED_ERROR, mirroring the reference's pluggable
  *    IdentityProvider (`sql/proxy.py:174-179`).
  *  - Command phase: COM_QUERY through the SAME pipeline as the HTTP
  *    face — [[CommentMiddleware]] interception first (comment
  *    statements answer OK with zero rows), then Jinja-compile +
  *    Catalyst via `executor.executeSql`, results as a classic text
  *    resultset (column definitions, EOF, length-encoded rows, EOF).
  *    Errors return ERR packets (code 1064), never dropped
  *    connections. COM_PING answers OK, COM_INIT_DB switches the
  *    connection's default schema, COM_QUIT closes, COM_FIELD_LIST
  *    answers EOF (deprecated), anything else ERR.
  *  - Schema browsing — what a stock client does first after
  *    connecting (the reference synthesizes the same metadata from
  *    the manifest, `sql/proxy.py:129-141`):
  *    `SHOW DATABASES` / `SHOW [FULL] TABLES [FROM db] [LIKE 'p']` /
  *    `SHOW [FULL] COLUMNS FROM t` / `DESCRIBE t` answer
  *    manifest-backed resultsets directly, and any SELECT over
  *    `information_schema.{schemata,tables,columns}` is rewritten to
  *    manifest-backed temp views and handed to Catalyst — full SQL
  *    (WHERE / projection / joins) over the metadata, not a
  *    regex-shaped subset.
  *  - Prepared statements (the binary protocol JDBC defaults to):
  *    COM_STMT_PREPARE parses and counts `?` placeholders (outside
  *    strings/identifiers/comments), COM_STMT_EXECUTE decodes the
  *    binary-bound params, splices them as SQL literals into the
  *    prepared text, and runs the SAME COM_QUERY pipeline, answering
  *    a binary resultset (0x00-headed rows with a NULL bitmap).
  *    COM_STMT_CLOSE frees (no response), COM_STMT_RESET answers OK.
  *  - Client-bootstrap shims: `SET ...`/`USE ...` answer OK (USE also
  *    switches the default schema) and `SELECT @@var [AS alias]`
  *    answers a 1×1 resultset (the probes CLI clients issue before
  *    the first real query; mysql-mimic gets these from sqlglot's
  *    system-variable layer).
  *
  * Scope (documented divergence, mirror of the HTTP face's): no TLS
  * (loopback-only listener; auth above is real but the transport is
  * cleartext); COM_STMT_PREPARE advertises zero result columns
  *  (metadata arrives with the execute resultset, which carries its
  *  own column definitions) and binary resultsets type every column
  *  VAR_STRING (values are length-encoded strings — protocol-valid,
  *  clients convert by column definition); binary DATE/TIME params
  *  are decoded to their literal text forms. Row caps mirror
  *  [[SqlProxy.MaxLimit]].
  *
  * Threading: accept loop + thread per connection (a dev proxy's
  * client count), each command running under a per-connection Spark
  * job group so a dropped connection can cancel its in-flight work.
  * Group names carry a JVM-wide counter: Spark remembers cancelled
  * groups (`cancelJobGroupAndFutureJobs`), so a later connection
  * reusing the same ephemeral client port must NOT reuse the name or
  * its queries would be silently auto-cancelled.
  */
final class MysqlFace(executor: ModelExecutor, port: Int = 0,
    users: Map[String, String] = Map.empty) {

  import MysqlFace._

  private var server: ServerSocket = _
  private var acceptThread: Thread = _
  @volatile private var running = false
  private val connections =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Socket]()

  /** Row cap per resultset — the HTTP face's hard ceiling, referenced
    * (not copied) so the two faces cannot de-synchronize.
    */
  val MaxRows: Int = SqlProxy.MaxLimit

  def boundPort: Int = server.getLocalPort

  def start(): MysqlFace = {
    server = new ServerSocket(port, 16, InetAddress.getLoopbackAddress)
    running = true
    acceptThread = new Thread(() => {
      while (running) {
        try {
          val s = server.accept()
          connections.add(s)
          val t = new Thread(() => {
            // NonFatal only: an Error (OOM, linkage) must propagate to
            // the default handler, not vanish with the socket
            try serve(s)
            catch { case NonFatal(e) => logConnError(s, e) }
            finally { connections.remove(s); try s.close() catch { case NonFatal(_) => () } }
          })
          t.setDaemon(true)
          t.start()
        } catch {
          case NonFatal(e) =>
            // expected when stop() closes the listener mid-accept;
            // anything while still running is worth a line of stderr
            if (running) System.err.println(s"[mysql-face] accept failed: $e")
        }
      }
    })
    acceptThread.setDaemon(true)
    acceptThread.start()
    this
  }

  def stop(): Unit = {
    running = false
    if (server != null) try server.close() catch { case NonFatal(_) => () }
    connections.forEach(s => try s.close() catch { case NonFatal(_) => () })
    connections.clear()
  }

  private def logConnError(s: Socket, e: Throwable): Unit =
    System.err.println(
      s"[mysql-face] connection ${s.getPort} died: ${e.getClass.getName}: ${e.getMessage}")

  // ----------------------------------------------------------------
  // connection lifecycle
  // ----------------------------------------------------------------

  /** Per-connection mutable state: the default schema (COM_INIT_DB /
    * USE) and the prepared-statement registry. Single-threaded by the
    * protocol (commands serialize; the worker hand-off happens-before
    * the next command via `Future.get`).
    */
  private final class ConnState {
    var db: String = "main"
    var nextStmtId: Int = 1
    val stmts = scala.collection.mutable.Map[Int, Prepared]()
  }

  private def serve(sock: Socket): Unit = {
    sock.setTcpNoDelay(true)
    val in = new java.io.PushbackInputStream(
      new BufferedInputStream(sock.getInputStream), 1)
    val out = new BufferedOutputStream(sock.getOutputStream)
    val connId = sock.getPort
    val nonce = newNonce()
    writePacket(out, 0, handshakeV10(connId, nonce))
    out.flush()
    // HandshakeResponse41. With an EMPTY user map credentials are
    // accepted unconditionally (the reference's default posture,
    // `sql/proxy.py:2`); with a user map set the response's
    // mysql_native_password scramble is VERIFIED against this
    // connection's nonce and anything else — unknown user, wrong
    // scramble, another plugin — is rejected with the real server's
    // ER_ACCESS_DENIED_ERROR (the reference's pluggable
    // IdentityProvider posture, `sql/proxy.py:174-179`). The OK/ERR
    // continues the client's sequence (normally seq 1 → reply at 2).
    val (afterHandshake, hsPayload) = readPacket(in, MaxAllowedPacket)
    if (users.nonEmpty) {
      val cred = parseHandshakeResponse(hsPayload)
      if (cred.isEmpty || !authOk(cred.get, nonce)) {
        val (user, usingPw) =
          cred.map(c => (c._1, c._2.nonEmpty)).getOrElse(("?", false))
        writePacket(out, afterHandshake, errPacket(1045, "28000",
          s"Access denied for user '$user'@'localhost' (using " +
            s"password: ${if (usingPw) "YES" else "NO"})"))
        out.flush()
        return
      }
    }
    writePacket(out, afterHandshake, okPacket())
    out.flush()
    serveAuthed(sock, in, out, connId)
  }

  /** Verify one parsed HandshakeResponse41 against the user map:
    * known user, mysql_native_password (or unstated) plugin, and a
    * scramble that matches this connection's nonce — constant-time
    * compare, empty configured password ⇔ empty auth response.
    */
  private def authOk(cred: (String, Array[Byte], String),
      nonce: Array[Byte]): Boolean = {
    val (user, resp, plugin) = cred
    users.get(user).exists { pw =>
      if (plugin.nonEmpty && plugin != "mysql_native_password") false
      else if (pw.isEmpty) resp.isEmpty
      else java.security.MessageDigest.isEqual(
        nativeScramble(pw, nonce), resp)
    }
  }

  private def serveAuthed(sock: Socket, in: java.io.PushbackInputStream,
      out: BufferedOutputStream, connId: Int): Unit = {
    // Unique per CONNECTION, not per client port: cancelled group
    // names stay cancelled in Spark, and loopback ephemeral ports
    // recycle fast enough to collide.
    val group = s"mysql-conn-$connId-${ConnSeq.incrementAndGet()}"
    val state = new ConnState
    // one worker per connection: commands serialize (protocol order)
    // while the connection thread watches the socket during queries
    val worker = java.util.concurrent.Executors.newSingleThreadExecutor(
      (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t })
    // dropped connection ⇒ kill the connection's in-flight Spark jobs
    // (every COM_QUERY runs tagged under `group` for its WHOLE
    // lifetime, collect included)
    try {
      while (true) {
        val (respSeq, payload) = try readPacket(in, MaxAllowedPacket)
          catch {
            case _: EOFException => return
            case _: java.io.IOException =>
              // oversized command: answer the diagnostic real MySQL
              // gives (ER_NET_PACKET_TOO_LARGE) before closing — the
              // stream is desynced, so the connection cannot continue
              // (and the true consumed-seq count is unknowable: 1)
              writePacket(out, 1, errPacket(1153, "08S01",
                s"packet exceeds max_allowed_packet ($MaxAllowedPacket)"))
              out.flush()
              return
          }
        if (payload.isEmpty) return
        payload(0) match {
          case ComQuit => return
          case ComPing =>
            writePacket(out, respSeq, okPacket()); out.flush()
          case ComInitDb =>
            state.db = new String(payload, 1, payload.length - 1,
              StandardCharsets.UTF_8).trim
            writePacket(out, respSeq, okPacket()); out.flush()
          case ComFieldList =>
            writePacket(out, respSeq, eofPacket()); out.flush()
          case ComStmtPrepare =>
            val sql = new String(payload, 1, payload.length - 1,
              StandardCharsets.UTF_8)
            val pos = placeholderPositions(sql)
            val id = state.nextStmtId; state.nextStmtId += 1
            state.stmts(id) = Prepared(sql, pos)
            var seq = respSeq
            seq = writePacket(out, seq, stmtPrepareOk(id, pos.length))
            if (pos.nonEmpty) {
              pos.indices.foreach { _ =>
                seq = writePacket(out, seq, columnDef("?", "string"))
              }
              seq = writePacket(out, seq, eofPacket())
            }
            out.flush()
          case ComStmtClose =>
            if (payload.length >= 5) state.stmts.remove(leInt(payload, 1))
            // protocol: COM_STMT_CLOSE has NO response
          case ComStmtReset =>
            writePacket(out, respSeq, okPacket()); out.flush()
          case ComStmtExecute =>
            val bound = try bindExecute(state, payload)
              catch {
                case NonFatal(e) =>
                  writePacket(out, respSeq, errPacket(1243, "HY000",
                    Option(e.getMessage).getOrElse("malformed COM_STMT_EXECUTE")))
                  out.flush()
                  null
              }
            if (bound != null &&
              !dispatchOnWorker(worker, in, group,
                () => runQuery(bound, out, group, respSeq, state, binary = true)))
              return
          case ComQuery =>
            val sql = new String(payload, 1, payload.length - 1,
              StandardCharsets.UTF_8)
            if (!dispatchOnWorker(worker, in, group,
              () => runQuery(sql, out, group, respSeq, state, binary = false)))
              return
          case other =>
            writePacket(out, respSeq,
              errPacket(1047, "08S01", s"unsupported command 0x${other.toInt.toHexString}"))
            out.flush()
        }
      }
    } finally {
      executor.session.sparkContext.cancelJobGroup(group)
      worker.shutdownNow()
    }
  }

  /** Runs `work` on the per-connection worker while this (connection)
    * thread stays the stream's ONLY reader: it blocks in read()
    * watching the socket. A well-behaved client sends nothing while
    * its query runs, so EOF here means the client dropped mid-query →
    * cancel the group INCLUDING jobs the worker has not launched yet
    * (the plain cancelJobGroup no-ops if EOF wins the race against
    * plan analysis, before any job registers); a byte means a
    * pipelined next command → push it back and wait for the query
    * first. Documented trade-off: a client that half-closes its write
    * side mid-query (legal TCP, no real MySQL client does it) is
    * treated as disconnected. Returns false when the connection must
    * close (EOF, or a worker failure that ESCAPED runQuery's own
    * handler — an Error, or a write failure after partial output —
    * has desynced the response stream; tear down rather than serve
    * the next command on garbage).
    */
  private def dispatchOnWorker(
      worker: java.util.concurrent.ExecutorService,
      in: java.io.PushbackInputStream, group: String,
      work: () => Unit): Boolean = {
    val fut = worker.submit(new Runnable { override def run(): Unit = work() })
    val b = try in.read() catch { case NonFatal(_) => -1 }
    if (b < 0) {
      executor.session.sparkContext.cancelJobGroupAndFutureJobs(group)
      try fut.get() catch { case NonFatal(_) => () }
      false
    } else {
      in.unread(b)
      try { fut.get(); true } catch { case NonFatal(_) => false }
    }
  }

  // ----------------------------------------------------------------
  // COM_QUERY / COM_STMT_EXECUTE body
  // ----------------------------------------------------------------

  /** A whole SELECT of only @@vars — what real clients send during
    * bootstrap: the mysql CLI's `select @@version_comment limit 1`,
    * Connector/J's multi-variable `SELECT @@session.x AS x, @@y AS
    * y, …`. Tolerates a trailing LIMIT (the result is one row either
    * way).
    */
  private val SelectSysVars =
    """(?is)\s*SELECT\s+(@@[\w.]+(?:\s+AS\s+\w+)?(?:\s*,\s*@@[\w.]+(?:\s+AS\s+\w+)?)*)\s*(?:LIMIT\s+\d+)?\s*;?\s*""".r
  private val OneSysVar =
    """(?is)\s*@@([\w.]+)(?:\s+AS\s+(\w+))?\s*""".r
  private val UseDb = """(?is)\s*USE\s+`?([\w$]+)`?\s*;?\s*""".r
  private val SetStmt = """(?is)\s*SET\b.*""".r
  private val ShowDatabases =
    """(?is)\s*SHOW\s+(?:DATABASES|SCHEMAS)\s*;?\s*""".r
  private val ShowTables =
    """(?is)\s*SHOW\s+(FULL\s+)?TABLES(?:\s+(?:FROM|IN)\s+`?([\w$]+)`?)?(?:\s+LIKE\s+'([^']*)')?\s*;?\s*""".r
  private val ShowColumns =
    """(?is)\s*SHOW\s+(FULL\s+)?(?:COLUMNS|FIELDS)\s+(?:FROM|IN)\s+`?([\w$]+)`?(?:\s*\.\s*`?([\w$]+)`?)?(?:\s+(?:FROM|IN)\s+`?([\w$]+)`?)?(?:\s+LIKE\s+'([^']*)')?\s*;?\s*""".r
  private val DescribeTable =
    """(?is)\s*(?:DESCRIBE|DESC)\s+`?([\w$]+)`?(?:\s*\.\s*`?([\w$]+)`?)?\s*;?\s*""".r
  private val InfoSchemaRef =
    java.util.regex.Pattern.compile(
      """(?i)\binformation_schema\s*\.\s*(schemata|tables|columns)\b""")

  private def sysVarValue(v: String): String = {
    val bare = v.toLowerCase.stripPrefix("session.").stripPrefix("global.")
    if (bare == "version_comment") "graft proxy"
    else if (bare.endsWith("version")) ServerVersion
    else if (bare.contains("character_set") || bare == "collation_connection")
      "utf8mb4"
    else if (bare == "auto_increment_increment") "1"
    else if (bare.endsWith("timeout")) "28800"
    else if (bare == "max_allowed_packet") MaxAllowedPacket.toString
    else if (bare == "sql_mode") ""
    else ""
  }

  /** Manifest nodes that are browsable relations — the same filter as
    * the HTTP face's /schema (reference `sql/proxy.py:129-141` chains
    * manifest sources + nodes).
    */
  private def relationNodes: Seq[graft.core.NodeMeta] =
    executor.manifest.nodes.values
      .filter(n => Set("model", "seed", "source").contains(n.resourceType))
      .toSeq

  private def likeToRegex(p: String): java.util.regex.Pattern = {
    val sb = new StringBuilder
    p.foreach {
      case '%' => sb.append(".*")
      case '_' => sb.append('.')
      case c => sb.append(java.util.regex.Pattern.quote(c.toString))
    }
    java.util.regex.Pattern.compile(sb.toString,
      java.util.regex.Pattern.CASE_INSENSITIVE)
  }

  /** (Re)publishes `information_schema_{schemata,tables,columns}`
    * temp views from the CURRENT manifest (the proxy's ALTER-comment
    * middleware mutates it in memory, so views are rebuilt per query
    * — they hold a few hundred rows, never corpus data). Column names
    * are MySQL 8's uppercase; Spark's case-insensitive resolution
    * serves clients that probe lowercase.
    */
  private def refreshInfoSchemaViews(): Unit = {
    val spark = executor.session
    import spark.implicits._
    val nodes = relationNodes
    nodes.map(n => ("def", n.schema, n.name,
        if (n.materialized == "view") "VIEW" else "BASE TABLE",
        n.description))
      .toDF("TABLE_CATALOG", "TABLE_SCHEMA", "TABLE_NAME", "TABLE_TYPE",
        "TABLE_COMMENT")
      .createOrReplaceTempView("information_schema_tables")
    nodes.flatMap(n => n.columns.values.zipWithIndex.map { case (c, i) =>
        ("def", n.schema, n.name, c.name, (i + 1).toLong,
          c.dataType.getOrElse("UNKNOWN"), c.dataType.getOrElse("UNKNOWN"),
          "YES", Option.empty[String], "", "",
          c.description.getOrElse(""))
      })
      .toDF("TABLE_CATALOG", "TABLE_SCHEMA", "TABLE_NAME", "COLUMN_NAME",
        "ORDINAL_POSITION", "DATA_TYPE", "COLUMN_TYPE", "IS_NULLABLE",
        "COLUMN_DEFAULT", "COLUMN_KEY", "EXTRA", "COLUMN_COMMENT")
      .createOrReplaceTempView("information_schema_columns")
    nodes.map(_.schema).distinct.sorted
      .map(s => ("def", s, "utf8mb4", "utf8mb4_general_ci"))
      .toDF("CATALOG_NAME", "SCHEMA_NAME", "DEFAULT_CHARACTER_SET_NAME",
        "DEFAULT_COLLATION_NAME")
      .createOrReplaceTempView("information_schema_schemata")
  }

  /** DESCRIBE/SHOW COLUMNS table resolution: qualified name wins;
    * unqualified prefers the connection's default schema, then a
    * unique cross-schema match (friendlier than 1146 when every model
    * lives in one schema anyway).
    */
  private def resolveNode(db: Option[String], table: String,
      state: ConnState): Option[graft.core.NodeMeta] = {
    val cands = relationNodes.filter(_.name.equalsIgnoreCase(table))
    db match {
      case Some(d) => cands.find(_.schema.equalsIgnoreCase(d))
      case None =>
        cands.find(_.schema.equalsIgnoreCase(state.db))
          .orElse(if (cands.size == 1) cands.headOption else None)
    }
  }

  private def describeRows(n: graft.core.NodeMeta,
      full: Boolean): Seq[Seq[Option[String]]] =
    n.columns.values.toSeq.map { c =>
      val base = Seq(Some(c.name), Some(c.dataType.getOrElse("UNKNOWN")))
      if (full)
        base ++ Seq(Some("utf8mb4_general_ci"), Some("YES"), Some(""),
          None, Some(""), Some("select"), Some(c.description.getOrElse("")))
      else base ++ Seq(Some("YES"), Some(""), None, Some(""))
    }

  private def describeCols(full: Boolean): Seq[(String, String)] =
    if (full)
      Seq("Field" -> "string", "Type" -> "string", "Collation" -> "string",
        "Null" -> "string", "Key" -> "string", "Default" -> "string",
        "Extra" -> "string", "Privileges" -> "string", "Comment" -> "string")
    else
      Seq("Field" -> "string", "Type" -> "string", "Null" -> "string",
        "Key" -> "string", "Default" -> "string", "Extra" -> "string")

  private def runQuery(sql: String, out: OutputStream, group: String,
      startSeq: Int, state: ConnState, binary: Boolean): Unit =
    try {
      sql match {
        case SelectSysVars(varList) =>
          val terms = varList.split(",").toSeq.map {
            case OneSysVar(v, alias) =>
              (Option(alias).getOrElse(s"@@$v"), sysVarValue(v))
          }
          writeResultSet(out, terms.map(_._1 -> "string"),
            Seq(terms.map(t => Option(t._2))), startSeq, binary)
        case UseDb(db) =>
          state.db = db
          writePacket(out, startSeq, okPacket()); out.flush()
        case SetStmt() =>
          writePacket(out, startSeq, okPacket()); out.flush()
        case ShowDatabases() =>
          val dbs = (relationNodes.map(_.schema).distinct :+
            "information_schema").distinct.sorted
          writeResultSet(out, Seq("Database" -> "string"),
            dbs.map(d => Seq(Some(d))), startSeq, binary)
        case ShowTables(full, db0, like) =>
          val db = Option(db0).getOrElse(state.db)
          val known = relationNodes.map(_.schema).exists(_.equalsIgnoreCase(db))
          if (!known) {
            writePacket(out, startSeq,
              errPacket(1049, "42000", s"Unknown database '$db'"))
            out.flush()
          } else {
            val pat = Option(like).map(likeToRegex)
            val ts = relationNodes.filter(_.schema.equalsIgnoreCase(db))
              .filter(n => pat.forall(_.matcher(n.name).matches))
              .sortBy(_.name)
            val header = s"Tables_in_$db" +
              Option(like).map(l => s" ($l)").getOrElse("")
            if (full == null)
              writeResultSet(out, Seq(header -> "string"),
                ts.map(n => Seq(Some(n.name))), startSeq, binary)
            else
              writeResultSet(out,
                Seq(header -> "string", "Table_type" -> "string"),
                ts.map(n => Seq(Some(n.name),
                  Some(if (n.materialized == "view") "VIEW" else "BASE TABLE"))),
                startSeq, binary)
          }
        case ShowColumns(full, p1, p2, fromDb, like) =>
          // `FROM db.t` puts db in p1/t in p2; `FROM t [FROM db]`
          // puts t in p1 and the optional db in fromDb
          val (db, table) =
            if (p2 != null) (Some(p1), p2)
            else (Option(fromDb), p1)
          resolveNode(db, table, state) match {
            case None =>
              writePacket(out, startSeq, errPacket(1146, "42S02",
                s"Table '${db.getOrElse(state.db)}.$table' doesn't exist"))
              out.flush()
            case Some(n) =>
              val pat = Option(like).map(likeToRegex)
              val rows = describeRows(n, full != null)
                .filter(r => pat.forall(_.matcher(r.head.get).matches))
              writeResultSet(out, describeCols(full != null), rows,
                startSeq, binary)
          }
        case DescribeTable(p1, p2) =>
          val (db, table) =
            if (p2 != null) (Some(p1), p2) else (None, p1)
          resolveNode(db, table, state) match {
            case None =>
              writePacket(out, startSeq, errPacket(1146, "42S02",
                s"Table '${db.getOrElse(state.db)}.$table' doesn't exist"))
              out.flush()
            case Some(n) =>
              writeResultSet(out, describeCols(full = false),
                describeRows(n, full = false), startSeq, binary)
          }
        case _ =>
          CommentMiddleware.intercept(executor, sql) match {
            case Some(_) =>
              writePacket(out, startSeq, okPacket()); out.flush()
            case None =>
              val m = InfoSchemaRef.matcher(sql)
              val effective =
                if (m.find()) {
                  refreshInfoSchemaViews()
                  m.reset()
                  m.replaceAll("information_schema_$1")
                } else sql
              // the job group stays set through the COLLECT — that is
              // where the Spark jobs actually run; clearing it after
              // executeSql (a lazy plan build) would tag nothing
              val sc = executor.session.sparkContext
              sc.setJobGroup(group, s"mysql proxy query", interruptOnCancel = true)
              try {
                val df = executor.executeSql(effective)
                val cols = df.schema.fields.toSeq
                  .map(f => f.name -> f.dataType.typeName)
                val rows = df.limit(MaxRows).collect().toSeq.map { r =>
                  (0 until r.length).map(i =>
                    Option(r.get(i)).map(_.toString))
                }
                writeResultSet(out, cols, rows, startSeq, binary)
              } finally sc.clearJobGroup()
          }
      }
    } catch {
      case e: Exception =>
        writePacket(out, startSeq, errPacket(1064, "42000",
          Option(e.getMessage).getOrElse(e.getClass.getName).take(400)))
        out.flush()
    }

  // ----------------------------------------------------------------
  // prepared statements (binary protocol)
  // ----------------------------------------------------------------

  /** Decodes COM_STMT_EXECUTE and returns the prepared SQL with every
    * `?` replaced by its bound value as a SQL literal — parameterized
    * execution through the one COM_QUERY pipeline, the mysql-mimic
    * strategy (it formats params into the statement text too).
    */
  private def bindExecute(state: ConnState, p: Array[Byte]): String = {
    val stmtId = leInt(p, 1)
    val prep = state.stmts.getOrElse(stmtId,
      throw new IllegalArgumentException(s"unknown statement id $stmtId"))
    val n = prep.paramPos.length
    if (n == 0) return prep.sql
    var off = 10 // cmd(1) + stmt_id(4) + flags(1) + iteration_count(4)
    val nullBitmap = java.util.Arrays.copyOfRange(p, off, off + (n + 7) / 8)
    off += (n + 7) / 8
    val newBound = p(off) == 1; off += 1
    if (newBound) {
      prep.types = Array.tabulate(n)(i => p(off + 2 * i) & 0xff)
      off += 2 * n
    } else if (prep.types.length != n)
      throw new IllegalArgumentException(
        "execute without bound parameter types")
    val lits = new Array[String](n)
    for (i <- 0 until n) {
      if ((nullBitmap(i / 8) & (1 << (i % 8))) != 0) lits(i) = "NULL"
      else {
        val (lit, used) = binaryParamLiteral(prep.types(i), p, off)
        lits(i) = lit
        off += used
      }
    }
    // splice literals at the recorded placeholder positions
    val sb = new StringBuilder
    var last = 0
    prep.paramPos.zipWithIndex.foreach { case (pos, i) =>
      sb.append(prep.sql.substring(last, pos)).append(lits(i))
      last = pos + 1
    }
    sb.append(prep.sql.substring(last))
    sb.toString
  }

  /** (SQL literal, bytes consumed) for one binary-bound parameter. */
  private def binaryParamLiteral(tpe: Int, p: Array[Byte],
      off: Int): (String, Int) = tpe match {
    case 0x01 => (p(off).toString, 1) // TINY
    case 0x02 => (((p(off) & 0xff) | (p(off + 1) << 8)).toShort.toString, 2)
    case 0x03 => (leInt(p, off).toString, 4) // LONG
    case 0x08 => // LONGLONG
      ((0 until 8).map(i => (p(off + i) & 0xffL) << (8 * i)).sum.toString, 8)
    case 0x04 => // FLOAT
      (java.lang.Float.intBitsToFloat(leInt(p, off)).toString, 4)
    case 0x05 => // DOUBLE
      val bits = (0 until 8).map(i => (p(off + i) & 0xffL) << (8 * i)).sum
      (java.lang.Double.longBitsToDouble(bits).toString, 8)
    case 0x06 => ("NULL", 0)
    case 0x0a | 0x0c | 0x07 => // DATE / DATETIME / TIMESTAMP
      val len = p(off) & 0xff
      val s =
        if (len == 0) "0000-00-00"
        else {
          val y = (p(off + 1) & 0xff) | ((p(off + 2) & 0xff) << 8)
          val base = f"$y%04d-${p(off + 3) & 0xff}%02d-${p(off + 4) & 0xff}%02d"
          if (len >= 7)
            base + f" ${p(off + 5) & 0xff}%02d:${p(off + 6) & 0xff}%02d:${p(off + 7) & 0xff}%02d"
          else base
        }
      (sqlStringLiteral(s), 1 + len)
    case _ => // VARCHAR / VAR_STRING / STRING / BLOB / NEWDECIMAL / …
      val (v, used) = lencBytes(p, off)
      (sqlStringLiteral(new String(v, StandardCharsets.UTF_8)), used)
  }

  /** Spark-parser-safe literal: quotes double (valid in both ANSI and
    * legacy literal modes) and backslashes double (the default parser
    * treats backslash as a C-style escape inside literals).
    */
  private def sqlStringLiteral(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"

  // ----------------------------------------------------------------
  // resultset writing
  // ----------------------------------------------------------------

  private def writeResultSet(out: OutputStream,
      cols: Seq[(String, String)], rows: Seq[Seq[Option[String]]],
      startSeq: Int, binary: Boolean): Unit = {
    var seq = startSeq
    def next(payload: Array[Byte]): Unit = { seq = writePacket(out, seq, payload) }
    next(lencInt(cols.length))
    // binary resultsets advertise VAR_STRING so the lenc-string row
    // encoding below is type-correct (documented scope)
    cols.foreach { case (name, dtype) =>
      next(columnDef(name, if (binary) "string" else dtype))
    }
    next(eofPacket())
    if (binary) rows.foreach { r => next(binaryRowPacket(r)) }
    else rows.foreach { r => next(rowPacket(r)) }
    next(eofPacket())
    out.flush()
  }
}

private[serve] object MysqlFace {

  val ServerVersion = "8.0.0-graft"

  /** JVM-wide connection counter — job-group uniqueness across client
    * port reuse (see class doc).
    */
  private val ConnSeq = new java.util.concurrent.atomic.AtomicLong(0)

  // command bytes
  val ComQuit: Byte = 0x01
  val ComInitDb: Byte = 0x02
  val ComQuery: Byte = 0x03
  val ComFieldList: Byte = 0x04
  val ComPing: Byte = 0x0e
  val ComStmtPrepare: Byte = 0x16
  val ComStmtExecute: Byte = 0x17
  val ComStmtClose: Byte = 0x19
  val ComStmtReset: Byte = 0x1a

  /** A prepared statement: original text + byte offsets of its `?`
    * placeholders (outside strings/identifiers/comments) + the param
    * types from the last execute that bound them (a client may send
    * new_params_bound_flag=0 on re-execution).
    */
  final case class Prepared(sql: String, paramPos: Seq[Int]) {
    var types: Array[Int] = Array.empty
  }

  /** Byte offsets of `?` placeholders, skipping '…'/"…" strings (with
    * backslash escapes and '' doubling), `…` identifiers, `-- …` and
    * `# …` line comments, and block comments.
    */
  def placeholderPositions(sql: String): Seq[Int] = {
    val out = scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    val n = sql.length
    while (i < n) {
      sql.charAt(i) match {
        case '?' => out += i; i += 1
        case q @ ('\'' | '"' | '`') =>
          i += 1
          var closed = false
          while (i < n && !closed) {
            val c = sql.charAt(i)
            if (c == '\\' && q != '`' && i + 1 < n) i += 2
            else if (c == q) {
              if (i + 1 < n && sql.charAt(i + 1) == q) i += 2 // '' doubling
              else { closed = true; i += 1 }
            } else i += 1
          }
        case '-' if i + 2 < n && sql.charAt(i + 1) == '-' &&
            sql.charAt(i + 2).isWhitespace =>
          while (i < n && sql.charAt(i) != '\n') i += 1
        case '#' =>
          while (i < n && sql.charAt(i) != '\n') i += 1
        case '/' if i + 1 < n && sql.charAt(i + 1) == '*' =>
          val end = sql.indexOf("*/", i + 2)
          i = if (end < 0) n else end + 2
        case _ => i += 1
      }
    }
    out.toSeq
  }

  /** COM_STMT_PREPARE_OK — zero result columns (metadata travels with
    * the execute resultset; documented scope).
    */
  def stmtPrepareOk(stmtId: Int, nParams: Int): Array[Byte] =
    Array(0x00.toByte) ++ le(stmtId.toLong, 4) ++ le(0L, 2) ++
      le(nParams.toLong, 2) ++ Array(0x00.toByte) ++ le(0L, 2)

  def leInt(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
      ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)

  // capability flags (Protocol::CapabilityFlags)
  val ClientLongPassword = 0x00000001L
  val ClientFoundRows = 0x00000002L
  val ClientLongFlag = 0x00000004L
  val ClientConnectWithDb = 0x00000008L
  val ClientProtocol41 = 0x00000200L
  val ClientTransactions = 0x00002000L
  val ClientSecureConnection = 0x00008000L
  val ClientPluginAuth = 0x00080000L
  // not advertised (clients mask with server caps) but parsed
  // defensively: lenc-encoded auth response form
  val ClientPluginAuthLenencData = 0x00200000L

  val ServerCapabilities: Long =
    ClientLongPassword | ClientFoundRows | ClientLongFlag |
      ClientConnectWithDb | ClientProtocol41 | ClientTransactions |
      ClientSecureConnection | ClientPluginAuth

  // ----------------------------------------------------------------
  // framing: 3-byte LE length + 1-byte sequence id
  // ----------------------------------------------------------------

  /** The protocol's 3-byte length ceiling: payloads at or beyond this
    * MUST be split into 0xffffff-byte packets with consecutive
    * sequence ids, terminated by a shorter (possibly empty) packet —
    * a single truncated length header would permanently desync the
    * stream on the first ≥16 MiB row.
    */
  val MaxPacket = 0xffffff

  /** Returns the NEXT sequence id — a split payload consumes one id
    * per wire packet, and the caller's next packet must continue the
    * sequence.
    */
  def writePacket(out: OutputStream, seq: Int, payload: Array[Byte]): Int = {
    var off = 0
    var s = seq
    var continue = true
    while (continue) {
      val n = math.min(MaxPacket, payload.length - off)
      out.write(n & 0xff); out.write((n >> 8) & 0xff); out.write((n >> 16) & 0xff)
      out.write(s & 0xff)
      out.write(payload, off, n)
      off += n
      s += 1
      // a payload that is an exact multiple of MaxPacket needs the
      // empty terminator packet the split rule prescribes
      continue = n == MaxPacket
    }
    s
  }

  /** The max_allowed_packet the server advertises (sysVarValue) and
    * ENFORCES on reads — an endless run of 0xffffff continuation
    * chunks would otherwise buffer unbounded heap.
    */
  val MaxAllowedPacket = 16777216

  /** (NEXT sequence id, payload) — reassembles split packets up to
    * `maxBytes` (IOException beyond; the command loop passes
    * [[MaxAllowedPacket]]). Returning the id AFTER the last consumed
    * wire packet matters for split commands: a client payload of
    * 16777215–16777216 bytes arrives as packets seq 0..k, and the
    * response MUST continue at k+1 or strict clients report "packets
    * out of order". Throws EOFException on a closed peer.
    */
  def readPacket(in: InputStream,
      maxBytes: Long = Long.MaxValue): (Int, Array[Byte]) = {
    def b(): Int = {
      val v = in.read()
      if (v < 0) throw new EOFException("peer closed")
      v
    }
    var lastSeq = 0
    var total = 0L
    val buf = new java.io.ByteArrayOutputStream()
    var continue = true
    while (continue) {
      val n = b() | (b() << 8) | (b() << 16)
      lastSeq = b()
      total += n
      if (total > maxBytes)
        throw new java.io.IOException(
          s"packet exceeds max_allowed_packet ($maxBytes)")
      val chunk = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(chunk, off, n - off)
        if (r < 0) throw new EOFException("peer closed mid-packet")
        off += r
      }
      buf.write(chunk)
      continue = n == MaxPacket
    }
    (lastSeq + 1, buf.toByteArray)
  }

  // ----------------------------------------------------------------
  // payload builders
  // ----------------------------------------------------------------

  private def le(v: Long, bytes: Int): Array[Byte] =
    Array.tabulate(bytes)(i => ((v >> (8 * i)) & 0xff).toByte)

  /** Length-encoded integer. */
  def lencInt(v: Long): Array[Byte] =
    if (v < 251) Array(v.toByte)
    else if (v < 65536) Array(0xfc.toByte) ++ le(v, 2)
    else if (v < 16777216) Array(0xfd.toByte) ++ le(v, 3)
    else Array(0xfe.toByte) ++ le(v, 8)

  def lencStr(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    lencInt(b.length.toLong) ++ b
  }

  /** (bytes, total consumed incl. the length prefix) of a
    * length-encoded byte string at `off`.
    */
  def lencBytes(p: Array[Byte], off: Int): (Array[Byte], Int) = {
    val (n, used) = (p(off) & 0xff) match {
      case 0xfc => ((p(off + 1) & 0xffL) | ((p(off + 2) & 0xffL) << 8), 3)
      case 0xfd => ((p(off + 1) & 0xffL) | ((p(off + 2) & 0xffL) << 8) |
        ((p(off + 3) & 0xffL) << 16), 4)
      case 0xfe => ((0 until 8).map(i => (p(off + 1 + i) & 0xffL) << (8 * i)).sum, 9)
      case v => (v.toLong, 1)
    }
    (java.util.Arrays.copyOfRange(p, off + used, off + used + n.toInt),
      used + n.toInt)
  }

  def handshakeV10(connId: Int, nonce: Array[Byte]): Array[Byte] = {
    require(nonce.length == 20, "mysql_native_password nonce is 20 bytes")
    val sb = new scala.collection.mutable.ArrayBuffer[Byte]()
    sb += 10 // protocol version
    sb ++= ServerVersion.getBytes(StandardCharsets.UTF_8); sb += 0
    sb ++= le(connId.toLong, 4)
    sb ++= nonce.slice(0, 8) // auth data part 1
    sb += 0 // filler
    sb ++= le(ServerCapabilities & 0xffff, 2)
    sb += 33 // charset utf8_general_ci
    sb ++= le(0x0002L, 2) // status: autocommit
    sb ++= le((ServerCapabilities >> 16) & 0xffff, 2)
    sb += 21 // auth plugin data length
    sb ++= Array.fill[Byte](10)(0) // reserved
    sb ++= nonce.slice(8, 20); sb += 0 // part 2
    sb ++= "mysql_native_password".getBytes(StandardCharsets.UTF_8); sb += 0
    sb.toArray
  }

  private val NonceRandom = new java.security.SecureRandom()

  /** A connection's 20-byte auth nonce ("scramble") — random
    * printable bytes, no NULs (old clients read part 2 as a C
    * string). Random per connection so a captured scramble response
    * cannot be replayed.
    */
  def newNonce(): Array[Byte] = {
    val r = new Array[Byte](20)
    NonceRandom.nextBytes(r)
    r.map(b => (0x21 + java.lang.Math.floorMod(b.toInt, 0x5e)).toByte)
  }

  /** mysql_native_password's expected auth response for a password
    * and nonce: `SHA1(pw) XOR SHA1(nonce + SHA1(SHA1(pw)))` — the
    * protocol's challenge-response (the password itself never rides
    * the wire; both the server check and the spec's mini client
    * derive the token from this one function of public inputs).
    */
  def nativeScramble(password: String, nonce: Array[Byte]): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val h1 = md.digest(password.getBytes(StandardCharsets.UTF_8))
    md.reset()
    val h2 = md.digest(h1)
    md.reset()
    md.update(nonce); md.update(h2)
    val h3 = md.digest()
    h1.indices.map(i => (h1(i) ^ h3(i)).toByte).toArray
  }

  /** (user, auth response, client plugin) parsed from a
    * HandshakeResponse41 payload; None when truncated/malformed —
    * which the caller treats as an auth FAILURE when a user map is
    * set, never as anonymous access.
    */
  def parseHandshakeResponse(
      p: Array[Byte]): Option[(String, Array[Byte], String)] =
    try {
      val flags = (0 until 4).map(i => (p(i) & 0xffL) << (8 * i)).sum
      var off = 4 + 4 + 1 + 23
      val userEnd = p.indexOf(0.toByte, off)
      if (userEnd < 0) None
      else {
        val user = new String(p, off, userEnd - off, StandardCharsets.UTF_8)
        off = userEnd + 1
        val auth =
          if ((flags & ClientPluginAuthLenencData) != 0) {
            val (a, used) = lencBytes(p, off); off += used; a
          } else if ((flags & ClientSecureConnection) != 0) {
            val n = p(off) & 0xff
            val a = java.util.Arrays.copyOfRange(p, off + 1, off + 1 + n)
            off += 1 + n; a
          } else {
            val e = p.indexOf(0.toByte, off)
            val end = if (e < 0) p.length else e
            val a = java.util.Arrays.copyOfRange(p, off, end)
            off = end + 1; a
          }
        if ((flags & ClientConnectWithDb) != 0 && off < p.length) {
          val e = p.indexOf(0.toByte, off)
          off = if (e < 0) p.length else e + 1
        }
        val plugin =
          if ((flags & ClientPluginAuth) != 0 && off < p.length) {
            val e = p.indexOf(0.toByte, off)
            val end = if (e < 0) p.length else e
            new String(p, off, end - off, StandardCharsets.UTF_8)
          } else ""
        Some((user, auth, plugin))
      }
    } catch { case NonFatal(_) => None }

  def okPacket(affected: Long = 0): Array[Byte] =
    Array(0x00.toByte) ++ lencInt(affected) ++ lencInt(0) ++
      le(0x0002L, 2) ++ le(0L, 2)

  def eofPacket(): Array[Byte] =
    Array(0xfe.toByte) ++ le(0L, 2) ++ le(0x0002L, 2)

  def errPacket(code: Int, sqlState: String, msg: String): Array[Byte] =
    Array(0xff.toByte) ++ le(code.toLong, 2) ++
      Array('#'.toByte) ++ sqlState.getBytes(StandardCharsets.UTF_8).take(5) ++
      msg.getBytes(StandardCharsets.UTF_8)

  /** MySQL column types (advisory — the text protocol carries every
    * value as a length-encoded string).
    */
  private def mysqlType(sparkType: String): Int = sparkType match {
    case "byte" | "short" | "integer" | "long" => 0x08 // LONGLONG
    case "float" | "double" => 0x05 // DOUBLE
    case t if t.startsWith("decimal") => 0xf6 // NEWDECIMAL
    case "boolean" => 0x01 // TINY
    case "date" => 0x0a // DATE
    case "timestamp" | "timestamp_ntz" => 0x0c // DATETIME
    case _ => 0xfd // VAR_STRING
  }

  /** Protocol::ColumnDefinition41. */
  def columnDef(name: String, sparkType: String): Array[Byte] =
    lencStr("def") ++ lencStr("") ++ lencStr("") ++ lencStr("") ++
      lencStr(name) ++ lencStr(name) ++
      lencInt(0x0c) ++ le(33L, 2) /* charset */ ++ le(255L, 4) /* length */ ++
      Array(mysqlType(sparkType).toByte) ++ le(0L, 2) /* flags */ ++
      Array(0x00.toByte) /* decimals */ ++ le(0L, 2) /* filler */

  /** Text-protocol row: lenc strings, NULL as 0xFB. */
  def rowPacket(values: Seq[Option[String]]): Array[Byte] =
    values.flatMap {
      case Some(v) => lencStr(v).toSeq
      case None => Seq(0xfb.toByte)
    }.toArray

  /** Binary-protocol row: 0x00 header, NULL bitmap with the 2-bit
    * offset the protocol prescribes, then lenc-string values (every
    * column is advertised VAR_STRING on the binary path).
    */
  def binaryRowPacket(values: Seq[Option[String]]): Array[Byte] = {
    val bitmap = new Array[Byte]((values.length + 7 + 2) / 8)
    values.zipWithIndex.foreach { case (v, i) =>
      if (v.isEmpty) bitmap((i + 2) / 8) =
        (bitmap((i + 2) / 8) | (1 << ((i + 2) % 8))).toByte
    }
    Array(0x00.toByte) ++ bitmap ++
      values.flatMap(_.map(lencStr(_).toSeq).getOrElse(Nil))
  }
}

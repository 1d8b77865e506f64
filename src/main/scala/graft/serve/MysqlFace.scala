package graft.serve

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets

import graft.exec.ModelExecutor

/** MySQL wire-protocol face of the SQL proxy (SURVEY §2A A45) — the
  * transport the reference actually speaks (`sql/proxy.py:174-179`
  * serves a mysql-mimic `MysqlServer`, so any stock MySQL client can
  * connect). This implements the text protocol subset that serves a
  * query tool, from scratch on a loopback socket — no dependencies:
  *
  *  - Connection phase: HandshakeV10 greeting → client response →
  *    OK. Credentials are accepted unconditionally, matching the
  *    reference's "no auth" posture (`sql/proxy.py:2`).
  *  - Command phase: COM_QUERY through the SAME pipeline as the HTTP
  *    face — [[CommentMiddleware]] interception first (comment
  *    statements answer OK with zero rows), then Jinja-compile +
  *    Catalyst via `executor.executeSql`, results as a classic text
  *    resultset (column definitions, EOF, length-encoded rows, EOF).
  *    Errors return ERR packets (code 1064), never dropped
  *    connections. COM_PING/COM_INIT_DB answer OK, COM_QUIT closes,
  *    COM_FIELD_LIST answers EOF (deprecated), anything else ERR.
  *  - Client-bootstrap shims: `SET ...`/`USE ...` answer OK and
  *    `SELECT @@var [AS alias]` answers a 1×1 resultset (the probes
  *    CLI clients issue before the first real query; mysql-mimic gets
  *    these from sqlglot's system-variable layer).
  *
  * Scope (documented divergence, mirror of the HTTP face's): no TLS,
  * no real auth, no prepared-statement (binary) protocol, no
  * INFORMATION_SCHEMA emulation — schema browsing is the HTTP
  * `/schema` endpoint's job. Row caps mirror [[SqlProxy.MaxLimit]].
  *
  * Threading: accept loop + thread per connection (a dev proxy's
  * client count), each command running under a per-connection Spark
  * job group so a dropped connection can cancel its in-flight work.
  */
final class MysqlFace(executor: ModelExecutor, port: Int = 0) {

  import MysqlFace._

  private var server: ServerSocket = _
  private var acceptThread: Thread = _
  @volatile private var running = false
  private val connections =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Socket]()

  /** Row cap per resultset — the same driver-side guard as the HTTP
    * face's hard ceiling.
    */
  val MaxRows = 10000

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
            try serve(s)
            catch { case _: Throwable => () }
            finally { connections.remove(s); try s.close() catch { case _: Throwable => () } }
          })
          t.setDaemon(true)
          t.start()
        } catch { case _: Throwable => () /* closed during accept */ }
      }
    })
    acceptThread.setDaemon(true)
    acceptThread.start()
    this
  }

  def stop(): Unit = {
    running = false
    if (server != null) try server.close() catch { case _: Throwable => () }
    connections.forEach(s => try s.close() catch { case _: Throwable => () })
    connections.clear()
  }

  // ----------------------------------------------------------------
  // connection lifecycle
  // ----------------------------------------------------------------

  private def serve(sock: Socket): Unit = {
    sock.setTcpNoDelay(true)
    val in = new java.io.PushbackInputStream(
      new BufferedInputStream(sock.getInputStream), 1)
    val out = new BufferedOutputStream(sock.getOutputStream)
    val connId = sock.getPort
    writePacket(out, 0, handshakeV10(connId))
    out.flush()
    readPacket(in, MaxAllowedPacket) // HandshakeResponse41 — credentials deliberately ignored
    writePacket(out, 2, okPacket())
    out.flush()
    val group = s"mysql-conn-$connId"
    // one worker per connection: commands serialize (protocol order)
    // while the connection thread watches the socket during queries
    val worker = java.util.concurrent.Executors.newSingleThreadExecutor(
      (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t })
    // dropped connection ⇒ kill the connection's in-flight Spark jobs
    // (every COM_QUERY runs tagged under `group` for its WHOLE
    // lifetime, collect included)
    try {
      while (true) {
        val cmd = try readPacket(in, MaxAllowedPacket)
          catch {
            case _: EOFException => return
            case _: java.io.IOException =>
              // oversized command: answer the diagnostic real MySQL
              // gives (ER_NET_PACKET_TOO_LARGE) before closing — the
              // stream is desynced, so the connection cannot continue
              writePacket(out, 1, errPacket(1153, "08S01",
                s"packet exceeds max_allowed_packet ($MaxAllowedPacket)"))
              out.flush()
              return
          }
        if (cmd._2.isEmpty) return
        val payload = cmd._2
        payload(0) match {
          case ComQuit => return
          case ComPing | ComInitDb =>
            writePacket(out, 1, okPacket()); out.flush()
          case ComFieldList =>
            writePacket(out, 1, eofPacket()); out.flush()
          case ComQuery =>
            val sql = new String(payload, 1, payload.length - 1,
              StandardCharsets.UTF_8)
            // The connection thread stays the stream's ONLY reader:
            // the query runs on the per-connection worker while this
            // thread blocks in read() watching the socket. A
            // well-behaved client sends nothing while its query runs,
            // so EOF here means the client dropped mid-query → cancel
            // the group INCLUDING jobs the worker has not launched yet
            // (the plain cancelJobGroup no-ops if EOF wins the race
            // against plan analysis, before any job registers); a byte
            // means a pipelined next command → push it back and wait
            // for the query first. Documented trade-off: a client that
            // half-closes its write side mid-query (legal TCP, no real
            // MySQL client does it) is treated as disconnected.
            val fut = worker.submit(new Runnable {
              override def run(): Unit = runQuery(sql, out, group)
            })
            val b = try in.read() catch { case _: Throwable => -1 }
            if (b < 0) {
              executor.session.sparkContext.cancelJobGroupAndFutureJobs(group)
              try fut.get() catch { case _: Throwable => () }
              return
            }
            in.unread(b)
            // a worker failure that ESCAPED runQuery's own handler
            // (an Error, or a write failure after partial output) has
            // desynced the response stream — tear the connection down
            // rather than serve the next command on garbage
            try fut.get() catch { case _: Throwable => return }
          case other =>
            writePacket(out, 1,
              errPacket(1047, "08S01", s"unsupported command 0x${other.toInt.toHexString}"))
            out.flush()
        }
      }
    } finally {
      executor.session.sparkContext.cancelJobGroup(group)
      worker.shutdownNow()
    }
  }

  // ----------------------------------------------------------------
  // COM_QUERY
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
  private val SetOrUse = """(?is)\s*(SET|USE)\b.*""".r

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

  private def runQuery(sql: String, out: OutputStream, group: String): Unit =
    try {
      sql match {
        case SelectSysVars(varList) =>
          val terms = varList.split(",").toSeq.map {
            case OneSysVar(v, alias) =>
              (Option(alias).getOrElse(s"@@$v"), sysVarValue(v))
          }
          writeResultSet(out, terms.map(_._1 -> "string"),
            Seq(terms.map(t => Option(t._2))))
        case SetOrUse(_) =>
          writePacket(out, 1, okPacket()); out.flush()
        case _ =>
          CommentMiddleware.intercept(executor, sql) match {
            case Some(_) =>
              writePacket(out, 1, okPacket()); out.flush()
            case None =>
              // the job group stays set through the COLLECT — that is
              // where the Spark jobs actually run; clearing it after
              // executeSql (a lazy plan build) would tag nothing
              val sc = executor.session.sparkContext
              sc.setJobGroup(group, s"mysql proxy query", interruptOnCancel = true)
              try {
                val df = executor.executeSql(sql)
                val cols = df.schema.fields.toSeq
                  .map(f => f.name -> f.dataType.typeName)
                val rows = df.limit(MaxRows).collect().toSeq.map { r =>
                  (0 until r.length).map(i =>
                    Option(r.get(i)).map(_.toString))
                }
                writeResultSet(out, cols, rows)
              } finally sc.clearJobGroup()
          }
      }
    } catch {
      case e: Exception =>
        writePacket(out, 1, errPacket(1064, "42000",
          Option(e.getMessage).getOrElse(e.getClass.getName).take(400)))
        out.flush()
    }

  private def writeResultSet(out: OutputStream,
      cols: Seq[(String, String)], rows: Seq[Seq[Option[String]]]): Unit = {
    var seq = 1
    def next(payload: Array[Byte]): Unit = { seq = writePacket(out, seq, payload) }
    next(lencInt(cols.length))
    cols.foreach { case (name, dtype) => next(columnDef(name, dtype)) }
    next(eofPacket())
    rows.foreach { r => next(rowPacket(r)) }
    next(eofPacket())
    out.flush()
  }
}

private[serve] object MysqlFace {

  val ServerVersion = "8.0.0-graft"

  // command bytes
  val ComQuit: Byte = 0x01
  val ComInitDb: Byte = 0x02
  val ComQuery: Byte = 0x03
  val ComFieldList: Byte = 0x04
  val ComPing: Byte = 0x0e

  // capability flags (Protocol::CapabilityFlags)
  val ClientLongPassword = 0x00000001L
  val ClientFoundRows = 0x00000002L
  val ClientLongFlag = 0x00000004L
  val ClientConnectWithDb = 0x00000008L
  val ClientProtocol41 = 0x00000200L
  val ClientTransactions = 0x00002000L
  val ClientSecureConnection = 0x00008000L
  val ClientPluginAuth = 0x00080000L

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

  /** (first sequence id, payload) — reassembles split packets up to
    * `maxBytes` (IOException beyond; the command loop passes
    * [[MaxAllowedPacket]]). Throws EOFException on a closed peer.
    */
  def readPacket(in: InputStream,
      maxBytes: Long = Long.MaxValue): (Int, Array[Byte]) = {
    def b(): Int = {
      val v = in.read()
      if (v < 0) throw new EOFException("peer closed")
      v
    }
    var firstSeq = -1
    var total = 0L
    val buf = new java.io.ByteArrayOutputStream()
    var continue = true
    while (continue) {
      val n = b() | (b() << 8) | (b() << 16)
      val seq = b()
      if (firstSeq < 0) firstSeq = seq
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
    (firstSeq, buf.toByteArray)
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

  def handshakeV10(connId: Int): Array[Byte] = {
    val sb = new scala.collection.mutable.ArrayBuffer[Byte]()
    sb += 10 // protocol version
    sb ++= ServerVersion.getBytes(StandardCharsets.UTF_8); sb += 0
    sb ++= le(connId.toLong, 4)
    sb ++= "12345678".getBytes(StandardCharsets.UTF_8) // auth data part 1
    sb += 0 // filler
    sb ++= le(ServerCapabilities & 0xffff, 2)
    sb += 33 // charset utf8_general_ci
    sb ++= le(0x0002L, 2) // status: autocommit
    sb ++= le((ServerCapabilities >> 16) & 0xffff, 2)
    sb += 21 // auth plugin data length
    sb ++= Array.fill[Byte](10)(0) // reserved
    sb ++= "123456789012".getBytes(StandardCharsets.UTF_8); sb += 0 // part 2
    sb ++= "mysql_native_password".getBytes(StandardCharsets.UTF_8); sb += 0
    sb.toArray
  }

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
}
